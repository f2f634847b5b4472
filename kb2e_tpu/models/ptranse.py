"""PTransE: path-based TransE (Lin et al., EMNLP'15).

The reference fork's README reports PTransE results (``README.md:26-29``,
survey §6 — ADD/MUL/RNN, 2-step/3-step) but ships none of its code
(survey §0.1), so this is a from-scratch TPU-native implementation of the
paper the README descends from.  On top of TransE's margin-ranking triple
loss, every positive triple (h, r, t) adds a **path loss**: for each relation
path p ∈ P(h, t) with PCRA reliability conf(p) (:mod:`kb2e_tpu.data.paths`),

    L_path = Σ_p conf(p) · [γ_p + ‖comp(p) − r‖₁ − ‖comp(p) − r′‖₁]₊

where r′ is a corrupted relation certified false for (h, t) and ``comp``
composes the path's relation embeddings: ADD (sum), MUL (elementwise product)
or RNN (learned [2k, k] matrix applied left-to-right through tanh).  Inverse
relations (path ids ≥ R) use a dedicated ``relation_inv`` table.

The path term's gradients flow through ``jax.grad`` (same SGD descent as the
closed-form triple updates); the triple term keeps TransE's reference-exact
factor conventions (transe/trainer.cpp:25-46).  Evaluation scores triples
with the plain TransE energy over the path-informed embeddings.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kb2e_tpu.config import EmbeddingConfig
from kb2e_tpu.models import base, transe
from kb2e_tpu.ops import projections
from kb2e_tpu.utils import prng


def compose_paths(
    rel_all: jax.Array,  # [2R, k] forward ++ inverse relation tables
    paths: jax.Array,  # int32 [B, P, L], −1 padded
    composition: str,
    comp_w: Optional[jax.Array] = None,  # [2k, k] for 'rnn'
) -> jax.Array:
    """Path embeddings [B, P, k] under the chosen composition.

    Padded hops contribute the composition's identity (0 for ADD, 1 for MUL,
    carry-through for RNN), so shorter paths compose exactly.
    """
    valid = (paths >= 0)[..., None]  # [B, P, L, 1]
    vecs = rel_all[jnp.maximum(paths, 0)]  # [B, P, L, k]
    if composition == "add":
        return jnp.where(valid, vecs, 0.0).sum(axis=2)
    if composition == "mul":
        return jnp.where(valid, vecs, 1.0).prod(axis=2)
    if composition == "rnn":
        if comp_w is None:
            raise ValueError("rnn composition requires comp_w")
        c = jnp.where(valid[:, :, 0], vecs[:, :, 0, :], 0.0)
        for l in range(1, paths.shape[2]):
            x = jnp.concatenate([c, vecs[:, :, l, :]], axis=-1)  # [B, P, 2k]
            c = jnp.where(valid[:, :, l], jnp.tanh(x @ comp_w), c)
        return c
    raise ValueError(f"unknown path composition {composition!r}")


class PTransE(transe.TransE):
    name = "ptranse"
    # Extra tables (relation_inv, rnn weights) + the path loss don't fit the
    # two-table fused epoch path inherited from TransE.
    supports_fused_table = False

    def init_params(self, key, n_entities, n_relations, cfg: EmbeddingConfig) -> base.Params:
        k = cfg.embedding_size
        key, ki = jax.random.split(key)
        params = super().init_params(key, n_entities, n_relations, cfg)
        # PTransE stays float32 regardless of param_dtype: the path loss and
        # inverse-relation tables are not validated at low precision.
        params = {kk: v.astype(jnp.float32) for kk, v in params.items()}
        params["relation_inv"] = projections.ball_norm(
            prng.transe_init(ki, (n_relations, k), k)
        )
        if cfg.path_composition == "rnn":
            eye = jnp.eye(k, dtype=jnp.float32) * 0.5
            params["comp_w"] = jnp.concatenate([eye, eye], axis=0)
        return params

    def _path_loss_fn(self, batch: base.Batch, cfg: EmbeddingConfig):
        paths, conf, r, nr = batch["paths"], batch["conf"], batch["r"], batch["nr"]
        active = (conf > 0) & batch["valid"][:, None] & batch["nr_valid"][:, None]
        w = jnp.where(active, conf, 0.0)

        def loss(rel_t, rel_i, comp_w):
            rel_all = jnp.concatenate([rel_t, rel_i], axis=0)
            pv = compose_paths(rel_all, paths, cfg.path_composition, comp_w)  # [B,P,k]
            # Path energies are L1 regardless of --distance (paper eq. 6).
            e_pos = jnp.abs(pv - rel_t[r][:, None, :]).sum(-1)
            e_neg = jnp.abs(pv - rel_t[nr][:, None, :]).sum(-1)
            per = jnp.maximum(cfg.path_margin + e_pos - e_neg, 0.0)
            return cfg.path_weight * jnp.sum(w * per)

        return loss

    def batch_update(self, params, batch: base.Batch, cfg: EmbeddingConfig) -> Tuple[base.Params, jax.Array]:
        ent, rel, rel_inv = params["entity"], params["relation"], params["relation_inv"]
        comp_w = params.get("comp_w")
        lr = cfg.learning_rate
        dist = self.effective_distance(cfg.distance)
        ph, pt, r, nh, nt = batch["ph"], batch["pt"], batch["r"], batch["nh"], batch["nt"]

        # --- triple term: TransE reference semantics (transe/trainer.cpp:25-46) ---
        rv = rel[r]
        res_pos = ent[pt] - ent[ph] - rv
        res_neg = ent[nt] - ent[nh] - rv
        from kb2e_tpu.ops import distances

        e_pos = distances.residual_energy(res_pos, dist)
        e_neg = distances.residual_energy(res_neg, dist)
        viol = (e_pos + cfg.margin > e_neg) & batch["valid"]
        loss = jnp.sum(jnp.where(viol, cfg.margin + e_pos - e_neg, 0.0))
        m = viol.astype(res_pos.dtype)[:, None]
        x_pos = transe._residual_grad(res_pos, dist) * m
        x_neg = transe._residual_grad(res_neg, dist) * m
        from kb2e_tpu.ops import scatter

        d_rel = scatter.scatter_add(
            jnp.zeros_like(rel), r, lr * (x_pos - x_neg), cfg.scatter_mode
        )
        idx = jnp.concatenate([ph, pt, nh, nt])
        delta = jnp.concatenate([lr * x_pos, -lr * x_pos, -lr * x_neg, lr * x_neg])
        ent = scatter.scatter_add(ent, idx, delta, cfg.scatter_mode)

        # --- path term: SGD descent on the PCRA-weighted relation-path loss ---
        loss_fn = self._path_loss_fn(batch, cfg)
        path_loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
            rel, rel_inv, comp_w if comp_w is not None else jnp.zeros(())
        )
        rel = rel + d_rel - lr * grads[0]
        rel_inv = rel_inv - lr * grads[1]
        if comp_w is not None:
            comp_w = comp_w - lr * grads[2]

        out = {
            "entity": projections.ball_norm(ent),
            "relation": projections.ball_norm(rel),
            "relation_inv": projections.ball_norm(rel_inv),
        }
        if comp_w is not None:
            out["comp_w"] = comp_w
        return out, loss + path_loss

    has_parity_mode = False

    def sequential_update(self, params, batch: base.Batch, cfg: EmbeddingConfig):
        # No reference binary exists for PTransE (survey §0.1) — the
        # vectorised path IS the defining semantics.
        return self.batch_update(params, batch, cfg)


def warm_start_params(
    params: base.Params, entity: np.ndarray, relation: np.ndarray
) -> base.Params:
    """Seed from TransE output (paper: PTransE initialises from TransE).

    ``relation_inv`` starts at −relation — the exact inverse under ADD
    composition and a sensible anchor for the others.
    """
    ent = projections.ball_norm(jnp.asarray(entity, jnp.float32))
    rel = projections.ball_norm(jnp.asarray(relation, jnp.float32))
    out = dict(params)
    out.update(entity=ent, relation=rel, relation_inv=projections.ball_norm(-rel))
    return out


MODEL = base.register(PTransE())
