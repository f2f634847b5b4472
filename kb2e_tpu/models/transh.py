"""TransH: hyperplane-projection scoring.

E(h, t, r) = Σ_i | t_i − (w·t)w_i − (h_i − (w·h)w_i) − r_i |   (L1 ONLY —
the reference hard-codes L1 and ignores --distance, quirk B5;
transh/transh.cpp:15-28).

Params: entity [N,k], relation [R,k], and the per-relation hyperplane normals
``norm`` [R,k] (the reference's ``weights_``, transh/trainer.h).

Reference training semantics reproduced:
* init: randn(0, 1/k, ±1) for all tables; entity/relation ball-normed,
  normals sphere-normed (transh/trainer.cpp:61-63, 77-88).
* closed-form gradient (transh/trainer.cpp:11-46): elementwise x = ±1 of the
  doubled projected residual, the ``sum_x = Σ x_i w_i`` cross term, and the
  two-part normal update  w += β·lr·(x·(w·h − w·t) + sum_x·(h − t)).
* constraints after each update (transh/trainer.cpp:48-58): ball-norm e/r
  rows, sphere-norm w, then the coupled orthogonality projector
  norm(r,w,lr), norm(h,w,lr), norm(t,w,lr) (common/utils.cpp:79-111).

Fast mode applies the orthogonality projector to the whole relation table
(idempotent where already satisfied) and to the batch's touched (entity, w_r)
pairs with delta scatter-adds; parity mode replays the exact sequence.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from kb2e_tpu.config import EmbeddingConfig
from kb2e_tpu.constants import Distance
from kb2e_tpu.models import base
from kb2e_tpu.ops import projections
from kb2e_tpu.utils import prng


def _hyperplane_residual(he, te, rv, w):
    """t − (w·t)w − (h − (w·h)w) − r, batched over leading axis."""
    head_sum = jnp.sum(w * he, axis=-1, keepdims=True)
    tail_sum = jnp.sum(w * te, axis=-1, keepdims=True)
    return (te - tail_sum * w) - (he - head_sum * w) - rv, head_sum, tail_sum


class TransH(base.Model):
    name = "transh"
    uses_distance_flag = False  # quirk B5
    needs_projection = True

    def init_params(self, key, n_entities, n_relations, cfg: EmbeddingConfig) -> base.Params:
        k = cfg.embedding_size
        ke, kr, kw = jax.random.split(key, 3)
        ent = projections.ball_norm(prng.unit_bounded_init(ke, (n_entities, k), k))
        rel = projections.ball_norm(prng.unit_bounded_init(kr, (n_relations, k), k))
        w = projections.sphere_norm(prng.unit_bounded_init(kw, (n_relations, k), k))
        return {"entity": ent, "relation": rel, "norm": w}

    def energy(self, params, h, t, r, distance: Distance) -> jax.Array:
        res, _, _ = _hyperplane_residual(
            params["entity"][h], params["entity"][t], params["relation"][r], params["norm"][r]
        )
        return jnp.sum(jnp.abs(res), axis=-1)

    # --- evaluation hooks: project the whole entity table onto relation
    # ``rel``'s hyperplane; queries then reduce to L1 distance sweeps.
    def project_entities(self, params, rel) -> jax.Array:
        w = params["norm"][rel]  # [k]
        ent = params["entity"]
        return ent - (ent @ w)[:, None] * w[None, :]

    def batch_update(self, params, batch: base.Batch, cfg: EmbeddingConfig) -> Tuple[base.Params, jax.Array]:
        ent, rel, w_tab = params["entity"], params["relation"], params["norm"]
        lr = cfg.learning_rate
        ph, pt, r, nh, nt = batch["ph"], batch["pt"], batch["r"], batch["nh"], batch["nt"]

        rv, w = rel[r], w_tab[r]
        res_pos, hs_pos, ts_pos = _hyperplane_residual(ent[ph], ent[pt], rv, w)
        res_neg, hs_neg, ts_neg = _hyperplane_residual(ent[nh], ent[nt], rv, w)
        e_pos = jnp.sum(jnp.abs(res_pos), axis=-1)
        e_neg = jnp.sum(jnp.abs(res_neg), axis=-1)

        viol = (e_pos + cfg.margin > e_neg) & batch["valid"]
        loss = jnp.sum(jnp.where(viol, cfg.margin + e_pos - e_neg, 0.0))
        m = viol.astype(res_pos.dtype)[:, None]

        def contributions(res, he, te, hs, ts, beta):
            # β = −1 for the positive triple, +1 for the corrupted one.
            x = jnp.where(2.0 * res > 0, 1.0, -1.0) * m
            sum_x = jnp.sum(x * w, axis=-1, keepdims=True)
            d_rel = -beta * lr * x
            d_h = -beta * lr * x
            d_t = beta * lr * x
            d_w = beta * lr * (x * (hs - ts) + sum_x * (he - te))
            return x, d_rel, d_h, d_t, d_w

        _, dr_p, dh_p, dt_p, dw_p = contributions(res_pos, ent[ph], ent[pt], hs_pos, ts_pos, -1.0)
        _, dr_n, dh_n, dt_n, dw_n = contributions(res_neg, ent[nh], ent[nt], hs_neg, ts_neg, +1.0)

        from kb2e_tpu.ops import scatter

        rel = scatter.scatter_add(rel, r, dr_p + dr_n, cfg.scatter_mode)
        w_tab = scatter.scatter_add(w_tab, r, dw_p + dw_n, cfg.scatter_mode)
        idx = jnp.concatenate([ph, pt, nh, nt])
        delta = jnp.concatenate([dh_p, dt_p, dh_n, dt_n])
        ent = scatter.scatter_add(ent, idx, delta, cfg.scatter_mode)

        # Constraints: ball e/r, sphere w (idempotent whole-table passes).
        ent = projections.ball_norm(ent)
        rel = projections.ball_norm(rel)
        w_tab = projections.sphere_norm(w_tab)

        # Orthogonality r ⊥ w over the whole relation table (no-op where the
        # constraint already holds, so untouched rows are unchanged).
        orth = jax.vmap(lambda a, b: projections.orthogonality_project(a, b, lr, cfg.projection_max_iters))
        rel, w_tab = orth(rel, w_tab)

        # Orthogonality for the touched (entity, w_r) pairs, scattered back as
        # deltas.  Corruption replaces exactly one entity, so the distinct
        # pairs per sample are (h, r), (t, r), (corrupted_entity, r);
        # cross-sample duplicates still accumulate (fast-mode approximation).
        # All three pairs of a sample read the SAME w row, so w is gathered
        # ONCE per sample (tiled to the three pair slots — a streaming copy,
        # not a random gather) and the three w deltas are summed per sample
        # before ONE scatter: −4B random row transactions per batch vs the
        # former per-pair gather/scatter (the loop is transaction-bound,
        # PERF.md "Speed of light"); same accumulate semantics, fp add order
        # only.
        corrupted = jnp.where(nh != ph, nh, nt)
        e_idx = jnp.concatenate([ph, pt, corrupted])
        e_rows = ent[e_idx]
        w_row = w_tab[r]  # [B, k]
        w_rows = jnp.concatenate([w_row, w_row, w_row])
        e_new, w_new = orth(e_rows, w_rows)
        ent = scatter.scatter_add(ent, e_idx, e_new - e_rows, cfg.scatter_mode)
        b = ph.shape[0]
        dw3 = (w_new - w_rows).reshape(3, b, -1).sum(axis=0)
        w_tab = scatter.scatter_add(w_tab, r, dw3, cfg.scatter_mode)
        w_tab = projections.sphere_norm(w_tab)

        return {"entity": ent, "relation": rel, "norm": w_tab}, loss

    def sequential_update(self, params, batch: base.Batch, cfg: EmbeddingConfig) -> Tuple[base.Params, jax.Array]:
        impl = getattr(cfg, "parity_impl", "auto")
        if impl == "pallas" or (impl == "auto" and jax.default_backend() == "tpu"):
            # Fused sequential kernel: one Pallas program instead of B scan
            # steps (ops/pallas_update.py::transh_sequential_update).
            from kb2e_tpu.ops import pallas_update

            ent, rel, w_tab, loss = pallas_update.transh_sequential_update(
                params["entity"], params["relation"], params["norm"],
                batch["ph"], batch["pt"], batch["r"],
                batch["nh"], batch["nt"], batch["valid"],
                learning_rate=cfg.learning_rate, margin=cfg.margin,
                max_iters=cfg.projection_max_iters,
                interpret=(jax.default_backend() != "tpu"),
            )
            return {"entity": ent, "relation": rel, "norm": w_tab}, loss
        snap_e, snap_r, snap_w = params["entity"], params["relation"], params["norm"]
        lr = cfg.learning_rate
        cap = cfg.projection_max_iters

        def gradient_update(tabs, h, t, r, beta):
            """One reference gradientUpdate call (transh/trainer.cpp:11-58).

            Energies/gradients read the batch snapshot; writes and constraint
            projections act on the carried next buffers.
            """
            ent, rel, w_tab = tabs
            he, te, rv, w = snap_e[h], snap_e[t], snap_r[r], snap_w[r]
            res, hs, ts = _hyperplane_residual(he, te, rv, w)
            x = jnp.where(2.0 * res > 0, 1.0, -1.0)
            sum_x = jnp.sum(x * w)

            rel = rel.at[r].add(-beta * lr * x)
            ent = ent.at[h].add(-beta * lr * x)
            ent = ent.at[t].add(beta * lr * x)
            dw = beta * lr * (x * (hs - ts) + sum_x * (he - te))
            w_tab = w_tab.at[r].add(dw)

            rel = rel.at[r].set(projections.ball_norm(rel[r]))
            ent = ent.at[h].set(projections.ball_norm(ent[h]))
            ent = ent.at[t].set(projections.ball_norm(ent[t]))
            w_tab = w_tab.at[r].set(projections.sphere_norm(w_tab[r]))

            a, b = projections.orthogonality_project(rel[r], w_tab[r], lr, cap)
            rel, w_tab = rel.at[r].set(a), w_tab.at[r].set(b)
            a, b = projections.orthogonality_project(ent[h], w_tab[r], lr, cap)
            ent, w_tab = ent.at[h].set(a), w_tab.at[r].set(b)
            a, b = projections.orthogonality_project(ent[t], w_tab[r], lr, cap)
            ent, w_tab = ent.at[t].set(a), w_tab.at[r].set(b)
            return ent, rel, w_tab

        def step(carry, sample):
            ent, rel, w_tab, loss = carry
            ph, pt, r, nh, nt, valid = sample
            # Energies from the snapshot (train_kb, common/trainer.cpp:132-141).
            e_pos = self.energy({"entity": snap_e, "relation": snap_r, "norm": snap_w}, ph, pt, r, Distance.L1)
            e_neg = self.energy({"entity": snap_e, "relation": snap_r, "norm": snap_w}, nh, nt, r, Distance.L1)
            viol = (e_pos + cfg.margin > e_neg) & valid

            def apply(tabs):
                tabs = gradient_update(tabs, ph, pt, r, -1.0)
                tabs = gradient_update(tabs, nh, nt, r, +1.0)
                return tabs

            ent, rel, w_tab = jax.lax.cond(viol, apply, lambda tabs: tabs, (ent, rel, w_tab))
            loss = loss + jnp.where(viol, cfg.margin + e_pos - e_neg, 0.0)
            return (ent, rel, w_tab, loss), None

        samples = (batch["ph"], batch["pt"], batch["r"], batch["nh"], batch["nt"], batch["valid"])
        (ent, rel, w_tab, loss), _ = jax.lax.scan(
            step, (snap_e, snap_r, snap_w, jnp.float32(0.0)), samples
        )
        return {"entity": ent, "relation": rel, "norm": w_tab}, loss


MODEL = base.register(TransH())
