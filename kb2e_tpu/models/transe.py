"""TransE: translation scoring E(h, t, r) = dist(t − h − r).

Reference semantics reproduced:
* energy: transe/transe.cpp:10-28 (L1 = Σ|·|, L2 = Σ(·)² without sqrt).
* init:   randn(0, 1/k, ±6/√k) then ball-norm rows (transe/trainer.cpp:21-23,
          common/trainer.cpp:34-58).
* closed-form gradient with the reference's factor conventions (quirk B6):
  x = 2(t−h−r), L1 maps x to ±1 elementwise with sign(0) = −1
  (transe/trainer.cpp:28-41); row updates r ∓= lr·x, h ∓= lr·x, t ±= lr·x
  followed by ball-norm of the touched rows (transe/trainer.cpp:38-45).
* double-buffered batch semantics (transe/trainer.cpp:48-56): reads come from
  the batch-start snapshot; writes accumulate.  ``batch_update`` realises this
  as scatter-adds + one whole-table ball-norm (idempotent on untouched rows,
  so equivalent to norming only touched rows); ``sequential_update`` replays
  the exact per-sample interleaving for parity tests.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from kb2e_tpu.config import EmbeddingConfig
from kb2e_tpu.constants import Distance
from kb2e_tpu.models import base
from kb2e_tpu.ops import distances, projections
from kb2e_tpu.utils import prng


def _residual_grad(res: jax.Array, distance: Distance) -> jax.Array:
    """The reference's per-coordinate update direction x (transe/trainer.cpp:28-36)."""
    x = 2.0 * res
    if distance == Distance.L1:
        x = jnp.where(x > 0, 1.0, -1.0)
    return x


class TransE(base.Model):
    name = "transe"

    def init_params(self, key, n_entities, n_relations, cfg: EmbeddingConfig) -> base.Params:
        k = cfg.embedding_size
        ke, kr = jax.random.split(key)
        ent = prng.transe_init(ke, (n_entities, k), k)
        rel = prng.transe_init(kr, (n_relations, k), k)
        # prepTrain ball-norms every row after init (common/trainer.cpp:45-57).
        dt = jnp.dtype(cfg.param_dtype)
        return {
            "entity": projections.ball_norm(ent).astype(dt),
            "relation": projections.ball_norm(rel).astype(dt),
        }

    def energy(self, params, h, t, r, distance: Distance) -> jax.Array:
        res = (
            params["entity"][t].astype(jnp.float32)
            - params["entity"][h].astype(jnp.float32)
            - params["relation"][r].astype(jnp.float32)
        )
        return distances.residual_energy(res, distance)

    def batch_update(self, params, batch: base.Batch, cfg: EmbeddingConfig) -> Tuple[base.Params, jax.Array]:
        ent, rel = params["entity"], params["relation"]
        lr = cfg.learning_rate
        dist = self.effective_distance(cfg.distance)
        ph, pt, r, nh, nt = batch["ph"], batch["pt"], batch["r"], batch["nh"], batch["nt"]

        rv = rel[r].astype(jnp.float32)
        res_pos = ent[pt].astype(jnp.float32) - ent[ph].astype(jnp.float32) - rv
        res_neg = ent[nt].astype(jnp.float32) - ent[nh].astype(jnp.float32) - rv
        e_pos = distances.residual_energy(res_pos, dist)
        e_neg = distances.residual_energy(res_neg, dist)

        viol = (e_pos + cfg.margin > e_neg) & batch["valid"]
        loss = jnp.sum(jnp.where(viol, cfg.margin + e_pos - e_neg, 0.0))

        m = viol.astype(res_pos.dtype)[:, None]
        x_pos = _residual_grad(res_pos, dist) * m
        x_neg = _residual_grad(res_neg, dist) * m

        # Positive triple uses modifier −1, corrupted +1 (transe/trainer.cpp:26).
        from kb2e_tpu.ops import scatter

        rel = scatter.scatter_add(
            rel, r, (lr * (x_pos - x_neg)).astype(rel.dtype), cfg.scatter_mode
        )
        idx = jnp.concatenate([ph, pt, nh, nt])
        delta = jnp.concatenate([lr * x_pos, -lr * x_pos, -lr * x_neg, lr * x_neg])
        ent = scatter.scatter_add(ent, idx, delta.astype(ent.dtype), cfg.scatter_mode)

        return (
            {"entity": projections.ball_norm(ent), "relation": projections.ball_norm(rel)},
            loss,
        )

    # Single-table fast path: entities and relations share one [N+R, k] table
    # (both are ball-normed in TransE, common/trainer.cpp:45-57), so the epoch
    # scan needs ONE gather, ONE scatter-add and ONE projection per batch
    # instead of two of each — scan-step op count is the measured bottleneck
    # on TPU (PERF.md).  Numerics are unchanged: same deltas, same rows.
    supports_fused_table = True

    def fuse_params(self, params: base.Params) -> jax.Array:
        return jnp.concatenate([params["entity"], params["relation"]])

    def unfuse_params(self, table: jax.Array, n_entities: int) -> base.Params:
        return {"entity": table[:n_entities], "relation": table[n_entities:]}

    def fused_table_update(
        self, table: jax.Array, n_entities: int, batch: base.Batch, cfg: EmbeddingConfig
    ) -> Tuple[jax.Array, jax.Array]:
        """``batch_update`` on the combined [N+R, k] table (relation row ids
        offset by ``n_entities``)."""
        lr = cfg.learning_rate
        dist = self.effective_distance(cfg.distance)
        ph, pt, r, nh, nt = batch["ph"], batch["pt"], batch["r"], batch["nh"], batch["nt"]
        ro = r + n_entities

        idx = jnp.concatenate([ph, pt, nh, nt, ro])
        rows = table[idx].astype(jnp.float32)
        b = ph.shape[0]
        hv, tv, nhv, ntv, rv = (rows[i * b:(i + 1) * b] for i in range(5))
        res_pos = tv - hv - rv
        res_neg = ntv - nhv - rv
        e_pos = distances.residual_energy(res_pos, dist)
        e_neg = distances.residual_energy(res_neg, dist)

        viol = (e_pos + cfg.margin > e_neg) & batch["valid"]
        loss = jnp.sum(jnp.where(viol, cfg.margin + e_pos - e_neg, 0.0))

        m = viol.astype(res_pos.dtype)[:, None]
        x_pos = _residual_grad(res_pos, dist) * m
        x_neg = _residual_grad(res_neg, dist) * m

        from kb2e_tpu.ops import scatter

        delta = jnp.concatenate(
            [lr * x_pos, -lr * x_pos, -lr * x_neg, lr * x_neg, lr * (x_pos - x_neg)]
        )
        table = scatter.scatter_add(table, idx, delta.astype(table.dtype), cfg.scatter_mode)
        return projections.ball_norm(table), loss

    def sequential_update(self, params, batch: base.Batch, cfg: EmbeddingConfig) -> Tuple[base.Params, jax.Array]:
        impl = getattr(cfg, "parity_impl", "auto")
        if impl == "pallas" or (impl == "auto" and jax.default_backend() == "tpu"):
            # Fused sequential kernel: same per-sample semantics, one Pallas
            # program instead of B lax.scan steps (ops/pallas_update.py).
            from kb2e_tpu.ops import pallas_update

            ent, rel, loss = pallas_update.transe_sequential_update(
                params["entity"], params["relation"],
                batch["ph"], batch["pt"], batch["r"],
                batch["nh"], batch["nt"], batch["valid"],
                learning_rate=cfg.learning_rate, margin=cfg.margin,
                l1=(self.effective_distance(cfg.distance) == Distance.L1),
                interpret=(jax.default_backend() != "tpu"),
            )
            return {"entity": ent, "relation": rel}, loss
        snap_e, snap_r = params["entity"], params["relation"]
        lr = cfg.learning_rate
        dist = self.effective_distance(cfg.distance)

        def step(carry, sample):
            ent, rel, loss = carry
            ph, pt, r, nh, nt, valid = sample

            rv = snap_r[r]
            res_pos = snap_e[pt] - snap_e[ph] - rv
            res_neg = snap_e[nt] - snap_e[nh] - rv
            e_pos = distances.residual_energy(res_pos, dist)
            e_neg = distances.residual_energy(res_neg, dist)
            viol = (e_pos + cfg.margin > e_neg) & valid

            def apply(eb):
                ent, rel = eb
                x_pos = _residual_grad(res_pos, dist)
                # gradientUpdate(pos, corrupted=False): r,h += lr·x; t −= lr·x,
                # then ball-norm the three touched rows (transe/trainer.cpp:38-45).
                rel = rel.at[r].add(lr * x_pos)
                ent = ent.at[ph].add(lr * x_pos)
                ent = ent.at[pt].add(-lr * x_pos)
                rel = rel.at[r].set(projections.ball_norm(rel[r]))
                ent = ent.at[ph].set(projections.ball_norm(ent[ph]))
                ent = ent.at[pt].set(projections.ball_norm(ent[pt]))
                # gradientUpdate(neg, corrupted=True).
                x_neg = _residual_grad(res_neg, dist)
                rel = rel.at[r].add(-lr * x_neg)
                ent = ent.at[nh].add(-lr * x_neg)
                ent = ent.at[nt].add(lr * x_neg)
                rel = rel.at[r].set(projections.ball_norm(rel[r]))
                ent = ent.at[nh].set(projections.ball_norm(ent[nh]))
                ent = ent.at[nt].set(projections.ball_norm(ent[nt]))
                return ent, rel

            ent, rel = jax.lax.cond(viol, apply, lambda eb: eb, (ent, rel))
            loss = loss + jnp.where(viol, cfg.margin + e_pos - e_neg, 0.0)
            return (ent, rel, loss), None

        samples = (
            batch["ph"], batch["pt"], batch["r"], batch["nh"], batch["nt"], batch["valid"],
        )
        (ent, rel, loss), _ = jax.lax.scan(step, (snap_e, snap_r, jnp.float32(0.0)), samples)
        return {"entity": ent, "relation": rel}, loss


MODEL = base.register(TransE())
