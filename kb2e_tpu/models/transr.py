"""TransR: per-relation matrix projection scoring.

E(h, t, r) = dist( t·W_r − h·W_r − r )  under L1 or L2
(transr/transr.cpp:13-37 — note the reference's work-vector accumulation bug
B1 is deliberately NOT reproduced: projections are computed fresh).

The projection matrix table ``proj`` is [R, k, k] laid out [input-dim j,
output-dim i] so a row projects as ``e @ W`` — matching the reference's
``W[r][j][i]·h[j]`` contraction.

Reference training semantics reproduced:
* W initialised to identity (transr/trainer.cpp:73-86); entity/relation
  warm-started from TransE seed files when configured, with entities
  sphere-normed on load (transr/trainer.cpp:88-113) — see
  :func:`warm_start_params`.
* closed-form gradient (transr/trainer.cpp:144-172):
  x = 2(t·W − h·W − r) (L1 → ±1);  W −= β·lr·outer(h−t, x);
  h −= β·lr·(W x);  t += β·lr·(W x);  r −= β·lr·x.
* constraints (transr/trainer.cpp:174-191): sphere-norm the touched e/r rows
  and every row of W_r, then the iterative ‖e·W‖ ≤ 1 projector ``transRNorm``
  on (h, W), (t, W) and the relation vector.  The reference's third call
  passes ``entityVec_next_[relation]`` (bug B2); we constrain the relation
  vector, replicating the intent.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kb2e_tpu.config import EmbeddingConfig
from kb2e_tpu.constants import Distance
from kb2e_tpu.models import base
from kb2e_tpu.ops import distances, projections
from kb2e_tpu.utils import prng


def _dotp(a, b):
    """Full-f32 contraction: TPU's default bf16 MXU pass loses ~3 decimal
    digits, enough to flip margin-violation decisions in parity mode."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


class TransR(base.Model):
    name = "transr"
    needs_projection = True
    # Fast mode is chunk-sequential (see batch_update); the epoch runner
    # flattens epochs into chunk-sized mini-batches so the whole epoch is ONE
    # un-nested lax.scan — nesting batch_update's chunk scan inside the epoch
    # scan reproduces the axon-backend kernel fault described below.
    # 256 is the measured throughput optimum (benchmarks/transr_chunk_sweep.py,
    # r04: 128→746k, 256→830k, 512→690k, 1024→466k, 4096→126k triples/s —
    # the chunk's [c,k,k] working set wants to stay cache/VMEM-resident) and
    # is FINER sequential granularity than the former 1024, i.e. strictly
    # closer to the reference's per-sample SGD.
    chunk_size = 256

    def init_params(self, key, n_entities, n_relations, cfg: EmbeddingConfig) -> base.Params:
        k = cfg.embedding_size
        ke, kr = jax.random.split(key)
        ent = projections.ball_norm(prng.unit_bounded_init(ke, (n_entities, k), k))
        rel = projections.ball_norm(prng.unit_bounded_init(kr, (n_relations, k), k))
        proj = jnp.broadcast_to(jnp.eye(k, dtype=jnp.float32), (n_relations, k, k))
        return {"entity": ent, "relation": rel, "proj": jnp.array(proj)}

    def energy(self, params, h, t, r, distance: Distance) -> jax.Array:
        w = params["proj"][r]  # [B, k, k]
        hp = jnp.einsum("bj,bji->bi", params["entity"][h], w)
        tp = jnp.einsum("bj,bji->bi", params["entity"][t], w)
        return distances.residual_energy(tp - hp - params["relation"][r], distance)

    def project_entities(self, params, rel) -> jax.Array:
        # One [N,k]·[k,k] matmul per relation — the MXU-native analogue of the
        # reference's per-relation energy cache (common/evaluation.cpp:194-218).
        return params["entity"] @ params["proj"][rel]

    def batch_update(self, params, batch: base.Batch, cfg: EmbeddingConfig) -> Tuple[base.Params, jax.Array]:
        # Fast mode is CHUNK-SEQUENTIAL: one lax.scan carries (ent, rel,
        # proj) and each chunk of ~1024 samples does the full pipeline —
        # gather proj[r] once, closed-form grads (transr/trainer.cpp:144-172),
        # scatter the updates, sphere-norm the tables, then the ‖e·W‖≤1 ball
        # projector on the chunk's touched pairs.  Within a chunk all reads
        # see the chunk-start snapshot and duplicate-row deltas accumulate;
        # across chunks updates apply sequentially — a mini-batch refinement
        # of the reference's per-sample SGD (smaller effective batch than the
        # old whole-batch snapshot, i.e. CLOSER to the reference, and one
        # pass over the data instead of separate grad/projector phases).
        #
        # Why chunked at all: gathering proj[r] plus the two outer-product
        # grads for the whole batch materialises several [B, k, k] buffers
        # (~1 GB at FB15k shapes) inside the whole-epoch scan.  Why one scan
        # instead of the former separate grad-scan + projector-scan phases:
        # that multi-phase program triggered a RUNTIME kernel fault in the
        # axon TPU backend (compile succeeded, 156 MB temps — reproduced
        # 2026-08-20 on every phase layout tried; each phase in isolation
        # runs fine).  The single-scan shape avoids the miscompile and is
        # cheaper: proj[r] is gathered once per chunk, not once per phase.
        from kb2e_tpu.ops import scatter

        # Diagnostic ablation (benchmarks/segment_probe.py — see config.py).
        ablate = set(filter(None, cfg.debug_ablate.split(",")))
        lr = cfg.learning_rate
        dist = self.effective_distance(cfg.distance)
        ph = batch["ph"]
        b = ph.shape[0]
        # Derive the inner chunk from self.chunk_size so this cannot diverge
        # from make_epoch_runner's mini-batch sizing (which also reads
        # chunk_size): a mismatch would re-introduce an inner scan nested in
        # the epoch scan — the program shape that faults the axon backend.
        chunk = min(self.chunk_size, b)
        pad = (-b) % chunk
        n_entities = params["entity"].shape[0]

        def padc(a, fill=0):
            return jnp.concatenate(
                [a, jnp.full((pad,), fill, a.dtype)]
            ).reshape(-1, chunk)

        slices = (
            padc(ph), padc(batch["pt"]), padc(batch["r"]),
            padc(batch["nh"]), padc(batch["nt"]),
            padc(batch["valid"], fill=False),
        )

        def chunk_step(tabs, sl):
            ent, rel, proj = tabs
            phi, pti, ri, nhi, nti, vi = sl
            w = proj[ri]  # [c, k, k] — the one gather reused by grads below
            he, te, ne_h, ne_t, rv = ent[phi], ent[pti], ent[nhi], ent[nti], rel[ri]
            hp = jnp.einsum("bj,bji->bi", he, w)
            tp = jnp.einsum("bj,bji->bi", te, w)
            np_h = jnp.einsum("bj,bji->bi", ne_h, w)
            np_t = jnp.einsum("bj,bji->bi", ne_t, w)

            res_pos = tp - hp - rv
            res_neg = np_t - np_h - rv
            e_pos = distances.residual_energy(res_pos, dist)
            e_neg = distances.residual_energy(res_neg, dist)
            viol = (e_pos + cfg.margin > e_neg) & vi
            lterm = jnp.sum(jnp.where(viol, cfg.margin + e_pos - e_neg, 0.0))
            m = viol.astype(res_pos.dtype)[:, None]

            def xs(res):
                x = 2.0 * res
                if dist == Distance.L1:
                    x = jnp.where(x > 0, 1.0, -1.0)
                return x * m

            x_pos, x_neg = xs(res_pos), xs(res_neg)

            # β = −1 (positive), +1 (corrupted); transr/trainer.cpp:147-171.
            wx_pos = jnp.einsum("bji,bi->bj", w, x_pos)
            wx_neg = jnp.einsum("bji,bi->bj", w, x_neg)
            idx = jnp.concatenate([phi, pti, nhi, nti])
            if "scatter" not in ablate:
                d_w = lr * (
                    jnp.einsum("bj,bi->bji", he - te, x_pos)
                    - jnp.einsum("bj,bi->bji", ne_h - ne_t, x_neg)
                )
                proj = scatter.scatter_add(proj, ri, d_w, cfg.scatter_mode)
                rel = scatter.scatter_add(rel, ri, lr * (x_pos - x_neg), cfg.scatter_mode)
                delta = jnp.concatenate(
                    [lr * wx_pos, -lr * wx_pos, -lr * wx_neg, lr * wx_neg]
                )
                ent = scatter.scatter_add(ent, idx, delta, cfg.scatter_mode)

            # Constraints (transr/trainer.cpp:174-191): sphere-norm the
            # TOUCHED rows (the reference norms exactly the rows the update
            # wrote, and only when the margin was violated), then ‖e·W‖ ≤ 1
            # on the touched pairs: (h, r), (t, r), (corrupted, r) and — the
            # intent of bug B2 — the relation vector's own (rel_r, r) pair.
            # Row-wise on purpose: whole-table renormalisation per chunk is
            # ~60 MB of pure rewrite traffic, and repeating the full-[R,k,k]
            # rewrite inside a long scan triggers the axon-backend kernel
            # fault this pipeline was shaped to avoid (isolated by probe:
            # stubbing these norms made a 48-chunk epoch pass).
            # Unconditional on touched rows: sphere_norm is idempotent, and a
            # duplicate row index with per-occurrence masks would make the
            # scatter-set racy (normed vs raw writes).  Rows indexed by
            # padding (row 0) get normed too — same behaviour the old
            # whole-table norm had for every row.
            viol4 = jnp.concatenate([viol, viol, viol, viol])

            def norm_rows(table, rows_idx):
                return table.at[rows_idx].set(
                    projections.sphere_norm(table[rows_idx])
                )

            if "norms" not in ablate:
                ent = norm_rows(ent, idx)
                rel = norm_rows(rel, ri)
                proj = norm_rows(proj, ri)  # normalises W rows [j, :]

            if "ball" not in ablate:
                # Fast-mode ‖a·W‖ ≤ 1 on the touched pairs: (h, r), (t, r),
                # (corrupted, r) and — the intent of bug B2 — the relation
                # vector's own pair.  ONE masked iteration of the reference's
                # coupled descent (transRNorm, transr/trainer.cpp:34-64):
                # tmp = 2·aW;  W -= rate·outer(a, tmp);  a -= rate·W'·tmp —
                # straight-line code, no while_loop.  The former vmapped
                # bounded-while projector lowered to a [4c,k,k]-carry loop
                # with data-dependent trips, which has a runtime kernel
                # fault on the axon backend (isolated by ablation:
                # benchmarks/segment_probe.py --epoch --ablate ball); a
                # single iteration per visit keeps the reference's gradual
                # vector+matrix enforcement (rows are revisited constantly)
                # without the faulty program shape.  A-only closed-form
                # scaling was tried and REJECTED: with W untouched the next
                # sphere-norm undoes the shrink and quality collapses
                # (caught by tests/test_transr_parity_bridge.py).
                # APPROXIMATION, stated plainly: when a relation id repeats
                # within a chunk, each occurrence computes w_new from its
                # own local d_w while proj accumulates the SUM of sibling
                # deltas — every occurrence's entity update therefore sees a
                # W stale by its siblings' contributions, and one masked
                # iteration does not enforce ‖aW‖ ≤ 1 exactly anyway.  The
                # constraint holds only asymptotically (rows are revisited
                # every epoch); the parity bridge test guards the resulting
                # quality statistically, not the projection exactly.
                corrupted = jnp.where(nhi != phi, nhi, nti)
                pair_a = jnp.concatenate([phi, pti, corrupted, n_entities + ri])
                fused = jnp.concatenate([ent, rel])
                a_rows = fused[pair_a]
                # All four pair groups share the chunk's relation ids, so the
                # (updated) W is gathered once [c, k, k] and reused 4×.
                w_upd = proj[ri]
                c = ri.shape[0]
                a4 = a_rows.reshape(4, c, a_rows.shape[-1])
                p4 = jnp.einsum("sbj,bji->sbi", a4, w_upd)
                n2 = jnp.sum(jnp.square(p4), axis=-1, keepdims=True)
                act = (n2 > 1.0) & viol4.reshape(4, c, 1)
                tmp = jnp.where(act, 2.0 * p4, 0.0)
                # W -= rate·Σ_groups outer(a, tmp): the reference applies the
                # four pair updates sequentially; summed here (scatter-add
                # accumulates duplicates exactly like the gradient block).
                d_w = -lr * jnp.einsum("sbj,sbi->bji", a4, tmp)
                proj = scatter.scatter_add(proj, ri, d_w, cfg.scatter_mode)
                w_new = w_upd + d_w
                a_new = a4 - lr * jnp.einsum("bji,sbi->sbj", w_new, tmp)
                delta = (a_new - a4).reshape(a_rows.shape)
                fused = scatter.scatter_add(
                    fused, pair_a, delta, cfg.scatter_mode
                )
                ent, rel = fused[:n_entities], fused[n_entities:]
            return (ent, rel, proj), lterm

        tabs = (params["entity"], params["relation"], params["proj"])
        if b <= chunk:
            # Single chunk (the epoch runner feeds chunk-sized mini-batches):
            # call the body directly — no inner scan, so the whole-epoch
            # program stays a single un-nested lax.scan.
            (ent, rel, proj), lterm = chunk_step(tabs, tuple(s[0] for s in slices))
            return {"entity": ent, "relation": rel, "proj": proj}, lterm
        (ent, rel, proj), lterms = jax.lax.scan(chunk_step, tabs, slices)
        return {"entity": ent, "relation": rel, "proj": proj}, jnp.sum(lterms)

    def sequential_update(self, params, batch: base.Batch, cfg: EmbeddingConfig) -> Tuple[base.Params, jax.Array]:
        impl = getattr(cfg, "parity_impl", "auto")
        if impl == "pallas" or (impl == "auto" and jax.default_backend() == "tpu"):
            # Fused sequential kernel: one Pallas program instead of B scan
            # steps (ops/pallas_update.py::transr_sequential_update).
            from kb2e_tpu.ops import pallas_update

            ent, rel, proj, loss = pallas_update.transr_sequential_update(
                params["entity"], params["relation"], params["proj"],
                batch["ph"], batch["pt"], batch["r"],
                batch["nh"], batch["nt"], batch["valid"],
                learning_rate=cfg.learning_rate, margin=cfg.margin,
                l1=(self.effective_distance(cfg.distance) == Distance.L1),
                max_iters=cfg.projection_max_iters,
                interpret=(jax.default_backend() != "tpu"),
            )
            return {"entity": ent, "relation": rel, "proj": proj}, loss
        snap_e, snap_r, snap_w = params["entity"], params["relation"], params["proj"]
        lr = cfg.learning_rate
        dist = self.effective_distance(cfg.distance)
        cap = cfg.projection_max_iters

        def gradient_update(tabs, h, t, r, beta):
            ent, rel, proj = tabs
            w = snap_w[r]
            he, te, rv = snap_e[h], snap_e[t], snap_r[r]
            x = 2.0 * (_dotp(te, w) - _dotp(he, w) - rv)
            if dist == Distance.L1:
                x = jnp.where(x > 0, 1.0, -1.0)
            proj = proj.at[r].add(-beta * lr * jnp.outer(he - te, x))
            wx = _dotp(w, x)
            ent = ent.at[h].add(-beta * lr * wx)
            ent = ent.at[t].add(beta * lr * wx)
            rel = rel.at[r].add(-beta * lr * x)

            rel = rel.at[r].set(projections.sphere_norm(rel[r]))
            ent = ent.at[h].set(projections.sphere_norm(ent[h]))
            ent = ent.at[t].set(projections.sphere_norm(ent[t]))
            proj = proj.at[r].set(projections.sphere_norm(proj[r]))

            a, wm = projections.transr_ball_project(ent[h], proj[r], lr, cap, exact_sequential=True)
            ent, proj = ent.at[h].set(a), proj.at[r].set(wm)
            a, wm = projections.transr_ball_project(ent[t], proj[r], lr, cap, exact_sequential=True)
            ent, proj = ent.at[t].set(a), proj.at[r].set(wm)
            # Intent of transr/trainer.cpp:187 (bug B2): constrain the relation vector.
            a, wm = projections.transr_ball_project(rel[r], proj[r], lr, cap, exact_sequential=True)
            rel, proj = rel.at[r].set(a), proj.at[r].set(wm)
            return ent, rel, proj

        def step(carry, sample):
            ent, rel, proj, loss = carry
            ph, pt, r, nh, nt, valid = sample
            w = snap_w[r]
            hp, tp = _dotp(snap_e[ph], w), _dotp(snap_e[pt], w)
            nhp, ntp = _dotp(snap_e[nh], w), _dotp(snap_e[nt], w)
            e_pos = distances.residual_energy(tp - hp - snap_r[r], dist)
            e_neg = distances.residual_energy(ntp - nhp - snap_r[r], dist)
            viol = (e_pos + cfg.margin > e_neg) & valid

            def apply(tabs):
                tabs = gradient_update(tabs, ph, pt, r, -1.0)
                tabs = gradient_update(tabs, nh, nt, r, +1.0)
                return tabs

            ent, rel, proj = jax.lax.cond(viol, apply, lambda tabs: tabs, (ent, rel, proj))
            loss = loss + jnp.where(viol, cfg.margin + e_pos - e_neg, 0.0)
            return (ent, rel, proj, loss), None

        samples = (batch["ph"], batch["pt"], batch["r"], batch["nh"], batch["nt"], batch["valid"])
        (ent, rel, proj, loss), _ = jax.lax.scan(
            step, (snap_e, snap_r, snap_w, jnp.float32(0.0)), samples
        )
        return {"entity": ent, "relation": rel, "proj": proj}, loss


def warm_start_params(
    params: base.Params,
    seed_entity: np.ndarray,
    seed_relation: np.ndarray,
) -> base.Params:
    """TransE warm start (transr/trainer.cpp:88-113): entities are loaded and
    sphere-normed; relations are loaded as-is; W stays identity."""
    ent = projections.sphere_norm(jnp.asarray(seed_entity, dtype=jnp.float32))
    rel = jnp.asarray(seed_relation, dtype=jnp.float32)
    return {**params, "entity": ent, "relation": rel}


MODEL = base.register(TransR())
