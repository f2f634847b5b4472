"""Pallas TPU kernel: fused sequential TransE training update (parity mode).

The reference's hot loop processes ONE sample at a time with immediate
visibility of its writes inside the batch's ``*_next_`` buffer and a row
normalisation after every gradient update (``common/trainer.cpp:130-149``,
``transe/trainer.cpp:25-56``).  The JAX recast of those exact semantics is a
``lax.scan`` over samples (``models/transe.py::sequential_update``) — correct
everywhere but slow on TPU, where every scan step pays fixed scheduling cost.

This kernel executes the same semantics as ONE fused Pallas program: the TPU
grid is sequential by construction, so a grid step per sample can
read-modify-write table rows in HBM via async DMA without races.  Reads of
the scoring inputs come from the untouched batch-start snapshot (the
reference's double buffering); updates land in the output tables, which step
0 initialises as a bulk copy of the snapshot.

Update order per violating sample (margin + E(pos) > E(neg)) replicates
``transe/trainer.cpp:25-46``: apply the three signed row deltas of the
positive triple, ball-norm those rows, then the corrupted triple's three
deltas, ball-norm again.  Deltas are applied before any norm of the group so
self-loop triples (h == t) cancel exactly like the reference's accumulate-
then-norm.

TransH and TransR get the same treatment below
(:func:`transh_sequential_update`, :func:`transr_sequential_update`): their
data-dependent constraint loops (the orthogonality projector of
``common/utils.cpp:79-111`` and ``transRNorm`` of ``transr/trainer.cpp:34-64``)
are bounded by the same ``max_iters`` cap the scan path already uses
(ops/projections.py) and run as masked fixed-trip ``fori_loop``s in VMEM —
identical arithmetic on the iterations that execute, frozen carries after
convergence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(l1: bool, lr: float, margin: float, k: int):
    def kernel(
        ph_r, pt_r, r_r, nh_r, nt_r, v_r,  # scalar prefetch (SMEM int32 [B])
        ent_snap, rel_snap,  # ANY (HBM) — batch-start snapshot, read-only
        ent_out, rel_out, loss_out,  # outputs: tables (ANY) + loss (SMEM)
        rows, wrk, lacc, sems,  # scratch: VMEM rows, VMEM accumulator, SMEM loss, DMA sems
    ):
        i = pl.program_id(0)
        nb = pl.num_programs(0)

        def row_dmas(j, base):
            """Sample j's 5 snapshot rows (h, t, r, nh, nt) into rows slot
            ``base`` — snapshot reads are immutable, so sample j+1's rows
            stream in during sample j's update (cross-sample pipeline,
            same design as the TransH kernel)."""
            srcs = (
                (ent_snap, ph_r[j]), (ent_snap, pt_r[j]), (rel_snap, r_r[j]),
                (ent_snap, nh_r[j]), (ent_snap, nt_r[j]),
            )
            return [
                pltpu.make_async_copy(
                    tbl.at[pl.ds(idx, 1), :],
                    rows.at[pl.ds(base + slot, 1), :],
                    sems.at[base + slot],
                )
                for slot, (tbl, idx) in enumerate(srcs)
            ]

        @pl.when(i == 0)
        def _init():
            lacc[0, 0] = 0.0
            cp = pltpu.make_async_copy(ent_snap, ent_out, sems.at[12])
            cp.start()
            cp.wait()
            cp = pltpu.make_async_copy(rel_snap, rel_out, sems.at[12])
            cp.start()
            cp.wait()
            for d in row_dmas(0, 0):
                d.start()

        base = (i % 2) * 5

        @pl.when(i + 1 < nb)
        def _prefetch():
            for d in row_dmas(i + 1, ((i + 1) % 2) * 5):
                d.start()

        for d in row_dmas(i, base):
            d.wait()

        ph, pt, rr = ph_r[i], pt_r[i], r_r[i]
        nh, nt, valid = nh_r[i], nt_r[i], v_r[i]

        h = rows[pl.ds(base + 0, 1), :]
        t = rows[pl.ds(base + 1, 1), :]
        rv = rows[pl.ds(base + 2, 1), :]
        nhv = rows[pl.ds(base + 3, 1), :]
        ntv = rows[pl.ds(base + 4, 1), :]
        res_p = t - h - rv
        res_n = ntv - nhv - rv
        if l1:
            e_p, e_n = jnp.sum(jnp.abs(res_p)), jnp.sum(jnp.abs(res_n))
        else:
            e_p, e_n = jnp.sum(res_p * res_p), jnp.sum(res_n * res_n)
        viol = (e_p + margin > e_n) & (valid != 0)

        def grad(res):
            x = 2.0 * res
            if l1:
                x = jnp.where(x > 0, 1.0, -1.0)
            # Zero lanes past the true embedding dim: tables are padded to the
            # TPU lane tile (128) and L1's sign(0) = -1 would otherwise write
            # into the padding (and skew the row norms).
            lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            return jnp.where(lane < k, x, 0.0)

        # FUSED RMW (same design as the TransH kernel): the relation row is
        # VMEM-resident across both directions (wrk slot 0), the two entity
        # rows per direction in slots 1/2 with dynamic aliasing for h == t —
        # 10 row copies per violating sample instead of 24 read-modify-write
        # round trips, bitwise-identical arithmetic (deltas come from the
        # snapshot residuals; each touched row's own op order is preserved).

        def acc_copy(slot, tbl, idx, to_acc, sem):
            src = tbl.at[pl.ds(idx, 1), :]
            dst = wrk.at[pl.ds(slot, 1), :]
            if to_acc:
                return pltpu.make_async_copy(src, dst, sems.at[sem])
            return pltpu.make_async_copy(dst, src, sems.at[sem])

        def ball(row):
            nrm = jnp.sqrt(jnp.sum(row * row))
            return jnp.where(nrm > 1.0, row / nrm, row)

        def direction_update(res, h_idx, t_idx, beta):
            """gradientUpdate (transe/trainer.cpp:25-46): r,h −= β·lr·x;
            t += β·lr·x; then ball-norm the three touched rows."""
            distinct = h_idx != t_idx
            t_slot = jnp.where(distinct, 2, 1)
            dh = acc_copy(1, ent_out, h_idx, True, 13)
            dh.start()
            dt = acc_copy(2, ent_out, t_idx, True, 14)
            dt.start()
            dh.wait()
            dt.wait()

            x = grad(res)

            def rd(slot):
                return wrk[pl.ds(slot, 1), :]

            def wr(slot, val):
                wrk[pl.ds(slot, 1), :] = val

            wr(0, rd(0) + (-beta * lr) * x)
            wr(1, rd(1) + (-beta * lr) * x)
            wr(t_slot, rd(t_slot) + (beta * lr) * x)
            wr(0, ball(rd(0)))
            wr(1, ball(rd(1)))
            wr(t_slot, ball(rd(t_slot)))

            dh = acc_copy(1, ent_out, h_idx, False, 13)
            dh.start()
            dh.wait()

            @pl.when(distinct)
            def _wb_t():
                dt = acc_copy(2, ent_out, t_idx, False, 14)
                dt.start()
                dt.wait()

        @pl.when(viol)
        def _update():
            lacc[0, 0] += margin + e_p - e_n
            dr = acc_copy(0, rel_out, rr, True, 13)
            dr.start()
            dr.wait()
            direction_update(res_p, ph, pt, -1.0)
            direction_update(res_n, nh, nt, +1.0)
            dr = acc_copy(0, rel_out, rr, False, 13)
            dr.start()
            dr.wait()

        @pl.when(i == nb - 1)
        def _emit():
            loss_out[0, 0] = lacc[0, 0]

    return kernel


def _lane_mask(row, k_real):
    """Zero the padded lanes (columns >= k_real) of a [1, kp] row value."""
    lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    return jnp.where(lane < k_real, row, 0.0)


def _orthogonality_project_value(a, b, rate, max_iters):
    """VMEM-value orthogonality projector on [1, kp] rows — the exact
    arithmetic of ops/projections.py::orthogonality_project (itself parity
    with common/utils.cpp:79-111, including the non-reset ``sum``
    accumulator), as an EARLY-EXITING ``lax.while_loop``: the projector
    almost always converges on the first check (x ≤ 0.1), so a fixed
    16-trip masked loop wasted ~16× the serial VPU latency per call — six
    calls per violating sample made it the parity kernel's dominant cost.
    The data-dependent trip count runs on the TPU scalar core (same pattern
    as _transr_ball_value).  Bitwise-equal to the former masked fixed-trip
    loop: a converged check scales b by the accumulated sum exactly as the
    masked version's non-firing trip did (applied post-loop, only when the
    exit cause was convergence, not the trip cap)."""
    b = b / jnp.sqrt(jnp.sum(b * b))

    def check(a, b, s):
        s_new = s + jnp.sum(b * b)
        b_scaled = b / jnp.sqrt(s_new)
        return jnp.sum(b_scaled * a) > 0.1

    def cond(carry):
        it, a, b, s = carry
        return check(a, b, s) & (it < max_iters)

    def body(carry):
        it, a, b, s = carry
        s_new = s + jnp.sum(b * b)
        s_sqrt = jnp.sqrt(s_new)
        b_scaled = b / s_sqrt
        a2 = a - rate * b_scaled
        b2 = b_scaled - rate * a2
        return it + 1, a2, b2, s_sqrt

    it, a, b, s = jax.lax.while_loop(cond, body, (0, a, b, jnp.float32(0.0)))
    # Converged exit: the masked loop's non-firing trip still set
    # b = b / sqrt(s + Σb²); reproduce it.  Cap exit (it == max_iters):
    # the masked loop's b stayed at the last fired trip's value.
    converged = it < max_iters
    b = jnp.where(converged, b / jnp.sqrt(s + jnp.sum(b * b)), b)
    return a, b / jnp.sqrt(jnp.sum(b * b))


def _make_transh_kernel(lr: float, margin: float, k: int, max_iters: int):
    def kernel(
        ph_r, pt_r, r_r, nh_r, nt_r, v_r,  # scalar prefetch (SMEM int32 [B])
        ent_snap, rel_snap, norm_snap,  # ANY (HBM) — batch-start snapshot
        ent_out, rel_out, norm_out, loss_out,  # outputs
        rows, wrk, lacc, sems,  # scratch
    ):
        i = pl.program_id(0)
        nb = pl.num_programs(0)

        def row_dmas(j, base):
            """The 6 snapshot-row copies of sample ``j`` into rows slot
            ``base`` (h, t, r, w, nh, nt).  Reads come from the IMMUTABLE
            batch-start snapshot (writes go to *_out), so sample j+1's rows
            can be fetched while sample j's update chain runs — the
            cross-sample software pipeline (VERDICT r04 item 9)."""
            srcs = (
                (ent_snap, ph_r[j]), (ent_snap, pt_r[j]), (rel_snap, r_r[j]),
                (norm_snap, r_r[j]), (ent_snap, nh_r[j]), (ent_snap, nt_r[j]),
            )
            return [
                pltpu.make_async_copy(
                    tbl.at[pl.ds(idx, 1), :],
                    rows.at[pl.ds(base + slot, 1), :],
                    sems.at[base + slot],
                )
                for slot, (tbl, idx) in enumerate(srcs)
            ]

        @pl.when(i == 0)
        def _init():
            lacc[0, 0] = 0.0
            for src, dst in ((ent_snap, ent_out), (rel_snap, rel_out), (norm_snap, norm_out)):
                cp = pltpu.make_async_copy(src, dst, sems.at[14])
                cp.start()
                cp.wait()
            # Prime the pipeline: sample 0's rows into slot 0.
            for d in row_dmas(0, 0):
                d.start()

        base = (i % 2) * 6

        # Start sample i+1's fetches into the OTHER slot before consuming
        # sample i — they overlap i's wait and its whole RMW update chain.
        @pl.when(i + 1 < nb)
        def _prefetch():
            for d in row_dmas(i + 1, ((i + 1) % 2) * 6):
                d.start()

        for d in row_dmas(i, base):
            d.wait()

        ph, pt, rr = ph_r[i], pt_r[i], r_r[i]
        nh, nt, valid = nh_r[i], nt_r[i], v_r[i]

        he = rows[pl.ds(base + 0, 1), :]
        te = rows[pl.ds(base + 1, 1), :]
        rv = rows[pl.ds(base + 2, 1), :]
        w = rows[pl.ds(base + 3, 1), :]
        nhv = rows[pl.ds(base + 4, 1), :]
        ntv = rows[pl.ds(base + 5, 1), :]

        def residual(h_row, t_row):
            hs = jnp.sum(w * h_row)
            ts = jnp.sum(w * t_row)
            return (t_row - ts * w) - (h_row - hs * w) - rv, hs, ts

        res_p, hs_p, ts_p = residual(he, te)
        res_n, hs_n, ts_n = residual(nhv, ntv)
        # L1 only (quirk B5) — padded lanes are exactly zero in every operand.
        e_p = jnp.sum(jnp.abs(res_p))
        e_n = jnp.sum(jnp.abs(res_n))
        viol = (e_p + margin > e_n) & (valid != 0)

        def ball(row):
            n = jnp.sqrt(jnp.sum(row * row))
            return jnp.where(n > 1.0, row / n, row)

        def sphere(row):
            return row / jnp.sqrt(jnp.sum(row * row))

        # FUSED RMW (r05): the reference's per-sample chain touches only four
        # rows — rel[rr] (R), norm[rr] (W), ent[h], ent[t] — and every
        # cross-row interaction goes through W.  R/W live in the ``wrk``
        # accumulator for the WHOLE violating sample (slots 0/1) and the
        # entity rows per gradient_update (slots 2/3); each row is DMA'd
        # once in and once out — 12 row copies per violating sample instead
        # of the former 62 read-modify-write round trips, with bitwise
        # identical arithmetic (grad deltas come from the immutable SNAPSHOT
        # residuals, so only the touched rows' own sequential op order
        # matters, and that order is preserved on the VMEM values).
        # h == t aliasing (reference applies both roles to one row
        # sequentially): T's ops are routed to H's slot via a dynamic slot
        # index, reproducing the double-application exactly; T's write-back
        # is skipped.  wrk is [4, kp]: 0=R, 1=W, 2=H, 3=T.

        def acc_copy(slot, tbl, idx, to_acc, sem):
            src = tbl.at[pl.ds(idx, 1), :]
            dst = wrk.at[pl.ds(slot, 1), :]
            if to_acc:
                return pltpu.make_async_copy(src, dst, sems.at[sem])
            return pltpu.make_async_copy(dst, src, sems.at[sem])

        def gradient_update(res, h_row, t_row, hs, ts, h_idx, t_idx, beta):
            """transh/trainer.cpp:11-58 for one (h, t, r) with sign beta,
            on VMEM-resident rows (R/W already loaded by _update)."""
            distinct = h_idx != t_idx
            t_slot = jnp.where(distinct, 3, 2)
            dh = acc_copy(2, ent_out, h_idx, True, 12)
            dh.start()
            dt = acc_copy(3, ent_out, t_idx, True, 13)
            dt.start()
            dh.wait()
            dt.wait()

            x = _lane_mask(jnp.where(2.0 * res > 0, 1.0, -1.0), k)
            sum_x = jnp.sum(x * w)
            dw = beta * lr * (x * (hs - ts) + sum_x * (h_row - t_row))

            def rd(slot):
                return wrk[pl.ds(slot, 1), :]

            def wr(slot, val):
                wrk[pl.ds(slot, 1), :] = val

            # Reference op order, each step reading the current VMEM value.
            wr(0, rd(0) + (-beta * lr) * x)  # R += …
            wr(2, rd(2) + (-beta * lr) * x)  # H += …
            wr(t_slot, rd(t_slot) + (beta * lr) * x)  # T += …
            wr(1, rd(1) + dw)  # W += dw
            wr(0, ball(rd(0)))
            wr(2, ball(rd(2)))
            wr(t_slot, ball(rd(t_slot)))
            wr(1, sphere(rd(1)))
            for a_slot in (0, 2, t_slot):
                a_new, b_new = _orthogonality_project_value(
                    rd(a_slot), rd(1), lr, max_iters
                )
                wr(a_slot, a_new)
                wr(1, b_new)

            dh = acc_copy(2, ent_out, h_idx, False, 12)
            dh.start()
            dh.wait()

            @pl.when(distinct)
            def _wb_t():
                dt = acc_copy(3, ent_out, t_idx, False, 13)
                dt.start()
                dt.wait()

        @pl.when(viol)
        def _update():
            lacc[0, 0] += margin + e_p - e_n
            dr = acc_copy(0, rel_out, rr, True, 12)
            dr.start()
            dwm = acc_copy(1, norm_out, rr, True, 13)
            dwm.start()
            dr.wait()
            dwm.wait()
            gradient_update(res_p, he, te, hs_p, ts_p, ph, pt, -1.0)
            gradient_update(res_n, nhv, ntv, hs_n, ts_n, nh, nt, +1.0)
            dr = acc_copy(0, rel_out, rr, False, 12)
            dr.start()
            dwm = acc_copy(1, norm_out, rr, False, 13)
            dwm.start()
            dr.wait()
            dwm.wait()

        @pl.when(i == nb - 1)
        def _emit():
            loss_out[0, 0] = lacc[0, 0]

    return kernel


def _transr_ball_value(a, wt, rate, max_iters):
    """``transRNorm`` (transr/trainer.cpp:34-64) on a [1, kp] row value and
    the TRANSPOSED matrix wt [kp, kp] (wt[i, j] = W[j, i]) so the reference's
    sequential output-dim loop touches SUBLANE rows.

    Mosaic has no value-level dynamic_slice and ``while_loop`` bodies must
    not mutate refs, so the inner loop avoids dynamic indexing entirely:
    each trip reads row 0 STATICALLY and rotates the matrix up one row;
    after kp trips the matrix is back in alignment.  The pad rows (≥ k_real)
    are exactly zero, which makes their trips arithmetic no-ops (tmp = 0),
    so no live-mask is needed — zero pads must be preserved by every caller.

    Exact-sequential parity with ops/projections.py::transr_ball_project
    (exact_sequential=True): output dims i update in order, each reading the
    ``a`` mutated by previous i's; the outer loop runs while ``‖a·W‖² > 1``
    up to ``max_iters``, exiting early like the reference (a real
    ``lax.while_loop`` — the TPU scalar core handles the data-dependent
    trip count)."""
    kp = a.shape[1]

    def cond(carry):
        it, a, wt = carry
        # proj_i = Σ_j a_j W[j,i] = Σ_j a_j wt[i,j]  (one [1,kp]·[kp,kp] MXU op)
        proj = jax.lax.dot_general(a, wt, (((1,), (1,)), ((), ())),
                                   precision=jax.lax.Precision.HIGHEST)
        return (jnp.sum(proj * proj) > 1.0) & (it < max_iters)

    def body(carry):
        it, a, wt = carry

        def per_i(_, carry):
            a, wt = carry
            wcol = wt[0:1, :]  # W[:, i] of the current rotation
            tmp = 2.0 * jnp.sum(wcol * a)
            wcol = wcol - rate * tmp * a
            a = a - rate * tmp * wcol
            wt = jnp.concatenate([wt[1:, :], wcol], axis=0)  # rotate up
            return a, wt

        a, wt = jax.lax.fori_loop(0, kp, per_i, (a, wt))
        return it + 1, a, wt

    _, a, wt = jax.lax.while_loop(cond, body, (jnp.int32(0), a, wt))
    return a, wt


def _make_transr_kernel(l1: bool, lr: float, margin: float, k: int, max_iters: int):
    def kernel(
        ph_r, pt_r, r_r, nh_r, nt_r, v_r,  # scalar prefetch (SMEM int32 [B])
        ent_snap, rel_snap, proj_snap,  # ANY (HBM) — batch-start snapshot
        ent_out, rel_out, proj_out, loss_out,  # outputs
        rows, wsnap, wblk, wrk, lacc, sems,  # scratch
    ):
        i = pl.program_id(0)
        nb = pl.num_programs(0)
        kp = wrk.shape[1]

        def row_dmas(j, base):
            """Sample j's snapshot rows (h, t, r, nh, nt) + its W_r matrix
            into double-buffer slot ``base`` (0 or 1) — all read from the
            immutable batch-start snapshot, so sample j+1's data streams in
            during sample j's update (cross-sample pipeline)."""
            srcs = (
                (ent_snap, ph_r[j]), (ent_snap, pt_r[j]), (rel_snap, r_r[j]),
                (ent_snap, nh_r[j]), (ent_snap, nt_r[j]),
            )
            ds = [
                pltpu.make_async_copy(
                    tbl.at[pl.ds(idx, 1), :],
                    rows.at[pl.ds(base * 5 + slot, 1), :],
                    sems.at[base * 5 + slot],
                )
                for slot, (tbl, idx) in enumerate(srcs)
            ]
            ds.append(
                pltpu.make_async_copy(
                    proj_snap.at[pl.ds(r_r[j], 1), :, :],
                    wsnap.at[pl.ds(base, 1), :, :],
                    sems.at[10 + base],
                )
            )
            return ds

        @pl.when(i == 0)
        def _init():
            lacc[0, 0] = 0.0
            for src, dst in ((ent_snap, ent_out), (rel_snap, rel_out), (proj_snap, proj_out)):
                cp = pltpu.make_async_copy(src, dst, sems.at[12])
                cp.start()
                cp.wait()
            for d in row_dmas(0, 0):
                d.start()

        base = i % 2

        @pl.when(i + 1 < nb)
        def _prefetch():
            for d in row_dmas(i + 1, (i + 1) % 2):
                d.start()

        for d in row_dmas(i, base):
            d.wait()

        ph, pt, rr = ph_r[i], pt_r[i], r_r[i]
        nh, nt, valid = nh_r[i], nt_r[i], v_r[i]

        rb = base * 5
        he = rows[pl.ds(rb + 0, 1), :]
        te = rows[pl.ds(rb + 1, 1), :]
        rv = rows[pl.ds(rb + 2, 1), :]
        nhv = rows[pl.ds(rb + 3, 1), :]
        ntv = rows[pl.ds(rb + 4, 1), :]
        w = wsnap[pl.ds(base, 1), :, :][0]  # [kp, kp] — snapshot W_r [j, i]

        def project(row):
            # (row·W)_i — contraction over j rides the MXU.
            return jax.lax.dot_general(row, w, (((1,), (0,)), ((), ())),
                                       precision=jax.lax.Precision.HIGHEST)

        res_p = project(te) - project(he) - rv
        res_n = project(ntv) - project(nhv) - rv
        if l1:
            e_p, e_n = jnp.sum(jnp.abs(res_p)), jnp.sum(jnp.abs(res_n))
        else:
            e_p, e_n = jnp.sum(res_p * res_p), jnp.sum(res_n * res_n)
        viol = (e_p + margin > e_n) & (valid != 0)

        def sphere(row):
            return row / jnp.sqrt(jnp.sum(row * row))

        # FUSED RMW (same design as the TransE/TransH kernels): W_r and the
        # relation row are VMEM-resident across BOTH directions (wblk and
        # wrk slot 0); the two entity rows per direction live in wrk slots
        # 1/2 with dynamic aliasing for h == t.  Per violating sample: 2 W
        # copies + 10 row copies instead of 4 + 40.

        def acc_copy(slot, tbl, idx, to_acc, sem):
            src = tbl.at[pl.ds(idx, 1), :]
            dst = wrk.at[pl.ds(slot, 1), :]
            if to_acc:
                return pltpu.make_async_copy(src, dst, sems.at[sem])
            return pltpu.make_async_copy(dst, src, sems.at[sem])

        def rd(slot):
            return wrk[pl.ds(slot, 1), :]

        def wr(slot, val):
            wrk[pl.ds(slot, 1), :] = val

        def ball_pair(slot):
            """Coupled ‖a·W‖ ≤ 1 on (wrk[slot], wblk) — VMEM-resident."""
            a_new, wt_new = _transr_ball_value(
                rd(slot), jnp.transpose(wblk[0]), lr, max_iters
            )
            wr(slot, a_new)
            wblk[0] = jnp.transpose(wt_new)

        def gradient_update(res, h_row, t_row, h_idx, t_idx, beta):
            """transr/trainer.cpp:144-191 for one (h, t, r) with sign beta;
            gradients read the batch snapshot (h_row/t_row/w), writes apply
            sequentially to the VMEM-resident rows."""
            distinct = h_idx != t_idx
            t_slot = jnp.where(distinct, 2, 1)
            dh = acc_copy(1, ent_out, h_idx, True, 13)
            dh.start()
            dt = acc_copy(2, ent_out, t_idx, True, 14)
            dt.start()
            dh.wait()
            dt.wait()

            x = 2.0 * res
            if l1:
                x = jnp.where(x > 0, 1.0, -1.0)
            lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            x = jnp.where(lane < k, x, 0.0)

            # W −= β·lr·outer(h−t, x): contract the length-1 leading dims.
            outer = jax.lax.dot_general(h_row - t_row, x, (((0,), (0,)), ((), ())),
                                        precision=jax.lax.Precision.HIGHEST)
            # (W x)_j = Σ_i W[j,i] x_i — contract x's lane axis with W's i axis.
            wx = jax.lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                                     precision=jax.lax.Precision.HIGHEST)

            wblk[0] = wblk[0] + (-beta * lr) * outer
            wr(1, rd(1) + (-beta * lr) * wx)
            wr(t_slot, rd(t_slot) + (beta * lr) * wx)
            wr(0, rd(0) + (-beta * lr) * x)

            # Constraints (transr/trainer.cpp:174-191): sphere the touched
            # e/r rows and every row of W_r, then the sequential transRNorm
            # on (h, W), (t, W) and the relation vector — the reference's
            # bug-B2 third call recast to its intent (models/transr.py:162).
            wr(0, sphere(rd(0)))
            wr(1, sphere(rd(1)))
            wr(t_slot, sphere(rd(t_slot)))
            wb = wblk[0]
            nrm = jnp.sqrt(jnp.sum(wb * wb, axis=1, keepdims=True))
            sub = jax.lax.broadcasted_iota(jnp.int32, wb.shape, 0)
            wblk[0] = jnp.where(sub < k, wb / nrm, 0.0)
            ball_pair(1)
            ball_pair(t_slot)
            ball_pair(0)

            dh = acc_copy(1, ent_out, h_idx, False, 13)
            dh.start()
            dh.wait()

            @pl.when(distinct)
            def _wb_t():
                dt = acc_copy(2, ent_out, t_idx, False, 14)
                dt.start()
                dt.wait()

        @pl.when(viol)
        def _update():
            lacc[0, 0] += margin + e_p - e_n
            dr = acc_copy(0, rel_out, rr, True, 13)
            dr.start()
            dw_in = pltpu.make_async_copy(
                proj_out.at[pl.ds(rr, 1), :, :], wblk, sems.at[14]
            )
            dw_in.start()
            dr.wait()
            dw_in.wait()
            gradient_update(res_p, he, te, ph, pt, -1.0)
            gradient_update(res_n, nhv, ntv, nh, nt, +1.0)
            dr = acc_copy(0, rel_out, rr, False, 13)
            dr.start()
            dw_out = pltpu.make_async_copy(
                wblk, proj_out.at[pl.ds(rr, 1), :, :], sems.at[14]
            )
            dw_out.start()
            dr.wait()
            dw_out.wait()

        @pl.when(i == nb - 1)
        def _emit():
            loss_out[0, 0] = lacc[0, 0]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("learning_rate", "margin", "l1", "max_iters", "interpret"),
)
def transr_sequential_update(
    entity: jax.Array,  # [N, k] float32 — batch-start snapshot
    relation: jax.Array,  # [R, k]
    proj: jax.Array,  # [R, k, k] projection matrices, layout [j, i]
    ph: jax.Array,
    pt: jax.Array,
    r: jax.Array,
    nh: jax.Array,
    nt: jax.Array,
    valid: jax.Array,
    learning_rate: float,
    margin: float,
    l1: bool,
    max_iters: int,
    interpret: bool = False,
):
    """(entity', relation', proj', loss) with reference-sequential semantics
    (transr/trainer.cpp:118-191 per violating sample, double-buffered reads)."""
    n, k_real = entity.shape
    b = ph.shape[0]
    k = max(128, -(-k_real // 128) * 128)
    entity = jnp.pad(entity.astype(jnp.float32), ((0, 0), (0, k - k_real)))
    relation = jnp.pad(relation.astype(jnp.float32), ((0, 0), (0, k - k_real)))
    proj = jnp.pad(
        proj.astype(jnp.float32),
        ((0, 0), (0, k - k_real), (0, k - k_real)),
    )
    kernel = _make_transr_kernel(
        l1, float(learning_rate), float(margin), k_real, max_iters
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[
            # Double-buffered snapshot row slots: [2 samples × 5 rows, k].
            pltpu.VMEM((10, k), jnp.float32),
            # Double-buffered snapshot W_r matrices (prefetched per sample).
            pltpu.VMEM((2, k, k), jnp.float32),
            # Working W_r (RMW-resident across the whole violating sample).
            pltpu.VMEM((1, k, k), jnp.float32),
            # Fused-RMW accumulator: 0=rel, 1=h, 2=t.
            pltpu.VMEM((3, k), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
            # 0-9 row slots, 10-11 W snapshots, 12 init, 13-14 accumulator.
            pltpu.SemaphoreType.DMA((15,)),
        ],
    )
    ent_out, rel_out, proj_out, loss = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, k), jnp.float32),
            jax.ShapeDtypeStruct(relation.shape, jnp.float32),
            jax.ShapeDtypeStruct(proj.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(
        ph.astype(jnp.int32),
        pt.astype(jnp.int32),
        r.astype(jnp.int32),
        nh.astype(jnp.int32),
        nt.astype(jnp.int32),
        valid.astype(jnp.int32),
        entity,
        relation,
        proj,
    )
    return (
        ent_out[:, :k_real],
        rel_out[:, :k_real],
        proj_out[:, :k_real, :k_real],
        loss[0, 0],
    )


@functools.partial(
    jax.jit, static_argnames=("learning_rate", "margin", "max_iters", "interpret")
)
def transh_sequential_update(
    entity: jax.Array,  # [N, k] float32 — batch-start snapshot
    relation: jax.Array,  # [R, k]
    norm: jax.Array,  # [R, k] hyperplane normals
    ph: jax.Array,
    pt: jax.Array,
    r: jax.Array,
    nh: jax.Array,
    nt: jax.Array,
    valid: jax.Array,
    learning_rate: float,
    margin: float,
    max_iters: int,
    interpret: bool = False,
):
    """(entity', relation', norm', loss) with reference-sequential semantics
    (transh/trainer.cpp:11-58 per violating sample, double-buffered reads)."""
    n, k_real = entity.shape
    b = ph.shape[0]
    k = max(128, -(-k_real // 128) * 128)
    pad = ((0, 0), (0, k - k_real))
    entity = jnp.pad(entity.astype(jnp.float32), pad)
    relation = jnp.pad(relation.astype(jnp.float32), pad)
    norm = jnp.pad(norm.astype(jnp.float32), pad)
    kernel = _make_transh_kernel(float(learning_rate), float(margin), k_real, max_iters)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[
            # Double-buffered row slots: [2 samples × 6 rows, k] — sample
            # i+1's snapshot rows stream in while sample i's update runs.
            pltpu.VMEM((12, k), jnp.float32),
            # Fused-RMW accumulator: 0=rel, 1=w, 2=h, 3=t (see kernel).
            pltpu.VMEM((4, k), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
            # 0-11 row-slot DMAs, 12-13 accumulator copies, 14 init copies.
            pltpu.SemaphoreType.DMA((15,)),
        ],
    )
    ent_out, rel_out, norm_out, loss = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, k), jnp.float32),
            jax.ShapeDtypeStruct(relation.shape, jnp.float32),
            jax.ShapeDtypeStruct(norm.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(
        ph.astype(jnp.int32),
        pt.astype(jnp.int32),
        r.astype(jnp.int32),
        nh.astype(jnp.int32),
        nt.astype(jnp.int32),
        valid.astype(jnp.int32),
        entity,
        relation,
        norm,
    )
    return ent_out[:, :k_real], rel_out[:, :k_real], norm_out[:, :k_real], loss[0, 0]


@functools.partial(
    jax.jit, static_argnames=("learning_rate", "margin", "l1", "interpret")
)
def transe_sequential_update(
    entity: jax.Array,  # [N, k] float32 — batch-start snapshot
    relation: jax.Array,  # [R, k]
    ph: jax.Array,  # int32 [B]
    pt: jax.Array,
    r: jax.Array,
    nh: jax.Array,
    nt: jax.Array,
    valid: jax.Array,  # bool [B]
    learning_rate: float,
    margin: float,
    l1: bool,
    interpret: bool = False,
):
    """Returns (entity', relation', loss) with reference-sequential semantics."""
    n, k_real = entity.shape
    b = ph.shape[0]
    # Mosaic only DMAs lane-dim slices aligned to the 128-wide tile: pad the
    # embedding dim up (zero columns stay zero — grads are lane-masked).
    k = max(128, -(-k_real // 128) * 128)
    entity = jnp.pad(entity.astype(jnp.float32), ((0, 0), (0, k - k_real)))
    relation = jnp.pad(relation.astype(jnp.float32), ((0, 0), (0, k - k_real)))
    kernel = _make_kernel(l1, float(learning_rate), float(margin), k_real)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            # Double-buffered snapshot row slots: [2 samples × 5 rows, k].
            pltpu.VMEM((10, k), jnp.float32),
            # Fused-RMW accumulator: 0=rel, 1=h, 2=t (see kernel).
            pltpu.VMEM((3, k), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
            # 0-9 row-slot DMAs, 12 init copies, 13-14 accumulator copies.
            pltpu.SemaphoreType.DMA((15,)),
        ],
    )
    ent_out, rel_out, loss = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, k), jnp.float32),
            jax.ShapeDtypeStruct(relation.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(
        ph.astype(jnp.int32),
        pt.astype(jnp.int32),
        r.astype(jnp.int32),
        nh.astype(jnp.int32),
        nt.astype(jnp.int32),
        valid.astype(jnp.int32),
        entity,
        relation,
    )
    return ent_out[:, :k_real], rel_out[:, :k_real], loss[0, 0]
