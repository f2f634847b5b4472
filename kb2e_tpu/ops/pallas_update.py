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

Only the compute path is TransE; TransH/TransR parity stays on the scan path
(their per-sample constraint loops are data-dependent `while`s, a poor fit
for a fused kernel).
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
        rows, wrk, lacc, sems,  # scratch: VMEM rows, VMEM work row, SMEM loss, DMA sems
    ):
        i = pl.program_id(0)
        nb = pl.num_programs(0)

        @pl.when(i == 0)
        def _init():
            lacc[0, 0] = 0.0
            cp = pltpu.make_async_copy(ent_snap, ent_out, sems.at[5])
            cp.start()
            cp.wait()
            cp = pltpu.make_async_copy(rel_snap, rel_out, sems.at[5])
            cp.start()
            cp.wait()

        ph, pt, rr = ph_r[i], pt_r[i], r_r[i]
        nh, nt, valid = nh_r[i], nt_r[i], v_r[i]

        # Snapshot rows h, t, r, nh, nt → rows[0..4] (5 parallel DMAs).
        srcs = ((ent_snap, ph), (ent_snap, pt), (rel_snap, rr), (ent_snap, nh), (ent_snap, nt))
        dmas = []
        for slot, (tbl, idx) in enumerate(srcs):
            d = pltpu.make_async_copy(
                tbl.at[pl.ds(idx, 1), :], rows.at[pl.ds(slot, 1), :], sems.at[slot]
            )
            d.start()
            dmas.append(d)
        for d in dmas:
            d.wait()

        h, t, rv = rows[0:1, :], rows[1:2, :], rows[2:3, :]
        nhv, ntv = rows[3:4, :], rows[4:5, :]
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

        def add_row(tbl, idx, delta):
            d = pltpu.make_async_copy(
                tbl.at[pl.ds(idx, 1), :], wrk.at[pl.ds(0, 1), :], sems.at[0]
            )
            d.start()
            d.wait()
            wrk[0:1, :] = wrk[0:1, :] + delta
            d = pltpu.make_async_copy(
                wrk.at[pl.ds(0, 1), :], tbl.at[pl.ds(idx, 1), :], sems.at[0]
            )
            d.start()
            d.wait()

        def norm_row(tbl, idx):
            d = pltpu.make_async_copy(
                tbl.at[pl.ds(idx, 1), :], wrk.at[pl.ds(0, 1), :], sems.at[0]
            )
            d.start()
            d.wait()
            row = wrk[0:1, :]
            nrm = jnp.sqrt(jnp.sum(row * row))
            wrk[0:1, :] = jnp.where(nrm > 1.0, row / nrm, row)
            d = pltpu.make_async_copy(
                wrk.at[pl.ds(0, 1), :], tbl.at[pl.ds(idx, 1), :], sems.at[0]
            )
            d.start()
            d.wait()

        @pl.when(viol)
        def _update():
            lacc[0, 0] += margin + e_p - e_n
            # gradientUpdate(pos, corrupted=False): r,h += lr·x; t −= lr·x.
            x = grad(res_p)
            add_row(rel_out, rr, lr * x)
            add_row(ent_out, ph, lr * x)
            add_row(ent_out, pt, -lr * x)
            norm_row(rel_out, rr)
            norm_row(ent_out, ph)
            norm_row(ent_out, pt)
            # gradientUpdate(neg, corrupted=True): signs flipped.
            xn = grad(res_n)
            add_row(rel_out, rr, -lr * xn)
            add_row(ent_out, nh, -lr * xn)
            add_row(ent_out, nt, lr * xn)
            norm_row(rel_out, rr)
            norm_row(ent_out, nh)
            norm_row(ent_out, nt)

        @pl.when(i == nb - 1)
        def _emit():
            loss_out[0, 0] = lacc[0, 0]

    return kernel


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
            pltpu.VMEM((5, k), jnp.float32),
            pltpu.VMEM((1, k), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((6,)),
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
