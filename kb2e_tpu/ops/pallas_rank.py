"""Pallas TPU kernel: fused rank-count sweep for link-prediction eval.

Computes, for a batch of queries, how many entities score strictly better
than the true entity — the count form of the reference's sort-and-scan
(common/evaluation.cpp:124-179, recast per survey §5.7) — in one pass over
the entity table with no [B, N] score matrix ever leaving VMEM.

Layout: both the (projected) entity table and the queries are passed
TRANSPOSED ([k, N] and [k, B]) so k-rows index the sublane axis.

L1 kernel: grid = (entity tiles, k-chunks).  Each step accumulates 8 k-rows
of |e − q| into a [B, TILE_N] VMEM scratch with 2-D broadcast ops (dynamic
sublane indexing and large 3-D broadcast intermediates both blow Mosaic's
compile time / scoped VMEM); the final k-chunk compares against the true
energies and accumulates the count.  Pallas double-buffers the tile DMAs
behind compute automatically.

L2 kernel: one [B,k]·[k,TILE_N] MXU matmul per tile via the expansion
‖q‖² + ‖e‖² − 2·q·e.

k and B must be padded by the caller: k to a multiple of 8 (zero-pad both
table and queries — zero rows contribute |0−0| = 0), B to a multiple of 8,
TILE_N a multiple of 128.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kb2e_tpu.constants import Distance

_CK = 8  # k-rows folded per grid step in the L1 kernel


def _beats_count(en, etrue_ref, tidx_ref, base_idx, tile_n):
    idx = base_idx + jax.lax.broadcasted_iota(jnp.int32, (1, tile_n), 1)
    e_true = etrue_ref[:]  # [B, 1]
    t_idx = tidx_ref[:]  # [B, 1]
    beats = (idx != t_idx) & ((en < e_true) | ((en == e_true) & (idx < t_idx)))
    return jnp.sum(beats.astype(jnp.int32), axis=1, keepdims=True)


def _rank_count_kernel_l1(qT_ref, etrue_ref, tidx_ref, eT_ref, out_ref, acc_ref):
    i = pl.program_id(0)
    kc = pl.program_id(1)
    nk = pl.num_programs(1)
    tile_n = eT_ref.shape[1]
    b = qT_ref.shape[1]

    @pl.when((i == 0) & (kc == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(kc == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for kk in range(_CK):  # static 2-D broadcast ops
        e_row = eT_ref[kk, :].reshape(1, tile_n)
        q_row = qT_ref[kk, :].reshape(b, 1)
        acc_ref[:] += jnp.abs(e_row - q_row)

    @pl.when(kc == nk - 1)
    def _():
        out_ref[:] += _beats_count(acc_ref[:], etrue_ref, tidx_ref, i * tile_n, tile_n)


def _rank_count_kernel_l2(qT_ref, etrue_ref, tidx_ref, eT_ref, esq_ref, qsq_ref, out_ref):
    i = pl.program_id(0)
    tile_n = eT_ref.shape[1]

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    cross = jax.lax.dot_general(
        qT_ref[:], eT_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, TILE_N] on the MXU
    en = jnp.maximum(qsq_ref[:] + esq_ref[:] - 2.0 * cross, 0.0)
    out_ref[:] += _beats_count(en, etrue_ref, tidx_ref, i * tile_n, tile_n)


def _pad_to(x, mult, axis, value=0.0):
    n = x.shape[axis]
    target = ((n + mult - 1) // mult) * mult
    if target == n:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - n)
    return jnp.pad(x, pads, constant_values=value)


@functools.partial(jax.jit, static_argnames=("distance", "tile_n", "interpret"))
def rank_counts(
    proj_t: jax.Array,  # [k, N_pad] transposed projected entity table
    queries_t: jax.Array,  # [k, B] transposed queries
    e_true: jax.Array,  # [B] true energies (same formula as the sweep)
    true_idx: jax.Array,  # int32 [B]
    distance: Distance,
    tile_n: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """int32 [B]: number of entities ranking before the true one."""
    k, n_pad = proj_t.shape
    b = queries_t.shape[1]
    assert n_pad % tile_n == 0, (n_pad, tile_n)

    proj_t = _pad_to(proj_t, _CK, 0)
    queries_t = _pad_to(queries_t, _CK, 0)
    b_pad = ((b + 7) // 8) * 8
    queries_t = _pad_to(queries_t, 8, 1)
    e_true_p = _pad_to(e_true.reshape(-1, 1).astype(jnp.float32), 8, 0, value=-1.0)
    true_idx_p = _pad_to(true_idx.reshape(-1, 1), 8, 0, value=-1)

    kp = proj_t.shape[0]
    out_spec = pl.BlockSpec((b_pad, 1), lambda *_: (0, 0), memory_space=pltpu.VMEM)

    if distance == Distance.L1:
        grid = (n_pad // tile_n, kp // _CK)
        counts = pl.pallas_call(
            _rank_count_kernel_l1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((_CK, b_pad), lambda i, kc: (kc, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b_pad, 1), lambda i, kc: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b_pad, 1), lambda i, kc: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_CK, tile_n), lambda i, kc: (kc, i), memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((b_pad, 1), jnp.int32),
            scratch_shapes=[pltpu.VMEM((b_pad, tile_n), jnp.float32)],
            interpret=interpret,
        )(queries_t, e_true_p, true_idx_p, proj_t)
    else:
        e_sq = jnp.sum(jnp.square(proj_t), axis=0).reshape(1, n_pad)  # [1, N_pad]
        q_sq = jnp.sum(jnp.square(queries_t), axis=0).reshape(-1, 1)  # [B_pad, 1]
        grid = (n_pad // tile_n,)
        counts = pl.pallas_call(
            _rank_count_kernel_l2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((kp, b_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((kp, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((b_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((b_pad, 1), jnp.int32),
            interpret=interpret,
        )(queries_t, e_true_p, true_idx_p, proj_t, e_sq, q_sq)

    return counts[:b, 0]
