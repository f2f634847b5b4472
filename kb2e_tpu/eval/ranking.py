"""Blockwise rank-against-all-entities evaluation core.

Reference algorithm (``common/evaluation.cpp:124-179``): for each test triple
and each corruption direction, score *all* entities, sort ascending, and scan:

* raw rank      = 1-based position of the true entity,
* filtered rank = 1 + number of entities ranked before the true one whose
  corrupted triple is NOT a known-good triple (train ∪ valid ∪ test).

Sorting is O(N log N) per query and materialises the full score row; on TPU
the rank is instead computed as a *count* (survey §5.7): with deterministic
index-order tie-breaking (quirk B9 — the reference's std::sort leaves ties
unspecified; we fix ties by entity id, i.e. stable-sort order),

  raw_rank(b)  = 1 + #{ j : E_j < E_true  or  (E_j = E_true and j < true) }

computed blockwise over entity tiles so the [B, N] score matrix is never
materialised.  The filtered correction subtracts the known-good entities
ranked before the true one; those come as per-query candidate lists prepared
host-side (they are tiny — the mean degree of (h, r) groups), so filtering
costs one extra gather instead of N membership tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from kb2e_tpu.constants import Distance
from kb2e_tpu.ops import distances

# Padding value guaranteeing a padded entity row never ranks before anything.
_PAD_VALUE = 1e30


def pad_entities(proj: jax.Array, block_size: int) -> jax.Array:
    """Pad the entity table's row axis to a multiple of ``block_size``."""
    n = proj.shape[0]
    padded = ((n + block_size - 1) // block_size) * block_size
    if padded == n:
        return proj
    pad = jnp.full((padded - n, proj.shape[1]), _PAD_VALUE, dtype=proj.dtype)
    return jnp.concatenate([proj, pad], axis=0)


def _beats(e_block: jax.Array, idx_block: jax.Array, e_true: jax.Array, true_idx: jax.Array) -> jax.Array:
    """Does entity j rank before the true entity (stable tie-break by id)?

    The self-comparison j == true is excluded explicitly rather than relying
    on E_j == E_true: the sweep may compute energies through a different
    floating-point path (the L2 matmul expansion) than the scalar true-energy
    evaluation, and the true entity must never outrank itself.
    """
    not_self = idx_block != true_idx[:, None]
    return not_self & (
        (e_block < e_true[:, None])
        | ((e_block == e_true[:, None]) & (idx_block < true_idx[:, None]))
    )


def _filtered_correction(
    proj_padded: jax.Array,
    queries: jax.Array,
    true_idx: jax.Array,
    filter_cands: jax.Array,
    e_true: jax.Array,
    distance: Distance,
) -> jax.Array:
    """# of known-good candidates ranked before the true entity (per query)."""
    cand = filter_cands  # [B, Kmax]
    cand_valid = (cand >= 0) & (cand != true_idx[:, None])
    safe_cand = jnp.maximum(cand, 0)
    cand_rows = proj_padded[safe_cand]  # [B, Kmax, k]
    e_cand = distances.residual_energy(cand_rows - queries[:, None, :], distance)
    cand_beats = _beats(e_cand, safe_cand, e_true, true_idx) & cand_valid
    return jnp.sum(cand_beats, axis=1, dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("distance", "block_size"))
def rank_queries(
    proj_padded: jax.Array,  # [N_pad, k] projected entity table (pre-padded)
    queries: jax.Array,  # [B, k] query points
    true_idx: jax.Array,  # int32 [B]
    filter_cands: jax.Array,  # int32 [B, Kmax] known-good entity ids, -1 padded
    distance: Distance,
    block_size: int,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (raw_rank, filtered_rank), both int32 [B], 1-based."""
    n_pad, k = proj_padded.shape
    n_blocks = n_pad // block_size

    # True energies: computed with the same formula as the sweep so that the
    # true entity's swept score compares exactly equal to e_true.
    e_true = distances.residual_energy(proj_padded[true_idx] - queries, distance)

    def body(blk, count):
        start = blk * block_size
        e_block_rows = jax.lax.dynamic_slice(proj_padded, (start, 0), (block_size, k))
        e_block = distances.pairwise_energy(e_block_rows, queries, distance)  # [B, blk]
        idx_block = start + jax.lax.broadcasted_iota(jnp.int32, (1, block_size), 1)
        beats = _beats(e_block, idx_block, e_true, true_idx)
        return count + jnp.sum(beats, axis=1, dtype=jnp.int32)

    raw_count = jax.lax.fori_loop(
        0, n_blocks, body, jnp.zeros(queries.shape[0], dtype=jnp.int32)
    )

    filt_correction = _filtered_correction(
        proj_padded, queries, true_idx, filter_cands, e_true, distance
    )
    raw_rank = 1 + raw_count
    filtered_rank = raw_rank - filt_correction
    return raw_rank, filtered_rank


@functools.partial(
    jax.jit, static_argnames=("distance", "block_size", "use_pallas", "interpret")
)
def rank_anchor_queries(
    proj_padded: jax.Array,  # [N_pad, k]
    rel_table: jax.Array,  # [R, k] relation vectors (projected space)
    anchor_idx: jax.Array,  # int32 [B] entity anchor per query
    sign: jax.Array,  # float32 [B] (+1 corrupt-tail, −1 corrupt-head)
    rels: jax.Array,  # int32 [B]
    true_idx: jax.Array,  # int32 [B]
    filter_cands: jax.Array,  # int32 [B, Kmax]
    distance: Distance,
    block_size: int,
    use_pallas: bool = False,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """One-dispatch variant: builds q = proj[anchor] ± r inside the jit and
    ranks — the eval harness's hot call (eager per-batch query construction
    is dispatch-latency-bound on remote backends)."""
    queries = proj_padded[anchor_idx] + sign[:, None] * rel_table[rels]
    if use_pallas:
        return rank_queries_pallas(
            proj_padded, queries, true_idx, filter_cands, distance, block_size,
            interpret=interpret,
        )
    return rank_queries(proj_padded, queries, true_idx, filter_cands, distance, block_size)


@functools.partial(
    jax.jit,
    static_argnames=("distance", "block_size", "batch", "kmax", "use_pallas", "interpret"),
)
def rank_feed_queries(
    proj_padded: jax.Array,  # [N_pad, k]
    rel_table: jax.Array,  # [R, k]
    q_anchor: jax.Array,  # int32 [Q_pad] — whole-eval feed, device-resident
    q_sign: jax.Array,  # float32 [Q_pad]
    q_rel: jax.Array,  # int32 [Q_pad]
    q_true: jax.Array,  # int32 [Q_pad]
    q_lo: jax.Array,  # int32 [Q_pad] offsets into filt_vals
    q_count: jax.Array,  # int32 [Q_pad] filter-candidate counts
    filt_vals: jax.Array,  # int32 [F] concatenated sorted known-good ids
    start,  # int32 scalar — batch start within the feed
    distance: Distance,
    block_size: int,
    batch: int,
    kmax: int,
    use_pallas: bool = False,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Device-feed variant of :func:`rank_anchor_queries`.

    The eval harness uploads ALL query data (anchors, signs, relations, true
    ids, filter-segment bounds and the flat sorted filter-candidate array)
    to the device once; each batch is then ONE dispatch carrying a scalar
    ``start`` — no per-batch host→device transfers, whose round-trips
    dominated eval wall time on tunneled backends (~55 ms/batch fixed cost
    measured in EVAL_MODELS_r04; the device work per batch is <1 ms).
    Candidate lists are built on device by gathering ``filt_vals`` at
    ``lo + iota`` masked by ``count`` — identical values to the host-side
    ``_FilterIndex.padded`` construction.
    """

    def sl(a):
        return jax.lax.dynamic_slice_in_dim(a, start, batch, 0)

    anchor, sign, rels = sl(q_anchor), sl(q_sign), sl(q_rel)
    true_idx, lo, cnt = sl(q_true), sl(q_lo), sl(q_count)
    iota = jnp.arange(kmax, dtype=jnp.int32)[None, :]
    pos = lo[:, None] + iota
    valid = iota < cnt[:, None]
    safe = jnp.minimum(pos, max(filt_vals.shape[0] - 1, 0))
    filter_cands = jnp.where(valid, filt_vals[safe], -1)
    queries = proj_padded[anchor] + sign[:, None] * rel_table[rels]
    if use_pallas:
        return rank_queries_pallas(
            proj_padded, queries, true_idx, filter_cands, distance, block_size,
            interpret=interpret,
        )
    return rank_queries(
        proj_padded, queries, true_idx, filter_cands, distance, block_size
    )


@functools.partial(jax.jit, static_argnames=("distance", "block_size", "interpret"))
def rank_queries_pallas(
    proj_padded: jax.Array,
    queries: jax.Array,
    true_idx: jax.Array,
    filter_cands: jax.Array,
    distance: Distance,
    block_size: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Pallas-kernel variant of :func:`rank_queries` (same contract).

    The raw count runs as the fused VMEM-resident sweep in
    :mod:`kb2e_tpu.ops.pallas_rank`; the filtered correction (tiny) stays in
    XLA.  ``interpret=True`` runs the kernel in interpreter mode for CPU
    testing.
    """
    from kb2e_tpu.ops import pallas_rank

    e_true = distances.residual_energy(proj_padded[true_idx] - queries, distance)
    raw_count = pallas_rank.rank_counts(
        proj_padded.T,
        queries.T,
        e_true,
        true_idx,
        distance,
        tile_n=block_size,
        interpret=interpret,
    )
    filt_correction = _filtered_correction(
        proj_padded, queries, true_idx, filter_cands, e_true, distance
    )
    raw_rank = 1 + raw_count
    return raw_rank, raw_rank - filt_correction
