"""Cluster-aware rank sweep for CTransR.

CTransR scores a pair (h, t) under relation r with the cluster vector
r_{r,c} of the cluster nearest to the pair's entity-space offset (see
kb2e_tpu/models/ctransr.py).  During rank-against-all evaluation the cluster
therefore depends on the *candidate*: for corrupt-tail, candidate j has
offset e_j − e_h; for corrupt-head, e_t − e_j.

Blockwise computation without materialising [B, N, C, k]:
  argmin_c ‖o − ce_c‖²  =  argmin_c ( −2·o·ce_c + ‖ce_c‖² ),
with o = s·(e_j − e_a) (s = ±1 per direction), so the assignment score
decomposes into a per-candidate term u[j,c] = e_j·ce_c (one [N,k]·[k,C]
matmul per relation) and a per-query term v[b,c] = e_a·ce_c.  Energies are
computed per cluster (C query vectors per query) and gathered by the
assignment — C is small (default 4).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from kb2e_tpu.constants import Distance
from kb2e_tpu.ops import distances


def _assign(u_block, v, sign, ce_sq):
    """Cluster ids [B, Nb] from u[Nb,C], v[B,C], sign [B], ce_sq [C]."""
    s = sign[:, None, None]
    score = -2.0 * s * u_block[None, :, :] + 2.0 * s * v[:, None, :] + ce_sq[None, None, :]
    return jnp.argmin(score, axis=-1)  # [B, Nb]


def routed_energy(
    rows_p, rows_e, anchor_proj, v, sign, ce_sq, cluster_vecs, centers, distance
):
    """Cluster-routed energies of gathered candidate rows.

    ``rows_p``/``rows_e`` are [B, k] or [B, K, k] (projected / raw rows of the
    candidates); anchors are per-query.  Each candidate picks the cluster
    whose center is nearest its offset to the anchor, then scores against
    that cluster's relation vector.  Shared by the local and the sharded
    (parallel/eval.py) rank sweeps so routing semantics cannot drift.
    """
    u = jnp.einsum("...k,ck->...c", rows_e, centers)
    if rows_p.ndim == 2:
        s = sign[:, None]
        vv = v
        anchor = anchor_proj
    else:
        s = sign[:, None, None]
        vv = v[:, None, :]
        anchor = anchor_proj[:, None, :]
    score = -2.0 * s * u + 2.0 * s * vv + ce_sq
    cid = jnp.argmin(score, axis=-1)  # [B] or [B, K]
    q = anchor + jnp.squeeze(s, -1)[..., None] * cluster_vecs[cid]
    return distances.residual_energy(rows_p - q, distance)


def routed_block_energy(rows_p, queries_c, cid, distance):
    """[B, Nb] routed energies for one candidate block: each (query,
    candidate) pair scores against its assigned cluster's query vector.

    L1 (the hot path): ONE fused sweep — the routed query vector is selected
    per element (C−1 ``where``s over [B, Nb, k]) and a single abs-diff
    reduce follows.  This replaces the r04 masked accumulate of C full
    per-cluster sweeps (~3·C elementwise ops/element) with ~(C+2)
    ops/element — measured ~2× less VPU work at C=4, and one pass over the
    broadcast temp instead of C.  Selecting q before the reduce is
    bit-identical to selecting the per-cluster energies after it (same row
    and query values, same k-reduction order).

    L2 rides the MXU: per-cluster matmul-expansion sweeps stay cheap, so
    keep the masked accumulate over C energy matrices (a per-element gather
    via take_along_axis measured ~10× slower than the sweep on TPU).

    Shared by the local (rank_queries_clustered), segmented
    (eval/harness.py::_rank_seg_clustered) and sharded
    (parallel/eval.py) sweeps so routing semantics cannot drift.
    """
    c = queries_c.shape[1]
    if distance == Distance.L1:
        qsel = jnp.broadcast_to(
            queries_c[:, 0, None, :],
            (queries_c.shape[0], cid.shape[1], queries_c.shape[2]),
        )
        for ci in range(1, c):
            qsel = jnp.where(
                (cid == ci)[:, :, None], queries_c[:, ci, None, :], qsel
            )
        return jnp.sum(jnp.abs(rows_p[None, :, :] - qsel), axis=-1)
    en = distances.pairwise_energy(rows_p, queries_c[:, 0, :], distance)
    for ci in range(1, c):
        e_c = distances.pairwise_energy(rows_p, queries_c[:, ci, :], distance)
        en = jnp.where(cid == ci, e_c, en)
    return en


@functools.partial(jax.jit, static_argnames=("distance", "block_size"))
def rank_queries_clustered(
    proj_padded: jax.Array,  # [N_pad, k] entity table projected by W_r
    entity_padded: jax.Array,  # [N_pad, k] raw entity table (offset space)
    anchor_proj: jax.Array,  # [B, k] projected anchor rows (P_h or P_t)
    anchor_raw: jax.Array,  # [B, k] raw anchor rows (e_h or e_t)
    sign: jax.Array,  # [B] +1 corrupt-tail, −1 corrupt-head
    cluster_vecs: jax.Array,  # [C, k] r_{r,c}
    centers: jax.Array,  # [C, k] offset-space cluster centers
    true_idx: jax.Array,  # int32 [B]
    filter_cands: jax.Array,  # int32 [B, Kmax]
    distance: Distance,
    block_size: int,
) -> Tuple[jax.Array, jax.Array]:
    """Raw + filtered 1-based ranks, cluster-routed energies."""
    n_pad, k = proj_padded.shape
    n_blocks = n_pad // block_size
    b = anchor_proj.shape[0]
    c = cluster_vecs.shape[0]

    # Per-query, per-cluster query vectors: q = P_a + s·r_c.
    queries_c = anchor_proj[:, None, :] + sign[:, None, None] * cluster_vecs[None, :, :]
    v = anchor_raw @ centers.T  # [B, C]
    ce_sq = jnp.sum(jnp.square(centers), axis=-1)  # [C]
    u_all = entity_padded @ centers.T  # [N_pad, C]

    def energy_of(idx):
        """Cluster-routed energies of candidate rows ``idx`` ([B] or [B,K])."""
        return routed_energy(
            proj_padded[idx], entity_padded[idx], anchor_proj, v, sign,
            ce_sq, cluster_vecs, centers, distance,
        )

    e_true = energy_of(true_idx)  # [B]

    def body(blk, count):
        start = blk * block_size
        rows_p = jax.lax.dynamic_slice(proj_padded, (start, 0), (block_size, k))
        rows_e = jax.lax.dynamic_slice(entity_padded, (start, 0), (block_size, k))
        u_block = jax.lax.dynamic_slice(u_all, (start, 0), (block_size, c))
        cid = _assign(u_block, v, sign, ce_sq)  # [B, Nb]
        en = routed_block_energy(rows_p, queries_c, cid, distance)
        idx_block = start + jax.lax.broadcasted_iota(jnp.int32, (1, block_size), 1)
        not_self = idx_block != true_idx[:, None]
        beats = not_self & (
            (en < e_true[:, None]) | ((en == e_true[:, None]) & (idx_block < true_idx[:, None]))
        )
        return count + jnp.sum(beats, axis=1, dtype=jnp.int32)

    raw_count = jax.lax.fori_loop(0, n_blocks, body, jnp.zeros(b, dtype=jnp.int32))

    cand = filter_cands
    cand_valid = (cand >= 0) & (cand != true_idx[:, None])
    safe = jnp.maximum(cand, 0)
    e_cand = energy_of(safe)  # [B, Kmax]
    beats = (
        (e_cand < e_true[:, None])
        | ((e_cand == e_true[:, None]) & (safe < true_idx[:, None]))
    ) & cand_valid
    raw_rank = 1 + raw_count
    return raw_rank, raw_rank - jnp.sum(beats, axis=1, dtype=jnp.int32)
