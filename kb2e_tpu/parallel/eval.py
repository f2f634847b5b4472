"""Candidate-axis-sharded evaluation (the framework's SP/CP story).

Survey §5.7: ranking a query against all N entities is the long axis of this
workload.  Here that axis is sharded over the ``model`` mesh axis: each device
scores its entity shard for the whole query batch, computes the local
"entities ranking before the true one" count, and a single ``psum`` yields the
exact global rank — no [B, N] score matrix, no gather of remote entity rows.
This is the blockwise/ring-attention analogue for rank-against-all scoring.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kb2e_tpu.constants import Distance
from kb2e_tpu.eval import ranking
from kb2e_tpu.ops import distances


def make_sharded_rank_fn(mesh: Mesh, distance: Distance, block_size: int):
    """Returns (proj_sharded [N_pad,k], queries [B,k], e_true [B], true_idx [B])
    -> raw_count [B]; proj rows sharded over ``model``, rest replicated.

    N_pad must be divisible by (model axis × block_size); pad with
    ``ranking.pad_entities`` first.
    """

    def local_count(proj_local, queries, e_true, true_idx, shard_idx):
        n_local, k = proj_local.shape
        n_blocks = n_local // block_size
        row0 = shard_idx * n_local  # global row offset of this shard

        def body(blk, count):
            start = blk * block_size
            rows = jax.lax.dynamic_slice(proj_local, (start, 0), (block_size, k))
            e_block = distances.pairwise_energy(rows, queries, distance)
            idx_block = row0 + start + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_size), 1
            )
            not_self = idx_block != true_idx[:, None]
            beats = not_self & (
                (e_block < e_true[:, None])
                | ((e_block == e_true[:, None]) & (idx_block < true_idx[:, None]))
            )
            return count + jnp.sum(beats, axis=1, dtype=jnp.int32)

        counts = jax.lax.fori_loop(
            0, n_blocks, body, jnp.zeros(queries.shape[0], dtype=jnp.int32)
        )
        return jax.lax.psum(counts, axis_name="model")

    @functools.partial(jax.jit)
    def ranked(proj_padded, queries, e_true, true_idx):
        def wrapper(proj_local, queries, e_true, true_idx):
            shard_idx = jax.lax.axis_index("model")
            return local_count(proj_local, queries, e_true, true_idx, shard_idx)

        return shard_map(
            wrapper,
            mesh=mesh,
            in_specs=(P("model", None), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )(proj_padded, queries, e_true, true_idx)

    return ranked


def make_sharded_cluster_rank_fn(mesh: Mesh, distance: Distance, block_size: int):
    """Cluster-routed (CTransR) analogue of :func:`make_sharded_rank_fn`.

    Both the projected and the raw entity tables are sharded over ``model``;
    each device routes its candidate shard to the nearest offset cluster
    (the EP-analogue routing, survey §2.1) and scores it against that
    cluster's relation vector; one psum yields exact global raw counts.
    """
    from kb2e_tpu.eval import ranking_cluster as rc

    def local_count(
        proj_local, ent_local, queries_c, v, ce_sq, sign, centers,
        e_true, true_idx,
    ):
        n_local, k = proj_local.shape
        c = queries_c.shape[1]
        n_blocks = n_local // block_size
        shard_idx = jax.lax.axis_index("model")
        row0 = shard_idx * n_local

        def body(blk, count):
            start = blk * block_size
            rows_p = jax.lax.dynamic_slice(proj_local, (start, 0), (block_size, k))
            rows_e = jax.lax.dynamic_slice(ent_local, (start, 0), (block_size, k))
            u_block = rows_e @ centers.T  # [Nb, C]
            cid = rc._assign(u_block, v, sign, ce_sq)  # [B, Nb]
            e_all = rc._energies_by_cluster(rows_p, queries_c, distance)
            en = jnp.take_along_axis(e_all, cid[:, :, None], axis=-1)[:, :, 0]
            idx_block = row0 + start + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_size), 1
            )
            not_self = idx_block != true_idx[:, None]
            beats = not_self & (
                (en < e_true[:, None])
                | ((en == e_true[:, None]) & (idx_block < true_idx[:, None]))
            )
            return count + jnp.sum(beats, axis=1, dtype=jnp.int32)

        counts = jax.lax.fori_loop(
            0, n_blocks, body, jnp.zeros(sign.shape[0], dtype=jnp.int32)
        )
        return jax.lax.psum(counts, axis_name="model")

    @functools.partial(jax.jit)
    def ranked(proj_padded, entity_padded, queries_c, v, ce_sq, sign, centers, e_true, true_idx):
        return shard_map(
            local_count,
            mesh=mesh,
            in_specs=(
                P("model", None), P("model", None),
                P(), P(), P(), P(), P(), P(), P(),
            ),
            out_specs=P(),
            check_vma=False,
        )(proj_padded, entity_padded, queries_c, v, ce_sq, sign, centers, e_true, true_idx)

    return ranked


def sharded_rank_queries_clustered(
    mesh: Mesh,
    proj_padded: jax.Array,
    entity_padded: jax.Array,
    anchor_proj: jax.Array,
    anchor_raw: jax.Array,
    sign: jax.Array,
    cluster_vecs: jax.Array,
    centers: jax.Array,
    true_idx: jax.Array,
    filter_cands: jax.Array,
    distance: Distance,
    block_size: int,
    rank_fn=None,
):
    """Sharded analogue of :func:`kb2e_tpu.eval.ranking_cluster.
    rank_queries_clustered` — exact same routing math, candidate axis over
    ``model``.  The true-row energies and the filtered correction run
    replicated (per-query gathers of a handful of rows)."""
    from kb2e_tpu.eval import ranking_cluster as rc

    queries_c = anchor_proj[:, None, :] + sign[:, None, None] * cluster_vecs[None, :, :]
    v = anchor_raw @ centers.T
    ce_sq = jnp.sum(jnp.square(centers), axis=-1)

    e_true = rc.routed_energy(
        proj_padded[true_idx], entity_padded[true_idx], anchor_proj, v, sign,
        ce_sq, cluster_vecs, centers, distance,
    )
    if rank_fn is None:
        rank_fn = make_sharded_cluster_rank_fn(mesh, distance, block_size)
    raw_count = rank_fn(
        proj_padded, entity_padded, queries_c, v, ce_sq, sign, centers, e_true, true_idx
    )

    cand = filter_cands
    cand_valid = (cand >= 0) & (cand != true_idx[:, None])
    safe = jnp.maximum(cand, 0)
    e_cand = rc.routed_energy(
        proj_padded[safe], entity_padded[safe], anchor_proj, v, sign,
        ce_sq, cluster_vecs, centers, distance,
    )
    beats = (
        (e_cand < e_true[:, None])
        | ((e_cand == e_true[:, None]) & (safe < true_idx[:, None]))
    ) & cand_valid
    raw_rank = 1 + raw_count
    return raw_rank, raw_rank - jnp.sum(beats, axis=1, dtype=jnp.int32)


def sharded_rank_queries(
    mesh: Mesh,
    proj_padded: jax.Array,
    queries: jax.Array,
    true_idx: jax.Array,
    filter_cands: jax.Array,
    distance: Distance,
    block_size: int,
    rank_fn=None,
):
    """Sharded analogue of :func:`kb2e_tpu.eval.ranking.rank_queries`.

    The filtered correction runs replicated (candidate lists are tiny).
    """
    e_true = distances.residual_energy(proj_padded[true_idx] - queries, distance)
    if rank_fn is None:
        rank_fn = make_sharded_rank_fn(mesh, distance, block_size)
    raw_count = rank_fn(proj_padded, queries, e_true, true_idx)

    cand = filter_cands
    cand_valid = (cand >= 0) & (cand != true_idx[:, None])
    safe_cand = jnp.maximum(cand, 0)
    e_cand = distances.residual_energy(proj_padded[safe_cand] - queries[:, None, :], distance)
    beats = (
        (e_cand < e_true[:, None])
        | ((e_cand == e_true[:, None]) & (safe_cand < true_idx[:, None]))
    ) & cand_valid
    raw_rank = 1 + raw_count
    return raw_rank, raw_rank - jnp.sum(beats, axis=1, dtype=jnp.int32)
