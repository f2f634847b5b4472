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
