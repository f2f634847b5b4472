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
from jax.sharding import Mesh, PartitionSpec as P

from kb2e_tpu.constants import Distance
from kb2e_tpu.eval import ranking
from kb2e_tpu.ops import distances


_PAD_VALUE = ranking._PAD_VALUE


def _feed_slice(a, start, batch):
    return jax.lax.dynamic_slice_in_dim(a, start, batch, 0)


def _owned_psum_rows(table_local, idx, row0):
    """Gather global rows ``idx`` from a row-sharded table: each shard
    contributes the rows it owns (zeros elsewhere), one psum assembles the
    full [B, k] result.  Exact — every global row has exactly one owner, and
    x + 0 is exact in floating point."""
    n_local = table_local.shape[0]
    li = idx - row0
    owned = (li >= 0) & (li < n_local)
    rows = table_local[jnp.clip(li, 0, n_local - 1)]
    return jax.lax.psum(jnp.where(owned[..., None], rows, 0.0), "model")


def _owned_psum_energy(table_local, idx, queries, row0, distance):
    """Energies of global rows ``idx`` ([B] or [B, K]) against per-query
    points, computed by the owning shard and psum-assembled.  Uses the same
    ``residual_energy`` formula as the single-chip path so tie semantics are
    bit-identical."""
    n_local = table_local.shape[0]
    li = idx - row0
    owned = (li >= 0) & (li < n_local)
    rows = table_local[jnp.clip(li, 0, n_local - 1)]
    q = queries if idx.ndim == 1 else queries[:, None, :]
    e = distances.residual_energy(rows - q, distance)
    return jax.lax.psum(jnp.where(owned, e, 0.0), "model")


def _local_raw_count(pp_local, queries, e_true, true_idx, row0, block_size, distance):
    """Blockwise 'entities ranking before the true one' count over THIS
    shard's rows (global index offset ``row0``); caller psums."""
    n_local, k = pp_local.shape
    n_blocks = n_local // block_size

    def body(blk, count):
        start = blk * block_size
        rows = jax.lax.dynamic_slice(pp_local, (start, 0), (block_size, k))
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

    return jax.lax.fori_loop(
        0, n_blocks, body, jnp.zeros(queries.shape[0], dtype=jnp.int32)
    )


def _device_filter_cands(lo, cnt, filt_vals, kmax):
    """[B, kmax] candidate ids from segment bounds into the flat sorted
    filter array — same construction as ranking.rank_feed_queries."""
    iota = jnp.arange(kmax, dtype=jnp.int32)[None, :]
    pos = lo[:, None] + iota
    valid = iota < cnt[:, None]
    safe = jnp.minimum(pos, max(filt_vals.shape[0] - 1, 0))
    return jnp.where(valid, filt_vals[safe], -1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "model", "distance", "block_size", "batch", "kmax", "n_entities"
    ),
)
def rank_all_scan_sharded(
    mesh: Mesh,
    model,
    params,  # pytree; params["entity"] padded to block_size·|model| rows
    rel_ids: jax.Array,  # int32 [NB] relation per batch
    starts: jax.Array,  # int32 [NB] feed offset per batch
    q_anchor: jax.Array,
    q_sign: jax.Array,
    q_rel: jax.Array,
    q_true: jax.Array,
    q_lo: jax.Array,
    q_count: jax.Array,
    filt_vals: jax.Array,
    distance: Distance,
    block_size: int,
    batch: int,
    kmax: int,
    n_entities: int,
):
    """The r04 one-dispatch scan eval (eval/harness.py::_rank_all_scan) UNDER
    a device mesh: the entity table's row axis is sharded over ``model``,
    the query feed is replicated, and the whole eval is still one launch —
    a lax.scan over batches inside one shard_map.

    Per trip, each shard projects only ITS entity rows (the per-relation
    energy-cache analogue, common/evaluation.cpp:194-218, now 1/d of the
    matmul per chip), sweeps its shard blockwise, and three small psums
    assemble exact global results: anchor rows [B,k] (query construction),
    true/candidate energies ([B], [B,kmax]) from the owning shard, and the
    int32 rank counts.  All collectives ride ICI; no [B, N] score matrix and
    no full entity table ever exists on any single chip — this is the
    harness's story for entity tables beyond one chip's HBM, at the same
    launch count as single-chip (VERDICT r04 item 1).

    Metrics are bit-identical to the single-chip scan: row values, energy
    formulas and block boundaries are unchanged, psums only add exact zeros,
    and counts are integers.
    """
    specs = {k: (P("model", None) if k == "entity" else P()) for k in params}

    def body(params_loc, rel_ids, starts, qa, qs, qr, qt, ql, qc, fv):
        ent_local = params_loc["entity"]
        n_local = ent_local.shape[0]
        row0 = jax.lax.axis_index("model") * n_local
        grows = row0 + jnp.arange(n_local, dtype=jnp.int32)
        real = grows < n_entities

        if model.needs_projection:
            # Mask pad rows to 0 BEFORE projecting (1e30 rows overflow the
            # matmul), then stamp them back to the sentinel after.
            params_proj = {
                **params_loc,
                "entity": jnp.where(real[:, None], ent_local, 0.0),
            }

        rel_table = params_loc["relation"]

        def trip(carry, x):
            rel_id, start = x
            if model.needs_projection:
                pp = model.project_entities(params_proj, rel_id)
                pp = jnp.where(real[:, None], pp, _PAD_VALUE)
            else:
                pp = ent_local
            anchor = _feed_slice(qa, start, batch)
            sign = _feed_slice(qs, start, batch)
            rels = _feed_slice(qr, start, batch)
            true_idx = _feed_slice(qt, start, batch)
            lo = _feed_slice(ql, start, batch)
            cnt = _feed_slice(qc, start, batch)

            a_rows = _owned_psum_rows(pp, anchor, row0)
            queries = a_rows + sign[:, None] * rel_table[rels]
            e_true = _owned_psum_energy(pp, true_idx, queries, row0, distance)
            raw_count = jax.lax.psum(
                _local_raw_count(
                    pp, queries, e_true, true_idx, row0, block_size, distance
                ),
                "model",
            )
            cand = _device_filter_cands(lo, cnt, fv, kmax)
            cand_valid = (cand >= 0) & (cand != true_idx[:, None])
            safe_cand = jnp.maximum(cand, 0)
            e_cand = _owned_psum_energy(pp, safe_cand, queries, row0, distance)
            cand_beats = (
                (e_cand < e_true[:, None])
                | ((e_cand == e_true[:, None]) & (safe_cand < true_idx[:, None]))
            ) & cand_valid
            raw_rank = 1 + raw_count
            filt_rank = raw_rank - jnp.sum(cand_beats, axis=1, dtype=jnp.int32)
            return carry, (raw_rank, filt_rank)

        _, (raws, filts) = jax.lax.scan(trip, 0, (rel_ids, starts))
        return raws, filts

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(specs, P(), P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(params, rel_ids, starts, q_anchor, q_sign, q_rel, q_true, q_lo, q_count,
      filt_vals)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "model", "distance", "block_size", "batch", "kmax", "n_entities"
    ),
)
def rank_seg_clustered_sharded(
    mesh: Mesh,
    model,
    params,  # params["entity"] padded to block_size·|model| rows
    rel_ids: jax.Array,  # int32 [S] — one scan segment of batches
    starts: jax.Array,  # int32 [S]
    q_anchor: jax.Array,
    q_sign: jax.Array,
    q_true: jax.Array,
    q_lo: jax.Array,
    q_count: jax.Array,
    filt_vals: jax.Array,
    distance: Distance,
    block_size: int,
    batch: int,
    kmax: int,
    n_entities: int,
):
    """Cluster-routed (CTransR) analogue of :func:`rank_all_scan_sharded`:
    one SHORT scan segment per launch (the routed sweep inside a full-length
    scan crashes the axon TPU worker — eval/harness.py::_rank_seg_clustered),
    entity rows sharded over ``model``, routing semantics identical to
    ranking_cluster.rank_queries_clustered.  Both the projected and the raw
    (offset-space) local shards participate: routing reads raw rows, scoring
    reads projected rows; owning-shard psums assemble anchors and true/
    candidate energies exactly as in the non-clustered path."""
    from kb2e_tpu.eval import ranking_cluster as rc

    specs = {k: (P("model", None) if k == "entity" else P()) for k in params}

    def body(params_loc, rel_ids, starts, qa, qs, qt, ql, qc, fv):
        ent_local = params_loc["entity"]
        n_local, k = ent_local.shape
        row0 = jax.lax.axis_index("model") * n_local
        grows = row0 + jnp.arange(n_local, dtype=jnp.int32)
        real = grows < n_entities
        params_proj = {
            **params_loc,
            "entity": jnp.where(real[:, None], ent_local, 0.0),
        }
        ent_pad_local = jnp.where(real[:, None], ent_local, _PAD_VALUE)

        def trip(carry, x):
            rel_id, start = x
            pp = model.project_entities(params_proj, rel_id)
            pp = jnp.where(real[:, None], pp, _PAD_VALUE)
            cvecs = model.cluster_vectors(params_loc, rel_id)  # [C, k]
            centers = model.cluster_centers(params_loc, rel_id)  # [C, k]
            ce_sq = jnp.sum(jnp.square(centers), axis=-1)

            anchor = _feed_slice(qa, start, batch)
            sign = _feed_slice(qs, start, batch)
            true_idx = _feed_slice(qt, start, batch)
            lo = _feed_slice(ql, start, batch)
            cnt = _feed_slice(qc, start, batch)

            anchor_proj = _owned_psum_rows(pp, anchor, row0)
            anchor_raw = _owned_psum_rows(ent_pad_local, anchor, row0)
            queries_c = (
                anchor_proj[:, None, :] + sign[:, None, None] * cvecs[None, :, :]
            )
            v = anchor_raw @ centers.T  # [B, C]

            def owned_routed_energy(idx):
                li = idx - row0
                owned = (li >= 0) & (li < n_local)
                sl = jnp.clip(li, 0, n_local - 1)
                e = rc.routed_energy(
                    pp[sl], ent_pad_local[sl], anchor_proj, v, sign,
                    ce_sq, cvecs, centers, distance,
                )
                return jax.lax.psum(jnp.where(owned, e, 0.0), "model")

            e_true = owned_routed_energy(true_idx)

            def blk_body(blk, count):
                start_b = blk * block_size
                rows_p = jax.lax.dynamic_slice(
                    pp, (start_b, 0), (block_size, k)
                )
                rows_e = jax.lax.dynamic_slice(
                    ent_pad_local, (start_b, 0), (block_size, k)
                )
                u_block = rows_e @ centers.T  # [Nb, C]
                cid = rc._assign(u_block, v, sign, ce_sq)  # [B, Nb]
                en = rc.routed_block_energy(rows_p, queries_c, cid, distance)
                idx_block = row0 + start_b + jax.lax.broadcasted_iota(
                    jnp.int32, (1, block_size), 1
                )
                not_self = idx_block != true_idx[:, None]
                beats = not_self & (
                    (en < e_true[:, None])
                    | ((en == e_true[:, None]) & (idx_block < true_idx[:, None]))
                )
                return count + jnp.sum(beats, axis=1, dtype=jnp.int32)

            local = jax.lax.fori_loop(
                0, n_local // block_size, blk_body,
                jnp.zeros(sign.shape[0], dtype=jnp.int32),
            )
            raw_count = jax.lax.psum(local, "model")

            cand = _device_filter_cands(lo, cnt, fv, kmax)
            cand_valid = (cand >= 0) & (cand != true_idx[:, None])
            safe_cand = jnp.maximum(cand, 0)
            e_cand = owned_routed_energy(safe_cand)
            cand_beats = (
                (e_cand < e_true[:, None])
                | ((e_cand == e_true[:, None]) & (safe_cand < true_idx[:, None]))
            ) & cand_valid
            raw_rank = 1 + raw_count
            filt_rank = raw_rank - jnp.sum(cand_beats, axis=1, dtype=jnp.int32)
            return carry, (raw_rank, filt_rank)

        _, (raws, filts) = jax.lax.scan(trip, 0, (rel_ids, starts))
        return raws, filts

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(specs, P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(params, rel_ids, starts, q_anchor, q_sign, q_true, q_lo, q_count, filt_vals)


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
            en = rc.routed_block_energy(rows_p, queries_c, cid, distance)
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
