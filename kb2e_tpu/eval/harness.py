"""Link-prediction evaluation harness.

Reproduces ``EmbeddingEvaluation::run`` (``common/evaluation.cpp:181-251``):
for every test triple, rank the true head and the true tail against all
entities (self included, ranks 1-based — quirk B9), and report raw and
filtered MeanRank and Hits@10 averaged over ``2·|test|`` corruptions.

Where the reference loops relations to bound its per-relation energy cache
(common/evaluation.cpp:194-218), this harness loops relations to amortise the
per-relation *entity projection*: for TransH/TransR the whole entity table is
projected once per relation (an [N,k]·[k,k] matmul on the MXU for TransR) and
every query against that relation reuses it — the same cache idea, recast as
dense batched compute.  TransE needs no projection and streams all queries in
one group.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kb2e_tpu.config import EmbeddingConfig
from kb2e_tpu.constants import Distance
from kb2e_tpu.data.triples import Dataset
from kb2e_tpu.eval import ranking
from kb2e_tpu.models.base import Model, Params


class _FilterIndex:
    """Sorted (anchor, relation) → candidate-entity index over the filter set.

    The numpy group-by replacement for the reference's known-good map build
    (common/evaluation.cpp:55-61): one stable argsort over packed keys instead
    of a Python loop over every filter triple (O(minutes) of single-core work
    at FB40k scale).  Duplicate triples are KEPT, in input order — the
    reference's vector push_back keeps them too and the filtered correction
    counts per list element, a semantics our 6-decimal metric parity against
    ``evalTransE``/``evalTransH`` depends on."""

    def __init__(self, anchors: np.ndarray, rels: np.ndarray, values: np.ndarray, n_relations: int):
        self._n_relations = int(n_relations)
        keys = anchors.astype(np.int64) * self._n_relations + rels.astype(np.int64)
        order = np.argsort(keys, kind="stable")
        self._keys = keys[order]
        self._values = values.astype(np.int32)[order]

    def lookup(self, anchors: np.ndarray, rels: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Per-query [lo, hi) segment bounds into the sorted value array."""
        q = anchors.astype(np.int64) * self._n_relations + rels.astype(np.int64)
        return (
            np.searchsorted(self._keys, q, side="left"),
            np.searchsorted(self._keys, q, side="right"),
        )

    @property
    def values(self) -> np.ndarray:
        """The sorted candidate array `lookup` bounds index into."""
        return self._values


def _round_up_pow2(x: int, lo: int = 8) -> int:
    n = lo
    while n < x:
        n *= 2
    return n


class EvalAccumulator:
    """Accumulates the reference's four counters (common/evaluation.cpp:188-192)
    plus the standard extended KGE metrics (MRR, Hits@1/3) the reference never
    computed — free here since ranks are already materialised per query."""

    _HITS_KS = (1, 3, 10)

    def __init__(self):
        self.raw_sum_rank = 0
        self.filtered_sum_rank = 0
        self.raw_sum_recip = 0.0
        self.filtered_sum_recip = 0.0
        self.raw_hits = {k: 0 for k in self._HITS_KS}
        self.filtered_hits = {k: 0 for k in self._HITS_KS}
        self.n = 0

    def add(self, raw_ranks: np.ndarray, filtered_ranks: np.ndarray) -> None:
        self.raw_sum_rank += int(raw_ranks.sum())
        self.filtered_sum_rank += int(filtered_ranks.sum())
        self.raw_sum_recip += float((1.0 / raw_ranks.astype(np.float64)).sum())
        self.filtered_sum_recip += float((1.0 / filtered_ranks.astype(np.float64)).sum())
        for k in self._HITS_KS:
            self.raw_hits[k] += int((raw_ranks <= k).sum())
            self.filtered_hits[k] += int((filtered_ranks <= k).sum())
        self.n += int(raw_ranks.shape[0])

    def metrics(self) -> Dict[str, float]:
        n = max(self.n, 1)
        out = {
            "raw_mean_rank": self.raw_sum_rank / n,
            "filtered_mean_rank": self.filtered_sum_rank / n,
            "raw_hits10": self.raw_hits[10] / n,
            "filtered_hits10": self.filtered_hits[10] / n,
            "raw_mrr": self.raw_sum_recip / n,
            "filtered_mrr": self.filtered_sum_recip / n,
            "num_corruptions": self.n,
        }
        for k in self._HITS_KS[:-1]:
            out[f"raw_hits{k}"] = self.raw_hits[k] / n
            out[f"filtered_hits{k}"] = self.filtered_hits[k] / n
        return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "distance", "block_size", "batch", "kmax", "use_pallas"
    ),
)
def _rank_all_scan(
    model: Model,
    params: Params,
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
    use_pallas: bool,
):
    """The whole link-prediction eval as ONE program: lax.scan over batches,
    each trip = per-relation projection (+pad) + device-side candidate
    gather + blockwise rank sweep (ranking.rank_feed_queries).

    Module-level and keyed on the (singleton) model instance so repeated
    evaluations in a process — train loops with ``eval_every``, benchmark
    sweeps — reuse the compiled executable instead of recompiling a
    per-call closure.
    """
    entity_padded = ranking.pad_entities(params["entity"], block_size)

    def body(carry, x):
        rel_id, start = x
        if model.needs_projection:
            pp = ranking.pad_entities(
                model.project_entities(params, rel_id), block_size
            )
        else:
            pp = entity_padded
        rr, fr = ranking.rank_feed_queries(
            pp, params["relation"],
            q_anchor, q_sign, q_rel, q_true, q_lo, q_count, filt_vals,
            start, distance, block_size, batch, kmax,
            use_pallas=use_pallas,
        )
        return carry, (rr, fr)

    _, (raws, filts) = jax.lax.scan(body, 0, (rel_ids, starts))
    return raws, filts


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "distance", "block_size", "batch", "kmax"
    ),
)
def _rank_seg_clustered(
    model: Model,
    params: Params,
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
):
    """A scan over cluster-routed batches (segment of the eval).

    History: CTransR's routed sweep inside a full-length eval scan crashed
    the r04 axon backend's TPU worker, forcing 16-batch segments.  The r05
    probe sweep (benchmarks/segment_probe.py --eval) shows the fault has
    drifted away — 0/8/16/32/64/128/192(full) all pass — and the warm wall
    is launch-overhead-bound: 90 s per-batch → 11.3 s at 8 → 1.93 s at 128
    ≈ full-length.  Default: 128 (measured optimum, curve in
    EVAL_SEGMENT_SWEEP_r05.json); KB2E_CLUSTER_EVAL_SEGMENT overrides
    (0 = one dispatch per batch, for fault triage)."""
    entity_padded = ranking.pad_entities(params["entity"], block_size)

    def body(carry, x):
        rel_id, start = x
        rr, fr = _rank_batch_clustered_body(
            model, params, entity_padded, rel_id, start,
            q_anchor, q_sign, q_true, q_lo, q_count, filt_vals,
            distance, block_size, batch, kmax,
        )
        return carry, (rr, fr)

    _, (raws, filts) = jax.lax.scan(body, 0, (rel_ids, starts))
    return raws, filts


def _rank_batch_clustered_body(
    model, params, entity_padded, rel_id, start,
    q_anchor, q_sign, q_true, q_lo, q_count, filt_vals,
    distance, block_size, batch, kmax,
):
    from kb2e_tpu.eval import ranking_cluster

    pp = ranking.pad_entities(
        model.project_entities(params, rel_id), block_size
    )

    def sl(a):
        return jax.lax.dynamic_slice_in_dim(a, start, batch, 0)

    anchor, sign, true_idx = sl(q_anchor), sl(q_sign), sl(q_true)
    lo, cnt = sl(q_lo), sl(q_count)
    iota = jnp.arange(kmax, dtype=jnp.int32)[None, :]
    pos = lo[:, None] + iota
    valid = iota < cnt[:, None]
    safe = jnp.minimum(pos, max(filt_vals.shape[0] - 1, 0))
    filter_cands = jnp.where(valid, filt_vals[safe], -1)
    return ranking_cluster.rank_queries_clustered(
        pp, entity_padded, pp[anchor], entity_padded[anchor], sign,
        model.cluster_vectors(params, rel_id),
        model.cluster_centers(params, rel_id),
        true_idx, filter_cands, distance, block_size,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "distance", "block_size", "batch", "kmax"
    ),
)
def _rank_batch_clustered(
    model: Model,
    params: Params,
    rel_id: jax.Array,
    start: jax.Array,
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
):
    """One cluster-routed batch as ONE dispatch from the device feed
    (fallback when KB2E_CLUSTER_EVAL_SEGMENT=0; see _rank_seg_clustered)."""
    ep = ranking.pad_entities(params["entity"], block_size)
    return _rank_batch_clustered_body(
        model, params, ep, rel_id, start,
        q_anchor, q_sign, q_true, q_lo, q_count, filt_vals,
        distance, block_size, batch, kmax,
    )


def evaluate(
    model: Model,
    params: Params,
    dataset: Dataset,
    cfg: EmbeddingConfig,
    *,
    test_triples: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None,
    verbose: bool = False,
    mesh=None,
) -> Dict[str, float]:
    """Run filtered/raw link prediction; returns the four headline metrics.

    With ``mesh`` set, the candidate (entity) axis of each sweep is sharded
    over the ``model`` mesh axis and exact global ranks are reduced with one
    psum (survey §5.7) — the path for entity tables beyond one chip's HBM.
    """
    if test_triples is None:
        test_triples = dataset.test
    if test_triples is None or test_triples[0].size == 0:
        raise ValueError("no test triples to evaluate")
    # Low-precision training tables (param_dtype='bfloat16') are upcast once
    # here; ranking/energy sweeps always score in float32.
    params = {
        k: (
            v.astype(jnp.float32)
            if hasattr(v, "dtype")
            and jnp.issubdtype(v.dtype, jnp.floating)
            and v.dtype != jnp.float32
            else v
        )
        for k, v in params.items()
    }
    th, tt, tr = (np.asarray(a, dtype=np.int64) for a in test_triples)

    # Filter set = train + valid + test (common/evaluation.cpp:55-61).
    parts = [(dataset.train.heads, dataset.train.tails, dataset.train.rels)]
    for split in (dataset.valid, test_triples):
        if split is not None:
            parts.append(split)
    filt = tuple(np.concatenate([np.asarray(p[i]) for p in parts]) for i in range(3))
    fh, ft, fr = filt
    # (h, r) → known tails and (t, r) → known heads (common/evaluation.cpp:55-61).
    tails_of_hr = _FilterIndex(fh, fr, ft, dataset.n_relations)
    heads_of_tr = _FilterIndex(ft, fr, fh, dataset.n_relations)

    distance = model.effective_distance(Distance.from_any(cfg.distance))
    block_size = cfg.eval_block_size
    batch_size = cfg.eval_batch_size
    use_pallas = cfg.eval_impl == "pallas" or (
        cfg.eval_impl == "auto" and jax.default_backend() == "tpu"
    )

    # Build the query list: per test triple, corrupt-head then corrupt-tail
    # (order matches common/evaluation.cpp:230-238; only sums matter).
    # Each query: (relation, anchor entity, sign, true entity, filter list).
    # corrupt-head: q = proj[t] − r, true = h, filters = heads of (t, r).
    # corrupt-tail: q = proj[h] + r, true = t, filters = tails of (h, r).
    n_test = th.shape[0]
    q_rel = np.repeat(tr, 2)
    q_anchor = np.empty(2 * n_test, dtype=np.int64)
    q_anchor[0::2], q_anchor[1::2] = tt, th
    q_sign = np.empty(2 * n_test, dtype=np.float32)
    q_sign[0::2], q_sign[1::2] = -1.0, 1.0
    q_true = np.empty(2 * n_test, dtype=np.int64)
    q_true[0::2], q_true[1::2] = th, tt
    # Per-query filter-list segment bounds; even slots filter by (t, r) →
    # heads, odd slots by (h, r) → tails.
    q_lo = np.empty(2 * n_test, dtype=np.int64)
    q_hi = np.empty(2 * n_test, dtype=np.int64)
    q_lo[0::2], q_hi[0::2] = heads_of_tr.lookup(tt, tr)
    q_lo[1::2], q_hi[1::2] = tails_of_hr.lookup(th, tr)
    q_count = q_hi - q_lo

    acc = EvalAccumulator()
    pending: list = []

    if model.needs_projection:
        # Group queries by relation; one projection per relation.  One sort +
        # unique bounds instead of an O(R·Q) mask sweep.
        order = np.argsort(q_rel, kind="stable")
        uniq, starts = np.unique(q_rel[order], return_index=True)
        bounds = np.append(starts, order.shape[0])
        group_iter = [
            (int(uniq[g]), order[bounds[g] : bounds[g + 1]]) for g in range(uniq.shape[0])
        ]
    else:
        group_iter = [(-1, np.arange(2 * n_test))]

    entity_table = params["entity"]
    cluster_aware = getattr(model, "cluster_aware", False)
    # Device-resident query feed (ALL paths, single-chip and mesh): every
    # query's data is uploaded ONCE.  Non-cluster models run the whole eval
    # as one scan dispatch (_rank_all_scan single-chip,
    # parallel.eval.rank_all_scan_sharded under a mesh — same architecture,
    # entity rows sharded over ``model``); CTransR runs short scan SEGMENTS
    # off the same feed (_rank_seg_clustered / rank_seg_clustered_sharded) —
    # its cluster-routed sweep inside a full-length lax.scan crashes the
    # axon backend's TPU worker (r04, same class of runtime kernel fault as
    # PERF.md "Axon segment fault" — suspected [B,block,C,k] L1 broadcast
    # temp under the scan scheduler), while short segments are stable.
    # Groups are padded to a multiple of the batch so no batch spans two
    # relations.
    heads_len = heads_of_tr.values.shape[0]
    filt_vals_np = np.concatenate([heads_of_tr.values, tails_of_hr.values])
    q_lo_adj = q_lo.copy()
    q_lo_adj[1::2] += heads_len  # odd slots index the tails partition

    feed_groups = []  # (rel_id, feed_start, n_real, kmax)
    sel_parts = []  # real-query index per feed slot (−1 = pad row)
    pos = 0
    for rel_id, idxs in group_iter:
        n_real = idxs.shape[0]
        n_slot = -(-n_real // batch_size) * batch_size
        part = np.full(n_slot, -1, dtype=np.int64)
        part[:n_real] = idxs
        sel_parts.append(part)
        kmax_g = _round_up_pow2(int(q_count[idxs].max(initial=1)))
        feed_groups.append((rel_id, pos, n_real, kmax_g))
        pos += n_slot
    feed_sel = np.concatenate(sel_parts)
    pad_mask = feed_sel < 0
    safe_sel = np.maximum(feed_sel, 0)

    def feed_arr(src, fill, dtype):
        out = src[safe_sel].astype(dtype)
        out[pad_mask] = fill
        return jnp.asarray(out)

    feed = dict(
        q_anchor=feed_arr(q_anchor, 0, np.int32),
        q_sign=feed_arr(q_sign, 0.0, np.float32),
        q_rel=feed_arr(q_rel, 0, np.int32),
        q_true=feed_arr(q_true, 0, np.int32),
        q_lo=feed_arr(q_lo_adj, 0, np.int32),
        q_count=feed_arr(q_count, 0, np.int32),
        filt_vals=jnp.asarray(filt_vals_np, dtype=jnp.int32),
    )
    # One compile for the whole eval (global kmax); per-relation groups are
    # batch-aligned in the feed so a (relation, start) pair fully describes
    # each batch.
    kmax_all = _round_up_pow2(int(q_count.max(initial=1)))
    batch_rel = []
    batch_start = []
    batch_b = []
    for rel_id, feed_start, n_real, _kmax_g in feed_groups:
        for s in range(0, n_real, batch_size):
            batch_rel.append(rel_id)
            batch_start.append(feed_start + s)
            batch_b.append(min(batch_size, n_real - s))
    processed = 0

    if mesh is not None:
        # The mesh path is the SAME one-dispatch scan architecture with the
        # entity table's row axis sharded over ``model`` (survey §5.7): each
        # shard projects and sweeps only its rows, three small psums
        # assemble exact anchors/energies/counts, and the query feed stays
        # replicated.  Pre-r05 this path fell back to per-batch dispatches
        # with eager host→device transfers (~50 ms/batch fixed cost) — the
        # one place the multi-chip story was ~100× slower than single-chip
        # (VERDICT r04).  Metrics are bit-identical to the local path
        # (tests/test_parallel.py equivalence suite).
        from kb2e_tpu.parallel import eval as par_eval

        d = int(mesh.shape["model"])
        ent_pad = ranking.pad_entities(entity_table, block_size * d)
        ent_pad = jax.device_put(
            ent_pad,
            jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("model", None)
            ),
        )
        # Everything else is fully replicated — placed explicitly so the
        # same code runs on MULTI-PROCESS global meshes (jit over a global
        # mesh rejects process-local arrays; every process holds the same
        # host values, so a replicated device_put assembles the global
        # array from local shards).
        rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())

        def put_rep(x):
            return jax.device_put(x, rep)

        params_sh = {
            **{k: put_rep(v) for k, v in params.items()},
            "entity": ent_pad,
        }
        feed = {k: put_rep(v) for k, v in feed.items()}
        n_entities = int(entity_table.shape[0])

        if cluster_aware:
            import os

            seg = int(os.environ.get("KB2E_CLUSTER_EVAL_SEGMENT", "128"))
            nb = len(batch_rel)
            rel_np = np.asarray(batch_rel, dtype=np.int32)
            start_np = np.asarray(batch_start, dtype=np.int32)
            if seg <= 0:
                seg = nb  # one full-length launch
            for s0 in range(0, nb, seg):
                idx = np.arange(s0, min(s0 + seg, nb))
                pad_n = seg - idx.shape[0]
                idx_p = np.concatenate([idx, np.repeat(idx[-1:], pad_n)])
                raws, filts = par_eval.rank_seg_clustered_sharded(
                    mesh, model, params_sh,
                    put_rep(rel_np[idx_p]), put_rep(start_np[idx_p]),
                    feed["q_anchor"], feed["q_sign"], feed["q_true"],
                    feed["q_lo"], feed["q_count"], feed["filt_vals"],
                    distance, block_size, batch_size, kmax_all, n_entities,
                )
                pending.append((raws, filts, idx))
                processed += int(sum(batch_b[i] for i in idx))
                if verbose:
                    print(
                        f"\rProcessed {processed * 100.0 / (2 * n_test):05.2f}% ...",
                        end="",
                    )
            for raws, filts, idx in pending:
                raws, filts = np.asarray(raws), np.asarray(filts)
                for j, i in enumerate(idx):
                    acc.add(raws[j, : batch_b[i]], filts[j, : batch_b[i]])
            if verbose:
                print()
            return acc.metrics()

        raws, filts = par_eval.rank_all_scan_sharded(
            mesh, model, params_sh,
            put_rep(np.asarray(batch_rel, dtype=np.int32)),
            put_rep(np.asarray(batch_start, dtype=np.int32)),
            feed["q_anchor"], feed["q_sign"], feed["q_rel"],
            feed["q_true"], feed["q_lo"], feed["q_count"],
            feed["filt_vals"],
            distance, block_size, batch_size, kmax_all, n_entities,
        )
        raws, filts = np.asarray(raws), np.asarray(filts)
        for i, b in enumerate(batch_b):
            acc.add(raws[i, :b], filts[i, :b])
            processed += b
        if verbose:
            print(f"\rProcessed {processed * 100.0 / (2 * n_test):05.2f}% ...")
        return acc.metrics()

    # Single chip: the WHOLE eval as one dispatch — a lax.scan over every
    # batch, each trip doing the per-relation projection (the reference's
    # energy-cache analogue — an [N,k]·[k,k] MXU matmul recomputed per
    # trip, ~µs where an eager per-group call costs a tunnel round-trip),
    # the device-side candidate gather and the blockwise rank sweep.  One
    # compile (global kmax), one launch, one result fetch — per-batch
    # host→device transfers and dispatch round-trips, which dominated eval
    # wall time on tunneled backends (~50 ms/batch fixed vs <1 ms device
    # work), are gone entirely.
    if cluster_aware:
        import os

        seg = int(os.environ.get("KB2E_CLUSTER_EVAL_SEGMENT", "128"))
        nb = len(batch_rel)
        if seg > 0:
            # Short scan segments (full-length scans of the routed
            # sweep crash the axon worker; see _rank_seg_clustered).
            # The final segment is padded by repeating its last batch
            # (results of pad slots are dropped at drain).
            rel_np = np.asarray(batch_rel, dtype=np.int32)
            start_np = np.asarray(batch_start, dtype=np.int32)
            for s0 in range(0, nb, seg):
                idx = np.arange(s0, min(s0 + seg, nb))
                pad_n = seg - idx.shape[0]
                idx_p = np.concatenate([idx, np.repeat(idx[-1:], pad_n)])
                raws, filts = _rank_seg_clustered(
                    model, params,
                    jnp.asarray(rel_np[idx_p]), jnp.asarray(start_np[idx_p]),
                    feed["q_anchor"], feed["q_sign"], feed["q_true"],
                    feed["q_lo"], feed["q_count"], feed["filt_vals"],
                    distance, block_size, batch_size, kmax_all,
                )
                pending.append((raws, filts, idx))
                processed += int(sum(batch_b[i] for i in idx))
                if verbose:
                    print(
                        f"\rProcessed {processed * 100.0 / (2 * n_test):05.2f}% ...",
                        end="",
                    )
            for raws, filts, idx in pending:
                raws, filts = np.asarray(raws), np.asarray(filts)
                for j, i in enumerate(idx):
                    acc.add(raws[j, : batch_b[i]], filts[j, : batch_b[i]])
            if verbose:
                print()
            return acc.metrics()
        for i in range(nb):
            raw_r, filt_r = _rank_batch_clustered(
                model, params,
                jnp.int32(batch_rel[i]), jnp.int32(batch_start[i]),
                feed["q_anchor"], feed["q_sign"], feed["q_true"],
                feed["q_lo"], feed["q_count"], feed["filt_vals"],
                distance, block_size, batch_size, kmax_all,
            )
            pending.append((raw_r, filt_r, batch_b[i]))
            processed += batch_b[i]
            if verbose:
                print(
                    f"\rProcessed {processed * 100.0 / (2 * n_test):05.2f}% ...",
                    end="",
                )
        for raw_r, filt_r, b in pending:
            acc.add(np.asarray(raw_r)[:b], np.asarray(filt_r)[:b])
        if verbose:
            print()
        return acc.metrics()

    rel_ids_d = jnp.asarray(np.asarray(batch_rel, dtype=np.int32))
    starts_d = jnp.asarray(np.asarray(batch_start, dtype=np.int32))

    raws, filts = _rank_all_scan(
        model, params, rel_ids_d, starts_d,
        feed["q_anchor"], feed["q_sign"], feed["q_rel"],
        feed["q_true"], feed["q_lo"], feed["q_count"],
        feed["filt_vals"],
        distance, block_size, batch_size, kmax_all, use_pallas,
    )
    raws, filts = np.asarray(raws), np.asarray(filts)
    for i, b in enumerate(batch_b):
        acc.add(raws[i, :b], filts[i, :b])
        processed += b
    if verbose:
        print(f"\rProcessed {processed * 100.0 / (2 * n_test):05.2f}% ...")
    return acc.metrics()


def evaluate_relation_prediction(
    model: Model,
    params: Params,
    dataset: Dataset,
    cfg: EmbeddingConfig,
    *,
    test_triples: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None,
    path_store=None,
    verbose: bool = False,
) -> Dict[str, float]:
    """Relation prediction: rank the golden relation among all R candidates.

    The reference only evaluates entity prediction; this is the PTransE
    paper's second task (its README table's source reports MR/Hits@1 here).
    Scores are the triple energy E(h, r', t) for every candidate relation;
    with ``path_store`` (PathStore rows aligned to the test triples, extracted
    over the TRAIN graph) models carrying an inverse-relation table add the
    paper's path evidence  Σ_p conf(p) · ‖comp(p) − r'‖₁.

    Filtered ranks exclude other relations known to hold for the same (h, t)
    pair (train ∪ valid ∪ test), mirroring the entity-side filter rule.
    """
    if test_triples is None:
        test_triples = dataset.test
    if test_triples is None or test_triples[0].size == 0:
        raise ValueError("no test triples to evaluate")
    th, tt, tr = (np.asarray(a, dtype=np.int64) for a in test_triples)
    n_test = th.shape[0]
    R = dataset.n_relations
    distance = model.effective_distance(Distance.from_any(cfg.distance))

    # Known relations per (h, t) pair over train ∪ valid ∪ test — set
    # semantics via one np.unique over packed (h, t, r) keys, sorted so each
    # pair's relations form a contiguous segment.
    parts = [(dataset.train.heads, dataset.train.tails, dataset.train.rels)]
    for split in (dataset.valid, test_triples):
        if split is not None:
            parts.append(split)
    n_ent = dataset.n_entities
    packed = np.unique(
        np.concatenate(
            [
                (np.asarray(p[0], np.int64) * n_ent + np.asarray(p[1], np.int64)) * R
                + np.asarray(p[2], np.int64)
                for p in parts
            ]
        )
    )
    pair_keys = packed // R
    pair_rels = (packed % R).astype(np.int64)

    use_paths = path_store is not None and "relation_inv" in params
    if use_paths:
        from kb2e_tpu.models import ptranse as ptranse_lib

    batch = cfg.eval_batch_size
    rel_ids = jnp.tile(jnp.arange(R, dtype=jnp.int32), batch)  # [B·R]

    # params passed as an argument, not closed over: baked-in table constants
    # explode compile time on remote-compile backends (see CLAUDE.md).
    @jax.jit
    def score_batch(p, h, t, paths=None, conf=None):
        h_rep = jnp.repeat(h, R)
        t_rep = jnp.repeat(t, R)
        e = model.energy(p, h_rep, t_rep, rel_ids, distance).reshape(-1, R)
        if paths is not None:
            rel_all = jnp.concatenate([p["relation"], p["relation_inv"]], axis=0)
            pv = ptranse_lib.compose_paths(
                rel_all, paths, cfg.path_composition, p.get("comp_w")
            )  # [B, P, k]
            # ‖comp(p) − r'‖₁ for every candidate relation.
            d = jnp.abs(pv[:, :, None, :] - p["relation"][None, None, :, :]).sum(-1)
            e = e + (conf[:, :, None] * d).sum(axis=1)
        return e

    acc = EvalAccumulator()
    for s in range(0, n_test, batch):
        b = min(batch, n_test - s)
        pad = batch - b
        h = jnp.asarray(np.concatenate([th[s : s + b], np.zeros(pad, np.int64)]), jnp.int32)
        t = jnp.asarray(np.concatenate([tt[s : s + b], np.zeros(pad, np.int64)]), jnp.int32)
        if use_paths:
            pr_ = np.concatenate(
                [path_store.rels[s : s + b], np.full((pad,) + path_store.rels.shape[1:], -1, np.int32)]
            )
            pc_ = np.concatenate(
                [path_store.conf[s : s + b], np.zeros((pad,) + path_store.conf.shape[1:], np.float32)]
            )
            scores = np.asarray(
                score_batch(params, h, t, jnp.asarray(pr_), jnp.asarray(pc_))
            )[:b]
        else:
            scores = np.asarray(score_batch(params, h, t))[:b]
        true = tr[s : s + b].astype(np.int64)
        s_true = scores[np.arange(b), true]
        beat = (scores < s_true[:, None]) | (
            (scores == s_true[:, None]) & (np.arange(R)[None, :] < true[:, None])
        )
        raw = 1 + beat.sum(axis=1)
        # Filtered: subtract known-good relations of the (h, t) pair (except
        # the golden one) that beat it.
        key = th[s : s + b] * n_ent + tt[s : s + b]
        lo = np.searchsorted(pair_keys, key, side="left")
        hi = np.searchsorted(pair_keys, key, side="right")
        kmax = int((hi - lo).max(initial=1))
        idx = lo[:, None] + np.arange(kmax)[None, :]
        valid = idx < hi[:, None]
        cands = np.where(valid, pair_rels[np.minimum(idx, pair_rels.shape[0] - 1)], -1)
        good = valid & (cands != true[:, None])
        sub = (np.take_along_axis(beat, np.clip(cands, 0, R - 1), axis=1) & good).sum(axis=1)
        acc.add(raw, raw - sub)
        if verbose:
            print(f"\rRelation prediction {min(s + b, n_test) * 100.0 / n_test:05.2f}% ...", end="")
    if verbose:
        print()
    return acc.metrics()


def print_reference_style(metrics: Dict[str, float]) -> None:
    """Print the reference's final two lines (common/evaluation.cpp:247-250)."""
    print(
        f"Raw      -- Rank: {metrics['raw_mean_rank']:f}, "
        f"Hits@10: {metrics['raw_hits10']:f}"
    )
    print(
        f"Filtered -- Rank: {metrics['filtered_mean_rank']:f}, "
        f"Hits@10: {metrics['filtered_hits10']:f}"
    )


def print_extended(metrics: Dict[str, float]) -> None:
    """Extended metrics beyond the reference's surface (MRR, Hits@1/3).

    Printed AFTER the two reference-format lines so byte-level comparisons
    against the reference binaries' output remain line-for-line valid.
    """
    for label, pre in (("Raw", "raw"), ("Filtered", "filtered")):
        print(
            f"{label} extended -- MRR: {metrics[f'{pre}_mrr']:.6f}, "
            f"Hits@1: {metrics[f'{pre}_hits1']:.6f}, "
            f"Hits@3: {metrics[f'{pre}_hits3']:.6f}"
        )
