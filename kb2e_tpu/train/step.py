"""Single-device training step: sample → score → update, one jit.

This is the TPU recast of the reference's hot loop ``Trainer::bfgs``
(``common/trainer.cpp:69-107``): where the reference processes one sample at a
time, a step here draws a whole batch on device, evaluates both energies,
masks by margin violation (replacing the branch at common/trainer.cpp:138-146)
and applies all updates with scatter-adds.  ``update_mode='parity'`` instead
replays the per-sample double-buffered semantics for allclose testing.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kb2e_tpu.config import EmbeddingConfig
from kb2e_tpu.constants import Method
from kb2e_tpu.data.triples import TripleSet
from kb2e_tpu.models.base import Batch, Model, Params
from kb2e_tpu.sampling import corruption


class DeviceData(NamedTuple):
    """Training data resident on device."""

    heads: jax.Array
    tails: jax.Array
    rels: jax.Array
    bern_pr_tail: jax.Array  # float32 [R]
    sorted_h: jax.Array
    sorted_r: jax.Array
    sorted_t: jax.Array
    cuckoo_table: "jax.Array | None"  # [2*M, 2] or None (fallback)
    cuckoo_fp: "jax.Array | None"  # [2*M] fingerprint fast probe (or None)
    cuckoo_m: jax.Array  # int32 scalar
    cuckoo_salt: jax.Array  # int32 scalar
    n_relations: jax.Array  # int32 scalar (for (h, r) key packing)
    n_entities: int  # static
    # PTransE path store aligned per triple (None for path-free models).
    paths: "jax.Array | None" = None  # int32 [T, P, L], −1 padded
    path_conf: "jax.Array | None" = None  # float32 [T, P]

    @classmethod
    def from_triple_set(cls, ts: TripleSet, path_store=None) -> "DeviceData":
        return cls(
            heads=jnp.asarray(ts.heads),
            tails=jnp.asarray(ts.tails),
            rels=jnp.asarray(ts.rels),
            bern_pr_tail=jnp.asarray(ts.bern_pr_tail, dtype=jnp.float32),
            sorted_h=jnp.asarray(ts.sorted_h),
            sorted_r=jnp.asarray(ts.sorted_r),
            sorted_t=jnp.asarray(ts.sorted_t),
            cuckoo_table=(None if ts.cuckoo_table is None else jnp.asarray(ts.cuckoo_table)),
            cuckoo_fp=(None if getattr(ts, "cuckoo_fp", None) is None else jnp.asarray(ts.cuckoo_fp)),
            cuckoo_m=jnp.int32(ts.cuckoo_m),
            cuckoo_salt=jnp.int32(ts.cuckoo_salt),
            n_relations=jnp.int32(ts.n_relations),
            n_entities=ts.n_entities,
            paths=(None if path_store is None else jnp.asarray(path_store.rels)),
            path_conf=(None if path_store is None else jnp.asarray(path_store.conf)),
        )


def _with_path_data(
    key: jax.Array, batch: Batch, data: DeviceData, resample_rounds: int
) -> Batch:
    """Attach PTransE per-triple path data + corrupted relations to a batch."""
    idx = batch["idx"]
    nr, nr_valid = corruption.sample_relation_negatives(
        key,
        batch["ph"],
        batch["pt"],
        batch["r"],
        data.n_relations,
        data.sorted_h,
        data.sorted_r,
        data.sorted_t,
        resample_rounds=resample_rounds,
        cuckoo_table=data.cuckoo_table,
        cuckoo_fp=data.cuckoo_fp,
        cuckoo_m=data.cuckoo_m,
        cuckoo_salt=data.cuckoo_salt,
    )
    aug = {k: v for k, v in batch.items() if k != "idx"}
    aug.update(
        paths=data.paths[idx], conf=data.path_conf[idx], nr=nr, nr_valid=nr_valid
    )
    return Batch(aug)


def make_train_step(model: Model, cfg: EmbeddingConfig, batch_size: int):
    """Build a jitted (params, key, data) -> (params, loss) step."""
    method = Method.from_any(cfg.method)
    parity = cfg.update_mode == "parity"

    @functools.partial(jax.jit, static_argnames=("n_entities",), donate_argnames=("params",))
    def step(params: Params, key: jax.Array, data: DeviceData, n_entities: int) -> Tuple[Params, jax.Array]:
        use_paths = data.paths is not None
        if use_paths:
            key, k_nr = jax.random.split(key)
        batch = corruption.sample_batch(
            key,
            data.heads,
            data.tails,
            data.rels,
            data.bern_pr_tail,
            data.sorted_h,
            data.sorted_r,
            data.sorted_t,
            n_entities=n_entities,
            batch_size=batch_size,
            method=method,
            resample_rounds=cfg.corruption_resample_rounds,
            cuckoo_table=data.cuckoo_table,
            cuckoo_fp=data.cuckoo_fp,
            cuckoo_m=data.cuckoo_m,
            cuckoo_salt=data.cuckoo_salt,
            n_relations=data.n_relations,
            return_idx=use_paths,
            num_negatives=cfg.num_negatives,
        )
        if use_paths:
            batch = _with_path_data(k_nr, batch, data, cfg.corruption_resample_rounds)
        if parity:
            return model.sequential_update(params, batch, cfg)
        return model.batch_update(params, batch, cfg)

    def run(params: Params, key: jax.Array, data: DeviceData):
        return step(params, key, data, data.n_entities)

    return run


def batch_size_for(ts_num_triples: int, num_batches: int) -> int:
    """Reference batch size: |T| / numBatches (common/trainer.cpp:70)."""
    return max(1, ts_num_triples // num_batches)


# Chunks per launch for chunk-sequential models.  History: the r03/r04 axon
# backend had a runtime kernel fault on the chunk pipeline that forced short
# segments (10 trips in r03; by r04 even 5 crashed).  The trigger — the
# vmapped while-loop ball projector — was isolated by ablation and replaced
# with straight-line code (models/transr.py), after which a FULL 472-chunk
# FB15k epoch executes reliably as one launch (probe ladder 40/120/472 all
# pass, 1.9-2.6 ms/chunk — PERF.md "Axon segment fault").  The default now
# fuses typical epochs into one launch; segmentation machinery stays as
# probe-backed insurance (re-probe: benchmarks/segment_probe.py) and for
# very large datasets.  Env-overridable for fault triage without a code
# change.
DEFAULT_SEGMENT_CHUNKS = 512


def segment_chunks() -> int:
    """Chunks per segment launch, read from ``KB2E_SEGMENT_CHUNKS`` at CALL
    time (not import time) so fault-triage overrides set after import still
    take effect.  Values < 1 are rejected loudly rather than dividing by
    zero downstream."""
    raw = os.environ.get("KB2E_SEGMENT_CHUNKS", str(DEFAULT_SEGMENT_CHUNKS))
    try:
        val = int(raw)
    except ValueError as e:
        raise ValueError(f"KB2E_SEGMENT_CHUNKS={raw!r} is not an integer") from e
    if val < 1:
        raise ValueError(f"KB2E_SEGMENT_CHUNKS must be >= 1, got {val}")
    return val


def make_epoch_runner(
    model: Model,
    cfg: EmbeddingConfig,
    batch_size: int,
    num_batches: int,
    mesh=None,
    unroll: int = 1,
    fused: "bool | None" = None,
    segment_chunks_override: "int | None" = None,
):
    """Build a jitted runner executing a WHOLE epoch (num_batches steps) in
    one launch via ``lax.scan`` — the reference's epoch loop
    (common/trainer.cpp:72-103) fused into a single XLA program.

    One launch per epoch amortises per-dispatch overhead (measured ~1.5 ms on
    tunneled runtimes — comparable to the whole step's compute) and lets XLA
    schedule across batch boundaries.  Returns (params, epoch_loss).

    With ``mesh`` set, sharding constraints pin each batch to the ``data``
    axis and the parameters to their canonical PartitionSpecs
    (kb2e_tpu/parallel/sharding.py) — GSPMD partitions the whole epoch
    program across the mesh.

    ``fused`` (auto when None): single-device TransE runs the scan over ONE
    combined [N+R, k] table (``Model.fused_table_update``) — one gather, one
    scatter, one projection per batch instead of two of each.  Same numerics,
    fewer per-scan-step ops (the measured TPU bottleneck, PERF.md).
    """
    method = Method.from_any(cfg.method)
    if fused is None:
        fused = mesh is None and getattr(model, "supports_fused_table", False)
    elif fused and not getattr(model, "supports_fused_table", False):
        raise ValueError(f"model {model.name} has no fused-table update")
    if fused and mesh is not None:
        raise ValueError("fused-table epoch runner is single-device only")
    if mesh is not None:
        from jax.sharding import NamedSharding

        from kb2e_tpu.parallel import sharding as shard_lib

        if batch_size % mesh.shape["data"]:
            raise ValueError(
                f"batch_size {batch_size} not divisible by data axis {mesh.shape['data']}"
            )
        batch_sharding = NamedSharding(mesh, shard_lib.BATCH_SPEC)

        def constrain_batch(b: Batch) -> Batch:
            return Batch(
                {k: jax.lax.with_sharding_constraint(v, batch_sharding) for k, v in b.items()}
            )

        def constrain_params(p: Params) -> Params:
            return {
                k: jax.lax.with_sharding_constraint(
                    v, NamedSharding(mesh, shard_lib.PARAM_SPECS[k])
                )
                for k, v in p.items()
            }
    else:
        constrain_batch = lambda b: b  # noqa: E731
        constrain_params = lambda p: p  # noqa: E731

    # K>1 negatives flatten each batch to batch_size*K pair rows.
    rows = batch_size * max(1, cfg.num_negatives)
    chunk_size = getattr(model, "chunk_size", None)
    chunked = chunk_size is not None and not fused

    def sample_all(key, data: DeviceData, n_entities: int):
        """Pre-sample EVERY batch of the epoch in one block: sampling is
        independent of the evolving parameters, and one [num_batches*B]
        gather is bandwidth-bound where per-batch [B] gathers inside the
        scan are latency-bound (measured ~5x difference on the epoch)."""
        use_paths = data.paths is not None
        if use_paths:
            key, k_nr = jax.random.split(key)
        big = corruption.sample_batch(
            key,
            data.heads,
            data.tails,
            data.rels,
            data.bern_pr_tail,
            data.sorted_h,
            data.sorted_r,
            data.sorted_t,
            n_entities=n_entities,
            batch_size=num_batches * batch_size,
            method=method,
            resample_rounds=cfg.corruption_resample_rounds,
            cuckoo_table=data.cuckoo_table,
            cuckoo_fp=data.cuckoo_fp,
            cuckoo_m=data.cuckoo_m,
            cuckoo_salt=data.cuckoo_salt,
            n_relations=data.n_relations,
            return_idx=use_paths,
            num_negatives=cfg.num_negatives,
        )
        if use_paths:
            big = _with_path_data(k_nr, big, data, cfg.corruption_resample_rounds)
        return big

    if not chunked:
        @functools.partial(jax.jit, static_argnames=("n_entities",), donate_argnames=("params",))
        def epoch(params: Params, key: jax.Array, data: DeviceData, n_entities: int):
            big = sample_all(key, data, n_entities)
            batches = Batch(
                {k: v.reshape(num_batches, rows, *v.shape[1:]) for k, v in big.items()}
            )

            if fused:
                def body(table, batch):
                    return model.fused_table_update(table, n_entities, batch, cfg)

                table, losses = jax.lax.scan(
                    body, model.fuse_params(params), batches, unroll=unroll
                )
                return model.unfuse_params(table, n_entities), losses.sum()

            def body(params, batch):
                params, loss = model.batch_update(params, constrain_batch(batch), cfg)
                return constrain_params(params), loss

            params, losses = jax.lax.scan(body, params, batches, unroll=unroll)
            return params, losses.sum()

        def run(params: Params, key: jax.Array, data: DeviceData):
            return epoch(params, key, data, data.n_entities)

        return run

    # ---- Chunk-sequential models (TransR/CTransR) --------------------------
    # Batch boundaries carry no semantics for these models — batch_update
    # applies updates chunk-by-chunk anyway — so the epoch is flattened into
    # chunk-sized mini-batches.  Two structural constraints, both from a
    # runtime kernel fault in the axon TPU backend (reproduced 2026-08-20/21
    # at FB15k shapes; see models/transr.py):
    #   1. the chunk pipeline must NOT be nested as a scan inside an epoch
    #      scan (nested-scan epoch programs crash the worker), and
    #   2. a flat scan over the chunk pipeline must stay SHORT — ~10 trips
    #      per launch executes reliably, 120+ trips crashes the worker.
    # So the epoch runs as a few-launch pipeline: one sampling launch, then
    # ceil(n_chunks / SEGMENT_CHUNKS) launches of a jitted segment scan.  At
    # the measured ~10.7 ms/chunk, the ~1.5 ms dispatch per segment is ~1.4%
    # overhead, and launches queue asynchronously (no sync until the caller
    # fetches the loss).
    # Never chunk COARSER than the configured batch: for small workloads
    # (rows < chunk_size) this keeps the original batch granularity — the
    # same number of sequential updates — instead of collapsing several
    # batches into one padded snapshot chunk.
    chunk = min(chunk_size, rows)
    if mesh is not None:
        # Keep the per-launch batch dim divisible by the data axis: GSPMD
        # would otherwise pad the sharded dim and silently unbalance shards.
        d = int(mesh.shape["data"])
        chunk = max(d, (chunk // d) * d)
    seg_chunks = (
        segment_chunks_override
        if segment_chunks_override is not None
        else segment_chunks()
    )
    if seg_chunks < 1:
        raise ValueError(f"segment_chunks_override must be >= 1, got {seg_chunks}")
    total = num_batches * rows
    n_chunks = -(-total // chunk)
    n_segments = -(-n_chunks // seg_chunks)
    padded = n_segments * seg_chunks * chunk

    @functools.partial(jax.jit, static_argnames=("n_entities",))
    def sample_epoch(key, data: DeviceData, n_entities: int):
        big = sample_all(key, data, n_entities)
        pad = padded - total

        def padc(v):
            if pad == 0:
                return v
            fill = jnp.zeros((pad, *v.shape[1:]), v.dtype)
            return jnp.concatenate([v, fill])

        big = Batch({k: padc(v) for k, v in big.items()})
        if pad:
            big = Batch({**big, "valid": big["valid"].at[total:].set(False)})
        return Batch(
            {k: v.reshape(-1, chunk, *v.shape[1:]) for k, v in big.items()}
        )

    @jax.jit
    def seg_slice(batches: Batch, start):
        return Batch(
            {
                k: jax.lax.dynamic_slice_in_dim(v, start, seg_chunks, 0)
                for k, v in batches.items()
            }
        )

    @functools.partial(jax.jit, donate_argnames=("params",))
    def run_segment(params: Params, seg: Batch):
        def body(params, batch):
            params, loss = model.batch_update(params, constrain_batch(batch), cfg)
            return constrain_params(params), loss

        params, losses = jax.lax.scan(body, params, seg, unroll=unroll)
        return params, losses.sum()

    # Diagnostic knob (KB2E_SEGMENT_SYNC=1): fetch each segment's loss
    # before dispatching the next launch, serialising the launch queue.
    # Used while bisecting the r04 axon kernel fault (it did NOT avoid the
    # fault — the trigger was the vmapped while-loop ball projector, since
    # replaced; see models/transr.py and PERF.md "Axon segment fault").
    # Default off: async queueing is correct and hides the ~33 ms tunnel RTT.
    segment_sync = os.environ.get("KB2E_SEGMENT_SYNC", "0") == "1"

    def run(params: Params, key: jax.Array, data: DeviceData):
        batches = sample_epoch(key, data, data.n_entities)
        losses = []
        for s in range(n_segments):
            seg = seg_slice(batches, jnp.int32(s * seg_chunks))
            params, seg_loss = run_segment(params, seg)
            if segment_sync:
                float(seg_loss)
            losses.append(seg_loss)
        return params, jnp.sum(jnp.stack(losses))

    return run
