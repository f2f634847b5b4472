"""Multi-host runtime: rendezvous, per-host edge partitioning, global stats.

The reference is one process on one machine (survey §2.1); this module is the
from-scratch multi-host story:

* :func:`initialize` — ``jax.distributed`` rendezvous (controller-less; each
  host calls with its process id and the coordinator address).
* :func:`partition_edges` — each host takes a contiguous shard of the edge
  list (triples), so input IO scales with hosts.  Shards are wrap-padded to
  equal sizes so hosts step in lockstep; the returned ``valid`` mask flags
  the padded duplicates so they never enter statistics or sampling weights.
* :func:`global_bern_stats` — bern corruption statistics must reflect the
  *global* edge list (survey §5.8).  Distinct-(relation, entity) group counts
  do not decompose across hosts (a group can span shards), so hosts exchange
  their per-group count maps with one allgather and merge them exactly —
  the result is bitwise the single-host computation.
* :func:`allgather_edges` — rebuild the replicated global edge list from the
  per-host shards (the edge list is tiny next to the parameter tables; the
  on-device epoch sampler draws from the replicated copy while parameters
  stay sharded over the global mesh).

Failure handling (survey §5.3): a host loss tears down the slice; recovery is
restart-from-latest-checkpoint (kb2e_tpu/io/checkpoint.py) after a fresh
``initialize`` — exercised end-to-end by tests/test_multiprocess.py (2
jax.distributed processes, SIGKILL one mid-run, resume, compare params).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-host runtime (no-op for single-process runs)."""
    import jax

    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def partition_edges(
    heads: np.ndarray,
    tails: np.ndarray,
    rels: np.ndarray,
    process_id: int,
    num_processes: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Contiguous per-host shard of the triple arrays.

    Shards are padded to one common size by wrapping around the global list,
    so every host steps in lockstep with identical shapes.  Returns
    ``(heads, tails, rels, valid)`` — ``valid`` is False on wrap-padded rows,
    which must be excluded from statistics (:func:`global_bern_stats`) and
    from any sampling weight, else the wrapped edges are double-counted.
    """
    n = heads.shape[0]
    per_host = -(-n // num_processes)  # ceil
    start = process_id * per_host
    pos = start + np.arange(per_host)
    valid = pos < n
    idx = pos % n
    return heads[idx], tails[idx], rels[idx], valid


def _local_group_counts(
    rels: np.ndarray, ents: np.ndarray, direction: int
) -> np.ndarray:
    """Local distinct-(relation, entity) group count map: int64 [G, 4] rows of
    (direction, relation, entity, count)."""
    pairs = np.stack([rels.astype(np.int64), ents.astype(np.int64)], 1)
    uniq, counts = np.unique(pairs, axis=0, return_counts=True)
    out = np.empty((uniq.shape[0], 4), dtype=np.int64)
    out[:, 0] = direction
    out[:, 1:3] = uniq
    out[:, 3] = counts
    return out


def _stats_from_groups(groups: np.ndarray, n_relations: int) -> np.ndarray:
    """hpt/(hpt+tph) per relation from merged (direction, rel, ent, count)
    group rows.  Identical math to
    :func:`kb2e_tpu.data.triples.bern_tail_probability`."""
    means = np.zeros((2, n_relations), dtype=np.float64)
    for d in range(2):
        g = groups[groups[:, 0] == d]
        if g.shape[0]:
            sums = np.bincount(g[:, 1], weights=g[:, 3].astype(np.float64), minlength=n_relations)
            cnts = np.bincount(g[:, 1], minlength=n_relations)
            nz = cnts > 0
            means[d, nz] = sums[nz] / cnts[nz]
    hpt, tph = means
    denom = hpt + tph
    pr = np.full(n_relations, 0.5)
    nz = denom > 0
    pr[nz] = hpt[nz] / denom[nz]
    return pr


def _allgather_ragged(rows: np.ndarray) -> np.ndarray:
    """Allgather variable-length int64 [L, C] host arrays: pad to the global
    max L (one scalar allgather), gather, drop padding."""
    from jax.experimental import multihost_utils

    lengths = multihost_utils.process_allgather(
        np.asarray([rows.shape[0]], dtype=np.int64), tiled=True
    )
    max_len = int(lengths.max())
    pad = np.full((max_len - rows.shape[0], rows.shape[1]), -1, dtype=np.int64)
    gathered = multihost_utils.process_allgather(
        np.concatenate([rows, pad], axis=0), tiled=False
    )  # [P, max_len, C]
    parts = [gathered[p, : int(lengths[p])] for p in range(gathered.shape[0])]
    return np.concatenate(parts, axis=0)


def global_bern_stats(
    local_heads: np.ndarray,
    local_tails: np.ndarray,
    local_rels: np.ndarray,
    n_relations: int,
    valid: Optional[np.ndarray] = None,
) -> np.ndarray:
    """P(corrupt tail) per relation over the GLOBAL edge list — exact.

    Each host computes its distinct-(relation, entity) group count maps for
    both directions, one allgather exchanges them, and the merged map (group
    counts summed where a group spans hosts) reproduces the single-host
    statistics bitwise.  ``valid`` masks wrap-padded rows from
    :func:`partition_edges`.  On one process this is exactly
    :func:`kb2e_tpu.data.triples.bern_tail_probability`.
    """
    import jax

    if valid is not None:
        local_heads = local_heads[valid]
        local_tails = local_tails[valid]
        local_rels = local_rels[valid]

    if jax.process_count() == 1:
        from kb2e_tpu.data.triples import bern_tail_probability

        return bern_tail_probability(local_heads, local_tails, local_rels, n_relations)

    local = np.concatenate(
        [
            _local_group_counts(local_rels, local_tails, direction=0),  # hpt groups
            _local_group_counts(local_rels, local_heads, direction=1),  # tph groups
        ],
        axis=0,
    )
    rows = _allgather_ragged(local)
    # Merge: sum counts of identical (direction, relation, entity) groups.
    key = rows[:, :3]
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    counts = np.bincount(inv, weights=rows[:, 3].astype(np.float64))
    merged = np.concatenate([uniq, counts.astype(np.int64)[:, None]], axis=1)
    return _stats_from_groups(merged, n_relations)


def allgather_edges(
    local_heads: np.ndarray,
    local_tails: np.ndarray,
    local_rels: np.ndarray,
    valid: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Reassemble the replicated global edge list from per-host shards.

    The edge list is int32 SoA — tiny next to the [N, k] entity table — so
    replicating it on every host keeps the fused on-device epoch sampler
    (kb2e_tpu/train/step.py) unchanged under multi-process execution: each
    process holds the same triple arrays while parameter updates run sharded
    over the global mesh.  Single-process: identity (minus padding).
    """
    import jax

    if valid is not None:
        local_heads = local_heads[valid]
        local_tails = local_tails[valid]
        local_rels = local_rels[valid]
    if jax.process_count() == 1:
        return local_heads, local_tails, local_rels
    rows = np.stack(
        [
            local_heads.astype(np.int64),
            local_tails.astype(np.int64),
            local_rels.astype(np.int64),
        ],
        axis=1,
    )
    full = _allgather_ragged(rows)
    return (
        full[:, 0].astype(np.int32),
        full[:, 1].astype(np.int32),
        full[:, 2].astype(np.int32),
    )


def barrier(name: str = "kb2e_barrier") -> None:
    """Block until every process reaches this point."""
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
