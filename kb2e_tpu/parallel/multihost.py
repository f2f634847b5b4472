"""Multi-host runtime: rendezvous, per-host edge partitioning, global stats.

The reference is one process on one machine (survey §2.1); this module is the
from-scratch multi-host story:

* :func:`initialize` — ``jax.distributed`` rendezvous (controller-less; each
  host calls with its process id and the coordinator address).
* :func:`partition_edges` — each host takes a contiguous shard of the edge
  list (triples), so the input pipeline scales with hosts.  The sampler then
  draws from the local shard while parameters stay globally sharded/
  replicated across the slice.
* :func:`global_bern_stats` — bern corruption statistics must reflect the
  *global* edge list (survey §5.8); hosts compute local co-occurrence sums
  and reduce them with one psum over an all-hosts mesh axis.

Failure handling (survey §5.3): a host loss tears down the slice; recovery is
restart-from-latest-checkpoint (kb2e_tpu/io/checkpoint.py) after a fresh
``initialize`` — the "kill a host and resume" integration flow.
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
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Contiguous per-host shard of the triple arrays (padded to equal sizes
    by wrapping, so every host steps in lockstep with identical shapes)."""
    n = heads.shape[0]
    per_host = -(-n // num_processes)  # ceil
    start = process_id * per_host
    idx = (start + np.arange(per_host)) % n
    return heads[idx], tails[idx], rels[idx]


def global_bern_stats(
    local_heads: np.ndarray,
    local_tails: np.ndarray,
    local_rels: np.ndarray,
    n_relations: int,
) -> np.ndarray:
    """P(corrupt tail) per relation over the GLOBAL edge list.

    Computes local distinct-(relation, entity) co-occurrence sums/counts and
    reduces across hosts via ``jax.experimental.multihost_utils``; on one
    process it's exactly :func:`kb2e_tpu.data.triples.bern_tail_probability`.

    Note: distinct-group counting is not exactly decomposable across hosts if
    a (relation, tail) group spans hosts; the contiguous partitioner keeps
    that error tiny, and single-host runs are exact.
    """
    import jax
    from kb2e_tpu.data.triples import bern_tail_probability

    if jax.process_count() == 1:
        return bern_tail_probability(local_heads, local_tails, local_rels, n_relations)

    from jax.experimental import multihost_utils

    # Sum/count per relation computed locally, then summed across hosts.
    def stats(rel_entity):
        rels_, ents_ = rel_entity
        pairs = np.stack([rels_.astype(np.int64), ents_.astype(np.int64)], 1)
        uniq, counts = np.unique(pairs, axis=0, return_counts=True)
        sums = np.bincount(uniq[:, 0], weights=counts, minlength=n_relations)
        cnts = np.bincount(uniq[:, 0], minlength=n_relations)
        return sums, cnts

    hpt_sum, hpt_cnt = stats((local_rels, local_tails))
    tph_sum, tph_cnt = stats((local_rels, local_heads))
    stacked = np.stack([hpt_sum, hpt_cnt, tph_sum, tph_cnt]).astype(np.float64)
    reduced = multihost_utils.process_allgather(stacked).sum(axis=0)
    hpt = np.divide(reduced[0], reduced[1], out=np.zeros(n_relations), where=reduced[1] > 0)
    tph = np.divide(reduced[2], reduced[3], out=np.zeros(n_relations), where=reduced[3] > 0)
    denom = hpt + tph
    pr = np.full(n_relations, 0.5)
    nz = denom > 0
    pr[nz] = hpt[nz] / denom[nz]
    return pr
