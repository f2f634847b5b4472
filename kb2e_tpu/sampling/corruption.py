"""On-device batch sampling with unif/bern negative corruption.

Reference flow per sample (``common/trainer.cpp:78-98``):
  1. draw a random training triple i and a random entity j,
  2. flip the bern/unif coin — P(corrupt tail) = hpt/(hpt+tph) (bern,
     quirk B8) or 0.5 (unif, the ``pr = 500`` branch),
  3. rejection-resample j until the corrupted triple is NOT a known triple.

The unbounded rejection loop is replaced by ``resample_rounds`` fixed rounds of
vectorised resampling against the exact membership index
(:mod:`kb2e_tpu.sampling.membership`); samples still colliding after the last
round are flagged ``valid=False`` and masked out of the loss.  With uniform
candidates the per-round collision probability is deg(h,r)/N (≈1e-3 on
FB15k-scale graphs), so the miss probability after 8 rounds is astronomically
small — the observable divergence from the reference is nil, and the sampler
stays shape-static and jit-compatible.

The reference also draws j *before* the coin and reuses it as the first
candidate for either direction (common/trainer.cpp:79-97); we replicate that
ordering so injected-stream parity tests can drive both implementations with
identical decisions.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from kb2e_tpu.constants import Method
from kb2e_tpu.models.base import Batch
from kb2e_tpu.sampling import cuckoo, membership


def sample_batch(
    key: jax.Array,
    heads: jax.Array,  # int32 [T] training triples
    tails: jax.Array,
    rels: jax.Array,
    bern_pr_tail: jax.Array,  # float32 [R]
    sorted_h: jax.Array,  # binary-search membership index (fallback path)
    sorted_r: jax.Array,
    sorted_t: jax.Array,
    n_entities: int,
    batch_size: int,
    method: Method,
    resample_rounds: int = 8,
    cuckoo_table: Optional[jax.Array] = None,  # [2*M, 2] fast-path index
    cuckoo_m: int = 0,
    cuckoo_salt: int = 0,
    cuckoo_fp: Optional[jax.Array] = None,  # [2*M] fingerprint fast probe
    n_relations: int = 0,
    return_idx: bool = False,
    num_negatives: int = 1,
) -> Batch:
    """Draw one training batch: positives + certified-negative corruptions.

    All ``resample_rounds`` candidate entities are drawn UP FRONT and their
    membership tests evaluated together (picking the first non-member per
    sample — distributionally identical to sequential rejection with the same
    try budget).  With the cuckoo index that is ONE fused gather for the whole
    batch; the sequential-gather binary search only remains as the fallback
    for graphs where (h·R + r) overflows int32.

    ``num_negatives`` K > 1 draws K certified negatives per positive (all on
    the same corruption side — one coin per sample, like the reference) and
    returns the batch FLATTENED to B·K rows with the positives repeated
    sample-major (row b·K+j is sample b's j-th negative), so downstream
    updates treat each (positive, negative) pair exactly like a reference
    sample.  K = 1 reproduces the single-negative draw bit-for-bit.
    """
    n_triples = heads.shape[0]
    k_i, k_coin, k_cands = jax.random.split(key, 3)

    i = jax.random.randint(k_i, (batch_size,), 0, n_triples, dtype=jnp.int32)
    ph, pt, r = heads[i], tails[i], rels[i]

    if method == Method.BERN:
        p_tail = bern_pr_tail[r].astype(jnp.float32)
    else:
        p_tail = jnp.full((batch_size,), 0.5, dtype=jnp.float32)
    corrupt_tail = jax.random.uniform(k_coin, (batch_size,)) < p_tail

    n_cands = max(1, resample_rounds)
    kneg = max(1, num_negatives)
    cands = jax.random.randint(
        k_cands, (batch_size, kneg, n_cands), 0, n_entities, dtype=jnp.int32
    )
    ct = corrupt_tail[:, None, None]
    qh = jnp.where(ct, ph[:, None, None], cands)
    qt = jnp.where(ct, cands, pt[:, None, None])
    qr = jnp.broadcast_to(r[:, None, None], cands.shape)

    if cuckoo_fp is not None:
        # Fingerprint probe: 2 random gathers/query instead of 4 — the
        # membership sweep is the sampler's dominant cost (see
        # cuckoo.contains_fp for the exactness argument).
        bad = cuckoo.contains_fp(
            cuckoo_fp, cuckoo_m, cuckoo_salt, n_relations, qh, qr, qt
        )
    elif cuckoo_table is not None:
        bad = cuckoo.contains(
            cuckoo_table, cuckoo_m, cuckoo_salt, n_relations, qh, qr, qt
        )
    else:
        bad = membership.contains(sorted_h, sorted_r, sorted_t, qh, qr, qt)

    ok = ~bad
    first = jnp.argmax(ok, axis=2)  # first certified negative per slot (0 if none)
    valid = jnp.any(ok, axis=2)  # [B, K]
    j = jnp.take_along_axis(cands, first[..., None], axis=2)[..., 0]  # [B, K]

    nh = jnp.where(corrupt_tail[:, None], ph[:, None], j)
    nt = jnp.where(corrupt_tail[:, None], j, pt[:, None])
    if kneg == 1:
        out = Batch(ph=ph, pt=pt, r=r, nh=nh[:, 0], nt=nt[:, 0], valid=valid[:, 0])
        if return_idx:
            # Index of each sampled positive triple — consumers with per-triple
            # side data (e.g. PTransE's path store) gather by it.
            out["idx"] = i
        return out
    rep = lambda x: jnp.repeat(x, kneg)  # noqa: E731 — sample-major tiling
    out = Batch(
        ph=rep(ph), pt=rep(pt), r=rep(r),
        nh=nh.reshape(-1), nt=nt.reshape(-1), valid=valid.reshape(-1),
    )
    if return_idx:
        out["idx"] = rep(i)
    return out


def sample_relation_negatives(
    key: jax.Array,
    ph: jax.Array,  # int32 [B] positive triple
    pt: jax.Array,
    r: jax.Array,
    n_relations: int,
    sorted_h: jax.Array,
    sorted_r: jax.Array,
    sorted_t: jax.Array,
    resample_rounds: int = 4,
    cuckoo_table: Optional[jax.Array] = None,
    cuckoo_m: int = 0,
    cuckoo_salt: int = 0,
    cuckoo_fp: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Corrupted RELATIONS for PTransE's path loss (paper eq. 8: replace r
    with r' such that (h, r', t) is false).

    Same fixed-rounds rejection design as :func:`sample_batch`; membership of
    (h, r, t) itself guarantees r' ≠ r comes out of the certification for
    free.  Returns (nr [B] int32, valid [B] bool).
    """
    batch_size = ph.shape[0]
    n_cands = max(1, resample_rounds)
    cands = jax.random.randint(
        key, (batch_size, n_cands), 0, n_relations, dtype=jnp.int32
    )
    qh = jnp.broadcast_to(ph[:, None], (batch_size, n_cands))
    qt = jnp.broadcast_to(pt[:, None], (batch_size, n_cands))
    if cuckoo_fp is not None:
        bad = cuckoo.contains_fp(
            cuckoo_fp, cuckoo_m, cuckoo_salt, n_relations, qh, cands, qt
        )
    elif cuckoo_table is not None:
        bad = cuckoo.contains(
            cuckoo_table, cuckoo_m, cuckoo_salt, n_relations, qh, cands, qt
        )
    else:
        bad = membership.contains(sorted_h, sorted_r, sorted_t, qh, cands, qt)
    ok = ~bad
    first = jnp.argmax(ok, axis=1)
    valid = jnp.any(ok, axis=1)
    nr = jnp.take_along_axis(cands, first[:, None], axis=1)[:, 0]
    return nr, valid


def batch_from_streams(
    triple_idx: jax.Array,
    candidate_j: jax.Array,
    corrupt_tail: jax.Array,
    heads: jax.Array,
    tails: jax.Array,
    rels: jax.Array,
) -> Batch:
    """Build a batch from externally injected decision streams.

    This is the parity-test entry point (survey §4): the same
    (triple index, corruption candidate, direction) stream can be fed to the
    host oracle and to the device step, sidestepping RNG differences.  The
    caller guarantees candidates are true negatives.
    """
    ph, pt, r = heads[triple_idx], tails[triple_idx], rels[triple_idx]
    nh = jnp.where(corrupt_tail, ph, candidate_j)
    nt = jnp.where(corrupt_tail, candidate_j, pt)
    valid = jnp.ones(ph.shape, dtype=bool)
    return Batch(ph=ph, pt=pt, r=r, nh=nh, nt=nt, valid=valid)
