"""Cuckoo-hash membership index for known triples.

The lexicographic binary search (kb2e_tpu/sampling/membership.py) is exact
but costs ~log2(T) sequential dependent gathers per probe — gather latency
dominates the whole training step on TPU.  This index answers the same
membership queries with TWO independent probes (classic 2-table cuckoo
hashing), and both probes for a whole batch are fused into ONE gather.

Keys are (g, t) pairs with g = h·R + r packed into int32 (valid while
N·R < 2^31 — holds for FB15k/FB40k-scale graphs; larger graphs fall back to
the binary search).  Tables are built host-side with random-walk insertion;
a failed build rehashes with fresh salts and, if needed, a larger table.

Layout: one flat int32 array of shape [2·M, 2] — row (tbl·M + slot) holds
(g, t) of the resident key, or (-1, -1) when empty.  Device-side lookup
computes both slots, gathers both rows in one ``take``, and compares.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_EMPTY = -1
# Distinct odd multipliers per table (Knuth-style multiplicative hashing).
_MULTS_G = (0x9E3779B1, 0x85EBCA77)
_MULTS_T = (0xC2B2AE3D, 0x27D4EB2F)
# Third multiplier pair for the 32-bit fingerprint (independent of the slot
# hashes so slot and fingerprint collisions are uncorrelated).
_FP_MULT_G = 0x165667B1
_FP_MULT_T = 0xD3A2646D
_FP_EMPTY = 0  # sentinel; computed fingerprints avoid it (0 -> 1)


def _hash(g: np.ndarray, t: np.ndarray, salt: int, table: int, m: int):
    """Slot index in [0, m); identical arithmetic in NumPy and jnp (uint32)."""
    h = (
        g.astype(np.uint32) * np.uint32(_MULTS_G[table])
        + t.astype(np.uint32) * np.uint32(_MULTS_T[table])
        + np.uint32(salt)
    )
    h ^= h >> np.uint32(15)
    h *= np.uint32(0x2C1B3C6D)
    h ^= h >> np.uint32(12)
    return (h % np.uint32(m)).astype(np.int32)


def _fingerprint(xp, g, t, salt: int):
    """32-bit key fingerprint, identical in NumPy and jnp (uint32 wraparound).

    Stored per slot so membership needs ONE int32 gather per probe instead
    of two (key + value) — the sampler's membership test is random-gather
    transaction-bound, so this halves its cost.  The sentinel 0 marks empty
    slots; real fingerprints map 0 -> 1 (doubles 1's probability — harmless).
    """
    u32 = (np.uint32 if xp is np else jnp.uint32)
    h = (
        g.astype(u32) * u32(_FP_MULT_G)
        + t.astype(u32) * u32(_FP_MULT_T)
        + u32(salt ^ 0x5BF03635)
    )
    h ^= h >> u32(16)
    h *= u32(0x7FEB352D)
    h ^= h >> u32(15)
    return xp.where(h == u32(_FP_EMPTY), u32(1), h).astype(
        np.int32 if xp is np else jnp.int32
    )


def _hash_jnp(g: jax.Array, t: jax.Array, salt: int, table: int, m: int) -> jax.Array:
    h = (
        g.astype(jnp.uint32) * jnp.uint32(_MULTS_G[table])
        + t.astype(jnp.uint32) * jnp.uint32(_MULTS_T[table])
        + jnp.uint32(salt)
    )
    h ^= h >> jnp.uint32(15)
    h *= jnp.uint32(0x2C1B3C6D)
    h ^= h >> jnp.uint32(12)
    return (h % jnp.uint32(m)).astype(jnp.int32)


@dataclasses.dataclass
class CuckooIndex:
    table: np.ndarray  # int32 [2*M, 2] rows of (g, t); -1 = empty
    fp: np.ndarray  # int32 [2*M] fingerprint per slot; 0 = empty
    m: int
    salt: int
    n_relations: int  # for g = h*R + r packing

    @property
    def flat(self) -> np.ndarray:
        return self.table


def build(
    heads: np.ndarray,
    rels: np.ndarray,
    tails: np.ndarray,
    n_relations: int,
    *,
    seed: int = 0,
    max_kicks: int = 500,
) -> "CuckooIndex":
    """Build the index from (deduplicated) triples.  Raises OverflowError if
    g = h·R + r doesn't fit int32 (caller falls back to binary search)."""
    g64 = heads.astype(np.int64) * n_relations + rels.astype(np.int64)
    if g64.size and g64.max() >= 2**31:
        raise OverflowError("N*R exceeds int32 packing range")
    g_all = g64.astype(np.int32)
    t_all = tails.astype(np.int32)
    n = g_all.shape[0]

    rng = np.random.default_rng(seed)
    m = 1
    while m < max(8, int(n * 1.3)):
        m *= 2

    for attempt in range(16):
        salt = int(rng.integers(0, 2**31))
        # Vectorised hashing up front: per-key global slots for both tables;
        # the insertion loop then stores key INDICES and never re-hashes.
        with np.errstate(over="ignore"):
            slots = np.stack(
                [
                    _hash(g_all, t_all, salt, 0, m).astype(np.int64),
                    _hash(g_all, t_all, salt, 1, m).astype(np.int64) + m,
                ],
                axis=1,
            )
        occupant = np.full(2 * m, _EMPTY, dtype=np.int64)  # key index per slot
        ok = True
        for i in range(n):
            key, tbl = i, 0
            for _ in range(max_kicks):
                slot = slots[key, tbl]
                resident = occupant[slot]
                occupant[slot] = key
                if resident == _EMPTY:
                    break
                # continue with the evicted key in its other table
                # (table-1 slots are offset by +m, so the two never collide)
                key = resident
                tbl = 1 if slots[key, 0] == slot else 0
            else:
                ok = False
                break
        if ok:
            table = np.full((2 * m, 2), _EMPTY, dtype=np.int32)
            filled = occupant != _EMPTY
            table[filled, 0] = g_all[occupant[filled]]
            table[filled, 1] = t_all[occupant[filled]]
            fp = np.full(2 * m, _FP_EMPTY, dtype=np.int32)
            with np.errstate(over="ignore"):
                fp[filled] = _fingerprint(
                    np, g_all[occupant[filled]], t_all[occupant[filled]], salt
                )
            return CuckooIndex(
                table=table, fp=fp, m=m, salt=salt, n_relations=n_relations
            )
        if attempt % 4 == 3:
            m *= 2  # rare: grow and retry
    raise RuntimeError("cuckoo build failed after 16 attempts")


def contains(
    table: jax.Array,  # int32 [2*M, 2]
    m: int,
    salt: int,
    n_relations: int,
    qh: jax.Array,
    qr: jax.Array,
    qt: jax.Array,
) -> jax.Array:
    """Vectorized membership over any query shape.

    The two slot probes gather from the FLATTENED table columns (1-D gathers
    whose outputs keep the query's own shape).  Stacking the probes into
    trailing [..., 2, 2] dims instead triggers TPU tile padding (each size-2
    trailing dim pads to the (8, 128) tile — a 64x HBM expansion that OOMs
    epoch-level presampling at FB15k scale with multi-negative batches).
    """
    g = qh * n_relations + qr
    s0 = _hash_jnp(g, qt, salt, 0, m)
    s1 = _hash_jnp(g, qt, salt, 1, m) + m
    keys = table[:, 0]
    vals = table[:, 1]
    hit0 = (keys[s0] == g) & (vals[s0] == qt)
    hit1 = (keys[s1] == g) & (vals[s1] == qt)
    return hit0 | hit1


def contains_fp(
    fp_table: jax.Array,  # int32 [2*M] per-slot fingerprints; 0 = empty
    m: int,
    salt: int,
    n_relations: int,
    qh: jax.Array,
    qr: jax.Array,
    qt: jax.Array,
) -> jax.Array:
    """Fingerprint membership: 2 random gathers per query instead of 4.

    The sampler's membership sweep is random-gather transaction-bound (the
    dominant cost of epoch presampling — ~13 ms per resample round at FB15k
    scale, benchmarks r05), so halving the gathers halves it.  Exactness:
    members ALWAYS match their own fingerprint, so no certified negative is
    ever a known triple (the certification the sampler needs).  A
    fingerprint collision (P ≈ 2·2⁻³² per probe) falsely rejects a true
    negative — it falls to the next resample round, a vanishing
    distribution nudge, not a correctness loss.
    """
    g = qh * n_relations + qr
    s0 = _hash_jnp(g, qt, salt, 0, m)
    s1 = _hash_jnp(g, qt, salt, 1, m) + m
    f = _fingerprint(jnp, g, qt, salt)
    return (fp_table[s0] == f) | (fp_table[s1] == f)
