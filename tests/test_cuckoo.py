"""Cuckoo membership index: exactness vs the binary-search path."""

import jax.numpy as jnp
import numpy as np

from kb2e_tpu.data import triples as T
from kb2e_tpu.sampling import cuckoo, membership


def test_cuckoo_membership_exact():
    rng = np.random.default_rng(0)
    n_ent, n_rel, n = 500, 20, 3000
    h = rng.integers(0, n_ent, n).astype(np.int32)
    t = rng.integers(0, n_ent, n).astype(np.int32)
    r = rng.integers(0, n_rel, n).astype(np.int32)
    ts = T.TripleSet.from_arrays(h, t, r, n_entities=n_ent, n_relations=n_rel)
    assert ts.cuckoo_table is not None

    # Queries: half real triples, half random (mostly absent).
    qh = np.concatenate([ts.sorted_h[:500], rng.integers(0, n_ent, 500).astype(np.int32)])
    qr = np.concatenate([ts.sorted_r[:500], rng.integers(0, n_rel, 500).astype(np.int32)])
    qt = np.concatenate([ts.sorted_t[:500], rng.integers(0, n_ent, 500).astype(np.int32)])

    want = membership.contains(
        jnp.asarray(ts.sorted_h), jnp.asarray(ts.sorted_r), jnp.asarray(ts.sorted_t),
        jnp.asarray(qh), jnp.asarray(qr), jnp.asarray(qt),
    )
    got = cuckoo.contains(
        jnp.asarray(ts.cuckoo_table), ts.cuckoo_m, ts.cuckoo_salt, n_rel,
        jnp.asarray(qh), jnp.asarray(qr), jnp.asarray(qt),
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert bool(np.asarray(got)[:500].all())  # every real triple found


def test_cuckoo_handles_2d_queries():
    h = np.array([1, 2, 3], np.int32)
    t = np.array([4, 5, 6], np.int32)
    r = np.array([0, 1, 0], np.int32)
    idx = cuckoo.build(h, r, t, n_relations=2)
    qh = jnp.asarray([[1, 2], [3, 1]], jnp.int32)
    qr = jnp.asarray([[0, 1], [0, 1]], jnp.int32)
    qt = jnp.asarray([[4, 5], [6, 4]], jnp.int32)
    got = cuckoo.contains(jnp.asarray(idx.table), idx.m, idx.salt, 2, qh, qr, qt)
    np.testing.assert_array_equal(np.asarray(got), [[True, True], [True, False]])


def test_fingerprint_probe_matches_exact():
    """contains_fp (2 gathers) agrees with the exact 4-gather probe on both
    members (guaranteed) and non-members (false-positive rate 2^-32 —
    unobservable at test scale)."""
    rng = np.random.default_rng(7)
    n_ent, n_rel = 500, 12
    h = rng.integers(0, n_ent, 3000).astype(np.int32)
    t = rng.integers(0, n_ent, 3000).astype(np.int32)
    r = rng.integers(0, n_rel, 3000).astype(np.int32)
    idx = cuckoo.build(h, r, t, n_relations=n_rel)

    qh = np.concatenate([h[:1000], rng.integers(0, n_ent, 1000).astype(np.int32)])
    qr = np.concatenate([r[:1000], rng.integers(0, n_rel, 1000).astype(np.int32)])
    qt = np.concatenate([t[:1000], rng.integers(0, n_ent, 1000).astype(np.int32)])

    exact = cuckoo.contains(
        jnp.asarray(idx.table), idx.m, idx.salt, n_rel,
        jnp.asarray(qh), jnp.asarray(qr), jnp.asarray(qt),
    )
    fp = cuckoo.contains_fp(
        jnp.asarray(idx.fp), idx.m, idx.salt, n_rel,
        jnp.asarray(qh), jnp.asarray(qr), jnp.asarray(qt),
    )
    np.testing.assert_array_equal(np.asarray(fp), np.asarray(exact))
    assert bool(np.asarray(fp)[:1000].all())  # members always detected
