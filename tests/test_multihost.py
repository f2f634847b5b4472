"""Multi-host helpers: edge partitioning and global bern stats."""

import numpy as np

from kb2e_tpu.data import triples as T
from kb2e_tpu.parallel import multihost


def test_partition_edges_covers_and_balances():
    n = 103
    h = np.arange(n, dtype=np.int32)
    t = (np.arange(n, dtype=np.int32) + 1) % n
    r = np.zeros(n, np.int32)
    shards = [multihost.partition_edges(h, t, r, pid, 4) for pid in range(4)]
    sizes = {s[0].shape[0] for s in shards}
    assert len(sizes) == 1  # equal shard sizes (wrap-padded)
    covered = np.unique(np.concatenate([s[0] for s in shards]))
    assert covered.shape[0] == n  # every edge appears on some host
    # The valid masks tile the global list EXACTLY once — wrap-padded
    # duplicates are flagged, not silently double-counted.
    kept = np.concatenate([s[0][s[3]] for s in shards])
    assert kept.shape[0] == n
    np.testing.assert_array_equal(np.sort(kept), np.arange(n))


def test_global_bern_stats_single_process_exact():
    rng = np.random.default_rng(0)
    h = rng.integers(0, 50, 500).astype(np.int32)
    t = rng.integers(0, 50, 500).astype(np.int32)
    r = rng.integers(0, 7, 500).astype(np.int32)
    want = T.bern_tail_probability(h, t, r, 7)
    got = multihost.global_bern_stats(h, t, r, 7)
    np.testing.assert_allclose(got, want)


def test_bern_group_merge_is_exact_across_shards():
    """The cross-host merge math: per-shard distinct-(r, entity) count maps,
    concatenated and merged by summing counts, must reproduce the whole-list
    statistics bitwise even when groups span shard boundaries (the case the
    old approximation got wrong).  Multi-process execution of the same path
    is covered by tests/test_multiprocess.py."""
    rng = np.random.default_rng(1)
    n, n_rel = 997, 5
    # Low entity cardinality => most (r, entity) groups span both shards.
    h = rng.integers(0, 12, n).astype(np.int32)
    t = rng.integers(0, 12, n).astype(np.int32)
    r = rng.integers(0, n_rel, n).astype(np.int32)
    want = T.bern_tail_probability(h, t, r, n_rel)

    rows = []
    for pid in range(3):
        sh, st, sr, valid = multihost.partition_edges(h, t, r, pid, 3)
        sh, st, sr = sh[valid], st[valid], sr[valid]
        rows.append(multihost._local_group_counts(sr, st, direction=0))
        rows.append(multihost._local_group_counts(sr, sh, direction=1))
    allrows = np.concatenate(rows, axis=0)
    key = allrows[:, :3]
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    counts = np.bincount(inv, weights=allrows[:, 3].astype(np.float64))
    merged = np.concatenate([uniq, counts.astype(np.int64)[:, None]], axis=1)
    got = multihost._stats_from_groups(merged, n_rel)
    np.testing.assert_array_equal(got, want)


def test_corruption_fallback_without_cuckoo(tiny_dataset):
    """The binary-search fallback must behave like the cuckoo path."""
    import jax
    import jax.numpy as jnp

    from kb2e_tpu.constants import Method
    from kb2e_tpu.sampling import corruption

    ts = tiny_dataset.train
    kwargs = dict(
        heads=jnp.asarray(ts.heads), tails=jnp.asarray(ts.tails),
        rels=jnp.asarray(ts.rels),
        bern_pr_tail=jnp.asarray(ts.bern_pr_tail, jnp.float32),
        sorted_h=jnp.asarray(ts.sorted_h), sorted_r=jnp.asarray(ts.sorted_r),
        sorted_t=jnp.asarray(ts.sorted_t),
        n_entities=ts.n_entities, batch_size=256, method=Method.BERN,
        resample_rounds=4, n_relations=ts.n_relations,
    )
    key = jax.random.PRNGKey(3)
    b_cuckoo = corruption.sample_batch(
        key, cuckoo_table=jnp.asarray(ts.cuckoo_table),
        cuckoo_m=ts.cuckoo_m, cuckoo_salt=ts.cuckoo_salt, **kwargs,
    )
    b_fallback = corruption.sample_batch(key, cuckoo_table=None, **kwargs)
    # Same RNG stream + both membership tests exact => identical batches.
    for k in ("ph", "pt", "r", "nh", "nt", "valid"):
        np.testing.assert_array_equal(np.asarray(b_cuckoo[k]), np.asarray(b_fallback[k]))
    known = set(zip(ts.sorted_h.tolist(), ts.sorted_r.tolist(), ts.sorted_t.tolist()))
    nh, nt, r = (np.asarray(b_fallback[k]) for k in ("nh", "nt", "r"))
    valid = np.asarray(b_fallback["valid"])
    for i in range(256):
        if valid[i]:
            assert (int(nh[i]), int(r[i]), int(nt[i])) not in known
