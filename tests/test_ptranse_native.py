"""Native C++ PCRA extractor parity vs the Python defining implementation."""

import numpy as np
import pytest

from kb2e_tpu.data import native_paths, paths as paths_lib
from kb2e_tpu.data.synthetic import random_kg

pytestmark = pytest.mark.skipif(
    not native_paths.available(), reason="native toolchain unavailable"
)


def _triple_pathsets(store):
    """Per-triple {path tuple: conf} dicts (order-insensitive view)."""
    out = []
    for i in range(store.rels.shape[0]):
        d = {}
        for p in range(store.rels.shape[1]):
            if store.conf[i, p] > 0:
                hops = tuple(x for x in store.rels[i, p].tolist() if x >= 0)
                d[hops] = float(store.conf[i, p])
        out.append(d)
    return out


def _compare_stores(h, t, r, n_ent, n_rel, exact_order=False, **kw):
    py = paths_lib.build_path_store(h, t, r, n_rel, use_native=False, **kw)
    nat = paths_lib.build_path_store(
        h, t, r, n_rel, use_native=True, n_entities=n_ent, **kw
    )
    if exact_order:
        np.testing.assert_array_equal(py.rels, nat.rels)
        np.testing.assert_allclose(py.conf, nat.conf, rtol=1e-5, atol=1e-7)
        return
    # Equal-confidence paths may legitimately order differently across
    # implementations (float summation order); compare as per-triple sets.
    # Callers pass a max_paths large enough that no truncation occurs.
    for dp, dn in zip(_triple_pathsets(py), _triple_pathsets(nat)):
        assert dp.keys() == dn.keys()
        for k in dp:
            assert dp[k] == pytest.approx(dn[k], rel=1e-5, abs=1e-7)


def test_native_matches_python_hand_graph():
    # Distinct confidences -> ordering and truncation must match exactly.
    h = np.array([0, 0, 1, 0, 3], np.int32)
    t = np.array([1, 2, 2, 3, 2], np.int32)
    r = np.array([0, 0, 1, 1, 1], np.int32)
    _compare_stores(h, t, r, 4, 2, exact_order=True, max_len=2, max_paths=4)


@pytest.mark.parametrize("max_len", [2, 3])
def test_native_matches_python_random_kg(max_len):
    h, t, r = random_kg(60, 6, 500, seed=11)
    _compare_stores(
        h.astype(np.int32), t.astype(np.int32), r.astype(np.int32),
        # min_conf off the lattice of exact rational confidences — analytic
        # ties at the threshold round differently across implementations.
        60, 6, max_len=max_len, max_paths=128, min_conf=0.0213,
    )


def test_native_max_branch_cap():
    h, t, r = random_kg(60, 6, 500, seed=12)
    _compare_stores(
        h.astype(np.int32), t.astype(np.int32), r.astype(np.int32),
        60, 6, max_len=2, max_paths=128, max_branch=5,
    )
