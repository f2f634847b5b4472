"""Data-layer tests: loaders, validation, bern stats, membership index."""

import numpy as np
import pytest

from kb2e_tpu.data import synthetic, vocab
from kb2e_tpu.data import triples as T


def test_load_id_file_roundtrip(tmp_path):
    path = tmp_path / "entity2id.txt"
    m = {"/m/alpha": 0, "/m/beta": 1, "gamma": 2}
    vocab.write_id_file(str(path), m)
    loaded = vocab.load_id_file(str(path))
    assert loaded == m


def test_id_contract_violation_raises(tmp_path):
    path = tmp_path / "entity2id.txt"
    path.write_text("a\t0\nb\t2\n")  # hole at 1 (quirk B13 contract)
    with pytest.raises(ValueError):
        vocab.load_id_file(str(path))


def test_triple_loader_skips_unknown_ids(tmp_path, capsys):
    e = {"a": 0, "b": 1}
    r = {"likes": 0}
    p = tmp_path / "train.txt"
    # Reference row order: head tail relation (common/loader.cpp:35).
    p.write_text("a\tb\tlikes\nzzz\tb\tlikes\na\tb\tunknown_rel\n")
    warnings = []
    h, t, rel = T.load_triple_file(str(p), e, r, warn=warnings.append)
    assert h.tolist() == [0] and t.tolist() == [1] and rel.tolist() == [0]
    assert len(warnings) == 2


def test_bern_probability_matches_hand_computation():
    # Relation 0: triples (0,1),(2,1),(3,4): tails {1:2, 4:1} -> hpt = 1.5;
    # heads {0:1, 2:1, 3:1} -> tph = 1.0. P(corrupt tail) = 1.5/2.5 = 0.6.
    heads = np.array([0, 2, 3], np.int32)
    tails = np.array([1, 1, 4], np.int32)
    rels = np.zeros(3, np.int32)
    pr = T.bern_tail_probability(heads, tails, rels, 2)
    assert pr[0] == pytest.approx(0.6)
    assert pr[1] == pytest.approx(0.5)  # unseen relation -> uniform


def test_triple_set_membership_index_sorted_unique():
    h = np.array([3, 1, 3, 1], np.int32)
    t = np.array([0, 2, 0, 2], np.int32)  # duplicates
    r = np.array([1, 0, 1, 0], np.int32)
    ts = T.TripleSet.from_arrays(h, t, r, n_entities=4, n_relations=2)
    assert ts.sorted_h.tolist() == [1, 3]
    assert ts.num_triples == 4  # working arrays keep duplicates, index dedups


def test_synthetic_dir_loads(tiny_dataset):
    ds = tiny_dataset
    assert ds.n_entities == 64 and ds.n_relations == 8
    assert ds.train.num_triples > 0
    assert ds.test is not None and ds.test[0].size > 0
    # planted KG should have consistent ranges
    assert ds.train.heads.max() < 64


def test_membership_contains():
    import jax.numpy as jnp
    from kb2e_tpu.sampling import membership

    h = np.array([0, 1, 5], np.int32)
    t = np.array([2, 3, 9], np.int32)
    r = np.array([0, 1, 1], np.int32)
    ts = T.TripleSet.from_arrays(h, t, r, n_entities=10, n_relations=2)
    qh = jnp.array([0, 0, 5, 5, 9], jnp.int32)
    qr = jnp.array([0, 1, 1, 1, 1], jnp.int32)
    qt = jnp.array([2, 2, 9, 8, 9], jnp.int32)
    got = membership.contains(
        jnp.asarray(ts.sorted_h), jnp.asarray(ts.sorted_r), jnp.asarray(ts.sorted_t),
        qh, qr, qt,
    )
    assert got.tolist() == [True, False, True, False, False]


def test_skewed_kg_statistics():
    """FB15k-statistics-matched generator: heavy-tailed degrees and a spread
    of per-relation tph/hpt (the regime bern sampling targets)."""
    from kb2e_tpu.data import synthetic

    h, t, r = synthetic.skewed_kg(2000, 24, 12000, seed=3)
    assert h.shape == t.shape == r.shape
    assert h.max() < 2000 and r.max() < 24

    deg = np.bincount(np.concatenate([h, t]), minlength=2000)
    # Power-law-ish skew: the top decile is much busier than the median.
    assert np.percentile(deg, 90) >= 2 * max(np.percentile(deg, 50), 1)

    tph, hpt = [], []
    for rel in np.unique(r):
        m = r == rel
        tph.append(m.sum() / len(np.unique(h[m])))
        hpt.append(m.sum() / len(np.unique(t[m])))
    tph, hpt = np.asarray(tph), np.asarray(hpt)
    # Cardinality mix: both 1-side and N-side relations exist on each axis,
    # so the bern tail-probability tph/(tph+hpt) genuinely varies.
    pr = tph / (tph + hpt)
    assert pr.min() < 0.35 and pr.max() > 0.65
    assert (tph > 1.5).any() and (hpt > 1.5).any()
    assert ((tph <= 1.5) & (hpt <= 1.5)).any()  # some 1-1 relations


def test_compositional_kg_stats():
    """CI pin for the planted-composition generator (VERDICT r04 item 4):
    held-out composed triples must have 2-hop witnesses in train, composed
    relations must be direct-evidence-sparse in train, and PCRA extraction
    over the train graph must find the planted (a, b) path."""
    kg = synthetic.compositional_kg(
        n_entities=800, n_base_relations=6, n_composed=4,
        n_chains=1500, n_extra_base=1500, seed=0,
    )
    B = kg.n_base_relations
    th, tt, tr = kg.train
    assert tr.max() < kg.n_relations

    # Base edges all in train; composed triples sparse in train (~direct_frac).
    comp_train = (tr >= B).sum()
    n_comp_total = comp_train + kg.valid[0].shape[0] + kg.test[0].shape[0]
    assert 0.05 <= comp_train / n_comp_total <= 0.15

    # Every held-out composed triple has a 2-hop witness (h -a-> m -b-> t).
    edges = {}
    for h, t, r in zip(th.tolist(), tt.tolist(), tr.tolist()):
        if r < B:
            edges.setdefault((h, r), set()).add(t)
    for h, t, r in zip(*(x.tolist() for x in kg.test)):
        a, b = kg.comp_pairs[r - B]
        mids = edges.get((h, int(a)), set())
        assert any(t in edges.get((m, int(b)), ()) for m in mids), (h, t, r)

    # PCRA over the train graph finds the planted path for the test pairs.
    from kb2e_tpu.data import paths as paths_lib

    eh, et, er = kg.test
    store = paths_lib.build_path_store(
        th, tt, tr, kg.n_relations, query_pairs=(eh[:200], et[:200]),
        use_native=False,
    )
    assert store.coverage() >= 0.95
    # The planted (a, b) forward-relation path appears among the extracted
    # paths for most queries.
    # In denser graphs higher-conf noise paths crowd the planted one out of
    # the top-8 slots (measured: 300 entities -> 0.52 hit, 800 -> 0.82);
    # the experiment harness uses max_paths=16 for the same reason.
    hit = 0
    for i in range(min(200, eh.shape[0])):
        a, b = kg.comp_pairs[er[i] - B]
        row = store.rels[i]  # [P, L]
        if any((p[0] == a and p[1] == b) for p in row.tolist()):
            hit += 1
    assert hit / min(200, eh.shape[0]) >= 0.75
