"""PTransE: PCRA path extraction, composition ops, relation negatives, and
end-to-end training (no reference code exists — survey §0.1 — so these tests
pin OUR defining semantics with hand-computed oracles)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kb2e_tpu.config import EmbeddingConfig
from kb2e_tpu.constants import Distance, Method
from kb2e_tpu.data import paths as paths_lib
from kb2e_tpu.data.triples import TripleSet
from kb2e_tpu.eval import harness
from kb2e_tpu.models import get_model
from kb2e_tpu.models import ptranse as ptranse_lib
from kb2e_tpu.sampling import corruption
from kb2e_tpu.train import loop as train_loop


def test_pcra_hand_example():
    """3-triple graph, every resource value hand-derivable.

    Edges: (0,1,r0), (0,2,r0), (1,2,r1); R=2, inverse ids r0⁻¹=2, r1⁻¹=3.
    """
    h = np.array([0, 0, 1]); t = np.array([1, 2, 2]); r = np.array([0, 0, 1])
    pp = paths_lib.extract_pair_paths(h, t, r, n_relations=2, max_len=2)
    # 0 →r0 1 →r1 2 : resource 1 · 1/2 · 1/1 = 0.5, the pair's only path.
    assert pp[(0, 2)] == [((0, 1), 1.0)]
    # 0 →r0 2 →r1⁻¹ 1 : the only path for (0,1).
    assert pp[(0, 1)] == [((0, 3), 1.0)]
    # 1 →r0⁻¹ 0 →r0 2.
    assert pp[(1, 2)] == [((2, 0), 1.0)]


def test_pcra_normalisation_and_ordering():
    """Pair (0,2) has two paths; confidences = R(p)/Z, sorted descending.

    Extra edges (0,3,r1), (3,2,r1) give 0 →r1 3 →r1 2 resource 1.0 next to
    0 →r0 1 →r1 2 resource 0.5 ⇒ Z = 1.5.
    """
    h = np.array([0, 0, 1, 0, 3]); t = np.array([1, 2, 2, 3, 2]); r = np.array([0, 0, 1, 1, 1])
    pp = paths_lib.extract_pair_paths(h, t, r, n_relations=2, max_len=2)
    paths_02 = dict(pp[(0, 2)])
    assert paths_02[(1, 1)] == pytest.approx(2 / 3)
    assert paths_02[(0, 1)] == pytest.approx(1 / 3)
    assert pp[(0, 2)][0][0] == (1, 1)  # highest confidence first


def test_path_store_padding():
    h = np.array([0, 0, 1]); t = np.array([1, 2, 2]); r = np.array([0, 0, 1])
    store = paths_lib.build_path_store(h, t, r, n_relations=2, max_len=2, max_paths=4)
    assert store.rels.shape == (3, 4, 2)
    # Triple 1 is the pair (0,2) -> path (0,1) with conf 1.
    np.testing.assert_array_equal(store.rels[1, 0], [0, 1])
    assert store.conf[1, 0] == pytest.approx(1.0)
    assert (store.rels[1, 1:] == -1).all() and (store.conf[1, 1:] == 0).all()
    assert store.coverage() == 1.0


def test_compose_paths_identities():
    """Padding hops must be composition identities; hand-checked values."""
    k = 4
    rel_all = jnp.arange(2 * 3 * k, dtype=jnp.float32).reshape(6, k) / 10.0
    paths = jnp.array([[[0, 4], [2, -1], [-1, -1]]], dtype=jnp.int32)  # [1,3,2]
    add = ptranse_lib.compose_paths(rel_all, paths, "add")
    np.testing.assert_allclose(add[0, 0], np.asarray(rel_all[0] + rel_all[4]), rtol=1e-6)
    np.testing.assert_allclose(add[0, 1], np.asarray(rel_all[2]), rtol=1e-6)
    np.testing.assert_allclose(add[0, 2], 0.0, atol=1e-7)
    mul = ptranse_lib.compose_paths(rel_all, paths, "mul")
    np.testing.assert_allclose(mul[0, 0], np.asarray(rel_all[0] * rel_all[4]), rtol=1e-6)
    np.testing.assert_allclose(mul[0, 1], np.asarray(rel_all[2]), rtol=1e-6)
    np.testing.assert_allclose(mul[0, 2], 1.0, atol=1e-7)
    w = jnp.concatenate([jnp.eye(k), jnp.eye(k)], axis=0) * 0.5
    rnn = ptranse_lib.compose_paths(rel_all, paths, "rnn", w)
    np.testing.assert_allclose(
        rnn[0, 0], np.tanh(0.5 * np.asarray(rel_all[0] + rel_all[4])), rtol=1e-5
    )
    # Single-hop path: carry-through, no tanh applied.
    np.testing.assert_allclose(rnn[0, 1], np.asarray(rel_all[2]), rtol=1e-6)


def test_relation_negatives_are_certified(tiny_dataset):
    ts = tiny_dataset.train
    known = set(zip(ts.heads.tolist(), ts.rels.tolist(), ts.tails.tolist()))
    B = 256
    rng = np.random.default_rng(0)
    pick = rng.integers(0, ts.num_triples, B)
    ph = jnp.asarray(ts.heads[pick]); pt = jnp.asarray(ts.tails[pick])
    r = jnp.asarray(ts.rels[pick])
    nr, valid = corruption.sample_relation_negatives(
        jax.random.PRNGKey(1), ph, pt, r, ts.n_relations,
        jnp.asarray(ts.sorted_h), jnp.asarray(ts.sorted_r), jnp.asarray(ts.sorted_t),
        resample_rounds=8,
        cuckoo_table=(None if ts.cuckoo_table is None else jnp.asarray(ts.cuckoo_table)),
        cuckoo_m=ts.cuckoo_m, cuckoo_salt=ts.cuckoo_salt,
    )
    nr, valid = np.asarray(nr), np.asarray(valid)
    assert valid.mean() > 0.9
    for i in range(B):
        if valid[i]:
            trip = (int(ph[i]), int(nr[i]), int(pt[i]))
            assert trip not in known
            assert int(nr[i]) != int(r[i])  # (h, r, t) itself is a member


@pytest.mark.parametrize("composition", ["add", "mul", "rnn"])
def test_ptranse_trains_and_evals(tiny_dataset, composition):
    ts = tiny_dataset.train
    cfg = EmbeddingConfig(
        embedding_size=16, learning_rate=0.02, margin=1.0, method=Method.BERN,
        num_batches=8, max_epochs=12, distance=Distance.L1, seed=3,
        eval_block_size=16, eval_batch_size=64,
        path_composition=composition, max_paths=4, path_length=2,
    )
    store = paths_lib.build_path_store(
        ts.heads, ts.tails, ts.rels, ts.n_relations,
        max_len=cfg.path_length, max_paths=cfg.max_paths,
    )
    assert store.coverage() > 0.5  # the dense planted KG has many 2-hop paths
    model = get_model("ptranse")
    losses = []
    params = train_loop.train(
        model, cfg, ts, metrics_fn=lambda m: losses.append(m["loss"]),
        verbose=False, path_store=store,
    )
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    metrics = harness.evaluate(model, params, tiny_dataset, cfg)
    assert metrics["filtered_hits10"] > 0.3, metrics
    # Entity/relation tables respect the unit-ball constraint.
    for name in ("entity", "relation", "relation_inv"):
        norms = np.linalg.norm(np.asarray(params[name]), axis=1)
        assert (norms <= 1.0 + 1e-4).all(), name
    if composition == "rnn":
        assert "comp_w" in params and np.isfinite(np.asarray(params["comp_w"])).all()


def test_relation_prediction_matches_bruteforce(tiny_dataset):
    """evaluate_relation_prediction vs direct per-triple scoring (TransE)."""
    ds = tiny_dataset
    cfg = EmbeddingConfig(embedding_size=8, eval_batch_size=16)
    rng = np.random.default_rng(2)
    ent = rng.normal(size=(ds.n_entities, 8)).astype(np.float32) * 0.3
    rel = rng.normal(size=(ds.n_relations, 8)).astype(np.float32) * 0.3
    model = get_model("transe")
    params = {"entity": jnp.asarray(ent), "relation": jnp.asarray(rel)}
    th, tt, tr_ = (np.asarray(a)[:25] for a in ds.test)
    metrics = harness.evaluate_relation_prediction(
        model, params, ds, cfg, test_triples=(th, tt, tr_)
    )

    known = {}
    for part in [(ds.train.heads, ds.train.tails, ds.train.rels), ds.valid, (th, tt, tr_)]:
        ph_, pt_, pr_ = (np.asarray(x) for x in part)
        for i in range(ph_.shape[0]):
            known.setdefault((int(ph_[i]), int(pt_[i])), set()).add(int(pr_[i]))

    raw_sum = filt_sum = raw_h1 = filt_h1 = 0
    R = ds.n_relations
    for i in range(th.shape[0]):
        h, t, true = int(th[i]), int(tt[i]), int(tr_[i])
        sc = np.abs((ent[t] - ent[h])[None, :] - rel).sum(1)  # [R]
        less = sc < sc[true]
        tie = (sc == sc[true]) & (np.arange(R) < true)
        raw = 1 + int((less | tie).sum())
        good = known[(h, t)] - {true}
        mask = np.ones(R, bool)
        mask[list(good)] = False
        filt = 1 + int(((less | tie) & mask).sum())
        raw_sum += raw; filt_sum += filt
        raw_h1 += raw <= 1; filt_h1 += filt <= 1
    n = th.shape[0]
    assert metrics["raw_mean_rank"] == pytest.approx(raw_sum / n)
    assert metrics["filtered_mean_rank"] == pytest.approx(filt_sum / n)
    assert metrics["raw_hits1"] == pytest.approx(raw_h1 / n)
    assert metrics["filtered_hits1"] == pytest.approx(filt_h1 / n)


def test_relation_prediction_with_path_evidence(tiny_dataset):
    """PTransE path evidence plugs into relation prediction and helps on a
    KG where paths carry signal (trained model, filtered MR must be sane)."""
    ds = tiny_dataset
    ts = ds.train
    cfg = EmbeddingConfig(
        embedding_size=16, learning_rate=0.02, margin=1.0, method=Method.BERN,
        num_batches=8, max_epochs=10, distance=Distance.L1, seed=3,
        eval_batch_size=32, max_paths=4, path_length=2,
    )
    store = paths_lib.build_path_store(
        ts.heads, ts.tails, ts.rels, ts.n_relations, max_len=2, max_paths=4,
        use_native=False,
    )
    model = get_model("ptranse")
    params = train_loop.train(model, cfg, ts, verbose=False, path_store=store)
    test_store = paths_lib.build_path_store(
        ts.heads, ts.tails, ts.rels, ts.n_relations, max_len=2, max_paths=4,
        use_native=False, query_pairs=(ds.test[0], ds.test[1]),
    )
    assert test_store.rels.shape[0] == np.asarray(ds.test[0]).shape[0]
    m = harness.evaluate_relation_prediction(
        model, params, ds, cfg, path_store=test_store
    )
    chance = (ds.n_relations + 1) / 2
    assert m["filtered_mean_rank"] < chance, m
    assert m["num_corruptions"] == np.asarray(ds.test[0]).shape[0]


def test_ptranse_warm_start_uses_negated_relation():
    model = get_model("ptranse")
    cfg = EmbeddingConfig(embedding_size=8)
    params = model.init_params(jax.random.PRNGKey(0), 10, 4, cfg)
    ent = np.random.default_rng(0).normal(size=(10, 8)) * 0.1
    rel = np.random.default_rng(1).normal(size=(4, 8)) * 0.1
    out = ptranse_lib.warm_start_params(params, ent, rel)
    np.testing.assert_allclose(
        np.asarray(out["relation_inv"]), -np.asarray(out["relation"]), rtol=1e-6
    )
