"""Allclose parity: JAX 'parity mode' (sequential_update) vs the NumPy oracle.

This is the survey §4 north star adapted to portable RNG: identical injected
sample streams drive both implementations of the reference's double-buffered
per-sample SGD; embeddings must agree allclose after each batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kb2e_tpu.config import EmbeddingConfig
from kb2e_tpu.constants import Distance
from kb2e_tpu.models import get_model
from kb2e_tpu.models.base import Batch

from oracle import TransEOracle, TransHOracle, TransROracle

N_ENT, N_REL, K, B = 24, 4, 8, 32


def _streams(rng, n_batches):
    """Injected sample streams with certified-negative corruptions."""
    batches = []
    for _ in range(n_batches):
        ph = rng.integers(0, N_ENT, B)
        pt = rng.integers(0, N_ENT, B)
        r = rng.integers(0, N_REL, B)
        corrupt_tail = rng.random(B) < 0.5
        j = rng.integers(0, N_ENT, B)
        nh = np.where(corrupt_tail, ph, j)
        nt = np.where(corrupt_tail, j, pt)
        batches.append((ph, pt, r, nh, nt))
    return batches


def _to_batch(s):
    ph, pt, r, nh, nt = (jnp.asarray(a, jnp.int32) for a in s)
    return Batch(ph=ph, pt=pt, r=r, nh=nh, nt=nt, valid=jnp.ones(B, bool))


def _init_tables(rng, ball=True):
    ent = rng.normal(size=(N_ENT, K)).astype(np.float32) * 0.3
    rel = rng.normal(size=(N_REL, K)).astype(np.float32) * 0.3
    if ball:
        for tab in (ent, rel):
            n = np.linalg.norm(tab, axis=1, keepdims=True)
            np.divide(tab, n, out=tab, where=n > 1)
    return ent, rel


@pytest.mark.parametrize("distance", [Distance.L1, Distance.L2])
def test_transe_parity(distance):
    rng = np.random.default_rng(5)
    ent, rel = _init_tables(rng)
    cfg = EmbeddingConfig(embedding_size=K, learning_rate=0.05, margin=1.0,
                          distance=distance, update_mode="parity")
    model = get_model("transe")
    params = {"entity": jnp.asarray(ent), "relation": jnp.asarray(rel)}
    oracle = TransEOracle(ent, rel, cfg.learning_rate, cfg.margin,
                          l1=(distance == Distance.L1))

    for s in _streams(rng, 3):
        params, loss = model.sequential_update(params, _to_batch(s), cfg)
        oloss = oracle.run_batch(zip(*s))
        np.testing.assert_allclose(np.asarray(params["entity"]), oracle.ent, atol=3e-5)
        np.testing.assert_allclose(np.asarray(params["relation"]), oracle.rel, atol=3e-5)
        assert float(loss) == pytest.approx(float(oloss), abs=1e-2)


def test_transh_parity():
    rng = np.random.default_rng(6)
    ent, rel = _init_tables(rng)
    w = rng.normal(size=(N_REL, K)).astype(np.float32)
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    cfg = EmbeddingConfig(embedding_size=K, learning_rate=0.05, margin=1.0,
                          update_mode="parity")
    model = get_model("transh")
    params = {"entity": jnp.asarray(ent), "relation": jnp.asarray(rel), "norm": jnp.asarray(w)}
    oracle = TransHOracle(ent, rel, w, cfg.learning_rate, cfg.margin,
                          max_iters=cfg.projection_max_iters)

    for s in _streams(rng, 2):
        params, loss = model.sequential_update(params, _to_batch(s), cfg)
        oloss = oracle.run_batch(zip(*s))
        np.testing.assert_allclose(np.asarray(params["entity"]), oracle.ent, atol=5e-5)
        np.testing.assert_allclose(np.asarray(params["relation"]), oracle.rel, atol=5e-5)
        np.testing.assert_allclose(np.asarray(params["norm"]), oracle.w, atol=5e-5)
        assert float(loss) == pytest.approx(float(oloss), abs=1e-2)


@pytest.mark.parametrize("distance", [Distance.L1, Distance.L2])
def test_transr_parity(distance):
    rng = np.random.default_rng(7)
    ent, rel = _init_tables(rng)
    # sphere-norm like the TransR warm start (transr/trainer.cpp:100-103)
    ent /= np.linalg.norm(ent, axis=1, keepdims=True)
    # NOT identity: with W=I and unit entities, ||e W||^2 sits exactly on the
    # transRNorm threshold (x > 1), and f32 rounding decides whether the
    # projection loop fires — the oracle and the jax path can legitimately
    # disagree at that knife edge.  0.7*I keeps the test off the boundary;
    # update-path parity is what's under test, not the init.
    W = 0.7 * np.broadcast_to(np.eye(K, dtype=np.float32), (N_REL, K, K)).copy()
    cfg = EmbeddingConfig(embedding_size=K, learning_rate=0.02, margin=1.0,
                          distance=distance, update_mode="parity")
    model = get_model("transr")
    params = {"entity": jnp.asarray(ent), "relation": jnp.asarray(rel), "proj": jnp.asarray(W)}
    oracle = TransROracle(ent, rel, W, cfg.learning_rate, cfg.margin,
                          l1=(distance == Distance.L1),
                          max_iters=cfg.projection_max_iters)

    for s in _streams(rng, 2):
        params, loss = model.sequential_update(params, _to_batch(s), cfg)
        oloss = oracle.run_batch(zip(*s))
        np.testing.assert_allclose(np.asarray(params["entity"]), oracle.ent, atol=1e-4)
        np.testing.assert_allclose(np.asarray(params["relation"]), oracle.rel, atol=1e-4)
        np.testing.assert_allclose(np.asarray(params["proj"]), oracle.w, atol=1e-4)
        assert float(loss) == pytest.approx(float(oloss), abs=1e-2)


def test_fast_parity_bridge_statistical(tiny_dataset):
    """Fast (vectorised) vs parity (sequential) mode at REALISTIC collision
    rates: the same injected sample stream drives both update paths for 25
    batches on the planted KG (64 entities, B=128 — heavy row collisions),
    and the divergence must stay bounded:

    * per-batch relative loss gap (different norm interleaving => different
      violation sets) bounded,
    * converged quality (filtered MeanRank / Hits@10 on the test split)
      agrees — the parameter tables themselves diverge pointwise (two chaotic
      numerical paths), the SEMANTICS must not.

    Tolerances are 2-3x the measured values (max rel loss gap 0.104, mean
    0.021, |dMR| 0.11, |dHits| 0.019 at seed 3).
    """
    import jax

    from kb2e_tpu.data import triples as T
    from kb2e_tpu.eval import harness

    ds = tiny_dataset
    ts = ds.train
    known = set(zip(ts.sorted_h.tolist(), ts.sorted_r.tolist(), ts.sorted_t.tolist()))
    rng = np.random.default_rng(3)
    n_ent, b, n_batches = ts.n_entities, 128, 25

    def stream():
        idx = rng.integers(0, ts.num_triples, b)
        ph, pt, r = ts.heads[idx], ts.tails[idx], ts.rels[idx]
        corrupt_tail = rng.random(b) < ts.bern_pr_tail[r]
        nh, nt = ph.copy(), pt.copy()
        for i in range(b):
            while True:
                j = rng.integers(0, n_ent)
                cand = (ph[i], r[i], j) if corrupt_tail[i] else (j, r[i], pt[i])
                if tuple(int(x) for x in cand) not in known:
                    break
            if corrupt_tail[i]:
                nt[i] = j
            else:
                nh[i] = j
        return ph, pt, r, nh, nt

    cfg = EmbeddingConfig(embedding_size=16, learning_rate=0.02, margin=1.0,
                          distance=Distance.L1)
    model = get_model("transe")
    p0 = model.init_params(jax.random.PRNGKey(0), ts.n_entities, ts.n_relations, cfg)

    def to_batch(s):
        ph, pt, r, nh, nt = (jnp.asarray(a, jnp.int32) for a in s)
        return Batch(ph=ph, pt=pt, r=r, nh=nh, nt=nt, valid=jnp.ones(b, bool))

    pf, ps = dict(p0), dict(p0)
    gaps = []
    for _ in range(n_batches):
        batch = to_batch(stream())
        pf, lf = model.batch_update(pf, batch, cfg)
        ps, ls = model.sequential_update(ps, batch, cfg)
        gaps.append(abs(float(lf) - float(ls)) / max(float(ls), 1e-9))
    assert max(gaps) < 0.25, gaps
    assert np.mean(gaps) < 0.08, gaps

    mf = harness.evaluate(model, pf, ds, cfg)
    ms = harness.evaluate(model, ps, ds, cfg)
    assert abs(mf["filtered_mean_rank"] - ms["filtered_mean_rank"]) <= 3.0
    assert abs(mf["filtered_hits10"] - ms["filtered_hits10"]) <= 0.08
    # Both must beat chance (10/64) clearly — the bridge is between two
    # LEARNING runs, not two random walks.
    assert min(mf["filtered_hits10"], ms["filtered_hits10"]) > 0.3


def test_fast_mode_matches_parity_when_no_conflicts():
    """With every sample touching disjoint rows and projections inactive, the
    vectorised fast path must equal the sequential path exactly (the only
    semantic difference is per-update norm interleaving on touched rows)."""
    rng = np.random.default_rng(8)
    # Small-magnitude tables: ball-norm never triggers, so orderings coincide.
    ent = rng.normal(size=(N_ENT, K)).astype(np.float32) * 0.05
    rel = rng.normal(size=(N_REL, K)).astype(np.float32) * 0.05
    cfg = EmbeddingConfig(embedding_size=K, learning_rate=0.01, margin=1.0,
                          distance=Distance.L1)
    model = get_model("transe")
    params = {"entity": jnp.asarray(ent), "relation": jnp.asarray(rel)}

    # 4 samples over disjoint entities and distinct relations.
    s = (np.array([0, 6, 12, 18]), np.array([1, 7, 13, 19]), np.array([0, 1, 2, 3]),
         np.array([2, 8, 14, 20]), np.array([1, 7, 13, 19]))
    batch = Batch(
        ph=jnp.asarray(s[0], jnp.int32), pt=jnp.asarray(s[1], jnp.int32),
        r=jnp.asarray(s[2], jnp.int32), nh=jnp.asarray(s[3], jnp.int32),
        nt=jnp.asarray(s[4], jnp.int32), valid=jnp.ones(4, bool),
    )
    fast, loss_f = model.batch_update(params, batch, cfg)
    seq, loss_s = model.sequential_update(params, batch, cfg)
    np.testing.assert_allclose(np.asarray(fast["entity"]), np.asarray(seq["entity"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fast["relation"]), np.asarray(seq["relation"]), atol=1e-6)
    assert float(loss_f) == pytest.approx(float(loss_s), abs=1e-4)
