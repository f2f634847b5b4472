"""Energy-function unit tests vs. hand-computed NumPy ports of the reference
formulas (transe/transe.cpp:17-25, transh/transh.cpp:15-28,
transr/transr.cpp:20-36 with zeroed work vectors — quirk B1 fixed)."""

import jax.numpy as jnp
import numpy as np
import pytest

from kb2e_tpu.config import EmbeddingConfig
from kb2e_tpu.constants import Distance
from kb2e_tpu.models import get_model


def _np_transe(ent, rel, h, t, r, l1):
    d = ent[t] - ent[h] - rel[r]
    return np.sum(np.abs(d)) if l1 else np.sum(d * d)


def _np_transh(ent, rel, w, h, t, r):
    wr = w[r]
    hs = np.dot(wr, ent[h])
    ts = np.dot(wr, ent[t])
    d = (ent[t] - ts * wr) - (ent[h] - hs * wr) - rel[r]
    return np.sum(np.abs(d))


def _np_transr(ent, rel, W, h, t, r, l1):
    hp = ent[h] @ W[r]  # W laid out [j, i]: proj[i] = sum_j W[j][i] h[j]
    tp = ent[t] @ W[r]
    d = tp - hp - rel[r]
    return np.sum(np.abs(d)) if l1 else np.sum(d * d)


@pytest.fixture
def small_tables():
    rng = np.random.default_rng(0)
    ent = rng.normal(size=(10, 8)).astype(np.float32)
    rel = rng.normal(size=(4, 8)).astype(np.float32)
    return ent, rel


def test_transe_energy_l1_l2(small_tables):
    ent, rel = small_tables
    model = get_model("transe")
    params = {"entity": jnp.asarray(ent), "relation": jnp.asarray(rel)}
    h = jnp.array([0, 3], jnp.int32)
    t = jnp.array([1, 7], jnp.int32)
    r = jnp.array([0, 2], jnp.int32)
    for dist, l1 in ((Distance.L1, True), (Distance.L2, False)):
        got = np.asarray(model.energy(params, h, t, r, dist))
        want = [_np_transe(ent, rel, 0, 1, 0, l1), _np_transe(ent, rel, 3, 7, 2, l1)]
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_transh_energy_ignores_distance_flag(small_tables):
    ent, rel = small_tables
    rng = np.random.default_rng(1)
    w = rng.normal(size=(4, 8)).astype(np.float32)
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    model = get_model("transh")
    params = {"entity": jnp.asarray(ent), "relation": jnp.asarray(rel), "norm": jnp.asarray(w)}
    h = jnp.array([2], jnp.int32)
    t = jnp.array([5], jnp.int32)
    r = jnp.array([1], jnp.int32)
    want = _np_transh(ent, rel, w, 2, 5, 1)
    # Quirk B5: L2 request still produces L1 energy.
    for dist in (Distance.L1, Distance.L2):
        got = float(model.energy(params, h, t, r, dist)[0])
        assert got == pytest.approx(want, rel=1e-5)


def test_transr_energy_fresh_projection(small_tables):
    ent, rel = small_tables
    rng = np.random.default_rng(2)
    W = rng.normal(size=(4, 8, 8)).astype(np.float32)
    model = get_model("transr")
    params = {"entity": jnp.asarray(ent), "relation": jnp.asarray(rel), "proj": jnp.asarray(W)}
    h = jnp.array([1, 1], jnp.int32)
    t = jnp.array([4, 4], jnp.int32)
    r = jnp.array([3, 3], jnp.int32)
    want = _np_transr(ent, rel, W, 1, 4, 3, l1=True)
    got = np.asarray(model.energy(params, h, t, r, Distance.L1))
    # Repeated evaluation must NOT accumulate (reference bug B1 is fixed).
    np.testing.assert_allclose(got, [want, want], rtol=1e-5)


def test_transr_identity_init_matches_transe(small_tables):
    ent, rel = small_tables
    W = np.broadcast_to(np.eye(8, dtype=np.float32), (4, 8, 8)).copy()
    model = get_model("transr")
    params = {"entity": jnp.asarray(ent), "relation": jnp.asarray(rel), "proj": jnp.asarray(W)}
    got = float(model.energy(params, jnp.array([0]), jnp.array([1]), jnp.array([0]), Distance.L1)[0])
    assert got == pytest.approx(_np_transe(ent, rel, 0, 1, 0, True), rel=1e-5)


def test_init_params_respect_constraints():
    cfg = EmbeddingConfig(embedding_size=16)
    import jax

    key = jax.random.PRNGKey(0)
    for name in ("transe", "transh", "transr"):
        model = get_model(name)
        p = model.init_params(key, 20, 5, cfg)
        ent_norms = np.linalg.norm(np.asarray(p["entity"]), axis=1)
        assert (ent_norms <= 1.0 + 1e-5).all()  # ball-normed (prepTrain)
        if name == "transh":
            w_norms = np.linalg.norm(np.asarray(p["norm"]), axis=1)
            np.testing.assert_allclose(w_norms, 1.0, rtol=1e-5)  # sphere
        if name == "transr":
            W = np.asarray(p["proj"])
            np.testing.assert_allclose(W[0], np.eye(16), atol=1e-6)  # identity init
