"""Pallas sequential TransE update vs the lax.scan parity path (interpret
mode on CPU; on TPU the kernel compiles natively — verify skill)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kb2e_tpu.config import EmbeddingConfig
from kb2e_tpu.constants import Distance
from kb2e_tpu.models import get_model
from kb2e_tpu.models.base import Batch
from kb2e_tpu.ops import pallas_update


def _random_case(seed, n=40, r_n=6, k=16, b=32, self_loops=False):
    rng = np.random.default_rng(seed)
    ent = (rng.normal(size=(n, k)) * 0.4).astype(np.float32)
    rel = (rng.normal(size=(r_n, k)) * 0.4).astype(np.float32)
    ph = rng.integers(0, n, b).astype(np.int32)
    pt = rng.integers(0, n, b).astype(np.int32)
    if self_loops:
        pt[: b // 2] = ph[: b // 2]
    r = rng.integers(0, r_n, b).astype(np.int32)
    nh = rng.integers(0, n, b).astype(np.int32)
    nt = rng.integers(0, n, b).astype(np.int32)
    valid = rng.random(b) > 0.1
    return ent, rel, ph, pt, r, nh, nt, valid.astype(bool)


@pytest.mark.parametrize("distance", [Distance.L1, Distance.L2])
@pytest.mark.parametrize("self_loops", [False, True])
def test_kernel_matches_scan_parity(distance, self_loops):
    ent, rel, ph, pt, r, nh, nt, valid = _random_case(
        3 if self_loops else 1, self_loops=self_loops
    )
    cfg = EmbeddingConfig(embedding_size=16, learning_rate=0.05, margin=1.0,
                          distance=distance, update_mode="parity")
    model = get_model("transe")
    batch = Batch(
        ph=jnp.asarray(ph), pt=jnp.asarray(pt), r=jnp.asarray(r),
        nh=jnp.asarray(nh), nt=jnp.asarray(nt), valid=jnp.asarray(valid),
    )
    params = {"entity": jnp.asarray(ent), "relation": jnp.asarray(rel)}
    ref_params, ref_loss = model.sequential_update(params, batch, cfg)

    ent2, rel2, loss = pallas_update.transe_sequential_update(
        jnp.asarray(ent), jnp.asarray(rel),
        batch["ph"], batch["pt"], batch["r"], batch["nh"], batch["nt"],
        batch["valid"],
        learning_rate=0.05, margin=1.0, l1=(distance == Distance.L1),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(ent2), np.asarray(ref_params["entity"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(rel2), np.asarray(ref_params["relation"]),
                               atol=1e-5)
    assert float(loss) == pytest.approx(float(ref_loss), rel=1e-5)


@pytest.mark.parametrize("self_loops", [False, True])
def test_transh_kernel_matches_scan_parity(self_loops):
    ent, rel, ph, pt, r, nh, nt, valid = _random_case(
        11 if self_loops else 9, self_loops=self_loops
    )
    rng = np.random.default_rng(5)
    w = rng.normal(size=rel.shape).astype(np.float32)
    w /= np.linalg.norm(w, axis=-1, keepdims=True)
    cfg = EmbeddingConfig(embedding_size=16, learning_rate=0.05, margin=1.0,
                          update_mode="parity", parity_impl="scan")
    model = get_model("transh")
    batch = Batch(
        ph=jnp.asarray(ph), pt=jnp.asarray(pt), r=jnp.asarray(r),
        nh=jnp.asarray(nh), nt=jnp.asarray(nt), valid=jnp.asarray(valid),
    )
    params = {"entity": jnp.asarray(ent), "relation": jnp.asarray(rel),
              "norm": jnp.asarray(w)}
    ref_params, ref_loss = model.sequential_update(params, batch, cfg)

    ent2, rel2, w2, loss = pallas_update.transh_sequential_update(
        params["entity"], params["relation"], params["norm"],
        batch["ph"], batch["pt"], batch["r"], batch["nh"], batch["nt"],
        batch["valid"],
        learning_rate=0.05, margin=1.0, max_iters=cfg.projection_max_iters,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(ent2), np.asarray(ref_params["entity"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(rel2), np.asarray(ref_params["relation"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(ref_params["norm"]),
                               atol=1e-5)
    assert float(loss) == pytest.approx(float(ref_loss), rel=1e-5)


def test_transh_kernel_no_violations_is_identity():
    ent, rel, ph, pt, r, nh, nt, _ = _random_case(13)
    rng = np.random.default_rng(6)
    w = rng.normal(size=rel.shape).astype(np.float32)
    w /= np.linalg.norm(w, axis=-1, keepdims=True)
    valid = np.zeros_like(ph, dtype=bool)
    ent2, rel2, w2, loss = pallas_update.transh_sequential_update(
        jnp.asarray(ent), jnp.asarray(rel), jnp.asarray(w),
        jnp.asarray(ph), jnp.asarray(pt), jnp.asarray(r),
        jnp.asarray(nh), jnp.asarray(nt), jnp.asarray(valid),
        learning_rate=0.05, margin=1.0, max_iters=16, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ent2), ent)
    np.testing.assert_array_equal(np.asarray(rel2), rel)
    np.testing.assert_array_equal(np.asarray(w2), w)
    assert float(loss) == 0.0


@pytest.mark.parametrize("distance", [Distance.L1, Distance.L2])
@pytest.mark.parametrize("self_loops", [False, True])
def test_transr_kernel_matches_scan_parity(distance, self_loops):
    ent, rel, ph, pt, r, nh, nt, valid = _random_case(
        21 if self_loops else 19, self_loops=self_loops
    )
    k = ent.shape[1]
    rng = np.random.default_rng(8)
    # Identity + noise keeps W near the reference's warm-start regime while
    # still exercising the ball projector's iterative branch.
    proj = (np.broadcast_to(np.eye(k, dtype=np.float32), (rel.shape[0], k, k))
            + rng.normal(size=(rel.shape[0], k, k)).astype(np.float32) * 0.15)
    cfg = EmbeddingConfig(embedding_size=k, learning_rate=0.05, margin=1.0,
                          distance=distance, update_mode="parity",
                          parity_impl="scan")
    model = get_model("transr")
    batch = Batch(
        ph=jnp.asarray(ph), pt=jnp.asarray(pt), r=jnp.asarray(r),
        nh=jnp.asarray(nh), nt=jnp.asarray(nt), valid=jnp.asarray(valid),
    )
    params = {"entity": jnp.asarray(ent), "relation": jnp.asarray(rel),
              "proj": jnp.asarray(proj)}
    ref_params, ref_loss = model.sequential_update(params, batch, cfg)

    ent2, rel2, proj2, loss = pallas_update.transr_sequential_update(
        params["entity"], params["relation"], params["proj"],
        batch["ph"], batch["pt"], batch["r"], batch["nh"], batch["nt"],
        batch["valid"],
        learning_rate=0.05, margin=1.0, l1=(distance == Distance.L1),
        max_iters=cfg.projection_max_iters, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(ent2), np.asarray(ref_params["entity"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(rel2), np.asarray(ref_params["relation"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(proj2), np.asarray(ref_params["proj"]),
                               atol=1e-5)
    assert float(loss) == pytest.approx(float(ref_loss), rel=1e-5)


def test_transr_kernel_no_violations_is_identity():
    ent, rel, ph, pt, r, nh, nt, _ = _random_case(23)
    k = ent.shape[1]
    proj = np.broadcast_to(np.eye(k, dtype=np.float32), (rel.shape[0], k, k)).copy()
    valid = np.zeros_like(ph, dtype=bool)
    ent2, rel2, proj2, loss = pallas_update.transr_sequential_update(
        jnp.asarray(ent), jnp.asarray(rel), jnp.asarray(proj),
        jnp.asarray(ph), jnp.asarray(pt), jnp.asarray(r),
        jnp.asarray(nh), jnp.asarray(nt), jnp.asarray(valid),
        learning_rate=0.05, margin=1.0, l1=True, max_iters=16, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ent2), ent)
    np.testing.assert_array_equal(np.asarray(rel2), rel)
    np.testing.assert_array_equal(np.asarray(proj2), proj)
    assert float(loss) == 0.0


def test_kernel_no_violations_is_identity():
    ent, rel, ph, pt, r, nh, nt, _ = _random_case(7)
    # valid=False everywhere -> no updates, zero loss, tables untouched.
    valid = np.zeros_like(ph, dtype=bool)
    ent2, rel2, loss = pallas_update.transe_sequential_update(
        jnp.asarray(ent), jnp.asarray(rel),
        jnp.asarray(ph), jnp.asarray(pt), jnp.asarray(r),
        jnp.asarray(nh), jnp.asarray(nt), jnp.asarray(valid),
        learning_rate=0.05, margin=1.0, l1=True, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ent2), ent)
    np.testing.assert_array_equal(np.asarray(rel2), rel)
    assert float(loss) == 0.0
