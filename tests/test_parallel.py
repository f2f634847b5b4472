"""Sharding equivalence: mesh-sharded runs must match single-device runs.

Survey §4's distributed strategy: an 8-virtual-device CPU mesh (conftest sets
--xla_force_host_platform_device_count=8); the GSPMD train step and the
shard_map ranking must produce the same numbers as their local counterparts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kb2e_tpu.config import EmbeddingConfig
from kb2e_tpu.constants import Distance, Method
from kb2e_tpu.data.triples import TripleSet
from kb2e_tpu.eval import ranking
from kb2e_tpu.models import get_model
from kb2e_tpu.parallel import dist_step, eval as par_eval, mesh as mesh_lib, sharding
from kb2e_tpu.train import step as step_lib

N_ENT, N_REL, K = 64, 8, 16


@pytest.fixture(scope="module")
def tiny_ts():
    rng = np.random.default_rng(0)
    h = rng.integers(0, N_ENT, 400).astype(np.int32)
    t = rng.integers(0, N_ENT, 400).astype(np.int32)
    r = rng.integers(0, N_REL, 400).astype(np.int32)
    return TripleSet.from_arrays(h, t, r, n_entities=N_ENT, n_relations=N_REL)


@pytest.mark.parametrize("model_name", ["transe", "transh", "transr", "ctransr", "ptranse"])
def test_distributed_step_matches_single_device(tiny_ts, model_name):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    cfg = EmbeddingConfig(embedding_size=K, learning_rate=0.02, margin=1.0,
                          method=Method.BERN, distance=Distance.L1, seed=0)
    model = get_model(model_name)
    params0 = model.init_params(jax.random.PRNGKey(1), N_ENT, N_REL, cfg)
    key = jax.random.PRNGKey(2)
    batch_size = 32

    path_store = None
    if model_name == "ptranse":
        from kb2e_tpu.data import paths as paths_lib

        path_store = paths_lib.build_path_store(
            tiny_ts.heads, tiny_ts.tails, tiny_ts.rels, tiny_ts.n_relations,
            use_native=False,
        )
    if model_name == "ctransr":
        # EP analogue: relation_c/centers shard over 'model' (PARAM_SPECS).
        from kb2e_tpu.models import ctransr as ctransr_lib

        centers = ctransr_lib.build_centers(
            np.asarray(params0["entity"]), tiny_ts.heads, tiny_ts.tails,
            tiny_ts.rels, N_REL, model.n_clusters, seed=0,
        )
        params0 = model.with_centers(params0, centers)

    # Both steps donate their params input; give each its own copy.
    host0 = {k: np.asarray(v) for k, v in params0.items()}

    data = step_lib.DeviceData.from_triple_set(tiny_ts, path_store=path_store)
    single = step_lib.make_train_step(model, cfg, batch_size)
    p_single, loss_single = single({k: jnp.asarray(v) for k, v in host0.items()}, key, data)

    mesh = mesh_lib.make_mesh(2, 4)
    dataD = dist_step.replicate_data(
        mesh, step_lib.DeviceData.from_triple_set(tiny_ts, path_store=path_store)
    )
    paramsD = sharding.place_params(mesh, {k: jnp.asarray(v) for k, v in host0.items()})
    dist = dist_step.make_distributed_train_step(model, cfg, mesh, batch_size)
    p_dist, loss_dist = dist(paramsD, key, dataD)

    assert float(loss_single) == pytest.approx(float(loss_dist), rel=1e-5)
    for k in p_single:
        np.testing.assert_allclose(
            np.asarray(p_single[k]), np.asarray(p_dist[k]), atol=2e-6,
            err_msg=f"{model_name} param {k}",
        )


def test_sharded_rank_matches_local():
    rng = np.random.default_rng(1)
    ent = (np.round(rng.normal(size=(N_ENT, K)) * 8) / 8).astype(np.float32)
    queries = (np.round(rng.normal(size=(16, K)) * 8) / 8).astype(np.float32)
    true_idx = rng.integers(0, N_ENT, 16).astype(np.int32)
    cands = np.full((16, 8), -1, np.int32)
    cands[:, 0] = rng.integers(0, N_ENT, 16)

    proj = ranking.pad_entities(jnp.asarray(ent), 16)
    for dist in (Distance.L1, Distance.L2):
        raw_l, filt_l = ranking.rank_queries(
            proj, jnp.asarray(queries), jnp.asarray(true_idx), jnp.asarray(cands), dist, 16
        )
        mesh = mesh_lib.make_mesh(2, 4)
        proj_sharded = jax.device_put(
            proj, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("model", None))
        )
        raw_s, filt_s = par_eval.sharded_rank_queries(
            mesh, proj_sharded, jnp.asarray(queries), jnp.asarray(true_idx),
            jnp.asarray(cands), dist, block_size=16,
        )
        np.testing.assert_array_equal(np.asarray(raw_l), np.asarray(raw_s))
        np.testing.assert_array_equal(np.asarray(filt_l), np.asarray(filt_s))


def test_mesh_fused_epoch_matches_single_device(tiny_ts):
    """The mesh-aware whole-epoch runner == the single-device one."""
    from kb2e_tpu.parallel import dist_step as dist_lib

    cfg = EmbeddingConfig(embedding_size=K, learning_rate=0.02, margin=1.0,
                          method=Method.BERN, distance=Distance.L1, seed=0)
    model = get_model("transe")
    params0 = model.init_params(jax.random.PRNGKey(1), N_ENT, N_REL, cfg)
    host0 = {k: np.asarray(v) for k, v in params0.items()}
    key = jax.random.PRNGKey(5)
    batch_size, num_batches = 32, 4

    data = step_lib.DeviceData.from_triple_set(tiny_ts)
    single = step_lib.make_epoch_runner(model, cfg, batch_size, num_batches)
    p_single, loss_single = single({k: jnp.asarray(v) for k, v in host0.items()}, key, data)

    mesh = mesh_lib.make_mesh(2, 4)
    dataD = dist_lib.replicate_data(mesh, step_lib.DeviceData.from_triple_set(tiny_ts))
    paramsD = sharding.place_params(mesh, {k: jnp.asarray(v) for k, v in host0.items()})
    dist = step_lib.make_epoch_runner(model, cfg, batch_size, num_batches, mesh=mesh)
    p_dist, loss_dist = dist(paramsD, key, dataD)

    assert float(loss_single) == pytest.approx(float(loss_dist), rel=1e-5)
    for k in p_single:
        np.testing.assert_allclose(
            np.asarray(p_single[k]), np.asarray(p_dist[k]), atol=2e-6)


def test_sharded_cluster_rank_matches_local():
    """CTransR's candidate-routed rank sweep: sharded == local, exactly."""
    from kb2e_tpu.eval import ranking_cluster

    rng = np.random.default_rng(4)
    n_q, n_c = 16, 4
    ent = (np.round(rng.normal(size=(N_ENT, K)) * 8) / 8).astype(np.float32)
    proj_tab = (np.round(rng.normal(size=(N_ENT, K)) * 8) / 8).astype(np.float32)
    cvecs = (np.round(rng.normal(size=(n_c, K)) * 8) / 8).astype(np.float32)
    centers = (np.round(rng.normal(size=(n_c, K)) * 8) / 8).astype(np.float32)
    anchors = rng.integers(0, N_ENT, n_q)
    sign = np.where(rng.random(n_q) < 0.5, 1.0, -1.0).astype(np.float32)
    true_idx = rng.integers(0, N_ENT, n_q).astype(np.int32)
    cands = np.full((n_q, 8), -1, np.int32)
    cands[:, 0] = rng.integers(0, N_ENT, n_q)

    proj = ranking.pad_entities(jnp.asarray(proj_tab), 16)
    entp = ranking.pad_entities(jnp.asarray(ent), 16)
    args = (
        jnp.asarray(proj[anchors]), jnp.asarray(entp[anchors]), jnp.asarray(sign),
        jnp.asarray(cvecs), jnp.asarray(centers), jnp.asarray(true_idx),
        jnp.asarray(cands),
    )
    for dist in (Distance.L1, Distance.L2):
        raw_l, filt_l = ranking_cluster.rank_queries_clustered(
            proj, entp, *args, dist, 16
        )
        mesh = mesh_lib.make_mesh(2, 4)
        sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("model", None))
        raw_s, filt_s = par_eval.sharded_rank_queries_clustered(
            mesh, jax.device_put(proj, sh), jax.device_put(entp, sh),
            *args, dist, block_size=16,
        )
        np.testing.assert_array_equal(np.asarray(raw_l), np.asarray(raw_s))
        np.testing.assert_array_equal(np.asarray(filt_l), np.asarray(filt_s))


def test_harness_sharded_eval_matches_local_ctransr(tiny_dataset):
    """evaluate(mesh=...) covers the cluster-aware model too (EP eval)."""
    from kb2e_tpu.eval import harness
    from kb2e_tpu.models import ctransr as ctransr_lib

    cfg = EmbeddingConfig(embedding_size=16, eval_block_size=8, eval_batch_size=64,
                          eval_impl="xla")
    model = get_model("ctransr")
    params = model.init_params(jax.random.PRNGKey(6), tiny_dataset.n_entities,
                               tiny_dataset.n_relations, cfg)
    ts = tiny_dataset.train
    centers = ctransr_lib.build_centers(
        np.asarray(params["entity"]), ts.heads, ts.tails, ts.rels,
        tiny_dataset.n_relations, model.n_clusters, seed=0,
    )
    params = model.with_centers(params, centers)
    local = harness.evaluate(model, params, tiny_dataset, cfg)
    mesh = mesh_lib.make_mesh(2, 4)
    sharded = harness.evaluate(model, params, tiny_dataset, cfg, mesh=mesh)
    assert local == sharded


@pytest.mark.parametrize("model_name", ["transe", "transh", "transr"])
def test_harness_sharded_eval_matches_local(tiny_dataset, model_name):
    """evaluate(mesh=...) — the r05 sharded one-dispatch scan — must
    reproduce the single-device metrics bit-exact, for the no-projection
    model AND both per-relation projection kinds (hyperplane, matrix)."""
    from kb2e_tpu.eval import harness

    cfg = EmbeddingConfig(embedding_size=16, eval_block_size=8, eval_batch_size=64,
                          eval_impl="xla")
    model = get_model(model_name)
    params = model.init_params(
        jax.random.PRNGKey(5), tiny_dataset.n_entities, tiny_dataset.n_relations, cfg
    )
    local = harness.evaluate(model, params, tiny_dataset, cfg)
    mesh = mesh_lib.make_mesh(2, 4)
    sharded = harness.evaluate(model, params, tiny_dataset, cfg, mesh=mesh)
    assert local == sharded
