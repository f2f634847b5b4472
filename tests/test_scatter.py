"""scatter_add_dedup must equal the direct duplicate-tolerant scatter-add."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kb2e_tpu.ops import scatter


@pytest.mark.parametrize("m,n", [(1, 5), (64, 16), (1000, 37)])
def test_dedup_matches_direct(m, n):
    rng = np.random.default_rng(m)
    table = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, m).astype(np.int32))
    delta = jnp.asarray(rng.normal(size=(m, 8)).astype(np.float32))
    direct = scatter.scatter_add_direct(table, idx, delta)
    dedup = scatter.scatter_add_dedup(table, idx, delta)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(dedup), atol=1e-5)


def test_dedup_all_same_row():
    table = jnp.zeros((4, 3), jnp.float32)
    idx = jnp.array([2, 2, 2, 2], jnp.int32)
    delta = jnp.ones((4, 3), jnp.float32)
    out = np.asarray(scatter.scatter_add_dedup(table, idx, delta))
    np.testing.assert_allclose(out[2], 4.0)
    assert (out[[0, 1, 3]] == 0).all()


def test_dedup_under_jit_and_grad_free_path():
    table = jnp.zeros((10, 4), jnp.float32)
    idx = jnp.array([0, 0, 9, 3, 9, 9], jnp.int32)
    delta = jnp.arange(24, dtype=jnp.float32).reshape(6, 4)
    f = jax.jit(lambda t, i, d: scatter.scatter_add_dedup(t, i, d))
    np.testing.assert_allclose(
        np.asarray(f(table, idx, delta)),
        np.asarray(scatter.scatter_add_direct(table, idx, delta)),
        atol=1e-5,
    )


@pytest.mark.parametrize("model_name", ["transe", "transh", "transr", "ctransr", "ptranse"])
def test_batch_update_scatter_modes_agree(tiny_dataset, model_name):
    from kb2e_tpu.config import EmbeddingConfig
    from kb2e_tpu.models import get_model
    from kb2e_tpu.train import step as step_lib

    model = get_model(model_name)
    ts = tiny_dataset.train
    key = jax.random.PRNGKey(0)
    path_store = None
    if model_name == "ptranse":
        from kb2e_tpu.data import paths as paths_lib

        path_store = paths_lib.build_path_store(
            ts.heads, ts.tails, ts.rels, ts.n_relations, use_native=False
        )
    data = step_lib.DeviceData.from_triple_set(ts, path_store=path_store)
    outs = {}
    for mode in ("direct", "dedup"):
        cfg = EmbeddingConfig(embedding_size=16, seed=1, scatter_mode=mode)
        params = model.init_params(jax.random.PRNGKey(2), ts.n_entities, ts.n_relations, cfg)
        run = step_lib.make_train_step(model, cfg, 64)
        outs[mode] = run(params, key, data)
    np.testing.assert_allclose(float(outs["direct"][1]), float(outs["dedup"][1]), rtol=1e-6)
    for k in outs["direct"][0]:
        np.testing.assert_allclose(
            np.asarray(outs["direct"][0][k]), np.asarray(outs["dedup"][0][k]),
            atol=1e-5, err_msg=f"{model_name} param {k}",
        )
