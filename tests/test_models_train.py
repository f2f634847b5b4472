"""TransH / TransR / CTransR end-to-end training smoke + warm-start chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kb2e_tpu.config import EmbeddingConfig
from kb2e_tpu.constants import Distance, Method
from kb2e_tpu.eval import harness
from kb2e_tpu.models import get_model
from kb2e_tpu.models import transr as transr_lib
from kb2e_tpu.models import ctransr as ctransr_lib
from kb2e_tpu.train import loop as train_loop


def _cfg(**kw):
    base = dict(
        embedding_size=16,
        learning_rate=0.02,
        margin=1.0,
        method=Method.BERN,
        num_batches=8,
        max_epochs=15,
        distance=Distance.L1,
        seed=3,
        eval_block_size=16,
        eval_batch_size=64,
    )
    base.update(kw)
    return EmbeddingConfig(**base)


def test_transh_learns(tiny_dataset):
    cfg = _cfg()
    model = get_model("transh")
    losses = []
    params = train_loop.train(model, cfg, tiny_dataset.train,
                              metrics_fn=lambda r: losses.append(r["loss"]), verbose=False)
    assert losses[-1] < losses[0]
    metrics = harness.evaluate(model, params, tiny_dataset, cfg)
    assert metrics["filtered_hits10"] > 0.3, metrics
    # Hyperplane normals stay unit (sphere constraint).
    w_norms = np.linalg.norm(np.asarray(params["norm"]), axis=1)
    np.testing.assert_allclose(w_norms, 1.0, atol=1e-4)


def test_transr_warm_start_chain(tiny_dataset):
    """TransE -> TransR warm start (transr/trainer.cpp:88-113 chain)."""
    cfg_e = _cfg(max_epochs=15, method=Method.UNIF)
    transe = get_model("transe")
    params_e = train_loop.train(transe, cfg_e, tiny_dataset.train, verbose=False)

    cfg_r = _cfg(max_epochs=10, learning_rate=0.01)
    transr = get_model("transr")
    params0 = transr.init_params(jax.random.PRNGKey(0),
                                 tiny_dataset.n_entities, tiny_dataset.n_relations, cfg_r)
    params0 = transr_lib.warm_start_params(
        params0, np.asarray(params_e["entity"]), np.asarray(params_e["relation"])
    )
    # Warm-started entities are sphere-normed; W stays identity.
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(params0["entity"]), axis=1), 1.0, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(params0["proj"][0]), np.eye(16), atol=1e-6)

    losses = []
    params = train_loop.train(transr, cfg_r, tiny_dataset.train, init_params=params0,
                              metrics_fn=lambda r: losses.append(r["loss"]), verbose=False)
    assert losses[-1] < losses[0] * 1.5  # training is stable
    metrics = harness.evaluate(transr, params, tiny_dataset, cfg_r)
    assert metrics["filtered_hits10"] > 0.3, metrics


def test_ctransr_trains_and_evals(tiny_dataset):
    cfg = _cfg(max_epochs=10, learning_rate=0.01)
    model = get_model("ctransr")
    ts = tiny_dataset.train
    params0 = model.init_params(jax.random.PRNGKey(0), ts.n_entities, ts.n_relations, cfg)
    centers = ctransr_lib.build_centers(
        np.asarray(params0["entity"]), ts.heads, ts.tails, ts.rels,
        ts.n_relations, model.n_clusters, seed=0,
    )
    params0 = model.with_centers(params0, centers)
    losses = []
    params = train_loop.train(model, cfg, ts, init_params=params0,
                              metrics_fn=lambda r: losses.append(r["loss"]), verbose=False)
    assert np.isfinite(losses).all()
    metrics = harness.evaluate(model, params, tiny_dataset, cfg)
    assert metrics["filtered_hits10"] > 0.2, metrics
    assert metrics["raw_mean_rank"] >= 1.0


def test_transe_fused_epoch_matches_unfused(tiny_dataset):
    """The combined-table TransE epoch path (one gather/scatter/norm per
    batch) must match the two-table path exactly: same deltas, same rows."""
    from kb2e_tpu.train import step as step_lib

    cfg = _cfg()
    model = get_model("transe")
    ts = tiny_dataset.train
    data = step_lib.DeviceData.from_triple_set(ts)
    bs = step_lib.batch_size_for(ts.num_triples, cfg.num_batches)
    params0 = model.init_params(jax.random.PRNGKey(7), ts.n_entities, ts.n_relations, cfg)
    key = jax.random.PRNGKey(11)

    run_f = step_lib.make_epoch_runner(model, cfg, bs, cfg.num_batches, fused=True)
    run_u = step_lib.make_epoch_runner(model, cfg, bs, cfg.num_batches, fused=False)
    # the epoch jit donates params — give each run its own buffers
    pf, lf = run_f(jax.tree.map(jnp.copy, params0), key, data)
    pu, lu = run_u(jax.tree.map(jnp.copy, params0), key, data)

    np.testing.assert_allclose(float(lf), float(lu), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pf["entity"]), np.asarray(pu["entity"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pf["relation"]), np.asarray(pu["relation"]), atol=1e-6)


def test_fused_epoch_rejected_for_unsupported_model(tiny_dataset):
    from kb2e_tpu.train import step as step_lib

    cfg = _cfg()
    with pytest.raises(ValueError):
        step_lib.make_epoch_runner(get_model("transh"), cfg, 8, 4, fused=True)


def test_transe_bf16_tables_train_and_eval(tiny_dataset):
    """param_dtype='bfloat16' halves row bytes (the measured bound, PERF.md);
    update math stays float32.  Training must still learn and evaluate."""
    import dataclasses

    from kb2e_tpu.train import step as step_lib

    ts = tiny_dataset.train
    cfg = _cfg(max_epochs=15)
    cfg = dataclasses.replace(cfg, param_dtype="bfloat16")
    model = get_model("transe")
    data = step_lib.DeviceData.from_triple_set(ts)
    bs = step_lib.batch_size_for(ts.num_triples, cfg.num_batches)
    params = model.init_params(jax.random.PRNGKey(1), ts.n_entities, ts.n_relations, cfg)
    assert params["entity"].dtype == jnp.bfloat16
    run = step_lib.make_epoch_runner(model, cfg, bs, cfg.num_batches)
    key = jax.random.PRNGKey(2)
    losses = []
    for _ in range(cfg.max_epochs):
        key, sk = jax.random.split(key)
        params, loss = run(params, sk, data)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert params["entity"].dtype == jnp.bfloat16  # survives the epoch scan
    metrics = harness.evaluate(model, params, tiny_dataset, cfg)
    assert metrics["filtered_hits10"] > 0.2, metrics


def test_parity_mode_warns_for_models_without_reference(tiny_dataset):
    """CTransR/PTransE have no reference binary; --update-mode parity is a
    documented no-op and must say so instead of staying silent (round-1
    review)."""
    import warnings

    cfg = _cfg(update_mode="parity", max_epochs=1)
    model = get_model("ctransr")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        train_loop.train(model, cfg, tiny_dataset.train, verbose=False)
    assert any("parity has no effect" in str(w.message) for w in rec)
