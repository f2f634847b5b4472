"""Training smoke tests: loss decreases and link prediction beats chance."""

import jax
import numpy as np
import pytest

from kb2e_tpu.config import EmbeddingConfig
from kb2e_tpu.constants import Distance, Method
from kb2e_tpu.eval import harness
from kb2e_tpu.models import get_model
from kb2e_tpu.train import loop as train_loop
from kb2e_tpu.train import step as step_lib


def _train_and_eval(model_name, tiny_dataset, cfg, epochs_losses=None):
    model = get_model(model_name)
    losses = []
    params = train_loop.train(
        model, cfg, tiny_dataset.train,
        metrics_fn=lambda rec: losses.append(rec["loss"]),
        verbose=False,
    )
    metrics = harness.evaluate(model, params, tiny_dataset, cfg)
    return params, losses, metrics


@pytest.mark.parametrize("method", [Method.UNIF, Method.BERN])
def test_transe_learns_tiny_kg(tiny_dataset, method):
    cfg = EmbeddingConfig(
        embedding_size=16,
        learning_rate=0.02,
        margin=1.0,
        method=method,
        num_batches=8,
        max_epochs=30,
        distance=Distance.L1,
        seed=11,
        eval_block_size=16,
        eval_batch_size=64,
    )
    params, losses, metrics = _train_and_eval("transe", tiny_dataset, cfg)
    assert losses[-1] < losses[0] * 0.8, losses[:3] + losses[-3:]
    # Chance filtered hits@10 on 64 entities ≈ 10/64 ≈ 0.16; planted KG should
    # be clearly better after training.
    assert metrics["filtered_hits10"] > 0.35, metrics
    # Entity rows respect the unit ball constraint.
    norms = np.linalg.norm(np.asarray(params["entity"]), axis=1)
    assert (norms <= 1.0 + 1e-4).all()


def test_sampler_negatives_are_true_negatives(tiny_dataset):
    from kb2e_tpu.sampling import corruption

    ts = tiny_dataset.train
    data = step_lib.DeviceData.from_triple_set(ts)
    key = jax.random.PRNGKey(0)
    batch = corruption.sample_batch(
        key, data.heads, data.tails, data.rels, data.bern_pr_tail,
        data.sorted_h, data.sorted_r, data.sorted_t,
        n_entities=ts.n_entities, batch_size=512, method=Method.BERN,
    )
    known = set(zip(ts.sorted_h.tolist(), ts.sorted_r.tolist(), ts.sorted_t.tolist()))
    nh = np.asarray(batch["nh"])
    nt = np.asarray(batch["nt"])
    r = np.asarray(batch["r"])
    valid = np.asarray(batch["valid"])
    assert valid.mean() > 0.95  # resampling nearly always certifies a negative
    for i in range(512):
        if valid[i]:
            assert (int(nh[i]), int(r[i]), int(nt[i])) not in known
    # Exactly one side is corrupted per sample.
    ph, pt = np.asarray(batch["ph"]), np.asarray(batch["pt"])
    one_side = (nh == ph) ^ (nt == pt)
    both_same = (nh == ph) & (nt == pt)
    assert (one_side | both_same).all()


def test_multi_negative_sampling(tiny_dataset):
    """K>1 negatives: flattened B*K pair rows, positives tiled sample-major,
    every certified row a true negative, same corruption side per sample."""
    from kb2e_tpu.sampling import corruption

    ts = tiny_dataset.train
    data = step_lib.DeviceData.from_triple_set(ts)
    key = jax.random.PRNGKey(0)
    B, K = 128, 4
    one = corruption.sample_batch(
        key, data.heads, data.tails, data.rels, data.bern_pr_tail,
        data.sorted_h, data.sorted_r, data.sorted_t,
        n_entities=ts.n_entities, batch_size=B, method=Method.BERN,
        num_negatives=1,
    )
    multi = corruption.sample_batch(
        key, data.heads, data.tails, data.rels, data.bern_pr_tail,
        data.sorted_h, data.sorted_r, data.sorted_t,
        n_entities=ts.n_entities, batch_size=B, method=Method.BERN,
        num_negatives=K,
    )
    assert multi["nh"].shape == (B * K,)
    # Positives are the same draw, repeated sample-major.
    np.testing.assert_array_equal(np.repeat(np.asarray(one["ph"]), K), np.asarray(multi["ph"]))
    np.testing.assert_array_equal(np.repeat(np.asarray(one["r"]), K), np.asarray(multi["r"]))

    known = set(zip(ts.sorted_h.tolist(), ts.sorted_r.tolist(), ts.sorted_t.tolist()))
    nh, nt = np.asarray(multi["nh"]), np.asarray(multi["nt"])
    r, valid = np.asarray(multi["r"]), np.asarray(multi["valid"])
    assert valid.mean() > 0.95
    for i in range(B * K):
        if valid[i]:
            assert (int(nh[i]), int(r[i]), int(nt[i])) not in known
    # One corruption coin per sample: all K rows corrupt the same side.
    ph, pt = np.asarray(multi["ph"]), np.asarray(multi["pt"])
    tail_side = (nh == ph).reshape(B, K)
    head_side = (nt == pt).reshape(B, K)
    assert ((tail_side.all(1)) | (head_side.all(1))).all()


def test_multi_negative_training_runs(tiny_dataset):
    """End-to-end fused epoch with num_negatives=4 trains and reduces loss."""
    import dataclasses

    from kb2e_tpu.config import EmbeddingConfig
    from kb2e_tpu.constants import Distance
    from kb2e_tpu.models import get_model

    ts = tiny_dataset.train
    cfg = EmbeddingConfig(
        embedding_size=16, learning_rate=0.02, margin=1.0, method=Method.BERN,
        num_batches=8, max_epochs=10, distance=Distance.L1, seed=3,
        num_negatives=4,
    )
    model = get_model("transe")
    data = step_lib.DeviceData.from_triple_set(ts)
    bs = step_lib.batch_size_for(ts.num_triples, cfg.num_batches)
    params = model.init_params(jax.random.PRNGKey(1), ts.n_entities, ts.n_relations, cfg)
    run = step_lib.make_epoch_runner(model, cfg, bs, cfg.num_batches)
    key = jax.random.PRNGKey(2)
    losses = []
    for _ in range(10):
        key, sk = jax.random.split(key)
        params, loss = run(params, sk, data)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    # Unfused path accepts the flattened batches too.
    cfg2 = dataclasses.replace(cfg)
    params2 = model.init_params(jax.random.PRNGKey(1), ts.n_entities, ts.n_relations, cfg2)
    run2 = step_lib.make_epoch_runner(model, cfg2, bs, cfg2.num_batches, fused=False)
    params2, loss2 = run2(params2, jax.random.PRNGKey(5), data)
    assert np.isfinite(float(loss2))


def test_bfloat16_storage_trains_and_evals(tiny_dataset):
    """param_dtype='bfloat16' (the production bandwidth knob, PERF.md): tables
    stay bf16 through the fused epoch runner, math runs in fp32, loss drops,
    and the eval harness upcasts to fp32 ranks that beat chance."""
    import jax.numpy as jnp

    ts = tiny_dataset.train
    cfg = EmbeddingConfig(
        embedding_size=16, learning_rate=0.02, margin=1.0, method=Method.BERN,
        num_batches=8, max_epochs=30, distance=Distance.L1, seed=11,
        eval_block_size=16, eval_batch_size=64, param_dtype="bfloat16",
    )
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
    assert params["entity"].dtype == jnp.bfloat16
    assert params["relation"].dtype == jnp.bfloat16
    assert losses[-1] < losses[0] * 0.8, losses[:3] + losses[-3:]
    metrics = harness.evaluate(model, params, tiny_dataset, cfg)
    assert metrics["filtered_hits10"] > 0.35, metrics
    norms = np.linalg.norm(np.asarray(params["entity"], dtype=np.float32), axis=1)
    assert (norms <= 1.0 + 1e-2).all()


def test_segment_chunks_env_read_at_call_time(monkeypatch):
    # ADVICE r04: KB2E_SEGMENT_CHUNKS must be honored when set AFTER import
    # and must reject values < 1 loudly instead of a downstream
    # ZeroDivisionError.
    monkeypatch.setenv("KB2E_SEGMENT_CHUNKS", "7")
    assert step_lib.segment_chunks() == 7
    monkeypatch.setenv("KB2E_SEGMENT_CHUNKS", "0")
    with pytest.raises(ValueError, match=">= 1"):
        step_lib.segment_chunks()
    monkeypatch.setenv("KB2E_SEGMENT_CHUNKS", "banana")
    with pytest.raises(ValueError, match="not an integer"):
        step_lib.segment_chunks()
    monkeypatch.delenv("KB2E_SEGMENT_CHUNKS")
    assert step_lib.segment_chunks() == step_lib.DEFAULT_SEGMENT_CHUNKS


@pytest.mark.parametrize("model_name", ["transh", "transr"])
def test_multi_negative_chunk_sequential_models(tiny_dataset, model_name):
    """K>1 on TransH and the chunk-sequential TransR path (VERDICT r04
    item 6): rows = B*K flows through chunking/padding (K=3 makes B*K a
    non-multiple of TransR's 256 chunk) and training still learns."""
    from kb2e_tpu.config import EmbeddingConfig
    from kb2e_tpu.constants import Distance
    from kb2e_tpu.models import get_model

    ts = tiny_dataset.train
    cfg = EmbeddingConfig(
        embedding_size=16, learning_rate=0.02 / 3, margin=1.0,
        method=Method.BERN, num_batches=8, max_epochs=10,
        distance=Distance.L1, seed=3, num_negatives=3,
    )
    model = get_model(model_name)
    data = step_lib.DeviceData.from_triple_set(ts)
    bs = step_lib.batch_size_for(ts.num_triples, cfg.num_batches)
    assert (bs * 3) % getattr(model, "chunk_size", 1) != 0 or model_name == "transh"
    params = model.init_params(
        jax.random.PRNGKey(1), ts.n_entities, ts.n_relations, cfg
    )
    run = step_lib.make_epoch_runner(model, cfg, bs, cfg.num_batches)
    key = jax.random.PRNGKey(2)
    losses = []
    for _ in range(10):
        key, sk = jax.random.split(key)
        params, loss = run(params, sk, data)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    for v in params.values():
        assert np.isfinite(np.asarray(v)).all()
