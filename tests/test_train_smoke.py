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
