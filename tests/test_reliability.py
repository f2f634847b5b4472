"""Determinism and crash-recovery (survey §5.2 / §5.3 plans).

The reference's only reproducibility story is --seed (verified bit-identical
there); ours must hold on the batched path too: same seed => bitwise-identical
parameters.  Recovery: training interrupted at a checkpoint and resumed must
reproduce the uninterrupted run exactly (deterministic key-stream replay).
"""

import numpy as np

from kb2e_tpu.config import EmbeddingConfig
from kb2e_tpu.constants import Distance, Method
from kb2e_tpu.models import get_model
from kb2e_tpu.train import loop as train_loop


def _cfg(**kw):
    base = dict(
        embedding_size=16, learning_rate=0.02, margin=1.0, method=Method.BERN,
        num_batches=4, max_epochs=6, distance=Distance.L1, seed=13,
    )
    base.update(kw)
    return EmbeddingConfig(**base)


def test_fixed_seed_bitwise_reproducible(tiny_dataset):
    model = get_model("transe")
    p1 = train_loop.train(model, _cfg(), tiny_dataset.train, verbose=False)
    p2 = train_loop.train(model, _cfg(), tiny_dataset.train, verbose=False)
    for k in p1:
        np.testing.assert_array_equal(np.asarray(p1[k]), np.asarray(p2[k]))


def test_crash_resume_matches_uninterrupted(tiny_dataset, tmp_path):
    model = get_model("transe")
    ckpt = str(tmp_path / "ckpts")

    # Uninterrupted 6-epoch run.
    p_full = train_loop.train(model, _cfg(), tiny_dataset.train, verbose=False)

    # 'Crash' after epoch 4 (checkpoint every 2), then resume to epoch 6.
    train_loop.train(
        model, _cfg(max_epochs=4), tiny_dataset.train, verbose=False,
        checkpoint_dir=ckpt, checkpoint_every=2,
    )
    p_resumed = train_loop.train(
        model, _cfg(), tiny_dataset.train, verbose=False,
        checkpoint_dir=ckpt, checkpoint_every=2, resume=True,
    )
    for k in p_full:
        np.testing.assert_allclose(
            np.asarray(p_full[k]), np.asarray(p_resumed[k]), atol=1e-7,
            err_msg=f"param {k} diverged after resume",
        )


def test_epoch_retry_on_simulated_backend_fault(tiny_dataset, capsys):
    """Backend-drift canary (train/loop.py): a chunk-sequential epoch that
    raises triggers ONE rebuild at segment length /8 and a retry of the
    SAME epoch from the retained start params — training completes instead
    of dying mid-run."""
    from kb2e_tpu.train import step as step_lib

    cfg = EmbeddingConfig(
        embedding_size=8, learning_rate=0.01, margin=1.0, method=Method.BERN,
        num_batches=4, max_epochs=4, distance=Distance.L1, seed=9,
    )
    model = get_model("transr")

    real_make = step_lib.make_epoch_runner
    calls = {"n": 0, "override": None}

    def faulty_make(*args, **kwargs):
        override = kwargs.get("segment_chunks_override")
        run = real_make(*args, **kwargs)
        if override is not None:
            calls["override"] = override
            return run  # the rebuilt (smaller-segment) runner works

        def wrapped(params, key, data):
            calls["n"] += 1
            if calls["n"] == 2:  # second epoch launch "crashes the worker"
                raise RuntimeError("simulated axon kernel fault (UNAVAILABLE)")
            return run(params, key, data)

        return wrapped

    step_lib.make_epoch_runner = faulty_make
    try:
        losses = []
        params = train_loop.train(
            model, cfg, tiny_dataset.train,
            metrics_fn=lambda rec: losses.append(rec["loss"]),
            verbose=False,
        )
    finally:
        step_lib.make_epoch_runner = real_make

    assert len(losses) == cfg.max_epochs  # every epoch completed
    assert all(np.isfinite(losses))
    assert calls["override"] == max(1, step_lib.segment_chunks() // 8)
    for v in params.values():
        assert np.isfinite(np.asarray(v)).all()
    out = capsys.readouterr().out
    assert "FAILED" in out and "KB2E_SEGMENT_CHUNKS" in out
