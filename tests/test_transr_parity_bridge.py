"""TransR fast-mode statistical quality bridge (VERDICT r3 item 5, ADVICE r2).

TransE/TransH get a cross-implementation training-parity test against the
compiled reference binaries (tests/test_cross_train_parity.py).  TransR
cannot: the reference's TransR energy is corrupted by the work-vector
accumulation bug B1 (transr/transr.cpp:20-24, SURVEY §8), so no honest
reference-binary comparison exists.  The bridge is therefore INTERNAL: the
fast chunk-sequential mode (models/transr.py::batch_update — the production
path, rewritten twice around the axon backend fault) is compared against the
parity oracle mode (sequential_update — itself allclose-tested against the
reference-semantics oracle in tests/oracle.py), same planted KG, same config,
seed-averaged.  A rewrite that silently regresses TransR quality now fails CI
instead of relying on a manual QUALITY.md re-run.

Registered values (64-entity KG, k=16, cold start, 100 epochs, bern,
batches=8, rate=0.02, seeds 7-9, 2026-08-21):
  fast:   filtered MR 17.95-19.32, filtered Hits@10 0.406-0.415
  parity: filtered MR 16.02-18.76, filtered Hits@10 0.420-0.509
Parity's finer update granularity (960 sequential updates/epoch vs 8 chunk
snapshots) gives it a small edge at this tiny scale; tolerances are ~3x the
seed spread, one-sided in the regression direction.
"""

import numpy as np
import pytest

SEEDS = (7, 8, 9)
EPOCHS = 100
K = 16
MR_TOL = 4.0
HITS_TOL = 0.12

pytestmark = pytest.mark.slow


def _cfg(seed, mode):
    from kb2e_tpu.config import EmbeddingConfig

    return EmbeddingConfig(
        embedding_size=K, learning_rate=0.02, margin=1.0, method=1,
        num_batches=8, max_epochs=EPOCHS, distance=0, seed=seed,
        update_mode=mode,
    )


def _eval(model, params, dataset):
    import jax.numpy as jnp

    from kb2e_tpu.eval import harness

    params = {k: jnp.asarray(v) for k, v in params.items()}
    m = harness.evaluate(model, params, dataset, _cfg(0, "fast"))
    return m["filtered_mean_rank"], m["filtered_hits10"]


def test_transr_fast_mode_converges_like_parity_oracle(tiny_dataset):
    from kb2e_tpu.models import get_model
    from kb2e_tpu.train import loop

    model = get_model("transr")
    metrics = {"fast": [], "parity": []}
    for mode in ("fast", "parity"):
        for seed in SEEDS:
            params = loop.train(model, _cfg(seed, mode), tiny_dataset.train, verbose=False)
            metrics[mode].append(_eval(model, params, tiny_dataset))

    fast_mr = float(np.mean([m[0] for m in metrics["fast"]]))
    fast_hits = float(np.mean([m[1] for m in metrics["fast"]]))
    par_mr = float(np.mean([m[0] for m in metrics["parity"]]))
    par_hits = float(np.mean([m[1] for m in metrics["parity"]]))
    detail = f"fast={metrics['fast']} parity={metrics['parity']}"

    # One-sided guard — the regression direction: fast mode must not be
    # meaningfully worse than the reference-exact oracle semantics.
    assert fast_mr <= par_mr + MR_TOL, detail
    assert fast_hits >= par_hits - HITS_TOL, detail
    # Loose two-sided band: suspiciously better by a wide margin is
    # divergence too (objective drift), with more slack.
    assert abs(fast_mr - par_mr) <= 2 * MR_TOL, detail
    assert abs(fast_hits - par_hits) <= 2 * HITS_TOL, detail
    # Both must actually have learned.  Chance filtered Hits@10 = 10/64;
    # cold-start TransR (no TransE warm start — both arms identical) sits
    # lower than warm-started runs, so the floor is 2x chance, not 3x.
    chance = 10 / 64
    assert par_hits > 2 * chance and fast_hits > 2 * chance, detail
