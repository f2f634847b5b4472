"""Headline benchmark: TransE FB15k-scale training throughput (triples/s/chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "triples/s/chip", "vs_baseline": N}

Config mirrors BASELINE config 2 (TransE FB15k, n=100, bern): a synthetic
FB15k-shaped KG (14,951 entities / 1,345 relations / ~483k train triples —
the reference ships no data and this environment has no egress), reference
batch policy |T|/100, margin-ranking SGD with on-device bern corruption.

``vs_baseline`` compares against the reference C++ ``trainTransE`` measured on
THIS machine's CPU on the same synthetic KG (g++ -O3, single thread,
benchmarks/bench_reference.py): 215,004 triples/s on an idle host
(2026-08-20; the round-1 figure of 105,800 was measured while TPU tunnel
processes shared the 2 cores and understated the reference).  The reference
publishes no throughput numbers of its own (survey §6), so this measured
figure is the baseline of record.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_CPU_TRIPLES_PER_S = 215_004.0

N_ENTITIES = 14_951
N_RELATIONS = 1_345
N_TRAIN = 483_142
EMBEDDING_SIZE = 100
NUM_BATCHES = 100  # reference default => batch ≈ 4831
WARMUP_EPOCHS = 1
MEASURE_EPOCHS = 3


def main() -> None:
    import jax

    from kb2e_tpu.utils import runtime

    runtime.enable_compilation_cache()

    # Backend-drift canary: 2-launch chunk-pipeline smoke in a subprocess
    # before measuring (the axon fault profile provably drifts across
    # backend updates — PERF.md "Axon segment fault"); its result is
    # annotated into the headline JSON line.  KB2E_SKIP_CANARY=1 skips.
    from benchmarks.segment_probe import run_canary_smoke

    canary = run_canary_smoke()

    from kb2e_tpu.config import EmbeddingConfig
    from kb2e_tpu.constants import Distance, Method
    from kb2e_tpu.data.synthetic import random_kg
    from kb2e_tpu.data.triples import TripleSet
    from kb2e_tpu.models import get_model
    from kb2e_tpu.train import step as step_lib

    h, t, r = random_kg(N_ENTITIES, N_RELATIONS, N_TRAIN, seed=1)
    ts = TripleSet.from_arrays(h, t, r, n_entities=N_ENTITIES, n_relations=N_RELATIONS)

    cfg = EmbeddingConfig(
        embedding_size=EMBEDDING_SIZE,
        learning_rate=0.001,
        margin=1.0,
        method=Method.BERN,
        num_batches=NUM_BATCHES,
        distance=Distance.L1,
        seed=42,
    )
    model = get_model("transe")
    key = jax.random.PRNGKey(cfg.resolved_seed())
    params = model.init_params(key, ts.n_entities, ts.n_relations, cfg)

    data = step_lib.DeviceData.from_triple_set(ts)
    batch_size = step_lib.batch_size_for(ts.num_triples, cfg.num_batches)
    # One launch per epoch of NUM_BATCHES batches (the production path).
    run_epoch = step_lib.make_epoch_runner(model, cfg, batch_size, NUM_BATCHES)

    for _ in range(WARMUP_EPOCHS):
        key, sk = jax.random.split(key)
        params, loss = run_epoch(params, sk, data)
    float(loss)  # value fetch: block_until_ready under-reports on some
    # remote backends (lazy terminal execution) — fetching the value is the
    # only sync that provably waits for the dependency chain.

    t0 = time.perf_counter()
    for _ in range(MEASURE_EPOCHS):
        key, sk = jax.random.split(key)
        params, loss = run_epoch(params, sk, data)
    float(loss)
    dt = time.perf_counter() - t0

    triples_per_s = batch_size * NUM_BATCHES * MEASURE_EPOCHS / dt
    print(
        json.dumps(
            {
                "metric": "transe_fb15k_n100_train_throughput",
                "value": round(triples_per_s, 1),
                "unit": "triples/s/chip",
                "vs_baseline": round(triples_per_s / REFERENCE_CPU_TRIPLES_PER_S, 2),
                "canary_ok": canary.get("ok"),
            }
        )
    )


if __name__ == "__main__":
    main()
