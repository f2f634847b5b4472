"""Per-model training throughput at FB15k shapes (triples/s/chip).

Extends bench.py (the driver headline, TransE-only) to the full model family:
one JSON line per model, same synthetic FB15k-shaped KG, same reference batch
policy |T|/100, same honest value-fetch sync.

``vs_baseline`` compares against the reference C++ trainer measured on THIS
machine for the SAME model family where a binary exists (trainTransE /
trainTransH / trainTransR, single thread, g++ -O3); CTransR/PTransE have no
reference binary (survey §0.1) — they compare against the TransE baseline as
the family's reference point, noted in the line.

Usage: python bench_models.py [--models transe,transh,...] [--epochs 3]
       [--skip-warm-reference]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

# Reference C++ throughput measured on this host's CPU (triples/s), same
# synthetic KG.  Methodology (2026-08-20): wall(epochs=b) - wall(epochs=a)
# over (b - a) epochs isolates the train loop from load/stats time.
# trainTransE 2.93s/epoch, trainTransH 5.29s/epoch, trainTransR 133.3s/epoch
# (O(k^2) per triple, single thread).  CTransR/PTransE have no reference
# binary (survey §0.1); the TransE figure anchors those lines.
REFERENCE_CPU_TRIPLES_PER_S = {
    "transe": 164_672.0,
    "transh": 91_354.0,
    "transr": 3_624.0,
    "ctransr": None,  # no reference binary; TransE figure used as family anchor
    "ptranse": None,
}

N_ENTITIES = 14_951
N_RELATIONS = 1_345
N_TRAIN = 483_142
EMBEDDING_SIZE = 100
NUM_BATCHES = 100
WARMUP_EPOCHS = 1


def bench_model(model_name: str, ts, cfg, measure_epochs: int) -> float:
    import jax

    from kb2e_tpu.models import get_model
    from kb2e_tpu.train import step as step_lib

    model = get_model(model_name)
    key = jax.random.PRNGKey(cfg.resolved_seed())
    params = model.init_params(key, ts.n_entities, ts.n_relations, cfg)

    path_store = None
    if model_name == "ptranse":
        from kb2e_tpu.data import paths as paths_lib

        t0 = time.perf_counter()
        path_store = paths_lib.build_path_store(
            ts.heads, ts.tails, ts.rels, ts.n_relations, max_paths=cfg.max_paths
        )
        print(f"# ptranse path extraction: {time.perf_counter() - t0:.1f}s", flush=True)
    if model_name == "ctransr":
        from kb2e_tpu.models import ctransr as ctransr_lib

        centers = ctransr_lib.build_centers(
            np.asarray(params["entity"]), ts.heads, ts.tails, ts.rels,
            ts.n_relations, get_model("ctransr").n_clusters, seed=0,
        )
        params = model.with_centers(params, centers)

    data = step_lib.DeviceData.from_triple_set(ts, path_store=path_store)
    batch_size = step_lib.batch_size_for(ts.num_triples, cfg.num_batches)
    run_epoch = step_lib.make_epoch_runner(model, cfg, batch_size, NUM_BATCHES)

    for _ in range(WARMUP_EPOCHS):
        key, sk = jax.random.split(key)
        params, loss = run_epoch(params, sk, data)
    float(loss)  # value-fetch sync (block_until_ready lies on remote backends)

    t0 = time.perf_counter()
    for _ in range(measure_epochs):
        key, sk = jax.random.split(key)
        params, loss = run_epoch(params, sk, data)
    float(loss)
    dt = time.perf_counter() - t0
    return batch_size * NUM_BATCHES * measure_epochs / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="transe,transh,transr,ctransr,ptranse")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--size", type=int, default=EMBEDDING_SIZE)
    args = ap.parse_args()

    from kb2e_tpu.utils import runtime

    runtime.enable_compilation_cache()

    from kb2e_tpu.config import EmbeddingConfig
    from kb2e_tpu.constants import Distance, Method
    from kb2e_tpu.data.synthetic import random_kg
    from kb2e_tpu.data.triples import TripleSet

    h, t, r = random_kg(N_ENTITIES, N_RELATIONS, N_TRAIN, seed=1)
    ts = TripleSet.from_arrays(h, t, r, n_entities=N_ENTITIES, n_relations=N_RELATIONS)

    cfg = EmbeddingConfig(
        embedding_size=args.size,
        learning_rate=0.001,
        margin=1.0,
        method=Method.BERN,
        num_batches=NUM_BATCHES,
        distance=Distance.L1,
        seed=42,
    )

    for name in args.models.split(","):
        name = name.strip()
        tps = bench_model(name, ts, cfg, args.epochs)
        base = REFERENCE_CPU_TRIPLES_PER_S.get(name) or REFERENCE_CPU_TRIPLES_PER_S["transe"]
        print(
            json.dumps(
                {
                    "metric": f"{name}_fb15k_n{args.size}_train_throughput",
                    "value": round(tps, 1),
                    "unit": "triples/s/chip",
                    "vs_baseline": round(tps / base, 2),
                    "baseline_model": name if REFERENCE_CPU_TRIPLES_PER_S.get(name) else "transe",
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
