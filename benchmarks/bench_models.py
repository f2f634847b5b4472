"""Per-model FB15k-scale training throughput: one JSON line per model.

VERDICT r1 item 3: ``bench.py`` measures TransE only; this harness runs the
SAME protocol (synthetic FB15k-shaped KG, reference batch policy |T|/100,
whole-epoch fused launch, honest value-fetch sync) for every model family so
the perf-hard cases (TransR's O(k²)/triple, PTransE's path terms) have
numbers of record.

Usage:  python benchmarks/bench_models.py [--models transe,transh,...]
        [--epochs 3] [--scale 1.0]

``vs_baseline`` compares each model against the reference C++ trainer measured
on this host where one exists (trainTransE / trainTransH / trainTransR on the
same synthetic KG; CTransR/PTransE have no reference binary — their
vs_baseline is against trainTransR / trainTransE respectively, the nearest
reference workload by cost profile).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

# Reference C++ throughput measured on THIS host (g++ -O3, single thread,
# idle 2-core host, 2026-08-20) via benchmarks/bench_reference.py on the same
# synthetic FB15k KG; see benchmarks/reference_baselines.json.
REFERENCE_TRIPLES_PER_S = {
    "transe": 215_004.0,
    "transh": 126_717.8,
    "transr": 4_557.5,
    "ctransr": None,  # no reference binary exists
    "ptranse": None,
}
FALLBACK_BASELINE = {  # nearest reference workload when no binary exists
    "ctransr": "transr",
    "ptranse": "transe",
}

N_ENTITIES = 14_951
N_RELATIONS = 1_345
N_TRAIN = 483_142
EMBEDDING_SIZE = 100
NUM_BATCHES = 100


def bench_model(
    model_name: str, epochs: int, scale: float, baselines: dict, negatives: int = 1
) -> dict:
    import jax

    from kb2e_tpu.config import EmbeddingConfig
    from kb2e_tpu.constants import Distance, Method
    from kb2e_tpu.data.synthetic import random_kg
    from kb2e_tpu.data.triples import TripleSet
    from kb2e_tpu.models import get_model
    from kb2e_tpu.train import step as step_lib

    n_train = int(N_TRAIN * scale)
    h, t, r = random_kg(N_ENTITIES, N_RELATIONS, n_train, seed=1)
    ts = TripleSet.from_arrays(h, t, r, n_entities=N_ENTITIES, n_relations=N_RELATIONS)

    cfg = EmbeddingConfig(
        embedding_size=EMBEDDING_SIZE,
        # QUALITY.md's multi-negative protocol scales the rate by 1/K.
        learning_rate=0.001 / negatives,
        margin=1.0,
        method=Method.BERN,
        num_batches=NUM_BATCHES,
        distance=Distance.L1,
        seed=42,
        num_negatives=negatives,
    )
    model = get_model(model_name)
    key = jax.random.PRNGKey(cfg.resolved_seed())
    params = model.init_params(key, ts.n_entities, ts.n_relations, cfg)

    path_store = None
    setup_s = 0.0
    if model_name == "ptranse":
        from kb2e_tpu.data import paths as paths_lib

        t0 = time.perf_counter()
        path_store = paths_lib.build_path_store(
            ts.heads, ts.tails, ts.rels, ts.n_relations,
            max_len=cfg.path_length, min_conf=cfg.path_min_conf,
            max_paths=cfg.max_paths, max_branch=cfg.path_max_branch,
        )
        setup_s = time.perf_counter() - t0
    if model_name == "ctransr":
        # Real cluster centers (zero centers would route every triple to
        # cluster 0 — same compute, but the routed-gather access pattern
        # would be unrealistically uniform).
        from kb2e_tpu.models import ctransr as ctransr_lib

        t0 = time.perf_counter()
        centers = ctransr_lib.build_centers(
            np.asarray(params["entity"]), ts.heads, ts.tails, ts.rels,
            ts.n_relations, model.n_clusters, seed=0,
        )
        params = model.with_centers(params, centers)
        setup_s = time.perf_counter() - t0

    data = step_lib.DeviceData.from_triple_set(ts, path_store=path_store)
    batch_size = step_lib.batch_size_for(ts.num_triples, cfg.num_batches)
    run_epoch = step_lib.make_epoch_runner(model, cfg, batch_size, NUM_BATCHES)

    key, sk = jax.random.split(key)
    t0 = time.perf_counter()
    params, loss = run_epoch(params, sk, data)
    float(loss)  # value fetch — the only sync that provably waits here
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(epochs):
        key, sk = jax.random.split(key)
        params, loss = run_epoch(params, sk, data)
    float(loss)
    dt = time.perf_counter() - t0

    triples_per_s = batch_size * NUM_BATCHES * epochs / dt
    base_key = model_name if baselines.get(model_name) else FALLBACK_BASELINE.get(model_name, model_name)
    base = baselines.get(base_key)
    suffix = f"_K{negatives}" if negatives > 1 else ""
    rec = {
        "metric": f"{model_name}_fb15k_n100{suffix}_train_throughput",
        "value": round(triples_per_s, 1),
        "unit": "triples/s/chip",
        "vs_baseline": (round(triples_per_s / base, 2) if base else None),
        "epoch_ms": round(dt / epochs * 1000.0, 1),
        "compile_s": round(compile_s, 1),
    }
    if negatives > 1:
        # A K-negative step does K× the pair updates per positive triple.
        rec["negatives"] = negatives
        rec["pair_updates_per_s"] = round(triples_per_s * negatives, 1)
    if setup_s:
        rec["setup_s"] = round(setup_s, 1)
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="transe,transh,transr,ctransr,ptranse")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--scale", type=float, default=1.0,
                    help="shrink n_train by this factor for quick runs")
    ap.add_argument("--negatives", type=int, default=1,
                    help="K negatives per positive (rate scaled by 1/K)")
    ap.add_argument("--baselines-json", default=None,
                    help="JSON file {model: triples_per_s} of reference C++ "
                         "numbers measured on this host")
    args = ap.parse_args()

    from kb2e_tpu.utils import runtime

    runtime.enable_compilation_cache()

    # Backend-drift canary: 2-launch chunk-pipeline smoke in a subprocess,
    # annotated into every record (the axon fault profile provably drifts
    # across backend updates — PERF.md "Axon segment fault").
    from benchmarks.segment_probe import run_canary_smoke

    canary = run_canary_smoke()
    print(json.dumps({"canary": canary}), flush=True)

    baselines = dict(REFERENCE_TRIPLES_PER_S)
    if args.baselines_json:
        with open(args.baselines_json) as f:
            baselines.update(json.load(f))
    baselines = {k: v for k, v in baselines.items() if v}

    for name in args.models.split(","):
        rec = bench_model(name.strip(), args.epochs, args.scale, baselines,
                          negatives=args.negatives)
        rec["canary_ok"] = canary.get("ok")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
