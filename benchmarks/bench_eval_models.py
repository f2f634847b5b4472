"""Per-model FULL filtered-eval wall time at FB15k scale (VERDICT r3 item 8).

PERF.md's 179s-vs-2.9h eval comparison is TransE-only; the reference's
per-relation energy cache (common/evaluation.cpp:194-218) mattered MOST for
TransR, whose per-candidate energy is O(k²) — our analogue is the grouped
per-relation ``project_entities`` matmul in ``eval/harness.py``, and this
harness records what that costs per model at FB15k scale.

Protocol: synthetic FB15k-shaped KG, a 5%-suffix test split (the full 59k
reference test set at 12% takes ~3 min/model; 5% keeps the 5-model sweep
under an hour while exercising identical per-relation program shapes — the
timing scales linearly in queries, and the recorded queries/s is
size-independent), init-distribution params (eval cost does not depend on
the values), honest np.asarray syncs inside the harness.

Usage:  python benchmarks/bench_eval_models.py [--models transe,...]
        [--test-frac 0.05] [--out EVAL_MODELS.json]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

N_ENTITIES = 14_951
N_RELATIONS = 1_345
N_TRIPLES = 483_142
EMBEDDING_SIZE = 100


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="transe,transh,transr,ctransr,ptranse")
    ap.add_argument("--test-frac", type=float, default=0.05)
    ap.add_argument("--size", type=int, default=EMBEDDING_SIZE)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from kb2e_tpu.utils import runtime

    runtime.enable_compilation_cache()

    import jax

    from kb2e_tpu.config import EmbeddingConfig
    from kb2e_tpu.constants import Distance, Method
    from kb2e_tpu.data.synthetic import random_kg
    from kb2e_tpu.data.triples import Dataset, TripleSet
    from kb2e_tpu.eval import harness
    from kb2e_tpu.models import get_model

    h, t, r = random_kg(N_ENTITIES, N_RELATIONS, N_TRIPLES, seed=1)
    n_total = h.shape[0]
    n_test = int(n_total * args.test_frac)
    n_valid = n_test
    train_sl = slice(0, n_total - n_valid - n_test)
    valid_sl = slice(n_total - n_valid - n_test, n_total - n_test)
    test_sl = slice(n_total - n_test, n_total)
    ts = TripleSet.from_arrays(
        h[train_sl], t[train_sl], r[train_sl],
        n_entities=N_ENTITIES, n_relations=N_RELATIONS,
    )
    dataset = Dataset(
        entity2id={f"e{i}": i for i in range(N_ENTITIES)},
        relation2id={f"r{i}": i for i in range(N_RELATIONS)},
        train=ts,
        valid=(h[valid_sl], t[valid_sl], r[valid_sl]),
        test=(h[test_sl], t[test_sl], r[test_sl]),
    )

    cfg = EmbeddingConfig(
        embedding_size=args.size, learning_rate=0.001, margin=1.0,
        method=Method.BERN, num_batches=100, distance=Distance.L1, seed=42,
    )

    records = []
    for name in args.models.split(","):
        name = name.strip()
        model = get_model(name)
        key = jax.random.PRNGKey(cfg.resolved_seed())
        params = model.init_params(key, N_ENTITIES, N_RELATIONS, cfg)
        if name == "ctransr":
            from kb2e_tpu.models import ctransr as ctransr_lib

            centers = ctransr_lib.build_centers(
                np.asarray(params["entity"]), ts.heads, ts.tails, ts.rels,
                N_RELATIONS, model.n_clusters, seed=0,
            )
            params = model.with_centers(params, centers)

        t0 = time.perf_counter()
        metrics = harness.evaluate(model, params, dataset, cfg, verbose=False)
        wall_s = time.perf_counter() - t0
        # Second run hits the module-level jit cache: steady-state cost of
        # repeated evaluation (train loops with eval_every, sweeps) with the
        # one-dispatch scan program already compiled.  Params are perturbed
        # so the tunnel cannot serve a memoized (executable, inputs) result
        # (CLAUDE.md).
        import jax.numpy as jnp

        params_w = dict(params)
        params_w["entity"] = params["entity"] * jnp.float32(1.0 + 1e-6)
        t0 = time.perf_counter()
        harness.evaluate(model, params_w, dataset, cfg, verbose=False)
        warm_s = time.perf_counter() - t0
        queries = int(metrics["num_corruptions"])
        rec = {
            "metric": f"{name}_fb15k_n100_filtered_eval",
            "value": round(wall_s, 1),
            "unit": "s_wall",
            "warm_s": round(warm_s, 1),
            "queries": queries,
            "queries_per_s": round(queries / wall_s, 1),
            "warm_queries_per_s": round(queries / warm_s, 1),
            "candidate_scores_per_s": round(queries * N_ENTITIES / wall_s, 0),
            "test_frac": args.test_frac,
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(records, f, indent=1)


if __name__ == "__main__":
    main()
