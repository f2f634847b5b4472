"""FB40k-scale end-to-end: train TransE + full filtered eval on one chip.

BASELINE config 5 names an "FB40k-scale sharded entity table" as the
north-star scale point.  This benchmark generates a 40k-entity synthetic KG
(~2.7× FB15k's entities, ~2.7× its triples, same 12% test fraction scaled to
5% to keep eval wall time in minutes), trains TransE with bfloat16 table
storage (the HBM-capacity knob, PERF.md), and runs the FULL filtered
link-prediction eval — the first exercise of the vectorised harness prep and
blockwise rank sweep beyond FB15k scale.

On a multi-chip mesh the same eval shards the candidate axis
(``parallel/eval.py``); single-chip wall times recorded here are the n=1
anchor for that path.

Usage:  python benchmarks/bench_fb40k.py [--out FB40K.json]
        [--entities 40000] [--triples 1292000] [--epochs 3]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=40_000)
    ap.add_argument("--relations", type=int, default=1_345)
    ap.add_argument("--triples", type=int, default=1_292_000,
                    help="generated before split; FB15k-proportional for 40k entities")
    ap.add_argument("--test-frac", type=float, default=0.05)
    ap.add_argument("--size", type=int, default=100)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--models", default="transe",
                    help="comma list; r05 artifact runs transe,transr (the "
                         "O(k^2) chunk pipeline stresses 2.7x entities "
                         "differently - VERDICT r04 item 8)")
    ap.add_argument("--dtype", default="bfloat16", choices=("float32", "bfloat16"))
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
    from kb2e_tpu.train import step as step_lib

    t_start = time.perf_counter()
    h, t, r = random_kg(args.entities, args.relations, args.triples, seed=3)
    n_total = h.shape[0]
    n_test = int(n_total * args.test_frac)
    n_valid = n_test
    # random_kg triples are i.i.d. — a suffix split is a uniform split.
    train_sl, valid_sl, test_sl = (
        slice(0, n_total - n_valid - n_test),
        slice(n_total - n_valid - n_test, n_total - n_test),
        slice(n_total - n_test, n_total),
    )
    ts = TripleSet.from_arrays(
        h[train_sl], t[train_sl], r[train_sl],
        n_entities=args.entities, n_relations=args.relations,
    )
    gen_s = time.perf_counter() - t_start
    print(f"# KG: {ts.num_triples} train / {n_valid} valid / {n_test} test "
          f"triples over {args.entities} entities ({gen_s:.1f}s host prep)",
          flush=True)

    dataset = Dataset(
        entity2id={f"e{i}": i for i in range(args.entities)},
        relation2id={f"r{i}": i for i in range(args.relations)},
        train=ts,
        valid=(h[valid_sl], t[valid_sl], r[valid_sl]),
        test=(h[test_sl], t[test_sl], r[test_sl]),
    )
    data = step_lib.DeviceData.from_triple_set(ts)

    import jax.numpy as jnp

    records = []
    for model_name in args.models.split(","):
        model = get_model(model_name)
        # TransR keeps float32 tables (its chunk pipeline is not validated
        # at low precision); TransE exercises the bf16 HBM-capacity knob.
        dtype = args.dtype if model_name == "transe" else "float32"
        cfg = EmbeddingConfig(
            embedding_size=args.size, learning_rate=0.001, margin=1.0,
            method=Method.BERN, num_batches=100, distance=Distance.L1, seed=42,
            param_dtype=dtype,
        )
        key = jax.random.PRNGKey(cfg.resolved_seed())
        params = model.init_params(key, ts.n_entities, ts.n_relations, cfg)

        batch_size = step_lib.batch_size_for(ts.num_triples, cfg.num_batches)
        run_epoch = step_lib.make_epoch_runner(model, cfg, batch_size, cfg.num_batches)

        key, sk = jax.random.split(key)
        t0 = time.perf_counter()
        params, loss = run_epoch(params, sk, data)
        float(loss)  # value-fetch sync (CLAUDE.md: block_until_ready lies here)
        train_compile_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        for _ in range(args.epochs):
            key, sk = jax.random.split(key)
            params, loss = run_epoch(params, sk, data)
        float(loss)
        dt = time.perf_counter() - t0
        tps = batch_size * cfg.num_batches * args.epochs / dt
        print(f"# {model_name} train: {tps/1e6:.2f}M triples/s "
              f"({dt/args.epochs*1000:.0f} ms/epoch, compile "
              f"{train_compile_s:.0f}s, dtype {dtype})", flush=True)

        t0 = time.perf_counter()
        metrics = harness.evaluate(model, params, dataset, cfg, verbose=False)
        eval_s = time.perf_counter() - t0
        # Warm eval: perturbed params so the tunnel cannot serve a memoized
        # result; second call reuses the compiled scan executable.
        params = {k: (v + jnp.asarray(1e-6, v.dtype)
                      if jnp.issubdtype(v.dtype, jnp.floating) else v)
                  for k, v in params.items()}
        t0 = time.perf_counter()
        harness.evaluate(model, params, dataset, cfg, verbose=False)
        eval_warm_s = time.perf_counter() - t0

        rec = {
            "metric": f"{model_name}_fb40k_train_throughput",
            "value": round(tps, 1),
            "unit": "triples/s/chip",
            "vs_baseline": None,
            "entities": args.entities,
            "train_triples": int(ts.num_triples),
            "dtype": dtype,
            "epoch_ms": round(dt / args.epochs * 1000.0, 1),
            "train_compile_s": round(train_compile_s, 1),
            "eval_wall_s": round(eval_s, 1),
            "eval_warm_s": round(eval_warm_s, 1),
            "eval_queries": int(metrics["num_corruptions"]),
            "filtered_mean_rank": round(float(metrics["filtered_mean_rank"]), 2),
            "filtered_hits10": round(float(metrics["filtered_hits10"]), 4),
            "host_prep_s": round(gen_s, 1),
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(records if len(records) > 1 else records[0], f, indent=1)


if __name__ == "__main__":
    main()
