"""Measure the reference C++ trainers on this host's CPU (per-model baselines).

Dumps the SAME synthetic FB15k-shaped KG bench_models.py trains on into
reference text layout, then times ``trainTransE`` / ``trainTransH`` /
``trainTransR`` (built at /tmp/refbuild, CLAUDE.md) as N-epoch wall time minus
0-epoch wall time (isolating the train loop from load/init/write).  TransR's
seed chain follows the reference recipe: a short TransE-unif run provides
--seeddatadir.

Writes {model: triples_per_s} JSON to --out (default
benchmarks/reference_baselines.json) for bench_models.py --baselines-json.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import subprocess
import time

N_ENTITIES = 14_951
N_RELATIONS = 1_345
N_TRAIN = 483_142
BIN = "/tmp/refbuild/bin"


def run_timed(binary: str, datadir: str, outdir: str, epochs: int, extra=()) -> float:
    os.makedirs(outdir, exist_ok=True)
    cmd = [
        f"{BIN}/{binary}", "--datadir", datadir, "--outdir", outdir,
        "--size", "100", "--rate", "0.001", "--margin", "1.0",
        "--method", "1", "--batches", "100", "--epochs", str(epochs),
        "--seed", "7", *extra,
    ]
    t0 = time.perf_counter()
    subprocess.run(cmd, check=True, capture_output=True)
    return time.perf_counter() - t0


def bench(binary: str, datadir: str, outdir: str, epochs: int, extra=()) -> float:
    base = run_timed(binary, datadir, outdir + "_0ep", 0, extra)
    full = run_timed(binary, datadir, outdir, epochs, extra)
    train_s = full - base
    return N_TRAIN * epochs / train_s


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--datadir", default="/tmp/bench_ref_kg")
    ap.add_argument("--out", default="benchmarks/reference_baselines.json")
    ap.add_argument("--models", default="transe,transh,transr")
    ap.add_argument("--epochs-transe", type=int, default=3)
    ap.add_argument("--epochs-transh", type=int, default=2)
    ap.add_argument("--epochs-transr", type=int, default=1)
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.datadir, "train.txt")):
        import jax

        jax.config.update("jax_platforms", "cpu")
        from kb2e_tpu.data.synthetic import random_kg, write_kg_dir

        # All triples go to train: the trainers only read train.txt and the
        # throughput denominator must equal what they actually process.
        h, t, r = random_kg(N_ENTITIES, N_RELATIONS, N_TRAIN, seed=1)
        write_kg_dir(args.datadir, (h, t, r), N_ENTITIES, N_RELATIONS,
                     split=(1.0, 0.0, 0.0))

    results = {}
    models = args.models.split(",")
    if "transe" in models:
        results["transe"] = round(
            bench("trainTransE", args.datadir, "/tmp/bench_ref_transe", args.epochs_transe), 1
        )
        print(json.dumps({"model": "transe", "triples_per_s": results["transe"]}), flush=True)
    if "transh" in models:
        results["transh"] = round(
            bench("trainTransH", args.datadir, "/tmp/bench_ref_transh", args.epochs_transh), 1
        )
        print(json.dumps({"model": "transh", "triples_per_s": results["transh"]}), flush=True)
    if "transr" in models:
        # Seed chain: reference TransR REQUIRES TransE-unif seed files.
        seed_dir = "/tmp/bench_ref_seed"
        if not os.path.exists(os.path.join(seed_dir, "entity2vec.unif")):
            os.makedirs(seed_dir, exist_ok=True)
            subprocess.run(
                [f"{BIN}/trainTransE", "--datadir", args.datadir, "--outdir", seed_dir,
                 "--size", "100", "--rate", "0.001", "--margin", "1.0",
                 "--method", "0", "--batches", "100", "--epochs", "1", "--seed", "7"],
                check=True, capture_output=True,
            )
        results["transr"] = round(
            bench("trainTransR", args.datadir, "/tmp/bench_ref_transr", args.epochs_transr,
                  extra=("--seeddatadir", seed_dir, "--seedmethod", "0")), 1
        )
        print(json.dumps({"model": "transr", "triples_per_s": results["transr"]}), flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
