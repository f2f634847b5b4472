"""K-negatives quality grid for TransH and TransR (VERDICT r04 item 6).

QUALITY.md's multi-negative study — the repo's best quality knob (+0.20
filtered Hits@10 for TransE at K=8, lr/K) — was TransE-only.  This grid
runs the same protocol (planted KG, 600 entities / 24 relations, k=32,
bern, 40 epochs) for TransH and the chunk-sequential TransR path, where
``rows = B·K`` interacts with the 256-sample chunk pipeline
(train/step.py; correctness covered by
tests/test_train_smoke.py::test_multi_negative_chunk_sequential_models).

Cells per model: K=1 (lr), K=4 (lr/4), K=8 (lr/8).  TransR warm-starts
from a K=1 TransE seed in every cell (the reference's seed chain,
transr/trainer.cpp:88-113) so cells differ only in K.  CPU-runnable;
writes KNEG_GRID_r05.json.
"""

from __future__ import annotations

import argparse
import json
import os as _os
import sys as _sys
import time

import numpy as np

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="KNEG_GRID_r05.json")
    ap.add_argument("--entities", type=int, default=600)
    ap.add_argument("--relations", type=int, default=24)
    ap.add_argument("--triples", type=int, default=20000)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--rate", type=float, default=0.02)
    ap.add_argument("--models", default="transh,transr")
    ap.add_argument("--negatives", default="1,4,8")
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    import tempfile

    from kb2e_tpu.config import EmbeddingConfig
    from kb2e_tpu.constants import Distance, Method
    from kb2e_tpu.data import synthetic, triples as data_lib
    from kb2e_tpu.eval import harness
    from kb2e_tpu.models import get_model
    from kb2e_tpu.models import transr as transr_lib
    from kb2e_tpu.train import loop as train_loop

    workdir = tempfile.mkdtemp(prefix="kb2e_kneg_")
    triples = synthetic.planted_kg(args.entities, args.relations, args.triples, seed=11)
    synthetic.write_kg_dir(workdir, triples, args.entities, args.relations, seed=11)
    ds = data_lib.load_dataset(workdir, splits=("train", "valid", "test"))

    base = EmbeddingConfig(
        embedding_size=args.size, learning_rate=args.rate, margin=1.0,
        method=Method.BERN, num_batches=16, max_epochs=args.epochs,
        distance=Distance.L1, seed=5,
        eval_block_size=max(128, args.entities), eval_batch_size=256,
        eval_impl="xla",
    )

    # One K=1 TransE seed for the TransR warm-start chain.
    seed_params = train_loop.train(get_model("transe"), base, ds.train, verbose=False)

    results = []
    for name in args.models.split(","):
        model = get_model(name)
        for k in (int(x) for x in args.negatives.split(",")):
            cfg = base.replace(
                learning_rate=args.rate / k, num_negatives=k,
            )
            init = None
            if name == "transr":
                cfg = cfg.replace(learning_rate=cfg.learning_rate / 2)
                init = model.init_params(
                    jax.random.PRNGKey(1), ds.n_entities, ds.n_relations, cfg
                )
                init = transr_lib.warm_start_params(
                    init, np.asarray(seed_params["entity"]),
                    np.asarray(seed_params["relation"]),
                )
            t0 = time.time()
            params = train_loop.train(
                model, cfg, ds.train, init_params=init, verbose=False
            )
            train_s = time.time() - t0
            m = harness.evaluate(model, params, ds, cfg)
            rec = {
                "model": name,
                "negatives": k,
                "learning_rate": cfg.learning_rate,
                "filtered_mean_rank": round(m["filtered_mean_rank"], 2),
                "filtered_hits10": round(m["filtered_hits10"], 4),
                "train_s": round(train_s, 1),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)

    artifact = {
        "date": time.strftime("%Y-%m-%d"),
        "harness": "benchmarks/multi_negative_grid.py",
        "protocol": (
            f"planted KG {args.entities} entities / {args.relations} relations "
            f"/ ~{args.triples} triples, k={args.size}, bern, {args.epochs} "
            f"epochs, lr={args.rate}/K (TransR: additionally /2 + TransE "
            "warm start, mirroring examples/quality_run.py)"
        ),
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
