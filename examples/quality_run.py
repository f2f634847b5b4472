"""Quality experiment: all four models on a planted KG.

The environment has no network egress so WN18/FB15k are unavailable; the
planted KG (kb2e_tpu/data/synthetic.py) is realisable by translation models,
making relative quality and the warm-start chain's benefit observable:
random-guess filtered Hits@10 is 10/N, trained models should far exceed it.

Usage:
  python examples/quality_run.py [--entities 1000] [--triples 30000]
                                 [--epochs 60] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

# Runnable as a script from anywhere: repo root = parent of examples/.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=1000)
    ap.add_argument("--relations", type=int, default=24)
    ap.add_argument("--triples", type=int, default=30000)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--batches", type=int, default=16)
    ap.add_argument("--rate", type=float, default=0.02)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--kg", choices=("planted", "skewed", "random"), default="planted",
                    help="skewed = FB15k-statistics-matched (power-law degrees, "
                         "1-N/N-1/N-N cardinality mix) — the regime bern sampling "
                         "exists for")
    ap.add_argument("--compare-sampling", action="store_true",
                    help="train TransE/TransH under BOTH unif and bern on the same "
                         "KG instead of the model sweep")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import numpy as np

    from kb2e_tpu.config import EmbeddingConfig
    from kb2e_tpu.constants import Distance, Method
    from kb2e_tpu.data import synthetic, triples as data_lib
    from kb2e_tpu.eval import harness
    from kb2e_tpu.models import get_model
    from kb2e_tpu.models import ctransr as ctransr_lib
    from kb2e_tpu.models import transr as transr_lib
    from kb2e_tpu.train import loop as train_loop

    workdir = tempfile.mkdtemp(prefix="kb2e_quality_")
    gen = {"planted": synthetic.planted_kg, "skewed": synthetic.skewed_kg,
           "random": synthetic.random_kg}[args.kg]
    triples = gen(args.entities, args.relations, args.triples, seed=11)
    synthetic.write_kg_dir(workdir, triples, args.entities, args.relations, seed=11)
    ds = data_lib.load_dataset(workdir, splits=("train", "valid", "test"))
    chance = 10.0 / args.entities
    print(f"KG: {ds.train.num_triples} train triples, {args.entities} entities; "
          f"chance filtered Hits@10 = {chance:.3f}")

    cfg = EmbeddingConfig(
        embedding_size=args.size, learning_rate=args.rate, margin=1.0,
        method=Method.BERN, num_batches=args.batches, max_epochs=args.epochs,
        distance=Distance.L1, seed=5,
        eval_block_size=min(4096, max(128, args.entities)), eval_batch_size=256,
        eval_impl="xla",
    )

    results = {}
    if args.compare_sampling:
        for name in ("transe", "transh"):
            model = get_model(name)
            for method in (Method.UNIF, Method.BERN):
                t0 = time.time()
                m_cfg = cfg.replace(method=method)
                params = train_loop.train(model, m_cfg, ds.train, verbose=False)
                metrics = harness.evaluate(model, params, ds, m_cfg)
                metrics["train_wall_s"] = round(time.time() - t0, 1)
                label = f"{name}-{method.name.lower()}"
                results[label] = metrics
                print(f"{label:14s} filtered MR {metrics['filtered_mean_rank']:7.1f}  "
                      f"filtered Hits@10 {metrics['filtered_hits10']:.3f}  "
                      f"({metrics['train_wall_s']}s)", flush=True)
        print(json.dumps(results, indent=1))
        return

    seed_params = None
    for name in ("transe", "transh", "transr", "ctransr", "ptranse"):
        model = get_model(name)
        t0 = time.time()
        init = None
        path_store = None
        model_cfg = cfg
        if name in ("transr", "ctransr"):
            model_cfg = cfg.replace(learning_rate=cfg.learning_rate / 2)
            init = model.init_params(
                jax.random.PRNGKey(1), ds.n_entities, ds.n_relations, model_cfg
            )
            if seed_params is not None:
                init = transr_lib.warm_start_params(
                    init, np.asarray(seed_params["entity"]), np.asarray(seed_params["relation"])
                )
            if name == "ctransr":
                centers = ctransr_lib.build_centers(
                    np.asarray(init["entity"]), ds.train.heads, ds.train.tails,
                    ds.train.rels, ds.n_relations, model.n_clusters, seed=5,
                )
                init = model.with_centers(init, centers)
        if name == "ptranse":
            from kb2e_tpu.data import paths as paths_lib
            from kb2e_tpu.models import ptranse as ptranse_lib

            init = model.init_params(
                jax.random.PRNGKey(1), ds.n_entities, ds.n_relations, model_cfg
            )
            if seed_params is not None:  # paper: PTransE initialises from TransE
                init = ptranse_lib.warm_start_params(
                    init, np.asarray(seed_params["entity"]), np.asarray(seed_params["relation"])
                )
            ts = ds.train
            path_store = paths_lib.build_path_store(
                ts.heads, ts.tails, ts.rels, ts.n_relations,
                max_len=model_cfg.path_length, max_paths=model_cfg.max_paths,
                n_entities=ds.n_entities,
            )
            print(f"ptranse  PCRA coverage {path_store.coverage() * 100:.1f}%")
        params = train_loop.train(
            model, model_cfg, ds.train, init_params=init, verbose=False,
            path_store=path_store,
        )
        if name == "transe":
            seed_params = params
        metrics = harness.evaluate(model, params, ds, model_cfg)
        metrics["train_wall_s"] = round(time.time() - t0, 1)
        results[name] = metrics
        print(f"{name:8s} filtered MR {metrics['filtered_mean_rank']:7.1f}  "
              f"filtered Hits@10 {metrics['filtered_hits10']:.3f}  "
              f"({metrics['train_wall_s']}s)", flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
