"""Quality at FB15k SCALE on a planted KG (closing the toy-scale gap).

QUALITY.md's protocols run at 600-2,000 entities; throughput artifacts run
at FB15k scale but on structure-free random KGs (quality ≈ chance by
construction).  This harness joins the two: a PLANTED KG at full FB15k
shape (14,951 entities / 1,345 relations / ~480k triples — learnable by
translation models), trained with the production recipe on the real chip,
evaluated with the full filtered harness.  Chance filtered Hits@10 =
10/14,951 ≈ 0.0007.

Cells: TransE K=1 (reference policy) and K=8 lr/K (the recommended
production knob) at k=100, bern.  Writes QUALITY_SCALE_r05.json.

Usage: python benchmarks/quality_fb15k_scale.py [--epochs 40]
"""

from __future__ import annotations

import argparse
import json
import os as _os
import sys as _sys
import time

import numpy as np

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

N_ENTITIES = 14_951
N_RELATIONS = 1_345
N_TRIPLES = 483_142


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="QUALITY_SCALE_r05.json")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--size", type=int, default=100)
    ap.add_argument("--test-frac", type=float, default=0.05)
    args = ap.parse_args()

    from kb2e_tpu.utils import runtime

    runtime.enable_compilation_cache()

    import jax

    from kb2e_tpu.config import EmbeddingConfig
    from kb2e_tpu.constants import Distance, Method
    from kb2e_tpu.data.synthetic import planted_kg
    from kb2e_tpu.data.triples import Dataset, TripleSet
    from kb2e_tpu.eval import harness
    from kb2e_tpu.models import get_model
    from kb2e_tpu.train import loop as train_loop

    t0 = time.time()
    h, t, r = planted_kg(N_ENTITIES, N_RELATIONS, N_TRIPLES, seed=11)
    gen_s = time.time() - t0
    n = h.shape[0]
    n_test = int(n * args.test_frac)
    n_valid = n_test
    ts = TripleSet.from_arrays(
        h[: n - n_valid - n_test], t[: n - n_valid - n_test], r[: n - n_valid - n_test],
        n_entities=N_ENTITIES, n_relations=N_RELATIONS,
    )
    ds = Dataset(
        entity2id={str(i): i for i in range(N_ENTITIES)},
        relation2id={str(i): i for i in range(N_RELATIONS)},
        train=ts,
        valid=(h[n - n_valid - n_test : n - n_test], t[n - n_valid - n_test : n - n_test],
               r[n - n_valid - n_test : n - n_test]),
        test=(h[n - n_test :], t[n - n_test :], r[n - n_test :]),
    )
    print(f"# planted FB15k-scale KG: {ts.num_triples} train / {n_test} test "
          f"({gen_s:.0f}s host generation)", flush=True)

    results = []
    seed_params = None

    def run_cell(model_name, k_neg, lr, init=None):
        nonlocal seed_params
        model = get_model(model_name)
        cfg = EmbeddingConfig(
            embedding_size=args.size, learning_rate=lr, margin=1.0,
            method=Method.BERN, num_batches=100, max_epochs=args.epochs,
            distance=Distance.L1, seed=5, num_negatives=k_neg,
            eval_block_size=1024, eval_batch_size=256,
        )
        t0 = time.time()
        params = train_loop.train(model, cfg, ts, init_params=init, verbose=False)
        train_s = time.time() - t0
        if model_name == "transe" and k_neg == 1:
            seed_params = params  # the reference's TransR seed chain
        t0 = time.time()
        m = harness.evaluate(model, params, ds, cfg)
        eval_s = time.time() - t0
        rec = {
            "model": model_name,
            "negatives": k_neg,
            "learning_rate": lr,
            "epochs": args.epochs,
            "warm_start": init is not None,
            "filtered_mean_rank": round(m["filtered_mean_rank"], 2),
            "filtered_hits10": round(m["filtered_hits10"], 4),
            "filtered_mrr": round(m["filtered_mrr"], 4),
            "raw_mean_rank": round(m["raw_mean_rank"], 2),
            "queries": int(m["num_corruptions"]),
            "train_s": round(train_s, 1),
            "eval_s": round(eval_s, 1),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    run_cell("transe", 1, 0.02)
    run_cell("transe", 8, 0.02 / 8)
    run_cell("transh", 8, 0.02 / 8)
    # TransR: the reference's seed chain (transr/trainer.cpp:88-113) from the
    # K=1 TransE run; lr additionally /2 (examples/quality_run.py policy).
    from kb2e_tpu.models import transr as transr_lib

    tr = get_model("transr")
    tr_cfg = EmbeddingConfig(embedding_size=args.size, seed=5)
    init = tr.init_params(jax.random.PRNGKey(1), N_ENTITIES, N_RELATIONS, tr_cfg)
    init = transr_lib.warm_start_params(
        init, np.asarray(seed_params["entity"]), np.asarray(seed_params["relation"])
    )
    run_cell("transr", 8, 0.02 / 8 / 2, init=init)

    # CTransR: same warm start + k-means offset centers over the train graph.
    from kb2e_tpu.models import ctransr as ctransr_lib

    cm = get_model("ctransr")
    cinit = cm.init_params(jax.random.PRNGKey(1), N_ENTITIES, N_RELATIONS, tr_cfg)
    cinit = transr_lib.warm_start_params(
        cinit, np.asarray(seed_params["entity"]), np.asarray(seed_params["relation"])
    )
    t0 = time.time()
    centers = ctransr_lib.build_centers(
        np.asarray(cinit["entity"]), ts.heads, ts.tails, ts.rels,
        N_RELATIONS, cm.n_clusters, seed=5,
    )
    print(f"# ctransr centers: {time.time() - t0:.0f}s", flush=True)
    cinit = cm.with_centers(cinit, centers)
    run_cell("ctransr", 8, 0.02 / 8 / 2, init=cinit)

    artifact = {
        "date": time.strftime("%Y-%m-%d"),
        "harness": "benchmarks/quality_fb15k_scale.py",
        "protocol": (
            f"PLANTED KG at full FB15k shape ({N_ENTITIES} entities / "
            f"{N_RELATIONS} relations / {ts.num_triples} train triples, "
            f"latent dim 16, neighbourhood 8), k={args.size}, bern, "
            f"{args.epochs} epochs on one TPU v5e chip, full filtered "
            f"link-prediction eval on a {args.test_frac:.0%} split; chance "
            f"filtered Hits@10 = {10 / N_ENTITIES:.5f}"
        ),
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
