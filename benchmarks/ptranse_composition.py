"""PTransE mechanism study on the planted-composition KG (VERDICT r04 item 4).

The planted/skewed KGs give PTransE's path machinery nothing to find — their
relations are independent random offsets, so QUALITY.md r04 could only show
a +0.008 relation-prediction nudge.  This harness runs the grid the paper's
claim deserves: on ``data.synthetic.compositional_kg`` (r_c ≡ r_a ∘ r_b
planted WITH 2-hop entity support, composed facts mostly held out so their
direct embeddings are under-trained — generator stats CI-pinned in
tests/test_data.py),

    composition ∈ {add, mul, rnn}  ×  path evidence ∈ {on, off}

where "off" = path_weight 0 at training AND no path store at eval — the
full ablation of the paper's mechanism.  Reports filtered MR / Hits@10 for
BOTH tasks: entity link prediction on the held-out composed triples and
relation prediction (the task PTransE's evidence term was built for,
eval/harness.py::evaluate_relation_prediction).

CPU-runnable (small KG); ~2 min per cell.  Writes PTRANSE_COMP_r05.json.
Reference anchor: README.md:26-29 (PTransE rows, code absent — survey §0.1).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os as _os
import sys as _sys
import time

import numpy as np

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PTRANSE_COMP_r05.json")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--compositions", default="add,mul,rnn")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (default on: the KG is small "
                         "and remote compiles dominate on the tunneled TPU)")
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    from kb2e_tpu.config import EmbeddingConfig
    from kb2e_tpu.constants import Distance, Method
    from kb2e_tpu.data import paths as paths_lib
    from kb2e_tpu.data.synthetic import compositional_kg
    from kb2e_tpu.data.triples import Dataset, TripleSet
    from kb2e_tpu.eval import harness
    from kb2e_tpu.models import get_model
    from kb2e_tpu.train import loop as train_loop

    kg = compositional_kg(seed=0)
    th, tt, tr = kg.train
    ts = TripleSet.from_arrays(
        th, tt, tr, n_entities=kg.n_entities, n_relations=kg.n_relations
    )
    ds = Dataset(
        entity2id={str(i): i for i in range(kg.n_entities)},
        relation2id={str(i): i for i in range(kg.n_relations)},
        train=ts, valid=kg.valid, test=kg.test,
    )
    model = get_model("ptranse")

    # Path stores: training (train pairs over the train graph) and eval
    # evidence (test pairs over the train graph).  max_paths=16: denser
    # graphs crowd the planted path out of the top-8 (tests/test_data.py).
    t0 = time.time()
    train_store = paths_lib.build_path_store(
        th, tt, tr, kg.n_relations, max_paths=16, use_native="auto",
        n_entities=kg.n_entities,
    )
    eval_store = paths_lib.build_path_store(
        th, tt, tr, kg.n_relations, max_paths=16, use_native="auto",
        n_entities=kg.n_entities, query_pairs=(kg.test[0], kg.test[1]),
    )
    extract_s = time.time() - t0

    results = []
    for comp in args.compositions.split(","):
        for with_paths in (True, False):
            cfg = EmbeddingConfig(
                embedding_size=args.size, learning_rate=0.01, margin=1.0,
                method=Method.BERN, num_batches=20, max_epochs=args.epochs,
                distance=Distance.L1, seed=11,
                eval_block_size=256, eval_batch_size=256,
                path_composition=comp,
                path_weight=1.0 if with_paths else 0.0,
            )
            t0 = time.time()
            # The path store is wired either way (batch_update always reads
            # the path arrays); path_weight=0 zeroes the path loss AND its
            # gradients, so "off" trains pure TransE semantics on the same
            # data pipeline — the clean ablation.
            params = train_loop.train(
                model, cfg, ts, verbose=False, path_store=train_store,
            )
            train_s = time.time() - t0
            ent = harness.evaluate(model, params, ds, cfg)
            relp = harness.evaluate_relation_prediction(
                model, params, ds, cfg,
                path_store=eval_store if with_paths else None,
            )
            rec = {
                "composition": comp,
                "path_evidence": with_paths,
                "entity_filtered_mr": round(ent["filtered_mean_rank"], 2),
                "entity_filtered_hits10": round(ent["filtered_hits10"], 4),
                "relation_filtered_mr": round(relp["filtered_mean_rank"], 2),
                "relation_filtered_hits10": round(relp["filtered_hits10"], 4),
                "relation_filtered_hits1": round(relp["filtered_hits1"], 4),
                "train_s": round(train_s, 1),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)

    artifact = {
        "date": time.strftime("%Y-%m-%d"),
        "harness": "benchmarks/ptranse_composition.py",
        "protocol": (
            f"compositional_kg(seed=0): {kg.n_entities} entities, "
            f"{kg.n_base_relations} base + {kg.n_composed} composed relations, "
            f"{th.shape[0]} train / {kg.test[0].shape[0]} test triples "
            f"(held-out composed facts with planted 2-hop witnesses); "
            f"k={args.size}, {args.epochs} epochs; path stores PCRA max_len=2 "
            f"max_paths=16 (extraction {extract_s:.0f}s); 'path_evidence: "
            "false' = path_weight 0 at training (zero path loss/grads on "
            "the same data pipeline) AND no eval path store"
        ),
        "train_path_coverage": round(train_store.coverage(), 3),
        "eval_path_coverage": round(eval_store.coverage(), 3),
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
