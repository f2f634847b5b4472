"""PTransE mechanism study on the planted-composition KG (VERDICT r04 item 4).

The planted/skewed KGs give PTransE's path machinery nothing to find — their
relations are independent random offsets, so QUALITY.md r04 could only show
a +0.008 relation-prediction nudge.  This harness runs the grid the paper's
claim deserves: on ``data.synthetic.compositional_kg`` (r_c ≡ r_a ∘ r_b
planted WITH 2-hop entity support, composed facts mostly held out so their
direct embeddings are under-trained — generator stats CI-pinned in
tests/test_data.py),

    baseline (no path machinery)
    per composition ∈ {add, mul, rnn}:
        evidence-only  (path_weight 0 at training, PCRA evidence at eval)
        full recipe    (path loss at training + evidence at eval)

decoupling the paper's two mechanisms: the EVAL evidence term
Σ conf·‖comp(p) − r'‖₁ and the TRAINING path margin loss.  Reports
filtered MR / Hits@10 for BOTH tasks — entity link prediction on the
held-out composed triples and relation prediction (the task the evidence
term was built for, eval/harness.py::evaluate_relation_prediction) — plus
the mechanism diagnostic ‖r_a + r_b − r_c‖₁ vs random relations.

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

    def comp_alignment(params):
        """Mean ‖r_a + r_b − r_c‖₁ over the planted pairs vs random relations
        — the mechanism diagnostic (ADD geometry)."""
        rel = np.asarray(params["relation"])
        B = kg.n_base_relations
        rng = np.random.default_rng(0)
        gold = [
            float(np.abs(rel[a] + rel[b] - rel[B + ci]).sum())
            for ci, (a, b) in enumerate(kg.comp_pairs)
        ]
        rand = [
            float(np.abs(rel[a] + rel[b] - rel[o]).sum())
            for ci, (a, b) in enumerate(kg.comp_pairs)
            for o in rng.integers(0, kg.n_relations, 5)
            if o != B + ci
        ]
        return round(float(np.mean(gold)), 3), round(float(np.mean(rand)), 3)

    results = []

    def run_cell(comp, path_weight, eval_evidence, params_cache={}):
        # Training depends only on (path_weight, comp-if-weighted): pw=0
        # zeroes the path loss AND its gradients (the clean ablation on the
        # same data pipeline — batch_update always reads the path arrays),
        # so the pw=0 model is shared across compositions.
        # rnn needs its comp_w table in params even at pw=0 (it stays at
        # init — the honest "untrained composition" for the evidence-only
        # cell); add/mul share one pw=0 model.
        tkey = (path_weight, comp if (path_weight or comp == "rnn") else "-")
        if tkey not in params_cache:
            cfg = EmbeddingConfig(
                embedding_size=args.size, learning_rate=0.01, margin=1.0,
                method=Method.BERN, num_batches=20, max_epochs=args.epochs,
                distance=Distance.L1, seed=11,
                eval_block_size=256, eval_batch_size=256,
                path_composition=comp, path_weight=path_weight,
            )
            t0 = time.time()
            params = train_loop.train(
                model, cfg, ts, verbose=False, path_store=train_store
            )
            params_cache[tkey] = (cfg, params, round(time.time() - t0, 1))
        cfg, params, train_s = params_cache[tkey]
        cfg = dataclasses.replace(cfg, path_composition=comp)
        ent = harness.evaluate(model, params, ds, cfg)
        relp = harness.evaluate_relation_prediction(
            model, params, ds, cfg,
            path_store=eval_store if eval_evidence else None,
        )
        gold, rand = comp_alignment(params)
        rec = {
            "composition": comp,
            "train_path_weight": path_weight,
            "eval_path_evidence": eval_evidence,
            "entity_filtered_mr": round(ent["filtered_mean_rank"], 2),
            "entity_filtered_hits10": round(ent["filtered_hits10"], 4),
            "relation_filtered_mr": round(relp["filtered_mean_rank"], 2),
            "relation_filtered_hits10": round(relp["filtered_hits10"], 4),
            "relation_filtered_hits1": round(relp["filtered_hits1"], 4),
            "align_comp_to_gold_l1": gold,
            "align_comp_to_random_l1": rand,
            "train_s": train_s,
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    comps = args.compositions.split(",")
    # Baseline: no path machinery anywhere (composition irrelevant).
    run_cell(comps[0], 0.0, False)
    for comp in comps:
        # The paper's evidence mechanism on clean embeddings …
        run_cell(comp, 0.0, True)
        # … and the full recipe (path loss + evidence).
        run_cell(comp, 1.0, True)

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
