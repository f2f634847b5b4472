"""Unified evaluation entry point.

Analogue of ``evalTransE`` / ``evalTransH`` / ``evalTransR``
(``transe/bin/evalTransE.cpp:9-18``): load trained embeddings from
``--outdir``, rank every test triple's head and tail against all entities,
print raw + filtered MeanRank and Hits@10 in the reference's exact format
(``common/evaluation.cpp:247-250``).
"""

from __future__ import annotations

import os
import sys

import jax.numpy as jnp

from kb2e_tpu import constants as C
from kb2e_tpu.cli import common
from kb2e_tpu.config import EmbeddingConfig
from kb2e_tpu.data import triples as data_lib
from kb2e_tpu.eval import harness
from kb2e_tpu.io import text as text_io
from kb2e_tpu.models import base as model_base


def run_eval(
    model_name: str, cfg: EmbeddingConfig, verbose: bool = True, task: str = "entity"
) -> dict:
    model = model_base.get_model(model_name)
    print(cfg.describe())

    tag = C.Method.from_any(cfg.method).tag
    for basename in (C.RELATION_EMBEDDING_BASENAME, C.ENTITY_EMBEDDING_BASENAME):
        path = os.path.join(cfg.output_dir, f"{basename}.{tag}")
        if not os.path.exists(path):
            # Message parity with common/evaluation.cpp:253-262.
            print(
                f"Could not find {'relation' if 'relation' in basename else 'entity'} "
                f"embedding file: {path}. Make sure to specify the path and/or train.",
            )
            sys.exit(2)

    dataset = data_lib.load_dataset(cfg.data_dir, splits=("train", "valid", "test"))
    n_ent, n_rel, k = dataset.n_entities, dataset.n_relations, cfg.embedding_size

    weights_shape = None
    if model_name == "transh":
        weights_shape = (n_rel, k)
    elif model_name in ("transr", "ctransr"):
        weights_shape = (n_rel, k, k)
    host = text_io.read_embeddings(
        cfg.output_dir, C.Method.from_any(cfg.method), n_ent, n_rel, k,
        weights_shape=weights_shape,
    )
    bad = text_io.entity_norm_warnings(host["entity"])
    if bad:
        # Analogue of the "wrong_entity" warning (common/evaluation.cpp:99-102).
        print(f"Warning: {bad} entity rows exceed unit norm by >1e-3", file=sys.stderr)

    params = {
        "entity": jnp.asarray(host["entity"], jnp.float32),
        "relation": jnp.asarray(host["relation"], jnp.float32),
    }
    if model_name == "transh":
        params["norm"] = jnp.asarray(host["weights"], jnp.float32)
    elif model_name in ("transr", "ctransr"):
        params["proj"] = jnp.asarray(host["weights"], jnp.float32)
    if model_name == "ctransr":
        params["relation_c"] = jnp.asarray(host["relation_clusters"], jnp.float32)
        params["centers"] = jnp.asarray(host["cluster_centers"], jnp.float32)

    if model_name == "ptranse":
        for name in ("relation_inv", "comp_w"):
            if name in host:
                params[name] = jnp.asarray(host[name], jnp.float32)

    if task == "relation":
        # Relation prediction (PTransE paper's second task; the reference has
        # no counterpart).  PTransE adds PCRA path evidence for test pairs
        # extracted over the TRAIN graph.
        path_store = None
        if model_name == "ptranse":
            from kb2e_tpu.data import paths as paths_lib

            tr_ = dataset.train
            path_store = paths_lib.build_path_store(
                tr_.heads, tr_.tails, tr_.rels, tr_.n_relations,
                max_len=cfg.path_length, min_conf=cfg.path_min_conf,
                max_paths=cfg.max_paths, max_branch=cfg.path_max_branch,
                n_entities=dataset.n_entities,
                query_pairs=(dataset.test[0], dataset.test[1]),
            )
        metrics = harness.evaluate_relation_prediction(
            model, params, dataset, cfg, path_store=path_store, verbose=verbose
        )
        print(
            f"Relation Raw      -- Rank: {metrics['raw_mean_rank']:f}, "
            f"Hits@1: {metrics['raw_hits1']:f}"
        )
        print(
            f"Relation Filtered -- Rank: {metrics['filtered_mean_rank']:f}, "
            f"Hits@1: {metrics['filtered_hits1']:f}"
        )
        return metrics

    metrics = harness.evaluate(model, params, dataset, cfg, verbose=verbose)
    harness.print_reference_style(metrics)
    harness.print_extended(metrics)
    return metrics


def main(argv=None, model_name=None):
    from kb2e_tpu.utils import runtime

    runtime.enable_compilation_cache()
    parser = common.build_parser("kb2e-eval", "Evaluate Trans* embeddings (link prediction)")
    if model_name is None:
        parser.add_argument("--model", default="transe",
                            choices=("transe", "transh", "transr", "ctransr", "ptranse"))
    parser.add_argument("--task", default="entity", choices=("entity", "relation"),
                        help="link-prediction task: rank entities (reference) "
                             "or relations (PTransE paper task 2)")
    args = parser.parse_args(argv)
    cfg = common.config_from_args(args)
    run_eval(model_name or args.model, cfg, task=args.task)


if __name__ == "__main__":
    main()
