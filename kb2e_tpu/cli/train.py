"""Unified training entry point.

``python -m kb2e_tpu.cli.train --model transe --datadir ... --outdir ...``
is the analogue of the reference's ``trainTransE`` / ``trainTransH`` /
``trainTransR`` mains (``transe/bin/trainTransE.cpp:9-20``): parse args,
echo options, train, write reference-format embedding files.  The per-model
wrappers (:mod:`kb2e_tpu.cli.train_transe` etc.) preserve the six-binary feel.
"""

from __future__ import annotations

import os
import sys

import numpy as np

from kb2e_tpu import constants as C
from kb2e_tpu.cli import common
from kb2e_tpu.config import EmbeddingConfig
from kb2e_tpu.data import triples as data_lib
from kb2e_tpu.io import text as text_io
from kb2e_tpu.models import base as model_base
from kb2e_tpu.train import loop as train_loop
from kb2e_tpu.utils import logging as log_lib


def run_training(
    model_name: str,
    cfg: EmbeddingConfig,
    metrics_jsonl=None,
    tensorboard_dir=None,
    checkpoint_dir=None,
    checkpoint_every=0,
    resume=False,
    eval_every=0,
) -> None:
    model = model_base.get_model(model_name)
    print(cfg.describe())

    # Load the valid split too when periodic evaluation is requested.
    splits = ("train", "valid", "test") if eval_every else ("train",)
    dataset = data_lib.load_dataset(cfg.data_dir, splits=splits)
    ts = dataset.train
    # Dataset count echo (common/trainer.cpp:199-200).
    print(f"Number of Relations: {ts.n_relations}")
    print(f"Number of Entities: {ts.n_entities}")

    init_params = None
    if model_name in ("transr", "ctransr", "ptranse"):
        init_params = _maybe_warm_start(model, cfg, ts)

    path_store = None
    if model_name == "ptranse":
        from kb2e_tpu.data import paths as paths_lib

        import time as _time

        t0 = _time.perf_counter()
        path_store = paths_lib.build_path_store(
            ts.heads, ts.tails, ts.rels, ts.n_relations,
            max_len=cfg.path_length, min_conf=cfg.path_min_conf,
            max_paths=cfg.max_paths, max_branch=cfg.path_max_branch,
        )
        print(
            f"PCRA paths: {path_store.coverage() * 100:.1f}% of triples have "
            f"≥1 path (≤{cfg.path_length} hops, top {cfg.max_paths}; "
            f"{_time.perf_counter() - t0:.1f}s)"
        )

    logger = log_lib.jsonl_logger(metrics_jsonl) if metrics_jsonl else None
    tb_sink = log_lib.TensorBoardSink(tensorboard_dir) if tensorboard_dir else None
    metrics_fn = log_lib.fan_out(logger.log if logger else None, tb_sink)
    try:
        params = train_loop.train(
            model,
            cfg,
            ts,
            init_params=init_params,
            metrics_fn=metrics_fn,
            checkpoint_dir=checkpoint_dir,
            checkpoint_every=checkpoint_every,
            resume=resume,
            eval_every=eval_every,
            eval_fn=(_make_valid_eval(model, cfg, dataset) if eval_every else None),
            path_store=path_store,
        )
    finally:
        if tb_sink is not None:
            tb_sink.close()

    host = {k: np.asarray(v) for k, v in params.items()}
    weights = None
    extras = None
    if model_name == "transh":
        weights = host["norm"]
    elif model_name in ("transr", "ctransr"):
        weights = host["proj"]
    if model_name == "ctransr":
        extras = {"relation_clusters": host["relation_c"], "cluster_centers": host["centers"]}
    if model_name == "ptranse":
        extras = {"relation_inv": host["relation_inv"]}
        if "comp_w" in host:
            extras["comp_w"] = host["comp_w"]
    text_io.write_embeddings(
        cfg.output_dir,
        C.Method.from_any(cfg.method),
        host["entity"],
        host["relation"],
        weights=weights,
        model_name=model_name,
        extras=extras,
    )


def _make_valid_eval(model, cfg: EmbeddingConfig, dataset):
    """Periodic link-prediction evaluation on the VALID split (a production
    observability feature with no reference counterpart)."""
    from kb2e_tpu.eval import harness

    if dataset.valid is None or dataset.valid[0].size == 0:
        return None

    def eval_fn(params):
        return harness.evaluate(model, params, dataset, cfg, test_triples=dataset.valid)

    return eval_fn


def _maybe_warm_start(model, cfg: EmbeddingConfig, ts):
    """TransR's TransE warm start (transr/trainer.cpp:88-113); PTransE uses
    the same seed-file chain (the paper initialises PTransE from TransE).

    The reference hard-fails when seed files are missing; here a missing seed
    directory just falls back to random init with a warning (documented
    extension — lets the model train standalone).
    """
    from kb2e_tpu.models import transr as transr_lib
    import jax

    tag = C.Method.from_any(cfg.seed_method).tag
    ent_path = os.path.join(cfg.seed_data_dir, f"{C.ENTITY_EMBEDDING_BASENAME}.{tag}")
    rel_path = os.path.join(cfg.seed_data_dir, f"{C.RELATION_EMBEDDING_BASENAME}.{tag}")
    key = jax.random.PRNGKey(cfg.resolved_seed() ^ 0x5EED)
    params = model.init_params(key, ts.n_entities, ts.n_relations, cfg)
    if not (os.path.exists(ent_path) and os.path.exists(rel_path)):
        print(
            f"Warning: seed files not found under '{cfg.seed_data_dir}' — "
            f"starting {model.name} from random init instead of a TransE warm start.",
            file=sys.stderr,
        )
        return params
    ent = text_io.read_matrix(ent_path, ts.n_entities, cfg.embedding_size)
    rel = text_io.read_matrix(rel_path, ts.n_relations, cfg.embedding_size)
    if model.name == "ptranse":
        from kb2e_tpu.models import ptranse as ptranse_lib

        return ptranse_lib.warm_start_params(params, ent, rel)
    params = transr_lib.warm_start_params(params, ent, rel)
    if model.name == "ctransr":
        from kb2e_tpu.models import ctransr as ctransr_lib

        centers = ctransr_lib.build_centers(
            np.asarray(params["entity"]), ts.heads, ts.tails, ts.rels,
            ts.n_relations, model.n_clusters, seed=cfg.resolved_seed(),
        )
        params = model.with_centers(params, centers)
    return params


def main(argv=None, model_name=None):
    from kb2e_tpu.utils import runtime

    runtime.enable_compilation_cache()
    parser = common.build_parser(
        "kb2e-train", "Train Trans* knowledge-graph embeddings on TPU"
    )
    if model_name is None:
        parser.add_argument("--model", default="transe",
                            choices=("transe", "transh", "transr", "ctransr", "ptranse"))
    args = parser.parse_args(argv)
    cfg = common.config_from_args(args)
    from kb2e_tpu.utils import profiling

    with profiling.capture_trace(args.profile_dir):
        run_training(
            model_name or args.model,
            cfg,
            metrics_jsonl=args.metrics_jsonl,
            tensorboard_dir=args.tensorboard_dir,
            checkpoint_dir=args.checkpoint_dir,
            checkpoint_every=args.checkpoint_every,
            resume=args.resume,
            eval_every=args.eval_every,
        )


if __name__ == "__main__":
    main()
