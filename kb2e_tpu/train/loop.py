"""Epoch driver.

Mirrors the observable behaviour of ``Trainer::train`` / ``bfgs``
(``common/trainer.cpp:60-107``): init params, run ``max_epochs`` epochs of
``num_batches`` batches of ``|T| // num_batches`` samples, print per-epoch
loss in the reference's format, write embeddings at the end.  Adds structured
JSONL metrics (loss, triples/s, wall time) — survey §5.5's plan.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from kb2e_tpu.config import EmbeddingConfig
from kb2e_tpu.data.triples import TripleSet
from kb2e_tpu.models.base import Model, Params
from kb2e_tpu.train import step as step_lib
from kb2e_tpu.utils import logging as log_lib


def train(
    model: Model,
    cfg: EmbeddingConfig,
    triples: TripleSet,
    *,
    init_params: Optional[Params] = None,
    metrics_fn: Optional[Callable[[dict], None]] = None,
    verbose: bool = True,
) -> Params:
    """Train embeddings; returns the final params pytree (on device)."""
    seed = cfg.resolved_seed()
    key = jax.random.PRNGKey(seed)

    if init_params is None:
        key, init_key = jax.random.split(key)
        params = model.init_params(init_key, triples.n_entities, triples.n_relations, cfg)
    else:
        params = init_params

    data = step_lib.DeviceData.from_triple_set(triples)
    batch_size = step_lib.batch_size_for(triples.num_triples, cfg.num_batches)
    run_step = step_lib.make_train_step(model, cfg, batch_size)

    logger = log_lib.MetricsLogger(metrics_fn)
    total_samples = batch_size * cfg.num_batches

    for epoch in range(cfg.max_epochs):
        t0 = time.perf_counter()
        loss = jnp.float32(0.0)
        for batch_idx in range(cfg.num_batches):
            key, sk = jax.random.split(key)
            params, batch_loss = run_step(params, sk, data)
            loss = loss + batch_loss
        loss_val = float(loss)  # syncs the epoch
        dt = time.perf_counter() - t0
        if verbose:
            # Reference epoch line (common/trainer.cpp:105).
            print(f"Epoch: {epoch}, Loss: {loss_val:f}")
        logger.log(
            {
                "epoch": epoch,
                "loss": loss_val,
                "wall_s": dt,
                "triples_per_s": total_samples / dt if dt > 0 else 0.0,
                "batch_size": batch_size,
            }
        )

    return params
