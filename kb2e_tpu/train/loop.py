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
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 0,
    resume: bool = False,
    eval_every: int = 0,
    eval_fn: Optional[Callable[[Params], dict]] = None,
    path_store=None,
) -> Params:
    """Train embeddings; returns the final params pytree (on device).

    ``checkpoint_dir``/``checkpoint_every`` enable periodic Orbax checkpoints
    (survey §5.4's mid-training resume — the reference only writes once at
    the end); ``resume=True`` restarts from the latest checkpoint found.
    """
    if cfg.update_mode == "parity" and not model.has_parity_mode:
        import warnings

        warnings.warn(
            f"--update-mode parity has no effect for {model.name}: no "
            "reference binary exists to be sequentially faithful to, so the "
            "vectorised update is the defining semantics.",
            stacklevel=2,
        )
    if (
        cfg.update_mode == "parity"
        and model.has_parity_mode
        and getattr(cfg, "parity_impl", "auto") == "pallas"
        and jax.default_backend() != "tpu"
    ):
        import warnings

        batch_size_est = step_lib.batch_size_for(triples.num_triples, cfg.num_batches)
        warnings.warn(
            f"--parity-impl pallas on the {jax.default_backend()} backend runs "
            "the kernel in INTERPRET mode (Python-level emulation): expect "
            f"minutes per batch at B={batch_size_est}. Use --parity-impl scan "
            "on CPU, or run on TPU for the compiled kernel.",
            stacklevel=2,
        )
    seed = cfg.resolved_seed()
    key = jax.random.PRNGKey(seed)

    if init_params is None:
        key, init_key = jax.random.split(key)
        params = model.init_params(init_key, triples.n_entities, triples.n_relations, cfg)
    else:
        params = init_params

    start_epoch = 0
    if resume and checkpoint_dir:
        from kb2e_tpu.io import checkpoint as ckpt_lib

        latest = ckpt_lib.latest_in(checkpoint_dir)
        if latest is not None:
            params, start_epoch = ckpt_lib.restore(latest)
            params = {k: jax.numpy.asarray(v) for k, v in params.items()}
            if verbose:
                print(f"Resumed from {latest} at epoch {start_epoch}")
            # Replay the key stream to the resume point for determinism
            # (fast mode consumes one split per epoch, parity one per batch).
            splits_per_epoch = 1 if cfg.update_mode == "fast" else cfg.num_batches
            for _ in range(start_epoch * splits_per_epoch):
                key, _ = jax.random.split(key)

    data = step_lib.DeviceData.from_triple_set(triples, path_store=path_store)
    batch_size = step_lib.batch_size_for(triples.num_triples, cfg.num_batches)

    mesh = None
    if cfg.data_axis or cfg.model_axis:
        from kb2e_tpu.parallel import dist_step, mesh as mesh_lib, sharding as shard_lib

        mesh = mesh_lib.make_mesh(cfg.data_axis, cfg.model_axis)
        # Round the batch down to a multiple of the data axis.
        batch_size -= batch_size % mesh.shape["data"]
        params = shard_lib.place_params(mesh, params)
        data = dist_step.replicate_data(mesh, data)

    fused_epoch = cfg.update_mode == "fast"
    if fused_epoch:
        # Whole epoch in one launch (amortises dispatch overhead); one key
        # split per epoch, split again inside for the batches.
        run_epoch = step_lib.make_epoch_runner(
            model, cfg, batch_size, cfg.num_batches, mesh=mesh
        )
    else:
        if mesh is not None:
            raise NotImplementedError("parity mode runs single-device only")
        run_step = step_lib.make_train_step(model, cfg, batch_size)

    logger = log_lib.MetricsLogger(metrics_fn)
    total_samples = batch_size * cfg.num_batches

    # Backend-drift canary (VERDICT r04 item 7, chunk-sequential models
    # only): the axon backend's runtime kernel-fault SET drifts across
    # backend updates (r03's safe segment length crashed one day later —
    # PERF.md "Axon segment fault"), so at-scale runs should degrade, not
    # die.  Each epoch's start params are retained; if the epoch launch (or
    # its loss fetch — the sync point) raises, the runner is rebuilt ONCE at
    # segment length /8 and the SAME epoch retried from the retained params
    # before the failure surfaces.  On the real backend a worker crash
    # usually kills the process's TPU client too, in which case the retry
    # re-raises — the canary then still turned a silent mid-run death into a
    # loud, attributed failure.  Kill-switch: KB2E_EPOCH_RETRY=0.
    import os

    retry_enabled = (
        fused_epoch
        and getattr(model, "chunk_size", None) is not None
        and os.environ.get("KB2E_EPOCH_RETRY", "1") != "0"
    )
    retried = False

    for epoch in range(start_epoch, cfg.max_epochs):
        t0 = time.perf_counter()
        if fused_epoch:
            key, sk = jax.random.split(key)
            if retry_enabled and not retried:
                backup = jax.tree_util.tree_map(jnp.copy, params)
            try:
                params, loss = run_epoch(params, sk, data)
                loss_val = float(loss)  # syncs the epoch
            except Exception as e:
                if not retry_enabled or retried:
                    raise
                retried = True
                seg = step_lib.segment_chunks()
                smaller = max(1, seg // 8)
                print(
                    f"[kb2e] EPOCH {epoch} FAILED ({type(e).__name__}: {e}) — "
                    f"suspected backend kernel-fault drift; retrying once "
                    f"with KB2E_SEGMENT_CHUNKS {seg} -> {smaller}. "
                    f"Re-probe with benchmarks/segment_probe.py.",
                    flush=True,
                )
                run_epoch = step_lib.make_epoch_runner(
                    model, cfg, batch_size, cfg.num_batches, mesh=mesh,
                    segment_chunks_override=smaller,
                )
                params, loss = run_epoch(backup, sk, data)
                loss_val = float(loss)
        else:
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
        if checkpoint_dir and checkpoint_every and (epoch + 1) % checkpoint_every == 0:
            from kb2e_tpu.io import checkpoint as ckpt_lib
            import os

            ckpt_lib.save(
                os.path.join(checkpoint_dir, f"ckpt_{epoch + 1}"), params, step=epoch + 1
            )
        if eval_fn is not None and eval_every and (epoch + 1) % eval_every == 0:
            val = eval_fn(params)
            if verbose:
                print(
                    f"[valid @ epoch {epoch}] filtered MR "
                    f"{val.get('filtered_mean_rank', float('nan')):.1f}, "
                    f"filtered Hits@10 {val.get('filtered_hits10', float('nan')):.3f}"
                )
            logger.log({"epoch": epoch, **{f"valid_{k}": v for k, v in val.items()}})

    return params
