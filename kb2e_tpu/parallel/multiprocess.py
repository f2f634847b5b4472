"""Multi-process (multi-host) training driver.

The reference trains in one process on one machine (``common/trainer.cpp:69-
107``); this module scales that loop across ``jax.distributed`` processes —
the survey §2.1 "edge partitioning / communication backend" axes and the
§5.3 "kill a host and resume" recovery story, none of which exist upstream.

Execution model (single-controller-per-process, GSPMD over the global mesh):

1. every process joins the rendezvous (:func:`kb2e_tpu.parallel.multihost.
   initialize`),
2. each process reads only its contiguous shard of the edge list
   (:func:`partition_edges`), computes local bern group maps and merges them
   exactly across hosts (:func:`global_bern_stats`),
3. the int32 edge list is reassembled replicated on every host
   (:func:`allgather_edges` — it is tiny next to the parameter tables, which
   are what actually shard over the global mesh),
4. parameters are placed with their canonical PartitionSpecs over a global
   (data × model) mesh spanning all processes' devices; the fused epoch
   runner (kb2e_tpu/train/step.py) runs unchanged — XLA partitions it and
   inserts the cross-host collectives,
5. periodic Orbax checkpoints are written collectively (every process
   persists its own parameter shards); after a failure, surviving processes
   restart, re-rendezvous, and resume via
   :func:`kb2e_tpu.io.checkpoint.restore_sharded` with the same global
   shardings and a replayed key stream — bitwise-identical to a run that
   never failed (tests/test_multiprocess.py).

Fault injection for the recovery test is exposed as ``die_after_epoch`` /
``die_process_id``: the chosen process exits abruptly (``os._exit``) right
after the checkpoint of that epoch, simulating a host loss mid-training.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import numpy as np

from kb2e_tpu.config import EmbeddingConfig


@dataclasses.dataclass
class MultihostRunConfig:
    coordinator: str  # "host:port"
    num_processes: int
    process_id: int
    data_axis: Optional[int] = None  # default: all global devices
    model_axis: int = 1
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 0
    resume: bool = False
    # Fault injection (tests): this process exits hard after the checkpoint
    # written at the end of this 1-based epoch.
    die_after_epoch: int = 0
    die_process_id: int = 0
    # Optional: after training, run the sharded filtered eval over the same
    # global mesh; process 0 writes the metrics dict as JSON here.
    eval_out: Optional[str] = None


def run(
    model_name: str,
    cfg: EmbeddingConfig,
    mh: MultihostRunConfig,
    data_dir: str,
    *,
    out_npz: Optional[str] = None,
    verbose: bool = True,
):
    """Train ``model_name`` across processes; returns final params (global).

    ``out_npz``: process 0 writes the final (replicated-fetched) params there
    — the cross-run comparison artifact used by the integration tests.
    """
    import jax

    from kb2e_tpu.data import triples as triples_lib
    from kb2e_tpu.io import checkpoint as ckpt_lib
    from kb2e_tpu.models import get_model
    from kb2e_tpu.parallel import dist_step, mesh as mesh_lib, multihost
    from kb2e_tpu.parallel import sharding as shard_lib
    from kb2e_tpu.train import step as step_lib

    multihost.initialize(mh.coordinator, mh.num_processes, mh.process_id)
    n_proc = jax.process_count()
    pid = jax.process_index()

    def log(msg: str) -> None:
        if verbose:
            print(f"[p{pid}] {msg}", flush=True)

    # --- Per-host input pipeline -----------------------------------------
    # Each host parses the shared dataset directory but keeps only its own
    # contiguous edge shard (at FB40k+ scale the shard is what a host would
    # read at all); statistics and the replicated sampler store are then
    # reassembled exactly via collectives.
    ds = triples_lib.load_dataset(data_dir, splits=("train",))
    full = ds.train
    lh, lt, lr, valid = multihost.partition_edges(
        full.heads, full.tails, full.rels, pid, n_proc
    )
    bern = multihost.global_bern_stats(lh, lt, lr, full.n_relations, valid=valid)
    gh, gt, gr = multihost.allgather_edges(lh, lt, lr, valid=valid)
    ts = triples_lib.TripleSet.from_arrays(
        gh, gt, gr, n_entities=full.n_entities, n_relations=full.n_relations
    )
    # The merged cross-host statistics should equal the whole-list computation
    # (tests/test_multihost.py checks bitwise equality); in production tolerate
    # fp-ordering drift in the merge rather than aborting every job at startup.
    if not np.allclose(bern, ts.bern_pr_tail, rtol=1e-6, atol=1e-7):
        worst = float(np.max(np.abs(bern - ts.bern_pr_tail)))
        raise RuntimeError(
            "global bern stats diverge from the whole-list computation "
            f"(max abs diff {worst:.3e}) — the cross-host count-map merge is "
            "broken; see kb2e_tpu/parallel/multihost.py:global_bern_stats"
        )
    if not np.array_equal(bern, ts.bern_pr_tail):
        log("warning: global bern stats differ from whole-list computation "
            "within tolerance (fp ordering); continuing")
    log(f"edges: local {int(valid.sum())}/{lh.shape[0]} global {ts.num_triples}")

    # --- Global mesh + sharded parameters ---------------------------------
    n_dev = len(jax.devices())
    data_axis = mh.data_axis or (n_dev // mh.model_axis)
    mesh = mesh_lib.make_mesh(data_axis, mh.model_axis)
    model = get_model(model_name)

    seed = cfg.resolved_seed()
    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    params_local = model.init_params(init_key, ts.n_entities, ts.n_relations, cfg)
    shardings = shard_lib.param_shardings(mesh, params_local)
    # Same seed on every process => identical host values; device_put with the
    # global sharding keeps only the local shards.
    params = {k: jax.device_put(np.asarray(v), shardings[k]) for k, v in params_local.items()}

    start_epoch = 0
    if mh.resume and mh.checkpoint_dir:
        latest = ckpt_lib.latest_in(mh.checkpoint_dir)
        if latest is not None:
            params, start_epoch = ckpt_lib.restore_sharded(latest, shardings)
            log(f"resumed from {latest} at epoch {start_epoch}")
    # Replay the key stream to the resume point (one split per fused epoch).
    for _ in range(start_epoch):
        key, _ = jax.random.split(key)

    data = dist_step.replicate_data(mesh, step_lib.DeviceData.from_triple_set(ts))
    batch_size = step_lib.batch_size_for(ts.num_triples, cfg.num_batches)
    batch_size -= batch_size % mesh.shape["data"]
    run_epoch = step_lib.make_epoch_runner(
        model, cfg, batch_size, cfg.num_batches, mesh=mesh
    )

    for epoch in range(start_epoch, cfg.max_epochs):
        t0 = time.perf_counter()
        key, sk = jax.random.split(key)
        params, loss = run_epoch(params, jax.device_put(np.asarray(sk), shardings_rep(mesh)), data)
        loss_val = float(loss)
        log(f"Epoch: {epoch}, Loss: {loss_val:f} ({time.perf_counter() - t0:.2f}s)")
        if mh.checkpoint_dir and mh.checkpoint_every and (epoch + 1) % mh.checkpoint_every == 0:
            ckpt_lib.save(
                os.path.join(mh.checkpoint_dir, f"ckpt_{epoch + 1}"), params, step=epoch + 1
            )
            log(f"checkpointed epoch {epoch + 1}")
        if mh.die_after_epoch and (epoch + 1) == mh.die_after_epoch and pid == mh.die_process_id:
            log(f"FAULT INJECTION: process {pid} dying after epoch {epoch + 1}")
            os._exit(17)

    if out_npz:
        host_params = fetch_replicated(mesh, params)
        if pid == 0:
            np.savez(out_npz, **host_params)
            log(f"wrote {out_npz}")
        multihost.barrier("final_write")

    if mh.eval_out:
        # Multi-PROCESS filtered link prediction over the same global mesh:
        # the sharded one-dispatch scan eval (eval/harness.py mesh path)
        # runs with the entity axis sharded across ALL processes' devices;
        # every process computes the identical replicated metrics and
        # process 0 writes them (the integration test compares against a
        # single-process evaluate over the same params).
        import json

        from kb2e_tpu.eval import harness

        ds_full = triples_lib.load_dataset(
            data_dir, splits=("train", "valid", "test")
        )
        metrics = harness.evaluate(model, params, ds_full, cfg, mesh=mesh)
        log(
            f"eval: filtered MR {metrics['filtered_mean_rank']:.4f} "
            f"Hits@10 {metrics['filtered_hits10']:.4f}"
        )
        if pid == 0:
            with open(mh.eval_out, "w") as f:
                json.dump(metrics, f)
            log(f"wrote {mh.eval_out}")
        multihost.barrier("eval_write")
    return params


def shardings_rep(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P())


def fetch_replicated(mesh, params):
    """Fetch full param values on every host: one jit re-replication (an
    all-gather over the mesh) makes each array fully addressable locally."""
    import jax

    rep = shardings_rep(mesh)
    replicated = jax.jit(
        lambda p: p, out_shardings={k: rep for k in params}
    )(params)
    return {k: np.asarray(v) for k, v in replicated.items()}


def main(argv: Optional[list] = None) -> None:
    """CLI: one process of a multi-host training job.

    Mirrors the single-process trainer flags (kb2e_tpu/cli/common.py) plus
    the rendezvous triple; run one instance per host with a distinct
    --process-id and a shared --coordinator.
    """
    import argparse

    # Some environments force a platform via plugin (e.g. a tunneled-TPU
    # sitecustomize that ignores JAX_PLATFORMS); honour an explicit override
    # before any backend initialises.
    if os.environ.get("KB2E_FORCE_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["KB2E_FORCE_PLATFORM"])

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--model", default="transe")
    ap.add_argument("--datadir", required=True)
    ap.add_argument("--size", type=int, default=100)
    ap.add_argument("--rate", type=float, default=0.001)
    ap.add_argument("--margin", type=float, default=1.0)
    ap.add_argument("--method", type=int, default=1)
    ap.add_argument("--batches", type=int, default=100)
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--distance", type=int, default=0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--data-axis", type=int, default=None)
    ap.add_argument("--model-axis", type=int, default=1)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--checkpoint-every", type=int, default=0)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--out-npz", default=None)
    ap.add_argument("--eval-out", default=None)
    ap.add_argument("--die-after-epoch", type=int, default=0)
    ap.add_argument("--die-process-id", type=int, default=0)
    args = ap.parse_args(argv)

    cfg = EmbeddingConfig(
        embedding_size=args.size,
        learning_rate=args.rate,
        margin=args.margin,
        method=args.method,
        num_batches=args.batches,
        max_epochs=args.epochs,
        distance=args.distance,
        seed=args.seed,
    )
    mh = MultihostRunConfig(
        coordinator=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
        data_axis=args.data_axis,
        model_axis=args.model_axis,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every,
        resume=args.resume,
        die_after_epoch=args.die_after_epoch,
        die_process_id=args.die_process_id,
        eval_out=args.eval_out,
    )
    run(args.model, cfg, mh, args.datadir, out_npz=args.out_npz)


if __name__ == "__main__":
    main()
