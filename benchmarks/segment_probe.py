"""Axon-backend segment-fault probe: find the max reliable scan length.

The TransR/CTransR fast path is a chunk-sequential ``lax.scan`` (one chunk of
~1024 samples per trip; models/transr.py::batch_update).  The axon TPU
backend has a RUNTIME kernel fault on long flat scans over that chunk
pipeline: compile succeeds, execution crashes the TPU worker process
(observed r03: ~10 trips reliable, 120+ crashes; r04: a 10-trip segmented
epoch crashed once mid-bench after TransE+TransH ran in the same process).
``train/step.py`` therefore splits epochs into SEGMENT_CHUNKS-trip launches
(env-overridable via KB2E_SEGMENT_CHUNKS).

This probe pins that magic number down empirically, so a backend update is a
5-minute re-probe instead of archaeology through commit messages:

* parent mode spawns one CHILD SUBPROCESS per (trips, trial) so a worker
  crash kills the child, not the probe, and reports ok/crash + per-chunk ms;
* child mode runs ONE ``model.batch_update`` call on a batch of
  ``trips * chunk_size`` rows — exactly the flat-scan program shape the
  epoch runner would emit with SEGMENT_CHUNKS=trips — at FB15k shapes
  (14,951 entities / 1,345 relations / k=100) and fetches the loss (the only
  sync that provably waits on this backend, CLAUDE.md).

Usage:
  python benchmarks/segment_probe.py                     # ladder, 2 trials each
  python benchmarks/segment_probe.py --trips 10,40,120 --trials 1
  python benchmarks/segment_probe.py --child --trips 40  # (internal)

Output: one JSON line per (trips, trial), then a summary JSON line with
``max_reliable_trips`` (largest ladder value where every trial passed) and
the measured per-chunk milliseconds.
"""

from __future__ import annotations

import argparse
import json
import os as _os
import subprocess
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

N_ENTITIES = 14_951
N_RELATIONS = 1_345
EMBEDDING_SIZE = 100
DEFAULT_LADDER = "1,5,10,20,40,80,120"


def run_child(trips: int, model_name: str) -> None:
    import jax
    import jax.numpy as jnp

    from kb2e_tpu.config import EmbeddingConfig
    from kb2e_tpu.constants import Distance, Method
    from kb2e_tpu.models import get_model

    model = get_model(model_name)
    chunk = model.chunk_size
    cfg = EmbeddingConfig(
        embedding_size=EMBEDDING_SIZE,
        learning_rate=0.001,
        margin=1.0,
        method=Method.BERN,
        num_batches=100,
        distance=Distance.L1,
        seed=42,
    )
    key = jax.random.PRNGKey(0)
    params = model.init_params(key, N_ENTITIES, N_RELATIONS, cfg)
    if model_name == "ctransr":
        import numpy as np

        from kb2e_tpu.models import ctransr as ctransr_lib

        # Deterministic centers (no data build): random unit offsets suffice
        # for the routing gather's access pattern.
        rng = np.random.default_rng(0)
        centers = rng.normal(size=(N_RELATIONS, model.n_clusters, EMBEDDING_SIZE))
        centers /= np.linalg.norm(centers, axis=-1, keepdims=True) + 1e-9
        params = model.with_centers(params, jnp.asarray(centers, jnp.float32))

    b = trips * chunk
    ks = jax.random.split(key, 6)
    batch = {
        "ph": jax.random.randint(ks[0], (b,), 0, N_ENTITIES),
        "pt": jax.random.randint(ks[1], (b,), 0, N_ENTITIES),
        "r": jax.random.randint(ks[2], (b,), 0, N_RELATIONS),
        "nh": jax.random.randint(ks[3], (b,), 0, N_ENTITIES),
        "nt": jax.random.randint(ks[4], (b,), 0, N_ENTITIES),
        "valid": jnp.ones((b,), bool),
    }

    update = jax.jit(lambda p, bt: model.batch_update(p, bt, cfg), donate_argnums=(0,))
    t0 = time.perf_counter()
    params, loss = update(params, batch)
    float(loss)
    compile_s = time.perf_counter() - t0

    # Second execution with fresh inputs (identical re-executions appear
    # memoized through the tunnel, CLAUDE.md) measures steady-state time.
    batch2 = {k: (jnp.roll(v, 1) if v.dtype != bool else v) for k, v in batch.items()}
    t0 = time.perf_counter()
    params, loss = update(params, batch2)
    float(loss)
    exec_s = time.perf_counter() - t0
    print(json.dumps({
        "trips": trips, "ok": True, "compile_s": round(compile_s, 1),
        "exec_ms": round(exec_s * 1e3, 1),
        "ms_per_chunk": round(exec_s * 1e3 / trips, 2),
    }), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--trips", default=DEFAULT_LADDER)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--model", default="transr")
    ap.add_argument("--timeout", type=int, default=1500,
                    help="per-child seconds (remote compiles run minutes)")
    args = ap.parse_args()

    if args.child:
        run_child(int(args.trips), args.model)
        return

    ladder = [int(x) for x in args.trips.split(",")]
    results = []
    for trips in ladder:
        for trial in range(args.trials):
            proc = subprocess.run(
                [_sys.executable, _os.path.abspath(__file__), "--child",
                 "--trips", str(trips), "--model", args.model],
                capture_output=True, text=True, timeout=args.timeout,
                cwd=_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            )
            rec = None
            for line in proc.stdout.splitlines():
                if line.startswith("{"):
                    rec = json.loads(line)
            if rec is None:
                tail = (proc.stderr or proc.stdout)[-400:]
                rec = {"trips": trips, "ok": False, "returncode": proc.returncode,
                       "crash": "UNAVAILABLE" in (proc.stderr or "")
                                or "crashed" in (proc.stderr or ""),
                       "tail": tail}
            rec["trial"] = trial
            results.append(rec)
            print(json.dumps(rec), flush=True)
            if not rec["ok"]:
                # Give the TPU worker time to restart before the next child.
                time.sleep(20)

    by_trips = {}
    for r in results:
        by_trips.setdefault(r["trips"], []).append(r["ok"])
    reliable = [t for t, oks in by_trips.items() if all(oks)]
    chunk_ms = [r["ms_per_chunk"] for r in results if r.get("ok") and "ms_per_chunk" in r]
    print(json.dumps({
        "model": args.model,
        "ladder": ladder,
        "trials": args.trials,
        "max_reliable_trips": (max(reliable) if reliable else 0),
        "first_failing_trips": min(
            (t for t, oks in by_trips.items() if not all(oks)), default=None
        ),
        "ms_per_chunk_median": (sorted(chunk_ms)[len(chunk_ms) // 2] if chunk_ms else None),
    }), flush=True)


if __name__ == "__main__":
    main()
