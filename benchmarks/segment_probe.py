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


def run_child(trips: int, model_name: str, structured: bool = False,
              scatter_mode: str | None = None, iters: int = 2) -> None:
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

    if scatter_mode:
        import dataclasses

        cfg = dataclasses.replace(cfg, scatter_mode=scatter_mode)

    b = trips * chunk
    ks = jax.random.split(key, 7)
    ph = jax.random.randint(ks[0], (b,), 0, N_ENTITIES)
    pt = jax.random.randint(ks[1], (b,), 0, N_ENTITIES)
    nh = jax.random.randint(ks[3], (b,), 0, N_ENTITIES)
    nt = jax.random.randint(ks[4], (b,), 0, N_ENTITIES)
    if structured:
        # Mimic real corruption structure: each negative shares one entity
        # with its positive (bern coin), so the concatenated scatter index
        # vector [ph, pt, nh, nt] carries GUARANTEED structured duplicates —
        # the content difference between sampled batches (which crash the
        # backend) and i.i.d. uniform batches (which do not).
        coin = jax.random.bernoulli(ks[5], 0.5, (b,))
        nh = jnp.where(coin, ph, nh)   # tail-corrupt rows keep the head
        nt = jnp.where(coin, nt, pt)   # head-corrupt rows keep the tail
    batch = {
        "ph": ph, "pt": pt,
        "r": jax.random.randint(ks[2], (b,), 0, N_RELATIONS),
        "nh": nh, "nt": nt,
        "valid": jnp.ones((b,), bool),
    }

    update = jax.jit(lambda p, bt: model.batch_update(p, bt, cfg), donate_argnums=(0,))
    t0 = time.perf_counter()
    params, loss = update(params, batch)
    float(loss)
    compile_s = time.perf_counter() - t0

    # Re-executions with fresh inputs (identical re-executions appear
    # memoized through the tunnel, CLAUDE.md) measure steady-state time;
    # --iters > 2 probes whether the fault accumulates over REPEATED
    # launches of the same executable (the bench dispatches dozens per
    # epoch and crashes where 2-launch probes pass).
    exec_s = None
    for it in range(1, iters):
        batch2 = {k: (jnp.roll(v, it) if v.dtype != bool else v) for k, v in batch.items()}
        t0 = time.perf_counter()
        params, loss = update(params, batch2)
        float(loss)
        exec_s = time.perf_counter() - t0
        if iters > 2:
            print(json.dumps({"iter": it, "ok": True,
                              "exec_ms": round(exec_s * 1e3, 1)}), flush=True)
    print(json.dumps({
        "trips": trips, "ok": True, "compile_s": round(compile_s, 1),
        "iters": iters,
        "exec_ms": round(exec_s * 1e3, 1) if exec_s else None,
        "ms_per_chunk": round(exec_s * 1e3 / trips, 2) if exec_s else None,
    }), flush=True)


def run_epoch_child(trips: int, model_name: str, n_train: int,
                    synthetic: bool = False, host_slices: bool = False,
                    ablate: str = "") -> None:
    """Stage-wise replica of the chunked epoch pipeline with a sync between
    stages, to pinpoint WHICH program crashes the worker when the
    whole-epoch bench does and the single-launch probe does not.

    Stages: A sample the whole epoch (real cuckoo/bern sampler) → B pad +
    reshape to [n_chunks, chunk] → C dynamic-slice one segment → D one
    segment launch on real data → E all remaining segments, syncing each.
    """
    import jax
    import jax.numpy as jnp

    from kb2e_tpu.config import EmbeddingConfig
    from kb2e_tpu.constants import Distance, Method
    from kb2e_tpu.data.synthetic import random_kg
    from kb2e_tpu.data.triples import TripleSet
    from kb2e_tpu.models import get_model
    from kb2e_tpu.models.base import Batch
    from kb2e_tpu.sampling import corruption
    from kb2e_tpu.train import step as step_lib

    model = get_model(model_name)
    chunk = model.chunk_size
    cfg = EmbeddingConfig(
        embedding_size=EMBEDDING_SIZE, learning_rate=0.001, margin=1.0,
        method=Method.BERN, num_batches=100, distance=Distance.L1, seed=42,
        debug_ablate=ablate,
    )
    h, t, r = random_kg(N_ENTITIES, N_RELATIONS, n_train, seed=1)
    ts = TripleSet.from_arrays(h, t, r, n_entities=N_ENTITIES, n_relations=N_RELATIONS)
    data = step_lib.DeviceData.from_triple_set(ts)
    batch_size = step_lib.batch_size_for(ts.num_triples, cfg.num_batches)
    key = jax.random.PRNGKey(0)
    params = model.init_params(key, N_ENTITIES, N_RELATIONS, cfg)

    def stage(name, t0):
        print(json.dumps({"stage": name, "ok": True,
                          "s": round(time.perf_counter() - t0, 1)}), flush=True)

    total = cfg.num_batches * batch_size
    n_chunks = -(-total // chunk)
    n_segments = -(-n_chunks // trips)
    padded = n_segments * trips * chunk

    @jax.jit
    def sample_epoch(key):
        big = corruption.sample_batch(
            key, data.heads, data.tails, data.rels, data.bern_pr_tail,
            data.sorted_h, data.sorted_r, data.sorted_t,
            n_entities=N_ENTITIES, batch_size=total, method=Method.BERN,
            resample_rounds=cfg.corruption_resample_rounds,
            cuckoo_table=data.cuckoo_table, cuckoo_m=data.cuckoo_m,
            cuckoo_salt=data.cuckoo_salt, n_relations=data.n_relations,
        )
        pad = padded - total

        def padc(v):
            if pad == 0:
                return v
            return jnp.concatenate([v, jnp.zeros((pad, *v.shape[1:]), v.dtype)])

        big = Batch({k: padc(v) for k, v in big.items()})
        if pad:
            big = Batch({**big, "valid": big["valid"].at[total:].set(False)})
        return Batch({k: v.reshape(-1, chunk, *v.shape[1:]) for k, v in big.items()})

    t0 = time.perf_counter()
    if synthetic:
        # Same shapes/pipeline but synthetic structured content — separates
        # "real sampler output" from "program form" as the crash trigger.
        ks = jax.random.split(jax.random.PRNGKey(1), 6)
        ph_ = jax.random.randint(ks[0], (padded,), 0, N_ENTITIES)
        pt_ = jax.random.randint(ks[1], (padded,), 0, N_ENTITIES)
        nh_ = jax.random.randint(ks[2], (padded,), 0, N_ENTITIES)
        nt_ = jax.random.randint(ks[3], (padded,), 0, N_ENTITIES)
        coin = jax.random.bernoulli(ks[4], 0.5, (padded,))
        batches = Batch({
            "ph": ph_, "pt": pt_,
            "r": jax.random.randint(ks[5], (padded,), 0, N_RELATIONS),
            "nh": jnp.where(coin, ph_, nh_),
            "nt": jnp.where(coin, nt_, pt_),
            "valid": jnp.arange(padded) < total,
        })
        batches = Batch({k: v.reshape(-1, chunk, *v.shape[1:])
                         for k, v in batches.items()})
        int(batches["ph"][0, 0])
        stage("A_synthetic+B_reshape", t0)
    else:
        batches = sample_epoch(jax.random.PRNGKey(1))
        int(batches["ph"][0, 0])  # value fetch — the only honest sync here
        stage("A_sample+B_reshape", t0)

    if host_slices:
        # Candidate workaround: fetch the sampled epoch to host ONCE
        # (~12 MB) and feed each segment via device_put — removes the
        # interleaved device-slice launches and any operand aliasing into
        # the big batches buffer.
        import numpy as np

        t0 = time.perf_counter()
        host = {k: np.asarray(v) for k, v in batches.items()}
        stage("C_host_fetch", t0)

        def seg_slice(_, start):
            s = int(start)
            return Batch({k: jax.device_put(v[s:s + trips]) for k, v in host.items()})
    else:
        @jax.jit
        def seg_slice(batches, start):
            return Batch({k: jax.lax.dynamic_slice_in_dim(v, start, trips, 0)
                          for k, v in batches.items()})

    t0 = time.perf_counter()
    seg0 = seg_slice(batches, jnp.int32(0))
    int(seg0["ph"][0, 0])
    stage("C_slice", t0)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_segment(params, seg):
        def body(params, batch):
            return model.batch_update(params, batch, cfg)

        params, losses = jax.lax.scan(body, params, seg)
        return params, losses.sum()

    t0 = time.perf_counter()
    params, loss = run_segment(params, seg0)
    float(loss)
    stage("D_segment0", t0)

    t0 = time.perf_counter()
    for s in range(1, n_segments):
        seg = seg_slice(batches, jnp.int32(s * trips))
        params, seg_loss = run_segment(params, seg)
        float(seg_loss)
        if s % 20 == 0:
            print(json.dumps({"stage": f"E_segment{s}", "ok": True}), flush=True)
    stage(f"E_all_{n_segments}_segments", t0)


def run_eval_child(trips: int, model_name: str, n_train: int,
                   test_frac: float = 0.05, warm_iters: int = 1) -> None:
    """Eval-side probe (VERDICT r04 item 3): run the CTransR cluster-routed
    eval with ``KB2E_CLUSTER_EVAL_SEGMENT=trips`` and report ok/crash plus
    first-call and warm wall time — one child per (trips, trial) so a
    worker crash kills the child, not the probe.  Doubles as the segment-
    length SWEEP harness: the parent's per-trips records ARE the tuning
    curve (ms/batch vs segment length).

    trips = batches per scan segment (0 = one dispatch per batch; the
    r04 default was 16, never tuned).  Non-cluster models accepted too
    (their scan ignores the segment env) for cross-checking.
    """
    import numpy as np

    import jax
    import jax.numpy as jnp

    from kb2e_tpu.config import EmbeddingConfig
    from kb2e_tpu.constants import Distance, Method
    from kb2e_tpu.data.synthetic import random_kg
    from kb2e_tpu.data.triples import Dataset, TripleSet
    from kb2e_tpu.eval import harness
    from kb2e_tpu.models import get_model

    _os.environ["KB2E_CLUSTER_EVAL_SEGMENT"] = str(trips)

    model = get_model(model_name)
    cfg = EmbeddingConfig(
        embedding_size=EMBEDDING_SIZE, distance=Distance.L1, seed=42,
        eval_block_size=1024, eval_batch_size=256,
    )
    h, t, r = random_kg(N_ENTITIES, N_RELATIONS, n_train, seed=1)
    n_test = int(n_train * test_frac)
    ts = TripleSet.from_arrays(
        h[n_test:], t[n_test:], r[n_test:],
        n_entities=N_ENTITIES, n_relations=N_RELATIONS,
    )
    ds = Dataset(
        entity2id={str(i): i for i in range(N_ENTITIES)},
        relation2id={str(i): i for i in range(N_RELATIONS)},
        train=ts, valid=None, test=(h[:n_test], t[:n_test], r[:n_test]),
    )
    key = jax.random.PRNGKey(0)
    params = model.init_params(key, N_ENTITIES, N_RELATIONS, cfg)
    if getattr(model, "cluster_aware", False):
        rng = np.random.default_rng(0)
        centers = rng.normal(size=(N_RELATIONS, model.n_clusters, EMBEDDING_SIZE))
        centers /= np.linalg.norm(centers, axis=-1, keepdims=True) + 1e-9
        params = model.with_centers(params, jnp.asarray(centers, jnp.float32))

    t0 = time.perf_counter()
    m = harness.evaluate(model, params, ds, cfg)
    first_s = time.perf_counter() - t0
    queries = int(m["num_corruptions"])

    warm_s = None
    for it in range(warm_iters):
        # Perturb params so the tunnel cannot serve a memoized result.
        params = {
            k: (v + 1e-6 if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating) else v)
            for k, v in params.items()
        }
        t0 = time.perf_counter()
        harness.evaluate(model, params, ds, cfg)
        warm_s = time.perf_counter() - t0
    n_batches = -(-queries // cfg.eval_batch_size)
    print(json.dumps({
        "trips": trips, "ok": True, "mode": "eval",
        "first_s": round(first_s, 1),
        "warm_s": round(warm_s, 2) if warm_s is not None else None,
        "queries": queries,
        "ms_per_batch": (
            round(warm_s * 1e3 / n_batches, 2) if warm_s is not None else None
        ),
        "warm_queries_per_s": (
            round(queries / warm_s, 1) if warm_s else None
        ),
    }), flush=True)


def run_canary_smoke(trips: int = 2, model: str = "transr",
                     timeout: int = 900) -> dict:
    """Backend-drift canary (VERDICT r04 item 7a): a 2-launch probe of the
    chunk-sequential pipeline in a SUBPROCESS (a worker crash kills the
    child, not the caller).  Benchmarks run this before measuring and
    annotate their artifact with the result, so a drifted fault profile is
    attributed by the canary instead of killing an at-scale run unexplained.
    Skippable via KB2E_SKIP_CANARY=1.
    """
    if _os.environ.get("KB2E_SKIP_CANARY") == "1":
        return {"ok": None, "skipped": True}
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [_sys.executable, _os.path.abspath(__file__), "--child",
             "--trips", str(trips), "--model", model],
            capture_output=True, text=True, timeout=timeout,
            cwd=_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        )
    except subprocess.TimeoutExpired:
        return {"ok": False, "trips": trips, "model": model,
                "error": f"timeout after {timeout}s"}
    rec = None
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            rec = json.loads(line)
    if rec is None or not rec.get("ok"):
        return {"ok": False, "trips": trips, "model": model,
                "returncode": proc.returncode,
                "tail": (proc.stderr or proc.stdout)[-300:]}
    return {"ok": True, "trips": trips, "model": model,
            "exec_ms": rec.get("exec_ms"),
            "wall_s": round(time.perf_counter() - t0, 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--epoch", action="store_true",
                    help="child runs the stage-wise epoch pipeline instead "
                         "of one flat-scan launch")
    ap.add_argument("--eval", action="store_true",
                    help="probe the EVAL-side cluster-routed scan: trips = "
                         "KB2E_CLUSTER_EVAL_SEGMENT batches per segment; "
                         "also the segment-length tuning sweep")
    ap.add_argument("--test-frac", type=float, default=0.05)
    ap.add_argument("--trips", default=DEFAULT_LADDER)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--model", default="transr")
    ap.add_argument("--n-train", type=int, default=483_142)
    ap.add_argument("--structured", action="store_true",
                    help="negatives share one entity with their positive "
                         "(real corruption structure) instead of i.i.d.")
    ap.add_argument("--scatter-mode", default=None,
                    choices=(None, "direct", "dedup"))
    ap.add_argument("--iters", type=int, default=2,
                    help="executions per child (first is compile+run)")
    ap.add_argument("--ablate", default="",
                    help="epoch mode: comma-set of chunk blocks to skip "
                         "(scatter,norms,ball) — fault bisection")
    ap.add_argument("--host-slices", action="store_true",
                    help="epoch mode: feed segments via host fetch + "
                         "device_put instead of device dynamic-slice")
    ap.add_argument("--timeout", type=int, default=1500,
                    help="per-child seconds (remote compiles run minutes)")
    args = ap.parse_args()

    if args.child:
        if args.epoch:
            run_epoch_child(int(args.trips), args.model, args.n_train,
                            synthetic=args.structured,
                            host_slices=args.host_slices,
                            ablate=args.ablate)
        elif args.eval:
            run_eval_child(int(args.trips), args.model, args.n_train,
                           test_frac=args.test_frac,
                           warm_iters=max(args.iters - 1, 1))
        else:
            run_child(int(args.trips), args.model, structured=args.structured,
                      scatter_mode=args.scatter_mode, iters=args.iters)
        return

    ladder = [int(x) for x in args.trips.split(",")]
    results = []
    for trips in ladder:
        for trial in range(args.trials):
            cmd = [_sys.executable, _os.path.abspath(__file__), "--child",
                   "--trips", str(trips), "--model", args.model]
            if args.eval:
                cmd += ["--eval", "--test-frac", str(args.test_frac),
                        "--n-train", str(args.n_train),
                        "--iters", str(args.iters)]
            elif args.epoch:
                cmd += ["--epoch", "--n-train", str(args.n_train)]
                if args.structured:
                    cmd += ["--structured"]
                if args.host_slices:
                    cmd += ["--host-slices"]
                if args.ablate:
                    cmd += ["--ablate", args.ablate]
            proc = subprocess.run(
                cmd,
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
