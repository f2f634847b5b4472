"""Where the training loop's memory-bound headroom goes (VERDICT r04 item 2).

benchmarks/row_roofline.py measured the chip's chained random-row ceiling
independently (~95M 512 B rows/s).  The headline TransE loop moves ~41M
random rows/s — ~44% of that ceiling.  This script pinpoints the gap with
an ablation LADDER at exact training shapes (B=4,831, table [16,296, k],
100-step scan = one epoch, presampled feed): each rung adds one component
of the real fused step (train/step.py::make_epoch_runner fused path /
models/transe.py::fused_table_update):

  pure_k100      gather 5B rows + scatter-add 5B rows, k=100 (400 B rows)
  pure_k128      same with the table padded to k=128 (512 B lane-aligned)
  compute_k100   + the real TransE margin/gradient math between them
  full_k100      + whole-table ball-norm  == the production fused step
  touched_k100   full but ball-norms ONLY the 5B touched rows
  full_k128      production step on a 128-padded table (delta column-masked
                 so pad columns stay zero — L1 sign(0) would otherwise
                 drift them)

Honest value-fetch sync; feed re-randomised and synced to device per rep.
Writes ROOFLINE_GAP_r05.json and prints one JSON line per rung.
"""

from __future__ import annotations

import argparse
import functools
import json
import os as _os
import sys as _sys
import time

import numpy as np

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

N_ENTITIES = 14_951
N_RELATIONS = 1_345
N_ROWS = N_ENTITIES + N_RELATIONS
K = 100
BATCH = 4_831
N_STEPS = 100
REPS = 3
LR = 0.001
MARGIN = 1.0


def build_step(kind: str, k_pad: int):
    import jax
    import jax.numpy as jnp

    from kb2e_tpu.ops import distances, projections, scatter

    col_mask = None
    if k_pad != K:
        col_mask = (jnp.arange(k_pad) < K).astype(jnp.float32)[None, :]

    def body(table, feed):
        ph, pt, r, nh, nt = feed
        idx = jnp.concatenate([ph, pt, nh, nt, r + N_ENTITIES])
        rows = table[idx]
        if kind == "pure":
            delta = rows * 1e-6
        else:
            b = ph.shape[0]
            hv, tv, nhv, ntv, rv = (rows[i * b:(i + 1) * b] for i in range(5))
            res_pos = tv - hv - rv
            res_neg = ntv - nhv - rv
            e_pos = jnp.sum(jnp.abs(res_pos), axis=-1)
            e_neg = jnp.sum(jnp.abs(res_neg), axis=-1)
            viol = e_pos + MARGIN > e_neg
            m = viol.astype(jnp.float32)[:, None]
            x_pos = jnp.where(2.0 * res_pos > 0, 1.0, -1.0) * m
            x_neg = jnp.where(2.0 * res_neg > 0, 1.0, -1.0) * m
            delta = jnp.concatenate(
                [LR * x_pos, -LR * x_pos, -LR * x_neg, LR * x_neg,
                 LR * (x_pos - x_neg)]
            )
            if col_mask is not None:
                delta = delta * col_mask
        table = scatter.scatter_add(table, idx, delta, "direct")
        if kind == "full":
            table = projections.ball_norm(table)
        elif kind == "touched":
            table = table.at[idx].set(projections.ball_norm(table[idx]))
        probe = rows[0, 0]
        return table, probe

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch(table, feed):
        table, probes = jax.lax.scan(body, table, feed)
        return table, probes.sum()

    return epoch


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="ROOFLINE_GAP_r05.json")
    ap.add_argument("--reps", type=int, default=REPS)
    ap.add_argument("--cases", default="pure_k100,pure_k128,compute_k100,full_k100,touched_k100,full_k128")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    results = []

    for case in args.cases.split(","):
        kind, ktag = case.rsplit("_k", 1)
        k_pad = int(ktag)
        epoch = build_step(kind, k_pad)

        def fresh(k_pad=k_pad):
            table = jnp.asarray(
                rng.normal(size=(N_ROWS, k_pad)).astype(np.float32) * 0.1
            )
            if k_pad != K:
                table = table * (np.arange(k_pad) < K)[None, :]
            feed = tuple(
                jnp.asarray(
                    rng.integers(
                        0, N_ENTITIES if i < 4 else N_RELATIONS,
                        size=(N_STEPS, BATCH),
                    ).astype(np.int32)
                )
                for i in range(5)
            )
            return table, feed

        times = []
        for rep in range(args.reps + 1):
            table, feed = fresh()
            float(table.ravel()[0])
            for a in feed:
                int(a.ravel()[0])
            t0 = time.perf_counter()
            _, probe = epoch(table, feed)
            float(probe)
            dt = time.perf_counter() - t0
            if rep > 0:  # rep 0 = compile warmup
                times.append(dt)
        dt = float(np.median(times))
        rows_accessed = 10 * BATCH * N_STEPS  # 5B gather + 5B scatter
        if kind == "touched":
            rows_accessed = 20 * BATCH * N_STEPS  # + 5B norm-gather + 5B norm-set
        rec = {
            "case": case,
            "epoch_ms": round(dt * 1e3, 1),
            "triples_per_s": round(BATCH * N_STEPS / dt, 1),
            "random_rows_per_s": round(rows_accessed / dt, 1),
            "times_s": [round(t, 4) for t in times],
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    artifact = {
        "date": time.strftime("%Y-%m-%d"),
        "harness": "benchmarks/roofline_gap.py",
        "protocol": (
            f"[{N_ROWS},k] f32 table, {N_STEPS}-step scan per launch, "
            f"B={BATCH} (5B random gathers + 5B scatter-adds per step), "
            "presampled feed synced to device before timing, honest "
            "value-fetch sync, fresh content per rep, median of reps"
        ),
        "ceiling_ref": "ROOFLINE_r05.json chained_gather_scatter_g1",
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
