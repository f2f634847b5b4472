"""Independent random-row transaction ceiling (VERDICT r04 item 2).

PERF.md's speed-of-light section claims the training loop is
throughput-bound on random embedding-row access at ~47M rows/s — but that
bound was *inferred from the loop itself* (batch-policy invariance + bf16
insensitivity).  This microbenchmark measures the ceiling independently:
pure random-row gather + scatter-add over a [N, 128] float32 table
(512 B rows — the training row's padded footprint) at FB15k table shapes,
with NO training math, chained through a `lax.scan` carry exactly like the
training loop (scatter feeds the next step's gather), honest value-fetch
sync, distinct inputs per rep (the tunnel memoizes identical re-executions).

Cases:
  - chained gather+scatter at 1/2/4 rows per transaction (g rows contiguous
    per index — 512 B / 1 KB / 2 KB transactions over a reshaped
    [N/g, g·128] table);
  - unchained gather-only at g=1 (steps independent → an upper bound with
    full memory-level parallelism).

Per step the access count mirrors the headline loop: ~24.5k gathered rows +
the same rows scattered back ≈ the ~53k random row accesses a 4,831-triple
TransE batch makes (~11 rows/triple: 5 gathers + ~6 scatter rows).

Usage: python benchmarks/row_roofline.py [--out ROOFLINE_r05.json]
Prints one JSON line per case and writes the artifact.
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np

N_ROWS = 16_384  # ≈ FB15k entity+relation rows (14,951 + 1,345), pow2 for g-splits
K = 128  # 512 B float32 rows — the padded training-row footprint
ROWS_PER_STEP = 24_576  # gathered rows/step; same rows scattered back
N_STEPS = 100  # one "epoch" per launch, like the headline loop
REPS = 3
WARMUP = 1


def make_chained(g: int):
    import jax
    import jax.numpy as jnp

    n_groups = N_ROWS // g
    width = g * K

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=())
    def run(table, idx):
        # table [n_groups, g·K]; idx [N_STEPS, ROWS_PER_STEP // g] int32.
        def body(tab, ix):
            rows = tab[ix]  # random gather, g·512 B per transaction
            tab = tab.at[ix].add(rows * 1e-6)  # random scatter-add back
            return tab, rows[0, 0]

        tab, probe = jax.lax.scan(body, table, idx)
        # The fetched scalar transitively depends on every step (probe reads
        # gathers; each gather reads the previous step's scatter via the
        # carry), so a value fetch syncs the whole chain.
        return tab, probe.sum()

    return run, n_groups, width


def make_gather_only():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(table, idx):
        def body(tab, ix):
            rows = tab[ix]
            return tab, jnp.sum(rows[:, 0])

        _, probe = jax.lax.scan(body, table, idx)
        return probe.sum()

    return run


def _sync_inputs(args):
    """Force the host→device upload of every input BEFORE the timed launch
    (value-fetch one element per array: block_until_ready does not wait on
    the tunneled backend, and an unsynced 10+ MB index upload otherwise
    lands inside the timed region and dominates it)."""
    for a in args:
        float(a.ravel()[0])


def _measure(launch, fresh_inputs, reps: int):
    times = []
    for _ in range(WARMUP):
        out = launch(*fresh_inputs())
        float(out if not isinstance(out, tuple) else out[-1])
    for _ in range(reps):
        args = fresh_inputs()
        _sync_inputs(args)
        t0 = time.perf_counter()
        out = launch(*args)
        float(out if not isinstance(out, tuple) else out[-1])
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), times


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="ROOFLINE_r05.json")
    ap.add_argument("--reps", type=int, default=REPS)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    results = []

    for g in (1, 2, 4):
        run, n_groups, width = make_chained(g)
        r = ROWS_PER_STEP // g

        def fresh(n_groups=n_groups, width=width, r=r):
            table = jnp.asarray(
                rng.normal(size=(n_groups, width)).astype(np.float32)
            )
            idx = jnp.asarray(
                rng.integers(0, n_groups, size=(N_STEPS, r)).astype(np.int32)
            )
            return table, idx

        dt, times = _measure(run, fresh, args.reps)
        rows_accessed = 2 * r * g * N_STEPS  # gather + scatter rows
        rec = {
            "case": f"chained_gather_scatter_g{g}",
            "rows_per_transaction": g,
            "transaction_bytes": g * K * 4,
            "rows_per_s": round(rows_accessed / dt, 1),
            "transactions_per_s": round(rows_accessed / g / dt, 1),
            "effective_gb_per_s": round(rows_accessed * K * 4 / dt / 1e9, 2),
            "launch_ms": round(dt * 1e3, 2),
            "times_s": [round(t, 4) for t in times],
        }
        results.append(rec)
        print(json.dumps(rec))

    run = make_gather_only()

    def fresh_g():
        table = jnp.asarray(rng.normal(size=(N_ROWS, K)).astype(np.float32))
        idx = jnp.asarray(
            rng.integers(0, N_ROWS, size=(N_STEPS, ROWS_PER_STEP)).astype(np.int32)
        )
        return table, idx

    dt, times = _measure(run, fresh_g, args.reps)
    rows_accessed = ROWS_PER_STEP * N_STEPS
    rec = {
        "case": "unchained_gather_only_g1",
        "rows_per_transaction": 1,
        "transaction_bytes": K * 4,
        "rows_per_s": round(rows_accessed / dt, 1),
        "effective_gb_per_s": round(rows_accessed * K * 4 / dt / 1e9, 2),
        "launch_ms": round(dt * 1e3, 2),
        "times_s": [round(t, 4) for t in times],
    }
    results.append(rec)
    print(json.dumps(rec))

    artifact = {
        "date": time.strftime("%Y-%m-%d"),
        "harness": "benchmarks/row_roofline.py",
        "protocol": (
            f"[{N_ROWS},{K}] f32 table (512 B rows), {N_STEPS}-step lax.scan "
            f"per launch, {ROWS_PER_STEP} random gathered rows + same rows "
            "scatter-added per step (chained through the carry like the "
            "training loop), honest value-fetch sync, fresh random "
            "table+indices per rep (tunnel memoizes identical re-executions), "
            "median of reps"
        ),
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
