"""Evaluation-path benchmark: rank-against-all sweep throughput.

Measures full filtered link-prediction queries/s at FB15k scale (N=14,951
entities, k=100) for the XLA and Pallas sweeps.  Not the driver headline
(bench.py is); run manually: ``python bench_eval.py [n_queries]``.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main(n_queries: int = 4096) -> None:
    import jax
    import jax.numpy as jnp

    from kb2e_tpu.constants import Distance
    from kb2e_tpu.eval import ranking

    n_ent, k, b = 14_951, 100, 256
    block = 2048
    rng = np.random.default_rng(0)
    ent = jnp.asarray(rng.normal(size=(n_ent, k)).astype(np.float32))
    proj = ranking.pad_entities(ent, block)
    true_idx = jnp.asarray(rng.integers(0, n_ent, b), jnp.int32)
    cands = jnp.full((b, 32), -1, jnp.int32)

    n_batches = max(1, n_queries // b)
    queries = [
        jnp.asarray(rng.normal(size=(b, k)).astype(np.float32)) for _ in range(n_batches)
    ]

    for name, fn in (
        ("xla", ranking.rank_queries),
        ("pallas", ranking.rank_queries_pallas),
    ):
        for dist in (Distance.L1, Distance.L2):
            out = fn(proj, queries[0], true_idx, cands, dist, block)
            np.asarray(out[0])  # compile + force
            t0 = time.time()
            outs = [fn(proj, q, true_idx, cands, dist, block) for q in queries]
            np.asarray(outs[-1][0])
            for o in outs:
                np.asarray(o[0])
            dt = time.time() - t0
            qps = n_batches * b / dt
            print(
                f"{name:6s} {dist.name}: {qps:,.0f} queries/s "
                f"({qps * n_ent / 1e9:.1f}G candidate scores/s)",
                flush=True,
            )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
