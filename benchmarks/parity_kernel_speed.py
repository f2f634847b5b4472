"""Parity-mode speed: fused Pallas sequential kernels vs the lax.scan path.

One FB15k-shaped batch (B = |T|/100 = 4831, k=100) through
``{transe,transh,transr}_sequential_update`` and through the reference-exact
``lax.scan`` path, warm timings with value-fetch sync and distinct inputs per
iteration (the tunnel memoizes identical (executable, input) pairs —
CLAUDE.md).

Usage: python benchmarks/parity_kernel_speed.py [--models transe,transh,transr]
       [--batch 4831] [--iters 3]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="transe,transh,transr")
    ap.add_argument("--batch", type=int, default=4831)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--entities", type=int, default=14_951)
    ap.add_argument("--relations", type=int, default=1_345)
    ap.add_argument("--size", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from kb2e_tpu.config import EmbeddingConfig
    from kb2e_tpu.models import get_model
    from kb2e_tpu.models.base import Batch

    n, r_n, k, b = args.entities, args.relations, args.size, args.batch
    rng = np.random.default_rng(0)
    ent = (rng.normal(size=(n, k)) * 0.1).astype(np.float32)
    rel = (rng.normal(size=(r_n, k)) * 0.1).astype(np.float32)
    w = rng.normal(size=(r_n, k)).astype(np.float32)
    w /= np.linalg.norm(w, axis=-1, keepdims=True)
    proj = np.broadcast_to(np.eye(k, dtype=np.float32), (r_n, k, k)).copy()

    def make_batch(seed):
        g = np.random.default_rng(seed)
        return Batch(
            ph=jnp.asarray(g.integers(0, n, b).astype(np.int32)),
            pt=jnp.asarray(g.integers(0, n, b).astype(np.int32)),
            r=jnp.asarray(g.integers(0, r_n, b).astype(np.int32)),
            nh=jnp.asarray(g.integers(0, n, b).astype(np.int32)),
            nt=jnp.asarray(g.integers(0, n, b).astype(np.int32)),
            valid=jnp.asarray(np.ones(b, bool)),
        )

    for name in args.models.split(","):
        model = get_model(name)
        params = {"entity": jnp.asarray(ent), "relation": jnp.asarray(rel)}
        if name == "transh":
            params["norm"] = jnp.asarray(w)
        elif name == "transr":
            params["proj"] = jnp.asarray(proj)

        out = {"model": name, "batch": b}
        for impl in ("pallas", "scan"):
            cfg = EmbeddingConfig(
                embedding_size=k, learning_rate=0.001, margin=1.0,
                update_mode="parity", parity_impl=impl,
            )
            p2, loss = model.sequential_update(params, make_batch(1), cfg)
            float(loss)  # compile + sync
            t0 = time.perf_counter()
            for it in range(args.iters):
                p2, loss = model.sequential_update(params, make_batch(2 + it), cfg)
            float(loss)
            dt = (time.perf_counter() - t0) / args.iters
            out[f"{impl}_batch_s"] = round(dt, 4)
            out[f"{impl}_triples_per_s"] = round(b / dt, 1)
        out["speedup"] = round(out["scan_batch_s"] / out["pallas_batch_s"], 1)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
