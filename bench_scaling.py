"""Multi-device scaling benchmark harness.

Measures distributed-train-step throughput across mesh shapes (BASELINE
north star: >=80% scaling efficiency 1 chip -> 1 host -> N hosts).  On real
multi-chip hardware this reports true scaling; on a single chip or virtual
CPU devices it validates the sharded path's mechanics and prints a caveat
(virtual devices share the host's cores, so 'efficiency' is not meaningful
there).

WEAK scaling: the per-device batch stays fixed (--batch), the global batch
grows with the mesh, and efficiency(n) = throughput(n) / (n · throughput(1))
— the regime BASELINE.md's edges/s north star describes.

Usage: python bench_scaling.py [--devices 8] [--batch 8192] [--steps 20]
       [--out SCALING.json]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=None)
    ap.add_argument("--batch", type=int, default=8192,
                    help="per-device batch (weak scaling)")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--size", type=int, default=100)
    ap.add_argument("--out", default=None, help="write results JSON here")
    args = ap.parse_args()

    import jax

    from kb2e_tpu.config import EmbeddingConfig
    from kb2e_tpu.constants import Distance, Method
    from kb2e_tpu.data.synthetic import random_kg
    from kb2e_tpu.data.triples import TripleSet
    from kb2e_tpu.models import get_model
    from kb2e_tpu.parallel import dist_step, mesh as mesh_lib, sharding
    from kb2e_tpu.train import step as step_lib

    n_dev_avail = len(jax.devices())
    n_dev = args.devices or n_dev_avail
    virtual = jax.default_backend() == "cpu"

    n_ent, n_rel, n_tri = 14_951, 1_345, 483_142
    h, t, r = random_kg(n_ent, n_rel, n_tri, seed=1)
    ts = TripleSet.from_arrays(h, t, r, n_entities=n_ent, n_relations=n_rel)
    cfg = EmbeddingConfig(embedding_size=args.size, method=Method.BERN,
                          distance=Distance.L1, seed=0)
    model = get_model("transe")

    results = {}
    n = 1
    while n <= n_dev:
        global_batch = args.batch * n  # weak scaling: fixed per-device batch
        mesh = mesh_lib.make_mesh(n, 1, devices=jax.devices()[:n])
        data = dist_step.replicate_data(mesh, step_lib.DeviceData.from_triple_set(ts))
        params = sharding.place_params(
            mesh, model.init_params(jax.random.PRNGKey(0), n_ent, n_rel, cfg)
        )
        step = dist_step.make_distributed_train_step(model, cfg, mesh, global_batch)
        key = jax.random.PRNGKey(1)
        key, sk = jax.random.split(key)
        params, loss = step(params, sk, data)
        float(loss)
        t0 = time.time()
        for _ in range(args.steps):
            key, sk = jax.random.split(key)
            params, loss = step(params, sk, data)
        float(loss)
        dt = time.time() - t0
        tps = global_batch * args.steps / dt
        eff = tps / (results[1]["triples_per_s"] * n) if n > 1 else 1.0
        results[n] = {"triples_per_s": round(tps, 1), "efficiency": round(eff, 4),
                      "global_batch": global_batch}
        print(f"devices={n:2d}: {tps/1e6:7.2f} M triples/s  efficiency={eff:5.1%}",
              flush=True)
        n *= 2

    if virtual:
        print("(virtual CPU devices share host cores - efficiency figures are "
              "mechanical validation only, not hardware scaling)")
    if args.out:
        payload = {
            "mode": "weak",
            "backend": jax.default_backend(),
            "virtual_devices": virtual,
            "per_device_batch": args.batch,
            "steps": args.steps,
            "results": results,
        }
        if virtual:
            # In-band marker so downstream tooling never ingests virtual-device
            # "efficiency" as hardware scaling data (VERDICT r2, weak item 4).
            payload["mechanics_only"] = True
            payload["mechanics_only_reason"] = (
                "all virtual devices share this host's physical cores; the "
                "efficiency column measures core oversubscription, not "
                "collective overhead — valid only as a compile/run check of "
                "the sharded step"
            )
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
