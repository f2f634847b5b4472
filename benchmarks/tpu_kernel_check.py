"""TPU verification: fused Pallas sequential kernels vs the lax.scan oracle.

Runs the ``{transh,transr}_sequential_update`` Pallas kernels compiled for the
real chip (``interpret=False``) on one small batch, re-runs with a distinct
input (the tunnel memoizes identical (executable, input) pairs — CLAUDE.md),
and compares loss + final tables against the reference-exact ``lax.scan``
parity path.  This is the quick on-hardware smoke test for the kernels that
the CPU test suite can only exercise in interpret mode.

Usage:  python benchmarks/tpu_kernel_check.py
        KB2E_CHECK_MODELS=transr python benchmarks/tpu_kernel_check.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kb2e_tpu.config import EmbeddingConfig
    from kb2e_tpu.models import get_model
    from kb2e_tpu.models.base import Batch
    from kb2e_tpu.ops import pallas_update

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    n, r_n, k, b = 200, 10, 100, 64
    ent = (rng.normal(size=(n, k)) * 0.3).astype(np.float32)
    rel = (rng.normal(size=(r_n, k)) * 0.3).astype(np.float32)
    w = rng.normal(size=(r_n, k)).astype(np.float32)
    w /= np.linalg.norm(w, axis=-1, keepdims=True)
    proj = (
        np.broadcast_to(np.eye(k, dtype=np.float32), (r_n, k, k))
        + rng.normal(size=(r_n, k, k)).astype(np.float32) * 0.1
    )
    batch = Batch(
        ph=jnp.asarray(rng.integers(0, n, b).astype(np.int32)),
        pt=jnp.asarray(rng.integers(0, n, b).astype(np.int32)),
        r=jnp.asarray(rng.integers(0, r_n, b).astype(np.int32)),
        nh=jnp.asarray(rng.integers(0, n, b).astype(np.int32)),
        nt=jnp.asarray(rng.integers(0, n, b).astype(np.int32)),
        valid=jnp.asarray(np.ones(b, bool)),
    )
    cfg = EmbeddingConfig(
        embedding_size=k, learning_rate=0.05, margin=1.0,
        update_mode="parity", parity_impl="scan",
    )

    cases = {
        "transe": (
            dict(learning_rate=0.05, margin=1.0, l1=True),
            {"entity": jnp.asarray(ent), "relation": jnp.asarray(rel)},
            None,
        ),
        "transh": (
            dict(learning_rate=0.05, margin=1.0, max_iters=16),
            {"entity": jnp.asarray(ent), "relation": jnp.asarray(rel), "norm": jnp.asarray(w)},
            "norm",
        ),
        "transr": (
            dict(learning_rate=0.05, margin=1.0, l1=True, max_iters=16),
            {"entity": jnp.asarray(ent), "relation": jnp.asarray(rel), "proj": jnp.asarray(proj)},
            "proj",
        ),
    }
    selected = [s.strip() for s in os.environ.get("KB2E_CHECK_MODELS", "transe,transh,transr").split(",")]

    ok = True
    for name, (kwargs, params, extra_key) in cases.items():
        if name not in selected:
            continue
        model = get_model(name)
        fn = getattr(pallas_update, f"{name}_sequential_update")

        extra = (params[extra_key],) if extra_key else ()
        t0 = time.time()
        out = fn(
            params["entity"], params["relation"], *extra,
            batch["ph"], batch["pt"], batch["r"], batch["nh"], batch["nt"],
            batch["valid"], interpret=False, **kwargs,
        )
        loss_tpu = float(out[-1])
        compile_s = time.time() - t0

        # Second run with distinct inputs defeats the tunnel's memoization.
        v2 = np.ones(b, bool)
        v2[0] = False
        t0 = time.time()
        out2 = fn(
            params["entity"], params["relation"], *extra,
            batch["ph"], batch["pt"], batch["r"], batch["nh"], batch["nt"],
            jnp.asarray(v2), interpret=False, **kwargs,
        )
        float(out2[-1])
        warm_s = time.time() - t0

        ref_params, ref_loss = model.sequential_update(params, batch, cfg)
        loss_ok = abs(loss_tpu - float(ref_loss)) < 1e-3 * max(1.0, abs(float(ref_loss)))
        keys = ["entity", "relation"] + ([extra_key] if extra_key else [])
        errs = [
            float(jnp.max(jnp.abs(out[i] - ref_params[kk])))
            for i, kk in enumerate(keys)
        ]
        tables_ok = all(e < 1e-4 for e in errs)
        ok &= loss_ok and tables_ok
        print(
            f"{name}: compile+run {compile_s:.1f}s, warm {warm_s:.2f}s, "
            f"loss tpu={loss_tpu:.4f} ref={float(ref_loss):.4f} ok={loss_ok}, "
            f"max|d|={[f'{e:.2e}' for e in errs]} ok={tables_ok}",
            flush=True,
        )
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
