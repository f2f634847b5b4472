"""TransR fast-path chunk-size sweep (tuning guidance, not a default change).

The chunk-sequential pipeline applies updates in chunks of
``TransR.chunk_size`` samples (default 1024): larger chunks mean fewer
serial chunk steps and bigger gather/scatter transactions, but a COARSER
update granularity — within a chunk all reads see the chunk-start snapshot,
so raising it moves fast mode further from the reference's per-sample SGD.
The default stays 1024 (the granularity all quality artifacts were
validated at); this sweep records what throughput the knob buys.

Usage: python benchmarks/transr_chunk_sweep.py [--chunks 1024,2048,4096]
"""

from __future__ import annotations

import argparse
import json
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", default="1024,2048,4096")
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()

    # Load benchmarks/bench_models.py explicitly — the repo root also has a
    # 12-line `bench_models.py` shim that would win the import race.
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_models_impl",
        _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "bench_models.py"),
    )
    bench_models = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench_models)

    from kb2e_tpu.models import get_model

    model = get_model("transr")
    baselines = {k: v for k, v in bench_models.REFERENCE_TRIPLES_PER_S.items() if v}
    for chunk in (int(c) for c in args.chunks.split(",")):
        model.chunk_size = chunk
        rec = bench_models.bench_model("transr", args.epochs, 1.0, baselines)
        rec["chunk_size"] = chunk
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
