"""Shim: the per-model benchmark of record lives in benchmarks/bench_models.py.

Two divergent copies existed in round 2 with conflicting hard-coded baselines
(ADVICE r2); this shim keeps the old invocation path working while leaving a
single source of truth — ``benchmarks/bench_models.py``, whose baselines are
the idle-host measurements in ``benchmarks/reference_baselines.json``.
"""

from benchmarks.bench_models import main

if __name__ == "__main__":
    main()
