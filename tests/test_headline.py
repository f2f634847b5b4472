"""Headline-prose drift guard (VERDICT r3 weak item 3).

README.md / PERF.md's headline paragraphs are generated from the latest
``BENCH_r*.json`` by ``benchmarks/update_headline.py``; this test runs its
``--check`` mode so stale prose fails CI instead of lingering until the next
review round.
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_headline_prose_matches_latest_bench_artifact():
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "benchmarks", "update_headline.py"), "--check"],
        capture_output=True,
        text=True,
        timeout=60,
        cwd=ROOT,
    )
    assert proc.returncode == 0, (
        "headline prose drifted from the latest BENCH_r*.json — run "
        f"benchmarks/update_headline.py\n{proc.stdout}{proc.stderr}"
    )
