"""Coverage for the two COMPONENTS.md rows that had no direct tests:
tracing/profiling utils (survey §5.1) and the canonical PartitionSpec table
(survey §5.8) — every model's params must place cleanly on a mesh.
"""

import os
import tempfile

import jax
import numpy as np
import pytest

from kb2e_tpu.config import EmbeddingConfig
from kb2e_tpu.parallel import mesh as mesh_lib
from kb2e_tpu.parallel import sharding as shard_lib
from kb2e_tpu.utils import profiling


def test_trace_context_and_capture(tmp_path):
    with profiling.trace_context("unit-test-region"):
        x = jax.numpy.ones((8, 8)).sum()
    assert float(x) == 64.0
    # capture_trace(None) must be a no-op; a real dir must produce a trace.
    with profiling.capture_trace(None):
        pass
    log_dir = str(tmp_path / "trace")
    with profiling.capture_trace(log_dir):
        float(jax.numpy.ones((4,)).sum())
    produced = [
        os.path.join(dp, f) for dp, _, fs in os.walk(log_dir) for f in fs
    ]
    assert produced, "capture_trace wrote nothing"


def test_step_timer_rate():
    t = profiling.StepTimer(window=8)
    assert t.rate(100.0) == 0.0  # <2 ticks
    clock = iter([0.0, 1.0, 2.0])
    t._clock = lambda: next(clock)
    for _ in range(3):
        t.tick()
    assert t.rate(100.0) == pytest.approx(100.0)  # 2 intervals, 2s, 200 units


@pytest.mark.parametrize("name", ["transe", "transh", "transr", "ctransr", "ptranse"])
def test_param_specs_cover_every_model(name):
    """PARAM_SPECS must name every key each model can produce, and the params
    must place on an 8-device mesh with those specs (EP analogue included:
    CTransR's relation_c/centers, survey §2.1)."""
    from kb2e_tpu.models import get_model

    model = get_model(name)
    cfg = EmbeddingConfig(embedding_size=8)
    n_ent, n_rel = 64, 8  # divisible by the 4-wide model axis
    params = model.init_params(jax.random.PRNGKey(0), n_ent, n_rel, cfg)
    if name == "ctransr":
        from kb2e_tpu.models import ctransr as ctransr_lib

        rng = np.random.default_rng(0)
        h = rng.integers(0, n_ent, 200)
        t = rng.integers(0, n_ent, 200)
        r = rng.integers(0, n_rel, 200)
        centers = ctransr_lib.build_centers(
            np.asarray(params["entity"]), h, t, r, n_rel, model.n_clusters, seed=0
        )
        params = model.with_centers(params, centers)
    assert set(params) <= set(shard_lib.PARAM_SPECS), (
        set(params) - set(shard_lib.PARAM_SPECS)
    )
    m = mesh_lib.make_mesh(data=2, model=4)
    placed = shard_lib.place_params(m, params)
    for k, v in placed.items():
        np.testing.assert_array_equal(np.asarray(v), np.asarray(params[k]))


def test_tensorboard_sink_and_fan_out(tmp_path):
    """Optional TensorBoard metrics sink (survey §5.5): scalars land in an
    events file; fan_out composes it with the JSONL sink."""
    from kb2e_tpu.utils import logging as log_lib

    seen = []
    sink = log_lib.TensorBoardSink(str(tmp_path))
    fn = log_lib.fan_out(seen.append, sink, None)
    fn({"epoch": 3, "loss": 1.5, "triples_per_s": 10.0, "note": "text-skipped",
        "resumed": True})  # bools must not be logged as 0/1 scalars
    assert seen and seen[0]["loss"] == 1.5
    sink.close()  # long-lived/embedded use needs the writer thread shut down
    events = [f for f in os.listdir(tmp_path) if "tfevents" in f]
    assert events, os.listdir(tmp_path)
    assert log_lib.fan_out(None, None) is None
    one = seen.append
    assert log_lib.fan_out(one, None) is one
