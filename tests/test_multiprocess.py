"""Real multi-PROCESS integration tests (2 jax.distributed CPU workers).

These convert the multi-host design (kb2e_tpu/parallel/multihost.py,
multiprocess.py) from "designed" to "executed": a 2-process run over a
global 8-device mesh must

* compute the exact global bern statistics from per-host edge shards (the
  worker asserts the merged result equals the whole-list computation),
* train to the same parameters as a single-process run over the same global
  mesh shape (GSPMD numerics are topology-independent),
* survive a host loss: SIGKILL-style death of one process after a
  checkpoint, restart of both with --resume, final params identical to an
  uninterrupted run (survey §5.3's "kill a host and resume").

Workers run the production driver `kb2e_tpu.parallel.multiprocess` as
subprocesses; each gets 4 virtual CPU devices so the global mesh is (4, 2).
"""

import os
import signal
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EPOCHS = 6
CKPT_EVERY = 2
DIE_AFTER = 4
COMMON_ARGS = [
    "--model", "transe", "--size", "16", "--rate", "0.05", "--margin", "1.0",
    "--method", "1", "--batches", "4", "--epochs", str(EPOCHS),
    "--distance", "0", "--seed", "11", "--data-axis", "4", "--model-axis", "2",
]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _worker_env() -> dict:
    env = dict(os.environ)
    env["KB2E_FORCE_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("PYTHONPATH", None)
    return env


def _spawn(pid: int, port: int, extra: list, log_path: str) -> subprocess.Popen:
    cmd = [
        sys.executable, "-m", "kb2e_tpu.parallel.multiprocess",
        "--coordinator", f"localhost:{port}",
        "--num-processes", "2", "--process-id", str(pid),
        *COMMON_ARGS, *extra,
    ]
    log = open(log_path, "w")
    return subprocess.Popen(
        cmd, cwd=REPO, env=_worker_env(), stdout=log, stderr=subprocess.STDOUT
    )


def _run_pair(tmp, tag: str, extra0: list, extra1: list, timeout: int = 420):
    port = _free_port()
    p0 = _spawn(0, port, extra0, os.path.join(tmp, f"{tag}_p0.log"))
    p1 = _spawn(1, port, extra1, os.path.join(tmp, f"{tag}_p1.log"))
    try:
        rc0 = p0.wait(timeout=timeout)
        rc1 = p1.wait(timeout=timeout)
    finally:
        for p in (p0, p1):
            if p.poll() is None:
                p.kill()
                p.wait()
    return rc0, rc1


def _read_log(tmp, tag, pid):
    with open(os.path.join(tmp, f"{tag}_p{pid}.log")) as f:
        return f.read()


@pytest.fixture(scope="module")
def mp_artifacts(tiny_kg_dir, tmp_path_factory):
    """One uninterrupted 2-process run; reused by multiple assertions."""
    tmp = str(tmp_path_factory.mktemp("mp"))
    out = os.path.join(tmp, "uninterrupted.npz")
    eval_out = os.path.join(tmp, "eval_metrics.json")
    ckpt = os.path.join(tmp, "ckpt_a")
    common = ["--datadir", tiny_kg_dir, "--out-npz", out,
              "--eval-out", eval_out,
              "--checkpoint-dir", ckpt, "--checkpoint-every", str(CKPT_EVERY)]
    rc0, rc1 = _run_pair(tmp, "base", common, common)
    logs = _read_log(tmp, "base", 0) + _read_log(tmp, "base", 1)
    assert rc0 == 0 and rc1 == 0, f"worker failed:\n{logs[-4000:]}"
    return {"tmp": tmp, "out": out, "eval_out": eval_out, "kg": tiny_kg_dir}


def test_two_process_train_runs_and_writes(mp_artifacts):
    log0 = _read_log(mp_artifacts["tmp"], "base", 0)
    # Allgathered edge list covers the full train split.
    with open(os.path.join(mp_artifacts["kg"], "train.txt")) as f:
        n_train = sum(1 for _ in f)
    assert f"global {n_train}" in log0
    assert f"Epoch: {EPOCHS - 1}" in log0
    final = np.load(mp_artifacts["out"])
    assert final["entity"].shape == (64, 16)
    assert np.isfinite(final["entity"]).all()


def test_two_process_matches_single_process(mp_artifacts):
    """Same global mesh shape (4, 2), same seed, one process with 8 local
    devices vs two with 4 each — parameters must agree."""
    import jax

    from kb2e_tpu.config import EmbeddingConfig
    from kb2e_tpu.data import triples as triples_lib
    from kb2e_tpu.models import get_model
    from kb2e_tpu.parallel import dist_step, mesh as mesh_lib, sharding as shard_lib
    from kb2e_tpu.train import step as step_lib

    cfg = EmbeddingConfig(
        embedding_size=16, learning_rate=0.05, margin=1.0, method=1,
        num_batches=4, max_epochs=EPOCHS, distance=0, seed=11,
    )
    ds = triples_lib.load_dataset(mp_artifacts["kg"], splits=("train",))
    ts = ds.train
    model = get_model("transe")
    key = jax.random.PRNGKey(11)
    key, init_key = jax.random.split(key)
    params = model.init_params(init_key, ts.n_entities, ts.n_relations, cfg)

    mesh = mesh_lib.make_mesh(4, 2)
    params = shard_lib.place_params(mesh, params)
    data = dist_step.replicate_data(mesh, step_lib.DeviceData.from_triple_set(ts))
    batch_size = step_lib.batch_size_for(ts.num_triples, cfg.num_batches)
    batch_size -= batch_size % 4
    run_epoch = step_lib.make_epoch_runner(model, cfg, batch_size, cfg.num_batches, mesh=mesh)
    for _ in range(EPOCHS):
        key, sk = jax.random.split(key)
        params, loss = run_epoch(params, sk, data)

    final = np.load(mp_artifacts["out"])
    np.testing.assert_allclose(
        np.asarray(params["entity"]), final["entity"], atol=1e-6, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(params["relation"]), final["relation"], atol=1e-6, rtol=1e-6
    )


def test_kill_one_host_and_resume(mp_artifacts, tmp_path):
    """Process 1 dies hard (os._exit) after the epoch-4 checkpoint; process 0
    is killed by the harness (a dead peer stalls its collectives); both
    restart with --resume and must land exactly where the uninterrupted run
    did."""
    tmp = str(tmp_path)
    kg = mp_artifacts["kg"]
    ckpt = os.path.join(tmp, "ckpt_b")
    out = os.path.join(tmp, "resumed.npz")

    # Phase 1: run until the fault. Worker 1 exits(17) after epoch 4's
    # checkpoint; worker 0 then hangs on the next collective -> kill by PID.
    port = _free_port()
    common = ["--datadir", kg, "--checkpoint-dir", ckpt,
              "--checkpoint-every", str(CKPT_EVERY)]
    p0 = _spawn(0, port, common, os.path.join(tmp, "fault_p0.log"))
    p1 = _spawn(
        1, port, common + ["--die-after-epoch", str(DIE_AFTER), "--die-process-id", "1"],
        os.path.join(tmp, "fault_p1.log"),
    )
    rc1 = p1.wait(timeout=420)
    assert rc1 == 17  # fault injection fired
    # Give p0 a moment; it cannot finish with a dead peer — reap or kill.
    try:
        p0.wait(timeout=20)
    except subprocess.TimeoutExpired:
        p0.send_signal(signal.SIGKILL)
        p0.wait()

    ckpts = sorted(os.listdir(ckpt))
    assert any(name == f"ckpt_{DIE_AFTER}" for name in ckpts), ckpts

    # Phase 2: both hosts restart and resume from the surviving checkpoint.
    resume = common + ["--resume", "--out-npz", out]
    rc0, rc1 = _run_pair(tmp, "resume", resume, resume)
    logs = _read_log(tmp, "resume", 0) + _read_log(tmp, "resume", 1)
    assert rc0 == 0 and rc1 == 0, f"resume failed:\n{logs[-4000:]}"
    assert f"resumed from {os.path.join(ckpt, f'ckpt_{DIE_AFTER}')}" in logs

    want = np.load(mp_artifacts["out"])
    got = np.load(out)
    np.testing.assert_array_equal(got["entity"], want["entity"])
    np.testing.assert_array_equal(got["relation"], want["relation"])


def test_two_process_sharded_eval_matches_single_process(mp_artifacts):
    """The sharded one-dispatch scan eval executed across TWO jax.distributed
    processes (entity axis over the global mesh) must reproduce the
    single-process metrics for the same params — the multi-host eval story
    executed, not just designed."""
    import json

    import jax

    from kb2e_tpu.config import EmbeddingConfig
    from kb2e_tpu.data import triples as triples_lib
    from kb2e_tpu.eval import harness
    from kb2e_tpu.models import get_model
    from kb2e_tpu.parallel import mesh as mesh_lib

    with open(mp_artifacts["eval_out"]) as f:
        mp_metrics = json.load(f)

    final = np.load(mp_artifacts["out"])
    params = {k: jax.numpy.asarray(v) for k, v in final.items()}
    cfg = EmbeddingConfig(
        embedding_size=16, learning_rate=0.05, margin=1.0, method=1,
        num_batches=4, max_epochs=EPOCHS, distance=0, seed=11,
    )
    ds = triples_lib.load_dataset(
        mp_artifacts["kg"], splits=("train", "valid", "test")
    )
    model = get_model("transe")
    # Single-process over the same global mesh SHAPE (8 local devices)…
    mesh = mesh_lib.make_mesh(4, 2)
    single = harness.evaluate(model, params, ds, cfg, mesh=mesh)
    # …and fully local.
    local = harness.evaluate(model, params, ds, cfg)
    for k, v in mp_metrics.items():
        assert single[k] == pytest.approx(v, abs=1e-9), k
        assert local[k] == pytest.approx(v, abs=1e-9), k
