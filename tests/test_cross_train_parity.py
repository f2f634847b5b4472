"""Cross-implementation TRAINING parity (statistical).

Round-1 interop was eval-side only (our files scored by the reference
binaries).  This closes the train-side gap: the same planted KG is trained by
the compiled reference ``trainTransE``/``trainTransH``
(common/trainer.cpp:69-107) and by kb2e_tpu's fast vectorised mode at the
same config, then BOTH embedding sets are scored by ONE evaluator (ours).
RNG streams aren't portable (survey §4), so the assertion is statistical:
seed-averaged filtered MeanRank / Hits@10 must agree within pre-registered
tolerances derived from the observed seed-to-seed spread (~1.0 MR / ~0.04
Hits on this KG; tolerances are 3x that).

Measured when the tolerances were registered (64-entity KG, k=16, 100
epochs, seeds 7-9): filtered MR ref 12.3-13.3 vs ours 12.3-13.2; filtered
Hits@10 ref 0.556-0.594 vs ours 0.524-0.608.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

REF_SRC = "/root/reference"
REF_BUILD = "/tmp/refbuild"

SEEDS = (7, 8)
EPOCHS = 100
K = 16
MR_TOL = 3.0
HITS_TOL = 0.12

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ref_bins():
    """Compiled reference binaries (built once into /tmp/refbuild)."""
    if not os.path.isdir(REF_SRC):
        pytest.skip("reference sources not available")
    if not os.path.exists(os.path.join(REF_BUILD, "bin", "trainTransE")):
        if not os.path.isdir(REF_BUILD):
            shutil.copytree(REF_SRC, REF_BUILD)
        r = subprocess.run(["make", "-C", REF_BUILD, "-j2"], capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"reference build failed: {r.stderr[-500:]}")
    return os.path.join(REF_BUILD, "bin")


def _cfg(seed=None):
    from kb2e_tpu.config import EmbeddingConfig

    return EmbeddingConfig(
        embedding_size=K, learning_rate=0.02, margin=1.0, method=1,
        num_batches=8, max_epochs=EPOCHS, distance=0, seed=seed,
    )


def _eval(model_name, params, dataset):
    import jax.numpy as jnp

    from kb2e_tpu.eval import harness
    from kb2e_tpu.models import get_model

    params = {k: jnp.asarray(v) for k, v in params.items()}
    m = harness.evaluate(get_model(model_name), params, dataset, _cfg())
    return m["filtered_mean_rank"], m["filtered_hits10"]


def _train_reference(ref_bins, binary, kg_dir, out_dir, seed):
    os.makedirs(out_dir, exist_ok=True)
    r = subprocess.run(
        [os.path.join(ref_bins, binary), "--datadir", kg_dir, "--outdir", out_dir,
         "--size", str(K), "--rate", "0.02", "--margin", "1.0", "--method", "1",
         "--batches", "8", "--epochs", str(EPOCHS), "--seed", str(seed)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-1000:]


def _load_reference(model_name, out_dir, n_ent, n_rel):
    from kb2e_tpu.io import text as text_io

    weights_shape = (n_rel, K) if model_name == "transh" else None
    emb = text_io.read_embeddings(out_dir, 1, n_ent, n_rel, K, weights_shape=weights_shape)
    params = {"entity": emb["entity"], "relation": emb["relation"]}
    if model_name == "transh":
        params["norm"] = emb["weights"]
    return params


@pytest.mark.parametrize("model_name,binary", [("transe", "trainTransE"), ("transh", "trainTransH")])
def test_fast_mode_converges_like_reference(model_name, binary, ref_bins, tiny_kg_dir, tmp_path):
    from kb2e_tpu.data import triples as triples_lib
    from kb2e_tpu.models import get_model
    from kb2e_tpu.train import loop

    ds = triples_lib.load_dataset(tiny_kg_dir, splits=("train", "valid", "test"))
    model = get_model(model_name)

    ref_metrics, our_metrics = [], []
    for seed in SEEDS:
        out = str(tmp_path / f"ref_{model_name}_{seed}")
        _train_reference(ref_bins, binary, tiny_kg_dir, out, seed)
        params = _load_reference(model_name, out, ds.n_entities, ds.n_relations)
        ref_metrics.append(_eval(model_name, params, ds))

        params = loop.train(model, _cfg(seed), ds.train, verbose=False)
        our_metrics.append(_eval(model_name, params, ds))

    ref_mr, ref_hits = np.mean([m[0] for m in ref_metrics]), np.mean([m[1] for m in ref_metrics])
    our_mr, our_hits = np.mean([m[0] for m in our_metrics]), np.mean([m[1] for m in our_metrics])
    assert abs(our_mr - ref_mr) <= MR_TOL, (ref_metrics, our_metrics)
    assert abs(our_hits - ref_hits) <= HITS_TOL, (ref_metrics, our_metrics)
    # Both must actually have learned (chance filtered Hits@10 = 10/64).
    assert ref_hits > 0.3 and our_hits > 0.3
