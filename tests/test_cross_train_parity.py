"""Cross-implementation TRAINING parity (statistical).

Round-1 interop was eval-side only (our files scored by the reference
binaries).  This closes the train-side gap: the same planted KG is trained by
the compiled reference ``trainTransE``/``trainTransH``
(common/trainer.cpp:69-107) and by kb2e_tpu's fast vectorised mode at the
same config, then BOTH embedding sets are scored by ONE evaluator (ours).
RNG streams aren't portable (survey §4), so the assertion is statistical over
3 seeds, and primarily ONE-SIDED — our quality must not be *worse* than the
reference minus tolerance (the direction a training regression shows up in);
a looser two-sided band guards against divergence in either direction.

Tolerances re-registered for 3 seeds (r03; 64-entity KG, k=16, 100 epochs,
seeds 7-9): filtered MR ref 12.3-13.3 vs ours 12.3-13.2; filtered Hits@10
ref 0.556-0.594 vs ours 0.524-0.608; seed-to-seed spread ~1.0 MR /
~0.04 Hits — tolerances are 3× that.

``test_bern_matters_like_reference`` extends the protocol to the regime where
bern sampling actually has signal: a TransH bern config on the
FB15k-statistics-matched skewed KG (QUALITY.md "bern vs unif"), checking our
bern-trained TransH is statistically as good as the reference's.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

REF_SRC = "/root/reference"
REF_BUILD = "/tmp/refbuild"

SEEDS = (7, 8, 9)
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


@pytest.fixture(scope="module")
def skewed_kg_dir(tmp_path_factory):
    """A small FB15k-statistics-matched KG (Zipf degrees, 1-N/N-1 mix)."""
    from kb2e_tpu.data import synthetic

    d = tmp_path_factory.mktemp("skewed_kg")
    triples = synthetic.skewed_kg(300, 12, 4000, seed=5)
    synthetic.write_kg_dir(str(d), triples, 300, 12, seed=5)
    return str(d)


def _cfg(seed=None, epochs=EPOCHS):
    from kb2e_tpu.config import EmbeddingConfig

    return EmbeddingConfig(
        embedding_size=K, learning_rate=0.02, margin=1.0, method=1,
        num_batches=8, max_epochs=epochs, distance=0, seed=seed,
    )


def _eval(model_name, params, dataset):
    import jax.numpy as jnp

    from kb2e_tpu.eval import harness
    from kb2e_tpu.models import get_model

    params = {k: jnp.asarray(v) for k, v in params.items()}
    m = harness.evaluate(get_model(model_name), params, dataset, _cfg())
    return m["filtered_mean_rank"], m["filtered_hits10"]


def _train_reference(ref_bins, binary, kg_dir, out_dir, seed, epochs=EPOCHS):
    os.makedirs(out_dir, exist_ok=True)
    r = subprocess.run(
        [os.path.join(ref_bins, binary), "--datadir", kg_dir, "--outdir", out_dir,
         "--size", str(K), "--rate", "0.02", "--margin", "1.0", "--method", "1",
         "--batches", "8", "--epochs", str(epochs), "--seed", str(seed)],
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


def _seed_averaged_metrics(model_name, binary, ref_bins, kg_dir, tmp_path, epochs=EPOCHS):
    from kb2e_tpu.data import triples as triples_lib
    from kb2e_tpu.models import get_model
    from kb2e_tpu.train import loop

    ds = triples_lib.load_dataset(kg_dir, splits=("train", "valid", "test"))
    model = get_model(model_name)

    ref_metrics, our_metrics = [], []
    for seed in SEEDS:
        out = str(tmp_path / f"ref_{model_name}_{seed}")
        _train_reference(ref_bins, binary, kg_dir, out, seed, epochs=epochs)
        params = _load_reference(model_name, out, ds.n_entities, ds.n_relations)
        ref_metrics.append(_eval(model_name, params, ds))

        params = loop.train(model, _cfg(seed, epochs=epochs), ds.train, verbose=False)
        our_metrics.append(_eval(model_name, params, ds))

    ref_mr = float(np.mean([m[0] for m in ref_metrics]))
    ref_hits = float(np.mean([m[1] for m in ref_metrics]))
    our_mr = float(np.mean([m[0] for m in our_metrics]))
    our_hits = float(np.mean([m[1] for m in our_metrics]))
    return ref_mr, ref_hits, our_mr, our_hits, (ref_metrics, our_metrics)


def _assert_parity(ref_mr, ref_hits, our_mr, our_hits, detail, chance_hits):
    # One-sided guard — the direction that matters: a training regression
    # makes our MR higher / Hits lower than the reference's.
    assert our_mr <= ref_mr + MR_TOL, detail
    assert our_hits >= ref_hits - HITS_TOL, detail
    # Loose two-sided band: being suspiciously *better* by a wide margin is
    # divergence too (different objective, eval bug), just with more slack.
    assert abs(our_mr - ref_mr) <= 2 * MR_TOL, detail
    assert abs(our_hits - ref_hits) <= 2 * HITS_TOL, detail
    # Both must actually have learned.
    assert ref_hits > 3 * chance_hits and our_hits > 3 * chance_hits, detail


@pytest.mark.parametrize("model_name,binary", [("transe", "trainTransE"), ("transh", "trainTransH")])
def test_fast_mode_converges_like_reference(model_name, binary, ref_bins, tiny_kg_dir, tmp_path):
    ref_mr, ref_hits, our_mr, our_hits, detail = _seed_averaged_metrics(
        model_name, binary, ref_bins, tiny_kg_dir, tmp_path
    )
    _assert_parity(ref_mr, ref_hits, our_mr, our_hits, detail, chance_hits=10 / 64)


def test_bern_matters_like_reference(ref_bins, skewed_kg_dir, tmp_path):
    """TransH·bern on the skewed KG — where bern has signal (QUALITY.md)."""
    ref_mr, ref_hits, our_mr, our_hits, detail = _seed_averaged_metrics(
        "transh", "trainTransH", ref_bins, skewed_kg_dir, tmp_path, epochs=60
    )
    _assert_parity(ref_mr, ref_hits, our_mr, our_hits, detail, chance_hits=10 / 300)
