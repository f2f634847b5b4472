"""Text IO round-trips and checkpointing."""

import numpy as np
import pytest

from kb2e_tpu.constants import Method
from kb2e_tpu.io import text as text_io


def test_text_roundtrip_2d(tmp_path):
    rng = np.random.default_rng(0)
    ent = rng.normal(size=(10, 4))
    rel = rng.normal(size=(3, 4))
    text_io.write_embeddings(str(tmp_path), Method.BERN, ent, rel, model_name="transe")
    back = text_io.read_embeddings(str(tmp_path), Method.BERN, 10, 3, 4)
    # %.6f costs precision; round-trip to 1e-6.
    np.testing.assert_allclose(back["entity"], ent, atol=1e-6)
    np.testing.assert_allclose(back["relation"], rel, atol=1e-6)


def test_text_roundtrip_transr_weights_and_extras(tmp_path):
    rng = np.random.default_rng(1)
    ent = rng.normal(size=(6, 4))
    rel = rng.normal(size=(2, 4))
    W = rng.normal(size=(2, 4, 4))
    extras = {"relation_clusters": rng.normal(size=(2, 3, 4)),
              "cluster_centers": rng.normal(size=(2, 3, 4))}
    text_io.write_embeddings(str(tmp_path), Method.UNIF, ent, rel, weights=W,
                             model_name="ctransr", extras=extras)
    back = text_io.read_embeddings(str(tmp_path), Method.UNIF, 6, 2, 4,
                                   weights_shape=(2, 4, 4))
    np.testing.assert_allclose(back["weights"], W, atol=1e-6)
    np.testing.assert_allclose(back["relation_clusters"], extras["relation_clusters"], atol=1e-6)
    # The weights file layout matches the reference: R*k lines of k values
    # (transr/trainer.cpp:128-142).
    lines = (tmp_path / "weights.unif").read_text().strip().split("\n")
    assert len(lines) == 2 * 4
    assert len(lines[0].split()) == 4


def test_size_mismatch_detected_via_sidecar(tmp_path):
    ent = np.zeros((4, 8))
    rel = np.zeros((2, 8))
    text_io.write_embeddings(str(tmp_path), Method.BERN, ent, rel)
    with pytest.raises(ValueError, match="size"):
        text_io.read_embeddings(str(tmp_path), Method.BERN, 4, 2, 16)


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from kb2e_tpu.io import checkpoint as ckpt

    params = {"entity": jnp.arange(12.0).reshape(3, 4), "relation": jnp.ones((2, 4))}
    path = str(tmp_path / "ckpt_5")
    ckpt.save(path, params, step=5)
    back, step = ckpt.restore(path)
    assert step == 5
    np.testing.assert_array_equal(np.asarray(back["entity"]), np.asarray(params["entity"]))
    assert ckpt.latest_in(str(tmp_path)) == path
