"""NaN hygiene (survey §5.2 plan): a training epoch under jax_debug_nans."""

import jax
import numpy as np

from kb2e_tpu.config import EmbeddingConfig
from kb2e_tpu.constants import Distance, Method
from kb2e_tpu.models import get_model
from kb2e_tpu.train import loop as train_loop


def test_epoch_produces_no_nans(tiny_dataset):
    cfg = EmbeddingConfig(
        embedding_size=16, learning_rate=0.05, margin=1.0, method=Method.BERN,
        num_batches=4, max_epochs=3, distance=Distance.L2, seed=21,
    )
    model = get_model("transe")
    with jax.debug_nans(True):
        params = train_loop.train(model, cfg, tiny_dataset.train, verbose=False)
    for k, v in params.items():
        assert np.isfinite(np.asarray(v)).all(), k
