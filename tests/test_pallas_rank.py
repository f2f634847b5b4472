"""Pallas rank-count kernel vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kb2e_tpu.constants import Distance
from kb2e_tpu.eval import ranking


@pytest.mark.parametrize("distance", [Distance.L1, Distance.L2])
def test_pallas_rank_matches_xla(distance):
    rng = np.random.default_rng(9)
    n_ent, k, b = 200, 12, 24
    ent = (np.round(rng.normal(size=(n_ent, k)) * 8) / 8).astype(np.float32)
    queries = (np.round(rng.normal(size=(b, k)) * 8) / 8).astype(np.float32)
    true_idx = rng.integers(0, n_ent, b).astype(np.int32)
    cands = np.full((b, 8), -1, np.int32)
    cands[:, 0] = rng.integers(0, n_ent, b)
    cands[:, 1] = true_idx  # true id in the filter list must be ignored

    block = 128
    proj = ranking.pad_entities(jnp.asarray(ent), block)

    raw_x, filt_x = ranking.rank_queries(
        proj, jnp.asarray(queries), jnp.asarray(true_idx), jnp.asarray(cands),
        distance, block,
    )
    raw_p, filt_p = ranking.rank_queries_pallas(
        proj, jnp.asarray(queries), jnp.asarray(true_idx), jnp.asarray(cands),
        distance, block, interpret=jax.default_backend() != "tpu",
    )
    np.testing.assert_array_equal(np.asarray(raw_x), np.asarray(raw_p))
    np.testing.assert_array_equal(np.asarray(filt_x), np.asarray(filt_p))
