"""PRNG helpers and reference-matching initialisation distributions.

The reference initialises every embedding coordinate with a rejection-sampled
truncated normal ``randn(miu, sigma, min, max)`` (``common/utils.cpp:26-38``)
driven by the C ``rand()`` chain.  Bitwise-reproducing that RNG is not portable
(survey §7: parity is defined on injected sample streams, not the RNG), so we
use JAX's counter-based PRNG with the *same distributions*:

* TransE init: randn(0, 1/k, -6/sqrt(k), 6/sqrt(k))  (transe/trainer.cpp:21-23)
* TransH/TransR init: randn(0, 1/k, -1, 1)           (transh/trainer.cpp:61-63,
                                                      transr/trainer.cpp:67-69)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def truncated_normal(
    key: jax.Array,
    shape,
    sigma: float,
    low: float,
    high: float,
    dtype=jnp.float32,
) -> jax.Array:
    """Normal(0, sigma) truncated to [low, high] (bounds in data units)."""
    lower = low / sigma
    upper = high / sigma
    std = jax.random.truncated_normal(key, lower, upper, shape, dtype=jnp.float32)
    return (std * sigma).astype(dtype)


def transe_init(key: jax.Array, shape, embedding_size: int, dtype=jnp.float32) -> jax.Array:
    """Reference TransE init distribution (transe/trainer.cpp:21-23)."""
    k = embedding_size
    return truncated_normal(key, shape, sigma=1.0 / k, low=-6.0 / k**0.5, high=6.0 / k**0.5, dtype=dtype)


def unit_bounded_init(key: jax.Array, shape, embedding_size: int, dtype=jnp.float32) -> jax.Array:
    """Reference TransH/TransR init distribution (randn(0, 1/k, -1, 1))."""
    k = embedding_size
    return truncated_normal(key, shape, sigma=1.0 / k, low=-1.0, high=1.0, dtype=dtype)
