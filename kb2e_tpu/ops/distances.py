"""Distance / energy primitives shared by all Trans* models.

The whole model family scores a triple as a distance in some (possibly
projected) embedding space:

  E = Σ_i |t'_i − h'_i − r_i|     (L1, transe/transe.cpp:18-20)
  E = Σ_i (t'_i − h'_i − r_i)²    (L2 — sum of squares, NO sqrt,
                                   transe/transe.cpp:21-24)

Evaluation reduces to "distance from every entity row to a query point"
(survey §5.7): for corrupt-tail the query is q = h' + r, for corrupt-head
q = t' − r, and in both cases E_j = dist(e'_j, q) because L1/L2 are symmetric
under negation.  That makes one pairwise-distance sweep the single hot
primitive of the evaluation path for TransE, TransH, and TransR alike.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from kb2e_tpu.constants import Distance


def residual_energy(res: jax.Array, distance: Distance) -> jax.Array:
    """Energy of residual vectors res = t' − h' − r over the last axis."""
    if distance == Distance.L1:
        return jnp.sum(jnp.abs(res), axis=-1)
    return jnp.sum(jnp.square(res), axis=-1)


def pairwise_energy(
    entities: jax.Array,  # [N, k] (projected) entity rows
    queries: jax.Array,  # [B, k] query points
    distance: Distance,
) -> jax.Array:
    """[B, N] energies dist(e_j, q_b).

    L2 uses the matmul expansion ‖e‖² + ‖q‖² − 2 e·q so the FLOPs land on the
    MXU; L1 is not factorisable and uses a broadcast |e − q| reduce, which XLA
    fuses into a single pass over the [B, N, k] iteration space.
    """
    if distance == Distance.L2:
        e_sq = jnp.sum(jnp.square(entities), axis=-1)  # [N]
        q_sq = jnp.sum(jnp.square(queries), axis=-1)  # [B]
        cross = queries @ entities.T  # [B, N] on the MXU
        # Clamp tiny negative values from cancellation; energies are >= 0.
        return jnp.maximum(q_sq[:, None] + e_sq[None, :] - 2.0 * cross, 0.0)
    return jnp.sum(jnp.abs(entities[None, :, :] - queries[:, None, :]), axis=-1)
