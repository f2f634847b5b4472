"""Row scatter-add variants for embedding-table updates.

The fast update path accumulates per-sample row deltas into the tables
(``common/trainer.cpp:130-149`` vectorised).  ``jnp.ndarray.at[idx].add``
with possibly-duplicate indices forces XLA's TPU scatter into its
collision-safe (serialising) lowering; ``scatter_add_dedup`` pre-combines
duplicate rows with a sort + segmented cumulative sum so the final scatter
can be emitted with ``unique_indices=True`` (parallel writes).  Both compute
the same sums (modulo float addition order).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scatter_add_direct(table: jax.Array, idx: jax.Array, delta: jax.Array) -> jax.Array:
    """Plain duplicate-tolerant scatter-add."""
    return table.at[idx].add(delta)


def scatter_add_dedup(table: jax.Array, idx: jax.Array, delta: jax.Array) -> jax.Array:
    """Scatter-add after combining duplicate indices.

    idx [M] int32 row ids (may repeat), delta [M, ...] (any trailing shape,
    e.g. [M, k] rows or [M, k, k] TransR projection blocks).  Sorts rows by
    id, computes per-segment sums via cumsum differences at segment ends, and
    scatters one row per unique id with ``unique_indices=True``.  Non-end
    rows scatter to a dropped out-of-range slot, keeping shapes static.
    """
    m = idx.shape[0]
    trailing = delta.shape[1:]
    delta = delta.reshape(m, -1)
    table_flat = table.reshape(table.shape[0], -1)
    order = jnp.argsort(idx)
    sidx = idx[order]
    sdelta = delta[order]
    csum = jnp.cumsum(sdelta, axis=0)
    # Row i is the END of its segment iff the next id differs.
    is_end = jnp.concatenate([sidx[1:] != sidx[:-1], jnp.ones((1,), bool)])
    # Segment sum at an end row = csum[i] − csum[previous end]; express via
    # zeroing: sum_i = csum[i] − (csum before segment start).  The previous
    # end's csum is csum shifted to the LAST end position before i — easier:
    # subtract csum at the previous end using a gathered prefix.
    end_positions = jnp.where(is_end, jnp.arange(m), -1)
    prev_end = jax.lax.associative_scan(jnp.maximum, jnp.concatenate([jnp.full((1,), -1), end_positions[:-1]]))
    prev_csum = jnp.where(
        (prev_end >= 0)[:, None], csum[jnp.maximum(prev_end, 0)], 0.0
    )
    seg_sum = csum - prev_csum
    # Scatter only end rows; each non-end row gets its own distinct
    # out-of-range slot so the unique_indices promise holds (mode="drop"
    # discards them).
    target = jnp.where(
        is_end, sidx, table.shape[0] + jnp.arange(m, dtype=sidx.dtype)
    )
    out = table_flat.at[target].add(
        jnp.where(is_end[:, None], seg_sum, 0.0), mode="drop", unique_indices=True
    )
    return out.reshape(table.shape[0], *trailing)


def scatter_add(
    table: jax.Array, idx: jax.Array, delta: jax.Array, mode: str = "direct"
) -> jax.Array:
    if mode == "dedup":
        return scatter_add_dedup(table, idx, delta)
    return scatter_add_direct(table, idx, delta)
