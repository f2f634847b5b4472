"""Exact, vectorized known-triple membership tests on device.

The reference keeps known triples in a ``std::map<pair<int,int>, map<int,int>>``
(``common/trainer.h:43-49``) and probes it per corruption candidate inside the
sampling loop (``common/trainer.cpp:88-98``).  On TPU, pointer-chasing maps
don't exist; instead the triple set is stored as three int32 arrays sorted
lexicographically by (h, r, t) (built host-side in
:class:`kb2e_tpu.data.triples.TripleSet`), and membership is an unrolled
branch-free binary search vectorized over a batch of queries.

All-int32 design note: a packed ``(h*R + r)*N + t`` key would need int64
(disabled by default in JAX and slow on TPU); searching the three parallel
arrays with lexicographic comparison keeps everything int32 at a cost of one
extra gather per probe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _lex_less(ah, ar, at, bh, br, bt):
    """(ah,ar,at) < (bh,br,bt) lexicographically, elementwise."""
    return (ah < bh) | ((ah == bh) & ((ar < br) | ((ar == br) & (at < bt))))


def contains(
    sorted_h: jax.Array,
    sorted_r: jax.Array,
    sorted_t: jax.Array,
    qh: jax.Array,
    qr: jax.Array,
    qt: jax.Array,
) -> jax.Array:
    """Vectorized membership: is each query triple in the sorted index?

    Args:
      sorted_h/r/t: int32 [U] triple index, lexicographically sorted, unique.
      qh/qr/qt: int32 query arrays of any (matching) shape.

    Returns:
      bool array of the query shape.
    """
    n = sorted_h.shape[0]
    if n == 0:
        return jnp.zeros(qh.shape, dtype=bool)

    n_iters = max(1, (n + 1).bit_length())

    lo = jnp.zeros(qh.shape, dtype=jnp.int32)
    hi = jnp.full(qh.shape, n, dtype=jnp.int32)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) >> 1
        mh = sorted_h[mid]
        mr = sorted_r[mid]
        mt = sorted_t[mid]
        less = _lex_less(mh, mr, mt, qh, qr, qt)
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, n_iters, body, (lo, hi))
    idx = jnp.minimum(lo, n - 1)
    return (sorted_h[idx] == qh) & (sorted_r[idx] == qr) & (sorted_t[idx] == qt)
