"""Constraint-projection operators.

These reproduce the reference's normalisation zoo (survey quirk B7):

* :func:`ball_norm`  — ``norm(a, ignoreShort=true)`` (common/utils.cpp:70-77):
  project onto the unit *ball* — divide by the length only when length > 1.
* :func:`sphere_norm` — ``norm(a, false)``: project onto the unit *sphere* —
  always divide by the length.
* :func:`orthogonality_project` — ``norm(a, b, rate)``
  (common/utils.cpp:79-111): TransH's coupled gradient loop driving a·b̂ below
  0.1.  The reference iterates unboundedly and carries a quirky
  non-reset ``sum`` accumulator across iterations; we replicate the exact
  per-iteration arithmetic under a bounded ``lax.while_loop``.
* :func:`transr_ball_project` — ``transRNorm`` (transr/trainer.cpp:34-64):
  drive ``‖a·W‖² ≤ 1`` by coupled updates of the vector and the matrix.

All operators are pure functions over float32 arrays; batched variants are
derived with ``jax.vmap`` at the call site.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def row_norms(x: jax.Array, axis: int = -1, keepdims: bool = True) -> jax.Array:
    # Accumulate in float32 even for low-precision tables (bf16 squares lose
    # half the mantissa); a float32 input passes through unchanged.
    x32 = x.astype(jnp.float32)
    return jnp.sqrt(jnp.sum(jnp.square(x32), axis=axis, keepdims=keepdims))


def ball_norm(x: jax.Array) -> jax.Array:
    """Unit-ball projection per row: divide by ‖x‖ only if ‖x‖ > 1.

    Reference ``norm(a)`` default path, common/utils.cpp:70-77.  Idempotent.
    """
    n = row_norms(x)
    return jnp.where(n > 1.0, (x.astype(jnp.float32) / n).astype(x.dtype), x)


def sphere_norm(x: jax.Array) -> jax.Array:
    """Unit-sphere projection per row: always divide by ‖x‖.

    Reference ``norm(a, false)``.  Rows of length zero would produce inf in
    the reference too; initialisation makes them measure-zero.
    """
    return (x.astype(jnp.float32) / row_norms(x)).astype(x.dtype)


def orthogonality_project(
    a: jax.Array,
    b: jax.Array,
    rate: float,
    max_iters: int = 16,
) -> Tuple[jax.Array, jax.Array]:
    """TransH orthogonality projector, parity with common/utils.cpp:79-111.

    Single (a, b) pair of shape [k].  Sequence per reference:
      1. b <- b / ‖b‖ (sphere).
      2. Loop while b̂·a > 0.1 (bounded by ``max_iters`` here):
         the running ``sum`` accumulator is NOT reset between iterations
         (faithful to the reference's ``double sum = 0`` outside the loop);
         b /= sqrt(sum + ‖b‖²); then coupled steps a -= rate*b;
         b -= rate*a (using the updated a).
      3. b <- b / ‖b‖.
    """
    b = sphere_norm(b)

    def cond(carry):
        i, a, b, s = carry
        # The reference evaluates the dot AFTER the in-loop renormalise; we
        # mirror its control flow: loop body computes the renormalise + test.
        return i < max_iters

    def body(carry):
        i, a, b, s = carry
        s_new = s + jnp.sum(jnp.square(b))
        s_sqrt = jnp.sqrt(s_new)
        b_scaled = b / s_sqrt
        x = jnp.dot(b_scaled, a)

        def do_update(args):
            a, b = args
            a2 = a - rate * b
            b2 = b - rate * a2
            return a2, b2

        a_next, b_next = jax.lax.cond(x > 0.1, do_update, lambda args: args, (a, b_scaled))
        # If converged (x <= 0.1), freeze by jumping i to max_iters.
        i_next = jnp.where(x > 0.1, i + 1, max_iters)
        return i_next, a_next, b_next, s_sqrt

    _, a, b, _ = jax.lax.while_loop(cond, body, (0, a, b, jnp.float32(0.0)))
    return a, sphere_norm(b)


# NOTE: an a-only closed-form ‖a·W‖ ≤ 1 scaling helper (transr_ball_scale)
# used to live here.  It was tried as the fast-path projector and REJECTED:
# with W untouched, the next sphere-norm undoes the shrink and quality
# collapses (caught by tests/test_transr_parity_bridge.py).  The production
# fast path uses ONE masked iteration of the reference's coupled descent,
# inlined in models/transr.py::batch_update; the parity path uses
# :func:`transr_ball_project` below.


def transr_ball_project(
    a: jax.Array,
    w: jax.Array,
    rate: float,
    max_iters: int = 16,
    exact_sequential: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """TransR's ‖a·W‖ ≤ 1 projector, parity with transr/trainer.cpp:34-64.

    a: [k] entity/relation row; w: [k, k] projection matrix laid out [j, i]
    (input-dim j, output-dim i) so the projection is ``a @ w``.

    The reference's inner update iterates output dims i sequentially, each i
    reading the ``a`` mutated by previous i's.  ``exact_sequential=True``
    replicates that (parity mode); the default vectorises the i loop (one
    batched rank-1 update), which converges to the same constraint set and is
    MXU-friendly.
    """

    def cond(carry):
        it, a, w = carry
        proj = jnp.matmul(a, w, precision=jax.lax.Precision.HIGHEST)
        return (jnp.sum(jnp.square(proj)) > 1.0) & (it < max_iters)

    def body_vec(carry):
        it, a, w = carry
        tmp = 2.0 * jnp.matmul(a, w, precision=jax.lax.Precision.HIGHEST)  # [k] over output dims i
        w_new = w - rate * jnp.outer(a, tmp)  # b[j][i] -= rate*tmp[i]*a[j]
        a_new = a - rate * jnp.matmul(w_new, tmp, precision=jax.lax.Precision.HIGHEST)  # a[j] -= rate*tmp[i]*b[j][i], summed over i
        return it + 1, a_new, w_new

    def body_seq(carry):
        it, a, w = carry

        def per_i(i, aw):
            a, w = aw
            tmp = 2.0 * jnp.dot(w[:, i], a)
            w_col = w[:, i] - rate * tmp * a
            w = w.at[:, i].set(w_col)
            a = a - rate * tmp * w_col
            return a, w

        a, w = jax.lax.fori_loop(0, a.shape[0], per_i, (a, w))
        return it + 1, a, w

    body = body_seq if exact_sequential else body_vec
    _, a, w = jax.lax.while_loop(cond, body, (0, a, w))
    return a, w
