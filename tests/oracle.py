"""NumPy oracle of the reference trainer's exact batch semantics.

An independent host-side reimplementation of ``Trainer::bfgs``'s inner loop
(common/trainer.cpp:75-103) and each model's ``gradientUpdate`` +
constraints, driven by *injected sample streams* (survey §4: parity is
defined on streams, not on reproducing C rand()).  Used to validate the JAX
``sequential_update`` ('parity' mode) paths allclose, and transitively to
anchor the vectorised fast mode's semantics.

Double-buffering contract (transe/trainer.cpp:48-56): energies and gradients
read the batch-start snapshot; updates accumulate into 'next' tables with
per-update normalisation of touched rows; the batch ends with a swap.
"""

from __future__ import annotations

import numpy as np

F = np.float32


def ball_norm(v):
    n = np.linalg.norm(v)
    return v / n if n > 1.0 else v


def sphere_norm(v):
    return v / np.linalg.norm(v)


def orthogonality_project(a, b, rate, max_iters=16):
    """common/utils.cpp:79-111 with the non-reset ``sum`` accumulator and a
    bounded iteration count (matches kb2e_tpu.ops.projections)."""
    a = a.copy()
    b = sphere_norm(b.copy())
    s = F(0.0)
    for _ in range(max_iters):
        s = np.sqrt(s + np.sum(np.square(b), dtype=F), dtype=F)
        b = b / s
        x = np.dot(b, a)
        if x > 0.1:
            a = a - F(rate) * b
            b = b - F(rate) * a  # updated a, per the reference
        else:
            break
    return a, sphere_norm(b)


def transr_ball_project(a, w, rate, max_iters=16):
    """transr/trainer.cpp:34-64, exact sequential output-dim loop."""
    a = a.copy()
    w = w.copy()
    k = a.shape[0]
    for _ in range(max_iters):
        proj = a @ w
        if np.sum(np.square(proj), dtype=F) <= 1.0:
            break
        for i in range(k):
            tmp = F(2.0) * np.dot(w[:, i], a)
            w[:, i] = w[:, i] - F(rate) * tmp * a
            a = a - F(rate) * tmp * w[:, i]
    return a, w


def _l1_grad(res):
    return np.where(F(2.0) * res > 0, F(1.0), F(-1.0))


class TransEOracle:
    """transe/trainer.cpp:25-62 semantics."""

    def __init__(self, ent, rel, lr, margin, l1=True):
        self.ent = np.array(ent, dtype=F)
        self.rel = np.array(rel, dtype=F)
        self.lr = F(lr)
        self.margin = F(margin)
        self.l1 = l1

    def energy(self, ent, rel, h, t, r):
        d = ent[t] - ent[h] - rel[r]
        return np.sum(np.abs(d), dtype=F) if self.l1 else np.sum(d * d, dtype=F)

    def _grad(self, h, t, r):
        res = self.snap_e[t] - self.snap_e[h] - self.snap_r[r]
        return _l1_grad(res) if self.l1 else F(2.0) * res

    def _update(self, h, t, r, corrupted):
        mod = F(1.0) if corrupted else F(-1.0)
        x = self._grad(h, t, r)
        self.rel[r] -= mod * self.lr * x
        self.ent[h] -= mod * self.lr * x
        self.ent[t] += mod * self.lr * x
        self.rel[r] = ball_norm(self.rel[r])
        self.ent[h] = ball_norm(self.ent[h])
        self.ent[t] = ball_norm(self.ent[t])

    def run_batch(self, samples):
        """samples: iterable of (ph, pt, r, nh, nt). Returns batch loss."""
        self.snap_e = self.ent.copy()
        self.snap_r = self.rel.copy()
        loss = F(0.0)
        for ph, pt, r, nh, nt in samples:
            e_pos = self.energy(self.snap_e, self.snap_r, ph, pt, r)
            e_neg = self.energy(self.snap_e, self.snap_r, nh, nt, r)
            if e_pos + self.margin > e_neg:
                loss += self.margin + e_pos - e_neg
                self._update(ph, pt, r, corrupted=False)
                self._update(nh, nt, r, corrupted=True)
        return loss


class TransHOracle:
    """transh/trainer.cpp:11-58 semantics (L1 only, quirk B5)."""

    def __init__(self, ent, rel, w, lr, margin, max_iters=16):
        self.ent = np.array(ent, dtype=F)
        self.rel = np.array(rel, dtype=F)
        self.w = np.array(w, dtype=F)
        self.lr = F(lr)
        self.margin = F(margin)
        self.max_iters = max_iters

    def energy(self, ent, rel, w, h, t, r):
        wr = w[r]
        hs = np.dot(wr, ent[h])
        ts = np.dot(wr, ent[t])
        d = (ent[t] - ts * wr) - (ent[h] - hs * wr) - rel[r]
        return np.sum(np.abs(d), dtype=F)

    def _update(self, h, t, r, corrupted):
        beta = F(1.0) if corrupted else F(-1.0)
        wr = self.snap_w[r]
        he, te, rv = self.snap_e[h], self.snap_e[t], self.snap_r[r]
        hs = np.dot(wr, he)
        ts = np.dot(wr, te)
        res = (te - ts * wr) - (he - hs * wr) - rv
        x = _l1_grad(res)
        sum_x = np.sum(x * wr, dtype=F)

        self.rel[r] -= beta * self.lr * x
        self.ent[h] -= beta * self.lr * x
        self.ent[t] += beta * self.lr * x
        self.w[r] += beta * self.lr * (x * (hs - ts) + sum_x * (he - te))

        self.rel[r] = ball_norm(self.rel[r])
        self.ent[h] = ball_norm(self.ent[h])
        self.ent[t] = ball_norm(self.ent[t])
        self.w[r] = sphere_norm(self.w[r])
        self.rel[r], self.w[r] = orthogonality_project(self.rel[r], self.w[r], self.lr, self.max_iters)
        self.ent[h], self.w[r] = orthogonality_project(self.ent[h], self.w[r], self.lr, self.max_iters)
        self.ent[t], self.w[r] = orthogonality_project(self.ent[t], self.w[r], self.lr, self.max_iters)

    def run_batch(self, samples):
        self.snap_e = self.ent.copy()
        self.snap_r = self.rel.copy()
        self.snap_w = self.w.copy()
        loss = F(0.0)
        for ph, pt, r, nh, nt in samples:
            e_pos = self.energy(self.snap_e, self.snap_r, self.snap_w, ph, pt, r)
            e_neg = self.energy(self.snap_e, self.snap_r, self.snap_w, nh, nt, r)
            if e_pos + self.margin > e_neg:
                loss += self.margin + e_pos - e_neg
                self._update(ph, pt, r, corrupted=False)
                self._update(nh, nt, r, corrupted=True)
        return loss


class TransROracle:
    """transr/trainer.cpp:144-191 semantics (with intent of bug B2: the third
    transRNorm constrains the relation vector)."""

    def __init__(self, ent, rel, w, lr, margin, l1=True, max_iters=16):
        self.ent = np.array(ent, dtype=F)
        self.rel = np.array(rel, dtype=F)
        self.w = np.array(w, dtype=F)  # [R, k, k], projection = e @ W
        self.lr = F(lr)
        self.margin = F(margin)
        self.l1 = l1
        self.max_iters = max_iters

    def energy(self, ent, rel, w, h, t, r):
        d = ent[t] @ w[r] - ent[h] @ w[r] - rel[r]
        return np.sum(np.abs(d), dtype=F) if self.l1 else np.sum(d * d, dtype=F)

    def _update(self, h, t, r, corrupted):
        beta = F(1.0) if corrupted else F(-1.0)
        wr = self.snap_w[r]
        he, te, rv = self.snap_e[h], self.snap_e[t], self.snap_r[r]
        res = te @ wr - he @ wr - rv
        x = _l1_grad(res) if self.l1 else F(2.0) * res

        self.w[r] -= beta * self.lr * np.outer(he - te, x)
        wx = wr @ x
        self.ent[h] -= beta * self.lr * wx
        self.ent[t] += beta * self.lr * wx
        self.rel[r] -= beta * self.lr * x

        self.rel[r] = sphere_norm(self.rel[r])
        self.ent[h] = sphere_norm(self.ent[h])
        self.ent[t] = sphere_norm(self.ent[t])
        for j in range(self.w.shape[1]):
            self.w[r, j] = sphere_norm(self.w[r, j])

        self.ent[h], self.w[r] = transr_ball_project(self.ent[h], self.w[r], self.lr, self.max_iters)
        self.ent[t], self.w[r] = transr_ball_project(self.ent[t], self.w[r], self.lr, self.max_iters)
        self.rel[r], self.w[r] = transr_ball_project(self.rel[r], self.w[r], self.lr, self.max_iters)

    def run_batch(self, samples):
        self.snap_e = self.ent.copy()
        self.snap_r = self.rel.copy()
        self.snap_w = self.w.copy()
        loss = F(0.0)
        for ph, pt, r, nh, nt in samples:
            e_pos = self.energy(self.snap_e, self.snap_r, self.snap_w, ph, pt, r)
            e_neg = self.energy(self.snap_e, self.snap_r, self.snap_w, nh, nt, r)
            if e_pos + self.margin > e_neg:
                loss += self.margin + e_pos - e_neg
                self._update(ph, pt, r, corrupted=False)
                self._update(nh, nt, r, corrupted=True)
        return loss
