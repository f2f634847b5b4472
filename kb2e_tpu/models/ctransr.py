"""CTransR: cluster-based TransR (Lin et al., AAAI'15 §"CTransR").

The reference repo names CTransR as a target (README.md:93-99) but ships no
code for it (survey §0.1), so this implementation follows the paper cited at
README.md:125: triples of each relation are clustered into groups by their
seed-embedding offsets (t − h); each cluster gets its own relation vector
r_{r,c} sharing the relation's projection matrix W_r, and training adds a
regulariser α·‖r_{r,c} − r‖² keeping cluster vectors near the relation mean.

Params: entity [N,k], relation [R,k] (cluster means), relation_c [R,C,k],
proj [R,k,k], centers [R,C,k] (k-means centers of seed offsets, used only for
cluster assignment — not trained).

Training batches carry a per-triple cluster id (assigned host-side by
:func:`assign_clusters` / on device by :func:`assign_clusters_device`).
Evaluation is cluster-aware: each candidate entity picks the nearest cluster
by its offset to the query anchor, and is scored with that cluster's vector —
see ``eval/harness.py``'s cluster-aware path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kb2e_tpu.config import EmbeddingConfig
from kb2e_tpu.constants import Distance
from kb2e_tpu.models import base, transr
from kb2e_tpu.ops import distances, projections

DEFAULT_NUM_CLUSTERS = 4
DEFAULT_ALPHA = 1.0


def kmeans_offsets(
    offsets: np.ndarray, n_clusters: int, n_iters: int = 25, seed: int = 0
) -> np.ndarray:
    """Plain k-means over offset vectors; returns [n_clusters, k] centers.

    Degenerate relations (fewer distinct offsets than clusters) repeat their
    mean so every cluster id stays valid.
    """
    rng = np.random.default_rng(seed)
    n = offsets.shape[0]
    if n == 0:
        return np.zeros((n_clusters, offsets.shape[1]), dtype=np.float32)
    init_idx = rng.choice(n, size=min(n_clusters, n), replace=False)
    centers = offsets[init_idx].copy()
    if centers.shape[0] < n_clusters:
        centers = np.concatenate(
            [centers, np.repeat(offsets.mean(0, keepdims=True), n_clusters - centers.shape[0], 0)]
        )
    for _ in range(n_iters):
        d = np.linalg.norm(offsets[:, None, :] - centers[None, :, :], axis=-1)
        assign = d.argmin(1)
        for c in range(n_clusters):
            mask = assign == c
            if mask.any():
                centers[c] = offsets[mask].mean(0)
    return centers.astype(np.float32)


def build_centers(
    seed_entity: np.ndarray,
    heads: np.ndarray,
    tails: np.ndarray,
    rels: np.ndarray,
    n_relations: int,
    n_clusters: int = DEFAULT_NUM_CLUSTERS,
    seed: int = 0,
) -> np.ndarray:
    """Per-relation k-means centers of seed offsets t − h; [R, C, k]."""
    k = seed_entity.shape[1]
    centers = np.zeros((n_relations, n_clusters, k), dtype=np.float32)
    offsets_all = seed_entity[tails] - seed_entity[heads]
    for r in range(n_relations):
        mask = rels == r
        centers[r] = kmeans_offsets(offsets_all[mask], n_clusters, seed=seed + r)
    return centers


def assign_clusters(
    seed_entity: np.ndarray,
    centers: np.ndarray,
    heads: np.ndarray,
    tails: np.ndarray,
    rels: np.ndarray,
) -> np.ndarray:
    """Host-side nearest-center cluster id per triple; int32 [T]."""
    offsets = seed_entity[tails] - seed_entity[heads]
    c = centers[rels]  # [T, C, k]
    d = np.linalg.norm(offsets[:, None, :] - c, axis=-1)
    return d.argmin(1).astype(np.int32)


def assign_clusters_device(
    entity: jax.Array, centers_r: jax.Array, h: jax.Array, t: jax.Array
) -> jax.Array:
    """Device-side assignment against one relation's centers [C, k]."""
    offsets = entity[t] - entity[h]  # [B, k]
    d = jnp.sum(jnp.square(offsets[:, None, :] - centers_r[None, :, :]), axis=-1)
    return jnp.argmin(d, axis=1).astype(jnp.int32)


class CTransR(transr.TransR):
    name = "ctransr"
    needs_projection = True
    # Cluster-aware eval needs candidate-dependent relation vectors.
    cluster_aware = True

    def __init__(self, n_clusters: int = DEFAULT_NUM_CLUSTERS, alpha: float = DEFAULT_ALPHA):
        self.n_clusters = n_clusters
        self.alpha = alpha

    def init_params(self, key, n_entities, n_relations, cfg: EmbeddingConfig) -> base.Params:
        params = super().init_params(key, n_entities, n_relations, cfg)
        k = cfg.embedding_size
        rel_c = jnp.broadcast_to(
            params["relation"][:, None, :], (n_relations, self.n_clusters, k)
        )
        centers = jnp.zeros((n_relations, self.n_clusters, k), dtype=jnp.float32)
        return {**params, "relation_c": jnp.array(rel_c), "centers": centers}

    def with_centers(self, params: base.Params, centers: np.ndarray) -> base.Params:
        return {**params, "centers": jnp.asarray(centers, dtype=jnp.float32)}

    def _cluster_ids(self, params, h, t, r):
        """Nearest-center cluster for each triple (batched, mixed relations)."""
        offsets = params["entity"][t] - params["entity"][h]  # [B, k]
        c = params["centers"][r]  # [B, C, k]
        d = jnp.sum(jnp.square(offsets[:, None, :] - c), axis=-1)
        return jnp.argmin(d, axis=1).astype(jnp.int32)

    def energy(self, params, h, t, r, distance: Distance) -> jax.Array:
        c = self._cluster_ids(params, h, t, r)
        w = params["proj"][r]
        hp = jnp.einsum("bj,bji->bi", params["entity"][h], w)
        tp = jnp.einsum("bj,bji->bi", params["entity"][t], w)
        rv = params["relation_c"][r, c]
        return distances.residual_energy(tp - hp - rv, distance)

    def batch_update(self, params, batch: base.Batch, cfg: EmbeddingConfig) -> Tuple[base.Params, jax.Array]:
        # Same CHUNK-SEQUENTIAL single-scan shape as TransR.batch_update (see
        # models/transr.py): the whole-batch variant materialised several
        # [B, k, k] buffers (~1 GB at FB15k shapes) inside the epoch scan, and
        # the multi-phase grad/projector program shape miscompiles on the
        # axon TPU backend.  One scan carries (ent, rel, rel_c, proj); the
        # k-means `centers` are read-only (cluster routing only).
        from kb2e_tpu.ops import scatter

        lr = cfg.learning_rate
        dist = self.effective_distance(cfg.distance)
        centers = params["centers"]
        ph = batch["ph"]
        b = ph.shape[0]
        # Chunk derived from self.chunk_size (see transr.py): keeps the epoch
        # runner and this method agreeing on granularity so the single-scan
        # (un-nested) program shape is preserved.
        chunk = min(self.chunk_size, b)
        pad = (-b) % chunk

        def padc(a, fill=0):
            return jnp.concatenate(
                [a, jnp.full((pad,), fill, a.dtype)]
            ).reshape(-1, chunk)

        slices = (
            padc(ph), padc(batch["pt"]), padc(batch["r"]),
            padc(batch["nh"]), padc(batch["nt"]),
            padc(batch["valid"], fill=False),
        )
        ablate = set(filter(None, cfg.debug_ablate.split(",")))

        def chunk_step(tabs, sl):
            ent, rel, rel_c, proj = tabs
            phi, pti, ri, nhi, nti, vi = sl

            # Clusters are decided by the POSITIVE triple's offset; the
            # corrupted triple scores against the same cluster vector (it
            # corrupts the same relation instance).
            offsets = ent[pti] - ent[phi]
            cdist = jnp.sum(jnp.square(offsets[:, None, :] - centers[ri]), axis=-1)
            ci = jnp.argmin(cdist, axis=1).astype(jnp.int32)

            w = proj[ri]
            he, te, ne_h, ne_t = ent[phi], ent[pti], ent[nhi], ent[nti]
            rv = rel_c[ri, ci]
            hp = jnp.einsum("bj,bji->bi", he, w)
            tp = jnp.einsum("bj,bji->bi", te, w)
            np_h = jnp.einsum("bj,bji->bi", ne_h, w)
            np_t = jnp.einsum("bj,bji->bi", ne_t, w)

            res_pos = tp - hp - rv
            res_neg = np_t - np_h - rv
            e_pos = distances.residual_energy(res_pos, dist)
            e_neg = distances.residual_energy(res_neg, dist)
            viol = (e_pos + cfg.margin > e_neg) & vi
            lterm = jnp.sum(jnp.where(viol, cfg.margin + e_pos - e_neg, 0.0))
            m = viol.astype(res_pos.dtype)[:, None]

            def xs(res):
                x = 2.0 * res
                if dist == Distance.L1:
                    x = jnp.where(x > 0, 1.0, -1.0)
                return x * m

            x_pos, x_neg = xs(res_pos), xs(res_neg)
            wx_pos = jnp.einsum("bji,bi->bj", w, x_pos)
            wx_neg = jnp.einsum("bji,bi->bj", w, x_neg)

            idx = jnp.concatenate([phi, pti, nhi, nti])
            # Same diagnostic ablation keys as TransR.batch_update (config.py
            # documents 'scatter'/'norms'/'ball' for BOTH chunk-sequential
            # fast paths) so a future axon-fault bisection of CTransR can
            # switch off the same blocks.
            if "scatter" not in ablate:
                d_w = lr * (
                    jnp.einsum("bj,bi->bji", he - te, x_pos)
                    - jnp.einsum("bj,bi->bji", ne_h - ne_t, x_neg)
                )
                proj = scatter.scatter_add(proj, ri, d_w, cfg.scatter_mode)
                delta = jnp.concatenate(
                    [lr * wx_pos, -lr * wx_pos, -lr * wx_neg, lr * wx_neg]
                )
                ent = scatter.scatter_add(ent, idx, delta, cfg.scatter_mode)

                # Cluster vector update + α-regulariser toward the relation
                # mean.
                reg = 2.0 * self.alpha * (rv - rel[ri]) * m
                d_rc = lr * (x_pos - x_neg) - lr * reg
                rel_c = rel_c.at[ri, ci].add(d_rc)
                rel = rel.at[ri].add(lr * reg)

            # Row-wise constraint projections on TOUCHED rows only — the
            # whole-table per-chunk rewrites both waste ~60 MB of traffic per
            # chunk and trigger the axon-backend kernel fault documented in
            # models/transr.py.  Unconditional on touched rows (idempotent;
            # per-occurrence masking would race on duplicate indices).
            #
            # DELIBERATE divergence from TransR.batch_update's constraint set
            # (CTransR has no reference code — survey §0.1 — so the AAAI'15
            # paper is the semantic anchor, not transr/trainer.cpp):
            # * the SCORED vector is the per-cluster ``rel_c[r, c]`` — it gets
            #   the same always-on sphere norm TransR's reference applies to
            #   its scored relation vector (norm(..,false),
            #   transr/trainer.cpp:174-180);
            # * ``rel[r]`` is never scored here — it is only the
            #   α-regulariser's anchor (the cluster mean r in the paper's
            #   ‖r_c − r‖² term) — so it gets a ball bound to stay comparable
            #   in scale, not the sphere projection of a scored vector;
            # * no ‖r·W‖ ≤ 1 projector on either relation vector: that
            #   constraint exists in our TransR only as the intent of the
            #   reference's bug B2 (transr/trainer.cpp:187 indexes the entity
            #   table with a relation id); the paper's constraint set —
            #   ‖h‖,‖t‖,‖r_c‖ ≤ 1, ‖hW‖,‖tW‖ ≤ 1 — has no such term, and
            #   with no reference binary there is no bug-intent to honour.
            #   Entity-side ‖eW‖ ≤ 1 projections below match TransR exactly.
            def norm_rows(table, rows_idx, proj_fn):
                return table.at[rows_idx].set(proj_fn(table[rows_idx]))

            if "norms" not in ablate:
                ent = norm_rows(ent, idx, projections.sphere_norm)
                rel = norm_rows(rel, ri, projections.ball_norm)
                rel_c = rel_c.at[ri, ci].set(
                    projections.sphere_norm(rel_c[ri, ci])
                )
                proj = norm_rows(proj, ri, projections.sphere_norm)

            if "ball" not in ablate:
                # ‖e·W‖ ≤ 1 on touched entities: ONE masked iteration of the
                # coupled vector+matrix descent, exactly as in
                # TransR.batch_update (see the comment there for why not a
                # while_loop — axon kernel fault — and why not a-only
                # closed-form scaling — quality collapse).
                viol3 = jnp.concatenate([viol, viol, viol])
                corrupted = jnp.where(nhi != phi, nhi, nti)
                pair_e = jnp.concatenate([phi, pti, corrupted])
                e_rows = ent[pair_e]
                w_upd = proj[ri]
                cc = ri.shape[0]
                e3 = e_rows.reshape(3, cc, e_rows.shape[-1])
                p3 = jnp.einsum("sbj,bji->sbi", e3, w_upd)
                n2 = jnp.sum(jnp.square(p3), axis=-1, keepdims=True)
                act = (n2 > 1.0) & viol3.reshape(3, cc, 1)
                tmp3 = jnp.where(act, 2.0 * p3, 0.0)
                d_w = -lr * jnp.einsum("sbj,sbi->bji", e3, tmp3)
                proj = scatter.scatter_add(proj, ri, d_w, cfg.scatter_mode)
                w_new = w_upd + d_w
                e_new = e3 - lr * jnp.einsum("bji,sbi->sbj", w_new, tmp3)
                ent = scatter.scatter_add(
                    ent, pair_e, (e_new - e3).reshape(e_rows.shape),
                    cfg.scatter_mode,
                )
            return (ent, rel, rel_c, proj), lterm

        tabs = (
            params["entity"], params["relation"],
            params["relation_c"], params["proj"],
        )
        if b <= chunk:
            # Single chunk — no inner scan (see models/transr.py).
            (ent, rel, rel_c, proj), lterm = chunk_step(
                tabs, tuple(s[0] for s in slices)
            )
            return (
                {"entity": ent, "relation": rel, "relation_c": rel_c, "proj": proj, "centers": centers},
                lterm,
            )
        (ent, rel, rel_c, proj), lterms = jax.lax.scan(chunk_step, tabs, slices)
        return (
            {"entity": ent, "relation": rel, "relation_c": rel_c, "proj": proj, "centers": centers},
            jnp.sum(lterms),
        )

    has_parity_mode = False

    def sequential_update(self, params, batch: base.Batch, cfg: EmbeddingConfig):
        # CTransR has no reference binary to be numerically faithful to
        # (the fork ships no CTransR code — survey §0.1); the vectorised path
        # is the defining semantics.
        return self.batch_update(params, batch, cfg)

    # Cluster-aware evaluation hooks -------------------------------------
    def cluster_vectors(self, params, rel) -> jax.Array:
        """[C, k] cluster relation vectors for one relation."""
        return params["relation_c"][rel]

    def cluster_centers(self, params, rel) -> jax.Array:
        return params["centers"][rel]


MODEL = base.register(CTransR())
