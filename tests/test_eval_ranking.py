"""Evaluation parity vs. a brute-force oracle of the reference algorithm.

The oracle replicates ``evalCorruption`` (common/evaluation.cpp:124-179):
score all entities, stable-sort ascending (our deterministic stand-in for
std::sort's unspecified tie order — quirk B9), scan for raw rank, count
non-known-good entities before the true one for the filtered rank.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from kb2e_tpu.config import EmbeddingConfig
from kb2e_tpu.constants import Distance
from kb2e_tpu.data import triples as T
from kb2e_tpu.eval import harness, ranking
from kb2e_tpu.models import get_model


def _oracle_rank(energies, true_idx, known_good):
    """Reference scan with index-order tie-breaking."""
    n = energies.shape[0]
    order = np.argsort(energies, kind="stable")
    raw = 1
    filtered = 1
    for pos, j in enumerate(order):
        if j == true_idx:
            raw = pos + 1
            break
        if j not in known_good:
            filtered += 1
    return raw, filtered


def test_rank_queries_matches_oracle():
    rng = np.random.default_rng(3)
    n_ent, k, b = 50, 8, 12
    # Quantise to multiples of 1/8 so both the direct residual formula and the
    # L2 matmul expansion compute bit-exact energies (no rounding ambiguity in
    # strict < / == comparisons against the NumPy oracle).
    ent = (np.round(rng.normal(size=(n_ent, k)) * 8) / 8).astype(np.float32)
    queries = (np.round(rng.normal(size=(b, k)) * 8) / 8).astype(np.float32)
    true_idx = rng.integers(0, n_ent, b).astype(np.int32)
    # random filter lists incl. the true idx sometimes
    kmax = 6
    cands = np.full((b, kmax), -1, np.int32)
    known = []
    for i in range(b):
        nf = rng.integers(0, kmax)
        ids = rng.choice(n_ent, size=nf, replace=False).astype(np.int32)
        cands[i, :nf] = ids
        known.append(set(int(x) for x in ids))

    for dist in (Distance.L1, Distance.L2):
        proj_p = ranking.pad_entities(jnp.asarray(ent), 16)
        raw, filt = ranking.rank_queries(
            proj_p, jnp.asarray(queries), jnp.asarray(true_idx), jnp.asarray(cands),
            dist, 16,
        )
        raw, filt = np.asarray(raw), np.asarray(filt)
        for i in range(b):
            if dist == Distance.L1:
                e = np.abs(ent - queries[i]).sum(1)
            else:
                e = ((ent - queries[i]) ** 2).sum(1)
            # oracle's known_good excludes nothing; the harness contract is
            # that filter candidates are known-good entities (true excluded
            # from counting automatically).
            oracle_raw, oracle_filt = _oracle_rank(e, int(true_idx[i]), known[i])
            assert raw[i] == oracle_raw, (dist, i)
            assert filt[i] == oracle_filt, (dist, i)


def test_harness_end_to_end_matches_bruteforce(tiny_dataset):
    """Full harness vs. a direct per-triple brute force on the tiny KG."""
    ds = tiny_dataset
    cfg = EmbeddingConfig(embedding_size=8, eval_block_size=16, eval_batch_size=32)
    rng = np.random.default_rng(0)
    ent = rng.normal(size=(ds.n_entities, 8)).astype(np.float32) * 0.3
    rel = rng.normal(size=(ds.n_relations, 8)).astype(np.float32) * 0.3
    model = get_model("transe")
    params = {"entity": jnp.asarray(ent), "relation": jnp.asarray(rel)}

    # Use a small subset of test triples for the brute force.
    th, tt, tr = (np.asarray(a)[:20] for a in ds.test)
    metrics = harness.evaluate(model, params, ds, cfg, test_triples=(th, tt, tr))

    # Brute force.
    filt_arrays = [
        (ds.train.heads, ds.train.tails, ds.train.rels),
        ds.valid,
        (th, tt, tr),
    ]
    fh = np.concatenate([np.asarray(p[0]) for p in filt_arrays])
    ft = np.concatenate([np.asarray(p[1]) for p in filt_arrays])
    fr = np.concatenate([np.asarray(p[2]) for p in filt_arrays])
    known = set(zip(fh.tolist(), fr.tolist(), ft.tolist()))

    raw_sum = filt_sum = raw_hits = filt_hits = 0
    raw_recip = filt_recip = 0.0
    raw_hits1 = filt_hits1 = raw_hits3 = filt_hits3 = 0
    for i in range(th.shape[0]):
        h, t, r = int(th[i]), int(tt[i]), int(tr[i])
        for corrupt_head in (True, False):
            if corrupt_head:
                e = np.abs(ent - (ent[t] - rel[r])).sum(1)
                true = h
                good = {j for j in range(ds.n_entities) if (j, r, t) in known}
            else:
                e = np.abs(ent - (ent[h] + rel[r])).sum(1)
                true = t
                good = {j for j in range(ds.n_entities) if (h, r, j) in known}
            raw, filt = _oracle_rank(e, true, good)
            raw_sum += raw
            filt_sum += filt
            raw_hits += raw <= 10
            filt_hits += filt <= 10
            raw_recip += 1.0 / raw
            filt_recip += 1.0 / filt
            raw_hits1 += raw <= 1
            filt_hits1 += filt <= 1
            raw_hits3 += raw <= 3
            filt_hits3 += filt <= 3

    n = 2 * th.shape[0]
    assert metrics["raw_mean_rank"] == pytest.approx(raw_sum / n)
    assert metrics["filtered_mean_rank"] == pytest.approx(filt_sum / n)
    assert metrics["raw_hits10"] == pytest.approx(raw_hits / n)
    assert metrics["filtered_hits10"] == pytest.approx(filt_hits / n)
    assert metrics["raw_mrr"] == pytest.approx(raw_recip / n)
    assert metrics["filtered_mrr"] == pytest.approx(filt_recip / n)
    assert metrics["raw_hits1"] == pytest.approx(raw_hits1 / n)
    assert metrics["filtered_hits1"] == pytest.approx(filt_hits1 / n)
    assert metrics["raw_hits3"] == pytest.approx(raw_hits3 / n)
    assert metrics["filtered_hits3"] == pytest.approx(filt_hits3 / n)
