"""Experiment: production batch-size / multi-negative throughput (TPU).

Specs: "nb:<num_batches>" (reference policy = 100) or "neg:<K>" (negatives
per positive at reference batch policy).  Reports triples/s counting SAMPLED
POSITIVES (so neg:K does K× the pair updates at the printed positive rate).
"""
import dataclasses
import json
import sys
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from kb2e_tpu.config import EmbeddingConfig
from kb2e_tpu.constants import Distance, Method
from kb2e_tpu.data.synthetic import random_kg
from kb2e_tpu.data.triples import TripleSet
from kb2e_tpu.models import get_model
from kb2e_tpu.train import step as step_lib

N_ENTITIES, N_RELATIONS, N_TRAIN, K = 14_951, 1_345, 483_142, 100

h, t, r = random_kg(N_ENTITIES, N_RELATIONS, N_TRAIN, seed=1)
ts = TripleSet.from_arrays(h, t, r, n_entities=N_ENTITIES, n_relations=N_RELATIONS)
base = EmbeddingConfig(embedding_size=K, learning_rate=0.001, margin=1.0,
                       method=Method.BERN, num_batches=100, distance=Distance.L1, seed=42)
model = get_model("transe")
data = step_lib.DeviceData.from_triple_set(ts)

for spec in sys.argv[1:] or ["nb:20"]:
    kind, val = spec.split(":")
    val = int(val)
    if kind == "nb":
        cfg = dataclasses.replace(base, num_batches=val)
    else:
        cfg = dataclasses.replace(base, num_negatives=val)
    nb = cfg.num_batches
    bs = step_lib.batch_size_for(ts.num_triples, nb)
    key = jax.random.PRNGKey(42)
    params = model.init_params(key, ts.n_entities, ts.n_relations, cfg)
    run = step_lib.make_epoch_runner(model, cfg, bs, nb)
    t0 = time.perf_counter()
    key, sk = jax.random.split(key)
    params, loss = run(params, sk, data)
    float(loss)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        key, sk = jax.random.split(key)
        params, loss = run(params, sk, data)
    float(loss)
    dt = time.perf_counter() - t0
    print(json.dumps({"spec": spec, "compile_s": round(compile_s, 1),
                      "epoch_ms": round(dt / 3 * 1e3, 1),
                      "positives_per_s": round(bs * nb * 3 / dt, 1)}), flush=True)
