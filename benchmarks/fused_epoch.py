"""Experiment: fused combined-table TransE epoch runner throughput (TPU)."""
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

N_ENTITIES, N_RELATIONS, N_TRAIN, K, NB = 14_951, 1_345, 483_142, 100, 100

h, t, r = random_kg(N_ENTITIES, N_RELATIONS, N_TRAIN, seed=1)
ts = TripleSet.from_arrays(h, t, r, n_entities=N_ENTITIES, n_relations=N_RELATIONS)
cfg = EmbeddingConfig(embedding_size=K, learning_rate=0.001, margin=1.0,
                      method=Method.BERN, num_batches=NB, distance=Distance.L1, seed=42)
model = get_model("transe")
data = step_lib.DeviceData.from_triple_set(ts)
bs = step_lib.batch_size_for(ts.num_triples, NB)

specs = sys.argv[1:] or ["fused:1"]
for spec in specs:
    parts = spec.split(":")
    kind, unroll = parts[0], int(parts[1])
    scatter_mode = parts[2] if len(parts) > 2 else "direct"
    dtype = parts[3] if len(parts) > 3 else "float32"
    import dataclasses
    c = dataclasses.replace(cfg, scatter_mode=scatter_mode, param_dtype=dtype)
    key = jax.random.PRNGKey(42)
    params = model.init_params(key, ts.n_entities, ts.n_relations, c)
    run = step_lib.make_epoch_runner(model, c, bs, NB, unroll=unroll,
                                     fused=(kind == "fused"))
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
                      "triples_per_s": round(bs * NB * 3 / dt, 1)}), flush=True)
