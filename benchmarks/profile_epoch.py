"""Capture a device trace of the fused TransE epoch runner and summarise
per-op time from the perfetto trace (no TensorBoard needed)."""
import glob
import gzip
import json
import os
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
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kb2e_profile"

h, t, r = random_kg(N_ENTITIES, N_RELATIONS, N_TRAIN, seed=1)
ts = TripleSet.from_arrays(h, t, r, n_entities=N_ENTITIES, n_relations=N_RELATIONS)
cfg = EmbeddingConfig(embedding_size=K, learning_rate=0.001, margin=1.0,
                      method=Method.BERN, num_batches=NB, distance=Distance.L1, seed=42)
model = get_model("transe")
data = step_lib.DeviceData.from_triple_set(ts)
bs = step_lib.batch_size_for(ts.num_triples, NB)
run = step_lib.make_epoch_runner(model, cfg, bs, NB)
key = jax.random.PRNGKey(42)
params = model.init_params(key, ts.n_entities, ts.n_relations, cfg)
key, sk = jax.random.split(key)
params, loss = run(params, sk, data)
float(loss)  # compile + warm

jax.profiler.start_trace(OUT)
key, sk = jax.random.split(key)
params, loss = run(params, sk, data)
float(loss)
jax.profiler.stop_trace()

# Summarise the largest trace.json.gz events by op.
paths = sorted(glob.glob(os.path.join(OUT, "**", "*.trace.json.gz"), recursive=True),
               key=os.path.getsize)
if not paths:
    print("NO TRACE FILES under", OUT)
    sys.exit(1)
trace = json.load(gzip.open(paths[-1], "rt"))
events = [e for e in trace.get("traceEvents", []) if e.get("ph") == "X"]
# Keep only device-lane events (TensorFlow/XLA op events carry 'dur' in us).
agg = {}
for e in events:
    name = e.get("name", "?")
    agg[name] = agg.get(name, 0.0) + e.get("dur", 0.0)
top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
total = sum(agg.values())
print(json.dumps({"trace": paths[-1], "events": len(events), "total_us": round(total, 1)}))
for name, us in top:
    print(f"{us/1e3:10.2f} ms  {name[:120]}")
