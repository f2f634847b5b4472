import time, sys
import numpy as np
import jax, jax.numpy as jnp
from kb2e_tpu.config import EmbeddingConfig
from kb2e_tpu.constants import Distance, Method
from kb2e_tpu.models import get_model
from kb2e_tpu.models.base import Batch

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4831
n, rN, k = 14951, 1345, 100
rng = np.random.default_rng(0)
model = get_model("transr")
cfg = EmbeddingConfig(embedding_size=k, learning_rate=0.001, margin=1.0,
                      method=Method.BERN, distance=Distance.L1)
params = model.init_params(jax.random.PRNGKey(0), n, rN, cfg)
def mk(seed):
    g = np.random.default_rng(seed)
    return Batch(ph=jnp.asarray(g.integers(0,n,B).astype(np.int32)),
                 pt=jnp.asarray(g.integers(0,n,B).astype(np.int32)),
                 r=jnp.asarray(g.integers(0,rN,B).astype(np.int32)),
                 nh=jnp.asarray(g.integers(0,n,B).astype(np.int32)),
                 nt=jnp.asarray(g.integers(0,n,B).astype(np.int32)),
                 valid=jnp.asarray(np.ones(B,bool)))
upd = jax.jit(lambda p, b: model.batch_update(p, b, cfg))
t0=time.perf_counter()
p2, loss = upd(params, mk(1))
print("single batch_update ok:", float(loss), f"{time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter()
p2, loss = upd(params, mk(2))
print("warm:", float(loss), f"{time.perf_counter()-t0:.3f}s", flush=True)
