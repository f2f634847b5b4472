"""Distributed training step via GSPMD sharding annotations.

TPU-native recipe (survey §2.1, §5.8): the *same* functional train step used
on one chip is jitted over a (data, model) mesh with sharding annotations;
XLA's partitioner inserts the collectives — all-gathers for sharded
entity-row lookups, reduce-scatters for the scatter-add updates — riding ICI.
No hand-written NCCL/MPI analogue exists or is needed.

The triple store is replicated (int32 edge lists are tiny relative to
embedding tables); the sampled batch is constrained to the ``data`` axis so
each device scores its own shard of samples.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kb2e_tpu.config import EmbeddingConfig
from kb2e_tpu.constants import Method
from kb2e_tpu.models.base import Batch, Model, Params
from kb2e_tpu.parallel import sharding as shard_lib
from kb2e_tpu.sampling import corruption
from kb2e_tpu.train.step import DeviceData


def make_distributed_train_step(
    model: Model,
    cfg: EmbeddingConfig,
    mesh: Mesh,
    batch_size: int,
):
    """Build a pjit-style (params, key, data) -> (params, loss) step.

    ``batch_size`` must divide by the ``data`` axis size (each device gets an
    equal batch shard).
    """
    method = Method.from_any(cfg.method)
    n_data = mesh.shape["data"]
    if batch_size % n_data:
        raise ValueError(f"batch_size {batch_size} not divisible by data axis {n_data}")

    batch_sharding = NamedSharding(mesh, shard_lib.BATCH_SPEC)

    @functools.partial(jax.jit, static_argnames=("n_entities",), donate_argnames=("params",))
    def step(params: Params, key: jax.Array, data: DeviceData, n_entities: int):
        use_paths = data.paths is not None
        if use_paths:
            key, k_nr = jax.random.split(key)
        batch = corruption.sample_batch(
            key,
            data.heads,
            data.tails,
            data.rels,
            data.bern_pr_tail,
            data.sorted_h,
            data.sorted_r,
            data.sorted_t,
            n_entities=n_entities,
            batch_size=batch_size,
            method=method,
            resample_rounds=cfg.corruption_resample_rounds,
            cuckoo_table=data.cuckoo_table,
            cuckoo_fp=data.cuckoo_fp,
            cuckoo_m=data.cuckoo_m,
            cuckoo_salt=data.cuckoo_salt,
            n_relations=data.n_relations,
            return_idx=use_paths,
        )
        if use_paths:
            from kb2e_tpu.train.step import _with_path_data

            batch = _with_path_data(k_nr, batch, data, cfg.corruption_resample_rounds)
        # Pin the sampled batch to the data axis so scoring is data-parallel.
        batch = Batch(
            {k: jax.lax.with_sharding_constraint(v, batch_sharding) for k, v in batch.items()}
        )
        new_params, loss = model.batch_update(params, batch, cfg)
        # Keep parameter shardings stable across steps.
        new_params = {
            k: jax.lax.with_sharding_constraint(
                v, NamedSharding(mesh, shard_lib.PARAM_SPECS[k])
            )
            for k, v in new_params.items()
        }
        return new_params, loss

    def run(params: Params, key: jax.Array, data: DeviceData):
        return step(params, key, data, data.n_entities)

    return run


def replicate_data(mesh: Mesh, data: DeviceData) -> DeviceData:
    """Place the triple store replicated on every device of the mesh.

    Works under multi-process execution too: committed single-device arrays
    can't be device_put onto a multi-process sharding directly, so they take
    one round-trip through host memory (the triple store is int32 SoA — tiny
    next to the parameter tables, and this runs once per training).
    """
    rep = NamedSharding(mesh, P())
    multiprocess = jax.process_count() > 1

    def place(x):
        if not hasattr(x, "shape"):
            return x
        import numpy as np

        return jax.device_put(np.asarray(x) if multiprocess else x, rep)

    # Field-wise (not positional) so optional fields stay aligned.
    return data._replace(
        **{f: place(getattr(data, f)) for f in data._fields if f != "n_entities"}
    )
