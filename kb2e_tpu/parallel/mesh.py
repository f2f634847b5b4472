"""Device mesh construction.

The reference has no parallelism whatsoever (survey §2.1) — every axis here is
a from-scratch TPU-native design.  The canonical mesh is 2-D:

* ``data``  — triples (batch) axis: each device samples/scores its batch
  shard; gradient exchange is the scatter-add into the sharded tables.
* ``model`` — parameter axis: the entity table's row axis (and TransR's
  [R,k,k] projection tensor's relation axis) is sharded here; XLA's GSPMD
  partitioner inserts the all-gather / reduce-scatter collectives for the
  row gathers and update scatters, riding ICI within a slice.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    data: Optional[int] = None,
    model: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Defaults: all devices on the ``data`` axis (pure DP) — the right default
    for KGE training where batches are huge and tables fit per chip; pass
    ``model`` to shard tables for beyond-HBM entity counts.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None and model is None:
        data, model = n, 1
    elif data is None:
        data = n // model
    elif model is None:
        model = n // data
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1, devices=jax.devices()[:1])
