"""Model protocol and registry.

A model is a stateless bundle of pure functions over a params pytree
(``dict[str, jax.Array]``).  The contract mirrors the reference's virtual-hook
surface (``common/trainer.h:58-77``: initialEmbeddingValue / gradientUpdate /
tripleEnergy / prepTrain) recast functionally:

* ``init_params``        ≙ prepTrain's init + normalise
  (common/trainer.cpp:34-58 plus model extensions)
* ``energy``             ≙ tripleEnergy
* ``batch_update``       ≙ one reference *batch* of gradientUpdate calls,
  vectorised: reads the batch-start snapshot, accumulates all margin-violating
  updates with scatter-adds, then applies the constraint projections once
  (fast mode; see survey §7 "update semantics parity").
* ``sequential_update``  ≙ the exact double-buffered per-sample semantics
  (transe/trainer.cpp:25-56) as a ``lax.scan`` — the parity path.
* ``project_entities`` / ``relation_vector`` — the evaluation hooks: every
  Trans* model evaluates as a distance sweep in a per-relation projected
  space (see kb2e_tpu/ops/distances.py).
"""

from __future__ import annotations

import abc
from typing import Dict, Tuple

import jax

from kb2e_tpu.config import EmbeddingConfig
from kb2e_tpu.constants import Distance

Params = Dict[str, jax.Array]


class Batch(dict):
    """A sampled training batch.

    Keys (all [B] int32 unless noted): ``ph pt r`` positive triple,
    ``nh nt`` corrupted triple (same relation), ``valid`` bool [B] — False
    marks samples whose corruption could not be certified negative within the
    resampling budget (the reference's unbounded rejection loop,
    common/trainer.cpp:88-98, never yields these; we mask them out of the
    loss instead).
    """


jax.tree_util.register_pytree_node(
    Batch,
    lambda b: (tuple(b[k] for k in sorted(b)), tuple(sorted(b))),
    lambda keys, vals: Batch(zip(keys, vals)),
)


class Model(abc.ABC):
    name: str
    # TransH hard-codes L1 and ignores --distance (survey quirk B5).
    uses_distance_flag: bool = True
    # True if evaluation needs a per-relation projection of the entity table.
    needs_projection: bool = False
    # False for models with no reference binary to be faithful to (CTransR,
    # PTransE): their ``sequential_update`` aliases ``batch_update`` and
    # ``--update-mode parity`` is a no-op (warned about in the train loop).
    has_parity_mode: bool = True

    @abc.abstractmethod
    def init_params(self, key: jax.Array, n_entities: int, n_relations: int, cfg: EmbeddingConfig) -> Params:
        ...

    @abc.abstractmethod
    def energy(self, params: Params, h: jax.Array, t: jax.Array, r: jax.Array, distance: Distance) -> jax.Array:
        """Batched triple energy, always computed fresh (fixes quirk B1)."""

    @abc.abstractmethod
    def batch_update(
        self, params: Params, batch: Batch, cfg: EmbeddingConfig
    ) -> Tuple[Params, jax.Array]:
        """Vectorised margin-ranking SGD step; returns (params, batch loss)."""

    @abc.abstractmethod
    def sequential_update(
        self, params: Params, batch: Batch, cfg: EmbeddingConfig
    ) -> Tuple[Params, jax.Array]:
        """Reference-parity per-sample scan; returns (params, batch loss)."""

    # --- evaluation hooks -------------------------------------------------
    def project_entities(self, params: Params, rel: jax.Array) -> jax.Array:
        """Entity table in relation ``rel``'s scoring space ([N, k])."""
        return params["entity"]

    def relation_vector(self, params: Params, rel: jax.Array) -> jax.Array:
        return params["relation"][rel]

    def effective_distance(self, distance: Distance) -> Distance:
        return distance if self.uses_distance_flag else Distance.L1


_REGISTRY: Dict[str, Model] = {}


def register(model: Model) -> Model:
    _REGISTRY[model.name] = model
    return model


def get_model(name: str) -> Model:
    # Import lazily so registry population doesn't create import cycles.
    import kb2e_tpu.models.transe  # noqa: F401
    import kb2e_tpu.models.transh  # noqa: F401
    import kb2e_tpu.models.transr  # noqa: F401
    import kb2e_tpu.models.ctransr  # noqa: F401
    import kb2e_tpu.models.ptranse  # noqa: F401

    try:
        return _REGISTRY[name.lower()]
    except KeyError:
        raise KeyError(f"unknown model {name!r}; known: {sorted(_REGISTRY)}") from None
