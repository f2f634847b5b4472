"""Canonical PartitionSpecs for Trans* parameters and batches.

Design rules (survey §5.8):
* entity table [N, k]      — rows sharded over ``model`` (the big table),
* relation tables [R, k]   — replicated (R ≪ N; cheap, avoids a gather per
                             sample for the always-needed relation rows),
* TransR proj [R, k, k]    — sharded over ``model`` on the relation axis
                             (the other big table: FB15k is 1345·k² floats),
* TransH norms [R, k]      — replicated like relations,
* CTransR relation_c/centers [R, C, k] — sharded over ``model`` on the
                             relation axis: the expert-parallel analogue
                             (survey §2.1 — per-relation-cluster vectors ≈
                             routed experts; routing is the per-triple
                             nearest-center assignment),
* batches [B]              — sharded over ``data``.
"""

from __future__ import annotations

from typing import Dict

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PARAM_SPECS: Dict[str, P] = {
    "entity": P("model", None),
    "relation": P(None, None),
    "norm": P(None, None),
    "proj": P("model", None, None),
    "relation_c": P("model", None, None),
    "centers": P("model", None, None),
    # PTransE: inverse-relation table and RNN composition matrix — small,
    # replicated like the relation table.
    "relation_inv": P(None, None),
    "comp_w": P(None, None),
}

BATCH_SPEC = P("data")
REPLICATED = P()


def param_shardings(mesh: Mesh, params) -> Dict:
    """NamedShardings for a params pytree, keyed like PARAM_SPECS."""
    return {k: NamedSharding(mesh, PARAM_SPECS[k]) for k in params}


def place_params(mesh: Mesh, params):
    import jax

    shardings = param_shardings(mesh, params)
    return {k: jax.device_put(v, shardings[k]) for k, v in params.items()}
