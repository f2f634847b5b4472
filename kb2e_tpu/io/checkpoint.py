"""Native sharded checkpoints (Orbax) + resume.

The reference's only persistence is write-once-at-end text files plus
TransR's seed-file warm start (survey §5.4).  For production training this
module adds mid-training checkpoint/resume of the full params pytree and the
step counter, preserving shardings, via Orbax/tensorstore.  The text format
(kb2e_tpu/io/text.py) remains the interop format with the reference binaries.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save(path: str, params: Dict[str, Any], step: int = 0, extra: Optional[dict] = None) -> None:
    """Save params (+ scalar training state) to ``path`` (a directory)."""
    payload = {"params": params, "meta": {"step": step, **(extra or {})}}
    _checkpointer().save(os.path.abspath(path), payload, force=True)


def restore(path: str) -> Tuple[Dict[str, Any], int]:
    """Load a checkpoint saved by :func:`save`; returns (params, step)."""
    payload = _checkpointer().restore(os.path.abspath(path))
    return payload["params"], int(payload["meta"]["step"])


def restore_sharded(path: str, shardings: Dict[str, Any]) -> Tuple[Dict[str, Any], int]:
    """Restore a checkpoint directly onto a (possibly multi-process) mesh.

    ``shardings`` maps param names to ``jax.sharding.Sharding``; every array
    is materialised as a global jax.Array with that sharding — each process
    reads only its own shards from the tensorstore payload.  This is the
    multi-host resume path (survey §5.3): after a host failure, all processes
    re-initialise and call this with the same global shardings.
    """
    import jax
    import orbax.checkpoint as ocp

    del jax  # structure is known; no tree walking needed
    ckptr = _checkpointer()
    abs_path = os.path.abspath(path)
    meta = ckptr.metadata(abs_path)
    tree = (meta.item_metadata if hasattr(meta, "item_metadata") else meta).tree
    restore_args = {
        "params": {
            name: ocp.ArrayRestoreArgs(
                sharding=shardings[name],
                global_shape=tuple(m.shape),
                dtype=m.dtype,
            )
            for name, m in tree["params"].items()
        },
        "meta": {name: ocp.RestoreArgs() for name in tree["meta"]},
    }
    payload = ckptr.restore(abs_path, restore_args=restore_args)
    return payload["params"], int(payload["meta"]["step"])


def latest_in(dir_path: str, prefix: str = "ckpt_") -> Optional[str]:
    """Most recent checkpoint directory under ``dir_path`` by step suffix."""
    if not os.path.isdir(dir_path):
        return None
    best, best_step = None, -1
    for name in os.listdir(dir_path):
        if name.startswith(prefix):
            try:
                step = int(name[len(prefix):])
            except ValueError:
                continue
            if step > best_step:
                best, best_step = os.path.join(dir_path, name), step
    return best
