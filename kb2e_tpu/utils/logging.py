"""Structured metrics logging (survey §5.5).

The reference logs via raw printf (per-epoch loss at common/trainer.cpp:105,
eval progress at common/evaluation.cpp:243).  Here metrics are emitted as
JSONL records through a pluggable sink, defaulting to stdout, so production
runs get machine-readable observability without a heavyweight dependency.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Callable, Optional, TextIO


class MetricsLogger:
    def __init__(
        self,
        sink: Optional[Callable[[dict], None]] = None,
        stream: Optional[TextIO] = None,
    ):
        self._sink = sink
        self._stream = stream

    def log(self, record: dict) -> None:
        record = {"ts": time.time(), **record}
        if self._sink is not None:
            self._sink(record)
        if self._stream is not None:
            self._stream.write(json.dumps(record) + "\n")
            self._stream.flush()


def jsonl_logger(path: Optional[str] = None) -> MetricsLogger:
    stream = open(path, "a", encoding="utf-8") if path else sys.stdout
    return MetricsLogger(stream=stream)


class TensorBoardSink:
    """Optional TensorBoard scalar sink (survey §5.5 'optional TensorBoard').

    Lazily imports ``torch.utils.tensorboard`` so the core framework keeps no
    TensorBoard dependency; constructing the sink without the package raises
    with a pointer to the JSONL sink that always works.
    """

    def __init__(self, log_dir: str):
        try:
            from torch.utils.tensorboard import SummaryWriter
        except ImportError as e:  # pragma: no cover - env always has torch
            raise ImportError(
                "TensorBoard logging needs torch with the 'tensorboard' "
                "package installed; use the JSONL metrics sink "
                "(--metrics-jsonl) instead"
            ) from e
        self._writer = SummaryWriter(log_dir)

    def __call__(self, record: dict) -> None:
        step = int(record.get("epoch", 0))
        for key, value in record.items():
            if key in ("ts", "epoch"):
                continue
            # bools are ints in Python; logging them as 0/1 scalars would be
            # silent garbage — skip them.
            if isinstance(value, (int, float)) and not isinstance(value, bool):
                self._writer.add_scalar(key, value, step)
        self._writer.flush()

    def close(self) -> None:
        self._writer.close()


def fan_out(*fns: Optional[Callable[[dict], None]]) -> Optional[Callable[[dict], None]]:
    """Compose metric sinks; None entries are dropped (None if all are)."""
    live = [f for f in fns if f is not None]
    if not live:
        return None
    if len(live) == 1:
        return live[0]

    def emit(record: dict) -> None:
        for f in live:
            f(record)

    return emit
