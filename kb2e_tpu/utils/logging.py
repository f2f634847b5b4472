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
