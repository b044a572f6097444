"""Metric logging: JSONL event stream + optional jax.profiler traces.

Replaces the reference's tensorboardX writers
(/root/reference/pretrain/pointcontrast/lib/ddp_trainer.py:145-146,265-268,
downstream/votenet_det_new/lib/utils/tf_logger.py:15-75) with a
dependency-free JSONL file (one {"step", "tag", "value", "time"} object per
line — trivially greppable/plottable) and a context manager around
``jax.profiler`` for on-demand device traces.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any


class MetricsLogger:
    def __init__(self, log_dir: str, filename: str = "metrics.jsonl"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, filename)
        self._f = open(self.path, "a", buffering=1)

    def add_scalar(self, tag: str, value: Any, step: int):
        self._f.write(
            json.dumps(
                {"step": int(step), "tag": tag, "value": float(value),
                 "time": time.time()}
            )
            + "\n"
        )

    def add_scalars(self, values: dict, step: int, prefix: str = ""):
        for k, v in values.items():
            try:
                self.add_scalar(prefix + k, float(v), step)
            except (TypeError, ValueError):
                continue

    def close(self):
        self._f.close()


def read_metrics(path: str) -> list[dict]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """Wrap a training region in a jax.profiler trace (viewable with
    tensorboard's profile plugin or xprof)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
