"""Wall-clock timers and running meters.

Mirrors /root/reference/pretrain/pointcontrast/lib/timer.py:9-61 (Timer with
tic/toc incl. average, AverageMeter with variance) — the reference's only
profiling machinery; `jax.profiler` traces cover the device side.
"""
from __future__ import annotations

import time


class Timer:
    def __init__(self):
        self.reset()

    def reset(self):
        self.total_time = 0.0
        self.calls = 0
        self.start_time = 0.0
        self.diff = 0.0
        self.avg = 0.0

    def tic(self):
        self.start_time = time.perf_counter()

    def toc(self, average: bool = True) -> float:
        self.diff = time.perf_counter() - self.start_time
        self.total_time += self.diff
        self.calls += 1
        self.avg = self.total_time / self.calls
        return self.avg if average else self.diff


class AverageMeter:
    """Running mean + (sample) variance."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.sq_sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count
        self.sq_sum += val**2 * n
        if self.count > 1:
            self.var = (self.sq_sum - self.sum**2 / self.count) / (self.count - 1)
        else:
            self.var = 0.0
