"""tic/toc averaging timer for inference throughput
(reference DGDE/utils/timer.py:8-45). On TPU, calls
``jax.block_until_ready`` instead of cuda.synchronize."""

from __future__ import annotations

import time
from typing import Optional


class Timer:
    def __init__(self):
        self.reset()

    def reset(self):
        self.total_time = 0.0
        self.calls = 0
        self.start_time = 0.0
        self.diff = 0.0

    def tic(self):
        self.start_time = time.perf_counter()

    def toc(self, sync=None, average: bool = True) -> float:
        if sync is not None:
            import jax

            jax.block_until_ready(sync)
        self.diff = time.perf_counter() - self.start_time
        self.total_time += self.diff
        self.calls += 1
        return self.average_time if average else self.diff

    @property
    def average_time(self) -> float:
        return self.total_time / max(self.calls, 1)
