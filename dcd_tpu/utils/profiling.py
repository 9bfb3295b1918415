"""Step tracing / profiling helpers.

The reference's observability is a tic/toc Timer around the forward with
cuda.synchronize (DGDE/engine/inference.py:39-46) and MetricLogger
batch/data meters (trainer.py:122,157-159). TPU-native equivalent:
``jax.profiler`` traces with named step annotations + a simple step-time
meter.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace_session(logdir: Optional[str]) -> Iterator[None]:
    """Capture a profiler trace viewable in TensorBoard/XProf (no-op when
    logdir is None)."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def step_annotation(name: str):
    """Named region for the trace viewer."""
    return jax.profiler.StepTraceAnnotation(name)


class StepTimer:
    """Wall-clock step meter that forces device completion via a host
    fetch — ``block_until_ready`` alone does not synchronize on all
    platforms (notably the axon TPU tunnel)."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times = []
        self._t0 = None
        self._count = 0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result) -> float:
        import numpy as np

        leaf = jax.tree.leaves(result)[0]
        _ = np.asarray(leaf).ravel()[:1]  # forces completion
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)
