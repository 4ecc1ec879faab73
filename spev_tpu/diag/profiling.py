"""TPU profiling and step timing (absent in the reference; SURVEY.md §5.1).

- ``trace(dir)``: context manager around ``jax.profiler`` — view with
  TensorBoard or xprof.
- ``StepTimer`` / ``timed_steps``: block_until_ready-bracketed wall timing
  with warmup discard, the measurement discipline used by bench.py.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterable, List

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/spev_trace"):
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates blocked per-step wall times."""

    def __init__(self):
        self.times: List[float] = []

    @contextlib.contextmanager
    def step(self, result_getter: Callable = None):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)

    def record(self, fn: Callable, *args, **kw):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        self.times.append(time.perf_counter() - t0)
        return out

    def summary(self, warmup: int = 1) -> dict:
        t = self.times[warmup:] if len(self.times) > warmup else self.times
        if not t:
            return {"steps": 0}
        return {
            "steps": len(t),
            "mean_s": sum(t) / len(t),
            "min_s": min(t),
            "max_s": max(t),
        }


def timed_steps(fn: Callable, args_iter: Iterable, warmup: int = 1) -> dict:
    timer = StepTimer()
    for args in args_iter:
        timer.record(fn, *args)
    return timer.summary(warmup)
