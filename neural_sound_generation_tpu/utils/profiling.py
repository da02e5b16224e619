"""Tracing and per-step timing.

The reference has no profiling at all (SURVEY §5: print + tqdm only).
TPU-native observability: ``trace_context`` wraps a block in a
``jax.profiler`` trace (viewable in TensorBoard/XProf), and ``StepTimer``
aggregates blocked per-step wall times with percentile summaries.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace_context(logdir: Optional[str] = None, name: str = "train"):
    """Profile the enclosed block. With ``logdir``, captures a full
    jax.profiler trace; always annotates with a named TraceAnnotation."""
    if logdir:
        jax.profiler.start_trace(logdir)
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    finally:
        if logdir:
            jax.profiler.stop_trace()


class StepTimer:
    """Blocked wall-clock timing of train steps.

    Usage::

        timer = StepTimer()
        for batch in loader:
            with timer.step():
                state, metrics = train_step(state, batch, key)
                jax.block_until_ready(metrics)
        print(timer.summary())
    """

    def __init__(self):
        self.times: List[float] = []

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)

    def summary(self, skip_first: int = 1) -> Dict[str, float]:
        """Stats over recorded steps, skipping compile-inflated warmup."""
        times = np.asarray(self.times[skip_first:] or self.times)
        if len(times) == 0:
            return {}
        return {
            "steps": int(len(times)),
            "mean_s": float(times.mean()),
            "p50_s": float(np.percentile(times, 50)),
            "p90_s": float(np.percentile(times, 90)),
            "steps_per_sec": float(1.0 / max(times.mean(), 1e-12)),
        }
