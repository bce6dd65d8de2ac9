"""Tracing / profiling hooks (SURVEY.md §5.1 — absent in the reference).

* :class:`StepTimer` — per-step wall timing with p50/p90 percentiles and
  samples/s, logged every N steps;
* :func:`trace` — context manager around ``jax.profiler`` trace collection
  (TensorBoard-viewable), enabled by ``TrainConfig.profile_dir``;
* :func:`annotate` — named trace regions for host-side phases (data load,
  collate, device put).
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import jax


class StepTimer:
    def __init__(self, window: int = 200):
        self.window = window
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, n_samples: int = 0) -> float:
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    def percentile(self, q: float) -> float:
        if not self.times:
            return float("nan")
        s = sorted(self.times)
        idx = min(int(len(s) * q), len(s) - 1)
        return s[idx]

    @property
    def p50(self) -> float:
        return self.percentile(0.5)

    @property
    def p90(self) -> float:
        return self.percentile(0.9)

    def summary(self, batch_size: int) -> str:
        p50 = self.p50
        sps = batch_size / p50 if p50 > 0 else float("nan")
        return (f"p50 {p50 * 1e3:.1f} ms | p90 {self.p90 * 1e3:.1f} ms | "
                f"{sps:.1f} samples/s")


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named host-side trace region (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)
