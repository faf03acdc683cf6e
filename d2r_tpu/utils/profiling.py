"""Tracing / profiling (SURVEY.md section 5.1).

The reference's only observability is a tqdm bar refreshed every 2 steps and
a writer hardwired to None (ref: modules/train.py:113-137; run.py:122). The
TPU-native equivalent: jax.profiler trace capture around training steps plus
named annotations, viewable in TensorBoard / Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def maybe_profile(profile_dir: Optional[str]) -> Iterator[None]:
    """Capture a device trace into ``profile_dir`` when set, else no-op."""
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()
    else:
        yield


def annotate(name: str):
    """Named trace annotation for host-side phases."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Steady-state step timing with compile-step exclusion."""

    def __init__(self, skip_first: int = 1):
        self.skip_first = skip_first
        self._times = []
        self._count = 0
        self._t = None

    def start(self):
        self._t = time.perf_counter()

    def stop(self):
        dt = time.perf_counter() - self._t
        self._count += 1
        if self._count > self.skip_first:
            self._times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self._times) / len(self._times) if self._times else float("nan")

    def percentile(self, p: float) -> float:
        if not self._times:
            return float("nan")
        xs = sorted(self._times)
        idx = min(int(len(xs) * p / 100.0), len(xs) - 1)
        return xs[idx]
