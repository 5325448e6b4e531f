"""Profiling / tracing utilities.

The reference has no profiling beyond tensorboard loss scalars (SURVEY.md §5
"Tracing/profiling: none beyond report_to tensorboard"). TPU-native build:

- `trace(logdir)`: context manager around `jax.profiler` emitting xplane
  dumps viewable in TensorBoard/XProf (device + host traces, HLO cost
  attribution).
- `start_server(port)`: live profiling endpoint for
  `tensorboard --logdir ... --load_fast=false` remote capture.
- `StepTimer`: lightweight wall-clock per-step timing with a sync callback,
  robust to async dispatch (important through the tunneled chip, where
  `block_until_ready` may not actually fence — see bench.py).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Callable, Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9999):
    """Start the live profiler endpoint (capture from TensorBoard)."""
    return jax.profiler.start_server(port)


def annotate(name: str):
    """Named region that shows up in the device trace."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Per-step timing with percentile summary.

    sync_fn is called before reading the clock (e.g. a scalar host readback
    of the step's loss); defaults to nothing.
    """

    def __init__(self, sync_fn: Optional[Callable] = None):
        self.sync_fn = sync_fn
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        if self.sync_fn:
            self.sync_fn()
        self._t0 = time.perf_counter()

    def stop(self):
        if self.sync_fn:
            self.sync_fn()
        assert self._t0 is not None
        self.times.append(time.perf_counter() - self._t0)
        self._t0 = None

    @contextlib.contextmanager
    def step(self):
        self.start()
        yield
        self.stop()

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        ts = sorted(self.times)
        n = len(ts)
        return {
            "steps": n,
            "mean_s": sum(ts) / n,
            "p50_s": ts[n // 2],
            "p90_s": ts[int(n * 0.9)],
            "max_s": ts[-1],
        }

    def save(self, path: str):
        with open(path, "w") as f:
            json.dump({"times_s": self.times, **self.summary()}, f, indent=2)
