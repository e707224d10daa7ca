"""Tracing / profiling utilities.

Reference equivalent: CUDACallback (main.py:423-443) — per-epoch wall clock +
peak memory. Here: jax.profiler trace capture, per-step timing with device
sync, and HBM usage readout (when the backend exposes memory stats).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

__all__ = ["StepTimer", "trace", "device_memory_stats"]


class StepTimer:
    """Rolling per-step timing with explicit device sync on sample points."""

    def __init__(self, sync_every: int = 50):
        self.sync_every = sync_every
        self.t0: Optional[float] = None
        self.steps = 0
        self.history: list[float] = []

    def start(self):
        self.t0 = time.perf_counter()
        self.steps = 0

    def step(self, result=None) -> Optional[float]:
        """Call once per train step; returns steps/sec on sync points."""
        self.steps += 1
        if self.steps % self.sync_every:
            return None
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        sps = self.sync_every / (now - self.t0) if self.t0 else 0.0
        self.t0 = now
        self.history.append(sps)
        return sps


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context; view with tensorboard/xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None) -> dict:
    d = device or jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    if not stats:
        return {}
    return {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
    }
