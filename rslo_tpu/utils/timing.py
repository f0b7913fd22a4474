"""Profiling / tracing harness.

The analog of the reference's measure_time timers
(/root/reference/rslo/models/voxel_odom_net.py:241-278 with
cuda.synchronize): named sections timed with ``block_until_ready``
barriers, plus a wrapper around ``jax.profiler`` traces for deep dives.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class SectionTimer:
    """Accumulates wall time per named section (device-synchronized)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.total = defaultdict(float)
        self.count = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, sync_value=None):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        yield
        if sync_value is not None:
            jax.block_until_ready(sync_value)
        self.total[name] += time.perf_counter() - t0
        self.count[name] += 1

    def avg_ms(self) -> dict:
        return {k: self.total[k] / max(self.count[k], 1) * 1e3
                for k in self.total}

    def report(self) -> str:
        return " | ".join(f"{k}: {v:.2f}ms"
                          for k, v in sorted(self.avg_ms().items()))


@contextlib.contextmanager
def profile_trace(logdir: str, enabled: bool = True):
    """jax.profiler trace context (view in TensorBoard / xprof)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
