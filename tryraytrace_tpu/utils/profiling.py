"""Profiling helpers: per-phase wall clock + jax.profiler traces.

The reference's only perf instrumentation is a commented-out chrono
probe (pipeline.cpp:73-82) and the window-title HUD.  Here:
``PhaseTimer`` aggregates named phases (build/upload/render/tonemap)
and prints ms/frame + Mrays/s; ``trace_context`` wraps a block in a
jax.profiler trace for TensorBoard/XProf when TPURT_TRACE_DIR is set.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict

import jax


class PhaseTimer:
    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items()):
            n = max(self.counts[name], 1)
            lines.append(f"{name}: {total * 1e3:.1f} ms total, "
                         f"{total / n * 1e3:.2f} ms/call x{n}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace_context(name: str):
    """jax.profiler trace when TPURT_TRACE_DIR is set, else a no-op."""
    trace_dir = os.environ.get("TPURT_TRACE_DIR")
    if not trace_dir:
        yield
        return
    with jax.profiler.trace(trace_dir):
        with jax.profiler.TraceAnnotation(name):
            yield


def mrays_per_sec(rays: float, seconds: float) -> float:
    return rays / max(seconds, 1e-12) / 1e6
