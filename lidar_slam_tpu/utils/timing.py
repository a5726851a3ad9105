"""Timing and profiling instrumentation.

Replaces the reference's three TicToc copies + ad-hoc chrono printfs
(include/.../tools/tic_toc.hpp, A-LOAM tic_toc.h, loop_closing/tictoc.h;
front_end.cpp:224-231) with one utility that also understands JAX async
dispatch (block_until_ready before stopping the clock) and exposes
`jax.profiler` traces for real kernel-level analysis (SURVEY.md §5.1).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class TicToc:
    """Reference-compatible stopwatch; `toc()` returns milliseconds."""

    def __init__(self):
        self.tic()

    def tic(self) -> None:
        self._t0 = time.perf_counter()

    def toc(self, block_on=None) -> float:
        if block_on is not None:
            jax.block_until_ready(block_on)
        return (time.perf_counter() - self._t0) * 1000.0


class StageTimer:
    """Accumulating per-stage wall-clock statistics for pipeline loops."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": self.totals[k],
                "count": self.counts[k],
                "mean_ms": 1000.0 * self.totals[k] / max(self.counts[k], 1),
            }
            for k in self.totals
        }

    def report(self) -> str:
        lines = []
        for k, v in sorted(self.summary().items(), key=lambda kv: -kv[1]["total_s"]):
            lines.append(f"{k:30s} {v['mean_ms']:8.2f} ms/call x{v['count']}")
        return "\n".join(lines)


def trace_annotation(name: str):
    """Named region visible in jax.profiler / XLA traces."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def profiler_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
