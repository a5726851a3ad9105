"""Run-health watchdog for long mapping/localization sessions (SURVEY §5.3).

The reference has NO failure detection: its ROS nodes poll empty buffers
forever when an upstream stage dies, and its only runtime health signal is
the A-LOAM >100 ms budget warning (scanRegistration.cpp:454-455,
laserOdometry.cpp:595-597). This watchdog supersedes that with an explicit
health surface for the in-process pipeline:

- per-stage deadline warnings (the 100 ms budget, configurable per stage);
- a divergence alarm — pose jumps beyond a per-frame translation bound are
  how NDT/ICP failures actually present;
- anomaly counters (deadline misses, divergences, fused-kernel fallbacks)
  and a heartbeat timestamp a supervisor thread/process can poll;
- a run summary for the end-of-session report.

Pure host-side bookkeeping: nothing here touches device code or adds
dispatches.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np


@dataclass
class StageHealth:
    budget_ms: float
    calls: int = 0
    misses: int = 0
    total_ms: float = 0.0
    worst_ms: float = 0.0


@dataclass
class RunHealth:
    """Health surface for one pipeline run."""

    stage_budget_ms: float = 100.0  # the reference's real-time warn budget
    max_step_translation: float = 5.0  # per-frame pose jump alarm [m]
    stall_timeout_s: float = 60.0
    log: Optional[callable] = None  # warning sink (default: print to stderr)

    stages: Dict[str, StageHealth] = field(default_factory=dict)
    divergences: int = 0
    frames: int = 0
    last_heartbeat: float = field(default_factory=time.time)
    _last_position: Optional[np.ndarray] = None

    def _warn(self, msg: str) -> None:
        if self.log is not None:
            self.log(msg)
        else:
            import sys

            print(f"[watchdog] {msg}", file=sys.stderr, flush=True)

    @contextmanager
    def stage(self, name: str, budget_ms: Optional[float] = None):
        """Time one pipeline stage; warn when it blows its budget — the
        TPU-form of the reference's 'scan registration process over 100ms'."""
        st = self.stages.setdefault(
            name, StageHealth(budget_ms=budget_ms or self.stage_budget_ms)
        )
        t0 = time.time()
        yield
        ms = (time.time() - t0) * 1000.0
        st.calls += 1
        st.total_ms += ms
        st.worst_ms = max(st.worst_ms, ms)
        if ms > st.budget_ms:
            st.misses += 1
            self._warn(f"{name} took {ms:.1f} ms (budget {st.budget_ms:.0f} ms)")

    def frame(self, pose) -> bool:
        """Record a tracked frame; returns False when the pose step trips the
        divergence alarm (caller decides whether to gate/reset)."""
        self.frames += 1
        self.last_heartbeat = time.time()
        p = np.asarray(pose, np.float32)[:3, 3]
        ok = True
        if self._last_position is not None:
            step = float(np.linalg.norm(p - self._last_position))
            if step > self.max_step_translation or not np.isfinite(step):
                self.divergences += 1
                ok = False
                self._warn(
                    f"pose jumped {step:.2f} m in one frame "
                    f"(> {self.max_step_translation:.1f} m) — tracking divergence?"
                )
        self._last_position = p
        return ok

    def stalled(self, now: Optional[float] = None) -> bool:
        """True when no frame has been recorded within stall_timeout_s —
        pollable from a supervisor thread (the reference's dead-node case)."""
        return ((now or time.time()) - self.last_heartbeat) > self.stall_timeout_s

    def summary(self) -> dict:
        return {
            "frames": self.frames,
            "divergences": self.divergences,
            "stages": {
                k: {
                    "calls": v.calls,
                    "mean_ms": round(v.total_ms / max(v.calls, 1), 2),
                    "worst_ms": round(v.worst_ms, 2),
                    "budget_ms": v.budget_ms,
                    "misses": v.misses,
                }
                for k, v in self.stages.items()
            },
        }
