"""Profiling & observability: per-stage timers + jax.profiler traces.

The reference has only a wall-clock FPS log (run_batrack.py:73-80) and a
dormant enable_timing flag (batrack.py:48); here timing is first-class
(SURVEY.md §5): a StageTimer accumulates per-stage wall times across the run
and `trace` wraps jax.profiler for TensorBoard-viewable device traces.

NOTE (this environment): the tunneled TPU executes asynchronously even
through block_until_ready, so honest device timings must fetch a value;
StageTimer.timed(..., sync=value_fn) supports that.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Callable, Dict, Optional


class StageTimer:
    """Accumulates wall time per named stage."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def timed(self, name: str, sync: Optional[Callable] = None):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                sync()
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = [f"{'stage':>20} | {'total s':>9} | {'calls':>6} | {'ms/call':>8}"]
        for name in sorted(self.totals, key=lambda k: -self.totals[k]):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:>20} | {t:9.3f} | {c:6d} | {t / c * 1000:8.1f}")
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, float]:
        return dict(self.totals)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/batrack_tpu_trace"):
    """jax.profiler trace context (view with TensorBoard's profile plugin)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
