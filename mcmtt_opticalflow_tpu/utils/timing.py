"""Per-stage timing + device profiling hooks.

Replaces the reference's clock() wall-timing scattered through the pipeline
(ref psn_where/PSNWhere.cpp:248-279; PSNWhere_Associator3D.cpp:446-488;
GraphSolver.cpp:535,663-668) with a structured stage timer, and exposes
jax.profiler tracing for xprof capture on TPU.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List


class StageTimer:
    """Accumulates wall time per named stage across frames."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.samples: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            self.samples[name].append(dt)

    def push(self, name: str) -> None:
        """Open a stage without lexical scoping (close with pop())."""
        if not hasattr(self, "_open"):
            self._open: List = []
        self._open.append((name, time.perf_counter()))

    def pop(self) -> None:
        name, t0 = self._open.pop()
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1
        self.samples[name].append(dt)

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            n = self.counts[name]
            tot = self.totals[name]
            med = sorted(self.samples[name])[n // 2] if n else 0.0
            lines.append(f"{name:30s} total={tot:8.3f}s "
                         f"mean={tot / max(n, 1) * 1e3:8.2f}ms "
                         f"med={med * 1e3:8.2f}ms n={n}")
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()
        self.samples.clear()


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a jax.profiler trace (view with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
