"""Per-phase wall-clock timers (the reference has none; needed for the
sec/volume headline metric and jax.profiler hooks)."""

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class PhaseTimer:
    """Accumulates wall-clock per named phase; optional jax.profiler traces."""

    def __init__(self, trace_dir: Optional[str] = None):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.trace_dir = trace_dir

    @contextlib.contextmanager
    def phase(self, name: str):
        ctx = contextlib.nullcontext()
        if self.trace_dir is not None:
            import jax
            ctx = jax.profiler.TraceAnnotation(name)
        t0 = time.perf_counter()
        with ctx:
            yield
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def summary(self) -> Dict[str, dict]:
        return {
            name: {"total_s": self.totals[name], "count": self.counts[name],
                   "mean_s": self.totals[name] / max(1, self.counts[name])}
            for name in self.totals
        }

    def report(self) -> str:
        lines = []
        for name, s in sorted(self.summary().items()):
            lines.append(f"{name:>24}: {s['total_s']:8.2f}s total "
                         f"({s['count']}x, {s['mean_s']:.2f}s avg)")
        return "\n".join(lines)
