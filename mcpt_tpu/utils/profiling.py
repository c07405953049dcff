"""Observability: phase timers, throughput counters, jax.profiler traces.

The reference's only instrumentation is a wall-clock printout and a console
progress bar (SURVEY.md §5 "tracing/profiling"). Here: named phase timers
(host-side, accumulated), a rays/s meter fed by the integrator's PathStats,
and a context manager around `jax.profiler.trace` for on-device traces
viewable in TensorBoard/Perfetto.
"""

import contextlib
import time
from collections import defaultdict


class PhaseTimer:
    """Accumulating named timers: scene compile, BVH build, trace, I/O."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.monotonic()
        try:
            yield
        finally:
            self.totals[name] += time.monotonic() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = [
            f"  {name:<24} {self.totals[name]:8.3f}s  x{self.counts[name]}"
            for name in sorted(self.totals, key=self.totals.get, reverse=True)
        ]
        return "phase timings:\n" + "\n".join(lines) if lines else "no phases"


class ThroughputMeter:
    """Rays/s and paths/s over a sliding window."""

    def __init__(self):
        self.t0 = time.monotonic()
        self.rays = 0
        self.paths = 0

    def add(self, rays: int, paths: int) -> None:
        self.rays += int(rays)
        self.paths += int(paths)

    @property
    def elapsed(self) -> float:
        return time.monotonic() - self.t0

    def report(self) -> dict:
        dt = max(self.elapsed, 1e-9)
        return {
            "rays": self.rays,
            "paths": self.paths,
            "rays_per_s": self.rays / dt,
            "paths_per_s": self.paths / dt,
            "elapsed_s": dt,
        }


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """jax.profiler trace when log_dir is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
