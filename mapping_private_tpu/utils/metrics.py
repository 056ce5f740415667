"""Metrics & profiling — the first-class replacement for the reference's
ad-hoc timing (SURVEY §5.1: `ros::Time::now()` deltas in noise_removal.cpp
:66-93, `my_clock()` in c3_hlac_tools.h:47-49, `search_time` in search.h:55,
pcl ScopeTime in realtime_segmentation.cpp:45-46) and its verbosity-gated
ROS_INFO logging (`verbosity_level_`, cloud_algos.h:24,27).

- StageTimer: named wall-clock stages with device sync (block_until_ready)
  so device work is attributed to the stage that launched it.
- Counters/gauges with a one-line report.
- trace(): wraps a block in the JAX profiler when a trace dir is set.
- log(): verbosity-gated printing; every op can share one Metrics object.
"""
from __future__ import annotations

import contextlib
import dataclasses
import time
from collections import defaultdict
from typing import Any, Dict, Iterator, Optional


def _sync(x: Any) -> None:
    try:
        import jax

        jax.block_until_ready(x)
    except Exception:
        pass


@dataclasses.dataclass
class StageStats:
    count: int = 0
    total_s: float = 0.0
    min_s: float = float("inf")
    max_s: float = 0.0

    def add(self, dt: float) -> None:
        self.count += 1
        self.total_s += dt
        self.min_s = min(self.min_s, dt)
        self.max_s = max(self.max_s, dt)

    @property
    def mean_s(self) -> float:
        return self.total_s / max(self.count, 1)


class Metrics:
    def __init__(self, verbosity: int = 0, trace_dir: Optional[str] = None):
        self.verbosity = verbosity
        self.trace_dir = trace_dir
        self.stages: Dict[str, StageStats] = defaultdict(StageStats)
        self.counters: Dict[str, float] = defaultdict(float)

    # -- timing --------------------------------------------------------------
    @contextlib.contextmanager
    def stage(self, name: str, sync_result: Any = None) -> Iterator[None]:
        """Time a named stage; pass the stage's output arrays as
        sync_result to attribute async device work correctly."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_result is not None:
                _sync(sync_result)
            dt = time.perf_counter() - t0
            self.stages[name].add(dt)
            self.log(1, f"[{name}] {dt * 1e3:.2f} ms")

    def time_fn(self, name: str, fn, *args, **kwargs):
        """Run fn, sync its output, record under name, return the output."""
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        _sync(out)
        self.stages[name].add(time.perf_counter() - t0)
        return out

    # -- counters ------------------------------------------------------------
    def count(self, name: str, value: float = 1.0) -> None:
        self.counters[name] += value

    # -- profiler ------------------------------------------------------------
    @contextlib.contextmanager
    def trace(self, label: str = "trace") -> Iterator[None]:
        """JAX profiler trace of the block (set trace_dir to enable)."""
        if not self.trace_dir:
            yield
            return
        import jax

        with jax.profiler.trace(self.trace_dir):
            with jax.profiler.TraceAnnotation(label):
                yield

    # -- logging -------------------------------------------------------------
    def log(self, level: int, msg: str) -> None:
        if self.verbosity >= level:
            print(msg, flush=True)

    # -- reporting -----------------------------------------------------------
    def report(self) -> str:
        lines = ["stage                          count    mean_ms     total_s"]
        for name in sorted(self.stages):
            s = self.stages[name]
            lines.append(
                f"{name:<30} {s.count:>6} {s.mean_s * 1e3:>10.2f} {s.total_s:>11.3f}"
            )
        for name in sorted(self.counters):
            lines.append(f"{name:<30} {self.counters[name]:>6g}")
        return "\n".join(lines)


# a default process-wide instance (ops accept their own when needed)
metrics = Metrics()
