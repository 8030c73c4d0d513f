"""Stage timing + device tracing — the observability layer the reference
lacks (SURVEY.md §5: only wall-clock bookends around tracking,
postProcessing.m:120-129, and a waitbar).

Two tools:

* ``StageTimer`` — hierarchical wall-clock stage accounting with derived
  throughput (samples/s, real-time factor), printable as the channel-
  status-style table the reference prints around tracking.
* ``device_trace`` — context manager wrapping ``jax.profiler`` so any
  pipeline section can be captured for xprof/tensorboard analysis
  (pass a trace_dir; no-op when None).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, Optional


@dataclass
class StageRecord:
    seconds: float = 0.0
    calls: int = 0
    samples: int = 0


@dataclass
class StageTimer:
    """Accumulates per-stage wall time and sample counts.

    >>> timer = StageTimer(sampling_freq=18e6)
    >>> with timer.stage("acquisition", samples=n):
    ...     acquire(...)
    >>> print(timer.report())
    """
    sampling_freq: float = 0.0
    stages: Dict[str, StageRecord] = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str, samples: int = 0):
        rec = self.stages.setdefault(name, StageRecord())
        t0 = time.perf_counter()
        try:
            yield rec
        finally:
            rec.seconds += time.perf_counter() - t0
            rec.calls += 1
            rec.samples += samples

    def realtime_factor(self, name: str) -> float:
        rec = self.stages.get(name)
        if not rec or not rec.seconds or not self.sampling_freq:
            return float("nan")
        return (rec.samples / rec.seconds) / self.sampling_freq

    def report(self) -> str:
        lines = ["Stage              time [s]   calls     Msamples  xRT"]
        total = 0.0
        for name, rec in self.stages.items():
            total += rec.seconds
            xrt = self.realtime_factor(name)
            lines.append(
                f"{name:<18} {rec.seconds:9.3f} {rec.calls:7d} "
                f"{rec.samples / 1e6:11.2f}  "
                f"{'' if xrt != xrt else f'{xrt:.2f}'}")
        lines.append(f"{'TOTAL':<18} {total:9.3f}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(trace_dir: Optional[str]):
    """jax.profiler trace of the enclosed block (no-op if trace_dir is
    falsy).  View with tensorboard/xprof."""
    if not trace_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
