"""Observability: profiling traces, step timing, tiles/sec counters.

The reference has only thop FLOPs counters and print-based progress
(SURVEY.md 5.1); here we wire jax.profiler and a throughput meter (the
north-star metric is 256^2 tiles/sec/chip).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span for host-side phases."""
    return jax.profiler.TraceAnnotation(name)


class Throughput:
    """Sliding-window items/sec meter (tiles, patches, samples)."""

    def __init__(self, unit: str = "tiles"):
        self.unit = unit
        self.t0: Optional[float] = None
        self.count = 0.0

    def start(self) -> None:
        self.t0 = time.perf_counter()
        self.count = 0.0

    def add(self, n: float) -> None:
        if self.t0 is None:
            self.start()
        self.count += n

    @property
    def per_sec(self) -> float:
        if self.t0 is None or self.count == 0:
            return 0.0
        return self.count / (time.perf_counter() - self.t0)

    def report(self) -> str:
        return f"{self.per_sec:.4f} {self.unit}/s"


def model_flops(fn, *args) -> Optional[float]:
    """Static FLOPs estimate of a jitted function via XLA cost analysis
    (replaces the reference's thop counters, blocks.py:474-491)."""
    try:
        an = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return float(an.get("flops", 0.0))
    except Exception:
        return None
