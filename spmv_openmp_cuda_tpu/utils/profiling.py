"""Tracing / profiling utilities.

Analog of the reference's two-level timing (SURVEY.md section 5: wall time
around the kernel call + internal ElapsedInternal inside it, via
omp_get_wtime / CUDA SDK timers), plus jax.profiler trace capture the
reference has no equivalent of.
"""
from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Optional

import jax


@dataclasses.dataclass
class Timings:
    """Two-level timing record (Elapsed / ElapsedInternal analog)."""

    wall: float = 0.0  # includes host prep + transfer + dispatch
    internal: float = 0.0  # device compute (amortized chained reps)


@contextlib.contextmanager
def wall_timer(t: Timings):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        t.wall = time.perf_counter() - t0


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace (TensorBoard format) when log_dir is set;
    no-op otherwise."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
