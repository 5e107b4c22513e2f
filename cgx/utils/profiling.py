"""Tracing / profiling hooks (SURVEY.md §5.a).

The reference's only instrumentation is whole-second wall clock around the
solve (``time(NULL)``, ``cg.c:71-75``).  Here:

* :func:`trace` — context manager around ``jax.profiler`` emitting a
  Perfetto/TensorBoard trace of the device timeline.
* :func:`time_fresh` — wall-clock timing that defeats the remote-dispatch
  result cache by cycling distinct input contents (required on tunneled
  TPU backends, where repeated identical calls can return cached buffers).
* :func:`solve_stats` — derived metrics for a solve: per-iteration time,
  nnz/s, effective HBM bandwidth vs an operator byte model.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterable, Optional

import numpy as np

__all__ = ["trace", "time_fresh", "solve_stats", "annotate"]


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: int = 2):
    """Profile the enclosed block: ``with trace('/tmp/tb'): solve(...)``.

    View with TensorBoard's profile plugin or Perfetto (trace.json.gz under
    ``log_dir``).
    """
    import jax

    jax.profiler.start_trace(log_dir, host_tracer_level=host_tracer_level)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the device trace timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def time_fresh(fn: Callable, variants: Iterable, reps: int = 3) -> float:
    """Best wall time of ``fn(v)`` cycling distinct inputs ``variants``."""
    import jax

    variants = list(variants)
    best = float("inf")
    for i in range(reps):
        v = variants[i % len(variants)]
        t0 = time.perf_counter()
        jax.block_until_ready(fn(v))
        best = min(best, time.perf_counter() - t0)
    return best


def solve_stats(seconds: float, iterations: int, nnz: int,
                bytes_per_iter: Optional[int] = None) -> dict:
    """Throughput summary for a converged solve."""
    it = max(int(iterations), 1)
    per_iter = seconds / it
    out = {
        "seconds": seconds,
        "iterations": int(iterations),
        "s_per_iter": per_iter,
        "gnnz_per_s": nnz / per_iter / 1e9,
    }
    if bytes_per_iter:
        out["effective_gb_per_s"] = bytes_per_iter / per_iter / 1e9
    return out
