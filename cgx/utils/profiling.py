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

__all__ = ["trace", "time_fresh", "solve_stats", "annotate",
           "trace_report", "overlap_report"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile the enclosed block: ``with trace('/tmp/tb'): solve(...)``.

    View with TensorBoard's profile plugin or Perfetto, or parse directly
    with :func:`trace_report` / :func:`overlap_report` (no TensorBoard
    needed).
    """
    import jax

    jax.profiler.start_trace(log_dir)
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


def trace_report(log_dir: str, device_only: bool = True,
                 top: Optional[int] = 25) -> list:
    """Per-op timing table from a captured trace (round-1 ROADMAP #13).

    Parses the ``.xplane.pb`` files :func:`trace` wrote (no TensorBoard /
    protobuf dependency — :mod:`cgx.utils.xplane`) and aggregates event
    durations per op name.  Returns dicts sorted by total time:
    ``{"plane", "line", "op", "count", "total_us", "avg_us"}``.
    """
    from collections import defaultdict

    from cgx.utils.xplane import load_xspace

    acc = defaultdict(lambda: [0, 0])        # (plane, line, op) -> [n, ps]
    for plane in load_xspace(log_dir):
        if device_only and not ("TPU" in plane.name or "GPU" in plane.name
                                or "Device" in plane.name
                                or "/device:" in plane.name):
            continue
        for line in plane.lines:
            for e in line.events:
                k = (plane.name, line.label, e.name)
                acc[k][0] += 1
                acc[k][1] += e.duration_ps
    rows = [{"plane": p, "line": ln, "op": op, "count": n,
             "total_us": ps / 1e6, "avg_us": ps / n / 1e6}
            for (p, ln, op), (n, ps) in acc.items()]
    rows.sort(key=lambda r: -r["total_us"])
    return rows[:top] if top else rows


def overlap_report(log_dir: str, a_keys=("dma", "copy"),
                   b_keys=("fusion", "custom", "call", "while")) -> dict:
    """Measure concurrency between two event families on the device
    timeline — the evidence for 'the halo exchange / window DMA actually
    overlaps compute' (VERDICT r1 weak #3).

    Classifies device-plane events whose (lowercased) name contains any of
    ``a_keys`` vs ``b_keys``, merges each family's intervals, and returns
    total and intersection times: ``overlap_frac`` is the fraction of
    family-A time hidden under family B.
    """
    from cgx.utils.xplane import load_xspace

    def merged(intervals):
        out = []
        for s, e in sorted(intervals):
            if out and s <= out[-1][1]:
                out[-1][1] = max(out[-1][1], e)
            else:
                out.append([s, e])
        return out

    a_iv, b_iv = [], []
    for plane in load_xspace(log_dir):
        if not ("TPU" in plane.name or "GPU" in plane.name
                or "/device:" in plane.name or "Device" in plane.name):
            continue
        for line in plane.lines:
            base = line.timestamp_ns * 1000   # ns -> ps
            for e in line.events:
                name = e.name.lower()
                iv = (base + e.offset_ps, base + e.end_ps)
                if any(k in name for k in a_keys):
                    a_iv.append(iv)
                elif any(k in name for k in b_keys):
                    b_iv.append(iv)
    a_m, b_m = merged(a_iv), merged(b_iv)

    def total(iv):
        return sum(e - s for s, e in iv)

    inter = 0
    j = 0
    for s, e in a_m:
        while j < len(b_m) and b_m[j][1] <= s:
            j += 1
        k = j
        while k < len(b_m) and b_m[k][0] < e:
            inter += min(e, b_m[k][1]) - max(s, b_m[k][0])
            k += 1
    ta = total(a_m)
    return {"a_total_us": ta / 1e6, "b_total_us": total(b_m) / 1e6,
            "overlap_us": inter / 1e6,
            "overlap_frac": inter / ta if ta else 0.0,
            "a_events": len(a_iv), "b_events": len(b_iv)}


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
