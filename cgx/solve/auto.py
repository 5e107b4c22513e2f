"""Solver auto-selection: route each problem to its measured-fastest path.

The measured decision surface (docs/PERF_NOTES.md, single v5e chip):

* 3-D stencil operators with ≥ ~3 M rows: XLA's loop-body fusion has
  collapsed (vector > VMEM) → the fused Pallas iteration wins ~5x
  (`cgx.kernels.fused_cg`); requires plain/Jacobi-equivalent CG and a TPU
  backend.
* Everything else: the XLA while_loop (`cg_solve`), in tile-padded space
  when the dimension is off-tile (`cg_solve_padded`).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from cgx.solve.cg import CGResult
from cgx.solve.padded import cg_solve_padded, padded_length

__all__ = ["auto_solve", "FUSED_MIN_ROWS"]

# XLA's CG-body mega-fusion holds up to one vector per VMEM (measured
# 40.6 us/iter at 2.1 M rows vs 600 us/iter at 4.1 M rows, fp32).
FUSED_MIN_ROWS = 2_000_000  # fused measured faster from 128^3 up
# (31.9 vs 40.6 us/iter at 128^3; 114.9 vs 600 at 160^3; 564 vs 1086 at
# 216^3)


def auto_solve(
    a,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    *,
    tol: float = 1e-6,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    preconditioner=None,
    track_history: bool = False,
) -> CGResult:
    """:func:`cg_solve` semantics with backend auto-selection."""
    from cgx.kernels import fused_cg
    from cgx.kernels import fused_dia_cg as fdc
    from cgx.solve.precond import JacobiPrecond
    from cgx.sparse.stencil import Stencil3D

    n = b.shape[0]
    on_tpu = jax.default_backend() == "tpu"
    mi = int(maxiter) if maxiter is not None else n
    if (on_tpu and preconditioner is None and isinstance(a, Stencil3D)
            and fused_cg.supports(a) and n >= FUSED_MIN_ROWS):
        return fused_cg.fused_stencil_cg(
            a, b, x0, tol=tol, atol=atol, maxiter=mi,
            track_history=track_history)
    # Variable-coefficient 7-point DIA: fused path covers plain CG and
    # Jacobi (the caller's JacobiPrecond.inv_diag is passed through, so a
    # custom diagonal keeps its exact trajectory).
    jac = isinstance(preconditioner, JacobiPrecond)
    # Routing to the fused DIA path additionally requires zero entries at
    # every x-plane-crossing slot (the lane layout drops those — see
    # fused_dia_cg.wrap_entries_zero).  The check is data-dependent, so
    # under jit (traced data) we conservatively fall back to the XLA path;
    # callers who know their operator is wrap-free can call fused_dia_cg
    # directly inside jit.
    def _dia_ok(d):
        if not (fdc.supports_dia(d) and n >= FUSED_MIN_ROWS):
            return False
        if isinstance(d.data, jax.core.Tracer):
            return False
        return fdc.wrap_entries_zero(d)

    if on_tpu and (preconditioner is None or jac) and _dia_ok(a):
        return fdc.fused_dia_cg(
            a, b, x0, tol=tol, atol=atol, jacobi=jac,
            inv_diag=preconditioner.inv_diag if jac else None,
            maxiter=mi, track_history=track_history)
    if padded_length(n) != n:
        return cg_solve_padded(a, b, x0, tol=tol, atol=atol,
                               maxiter=maxiter,
                               preconditioner=preconditioner,
                               track_history=track_history)
    from cgx.solve.cg import cg_solve
    return cg_solve(a, b, x0, tol=tol, atol=atol, maxiter=maxiter,
                    preconditioner=preconditioner,
                    track_history=track_history)
