"""Multi-RHS solves: batched CG over a block of right-hand sides.

The reference solves a single RHS (``cg.c:88-141``); the north star adds
SpMM (BASELINE.json).  :func:`cg_solve_multi` vmaps the whole CG
``while_loop`` over RHS columns: the per-column matvecs batch into one SpMM
per iteration (``vmap`` of the DIA/stencil/ELL matvec lowers to exactly the
:func:`cgx.ops.spmv.spmm` computation), so k RHS cost ≈ one solve's memory
traffic on the operator plus k vectors — far better than k sequential
solves.  Each column keeps its own α/β scalars and converges on its own
schedule (finished columns coast at zero extra math but keep streaming; for
very uneven spectra prefer separate solves).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from cgx.solve.cg import CGResult, as_matvec, cg_solve

__all__ = ["cg_solve_multi"]


def _fused_multi_backend(a, b, preconditioner):
    """``("stencil"|"dia", jacobi)`` if the fused multi engine can run
    this (operator pattern + preconditioner compatibility), else None."""
    from cgx.kernels.fused_cg import supports
    from cgx.kernels.fused_dia_cg import (supports_dia,
                                          wrap_entries_zero_or_none)
    from cgx.solve.precond import JacobiPrecond

    if preconditioner is None and supports(a):
        return ("stencil", False)
    jac = isinstance(preconditioner, JacobiPrecond)
    if ((preconditioner is None or jac) and supports_dia(a)
            and wrap_entries_zero_or_none(a) is True):
        return ("dia", jac)
    return None


def cg_solve_multi(
    a,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    *,
    tol: float = 1e-6,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    preconditioner=None,
    backend: str = "auto",
) -> CGResult:
    """Solve ``A X = B`` column-by-column with one batched CG loop.

    ``b``: (n, k) block of right-hand sides.  Returns a :class:`CGResult`
    whose fields carry a trailing/leading batch axis (``x``: (n, k);
    ``iterations``/``converged``/``residual_norm_sq``: (k,)).

    ``backend``: ``"auto"`` routes large fused-capable problems on TPU to
    the band-stacked Pallas engine (:mod:`cgx.kernels.fused_multi` — the
    coefficient planes stream once for all k columns); ``"xla"`` forces
    the vmapped while_loop; ``"fused"`` forces the engine.
    """
    if b.ndim != 2:
        raise ValueError(f"cg_solve_multi expects b of shape (n, k), "
                         f"got {b.shape}")
    if backend not in ("auto", "xla", "fused"):
        raise ValueError(f"unknown backend {backend!r}")
    if backend != "xla":
        routed = _fused_multi_backend(a, b, preconditioner)
        if routed is not None or backend == "fused":
            if routed is None:
                raise ValueError("backend='fused': operator/preconditioner "
                                 "not fused-capable")
            kind, jac = routed
            if backend == "auto":
                import jax as _jax
                from cgx.solve.auto import FUSED_MIN_ROWS
                if (_jax.default_backend() != "tpu"
                        or b.shape[0] < FUSED_MIN_ROWS):
                    routed = None
            if routed is not None:
                mi = int(maxiter) if maxiter is not None else b.shape[0]
                if kind == "stencil":
                    from cgx.kernels.fused_multi import fused_stencil_cg_multi
                    return fused_stencil_cg_multi(a, b, x0, tol=tol,
                                                  atol=atol, maxiter=mi)
                from cgx.kernels.fused_multi import fused_dia_cg_multi
                return fused_dia_cg_multi(
                    a, b, x0, tol=tol, atol=atol, maxiter=mi, jacobi=jac,
                    inv_diag=preconditioner.inv_diag if jac else None)
    matvec = as_matvec(a)
    if maxiter is None:
        maxiter = b.shape[0]

    def one(b_col, x0_col):
        return cg_solve(matvec, b_col, x0_col, tol=tol, atol=atol,
                        maxiter=int(maxiter), preconditioner=preconditioner)

    if x0 is None:
        x0 = jnp.zeros_like(b)
    res = jax.vmap(one, in_axes=(1, 1), out_axes=CGResult(
        x=1, iterations=0, residual_norm_sq=0, converged=0, history=0))(
            b, x0)
    return res
