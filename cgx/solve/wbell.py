"""CG over the WBELL unstructured-sparsity engine.

The solver-side half of SURVEY.md §2.1 #4 (reference anchor: ``conj_grad``
over a general CSR matrix, ``cg.c:88-141`` + ``mv_ops.c:160-201``): the
whole Krylov iteration runs in WBELL's internal ``(nt, 8, 128)`` layout —
the layout transform happens exactly twice per solve (b in, x out), never
per iteration.  Elementwise updates and the two global reductions are
layout-agnostic; padding lanes are zero in b, stay zero under the zero-row
padded operator, and therefore never perturb dots or the convergence test.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from cgx.ops import blas
from cgx.solve.cg import CGResult, cg_solve
from cgx.sparse.wbell import WBELLMatrix

__all__ = ["wbell_cg_solve"]


def wbell_cg_solve(
    a: WBELLMatrix,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    *,
    tol: float = 1e-6,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    jacobi: bool = False,
    inv_diag: Optional[jnp.ndarray] = None,
    track_history: bool = False,
) -> CGResult:
    """Solve ``A x = b`` by (Jacobi-preconditioned) CG through the WBELL
    Pallas SpMV.  ``b``/``x0`` are standard-order ``(n,)`` vectors; the
    returned ``CGResult.x`` is too.  ``inv_diag`` (standard order) overrides
    the matrix diagonal for the Jacobi scaling (exact-trajectory parity
    with a caller-supplied :class:`~cgx.solve.precond.JacobiPrecond`).
    """
    from cgx.ops.spmv import spmv

    n = b.shape[0]
    if maxiter is None:
        maxiter = n
    bi = a.to_internal(b)
    xi0 = a.to_internal(x0) if x0 is not None else None
    precond = None
    if jacobi:
        idi = (a.to_internal(inv_diag) if inv_diag is not None
               else blas.safe_recip(a.diag_internal))
        precond = lambda r: r * idi                # noqa: E731
    res = cg_solve(lambda v: spmv(a, v), bi, xi0, tol=tol, atol=atol,
                   maxiter=maxiter, preconditioner=precond,
                   track_history=track_history)
    import dataclasses
    return dataclasses.replace(res, x=a.from_internal(res.x))
