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

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from cgx.ops import blas
from cgx.solve.cg import CGResult, cg_solve
from cgx.sparse.wbell import WBELLMatrix

__all__ = ["wbell_cg_solve"]


# The matrix rides as a traced ARGUMENT: WBELL's densified slot planes
# reach hundreds of MB (thermal2-class: 19.9 k planes = 652 MB) and a
# closure would bake them into the compile payload, which the remote-TPU
# tunnel rejects (HTTP 413) — same rule as cgx/utils/checkpoint.py.
@partial(jax.jit, static_argnames=("tol", "atol", "maxiter",
                                   "track_history"))
def _wbell_cg(a, bi, xi0, idi, *, tol, atol, maxiter, track_history):
    precond = None if idi is None else (lambda r: r * idi)
    return cg_solve(a, bi, xi0, tol=tol, atol=atol, maxiter=maxiter,
                    preconditioner=precond, track_history=track_history)


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
    n = b.shape[0]
    if maxiter is None:
        maxiter = n
    bi = a.to_internal(b)
    xi0 = a.to_internal(x0) if x0 is not None else None
    idi = None
    if jacobi:
        idi = (a.to_internal(inv_diag) if inv_diag is not None
               else blas.safe_recip(a.diag_internal))
    res = _wbell_cg(a, bi, xi0, idi, tol=float(tol), atol=float(atol),
                    maxiter=int(maxiter), track_history=track_history)
    import dataclasses
    return dataclasses.replace(res, x=a.from_internal(res.x))
