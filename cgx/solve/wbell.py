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

__all__ = ["wbell_cg_solve", "wbell_cg_solve_multi"]


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


@partial(jax.jit, static_argnames=("tol", "atol", "maxiter"))
def _wbell_cg_multi(a, bi, xi0, idi, *, tol, atol, maxiter):
    """Batched (Jacobi-)CG in the internal layout: state ``(k, nt, 8,
    128)``, per-column α/β, one shared :func:`wbell_spmm` per iteration —
    the slot-plane stream (the dominant traffic) is paid ONCE for all k
    columns.  Semantics match :func:`cgx.solve.block.cg_solve_multi`'s
    batched results (each column its own convergence schedule; finished
    columns freeze)."""
    from cgx.kernels.wbell import wbell_spmm
    from cgx.solve.cg import CGResult

    k = bi.shape[0]
    f32 = jnp.float32

    def col_dot(u, v):
        return jnp.sum((u * v).astype(f32), axis=(1, 2, 3))

    def apply_m(r):
        return r * idi[None] if idi is not None else r

    x = bi * 0 if xi0 is None else xi0
    r = bi if xi0 is None else bi - wbell_spmm(a, xi0)
    z = apply_m(r)
    p = z
    rz = col_dot(r, z)
    rr = col_dot(r, r) if idi is not None else rz
    bb = col_dot(bi, bi)
    tol_sq = jnp.maximum(jnp.asarray(tol, f32) ** 2 * bb,
                         jnp.asarray(atol, f32) ** 2)

    def cond(c):
        x, r, z, p, rz, rr, it = c
        return jnp.any((rr > tol_sq) & (it < maxiter))

    def body(c):
        x, r, z, p, rz, rr, it = c
        active = (rr > tol_sq) & (it < maxiter)
        q = wbell_spmm(a, p)
        pq = col_dot(p, q)
        alpha = jnp.where(active, rz / jnp.where(pq != 0, pq, 1.0), 0.0)
        ax = alpha[:, None, None, None].astype(x.dtype)
        x = x + ax * p
        r = r - ax * q
        z = apply_m(r)
        rz_new = col_dot(r, z)
        rr_new = col_dot(r, r) if idi is not None else rz_new
        beta = jnp.where(active, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
        bx = beta[:, None, None, None].astype(x.dtype)
        p = jnp.where(active[:, None, None, None], z + bx * p, p)
        return (x, r, z, p, jnp.where(active, rz_new, rz),
                jnp.where(active, rr_new, rr), it + active)

    it0 = jnp.zeros((k,), jnp.int32)
    x, r, z, p, rz, rr, it = jax.lax.while_loop(
        cond, body, (x, r, z, p, rz, rr, it0))
    return CGResult(x=x, iterations=it, residual_norm_sq=rr,
                    converged=rr <= tol_sq,
                    history=jnp.zeros((0,), f32))


def wbell_cg_solve_multi(
    a: WBELLMatrix,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    *,
    tol: float = 1e-6,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    jacobi: bool = False,
    inv_diag: Optional[jnp.ndarray] = None,
) -> CGResult:
    """Multi-RHS ``A X = B`` through the WBELL SpMM kernel.

    ``b``: standard-order ``(n, k)``; results carry
    :func:`cgx.solve.block.cg_solve_multi`'s batch axes (``x``: (n, k);
    scalars (k,)).  The matrix stream — ~95 % of per-iteration traffic at
    supervariable fill — is shared by all k columns, so additional RHS
    are nearly free (the multi-RHS analogue of the DIA band engine, but
    with an even stronger amortization ratio).
    """
    import dataclasses

    n, k = b.shape
    if maxiter is None:
        maxiter = n
    bi = jnp.stack([a.to_internal(b[:, j]) for j in range(k)])
    xi0 = (jnp.stack([a.to_internal(x0[:, j]) for j in range(k)])
           if x0 is not None else None)
    idi = None
    if jacobi:
        idi = (a.to_internal(inv_diag) if inv_diag is not None
               else blas.safe_recip(a.diag_internal))
    res = _wbell_cg_multi(a, bi, xi0, idi, tol=float(tol),
                          atol=float(atol), maxiter=int(maxiter))
    x = jnp.stack([a.from_internal(res.x[j]) for j in range(k)], axis=1)
    return dataclasses.replace(res, x=x)
