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


def cg_solve_multi(
    a,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    *,
    tol: float = 1e-6,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    preconditioner=None,
) -> CGResult:
    """Solve ``A X = B`` column-by-column with one batched CG loop.

    ``b``: (n, k) block of right-hand sides.  Returns a :class:`CGResult`
    whose fields carry a trailing/leading batch axis (``x``: (n, k);
    ``iterations``/``converged``/``residual_norm_sq``: (k,)).
    """
    if b.ndim != 2:
        raise ValueError(f"cg_solve_multi expects b of shape (n, k), "
                         f"got {b.shape}")
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
