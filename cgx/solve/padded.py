"""Tile-aligned padded solves.

TPU tiles 1-D buffers in (8 sublanes × 128 lanes) blocks; a solve whose
dimension is not a multiple of 1024 runs every vector op against partially-
masked tiles.  Measured on a 216³ Poisson system (n = 10,077,696): the CG
iteration costs ~1.6 ms versus the ~0.2 ms the same traffic takes at an
aligned size — the entire gap is layout.

:func:`cg_solve_padded` zero-pads the problem to the next ``multiple`` and
runs the whole while_loop in padded space — exactly the shard-equalization
trick the distributed layer already plays (cgx.dist.partition), applied to
a single chip.  Operators that define ``matvec_padded`` (the stencils) run
natively in the padded space; stored formats get a slice→matvec→re-pad
wrapper (two cheap copies per iteration, still a large net win off-tile).
The padded tail stays exactly zero through CG (b_pad = 0 there, the matvec
masks its output rows), so dots and the convergence test are unaffected.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from cgx.solve.cg import CGResult, as_matvec, cg_solve

__all__ = ["cg_solve_padded", "padded_length"]


def padded_length(n: int, multiple: int = 1024) -> int:
    return -(-n // multiple) * multiple


def cg_solve_padded(
    a,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    *,
    multiple: int = 1024,
    tol: float = 1e-6,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    preconditioner=None,
    track_history: bool = False,
) -> CGResult:
    """:func:`cg_solve` semantics, executed in tile-aligned padded space."""
    n = b.shape[0]
    n_pad = padded_length(n, multiple)
    if n_pad == n:
        res = cg_solve(a, b, x0, tol=tol, atol=atol, maxiter=maxiter,
                       preconditioner=preconditioner,
                       track_history=track_history)
        return res

    pad = n_pad - n
    b_pad = jnp.pad(b, (0, pad))
    x0_pad = jnp.pad(x0, (0, pad)) if x0 is not None else None

    if hasattr(a, "matvec_padded"):
        mv = a.matvec_padded
    else:
        inner = as_matvec(a)

        def mv(v):
            return jnp.pad(inner(v[:n]), (0, pad))

    if preconditioner is None:
        precond = None
    else:
        apply = (preconditioner.apply if hasattr(preconditioner, "apply")
                 else preconditioner)

        def precond(r):
            return jnp.pad(apply(r[:n]), (0, pad))

    if maxiter is None:
        maxiter = n
    res = cg_solve(mv, b_pad, x0_pad, tol=tol, atol=atol,
                   maxiter=int(maxiter), preconditioner=precond,
                   track_history=track_history)
    return CGResult(x=res.x[:n], iterations=res.iterations,
                    residual_norm_sq=res.residual_norm_sq,
                    converged=res.converged, history=res.history)
