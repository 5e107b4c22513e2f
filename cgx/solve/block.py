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

from cgx.solve.cg import CGResult, _as_apply, as_matvec, cg_solve

__all__ = ["cg_solve_multi", "block_cg_solve"]


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


def _narrow_band(a) -> bool:
    """Whether a fused-capable DIA operator streams few enough coefficient
    planes that k sequential single-RHS fused solves beat the band-stacked
    engine (measured: 7-point sym — 3-4 streamed planes — loses 0.93x
    through the band engine; 27-point sym — 14 planes — wins 1.79x).
    Threshold: < 5 streamed planes = narrow."""
    from cgx.kernels.fused_dia_cg import data_symmetric_or_none

    offs = tuple(map(int, a.offsets))
    sym = data_symmetric_or_none(a) is True
    n_planes = (1 + sum(1 for o in offs if o > 0)) if sym else len(offs)
    return n_planes < 5


def _sequential_fused_multi(kind, a, b, x0, *, tol, atol, maxiter,
                            jacobi, preconditioner) -> CGResult:
    """k single-RHS fused solves, results stacked with the batched-result
    axes of :func:`cg_solve_multi`.

    One jitted per-column solve is built and REUSED for all k columns —
    calling the engine eagerly per column would retrace/recompile the
    Pallas kernels every time (measured: seconds per column on the
    tunnel).  The DIA route passes the operator as a traced argument
    with ``assume_symmetric`` resolved from the concrete data here,
    outside the jit (the PERF_NOTES measurement-protocol trap: a traced
    ``d.data`` silently falls back to the non-symmetric engine)."""
    from cgx.kernels.fused_cg import fused_stencil_cg
    from cgx.kernels.fused_dia_cg import data_symmetric_or_none, fused_dia_cg

    interpret = jax.default_backend() != "tpu"
    if kind == "stencil":
        # Stencil operators are all-static pytrees — closing over is free.
        @jax.jit
        def sol(col, x0col):
            return fused_stencil_cg(a, col, x0col, tol=tol, atol=atol,
                                    maxiter=maxiter, interpret=interpret)

        cols = [sol(b[:, j], None if x0 is None else x0[:, j])
                for j in range(b.shape[1])]
    else:
        sym = data_symmetric_or_none(a)
        invd = preconditioner.inv_diag if jacobi else None

        @jax.jit
        def sol(a_, invd_, col, x0col):
            return fused_dia_cg(a_, col, x0col, tol=tol, atol=atol,
                                maxiter=maxiter, jacobi=jacobi,
                                inv_diag=invd_, interpret=interpret,
                                assume_symmetric=sym)

        cols = [sol(a, invd, b[:, j], None if x0 is None else x0[:, j])
                for j in range(b.shape[1])]
    return CGResult(
        x=jnp.stack([c.x for c in cols], axis=1),
        iterations=jnp.stack([c.iterations for c in cols]),
        residual_norm_sq=jnp.stack([c.residual_norm_sq for c in cols]),
        converged=jnp.stack([c.converged for c in cols]),
        history=jnp.stack([c.history for c in cols]))


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

    ``backend``: ``"auto"`` routes large fused-capable problems on TPU by
    the MEASURED winner per operator class (BASELINE round 2: the
    band-stacked engine amortizes coefficient-plane streams k-ways, so it
    wins 1.79x on wide-tap 27-point DIA but LOSES 0.93x on narrow-band
    7-point DIA, where only ~3-4 shared plane streams stand against k
    per-band vector streams): wide-tap DIA → the band-stacked Pallas
    engine (:mod:`cgx.kernels.fused_multi`); narrow-band DIA → k
    sequential single-RHS fused solves; constant-coefficient stencils
    (zero plane streams, but one compiled loop for all k) → the band
    engine.  ``"xla"`` forces the vmapped while_loop; ``"fused"`` forces
    the band engine; ``"sequential"`` forces per-column fused solves.
    """
    if b.ndim != 2:
        raise ValueError(f"cg_solve_multi expects b of shape (n, k), "
                         f"got {b.shape}")
    if backend not in ("auto", "xla", "fused", "sequential"):
        raise ValueError(f"unknown backend {backend!r}")
    if backend != "xla":
        routed = _fused_multi_backend(a, b, preconditioner)
        if routed is not None or backend in ("fused", "sequential"):
            if routed is None:
                raise ValueError(f"backend={backend!r}: operator/"
                                 "preconditioner not fused-capable")
            kind, jac = routed
            if backend == "auto":
                import jax as _jax
                from cgx.solve.auto import FUSED_MIN_ROWS
                if (_jax.default_backend() != "tpu"
                        or b.shape[0] < FUSED_MIN_ROWS):
                    routed = None
            if routed is not None:
                mi = int(maxiter) if maxiter is not None else b.shape[0]
                mode = backend
                if backend == "auto":
                    mode = ("sequential"
                            if kind == "dia" and _narrow_band(a) else
                            "fused")
                if mode == "sequential":
                    return _sequential_fused_multi(
                        kind, a, b, x0, tol=tol, atol=atol, maxiter=mi,
                        jacobi=jac, preconditioner=preconditioner)
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


def block_cg_solve(
    a,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    *,
    tol: float = 1e-6,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    preconditioner=None,
) -> CGResult:
    """TRUE block CG: all ``k`` columns share one Krylov space, so
    spectrally clustered RHS families converge in substantially fewer
    iterations than independent per-column recurrences
    (:func:`cg_solve_multi`) — each extra RHS effectively deflates the
    spectrum for the others.

    Breakdown-free form (BFBCG, Ji & Li 2017): the direction block ``P``
    is re-orthonormalized by thin QR every iteration, which keeps the
    k×k system ``PᵀAP`` SPD with conditioning bounded by the OPERATOR's
    spectrum — independent of how converged individual columns are.
    The naive O'Leary Gram recurrence collapses in fp32 on TPU exactly
    when columns start converging; this form does not.  Per iteration:
    one SpMM, one (n, k) thin QR, and a handful of k×k Cholesky solves
    and (k, n)·(n, k) Gram matmuls with fp32 accumulation — MXU work,
    amortized over the SpMM.

    Stops when EVERY column satisfies ``‖r_j‖ ≤ max(tol·‖b_j‖, atol)``
    or at ``maxiter``.
    """
    if b.ndim != 2:
        raise ValueError(f"block_cg_solve expects b of shape (n, k), "
                         f"got {b.shape}")
    n, k = b.shape
    if maxiter is None:
        maxiter = n
    matvec = as_matvec(a)
    mv = jax.vmap(matvec, in_axes=1, out_axes=1)    # (n, k) SpMM
    if preconditioner is None:
        def apply_m(r):
            return r
    else:
        apply_m = jax.vmap(_as_apply(preconditioner), in_axes=1, out_axes=1)

    f32 = jnp.float32 if b.dtype in (jnp.dtype(jnp.bfloat16),
                                     jnp.dtype(jnp.float16),
                                     jnp.dtype(jnp.float32)) else b.dtype

    def gram(u, v):
        # (k, k) = uᵀ v with accumulation in f32 (or f64 on CPU inputs).
        return jnp.matmul(u.astype(f32).T, v.astype(f32),
                          preferred_element_type=f32)

    def solve_spd(g, rhs):
        # g = PᵀAP with orthonormal P: SPD, cond(g) ≤ cond(A).  A tiny
        # relative jitter guards the Cholesky against fp32 roundoff on
        # the last bits; it does not change the math at convergence.
        eps = (jnp.trace(g) / k) * jnp.asarray(1e-6 if f32 == jnp.float32
                                               else 1e-14, f32) \
            + jnp.asarray(1e-30, f32)
        c, low = jax.scipy.linalg.cho_factor(
            g + eps * jnp.eye(k, dtype=f32), lower=True)
        return jax.scipy.linalg.cho_solve((c, low), rhs)

    def orth(u):
        # Thin QR in f32; near-zero columns yield arbitrary-but-
        # orthonormal replacements (harmless extra search directions).
        q, _ = jnp.linalg.qr(u.astype(f32))
        return q

    if x0 is None:
        x = jnp.zeros_like(b)
        r = b
    else:
        x = x0.astype(b.dtype)
        r = b - mv(x)
    p = orth(apply_m(r))
    bb = jnp.sum(b.astype(f32) ** 2, axis=0)         # (k,)
    tol_sq = jnp.maximum(jnp.asarray(tol, f32) ** 2 * bb,
                         jnp.asarray(atol, f32) ** 2)
    rr0 = jnp.sum(r.astype(f32) ** 2, axis=0)

    def cond(c):
        x, r, p, rr, it = c
        return jnp.logical_and(it < maxiter, jnp.any(rr > tol_sq))

    def body(c):
        x, r, p, rr, it = c
        q = mv(p.astype(b.dtype))
        g = gram(p, q)                               # (k, k) SPD
        alpha = solve_spd(g, gram(p, r))             # (k, k)
        x = x + (p @ alpha).astype(b.dtype)
        r = r - (q.astype(f32) @ alpha).astype(b.dtype)
        z = apply_m(r)
        beta = -solve_spd(g, gram(q, z))             # (k, k)
        p = orth(z.astype(f32) + p @ beta)
        rr = jnp.sum(r.astype(f32) ** 2, axis=0)
        return (x, r, p, rr, it + 1)

    x, r, p, rr, it = jax.lax.while_loop(
        cond, body, (x, r, p, rr0, jnp.zeros((), jnp.int32)))
    return CGResult(x=x,
                    iterations=jnp.broadcast_to(it, (k,)),
                    residual_norm_sq=rr.astype(b.dtype),
                    converged=rr <= tol_sq,
                    history=jnp.zeros((0,), b.dtype))
