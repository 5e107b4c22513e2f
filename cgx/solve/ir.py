"""Mixed-precision iterative-refinement CG (bf16 inner, fp32 outer).

The streaming-regime fused iteration is HBM-bandwidth-bound (measured:
kernel B runs at the chip's ~990 GB/s streaming limit — docs/PERF_NOTES.md
round 2), so halving the bytes per element halves the per-iteration cost.
bf16 CG alone stalls near its ~4e-3 unit roundoff; the classic fix
(Higham/Carson-style iterative refinement) keeps full accuracy:

    fp32 outer:  r = b − A·x           (true residual, fp32 SpMV)
    bf16 inner:  solve A·d ≈ r to ``inner_tol``  (fused Pallas engine,
                 all vector streams bf16; dot products accumulate fp32
                 inside the kernels regardless of vector dtype)
    fp32 outer:  x ← x + d

Each outer cycle multiplies the residual by ~``inner_tol``, so
``log(tol)/log(inner_tol)`` cycles reach fp32-level accuracy; the total
inner-iteration count matches a single fp32 solve to ``tol`` (CG error
reduction is geometric), but every inner iteration moves half the bytes.

The reference has no notion of precision control (fp64 throughout,
``mv_ops.h:17-23``); this is the TPU-native treatment of its solve
(``conj_grad``, cg.c:88-141) for bandwidth-bound scales.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from cgx.solve.cg import CGResult

__all__ = ["ir_cg_solve", "ir_supported"]


def ir_supported(a) -> bool:
    """Whether ``a`` has a fused-engine route for the bf16 inner solve
    (constant-coefficient stencil, or wrap-free banded DIA)."""
    from cgx.kernels import fused_cg
    from cgx.kernels.fused_dia_cg import supports_dia, wrap_entries_zero_or_none

    if fused_cg.supports(a):
        return True
    return bool(supports_dia(a) and wrap_entries_zero_or_none(a) is True)


def ir_cg_solve(a, b: jnp.ndarray, x0=None, *, tol: float = 1e-6,
                atol: float = 0.0, maxiter: int = 2000,
                inner_tol: float = 1e-2,
                inner_maxiter: Optional[int] = None,
                max_outer: int = 40,
                inner_dtype=jnp.bfloat16,
                inner_plane_dtype=None,
                preconditioner=None,
                interpret: bool = False) -> CGResult:
    """CG via mixed-precision iterative refinement.

    Semantics match ``cg_solve(a, b, x0, tol=..., maxiter=...)``: the
    returned residual is the TRUE fp32 residual ``‖b − A·x‖²`` (recomputed
    every outer cycle — strictly more trustworthy than the recurrence
    residual single-precision CG reports), ``iterations`` counts total
    INNER iterations across all cycles, and ``converged`` tests the same
    ``max(tol²·‖b‖², atol²)`` threshold.

    Args:
      a: fused-capable operator (``Stencil2D/3D``, ``GeneralStencil3D``,
        or banded ``DIAMatrix`` — see :func:`ir_supported`).
      inner_tol: relative residual reduction per inner solve.  Keep well
        above bf16 unit roundoff (~4e-3); 1e-2 is a robust default.
      inner_maxiter: cap per inner solve (default ``maxiter``).
      max_outer: outer-cycle cap (the loop also exits when an outer cycle
        fails to reduce the true residual — the bf16 stagnation guard).
      preconditioner: optional :class:`~cgx.solve.precond.JacobiPrecond`
        for DIA operators (applied inside the inner engine as diagonal
        scaling); stencil operators take ``None`` only.
      inner_dtype: inner vector dtype (bf16 default; fp32 turns this into
        plain restarted CG — useful for A/B measurement).
      inner_plane_dtype: coefficient-plane dtype for the inner DIA engine
        (vectors keep ``inner_dtype``).  ``inner_dtype=jnp.float32,
        inner_plane_dtype=jnp.bfloat16`` is the "bf16 operator, fp32
        vectors" mode: no per-iteration vector rounding (inner iteration
        counts match fp32) while the dominant plane streams halve — the
        per-cycle contraction floor is the ~4e-3 coefficient rounding, so
        keep ``inner_tol`` at or above that.  Ignored for stencil
        (constant-coefficient) operators, which stream no planes.
    """
    from cgx.kernels import fused_cg
    from cgx.kernels.fused_dia_cg import build_fused_dia
    from cgx.solve.precond import JacobiPrecond

    if inner_maxiter is None:
        inner_maxiter = maxiter
    inner_dtype = jnp.dtype(inner_dtype)
    b32 = b.astype(jnp.float32)
    n = b.shape[0]

    jac = isinstance(preconditioner, JacobiPrecond)
    if preconditioner is not None and not jac:
        raise ValueError("ir_cg_solve supports preconditioner=None or "
                         "JacobiPrecond (inner diagonal scaling) only")

    from cgx.kernels.fused_engine import from_layout

    if fused_cg.supports(a) and not jac:
        eng = fused_cg.build_fused(a, inner_dtype, interpret=interpret)
        eng32 = fused_cg.build_fused(a, jnp.float32, interpret=interpret)
        e = ee = inv_ee = None
    else:
        eng, e, _ = build_fused_dia(
            a, inner_dtype, jacobi=jac,
            inv_diag=preconditioner.inv_diag if jac else None,
            interpret=interpret, plane_dtype=inner_plane_dtype)
        eng32, e32f, _ = build_fused_dia(
            a, jnp.float32, jacobi=jac,
            inv_diag=preconditioner.inv_diag if jac else None,
            interpret=interpret)
        if e32f is None:
            # DIA with preconditioner=None: no diagonal scaling — the
            # engines solve the unscaled system (same code paths as the
            # stencil branch below).
            ee = inv_ee = None
        else:
            from cgx.ops.blas import safe_recip
            ee = e32f.astype(jnp.float32)
            inv_ee = safe_recip(ee)

    def outer_state(x):
        """``(r, rr)`` — the TRUE fp32 residual via the fp32 engine's
        fused matvec pass (one kernel-A launch, no XLA SpMV).  For the
        DIA path ``r`` is in SCALED space (``r̃ = e·(b − A·x)``), which is
        exactly the inner engine's RHS; ``rr`` is the true-space norm in
        both cases."""
        if e is None:
            st = eng32.init(b32, x)
        else:
            st = eng32.init(ee * b32, inv_ee * x)
        return from_layout(eng32.geom, st.r), st.rz[0, 1]

    def inner_correction(r32):
        """d ≈ A⁻¹·r from one bf16 fused solve (zero initial guess);
        ``r32`` is the :func:`outer_state` residual (scaled space for
        DIA), ``rr`` its true-space norm."""
        rr = jnp.sum(r32 * r32) if e is None else None
        st = eng.init(r32.astype(inner_dtype))
        st = eng.run(st, inner_maxiter,
                     inner_tol ** 2 * (st.rz[0, 1] if rr is None else rr))
        y = eng.result(st, 0.0).x.astype(jnp.float32)
        return (y if e is None else ee * y), st.k

    bb = jnp.sum(b32 * b32)
    tol_sq = jnp.maximum(jnp.asarray(tol, jnp.float32) ** 2 * bb,
                         jnp.asarray(atol, jnp.float32) ** 2)

    x_init = (jnp.zeros((n,), jnp.float32) if x0 is None
              else x0.astype(jnp.float32))
    if x0 is None:
        r_init = b32 if e is None else ee * b32
        rr_init = bb
    else:
        r_init, rr_init = outer_state(x_init)

    def cond(carry):
        x, r, rr, strikes, total, outer = carry
        return (rr > tol_sq) & (outer < max_outer) \
            & (total < maxiter) & (strikes < 2)

    def body(carry):
        x, r, rr, strikes, total, outer = carry
        d, k_in = inner_correction(r)
        x = x + d
        r, rr_new = outer_state(x)
        # Two-strikes stagnation guard: bf16 recurrence drift makes the
        # occasional cycle non-monotone (measured at 216³); only bail
        # after two consecutive cycles without progress.
        strikes = jnp.where(rr_new < rr, 0, strikes + 1)
        return (x, r, rr_new, strikes, total + k_in, outer + 1)

    x, r, rr, _, total, outer = jax.lax.while_loop(
        cond, body,
        (x_init, r_init, rr_init, jnp.zeros((), jnp.int32),
         jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)))

    # Robustness: if refinement stalled above tol (bf16 floor effects can
    # cap the per-cycle contraction), finish with a warm-started fp32
    # fused solve — ir_cg_solve then converges whenever fp32 CG would.
    def finish(args):
        x, total = args
        budget = jnp.maximum(maxiter - total, 0)
        if e is None:
            st = eng32.init(b32, x)
            st = eng32.run(st, budget, tol_sq)
            xf = eng32.result(st, tol_sq).x
        else:
            st = eng32.init(ee * b32, inv_ee * x)
            st = eng32.run(st, budget, tol_sq)
            xf = ee * eng32.result(st, tol_sq).x
        return xf, st.rz[0, 1], total + st.k

    def done(args):
        x, total = args
        return x, rr, total

    x, rr, total = jax.lax.cond(rr <= tol_sq, done, finish, (x, total))
    return CGResult(x=x.astype(b.dtype), iterations=total,
                    residual_norm_sq=rr, converged=rr <= tol_sq)
