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

__all__ = ["wbell_cg_solve", "wbell_cg_solve_multi",
           "WBellBlockJacobiPrecond", "wbell_poly_apply"]


import dataclasses as _dc


@jax.tree_util.register_dataclass
@_dc.dataclass(frozen=True)
class WBellBlockJacobiPrecond:
    """Supervariable block-Jacobi in WBELL's internal layout.

    The TPU-shaped block preconditioner for the unstructured engine
    (VERDICT r3 #6): the 8×8 diagonal blocks ALREADY exist densified in
    the slot planes (RCM + supervariable blocking groups strongly coupled
    rows into them), so the natural block-Jacobi is their exact inverse —
    extracted and inverted host-side once, applied on device as 8 fused
    multiply-adds over the sublane axis (``z[g,:,l] = B⁻¹[g,:,:,l]
    r[g,:,l]``).  No gathers, no layout round-trip, SPD by construction
    (diagonal blocks of an SPD matrix are SPD).
    """

    binv: jnp.ndarray          # (nt, 8, 8, 128) fp32 — per-block inverse

    @classmethod
    def from_wbell(cls, a: WBELLMatrix) -> "WBellBlockJacobiPrecond":
        """Extract + invert the diagonal 8×8 blocks from the slot planes
        (no CSR needed — the planes carry every stored block).

        The extraction runs ON DEVICE (mask + scatter-add): pulling the
        full plane array to the host first means a multi-hundred-MB
        device→host transfer per call, which is slow and measured flaky
        through the remote tunnel at GB scale; only the (n_blocks, 8, 8)
        diagonal blocks (~256 B/block) come back for the fp64 inversion.
        """
        import numpy as np

        lanes = jnp.arange(128, dtype=jnp.int32)
        # Absolute block col of (plane, lane) = p_ga*128 + lc; the block
        # row it accumulates into = p_og*128 + lane.
        abs_bc = a.p_ga[:, None] * 128 + a.lc[:, 0, :]     # (P, 128)
        abs_br = a.p_og[:, None] * 128 + lanes[None, :]
        # Zero-value phantom slots (lc==0 padding) can alias block col 0
        # — the scatter-ADD makes their contribution exactly zero.
        mask = (abs_bc == abs_br).astype(a.values.dtype)
        contrib = a.values * mask[:, None, None, :]        # (P, 8, 8, 128)
        flat = contrib.transpose(0, 3, 1, 2).reshape(-1, 8, 8)
        idx = abs_br.reshape(-1)
        nbr = a.nt * 128
        blocks_dev = jnp.zeros((nbr, 8, 8), a.values.dtype).at[idx].add(
            flat)
        blocks = np.asarray(blocks_dev, np.float64)
        # Padding block rows (beyond the matrix) have all-zero blocks;
        # make them identity so the inverse exists and padding lanes
        # (zero in every solve vector) stay zero.
        zero_rows = ~blocks.any(axis=(1, 2))
        blocks[zero_rows] = np.eye(8)
        # Rank-deficient real blocks cannot occur for SPD input (their
        # diagonal entries are positive), but guard padding rows inside
        # partially-filled blocks: zero diagonal entries get 1.
        d = np.einsum("bii->bi", blocks)
        d[d == 0.0] = 1.0
        binv = np.linalg.inv(blocks)                  # (nbr, 8, 8)
        # (nt*128, 8, 8) → internal layout (nt, 8, 8, 128).
        binv = binv.reshape(a.nt, 128, 8, 8).transpose(0, 2, 3, 1)
        return cls(binv=jnp.asarray(binv, jnp.float32))

    def apply_internal(self, r: jnp.ndarray) -> jnp.ndarray:
        """(nt, 8, 128) internal-layout apply."""
        return jnp.einsum("gijl,gjl->gil", self.binv.astype(r.dtype), r)

    # Generic-solver protocol name: lets the object ride as a traced
    # argument through cg_solve / make_checkpointed_solver (its binv
    # planes must not be baked into the compile payload — HTTP 413 rule).
    apply = apply_internal


def wbell_poly_apply(a: WBELLMatrix, r: jnp.ndarray, idi: jnp.ndarray,
                     steps: int, omega: float) -> jnp.ndarray:
    """m-step damped-Jacobi polynomial apply in the internal layout —
    :class:`cgx.solve.precond.PolynomialPrecond` semantics with the WBELL
    engine as the matvec (each sweep is one slot-plane stream + fused
    axpys; VERDICT r3 #6)."""
    from cgx.kernels.wbell import wbell_spmv

    z = omega * idi * r
    for _ in range(steps - 1):
        z = z + omega * idi * (r - wbell_spmv(a, z))
    return z


# The matrix rides as a traced ARGUMENT: WBELL's densified slot planes
# reach hundreds of MB (thermal2-class: 19.9 k planes = 652 MB) and a
# closure would bake them into the compile payload, which the remote-TPU
# tunnel rejects (HTTP 413) — same rule as cgx/utils/checkpoint.py.
@partial(jax.jit, static_argnames=("tol", "atol", "maxiter",
                                   "track_history", "poly_steps",
                                   "poly_omega"))
def _wbell_cg(a, bi, xi0, idi, binv=None, *, tol, atol, maxiter,
              track_history, poly_steps=0, poly_omega=2.0 / 3.0):
    if poly_steps:
        precond = (lambda r: wbell_poly_apply(a, r, idi, poly_steps,
                                              poly_omega))
    elif binv is not None:
        m = WBellBlockJacobiPrecond(binv=binv)
        precond = m.apply_internal
    elif idi is not None:
        precond = (lambda r: r * idi)
    else:
        precond = None
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
    precond: Optional[object] = None,
    poly_steps: int = 3,
    poly_omega: float = 2.0 / 3.0,
    track_history: bool = False,
) -> CGResult:
    """Solve ``A x = b`` by (P)CG through the WBELL Pallas SpMV.

    ``b``/``x0`` are standard-order ``(n,)`` vectors; the returned
    ``CGResult.x`` is too.  ``inv_diag`` (standard order) overrides the
    matrix diagonal for the Jacobi scaling (exact-trajectory parity with
    a caller-supplied :class:`~cgx.solve.precond.JacobiPrecond`).

    ``precond``: the WBELL-layout preconditioner family (VERDICT r3 #6) —
    ``"poly"`` (``poly_steps``-step damped-Jacobi polynomial, each sweep
    one slot-plane stream), ``"block_jacobi"`` (exact inverses of the
    densified supervariable 8×8 blocks), a prebuilt
    :class:`WBellBlockJacobiPrecond`, or None.  All apply in the internal
    layout — no per-iteration gathers or layout round-trips.  Mutually
    exclusive with ``jacobi``.
    """
    n = b.shape[0]
    if maxiter is None:
        maxiter = n
    bi = a.to_internal(b)
    xi0 = a.to_internal(x0) if x0 is not None else None
    idi = None
    binv = None
    steps = 0
    if precond is not None and jacobi:
        raise ValueError("pass either jacobi=True or precond=, not both")
    if precond == "poly":
        idi = blas.safe_recip(a.diag_internal)
        steps = int(poly_steps)
    elif precond == "block_jacobi":
        binv = WBellBlockJacobiPrecond.from_wbell(a).binv
    elif isinstance(precond, WBellBlockJacobiPrecond):
        binv = precond.binv
    elif precond is not None:
        raise ValueError(f"unknown wbell precond {precond!r}; expected "
                         "'poly', 'block_jacobi', or a "
                         "WBellBlockJacobiPrecond")
    elif jacobi:
        idi = (a.to_internal(inv_diag) if inv_diag is not None
               else blas.safe_recip(a.diag_internal))
    res = _wbell_cg(a, bi, xi0, idi, binv, tol=float(tol),
                    atol=float(atol), maxiter=int(maxiter),
                    track_history=track_history, poly_steps=steps,
                    poly_omega=float(poly_omega))
    import dataclasses
    return dataclasses.replace(res, x=a.from_internal(res.x))


@partial(jax.jit, static_argnames=("tol", "atol", "maxiter",
                                   "poly_steps", "poly_omega"))
def _wbell_cg_multi(a, bi, xi0, idi, plan=None, binv=None, *, tol, atol,
                    maxiter, poly_steps=0, poly_omega=2.0 / 3.0):
    """Batched (P)CG in the internal layout: state ``(k, nt, 8,
    128)``, per-column α/β, one shared SpMM per iteration — the
    slot-plane stream (the dominant traffic) is paid ONCE for all k
    columns.  With ``plan`` (a :class:`~cgx.kernels.wbell.WBellTierPlan`)
    the SpMM runs the width-tiered kernel — the measured multi-RHS
    winner (0.707 vs 0.783 ms/RHS at thermal2 k=4, PERF_NOTES 5e).
    Preconditioners mirror the single-RHS surface: Jacobi (``idi``),
    supervariable block-Jacobi (``binv``), or the ``poly_steps``-step
    damped-Jacobi polynomial (each sweep one shared SpMM).  Semantics
    match :func:`cgx.solve.block.cg_solve_multi`'s batched results
    (each column its own convergence schedule; finished columns
    freeze)."""
    from cgx.kernels.wbell import wbell_spmm, wbell_spmm_tiered
    from cgx.solve.cg import CGResult

    k = bi.shape[0]
    f32 = jnp.float32

    if plan is not None:
        spmm = lambda x: wbell_spmm_tiered(plan, x)
    else:
        spmm = lambda x: wbell_spmm(a, x)

    def col_dot(u, v):
        return jnp.sum((u * v).astype(f32), axis=(1, 2, 3))

    if poly_steps:
        def apply_m(r):
            z = poly_omega * idi[None] * r
            for _ in range(poly_steps - 1):
                z = z + poly_omega * idi[None] * (r - spmm(z))
            return z
    elif binv is not None:
        def apply_m(r):
            return jnp.einsum("gijl,kgjl->kgil", binv.astype(r.dtype), r)
    else:
        def apply_m(r):
            return r * idi[None] if idi is not None else r

    precond_on = idi is not None or binv is not None
    x = bi * 0 if xi0 is None else xi0
    r = bi if xi0 is None else bi - spmm(xi0)
    z = apply_m(r)
    p = z
    rz = col_dot(r, z)
    rr = col_dot(r, r) if precond_on else rz
    bb = col_dot(bi, bi)
    tol_sq = jnp.maximum(jnp.asarray(tol, f32) ** 2 * bb,
                         jnp.asarray(atol, f32) ** 2)

    def cond(c):
        x, r, z, p, rz, rr, it = c
        return jnp.any((rr > tol_sq) & (it < maxiter))

    def body(c):
        x, r, z, p, rz, rr, it = c
        active = (rr > tol_sq) & (it < maxiter)
        q = spmm(p)
        pq = col_dot(p, q)
        alpha = jnp.where(active, rz / jnp.where(pq != 0, pq, 1.0), 0.0)
        ax = alpha[:, None, None, None].astype(x.dtype)
        x = x + ax * p
        r = r - ax * q
        z = apply_m(r)
        rz_new = col_dot(r, z)
        rr_new = col_dot(r, r) if precond_on else rz_new
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
    precond: Optional[object] = None,
    poly_steps: int = 3,
    poly_omega: float = 2.0 / 3.0,
    tiered: Optional[bool] = None,
    tier_plan=None,
) -> CGResult:
    """Multi-RHS ``A X = B`` through the WBELL SpMM kernel.

    ``b``: standard-order ``(n, k)``; results carry
    :func:`cgx.solve.block.cg_solve_multi`'s batch axes (``x``: (n, k);
    scalars (k,)).  The slot-plane stream is shared by all k columns.

    ``precond``: the same internal-layout family as
    :func:`wbell_cg_solve` — ``"poly"`` (damped-Jacobi polynomial, each
    sweep one shared SpMM), ``"block_jacobi"`` (supervariable 8×8
    inverses), a prebuilt :class:`WBellBlockJacobiPrecond`, or None;
    mutually exclusive with ``jacobi``.

    By default (``tiered=None`` → on when the resident kernel fits and
    ``span ≤ 16``) the SpMM runs the width-tiered resident kernel
    (:func:`cgx.kernels.wbell.build_tier_plan` — planes classed by
    ACTUAL window width with tight per-plane starts): measured
    **0.707 ms/RHS·iter at thermal2 k=4 vs 0.783 batched vs 0.876
    single** (PERF_NOTES 5e).  Round-5 measured negatives for the
    alternatives: column-stacked operands 0.968 (gathers are per-vreg),
    span-8 rebuild 0.831 (fill 21.7x), k=8 saturates at 0.779 — the
    per-column VPU chain is the floor, and the tier plan is the one
    lever that shortens it without paying fill.  Pass ``tier_plan`` to
    reuse a prebuilt plan across calls.
    """
    import dataclasses

    n, k = b.shape
    if maxiter is None:
        maxiter = n
    bi = jnp.stack([a.to_internal(b[:, j]) for j in range(k)])
    xi0 = (jnp.stack([a.to_internal(x0[:, j]) for j in range(k)])
           if x0 is not None else None)
    if precond is not None and jacobi:
        raise ValueError("pass either jacobi=True or precond=, not both")
    idi = None
    binv = None
    steps = 0
    if precond == "poly":
        idi = blas.safe_recip(a.diag_internal)
        steps = int(poly_steps)
    elif precond == "block_jacobi":
        binv = WBellBlockJacobiPrecond.from_wbell(a).binv
    elif isinstance(precond, WBellBlockJacobiPrecond):
        binv = precond.binv
    elif precond is not None:
        raise ValueError(f"unknown wbell precond {precond!r}; expected "
                         "'poly', 'block_jacobi', or a "
                         "WBellBlockJacobiPrecond")
    elif jacobi:
        idi = (a.to_internal(inv_diag) if inv_diag is not None
               else blas.safe_recip(a.diag_internal))
    plan = tier_plan
    if plan is None and tiered is not False:
        from cgx.kernels.wbell import _resident_fits, build_tier_plan
        if a.span <= 16 and _resident_fits(a, k):
            plan = build_tier_plan(a)
        elif tiered:
            raise ValueError("tiered=True needs span<=16 and the "
                             "resident-kernel VMEM footprint")
    res = _wbell_cg_multi(a, bi, xi0, idi, plan, binv, tol=float(tol),
                          atol=float(atol), maxiter=int(maxiter),
                          poly_steps=steps, poly_omega=float(poly_omega))
    x = jnp.stack([a.from_internal(res.x[j]) for j in range(k)], axis=1)
    return dataclasses.replace(res, x=x)
