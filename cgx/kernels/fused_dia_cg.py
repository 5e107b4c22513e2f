"""Fused (P)CG for variable-coefficient 7-point DIA operators.

Thin wrapper over the unified two-pass engine
(:mod:`cgx.kernels.fused_engine`).  Jacobi preconditioning is applied as a
one-time symmetric diagonal scaling ``Ã = E A E`` with ``E = diag(√(d⁻¹))``
— exactly Jacobi-PCG in exact arithmetic (the classic transform) — so the
hot loop is always *plain* fused CG: the scaled coefficient planes stream
through kernel A, and kernel B accumulates the true (unscaled) residual
norm with the per-row weight ``w = diag(A)`` so the convergence test and
history match ``cg_solve(d, b, preconditioner=JacobiPrecond...)``.

Layout constraint (unchanged from round 1): the lane-major layout drops
contributions at x-plane-crossing slots, so the data must be zero there —
see :func:`wrap_entries_zero`.  ``auto_solve`` checks before routing.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from cgx.kernels.fused_engine import FusedCG, make_geometry
from cgx.solve.cg import CGResult

__all__ = ["fused_dia_cg", "supports_dia", "dia_pattern_dims",
           "wrap_entries_zero", "wrap_entries_zero_or_none",
           "data_symmetric_or_none", "dia_prep", "build_fused_dia"]


def dia_pattern_dims(d) -> Optional[Tuple[int, int, int]]:
    """(nx, ny, nz) if ``d`` has the 3-D 7-point offset pattern, else None."""
    from cgx.sparse.types import DIAMatrix

    if not isinstance(d, DIAMatrix):
        return None
    offs = tuple(d.offsets)
    if len(offs) != 7:
        return None
    o3 = offs[6]
    o2 = offs[5]
    if offs != (-o3, -o2, -1, 0, 1, o2, o3):
        return None
    n = d.shape[0]
    if o2 <= 0 or o3 % o2 or n % o3:
        return None
    return (n // o3, o3 // o2, o2)


def supports_dia(d) -> bool:
    dims = dia_pattern_dims(d)
    return dims is not None and 1 <= dims[0] <= 4096


def wrap_entries_zero(d) -> bool:
    """True iff the DIA data is zero at every slot whose flat offset
    crosses an x-plane boundary — the positions the fused lane-major
    layout cannot represent.

    The (nx, ny·nz) layout keeps the lane axis contiguous over (y, z), so
    the ±1 and ±nz lane shifts are exact *within* an x-plane but read the
    layout's zero padding where the flat index would cross into the next
    x-plane: offset +1 at (x, ny-1, nz-1), offset -1 at (x, 0, 0), offset
    +nz anywhere in the j == ny-1 plane, offset -nz in j == 0.  A banded
    matrix with nonzero entries there is a *different operator* under the
    fused kernel than under the generic ``_dia_spmv``; callers must check
    this before routing (``auto_solve`` does).

    Requires concrete (non-traced) data; raises ``ValueError`` when
    called under tracing (use :func:`wrap_entries_zero_or_none` for a
    soft check) — the check is inherently data-dependent.
    """
    ok = wrap_entries_zero_or_none(d)
    if ok is None:
        raise ValueError(
            "wrap_entries_zero needs concrete DIA data (called under jit/"
            "tracing); check before jit, or call fused_dia_cg directly if "
            "the operator is known to have zero x-plane-crossing entries")
    return ok


def wrap_entries_zero_or_none(d):
    """Like :func:`wrap_entries_zero` but returns ``None`` when the check
    cannot run (traced data / called inside jit)."""
    dims = dia_pattern_dims(d)
    if dims is None:
        return False
    if isinstance(d.data, jax.core.Tracer):
        return None
    nx, ny, nz = dims

    def grid(k):
        return d.data[k].reshape(nx, ny, nz)

    # Slots where the flat offset crosses an x-plane (in-range only; slots
    # whose flat target falls outside the matrix are ignored either way).
    s = (jnp.sum(jnp.abs(grid(4)[:nx - 1, ny - 1, nz - 1]))   # +1
         + jnp.sum(jnp.abs(grid(2)[1:, 0, 0]))                # -1
         + jnp.sum(jnp.abs(grid(5)[:nx - 1, ny - 1, :]))      # +nz
         + jnp.sum(jnp.abs(grid(1)[1:, 0, :])))               # -nz
    try:
        return bool(s == 0)
    except jax.errors.TracerBoolConversionError:
        # Inside a trace even concrete operands produce tracers.
        return None


# Offset order (-o3, -o2, -1, 0, 1, o2, o3) in engine tap convention.
_DIA_TAPS = ((-1, 0, 0), (0, -1, 0), (0, 0, -1), (0, 0, 0), (0, 0, 1),
             (0, 1, 0), (1, 0, 0))
# Symmetric-mode taps: diagonal + one tap per ±off pair (engine mirrors).
_DIA_TAPS_SYM = ((0, 0, 0), (0, 0, 1), (0, 1, 0), (1, 0, 0))


def data_symmetric_or_none(d):
    """True iff the (concrete) DIA data describes a symmetric matrix:
    ``data[-off][i] == data[+off][i-off]`` for each offset pair.  ``None``
    when the data is traced (cannot check under jit)."""
    import numpy as np

    dims = dia_pattern_dims(d)
    if dims is None:
        return False
    if isinstance(d.data, jax.core.Tracer):
        return None
    data = np.asarray(d.data)
    for t_neg, t_pos in ((0, 6), (1, 5), (2, 4)):
        off = int(d.offsets[t_pos])
        if not np.allclose(data[t_neg][off:], data[t_pos][:-off],
                           rtol=1e-6, atol=0.0):
            return False
    return True


def _scaled_planes(d, e: jnp.ndarray, dtype) -> jnp.ndarray:
    """Symmetrically scaled coefficient planes: data'[t][i] =
    e[i]·data[t][i]·e[i+off] (row-aligned convention)."""
    from cgx.ops.spmv import shifted

    out = []
    for t, off in enumerate(d.offsets):
        plane = d.data[t].astype(dtype)
        out.append(e * plane * shifted(e, off))
    return jnp.stack(out)


def dia_prep(d, dtype, *, jacobi: bool = True, inv_diag=None,
             allow_sym: bool = True):
    """Engine-independent preparation for a 7-point DIA operator:
    ``(nx, ny, nz, taps, coeffs, planes, e, weight, sym)``.

    ``e = √(inv_diag)`` is the Jacobi scaling vector (``None`` when not
    preconditioning); the caller solves ``Ã y = e·b`` and recovers
    ``x = e·y``.  When the concrete data is symmetric (it must be, for
    CG) ``sym=True``: ``taps`` is :data:`_DIA_TAPS_SYM` and only the
    non-negative-offset planes are kept (the kernels mirror them).
    """
    import numpy as np

    dims = dia_pattern_dims(d)
    if dims is None or not supports_dia(d):
        raise ValueError("fused_dia_cg: operator lacks the 3-D 7-point "
                         "DIA pattern (or nx > 4096)")
    nx, ny, nz = dims
    if inv_diag is not None:
        invd = jnp.asarray(inv_diag, dtype)
    elif jacobi:
        from cgx.ops.blas import safe_recip
        invd = safe_recip(d.data[3].astype(dtype))
    else:
        invd = None

    # Symmetric scaling Ã = E A E preserves symmetry, so checking the raw
    # data (concrete even when b is traced) covers the scaled planes too.
    sym = bool(allow_sym and data_symmetric_or_none(d) is True)

    coeffs = (None,) * 7
    unit_diag = False
    if invd is None:
        planes = jnp.stack([d.data[t].astype(dtype)
                            for t in range(len(d.offsets))])
        e = None
        weight = None
    else:
        e = jnp.sqrt(invd)
        planes = _scaled_planes(d, e, dtype)
        from cgx.ops.blas import safe_recip
        weight = safe_recip(invd)              # = diag(A) for true ‖r‖²
        # After the symmetric scaling the diagonal plane is 1 (exactly, in
        # exact arithmetic) whenever inv_diag = 1/diag with no zero rows:
        # keep it as a constant tap instead of streaming a plane of ones —
        # one fewer full-vector pass per iteration.  Check on the concrete
        # host data (d.data is concrete even when b is traced).
        if not (isinstance(d.data, jax.core.Tracer)
                or isinstance(inv_diag, jax.core.Tracer)):
            # NB: np.asarray on the WHOLE concrete array, then index —
            # d.data[3] would be a traced op inside jit.
            diag_np = np.asarray(d.data, np.float64)[3]
            inv_np = (np.asarray(inv_diag, np.float64)
                      if inv_diag is not None
                      else np.where(diag_np != 0, 1.0 / np.where(
                          diag_np != 0, diag_np, 1.0), 0.0))
            if np.allclose(diag_np * inv_np, 1.0, rtol=1e-6, atol=1e-6):
                unit_diag = True
                coeffs = (None, None, None, 1.0, None, None, None)
                planes = jnp.concatenate([planes[:3], planes[4:]])

    if sym:
        # Keep only the non-negative-offset planes, in _DIA_TAPS_SYM
        # order: [diag unless folded to 1.0], +1, +o2, +o3.
        if unit_diag:
            coeffs = (1.0, None, None, None)
            planes = planes[3:]                 # (+1, +o2, +o3)
        else:
            coeffs = (None, None, None, None)
            planes = planes[3:]                 # (diag, +1, +o2, +o3)
        taps = _DIA_TAPS_SYM
    else:
        taps = _DIA_TAPS
    return nx, ny, nz, taps, coeffs, planes, e, weight, sym


def build_fused_dia(d, dtype, *, jacobi: bool = True, inv_diag=None,
                    n_shards: int = 1, axis_name: Optional[str] = None,
                    interpret: bool = False, allow_sym: bool = True):
    """``(engine, e, planes)`` for a 7-point DIA operator (see
    :func:`dia_prep` for the scaling/symmetry semantics).  The returned
    ``planes`` are the *global* scaled planes — shard them (and ``e``)
    before entering ``shard_map`` for the distributed path.

    In symmetric mode only the non-negative-offset planes stream
    (3 windows instead of 6 pipelined blocks — ~2.5 fewer passes/iter and
    half the plane HBM); ``allow_sym=False`` opts out (the band-stacked
    multi-RHS engine predates sym support).
    """
    nx, ny, nz, taps, coeffs, planes, e, weight, sym = dia_prep(
        d, dtype, jacobi=jacobi, inv_diag=inv_diag, allow_sym=allow_sym)

    if sym:
        n_win = 1 + sum(1 for c in coeffs if c is None)
        geom = make_geometry(nx, ny, nz, taps, n_shards=n_shards,
                             target_block_bytes=1 << 18,
                             a_window_streams=n_win)
    else:
        n_stream_planes = sum(1 for c in coeffs if c is None)
        geom = make_geometry(nx, ny, nz, taps, n_shards=n_shards,
                             target_block_bytes=1 << 18,
                             a_extra_streams=2 * n_stream_planes)

    if n_shards == 1:
        eng = FusedCG(geom, dtype=dtype, coeffs=coeffs, planes=planes,
                      weight=weight, axis_name=axis_name,
                      interpret=interpret, sym=sym)
        return eng, e, planes
    return geom, e, planes, weight, coeffs, sym   # dist builds per-shard


def fused_dia_cg(d, b: jnp.ndarray, x0=None, *, tol: float = 1e-6,
                 atol: float = 0.0, maxiter: int = 1000,
                 jacobi: bool = True, inv_diag=None,
                 track_history: bool = False,
                 interpret: bool = False) -> CGResult:
    """Jacobi-PCG (or plain CG with ``jacobi=False``) on a 7-point DIA
    operator, fused Pallas passes.  Matches ``cg_solve(d, b,
    preconditioner=JacobiPrecond.from_matrix(d))`` to fp32 roundoff.

    ``inv_diag``: explicit diagonal preconditioner values (overrides the
    operator-derived ``1/diag(A)``) — lets a caller-supplied
    :class:`~cgx.solve.precond.JacobiPrecond` keep its exact trajectory.
    """
    # The lane layout drops contributions at x-plane-crossing slots (see
    # wrap_entries_zero).  Verify when the data is concrete; under jit the
    # caller is responsible (auto_solve checks before routing here).
    if wrap_entries_zero_or_none(d) is False:
        raise ValueError(
            "fused_dia_cg: DIA data has nonzero entries at x-plane-"
            "crossing slots (offsets ±1 at the j/k-extremes, ±nz in the "
            "j-boundary planes); the fused layout would silently drop "
            "them — use cg_solve instead")

    dtype = b.dtype
    eng, e, _ = build_fused_dia(d, dtype, jacobi=jacobi, inv_diag=inv_diag,
                                interpret=interpret)
    if e is None:
        res = eng.solve(b, x0, tol=tol, atol=atol, maxiter=maxiter,
                        track_history=track_history)
        return res
    b_s = e * b
    x0_s = None
    if x0 is not None:
        x0_s = jnp.where(e > 0, x0 / jnp.where(e > 0, e, 1.0), 0.0)
    res = eng.solve(b_s, x0_s, tol=tol, atol=atol, maxiter=maxiter,
                    track_history=track_history)
    return dataclasses.replace(res, x=e * res.x)
