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
           "dia_engine_spec", "wrap_entries_zero",
           "wrap_entries_zero_or_none", "data_symmetric_or_none",
           "dia_prep", "build_fused_dia"]


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


def dia_engine_spec(d):
    """``(nx, ny, nz, taps)`` decomposing ``d.offsets`` into engine taps
    ``(dx, dy, dk)`` with ``|dx| ≤ 1``, or ``None``.

    Works for the exact 7-point pattern without metadata; ANY other
    banded set needs ``d.grid`` (generators set it).  Each offset takes
    its minimal-magnitude decomposition ``off = dx·ny·nz + dy·nz + dk``
    (``|dk| ≤ nz/2``, ``|dy| ≤ ny/2``) — the canonical reading for grid
    stencils; :func:`wrap_entries_zero` then pins down the boundary
    semantics the lane layout imposes.
    """
    from cgx.sparse.types import DIAMatrix

    if not isinstance(d, DIAMatrix):
        return None
    dims = dia_pattern_dims(d)
    if dims is not None:
        return (*dims, list(_DIA_TAPS))
    g = getattr(d, "grid", None)
    if g is None:
        return None
    nx, ny, nz = map(int, g)
    if nx * ny * nz != d.shape[0] or min(nx, ny, nz) < 1:
        return None
    taps = []
    for off in map(int, d.offsets):
        dk = off % nz
        if dk > nz // 2:
            dk -= nz
        rem = (off - dk) // nz
        dy = rem % ny
        if dy > ny // 2:
            dy -= ny
        dx = (rem - dy) // ny
        if abs(dx) > 1 or dx * ny * nz + dy * nz + dk != off:
            return None
        taps.append((dx, dy, dk))
    if len(set(taps)) != len(taps):
        return None
    return nx, ny, nz, taps


def supports_dia(d) -> bool:
    spec = dia_engine_spec(d)
    if spec is None:
        return False
    nx, ny, nz, taps = spec
    # One embedded halo row per side bounds nx; the lane halo must stay
    # a small fraction of the lane axis for the window streams to pay.
    reach = max(abs(dy * nz + dk) for (_, dy, dk) in taps)
    return 1 <= nx <= 4096 and reach <= max(128, ny * nz // 2)


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
    import numpy as np

    spec = dia_engine_spec(d)
    if spec is None:
        return False
    if isinstance(d.data, jax.core.Tracer):
        return None
    nx, ny, nz, taps = spec
    try:
        data = np.asarray(d.data)
    except jax.errors.TracerArrayConversionError:
        return None
    n = d.shape[0]
    i = np.arange(n)
    kz = i % nz
    jy = (i // nz) % ny
    for t, ((dx, dy, dk), off) in enumerate(zip(taps, map(int,
                                                          d.offsets))):
        if dy == 0 and dk == 0:
            continue                    # pure row shift: no lane wrap
        # Grid-boundary-crossing slots whose flat target is still inside
        # the matrix: the generic shifted SpMV includes them, the fused
        # lane layout reads zero padding there — data must be zero.
        cross = (jy + dy < 0) | (jy + dy >= ny) \
            | (kz + dk < 0) | (kz + dk >= nz)
        in_range = (i + off >= 0) & (i + off < n)
        if np.any(np.abs(data[t])[cross & in_range] > 0):
            return False
    return True


# Offset order (-o3, -o2, -1, 0, 1, o2, o3) in engine tap convention.
_DIA_TAPS = ((-1, 0, 0), (0, -1, 0), (0, 0, -1), (0, 0, 0), (0, 0, 1),
             (0, 1, 0), (1, 0, 0))
# Symmetric-mode taps: diagonal + one tap per ±off pair (engine mirrors).
_DIA_TAPS_SYM = ((0, 0, 0), (0, 0, 1), (0, 1, 0), (1, 0, 0))


def bf16_plane_speedup(d, n: int, itemsize: int = 4) -> float:
    """Predicted per-iteration speedup of bf16 coefficient planes over
    fp32 planes for this DIA operator — the footprint model behind
    ``auto_solve(mixed_precision=True)``'s mode routing (measured
    calibration in docs/PERF_NOTES.md round 2h/2i).

    Two regimes:

    * **Residency flip** — fp32 planes + the 5 carried vectors spill
      VMEM (~100 MB usable of the v5e's 128 MB) but the bf16 set fits:
      the fp32 configuration re-streams its planes from HBM every
      iteration and the bf16 one doesn't.  Measured 2.8–6× at 27-point
      128³; the model returns the conservative 2.8.
    * **Streaming ratio** — both spill (or both fit): halving the plane
      bytes saves ``f/2`` of per-iteration traffic where ``f =
      planes/(planes + 8)`` is the planes' traffic fraction.  The 8 is
      calibrated: plane windows carry the same ~1.5× window
      amplification as the vector windows (PERF_NOTES round 2b), and the
      measured 27-point fraction is ~62 % (13 planes ↔ 8 effective
      vector streams).  Predicts 1.48× at 27-point 160³ (measured
      1.39–1.45×) and 1.16× for symmetric 7-point.

    Symmetric data (checkable only when concrete) halves the plane
    streams AND bytes; traced data assumes non-symmetric (conservative:
    predicts a larger f, but both dtypes share the assumption).
    """
    k = len(d.offsets)
    n_planes = k - 1            # unit diagonal after symmetric scaling
    if n_planes <= 0:
        return 1.0
    if data_symmetric_or_none(d) is True:
        n_planes //= 2
    vec_streams = 8.0
    f = n_planes / (n_planes + vec_streams)
    ratio = 1.0 / (1.0 - f / 2.0)
    vmem = 100 << 20
    vectors = 5 * n * itemsize

    def working_set(plane_isz):
        return n_planes * n * plane_isz + vectors

    if working_set(itemsize) > vmem >= working_set(2):
        return 2.8
    return ratio


def data_symmetric_or_none(d):
    """True iff the (concrete) DIA data describes a symmetric matrix:
    the offset set is sign-symmetric and ``data[-off][i] ==
    data[+off][i-off]`` for each pair.  ``None`` when the data is traced
    (cannot check under jit)."""
    import numpy as np

    offs = tuple(map(int, d.offsets))
    if any(-off not in offs for off in offs):
        return False
    if isinstance(d.data, jax.core.Tracer):
        return None
    try:
        data = np.asarray(d.data)
    except jax.errors.TracerArrayConversionError:
        return None
    for t_pos, off in enumerate(offs):
        if off <= 0:
            continue
        t_neg = offs.index(-off)
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
             allow_sym: bool = True,
             assume_symmetric: Optional[bool] = None):
    """Engine-independent preparation for a 7-point DIA operator:
    ``(nx, ny, nz, taps, coeffs, planes, e, weight, sym)``.

    ``e = √(inv_diag)`` is the Jacobi scaling vector (``None`` when not
    preconditioning); the caller solves ``Ã y = e·b`` and recovers
    ``x = e·y``.  When the concrete data is symmetric (it must be, for
    CG) ``sym=True``: ``taps`` keeps the diagonal plus one tap per
    ``±off`` pair (the kernels mirror them).

    Any banded operator whose offsets decompose into ``|dx| ≤ 1`` grid
    taps is accepted (:func:`dia_engine_spec` — 7-point auto-detected,
    everything else via ``d.grid`` metadata).

    ``assume_symmetric``: the symmetry check needs concrete data, so
    under jit (traced ``d.data``) the builder silently falls back to the
    all-planes engine; callers who KNOW the operator is entrywise
    symmetric pass ``True`` to get the symmetric (mirror-tap, half the
    plane traffic) engine regardless — the jit-caller analogue of
    ``auto_solve(backend="fused_dia")`` for the wrap check.  ``False``
    forces the non-symmetric engine.
    """
    import numpy as np

    spec = dia_engine_spec(d)
    if spec is None or not supports_dia(d):
        raise ValueError(
            "fused_dia_cg: offsets do not decompose into |dx| <= 1 grid "
            "taps (set DIAMatrix.grid for non-7-point patterns) or the "
            "grid is out of range")
    nx, ny, nz, all_taps = spec
    offs = tuple(map(int, d.offsets))
    diag_idx = offs.index(0) if 0 in offs else None
    if inv_diag is not None:
        invd = jnp.asarray(inv_diag, dtype)
    elif jacobi:
        if diag_idx is None:
            raise ValueError("jacobi=True needs a stored main diagonal")
        from cgx.ops.blas import safe_recip
        invd = safe_recip(d.data[diag_idx].astype(dtype))
    else:
        invd = None

    # Symmetric scaling Ã = E A E preserves symmetry, so checking the raw
    # data (concrete even when b is traced) covers the scaled planes too.
    if assume_symmetric is None:
        sym = bool(allow_sym and data_symmetric_or_none(d) is True)
    else:
        sym = bool(allow_sym and assume_symmetric)
        if sym and any(-int(o) not in tuple(map(int, d.offsets))
                       for o in d.offsets):
            raise ValueError("assume_symmetric=True but the offset set "
                             "is not sign-symmetric")

    unit_diag = False
    if invd is None:
        planes_full = [d.data[t].astype(dtype) for t in range(len(offs))]
        e = None
        weight = None
    else:
        e = jnp.sqrt(invd)
        planes_full = list(_scaled_planes(d, e, dtype))
        from cgx.ops.blas import safe_recip
        weight = safe_recip(invd)              # = diag(A) for true ‖r‖²
        # After the symmetric scaling the diagonal plane is 1 (exactly, in
        # exact arithmetic) whenever inv_diag = 1/diag with no zero rows:
        # keep it as a constant tap instead of streaming a plane of ones —
        # one fewer full-vector pass per iteration.  Check on the concrete
        # host data (d.data is concrete even when b is traced).
        if diag_idx is not None and not (
                isinstance(d.data, jax.core.Tracer)
                or isinstance(inv_diag, jax.core.Tracer)):
            # NB: np.asarray on the WHOLE concrete array, then index —
            # d.data[diag_idx] would be a traced op inside jit.
            diag_np = np.asarray(d.data, np.float64)[diag_idx]
            inv_np = (np.asarray(inv_diag, np.float64)
                      if inv_diag is not None
                      else np.where(diag_np != 0, 1.0 / np.where(
                          diag_np != 0, diag_np, 1.0), 0.0))
            if np.allclose(diag_np * inv_np, 1.0, rtol=1e-6, atol=1e-6):
                unit_diag = True

    # Select the kept taps: all of them, or (sym) diagonal + positives.
    if sym:
        order = ([diag_idx] if diag_idx is not None else []) + \
            [t for t, off in enumerate(offs) if off > 0]
    else:
        order = list(range(len(offs)))
    taps, coeffs, planes_sel = [], [], []
    for t in order:
        taps.append(all_taps[t])
        if t == diag_idx and unit_diag:
            coeffs.append(1.0)
        else:
            coeffs.append(None)
            planes_sel.append(planes_full[t])
    planes = jnp.stack(planes_sel)
    return (nx, ny, nz, tuple(taps), tuple(coeffs), planes, e, weight,
            sym)


def build_fused_dia(d, dtype, *, jacobi: bool = True, inv_diag=None,
                    n_shards: int = 1, axis_name: Optional[str] = None,
                    interpret: bool = False, allow_sym: bool = True,
                    plane_dtype=None,
                    assume_symmetric: Optional[bool] = None):
    """``(engine, e, planes)`` for a 7-point DIA operator (see
    :func:`dia_prep` for the scaling/symmetry semantics).  The returned
    ``planes`` are the *global* scaled planes — shard them (and ``e``)
    before entering ``shard_map`` for the distributed path.

    In symmetric mode only the non-negative-offset planes stream
    (3 windows instead of 6 pipelined blocks — ~2.5 fewer passes/iter and
    half the plane HBM); ``allow_sym=False`` opts out (the band-stacked
    multi-RHS engine predates sym support).

    ``plane_dtype``: stream coefficient planes in this dtype (bf16) while
    vectors stay ``dtype`` — see :class:`~cgx.kernels.fused_engine.FusedCG`.
    """
    nx, ny, nz, taps, coeffs, planes, e, weight, sym = dia_prep(
        d, dtype, jacobi=jacobi, inv_diag=inv_diag, allow_sym=allow_sym,
        assume_symmetric=assume_symmetric)

    isz = jnp.dtype(dtype).itemsize
    p_isz = jnp.dtype(plane_dtype).itemsize if plane_dtype is not None \
        else isz
    n_stream_planes = sum(1 for c in coeffs if c is None)
    pb = n_stream_planes * nx * ny * nz * p_isz
    if sym:
        geom = make_geometry(nx, ny, nz, taps, n_shards=n_shards,
                             target_block_bytes=1 << 18,
                             a_window_streams=1 + n_stream_planes,
                             itemsize=isz, plane_bytes=pb)
    else:
        geom = make_geometry(nx, ny, nz, taps, n_shards=n_shards,
                             target_block_bytes=1 << 18,
                             a_extra_streams=2 * n_stream_planes,
                             itemsize=isz, plane_bytes=pb)

    if n_shards == 1:
        eng = FusedCG(geom, dtype=dtype, coeffs=coeffs, planes=planes,
                      weight=weight, axis_name=axis_name,
                      interpret=interpret, sym=sym,
                      plane_dtype=plane_dtype)
        return eng, e, planes
    return geom, e, planes, weight, coeffs, sym   # dist builds per-shard


def fused_dia_cg(d, b: jnp.ndarray, x0=None, *, tol: float = 1e-6,
                 atol: float = 0.0, maxiter: int = 1000,
                 jacobi: bool = True, inv_diag=None,
                 track_history: bool = False,
                 interpret: bool = False,
                 plane_dtype=None,
                 assume_symmetric: Optional[bool] = None) -> CGResult:
    """Jacobi-PCG (or plain CG with ``jacobi=False``) on a 7-point DIA
    operator, fused Pallas passes.  Matches ``cg_solve(d, b,
    preconditioner=JacobiPrecond.from_matrix(d))`` to fp32 roundoff.

    ``inv_diag``: explicit diagonal preconditioner values (overrides the
    operator-derived ``1/diag(A)``) — lets a caller-supplied
    :class:`~cgx.solve.precond.JacobiPrecond` keep its exact trajectory.

    ``plane_dtype=jnp.bfloat16`` streams the coefficient planes in bf16
    (vectors stay ``b.dtype``): the recurrence converges normally but to
    the solution of the bf16-rounded operator (true-system residual
    plateaus near the ~4e-3 coefficient rounding) — use
    :func:`cgx.solve.ir.ir_cg_solve` with ``inner_plane_dtype`` for full
    accuracy.

    ``assume_symmetric=True``: engage the symmetric (mirror-tap) engine
    without the concrete-data check — required to reach it under jit,
    where ``d.data`` is traced (see :func:`dia_prep`).
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
                                interpret=interpret,
                                plane_dtype=plane_dtype,
                                assume_symmetric=assume_symmetric)
    if e is None:
        res = eng.solve(b, x0, tol=tol, atol=atol, maxiter=maxiter,
                        track_history=track_history)
        return res
    b_s = e * b
    x0_s = None
    if x0 is not None:
        from cgx.ops.blas import safe_recip
        x0_s = x0 * safe_recip(e)
    res = eng.solve(b_s, x0_s, tol=tol, atol=atol, maxiter=maxiter,
                    track_history=track_history)
    return dataclasses.replace(res, x=e * res.x)
