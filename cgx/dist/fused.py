"""Distributed fused CG: the two-pass Pallas engine under ``shard_map``.

Round 1's two strongest assets — the fused Pallas iteration and the
row-sharded SPMD solver — composed: the mesh shards the grid's x-planes
(``P("rows")`` on the flat vectors, contiguous x-plane blocks per device),
each device runs the identical fused kernels on its local layout, the
engine's embedded halo rows are filled by a two-row ``ppermute`` per
iteration, and the two fused dot pairs become two ``psum`` s — the same
cross-chip sync structure as the XLA path
(:func:`cgx.dist.solve.dist_cg_solve`), at the fused path's per-pass
streaming cost.  This is the north-star config-5 shape (10 M-row 3-D
Poisson across a slice, SURVEY.md §2.2 CP row); it plays the role MPI
would have in the reference's assignment series (Makefile:20-30).

Constraints: a fused-capable operator (:func:`cgx.kernels.fused_cg.supports`
or a 7-point DIA passing :func:`cgx.kernels.fused_dia_cg.wrap_entries_zero`).
Shard evenness is NOT required: when ``nx % n_devices != 0`` the operator is
padded to whole x-planes per shard with fully DECOUPLED pad rows
(``A' = blockdiag(A, c·I)`` — zero coupling at the real/pad boundary, so a
zero-padded RHS keeps every pad row identically zero through the whole
Krylov iteration and the trajectory equals the unpadded solve exactly; see
``_pad_to_whole_planes``).  Padded stencils route through the DIA engine
(the pad-boundary zeros make the coefficient planes non-constant).
"""
from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cgx.dist.solve import AXIS
from cgx.kernels import fused_cg as _fc
# Name imports (not the module): the kernels package __init__ re-exports a
# FUNCTION named fused_dia_cg that shadows the submodule attribute.
from cgx.kernels.fused_dia_cg import (build_fused_dia, dia_engine_spec,
                                      supports_dia,
                                      wrap_entries_zero_or_none)
from cgx.kernels.fused_engine import FusedCG, make_geometry
from cgx.solve.cg import CGResult

__all__ = ["dist_fused_cg", "dist_fused_cg_multi", "dist_fused_supported"]


def _mesh_size(mesh: Mesh) -> int:
    return mesh.devices.size


def _interpret_default(mesh: Mesh) -> bool:
    return next(iter(mesh.devices.flat)).platform != "tpu"


def dist_fused_supported(a, mesh: Mesh) -> bool:
    """Whether ``dist_fused_cg`` can run ``a`` on ``mesh`` (uneven ``nx``
    is handled by the decoupled-pad route — see the module docstring)."""
    spec = _fc.stencil_taps(a)
    if spec is not None and _fc.supports(a):
        return True
    if supports_dia(a):
        return wrap_entries_zero_or_none(a) is True
    return False


def _pad_to_whole_planes(a, nd: int):
    """``(a_pad, n, n_pad)`` — a DIA operator on the ``(⌈nx/nd⌉·nd, ny,
    nz)`` grid equal to ``blockdiag(A, c·I)``, or ``None`` when ``nx``
    already divides.

    The pad rows carry ONLY a positive diagonal (``c_center`` for
    stencils, 1 for DIA) and zero coupling in every tap — including the
    real→pad x-crossing slots — so with a zero-padded RHS the pad block
    of every CG vector stays identically zero (``q_pad = c·p_pad = 0``
    inductively) and all dots/updates reproduce the unpadded trajectory
    EXACTLY.  Padded stencils necessarily become variable-coefficient
    DIA (the pad-boundary zeros break the constant-tap form).
    """
    import numpy as np

    from cgx.sparse.types import DIAMatrix

    spec = _fc.stencil_taps(a)
    if spec is not None:
        nx, ny, nz, taps, coeffs = spec
        data_src = None
    else:
        nx, ny, nz, taps = dia_engine_spec(a)
        coeffs = None
        data_src = np.asarray(a.data)
    nx_pad = -(-nx // nd) * nd
    if nx_pad == nx:
        return None
    lnn = ny * nz
    n, n_pad = nx * lnn, nx_pad * lnn
    r = np.arange(n_pad)
    zc, yc, xc = r % nz, (r // nz) % ny, r // lnn
    dtype = np.dtype(jnp.dtype(a.dtype).name)
    c_diag = (1.0 if coeffs is None else
              (coeffs[taps.index((0, 0, 0))]
               if (0, 0, 0) in tuple(map(tuple, taps)) else 1.0))
    offsets, planes = [], []
    for t, (dx, dy, dk) in enumerate(taps):
        off = dx * lnn + dy * nz + dk
        col = np.zeros(n_pad, dtype)
        if data_src is not None:
            col[:n] = data_src[t]        # real rows keep their entries;
            #                              real→pad crossings were outside
            #                              the matrix before → already 0
        else:
            valid = ((xc < nx) & (xc + dx >= 0) & (xc + dx < nx)
                     & (yc + dy >= 0) & (yc + dy < ny)
                     & (zc + dk >= 0) & (zc + dk < nz))
            col[valid] = coeffs[t]
        if (dx, dy, dk) == (0, 0, 0):
            col[n:] = c_diag
        offsets.append(off)
        planes.append(col)
    a_pad = DIAMatrix(data=jnp.asarray(np.stack(planes)),
                      offsets=tuple(offsets), shape=(n_pad, n_pad),
                      grid=(nx_pad, ny, nz))
    return a_pad, n, n_pad


def _pad_and_solve(solver, a, b, mesh, *, x0=None, **kw):
    """Uneven-``nx`` route: pad to whole x-planes per shard with decoupled
    rows (:func:`_pad_to_whole_planes`), zero-pad the RHS (and ``x0``),
    solve, slice the pad block back off.  Trajectory-identical to the
    unpadded solve by construction."""
    import dataclasses

    nd = _mesh_size(mesh)
    a_pad, n, n_pad = _pad_to_whole_planes(a, nd)
    zeros1 = jnp.zeros((n_pad - n,) + b.shape[1:], b.dtype)
    b_pad = jnp.concatenate([jnp.asarray(b), zeros1])
    x0_pad = (None if x0 is None
              else jnp.concatenate([jnp.asarray(x0), zeros1]))
    res = solver(a_pad, b_pad, mesh, x0=x0_pad, **kw)
    # n is not shard-aligned (that's the whole point) — replicate before
    # slicing the pad block off (one all-gather per SOLVE, not per iter).
    x_full = jax.device_put(res.x, NamedSharding(mesh, P()))
    return dataclasses.replace(res, x=x_full[:n])


def dist_fused_cg(
    a,
    b: jnp.ndarray,
    mesh: Mesh,
    *,
    x0: Optional[jnp.ndarray] = None,
    tol: float = 1e-6,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    jacobi: bool = False,
    track_history: bool = False,
    interpret: Optional[bool] = None,
    plane_dtype=None,
) -> CGResult:
    """Row-sharded fused CG over ``mesh``; semantics of
    :func:`cgx.solve.cg.cg_solve` (``jacobi=True`` = Jacobi PCG, DIA
    operators only).  ``plane_dtype``: stream DIA coefficient planes in
    this dtype (bf16) while vectors keep ``b.dtype`` — see
    :func:`cgx.kernels.fused_dia_cg.fused_dia_cg`.

    ``b``/``x0`` are global vectors (host or device); the returned
    :class:`CGResult` carries the global solution.
    """
    n = a.shape[0]
    if maxiter is None:
        maxiter = n
    if interpret is None:
        interpret = _interpret_default(mesh)
    nd = _mesh_size(mesh)
    vec = NamedSharding(mesh, P(AXIS))

    spec = _fc.stencil_taps(a)
    if spec is not None:
        if jacobi:
            raise ValueError("jacobi=True needs a DIA operator (constant-"
                             "diagonal stencils: Jacobi is an exact "
                             "rescaling — plain CG IS the PCG path)")
        if spec[0] % nd:
            return _pad_and_solve(dist_fused_cg, a, b, mesh, x0=x0,
                                  tol=tol, atol=atol, maxiter=maxiter,
                                  jacobi=jacobi,
                                  track_history=track_history,
                                  interpret=interpret,
                                  plane_dtype=plane_dtype)
        f = _cached_stencil_solver(mesh, a, b.dtype.name, float(tol),
                                   float(atol), int(maxiter),
                                   bool(track_history), x0 is not None,
                                   bool(interpret))
        args = [jax.device_put(b, vec)]
        if x0 is not None:
            args.append(jax.device_put(x0, vec))
        return f(*args)

    if not supports_dia(a):
        raise ValueError("dist_fused_cg: unsupported operator (need a "
                         "fused-capable stencil or 7-point DIA)")
    if wrap_entries_zero_or_none(a) is False:
        raise ValueError("dist_fused_cg: DIA data has nonzero x-plane-"
                         "crossing entries — use dist_cg_solve instead")
    nx = dia_engine_spec(a)[0]
    if nx % nd:
        return _pad_and_solve(dist_fused_cg, a, b, mesh, x0=x0, tol=tol,
                              atol=atol, maxiter=maxiter, jacobi=jacobi,
                              track_history=track_history,
                              interpret=interpret, plane_dtype=plane_dtype)

    geom, e, planes, weight, coeffs, sym = build_fused_dia(
        a, b.dtype, jacobi=jacobi, n_shards=nd)
    f = _cached_dia_solver(mesh, geom, coeffs, b.dtype.name, float(tol),
                           float(atol), int(maxiter), bool(track_history),
                           x0 is not None, e is not None, bool(interpret),
                           sym, None if plane_dtype is None
                           else jnp.dtype(plane_dtype).name)
    mat = NamedSharding(mesh, P(None, AXIS))
    args = [jax.device_put(planes, mat), jax.device_put(b, vec)]
    if e is not None:
        args.append(jax.device_put(e, vec))
        args.append(jax.device_put(weight, vec))
    if x0 is not None:
        args.append(jax.device_put(x0, vec))
    return f(*args)


def dist_fused_cg_multi(
    a,
    b: jnp.ndarray,
    mesh: Mesh,
    *,
    x0: Optional[jnp.ndarray] = None,
    tol: float = 1e-6,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    jacobi: bool = False,
    interpret: Optional[bool] = None,
) -> CGResult:
    """Row-sharded fused multi-RHS CG: the band-stacked SpMM engine
    (:mod:`cgx.kernels.fused_multi`) under ``shard_map``.  ``b``: global
    ``(n, k)``; per-band halo rows ride one forward + one backward
    ``ppermute`` of a ``(k, total)`` row gather per iteration, and the
    ``(2, k)`` dot blocks become ``psum`` s — the single-RHS distributed
    engine's sync structure, batched."""
    if b.ndim != 2:
        raise ValueError(f"expected b of shape (n, k), got {b.shape}")
    n, k = b.shape
    if maxiter is None:
        maxiter = n
    if interpret is None:
        interpret = _interpret_default(mesh)
    nd = _mesh_size(mesh)
    vec = NamedSharding(mesh, P(AXIS))
    vec2 = NamedSharding(mesh, P(AXIS, None))

    spec = _fc.stencil_taps(a)
    if spec is not None:
        if jacobi:
            raise ValueError("jacobi=True needs a DIA operator")
        if spec[0] % nd:
            return _pad_and_solve(dist_fused_cg_multi, a, b, mesh, x0=x0,
                                  tol=tol, atol=atol, maxiter=maxiter,
                                  jacobi=jacobi, interpret=interpret)
        f = _cached_multi_stencil(mesh, a, int(k), b.dtype.name, float(tol),
                                  float(atol), int(maxiter), x0 is not None,
                                  bool(interpret))
        args = [jax.device_put(b, vec2)]
        if x0 is not None:
            args.append(jax.device_put(x0, vec2))
        return f(*args)

    if not supports_dia(a):
        raise ValueError("dist_fused_cg_multi: unsupported operator")
    if wrap_entries_zero_or_none(a) is False:
        raise ValueError("dist_fused_cg_multi: DIA data has nonzero "
                         "x-plane-crossing entries")
    from cgx.kernels.fused_dia_cg import dia_prep
    nx, ny, nz, taps, coeffs, planes, e, weight, sym = dia_prep(
        a, b.dtype, jacobi=jacobi)
    if nx % nd:
        return _pad_and_solve(dist_fused_cg_multi, a, b, mesh, x0=x0,
                              tol=tol, atol=atol, maxiter=maxiter,
                              jacobi=jacobi, interpret=interpret)
    n_stream = sum(1 for c in coeffs if c is None)
    isz = jnp.dtype(b.dtype).itemsize
    geom = make_geometry(
        nx, ny, nz, taps, n_shards=nd, target_block_bytes=1 << 18,
        residency_multiplier=k,
        itemsize=isz,
        plane_bytes=n_stream * nx * ny * nz * isz,
        **(dict(a_window_streams=1 + n_stream) if sym
           else dict(a_extra_streams=2 * n_stream)))
    f = _cached_multi_dia(mesh, geom, coeffs, int(k), b.dtype.name,
                          float(tol), float(atol), int(maxiter),
                          x0 is not None, e is not None, bool(interpret),
                          sym)
    mat = NamedSharding(mesh, P(None, AXIS))
    args = [jax.device_put(planes, mat), jax.device_put(b, vec2)]
    if e is not None:
        args.append(jax.device_put(e, vec))
        args.append(jax.device_put(weight, vec))
    if x0 is not None:
        args.append(jax.device_put(x0, vec2))
    return f(*args)


def _multi_result_specs():
    return CGResult(x=P(AXIS, None), iterations=P(), residual_norm_sq=P(),
                    converged=P(), history=P())


@lru_cache(maxsize=64)
def _cached_multi_stencil(mesh, s, k, dtype_name, tol, atol, maxiter,
                          has_x0, interpret):
    from cgx.kernels.fused_multi import _solve_multi

    nx, ny, nz, taps, coeffs = _fc.stencil_taps(s)
    nd = _mesh_size(mesh)
    dtype = jnp.dtype(dtype_name)
    geom = make_geometry(nx, ny, nz, taps, n_shards=nd,
                         residency_multiplier=k, itemsize=dtype.itemsize)

    def local(b_loc, *x0_loc):
        return _solve_multi(
            geom, coeffs, None, None, b_loc.T,
            x0_loc[0].T if x0_loc else None, tol=tol, atol=atol,
            maxiter=maxiter, interpret=interpret, dtype=dtype,
            axis_name=AXIS)

    in_specs = (P(AXIS, None),) + ((P(AXIS, None),) if has_x0 else ())
    return jax.jit(jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                                 out_specs=_multi_result_specs(),
                                 check_vma=False))


@lru_cache(maxsize=64)
def _cached_multi_dia(mesh, geom, coeffs, k, dtype_name, tol, atol,
                      maxiter, has_x0, scaled, interpret, sym):
    import dataclasses as _dc

    from cgx.kernels.fused_multi import _solve_multi

    dtype = jnp.dtype(dtype_name)

    def local(planes_loc, b_loc, *rest):
        rest = list(rest)
        if scaled:
            e_loc = rest.pop(0)
            w_loc = rest.pop(0)
        else:
            e_loc = w_loc = None
        x0_loc = rest.pop(0) if rest else None
        b2 = b_loc.T
        x0_2 = None if x0_loc is None else x0_loc.T
        if e_loc is not None:
            b2 = b2 * e_loc[None]
            if x0_2 is not None:
                from cgx.ops.blas import safe_recip
                x0_2 = x0_2 * safe_recip(e_loc)[None]
        res = _solve_multi(geom, coeffs, planes_loc, w_loc, b2, x0_2,
                           tol=tol, atol=atol, maxiter=maxiter,
                           interpret=interpret, dtype=dtype, sym=sym,
                           axis_name=AXIS)
        if e_loc is not None:
            res = _dc.replace(res, x=res.x * e_loc[:, None])
        return res

    in_specs = (P(None, AXIS), P(AXIS, None))
    if scaled:
        in_specs = in_specs + (P(AXIS), P(AXIS))
    if has_x0:
        in_specs = in_specs + (P(AXIS, None),)
    return jax.jit(jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                                 out_specs=_multi_result_specs(),
                                 check_vma=False))


def _result_specs():
    return CGResult(x=P(AXIS), iterations=P(), residual_norm_sq=P(),
                    converged=P(), history=P())


@lru_cache(maxsize=64)
def _cached_stencil_solver(mesh, s, dtype_name, tol, atol, maxiter, track,
                           has_x0, interpret):
    nx, ny, nz, taps, coeffs = _fc.stencil_taps(s)
    nd = _mesh_size(mesh)
    dtype = jnp.dtype(dtype_name)
    geom = make_geometry(nx, ny, nz, taps, n_shards=nd,
                         itemsize=dtype.itemsize)

    def local(b_loc, *x0_loc):
        eng = FusedCG(geom, dtype=dtype, coeffs=coeffs, axis_name=AXIS,
                      interpret=interpret)
        return eng.solve(b_loc, x0_loc[0] if x0_loc else None, tol=tol,
                         atol=atol, maxiter=maxiter, track_history=track)

    in_specs = (P(AXIS),) + ((P(AXIS),) if has_x0 else ())
    # check_vma=False: Pallas scratch buffers in interpret mode trip the
    # varying-axes checker inside shard_map (JAX limitation; the suggested
    # workaround).  Sharding correctness is covered by the trajectory-
    # identity and HLO-inspection tests.
    return jax.jit(jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                                 out_specs=_result_specs(),
                                 check_vma=False))


@lru_cache(maxsize=64)
def _cached_dia_solver(mesh, geom, coeffs, dtype_name, tol, atol, maxiter,
                       track, has_x0, scaled, interpret, sym=False,
                       plane_dtype_name=None):
    import dataclasses as _dc

    dtype = jnp.dtype(dtype_name)
    plane_dtype = (None if plane_dtype_name is None
                   else jnp.dtype(plane_dtype_name))

    def local(planes_loc, b_loc, *rest):
        rest = list(rest)
        if scaled:
            e_loc = rest.pop(0)
            w_loc = rest.pop(0)
        else:
            e_loc = w_loc = None
        x0_loc = rest.pop(0) if rest else None
        eng = FusedCG(geom, dtype=dtype, coeffs=coeffs, planes=planes_loc,
                      weight=w_loc, axis_name=AXIS, interpret=interpret,
                      sym=sym, plane_dtype=plane_dtype)
        if e_loc is not None:
            b_s = e_loc * b_loc
            if x0_loc is not None:
                from cgx.ops.blas import safe_recip
                x0_loc = x0_loc * safe_recip(e_loc)
        else:
            b_s = b_loc
        res = eng.solve(b_s, x0_loc, tol=tol, atol=atol, maxiter=maxiter,
                        track_history=track)
        if e_loc is not None:
            res = _dc.replace(res, x=e_loc * res.x)
        return res

    in_specs = (P(None, AXIS), P(AXIS))
    if scaled:
        in_specs = in_specs + (P(AXIS), P(AXIS))
    if has_x0:
        in_specs = in_specs + (P(AXIS),)
    return jax.jit(jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                                 out_specs=_result_specs(),
                                 check_vma=False))
