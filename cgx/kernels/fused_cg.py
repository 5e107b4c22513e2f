"""Fused CG for matrix-free constant-coefficient stencil operators.

Thin wrapper over the unified two-pass engine
(:mod:`cgx.kernels.fused_engine` — see its module docstring for the kernel
structure and the β-before-the-pass identity).  Supports the 3-D 7-point
:class:`~cgx.sparse.stencil.Stencil3D`, the 2-D 5-point
:class:`~cgx.sparse.stencil.Stencil2D` (mapped onto the engine's
``(x ↓ sublanes, y → lanes)`` layout) and any
:class:`~cgx.sparse.stencil.GeneralStencil3D` whose taps reach at most one
x-plane (27-point etc.).

Motivation (measured, docs/PERF_NOTES.md): XLA cross-fuses the whole CG
loop body only while a vector fits in VMEM — 40.6 µs/iter at 2.1 M rows
collapses to 600 µs/iter at 4.1 M rows.  The fused engine pins the
iteration at its streaming cost for any n.  Reference algorithm anchor:
``conj_grad`` (cg.c:88-141).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from cgx.kernels.fused_engine import FusedCG, make_geometry
from cgx.solve.cg import CGResult

__all__ = ["fused_stencil_cg", "supports", "stencil_taps", "build_fused"]


def stencil_taps(s):
    """``(nx, ny, nz, taps, coeffs)`` in engine convention, or None.

    2-D stencils map to engine dims ``(nx, 1, ny)``: x-planes down the
    sublanes, y along the lanes.
    """
    from cgx.sparse.stencil import GeneralStencil3D, Stencil2D, Stencil3D

    if isinstance(s, Stencil3D):
        taps = ((0, 0, 0), (0, 0, 1), (0, 0, -1), (0, 1, 0), (0, -1, 0),
                (1, 0, 0), (-1, 0, 0))
        coeffs = (s.c_center, s.c_z, s.c_z, s.c_y, s.c_y, s.c_x, s.c_x)
        return s.nx, s.ny, s.nz, taps, coeffs
    if isinstance(s, Stencil2D):
        taps = ((0, 0, 0), (0, 0, 1), (0, 0, -1), (1, 0, 0), (-1, 0, 0))
        coeffs = (s.c_center, s.c_y, s.c_y, s.c_x, s.c_x)
        return s.nx, 1, s.ny, taps, coeffs
    if isinstance(s, GeneralStencil3D):
        if any(abs(dx) > 1 for (dx, _, _) in s.taps):
            return None
        taps = tuple((dx, dy, dz) for (dx, dy, dz) in s.taps)
        return s.nx, s.ny, s.nz, taps, tuple(s.coeffs)
    return None


def supports(s) -> bool:
    """Whether the fused path can run for this operator."""
    spec = stencil_taps(s)
    if spec is None:
        return False
    nx, ny, nz, taps, _ = spec
    return 1 <= nx <= 4096 and ny * nz >= 2


def build_fused(s, dtype, *, n_shards: int = 1,
                axis_name: Optional[str] = None,
                interpret: bool = False,
                one_pass: bool = False) -> FusedCG:
    """Engine instance for a stencil operator (``n_shards > 1`` builds the
    per-shard geometry for use inside ``shard_map`` — see
    :mod:`cgx.dist.fused`).  ``one_pass``: the v5 single-kernel iteration
    (:mod:`cgx.kernels.fused_onepass` — 6 HBM streams/iter instead of ~9;
    single-device only)."""
    spec = stencil_taps(s)
    if spec is None or not supports(s):
        raise ValueError("fused_stencil_cg: unsupported operator (need a "
                         "Stencil2D/Stencil3D/GeneralStencil3D with "
                         "|dx| <= 1 taps and nx <= 4096)")
    nx, ny, nz, taps, coeffs = spec
    if one_pass:
        if n_shards > 1 or axis_name is not None:
            raise ValueError("one-pass engine is single-device (the "
                             "sharded path keeps the two-pass engine)")
        from cgx.kernels.fused_onepass import OnePassCG
        geom = make_geometry(nx, ny, nz, taps,
                             itemsize=jnp.dtype(dtype).itemsize,
                             one_pass=True)
        return OnePassCG(geom, dtype=dtype, coeffs=coeffs,
                         interpret=interpret)
    geom = make_geometry(nx, ny, nz, taps, n_shards=n_shards,
                         itemsize=jnp.dtype(dtype).itemsize)
    return FusedCG(geom, dtype=dtype, coeffs=coeffs, axis_name=axis_name,
                   interpret=interpret)


def fused_stencil_cg(s, b: jnp.ndarray, x0=None, *, tol: float = 1e-6,
                     atol: float = 0.0, maxiter: int = 1000,
                     track_history: bool = False,
                     interpret: bool = False,
                     one_pass: bool = False) -> CGResult:
    """Plain CG on a constant-coefficient stencil operator, fused passes.

    Semantics match ``cg_solve(s, b, x0, tol=..., maxiter=...,
    track_history=...)`` (fp32 dot accumulation; trajectories match the
    XLA path to fp32 roundoff).  ``one_pass`` selects the v5 single-kernel
    iteration (see :func:`build_fused`).
    """
    eng = build_fused(s, b.dtype, interpret=interpret, one_pass=one_pass)
    return eng.solve(b, x0, tol=tol, atol=atol, maxiter=maxiter,
                     track_history=track_history)
