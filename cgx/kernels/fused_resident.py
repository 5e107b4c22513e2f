"""Whole-solve resident CG kernel (v4): ONE ``pallas_call`` per solve.

At VMEM-resident sizes (the working set of a few full vectors fits in the
chip's ~128 MB VMEM) the two-pass engine's per-iteration kernel launches
and XLA's buffer-placement choices dominate: the same 128³ config measured
31.7–52 µs/iter across processes (docs/PERF_NOTES.md "resident regime"),
because whether XLA parks the carried vectors in VMEM is not under our
control.  This kernel removes the question: the ENTIRE CG loop runs inside
one Pallas kernel — x/r/p live in VMEM for the whole solve by
construction, every iteration is pure VPU work on VMEM arrays with zero
launch/dispatch overhead, and the trajectory is the *textbook* PCG
recurrence (exact β = rz'/rz — no CA-CG identity needed, since nothing
has to be known before a second pass).

Algorithm anchor: ``conj_grad`` (reference cg.c:88-141), extended with the
on-device convergence test.  Supports the same operators as the two-pass
engine (constant-coefficient stencil taps and symmetric variable-
coefficient DIA planes); single-device only — sharded solves use
:mod:`cgx.kernels.fused_engine` under ``shard_map``.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from cgx.solve.cg import CGResult

__all__ = ["ResidentGeometry", "make_resident_geometry", "resident_cg",
           "resident_cg_call", "resident_vmem_bytes", "supports_resident",
           "resident_stencil_cg", "resident_dia_cg",
           "resident_supported"]


def _r8(v: int) -> int:
    return -(-v // 8) * 8


def _r128(v: int) -> int:
    return -(-v // 128) * 128


@dataclass(frozen=True)
class ResidentGeometry:
    """Minimal halo layout: ``sl`` halo lanes each side (no block tiling
    — the kernel operates on full VMEM arrays)."""

    nx: int
    ny: int
    nz: int
    taps: Tuple[Tuple[int, int, int], ...]
    rows8: int          # round8(nx + 2 halo rows)
    sl: int             # lane halo (covers max |dy·nz + dk|)
    l_real: int         # ny·nz
    l_pad: int          # round128(l_real)
    total: int          # l_pad + 2·sl

    @property
    def n(self) -> int:
        return self.nx * self.l_real


def make_resident_geometry(nx: int, ny: int, nz: int,
                           taps: Sequence[Tuple[int, int, int]]
                           ) -> ResidentGeometry:
    for (dx, dy, dk) in taps:
        if abs(dx) > 1:
            raise ValueError(f"tap {dx, dy, dk}: |dx| must be <= 1")
    l_real = ny * nz
    reach = max([abs(dy * nz + dk) for (_, dy, dk) in taps] + [1])
    sl = _r128(reach)
    l_pad = _r128(l_real)
    return ResidentGeometry(nx=nx, ny=ny, nz=nz,
                            taps=tuple(map(tuple, taps)),
                            rows8=_r8(nx + 2), sl=sl, l_real=l_real,
                            l_pad=l_pad, total=l_pad + 2 * sl)


def _to_layout(g: ResidentGeometry, v: jnp.ndarray) -> jnp.ndarray:
    arr = v.reshape(g.nx, g.l_real)
    return jnp.pad(arr, ((1, g.rows8 - 1 - g.nx),
                         (g.sl, g.total - g.sl - g.l_real)))


def _from_layout(g: ResidentGeometry, a: jnp.ndarray) -> jnp.ndarray:
    return a[1:1 + g.nx, g.sl:g.sl + g.l_real].reshape(-1)


def resident_vmem_bytes(g: ResidentGeometry, n_planes: int,
                        weighted: bool, itemsize: int = 4,
                        plane_itemsize: int = None) -> int:
    """Rough VMEM footprint: x, r, p persistent + q-sized temporaries
    (~3 for Mosaic's expression evaluation) + planes + weight.
    ``plane_itemsize``: planes may be held narrower (bf16) than the
    vectors — nearly halves the footprint of wide-tap operators."""
    arr = g.rows8 * g.total * itemsize
    p_arr = g.rows8 * g.total * (plane_itemsize or itemsize)
    return (3 + 3 + (1 if weighted else 0)) * arr + n_planes * p_arr


# VMEM budget for routing (v5e has 128 MB; leave headroom for Mosaic).
VMEM_BUDGET = 100 << 20


def supports_resident(g: ResidentGeometry, n_planes: int,
                      weighted: bool, itemsize: int = 4,
                      plane_itemsize: int = None) -> bool:
    return resident_vmem_bytes(g, n_planes, weighted, itemsize,
                               plane_itemsize) <= VMEM_BUDGET


def _kernel(*refs, g: ResidentGeometry, coeffs, sym: bool,
            weighted: bool, variable: bool):
    from jax.experimental import pallas as pl  # noqa: F401 (kernel ctx)

    refs = list(refs)
    _tol = refs.pop(0)
    _maxit = refs.pop(0)
    _res = refs.pop(0)          # (1, 1) int32: 1 = resume from (x, r, p)
    _rz_in = refs.pop(0)        # (1, 2) f32: snapshot (rz, rw) on resume
    x0_in = refs.pop(0)         # aliased to x_ref on hardware
    b_in = refs.pop(0)          # aliased to r_ref; carries r on resume
    p_in = refs.pop(0)          # aliased to p_ref; carries p on resume
    planes_ref = refs.pop(0) if variable else None
    w_ref = refs.pop(0) if weighted else None
    x_ref, r_ref, p_ref, k_out, rz_out = refs

    nxl, sl, lp = g.nx, g.sl, g.l_pad
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, lp), 1)
    kz = lane % g.nz
    jy = (lane // g.nz) % g.ny
    valid = lane < g.l_real

    def region(ref):
        return ref[1:1 + nxl, sl:sl + lp]

    def matvec(full):
        """A·p on the full (rows8, total) array; returns the real region
        (nxl, l_pad), zero at padding lanes."""
        y = None
        pi = 0
        for t, (dx, dy, dk) in enumerate(g.taps):
            dl = dy * g.nz + dk
            s = full[1 + dx:1 + dx + nxl, sl + dl:sl + dl + lp]
            if coeffs[t] is None and sym:
                # Planes may be held narrower (plane_dtype=bf16): upcast
                # in-register so products keep the vector mantissa.
                wp = planes_ref[pi]
                pi += 1
                term = wp[1:1 + nxl, sl:sl + lp].astype(s.dtype) * s
                if (dx, dy, dk) != (0, 0, 0):
                    term = term + (
                        wp[1 - dx:1 - dx + nxl,
                           sl - dl:sl - dl + lp].astype(s.dtype)
                        * full[1 - dx:1 - dx + nxl, sl - dl:sl - dl + lp])
            elif coeffs[t] is None:
                term = (planes_ref[pi, 1:1 + nxl, sl:sl + lp]
                        .astype(s.dtype) * s)
                pi += 1
            else:
                term = coeffs[t] * s
                m = None
                if dk:
                    m = (kz + dk >= 0) & (kz + dk < g.nz)
                if dy:
                    my = (jy + dy >= 0) & (jy + dy < g.ny)
                    m = my if m is None else m & my
                if m is not None:
                    term = jnp.where(m, term, 0.0)
            y = term if y is None else y + term
        # Shifted reads pull real values into padding lanes — zero them so
        # the dot accumulators and the r/p updates stay clean.
        return jnp.where(valid, y, 0.0)

    def sums(rv):
        r32 = rv.astype(jnp.float32)
        rsq = r32 * r32
        s = jnp.sum(rsq)
        if weighted:
            sw = jnp.sum(rsq * region(w_ref).astype(jnp.float32))
        else:
            sw = s
        return s, sw

    # Seed the carried arrays from the inputs.  On hardware the outputs
    # alias the inputs, so these are in-place identity copies (one-time,
    # negligible); reading the INPUT refs — rather than relying on the
    # aliased outputs' pre-image — is required for the TPU interpreter,
    # which does not seed aliased outputs (NaN-fills them instead).
    resume = _res[0, 0] == 1
    x_ref[...] = x0_in[...]
    r_ref[...] = b_in[...]
    p_ref[...] = p_in[...]

    @pl.when(jnp.logical_not(resume))
    def _():
        # Fresh solve: r0 = b − A·x0, p0 = r0 (b_in carries b; the p_in
        # seed above is discarded).  On resume b_in/p_in carry the
        # snapshot's r/p and this init is skipped entirely.
        r0 = region(r_ref) - matvec(x_ref[...])
        r_ref[1:1 + nxl, sl:sl + lp] = r0
        p_ref[...] = jnp.zeros(p_ref.shape, p_ref.dtype)
        p_ref[1:1 + nxl, sl:sl + lp] = r0

    # Fresh: Σr₀² (and the weighted sum) from the just-written r; resume:
    # the snapshot's carried (rz, rw) verbatim — adopting whatever the
    # snapshotting backend computed keeps cross-backend resumes on the
    # exact recurrence (reduction orders differ between backends).
    rz_c, rw_c = sums(region(r_ref))
    rz0 = jnp.where(resume, _rz_in[0, 0], rz_c)
    rw0 = jnp.where(resume, _rz_in[0, 1], rw_c)

    def cond(c):
        k, rz, rw = c
        return jnp.logical_and(k < _maxit[0, 0], rw > _tol[0, 0])

    def body(c):
        k, rz, rw = c
        pfull = p_ref[...]
        q = matvec(pfull)
        pr = region(p_ref)
        pq = jnp.sum(pr.astype(jnp.float32) * q.astype(jnp.float32))
        alpha = (rz / pq).astype(x_ref.dtype)
        x_ref[1:1 + nxl, sl:sl + lp] += alpha * pr
        r_new = region(r_ref) - alpha * q
        r_ref[1:1 + nxl, sl:sl + lp] = r_new
        rz_new, rw_new = sums(r_new)
        beta = (rz_new / rz).astype(x_ref.dtype)
        p_ref[1:1 + nxl, sl:sl + lp] = r_new + beta * pr
        return k + 1, rz_new, rw_new

    k, rz, rw = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), rz0, rw0))
    k_out[0, 0] = k
    rz_out[0, 0] = rz
    rz_out[0, 1] = rw


def _build_call(g: ResidentGeometry, coeffs, sym: bool, weighted: bool,
                dtype, interpret: bool, plane_dtype=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    variable = any(c is None for c in coeffs)
    n_planes = sum(1 for c in coeffs if c is None)
    kernel = partial(_kernel, g=g, coeffs=tuple(coeffs), sym=sym,
                     weighted=weighted, variable=variable)

    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [sm, sm, sm, sm, vm, vm, vm] + ([vm] if variable else []) \
        + ([vm] if weighted else [])
    vshape = jax.ShapeDtypeStruct((g.rows8, g.total), dtype)
    out_shape = (vshape, vshape, vshape,
                 jax.ShapeDtypeStruct((1, 1), jnp.int32),
                 jax.ShapeDtypeStruct((1, 2), jnp.float32))
    vmem_need = resident_vmem_bytes(
        g, n_planes, weighted, jnp.dtype(dtype).itemsize,
        jnp.dtype(plane_dtype).itemsize if plane_dtype is not None
        else None)
    params = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem_need * 1.6) + (8 << 20),
                                 127 << 20)))

    def call(tol_sq, maxit, res_flag, rz_in, x0_l, b_l, p_l, *extra):
        return pl.pallas_call(
            kernel,
            in_specs=in_specs,
            out_specs=(vm, vm, vm, sm, sm),
            out_shape=out_shape,
            input_output_aliases={4: 0, 5: 1, 6: 2},
            interpret=interpret,
            **params,
        )(tol_sq, maxit, res_flag, rz_in, x0_l, b_l, p_l, *extra)

    return call


def resident_cg_call(g: ResidentGeometry, b: jnp.ndarray, x0=None, *,
                     coeffs, planes=None, weight=None,
                     tol: float = 1e-6, atol: float = 0.0,
                     maxiter: int = 1000, sym: bool = False,
                     interpret: bool = False, plane_dtype=None,
                     resume=None):
    """Low-level whole-solve kernel invocation; returns the LAYOUT-space
    carried state ``(x_l, r_l, p_l, k, rz, tol_sq)`` so chunked/
    checkpointed callers can feed it back via ``resume``.

    ``resume``: ``(x_l, r_l, p_l, rz, rw)`` — layout-space arrays plus the
    snapshot's carried scalars; skips the fresh init (r₀ = b − A·x₀,
    p₀ = r₀) and continues the exact recurrence.  ``b`` still supplies the
    convergence threshold's ‖b‖²."""
    dtype = b.dtype
    b_l = _to_layout(g, b.astype(dtype))
    p_dtype = dtype if plane_dtype is None else jnp.dtype(plane_dtype)
    extra = []
    if any(c is None for c in coeffs):
        extra.append(jnp.stack([_to_layout(g, planes[t].astype(p_dtype))
                                for t in range(planes.shape[0])]))
    weighted = weight is not None
    if weighted:
        extra.append(_to_layout(g, weight.astype(dtype)))

    bsq = b.astype(jnp.float32) ** 2
    if weighted:
        bsq = bsq * weight.astype(jnp.float32)
    bb = jnp.sum(bsq)
    tol_sq = jnp.maximum(jnp.asarray(tol, jnp.float32) ** 2 * bb,
                         jnp.asarray(atol, jnp.float32) ** 2)

    if resume is None:
        x0_l = (_to_layout(g, x0.astype(dtype)) if x0 is not None
                else jnp.zeros_like(b_l))
        p_l = jnp.zeros_like(b_l)
        res_flag = jnp.zeros((1, 1), jnp.int32)
        rz_in = jnp.zeros((1, 2), jnp.float32)
    else:
        x0_l, r_l_in, p_l, rz_s, rw_s = resume
        b_l = r_l_in                      # the b slot carries r on resume
        res_flag = jnp.ones((1, 1), jnp.int32)
        rz_in = jnp.stack([jnp.asarray(rz_s, jnp.float32),
                           jnp.asarray(rw_s, jnp.float32)]).reshape(1, 2)

    call = _build_call(g, tuple(coeffs), sym, weighted, dtype, interpret,
                       plane_dtype=plane_dtype)
    x_l, r_l, p_l, k, rz = call(tol_sq.reshape(1, 1),
                                jnp.full((1, 1), maxiter, jnp.int32),
                                res_flag, rz_in, x0_l, b_l, p_l, *extra)
    return x_l, r_l, p_l, k, rz, tol_sq


def resident_cg(g: ResidentGeometry, b: jnp.ndarray, x0=None, *,
                coeffs, planes=None, weight=None,
                tol: float = 1e-6, atol: float = 0.0, maxiter: int = 1000,
                sym: bool = False, interpret: bool = False,
                plane_dtype=None) -> CGResult:
    """Run the whole-solve kernel.  ``b``/``x0``/``weight`` flat (n,);
    ``planes`` (n_planes, n) in tap order for ``None`` coeff slots (the
    caller applies any diagonal scaling — semantics match
    :meth:`cgx.kernels.fused_engine.FusedCG.solve`)."""
    x_l, r_l, p_l, k, rz, tol_sq = resident_cg_call(
        g, b, x0, coeffs=coeffs, planes=planes, weight=weight, tol=tol,
        atol=atol, maxiter=maxiter, sym=sym, interpret=interpret,
        plane_dtype=plane_dtype)
    return CGResult(x=_from_layout(g, x_l),
                    iterations=k[0, 0],
                    residual_norm_sq=rz[0, 1],
                    converged=rz[0, 1] <= tol_sq,
                    history=jnp.zeros((0,), jnp.float32))


# ---------------------------------------------------------------------------
# Operator-level wrappers (the auto_solve entry points)
# ---------------------------------------------------------------------------

def resident_supported(a, dtype=jnp.float32) -> bool:
    """Whether :func:`resident_stencil_cg` / :func:`resident_dia_cg` can
    run this operator with the whole working set VMEM-resident."""
    from cgx.kernels import fused_cg as _fc
    from cgx.kernels.fused_dia_cg import (dia_engine_spec, supports_dia,
                                          wrap_entries_zero_or_none,
                                          data_symmetric_or_none)

    itemsize = jnp.dtype(dtype).itemsize
    spec = _fc.stencil_taps(a)
    if spec is not None and _fc.supports(a):
        nx, ny, nz, taps, _ = spec
        g = make_resident_geometry(nx, ny, nz, taps)
        return supports_resident(g, 0, False, itemsize)
    if supports_dia(a) and wrap_entries_zero_or_none(a) is True:
        nx, ny, nz, taps = dia_engine_spec(a)
        sym = data_symmetric_or_none(a) is True
        if sym:
            taps = [t for t, off in zip(taps, map(int, a.offsets))
                    if off >= 0]
        # Typical plane count: unit diagonal folds into a constant tap.
        n_planes = max(1, len(taps) - 1)
        g = make_resident_geometry(nx, ny, nz, taps)
        return supports_resident(g, n_planes, True, itemsize)
    return False


def resident_stencil_cg(s, b: jnp.ndarray, x0=None, *, tol: float = 1e-6,
                        atol: float = 0.0, maxiter: int = 1000,
                        interpret: Optional[bool] = None) -> CGResult:
    """Whole-solve resident CG on a constant-coefficient stencil;
    semantics of :func:`cgx.solve.cg.cg_solve` (no history)."""
    from cgx.kernels.fused_cg import stencil_taps, supports

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    spec = stencil_taps(s)
    if spec is None or not supports(s):
        raise ValueError("resident_stencil_cg: unsupported operator")
    nx, ny, nz, taps, coeffs = spec
    g = make_resident_geometry(nx, ny, nz, taps)
    return resident_cg(g, b, x0, coeffs=coeffs, tol=tol, atol=atol,
                       maxiter=int(maxiter), interpret=interpret)


def resident_dia_cg(d, b: jnp.ndarray, x0=None, *, tol: float = 1e-6,
                    atol: float = 0.0, maxiter: int = 1000,
                    jacobi: bool = True, inv_diag=None,
                    interpret: Optional[bool] = None,
                    plane_dtype=None) -> CGResult:
    """Whole-solve resident Jacobi-PCG on a 7-point DIA operator;
    matches :func:`cgx.kernels.fused_dia_cg.fused_dia_cg` semantics.
    ``plane_dtype=bfloat16`` holds the coefficient planes in bf16 —
    nearly halves the wide-tap VMEM footprint (residency reach), at the
    usual bf16-rounded-operator caveat (see ``fused_dia_cg``)."""
    import dataclasses

    from cgx.kernels.fused_dia_cg import (dia_prep,
                                          wrap_entries_zero_or_none)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if wrap_entries_zero_or_none(d) is False:
        raise ValueError(
            "resident_dia_cg: DIA data has nonzero x-plane-crossing "
            "entries — use cg_solve instead")
    dtype = b.dtype
    nx, ny, nz, taps, coeffs, planes, e, weight, sym = dia_prep(
        d, dtype, jacobi=jacobi, inv_diag=inv_diag)
    g = make_resident_geometry(nx, ny, nz, taps)
    if e is not None:
        b_s = e * b
        x0_s = None
        if x0 is not None:
            from cgx.ops.blas import safe_recip
            x0_s = x0 * safe_recip(e)
    else:
        b_s, x0_s = b, x0
    res = resident_cg(g, b_s, x0_s, coeffs=coeffs, planes=planes,
                      weight=weight, tol=tol, atol=atol,
                      maxiter=int(maxiter), sym=sym, interpret=interpret,
                      plane_dtype=plane_dtype)
    if e is not None:
        res = dataclasses.replace(res, x=e * res.x)
    return res
