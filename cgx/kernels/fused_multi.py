"""Fused multi-RHS (SpMM) CG — the two-pass engine batched over a block
of right-hand sides.

Band-stacked layout: each RHS gets its own halo-extended ``(rows8,
total)`` band, stacked down the sublane axis into one ``(k·rows8,
total)`` buffer.  The embedded per-band halo rows keep the row-shift taps
from leaking between bands, so kernel A applies the operator to ALL
right-hand sides while reading the coefficient planes ONCE — the SpMM
amortization the north star asks for (k solves cost one operator stream
plus k vector streams).  Per-band α/β scalars are computed on-core from
per-band dot accumulators; each column converges on its own schedule
(finished columns coast, standard batched-CG behavior matching
:func:`cgx.solve.block.cg_solve_multi`).

API matches ``cg_solve_multi``: ``b`` is ``(n, k)``, the result carries
``x: (n, k)`` and per-column scalars ``(k,)``.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from cgx.kernels.fused_engine import Geometry, from_layout, make_geometry, \
    to_layout
from cgx.solve.cg import CGResult

__all__ = ["fused_stencil_cg_multi", "fused_dia_cg_multi"]


def _to_layout_multi(g: Geometry, v: jnp.ndarray) -> jnp.ndarray:
    """(k, n_local) → (k·rows8, total) band-stacked layout."""
    k = v.shape[0]
    bands = jnp.stack([to_layout(g, v[i]) for i in range(k)])
    return bands.reshape(k * g.rows8, g.total)


def _from_layout_multi(g: Geometry, a: jnp.ndarray, k: int) -> jnp.ndarray:
    bands = a.reshape(k, g.rows8, g.total)
    return jnp.stack([from_layout(g, bands[i]) for i in range(k)])


def _kernel_a_multi(*refs, g: Geometry, coeffs, variable: bool, k: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if variable:
        p_hbm, planes_ref, q_ref, dots_ref, scratch, sem = refs
    else:
        p_hbm, q_ref, dots_ref, scratch, sem = refs

    j = pl.program_id(0)
    win = g.bl_a + 2 * g.sl

    def dma(slot, blk):
        start = (g.bl_a - g.sl) + blk * g.bl_a
        return pltpu.make_async_copy(
            p_hbm.at[:, pl.ds(start, win)], scratch.at[slot], sem.at[slot])

    if g.double_buffer:
        @pl.when(j == 0)
        def _():
            dma(0, 0).start()

        @pl.when(j + 1 < g.nb_a)
        def _():
            dma((j + 1) % 2, j + 1).start()

        dma(j % 2, j).wait()
        w = scratch[j % 2].reshape(k, g.rows8, win)
    else:
        start = (g.bl_a - g.sl) + j * g.bl_a
        cp = pltpu.make_async_copy(
            p_hbm.at[:, pl.ds(start, win)], scratch.at[0], sem.at[0])
        cp.start()
        cp.wait()
        w = scratch[0].reshape(k, g.rows8, win)

    nxl = g.nxl
    lane = j * g.bl_a + jax.lax.broadcasted_iota(jnp.int32, (1, g.bl_a), 1)
    kk = lane % g.nz
    jy = (lane // g.nz) % g.ny
    valid = lane < g.l_real

    y = None
    pi = 0
    for t, (dx, dy, dk) in enumerate(g.taps):
        dl = dy * g.nz + dk
        s = w[:, 1 + dx:1 + dx + nxl, g.sl + dl:g.sl + dl + g.bl_a]
        if coeffs[t] is None:
            term = planes_ref[pi, 1:1 + nxl, :][None] * s
            pi += 1
        else:
            term = coeffs[t] * s
            m = None
            if dk:
                m = (kk + dk >= 0) & (kk + dk < g.nz)
            if dy:
                my = (jy + dy >= 0) & (jy + dy < g.ny)
                m = my if m is None else m & my
            if m is not None:
                term = jnp.where(m[None], term, 0.0)
        y = term if y is None else y + term

    if any(c is not None for c in coeffs):
        y = jnp.where(valid[None], y, 0.0)

    q_ref[...] = jnp.pad(
        y, ((0, 0), (1, g.rows8 - 1 - nxl), (0, 0))).reshape(
            k * g.rows8, g.bl_a)

    @pl.when(j == 0)
    def _():
        dots_ref[...] = jnp.zeros_like(dots_ref)

    gc = w[:, 1:1 + nxl, g.sl:g.sl + g.bl_a]
    y32 = y.astype(jnp.float32)
    dots_ref[0, :] += jnp.sum(y32 * gc.astype(jnp.float32), axis=(1, 2))
    dots_ref[1, :] += jnp.sum(y32 * y32, axis=(1, 2))


def _kernel_b_multi(*refs, g: Geometry, weighted: bool, k: int):
    from jax.experimental import pallas as pl

    if weighted:
        (rz_ref, pqqq_ref, x_ref, r_ref, p_ref, q_ref, w_ref,
         x_out, r_out, p_out, dots_ref) = refs
    else:
        (rz_ref, pqqq_ref, x_ref, r_ref, p_ref, q_ref,
         x_out, r_out, p_out, dots_ref) = refs

    i = pl.program_id(0)
    rz = rz_ref[0, :]                           # (k,) solve-space ‖r̃‖²
    pq = pqqq_ref[0, :]
    qq = pqqq_ref[1, :]
    alpha32 = rz / pq
    beta = ((alpha32 * alpha32 * qq - rz) / rz).astype(p_ref.dtype)
    alpha = alpha32.astype(x_ref.dtype)

    def bands(ref):
        return ref[...].reshape(k, g.rows8, -1)

    a3 = alpha[:, None, None]
    b3 = beta[:, None, None]
    pv = bands(p_ref)
    xv = bands(x_ref) + a3 * pv
    r_new = bands(r_ref) - a3 * bands(q_ref)
    p_new = r_new + b3 * pv
    x_out[...] = xv.reshape(k * g.rows8, -1)
    r_out[...] = r_new.reshape(k * g.rows8, -1)
    p_out[...] = p_new.reshape(k * g.rows8, -1)

    @pl.when(i == 0)
    def _():
        dots_ref[...] = jnp.zeros_like(dots_ref)

    r32 = r_new.astype(jnp.float32)
    rsq = r32 * r32
    s = jnp.sum(rsq, axis=(1, 2))
    dots_ref[0, :] += s
    if weighted:
        wv = bands(w_ref).astype(jnp.float32)
        dots_ref[1, :] += jnp.sum(rsq * wv, axis=(1, 2))
    else:
        dots_ref[1, :] += s


def _solve_multi(geom: Geometry, coeffs, planes, weight, b2, x0_2, *,
                 tol, atol, maxiter, interpret, dtype) -> CGResult:
    """Core batched driver; ``b2``/``x0_2`` are (k, n_local)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = geom
    k = b2.shape[0]
    n_planes = sum(1 for c in coeffs if c is None)
    variable = n_planes > 0
    if variable:
        planes_l = jnp.stack([to_layout(g, planes[t].astype(dtype))
                              for t in range(n_planes)])
    weight_l = (_to_layout_multi(g, jnp.broadcast_to(
        weight.astype(dtype)[None], b2.shape))
        if weight is not None else None)
    weighted = weight_l is not None

    rows = k * g.rows8
    vec_blk_a = pl.BlockSpec((rows, g.bl_a), lambda i: (0, i + 1),
                             memory_space=pltpu.VMEM)
    m = g.bl_a // g.bl
    vec_blk = pl.BlockSpec((rows, g.bl), lambda i: (0, i + m),
                           memory_space=pltpu.VMEM)
    smem_k = pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.SMEM)
    smem_2k = pl.BlockSpec((2, k), lambda i: (0, 0), memory_space=pltpu.SMEM)
    vshape = jax.ShapeDtypeStruct((rows, g.total), dtype)
    s2k = jax.ShapeDtypeStruct((2, k), jnp.float32)

    kernel_a = partial(_kernel_a_multi, g=g, coeffs=tuple(coeffs),
                       variable=variable, k=k)
    kernel_b = partial(_kernel_b_multi, g=g, weighted=weighted, k=k)

    a_in = [pl.BlockSpec(memory_space=pl.ANY)]
    a_args = ()
    if variable:
        a_in.append(pl.BlockSpec((n_planes, g.rows8, g.bl_a),
                                 lambda i: (0, 0, i + 1),
                                 memory_space=pltpu.VMEM))
        a_args = (planes_l,)
    n_slots = 2 if g.double_buffer else 1
    a_params = {}
    if g.a_vmem_limit and not interpret:
        a_params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=g.a_vmem_limit)

    def call_a(p_l):
        return pl.pallas_call(
            kernel_a,
            grid=(g.nb_a,),
            in_specs=a_in,
            out_specs=(vec_blk_a, smem_2k),
            out_shape=(vshape, s2k),
            scratch_shapes=[
                pltpu.VMEM((n_slots, rows, g.bl_a + 2 * g.sl), dtype),
                pltpu.SemaphoreType.DMA((n_slots,))],
            interpret=interpret,
            **a_params,
        )(p_l, *a_args)

    b_in = [smem_k, smem_2k, vec_blk, vec_blk, vec_blk, vec_blk]
    b_args = ()
    if weighted:
        b_in.append(vec_blk)
        b_args = (weight_l,)

    def call_b(rz, pqqq, x, r, p, q):
        return pl.pallas_call(
            kernel_b,
            grid=(g.nb,),
            in_specs=b_in,
            out_specs=(vec_blk, vec_blk, vec_blk, smem_2k),
            out_shape=(vshape, vshape, vshape, s2k),
            input_output_aliases={2: 0, 3: 1, 4: 2},
            interpret=interpret,
        )(rz, pqqq, x, r, p, q, *b_args)

    b_l = _to_layout_multi(g, b2.astype(dtype))
    bsq = b2.astype(jnp.float32) ** 2
    if weight is not None:
        bsq = bsq * weight.astype(jnp.float32)[None]
    bb = jnp.sum(bsq, axis=1)                           # (k,)
    tol_sq = jnp.maximum(jnp.asarray(tol, jnp.float32) ** 2 * bb,
                         jnp.asarray(atol, jnp.float32) ** 2)

    if x0_2 is None:
        x_l = jnp.zeros_like(b_l)
        r_l = b_l
    else:
        x_l = _to_layout_multi(g, x0_2.astype(dtype))
        q0, _ = call_a(x_l)
        r_l = _to_layout_multi(
            g, b2.astype(dtype) - _from_layout_multi(g, q0, k))

    def rz_of(r_l):
        rb = r_l.reshape(k, g.rows8, g.total).astype(jnp.float32)
        s = jnp.sum(rb * rb, axis=(1, 2))
        if weight_l is not None:
            wv = weight_l.reshape(k, g.rows8, g.total).astype(jnp.float32)
            sw = jnp.sum(rb * rb * wv, axis=(1, 2))
        else:
            sw = s
        return jnp.stack([s, sw])                       # (2, k)

    rz0 = rz_of(r_l)

    def cond(c):
        x, r, p, rz, it = c
        return jnp.logical_and(it < maxiter, jnp.any(rz[1] > tol_sq))

    def body(c):
        x, r, p, rz, it = c
        q, pqqq = call_a(p)
        x, r, p, dots = call_b(rz[:1], pqqq, x, r, p, q)
        return (x, r, p, dots, it + 1)

    x, r, p, rz, it = jax.lax.while_loop(
        cond, body, (x_l, r_l, r_l, rz0, jnp.zeros((), jnp.int32)))

    return CGResult(x=_from_layout_multi(g, x, k).T,     # (n, k)
                    iterations=jnp.broadcast_to(it, (k,)),
                    residual_norm_sq=rz[1],
                    converged=rz[1] <= tol_sq,
                    history=jnp.zeros((0,), jnp.float32))


def fused_stencil_cg_multi(s, b: jnp.ndarray, x0=None, *, tol: float = 1e-6,
                           atol: float = 0.0, maxiter: int = 1000,
                           interpret: Optional[bool] = None) -> CGResult:
    """Batched fused CG on a constant-coefficient stencil; ``b``: (n, k).

    Semantics match :func:`cgx.solve.block.cg_solve_multi` except the
    iteration count is shared (the loop runs until ALL columns converge;
    per-column ``converged`` and residuals are still reported).
    """
    from cgx.kernels.fused_cg import stencil_taps, supports

    if b.ndim != 2:
        raise ValueError(f"expected b of shape (n, k), got {b.shape}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    spec = stencil_taps(s)
    if spec is None or not supports(s):
        raise ValueError("unsupported operator for the fused multi path")
    nx, ny, nz, taps, coeffs = spec
    geom = make_geometry(nx, ny, nz, taps, row_multiplier=b.shape[1])
    return _solve_multi(geom, coeffs, None, None, b.T,
                        None if x0 is None else x0.T,
                        tol=tol, atol=atol, maxiter=int(maxiter),
                        interpret=interpret, dtype=b.dtype)


def fused_dia_cg_multi(d, b: jnp.ndarray, x0=None, *, tol: float = 1e-6,
                       atol: float = 0.0, maxiter: int = 1000,
                       jacobi: bool = True, inv_diag=None,
                       interpret: Optional[bool] = None) -> CGResult:
    """Batched fused Jacobi-PCG on a banded DIA operator; ``b``: (n, k)."""
    from cgx.kernels.fused_dia_cg import (dia_prep,
                                          wrap_entries_zero_or_none)

    if b.ndim != 2:
        raise ValueError(f"expected b of shape (n, k), got {b.shape}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if wrap_entries_zero_or_none(d) is False:
        raise ValueError("DIA data has nonzero x-plane-crossing entries")
    dtype = b.dtype
    nx, ny, nz, taps, coeffs, planes, e, weight, sym = dia_prep(
        d, dtype, jacobi=jacobi, inv_diag=inv_diag, allow_sym=False)
    geom = make_geometry(nx, ny, nz, taps, target_block_bytes=1 << 18,
                         row_multiplier=b.shape[1],
                         a_extra_streams=2 * planes.shape[0])
    b2 = b.T
    x0_2 = None if x0 is None else x0.T
    if e is not None:
        b2 = b2 * e[None]
        if x0_2 is not None:
            inv_e = jnp.where(e > 0, 1.0 / jnp.where(e > 0, e, 1.0), 0.0)
            x0_2 = x0_2 * inv_e[None]
    res = _solve_multi(geom, coeffs, planes, weight, b2, x0_2,
                       tol=tol, atol=atol, maxiter=int(maxiter),
                       interpret=interpret, dtype=dtype)
    if e is not None:
        res = dataclasses.replace(res, x=res.x * e[:, None])
    return res
