"""Fused multi-RHS (SpMM) CG — the two-pass engine batched over a block
of right-hand sides.

Band-stacked layout, 2-D grid: each RHS gets its own halo-extended
``(rows8, total)`` band, stacked down the sublane axis into one
``(k·rows8, total)`` buffer, and the kernels run a ``(column_block,
band_group)`` grid that processes ``bps`` bands per step (4/2/1, the
largest dividing k).  Blocks and halo windows stay single-RHS-sized
(wide ``bl_a``, low window amplification) while the coefficient planes
— BlockSpec'd by column block for the pipelined path, manually
double-buffered halo windows started a full column early for the
symmetric path — are fetched ONCE per column and reused across all k
bands.  That is where the SpMM amortization materializes: k solves cost
one operator stream plus k vector streams.

Measured (v5e single chip, k=8, fp32, vs k sequential single-RHS fused
solves): 27-point variable-coefficient DIA 192³ **1.8x** (bit-identical
trajectories); 7-point DIA 192³ 0.93x — with only 3 shared plane
streams against 8 per-band vector streams there is nothing left to
amortize, so ``cg_solve_multi`` prefers sequential solves for
narrow-band operators and the batched engine for wide ones.  (Two
designs that measured SLOWER: stacking all k bands into one halo
window — per-band halos collapse block width to the 128-lane minimum
with 3x amplification, 0.5x; and one-band-per-step without tiling —
per-grid-step overhead capped streaming at ~60%, 0.85x.)

Per-band α/β scalars are computed on-core from per-band SMEM dot
accumulators (scalar loads/stores only — Mosaic has no vector SMEM
access, and rank-1 vectors crash its layout inference); each column
converges on its own schedule (finished columns coast, standard
batched-CG behavior matching :func:`cgx.solve.block.cg_solve_multi`).

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


def _kernel_a_multi(*refs, g: Geometry, coeffs, variable: bool, k: int,
                    sym: bool = False, bps: int = 1):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if variable and sym:
        (p_hbm, planes_hbm, q_ref, dots_ref,
         scratch, sem, pscratch, psem) = refs
    elif variable:
        p_hbm, planes_ref, q_ref, dots_ref, scratch, sem = refs
    else:
        p_hbm, q_ref, dots_ref, scratch, sem = refs

    ng = k // bps                              # band groups
    rows_g = bps * g.rows8
    j = pl.program_id(0)                       # column block (major)
    grp = pl.program_id(1)                     # band group (minor, fast)
    t = j * ng + grp                           # flattened step index
    win = g.bl_a + 2 * g.sl

    def dma(slot, tt):
        jj = tt // ng
        gg = tt % ng
        start = (g.bl_a - g.sl) + jj * g.bl_a  # statically 128-aligned
        return pltpu.make_async_copy(
            p_hbm.at[pl.ds(gg * rows_g, rows_g), pl.ds(start, win)],
            scratch.at[slot], sem.at[slot])

    def pdma(slot, jj):
        start = (g.bl_a - g.sl) + jj * g.bl_a
        return pltpu.make_async_copy(
            planes_hbm.at[:, :, pl.ds(start, win)],
            pscratch.at[slot], psem.at[slot])

    pw = None
    if g.double_buffer:
        @pl.when(t == 0)
        def _():
            dma(0, 0).start()
            if variable and sym:
                pdma(0, 0).start()

        @pl.when(t + 1 < g.nb_a * ng)
        def _():
            dma((t + 1) % 2, t + 1).start()

        if variable and sym:
            # Plane windows are SHARED across the band steps of a
            # column: start column j+1's fetch at group 0 of column j —
            # ng-1 band steps of overlap (a one-step-ahead BlockSpec
            # prefetch measured a per-column stall instead).
            @pl.when((grp == 0) & (j + 1 < g.nb_a))
            def _():
                pdma((j + 1) % 2, j + 1).start()

            @pl.when(grp == 0)
            def _():
                pdma(j % 2, j).wait()
            pw = pscratch[j % 2]

        dma(t % 2, t).wait()
        w_all = scratch[t % 2]                 # (rows_g, win)
    else:
        cps = [dma(0, t)]
        if variable and sym:
            @pl.when(grp == 0)
            def _():
                cp = pdma(0, j)
                cp.start()
                cp.wait()
            pw = pscratch[0]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()
        w_all = scratch[0]

    nxl = g.nxl
    lane = j * g.bl_a + jax.lax.broadcasted_iota(jnp.int32, (1, g.bl_a), 1)
    kk = lane % g.nz
    jy = (lane // g.nz) % g.ny
    valid = lane < g.l_real

    for u in range(bps):                       # unrolled sub-bands
        w = w_all[u * g.rows8:(u + 1) * g.rows8]
        y = None
        pi = 0
        for tt, (dx, dy, dk) in enumerate(g.taps):
            dl = dy * g.nz + dk
            s = w[1 + dx:1 + dx + nxl, g.sl + dl:g.sl + dl + g.bl_a]
            if coeffs[tt] is None and sym:
                # One windowed plane yields both taps of the ±off pair
                # (see the single-RHS kernel): +off at the output
                # position, the mirror at the (-dx, -dl)-shifted one.
                wp = pw[pi]
                pi += 1
                # Planes may stream narrower (plane_dtype=bf16): upcast
                # in-register so products keep the vector mantissa.
                term = (wp[1:1 + nxl, g.sl:g.sl + g.bl_a]
                        .astype(w.dtype) * s)
                if (dx, dy, dk) != (0, 0, 0):
                    term = term + (
                        wp[1 - dx:1 - dx + nxl,
                           g.sl - dl:g.sl - dl + g.bl_a].astype(w.dtype)
                        * w[1 - dx:1 - dx + nxl,
                            g.sl - dl:g.sl - dl + g.bl_a])
            elif coeffs[tt] is None:
                term = planes_ref[pi, 1:1 + nxl, :].astype(s.dtype) * s
                pi += 1
            else:
                term = coeffs[tt] * s
                m = None
                if dk:
                    m = (kk + dk >= 0) & (kk + dk < g.nz)
                if dy:
                    my = (jy + dy >= 0) & (jy + dy < g.ny)
                    m = my if m is None else m & my
                if m is not None:
                    term = jnp.where(m, term, 0.0)
            y = term if y is None else y + term

        if sym or any(c is not None for c in coeffs):
            y = jnp.where(valid, y, 0.0)

        q_ref[u * g.rows8:(u + 1) * g.rows8, :] = jnp.pad(
            y, ((1, g.rows8 - 1 - nxl), (0, 0)))

        bidx = grp * bps + u

        @pl.when(j == 0)
        def _(bidx=bidx):
            dots_ref[0, bidx] = 0.0
            dots_ref[1, bidx] = 0.0

        gc = w[1:1 + nxl, g.sl:g.sl + g.bl_a]
        y32 = y.astype(jnp.float32)
        dots_ref[0, bidx] += jnp.sum(y32 * gc.astype(jnp.float32))
        dots_ref[1, bidx] += jnp.sum(y32 * y32)


def _kernel_b_multi(*refs, g: Geometry, weighted: bool, k: int,
                    bps: int = 1):
    from jax.experimental import pallas as pl

    if weighted:
        (rz_ref, pqqq_ref, x_ref, r_ref, p_ref, q_ref, w_ref,
         x_out, r_out, p_out, dots_ref) = refs
    else:
        (rz_ref, pqqq_ref, x_ref, r_ref, p_ref, q_ref,
         x_out, r_out, p_out, dots_ref) = refs

    i = pl.program_id(0)
    grp = pl.program_id(1)

    for u in range(bps):                       # unrolled sub-bands
        band = grp * bps + u
        sl = slice(u * g.rows8, (u + 1) * g.rows8)
        rz = rz_ref[0, band]                   # solve-space ‖r̃_band‖²
        pq = pqqq_ref[0, band]
        qq = pqqq_ref[1, band]
        # Converged-band freeze: the shared loop keeps running until EVERY
        # band meets its tolerance, and a band whose rz underflows to 0
        # would otherwise produce 0/0 = NaN (poisoning x and flipping its
        # converged flag).  alpha = beta = 0 makes the update an identity
        # (x, r unchanged; p ← r + 0·p keeps future q = A·r ≈ 0 harmless
        # since alpha stays gated on rz > 0) — matching the vmapped XLA
        # path's frozen-column semantics.
        live = (rz > 0.0) & (pq > 0.0)
        alpha32 = jnp.where(live, rz / jnp.where(pq > 0.0, pq, 1.0), 0.0)
        beta = jnp.where(
            live,
            (alpha32 * alpha32 * qq - rz) / jnp.where(rz > 0.0, rz, 1.0),
            0.0).astype(p_ref.dtype)
        alpha = alpha32.astype(x_ref.dtype)

        pv = p_ref[sl, :]
        x_out[sl, :] = x_ref[sl, :] + alpha * pv
        r_new = r_ref[sl, :] - alpha * q_ref[sl, :]
        r_out[sl, :] = r_new
        p_out[sl, :] = r_new + beta * pv

        @pl.when(i == 0)
        def _(band=band):
            dots_ref[0, band] = 0.0
            dots_ref[1, band] = 0.0

        r32 = r_new.astype(jnp.float32)
        rsq = r32 * r32
        s = jnp.sum(rsq)
        dots_ref[0, band] += s
        if weighted:
            dots_ref[1, band] += jnp.sum(
                rsq * w_ref[sl, :].astype(jnp.float32))
        else:
            dots_ref[1, band] += s


def _exchange_multi(g: Geometry, k: int, axis_name, a):
    """Fill the embedded halo rows of every band of the band-stacked
    layout from the neighbour shards (no-op single-device).  Band ``u``
    occupies rows ``[u·rows8, (u+1)·rows8)``; its real x-planes are rows
    ``1..nxl`` within the band, halos at 0 and ``nxl + 1``.  One forward
    and one backward ``ppermute`` of a (k, total) row gather — the same
    traffic ratio as the single-RHS engine's two-row exchange."""
    import numpy as np

    if axis_name is None:
        return a
    nd = jax.lax.psum(1, axis_name)          # static under shard_map
    if nd == 1:
        return a
    base = np.arange(k) * g.rows8
    fwd = jax.lax.ppermute(a[base + g.nxl], axis_name,
                           [(i, i + 1) for i in range(nd - 1)])
    bwd = jax.lax.ppermute(a[base + 1], axis_name,
                           [(i, i - 1) for i in range(1, nd)])
    return a.at[base, :].set(fwd).at[base + g.nxl + 1, :].set(bwd)


def _solve_multi(geom: Geometry, coeffs, planes, weight, b2, x0_2, *,
                 tol, atol, maxiter, interpret, dtype,
                 sym: bool = False, axis_name=None,
                 plane_dtype=None) -> CGResult:
    """Core batched driver; ``b2``/``x0_2`` are (k, n_local).  Under
    ``shard_map`` pass ``axis_name`` and per-shard arrays (the geometry
    built with ``n_shards``): halos ride :func:`_exchange_multi` and the
    (2, k) dot blocks become ``psum`` s."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = geom
    k = b2.shape[0]

    def allsum(v):
        return v if axis_name is None else jax.lax.psum(v, axis_name)
    n_planes = sum(1 for c in coeffs if c is None)
    variable = n_planes > 0
    sym = bool(sym and variable)
    p_dtype = dtype if plane_dtype is None else jnp.dtype(plane_dtype)
    if variable:
        planes_l = jnp.stack([to_layout(g, planes[t].astype(p_dtype))
                              for t in range(n_planes)])
        if sym and axis_name is not None:
            # Mirror taps read the planes one row shifted: fill the plane
            # halo rows from the neighbour shards ONCE (planes are
            # static, unlike p's per-iteration exchange).
            nd = jax.lax.psum(1, axis_name)
            if nd > 1:
                fwd = jax.lax.ppermute(
                    planes_l[:, g.nxl, :], axis_name,
                    [(i, i + 1) for i in range(nd - 1)])
                bwd = jax.lax.ppermute(
                    planes_l[:, 1, :], axis_name,
                    [(i, i - 1) for i in range(1, nd)])
                planes_l = (planes_l.at[:, 0, :].set(fwd)
                            .at[:, g.nxl + 1, :].set(bwd))
    weight_l = (_to_layout_multi(g, jnp.broadcast_to(
        weight.astype(dtype)[None], b2.shape))
        if weight is not None else None)
    weighted = weight_l is not None

    rows = k * g.rows8
    # Band tiling: bps bands per grid step (largest of 4/2/1 dividing
    # k).  Fewer, taller steps — per-grid-step overhead was measured to
    # cap one-band steps at ~50-60% of streaming bandwidth.
    bps = 4 if k % 4 == 0 else (2 if k % 2 == 0 else 1)
    ng = k // bps
    rows_g = bps * g.rows8
    vec_blk_a = pl.BlockSpec((rows_g, g.bl_a),
                             lambda j, grp: (grp, j + 1),
                             memory_space=pltpu.VMEM)
    # Kernel B uses the same wide blocks as A: its grid is already ng x
    # the single-RHS step count, so bl-sized blocks would multiply the
    # per-step overhead into the dominant cost.
    vec_blk = vec_blk_a
    smem_k = pl.BlockSpec((1, k), lambda i, grp: (0, 0),
                          memory_space=pltpu.SMEM)
    smem_2k = pl.BlockSpec((2, k), lambda i, grp: (0, 0),
                           memory_space=pltpu.SMEM)
    vshape = jax.ShapeDtypeStruct((rows, g.total), dtype)
    s2k = jax.ShapeDtypeStruct((2, k), jnp.float32)

    kernel_a = partial(_kernel_a_multi, g=g, coeffs=tuple(coeffs),
                       variable=variable, k=k, sym=sym, bps=bps)
    kernel_b = partial(_kernel_b_multi, g=g, weighted=weighted, k=k,
                       bps=bps)

    a_in = [pl.BlockSpec(memory_space=pl.ANY)]
    a_args = ()
    if variable:
        if sym:
            a_in.append(pl.BlockSpec(memory_space=pl.ANY))
        else:
            # Indexed by the column block ONLY: unchanged across the k
            # band steps, so Pallas fetches each plane block once per
            # column.
            a_in.append(pl.BlockSpec((n_planes, g.rows8, g.bl_a),
                                     lambda j, band: (0, 0, j + 1),
                                     memory_space=pltpu.VMEM))
        a_args = (planes_l,)
    n_slots = 2 if g.double_buffer else 1
    win = g.bl_a + 2 * g.sl
    a_scratch = [pltpu.VMEM((n_slots, rows_g, win), dtype),
                 pltpu.SemaphoreType.DMA((n_slots,))]
    if sym:
        a_scratch += [pltpu.VMEM((n_slots, n_planes, g.rows8, win),
                                 p_dtype),
                      pltpu.SemaphoreType.DMA((n_slots,))]
    # Scoped-VMEM limits from the ACTUAL scratch/block shapes (the
    # geometry's model doesn't know about band tiling): manual window
    # scratch + pipelined in/out blocks + compute temporaries.
    itm = jnp.dtype(dtype).itemsize
    p_itm = jnp.dtype(p_dtype).itemsize
    a_usage = itm * n_slots * rows_g * win
    if sym:
        a_usage += p_itm * n_slots * n_planes * g.rows8 * win
    else:
        a_usage += p_itm * 2 * n_planes * g.rows8 * g.bl_a
    a_usage += itm * 6 * rows_g * g.bl_a       # q out + temporaries
    a_params = {}
    if not interpret and (a_usage > (14 << 20) or g.a_vmem_limit):
        a_params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(max(int(a_usage * 1.3) + (4 << 20),
                                     g.a_vmem_limit or 0), 120 << 20))
    b_usage = itm * (8 + 2 * (1 if weighted else 0)) * 2 * rows_g * g.bl_a
    b_params = {}
    if not interpret and b_usage > (14 << 20):
        b_params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(int(b_usage * 1.3) + (4 << 20), 120 << 20))

    def call_a(p_l):
        return pl.pallas_call(
            kernel_a,
            grid=(g.nb_a, ng),
            in_specs=a_in,
            out_specs=(vec_blk_a, smem_2k),
            out_shape=(vshape, s2k),
            scratch_shapes=a_scratch,
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
            grid=(g.nb_a, ng),
            in_specs=b_in,
            out_specs=(vec_blk, vec_blk, vec_blk, smem_2k),
            out_shape=(vshape, vshape, vshape, s2k),
            input_output_aliases={2: 0, 3: 1, 4: 2},
            interpret=interpret,
            **b_params,
        )(rz, pqqq, x, r, p, q, *b_args)

    b_l = _to_layout_multi(g, b2.astype(dtype))
    bsq = b2.astype(jnp.float32) ** 2
    if weight is not None:
        bsq = bsq * weight.astype(jnp.float32)[None]
    bb = allsum(jnp.sum(bsq, axis=1))                   # (k,) global
    tol_sq = jnp.maximum(jnp.asarray(tol, jnp.float32) ** 2 * bb,
                         jnp.asarray(atol, jnp.float32) ** 2)

    if x0_2 is None:
        x_l = jnp.zeros_like(b_l)
        r_l = b_l
    else:
        x_l = _to_layout_multi(g, x0_2.astype(dtype))
        q0, _ = call_a(_exchange_multi(g, k, axis_name, x_l))
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
        return allsum(jnp.stack([s, sw]))               # (2, k) global

    rz0 = rz_of(r_l)

    def cond(c):
        x, r, p, rz, it = c
        return jnp.logical_and(it < maxiter, jnp.any(rz[1] > tol_sq))

    def body(c):
        x, r, p, rz, it = c
        p = _exchange_multi(g, k, axis_name, p)
        q, pqqq = call_a(p)
        pqqq = allsum(pqqq)
        x, r, p, dots = call_b(rz[:1], pqqq, x, r, p, q)
        dots = allsum(dots)
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
    geom = make_geometry(nx, ny, nz, taps,
                         residency_multiplier=b.shape[1],
                         itemsize=jnp.dtype(b.dtype).itemsize)
    return _solve_multi(geom, coeffs, None, None, b.T,
                        None if x0 is None else x0.T,
                        tol=tol, atol=atol, maxiter=int(maxiter),
                        interpret=interpret, dtype=b.dtype)


def fused_dia_cg_multi(d, b: jnp.ndarray, x0=None, *, tol: float = 1e-6,
                       atol: float = 0.0, maxiter: int = 1000,
                       jacobi: bool = True, inv_diag=None,
                       interpret: Optional[bool] = None,
                       plane_dtype=None,
                       assume_symmetric: Optional[bool] = None) -> CGResult:
    """Batched fused Jacobi-PCG on a banded DIA operator; ``b``: (n, k).

    ``plane_dtype=bfloat16`` streams the shared coefficient planes in
    bf16 (vectors stay ``b.dtype``) — converges to the bf16-rounded
    operator's solution; see :func:`cgx.kernels.fused_dia_cg.fused_dia_cg`.
    ``assume_symmetric``: same jit-caller escape hatch as the single-RHS
    engine (a traced ``d.data`` cannot be symmetry-checked).
    """
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
        d, dtype, jacobi=jacobi, inv_diag=inv_diag,
        assume_symmetric=assume_symmetric)
    isz = jnp.dtype(dtype).itemsize
    p_isz = jnp.dtype(plane_dtype).itemsize if plane_dtype is not None \
        else isz
    pb = planes.shape[0] * nx * ny * nz * p_isz
    if sym:
        geom = make_geometry(nx, ny, nz, taps, target_block_bytes=1 << 18,
                             a_window_streams=1 + planes.shape[0],
                             residency_multiplier=b.shape[1],
                             itemsize=isz, plane_bytes=pb)
    else:
        geom = make_geometry(nx, ny, nz, taps, target_block_bytes=1 << 18,
                             a_extra_streams=2 * planes.shape[0],
                             residency_multiplier=b.shape[1],
                             itemsize=isz, plane_bytes=pb)
    b2 = b.T
    x0_2 = None if x0 is None else x0.T
    if e is not None:
        b2 = b2 * e[None]
        if x0_2 is not None:
            from cgx.ops.blas import safe_recip
            inv_e = safe_recip(e)
            x0_2 = x0_2 * inv_e[None]
    res = _solve_multi(geom, coeffs, planes, weight, b2, x0_2,
                       tol=tol, atol=atol, maxiter=int(maxiter),
                       interpret=interpret, dtype=dtype, sym=sym,
                       plane_dtype=plane_dtype)
    if e is not None:
        res = dataclasses.replace(res, x=res.x * e[:, None])
    return res
