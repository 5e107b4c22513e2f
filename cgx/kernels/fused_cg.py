"""Fused CG iteration for 3-D stencil operators — three Pallas passes.

Motivation (measured, docs/PERF_NOTES.md): XLA cross-fuses the whole CG
loop body only while a vector fits in VMEM — 40.6 µs/iter at 2.1 M rows
(128³) collapses to 600 µs/iter at 4.1 M rows (160³) even at perfectly
tile-aligned sizes.  This module pins the iteration at its streaming cost
for any n: every pass is an explicit Pallas kernel moving each vector
exactly once, with the dot products accumulated in SMEM scratch along the
way (no separate reduction passes) and the α/β scalar algebra computed
on-core.

Per CG iteration (plain CG; for the constant-diagonal Poisson operators
Jacobi preconditioning is an exact rescaling, so this IS the PCG path for
the north-star configs):

  A. ``q = A p`` (halo-window stencil, one DMA per block) fused with
     ``pq += p·q``            — reads p, writes q.
  B. ``x += α p; r -= α q`` fused with ``rz' += r·r``
                              — reads x, p, r, q; writes x, r.
  C. ``p = r + β p``          — reads r, p; writes p.

Vectors live in the kernel's 2-D ``(rows, nz_pad)`` layout for the whole
solve (converted once at entry/exit), with one leading/trailing halo block
so every DMA offset is statically tile-aligned.

Constraints (v1): 3-D stencils with ``ny % 8 == 0``; fp32.  Falls back to
the XLA path otherwise.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from cgx.solve.cg import CGResult

__all__ = ["fused_stencil_cg", "supports"]


def supports(s) -> bool:
    """Whether the fused path can run for this operator."""
    from cgx.sparse.stencil import Stencil3D

    return (isinstance(s, Stencil3D) and s.ny % 8 == 0
            and s.nx * s.ny >= 8)


# --------------------------------------------------------------------------
# Kernel A: q = A p, pq += p.q
# --------------------------------------------------------------------------

def _kernel_a(p_hbm, q_ref, pq_ref, scratch, sem, *, ny, nz, n_rows,
              block_rows, window, c):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cc, cx, cy, cz = c
    i = pl.program_id(0)
    # Real rows of block i live at layout rows block_rows + i*block_rows;
    # the window starts ny rows above them.
    start = (block_rows - ny) + i * block_rows
    cp = pltpu.make_async_copy(p_hbm.at[pl.ds(start, window), :], scratch,
                               sem)
    cp.start()
    cp.wait()

    w = scratch[...]
    nz_pad = w.shape[1]
    g = w[ny:ny + block_rows]
    y = cc * g
    y = y + cz * jnp.pad(g[:, 1:], ((0, 0), (0, 1)))
    y = y + cz * jnp.pad(g[:, :-1], ((0, 0), (1, 0)))
    r = i * block_rows + jax.lax.broadcasted_iota(
        jnp.int32, (block_rows, 1), 0)
    j = r % ny
    y = y + jnp.where(j < ny - 1, cy * w[ny + 1:ny + 1 + block_rows], 0.0)
    y = y + jnp.where(j > 0, cy * w[ny - 1:ny - 1 + block_rows], 0.0)
    y = y + cx * w[2 * ny:2 * ny + block_rows] + cx * w[:block_rows]

    col = jax.lax.broadcasted_iota(jnp.int32, (block_rows, nz_pad), 1)
    y = jnp.where(jnp.logical_and(r < n_rows, col < nz), y, 0.0)
    q_ref[...] = y

    @pl.when(i == 0)
    def _():
        pq_ref[0, 0] = 0.0

    pq_ref[0, 0] += jnp.sum(y * g)


# --------------------------------------------------------------------------
# Kernel B: x += alpha p ; r -= alpha q ; rz' += r.r
# --------------------------------------------------------------------------

def _kernel_b(rz_ref, pq_ref, x_ref, r_ref, p_ref, q_ref, x_out, r_out,
              rznew_ref):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    alpha = rz_ref[0, 0] / pq_ref[0, 0]
    x_out[...] = x_ref[...] + alpha * p_ref[...]
    r_new = r_ref[...] - alpha * q_ref[...]
    r_out[...] = r_new

    @pl.when(i == 0)
    def _():
        rznew_ref[0, 0] = 0.0

    rznew_ref[0, 0] += jnp.sum(r_new * r_new)


# --------------------------------------------------------------------------
# Kernel C: p = r + beta p
# --------------------------------------------------------------------------

def _kernel_c(rznew_ref, rz_ref, r_ref, p_ref, p_out):
    beta = rznew_ref[0, 0] / rz_ref[0, 0]
    p_out[...] = r_ref[...] + beta * p_ref[...]


def _layout(s, block_rows):
    n_rows = s.nx * s.ny
    nz_pad = -(-s.nz // 128) * 128
    block_rows = max(8, min(block_rows, -(-n_rows // 8) * 8))
    if block_rows < s.ny + 8:
        block_rows = -(-(s.ny + 8) // 8) * 8
    rows_pad = -(-n_rows // block_rows) * block_rows
    window = -(-(block_rows + 2 * s.ny) // 8) * 8
    total = rows_pad + 2 * block_rows       # halo block on each side
    return n_rows, nz_pad, block_rows, rows_pad, window, total


def fused_stencil_cg(s, b: jnp.ndarray, *, tol: float = 1e-6,
                     atol: float = 0.0, maxiter: int = 1000,
                     block_rows: int = 2048,
                     interpret: bool = False) -> CGResult:
    """Plain CG on a :class:`~cgx.sparse.stencil.Stencil3D`, fused passes.

    Semantics match ``cg_solve(s, b, tol=..., maxiter=...)`` (fp32 dot
    accumulation; trajectories match the XLA path to fp32 roundoff).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if not supports(s):
        raise ValueError("fused_stencil_cg: unsupported operator "
                         "(need Stencil3D with ny % 8 == 0)")
    n = s.shape[0]
    n_rows, nz_pad, block_rows, rows_pad, window, total = _layout(
        s, block_rows)
    nb = rows_pad // block_rows
    dtype = b.dtype
    coeffs = (s.c_center, s.c_x, s.c_y, s.c_z)

    def to_layout(v):
        g = v.reshape(n_rows, s.nz)
        return jnp.pad(g, ((block_rows, total - block_rows - n_rows),
                           (0, nz_pad - s.nz)))

    def from_layout(g):
        return g[block_rows:block_rows + n_rows, :s.nz].reshape(-1)

    vec_blk = pl.BlockSpec((block_rows, nz_pad), lambda i: (i + 1, 0),
                           memory_space=pltpu.VMEM)
    smem_in = pl.BlockSpec((1, 1), lambda i: (0, 0),
                           memory_space=pltpu.SMEM)
    smem_out = pl.BlockSpec((1, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    vshape = jax.ShapeDtypeStruct((total, nz_pad), dtype)
    sshape = jax.ShapeDtypeStruct((1, 1), dtype)

    kernel_a = partial(_kernel_a, ny=s.ny, nz=s.nz, n_rows=n_rows,
                       block_rows=block_rows, window=window, c=coeffs)

    def call_a(p):
        return pl.pallas_call(
            kernel_a,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=(vec_blk, smem_out),
            out_shape=(vshape, sshape),
            scratch_shapes=[pltpu.VMEM((window, nz_pad), dtype),
                            pltpu.SemaphoreType.DMA(())],
            interpret=interpret,
        )(p)

    def call_b(rz, pq, x, r, p, q):
        return pl.pallas_call(
            _kernel_b,
            grid=(nb,),
            in_specs=[smem_in, smem_in, vec_blk, vec_blk, vec_blk,
                      vec_blk],
            out_specs=(vec_blk, vec_blk, smem_out),
            out_shape=(vshape, vshape, sshape),
            input_output_aliases={2: 0, 3: 1},
            interpret=interpret,
        )(rz, pq, x, r, p, q)

    def call_c(rznew, rz, r, p):
        return pl.pallas_call(
            _kernel_c,
            grid=(nb,),
            in_specs=[smem_in, smem_in, vec_blk, vec_blk],
            out_specs=vec_blk,
            out_shape=vshape,
            input_output_aliases={3: 0},
            interpret=interpret,
        )(rznew, rz, r, p)

    b_l = to_layout(b)
    x0 = jnp.zeros_like(b_l)
    rz0 = jnp.sum(b_l * b_l).reshape(1, 1)
    tol_sq = jnp.maximum(jnp.asarray(tol, dtype) ** 2 * rz0[0, 0],
                         jnp.asarray(atol, dtype) ** 2)

    def cond(carry):
        x, r, p, rz, k = carry
        return jnp.logical_and(k < maxiter, rz[0, 0] > tol_sq)

    def body(carry):
        x, r, p, rz, k = carry
        q, pq = call_a(p)
        x, r, rznew = call_b(rz, pq, x, r, p, q)
        p = call_c(rznew, rz, r, p)
        return (x, r, p, rznew, k + 1)

    x, r, p, rz, k = jax.lax.while_loop(
        cond, body, (x0, b_l, b_l, rz0, jnp.zeros((), jnp.int32)))

    return CGResult(x=from_layout(x), iterations=k,
                    residual_norm_sq=rz[0, 0], converged=rz[0, 0] <= tol_sq,
                    history=jnp.zeros((0,), dtype))
