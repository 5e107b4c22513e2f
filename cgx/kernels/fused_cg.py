"""Fused CG iteration for 3-D stencil operators — three Pallas passes.

Motivation (measured, docs/PERF_NOTES.md): XLA cross-fuses the whole CG
loop body only while a vector fits in VMEM — 40.6 µs/iter at 2.1 M rows
(128³) collapses to 600 µs/iter at 4.1 M rows (160³) even at perfectly
tile-aligned sizes.  This module pins the iteration at its streaming cost
for any n: every pass is an explicit Pallas kernel moving each vector
exactly once, with the dot products accumulated in SMEM scratch along the
way (no separate reduction passes) and the α/β scalar algebra computed
on-core.

Layout (v2, lane-major): vectors are viewed as ``(nx, ny·nz)`` — grid
``x``-planes down the sublanes, the flattened ``(y, z)`` plane along the
lanes.  Then:

* ``x ± 1`` neighbours are row shifts (full rows are present in every
  block — no row halos at all);
* ``z ± 1`` / ``y ± 1`` are lane shifts by 1 / ``nz``, masked by per-lane
  boundary masks (one iota row, broadcast);
* lane padding waste is ~0.1 % (vs 18–60 % for the row-major layout), and
  blocks tile the lane axis with a ``round128(nz)``-lane halo window whose
  DMA start is statically 128-aligned.

Per CG iteration (plain CG; for the constant-diagonal Poisson operators
Jacobi preconditioning is an exact rescaling, so this IS the PCG path for
the north-star configs):

  A. ``q = A p`` fused with ``pq += p·q``   — reads p, writes q.
  B. ``x += α p; r -= α q`` fused with ``rz' += r·r`` — reads x,p,r,q;
     writes x,r.
  C. ``p = r + β p``                        — reads r, p; writes p.

Constraints: ``Stencil3D`` with ``nx ≤ 4096`` (one block spans all grid
planes); fp32/bf16.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cgx.solve.cg import CGResult

__all__ = ["fused_stencil_cg", "supports"]


def supports(s) -> bool:
    """Whether the fused path can run for this operator."""
    from cgx.sparse.stencil import Stencil3D

    return (isinstance(s, Stencil3D) and 1 <= s.nx <= 4096
            and s.ny * s.nz >= 2)


def _geometry(s, target_block_bytes=1 << 20):
    nx8 = -(-s.nx // 8) * 8
    l_real = s.ny * s.nz
    sl = -(-s.nz // 128) * 128              # lane halo (covers ±nz and ±1)
    bl = max(sl, (target_block_bytes // (nx8 * 4) // 128) * 128)
    l_pad = -(-l_real // bl) * bl
    total = l_pad + 2 * bl                  # halo block each side
    return nx8, l_real, sl, bl, l_pad, total


# --------------------------------------------------------------------------
# Kernel A: q = A p, pq += p.q
# --------------------------------------------------------------------------

def _kernel_a(p_hbm, q_ref, pq_ref, scratch, sem, *, ny, nz, nx, l_real,
              bl, sl, c):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cc, cx, cy, cz = c
    j = pl.program_id(0)
    # Real lanes of block j start at layout lane bl + j*bl; the window
    # carries sl halo lanes on each side (start statically 128-aligned).
    start = (bl - sl) + j * bl
    cp = pltpu.make_async_copy(p_hbm.at[:, pl.ds(start, bl + 2 * sl)],
                               scratch, sem)
    cp.start()
    cp.wait()

    w = scratch[...]                         # (nx8, bl + 2*sl)
    g = w[:, sl:sl + bl]
    # Per-lane boundary masks (global lane id of this block's lanes).
    lane = j * bl + jax.lax.broadcasted_iota(jnp.int32, (1, bl), 1)
    k = lane % nz
    jy = (lane // nz) % ny
    valid = lane < l_real

    y = cc * g
    y = y + jnp.where(k < nz - 1, cz * w[:, sl + 1:sl + 1 + bl], 0.0)
    y = y + jnp.where(k > 0, cz * w[:, sl - 1:sl - 1 + bl], 0.0)
    y = y + jnp.where(jy < ny - 1, cy * w[:, sl + nz:sl + nz + bl], 0.0)
    y = y + jnp.where(jy > 0, cy * w[:, sl - nz:sl - nz + bl], 0.0)
    # x ± 1: row shifts — full rows present; zero row padding = boundary.
    y = y + cx * jnp.pad(g[1:, :], ((0, 1), (0, 0)))
    y = y + cx * jnp.pad(g[:-1, :], ((1, 0), (0, 0)))
    # Rows beyond nx are zero everywhere (zero-padded inputs), but lane
    # padding could alias real lanes through the shifts — mask it out.
    row = jax.lax.broadcasted_iota(jnp.int32, (w.shape[0], 1), 0)
    y = jnp.where(jnp.logical_and(valid, row < nx), y, 0.0)
    q_ref[...] = y

    @pl.when(j == 0)
    def _():
        pq_ref[0, 0] = 0.0

    # Accumulate in fp32 regardless of the vector dtype (bf16 partial sums
    # across blocks would lose the reduction at multi-M rows).
    pq_ref[0, 0] += jnp.sum((y * g).astype(jnp.float32))


# --------------------------------------------------------------------------
# Kernel B: x += alpha p ; r -= alpha q ; rz' += r.r
# --------------------------------------------------------------------------

def _kernel_b(rz_ref, pq_ref, x_ref, r_ref, p_ref, q_ref, x_out, r_out,
              rznew_ref):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    alpha = (rz_ref[0, 0] / pq_ref[0, 0]).astype(x_ref.dtype)
    x_out[...] = x_ref[...] + alpha * p_ref[...]
    r_new = r_ref[...] - alpha * q_ref[...]
    r_out[...] = r_new

    @pl.when(i == 0)
    def _():
        rznew_ref[0, 0] = 0.0

    rznew_ref[0, 0] += jnp.sum((r_new * r_new).astype(jnp.float32))


# --------------------------------------------------------------------------
# Kernel C: p = r + beta p
# --------------------------------------------------------------------------

def _kernel_c(rznew_ref, rz_ref, r_ref, p_ref, p_out):
    beta = (rznew_ref[0, 0] / rz_ref[0, 0]).astype(p_ref.dtype)
    p_out[...] = r_ref[...] + beta * p_ref[...]


def fused_stencil_cg(s, b: jnp.ndarray, x0=None, *, tol: float = 1e-6,
                     atol: float = 0.0, maxiter: int = 1000,
                     track_history: bool = False,
                     interpret: bool = False) -> CGResult:
    """Plain CG on a :class:`~cgx.sparse.stencil.Stencil3D`, fused passes.

    Semantics match ``cg_solve(s, b, x0, tol=..., maxiter=...,
    track_history=...)`` (fp32 dot accumulation; trajectories match the
    XLA path to fp32 roundoff).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if not supports(s):
        raise ValueError("fused_stencil_cg: unsupported operator "
                         "(need Stencil3D with nx <= 4096)")
    n = s.shape[0]
    nx8, l_real, sl, bl, l_pad, total = _geometry(s)
    nb = l_pad // bl
    dtype = b.dtype
    coeffs = (s.c_center, s.c_x, s.c_y, s.c_z)

    def to_layout(v):
        g = v.reshape(s.nx, l_real)
        return jnp.pad(g, ((0, nx8 - s.nx), (bl, total - bl - l_real)))

    def from_layout(g):
        return g[:s.nx, bl:bl + l_real].reshape(-1)

    vec_blk = pl.BlockSpec((nx8, bl), lambda i: (0, i + 1),
                           memory_space=pltpu.VMEM)
    smem_in = pl.BlockSpec((1, 1), lambda i: (0, 0),
                           memory_space=pltpu.SMEM)
    smem_out = pl.BlockSpec((1, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    vshape = jax.ShapeDtypeStruct((nx8, total), dtype)
    sshape = jax.ShapeDtypeStruct((1, 1), jnp.float32)

    kernel_a = partial(_kernel_a, ny=s.ny, nz=s.nz, nx=s.nx,
                       l_real=l_real, bl=bl, sl=sl, c=coeffs)

    def call_a(p):
        return pl.pallas_call(
            kernel_a,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=(vec_blk, smem_out),
            out_shape=(vshape, sshape),
            scratch_shapes=[pltpu.VMEM((nx8, bl + 2 * sl), dtype),
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
    bb = jnp.sum((b_l * b_l).astype(jnp.float32))
    if x0 is None:
        x_l = jnp.zeros_like(b_l)
        r_l = b_l
    else:
        x_l = to_layout(x0)
        q0, _ = call_a(x_l)
        # q0's halo blocks are uninitialized (never written by the grid);
        # mask the residual back to the real region so p keeps zero halos.
        # from_layout reads only the real region; to_layout re-zeroes the
        # halo blocks q0 left uninitialized.
        r_l = to_layout(b - from_layout(q0))
    rz0 = jnp.sum((r_l * r_l).astype(jnp.float32)).reshape(1, 1)
    tol_sq = jnp.maximum(jnp.asarray(tol, jnp.float32) ** 2 * bb,
                         jnp.asarray(atol, jnp.float32) ** 2)
    hist0 = (jnp.zeros((maxiter + 1,), jnp.float32).at[0].set(rz0[0, 0])
             if track_history else jnp.zeros((0,), jnp.float32))

    def cond(carry):
        x, r, p, rz, k, hist = carry
        return jnp.logical_and(k < maxiter, rz[0, 0] > tol_sq)

    def body(carry):
        x, r, p, rz, k, hist = carry
        q, pq = call_a(p)
        x, r, rznew = call_b(rz, pq, x, r, p, q)
        p = call_c(rznew, rz, r, p)
        if track_history:
            hist = hist.at[k + 1].set(rznew[0, 0])
        return (x, r, p, rznew, k + 1, hist)

    x, r, p, rz, k, hist = jax.lax.while_loop(
        cond, body, (x_l, r_l, r_l, rz0, jnp.zeros((), jnp.int32), hist0))

    if track_history:
        idx = jnp.arange(maxiter + 1)
        hist = jnp.where(idx <= k, hist, rz[0, 0])
    return CGResult(x=from_layout(x), iterations=k,
                    residual_norm_sq=rz[0, 0], converged=rz[0, 0] <= tol_sq,
                    history=hist)
