"""Fused (P)CG iteration for variable-coefficient 7-point DIA operators.

Extends :mod:`cgx.kernels.fused_cg` (constant-coefficient stencils) to
:class:`~cgx.sparse.types.DIAMatrix` operators whose offsets form the 3-D
7-point pattern ``(-ny·nz, -nz, -1, 0, 1, nz, ny·nz)`` — i.e. Poisson-type
problems with spatially varying coefficients, where Jacobi preconditioning
genuinely changes the trajectory (the diagonal is no longer a scalar).

Same three passes per iteration, same lane-major ``(nx, ny·nz)`` layout;
differences from the stencil version:

* kernel A streams the 7 coefficient planes alongside the iterate window
  (row-aligned DIA convention ``data[k, i] = A[i, i + off_k]`` means the
  coefficient is read at the *output* row — regular BlockSpec pipelining,
  no halos on the data);
* boundary handling needs NO masks at all — the DIA data is already zero
  where a neighbour falls outside the grid, and the layout's zero padding
  covers the rest;
* optional Jacobi: kernel B computes ``z = D⁻¹ r`` on the fly and
  accumulates both ``r·z`` (for β) and ``r·r`` (for the convergence test);
  kernel C recomputes ``z`` from ``r`` (one extra stream, no extra
  buffer).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cgx.solve.cg import CGResult

__all__ = ["fused_dia_cg", "supports_dia", "dia_pattern_dims",
           "wrap_entries_zero"]


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

    Requires concrete (non-traced) data; raises ``ValueError`` on a
    tracer because the check is inherently data-dependent.
    """
    dims = dia_pattern_dims(d)
    if dims is None:
        return False
    if isinstance(d.data, jax.core.Tracer):
        raise ValueError(
            "wrap_entries_zero needs concrete DIA data (got a tracer); "
            "check before jit, or call fused_dia_cg directly if the "
            "operator is known to have zero x-plane-crossing entries")
    nx, ny, nz = dims

    def grid(k):
        return d.data[k].reshape(nx, ny, nz)

    # Slots where the flat offset crosses an x-plane (in-range only; slots
    # whose flat target falls outside the matrix are ignored either way).
    s = (jnp.sum(jnp.abs(grid(4)[:nx - 1, ny - 1, nz - 1]))   # +1
         + jnp.sum(jnp.abs(grid(2)[1:, 0, 0]))                # -1
         + jnp.sum(jnp.abs(grid(5)[:nx - 1, ny - 1, :]))      # +nz
         + jnp.sum(jnp.abs(grid(1)[1:, 0, :])))               # -nz
    return bool(s == 0)


# Smaller blocks than the stencil kernel: kernel A pipelines the (7, nx8,
# bl) coefficient block double-buffered, so VMEM holds ~2*7 + ~4 block
# copies — 256 KB blocks keep that under the 16 MB budget.
def _geometry(nx, ny, nz, target_block_bytes=1 << 18):
    nx8 = -(-nx // 8) * 8
    l_real = ny * nz
    sl = -(-nz // 128) * 128
    bl = max(sl, (target_block_bytes // (nx8 * 4) // 128) * 128)
    l_pad = -(-l_real // bl) * bl
    total = l_pad + 2 * bl
    return nx8, l_real, sl, bl, l_pad, total


def _kernel_a(p_hbm, data_ref, q_ref, pq_ref, scratch, sem, *, nz, bl, sl):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    j = pl.program_id(0)
    start = (bl - sl) + j * bl
    cp = pltpu.make_async_copy(p_hbm.at[:, pl.ds(start, bl + 2 * sl)],
                               scratch, sem)
    cp.start()
    cp.wait()

    w = scratch[...]                       # (nx8, bl + 2*sl)
    g = w[:, sl:sl + bl]
    d = data_ref[...]                      # (7, nx8, bl)
    y = d[3] * g
    y = y + d[4] * w[:, sl + 1:sl + 1 + bl]
    y = y + d[2] * w[:, sl - 1:sl - 1 + bl]
    y = y + d[5] * w[:, sl + nz:sl + nz + bl]
    y = y + d[1] * w[:, sl - nz:sl - nz + bl]
    y = y + d[6] * jnp.pad(g[1:, :], ((0, 1), (0, 0)))
    y = y + d[0] * jnp.pad(g[:-1, :], ((1, 0), (0, 0)))
    q_ref[...] = y

    @pl.when(j == 0)
    def _():
        pq_ref[0, 0] = 0.0

    # fp32 accumulation regardless of the vector dtype.
    pq_ref[0, 0] += jnp.sum((y * g).astype(jnp.float32))


def _kernel_b(rz_ref, pq_ref, x_ref, r_ref, p_ref, q_ref, invd_ref, x_out,
              r_out, dots_ref):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    alpha = (rz_ref[0, 0] / pq_ref[0, 0]).astype(x_ref.dtype)
    x_out[...] = x_ref[...] + alpha * p_ref[...]
    r_new = r_ref[...] - alpha * q_ref[...]
    r_out[...] = r_new
    z = invd_ref[...] * r_new

    @pl.when(i == 0)
    def _():
        dots_ref[0, 0] = 0.0
        dots_ref[0, 1] = 0.0

    dots_ref[0, 0] += jnp.sum((r_new * z).astype(jnp.float32))      # rz'
    dots_ref[0, 1] += jnp.sum((r_new * r_new).astype(jnp.float32))  # rr'


def _kernel_c(dots_ref, rz_ref, r_ref, p_ref, invd_ref, p_out):
    beta = (dots_ref[0, 0] / rz_ref[0, 0]).astype(p_ref.dtype)
    p_out[...] = invd_ref[...] * r_ref[...] + beta * p_ref[...]


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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dims = dia_pattern_dims(d)
    if dims is None or not supports_dia(d):
        raise ValueError("fused_dia_cg: operator lacks the 3-D 7-point "
                         "DIA pattern (or nx > 4096)")
    # The lane layout drops contributions at x-plane-crossing slots (see
    # wrap_entries_zero).  Verify when the data is concrete; under jit the
    # caller is responsible (auto_solve checks before routing here).
    if not isinstance(d.data, jax.core.Tracer) and not wrap_entries_zero(d):
        raise ValueError(
            "fused_dia_cg: DIA data has nonzero entries at x-plane-"
            "crossing slots (offsets ±1 at the j/k-extremes, ±nz in the "
            "j-boundary planes); the fused layout would silently drop "
            "them — use cg_solve instead")
    nx, ny, nz = dims
    n = d.shape[0]
    nx8, l_real, sl, bl, l_pad, total = _geometry(nx, ny, nz)
    nb = l_pad // bl
    dtype = b.dtype

    def to_layout(v):
        g = v.reshape(nx, l_real)
        return jnp.pad(g, ((0, nx8 - nx), (bl, total - bl - l_real)))

    def from_layout(g):
        return g[:nx, bl:bl + l_real].reshape(-1)

    data_l = jnp.stack([to_layout(d.data[k].astype(dtype))
                        for k in range(7)])          # (7, nx8, total)
    diag = d.data[3].astype(dtype)
    if inv_diag is not None:
        invd_flat = jnp.asarray(inv_diag, dtype)
    elif jacobi:
        from cgx.ops.blas import safe_recip
        invd_flat = safe_recip(diag)
    else:
        invd_flat = jnp.ones((n,), dtype)
    invd_l = to_layout(invd_flat)

    vec_blk = pl.BlockSpec((nx8, bl), lambda i: (0, i + 1),
                           memory_space=pltpu.VMEM)
    data_blk = pl.BlockSpec((7, nx8, bl), lambda i: (0, 0, i + 1),
                            memory_space=pltpu.VMEM)
    smem_in = pl.BlockSpec((1, 1), lambda i: (0, 0),
                           memory_space=pltpu.SMEM)
    smem2_in = pl.BlockSpec((1, 2), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    smem_out = pl.BlockSpec((1, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    smem2_out = pl.BlockSpec((1, 2), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    vshape = jax.ShapeDtypeStruct((nx8, total), dtype)
    s1 = jax.ShapeDtypeStruct((1, 1), jnp.float32)
    s2 = jax.ShapeDtypeStruct((1, 2), jnp.float32)

    kernel_a = partial(_kernel_a, nz=nz, bl=bl, sl=sl)

    def call_a(p):
        return pl.pallas_call(
            kernel_a,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY), data_blk],
            out_specs=(vec_blk, smem_out),
            out_shape=(vshape, s1),
            scratch_shapes=[pltpu.VMEM((nx8, bl + 2 * sl), dtype),
                            pltpu.SemaphoreType.DMA(())],
            interpret=interpret,
        )(p, data_l)

    def call_b(rz, pq, x, r, p, q):
        return pl.pallas_call(
            _kernel_b,
            grid=(nb,),
            in_specs=[smem_in, smem_in, vec_blk, vec_blk, vec_blk,
                      vec_blk, vec_blk],
            out_specs=(vec_blk, vec_blk, smem2_out),
            out_shape=(vshape, vshape, s2),
            input_output_aliases={2: 0, 3: 1},
            interpret=interpret,
        )(rz, pq, x, r, p, q, invd_l)

    def call_c(dots, rz, r, p):
        return pl.pallas_call(
            _kernel_c,
            grid=(nb,),
            in_specs=[smem2_in, smem_in, vec_blk, vec_blk, vec_blk],
            out_specs=vec_blk,
            out_shape=vshape,
            input_output_aliases={3: 0},
            interpret=interpret,
        )(dots, rz, r, p, invd_l)

    b_l = to_layout(b)
    bb = jnp.sum((b_l * b_l).astype(jnp.float32))
    if x0 is None:
        x_l = jnp.zeros_like(b_l)
        r_l = b_l
    else:
        x_l = to_layout(x0)
        q0, _ = call_a(x_l)
        r_l = to_layout(b - from_layout(q0))
    z0 = invd_l * r_l
    rz0 = jnp.sum((r_l * z0).astype(jnp.float32)).reshape(1, 1)
    rr0 = jnp.sum((r_l * r_l).astype(jnp.float32))
    tol_sq = jnp.maximum(jnp.asarray(tol, jnp.float32) ** 2 * bb,
                         jnp.asarray(atol, jnp.float32) ** 2)
    hist0 = (jnp.zeros((maxiter + 1,), jnp.float32).at[0].set(rr0)
             if track_history else jnp.zeros((0,), jnp.float32))

    def cond(carry):
        x, r, p, rz, rr, k, hist = carry
        return jnp.logical_and(k < maxiter, rr > tol_sq)

    def body(carry):
        x, r, p, rz, rr, k, hist = carry
        q, pq = call_a(p)
        x, r, dots = call_b(rz, pq, x, r, p, q)
        p = call_c(dots, rz, r, p)
        if track_history:
            hist = hist.at[k + 1].set(dots[0, 1])
        return (x, r, p, dots[:, :1], dots[0, 1], k + 1, hist)

    x, r, p, rz, rr, k, hist = jax.lax.while_loop(
        cond, body,
        (x_l, r_l, z0, rz0, rr0, jnp.zeros((), jnp.int32), hist0))

    if track_history:
        idx = jnp.arange(maxiter + 1)
        hist = jnp.where(idx <= k, hist, rr)
    return CGResult(x=from_layout(x), iterations=k, residual_norm_sq=rr,
                    converged=rr <= tol_sq, history=hist)
