"""Pallas TPU kernel: 7-point (3-D) constant-coefficient stencil SpMV.

One explicit pass over HBM: the vector is viewed as a 2-level ``(rows, nz)``
grid (row ``r`` ↔ grid point ``(i = r // ny, j = r % ny)``), zero-padded by
``ny`` halo rows at the top so that block ``i``'s window (its rows plus both
halos) starts at exactly ``i · block_rows`` — every DMA offset is a static
multiple of the sublane tiling, which Mosaic requires for HBM slices.  Each
grid step issues ONE async copy of the window into VMEM scratch (read
amplification ``1 + 2·ny/block_rows``), then applies all seven FMA terms as
static slices of the window — no concatenate/pad intermediates, no gathers.

Why it exists: the XLA formulations of this operator run at roofline at
tile-exact sizes (128³ → ~24 µs/SpMV) but fall several-fold behind at
off-tile sizes (216³ → ~600–1000 µs measured) where the shifted-add fusion
breaks and intermediates materialize.  Hand-tiling makes the traffic
explicit and size-independent.  (Reference capability: ``mv_mult``,
``mv_ops.c:160-201``.)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["stencil3d_spmv_pallas"]


def _kernel(x_hbm, out_ref, scratch, sem, *, ny, nz, n_rows, block_rows,
            window, c):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cc, cx, cy, cz = c
    i = pl.program_id(0)
    r0 = i * block_rows

    # One DMA: padded rows [r0, r0 + window) == original rows
    # [r0 - ny, r0 - ny + window).  The operand carries ny top-halo pad
    # rows, so the start is statically a multiple of block_rows, and its
    # lane dim is pre-padded to a 128 multiple (Mosaic requires aligned
    # slice shapes).
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(r0, window), :], scratch, sem)
    cp.start()
    cp.wait()

    w = scratch[...]                                # (window, nz_pad)
    nz_pad = w.shape[1]
    g = w[ny:ny + block_rows]                       # this block's rows
    y = cc * g
    # z ± 1: lane shifts within each row.  The zero lane padding doubles
    # as the high-z Dirichlet boundary; the low-z boundary comes from the
    # pad in the shift itself.  zminus leaks g[:, nz-1] into pad column
    # nz — the final column mask clears it.
    y = y + cz * jnp.pad(g[:, 1:], ((0, 0), (0, 1)))
    y = y + cz * jnp.pad(g[:, :-1], ((0, 0), (1, 0)))

    r = r0 + jax.lax.broadcasted_iota(jnp.int32, (block_rows, 1), 0)
    j = r % ny
    # j ± 1 (rows ± 1) gated on the j-boundary.
    y = y + jnp.where(j < ny - 1, cy * w[ny + 1:ny + 1 + block_rows], 0.0)
    y = y + jnp.where(j > 0, cy * w[ny - 1:ny - 1 + block_rows], 0.0)
    # i ± 1 (rows ± ny); the zero padding is the boundary condition.
    y = y + cx * w[2 * ny:2 * ny + block_rows] + cx * w[:block_rows]

    # Zero rows beyond the real grid and the lane-padding columns.
    col = jax.lax.broadcasted_iota(jnp.int32, (block_rows, nz_pad), 1)
    out_ref[...] = jnp.where(jnp.logical_and(r < n_rows, col < nz), y, 0.0)


@partial(jax.jit, static_argnames=("nx", "ny", "nz", "coeffs", "block_rows",
                                   "interpret"))
def stencil3d_spmv_pallas(x: jnp.ndarray, *, nx: int, ny: int, nz: int,
                          coeffs=(6.0, -1.0, -1.0, -1.0),
                          block_rows: int = 2048,
                          interpret: bool = False) -> jnp.ndarray:
    """``y = A x`` for the 7-point stencil, as one Pallas pass.

    ``x``: flat (nx·ny·nz,) vector; returns the same shape.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows = nx * ny
    nz_pad = -(-nz // 128) * 128
    block_rows = max(8, min(block_rows, -(-n_rows // 8) * 8))
    rows_pad = -(-n_rows // block_rows) * block_rows
    window = -(-(block_rows + 2 * ny) // 8) * 8
    n_blocks = rows_pad // block_rows
    # Padded operand: ny top halo rows + bottom fill so the last block's
    # window stays in range.
    op_len = (n_blocks - 1) * block_rows + window
    g = x.reshape(n_rows, nz)
    g = jnp.pad(g, ((ny, op_len - ny - n_rows), (0, nz_pad - nz)))

    kernel = partial(_kernel, ny=ny, nz=nz, n_rows=n_rows,
                     block_rows=block_rows, window=window, c=coeffs)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((block_rows, nz_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, nz_pad), x.dtype),
        scratch_shapes=[pltpu.VMEM((window, nz_pad), x.dtype),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(g)
    return out[:n_rows, :nz].reshape(-1)
