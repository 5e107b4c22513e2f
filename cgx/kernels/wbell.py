"""Pallas TPU SpMV/SpMM kernel for the windowed block-ELL (WBELL) format.

The unstructured-sparsity hot kernel (SURVEY.md §2.1 #4; reference anchor
``mv_mult``, ``mv_ops.c:160-201``).  See :mod:`cgx.sparse.wbell` for the
format and the design rationale.  Per grid step ``(t, j)`` — virtual tile t,
slot j — the kernel:

1. On the first slot of each output *group* (128 block rows): waits for the
   group's x window (``ngw`` groups × 1024 floats × nrhs, DMA'd from HBM one
   group ahead, double-buffered), zero-initializes the output block, and
   starts the NEXT group's window copy.
2. Streams one slot plane — 128 dense 8×8 blocks ``(8, 8, 128)`` plus their
   window-local block columns ``(1, 128)`` — via the regular Pallas
   pipeline.
3. Resolves the 128 block x-operands with ``ngw`` intra-vreg dynamic lane
   gathers (``jnp.take_along_axis`` → ``tpu.dynamic_gather``) + a select
   tree: ``g[e, lane] = window[lcg[lane], e, lcl[lane]]``.  No per-element
   HBM gathers — the irregular access never leaves VMEM.
4. Accumulates ``y[i, lane] += Σ_j B[i, j, lane] · g[j, lane]`` (8 fused
   multiply-adds on (8, 128) vregs) — per RHS column.

Multi-RHS (``wbell_spmm``): x carries a leading ``(nrhs, ...)`` axis; the
slot-plane stream — the DOMINANT traffic at supervariable fill ~19x — is
shared across every column, so extra right-hand sides cost only their own
window DMA + FMAs.

All per-tile scalars (plane start, slot count, window starts, group id)
ride scalar prefetch; the values/lc index map clamps ``j`` so slots past a
tile's count re-reference the previous plane (no DMA) and skip compute.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cgx.sparse.wbell import WBELLMatrix

__all__ = ["wbell_spmv", "wbell_spmm", "wbell_matvec"]


def _kernel(ngw: int, nrhs: int, span: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(outg_r, ps_r, wb_r, zi_r, g0_r, gn_r, pgo_r,
               lc_ref, vals_ref, x_hbm, o_ref, xwin, sem):
        t = pl.program_id(0)
        j = pl.program_id(1)
        grp = outg_r[t]
        buf = jax.lax.rem(grp, jnp.int32(2))
        first = (zi_r[t] == 1) & (j == 0)

        def window_copy(slot, start_group):
            # x_hbm: (nrhs, nt, 8, 128) — one DMA brings every column's
            # window slice.
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(start_group, ngw)], xwin.at[slot],
                sem.at[slot])

        @pl.when(first)
        def _():
            @pl.when(grp == 0)
            def _():
                window_copy(buf, g0_r[t]).start()
            window_copy(buf, g0_r[t]).wait()
            o_ref[...] = jnp.zeros_like(o_ref)

        @pl.when(first & (gn_r[t] >= 0))
        def _():
            window_copy(1 - buf, gn_r[t]).start()

        @pl.when(j < wb_r[t])
        def _():
            l = lc_ref[0]                                  # (1, 128) int32
            idx = jnp.broadcast_to(l % 128, (8, 128))
            lcg = jnp.broadcast_to(l // 128, (8, 128))     # ∈ [0, span)
            # Bucketed packing: every plane draws x from ≤ `span` window
            # groups starting at its prefetched offset — the resolution
            # chain is `span` gathers, not ngw (PERF_NOTES 3e).
            go = pgo_r[ps_r[t] + jnp.minimum(j, wb_r[t] - 1)]
            # Blocks may be stored narrow (bf16 planes): upcast
            # in-register so products/accumulation keep the x mantissa.
            v = vals_ref[0].astype(o_ref.dtype)            # (8, 8, 128)
            for c in range(nrhs):
                g = jnp.zeros((8, 128), o_ref.dtype)
                for s in range(span):
                    cand = jnp.take_along_axis(xwin[buf, c, go + s], idx,
                                               axis=1)
                    g = (cand if span == 1
                         else jnp.where(lcg == s, cand, g))
                y = o_ref[c, 0]
                for jj in range(8):
                    y = y + v[:, jj, :] * jnp.broadcast_to(
                        g[jj:jj + 1, :], (8, 128))
                o_ref[c, 0] = y

    return kernel


def wbell_spmv(a: WBELLMatrix, x: jnp.ndarray, *,
               interpret: bool | None = None) -> jnp.ndarray:
    """``y = A @ x`` on internal-layout ``x``: ``(nt, 8, 128) → same``.

    ``interpret=None`` auto-selects the Pallas interpreter off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _wbell_call(a, x[None], interpret=interpret)[0]


def wbell_spmm(a: WBELLMatrix, x: jnp.ndarray, *,
               interpret: bool | None = None) -> jnp.ndarray:
    """``Y = A @ X`` on a BATCH of internal-layout columns:
    ``(nrhs, nt, 8, 128) → same``.  The slot-plane stream is shared
    across columns (see the module docstring)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _wbell_call(a, x, interpret=interpret)


@partial(jax.jit, static_argnames=("interpret",))
def _wbell_call(a: WBELLMatrix, x: jnp.ndarray, *,
                interpret: bool) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if x.ndim != 4 or x.shape[1:] != (a.nt, 8, 128):
        raise ValueError(f"wbell kernel: expected batched internal layout "
                         f"(nrhs, {a.nt}, 8, 128), got {x.shape}")
    nrhs = x.shape[0]
    ntv = a.outg.shape[0]
    ngw = a.ngw
    xdt = a.vector_dtype        # fp32 when the planes are stored bf16

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(ntv, a.wbcap),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 128),
                lambda t, j, og, ps, wb, zi, g0, gn, pgo:
                    (ps[t] + jnp.minimum(j, wb[t] - 1), 0, 0)),
            pl.BlockSpec(
                (1, 8, 8, 128),
                lambda t, j, og, ps, wb, zi, g0, gn, pgo:
                    (ps[t] + jnp.minimum(j, wb[t] - 1), 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),             # x (HBM)
        ],
        out_specs=pl.BlockSpec(
            (nrhs, 1, 8, 128),
            lambda t, j, og, ps, wb, zi, g0, gn, pgo: (0, og[t], 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, nrhs, ngw, 8, 128), xdt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _kernel(ngw, nrhs, a.span),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrhs, a.nt, 8, 128), xdt),
        interpret=interpret,
    )(a.outg, a.ps, a.wb, a.zi, a.g0, a.gn, a.pgo, a.lc, a.values,
      x.astype(xdt))


def wbell_matvec(a: WBELLMatrix, v: jnp.ndarray) -> jnp.ndarray:
    """``y = A v`` on a standard-order ``(n,)`` vector (layout round-trip —
    for tests/one-shot use; solvers should stay in the internal layout)."""
    return a.from_internal(wbell_spmv(a, a.to_internal(v)))
