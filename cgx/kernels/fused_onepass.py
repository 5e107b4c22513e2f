"""One-pass fused CG (v5): the ENTIRE iteration in ONE Pallas pass.

The two-pass engine (:mod:`cgx.kernels.fused_engine`, v3) measures at the
chip's HBM streaming limit — ~9 effective streams/iteration (kernel A:
p-window read + q write; kernel B: x,r,p,q read + x,r,p write), e.g.
354 µs/iter at 216³ ≈ 9 × 40 MB / 990 GB/s.  The only remaining lever at
streaming scale is FEWER BYTES per iteration: this kernel never
materializes ``q = A p``, rematerializing the matvec in-pass instead — the
classic communication-avoiding trade (redundant FLOPs for eliminated HBM
traffic).  **6 streams/iter**: read r, p (halo windows) and x (blocks),
write x', r', p'.

Algebra per pass — numerically the SAME structure as v3 (α from the true
Gram numbers accumulated by the previous pass, β from the CA identity
``‖r'‖² = α²‖Ap‖² − ‖r‖²``, corrected every iteration by the true in-pass
accumulation):

  α  = rz/pq,  β = (α²·qq − rz)/rz      (scalars, from the carried dots)
  q  = A p   on core ± sl lanes          (matvec #1, rematerialized)
  x' = x + α p                           → write
  r' = r − α q   on core ± sl            → write core lanes
  p' = r' + β p  on core ± sl            → write core lanes
  w  = A p'  on core lanes               (matvec #2)
  dots' = [Σ r'², Σ r'², Σ p'·w, Σ w·w]  (the next pass's α/β inputs)

The ±sl lane margins exist so matvec #2's shifts read in-register values;
the margin r'/p' values equal exactly what the neighbouring blocks compute
for their own cores (redundant-compute overlap).  Row halos need no
margin: the embedded halo rows are permanently zero single-device
(Dirichlet), so r'/p' are zero there by construction and matvec #2's row
shifts read zeros.  **Single-device, constant-coefficient only** — the
sharded path would need a two-row halo exchange and the DIA path windowed
planes on the extended lanes; both keep the two-pass engine.

Reference algorithm anchor: ``conj_grad`` (cg.c:88-141) — the same
iteration, restructured so one kernel launch and 6 vector streams carry
it.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from cgx.kernels.fused_engine import FusedCG, FusedState, Geometry

__all__ = ["OnePassCG"]


def _kernel_c(*refs, g: Geometry, coeffs):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (dots_ref, x_ref, r_hbm, p_hbm,
     x_out, r_out, p_out, ndots_ref, pscr, psem, rscr, rsem) = refs

    j = pl.program_id(0)
    sl, bl_a, nxl = g.sl, g.bl_a, g.nxl
    ext = bl_a + 2 * sl
    winp = bl_a + 4 * sl

    def dma(slot, blk):
        # Window origins: p covers core ± 2·sl (matvec #1 on the extended
        # lanes shifts by ±sl on top of the ±sl margin), r covers ± sl.
        sp = (bl_a - 2 * sl) + blk * bl_a
        sr = (bl_a - sl) + blk * bl_a
        return [pltpu.make_async_copy(p_hbm.at[:, pl.ds(sp, winp)],
                                      pscr.at[slot], psem.at[slot]),
                pltpu.make_async_copy(r_hbm.at[:, pl.ds(sr, ext)],
                                      rscr.at[slot], rsem.at[slot])]

    @pl.when(j == 0)
    def _():
        for cp in dma(0, 0):
            cp.start()

    @pl.when(j + 1 < g.nb_a)
    def _():
        for cp in dma((j + 1) % 2, j + 1):
            cp.start()

    for cp in dma(j % 2, j):
        cp.wait()
    wp = pscr[j % 2]                      # (rows8, bl_a + 4·sl)
    wr = rscr[j % 2]                      # (rows8, bl_a + 2·sl)

    rz = dots_ref[0, 0]
    pq = dots_ref[0, 2]
    qq = dots_ref[0, 3]
    alpha32 = rz / pq
    beta = ((alpha32 * alpha32 * qq - rz) / rz).astype(x_ref.dtype)
    alpha = alpha32.astype(x_ref.dtype)

    # Boundary masks depend only on the LANE index, never the row — so
    # each tap's coefficient becomes a precomputed (1, W) masked row and
    # the per-element work is ONE multiply+add (the where/select at
    # (rows, W) would roughly double the VPU cost of an apply; this
    # kernel runs two applies per iteration and is VPU-bound).  The
    # output-validity mask folds into every tap's row the same way.
    # Negative lanes (block 0's left margin) index the layout's zero halo
    # block, so their terms vanish regardless of the (wrapped) mask value.
    dtype = x_ref.dtype

    def coeff_rows(lane):
        k = lane % g.nz
        jy = (lane // g.nz) % g.ny
        valid = (lane >= 0) & (lane < g.l_real)
        rows = []
        for t, (dx, dy, dk) in enumerate(g.taps):
            m = valid
            if dk:
                m = m & (k + dk >= 0) & (k + dk < g.nz)
            if dy:
                m = m & (jy + dy >= 0) & (jy + dy < g.ny)
            rows.append(jnp.where(m, jnp.asarray(coeffs[t], dtype),
                                  jnp.asarray(0.0, dtype)))
        return rows

    def apply_taps(src, origin, crows):
        """Σ_t crows[t] · src[rows±dx, origin+dl : origin+dl+W] — one
        stencil application, in registers (W from the coefficient rows)."""
        width = crows[0].shape[1]
        y = None
        for t, (dx, dy, dk) in enumerate(g.taps):
            dl = dy * g.nz + dk
            term = crows[t] * src[1 + dx:1 + dx + nxl,
                                  origin + dl:origin + dl + width]
            y = term if y is None else y + term
        return y

    lane_e = (j * bl_a - sl
              + jax.lax.broadcasted_iota(jnp.int32, (1, ext), 1))

    # Matvec #1: q = A p on the extended lanes (rows 1..nxl).
    q_e = apply_taps(wp, sl, coeff_rows(lane_e))

    # x' = x + α p (all rows: halo rows are zero on both sides).
    x_out[...] = x_ref[...] + alpha * wp[:, 2 * sl:2 * sl + bl_a]

    # r' and p' on the extended lanes; write the core slices.
    r_e = wr[1:1 + nxl, :]
    rn_e = r_e - alpha * q_e
    pn_e = rn_e + beta * wp[1:1 + nxl, sl:sl + ext]
    pad = ((1, g.rows8 - 1 - nxl), (0, 0))
    r_out[...] = jnp.pad(rn_e[:, sl:sl + bl_a], pad)
    p_out[...] = jnp.pad(pn_e[:, sl:sl + bl_a], pad)

    # Matvec #2: w = A p' on the core lanes — p' margins are in-register,
    # halo ROWS of p' are zero (pad) exactly like the materialized layout.
    lane_c = (j * bl_a
              + jax.lax.broadcasted_iota(jnp.int32, (1, bl_a), 1))
    w = apply_taps(jnp.pad(pn_e, pad), sl, coeff_rows(lane_c))

    @pl.when(j == 0)
    def _():
        ndots_ref[0, 0] = 0.0
        ndots_ref[0, 1] = 0.0
        ndots_ref[0, 2] = 0.0
        ndots_ref[0, 3] = 0.0

    # fp32 products and accumulation regardless of the vector dtype.
    rn_c = rn_e[:, sl:sl + bl_a].astype(jnp.float32)
    s = jnp.sum(rn_c * rn_c)
    ndots_ref[0, 0] += s                  # solve-space ‖r'‖²
    ndots_ref[0, 1] += s                  # true ‖r'‖² (unweighted path)
    w32 = w.astype(jnp.float32)
    ndots_ref[0, 2] += jnp.sum(pn_e[:, sl:sl + bl_a].astype(jnp.float32)
                               * w32)     # p'ᵀ A p'
    ndots_ref[0, 3] += jnp.sum(w32 * w32)  # ‖A p'‖²


class OnePassCG(FusedCG):
    """One-pass fused CG solver (module docstring for the kernel).

    Same driver surface as :class:`FusedCG` (``init``/``run``/``result``/
    ``solve``, checkpoint interop) — the carried ``rz`` widens to ``(1, 4)``
    fp32 ``[‖r̃‖², ‖r‖², pᵀAp, ‖Ap‖²]`` so each pass has its α/β inputs.
    Build the geometry with ``make_geometry(..., one_pass=True)``.
    """

    def __init__(self, geom: Geometry, *, dtype,
                 coeffs: Tuple[float, ...],
                 interpret: bool = False):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        if coeffs is None or any(c is None for c in coeffs):
            raise ValueError("one-pass engine: constant-coefficient taps "
                             "only (DIA planes keep the two-pass engine)")
        # Parent builds kernel A (used once at init for pq/qq) + kernel B
        # (unused) and all the layout/driver machinery.
        super().__init__(geom, dtype=dtype, coeffs=coeffs,
                         interpret=interpret)
        g = geom
        if g.bl_a < 2 * g.sl:
            raise ValueError(f"one-pass geometry needs bl_a >= 2*sl "
                             f"(got bl_a={g.bl_a}, sl={g.sl}); build with "
                             "make_geometry(..., one_pass=True)")

        vec_blk_a = pl.BlockSpec((g.rows8, g.bl_a), lambda i: (0, i + 1),
                                 memory_space=pltpu.VMEM)
        smem4_in = pl.BlockSpec((1, 4), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)
        smem4_out = pl.BlockSpec((1, 4), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM)
        vshape = jax.ShapeDtypeStruct((g.rows8, g.total), dtype)
        s4 = jax.ShapeDtypeStruct((1, 4), jnp.float32)

        winp = g.bl_a + 4 * g.sl
        ext = g.bl_a + 2 * g.sl
        scratch = [pltpu.VMEM((2, g.rows8, winp), dtype),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.VMEM((2, g.rows8, ext), dtype),
                   pltpu.SemaphoreType.DMA((2,))]
        params = {}
        if g.a_vmem_limit and not interpret:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=g.a_vmem_limit)
        kernel = partial(_kernel_c, g=g, coeffs=tuple(coeffs))

        def call_c(dots, x, r, p):
            return pl.pallas_call(
                kernel,
                grid=(g.nb_a,),
                in_specs=[smem4_in, vec_blk_a,
                          pl.BlockSpec(memory_space=pl.ANY),
                          pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=(vec_blk_a, vec_blk_a, vec_blk_a, smem4_out),
                out_shape=(vshape, vshape, vshape, s4),
                # Only x updates in place: the r/p windows of block j
                # overlap the lanes block j-1 just wrote, and must read
                # the PREVIOUS iterate there — ping-pong buffers, managed
                # by XLA through the while_loop carry.
                input_output_aliases={1: 0},
                scratch_shapes=scratch,
                interpret=interpret,
                **params,
            )(dots, x, r, p)

        self._call_c = call_c

    def _dots4(self, st: FusedState) -> FusedState:
        """Widen a parent-format state with the pq/qq Gram numbers of its
        p (one kernel-A launch — init/resume only, never in the loop)."""
        _, pqqq = self._call_a(self._exchange(st.p))
        return dataclasses.replace(
            st, rz=jnp.concatenate([st.rz, self._allsum(pqqq)], axis=1))

    def init(self, b_l: jnp.ndarray, x0_l: Optional[jnp.ndarray] = None,
             history_len: int = 0) -> FusedState:
        return self._dots4(super().init(b_l, x0_l, history_len))

    def state_from_flat(self, cg, e=None) -> FusedState:
        return self._dots4(super().state_from_flat(cg, e))

    def state_to_flat(self, st: FusedState, e=None):
        return super().state_to_flat(
            dataclasses.replace(st, rz=st.rz[:, :2]), e)

    def _zero_margins(self, a: jnp.ndarray) -> jnp.ndarray:
        """Zero the 2·sl halo-block margins the window DMAs read.

        r'/p' are fresh pallas outputs each iteration (NOT aliased — the
        windows of block j read lanes block j−1 just wrote, so in-place
        updates would race); their halo lane blocks are uninitialized.
        Only the 2·sl-wide strips adjacent to the real region are ever
        read — two static in-place strip updates per array (~0.1% of the
        iteration's bytes) restore the init-time zero-halo invariant."""
        g = self.geom
        z = jnp.zeros((g.rows8, 2 * g.sl), a.dtype)
        a = jax.lax.dynamic_update_slice(a, z, (0, g.bl_a - 2 * g.sl))
        return jax.lax.dynamic_update_slice(a, z, (0, g.bl_a + g.l_pad))

    def run(self, state: FusedState, upto, tol_sq) -> FusedState:
        track = state.history.shape[0] > 0

        def cond(s: FusedState):
            return jnp.logical_and(s.k < upto, s.rz[0, 1] > tol_sq)

        def body(s: FusedState) -> FusedState:
            x, r, p, dots = self._call_c(s.rz, s.x, s.r, s.p)
            r = self._zero_margins(r)
            p = self._zero_margins(p)
            hist = s.history
            if track:
                idx = jnp.minimum(s.k + 1, hist.shape[0] - 1)
                hist = hist.at[idx].set(dots[0, 1])
            return FusedState(x=x, r=r, p=p, rz=dots, k=s.k + 1,
                              history=hist)

        return jax.lax.while_loop(cond, body, state)
