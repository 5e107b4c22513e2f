"""Semi-resident whole-solve CG (v4.5): VMEM-pinned vectors + streamed rest.

The whole-solve resident kernel (:mod:`cgx.kernels.fused_resident`, v4)
ends where five full vectors stop fitting in VMEM (~150³ fp32).  Past
that, the two-pass engine streams everything from HBM — but a profiler
trace of the 216³ solve showed XLA's memory-space assignment quietly
promoting the carried r/p to VMEM when they fit (the `S(1)` buffers),
which is why kernel B measured 137 µs against a 280 µs HBM model.  That
promotion is heuristic, breaks the moment a kernel's operands are not
aliased (the one-pass engine lost 138 µs/iter to forced VMEM→HBM operand
copies), and vanishes silently across sizes.

This kernel makes the placement explicit — a residency LADDER chosen by
footprint, each tier one ``pallas_call`` per solve with the CG loop
inside (zero launch overhead, like v4):

  T1 ``rpq``: r, p, q in VMEM scratch; x streamed (2 HBM streams/iter,
      ONE stencil apply per iteration).           3 arrays ≤ budget.
  T2 ``rp``:  r, p resident; x streamed; q never materialized — the
      Gram numbers (pᵀAp, ‖Ap‖²) come from a second apply over the
      updated p (2 applies/iter).                 2 arrays ≤ budget.
  T3 ``p``:   p resident; r and x streamed (4 HBM streams/iter,
      2 applies).                                 1 array  ≤ budget.

Iteration algebra = the two-pass engine's (v3): α from the true Gram
numbers of the previous sweep, β from the CA identity ``‖r'‖² = α²‖Ap‖²
− ‖r‖²``, corrected every iteration by the true in-sweep accumulation —
trajectories match ``cg_solve`` to fp32 roundoff.

In-place update hazard: sweep 1 updates p in VMEM while the stencil
still needs the PRE-update values at the next block's left margin; a
rolling ``sl``-wide saved strip carries them (the textbook in-place
stencil delay line).  Constant-coefficient stencils only, single device.

Reference algorithm anchor: ``conj_grad`` (cg.c:88-141).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from cgx.solve.cg import CGResult

__all__ = ["SRGeometry", "make_sr_geometry", "sr_mode", "sr_cg",
           "sr_stencil_cg", "SR_VMEM_BUDGET"]


def _r128(v: int) -> int:
    return -(-v // 128) * 128


@dataclass(frozen=True)
class SRGeometry:
    nx: int
    ny: int
    nz: int
    taps: Tuple[Tuple[int, int, int], ...]
    rows8: int          # round8(nx + 2 halo rows)
    sl: int             # lane halo (covers max |dy·nz + dk|), 128-aligned
    bl: int             # sweep block width (128-aligned, >= sl)
    l_real: int
    l_pad: int          # round_bl(l_real)
    total: int          # l_pad + 2·sl
    nb: int             # l_pad // bl
    mode: str           # "rpq" | "rp" | "p"

    @property
    def n(self) -> int:
        return self.nx * self.l_real

    @property
    def arr_bytes(self) -> int:
        return self.rows8 * self.total * 4


# Hard ceiling for the MODELED footprint (the chip has 128 MB; leave
# room for Mosaic's own overheads the model can't see).
SR_VMEM_BUDGET = 119 << 20

_MODE_K = {"rpq": 3, "rp": 2, "p": 1}
# Stream double-buffer slots (x in/out; p-mode adds r in/out) and a
# register-spill allowance in (rows8 x bl) tiles — measured: the 288^3
# p-mode loop body spilled 25.7 MB = ~6 tiles at bl=4096.
_MODE_SLOTS = {"rpq": 4, "rp": 4, "p": 8}
_MODE_SPILL = {"rpq": 4, "rp": 4, "p": 6}


def _footprint(mode: str, rows8: int, l_real: int, sl: int, bl: int,
               itemsize: int) -> int:
    l_pad = -(-l_real // bl) * bl
    arr = rows8 * (l_pad + 2 * sl) * itemsize
    over = (_MODE_SLOTS[mode] + _MODE_SPILL[mode]) * rows8 * bl * itemsize
    return _MODE_K[mode] * arr + over


def _plan(nx: int, ny: int, nz: int,
          taps: Sequence[Tuple[int, int, int]], itemsize: int,
          mode: Optional[str], bl_req: int
          ) -> Optional[Tuple[str, int]]:
    """(mode, bl) for the densest tier that fits the VMEM model, trying
    bl_req then halving; None if no tier fits.  A forced ``mode`` returns
    best-effort bl even when the model says it won't fit (interpret-mode
    callers)."""
    rows8 = -(-(nx + 2) // 8) * 8
    l_real = ny * nz
    reach = max([abs(dy * nz + dk) for (_, dy, dk) in taps] + [1])
    sl = _r128(reach)

    def pick_bl(m):
        bl = max(_r128(bl_req), sl)
        while True:
            if _footprint(m, rows8, l_real, sl, bl, itemsize) \
                    <= SR_VMEM_BUDGET:
                return bl
            if bl <= sl or bl <= 128:
                return None
            bl = max(_r128(bl // 2), sl)

    if mode is not None:
        return mode, (pick_bl(mode) or max(_r128(128), sl))
    for m in ("rpq", "rp", "p"):
        bl = pick_bl(m)
        if bl is not None:
            return m, bl
    return None


def sr_mode(nx: int, ny: int, nz: int,
            taps: Sequence[Tuple[int, int, int]],
            itemsize: int = 4) -> Optional[str]:
    """The densest residency tier whose modeled VMEM footprint (resident
    arrays + stream buffers + spill allowance) fits, or None (problem too
    large even for p-resident — use the two-pass engine)."""
    plan = _plan(nx, ny, nz, taps, itemsize, None, 4096)
    return None if plan is None else plan[0]


def make_sr_geometry(nx: int, ny: int, nz: int,
                     taps: Sequence[Tuple[int, int, int]],
                     mode: Optional[str] = None,
                     bl: Optional[int] = None,
                     itemsize: int = 4) -> SRGeometry:
    for (dx, dy, dk) in taps:
        if abs(dx) > 1:
            raise ValueError(f"tap {dx, dy, dk}: |dx| must be <= 1")
    plan = _plan(nx, ny, nz, taps, itemsize, mode,
                 4096 if bl is None else bl)
    if plan is None:
        raise ValueError("problem too large for any semi-resident "
                         "tier — use the two-pass engine")
    mode, bl_fit = plan
    if mode not in ("rpq", "rp", "p"):
        raise ValueError(f"unknown mode {mode!r}")
    l_real = ny * nz
    reach = max([abs(dy * nz + dk) for (_, dy, dk) in taps] + [1])
    sl = _r128(reach)
    # An explicit bl is honored as an upper bound (tests shrink it to
    # force multi-block sweeps); the model may shrink it further.
    bl = min(max(_r128(bl), sl), bl_fit) if bl is not None else bl_fit
    l_pad = -(-l_real // bl) * bl
    return SRGeometry(nx=nx, ny=ny, nz=nz, taps=tuple(map(tuple, taps)),
                      rows8=-(-(nx + 2) // 8) * 8, sl=sl, bl=bl,
                      l_real=l_real, l_pad=l_pad, total=l_pad + 2 * sl,
                      nb=l_pad // bl, mode=mode)


def _to_layout(g: SRGeometry, v: jnp.ndarray) -> jnp.ndarray:
    arr = v.reshape(g.nx, g.l_real)
    return jnp.pad(arr, ((1, g.rows8 - 1 - g.nx),
                         (g.sl, g.total - g.sl - g.l_real)))


def _from_layout(g: SRGeometry, a: jnp.ndarray) -> jnp.ndarray:
    return a[1:1 + g.nx, g.sl:g.sl + g.l_real].reshape(-1)


def _kernel(*refs, g: SRGeometry, coeffs, interp: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    refs = list(refs)
    tol_ref = refs.pop(0)
    maxit_ref = refs.pop(0)
    r0_in = refs.pop(0)                     # ANY (HBM)
    x_in = refs.pop(0)                      # ANY (HBM), aliased to x_out
    x_out = refs.pop(0)                     # ANY (HBM)
    r_hbm = refs.pop(0) if g.mode == "p" else None   # ANY, aliased to r0_in
    k_out = refs.pop(0)
    rz_out = refs.pop(0)
    p_scr = refs.pop(0)
    r_scr = refs.pop(0) if g.mode in ("rpq", "rp") else None
    q_scr = refs.pop(0) if g.mode == "rpq" else None
    save_scr = refs.pop(0)                  # (rows8, sl) rolling strip
    xblk = refs.pop(0)                      # (2, rows8, bl) in
    xout_blk = refs.pop(0)                  # (2, rows8, bl) out
    rblk = refs.pop(0) if g.mode == "p" else None
    rout_blk = refs.pop(0) if g.mode == "p" else None
    sem_in, sem_out = refs.pop(0), refs.pop(0)
    sem_rin = refs.pop(0) if g.mode == "p" else None
    sem_rout = refs.pop(0) if g.mode == "p" else None
    sem_big = refs.pop(0)

    nxl, sl, bl, nb = g.nx, g.sl, g.bl, g.nb
    win = bl + 2 * sl
    f32 = jnp.float32

    # (1, W) masked coefficient rows per block (lane-only boundary
    # masks — see fused_engine._kernel_a).
    def coeff_rows(b, width, origin_off):
        lane = (b * bl + origin_off
                + jax.lax.broadcasted_iota(jnp.int32, (1, width), 1))
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
            rows.append(jnp.where(m, jnp.asarray(coeffs[t], f32),
                                  jnp.asarray(0.0, f32)))
        return rows

    def apply_taps(w, crows):
        """Stencil apply over a (rows8, bl + 2·sl) window; returns the
        (nxl, bl) core."""
        y = None
        for t, (dx, dy, dk) in enumerate(g.taps):
            dl = dy * g.nz + dk
            term = crows[t] * w[1 + dx:1 + dx + nxl,
                                sl + dl:sl + dl + bl]
            y = term if y is None else y + term
        return y

    def gram_sweep():
        """pq = pᵀAp, qq = ‖Ap‖² over the resident p (read-only; when
        mode == "rpq" the apply is also stored into q_scr)."""
        def step(b, acc):
            pq, qq = acc
            w = p_scr[:, pl.ds(b * bl, win)]
            q = apply_taps(w, coeff_rows(b, bl, 0))
            if q_scr is not None:
                q_scr[:, pl.ds(sl + b * bl, bl)] = jnp.pad(
                    q, ((1, g.rows8 - 1 - nxl), (0, 0)))
            q32 = q.astype(f32)
            pc = w[1:1 + nxl, sl:sl + bl].astype(f32)
            return pq + jnp.sum(pc * q32), qq + jnp.sum(q32 * q32)
        return jax.lax.fori_loop(0, nb, step,
                                 (jnp.zeros((), f32), jnp.zeros((), f32)))

    def update_sweep(alpha32, beta32):
        """x += αp; r' = r − αq; p' = r' + βp; Σr'² — with q either read
        from q_scr (rpq) or rematerialized from the pre-update p window
        (rp / p: the rolling strip supplies the already-updated left
        margin's old values)."""
        alpha = alpha32.astype(p_scr.dtype)
        beta = beta32.astype(p_scr.dtype)
        remat = q_scr is None

        def start_x_in(slot, b):
            # Read through the OUTPUT ref: on hardware it aliases x_in
            # (same buffer), and only the output accumulates across
            # iterations — reading x_in would re-read x₀ forever (the
            # interpreter keeps them separate and exposes exactly that).
            return pltpu.make_async_copy(
                x_out.at[:, pl.ds(sl + b * bl, bl)], xblk.at[slot],
                sem_in.at[slot])

        def start_r_in(slot, b):
            return pltpu.make_async_copy(
                r_hbm.at[:, pl.ds(sl + b * bl, bl)], rblk.at[slot],
                sem_rin.at[slot])

        # Prefetch block 0; the rolling strip starts as the (permanently
        # zero) left halo.
        start_x_in(0, 0).start()
        if rblk is not None:
            start_r_in(0, 0).start()
        if remat:
            save_scr[...] = p_scr[:, pl.ds(0, sl)]

        def step(b, acc):
            rz_acc = acc
            slot = jax.lax.rem(b, 2)
            nslot = jax.lax.rem(b + 1, 2)

            @pl.when(b + 1 < nb)
            def _():
                start_x_in(nslot, b + 1).start()
                if rblk is not None:
                    start_r_in(nslot, b + 1).start()

            start_x_in(slot, b).wait()       # matching-sized wait
            if rblk is not None:
                start_r_in(slot, b).wait()

            if remat:
                # Pre-update p window: saved strip + untouched right part.
                w = jnp.concatenate(
                    [save_scr[...],
                     p_scr[:, pl.ds(b * bl + sl, bl + sl)]], axis=1)
                q = apply_taps(w, coeff_rows(b, bl, 0))
                # Save the next block's left margin BEFORE updating p.
                save_scr[...] = w[:, bl:bl + sl]
                p_old = w[1:1 + nxl, sl:sl + bl]
            else:
                q = q_scr[1:1 + nxl, pl.ds(sl + b * bl, bl)]
                p_old = p_scr[1:1 + nxl, pl.ds(sl + b * bl, bl)]

            # x (streamed, all rows — halo rows add α·0).
            pfull = (jnp.pad(p_old, ((1, g.rows8 - 1 - nxl), (0, 0)))
                     if remat else p_scr[:, pl.ds(sl + b * bl, bl)])
            # The slot's previous out-DMA (block b−2) must complete
            # before its buffer is overwritten.
            @pl.when(b >= 2)
            def _():
                pltpu.make_async_copy(
                    xout_blk.at[slot],
                    x_out.at[:, pl.ds(sl + (b - 2) * bl, bl)],
                    sem_out.at[slot]).wait()
                if rblk is not None:
                    pltpu.make_async_copy(
                        rout_blk.at[slot],
                        r_hbm.at[:, pl.ds(sl + (b - 2) * bl, bl)],
                        sem_rout.at[slot]).wait()

            xout_blk[slot] = xblk[slot] + alpha * pfull
            pltpu.make_async_copy(
                xout_blk.at[slot], x_out.at[:, pl.ds(sl + b * bl, bl)],
                sem_out.at[slot]).start()

            # r and p (resident or streamed).
            if rblk is not None:
                r_old = rblk[slot][1:1 + nxl, :]
            else:
                r_old = r_scr[1:1 + nxl, pl.ds(sl + b * bl, bl)]
            r_new = r_old - alpha * q
            p_new = r_new + beta * p_old
            if rblk is not None:
                rout_blk[slot] = jnp.pad(
                    r_new, ((1, g.rows8 - 1 - nxl), (0, 0)))
                pltpu.make_async_copy(
                    rout_blk.at[slot],
                    r_hbm.at[:, pl.ds(sl + b * bl, bl)],
                    sem_rout.at[slot]).start()
            else:
                r_scr[1:1 + nxl, pl.ds(sl + b * bl, bl)] = r_new
            p_scr[1:1 + nxl, pl.ds(sl + b * bl, bl)] = p_new

            r32 = r_new.astype(f32)
            return rz_acc + jnp.sum(r32 * r32)

        rz = jax.lax.fori_loop(0, nb, step, jnp.zeros((), f32))
        # Drain the last two blocks' out-DMAs (static nb — everything
        # earlier was waited at slot reuse).
        for bb in range(max(0, nb - 2), nb):
            pltpu.make_async_copy(
                xout_blk.at[bb % 2],
                x_out.at[:, pl.ds(sl + bb * bl, bl)],
                sem_out.at[bb % 2]).wait()
            if rblk is not None:
                pltpu.make_async_copy(
                    rout_blk.at[bb % 2],
                    r_hbm.at[:, pl.ds(sl + bb * bl, bl)],
                    sem_rout.at[bb % 2]).wait()
        return rz

    # --- init: copy r0 into the resident arrays / leave in HBM --------
    def big_copy(src, dst):
        cp = pltpu.make_async_copy(src, dst, sem_big)
        cp.start()
        cp.wait()

    big_copy(r0_in, p_scr)
    if r_scr is not None:
        big_copy(r0_in, r_scr)
    if interp:
        # Aliased outputs are seeded on hardware but not in the
        # interpreter — copy x₀ into the streamed-x buffer explicitly.
        big_copy(x_in, x_out)
    if r_hbm is not None and interp:
        # On hardware r0_in is aliased to r_hbm — already in place (a
        # self-copy would be undefined).  The interpreter does not seed
        # aliased outputs; copy explicitly there.
        big_copy(r0_in, r_hbm)

    rz0 = jnp.zeros((), f32)

    def rz_step(b, acc):
        r = p_scr[1:1 + nxl, pl.ds(sl + b * bl, bl)].astype(f32)
        return acc + jnp.sum(r * r)
    rz0 = jax.lax.fori_loop(0, nb, rz_step, rz0)
    pq0, qq0 = gram_sweep()

    def cond(c):
        k, rz, pq, qq = c
        return jnp.logical_and(k < maxit_ref[0, 0], rz > tol_ref[0, 0])

    def body(c):
        k, rz, pq, qq = c
        alpha32 = rz / pq
        beta32 = (alpha32 * alpha32 * qq - rz) / rz
        rz_new = update_sweep(alpha32, beta32)
        pq_new, qq_new = gram_sweep()
        return k + 1, rz_new, pq_new, qq_new

    k, rz, pq, qq = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), rz0, pq0, qq0))
    k_out[0, 0] = k
    rz_out[0, 0] = rz
    rz_out[0, 1] = rz


def _build_call(g: SRGeometry, coeffs, dtype, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = partial(_kernel, g=g, coeffs=tuple(coeffs),
                     interp=bool(interpret))
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    vshape = jax.ShapeDtypeStruct((g.rows8, g.total), dtype)

    in_specs = [sm, sm, anyspec, anyspec]
    out_specs = [anyspec]
    out_shape = [vshape]
    aliases = {3: 0}                        # x_in -> x_out
    if g.mode == "p":
        out_specs.append(anyspec)
        out_shape.append(vshape)
        aliases[2] = 1                      # r0_in -> r_hbm
    out_specs += [sm, sm]
    out_shape += [jax.ShapeDtypeStruct((1, 1), jnp.int32),
                  jax.ShapeDtypeStruct((1, 2), jnp.float32)]

    scratch = [pltpu.VMEM((g.rows8, g.total), dtype)]       # p_scr
    if g.mode in ("rpq", "rp"):
        scratch.append(pltpu.VMEM((g.rows8, g.total), dtype))  # r_scr
    if g.mode == "rpq":
        scratch.append(pltpu.VMEM((g.rows8, g.total), dtype))  # q_scr
    scratch += [pltpu.VMEM((g.rows8, g.sl), dtype),            # save strip
                pltpu.VMEM((2, g.rows8, g.bl), dtype),         # x in
                pltpu.VMEM((2, g.rows8, g.bl), dtype)]         # x out
    if g.mode == "p":
        scratch += [pltpu.VMEM((2, g.rows8, g.bl), dtype),
                    pltpu.VMEM((2, g.rows8, g.bl), dtype)]
    scratch += [pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,))]
    if g.mode == "p":
        scratch += [pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,))]
    scratch.append(pltpu.SemaphoreType.DMA(()))

    vmem_need = _footprint(g.mode, g.rows8, g.l_real, g.sl, g.bl,
                           jnp.dtype(dtype).itemsize)
    params = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem_need * 1.05) + (2 << 20),
                                 127 << 20)))

    def call(tol_sq, maxit, r0_l, x0_l):
        return pl.pallas_call(
            kernel,
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            input_output_aliases=aliases,
            scratch_shapes=scratch,
            interpret=interpret,
            **params,
        )(tol_sq, maxit, r0_l, x0_l)

    return call


def sr_cg(g: SRGeometry, b: jnp.ndarray, *, coeffs,
          tol: float = 1e-6, atol=0.0, maxiter: int = 1000,
          interpret: bool = False) -> CGResult:
    """Run the semi-resident whole-solve kernel on flat ``b`` (x₀ = 0 —
    callers with an initial guess solve for the correction, see
    :func:`sr_stencil_cg`).  ``atol`` may be a traced scalar."""
    dtype = b.dtype
    r0_l = _to_layout(g, b.astype(dtype))
    x0_l = jnp.zeros((g.rows8, g.total), dtype)

    bb = jnp.sum(b.astype(jnp.float32) ** 2)
    tol_sq = jnp.maximum(jnp.asarray(tol, jnp.float32) ** 2 * bb,
                         jnp.asarray(atol, jnp.float32) ** 2)
    call = _build_call(g, tuple(coeffs), dtype, interpret)
    out = call(tol_sq.reshape(1, 1),
               jnp.full((1, 1), maxiter, jnp.int32), r0_l, x0_l)
    x_l = out[0]
    k, rz = out[-2], out[-1]
    return CGResult(x=_from_layout(g, x_l),
                    iterations=k[0, 0],
                    residual_norm_sq=rz[0, 1],
                    converged=rz[0, 1] <= tol_sq,
                    history=jnp.zeros((0,), jnp.float32))


def sr_stencil_cg(s, b: jnp.ndarray, x0=None, *, tol: float = 1e-6,
                  atol: float = 0.0, maxiter: int = 1000,
                  mode: Optional[str] = None,
                  interpret: Optional[bool] = None) -> CGResult:
    """Semi-resident whole-solve CG on a constant-coefficient stencil;
    ``cg_solve`` semantics (no history).  ``mode`` overrides the
    footprint-chosen residency tier.

    An initial guess is handled by solving for the correction
    ``A·dx = b − A·x0`` with the stopping threshold still taken against
    the ORIGINAL ‖b‖ (exact ``cg_solve`` semantics)."""
    import dataclasses

    from cgx.kernels.fused_cg import stencil_taps, supports
    from cgx.ops.spmv import spmv

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    spec = stencil_taps(s)
    if spec is None or not supports(s):
        raise ValueError("sr_stencil_cg: unsupported operator")
    nx, ny, nz, taps, coeffs = spec
    g = make_sr_geometry(nx, ny, nz, taps, mode=mode)
    if x0 is not None:
        b_eff = b - spmv(s, x0)
        bb = jnp.sum(b.astype(jnp.float32) ** 2)
        thr = jnp.maximum(jnp.asarray(tol, jnp.float32)
                          * jnp.sqrt(bb), jnp.asarray(atol, jnp.float32))
        res = sr_cg(g, b_eff, coeffs=coeffs, tol=0.0, atol=thr,
                    maxiter=maxiter, interpret=interpret)
        return dataclasses.replace(res, x=res.x + x0)
    return sr_cg(g, b, coeffs=coeffs, tol=tol, atol=atol,
                 maxiter=maxiter, interpret=interpret)
