"""Unified fused-CG engine (v3): TWO Pallas passes per iteration.

Successor to the round-1 three-pass kernels (``fused_cg.py`` v1/v2,
``fused_dia_cg.py``), which ran 11 logical vector passes per iteration at
the chip's streaming limit (docs/PERF_NOTES.md).  This engine restructures
the iteration to ~9 passes and 2 kernel launches using the classic
communication-avoiding identity

    ‖r_{k+1}‖² = α² ‖A p_k‖² − ‖r_k‖²        (exact arithmetic)

(Chronopoulos–Gear / s-step CG literature): kernel A accumulates ``q·q``
alongside ``p·q`` for free (``q`` is in registers), which makes β available
*before* the update pass — so the old kernels B (x/r update) and C
(p update) merge into one pass.  The *accurate* ``‖r‖²`` is still
re-accumulated from the updated residual inside kernel B (also free —
``r_new`` is in registers), so the identity only ever supplies one β and is
corrected every iteration; the convergence test always uses the accumulated
value.

Per iteration:

  A. ``q = A p`` (+ ``pq``, ``qq`` accumulated)     — read p window, write q.
  B. ``α = rz/pq;  β = (α²·qq − rz)/rz``            — scalars, on-core
     ``x += α p;  r −= α q;  p = r + β p``           — read x,r,p,q(,w);
     (+ ``Σ r²``, ``Σ r²·w`` accumulated)              write x,r,p.

Pattern-parameterized: the operator is a static list of *taps*
``(dx, dy, dk)`` — grid-axis offsets with ``|dx| ≤ 1`` — with either scalar
coefficients (constant stencils: 3-D 7-point, 2-D 5-point, 27-point, …) or
per-row coefficient planes (variable-coefficient DIA operators).  Layout is
the measured-fastest lane-major form ``(x-planes ↓ sublanes, (y,z) →
lanes)``, extended with ONE embedded halo row above and below the real
x-planes.  Single-device, the halo rows are permanently zero (they *are*
the Dirichlet boundary); under ``shard_map`` they receive the neighbour
shard's boundary x-planes via a per-iteration two-row ``ppermute`` — the
same kernels run unmodified in both settings, and the dot products become
``psum`` s of the per-shard partials (2 fused scalar collectives per
iteration, matching the XLA path's sync structure).

Variable-coefficient (DIA) operators are handled by one-time symmetric
diagonal scaling ``Ã = E A E`` with ``E = diag(1/√d)`` — exactly
Jacobi-PCG in exact arithmetic — so the hot loop is always *plain* CG; the
true (unscaled) residual norm for the convergence test is accumulated with
a per-row weight vector in kernel B.

The reference's algorithm anchor is ``conj_grad`` (cg.c:88-141); this is
its TPU speed-of-light form.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from cgx.solve.cg import CGResult

__all__ = ["Geometry", "make_geometry", "FusedCG", "FusedState"]


def _r128(v: int) -> int:
    return -(-v // 128) * 128


@dataclass(frozen=True)
class Geometry:
    """Static layout geometry for one fused problem (hashable).

    Two lane-block sizes: ``bl`` is kernel B's (VMEM-bound: 7 concurrent
    double-buffered streams) and ``bl_a = a_factor·bl`` is kernel A's
    (only the window scratch + q live in VMEM, so bigger blocks amortize
    the ±sl window-overlap read amplification).  The layout's halo lane
    blocks are ``bl_a`` wide so both block sizes tile it exactly.
    """

    nx: int            # global x-planes
    ny: int
    nz: int
    nxl: int           # local x-planes on this shard (== nx unsharded)
    taps: Tuple[Tuple[int, int, int], ...]   # (dx, dy, dk) per tap
    rows8: int         # sublane rows: round8(nxl + 2 halo rows)
    sl: int            # lane halo (covers max |dy·nz + dk|)
    bl: int            # kernel-B lane block
    bl_a: int          # kernel-A lane block (multiple of bl)
    l_real: int        # ny·nz
    l_pad: int         # rounded up to a multiple of bl_a
    total: int         # l_pad + 2·bl_a (one halo block each side)
    nb: int            # kernel-B grid size (l_pad / bl)
    nb_a: int          # kernel-A grid size (l_pad / bl_a)
    double_buffer: bool  # overlap kernel A's window DMA with compute
    a_vmem_limit: int = 0  # kernel-A vmem_limit_bytes (0 = Mosaic default)

    @property
    def n_local(self) -> int:
        return self.nxl * self.l_real


def make_geometry(nx: int, ny: int, nz: int,
                  taps: Sequence[Tuple[int, int, int]],
                  n_shards: int = 1,
                  target_block_bytes: int = 1 << 19,
                  row_multiplier: int = 1,
                  a_extra_streams: int = 0,
                  a_window_streams: int = 1,
                  stream_budget_bytes: Optional[int] = None,
                  residency_multiplier: int = 1,
                  itemsize: int = 4,
                  plane_bytes: int = 0,
                  one_pass: bool = False) -> Geometry:
    """``target_block_bytes`` sizes kernel B's blocks (7-8 double-buffered
    streams — keep modest); kernel A's block multiple ``m`` is chosen per
    regime (see the inline comments).  ``row_multiplier``: effective
    sublane-row count per block for VMEM sizing (the multi-RHS path
    band-stacks k layouts, so its blocks are k x taller).
    ``a_extra_streams``: extra grid-pipelined block buffers in kernel A
    (2 per coefficient plane when planes ride BlockSpecs).
    ``a_window_streams``: halo-window DMA streams in kernel A (1 for the
    p window; +n_planes when planes stream as windows — the symmetric
    path).  ``residency_multiplier``: factor on the CARRIED working set
    only (the 2-D-grid multi-RHS path holds k bands of x/r/p/q in HBM
    but streams one band per grid step, so blocks size like single-RHS
    while the resident-regime test must see k x the vectors).
    ``itemsize``: vector element size in bytes (2 for bf16) — sets the
    sublane tile (fp32 (8,128) / bf16 (16,128)) and the VMEM byte
    models, so bf16 gets proportionally wider blocks and windows.
    ``plane_bytes``: total bytes of streamed coefficient planes (at
    their STREAM dtype — half for bf16 planes).  Counted into the
    residency test: an iteration whose planes spill VMEM is
    HBM-streaming-bound even when the carried vectors alone would fit,
    so it gets the streaming geometry (double-buffered wide windows).
    This is the footprint model behind the bf16-plane routing
    (docs/PERF_NOTES.md round 2h/2i)."""
    if nx % n_shards:
        raise ValueError(f"nx={nx} not divisible by n_shards={n_shards}")
    nxl = nx // n_shards
    for (dx, dy, dk) in taps:
        if abs(dx) > 1:
            raise ValueError(f"tap {dx, dy, dk}: |dx| must be <= 1 "
                             "(one embedded halo row per side)")
    itemsize = int(itemsize)
    if itemsize not in (2, 4, 8):
        raise ValueError(f"itemsize must be 2, 4 or 8, got {itemsize}")
    # Sublane tile: (8,128) fp32 / (16,128) bf16.  8-byte dtypes only ever
    # run in interpret mode (fp64 is CPU-validation-only), keep 8 rows.
    row_tile = 16 if itemsize == 2 else 8
    rows8 = -(-(nxl + 2) // row_tile) * row_tile
    rows_eff = rows8 * max(1, int(row_multiplier))
    l_real = ny * nz
    reach = max([abs(dy * nz + dk) for (_, dy, dk) in taps] + [1])
    sl = _r128(reach)
    bl = max(sl, (target_block_bytes // (rows_eff * itemsize) // 128) * 128)
    # Two regimes (measured, docs/PERF_NOTES.md): when the ~5-buffer
    # working set fits in VMEM (~128 MB on v5e) XLA keeps the carried
    # vectors VMEM-resident and the iteration runs at ~2.5 TB/s — small
    # blocks, no window amortization needed (m = 1).  Past residency the
    # iteration is HBM-streaming-bound and kernel A wants the biggest
    # window its scoped-VMEM budget allows.
    l_pad1 = -(-l_real // bl) * bl
    working_set = (5 * rows_eff * (l_pad1 + 2 * bl) * itemsize
                   * max(1, int(residency_multiplier))
                   + int(plane_bytes))
    a_vmem_limit = 0
    if one_pass:
        # v5 one-pass model (cgx/kernels/fused_onepass.py): per row, two
        # double-buffered halo windows (p: bl_a+4·sl, r: bl_a+2·sl),
        # pipelined x input + 3 outputs, ~4 extended temporaries →
        # ~16·bl_a + 20·sl scoped bytes per row.  The default budget is
        # larger than the two-pass engine's 15 MB because the whole
        # iteration lives in this one kernel — its windows ARE the
        # iteration's streams, so starving them costs bandwidth directly
        # (the two-pass "wider windows were slower" result applied to
        # widening kernel A beyond its share).
        budget = (32 << 20) if stream_budget_bytes is None \
            else int(stream_budget_bytes)
        per_row = itemsize * rows_eff
        cap = budget // per_row - 20 * sl
        m = max(1, int(cap // (16 * bl)))
        m = max(m, -(-2 * sl) // bl)    # p-window start needs bl_a ≥ 2·sl
        usage = per_row * (16 * bl * m + 20 * sl)
        if usage > (14 << 20):
            a_vmem_limit = min(int(usage * 1.25) + (4 << 20), 120 << 20)
        bl_a = bl * m
        l_pad = -(-l_real // bl_a) * bl_a
        return Geometry(nx=nx, ny=ny, nz=nz, nxl=nxl,
                        taps=tuple(map(tuple, taps)), rows8=rows8, sl=sl,
                        bl=bl, bl_a=bl_a, l_real=l_real, l_pad=l_pad,
                        total=l_pad + 2 * bl_a, nb=l_pad // bl,
                        nb_a=l_pad // bl_a, double_buffer=True,
                        a_vmem_limit=a_vmem_limit)
    if working_set <= (96 << 20):
        # Resident regime: smallest layout, no window DMA double-buffering
        # (its per-block control overhead measured ~50% at 128^3, and
        # VMEM-to-VMEM copies don't need hiding).
        m = 1
        double_buffer = False
        # Wide-tap operators can exceed Mosaic's ~16 MB scoped budget
        # even at m=1 (26 grid-pipelined plane blocks at 27-point 144³
        # measured 18.6 MB — compile OOM): model the per-step usage and
        # raise the LIMIT (not the window) exactly as the streaming
        # branch does.
        n_win = max(1, int(a_window_streams))
        usage = itemsize * rows_eff * (
            (2 * n_win + 7 + a_extra_streams) * bl + 4 * sl * n_win)
        # Raise from 11 MB, not the 16 MB default: the model under-counts
        # the grid-pipelined wide-tap case by ~25% (27-plane non-sym DIA
        # 96³ measured 16.88 MB actual vs 13.6 MB modeled — compile OOM
        # when no limit was set).
        if usage > (11 << 20):
            a_vmem_limit = min(int(usage * 1.5) + (4 << 20), 120 << 20)
    else:
        # Streaming regime: widest A-window whose scoped-VMEM fits.
        # Model (calibrated on-chip; 288^3 OOMed at bl_a=1536/rows8=296,
        # 216^3 compiled at bl_a=2048/rows8=224, DIA 192^3 OOMed at
        # bl_a=1792 with 6 plane streams): per window stream a
        # double-buffered scratch 2·(bl_a + 2·sl), plus ~7 block-sized
        # temporaries, plus 2 per grid-pipelined plane block
        # (a_extra_streams), × rows_eff × 4 B ≤ the ~15 MB default scoped
        # budget.  NB: raising vmem_limit_bytes to get wider windows was
        # MEASURED SLOWER (64 MB budget: 667.6 vs 452.0 µs/iter at DIA
        # 192³, 621.4 vs 354 at 216³ stencil) — giant windows starve
        # Mosaic's own pipelining; keep the default budget.
        n_win = max(1, int(a_window_streams))
        budget = (15 << 20) if stream_budget_bytes is None \
            else int(stream_budget_bytes)
        cap = budget // (itemsize * rows_eff) - 4 * sl * n_win
        denom = 2 * n_win + 7 + a_extra_streams
        m = max(1, int(cap // (denom * bl)))
        usage = itemsize * rows_eff * (denom * bl * m + 4 * sl * n_win)
        if stream_budget_bytes is not None:
            a_vmem_limit = min(int(usage * 1.5) + (8 << 20), 120 << 20)
        elif usage > (11 << 20):
            # 11 MB threshold, not 14: see the resident-regime comment
            # (the model under-counts wide-tap stack usage by ~25%).
            # Wide-tap operators (many plane windows, m clamped to 1)
            # legitimately need more scoped VMEM than Mosaic's ~16 MB
            # default — raise the LIMIT to fit the scratch while keeping
            # the window width from the 15 MB sizing model (wider
            # windows via a bigger budget were measured slower; a bigger
            # limit for the same windows just prevents a spill OOM).
            a_vmem_limit = min(int(usage * 1.5) + (4 << 20), 120 << 20)
        double_buffer = True
    bl_a = bl * m
    l_pad = -(-l_real // bl_a) * bl_a
    return Geometry(nx=nx, ny=ny, nz=nz, nxl=nxl, taps=tuple(map(tuple, taps)),
                    rows8=rows8, sl=sl, bl=bl, bl_a=bl_a, l_real=l_real,
                    l_pad=l_pad, total=l_pad + 2 * bl_a, nb=l_pad // bl,
                    nb_a=l_pad // bl_a, double_buffer=double_buffer,
                    a_vmem_limit=a_vmem_limit)


# ---------------------------------------------------------------------------
# Layout conversion (local flat <-> padded layout)
# ---------------------------------------------------------------------------

def to_layout(g: Geometry, v: jnp.ndarray) -> jnp.ndarray:
    arr = v.reshape(g.nxl, g.l_real)
    return jnp.pad(arr, ((1, g.rows8 - 1 - g.nxl),
                         (g.bl_a, g.total - g.bl_a - g.l_real)))


def from_layout(g: Geometry, a: jnp.ndarray) -> jnp.ndarray:
    return a[1:1 + g.nxl, g.bl_a:g.bl_a + g.l_real].reshape(-1)


# ---------------------------------------------------------------------------
# Kernel A: q = A p (+ pq, qq)
# ---------------------------------------------------------------------------

def _kernel_a(*refs, g: Geometry, coeffs, variable: bool, sym: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if variable and sym:
        (p_hbm, planes_hbm, q_ref, dots_ref,
         scratch, sem, pscratch, psem) = refs
    elif variable:
        p_hbm, planes_ref, q_ref, dots_ref, scratch, sem = refs
    else:
        p_hbm, q_ref, dots_ref, scratch, sem = refs

    j = pl.program_id(0)
    win = g.bl_a + 2 * g.sl

    def dma(slot, blk):
        start = (g.bl_a - g.sl) + blk * g.bl_a    # statically 128-aligned
        cps = [pltpu.make_async_copy(
            p_hbm.at[:, pl.ds(start, win)], scratch.at[slot], sem.at[slot])]
        if variable and sym:
            # The symmetric path streams the coefficient planes as halo
            # windows too (one stacked DMA): each plane serves BOTH its
            # tap and the mirror tap via a shifted read (see the tap loop).
            cps.append(pltpu.make_async_copy(
                planes_hbm.at[:, :, pl.ds(start, win)],
                pscratch.at[slot], psem.at[slot]))
        return cps

    if g.double_buffer:
        # Streaming regime: prefetch block j+1's window while computing
        # block j (a synchronous start/wait here measured ~590 GB/s
        # effective vs the chip's ~990 GB/s streaming limit).
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
        w = scratch[j % 2]                     # (rows8, bl_a + 2·sl)
        pw = pscratch[j % 2] if (variable and sym) else None
    else:
        # Resident regime: VMEM-to-VMEM copy needs no hiding; plain
        # unsliced scratch, single semaphore.
        start = (g.bl_a - g.sl) + j * g.bl_a
        cps = [pltpu.make_async_copy(
            p_hbm.at[:, pl.ds(start, win)], scratch, sem)]
        if variable and sym:
            cps.append(pltpu.make_async_copy(
                planes_hbm.at[:, :, pl.ds(start, win)], pscratch, psem))
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()
        w = scratch[...]
        pw = pscratch[...] if (variable and sym) else None
    nxl = g.nxl
    lane = j * g.bl_a + jax.lax.broadcasted_iota(jnp.int32, (1, g.bl_a), 1)
    k = lane % g.nz
    jy = (lane // g.nz) % g.ny
    valid = lane < g.l_real

    y = None
    pi = 0                                     # next plane slot
    for t, (dx, dy, dk) in enumerate(g.taps):
        dl = dy * g.nz + dk
        # Row shift dx is an offset into the halo-extended rows (real rows
        # live at 1..nxl); lane shift dl indexes the halo window.
        s = w[1 + dx:1 + dx + nxl, g.sl + dl:g.sl + dl + g.bl_a]
        if coeffs[t] is not None:
            # Boundary masks depend only on the LANE index, never the
            # row: fold them (and output validity) into a (1, bl_a)
            # masked-coefficient row so the per-element work is one
            # multiply+add — a (rows, bl_a) where/select here measured
            # as a large share of the kernel's VPU time.
            m = valid
            if dk:
                m = m & (k + dk >= 0) & (k + dk < g.nz)
            if dy:
                m = m & (jy + dy >= 0) & (jy + dy < g.ny)
            cv = jnp.where(m, jnp.asarray(coeffs[t], w.dtype),
                           jnp.asarray(0.0, w.dtype))
            y = cv * s if y is None else y + cv * s
            continue
        if sym:
            # Symmetric operator: plane'_{-off}[i] = plane'_{+off}[i-off],
            # so ONE windowed plane yields both taps — the +off term reads
            # the plane at the output position, the -off (mirror) term
            # reads plane AND p at the (-dx, -dl)-shifted position.
            # Planes may stream in a narrower dtype (bf16 plane_dtype):
            # upcast in-register before the multiply so products keep the
            # vector dtype's mantissa.
            wp = pw[pi]
            pi += 1
            term = (wp[1:1 + nxl, g.sl:g.sl + g.bl_a].astype(w.dtype) * s)
            if (dx, dy, dk) != (0, 0, 0):
                term = term + (
                    wp[1 - dx:1 - dx + nxl,
                       g.sl - dl:g.sl - dl + g.bl_a].astype(w.dtype)
                    * w[1 - dx:1 - dx + nxl,
                        g.sl - dl:g.sl - dl + g.bl_a])
        else:
            # Coefficient plane at the OUTPUT rows (row-aligned DIA
            # convention); boundary zeros are encoded in the data.
            term = planes_ref[pi, 1:1 + nxl, :].astype(w.dtype) * s
            pi += 1
        y = term if y is None else y + term

    if sym:
        # Lane-padding outputs must be zeroed: symmetric mirror reads can
        # pull real values into padding lanes, which would corrupt qq and
        # r.  (Constant taps fold validity into their coefficient rows;
        # output-aligned plane taps are zero there already.)
        y = jnp.where(valid, y, 0.0)

    q_ref[...] = jnp.pad(y, ((1, g.rows8 - 1 - nxl), (0, 0)))

    @pl.when(j == 0)
    def _():
        dots_ref[0, 0] = 0.0
        dots_ref[0, 1] = 0.0

    gc = w[1:1 + nxl, g.sl:g.sl + g.bl_a]
    # fp32 products AND accumulation regardless of vector dtype (bf16
    # products would lose half the mantissa before the upcast).
    y32 = y.astype(jnp.float32)
    dots_ref[0, 0] += jnp.sum(y32 * gc.astype(jnp.float32))
    dots_ref[0, 1] += jnp.sum(y32 * y32)


# ---------------------------------------------------------------------------
# Kernel B: scalars on-core; x += αp; r -= αq; p = r + βp (+ Σr², Σr²w)
# ---------------------------------------------------------------------------

def _kernel_b(*refs, weighted: bool):
    from jax.experimental import pallas as pl

    if weighted:
        (rz_ref, pqqq_ref, x_ref, r_ref, p_ref, q_ref, w_ref,
         x_out, r_out, p_out, dots_ref) = refs
    else:
        (rz_ref, pqqq_ref, x_ref, r_ref, p_ref, q_ref,
         x_out, r_out, p_out, dots_ref) = refs

    i = pl.program_id(0)
    rz = rz_ref[0, 0]
    pq = pqqq_ref[0, 0]
    qq = pqqq_ref[0, 1]
    alpha32 = rz / pq
    # β from the CA-CG identity ‖r'‖² = α²·qq − rz: available BEFORE the
    # pass, which is what lets p update here instead of a third kernel.
    beta = ((alpha32 * alpha32 * qq - rz) / rz).astype(p_ref.dtype)
    alpha = alpha32.astype(x_ref.dtype)

    pv = p_ref[...]
    x_out[...] = x_ref[...] + alpha * pv
    r_new = r_ref[...] - alpha * q_ref[...]
    r_out[...] = r_new
    p_out[...] = r_new + beta * pv

    @pl.when(i == 0)
    def _():
        dots_ref[0, 0] = 0.0
        dots_ref[0, 1] = 0.0

    r32 = r_new.astype(jnp.float32)
    rsq = r32 * r32
    s = jnp.sum(rsq)
    dots_ref[0, 0] += s                       # solve-space ‖r̃‖² (exact)
    if weighted:
        dots_ref[0, 1] += jnp.sum(rsq * w_ref[...].astype(jnp.float32))
    else:
        dots_ref[0, 1] += s                   # true ‖r‖² == solve-space


# ---------------------------------------------------------------------------
# State + driver
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class FusedState:
    """Layout-space CG state — the fused analogue of
    :class:`cgx.solve.cg.CGState` (checkpoint/chunk unit)."""

    x: jnp.ndarray         # (rows8, total) layout
    r: jnp.ndarray
    p: jnp.ndarray
    rz: jnp.ndarray        # (1, 2) fp32: [solve-space ‖r̃‖², true ‖r‖²]
    k: jnp.ndarray         # int32
    history: jnp.ndarray   # (maxiter+1,) fp32 or (0,)


class FusedCG:
    """The fused solver for one (geometry, coefficients) configuration.

    Built once per problem; provides ``init`` / ``run`` / ``result`` (the
    chunked-stepping primitives behind checkpoint/resume) and ``solve``
    (the monolithic while_loop).  All methods are jit-compatible; under
    ``shard_map`` pass ``axis_name`` and per-shard arrays.

    Args:
      geom: :func:`make_geometry` output (per-shard when sharded).
      coeffs: scalar tap coefficients (constant-coefficient path), or
        ``None`` with ``planes`` set.
      planes: per-tap coefficient planes, local flat ``(T, nxl·ny·nz)``
        (variable-coefficient path — boundary zeros encoded in the data).
      weight: optional per-row weights, local flat; kernel B then
        accumulates ``Σ r²·w`` as the *true* residual norm (used by the
        diagonal-scaling PCG transform: ``w = diag(A)``).
      axis_name: mesh axis for ``psum``/halo exchange under ``shard_map``.
      interpret: run Pallas kernels in interpreter mode (CPU tests).
      sym: symmetric-operator mode — ``taps`` lists only one tap per
        ``±off`` pair (plus the diagonal) and each streamed plane is
        applied twice: at the output position (its own tap) and at the
        ``-off``-shifted position (the mirror tap, using
        ``plane_{-off}[i] = plane_{+off}[i-off]``).  Planes then stream
        as halo windows (build the geometry with
        ``a_window_streams = 1 + n_planes``).  Caller must verify the
        operator data really is symmetric.
      plane_dtype: stream the coefficient planes in this dtype while the
        vectors keep ``dtype`` (bf16 planes + fp32 vectors halves the
        dominant stream on wide-tap DIA).  The rounding is a one-time
        fixed SPD perturbation of the operator — see the inline note.
    """

    def __init__(self, geom: Geometry, *, dtype,
                 coeffs: Optional[Tuple[float, ...]] = None,
                 planes: Optional[jnp.ndarray] = None,
                 weight: Optional[jnp.ndarray] = None,
                 axis_name: Optional[str] = None,
                 interpret: bool = False,
                 sym: bool = False,
                 plane_dtype=None):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        g = geom
        self.geom = g
        self.axis_name = axis_name
        self.dtype = dtype
        # coeffs: one entry per tap — a float (constant coefficient) or
        # None (streamed per-row plane; `planes` holds the None slots'
        # planes in tap order).  Mixed taps let e.g. the Jacobi-scaled
        # DIA path keep its unit diagonal as a constant instead of
        # streaming a plane of ones.
        if coeffs is None:
            coeffs = (None,) * len(g.taps)
        coeffs = tuple(coeffs)
        self.coeffs = coeffs
        n_planes = sum(1 for c in coeffs if c is None)
        variable = n_planes > 0
        self.sym = sym = bool(sym and variable)
        # Planes may stream narrower than the vectors (plane_dtype=bf16
        # with fp32 vectors): the operator data is rounded ONCE at setup —
        # a fixed SPD perturbation (~4e-3 relative), so CG conjugacy is
        # untouched and the recurrence converges normally, just to the
        # perturbed system's solution.  Wrap in ir_cg_solve for true-system
        # accuracy; the win is plane HBM traffic halved (dominant on
        # wide-tap DIA operators where planes outnumber vector streams).
        p_dtype = dtype if plane_dtype is None else jnp.dtype(plane_dtype)
        self.plane_dtype = p_dtype
        if variable:
            if planes is None or planes.shape[0] != n_planes:
                raise ValueError(f"need {n_planes} coefficient planes for "
                                 f"the None tap slots, got "
                                 f"{None if planes is None else planes.shape}")
            planes_l = jnp.stack(
                [to_layout(g, planes[t].astype(p_dtype))
                 for t in range(n_planes)])
            if sym and axis_name is not None:
                # Mirror taps read the plane one row shifted: fill the
                # plane layout's halo rows from the neighbour shards ONCE
                # (planes are static — unlike p's per-iteration exchange).
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
        self.weight_l = (to_layout(g, weight.astype(dtype))
                         if weight is not None else None)
        weighted = self.weight_l is not None

        # Kernel-B blocks: the real region starts at lane bl_a = m blocks.
        m = g.bl_a // g.bl
        vec_blk = pl.BlockSpec((g.rows8, g.bl), lambda i: (0, i + m),
                               memory_space=pltpu.VMEM)
        # Kernel-A blocks (bl_a): one halo block on each side.
        vec_blk_a = pl.BlockSpec((g.rows8, g.bl_a), lambda i: (0, i + 1),
                                 memory_space=pltpu.VMEM)
        smem1_in = pl.BlockSpec((1, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)
        smem2_in = pl.BlockSpec((1, 2), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)
        smem2_out = pl.BlockSpec((1, 2), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM)
        # Under shard_map the kernel outputs vary across the mesh axis
        # (per-shard layouts and partial dots); annotate for vma checking.
        vma = frozenset() if axis_name is None else frozenset({axis_name})
        vshape = jax.ShapeDtypeStruct((g.rows8, g.total), dtype, vma=vma)
        s2 = jax.ShapeDtypeStruct((1, 2), jnp.float32, vma=vma)

        kernel_a = partial(_kernel_a, g=g, coeffs=coeffs,
                           variable=variable, sym=sym)
        kernel_b = partial(_kernel_b, weighted=weighted)

        a_in = [pl.BlockSpec(memory_space=pl.ANY)]
        a_args = ()
        if variable:
            if sym:
                a_in.append(pl.BlockSpec(memory_space=pl.ANY))
            else:
                a_in.append(pl.BlockSpec((n_planes, g.rows8, g.bl_a),
                                         lambda i: (0, 0, i + 1),
                                         memory_space=pltpu.VMEM))
            a_args = (planes_l,)

        win = g.bl_a + 2 * g.sl
        if g.double_buffer:
            a_scratch = [pltpu.VMEM((2, g.rows8, win), dtype),
                         pltpu.SemaphoreType.DMA((2,))]
            if sym:
                a_scratch += [pltpu.VMEM((2, n_planes, g.rows8, win),
                                         p_dtype),
                              pltpu.SemaphoreType.DMA((2,))]
        else:
            a_scratch = [pltpu.VMEM((g.rows8, win), dtype),
                         pltpu.SemaphoreType.DMA(())]
            if sym:
                a_scratch += [pltpu.VMEM((n_planes, g.rows8, win),
                                         p_dtype),
                              pltpu.SemaphoreType.DMA(())]

        a_params = {}
        if g.a_vmem_limit and not interpret:
            a_params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=g.a_vmem_limit)

        def call_a(p_l):
            return pl.pallas_call(
                kernel_a,
                grid=(g.nb_a,),
                in_specs=a_in,
                out_specs=(vec_blk_a, smem2_out),
                out_shape=(vshape, s2),
                scratch_shapes=a_scratch,
                interpret=interpret,
                **a_params,
            )(p_l, *a_args)

        b_in = [smem1_in, smem2_in, vec_blk, vec_blk, vec_blk, vec_blk]
        b_args = ()
        if weighted:
            b_in.append(vec_blk)
            b_args = (self.weight_l,)

        def call_b(rz, pqqq, x, r, p, q):
            return pl.pallas_call(
                kernel_b,
                grid=(g.nb,),
                in_specs=b_in,
                out_specs=(vec_blk, vec_blk, vec_blk, smem2_out),
                out_shape=(vshape, vshape, vshape, s2),
                input_output_aliases={2: 0, 3: 1, 4: 2},
                interpret=interpret,
            )(rz, pqqq, x, r, p, q, *b_args)

        self._call_a = call_a
        self._call_b = call_b

    # -- collectives -------------------------------------------------------

    def _allsum(self, v):
        if self.axis_name is None:
            return v
        return jax.lax.psum(v, self.axis_name)

    def _exchange(self, p_l):
        """Fill the embedded halo rows from the neighbour shards (no-op
        single-device: the halo rows stay zero = Dirichlet boundary)."""
        if self.axis_name is None:
            return p_l
        g = self.geom
        nd = jax.lax.psum(1, self.axis_name)    # static under shard_map
        if nd == 1:
            return p_l
        fwd = jax.lax.ppermute(p_l[g.nxl], self.axis_name,
                               [(i, i + 1) for i in range(nd - 1)])
        bwd = jax.lax.ppermute(p_l[1], self.axis_name,
                               [(i, i - 1) for i in range(1, nd)])
        return p_l.at[0, :].set(fwd).at[g.nxl + 1, :].set(bwd)

    # -- chunked-stepping primitives --------------------------------------

    def init(self, b_l: jnp.ndarray, x0_l: Optional[jnp.ndarray] = None,
             history_len: int = 0) -> FusedState:
        """Initial state from the *solve-space* local RHS (already scaled
        by the wrapper for the DIA transform)."""
        g = self.geom
        b_lay = to_layout(g, b_l.astype(self.dtype))
        if x0_l is None:
            x_l = jnp.zeros_like(b_lay)
            r_l = b_lay
        else:
            x_l = to_layout(g, x0_l.astype(self.dtype))
            q0, _ = self._call_a(self._exchange(x_l))
            # q0's halo lane blocks are uninitialized (the grid never
            # writes them); round-tripping through flat space re-zeroes.
            r_l = to_layout(g, b_l.astype(self.dtype) - from_layout(g, q0))
        rz0 = self._rz_of(r_l)
        hist0 = (jnp.zeros((history_len,), jnp.float32).at[0].set(rz0[0, 1])
                 if history_len else jnp.zeros((0,), jnp.float32))
        return FusedState(x=x_l, r=r_l, p=r_l, rz=rz0,
                          k=jnp.zeros((), jnp.int32), history=hist0)

    def _rz_of(self, r_l):
        rsq = (r_l * r_l).astype(jnp.float32)
        s = jnp.sum(rsq)
        if self.weight_l is not None:
            sw = jnp.sum(rsq * self.weight_l.astype(jnp.float32))
        else:
            sw = s
        return self._allsum(jnp.stack([s, sw]).reshape(1, 2))

    def norm_sq_b(self, b_l) -> jnp.ndarray:
        """True-space ‖b‖² (fp32, global) for the relative tolerance."""
        bsq = (b_l.astype(jnp.float32)) ** 2
        if self.weight_l is not None:
            w = from_layout(self.geom, self.weight_l).astype(jnp.float32)
            bsq = bsq * w
        return self._allsum(jnp.sum(bsq))

    def run(self, state: FusedState, upto, tol_sq) -> FusedState:
        """Advance until ``k == upto`` or true ‖r‖² ≤ tol_sq (both may be
        traced scalars)."""
        track = state.history.shape[0] > 0

        def cond(s: FusedState):
            return jnp.logical_and(s.k < upto, s.rz[0, 1] > tol_sq)

        def body(s: FusedState) -> FusedState:
            p = self._exchange(s.p)
            q, pqqq = self._call_a(p)
            pqqq = self._allsum(pqqq)
            x, r, p, dots = self._call_b(s.rz[:, :1], pqqq, s.x, s.r, p, q)
            dots = self._allsum(dots)
            hist = s.history
            if track:
                idx = jnp.minimum(s.k + 1, hist.shape[0] - 1)
                hist = hist.at[idx].set(dots[0, 1])
            return FusedState(x=x, r=r, p=p, rz=dots, k=s.k + 1,
                              history=hist)

        return jax.lax.while_loop(cond, body, state)

    def result(self, state: FusedState, tol_sq,
               maxiter: Optional[int] = None) -> CGResult:
        """Package a :class:`CGResult` (local-flat solution)."""
        hist = state.history
        if hist.shape[0] > 0 and maxiter is not None:
            idx = jnp.arange(maxiter + 1)
            hist = jnp.where(idx <= state.k, hist, state.rz[0, 1])
        return CGResult(x=from_layout(self.geom, state.x),
                        iterations=state.k,
                        residual_norm_sq=state.rz[0, 1],
                        converged=state.rz[0, 1] <= tol_sq,
                        history=hist)

    # -- checkpoint interop (flat CGState <-> layout FusedState) ----------

    def state_to_flat(self, st: FusedState, e=None):
        """Convert to a :class:`cgx.solve.cg.CGState` in the ORIGINAL
        (unscaled) problem space — snapshot files are interchangeable with
        the XLA path's.  ``e`` is the diagonal scaling vector (DIA
        transform); ``z = M⁻¹r`` is reconstructed from it."""
        from cgx.solve.cg import CGState

        g = self.geom
        x = from_layout(g, st.x)
        r = from_layout(g, st.r)
        p = from_layout(g, st.p)
        if e is not None:
            from cgx.ops.blas import safe_recip
            inv_e = safe_recip(e)
            x, r, p = e * x, inv_e * r, e * p
            z = e * from_layout(g, st.r)      # z = M⁻¹ r = e·r̃
        else:
            z = r
        return CGState(x=x, r=r, z=z, p=p,
                       rz=st.rz[0, 0].astype(self.dtype),
                       rr=st.rz[0, 1].astype(self.dtype),
                       k=st.k, history=st.history.astype(self.dtype))

    def state_from_flat(self, cg, e=None) -> FusedState:
        """Inverse of :meth:`state_to_flat` (resume from any backend's
        snapshot)."""
        g = self.geom
        x, r, p = cg.x, cg.r, cg.p
        if e is not None:
            from cgx.ops.blas import safe_recip
            inv_e = safe_recip(e)
            x, r, p = inv_e * x, e * r, inv_e * p
        rz = jnp.stack([cg.rz.astype(jnp.float32),
                        cg.rr.astype(jnp.float32)]).reshape(1, 2)
        return FusedState(x=to_layout(g, x.astype(self.dtype)),
                          r=to_layout(g, r.astype(self.dtype)),
                          p=to_layout(g, p.astype(self.dtype)),
                          rz=rz, k=jnp.asarray(cg.k, jnp.int32),
                          history=cg.history.astype(jnp.float32))

    # -- monolithic solve --------------------------------------------------

    def solve(self, b_l, x0_l=None, *, tol: float = 1e-6, atol: float = 0.0,
              maxiter: int = 1000, track_history: bool = False) -> CGResult:
        bb = self.norm_sq_b(b_l)
        tol_sq = jnp.maximum(jnp.asarray(tol, jnp.float32) ** 2 * bb,
                             jnp.asarray(atol, jnp.float32) ** 2)
        st = self.init(b_l, x0_l,
                       history_len=maxiter + 1 if track_history else 0)
        st = self.run(st, maxiter, tol_sq)
        return self.result(st, tol_sq, maxiter)
