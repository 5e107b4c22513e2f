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

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from cgx.sparse.wbell import WBELLMatrix

__all__ = ["wbell_spmv", "wbell_spmm", "wbell_matvec", "wbell_resident_raw",
           "wbell_spmm_stacked", "to_stacked", "from_stacked",
           "WBellTierPlan", "build_tier_plan", "wbell_spmm_tiered"]


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


def _kernel_resident(span: int, nrhs: int, splane: int):
    """Resident-x plane-major kernel (PERF_NOTES round 4).

    The windowed kernel above is per-grid-step LATENCY-bound: ~305 ns per
    slot plane on v5e regardless of the gather-chain length (19-way round
    3: 310 ns/plane at fill 19x; span-2 bucketed: 305 ns/plane at fill
    29.8x — time scales with plane count, not VPU work or stored bytes).
    This variant amortizes that fixed cost by (a) pinning the whole
    internal x AND y in VMEM (v5e has ~128 MB — up to ~12 M rows
    single-RHS) so the per-tile window DMA machinery disappears, and
    (b) streaming ``splane`` slot planes per grid step.  Per plane it
    slices the resident x at the plane's absolute window offset and
    resolves operands with the same ``span`` intra-vreg dynamic gathers
    + select tree.
    """
    from jax.experimental import pallas as pl

    def kernel(pg_r, lc_ref, vals_ref, x_ref, o_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        for s in range(splane):
            p = j * splane + s
            l = lc_ref[s]                                  # (1, 128)
            idx = jnp.broadcast_to(l % 128, (8, 128))
            lcg = jnp.broadcast_to(l // 128, (8, 128))
            v = vals_ref[s].astype(o_ref.dtype)            # (8, 8, 128)
            # Per-plane (output group, window start) packed 16/16 into
            # ONE int32 prefetch array: two separate arrays blow the
            # 1 MB SMEM budget past ~128 k planes (measured at 8 M rows
            # — "Ran out of memory in memory space smem").  The mask
            # after the arithmetic shift makes the FULL 16-bit og range
            # valid (og >= 32768 packs to a negative int32; the shift
            # sign-extends, the mask recovers the group — ADVICE r4).
            pg = pg_r[p]
            og = (pg >> 16) & 0xFFFF
            ga = pg & 0xFFFF
            for c in range(nrhs):
                w = x_ref[c, pl.ds(ga, span)]              # (span, 8, 128)
                g = jnp.zeros((8, 128), o_ref.dtype)
                for t in range(span):
                    cand = jnp.take_along_axis(w[t], idx, axis=1)
                    g = (cand if span == 1
                         else jnp.where(lcg == t, cand, g))
                y = o_ref[c, og]
                for jj in range(8):
                    y = y + v[:, jj, :] * jnp.broadcast_to(
                        g[jj:jj + 1, :], (8, 128))
                o_ref[c, og] = y

    return kernel


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WBellTierPlan:
    """Width-tiered plane ordering for the resident kernel (PERF_NOTES
    5b/5e): planes sorted into actual-window-width classes {≤4, ≤8,
    ≤16} with per-plane TIGHT window starts, so one ``pallas_call``
    runs a 4/8/16-long gather/select chain per class segment instead of
    a full ``span``-long chain everywhere.  Same fill, same stream —
    only the per-COLUMN VPU chain shrinks, which is exactly the
    measured multi-RHS floor (5a).  Measured at thermal2 scale:
    k=4 **0.707 ms/RHS vs 0.783** batched (single-RHS identical —
    stream-bound).  Built host-side by :func:`build_tier_plan`."""

    values: jnp.ndarray   # (Ptot, 8, 8, 128) class-major
    lc: jnp.ndarray       # (Ptot, 1, 128) int32 — tight window offsets
    packed: jnp.ndarray   # (Ptot,) int32 — og<<16 | tight ga
    steps: tuple = dataclasses.field(metadata=dict(static=True))
    splane: int = dataclasses.field(metadata=dict(static=True))
    nt: int = dataclasses.field(metadata=dict(static=True))

    @property
    def vector_dtype(self):
        return (jnp.float32 if self.values.dtype == jnp.bfloat16
                else self.values.dtype)


_TIER_SPANS = (4, 8, 16)


def _tier_classes(vals, lc, p_og, p_ga, nt: int):
    """Classify planes by actual window width with tight clamped window
    starts (host numpy).  Returns a list over :data:`_TIER_SPANS` of
    ``(values, lc_rebased, og, ga)`` UNPADDED per-class arrays."""
    import numpy as np

    gloc = (lc[:, 0, :] // 128).astype(np.int64)
    nz = np.abs(vals.astype(np.float32)).sum(axis=(1, 2)) > 0  # (P, 128)
    # NB: the sentinel must be int64 BEFORE np.where — NEP-50 would wrap
    # a too-big python int into gloc's dtype (measured: int64 max → -1
    # as int32 → negative gmin → corrupted windows).
    big = np.int64(1) << 40
    gmin = np.where(nz, gloc, big).min(axis=1)
    gmin = np.where(gmin == big, 0, gmin)
    width = np.maximum(np.where(nz, gloc, -1).max(axis=1) - gmin + 1, 1)
    cls = np.select([width <= w for w in _TIER_SPANS],
                    _TIER_SPANS, _TIER_SPANS[-1])
    out = []
    for w in _TIER_SPANS:
        idx = np.flatnonzero(cls == w)
        v = vals[idx]
        l = lc[idx].copy()
        og = p_og[idx].astype(np.int64)
        # Tight window start, CLAMPED so ga + w stays in bounds: the
        # class span w rounds the actual width UP, and near the window
        # end p_ga + gmin + w can exceed nt by up to (w − width) — a
        # dynamic-slice clamp there would silently shift the window.
        # min(·, nt − w) is always safe: p_ga + gmin + width ≤ nt (the
        # builder guarantees p_ga + span ≤ nt and gmin + width ≤ span),
        # so the shifted offsets stay < w.
        ga = np.minimum(p_ga[idx].astype(np.int64) + gmin[idx], nt - w)
        shift = (p_ga[idx].astype(np.int64) + gmin[idx]) - ga  # ≥ 0
        l[:, 0, :] = np.where(
            nz[idx],
            l[:, 0, :] - 128 * (gmin[idx] - shift)[:, None], 0)
        assert len(idx) == 0 or 0 <= (l[:, 0, :] // 128).min() \
            and (l[:, 0, :] // 128).max() < w
        assert len(idx) == 0 or (ga >= 0).all() and (ga + w <= nt).all()
        out.append((v, l, og, ga))
    return out


def _pad_tier_class(v, l, og, ga, n_target: int):
    """Zero-pad one class's arrays to ``n_target`` planes (host)."""
    import numpy as np

    pad = n_target - v.shape[0]
    assert pad >= 0
    if pad:
        v = np.concatenate([v, np.zeros((pad,) + v.shape[1:], v.dtype)])
        l = np.concatenate([l, np.zeros((pad, 1, 128), np.int32)])
        og = np.concatenate([og, np.zeros(pad, np.int64)])
        ga = np.concatenate([ga, np.zeros(pad, np.int64)])
    return v, l, (og.astype(np.int32) << 16) | ga.astype(np.int32)


def build_tier_plan(a: WBELLMatrix,
                    splane: int | None = None) -> WBellTierPlan:
    """Host-side: classify planes by actual window width, re-base each
    plane's window to its own min group, sort class-major, pad each
    class to a ``splane`` multiple.  Requires ``a.span`` ≤ 16 (the
    largest tier)."""
    import numpy as np

    if a.span > _TIER_SPANS[-1]:
        raise ValueError(f"tier plan supports span <= {_TIER_SPANS[-1]}")
    if splane is None:
        splane = 8 if jax.default_backend() != "tpu" else _SPLANE
    classes = _tier_classes(np.asarray(a.values), np.asarray(a.lc),
                            np.asarray(a.p_og), np.asarray(a.p_ga), a.nt)
    out_v, out_l, out_pg, steps = [], [], [], []
    for (v, l, og, ga) in classes:
        n_pad = -(-v.shape[0] // splane) * splane
        v, l, pg = _pad_tier_class(v, l, og, ga, n_pad)
        out_v.append(v)
        out_l.append(l)
        out_pg.append(pg)
        steps.append(n_pad // splane)
    return WBellTierPlan(
        values=jnp.asarray(np.concatenate(out_v)),
        lc=jnp.asarray(np.concatenate(out_l)),
        packed=jnp.asarray(np.concatenate(out_pg)),
        steps=tuple(steps), splane=int(splane), nt=a.nt)


def _kernel_resident_tiers(steps, nrhs: int, splane: int):
    from jax.experimental import pallas as pl

    def tier_body(pg_r, lc_ref, vals_ref, x_ref, o_ref, j, span):
        for s in range(splane):
            p = j * splane + s
            l = lc_ref[s]
            idx = jnp.broadcast_to(l % 128, (8, 128))
            lcg = jnp.broadcast_to(l // 128, (8, 128))
            v = vals_ref[s].astype(o_ref.dtype)
            pg = pg_r[p]
            og = (pg >> 16) & 0xFFFF
            ga = pg & 0xFFFF
            for c in range(nrhs):
                w = x_ref[c, pl.ds(ga, span)]
                g = jnp.zeros((8, 128), o_ref.dtype)
                for t in range(span):
                    cand = jnp.take_along_axis(w[t], idx, axis=1)
                    g = (cand if span == 1
                         else jnp.where(lcg == t, cand, g))
                y = o_ref[c, og]
                for jj in range(8):
                    y = y + v[:, jj, :] * jnp.broadcast_to(
                        g[jj:jj + 1, :], (8, 128))
                o_ref[c, og] = y

    def kernel(pg_r, lc_ref, vals_ref, x_ref, o_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        lo = 0
        for span, n_steps in zip(_TIER_SPANS, steps):
            if n_steps:
                lo_, hi_ = lo, lo + n_steps

                @pl.when((j >= lo_) & (j < hi_))
                def _(span=span):
                    tier_body(pg_r, lc_ref, vals_ref, x_ref, o_ref, j,
                              span)
            lo += n_steps

    return kernel


def wbell_tiered_raw(packed: jnp.ndarray, lc: jnp.ndarray,
                     values: jnp.ndarray, x: jnp.ndarray, *,
                     steps, splane: int, interpret: bool,
                     axis_name: str | None = None) -> jnp.ndarray:
    """The width-tiered resident kernel on raw class-major plane arrays —
    the form :mod:`cgx.dist.wbell` calls inside ``shard_map`` with
    shard-local tier plans (every shard shares the static ``steps``).
    ``x``: ``(nrhs, nt, 8, 128)``; returns the same shape."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nrhs, nt = x.shape[0], x.shape[1]
    xdt = x.dtype
    nsteps = sum(steps)
    assert values.shape[0] == nsteps * splane
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((splane, 1, 128), lambda j, pg: (j, 0, 0)),
            pl.BlockSpec((splane, 8, 8, 128), lambda j, pg: (j, 0, 0, 0)),
            pl.BlockSpec((nrhs, nt, 8, 128), lambda j, pg: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nrhs, nt, 8, 128),
                               lambda j, pg: (0, 0, 0, 0)),
    )
    vec = nrhs * nt * 1024 * jnp.dtype(xdt).itemsize
    stream = 2 * splane * 65 * 128 * values.dtype.itemsize
    params = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(2.2 * vec) + 2 * stream + (8 << 20),
                                 127 << 20)))
    return pl.pallas_call(
        _kernel_resident_tiers(tuple(steps), nrhs, splane),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (nrhs, nt, 8, 128), xdt,
            vma=(frozenset() if axis_name is None
                 else frozenset({axis_name}))),
        interpret=interpret,
        **params,
    )(packed, lc, values, x)


@partial(jax.jit, static_argnames=("interpret",))
def wbell_spmm_tiered(plan: WBellTierPlan, x: jnp.ndarray, *,
                      interpret: bool | None = None) -> jnp.ndarray:
    """``Y = A @ X`` through the width-tiered resident kernel.
    ``x``: batched internal ``(nrhs, nt, 8, 128)``; bit-compatible with
    :func:`wbell_spmm` up to fp32 summation-order rounding."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nt = x.shape[1]
    if x.ndim != 4 or nt != plan.nt or x.shape[2:] != (8, 128):
        raise ValueError(f"tier kernel: expected (nrhs, {plan.nt}, 8, "
                         f"128), got {x.shape}")
    return wbell_tiered_raw(plan.packed, plan.lc, plan.values,
                            x.astype(plan.vector_dtype),
                            steps=plan.steps, splane=plan.splane,
                            interpret=interpret)


def _kernel_resident_stacked(span: int, k: int, splane: int):
    """Resident-x kernel with the k RHS columns STACKED on the sublane
    axis: x/y live as ``(nt, k·8, 128)``.

    **Measured negative result** (PERF_NOTES 5a; kept as the documented
    record): at k=4 / thermal2 scale this measures **0.968 ms/RHS vs
    0.780 for the batched kernel** — the hypothesis ("one chain serves
    every column") is wrong because the TPU gather is per-VREG
    (8 sublanes × 128 lanes): a ``(k·8, 128)`` ``take_along_axis``
    lowers to k vreg-gathers, exactly the work of k separate ``(8,
    128)`` gathers, and the stacking adds concat/slice relayouts on
    top.  Bit-identical to :func:`wbell_spmm` (verified on chip); do
    not route anything here.
    """
    from jax.experimental import pallas as pl

    def kernel(pg_r, lc_ref, vals_ref, x_ref, o_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        for s in range(splane):
            p = j * splane + s
            l = lc_ref[s]                                  # (1, 128)
            idx = jnp.broadcast_to(l % 128, (k * 8, 128))
            lcg = jnp.broadcast_to(l // 128, (k * 8, 128))
            v = vals_ref[s].astype(o_ref.dtype)            # (8, 8, 128)
            pg = pg_r[p]
            og = (pg >> 16) & 0xFFFF
            ga = pg & 0xFFFF
            w = x_ref[pl.ds(ga, span)]             # (span, k*8, 128)
            g = jnp.zeros((k * 8, 128), o_ref.dtype)
            for t in range(span):                  # ONE chain for all k
                cand = jnp.take_along_axis(w[t], idx, axis=1)
                g = (cand if span == 1
                     else jnp.where(lcg == t, cand, g))
            y = o_ref[og]                          # (k*8, 128)
            ys = []
            for c in range(k):
                yc = y[c * 8:(c + 1) * 8]
                gc = g[c * 8:(c + 1) * 8]
                for jj in range(8):
                    yc = yc + v[:, jj, :] * jnp.broadcast_to(
                        gc[jj:jj + 1, :], (8, 128))
                ys.append(yc)
            o_ref[og] = jnp.concatenate(ys, axis=0)

    return kernel


@partial(jax.jit, static_argnames=("interpret", "splane"))
def wbell_spmm_stacked(a: WBELLMatrix, x: jnp.ndarray, *,
                       interpret: bool | None = None,
                       splane: int | None = None) -> jnp.ndarray:
    """``Y = A @ X`` on the STACKED internal layout ``(nt, k·8, 128)``
    (column c of the standard batch occupies sublanes ``c·8..c·8+8``;
    see :func:`to_stacked` / :func:`from_stacked`).  One gather/select
    chain per plane serves all k columns."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nt = a.nt
    if x.ndim != 3 or x.shape[0] != nt or x.shape[1] % 8 or \
            x.shape[2] != 128:
        raise ValueError(f"stacked layout is (nt={nt}, k*8, 128); got "
                         f"{x.shape}")
    k = x.shape[1] // 8
    xdt = a.vector_dtype
    x = x.astype(xdt)
    npl = a.values.shape[0]
    if splane is None:
        splane = 8 if interpret else _SPLANE
    assert npl % splane == 0
    nsteps = npl // splane

    assert nt < (1 << 16)
    packed = (a.p_og.astype(jnp.int32) << 16) | a.p_ga.astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((splane, 1, 128), lambda j, pg: (j, 0, 0)),
            pl.BlockSpec((splane, 8, 8, 128), lambda j, pg: (j, 0, 0, 0)),
            pl.BlockSpec((nt, k * 8, 128), lambda j, pg: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nt, k * 8, 128), lambda j, pg: (0, 0, 0)),
    )
    vec = k * nt * 1024 * jnp.dtype(xdt).itemsize
    stream = 2 * splane * 65 * 128 * a.values.dtype.itemsize
    params = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(2.2 * vec) + 2 * stream + (8 << 20),
                                 127 << 20)))
    return pl.pallas_call(
        _kernel_resident_stacked(a.span, k, splane),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt, k * 8, 128), xdt),
        interpret=interpret,
        **params,
    )(packed, a.lc, a.values, x)


def to_stacked(xb: jnp.ndarray) -> jnp.ndarray:
    """Batched internal ``(k, nt, 8, 128)`` → stacked ``(nt, k·8, 128)``."""
    k, nt = xb.shape[0], xb.shape[1]
    return jnp.moveaxis(xb, 0, 1).reshape(nt, k * 8, 128)


def from_stacked(xs: jnp.ndarray) -> jnp.ndarray:
    """Stacked ``(nt, k·8, 128)`` → batched internal ``(k, nt, 8, 128)``."""
    nt, k8 = xs.shape[0], xs.shape[1]
    return jnp.moveaxis(xs.reshape(nt, k8 // 8, 8, 128), 1, 0)


# Resident-x footprint cap: x + y + the double-buffered plane stream must
# fit comfortably under the ~128 MB v5e VMEM (Mosaic needs headroom).
_RESIDENT_VMEM_CAP = 100 << 20
_SPLANE = 64


def _resident_fits(a: WBELLMatrix, nrhs: int) -> bool:
    vec = nrhs * a.nt * 1024 * jnp.dtype(a.vector_dtype).itemsize
    stream = 2 * _SPLANE * 65 * 128 * a.values.dtype.itemsize
    return 2 * vec + stream <= _RESIDENT_VMEM_CAP


def wbell_resident_raw(p_og: jnp.ndarray, p_ga: jnp.ndarray,
                       lc: jnp.ndarray, values: jnp.ndarray,
                       x: jnp.ndarray, *, span: int,
                       interpret: bool,
                       axis_name: str | None = None,
                       splane: int | None = None) -> jnp.ndarray:
    """The resident-x kernel on raw plane arrays (no :class:`WBELLMatrix`
    wrapper) — the form :mod:`cgx.dist.wbell` calls inside ``shard_map``
    with locally-rebased ``p_og``/``p_ga``.  ``x``: ``(nrhs, nt, 8,
    128)``; returns the same shape."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nrhs, nt = x.shape[0], x.shape[1]
    xdt = x.dtype
    npl = values.shape[0]
    if splane is None:
        # The 64-plane unrolled body is a pure win on hardware but blows
        # up the interpreter (one HLO per unrolled plane, ~8x the memory
        # across a test session) — interpret mode is correctness-only.
        splane = 8 if interpret else _SPLANE
    assert npl % splane == 0, "builder pads planes to a multiple of 64"
    nsteps = npl // splane

    assert nt < (1 << 16), "packed og/ga prefetch caps groups at 65535"
    packed = (p_og.astype(jnp.int32) << 16) | p_ga.astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((splane, 1, 128),
                         lambda j, pg: (j, 0, 0)),
            pl.BlockSpec((splane, 8, 8, 128),
                         lambda j, pg: (j, 0, 0, 0)),
            pl.BlockSpec((nrhs, nt, 8, 128),
                         lambda j, pg: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nrhs, nt, 8, 128),
                               lambda j, pg: (0, 0, 0, 0)),
    )
    vec = nrhs * nt * 1024 * jnp.dtype(xdt).itemsize
    stream = 2 * splane * 65 * 128 * values.dtype.itemsize
    params = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(2.2 * vec) + 2 * stream + (8 << 20),
                                 127 << 20)))
    return pl.pallas_call(
        _kernel_resident(span, nrhs, splane),
        grid_spec=grid_spec,
        # Inside shard_map the inputs/outputs vary per shard; annotate
        # for vma checking (same pattern as fused_engine.py).
        out_shape=jax.ShapeDtypeStruct(
            (nrhs, nt, 8, 128), xdt,
            vma=(frozenset() if axis_name is None
                 else frozenset({axis_name}))),
        interpret=interpret,
        **params,
    )(packed, lc, values, x)


@partial(jax.jit, static_argnames=("interpret",))
def _wbell_call_resident(a: WBELLMatrix, x: jnp.ndarray, *,
                         interpret: bool) -> jnp.ndarray:
    if x.ndim != 4 or x.shape[1:] != (a.nt, 8, 128):
        raise ValueError(f"wbell kernel: expected batched internal layout "
                         f"(nrhs, {a.nt}, 8, 128), got {x.shape}")
    return wbell_resident_raw(a.p_og, a.p_ga, a.lc, a.values,
                              x.astype(a.vector_dtype), span=a.span,
                              interpret=interpret)


def wbell_spmv(a: WBELLMatrix, x: jnp.ndarray, *,
               interpret: bool | None = None,
               backend: str = "auto") -> jnp.ndarray:
    """``y = A @ x`` on internal-layout ``x``: ``(nt, 8, 128) → same``.

    ``interpret=None`` auto-selects the Pallas interpreter off-TPU.
    ``backend``: ``"auto"`` (the resident-x kernel when x + y fit VMEM —
    the fast path), ``"resident"``, or ``"windowed"``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _dispatch(a, x[None], interpret, backend)[0]


def wbell_spmm(a: WBELLMatrix, x: jnp.ndarray, *,
               interpret: bool | None = None,
               backend: str = "auto") -> jnp.ndarray:
    """``Y = A @ X`` on a BATCH of internal-layout columns:
    ``(nrhs, nt, 8, 128) → same``.  The slot-plane stream is shared
    across columns (see the module docstring)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _dispatch(a, x, interpret, backend)


def _dispatch(a: WBELLMatrix, x: jnp.ndarray, interpret: bool,
              backend: str) -> jnp.ndarray:
    if backend == "auto":
        backend = ("resident" if _resident_fits(a, x.shape[0])
                   else "windowed")
    if backend == "resident":
        return _wbell_call_resident(a, x, interpret=interpret)
    if backend == "windowed":
        return _wbell_call(a, x, interpret=interpret)
    raise ValueError(f"unknown wbell backend {backend!r}")


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
