"""Windowed block-ELL (WBELL): the TPU-native unstructured-sparsity format.

This is the general-sparsity engine SURVEY.md §2.1 #4 blueprints (reference
anchor: the CSR SpMV ``mv_mult``, ``mv_ops.c:160-201``) for matrices with no
stencil/DIA structure — SuiteSparse-class FEM/graph matrices.  The XLA
gather+``segment_sum`` path is gather-count-bound on TPU (measured
~130 M gathers/s, locality-independent — BASELINE.md round 2); WBELL removes
per-element gathers from the hot loop entirely:

* **Supervariable blocking** — the matrix is symmetrically RCM-permuted and
  densified into 8×8 blocks (``bs = 8`` = the sublane count).  Irregular
  per-element structure becomes regular per-*block* structure; the fill-in
  (stored zeros) is the price, measured ~11x on Delaunay-class meshes —
  irrelevant next to the ~100x gather wall because the blocks stream at HBM
  speed.
* **Windowed gather** — 128 consecutive block rows form a *tile*.  After
  RCM, every block column a tile touches lies in a contiguous window of
  ``ngw`` 128-block *groups*; the kernel DMAs that window into VMEM once
  per tile (double-buffered, prefetched one tile ahead) and resolves each
  block's x-operand with the TPU's native intra-vreg dynamic lane gather
  (``tpu.dynamic_gather`` via ``jnp.take_along_axis``) plus a static
  ``ngw``-way select tree.  No per-element HBM gathers remain.
* **Internal vector layout** — vectors live as ``(n_groups, 8, 128)``:
  lane = block row within group, sublane = element within block.  A block's
  8 x-values occupy one lane column, so one dynamic lane gather fetches the
  whole block operand.  CG runs entirely in this layout (elementwise ops and
  dots are layout-agnostic); ``to_internal``/``from_internal`` convert at
  the solve boundary only.

Slot planes are packed per tile (each tile stores its own max block count,
not the global max) and fat tiles are split into *virtual tiles* of at most
``wbcap`` slots, so the ELL padding waste is bounded by the per-128-row
local maximum, not the global one.

Host-side construction (this module) is NumPy/SciPy; the kernel lives in
:mod:`cgx.kernels.wbell`.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["WBELLMatrix", "wbell_from_csr", "auto_format", "pick_format",
           "WBELL_MIN_ROWS"]

# Measured WBELL break-even (round 4, commit 55e1291): at 49 k rows the
# resident engine is 155x over the XLA gather path with a 2.0 s host build
# — break-even at ~370 solver iterations, far under what unstructured
# classes need.  This is THE routing threshold: every "auto" surface
# (:func:`auto_format`, :func:`cgx.solve.hp.ir_df64_solve`'s
# ``inner_format="auto"``) derives from it via :func:`pick_format` — do
# not copy the number elsewhere.
WBELL_MIN_ROWS = 30_000


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class WBELLMatrix:
    """Windowed block-ELL matrix (see module docstring for the layout)."""

    # Packed slot planes: plane p holds one 8x8 block per lane (block row).
    values: jnp.ndarray        # (P, 8, 8, 128) fp32 — [i, j, lane] = B[i, j]
    lc: jnp.ndarray            # (P, 1, 128) int32 — window-local block col
    # Per-virtual-tile scalars (prefetched to SMEM by the kernel).
    outg: jnp.ndarray          # (ntv,) int32 — output group this tile adds to
    ps: jnp.ndarray            # (ntv,) int32 — first plane of this tile
    wb: jnp.ndarray            # (ntv,) int32 — number of planes (<= wbcap)
    zi: jnp.ndarray            # (ntv,) int32 — 1 iff first tile of its group
    g0: jnp.ndarray            # (ntv,) int32 — window start group
    gn: jnp.ndarray            # (ntv,) int32 — next group's window start
    # Solve-boundary transforms + Jacobi diagonal (internal layout).
    perm: jnp.ndarray          # (n,) int32 — RCM permutation
    iperm: jnp.ndarray         # (n,) int32 — inverse permutation
    diag_internal: jnp.ndarray  # (nt, 8, 128) fp32
    pgo: jnp.ndarray           # (P,) int32 — per-plane window group offset
    # Per-plane scalars for the resident-x kernel (plane-major grid, no
    # window DMA): output group and ABSOLUTE window-start group.
    p_og: jnp.ndarray          # (P,) int32
    p_ga: jnp.ndarray          # (P,) int32
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    ng_real: int = dataclasses.field(metadata=dict(static=True))
    nt: int = dataclasses.field(metadata=dict(static=True))  # groups + pad
    ngw: int = dataclasses.field(metadata=dict(static=True))
    wbcap: int = dataclasses.field(metadata=dict(static=True))
    span: int = dataclasses.field(default=1, metadata=dict(static=True))
    nnz: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def dtype(self):
        return self.values.dtype

    @property
    def vector_dtype(self):
        """Dtype vectors/accumulators use: fp32 when the slot planes are
        stored narrow (bf16), else the value dtype."""
        return (jnp.float32 if self.values.dtype == jnp.bfloat16
                else self.values.dtype)

    @property
    def n(self) -> int:
        return self.shape[0]

    @property
    def nnz_stored(self) -> int:
        """Stored (densified) values — fill included."""
        return int(self.values.shape[0]) * 64 * 128

    def diagonal(self) -> jnp.ndarray:
        """Matrix diagonal in the INTERNAL layout (for Jacobi PCG)."""
        return self.diag_internal

    # -- solve-boundary layout transforms ------------------------------

    def to_internal(self, v: jnp.ndarray) -> jnp.ndarray:
        """(n,) standard-order vector → (nt, 8, 128) internal layout."""
        vp = jnp.asarray(v, self.vector_dtype)[self.perm]
        vp = jnp.pad(vp, (0, self.ng_real * 1024 - self.n))
        vi = vp.reshape(self.ng_real, 128, 8).transpose(0, 2, 1)
        return jnp.pad(vi, ((0, self.nt - self.ng_real), (0, 0), (0, 0)))

    def from_internal(self, vi: jnp.ndarray) -> jnp.ndarray:
        """(nt, 8, 128) internal layout → (n,) standard order."""
        v = vi[:self.ng_real].transpose(0, 2, 1).reshape(-1)[:self.n]
        return v[self.iperm]


def _rcm(a_csr):
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    return np.asarray(reverse_cuthill_mckee(a_csr, symmetric_mode=True),
                      dtype=np.int64)


def _balance_blocks(a, perm: np.ndarray, window: int) -> np.ndarray:
    """Refine ``perm`` with a within-window stable sort of BLOCK-ROWS
    (8-row units) by block count.

    The slot planes are ELL-packed per (tile, bucket): a 128-lane group
    pays the MAX block count over its lanes, so count-heterogeneous
    groups waste planes — measured 1.65-1.8x over the raw block fill on
    the thermal2 class (PERF_NOTES 4e).  Sorting whole 8-row chunks
    keeps the block structure intact (a symmetric block-level permutation
    maps blocks 1:1) and the window bound keeps RCM's column locality,
    so only the group COMPOSITION changes: groups become count-
    homogeneous and the per-group max approaches the mean.  Measured:
    fill 20.7 → 17.5x at window=1024 block rows on thermal2 (larger
    windows scatter columns across buckets and LOSE — 25.8x at 4096).
    """
    n = a.shape[0]
    ap = a[perm][:, perm].tocoo()
    br = ap.row.astype(np.int64) >> 3
    bc = ap.col.astype(np.int64) >> 3
    nbr = -(-n // 8)
    uid = np.unique(br * nbr + bc)
    cnt = np.bincount(uid // nbr, minlength=nbr)
    sigma = np.empty(nbr, np.int64)
    for w0 in range(0, nbr, window):
        w1 = min(w0 + window, nbr)
        idx = np.arange(w0, w1)
        sigma[w0:w1] = idx[np.argsort(cnt[w0:w1], kind="stable")]
    rp = (sigma[:, None] * 8 + np.arange(8)[None, :]).reshape(-1)
    rp = rp[rp < n]
    return perm[rp]


def _best_wbcap(wbt: np.ndarray, wb_hard_max: int) -> int:
    """Pick the slot cap minimizing grid work ``ntv(w) * w``."""
    best, best_cost = int(wbt.max()), None
    for w in range(2, int(wbt.max()) + 1):
        cost = int(np.ceil(wbt / w).sum()) * w
        if best_cost is None or cost < best_cost:
            best, best_cost = w, cost
    return min(best, wb_hard_max)


def wbell_from_csr(a, *, order: str = "rcm", max_ngw: int = 128,
                   wbcap: int = 0, value_dtype=None,
                   span: int = 16,
                   balance_window: int = 1024) -> WBELLMatrix:
    """Build a :class:`WBELLMatrix` from a CSR matrix (host-side).

    Args:
      a: :class:`cgx.sparse.types.CSRMatrix` or a ``scipy.sparse`` matrix.
      order: ``"rcm"`` (default — required for bounded windows on mesh-like
        matrices) or ``"natural"``.
      max_ngw: reject matrices whose tile windows exceed this many 128-block
        groups (the caller should fall back to the XLA CSR path).
      wbcap: virtual-tile slot cap; 0 = auto (minimizes grid work).
      span: window groups a single slot plane may draw x-operands from
        (the kernel's per-plane gather count).  Larger spans REDUCE fill
        (coarser buckets split fewer planes) at the cost of a longer
        per-plane gather/select chain.  Both kernels are plane-count-
        bound, not chain-bound (PERF_NOTES round 4: the resident kernel
        is stream-bound at ~435 GB/s effective; the windowed one is
        latency-bound at ~305 ns/plane), so bigger is better until the
        VPU chain finally bites: measured on the thermal2 class,
        ms/SpMV = 2.36 (span 2, fill 29.8x) → 1.97 (4) → 1.75 (8) →
        **1.67 (16, fill 20.7x)** → 1.91 (32, chain-bound).  16 is the
        measured optimum and the default.
      balance_window: block-row window for the count-balancing
        refinement of the ordering (:func:`_balance_blocks` — measured
        fill 20.7 → 17.5x on the thermal2 class); 0 disables.
      value_dtype: slot-plane storage dtype (default fp32).  ``bfloat16``
        halves the stored bytes; the kernel upcasts blocks in-register
        and accumulates in the x dtype.  **Measured negative result**
        (BASELINE round 3): no speedup at thermal2 scale (1.03x — the
        kernel is gather/select-chain-bound, not value-stream-bound) AND
        the bf16-rounded operator can lose SPD-ness on ill-conditioned
        classes (κ ≳ 1e6: CG diverges).  Kept for benign operators;
        nothing auto-routes here.  The Jacobi diagonal stays fp32.

    Raises:
      ValueError: window exceeds ``max_ngw`` — no bounded-window tiling
        exists for this matrix/ordering (caller falls back to XLA CSR).
    """
    import scipy.sparse as sp

    if hasattr(a, "indptr") and hasattr(a, "row_indices"):  # CSRMatrix
        a = sp.csr_matrix((np.asarray(a.values, np.float64),
                           np.asarray(a.col_indices),
                           np.asarray(a.indptr)), shape=a.shape)
    a = sp.csr_matrix(a)
    n = a.shape[0]
    if a.shape[0] != a.shape[1]:
        raise ValueError("wbell_from_csr needs a square matrix")

    perm = _rcm(a) if order == "rcm" else np.arange(n, dtype=np.int64)
    if balance_window:
        perm = _balance_blocks(a, perm, int(balance_window))
    ap = a[perm][:, perm].tocsr()
    ap.sort_indices()
    coo = ap.tocoo()
    row = coo.row.astype(np.int64)
    col = coo.col.astype(np.int64)
    val = coo.data.astype(np.float32)

    nbr = -(-n // 8)                  # block rows
    ng_real = -(-nbr // 128)          # real groups (= real output tiles)

    # -- unique 8x8 blocks, ordered (block row, block col) ---------------
    br, bc = row >> 3, col >> 3
    key = br * nbr + bc               # nbr >= max(bc)+1 since square
    uid, inv = np.unique(key, return_inverse=True)
    ub_r, ub_c = uid // nbr, uid % nbr
    nblocks = len(uid)

    tile_of_block = ub_r >> 7

    # -- bucketed plane packing (span-bounded operand resolution) --------
    # Measured (PERF_NOTES 3e): the kernel is bound by the per-plane
    # ngw-way dynamic-gather + select chain, NOT the value stream.  So
    # planes are packed per (tile, BUCKET of `span` window groups): every
    # plane's 128 blocks draw x from ≤ `span` groups, and the kernel
    # resolves operands with `span` gathers instead of ngw (19 on the
    # thermal2 class).  Blocks arrive sorted by (row, col), so runs per
    # (row, bucket) are contiguous — the sub-rank is vectorized.
    bucket = (ub_c >> 7) // span
    chg = np.empty(nblocks, bool)
    if nblocks:
        chg[0] = True
        chg[1:] = (ub_r[1:] != ub_r[:-1]) | (bucket[1:] != bucket[:-1])
    grp_start = np.flatnonzero(chg)
    grp_id = np.cumsum(chg) - 1
    rank_rb = np.arange(nblocks, dtype=np.int64) - grp_start[grp_id]

    NB = int(bucket.max()) + 1 if nblocks else 1
    tb_key = tile_of_block * NB + bucket
    tb_uid, tb_inv = np.unique(tb_key, return_inverse=True)
    tb_tile = tb_uid // NB
    wbt_tb = np.zeros(len(tb_uid), np.int64)
    np.maximum.at(wbt_tb, tb_inv, rank_rb + 1)
    pstart_tb = np.concatenate([[0], np.cumsum(wbt_tb[:-1])])

    # Per-tile slot totals (empty tiles keep one zero-plane slot) and the
    # tile-major plane layout; a tb's planes sit at its tile-local offset.
    wbt = np.zeros(ng_real, np.int64)
    np.add.at(wbt, tb_tile, wbt_tb)
    wbt = np.maximum(wbt, 1)
    pstart = np.concatenate([[0], np.cumsum(wbt[:-1])])
    p_real = int(wbt.sum())
    tile_tb0 = np.full(ng_real, np.int64(2) ** 62)
    np.minimum.at(tile_tb0, tb_tile, pstart_tb)
    offset_tb = pstart_tb - tile_tb0[tb_tile]     # tile-local plane offset
    plane = (pstart[tile_of_block] + offset_tb[tb_inv]
             + rank_rb)                           # per block

    # -- windows (span-aligned starts so bucket offsets stay in range) ----
    g0t = np.full(ng_real, 2**31, np.int64)
    gmax = np.zeros(ng_real, np.int64)
    np.minimum.at(g0t, tile_of_block, ub_c >> 7)
    np.maximum.at(gmax, tile_of_block, ub_c >> 7)
    g0t = np.where(g0t == 2**31, 0, g0t)
    g0t = (g0t // span) * span
    end_al = -(-(gmax + 1) // span) * span
    ngw = max(int((end_al - g0t).max()), span)
    if ngw > max_ngw:
        raise ValueError(
            f"WBELL window needs {ngw} groups > max_ngw={max_ngw}; "
            "this matrix/ordering has no bounded-window tiling")
    nt = ng_real + ngw                # pad groups keep windows in bounds
    g0t = np.minimum(g0t, nt - ngw)

    # -- pack slot planes -------------------------------------------------
    lane = ub_r & 127
    values = np.zeros((p_real + 1, 8, 8, 128), np.float32)  # +1 zero plane
    lcp = np.zeros((p_real + 1, 1, 128), np.int32)
    np.add.at(values, (plane[inv], row & 7, col & 7, lane[inv]), val)
    # lane-local column + 128·(group − bucket·span): the within-plane
    # group index is < span by construction.
    lcp[plane, 0, lane] = ((ub_c & 127)
                           + 128 * ((ub_c >> 7)
                                    - bucket * span)).astype(np.int32)
    # Per-plane window offset of the plane's bucket (scalar-prefetched);
    # phantom slots (empty tiles / never-written planes) stay at 0.
    pgo = np.zeros(p_real + 1, np.int64)          # +1: the zero plane
    tb_planes = (pstart[tb_tile] + offset_tb)      # first plane per tb
    plane_idx = np.repeat(tb_planes, wbt_tb) + (
        np.arange(int(wbt_tb.sum()), dtype=np.int64)
        - np.repeat(pstart_tb, wbt_tb))
    pgo[plane_idx] = np.repeat((tb_uid % NB) * span - g0t[tb_tile],
                               wbt_tb)
    assert pgo.min() >= 0 and pgo.max() + span <= ngw

    # -- per-plane scalars for the resident-x kernel ----------------------
    # Plane-major grid: each plane carries its output group and ABSOLUTE
    # window-start group; planes (incl. the zero plane and the pad below)
    # are padded to a multiple of 8 so the kernel can stream 8-plane
    # blocks (amortizing the measured ~305 ns/grid-step pipeline latency
    # — PERF_NOTES round 4).
    p_og = np.zeros(p_real + 1, np.int64)
    p_og[:p_real] = np.repeat(np.arange(ng_real, dtype=np.int64), wbt)
    p_ga = np.zeros(p_real + 1, np.int64)
    p_ga[plane_idx] = np.repeat((tb_uid % NB) * span, wbt_tb)
    assert p_ga.max() + span <= nt
    pad_p = (-(p_real + 1)) % 64     # multiple of the 8..64-plane steps
    if pad_p:
        values = np.concatenate(
            [values, np.zeros((pad_p, 8, 8, 128), np.float32)])
        lcp = np.concatenate([lcp, np.zeros((pad_p, 1, 128), np.int32)])
        pgo = np.concatenate([pgo, np.zeros(pad_p, np.int64)])
        p_og = np.concatenate([p_og, np.zeros(pad_p, np.int64)])
        p_ga = np.concatenate([p_ga, np.zeros(pad_p, np.int64)])

    # -- virtual tiles ------------------------------------------------------
    if wbcap <= 0:
        wbcap = _best_wbcap(wbt, wb_hard_max=64)
    nv = -(-wbt // wbcap)                          # splits per real tile
    outg = np.repeat(np.arange(ng_real, dtype=np.int64), nv)
    vidx = np.arange(len(outg)) - np.repeat(
        np.concatenate([[0], np.cumsum(nv[:-1])]), nv)
    ps_v = pstart[outg] + vidx * wbcap
    wb_v = np.minimum(wbcap, wbt[outg] - vidx * wbcap)
    zi_v = (vidx == 0).astype(np.int64)
    g0_v = g0t[outg]
    # Window-start chain: group g's first tile starts group g+1's window.
    g0_full = np.concatenate([g0t, np.zeros(ngw, np.int64)])  # pad groups
    gn_v = np.where(outg + 1 < nt, g0_full[np.minimum(outg + 1, nt - 1)], -1)

    # Pad groups: one virtual tile each, pointing at the zero plane.
    pg = np.arange(ng_real, nt, dtype=np.int64)
    outg = np.concatenate([outg, pg])
    ps_v = np.concatenate([ps_v, np.full(ngw, p_real)])
    wb_v = np.concatenate([wb_v, np.ones(ngw, np.int64)])
    zi_v = np.concatenate([zi_v, np.ones(ngw, np.int64)])
    g0_v = np.concatenate([g0_v, np.zeros(ngw, np.int64)])
    gn_v = np.concatenate([gn_v, np.where(pg + 1 < nt, 0, -1)])

    # -- diagonal + transforms ---------------------------------------------
    diag = np.zeros(nt * 1024, np.float32)
    dp = ap.diagonal().astype(np.float32)
    # internal index of permuted row r = 1024*g + 128*e + l, r = 8b+e,
    # b = 128g+l  →  idx = 1024*(b>>7) + 128*(r&7) + (b&127)
    r_all = np.arange(n, dtype=np.int64)
    b_all = r_all >> 3
    internal_idx = ((b_all >> 7) << 10) + ((r_all & 7) << 7) + (b_all & 127)
    diag[internal_idx] = dp
    iperm = np.empty(n, np.int64)
    iperm[perm] = np.arange(n)

    f32 = jnp.float32
    vdt = f32 if value_dtype is None else jnp.dtype(value_dtype)
    return WBELLMatrix(
        values=jnp.asarray(values, vdt),
        lc=jnp.asarray(lcp, jnp.int32),
        outg=jnp.asarray(outg, jnp.int32),
        ps=jnp.asarray(ps_v, jnp.int32),
        wb=jnp.asarray(wb_v, jnp.int32),
        zi=jnp.asarray(zi_v, jnp.int32),
        g0=jnp.asarray(g0_v, jnp.int32),
        gn=jnp.asarray(gn_v, jnp.int32),
        perm=jnp.asarray(perm, jnp.int32),
        iperm=jnp.asarray(iperm, jnp.int32),
        diag_internal=jnp.asarray(diag.reshape(nt, 8, 128)),
        pgo=jnp.asarray(pgo, jnp.int32),
        p_og=jnp.asarray(p_og, jnp.int32),
        p_ga=jnp.asarray(p_ga, jnp.int32),
        shape=(n, n),
        ng_real=int(ng_real),
        nt=int(nt),
        ngw=int(ngw),
        wbcap=int(wbcap),
        span=int(span),
        nnz=int(a.nnz),
    )


def pick_format(a, *, min_rows_wbell: int = WBELL_MIN_ROWS,
                ell_waste_max: float = 1.5, backend: str | None = None,
                allow_wbell: bool = True) -> str:
    """The measured storage DECISION for a general CSR operator — no
    operator build.  Shared by :func:`auto_format` and
    :func:`cgx.solve.hp.ir_df64_solve`'s ``inner_format="auto"`` so the
    two "auto" surfaces cannot drift (VERDICT r4 weak #1).

    ``a`` needs only ``.indptr`` / ``.shape`` / ``.nnz`` (cgx CSRMatrix or
    scipy).  ``backend`` defaults to ``jax.default_backend()``; pass
    ``"tpu"`` to test the threshold logic off-hardware.  Returns ``"ell"``,
    ``"wbell"`` (subject to a bounded-window tiling existing — callers
    must fall back via ``allow_wbell=False`` on build failure), or
    ``"csr"``.
    """
    import jax

    deg = np.diff(np.asarray(a.indptr))
    w = -(-int(deg.max()) // 8) * 8
    waste = float(w * a.shape[0]) / max(int(np.asarray(a.nnz)), 1)
    if waste <= ell_waste_max:
        return "ell"
    if backend is None:
        backend = jax.default_backend()
    if allow_wbell and a.shape[0] >= min_rows_wbell and backend == "tpu":
        return "wbell"
    return "csr"


def auto_format(a, *, min_rows_wbell: int = WBELL_MIN_ROWS,
                ell_waste_max: float = 1.5, value_dtype=None):
    """Pick the measured-best storage for a general CSR operator on TPU.

    The decision surface (BASELINE rounds 2-3): unstructured SpMV through
    XLA's gather+``segment_sum`` is gather-count-bound (~130 M gathers/s,
    locality-independent), so

    * near-uniform row degrees → **ELL** when the 8-padded width wastes
      ≤ ``ell_waste_max`` gathers/nnz (static-shape gathers, no segment
      reduce);
    * irregular matrices on TPU → **WBELL** (the resident-x Pallas
      engine: ~150x over the gather path at thermal2 scale; round-4
      threshold measurement: 155x at 49 k rows with a 2.0 s build —
      break-even at ~370 solver iterations, far under what this matrix
      class needs) when a bounded-window tiling exists — the host-side
      build (RCM + balance sort + supervariable blocking, ~13 s at 1 M
      rows) amortizes over the solve, and
      :func:`cgx.io.native_format.save_matrix` persists it across
      processes;
    * otherwise (small, or no bounded window) → the CSR input unchanged.

    Returns ``(operator, fmt)`` with ``fmt`` in ``{"ell", "wbell",
    "csr"}``.  Callers pass the returned operator straight to
    :func:`cgx.solve.auto.auto_solve`.  The decision itself lives in
    :func:`pick_format` (one surface for every "auto" entry point).
    """
    from cgx.sparse.types import ell_from_csr

    fmt = pick_format(a, min_rows_wbell=min_rows_wbell,
                      ell_waste_max=ell_waste_max)
    if fmt == "ell":
        return ell_from_csr(a, width_multiple=8), "ell"
    if fmt == "wbell":
        try:
            return wbell_from_csr(a, value_dtype=value_dtype), "wbell"
        except ValueError:
            pass          # no bounded-window tiling for this matrix
    return a, "csr"
