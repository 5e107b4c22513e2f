"""Row-partitioned WBELL: the unstructured-sparsity engine under ``shard_map``.

VERDICT r3 #3 / reference anchor ``Makefile:26-27`` (the mpiexec-scale
ambition — the reference's intended deployment was a 100-process cluster run
of the general-CSR solve) + north-star config 5.  Round 3 left the
distributed general-sparsity path at the XLA gather wall
(``partition_csr(mode="allgather")``); this module row-partitions the WBELL
engine itself so a multi-chip unstructured solve runs each shard at engine
speed:

* **Partition unit = output group** (128 supervariable block rows = 1024
  matrix rows in the RCM ordering).  Shard *d* owns a contiguous slab of
  ``gs`` groups plus the slot planes that accumulate into them.
* **Vectors** stay in WBELL's internal ``(groups, 8, 128)`` layout, sharded
  along the group axis (``P("rows")``) — the iterate is never replicated
  (SURVEY §2.2 SP row).
* **Halo = window overlap.**  After RCM every plane draws x from a bounded
  window, so shard boundaries need only ``halo_lo``/``halo_hi`` GROUP slabs
  from the neighbors — exchanged with the same O(halo) ring-``ppermute``
  machinery as the stencil path (:func:`cgx.dist.halo.halo_exchange` on the
  group axis; no full-vector ``all_gather`` anywhere).
* **Local SpMV** is the single-device resident-x kernel
  (:func:`cgx.kernels.wbell.wbell_resident_raw`) on the halo-extended local
  slab, with per-plane output-group/window offsets rebased to shard-local
  coordinates at partition time.
* **Dots** are ``psum``s; Jacobi / supervariable block-Jacobi / polynomial
  preconditioners apply shard-locally in the internal layout (zero
  cross-chip traffic beyond the matvec they may contain).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from cgx.solve.cg import CGResult, cg_solve

AXIS = "rows"

__all__ = ["WBellPartition", "partition_wbell", "dist_wbell_cg_solve",
           "dist_wbell_cg_solve_internal", "dist_wbell_cg_solve_multi",
           "WBellPartTiers", "partition_tier_plans"]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class WBellPartition:
    """Row(-group)-partitioned WBELL operator, stacked on a shard axis.

    Array leaves with a leading ``n_shards`` axis shard ``P("rows", ...)``;
    ``diag_internal`` and the boundary transforms follow the VECTOR layout
    (leading axis = global group index, sharded the same way for the diag,
    replicated host-side use for perm/iperm).
    """

    # Stacked per-shard plane arrays (leading axis = shard).
    values: jnp.ndarray        # (nd, Pmax, 8, 8, 128)
    lc: jnp.ndarray            # (nd, Pmax, 1, 128) int32
    p_og: jnp.ndarray          # (nd, Pmax) int32 — LOCAL output group
    p_ga: jnp.ndarray          # (nd, Pmax) int32 — LOCAL window start
    # Vector-layout leaves.
    diag_internal: jnp.ndarray  # (nd*gs, 8, 128)
    perm: jnp.ndarray          # (n,) int32 — global RCM permutation
    iperm: jnp.ndarray         # (n,) int32
    # Static geometry.
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    n_shards: int = dataclasses.field(metadata=dict(static=True))
    gs: int = dataclasses.field(metadata=dict(static=True))  # groups/shard
    ng_real: int = dataclasses.field(metadata=dict(static=True))
    halo_lo: int = dataclasses.field(metadata=dict(static=True))
    halo_hi: int = dataclasses.field(metadata=dict(static=True))
    nt_local: int = dataclasses.field(metadata=dict(static=True))
    span: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def n(self) -> int:
        return self.shape[0]

    # -- solve-boundary layout transforms (host/eager — outside shard_map) --

    def to_internal(self, v: jnp.ndarray) -> jnp.ndarray:
        """(n,) standard order → (nd*gs, 8, 128) group-sharded layout."""
        vp = jnp.asarray(v)[self.perm]
        vp = jnp.pad(vp, (0, self.ng_real * 1024 - self.n))
        vi = vp.reshape(self.ng_real, 128, 8).transpose(0, 2, 1)
        return jnp.pad(vi, ((0, self.n_shards * self.gs - self.ng_real),
                            (0, 0), (0, 0)))

    def from_internal(self, vi: jnp.ndarray) -> jnp.ndarray:
        v = vi[:self.ng_real].transpose(0, 2, 1).reshape(-1)[:self.n]
        return v[self.iperm]


def _pack_slab_planes(row, col, val, tile_lo: int, tile_hi: int,
                      nbr: int, span: int):
    """Pack the slot planes for output tiles ``[tile_lo, tile_hi)`` from
    GLOBAL permuted entry coordinates — the per-shard half of
    :func:`cgx.sparse.wbell.wbell_from_csr`'s bucketed packing (same
    (tile, bucket)-major plane order, same span-bucket window math), with
    only this slab's entries ever in memory.

    Returns ``(values (P,8,8,128), lc (P,1,128), p_og (P,) GLOBAL output
    group, p_ga (P,) GLOBAL window-start group)``; empty tiles contribute
    no planes (the stacked partition pads with zero planes anyway).
    """
    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    val = np.asarray(val, np.float32)
    if len(row) == 0:
        return (np.zeros((0, 8, 8, 128), np.float32),
                np.zeros((0, 1, 128), np.int32),
                np.zeros(0, np.int64), np.zeros(0, np.int64))

    br, bc = row >> 3, col >> 3
    key = br * nbr + bc
    uid, inv = np.unique(key, return_inverse=True)
    ub_r, ub_c = uid // nbr, uid % nbr
    nblocks = len(uid)
    tile_of_block = ub_r >> 7                      # GLOBAL tile index
    assert tile_of_block.min() >= tile_lo and tile_of_block.max() < tile_hi

    bucket = (ub_c >> 7) // span
    chg = np.empty(nblocks, bool)
    chg[0] = True
    chg[1:] = (ub_r[1:] != ub_r[:-1]) | (bucket[1:] != bucket[:-1])
    grp_start = np.flatnonzero(chg)
    grp_id = np.cumsum(chg) - 1
    rank_rb = np.arange(nblocks, dtype=np.int64) - grp_start[grp_id]

    NB = int(bucket.max()) + 1
    tb_key = tile_of_block * NB + bucket
    tb_uid, tb_inv = np.unique(tb_key, return_inverse=True)
    tb_tile = tb_uid // NB
    wbt_tb = np.zeros(len(tb_uid), np.int64)
    np.maximum.at(wbt_tb, tb_inv, rank_rb + 1)
    pstart_tb = np.concatenate([[0], np.cumsum(wbt_tb[:-1])])
    p_real = int(wbt_tb.sum())

    # Plane index per block: the tb's plane run sits at pstart_tb (tb's
    # are already (tile, bucket)-sorted = tile-major like the global
    # build, minus empty-tile phantom slots).
    plane = pstart_tb[tb_inv] + rank_rb

    lane = ub_r & 127
    values = np.zeros((p_real, 8, 8, 128), np.float32)
    lcp = np.zeros((p_real, 1, 128), np.int32)
    np.add.at(values, (plane[inv], row & 7, col & 7, lane[inv]), val)
    lcp[plane, 0, lane] = ((ub_c & 127)
                           + 128 * ((ub_c >> 7)
                                    - bucket * span)).astype(np.int32)

    p_og = np.repeat(tb_tile, wbt_tb)
    p_ga = np.repeat((tb_uid % NB) * span, wbt_tb)
    return values, lcp, p_og, p_ga


def partition_wbell(a, n_shards: int, *, span: int = 16,
                    order: str = "rcm",
                    per_shard: bool = False) -> WBellPartition:
    """Build the row(-group)-partitioned WBELL operator.

    ``per_shard=False`` (default): build the global WBELL
    (:func:`cgx.sparse.wbell.wbell_from_csr` — one global RCM so every
    shard shares the vector layout), then split its planes by output
    group into ``n_shards`` contiguous slabs with locally-rebased
    coordinates.

    ``per_shard=True`` (VERDICT r4 next #9): compute only the global
    ORDERING pass (RCM + balance sort — O(nnz)), then pack each shard's
    slot planes independently from its CSR row slab
    (:func:`_pack_slab_planes`) — the global densified plane array
    (fill ~17x the nnz) is never materialized, so per-shard peak build
    memory is ~1/n_shards of the global build.  This is the build path
    a real multi-host launch runs per host (each host packs its own
    slab; the two global halo ints would be a tiny allreduce).
    Trajectory-identical to the global build (same ordering, same
    bucketed packing — planes differ only by the absence of zero
    phantom slots).
    """
    if per_shard:
        return _partition_wbell_per_shard(a, n_shards, span=span,
                                          order=order)
    from cgx.sparse.wbell import wbell_from_csr

    wb = wbell_from_csr(a, span=span, order=order)
    nd = int(n_shards)
    ngr = wb.ng_real
    gs = -(-ngr // nd)

    p_og = np.asarray(wb.p_og, np.int64)
    p_ga = np.asarray(wb.p_ga, np.int64)
    vals = np.asarray(wb.values)
    lc = np.asarray(wb.lc)

    # Every plane (including the global build's zero/pad planes, which
    # carry og=0 and zero values) is assigned by its output group; all-
    # zero planes land on shard 0 and contribute nothing.
    owner = np.minimum(p_og // gs, nd - 1)

    # Shard halo extents in GROUP units, from the planes each shard owns.
    halo_lo = 0
    halo_hi = 0
    for d in range(nd):
        sel = owner == d
        if not sel.any():
            continue
        lo = int(p_ga[sel].min())
        hi = int((p_ga[sel] + wb.span).max())
        halo_lo = max(halo_lo, d * gs - lo)
        halo_hi = max(halo_hi, hi - (d + 1) * gs)
    halo_lo = max(halo_lo, 0)
    halo_hi = max(halo_hi, 0)
    nt_local = halo_lo + gs + halo_hi
    # Any plane's local window must satisfy ga_local + span <= nt_local
    # even for degenerate tiny shards.
    nt_local = max(nt_local, wb.span)

    counts = np.bincount(owner, minlength=nd)
    pmax = int(counts.max())
    pmax = -(-max(pmax, 1) // 64) * 64        # splane-block padding (8..64)

    sv = np.zeros((nd, pmax, 8, 8, 128), vals.dtype)
    slc = np.zeros((nd, pmax, 1, 128), lc.dtype)
    sog = np.full((nd, pmax), halo_lo, np.int32)   # pad: own slab, zero add
    sga = np.zeros((nd, pmax), np.int32)
    for d in range(nd):
        sel = np.flatnonzero(owner == d)
        k = len(sel)
        sv[d, :k] = vals[sel]
        slc[d, :k] = lc[sel]
        sog[d, :k] = (p_og[sel] - d * gs + halo_lo).astype(np.int32)
        sga[d, :k] = (p_ga[sel] - d * gs + halo_lo).astype(np.int32)
    assert sga.min() >= 0 and sga.max() + wb.span <= nt_local
    assert sog.min() >= halo_lo and sog.max() < halo_lo + gs

    diag = np.asarray(wb.diag_internal)[:ngr]
    diag = np.pad(diag, ((0, nd * gs - ngr), (0, 0), (0, 0)))

    return WBellPartition(
        values=jnp.asarray(sv), lc=jnp.asarray(slc),
        p_og=jnp.asarray(sog), p_ga=jnp.asarray(sga),
        diag_internal=jnp.asarray(diag),
        perm=wb.perm, iperm=wb.iperm,
        shape=wb.shape, n_shards=nd, gs=gs, ng_real=ngr,
        halo_lo=halo_lo, halo_hi=halo_hi, nt_local=int(nt_local),
        span=wb.span, nnz=wb.nnz)


def _partition_wbell_per_shard(a, n_shards: int, *, span: int,
                               order: str) -> WBellPartition:
    """The per-shard build path (see :func:`partition_wbell`)."""
    import scipy.sparse as sp

    from cgx.sparse.wbell import _balance_blocks, _rcm

    if hasattr(a, "indptr") and hasattr(a, "col_indices"):
        a = sp.csr_matrix((np.asarray(a.values, np.float64),
                           np.asarray(a.col_indices),
                           np.asarray(a.indptr)), shape=a.shape)
    a = sp.csr_matrix(a)
    n = a.shape[0]
    if a.shape[0] != a.shape[1]:
        raise ValueError("partition_wbell needs a square matrix")

    # Global ORDERING pass only — O(nnz), no plane array.
    perm = _rcm(a) if order == "rcm" else np.arange(n, dtype=np.int64)
    perm = _balance_blocks(a, perm, 1024)
    ap = a[perm][:, perm].tocsr()
    ap.sort_indices()

    nbr = -(-n // 8)
    ng_real = -(-nbr // 128)
    nd = int(n_shards)
    gs = -(-ng_real // nd)

    shards = []
    for d in range(nd):
        r0, r1 = d * gs * 1024, min((d + 1) * gs * 1024, n)
        if r0 >= n:
            shards.append((np.zeros((0, 8, 8, 128), np.float32),
                           np.zeros((0, 1, 128), np.int32),
                           np.zeros(0, np.int64), np.zeros(0, np.int64)))
            continue
        sub = ap[r0:r1].tocoo()         # one slab's entries in memory
        shards.append(_pack_slab_planes(
            sub.row.astype(np.int64) + r0, sub.col, sub.data,
            d * gs, min((d + 1) * gs, ng_real), nbr, span))

    # Shard halo extents in GROUP units (a real multi-host launch would
    # allreduce these two ints).
    halo_lo = halo_hi = 0
    for d, (_, _, og, ga) in enumerate(shards):
        if len(og) == 0:
            continue
        halo_lo = max(halo_lo, d * gs - int(ga.min()))
        halo_hi = max(halo_hi, int((ga + span).max()) - (d + 1) * gs)
    halo_lo, halo_hi = max(halo_lo, 0), max(halo_hi, 0)
    nt_local = max(halo_lo + gs + halo_hi, span)

    pmax = max(max((s[0].shape[0] for s in shards), default=1), 1)
    pmax = -(-pmax // 64) * 64

    sv = np.zeros((nd, pmax, 8, 8, 128), np.float32)
    slc = np.zeros((nd, pmax, 1, 128), np.int32)
    sog = np.full((nd, pmax), halo_lo, np.int32)   # pad: own slab, zero add
    sga = np.zeros((nd, pmax), np.int32)
    for d, (vals, lc, og, ga) in enumerate(shards):
        k = vals.shape[0]
        sv[d, :k] = vals
        slc[d, :k] = lc
        sog[d, :k] = (og - d * gs + halo_lo).astype(np.int32)
        sga[d, :k] = (ga - d * gs + halo_lo).astype(np.int32)
    assert sga.min() >= 0 and sga.max() + span <= nt_local
    assert sog.min() >= halo_lo and sog.max() < halo_lo + gs

    # Diagonal in the group-sharded vector layout (same index map as
    # wbell_from_csr: permuted row r=8b+e, block b=128g+l →
    # internal 1024g + 128e + l).
    diag = np.zeros(nd * gs * 1024, np.float32)
    dp = ap.diagonal().astype(np.float32)
    r_all = np.arange(n, dtype=np.int64)
    b_all = r_all >> 3
    internal_idx = ((b_all >> 7) << 10) + ((r_all & 7) << 7) + (b_all & 127)
    diag[internal_idx] = dp
    iperm = np.empty(n, np.int64)
    iperm[perm] = np.arange(n)

    return WBellPartition(
        values=jnp.asarray(sv), lc=jnp.asarray(slc),
        p_og=jnp.asarray(sog), p_ga=jnp.asarray(sga),
        diag_internal=jnp.asarray(diag.reshape(nd * gs, 8, 128)),
        perm=jnp.asarray(perm, jnp.int32),
        iperm=jnp.asarray(iperm, jnp.int32),
        shape=(n, n), n_shards=nd, gs=gs, ng_real=int(ng_real),
        halo_lo=int(halo_lo), halo_hi=int(halo_hi),
        nt_local=int(nt_local), span=int(span), nnz=int(a.nnz))


def local_wbell_matvec(part: WBellPartition, x_loc: jnp.ndarray,
                       axis_name: str, interpret: bool) -> jnp.ndarray:
    """``y_loc = (A x)_loc`` on one shard's group slab, inside shard_map.

    Communication: ``halo_lo + halo_hi`` GROUP slabs (4 KB each) over the
    ring — never the full iterate.
    """
    from cgx.dist.halo import halo_exchange
    from cgx.kernels.wbell import wbell_resident_raw

    squeeze = lambda arr: arr.reshape(arr.shape[1:])
    x_ext = halo_exchange(x_loc, part.halo_lo, part.halo_hi, axis_name)
    pad = part.nt_local - x_ext.shape[0]
    if pad:
        x_ext = jnp.pad(x_ext, ((0, pad), (0, 0), (0, 0)))
    y = wbell_resident_raw(
        squeeze(part.p_og), squeeze(part.p_ga), squeeze(part.lc),
        squeeze(part.values), x_ext[None], span=part.span,
        interpret=interpret, axis_name=axis_name)[0]
    return y[part.halo_lo:part.halo_lo + part.gs]


def _operator_specs(part: WBellPartition) -> WBellPartition:
    """PartitionSpec tree with the SAME treedef (incl. static aux data) as
    ``part``: every stacked/vector leaf shards on its leading axis; the
    boundary transforms (standard-order, used only outside shard_map)
    replicate."""
    specs = jax.tree.map(lambda _: P(AXIS), part)
    return dataclasses.replace(specs, perm=P(), iperm=P())


def _static_key(part: WBellPartition):
    return (part.shape, part.n_shards, part.gs, part.ng_real,
            part.halo_lo, part.halo_hi, part.nt_local, part.span,
            int(part.values.shape[1]))


@lru_cache(maxsize=32)
def _cached_solver(mesh, op_specs, tol, atol, maxiter, precond_kind,
                   poly_steps, has_x0, interpret, method="cg"):
    vec = P(AXIS)
    rep = P()
    out_specs = CGResult(x=vec, iterations=rep, residual_norm_sq=rep,
                         converged=rep, history=rep)

    def local_solve(part, b_loc, *rest):
        rest = list(rest)
        binv_loc = rest.pop(0) if precond_kind == "block_jacobi" else None
        mv = partial(local_wbell_matvec, part, axis_name=AXIS,
                     interpret=interpret)
        squeeze = lambda arr: arr.reshape(arr.shape[1:])
        if precond_kind == "jacobi":
            from cgx.ops import blas
            idi = blas.safe_recip(part.diag_internal)
            precond = lambda r: r * idi
        elif precond_kind == "block_jacobi":
            precond = lambda r: jnp.einsum(
                "gijl,gjl->gil", binv_loc.astype(r.dtype), r)
        elif precond_kind == "poly":
            from cgx.ops import blas
            idi = blas.safe_recip(part.diag_internal)
            om = 2.0 / 3.0

            def precond(r):
                z = om * idi * r
                for _ in range(poly_steps - 1):
                    z = z + om * idi * (r - mv(z))
                return z
        else:
            precond = None
        x0l = rest[0] if rest else None
        if method == "single_reduction":
            from cgx.solve.cg import cg_solve_single_reduction
            return cg_solve_single_reduction(
                mv, b_loc, x0l, tol=tol, atol=atol, maxiter=maxiter,
                preconditioner=precond, axis_name=AXIS)
        if method == "pipelined":
            from cgx.solve.cg import cg_solve_pipelined
            return cg_solve_pipelined(
                mv, b_loc, x0l, tol=tol, atol=atol, maxiter=maxiter,
                preconditioner=precond, axis_name=AXIS)
        if method == "chebyshev":
            from cgx.solve.chebyshev import chebyshev_solve, estimate_bounds
            op = mv if precond is None else (lambda v: precond(mv(v)))
            # Padding lanes (diag == 0) are outside the operator's range:
            # mask the power-iteration start vector or the λ_min estimate
            # collapses onto the padding eigenspace.
            key = jax.random.PRNGKey(0)
            v0 = jax.random.normal(key, b_loc.shape, b_loc.dtype)
            v0 = jax.lax.pcast(v0, AXIS, to="varying") \
                * (part.diag_internal != 0)
            lo, hi = estimate_bounds(op, b_loc.shape, axis_name=AXIS,
                                     dtype=b_loc.dtype, v0=v0)
            return chebyshev_solve(mv, b_loc, lo, hi, x0l, tol=tol,
                                   maxiter=maxiter, preconditioner=precond,
                                   axis_name=AXIS)
        return cg_solve(mv, b_loc, x0l, tol=tol, atol=atol,
                        maxiter=maxiter, preconditioner=precond,
                        axis_name=AXIS)

    in_specs = ((op_specs, vec)
                + ((P(AXIS),) if precond_kind == "block_jacobi" else ())
                + ((vec,) if has_x0 else ()))
    # check_vma=False: Pallas in interpret mode mixes varying (vector)
    # and invariant (scalar-prefetch) operands inside one dynamic_slice,
    # which trips the vma checker — same workaround as cgx/dist/fused.py.
    return jax.jit(jax.shard_map(local_solve, mesh=mesh,
                                 in_specs=in_specs, out_specs=out_specs,
                                 check_vma=False))


def dist_wbell_cg_solve_internal(
    part: WBellPartition,
    bi: jnp.ndarray,
    mesh: Mesh,
    *,
    x0i: Optional[jnp.ndarray] = None,
    tol: float = 1e-6,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    preconditioner: str = "none",
    poly_steps: int = 3,
    method: str = "cg",
    interpret: Optional[bool] = None,
) -> CGResult:
    """Internal-layout entry: ``bi``/``x0i``/returned ``x`` are
    group-sharded ``(nd*gs, 8, 128)`` arrays — no standard-order
    boundary transform.  This is the form repeated-solve drivers use
    (:mod:`cgx.dist.hp`'s df64 outer calls it once per refinement cycle
    with the residual already sharded in place)."""
    if maxiter is None:
        maxiter = part.n
    if interpret is None:
        interpret = mesh.devices.flat[0].platform != "tpu"

    vec = NamedSharding(mesh, P(AXIS))

    binv = None
    if preconditioner == "block_jacobi":
        binv = _partition_block_jacobi(part)

    op_specs = _operator_specs(part)
    f = _cached_solver(mesh, op_specs, float(tol), float(atol),
                       int(maxiter), preconditioner, int(poly_steps),
                       x0i is not None, bool(interpret), method)
    specs = jax.tree.map(lambda s: NamedSharding(mesh, s), op_specs,
                         is_leaf=lambda v: isinstance(v, P))
    args = [jax.device_put(part, specs), jax.device_put(bi, vec)]
    if binv is not None:
        args.append(jax.device_put(binv, vec))
    if x0i is not None:
        args.append(jax.device_put(x0i, vec))
    return f(*args)


def dist_wbell_cg_solve(
    part: WBellPartition,
    b: jnp.ndarray,
    mesh: Mesh,
    *,
    x0: Optional[jnp.ndarray] = None,
    tol: float = 1e-6,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    preconditioner: str = "none",
    poly_steps: int = 3,
    method: str = "cg",
    interpret: Optional[bool] = None,
) -> CGResult:
    """Row-partitioned (P)CG through the WBELL engine over ``mesh``.

    ``b``/``x0``/returned ``x`` are standard-order ``(n,)`` vectors; the
    iterate lives group-sharded in the internal layout for the whole
    solve.  ``preconditioner``: ``"none" | "jacobi" | "block_jacobi" |
    "poly"`` — all shard-local applies in the internal layout.
    """
    bi = part.to_internal(jnp.asarray(b))
    x0i = None if x0 is None else part.to_internal(jnp.asarray(x0))
    res = dist_wbell_cg_solve_internal(
        part, bi, mesh, x0i=x0i, tol=tol, atol=atol, maxiter=maxiter,
        preconditioner=preconditioner, poly_steps=poly_steps,
        method=method, interpret=interpret)
    import dataclasses as dc
    # One replication of the solution at the solve boundary (the layout
    # inverse is a global permutation — not shard-local).
    x_full = jax.device_put(res.x, NamedSharding(mesh, P()))
    return dc.replace(res, x=part.from_internal(x_full))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class WBellPartTiers:
    """Per-shard width-tier plans with SHARED static class step counts
    (each shard's classes zero-padded to the fleet-wide max, so one
    shard_map'd tiered kernel serves every shard) — the distributed
    form of :class:`cgx.kernels.wbell.WBellTierPlan` (ROADMAP r5 #18)."""

    values: jnp.ndarray   # (nd, Ptot, 8, 8, 128) class-major
    lc: jnp.ndarray       # (nd, Ptot, 1, 128)
    packed: jnp.ndarray   # (nd, Ptot) int32 — LOCAL og<<16 | tight ga
    steps: tuple = dataclasses.field(metadata=dict(static=True))
    splane: int = dataclasses.field(metadata=dict(static=True))


def partition_tier_plans(part: WBellPartition,
                         splane: int | None = None) -> WBellPartTiers:
    """Classify each shard's planes into width tiers (tight clamped
    windows in LOCAL group coordinates), padding every class to the max
    count over shards so the static grid is shard-uniform."""
    if part.span > 16:
        raise ValueError("tier plans support span <= 16")
    if splane is None:
        splane = 8 if jax.default_backend() != "tpu" else 64
    from cgx.kernels.wbell import _pad_tier_class, _tier_classes

    vals = np.asarray(part.values)
    lc = np.asarray(part.lc)
    og = np.asarray(part.p_og)
    ga = np.asarray(part.p_ga)
    nd = part.n_shards
    per_shard = [_tier_classes(vals[d], lc[d], og[d], ga[d],
                               part.nt_local) for d in range(nd)]
    n_cls = len(per_shard[0])
    targets = [-(-max(per_shard[d][c][0].shape[0] for d in range(nd))
                 // splane) * splane for c in range(n_cls)]
    sv, sl, spg = [], [], []
    for d in range(nd):
        vs, ls, pgs = [], [], []
        for c in range(n_cls):
            v, l, pg = _pad_tier_class(*per_shard[d][c], targets[c])
            vs.append(v)
            ls.append(l)
            pgs.append(pg)
        sv.append(np.concatenate(vs))
        sl.append(np.concatenate(ls))
        spg.append(np.concatenate(pgs))
    return WBellPartTiers(
        values=jnp.asarray(np.stack(sv)), lc=jnp.asarray(np.stack(sl)),
        packed=jnp.asarray(np.stack(spg)),
        steps=tuple(t // splane for t in targets), splane=int(splane))


def local_wbell_matvec_multi(part: WBellPartition, x_loc: jnp.ndarray,
                             axis_name: str,
                             interpret: bool,
                             tiers: Optional[WBellPartTiers] = None
                             ) -> jnp.ndarray:
    """``Y_loc = (A X)_loc`` for a BATCH of internal-layout columns on one
    shard (inside shard_map).  ``x_loc``: ``(k, gs, 8, 128)``.

    The halo moves as ONE ppermute per ring step carrying all k columns
    (group axis leads during the exchange), and the shard's slot-plane
    stream — the dominant traffic — is shared across columns by the
    resident SpMM kernel: the same amortization the single-device
    multi-RHS path measures (VERDICT r4 #8).  With ``tiers`` the shard
    runs the width-tiered kernel (shorter per-column chains — the
    measured single-device multi-RHS winner, PERF_NOTES 5e).
    """
    from cgx.dist.halo import halo_exchange
    from cgx.kernels.wbell import wbell_resident_raw, wbell_tiered_raw

    squeeze = lambda arr: arr.reshape(arr.shape[1:])
    xg = jnp.moveaxis(x_loc, 0, 1)               # (gs, k, 8, 128)
    x_ext = halo_exchange(xg, part.halo_lo, part.halo_hi, axis_name)
    pad = part.nt_local - x_ext.shape[0]
    if pad:
        x_ext = jnp.pad(x_ext, ((0, pad), (0, 0), (0, 0), (0, 0)))
    xb = jnp.moveaxis(x_ext, 1, 0)               # (k, nt_local, 8, 128)
    if tiers is not None:
        y = wbell_tiered_raw(
            squeeze(tiers.packed), squeeze(tiers.lc),
            squeeze(tiers.values), xb, steps=tiers.steps,
            splane=tiers.splane, interpret=interpret,
            axis_name=axis_name)
    else:
        y = wbell_resident_raw(
            squeeze(part.p_og), squeeze(part.p_ga), squeeze(part.lc),
            squeeze(part.values), xb, span=part.span,
            interpret=interpret, axis_name=axis_name)
    return y[:, part.halo_lo:part.halo_lo + part.gs]


@lru_cache(maxsize=32)
def _cached_multi_solver(mesh, op_specs, tol, atol, maxiter, jacobi,
                         interpret, tier_specs=None):
    """Batched (Jacobi-)CG over the sharded engine: per-column α/β from
    psum'd (k,) dot blocks, one shared SpMM halo+stream per iteration —
    the distributed form of :func:`cgx.solve.wbell.wbell_cg_solve_multi`
    (semantics match: each column has its own convergence schedule;
    finished columns freeze)."""
    vec = P(None, AXIS)
    rep = P()
    out_specs = CGResult(x=vec, iterations=rep, residual_norm_sq=rep,
                         converged=rep, history=rep)
    f32 = jnp.float32

    def local_solve(part, b_loc, *rest):
        from cgx.ops import blas

        tiers = rest[0] if rest else None
        mv = partial(local_wbell_matvec_multi, part, axis_name=AXIS,
                     interpret=interpret, tiers=tiers)
        idi = blas.safe_recip(part.diag_internal) if jacobi else None

        def col_dot(u, v):
            loc = jnp.sum((u * v).astype(f32), axis=(1, 2, 3))
            return jax.lax.psum(loc, AXIS)

        def apply_m(r):
            return r * idi[None] if jacobi else r

        x = b_loc * 0
        r = b_loc
        z = apply_m(r)
        p = z
        rz = col_dot(r, z)
        rr = col_dot(r, r) if jacobi else rz
        bb = col_dot(b_loc, b_loc)
        tol_sq = jnp.maximum(jnp.asarray(tol, f32) ** 2 * bb,
                             jnp.asarray(atol, f32) ** 2)

        def cond(c):
            x, r, z, p, rz, rr, it = c
            return jnp.any((rr > tol_sq) & (it < maxiter))

        def body(c):
            x, r, z, p, rz, rr, it = c
            active = (rr > tol_sq) & (it < maxiter)
            q = mv(p)
            pq = col_dot(p, q)
            alpha = jnp.where(active, rz / jnp.where(pq != 0, pq, 1.0),
                              0.0)
            ax = alpha[:, None, None, None].astype(x.dtype)
            x = x + ax * p
            r = r - ax * q
            z = apply_m(r)
            rz_new = col_dot(r, z)
            rr_new = col_dot(r, r) if jacobi else rz_new
            beta = jnp.where(active,
                             rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
            bx = beta[:, None, None, None].astype(x.dtype)
            p = jnp.where(active[:, None, None, None], z + bx * p, p)
            return (x, r, z, p, jnp.where(active, rz_new, rz),
                    jnp.where(active, rr_new, rr), it + active)

        k = b_loc.shape[0]
        it0 = jnp.zeros((k,), jnp.int32)
        x, r, z, p, rz, rr, it = jax.lax.while_loop(
            cond, body, (x, r, z, p, rz, rr, it0))
        return CGResult(x=x, iterations=it, residual_norm_sq=rr,
                        converged=rr <= tol_sq,
                        history=jnp.zeros((0,), f32))

    in_specs = ((op_specs, vec) if tier_specs is None
                else (op_specs, vec, tier_specs))
    return jax.jit(jax.shard_map(local_solve, mesh=mesh,
                                 in_specs=in_specs,
                                 out_specs=out_specs, check_vma=False))


def dist_wbell_cg_solve_multi(
    part: WBellPartition,
    b: jnp.ndarray,
    mesh: Mesh,
    *,
    tol: float = 1e-6,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    jacobi: bool = False,
    tiered: Optional[bool] = None,
    interpret: Optional[bool] = None,
) -> CGResult:
    """Multi-RHS ``A X = B`` through the row-partitioned WBELL engine
    (VERDICT r4 next #8).  ``b``: standard-order ``(n, k)``; result
    carries batched axes (``x`` (n, k), scalars (k,)).  Per iteration:
    one band-stacked halo exchange + shared-plane-stream SpMM per shard,
    and two psum'd (k,) dot blocks.  ``tiered`` (default on for
    span ≤ 16) runs each shard's planes through the width-tiered kernel
    (:func:`partition_tier_plans` — the measured multi-RHS winner,
    PERF_NOTES 5e)."""
    import dataclasses as dc

    n, k = b.shape
    if maxiter is None:
        maxiter = n
    if interpret is None:
        interpret = mesh.devices.flat[0].platform != "tpu"

    tiers = None
    if tiered is not False and part.span <= 16:
        tiers = partition_tier_plans(part)
    elif tiered:
        raise ValueError("tiered=True needs span <= 16")

    bi = jnp.stack([part.to_internal(b[:, j]) for j in range(k)])
    vec = NamedSharding(mesh, P(None, AXIS))
    op_specs = _operator_specs(part)
    tier_specs = (None if tiers is None
                  else jax.tree.map(lambda _: P(AXIS), tiers))
    f = _cached_multi_solver(mesh, op_specs, float(tol), float(atol),
                             int(maxiter), bool(jacobi), bool(interpret),
                             tier_specs)
    specs = jax.tree.map(lambda s: NamedSharding(mesh, s), op_specs,
                         is_leaf=lambda v: isinstance(v, P))
    args = [jax.device_put(part, specs), jax.device_put(bi, vec)]
    if tiers is not None:
        args.append(jax.device_put(tiers, jax.tree.map(
            lambda s: NamedSharding(mesh, s), tier_specs,
            is_leaf=lambda v: isinstance(v, P))))
    res = f(*args)
    x_full = jax.device_put(res.x, NamedSharding(mesh, P()))
    x = jnp.stack([part.from_internal(x_full[j]) for j in range(k)],
                  axis=1)
    return dc.replace(res, x=x)


def _partition_block_jacobi(part: WBellPartition) -> jnp.ndarray:
    """Supervariable 8×8 block inverses in the group-sharded vector layout
    ``(nd*gs, 8, 8, 128)`` — the distributed form of
    :class:`cgx.solve.wbell.WBellBlockJacobiPrecond` (host-side, once)."""
    nd = part.n_shards
    blocks = np.zeros((nd * part.gs * 128, 8, 8), np.float64)
    p_og = np.asarray(part.p_og, np.int64)
    p_ga = np.asarray(part.p_ga, np.int64)
    lc = np.asarray(part.lc)[:, :, 0, :]          # (nd, Pmax, 128)
    pv = np.asarray(part.values, np.float64)
    lanes = np.arange(128)
    for d in range(nd):
        abs_bc = (p_ga[d][:, None] + (d * part.gs - part.halo_lo)) * 128 \
            + lc[d]
        abs_br = (p_og[d][:, None] + (d * part.gs - part.halo_lo)) * 128 \
            + lanes[None, :]
        on_diag = abs_bc == abs_br
        p_idx, l_idx = np.nonzero(on_diag)
        np.add.at(blocks, abs_br[p_idx, l_idx].astype(np.int64),
                  pv[d][p_idx, :, :, l_idx])
    zero_rows = ~blocks.any(axis=(1, 2))
    blocks[zero_rows] = np.eye(8)
    d_ = np.einsum("bii->bi", blocks)
    d_[d_ == 0.0] = 1.0
    binv = np.linalg.inv(blocks)
    binv = binv.reshape(part.n_shards * part.gs, 128, 8, 8) \
        .transpose(0, 2, 3, 1)
    return jnp.asarray(binv, jnp.float32)
