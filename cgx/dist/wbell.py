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

__all__ = ["WBellPartition", "partition_wbell", "dist_wbell_cg_solve"]


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


def partition_wbell(a, n_shards: int, *, span: int = 16,
                    order: str = "rcm") -> WBellPartition:
    """Build the global WBELL (one global RCM — every shard shares the
    vector layout), then split its planes by output group into
    ``n_shards`` contiguous slabs with locally-rebased coordinates."""
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
    if maxiter is None:
        maxiter = part.n
    if interpret is None:
        interpret = mesh.devices.flat[0].platform != "tpu"

    bi = part.to_internal(jnp.asarray(b))
    vec = NamedSharding(mesh, P(AXIS))

    binv = None
    if preconditioner == "block_jacobi":
        binv = _partition_block_jacobi(part)

    op_specs = _operator_specs(part)
    f = _cached_solver(mesh, op_specs, float(tol), float(atol),
                       int(maxiter), preconditioner, int(poly_steps),
                       x0 is not None, bool(interpret), method)
    specs = jax.tree.map(lambda s: NamedSharding(mesh, s), op_specs,
                         is_leaf=lambda v: isinstance(v, P))
    args = [jax.device_put(part, specs), jax.device_put(bi, vec)]
    if binv is not None:
        args.append(jax.device_put(binv, vec))
    if x0 is not None:
        args.append(jax.device_put(part.to_internal(jnp.asarray(x0)), vec))
    res = f(*args)
    import dataclasses as dc
    # One replication of the solution at the solve boundary (the layout
    # inverse is a global permutation — not shard-local).
    x_full = jax.device_put(res.x, NamedSharding(mesh, P()))
    return dc.replace(res, x=part.from_internal(x_full))


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
