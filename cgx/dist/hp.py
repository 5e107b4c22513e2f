"""Distributed df64 iterative refinement: TRUE relres ≤ tol on a mesh.

The reference computes in ``double`` end-to-end (``mv_ops.h:19-21``) and its
intended deployment was a 100-process cluster run (``Makefile:26-27``).
Round 4 left cgx offering accuracy XOR distribution: the df64 machinery
(:mod:`cgx.solve.hp`) drove single-device inners only, so a multi-chip
solve was fp32-recurrence-only — "NOT converged" on the κ ≥ 1e7 classes the
single-chip df64 path closes.  This module composes the two (VERDICT r4
next #1):

* **Sharded df64 true-residual SpMV.**  The fp64 operator is split
  hi+lo into a row-partitioned ELL over the SAME global RCM ordering as
  the WBELL partition (one permutation, one group sharding — the df64
  rows of shard *d* are exactly its WBELL group slab, so the outer and
  the inner share vectors with zero resharding).  After RCM the columns a
  shard touches lie in a bounded band, so the df64 gather needs only
  ``halo_lo``/``halo_hi`` boundary ENTRIES from ring neighbors — the same
  O(halo) ``ppermute`` machinery as every other cgx distributed path
  (:func:`cgx.dist.halo.halo_exchange`); the iterate is never
  all-gathered.
* **df64 vector work under sharding.**  Residual, axpy update, and the
  error-free products are elementwise — they run SPMD on the
  ``P("rows")`` shards untouched.  The ‖r‖² reduction folds each shard's
  partial to a df64 scalar on-shard (pairwise EFT tree), then ``psum``s
  the hi/lo words — the cross-shard rounding is O(nd·eps₃₂) on a
  CONVERGENCE-CONTROL scalar only (never touches the iterate), so
  accuracy stays df64.
* **Engine inners.**  Each refinement cycle runs one fp32
  ``dist_wbell_cg_solve_internal`` (or any method it supports) on the
  unit residual — per-shard resident Pallas kernels, ring halos, psum
  dots.  Per Higham/Carson, the TRUE residual contracts by the inner
  relative residual per cycle, κ-independent, because the df64 outer
  residual is computed accurately.

Together: a multi-chip unstructured solve reaches the reference's fp64
accuracy envelope at engine speed.

Round-5 extensions: ``per_shard=True`` builds (both the WBELL planes and
the df64 ELL slabs densify one shard at a time — peak host memory
~1/n_d of the global build), and the MULTI-RHS form
(:func:`make_dist_ir_df64_solver_multi` / :func:`dist_ir_df64_solve_multi`)
— the full composition cube: df64 accuracy × row-sharded distribution ×
a block of right-hand sides, with batched engine inners (shard-level
width-tier plans) and ONE sharded df64 gather pass per refinement cycle
for every column.
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

from cgx.dist.wbell import (AXIS, WBellPartition, partition_wbell,
                            dist_wbell_cg_solve_internal)
from cgx.ops.df64 import (DF64, df_add, df_dot, df_mul, df_mul_f32,
                          df_sub, quick_two_sum, two_prod, _fold_axis)
from cgx.solve.hp import HPCGResult

__all__ = ["DistDF64ELL", "partition_df64_ell", "make_dist_ir_df64_solver",
           "dist_ir_df64_solve", "make_dist_ir_df64_solver_multi",
           "dist_ir_df64_solve_multi"]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DistDF64ELL:
    """Row-partitioned df64 ELL operator in the WBELL partition's global
    RCM ordering.  Leaves carry a leading shard axis (``P("rows")``);
    ``halo_lo``/``halo_hi`` are boundary ENTRY counts (permuted order)
    each shard needs from its ring neighbors."""

    vhi: jnp.ndarray    # (nd, R, w) fp32 — R = gs*1024 permuted rows/shard
    vlo: jnp.ndarray    # (nd, R, w) fp32
    cols: jnp.ndarray   # (nd, R, w) int32 — LOCAL halo-extended indices
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    n_shards: int = dataclasses.field(metadata=dict(static=True))
    rows_per_shard: int = dataclasses.field(metadata=dict(static=True))
    halo_lo: int = dataclasses.field(metadata=dict(static=True))
    halo_hi: int = dataclasses.field(metadata=dict(static=True))

    @property
    def width(self) -> int:
        return self.vhi.shape[2]


def partition_df64_ell(a, part: WBellPartition) -> DistDF64ELL:
    """Split the host fp64 CSR into the sharded df64 ELL aligned with
    ``part`` (same permutation, same ``gs``-group row slabs).

    The hi word is the fp32 rounding of the fp64 value, lo the exact
    remainder — the operator is NOT fp32-rounded, so outer residuals
    target the true system (same split as
    :func:`cgx.solve.hp.df64_ell_from_csr`, reference anchor
    ``mv_ops.h:19-21``).
    """
    import scipy.sparse as sp

    if hasattr(a, "indptr") and hasattr(a, "col_indices"):
        a = sp.csr_matrix((np.asarray(a.values, np.float64),
                           np.asarray(a.col_indices),
                           np.asarray(a.indptr)), shape=a.shape)
    a = sp.csr_matrix(a).astype(np.float64)
    n = a.shape[0]
    perm = np.asarray(part.perm, np.int64)
    ap = a[perm][:, perm].tocsr()
    ap.sort_indices()

    nd = part.n_shards
    R = part.gs * 1024
    counts = np.diff(ap.indptr)
    w = max(1, -(-int(counts.max()) // 8) * 8)

    def slab_ell(d):
        """One shard's ELL slab (global column indices; −1 = empty) —
        only this slab's entries are ever densified (the per-shard
        memory discipline of `partition_wbell(per_shard=True)`)."""
        r0, r1 = d * R, min((d + 1) * R, n)
        vals64 = np.zeros((R, w), np.float64)
        gcols = np.full((R, w), -1, np.int64)
        if r0 < n:
            sub = ap[r0:r1]
            c = np.diff(sub.indptr)
            rows = np.repeat(np.arange(r1 - r0), c)
            offs = (np.concatenate([np.arange(k) for k in c])
                    if sub.nnz else np.zeros(0, np.int64))
            vals64[rows, offs] = sub.data
            gcols[rows, offs] = sub.indices
        return vals64, gcols

    # Shard halo extents in ENTRIES from the actual column ranges (RCM
    # keeps them a bounded band around the diagonal slab).
    halo_lo = halo_hi = 0
    for d in range(nd):
        r0, r1 = d * R, min((d + 1) * R, n)
        if r0 >= n or ap.indptr[r0] == ap.indptr[r1]:
            continue
        cs = ap.indices[ap.indptr[r0]:ap.indptr[r1]]
        halo_lo = max(halo_lo, d * R - int(cs.min()))
        halo_hi = max(halo_hi, int(cs.max()) + 1 - (d + 1) * R)
    halo_lo, halo_hi = max(halo_lo, 0), max(halo_hi, 0)
    # Any halo size is semantically safe: each side is individually
    # ≤ (nd-1)·R by construction (d·R − min_col ≤ d·R), so a referenced
    # entry is always ≤ nd−1 ring steps away, and cyclically-wrapped
    # buffer slots correspond to out-of-range global positions that no
    # real column references (their ELL coefficients are zero).  A huge
    # halo (weak RCM band) only costs traffic — acceptable for a
    # once-per-cycle true-residual matvec.

    # Rebase to local halo-extended indices; empty slots point at the
    # shard's own first entry (zero coefficient — any valid index).
    lcols = np.empty((nd, R, w), np.int32)
    svhi = np.empty((nd, R, w), np.float32)
    svlo = np.empty((nd, R, w), np.float32)
    for d in range(nd):
        v, g = slab_ell(d)
        lc = np.where(g >= 0, g - d * R + halo_lo, halo_lo)
        lcols[d] = lc.astype(np.int32)
        hi = v.astype(np.float32)
        svhi[d] = hi
        svlo[d] = (v - hi.astype(np.float64)).astype(np.float32)

    return DistDF64ELL(vhi=jnp.asarray(svhi), vlo=jnp.asarray(svlo),
                       cols=jnp.asarray(lcols), shape=a.shape,
                       n_shards=nd, rows_per_shard=R,
                       halo_lo=int(halo_lo), halo_hi=int(halo_hi))


def _flat(v: jnp.ndarray) -> jnp.ndarray:
    """(gs, 8, 128) internal slab → (gs*1024,) permuted-order flat slab
    (pure local reshape — the two layouts share the group sharding)."""
    return v.transpose(0, 2, 1).reshape(-1)


def _unflat(v: jnp.ndarray) -> jnp.ndarray:
    return v.reshape(-1, 128, 8).transpose(0, 2, 1)


def _local_true_residual(opd: DistDF64ELL, bh, bl, xh, xl):
    """One shard's df64 ``r = b − A·x`` + the global ‖r‖² (inside
    shard_map; vectors in the internal layout)."""
    from cgx.dist.halo import halo_exchange

    sq = lambda arr: arr.reshape(arr.shape[1:])
    vhi, vlo, cols = sq(opd.vhi), sq(opd.vlo), sq(opd.cols)
    xh_e = halo_exchange(_flat(xh), opd.halo_lo, opd.halo_hi, AXIS)
    xl_e = halo_exchange(_flat(xl), opd.halo_lo, opd.halo_hi, AXIS)
    # df64 SpMV on the halo-extended slab: error-free products, pairwise
    # double-word tree fold along the static ELL width (cgx.solve.hp).
    gh, gl = xh_e[cols], xl_e[cols]
    p, e = two_prod(vhi, gh)
    e = e + (vhi * gl + vlo * gh + vlo * gl)
    p, e = quick_two_sum(p, e)
    y = _fold_axis(DF64(p, e), axis=1)                   # (R,) df64
    r = df_sub(DF64(_flat(bh), _flat(bl)), y)
    rr_loc = df_dot(r, r)                                # exact on-shard
    # Cross-shard: psum the two words.  O(nd·eps32) rounding on a
    # convergence-control scalar — the iterate never sees it.
    rr = (jax.lax.psum(rr_loc.hi, AXIS)
          + jax.lax.psum(rr_loc.lo, AXIS))
    return _unflat(r.hi), _unflat(r.lo), rr


@lru_cache(maxsize=16)
def _cached_residual(mesh, op_specs):
    """jitted shard_map'd true-residual step, keyed on (mesh, the
    operator's spec tree — which carries its static geometry)."""
    vec = P(AXIS)
    return jax.jit(jax.shard_map(
        _local_true_residual, mesh=mesh,
        in_specs=(op_specs, vec, vec, vec, vec),
        out_specs=(vec, vec, P()),
        check_vma=False))


@jax.jit
def _scale_unit(rh, rl, inv_s):
    """fp32 unit residual for the inner solve: (r.hi + r.lo)/s."""
    return rh * inv_s + rl * inv_s


@jax.jit
def _df64_update(xh, xl, d, s):
    """x ← x + s·d in df64 (d the fp32 inner correction, s fp32 scale)."""
    x = df_add(DF64(xh, xl), df_mul_f32(DF64(d, jnp.zeros_like(d)), s))
    return x.hi, x.lo


def make_dist_ir_df64_solver(
    a,
    mesh: Mesh,
    *,
    tol: float = 1e-6,
    atol: float = 0.0,
    inner_tol: float = 1e-2,
    inner_maxiter: int = 2000,
    max_outer: int = 40,
    inner_precond: str = "jacobi",
    method: str = "cg",
    poly_steps: int = 3,
    inner_chunk: Optional[int] = None,
    span: int = 16,
    per_shard: bool = False,
    interpret: Optional[bool] = None,
    verbose: bool = False,
):
    """Factory: distributed fp32 WBELL-engine inners inside a df64
    true-residual outer over ``mesh`` — TRUE relres ≤ tol at multi-chip
    engine speed.  Returns ``solve(b) -> (HPCGResult, info)``.

    The host builds — one global RCM + WBELL partition
    (:func:`cgx.dist.wbell.partition_wbell`) and the aligned sharded df64
    ELL split (:func:`partition_df64_ell`) — are paid once; every
    ``solve(b)`` reuses them and the compile cache.

    Args:
      a: host fp64 CSR (cgx CSRMatrix or scipy).
      inner_precond: ``"none" | "jacobi" | "block_jacobi" | "poly"`` —
        the shard-local WBELL preconditioners.
      method: inner solver method (``cg`` / ``single_reduction`` /
        ``pipelined`` / ``chebyshev``) — on real meshes the
        reduced-latency methods trade per-iteration global syncs.
      inner_chunk: bound each inner DISPATCH to this many iterations by
        warm-restarting the inner CG from its iterate (tunnel-safe).
        Unlike the single-device checkpointed chunking this RESTARTS the
        Krylov space per chunk; the refinement contraction target is
        unchanged (the outer only needs the inner residual reduction).

    ``info["relres"]`` is the final TRUE df64 relative residual;
    ``iterations`` on the result counts total inner iterations.
    """
    if AXIS not in mesh.axis_names:
        raise ValueError(f"mesh must carry a {AXIS!r} axis (use "
                         "cgx.dist.solve.make_row_mesh); got "
                         f"{mesh.axis_names}")
    nd = int(np.prod(mesh.devices.shape))
    part = partition_wbell(a, nd, span=span, per_shard=per_shard)
    opd = partition_df64_ell(a, part)
    if interpret is None:
        interpret = mesh.devices.flat[0].platform != "tpu"

    vec = NamedSharding(mesh, P(AXIS))
    op_specs = jax.tree.map(lambda _: P(AXIS), opd)
    op_sharded = jax.device_put(
        opd, jax.tree.map(lambda s: NamedSharding(mesh, s), op_specs,
                          is_leaf=lambda v: isinstance(v, P)))
    residual = _cached_residual(mesh, op_specs)
    n = part.n

    def _inner(r_unit_i):
        if inner_chunk is None:
            res = dist_wbell_cg_solve_internal(
                part, r_unit_i, mesh, tol=inner_tol,
                maxiter=inner_maxiter, preconditioner=inner_precond,
                poly_steps=poly_steps, method=method, interpret=interpret)
            return res.x, int(res.iterations)
        # Bounded dispatches: warm-restart chunks of `inner_chunk` iters.
        # maxiter stays STATIC at inner_chunk — a shrinking final-chunk
        # cap would recompile the shard_map solver per chunk (it keys the
        # lru cache / jit statics; tunnel compiles cost minutes).  The
        # ≤ chunk-1 overshoot on the final chunk is harmless.
        total = 0
        x0i = None
        while True:
            res = dist_wbell_cg_solve_internal(
                part, r_unit_i, mesh, x0i=x0i, tol=inner_tol,
                maxiter=int(inner_chunk),
                preconditioner=inner_precond, poly_steps=poly_steps,
                method=method, interpret=interpret)
            total += int(res.iterations)
            if bool(res.converged) or total >= inner_maxiter:
                return res.x, total
            x0i = res.x

    def solve(b, x0: Optional[DF64] = None):
        b64 = np.asarray(b, np.float64)
        bb = float(np.dot(b64, b64))
        tol_sq = max(tol * tol * bb, atol * atol)

        bh = np.asarray(b64, np.float32)
        bl = (b64 - bh.astype(np.float64)).astype(np.float32)
        bh_i = jax.device_put(part.to_internal(jnp.asarray(bh)), vec)
        bl_i = jax.device_put(part.to_internal(jnp.asarray(bl)), vec)
        if x0 is None:
            zero = jnp.zeros_like(bh_i)
            xh_i = jax.device_put(zero, vec)
            xl_i = jax.device_put(zero, vec)
        else:
            # Resume from a prior df64 iterate (standard order — e.g. a
            # preempted solve's res.x); the first residual step below
            # recomputes the TRUE residual, so the outer picks up
            # exactly where it left off (elastic recovery, SURVEY §5.c).
            xh_i = jax.device_put(part.to_internal(jnp.asarray(x0.hi)),
                                  vec)
            xl_i = jax.device_put(part.to_internal(jnp.asarray(x0.lo)),
                                  vec)

        rr = bb
        total = 0
        outer = 0
        strikes = 0
        while outer < max_outer and strikes < 2:
            rh_i, rl_i, rr_dev = residual(op_sharded, bh_i, bl_i,
                                          xh_i, xl_i)
            rr_new = float(rr_dev)
            if outer:
                strikes = 0 if rr_new < rr else strikes + 1
            rr = rr_new
            if verbose:
                print(f"[dist_ir_df64] cycle {outer}: true relres "
                      f"{np.sqrt(max(rr, 0.0) / bb):.3e}")
            if rr <= tol_sq or strikes >= 2:
                break
            s = float(np.sqrt(rr))
            r_unit_i = _scale_unit(rh_i, rl_i, jnp.float32(1.0 / s))
            d_i, k_in = _inner(r_unit_i)
            xh_i, xl_i = _df64_update(xh_i, xl_i, d_i, jnp.float32(s))
            total += k_in
            outer += 1

        x_hi = part.from_internal(
            jax.device_put(xh_i, NamedSharding(mesh, P())))
        x_lo = part.from_internal(
            jax.device_put(xl_i, NamedSharding(mesh, P())))
        res = HPCGResult(x=DF64(x_hi, x_lo), iterations=jnp.int32(total),
                         residual_norm_sq=jnp.float32(rr),
                         converged=jnp.asarray(rr <= tol_sq))
        info = dict(outer=outer, relres=float(np.sqrt(max(rr, 0.0) / bb)),
                    inner_iterations=total, n_shards=nd, n=n)
        return res, info

    solve.partition = part
    solve.df64_operator = opd
    return solve


def dist_ir_df64_solve(a, b, mesh: Mesh, **kw):
    """One-shot form of :func:`make_dist_ir_df64_solver` (see there)."""
    return make_dist_ir_df64_solver(a, mesh, **kw)(b)


# ---------------------------------------------------------------------------
# Distributed MULTI-RHS df64 (accuracy × distribution × block of RHS)
# ---------------------------------------------------------------------------

def _local_true_residual_multi(opd: DistDF64ELL, bh, bl, xh, xl):
    """One shard's batched df64 ``R = B − A·X`` + per-column global
    ‖r‖² (inside shard_map; vectors ``(k, gs, 8, 128)``)."""
    from cgx.dist.halo import halo_exchange

    sq = lambda arr: arr.reshape(arr.shape[1:])
    vhi = sq(opd.vhi)[:, :, None]
    vlo = sq(opd.vlo)[:, :, None]
    cols = sq(opd.cols)

    def flatk(v):                      # (k, gs, 8, 128) → (gs*1024, k)
        return jnp.stack([_flat(v[j]) for j in range(v.shape[0])],
                         axis=1)

    def unflatk(v):                    # (gs*1024, k) → (k, gs, 8, 128)
        return jnp.stack([_unflat(v[:, j]) for j in
                          range(v.shape[1])], axis=0)

    xh_f, xl_f = flatk(xh), flatk(xl)
    # ONE ring exchange per word carries every column.
    xh_e = halo_exchange(xh_f, opd.halo_lo, opd.halo_hi, AXIS)
    xl_e = halo_exchange(xl_f, opd.halo_lo, opd.halo_hi, AXIS)
    gh, gl = xh_e[cols], xl_e[cols]                # (R, w, k)
    p, e = two_prod(vhi, gh)
    e = e + (vhi * gl + vlo * gh + vlo * gl)
    p, e = quick_two_sum(p, e)
    y = _fold_axis(DF64(p, e), axis=1)             # (R, k) df64
    r = df_sub(DF64(flatk(bh), flatk(bl)), y)
    rr_loc = _fold_axis(df_mul(r, r), axis=0)      # (k,) df64 partials
    rr = (jax.lax.psum(rr_loc.hi, AXIS)
          + jax.lax.psum(rr_loc.lo, AXIS))
    return unflatk(r.hi), unflatk(r.lo), rr


@lru_cache(maxsize=16)
def _cached_residual_multi(mesh, op_specs):
    vec = P(None, AXIS)
    return jax.jit(jax.shard_map(
        _local_true_residual_multi, mesh=mesh,
        in_specs=(op_specs, vec, vec, vec, vec),
        out_specs=(vec, vec, P()),
        check_vma=False))


@jax.jit
def _scale_unit_multi(rh, rl, inv_s):
    return rh * inv_s[:, None, None, None] + rl * inv_s[:, None, None,
                                                        None]


@jax.jit
def _df64_update_multi(xh, xl, d, s):
    x = df_add(DF64(xh, xl),
               df_mul_f32(DF64(d, jnp.zeros_like(d)),
                          s[:, None, None, None]))
    return x.hi, x.lo


def make_dist_ir_df64_solver_multi(
    a,
    mesh: Mesh,
    *,
    tol: float = 1e-6,
    atol: float = 0.0,
    inner_tol: float = 1e-2,
    inner_maxiter: int = 2000,
    max_outer: int = 40,
    inner_jacobi: bool = True,
    inner_chunk: Optional[int] = None,
    span: int = 16,
    per_shard: bool = False,
    interpret: Optional[bool] = None,
    verbose: bool = False,
):
    """The full composition cube: df64 accuracy × row-sharded
    distribution × a BLOCK of right-hand sides.  Batched distributed
    WBELL engine inners (:func:`dist_wbell_cg_solve_multi` — shard-level
    tier plans, one halo ppermute per ring step for all columns) inside
    a sharded batched df64 true-residual outer (one gather pass per
    cycle for every column, per-column psum'd df64 norms).

    Returns ``solve(B) -> (HPCGResult, info)`` with ``B`` host fp64
    ``(n, k)``; scalar result fields carry a ``(k,)`` batch axis.
    """
    from cgx.dist.wbell import dist_wbell_cg_solve_multi

    if AXIS not in mesh.axis_names:
        raise ValueError(f"mesh must carry a {AXIS!r} axis (use "
                         "cgx.dist.solve.make_row_mesh); got "
                         f"{mesh.axis_names}")
    nd = int(np.prod(mesh.devices.shape))
    part = partition_wbell(a, nd, span=span, per_shard=per_shard)
    opd = partition_df64_ell(a, part)
    if interpret is None:
        interpret = mesh.devices.flat[0].platform != "tpu"

    op_specs = jax.tree.map(lambda _: P(AXIS), opd)
    op_sharded = jax.device_put(
        opd, jax.tree.map(lambda s: NamedSharding(mesh, s), op_specs,
                          is_leaf=lambda v: isinstance(v, P)))
    residual = _cached_residual_multi(mesh, op_specs)
    n = part.n

    def _inner(r_unit_std):
        """(n, k) standard-order fp32 block → ((n, k) correction,
        iters)."""
        if inner_chunk is None:
            res = dist_wbell_cg_solve_multi(
                part, r_unit_std, mesh, tol=inner_tol,
                maxiter=inner_maxiter, jacobi=inner_jacobi,
                interpret=interpret)
            return res.x, int(np.asarray(res.iterations).max())
        total = 0
        x0 = None
        while True:
            # maxiter stays STATIC per chunk (jit static — see 5h).
            res = dist_wbell_cg_solve_multi(
                part, r_unit_std, mesh, x0=x0, tol=inner_tol,
                maxiter=int(inner_chunk), jacobi=inner_jacobi,
                interpret=interpret)
            total += int(np.asarray(res.iterations).max())
            if bool(np.asarray(res.converged).all()) \
                    or total >= inner_maxiter:
                return res.x, total
            x0 = res.x

    vecb = NamedSharding(mesh, P(None, AXIS))

    def to_int_block(M32):
        return jax.device_put(
            jnp.stack([part.to_internal(jnp.asarray(M32[:, j]))
                       for j in range(M32.shape[1])]), vecb)

    def solve(B):
        B = np.asarray(B, np.float64)
        k = B.shape[1]
        bb = np.einsum("nk,nk->k", B, B)
        tol_sq = np.maximum(tol * tol * bb, atol * atol)

        bh = B.astype(np.float32)
        bl = (B - bh.astype(np.float64)).astype(np.float32)
        bh_i, bl_i = to_int_block(bh), to_int_block(bl)
        xh_i = jax.device_put(jnp.zeros_like(bh_i), vecb)
        xl_i = jax.device_put(jnp.zeros_like(bl_i), vecb)

        rr = bb.copy()
        total = 0
        outer = 0
        strikes = 0
        while outer < max_outer and strikes < 2:
            rh_i, rl_i, rr_dev = residual(op_sharded, bh_i, bl_i,
                                          xh_i, xl_i)
            rr_new = np.asarray(rr_dev, np.float64)
            active = rr_new > tol_sq
            if outer:
                prev_active = rr > tol_sq
                worse = ((rr_new >= rr)[prev_active].all()
                         if prev_active.any() else True)
                strikes = strikes + 1 if worse else 0
            rr = rr_new
            if verbose:
                print(f"[dist_ir_df64_multi] cycle {outer}: true relres "
                      f"{np.sqrt(np.maximum(rr, 0) / bb)}")
            if not active.any() or strikes >= 2:
                break
            s = np.sqrt(np.where(active, rr, 1.0))
            inv_s = jnp.asarray(np.where(active, 1.0 / s, 0.0),
                                jnp.float32)
            r_unit_i = _scale_unit_multi(rh_i, rl_i, inv_s)
            # Inner runs in standard order (the dist multi solver's
            # public boundary); one replicate + permute per cycle.
            r_unit_full = jax.device_put(r_unit_i,
                                         NamedSharding(mesh, P()))
            r_unit_std = jnp.stack(
                [part.from_internal(r_unit_full[j]) for j in range(k)],
                axis=1)
            d_std, k_in = _inner(r_unit_std)
            d_i = to_int_block(np.asarray(d_std, np.float32))
            xh_i, xl_i = _df64_update_multi(
                xh_i, xl_i, d_i, jnp.asarray(s, jnp.float32))
            total += k_in
            outer += 1

        x_full = jax.device_put(xh_i, NamedSharding(mesh, P()))
        l_full = jax.device_put(xl_i, NamedSharding(mesh, P()))
        x_hi = jnp.stack([part.from_internal(x_full[j])
                          for j in range(k)], axis=1)
        x_lo = jnp.stack([part.from_internal(l_full[j])
                          for j in range(k)], axis=1)
        conv = rr <= tol_sq
        res = HPCGResult(x=DF64(x_hi, x_lo), iterations=jnp.int32(total),
                         residual_norm_sq=jnp.asarray(rr, jnp.float32),
                         converged=jnp.asarray(conv))
        info = dict(outer=outer,
                    relres=np.sqrt(np.maximum(rr, 0.0) / bb).tolist(),
                    inner_iterations=total, n_shards=nd, n=n)
        return res, info

    return solve


def dist_ir_df64_solve_multi(a, B, mesh: Mesh, **kw):
    """One-shot form of :func:`make_dist_ir_df64_solver_multi`."""
    return make_dist_ir_df64_solver_multi(a, mesh, **kw)(B)
