"""2-D (rows × cols) operator partition — the TP strategy of SURVEY.md §2.2.

For very large or denser-than-banded SPD operators a 1-D row partition makes
each shard's halo (or all-gather) traffic scale with the full matrix
bandwidth.  The 2-D partition puts block ``A[i,j]`` on mesh chip ``(i, j)``
and splits the per-SpMV communication into two O(n/R)-sized steps that ride
different mesh axes:

* layout: ``x`` sharded into R row blocks over axis ``rx``, replicated over
  ``cx`` (vectors are tiny next to A — replication buys collective-free
  dots);
* step 1 — **transpose ppermute**: chip ``(a, b)`` receives block ``x_b``
  from chip ``(b, a)`` (one hop, no all-gather);
* step 2 — local block SpMV ``A[a,b] @ x_b`` (padded-ELL, local coords);
* step 3 — ``psum`` of the partials over ``cx`` → ``y`` back in exactly
  ``x``'s layout, so the CG loop composes unchanged with
  ``axis_name="rx"`` for its dot products.

Square meshes only (R == C) — the transpose trick needs them; rectangular
meshes fall back to the 1-D partitioner.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cgx.solve.cg import CGResult, cg_solve
from cgx.sparse.types import CSRMatrix

__all__ = ["Partition2D", "partition_csr_2d", "make_grid_mesh",
           "matvec_2d", "dist_cg_solve_2d"]

ROWS, COLS = "rx", "cx"


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Partition2D:
    """Stacked 2-D block operators: leading axes (R, C) shard onto the mesh.

    Block ``(i, j)`` is a padded-ELL over the local rows ``[i·rl, (i+1)·rl)``
    with column ids local to block ``j`` (``[0, rl)``); padding entries have
    value 0 and column 0.
    """

    ell_values: jnp.ndarray   # (R, C, rl, w)
    ell_cols: jnp.ndarray     # (R, C, rl, w) int32 — block-local columns
    n: int = dataclasses.field(metadata=dict(static=True))
    r: int = dataclasses.field(metadata=dict(static=True))
    rows_local: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_padded(self) -> int:
        return self.r * self.rows_local


def make_grid_mesh(r: int, c: Optional[int] = None,
                   devices=None) -> Mesh:
    c = c or r
    if devices is None:
        devices = jax.devices()[:r * c]
    return jax.make_mesh((r, c), (ROWS, COLS), devices=devices)


def partition_csr_2d(a: CSRMatrix, r: int) -> Partition2D:
    """Partition a CSR matrix onto an ``r × r`` grid of padded-ELL blocks."""
    vals = np.asarray(a.values)
    cols = np.asarray(a.col_indices).astype(np.int64)
    indptr = np.asarray(a.indptr)
    n = a.shape[0]
    counts = np.diff(indptr).astype(np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int64), counts)

    rl = -(-n // r)
    bi = rows // rl            # block row
    bj = cols // rl            # block col
    # Width = max entries of any (row, block-col) pair.
    pair = rows * r + bj
    order = np.argsort(pair, kind="stable")
    pair_s = pair[order]
    slot = np.arange(len(pair_s)) - np.searchsorted(pair_s, pair_s)
    w = int(slot.max()) + 1 if len(vals) else 1

    ev = np.zeros((r, r, rl, w), dtype=vals.dtype)
    ec = np.zeros((r, r, rl, w), dtype=np.int32)
    ev[bi[order], bj[order], (rows % rl)[order], slot] = vals[order]
    ec[bi[order], bj[order], (rows % rl)[order], slot] = \
        (cols % rl)[order].astype(np.int32)
    return Partition2D(ell_values=jnp.asarray(ev), ell_cols=jnp.asarray(ec),
                       n=n, r=r, rows_local=rl)


def _transpose_perm(r: int):
    """Flat-device permutation for the mesh transpose (a, b) → (b, a)."""
    return [(a * r + b, b * r + a) for a in range(r) for b in range(r)]


def matvec_2d(part_loc: Partition2D, x_local: jnp.ndarray) -> jnp.ndarray:
    """Local step of the 2-D SpMV, inside ``shard_map`` on an (rx, cx) mesh.

    ``x_local``: this chip's row block (replicated over ``cx``).  Returns
    the same-layout result block.
    """
    r = part_loc.r
    # Chip (a, b) receives x_b from chip (b, a): one transpose ppermute over
    # the flattened mesh (both axes named → use two-axis collective).
    x_remote = jax.lax.ppermute(x_local, (ROWS, COLS), _transpose_perm(r))
    vals = part_loc.ell_values.reshape(part_loc.ell_values.shape[2:])
    cols = part_loc.ell_cols.reshape(part_loc.ell_cols.shape[2:])
    partial = jnp.sum(vals * x_remote[cols], axis=1)
    return jax.lax.psum(partial, COLS)


def dist_cg_solve_2d(
    part: Partition2D,
    b: jnp.ndarray,
    mesh: Mesh,
    *,
    tol: float = 1e-6,
    maxiter: Optional[int] = None,
    jacobi: bool = False,
) -> CGResult:
    """Row+col sharded CG over an ``r × r`` mesh."""
    if maxiter is None:
        maxiter = part.n
    rl = part.rows_local
    pad = part.n_padded - b.shape[0]
    b_pad = jnp.pad(jnp.asarray(b), (0, pad)) if pad else jnp.asarray(b)

    op_spec = Partition2D(ell_values=P(ROWS, COLS, None, None),
                          ell_cols=P(ROWS, COLS, None, None),
                          n=part.n, r=part.r, rows_local=rl)
    vec = P(ROWS)             # sharded over rx, replicated over cx
    f = _cached_solver_2d(mesh, part.r, rl, float(tol), int(maxiter),
                          bool(jacobi))
    part_dev = jax.device_put(
        part, jax.tree.map(lambda s: NamedSharding(mesh, s), op_spec,
                           is_leaf=lambda v: isinstance(v, P)))
    b_dev = jax.device_put(b_pad, NamedSharding(mesh, vec))
    return f(part_dev, b_dev)


@lru_cache(maxsize=32)
def _cached_solver_2d(mesh, r, rl, tol, maxiter, jacobi):
    """Jit the shard_map solver once per static config (fresh closures
    would retrace per call — see the 1-D partner in cgx/dist/solve.py).
    """
    vec = P(ROWS)
    rep = P()
    out_specs = CGResult(x=vec, iterations=rep, residual_norm_sq=rep,
                         converged=rep, history=rep)

    def local_solve(p_loc, b_loc):
        mv = lambda v: matvec_2d(p_loc, v)
        precond = None
        if jacobi:
            # Diagonal lives in the diagonal blocks; replicated over cx
            # after a psum (off-diagonal chips contribute zeros).
            vals = p_loc.ell_values.reshape(p_loc.ell_values.shape[2:])
            cols = p_loc.ell_cols.reshape(p_loc.ell_cols.shape[2:])
            a_idx = jax.lax.axis_index(ROWS)
            b_idx = jax.lax.axis_index(COLS)
            own = jnp.arange(rl, dtype=cols.dtype)[:, None]
            on_diag = (cols == own) & (a_idx == b_idx)
            from cgx.ops.blas import safe_recip
            d = jax.lax.psum(jnp.sum(jnp.where(on_diag, vals, 0), axis=1),
                             COLS)
            inv = safe_recip(d)
            precond = lambda v: inv * v
        return cg_solve(mv, b_loc, tol=tol, maxiter=maxiter,
                        preconditioner=precond, axis_name=ROWS)

    return jax.jit(jax.shard_map(local_solve, mesh=mesh,
                                 in_specs=(P(ROWS, COLS), vec),
                                 out_specs=out_specs))