"""SPMD CG: the full solver while_loop inside one ``shard_map`` region.

Per iteration, the only cross-chip traffic is (a) the halo exchange (or
all-gather) inside the local matvec and (b) the two ``psum`` scalar
reductions for α and β — the same two global sync points the math requires
(SURVEY.md §3.2 TPU mapping).  The iterate, residual and direction vectors
live sharded for the whole solve; nothing is ever replicated.
"""
from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cgx.dist.halo import local_matvec
from cgx.dist.partition import Partition, pad_vector
from cgx.solve.cg import CGResult, cg_solve

__all__ = ["AXIS", "make_row_mesh", "operator_specs", "dist_cg_solve"]

AXIS = "rows"


def make_row_mesh(n_devices: Optional[int] = None,
                  devices=None) -> Mesh:
    """1-D device mesh over matrix rows."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return jax.make_mesh((len(devices),), (AXIS,), devices=devices)


def operator_specs(part: Partition):
    """PartitionSpecs for a :class:`Partition`: shard the stacked leading
    axis over ``"rows"``, replicate nothing else (same treedef as ``part``,
    usable for both ``device_put`` shardings and ``shard_map`` in_specs)."""
    return jax.tree.map(
        lambda leaf: P(AXIS, *(None,) * (leaf.ndim - 1)), part)


def _local_diag(a_loc: Partition) -> jnp.ndarray:
    """Diagonal of this shard's rows, from the local operator layout."""
    if a_loc.kind == "dia":
        data = a_loc.dia_data.reshape(a_loc.dia_data.shape[1:])
        return data[:, a_loc.dia_offsets.index(0)]
    vals = a_loc.ell_values.reshape(a_loc.ell_values.shape[1:])
    cols = a_loc.ell_cols.reshape(a_loc.ell_cols.shape[1:])
    rl = vals.shape[0]
    if a_loc.mode == "halo":
        # Extended-local coords: the diagonal of local row i sits at col
        # halo_lo + i.
        own = a_loc.halo_lo + jnp.arange(rl, dtype=cols.dtype)[:, None]
        on_diag = cols == own
    else:
        # Global coords: recover this shard's global row offset from its
        # position on the mesh axis.
        first = jax.lax.axis_index(AXIS).astype(cols.dtype) * rl
        own = first + jnp.arange(rl, dtype=cols.dtype)[:, None]
        on_diag = cols == own
    return jnp.sum(jnp.where(on_diag, vals, 0), axis=1)


def dist_cg_solve(
    part: Partition,
    b: jnp.ndarray,
    mesh: Mesh,
    *,
    x0: Optional[jnp.ndarray] = None,
    tol: float = 1e-6,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    jacobi: bool = False,
    track_history: bool = False,
    method: str = "cg",
) -> CGResult:
    """Solve ``A x = b`` with row-sharded (P)CG over ``mesh``.

    ``b`` may be the true-length or padded global RHS (host or device); it is
    zero-padded to ``part.n_padded`` and sharded ``P("rows")``.  The returned
    :class:`CGResult` carries the padded global solution — strip with
    :func:`cgx.dist.partition.unpad_vector`.

    ``jacobi=True`` builds the diagonal preconditioner *inside* the shard —
    no global setup traffic; padding rows (zero diagonal) stay exactly zero.

    ``method``: ``"cg"`` (2 psums/iter) or ``"single_reduction"``
    (Chronopoulos–Gear, 1 fused psum/iter — halves cross-chip latency on
    large meshes; no history tracking).
    """
    if maxiter is None:
        maxiter = part.n
    b_pad = pad_vector(jnp.asarray(b), part.n_padded)

    specs = operator_specs(part)
    vec = P(AXIS)
    f = _cached_solver(mesh, _static_key(part), float(tol), float(atol),
                       int(maxiter), bool(jacobi), bool(track_history),
                       method, x0 is not None)

    part_dev = jax.device_put(
        part, jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                           is_leaf=lambda v: isinstance(v, P)))
    args = [part_dev, jax.device_put(b_pad, NamedSharding(mesh, vec))]
    if x0 is not None:
        args.append(jax.device_put(
            pad_vector(jnp.asarray(x0), part.n_padded),
            NamedSharding(mesh, vec)))
    return f(*args)


def _static_key(part: Partition):
    return (part.kind, part.mode, part.n, part.n_shards, part.rows_local,
            part.halo_lo, part.halo_hi, part.dia_offsets, part.dtype.name)


@lru_cache(maxsize=64)
def _cached_solver(mesh, part_key, tol, atol, maxiter, jacobi,
                   track_history, method, has_x0):
    """Build-and-jit the shard_map solver once per static configuration.

    A fresh closure per call would key ``jax.jit`` on function identity and
    retrace/compile (plus re-lower the collectives) on EVERY solve — fatal
    for time-stepping loops that call :func:`dist_cg_solve` repeatedly with
    new right-hand sides.
    """
    vec = P(AXIS)
    rep = P()
    out_specs = CGResult(x=vec, iterations=rep, residual_norm_sq=rep,
                         converged=rep, history=rep)
    # Pytree-prefix spec for the whole Partition argument: a single
    # P(AXIS) broadcasts to every leaf (leading stacked axis sharded,
    # trailing dims unsharded) — equivalent to operator_specs(part).
    op_specs = P(AXIS)

    def local_solve(a_loc: Partition, b_loc, *x0_loc):
        mv = partial(local_matvec, a_loc, axis_name=AXIS)
        precond = None
        if jacobi:
            from cgx.ops.blas import safe_recip
            inv = safe_recip(_local_diag(a_loc))
            precond = lambda r: inv * r
        if method == "single_reduction":
            from cgx.solve.cg import cg_solve_single_reduction
            return cg_solve_single_reduction(
                mv, b_loc, x0_loc[0] if x0_loc else None, tol=tol,
                atol=atol, maxiter=maxiter, preconditioner=precond,
                axis_name=AXIS)
        return cg_solve(mv, b_loc, x0_loc[0] if x0_loc else None,
                        tol=tol, atol=atol, maxiter=maxiter,
                        preconditioner=precond, axis_name=AXIS,
                        track_history=track_history)

    in_specs = (op_specs, vec) + ((vec,) if has_x0 else ())
    return jax.jit(jax.shard_map(local_solve, mesh=mesh,
                                 in_specs=in_specs, out_specs=out_specs))



