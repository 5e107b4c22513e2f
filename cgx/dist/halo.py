"""Ring halo exchange and the shard-local matvec (runs inside ``shard_map``).

The TPU-native replacement for what MPI point-to-point would have been in the
reference's assignment series (no comm code exists in the tree — SURVEY.md
§2.2/2.3): neighbor boundary slices of the iterate move over ICI via
``jax.lax.ppermute`` ring steps; general sparsity falls back to
``jax.lax.all_gather``.  Both paths keep every shape static so the whole CG
``while_loop`` body stays one traced SPMD program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cgx.dist.partition import Partition

__all__ = ["halo_exchange", "local_matvec"]


def _ring_perm(n: int, shift: int):
    """Device ``i`` sends to ``i + shift`` (mod n) → each receives from
    ``i - shift``."""
    return [(i, (i + shift) % n) for i in range(n)]


def halo_exchange(x_local: jnp.ndarray, halo_lo: int, halo_hi: int,
                  axis_name: str) -> jnp.ndarray:
    """Return ``[left_halo | x_local | right_halo]`` via ring ppermutes.

    ``left_halo`` is the trailing ``halo_lo`` entries of the preceding
    shards, ``right_halo`` the leading ``halo_hi`` entries of the following
    shards (both cyclic — first/last shard wrap, which is harmless because a
    banded matrix never references those slots).  Halos wider than one shard
    take multiple ring steps; the step count is static.
    """
    nl = x_local.shape[0]
    n_dev = jax.lax.psum(1, axis_name)

    parts = []
    if halo_lo:
        steps = -(-halo_lo // nl)
        left = [jax.lax.ppermute(x_local, axis_name, _ring_perm(n_dev, j))
                for j in range(steps, 0, -1)]       # farthest neighbor first
        parts.append(jnp.concatenate(left)[-halo_lo:] if steps > 1
                     else left[0][nl - halo_lo:])
    parts.append(x_local)
    if halo_hi:
        steps = -(-halo_hi // nl)
        right = [jax.lax.ppermute(x_local, axis_name, _ring_perm(n_dev, -j))
                 for j in range(1, steps + 1)]
        parts.append(jnp.concatenate(right)[:halo_hi] if steps > 1
                     else right[0][:halo_hi])
    return jnp.concatenate(parts) if len(parts) > 1 else x_local


def local_matvec(a_loc: Partition, x_local: jnp.ndarray,
                 axis_name: str) -> jnp.ndarray:
    """``y_local = (A x)_local`` for one shard's rows, inside ``shard_map``.

    Communication per call: ``halo_lo + halo_hi`` vector entries over the
    ring (halo mode) or one tiled all-gather of the iterate (allgather
    mode).  Everything else is local fused arithmetic.
    """
    # shard_map delivers the stacked leading axis as a size-1 local slice.
    squeeze = lambda arr: arr.reshape(arr.shape[1:])

    if a_loc.mode == "halo":
        x_ext = halo_exchange(x_local, a_loc.halo_lo, a_loc.halo_hi,
                              axis_name)
    else:
        x_ext = jax.lax.all_gather(x_local, axis_name, tiled=True)

    if a_loc.kind == "ell":
        vals = squeeze(a_loc.ell_values)          # (rows_local, width)
        cols = squeeze(a_loc.ell_cols)
        return jnp.sum(vals * x_ext[cols], axis=1)

    # DIA: statically-shifted FMAs over the extended vector — zero gathers.
    data = squeeze(a_loc.dia_data)                # (rows_local, n_diags)
    rl = data.shape[0]
    hl = a_loc.halo_lo
    y = jnp.zeros((rl,), dtype=x_ext.dtype)
    for k, off in enumerate(a_loc.dia_offsets):
        y = y + data[:, k] * jax.lax.dynamic_slice(x_ext, (hl + off,), (rl,))
    return y
