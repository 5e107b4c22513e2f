"""Dense vector ops: dots, norms, axpy.

TPU-native replacement for the reference's sequential vector kernels
``dot_product`` (``mv_ops.c:117-132``), ``sv_mult`` (``mv_ops.c:134-158``),
``vec_add`` (``mv_ops.c:203-230``) and ``vec_sub`` (``mv_ops.c:232-259``).
On TPU these are not standalone kernels: ``axpy`` is written so XLA fuses it
into the surrounding CG loop body, and dots lower to a single on-device
reduction.  The reference's ``-1.0`` error sentinel on shape mismatch
(``mv_ops.c:122-126``) becomes a trace-time shape check — impossible states
are compile errors, not runtime sentinels.

Every reduction takes an optional ``axis_name``: inside ``shard_map`` the
local partial reduces globally with one ``psum`` over the mesh (the only two
cross-chip sync points per CG iteration ride these).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["dot", "norm_sq", "norm", "axpy", "safe_recip"]


def dot(a: jnp.ndarray, b: jnp.ndarray,
        axis_name: Optional[str] = None) -> jnp.ndarray:
    """Inner product ``aᵀb``; global over ``axis_name`` when given."""
    if a.shape != b.shape:
        raise ValueError(f"dot: shape mismatch {a.shape} vs {b.shape}")
    local = jnp.vdot(a, b)
    if axis_name is not None:
        local = jax.lax.psum(local, axis_name)
    return local


def norm_sq(a: jnp.ndarray, axis_name: Optional[str] = None) -> jnp.ndarray:
    """Squared 2-norm ``‖a‖²``; global over ``axis_name`` when given."""
    return dot(a, a, axis_name)


def norm(a: jnp.ndarray, axis_name: Optional[str] = None) -> jnp.ndarray:
    """2-norm ``‖a‖``; global over ``axis_name`` when given."""
    return jnp.sqrt(norm_sq(a, axis_name))


def axpy(alpha: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """``alpha * x + y`` — written for XLA to fuse into its consumer."""
    return alpha * x + y


def safe_recip(d: jnp.ndarray) -> jnp.ndarray:
    """Elementwise ``1/d`` with zeros mapped to zero (not inf).

    The shared zero-diagonal policy for Jacobi-type preconditioners: zero
    diagonal entries (padding rows from shard/tile equalization) leave
    their components untouched.
    """
    return jnp.where(d != 0, 1.0 / jnp.where(d != 0, d, 1.0),
                     jnp.zeros_like(d))
