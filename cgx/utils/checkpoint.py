"""Checkpoint / resume and elastic recovery for iterative solves.

The reference has no failure story (errors are ignored ``-1`` returns,
SURVEY.md §5.c).  Here CG is restartable by construction: the O(n)
:class:`~cgx.solve.cg.CGState` is a complete snapshot, the solver advances
in chunks (:func:`~cgx.solve.cg.cg_chunk`), and every chunk boundary is a
checkpoint opportunity.  Snapshots are host-side ``.npz`` (atomic rename) —
cheap relative to solve time because state is O(n), and format-stable for
cross-process resume after preemption.
"""
from __future__ import annotations

import os
import tempfile
from typing import Callable, Optional

import numpy as np

from cgx.solve.cg import CGResult, CGState, cg_chunk, cg_init

__all__ = ["save_state", "load_state", "cg_solve_checkpointed"]

_FIELDS = ("x", "r", "z", "p", "rz", "rr", "k", "history")


def save_state(path: str, state: CGState) -> None:
    """Atomically snapshot a :class:`CGState` to ``.npz``."""
    arrays = {f: np.asarray(getattr(state, f)) for f in _FIELDS}
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_state(path: str) -> CGState:
    """Load a snapshot back into a (device) :class:`CGState`."""
    import jax.numpy as jnp

    with np.load(path) as z:
        return CGState(**{f: jnp.asarray(z[f]) for f in _FIELDS})


def cg_solve_checkpointed(
    a,
    b,
    x0=None,
    *,
    tol: float = 1e-6,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    preconditioner=None,
    chunk: int = 100,
    checkpoint_path: Optional[str] = None,
    on_chunk: Optional[Callable[[CGState], None]] = None,
    backend: str = "xla",
) -> CGResult:
    """:func:`cg_solve` semantics with periodic snapshots every ``chunk``
    iterations.

    If ``checkpoint_path`` exists the solve RESUMES from it (elastic
    recovery after preemption: relaunch with the same arguments).  The
    trajectory is bit-identical to an uninterrupted solve — chunking only
    changes where the host observes the state.

    ``backend``: ``"xla"`` (any operator/preconditioner) or ``"fused"``
    (the two-pass Pallas engine, fused-capable stencil/DIA operators; the
    path :func:`~cgx.solve.auto.auto_solve` routes big problems to).
    Snapshot files are backend-interchangeable — a solve checkpointed under
    one backend can resume under the other.
    """
    import jax
    import jax.numpy as jnp

    if backend == "fused":
        return _fused_checkpointed(
            a, b, x0, tol=tol, atol=atol, maxiter=maxiter,
            preconditioner=preconditioner, chunk=chunk,
            checkpoint_path=checkpoint_path, on_chunk=on_chunk)
    if backend != "xla":
        raise ValueError(f"unknown backend {backend!r}")

    if maxiter is None:
        maxiter = b.shape[0]
    maxiter = int(maxiter)

    if checkpoint_path and os.path.exists(checkpoint_path):
        state = load_state(checkpoint_path)
    else:
        state = cg_init(a, b, x0, preconditioner=preconditioner)

    from cgx.solve.cg import _tol_sq
    tol_sq = _tol_sq(tol, atol, b, None)

    # NOTE on donation (SURVEY.md §2.1 #2): the initial state aliases b
    # (r0 = z0 = p0 = b when x0 is None), so donate_argnums=1 would donate
    # one buffer several times; XLA's while_loop already updates the carried
    # state in place inside each chunk, which is where the traffic is.
    # `a` is closed over (it may be a matvec callable — not a JAX type) and
    # `iters` is traced (only the while_loop cond uses it), so every chunk —
    # including a short final one — reuses one compilation.
    @jax.jit
    def step(s, b, iters):
        return cg_chunk(a, s, iters, b=b, tol=tol, atol=atol,
                        preconditioner=preconditioner)

    while int(state.k) < maxiter and float(state.rr) > float(tol_sq):
        iters = min(chunk, maxiter - int(state.k))
        state = jax.block_until_ready(step(state, b, jnp.int32(iters)))
        if checkpoint_path:
            save_state(checkpoint_path, state)
        if on_chunk is not None:
            on_chunk(state)

    return CGResult(
        x=state.x,
        iterations=state.k,
        residual_norm_sq=state.rr,
        converged=state.rr <= tol_sq,
        history=state.history,
    )


def _fused_checkpointed(a, b, x0=None, *, tol, atol, maxiter,
                        preconditioner, chunk, checkpoint_path,
                        on_chunk) -> CGResult:
    """Chunked fused-engine solve with snapshots (VERDICT r1 #3): the same
    elasticity semantics as the XLA path, on the kernels ``auto_solve``
    routes big problems to.  Snapshots are written in the unscaled flat
    :class:`CGState` format, so files interoperate with ``backend="xla"``.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    from cgx.kernels import fused_cg as _fc
    from cgx.kernels.fused_dia_cg import (build_fused_dia, supports_dia,
                                          wrap_entries_zero_or_none)
    from cgx.solve.precond import JacobiPrecond

    interpret = jax.default_backend() != "tpu"
    dtype = b.dtype
    e = None
    if _fc.supports(a):
        if preconditioner is not None:
            raise ValueError("fused stencil backend: preconditioner must "
                             "be None (constant-diagonal operators: Jacobi "
                             "is an exact rescaling)")
        eng = _fc.build_fused(a, dtype, interpret=interpret)
    elif supports_dia(a) and wrap_entries_zero_or_none(a) is True:
        jac = isinstance(preconditioner, JacobiPrecond)
        if preconditioner is not None and not jac:
            raise ValueError("fused DIA backend supports only Jacobi "
                             "preconditioning")
        eng, e, _ = build_fused_dia(
            a, dtype, jacobi=jac,
            inv_diag=preconditioner.inv_diag if jac else None,
            interpret=interpret)
    else:
        raise ValueError("backend='fused': operator is not fused-capable "
                         "(need a supported stencil or wrap-free 7-point "
                         "DIA)")

    if maxiter is None:
        maxiter = b.shape[0]
    maxiter = int(maxiter)
    b_s = e * b if e is not None else b
    x0_s = x0
    if x0 is not None and e is not None:
        from cgx.ops.blas import safe_recip
        x0_s = x0 * safe_recip(e)

    bb = eng.norm_sq_b(b_s)
    tol_sq = jnp.maximum(jnp.asarray(tol, jnp.float32) ** 2 * bb,
                         jnp.asarray(atol, jnp.float32) ** 2)

    if checkpoint_path and os.path.exists(checkpoint_path):
        st = eng.state_from_flat(load_state(checkpoint_path), e)
    else:
        st = eng.init(b_s, x0_s)

    step = jax.jit(lambda s, upto: eng.run(s, upto, tol_sq))

    while int(st.k) < maxiter and float(st.rz[0, 1]) > float(tol_sq):
        upto = min(int(st.k) + chunk, maxiter)
        st = jax.block_until_ready(step(st, jnp.int32(upto)))
        flat = eng.state_to_flat(st, e)
        if checkpoint_path:
            save_state(checkpoint_path, flat)
        if on_chunk is not None:
            on_chunk(flat)

    res = eng.result(st, tol_sq)
    if e is not None:
        res = dataclasses.replace(res, x=e * res.x)
    return res