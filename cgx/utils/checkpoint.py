"""Checkpoint / resume and elastic recovery for iterative solves.

The reference has no failure story (errors are ignored ``-1`` returns,
SURVEY.md §5.c).  Here CG is restartable by construction: the O(n)
:class:`~cgx.solve.cg.CGState` is a complete snapshot, the solver advances
in chunks (:func:`~cgx.solve.cg.cg_chunk`), and every chunk boundary is a
checkpoint opportunity.  Snapshots are host-side ``.npz`` (atomic rename) —
cheap relative to solve time because state is O(n), and format-stable for
cross-process resume after preemption.

:func:`make_checkpointed_solver` builds the jitted chunk step ONCE and
returns a reusable solver — repeated solves on the same operator (bench
reps, multi-RHS sweeps) pay trace/compile cost a single time.
:func:`cg_solve_checkpointed` is the one-shot convenience wrapper.
"""
from __future__ import annotations

import os
import tempfile
from typing import Callable, Optional

import numpy as np

from cgx.solve.cg import CGResult, CGState, cg_chunk, cg_init

__all__ = ["save_state", "load_state", "cg_solve_checkpointed",
           "make_checkpointed_solver"]

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


def make_checkpointed_solver(
    a,
    *,
    tol: float = 1e-6,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    preconditioner=None,
    chunk: int = 100,
    backend: str = "xla",
) -> Callable[..., CGResult]:
    """Build a reusable chunked solver for operator ``a``.

    Returns ``solve(b, x0=None, *, checkpoint_path=None, on_chunk=None)``
    with :func:`cg_solve_checkpointed` semantics.  The jitted chunk step is
    traced once at build time and shared across every call — repeated
    solves (bench reps, parameter sweeps) recompile nothing (the per-call
    retrace was measured at ~1.1-1.9 s on CPU; see ADVICE r2).

    ``backend``: ``"xla"`` (any operator/preconditioner) or ``"fused"``
    (the two-pass Pallas engine, fused-capable stencil/DIA operators; the
    path :func:`~cgx.solve.auto.auto_solve` routes big problems to).
    Snapshot files are backend-interchangeable — a solve checkpointed under
    one backend can resume under the other.
    """
    if backend == "fused":
        return _make_fused_checkpointed(
            a, tol=tol, atol=atol, maxiter=maxiter,
            preconditioner=preconditioner, chunk=chunk)
    if backend != "xla":
        raise ValueError(f"unknown backend {backend!r}")

    import jax
    import jax.numpy as jnp

    from cgx.solve.cg import _tol_sq

    # NOTE on donation (SURVEY.md §2.1 #2): the initial state aliases b
    # (r0 = z0 = p0 = b when x0 is None), so donate_argnums=1 would donate
    # one buffer several times; XLA's while_loop already updates the carried
    # state in place inside each chunk, which is where the traffic is.
    # `iters` is traced (only the while_loop cond uses it), so every chunk —
    # including a short final one — reuses one compilation.  A matrix pytree
    # rides as a traced ARGUMENT, not a closure constant: closed-over arrays
    # are baked into the compile payload, which the remote-TPU tunnel rejects
    # outright past a few hundred MB (HTTP 413 on WBELL's densified planes).
    if callable(a):
        @jax.jit
        def step(a_unused, s, b, iters):
            return cg_chunk(a, s, iters, b=b, tol=tol, atol=atol,
                            preconditioner=preconditioner)
        a_arg = None
    else:
        @jax.jit
        def step(a_, s, b, iters):
            return cg_chunk(a_, s, iters, b=b, tol=tol, atol=atol,
                            preconditioner=preconditioner)
        a_arg = a

    def solve(b, x0=None, *, checkpoint_path: Optional[str] = None,
              on_chunk: Optional[Callable[[CGState], None]] = None
              ) -> CGResult:
        mi = int(maxiter) if maxiter is not None else b.shape[0]
        if checkpoint_path and os.path.exists(checkpoint_path):
            state = load_state(checkpoint_path)
        else:
            state = cg_init(a, b, x0, preconditioner=preconditioner)
        tol_sq = _tol_sq(tol, atol, b, None)

        while int(state.k) < mi and float(state.rr) > float(tol_sq):
            iters = min(chunk, mi - int(state.k))
            state = jax.block_until_ready(
                step(a_arg, state, b, jnp.int32(iters)))
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

    return solve


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

    One-shot wrapper over :func:`make_checkpointed_solver`; for repeated
    solves on one operator build the solver once instead (each call here
    re-traces the chunk step).
    """
    solver = make_checkpointed_solver(
        a, tol=tol, atol=atol, maxiter=maxiter,
        preconditioner=preconditioner, chunk=chunk, backend=backend)
    return solver(b, x0, checkpoint_path=checkpoint_path, on_chunk=on_chunk)


def _make_fused_checkpointed(a, *, tol, atol, maxiter, preconditioner,
                             chunk) -> Callable[..., CGResult]:
    """Chunked fused-engine solver factory (VERDICT r1 #3): the same
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
    is_stencil = _fc.supports(a)
    if is_stencil:
        if preconditioner is not None:
            raise ValueError("fused stencil backend: preconditioner must "
                             "be None (constant-diagonal operators: Jacobi "
                             "is an exact rescaling)")
    elif supports_dia(a) and wrap_entries_zero_or_none(a) is True:
        if preconditioner is not None and not isinstance(preconditioner,
                                                         JacobiPrecond):
            raise ValueError("fused DIA backend supports only Jacobi "
                             "preconditioning")
    else:
        raise ValueError("backend='fused': operator is not fused-capable "
                         "(need a supported stencil or wrap-free 7-point "
                         "DIA)")

    # Engine + jitted step built once per vector dtype, shared across
    # calls (the per-call rebuild/retrace was the ADVICE r2 finding).
    cache = {}

    def _built(dtype):
        if dtype not in cache:
            if is_stencil:
                eng = _fc.build_fused(a, dtype, interpret=interpret)
                e = None
            else:
                jac = isinstance(preconditioner, JacobiPrecond)
                eng, e, _ = build_fused_dia(
                    a, dtype, jacobi=jac,
                    inv_diag=preconditioner.inv_diag if jac else None,
                    interpret=interpret)
            step = jax.jit(
                lambda s, upto, tol_sq: eng.run(s, upto, tol_sq))
            cache[dtype] = (eng, e, step)
        return cache[dtype]

    def solve(b, x0=None, *, checkpoint_path: Optional[str] = None,
              on_chunk: Optional[Callable[[CGState], None]] = None
              ) -> CGResult:
        mi = int(maxiter) if maxiter is not None else b.shape[0]
        eng, e, step = _built(b.dtype)
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

        while int(st.k) < mi and float(st.rz[0, 1]) > float(tol_sq):
            upto = min(int(st.k) + chunk, mi)
            st = jax.block_until_ready(step(st, jnp.int32(upto), tol_sq))
            flat = eng.state_to_flat(st, e)
            if checkpoint_path:
                save_state(checkpoint_path, flat)
            if on_chunk is not None:
                on_chunk(flat)

        res = eng.result(st, tol_sq)
        if e is not None:
            res = dataclasses.replace(res, x=e * res.x)
        return res

    return solve
