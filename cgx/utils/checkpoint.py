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

    ``backend``: ``"xla"`` (any operator/preconditioner), ``"fused"``
    (the two-pass Pallas engine), ``"resident"`` (the whole-solve
    VMEM-resident kernel), or ``"sr"`` (the semi-resident residency-ladder
    kernel) — the latter three are the paths
    :func:`~cgx.solve.auto.auto_solve` actually routes big problems to.
    Snapshot files are backend-interchangeable — a solve checkpointed under
    one backend can resume under any other.
    """
    if backend == "fused":
        return _make_fused_checkpointed(
            a, tol=tol, atol=atol, maxiter=maxiter,
            preconditioner=preconditioner, chunk=chunk)
    if backend == "resident":
        return _make_resident_checkpointed(
            a, tol=tol, atol=atol, maxiter=maxiter,
            preconditioner=preconditioner, chunk=chunk)
    if backend == "sr":
        return _make_sr_checkpointed(
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
    # including a short final one — reuses one compilation.  The matrix AND
    # the preconditioner ride as traced ARGUMENTS, not closure constants:
    # closed-over arrays are baked into the compile payload, which the
    # remote-TPU tunnel rejects outright past a few hundred MB (HTTP 413 —
    # first hit by WBELL's densified planes, then by IC(0) factors on a
    # 1.6 M-row graph).  Callables (matvec closures / function
    # preconditioners) are not JAX types and stay closed over.
    a_arg = None if callable(a) else a
    # ("poly", steps, omega) on a WBELL operator: the polynomial apply
    # needs the MATRIX (its slot planes) — build it from the traced
    # operator inside the jit, never from a closure (HTTP 413).
    poly_spec = None
    if (isinstance(preconditioner, tuple) and preconditioner
            and preconditioner[0] == "poly"):
        from cgx.sparse.wbell import WBELLMatrix
        if not isinstance(a, WBELLMatrix):
            raise ValueError("preconditioner=('poly', ...) is the WBELL "
                             "internal-layout spec; pass a callable or "
                             "PolynomialPrecond for other operators")
        poly_spec = (int(preconditioner[1]),
                     float(preconditioner[2]) if len(preconditioner) > 2
                     else 2.0 / 3.0)

        def _poly_of(a_mat):
            from cgx.ops.blas import safe_recip
            from cgx.solve.wbell import wbell_poly_apply
            idi = safe_recip(a_mat.diag_internal)
            return lambda r: wbell_poly_apply(a_mat, r, idi,
                                              poly_spec[0], poly_spec[1])
        preconditioner = _poly_of(a)      # eager init uses the concrete a
    m_arg = (None if (preconditioner is None or callable(preconditioner)
                      and not hasattr(preconditioner, "apply"))
             else preconditioner)

    @jax.jit
    def step(a_, m_, s, b, iters):
        m_step = (_poly_of(a_) if poly_spec is not None
                  else (preconditioner if m_ is None else m_))
        return cg_chunk(a if a_ is None else a_, s, iters, b=b, tol=tol,
                        atol=atol, preconditioner=m_step)

    def solve(b, x0=None, *, checkpoint_path: Optional[str] = None,
              on_chunk: Optional[Callable[[CGState], None]] = None
              ) -> CGResult:
        # Default cap: the CG dimension bound.  b may arrive in an
        # engine-internal layout (WBELL's (nt, 8, 128)), where shape[0]
        # is the tile count — use the element count, a safe upper bound.
        mi = int(maxiter) if maxiter is not None else int(np.prod(b.shape))
        if checkpoint_path and os.path.exists(checkpoint_path):
            state = load_state(checkpoint_path)
        else:
            state = cg_init(a, b, x0, preconditioner=preconditioner)
        tol_sq = _tol_sq(tol, atol, b, None)

        while int(state.k) < mi and float(state.rr) > float(tol_sq):
            iters = min(chunk, mi - int(state.k))
            state = jax.block_until_ready(
                step(a_arg, m_arg, state, b, jnp.int32(iters)))
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


def _make_resident_checkpointed(a, *, tol, atol, maxiter, preconditioner,
                                chunk) -> Callable[..., CGResult]:
    """Chunked whole-solve-resident solver factory (VERDICT r2 weak #1):
    the kernel's maxiter bound becomes the chunk length, the carried
    (x, r, p) arrays plus the (rz, rw) scalars round-trip through the
    kernel's resume inputs, and every chunk boundary snapshots an
    UNSCALED flat :class:`CGState` — files interoperate with every other
    backend (same convention as the two-pass engine's ``state_to_flat``).
    """
    import dataclasses
    from functools import partial

    import jax
    import jax.numpy as jnp

    from cgx.kernels import fused_cg as _fc
    from cgx.kernels.fused_dia_cg import (dia_prep, supports_dia,
                                          wrap_entries_zero_or_none)
    from cgx.kernels.fused_resident import (_from_layout, _to_layout,
                                            make_resident_geometry,
                                            resident_cg_call)
    from cgx.solve.precond import JacobiPrecond

    interpret = jax.default_backend() != "tpu"
    is_stencil = _fc.supports(a)
    if is_stencil:
        if preconditioner is not None:
            raise ValueError("resident stencil backend: preconditioner "
                             "must be None (constant-diagonal operators: "
                             "Jacobi is an exact rescaling)")
    elif supports_dia(a) and wrap_entries_zero_or_none(a) is True:
        if preconditioner is not None and not isinstance(preconditioner,
                                                         JacobiPrecond):
            raise ValueError("resident DIA backend supports only Jacobi "
                             "preconditioning")
    else:
        raise ValueError("backend='resident': operator is not "
                         "fused-capable (need a supported stencil or "
                         "wrap-free DIA)")

    cache = {}

    def _built(dtype):
        if dtype in cache:
            return cache[dtype]
        if is_stencil:
            nx, ny, nz, taps, coeffs = _fc.stencil_taps(a)
            planes = weight = e = None
            sym = False
        else:
            jac = isinstance(preconditioner, JacobiPrecond)
            nx, ny, nz, taps, coeffs, planes, e, weight, sym = dia_prep(
                a, dtype, jacobi=jac,
                inv_diag=preconditioner.inv_diag if jac else None)
        g = make_resident_geometry(nx, ny, nz, taps)

        # planes/weight ride as traced arguments (compile-payload rule).
        @partial(jax.jit, static_argnames=("fresh",))
        def step(b_s, x_l, r_l, p_l, rz, rw, pl_, w_, iters, *,
                 fresh: bool):
            resume = None if fresh else (x_l, r_l, p_l, rz, rw)
            x0 = _from_layout(g, x_l) if fresh else None
            return resident_cg_call(
                g, b_s, x0, coeffs=coeffs, planes=pl_, weight=w_,
                tol=tol, atol=atol, maxiter=iters, sym=sym,
                interpret=interpret, resume=resume)

        cache[dtype] = dict(g=g, planes=planes, weight=weight, e=e,
                            step=step)
        return cache[dtype]

    def _to_flat(bt, x_l, r_l, p_l, rz, rw, k) -> CGState:
        g, e = bt["g"], bt["e"]
        x = _from_layout(g, x_l)
        r = _from_layout(g, r_l)
        p = _from_layout(g, p_l)
        if e is not None:
            from cgx.ops.blas import safe_recip
            inv_e = safe_recip(e)
            z = e * r
            x, r, p = e * x, inv_e * r, e * p
        else:
            z = r
        return CGState(x=x, r=r, z=z, p=p,
                       rz=jnp.asarray(rz, x.dtype),
                       rr=jnp.asarray(rw, x.dtype),
                       k=jnp.asarray(k, jnp.int32),
                       history=jnp.zeros((0,), x.dtype))

    def _from_flat(bt, cg):
        g, e = bt["g"], bt["e"]
        x, r, p = cg.x, cg.r, cg.p
        if e is not None:
            from cgx.ops.blas import safe_recip
            inv_e = safe_recip(e)
            x, r, p = inv_e * x, e * r, inv_e * p
        return (_to_layout(g, x), _to_layout(g, r), _to_layout(g, p),
                jnp.asarray(cg.rz, jnp.float32),
                jnp.asarray(cg.rr, jnp.float32), int(cg.k))

    def solve(b, x0=None, *, checkpoint_path: Optional[str] = None,
              on_chunk: Optional[Callable[[CGState], None]] = None
              ) -> CGResult:
        import jax
        import jax.numpy as jnp

        mi = int(maxiter) if maxiter is not None else b.shape[0]
        bt = _built(b.dtype)
        g, e = bt["g"], bt["e"]
        b_s = e * b if e is not None else b
        if x0 is not None and e is not None:
            from cgx.ops.blas import safe_recip
            x0 = x0 * safe_recip(e)

        if checkpoint_path and os.path.exists(checkpoint_path):
            x_l, r_l, p_l, rz, rw, k_tot = _from_flat(
                bt, load_state(checkpoint_path))
            fresh = False
        else:
            x_l = _to_layout(g, (x0 if x0 is not None
                                 else jnp.zeros_like(b_s)).astype(b.dtype))
            r_l = p_l = jnp.zeros_like(x_l)
            rz = rw = jnp.zeros((), jnp.float32)
            k_tot = 0
            fresh = True

        tol_sq = None
        while True:
            iters = min(chunk, mi - k_tot)
            if iters <= 0:
                break
            x_l, r_l, p_l, k, rzv, tol_sq = jax.block_until_ready(
                bt["step"](b_s, x_l, r_l, p_l, rz, rw, bt["planes"],
                           bt["weight"], jnp.int32(iters), fresh=fresh))
            fresh = False
            k_tot += int(k[0, 0])
            rz, rw = rzv[0, 0], rzv[0, 1]
            if checkpoint_path or on_chunk is not None:
                flat = _to_flat(bt, x_l, r_l, p_l, rz, rw, k_tot)
                if checkpoint_path:
                    save_state(checkpoint_path, flat)
                if on_chunk is not None:
                    on_chunk(flat)
            if float(rw) <= float(tol_sq):
                break

        if tol_sq is None:          # maxiter already exhausted: one 0-iter
            # probe — with fresh=True when no chunk ever ran, so the
            # kernel's init computes the TRUE r0/rz rather than adopting
            # the all-zero seed (which would fake convergence).
            x_l, r_l, p_l, _, rzv, tol_sq = bt["step"](
                b_s, x_l, r_l, p_l, rz, rw, bt["planes"], bt["weight"],
                jnp.int32(0), fresh=fresh)
            rw = rzv[0, 1]
        x = _from_layout(g, x_l)
        if e is not None:
            x = e * x
        return CGResult(x=x, iterations=jnp.int32(k_tot),
                        residual_norm_sq=jnp.asarray(rw, jnp.float32),
                        converged=jnp.asarray(float(rw) <= float(tol_sq)),
                        history=jnp.zeros((0,), jnp.float32))

    return solve


def _make_sr_checkpointed(a, *, tol, atol, maxiter, preconditioner,
                          chunk) -> Callable[..., CGResult]:
    """Chunked semi-resident solver factory (VERDICT r2 weak #1, sr leg):
    same contract as ``_make_resident_checkpointed`` on the residency-
    ladder kernel — (x, r, p) round-trip through the kernel's resume
    inputs/carried-state outputs, (rz, rzt) through SMEM, and the Gram
    numbers are recomputed by the kernel's own gram_sweep (deterministic).
    Snapshots are unscaled flat :class:`CGState` files.
    """
    from functools import partial

    import jax
    import jax.numpy as jnp

    from cgx.kernels import fused_cg as _fc
    from cgx.kernels.fused_dia_cg import (dia_prep, supports_dia,
                                          wrap_entries_zero_or_none)
    from cgx.kernels.fused_semiresident import (_from_layout, _to_layout,
                                                make_sr_geometry,
                                                sr_cg_call)
    from cgx.solve.precond import JacobiPrecond

    interpret = jax.default_backend() != "tpu"
    is_stencil = _fc.supports(a)
    if is_stencil:
        if preconditioner is not None:
            raise ValueError("sr stencil backend: preconditioner must be "
                             "None (constant-diagonal operators: Jacobi "
                             "is an exact rescaling)")
    elif supports_dia(a) and wrap_entries_zero_or_none(a) is True:
        if preconditioner is not None and not isinstance(preconditioner,
                                                         JacobiPrecond):
            raise ValueError("sr DIA backend supports only Jacobi "
                             "preconditioning")
    else:
        raise ValueError("backend='sr': operator is not fused-capable "
                         "(need a supported stencil or wrap-free DIA)")

    cache = {}

    def _built(dtype):
        if dtype in cache:
            return cache[dtype]
        if is_stencil:
            nx, ny, nz, taps, coeffs = _fc.stencil_taps(a)
            planes = weight = e = None
            sym = False
            g = make_sr_geometry(nx, ny, nz, taps)
        else:
            jac = isinstance(preconditioner, JacobiPrecond)
            nx, ny, nz, taps, coeffs, planes, e, weight, sym = dia_prep(
                a, dtype, jacobi=jac,
                inv_diag=preconditioner.inv_diag if jac else None)
            g = make_sr_geometry(
                nx, ny, nz, taps, n_planes=int(planes.shape[0]),
                weighted=weight is not None, sym=sym,
                itemsize=jnp.dtype(dtype).itemsize)

        @partial(jax.jit, static_argnames=("fresh",))
        def step(r_or_b_s, x_l, r_l, p_l, rz, rzt, pl_, w_, bb, iters, *,
                 fresh: bool):
            resume = None if fresh else (x_l, r_l, p_l, rz, rzt)
            return sr_cg_call(
                g, r_or_b_s, coeffs=coeffs, tol=tol, atol=atol,
                maxiter=iters, interpret=interpret, planes=pl_, w=w_,
                b_norm_sq=bb, resume=resume,
                x0_l=x_l if fresh else None)

        cache[dtype] = dict(g=g, planes=planes, weight=weight, e=e,
                            step=step)
        return cache[dtype]

    def _to_flat(bt, x_l, r_l, p_l, rz, rzt, k) -> CGState:
        g, e = bt["g"], bt["e"]
        x = _from_layout(g, x_l)
        r = _from_layout(g, r_l)
        p = _from_layout(g, p_l)
        if e is not None:
            from cgx.ops.blas import safe_recip
            inv_e = safe_recip(e)
            z = e * r
            x, r, p = e * x, inv_e * r, e * p
        else:
            z = r
        return CGState(x=x, r=r, z=z, p=p,
                       rz=jnp.asarray(rz, x.dtype),
                       rr=jnp.asarray(rzt, x.dtype),
                       k=jnp.asarray(k, jnp.int32),
                       history=jnp.zeros((0,), x.dtype))

    def _from_flat(bt, cg):
        g, e = bt["g"], bt["e"]
        x, r, p = cg.x, cg.r, cg.p
        if e is not None:
            from cgx.ops.blas import safe_recip
            inv_e = safe_recip(e)
            x, r, p = inv_e * x, e * r, inv_e * p
        return (_to_layout(g, x), _to_layout(g, r), _to_layout(g, p),
                jnp.asarray(cg.rz, jnp.float32),
                jnp.asarray(cg.rr, jnp.float32), int(cg.k))

    def solve(b, x0=None, *, checkpoint_path: Optional[str] = None,
              on_chunk: Optional[Callable[[CGState], None]] = None
              ) -> CGResult:
        import jax
        import jax.numpy as jnp

        from cgx.ops.spmv import spmv

        mi = int(maxiter) if maxiter is not None else b.shape[0]
        bt = _built(b.dtype)
        g, e = bt["g"], bt["e"]
        bb = jnp.sum(b.astype(jnp.float32) ** 2)

        if checkpoint_path and os.path.exists(checkpoint_path):
            x_l, r_l, p_l, rz, rzt, k_tot = _from_flat(
                bt, load_state(checkpoint_path))
            fresh = False
            first_arg = jnp.zeros_like(b)       # unused on resume
        else:
            r0 = b if x0 is None else b - spmv(a, x0)
            r0_s = e * r0 if e is not None else r0
            if x0 is None:
                x_s = jnp.zeros_like(b)
            elif e is not None:
                from cgx.ops.blas import safe_recip
                x_s = x0 * safe_recip(e)
            else:
                x_s = x0
            x_l = _to_layout(g, x_s.astype(b.dtype))
            r_l = p_l = jnp.zeros_like(x_l)
            rz = rzt = jnp.zeros((), jnp.float32)
            k_tot = 0
            fresh = True
            first_arg = r0_s

        tol_sq = None
        while True:
            iters = min(chunk, mi - k_tot)
            if iters <= 0:
                break
            x_l, r_l, p_l, k, rzv, tol_sq = jax.block_until_ready(
                bt["step"](first_arg, x_l, r_l, p_l, rz, rzt,
                           bt["planes"], bt["weight"], bb,
                           jnp.int32(iters), fresh=fresh))
            fresh = False
            k_tot += int(k[0, 0])
            rz, rzt = rzv[0, 0], rzv[0, 1]
            if checkpoint_path or on_chunk is not None:
                flat = _to_flat(bt, x_l, r_l, p_l, rz, rzt, k_tot)
                if checkpoint_path:
                    save_state(checkpoint_path, flat)
                if on_chunk is not None:
                    on_chunk(flat)
            if float(rzt) <= float(tol_sq):
                break

        if tol_sq is None:          # maxiter already exhausted: one 0-iter
            # probe — fresh=True when no chunk ever ran (see the resident
            # factory's note).
            x_l, r_l, p_l, _, rzv, tol_sq = bt["step"](
                first_arg, x_l, r_l, p_l, rz, rzt, bt["planes"],
                bt["weight"], bb, jnp.int32(0), fresh=fresh)
            rzt = rzv[0, 1]
        x = _from_layout(g, x_l)
        if e is not None:
            x = e * x
        return CGResult(x=x, iterations=jnp.int32(k_tot),
                        residual_norm_sq=jnp.asarray(rzt, jnp.float32),
                        converged=jnp.asarray(float(rzt) <= float(tol_sq)),
                        history=jnp.zeros((0,), jnp.float32))

    return solve
