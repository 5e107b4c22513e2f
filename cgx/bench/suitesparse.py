"""SuiteSparse-SPD PCG benchmark row (BASELINE.md / SURVEY.md §6).

Runs (P)CG to ``tol`` on the SuiteSparse target set — the real matrices
when vendored (``CGX_SUITESPARSE_DIR``), else the documented stand-ins
from :mod:`cgx.io.suitesparse` — across the preconditioner set, and
prints one JSON line per (matrix, preconditioner).  Output marks
stand-ins explicitly: their numbers are comparable in character
(dimension, sparsity, conditioning class), not identical to the real
matrices.

Usage: ``python -m cgx.bench.suitesparse [--scale 0.1] [--tol 1e-6]``.
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def bench_matrix(name: str, a, is_standin: bool, *, tol: float = 1e-6,
                 maxiter: int = 8000, reps: int = 2, dtype="float32",
                 fmt: str = "auto", chunk: int = 150, preconds=None,
                 escalate_df64: bool = False):
    """One matrix across the preconditioner set; returns result dicts.

    ``fmt``: solve-operator storage.  ``"ell"`` is row-padded ELLPACK
    (static-shape gathers — measured ~1.7x over CSR at the reference's
    banded full-problem scale, ``cgx/bench/reference_full.py``), but on
    IRREGULAR matrices the max-degree padding multiplies the gather
    count, which is the whole cost on TPU (thermal2 stand-in: 3.4x
    padding, ELL 227 ms/iter vs CSR 137 — same-process interleaved;
    reordering does not help, the gather is locality-independent).
    ``"wbell"`` is the windowed block-ELL Pallas engine
    (:mod:`cgx.sparse.wbell` — measured ~150x over the CSR gather path
    on the thermal2-class stand-in); its host-side build (RCM +
    supervariable blocking, ~30 s at 1.2 M rows) is reported as
    ``setup_s`` and it serves the none/jacobi rows — ic0/block-jacobi
    applies are standard-order gathers that would forfeit the layout, so
    those rows keep the CSR operator (reported per row).  ``"auto"``
    picks ELL when padding waste ≤ 1.5x, else WBELL on TPU for
    irregular matrices at the measured ≥ 30 k-row break-even
    (``cgx.sparse.wbell.WBELL_MIN_ROWS``), else CSR.  The
    preconditioners are always built from the exact CSR data.

    ``chunk``: iterations per device dispatch
    (:func:`cgx.utils.checkpoint.cg_solve_checkpointed` without a
    snapshot path — trajectory-identical to one while_loop).  The
    remote-TPU tunnel kills any single dispatch running longer than
    ~60 s ("UNAVAILABLE: TPU device error"), which a multi-thousand-
    iteration solve on a gather-bound operator exceeds; bounded chunks
    keep every dispatch under it on any operator.

    Non-converged solves (e.g. bcsstk17's κ≈10¹⁰ in fp32) time a single
    rep — the iteration count and honest ``converged=False`` are the
    data point, not the repeat noise.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    import cgx
    from cgx.utils.checkpoint import make_checkpointed_solver

    a32 = a.astype(jnp.dtype(dtype))
    wb, wbell_setup_s = None, None
    if fmt == "auto":
        # The measured decision surface lives in ONE place —
        # cgx.sparse.wbell.auto_format (ELL when the 8-padded waste is
        # ≤ 1.5 gathers/nnz, WBELL on TPU at the measured ≥ 30 k-row
        # break-even when a bounded window exists, else CSR).
        from cgx.sparse.wbell import auto_format
        t0 = time.perf_counter()
        op, fmt = auto_format(a)
        if fmt == "wbell":
            wb = op
            jax.block_until_ready(wb.values)
            wbell_setup_s = time.perf_counter() - t0
        elif fmt == "ell":
            a32 = op.astype(jnp.dtype(dtype))
    elif fmt == "wbell":
        from cgx.sparse.wbell import wbell_from_csr
        try:
            t0 = time.perf_counter()
            wb = wbell_from_csr(a)
            jax.block_until_ready(wb.values)
            wbell_setup_s = time.perf_counter() - t0
        except ValueError:
            fmt = "csr"    # no bounded-window tiling for this matrix
    elif fmt == "ell":
        from cgx.sparse.types import ell_from_csr
        a32 = ell_from_csr(a, width_multiple=8).astype(jnp.dtype(dtype))
    n = a.shape[0]
    rng = np.random.default_rng(0)
    base = rng.standard_normal(n).astype(dtype)

    # Preconditioners build from the exact CSR data (a32 may be ELL).
    wanted = (None if preconds is None
              else [p.strip() for p in preconds.split(",")]
              if isinstance(preconds, str) else list(preconds))

    def want(p):
        return wanted is None or p in wanted

    preconds = {}
    ic0_setup_s = None
    if want("none"):
        preconds["none"] = None
    if want("jacobi"):
        preconds["jacobi"] = cgx.JacobiPrecond(
            inv_diag=(1.0 / a.diagonal()).astype(jnp.dtype(dtype)))
    if want("ic0"):
        try:
            t0 = time.perf_counter()
            preconds["ic0"] = cgx.IC0Precond.from_matrix(
                a, dtype=np.dtype(dtype))
            ic0_setup_s = time.perf_counter() - t0
        except np.linalg.LinAlgError as exc:  # IC(0) breakdown is a real
            preconds["ic0"] = exc             # property of the matrix
        except ValueError as exc:   # gather-budget guard: the exact apply
            preconds["ic0"] = exc   # would fault the device at this scale
    if want("block_jacobi"):
        # 3 dof/node for the stiffness set; 8 otherwise.
        bs = 3 if name.startswith("bcsstk") and n % 3 == 0 else 8
        preconds["block_jacobi"] = cgx.BlockJacobiPrecond.from_matrix(a, bs)

    out = []
    df64_cache = {}          # per-matrix df64 solver, shared across rows
    for pname, m in preconds.items():
        # WBELL serves the none/jacobi/block_jacobi rows (in-layout whole
        # solve; round 4 adds the supervariable 8x8 block-Jacobi extracted
        # from the slot planes).  ic0-class applies are standard-order
        # gathers - those rows keep the CSR operator.
        use_wbell = wb is not None and pname in ("none", "jacobi",
                                                 "block_jacobi")
        row_fmt = "csr" if (fmt == "wbell" and not use_wbell) else fmt
        rec = {"matrix": name, "standin": bool(is_standin), "n": n,
               "nnz": int(a.nnz), "precond": pname, "dtype": dtype,
               "tol": tol, "format": row_fmt}
        if isinstance(m, Exception):
            pre = ("IC(0) breakdown" if isinstance(m, np.linalg.LinAlgError)
                   else "IC(0) guard")
            rec["error"] = f"{pre}: {m}"[:300]
            out.append(rec)
            continue

        # One compiled chunk step per (matrix, preconditioner): the timed
        # reps reuse it — no per-call retrace (ADVICE r2 medium).
        if use_wbell:
            if pname == "block_jacobi":
                from cgx.solve.wbell import WBellBlockJacobiPrecond
                t0 = time.perf_counter()
                mi_ = WBellBlockJacobiPrecond.from_wbell(wb)
                rec["bj_setup_s"] = round(time.perf_counter() - t0, 2)
            elif m is None:
                mi_ = None
            else:
                mi_ = cgx.JacobiPrecond(
                    inv_diag=wb.to_internal(m.inv_diag))
            solve = make_checkpointed_solver(
                wb, tol=tol, maxiter=maxiter, preconditioner=mi_,
                chunk=chunk)
            to_b = wb.to_internal
            rec["setup_s"] = round(wbell_setup_s, 2)
        else:
            # CSR/ELL gather-path rows run ~100x slower per iteration
            # than the WBELL rows — an aggressive caller chunk (sized
            # for the engine) would blow the tunnel's ~60 s dispatch
            # window here and fault the device for the rest of the
            # sweep (measured: ecology2 ic0 at chunk=1000 = ~123 s
            # dispatches).  Cap the slow path at the round-3-safe 150.
            solve = make_checkpointed_solver(
                a32, tol=tol, maxiter=maxiter, preconditioner=m,
                chunk=min(chunk, 150))
            to_b = jnp.asarray

        try:
            res = jax.block_until_ready(solve(to_b(jnp.asarray(base))))
        except Exception as exc:   # noqa: BLE001 — a failing row (e.g. a
            # tunnel compile-payload rejection) must not kill the sweep;
            # record it and move on.
            rec["error"] = f"{type(exc).__name__}: {exc}"[:300]
            out.append(rec)
            continue
        best = None
        n_reps = reps if bool(res.converged) else 1
        for i in range(n_reps):
            b = to_b(jnp.asarray(base * (1 + 0.001 * (i + 1))))
            jax.block_until_ready(b)
            t0 = time.perf_counter()
            res = jax.block_until_ready(solve(b))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        rec.update(iterations=int(res.iterations),
                   converged=bool(res.converged),
                   relres=float(res.residual_norm
                                / jnp.linalg.norm(jnp.asarray(base))),
                   solve_ms=round(best * 1e3, 2))
        if pname == "ic0" and ic0_setup_s is not None:
            rec["setup_s"] = round(ic0_setup_s, 2)
        if escalate_df64 and not rec["converged"]:
            # fp32 NOT-conv is the df64 use case, not a dead end (VERDICT
            # r4 weak #6): record the closed number inline in the same
            # row.  One factory per matrix, shared by every escalated
            # preconditioner row (build + compile paid once).
            rec["df64"] = _df64_escalation(a, base, tol=tol,
                                           maxiter=maxiter, chunk=chunk,
                                           cache=df64_cache)
        out.append(rec)
    return out


def _df64_escalation(a, b, *, tol, maxiter, chunk, cache):
    """df64 retry of a NOT-converged fp32 row: TRUE-relres iterative
    refinement with jacobi engine inners (the BASELINE round-4 route that
    closed the G3_circuit/ecology2 rows).  ``cache`` holds the per-matrix
    solver so repeated escalations pay the build/compile once."""
    import time

    import jax.numpy as jnp
    import numpy as np

    import cgx
    from cgx.ops.df64 import df_to_f64
    from cgx.solve.hp import make_ir_df64_solver

    try:
        if "solve" not in cache:
            t0 = time.perf_counter()
            m = cgx.JacobiPrecond(
                inv_diag=jnp.asarray(1.0 / a.diagonal(), jnp.float32))
            cache["solve"] = make_ir_df64_solver(
                a, tol=tol, inner_tol=1e-2, inner_maxiter=maxiter,
                preconditioner=m, inner_format="auto", inner_chunk=chunk)
            cache["build_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        res, info = cache["solve"](np.asarray(b, np.float64))
        dt = time.perf_counter() - t0
        x = df_to_f64(res.x)
        b64 = np.asarray(b, np.float64)
        true_rel = float(np.linalg.norm(b64 - _csr64(a) @ x)
                         / np.linalg.norm(b64))
        return {"true_relres": true_rel, "outer": info["outer"],
                "inner_iterations": info["inner_iterations"],
                "solve_s": round(dt, 2), "build_s": cache["build_s"],
                "converged": bool(res.converged)}
    except Exception as exc:   # noqa: BLE001 — escalation failure must
        return {"error": f"{type(exc).__name__}: {exc}"[:300]}


def _csr64(a):
    import numpy as np
    import scipy.sparse as sp
    if hasattr(a, "indptr") and hasattr(a, "col_indices"):
        return sp.csr_matrix((np.asarray(a.values, np.float64),
                              np.asarray(a.col_indices),
                              np.asarray(a.indptr)), shape=a.shape)
    return sp.csr_matrix(a).astype(np.float64)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default="bcsstk17,thermal2")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="shrink stand-in dimensions (CPU smoke)")
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--maxiter", type=int, default=8000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--chunk", type=int, default=150,
                    help="iterations per device dispatch (tunnel-safe)")
    ap.add_argument("--format", default="auto",
                    choices=["auto", "ell", "csr", "wbell"])
    ap.add_argument("--dir", default=None,
                    help="directory with real .mtx artifacts")
    ap.add_argument("--preconds", default=None,
                    help="comma-separated preconditioner subset "
                         "(none,jacobi,ic0,block_jacobi); default all")
    ap.add_argument("--escalate-df64", action="store_true",
                    help="retry NOT-converged fp32 rows through the df64 "
                         "true-residual route and record the closed "
                         "number inline (one build per matrix)")
    args = ap.parse_args(argv)

    from cgx.io.suitesparse import load_or_standin

    for name in args.names.split(","):
        a, standin = load_or_standin(name, args.dir, scale=args.scale)
        for rec in bench_matrix(name, a, standin, tol=args.tol,
                                maxiter=args.maxiter, reps=args.reps,
                                fmt=args.format, chunk=args.chunk,
                                preconds=args.preconds,
                                escalate_df64=args.escalate_df64):
            print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
