"""Reference full-problem-scale parity run.

The reference's Makefile ``run-full`` target (``Makefile:26-27``) solves its
course dataset — n ≈ 52,269 rows with ≈ 18.02 M nonzeros (the capacities
hard-coded at ``cg.c:235,260-265``) — for 30 iterations.  That dataset is
not in the tree (gitignored), so this harness synthesizes an SPD system of
exactly that shape (345-diagonal banded operator → 52,269 × 345 ≈ 18.0 M
nnz), writes it in the reference's 4-line format, runs the compiled C
binary and cgx for the same fixed iteration count, and compares solutions
at the binary's print precision.

Run: ``python -m cgx.bench.reference_full [--iters 30]`` (takes ~2 min —
the C binary's O(n²) SpMV costs ~2 s/iteration at this size).
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

REF_DIR = "/root/reference"


def build_full_problem(n=52269, bands=172, seed=0):
    """Banded SPD matrix with ~2*bands+1 diagonals ≈ the course nnz."""
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    offsets = list(range(-bands, bands + 1))
    # Symmetric, strongly diagonally dominant => SPD: diag = 2*bands + 1,
    # each off-diagonal -1/(2*bands)  (row |offdiag| sum = 1 << diag).
    diags = [np.full(n - abs(o),
                     2.0 * bands + 1.0 if o == 0 else -1.0 / (2 * bands))
             for o in offsets]
    a = sp.diags(diags, offsets, format="csr")
    a.sort_indices()
    b = rng.standard_normal(n)
    return a, b


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--n", type=int, default=52269)
    ap.add_argument("--bands", type=int, default=172)
    ap.add_argument("--format", default="csr", choices=["csr", "ell"])
    args = ap.parse_args(argv)

    from cgx.io.legacy import write_legacy
    from cgx.sparse.types import csr_from_scipy

    print(f"[gen] n={args.n} bands={args.bands} ...", file=sys.stderr,
          flush=True)
    s, b = build_full_problem(args.n, args.bands)
    a = csr_from_scipy(s)
    print(f"[gen] nnz={a.nnz:,}", file=sys.stderr, flush=True)

    exe = os.path.join(tempfile.gettempdir(), "cg_ref_full")
    subprocess.run(
        ["gcc", "-O2", "-o", exe, os.path.join(REF_DIR, "cg.c"),
         os.path.join(REF_DIR, "mv_ops.c"), "-I", REF_DIR, "-lm"],
        check=True, capture_output=True)

    with tempfile.TemporaryDirectory() as d:
        inp = os.path.join(d, "full.txt")
        print("[io] writing legacy 4-line file ...", file=sys.stderr,
              flush=True)
        write_legacy(inp, a, b)
        print(f"[io] {os.path.getsize(inp)/1e6:.0f} MB", file=sys.stderr,
              flush=True)
        t0 = time.perf_counter()
        out = subprocess.run([exe, inp, str(args.iters)], check=True,
                             capture_output=True, text=True).stdout
        t_ref = time.perf_counter() - t0
    def _is_float(t):
        try:
            float(t)
            return True
        except ValueError:
            return False

    x_ref = np.array([float(l.strip()) for l in out.splitlines()
                      if l.startswith("\t") and _is_float(l.strip())])
    assert x_ref.shape == (args.n,), x_ref.shape

    import jax
    import jax.numpy as jnp
    from cgx.solve.cg import cg_solve

    # Reference runs iters+1 updates (post-update break, cg.c:125-127).
    a32 = a.astype(jnp.float32)
    if args.format == "ell":
        from cgx.sparse.types import ell_from_csr
        a32 = ell_from_csr(a, width_multiple=128).astype(jnp.float32)
    b32 = jnp.asarray(b, jnp.float32)
    solve = jax.jit(lambda a, b: cg_solve(a, b, tol=0.0,
                                          maxiter=args.iters + 1))
    t0 = time.perf_counter()
    res = jax.block_until_ready(solve(a32, b32))
    t_cgx_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = jax.block_until_ready(solve(a32, b32 * 1.0))
    t_cgx = time.perf_counter() - t0

    x = np.asarray(res.x, np.float64)
    err = np.max(np.abs(x - x_ref))
    rel = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    speed = t_ref / t_cgx
    print(f"[parity] max|dx|={err:.2e} rel={rel:.2e} "
          f"(C prints 6 decimals; fp32 device arithmetic)",
          file=sys.stderr)
    print(f"[time] C={t_ref:.1f}s  cgx={t_cgx*1e3:.0f}ms "
          f"(cold {t_cgx_cold:.1f}s)  speedup={speed:.0f}x",
          file=sys.stderr)
    import json
    print(json.dumps({
        "n": args.n, "nnz": int(a.nnz), "iters": args.iters + 1,
        "max_abs_dx": float(err), "rel_dx": float(rel),
        "ref_seconds": round(t_ref, 2),
        "cgx_seconds": round(t_cgx, 4),
        "speedup": round(speed, 1),
    }))
    return 0 if rel < 1e-3 else 1


if __name__ == "__main__":
    sys.exit(main())
