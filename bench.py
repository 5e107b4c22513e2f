"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: wall-clock of a Jacobi-PCG solve to ‖r‖ ≤ 1e-6·‖b‖ on a 3D
7-point Poisson operator, 128³ rows (≈2.1 M rows, ≈14.6 M nnz), fp32, single
chip (BASELINE.md "Time-to-solution" row; north-star config 2).

``vs_baseline``: measured speedup over the compiled reference C solver
(rnelias/Conjugate-Gradient, built ``gcc -O2`` — more generous than its own
``-g``-only Makefile) on a problem both sides can run: 2D 5-point Poisson
128×128 at a fixed iteration count, compared per CG iteration.  The C SpMV is
O(n²) (``mv_ops.c:160-201``), so this ratio is dominated by the reference's
algorithmic complexity — that *is* its baseline.

Usage: ``python bench.py [--quick]``.  Extra context (SpMV throughput,
iteration counts, baseline details) goes to stderr; stdout gets exactly one
JSON line.
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
REF_DIR = "/root/reference"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_best(fn, reps=5):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def time_samples_fresh(fn, variants, reps=3):
    """Wall times of ``fn(v)`` over distinct inputs ``variants``.

    The remote-TPU dispatch layer can serve repeated *identical* calls from
    cache, so every timed rep must use fresh input content.
    """
    out = []
    for i in range(reps):
        v = variants[i % len(variants)]
        t0 = time.perf_counter()
        fn(v)
        out.append(time.perf_counter() - t0)
    return out


def stats(samples):
    """{median, spread_pct, n_samples} — spread is (max−min)/median.

    The driver artifact used to record ONE sample; the repo's own
    PERF_NOTES documents ±25 % cross-process variance in the VMEM-resident
    regime (the r01→r02 SpMV swing, 725→517 Gnnz/s, was exactly this), so
    every recorded number now carries its own evidence of stability.
    """
    s = sorted(samples)
    med = float(np.median(s))
    spread = (s[-1] - s[0]) / med * 100.0 if med > 0 else 0.0
    return dict(median=med, spread_pct=round(spread, 1), n_samples=len(s))


def time_best_fresh(fn, variants, reps=3):
    return min(time_samples_fresh(fn, variants, reps))


def make_variants(b, k=3):
    """k same-shape vectors with distinct contents, materialized on device."""
    import jax
    out = [jax.block_until_ready(b * (1.0 + 0.001 * (i + 1)))
           for i in range(k)]
    return out


def bench_cgx_headline(quick):
    import jax
    import jax.numpy as jnp
    from functools import partial
    import cgx
    from cgx.sparse.stencil import poisson3d_stencil

    side = 64 if quick else 128
    # Matrix-free stencil operator — the TPU-native representation of the
    # north-star 3D Poisson config (BASELINE.json config 2).  For the
    # constant-diagonal Laplacian, Jacobi preconditioning is an exact
    # rescaling (M = I/6): the CG trajectory is identical, so plain CG is
    # run and labeled jacobi-equivalent.
    a = poisson3d_stencil(side, side, side)
    n = a.shape[0]
    nnz = 7 * n - 2 * (side * side * 3)   # 7-point interior minus faces
    b = jnp.ones((n,), jnp.float32)

    # Pin WHICH engine the headline measures (select_backend needs
    # concrete data — run it outside the jit and pass the result in).
    engine = cgx.select_backend(a, b)
    solve = jax.jit(lambda a, b: cgx.auto_solve(a, b, tol=1e-6,
                                                maxiter=2000,
                                                backend=engine))
    res = jax.block_until_ready(solve(a, b))  # compile + converge check
    iters = int(res.iterations)
    assert bool(res.converged), "headline solve did not converge"

    # Round-4's headline spread (±14.9 %) was tunnel dispatch jitter on a
    # ~31 ms measurement, not device variance (the device portion is ~7 ms
    # at 23 us/iter; the ~24 ms dispatch floor carries ±2-5 ms one-sided
    # spikes).  Two fixes (VERDICT r4 weak #7): warm the dispatch path
    # beyond the compile call before sampling, and take each SAMPLE as the
    # min over 2 fresh-content dispatches — the jitter is one-sided, so a
    # per-sample min strips spikes without biasing the device time.
    n_head = 3 if quick else 7
    per = 2 if quick else 3            # dispatches per sample (min-of-per)
    bs = make_variants(b, k=per * n_head + 2)
    for v in bs[:2]:                   # dispatch-path warmup (distinct
        jax.block_until_ready(solve(a, v))   # contents — never cached)
    head = stats([
        min(time_samples_fresh(
            lambda v: jax.block_until_ready(solve(a, v)),
            bs[2 + per * i:2 + per * (i + 1)], reps=per))
        for i in range(n_head)])

    # DEVICE-ONLY solve time, loop-differenced: the wall-clock headline
    # is ~75 % tunnel dispatch overhead (23 of 30 ms), which drifts a few
    # ms over minutes — that drift IS the residual spread above, not
    # device variance (the SpMV metric through the same tunnel holds
    # ±2-3 %).  Chaining m solves in one dispatch and differencing two
    # chain lengths cancels the overhead: this is the stable
    # round-over-round comparator (VERDICT r4 weak #7).
    @partial(jax.jit, static_argnums=2)
    def solve_chain(a, b0, m):
        def body(i, c):
            b_i, acc = c
            res = cgx.auto_solve(a, b_i, tol=1e-6, maxiter=2000,
                                 backend=engine)
            # Next RHS derives from this solution — no two dispatches
            # or chain steps see identical inputs.
            return (b0 * (1.0 + 1e-4 * (i + 1).astype(jnp.float32))
                    + 1e-6 * res.x, acc + res.iterations)
        return jax.lax.fori_loop(
            0, m, body, (b0, jnp.zeros((), jnp.int32)))

    # 8 differenced solves ≈ 56 ms of device signal at 128³ against the
    # ±2 ms dispatch jitter; smaller gaps (1 vs 3) measured noise-level.
    # (Quick mode's 64³ solve is ~1 ms device — even 8 solves barely
    # clear the jitter, so treat its device number as smoke only.)
    m1, m2 = 1, 9
    jax.block_until_ready(solve_chain(a, b, m1))
    jax.block_until_ready(solve_chain(a, b, m2))
    dev = []
    for i in range(n_head):
        v = bs[2 + ((per * i) % (per * n_head))] * (1.0 + 1e-3 * i)
        v = jax.block_until_ready(v)
        t1 = min(time_samples_fresh(
            lambda u: jax.block_until_ready(solve_chain(a, u, m1)),
            [v, v * 1.0001], 2))
        t2 = min(time_samples_fresh(
            lambda u: jax.block_until_ready(solve_chain(a, u, m2)),
            [v * 1.0002, v * 1.0003], 2))
        dev.append(max(t2 - t1, 1e-9) / (m2 - m1))
    head_dev = stats(dev)

    # SpMV-only throughput — measured through the PALLAS stencil kernel
    # (explicit VMEM windowing, no compiler-placed loop carry), not the
    # XLA shifted-adds loop: the XLA resident-regime loop's buffer
    # placement varies ±25-40 % across processes (PERF_NOTES rounds 1-3;
    # VERDICT r3 weak #2 — a headline artifact measuring placement luck
    # means nothing round-over-round).  The kernel's own placement is
    # static, so its spread is measurement noise only.
    a_pl = a.with_backend("pallas")

    @partial(jax.jit, static_argnums=2)
    def spmv_loop(a, x, k):
        # /8 keeps the iterates bounded (spectral radius of A/8 <= 1).
        return jax.lax.fori_loop(
            0, k, lambda i, y: cgx.spmv(a, y) * 0.125, x)

    # Loop bodies cost ~ms while a dispatch costs ~30 ms, so single-pair
    # differences drown in dispatch noise; the ~30 ms floor is min-stable,
    # so each per-iteration SAMPLE is a min-of-2 calibrated difference,
    # and the median/spread is taken over those samples.
    # The Pallas kernel runs ~7 us (64^3) / ~22 us (128^3) per SpMV — a
    # few hundred differenced iterations would drown in the ~30 ms
    # dispatch jitter (measured: 0-6 us/iter garbage).  Size the loops so
    # the differenced signal is tens of ms.
    k1, k2 = (500, 3500) if quick else (300, 1500)
    jax.block_until_ready(spmv_loop(a_pl, b, k1))
    jax.block_until_ready(spmv_loop(a_pl, b, k2))
    per_iter = []
    for i in range(3 if quick else 5):
        # Fresh input CONTENT for every dispatch — across rounds too
        # (round-scaled variants), so the dispatch cache never serves a
        # timed call.
        vs = make_variants(b * (1.0 + 0.01 * (i + 1)), k=4)
        t1 = min(time_samples_fresh(
            lambda v: jax.block_until_ready(spmv_loop(a_pl, v, k1)),
            vs[:2], 2))
        t2 = min(time_samples_fresh(
            lambda v: jax.block_until_ready(spmv_loop(a_pl, v, k2)),
            vs[2:], 2))
        per_iter.append(max(t2 - t1, 1e-9) / (k2 - k1))
    sp = stats(per_iter)
    spmv_gnnz = stats([nnz / t / 1e9 for t in per_iter])
    log(f"[cgx] spmv per-iter samples (us): "
        f"{[round(t * 1e6, 1) for t in per_iter]}")
    log(f"[cgx] 3D Poisson {side}^3: n={n} nnz={nnz} iters={iters} "
        f"time_to_tol={head['median']*1e3:.2f} ms "
        f"(±{head['spread_pct']}% over {head['n_samples']})  "
        f"spmv={spmv_gnnz['median']:.2f} Gnnz/s "
        f"(±{spmv_gnnz['spread_pct']}%, {sp['median']*1e6:.1f} us/spmv) "
        f"engine={engine} on {jax.devices()[0].platform}")
    log(f"[cgx] device-only solve (loop-differenced): "
        f"{head_dev['median']*1e3:.2f} ms ±{head_dev['spread_pct']}%")
    return dict(side=side, n=n, nnz=nnz, iters=iters, engine=engine,
                head=head, head_dev=head_dev, spmv=spmv_gnnz,
                regime=("vmem_resident" if engine.startswith("resident")
                        else "streaming"))


def build_reference():
    exe = os.path.join(tempfile.gettempdir(), "cg_ref_bench")
    if not os.path.exists(exe):
        subprocess.run(
            ["gcc", "-O2", "-o", exe, os.path.join(REF_DIR, "cg.c"),
             os.path.join(REF_DIR, "mv_ops.c"), "-I", REF_DIR, "-lm"],
            check=True, capture_output=True)
    return exe


def bench_vs_reference(quick):
    """Per-iteration CG time, cgx (fp32, device) vs C binary (fp64, host),
    identical 2D Poisson matrix and iteration count."""
    import jax
    import jax.numpy as jnp
    from cgx.io.legacy import write_legacy
    from cgx.io.poisson import poisson2d
    from cgx.solve.cg import cg_solve

    side = 64 if quick else 128
    iters = 20 if quick else 60
    a = poisson2d(side, side)
    n = side * side
    rng = np.random.default_rng(7)
    b = rng.standard_normal(n)

    try:
        exe = build_reference()
    except (OSError, subprocess.CalledProcessError) as e:
        log(f"[ref] unavailable ({e}); vs_baseline omitted")
        return None

    with tempfile.TemporaryDirectory() as d:
        inp = os.path.join(d, "in.txt")
        write_legacy(inp, a, b)
        t0 = time.perf_counter()
        subprocess.run([exe, inp, str(iters)], check=True,
                       capture_output=True)
        t_ref = time.perf_counter() - t0

    a32 = a.astype(jnp.float32)
    b32 = jnp.asarray(b, jnp.float32)
    # Difference two iteration counts to cancel the ~30 ms tunnel dispatch
    # overhead per call (the C binary pays its startup+parse analogously
    # once; its per-iter cost dominates regardless at O(n^2) SpMV).
    from functools import partial
    solve = partial(cg_solve, tol=0.0)
    f1 = jax.jit(lambda a, b: solve(a, b, maxiter=iters + 1))
    f2 = jax.jit(lambda a, b: solve(a, b, maxiter=4 * iters + 1))
    jax.block_until_ready(f1(a32, b32))
    jax.block_until_ready(f2(a32, b32))
    bs = make_variants(b32)
    t1 = time_best_fresh(
        lambda v: jax.block_until_ready(f1(a32, v)), bs, reps=4)
    t2 = time_best_fresh(
        lambda v: jax.block_until_ready(f2(a32, v)), bs, reps=4)
    cgx_per_iter = max(t2 - t1, 1e-9) / (3 * iters)

    ref_per_iter = t_ref / (iters + 1)
    speedup = ref_per_iter / cgx_per_iter
    log(f"[ref] 2D Poisson {side}^2, {iters + 1} updates: "
        f"C={t_ref:.2f}s ({ref_per_iter*1e3:.1f} ms/iter, incl. parse)  "
        f"cgx={t1*1e3:.2f}ms/call ({cgx_per_iter*1e3:.3f} ms/iter)  "
        f"speedup={speedup:.0f}x")
    return speedup


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    head = bench_cgx_headline(args.quick)
    speedup = bench_vs_reference(args.quick)

    h = head["head"]
    s = head["spmv"]
    print(json.dumps({
        "metric": (f"cg_time_to_1e-6_poisson3d_{head['side']}^3_fp32"
                   "_jacobi_equiv"),
        "value": round(h["median"] * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(speedup, 1) if speedup else None,
        "spread_pct": h["spread_pct"],
        "n_samples": h["n_samples"],
        "engine": head["engine"],
        "regime": head["regime"],
        "iterations": head["iters"],
        "device_solve": {
            # Loop-differenced device-only solve time — dispatch-path
            # drift cancelled; the stable round-over-round comparator.
            "median_ms": round(head["head_dev"]["median"] * 1e3, 3),
            "spread_pct": head["head_dev"]["spread_pct"],
            "n_samples": head["head_dev"]["n_samples"],
        },
        "spmv": {
            "median_gnnz_s": round(s["median"], 2),
            "spread_pct": s["spread_pct"],
            "n_samples": s["n_samples"],
            "engine": "pallas_stencil_kernel",
            "regime": "kernel_windowed",
        },
    }), flush=True)


if __name__ == "__main__":
    main()
