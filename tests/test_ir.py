"""Mixed-precision iterative-refinement CG (cgx/solve/ir.py).

Runs the fused engine in interpret mode on CPU with bf16 inner vectors —
the numerical structure (bf16 streams, fp32 dot accumulation, fp32 outer
refinement) is identical to the on-chip path.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import cgx
from cgx.io.poisson import poisson3d_dia
from cgx.kernels.fused_engine import make_geometry
from cgx.solve.ir import ir_cg_solve, ir_supported
from cgx.sparse.stencil import poisson3d_stencil


def test_geometry_bf16_rows_round_to_16():
    taps = ((0, 0, 0), (0, 0, 1), (0, 0, -1))
    g32 = make_geometry(14, 8, 16, taps, itemsize=4)
    g16 = make_geometry(14, 8, 16, taps, itemsize=2)
    assert g32.rows8 % 8 == 0
    assert g16.rows8 % 16 == 0
    assert g16.rows8 >= 14 + 2


def test_geometry_bf16_streaming_blocks_wider():
    taps = ((0, 0, 0), (0, 0, 1), (0, 0, -1), (0, 1, 0), (0, -1, 0),
            (1, 0, 0), (-1, 0, 0))
    g32 = make_geometry(216, 216, 216, taps, itemsize=4)
    g16 = make_geometry(216, 216, 216, taps, itemsize=2)
    assert g32.double_buffer and g16.double_buffer
    assert g16.bl_a >= g32.bl_a      # half the bytes -> at least as wide


def test_ir_supported():
    assert ir_supported(poisson3d_stencil(8, 8, 8))
    assert ir_supported(poisson3d_dia(8, 8, 8, dtype=np.float32))
    assert not ir_supported(object())


def test_ir_stencil_converges_to_fp32_accuracy():
    s = poisson3d_stencil(12, 10, 11)
    n = s.shape[0]
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)

    res = ir_cg_solve(s, b, tol=1e-6, maxiter=3000, interpret=True)
    assert bool(res.converged)
    r = np.asarray(b) - np.asarray(cgx.spmv(s, res.x))
    assert np.linalg.norm(r) <= 1.1e-6 * np.linalg.norm(np.asarray(b))
    # total inner iterations stays within ~2x of a direct fp32 solve
    direct = cgx.cg_solve(s, b, tol=1e-6, maxiter=3000)
    assert int(res.iterations) <= 2 * int(direct.iterations) + 10


def test_ir_dia_jacobi_converges():
    d = poisson3d_dia(10, 9, 8, dtype=np.float32)
    # variable coefficients: symmetric diagonal bump keeps SPD + symmetry
    n = d.shape[0]
    rng = np.random.default_rng(5)
    scale = jnp.asarray(1.0 + 0.3 * rng.random(n), jnp.float32)
    import dataclasses
    data = d.data.at[3].mul(scale)     # offsets (-o3,-o2,-1,0,1,o2,o3)
    d = dataclasses.replace(d, data=data)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)

    m = cgx.JacobiPrecond(inv_diag=1.0 / data[3])
    res = ir_cg_solve(d, b, tol=1e-6, maxiter=3000, preconditioner=m,
                      interpret=True)
    assert bool(res.converged)
    r = np.asarray(b) - np.asarray(cgx.spmv(d, res.x))
    assert np.linalg.norm(r) <= 1.1e-6 * np.linalg.norm(np.asarray(b))


def test_ir_fp32_inner_matches_direct():
    """inner_dtype=fp32 makes IR a restarted CG — same answer as direct."""
    s = poisson3d_stencil(8, 8, 8)
    n = s.shape[0]
    b = jnp.asarray(np.random.default_rng(0).standard_normal(n), jnp.float32)
    res = ir_cg_solve(s, b, tol=1e-6, maxiter=2000, inner_tol=1e-4,
                      inner_dtype=jnp.float32, interpret=True)
    direct = cgx.cg_solve(s, b, tol=1e-6, maxiter=2000)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(direct.x),
                               rtol=0, atol=1e-5)


def test_auto_solve_mixed_precision_falls_back_below_threshold():
    """On CPU / below FUSED_MIN_ROWS the opt-in routes to the normal
    backend and still converges."""
    s = poisson3d_stencil(8, 8, 8)
    b = jnp.ones((512,), jnp.float32)
    res = cgx.auto_solve(s, b, tol=1e-6, mixed_precision=True)
    assert bool(res.converged)


def test_bf16_plain_fused_stalls_where_ir_does_not():
    """bf16 CG without refinement stagnates near its unit roundoff — the
    motivating failure for IR (loss of orthogonality / recurrence drift)."""
    from cgx.kernels.fused_cg import fused_stencil_cg

    s = poisson3d_stencil(12, 10, 11)
    n = s.shape[0]
    b = jnp.asarray(np.random.default_rng(1).standard_normal(n),
                    jnp.float32)
    plain = fused_stencil_cg(s, b.astype(jnp.bfloat16), tol=1e-6,
                             maxiter=600, interpret=True)
    r_plain = np.asarray(b) - np.asarray(
        cgx.spmv(s, plain.x.astype(jnp.float32)))
    rel_plain = np.linalg.norm(r_plain) / np.linalg.norm(np.asarray(b))
    assert rel_plain > 1e-5           # stalled well above fp32 accuracy

    ir = ir_cg_solve(s, b, tol=1e-6, maxiter=3000, interpret=True)
    assert bool(ir.converged)


def _variable_dia(seed=5, dims=(10, 9, 8)):
    import dataclasses
    d = poisson3d_dia(*dims, dtype=np.float32)
    n = d.shape[0]
    rng = np.random.default_rng(seed)
    scale = jnp.asarray(1.0 + 0.3 * rng.random(n), jnp.float32)
    return dataclasses.replace(d, data=d.data.at[3].mul(scale)), n


def test_bf16_planes_converge_to_perturbed_operator():
    """plane_dtype=bf16: fp32 vectors, bf16 coefficient planes.  The
    recurrence converges (fixed SPD perturbation, conjugacy intact) but
    the TRUE residual plateaus near the ~4e-3 coefficient rounding."""
    from cgx.kernels.fused_dia_cg import fused_dia_cg

    d, n = _variable_dia()
    b = jnp.asarray(np.random.default_rng(7).standard_normal(n),
                    jnp.float32)
    res = fused_dia_cg(d, b, tol=1e-6, maxiter=3000, interpret=True,
                       plane_dtype=jnp.bfloat16)
    assert bool(res.converged)          # recurrence residual reaches tol
    ref = cgx.cg_solve(d, b, tol=1e-10, maxiter=3000,
                       preconditioner=cgx.JacobiPrecond(
                           inv_diag=1.0 / d.data[3]))
    # solution of the perturbed system: close, not fp32-close
    err = (np.linalg.norm(np.asarray(res.x) - np.asarray(ref.x))
           / np.linalg.norm(np.asarray(ref.x)))
    assert err < 3e-2
    r_true = np.asarray(b) - np.asarray(cgx.spmv(d, res.x))
    rel = np.linalg.norm(r_true) / np.linalg.norm(np.asarray(b))
    assert 1e-6 < rel < 5e-2            # plateaued above tol, bounded


def test_ir_bf16_planes_full_accuracy():
    """inner fp32 vectors + bf16 planes under iterative refinement: true
    1e-6 accuracy with inner iteration counts near a direct fp32 solve
    (no per-iteration vector rounding)."""
    d, n = _variable_dia(seed=11)
    b = jnp.asarray(np.random.default_rng(13).standard_normal(n),
                    jnp.float32)
    m = cgx.JacobiPrecond(inv_diag=1.0 / d.data[3])
    res = ir_cg_solve(d, b, tol=1e-6, maxiter=4000, preconditioner=m,
                      inner_dtype=jnp.float32,
                      inner_plane_dtype=jnp.bfloat16,
                      inner_tol=5e-3, interpret=True)
    assert bool(res.converged)
    r = np.asarray(b) - np.asarray(cgx.spmv(d, res.x))
    assert np.linalg.norm(r) <= 1.1e-6 * np.linalg.norm(np.asarray(b))
    direct = cgx.cg_solve(d, b, tol=1e-6, maxiter=4000, preconditioner=m)
    assert int(res.iterations) <= int(1.5 * int(direct.iterations)) + 10


def test_bf16_plane_speedup_footprint_model():
    """The mode-routing model (PERF_NOTES 2h/2i): streaming-ratio
    predictions bracket the measurements, and the VMEM residency flip
    fires exactly where the halved plane footprint fits but fp32's
    doesn't (27-point at 128³ — the measured 2.8-6x configuration)."""
    from cgx.io.poisson import poisson3d_dia27
    from cgx.kernels.fused_dia_cg import bf16_plane_speedup

    d7 = poisson3d_dia(8, 8, 8, dtype=np.float32)
    s7 = bf16_plane_speedup(d7, 8**3)
    assert 1.1 < s7 < 1.25               # narrow band: small ratio win

    d27 = poisson3d_dia27(8, 8, 8)
    # streaming regime (both dtypes spill): 160³-class prediction ~1.45
    s_stream = bf16_plane_speedup(d27, 160**3)
    assert 1.35 < s_stream < 1.55
    # residency flip at 128³: fp32 planes spill, bf16 planes fit
    assert bf16_plane_speedup(d27, 128**3) == pytest.approx(2.8)

    # asymmetric data keeps all planes -> larger fraction, bigger ratio
    import dataclasses
    d_asym = dataclasses.replace(
        d27, data=d27.data.at[0, -1].add(0.5))
    s_asym = bf16_plane_speedup(d_asym, 160**3)
    assert s_asym > s_stream


def test_auto_solve_mixed_precision_routes_plane_mode():
    """auto_solve(mixed_precision=True) picks bf16 PLANES (not bf16
    vectors) whenever the footprint model predicts >=1.15x — including
    symmetric 7-point DIA (3 plane windows of ~11 streams, 1.16x) where
    the old offsets>7 rule fell through to the measured-net-loss vector
    mode.  Verified via the inner_plane_dtype plumbing: the solve
    converges to true fp32 accuracy on CPU interpret."""
    from cgx.kernels.fused_dia_cg import bf16_plane_speedup

    d, n = _variable_dia()
    assert bf16_plane_speedup(d, n) >= 1.15


def test_ir_dia_no_preconditioner():
    """Regression: ir_cg_solve on a DIA operator with preconditioner=None
    crashed (e=None dereference) despite ir_supported() advertising it."""
    d = poisson3d_dia(10, 9, 8, dtype=np.float32)
    n = d.shape[0]
    b = jnp.asarray(np.random.default_rng(2).standard_normal(n),
                    jnp.float32)
    res = ir_cg_solve(d, b, tol=1e-6, maxiter=3000, interpret=True)
    assert bool(res.converged)
    r = np.asarray(b) - np.asarray(cgx.spmv(d, res.x))
    assert np.linalg.norm(r) <= 1.1e-6 * np.linalg.norm(np.asarray(b))
