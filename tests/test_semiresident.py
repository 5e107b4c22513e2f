"""Semi-resident whole-solve CG (cgx/kernels/fused_semiresident.py, v4.5).

Three residency tiers (rpq / rp / p); trajectory identity vs cg_solve in
interpret mode, the in-place rolling-strip sweep on multi-block
geometries, and the footprint ladder.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import cgx
from cgx.kernels.fused_cg import stencil_taps
from cgx.kernels.fused_semiresident import (make_sr_geometry, sr_cg,
                                            sr_mode, sr_stencil_cg)
from cgx.sparse.stencil import (GeneralStencil3D, poisson2d_stencil,
                                poisson3d_stencil)


@pytest.mark.parametrize("mode", ["rpq", "rp", "p"])
def test_sr_matches_cg_all_modes(mode, rng):
    s = poisson3d_stencil(12, 10, 11)
    b = jnp.asarray(rng.standard_normal(s.shape[0]), jnp.float32)
    ref = cgx.cg_solve(s, b, tol=1e-6, maxiter=2000)
    res = sr_stencil_cg(s, b, tol=1e-6, maxiter=2000, mode=mode,
                        interpret=True)
    assert bool(res.converged)
    assert int(res.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               atol=1e-5)


def test_sr_multiblock_rolling_strip(rng):
    """bl smaller than l_real forces the block sweep — the in-place p
    update must see pre-update values at every block's left margin (the
    saved-strip delay line)."""
    s = poisson3d_stencil(9, 23, 29)
    nx, ny, nz, taps, coeffs = stencil_taps(s)
    g = make_sr_geometry(nx, ny, nz, taps, mode="rp", bl=256)
    assert g.nb >= 3
    b = jnp.asarray(rng.standard_normal(s.shape[0]), jnp.float32)
    ref = cgx.cg_solve(s, b, tol=1e-6, maxiter=2000)
    res = sr_cg(g, b, coeffs=coeffs, tol=1e-6, maxiter=2000,
                interpret=True)
    assert int(res.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               atol=1e-5)


def test_sr_multiblock_streamed_r(rng):
    """p-mode multi-block: r streamed through HBM in-place block DMA."""
    s = poisson3d_stencil(8, 17, 31)
    nx, ny, nz, taps, coeffs = stencil_taps(s)
    g = make_sr_geometry(nx, ny, nz, taps, mode="p", bl=256)
    assert g.nb >= 2
    b = jnp.asarray(rng.standard_normal(s.shape[0]), jnp.float32)
    ref = cgx.cg_solve(s, b, tol=1e-6, maxiter=2000)
    res = sr_cg(g, b, coeffs=coeffs, tol=1e-6, maxiter=2000,
                interpret=True)
    assert int(res.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               atol=1e-5)


def test_sr_x0_correction_solve(rng):
    s = poisson3d_stencil(10, 9, 8)
    n = s.shape[0]
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    x0 = jnp.asarray(0.1 * rng.standard_normal(n), jnp.float32)
    ref = cgx.cg_solve(s, b, x0, tol=1e-6, maxiter=1000)
    res = sr_stencil_cg(s, b, x0, tol=1e-6, maxiter=1000, mode="rp",
                        interpret=True)
    assert bool(res.converged)
    assert abs(int(res.iterations) - int(ref.iterations)) <= 1
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               atol=1e-5)


def test_sr_2d_and_27point(rng):
    s2 = poisson2d_stencil(33, 29)
    b2 = jnp.asarray(rng.standard_normal(s2.shape[0]), jnp.float32)
    ref = cgx.cg_solve(s2, b2, tol=1e-6, maxiter=3000)
    res = sr_stencil_cg(s2, b2, tol=1e-6, maxiter=3000, mode="rp",
                        interpret=True)
    assert abs(int(res.iterations) - int(ref.iterations)) <= 1
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               atol=1e-4)

    taps = tuple((dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                 for dz in (-1, 0, 1))
    coeffs = tuple(26.5 if t == (0, 0, 0) else -1.0 for t in taps)
    s27 = GeneralStencil3D(nx=8, ny=9, nz=10, taps=taps, coeffs=coeffs)
    b27 = jnp.asarray(rng.standard_normal(s27.shape[0]), jnp.float32)
    ref = cgx.cg_solve(s27, b27, tol=1e-6, maxiter=1000)
    res = sr_stencil_cg(s27, b27, tol=1e-6, maxiter=1000, mode="rpq",
                        interpret=True)
    assert int(res.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               atol=1e-4)


def test_auto_solve_sr_backend(rng):
    """auto_solve dispatches backend="sr_stencil" (interpret on CPU), and
    track_history falls back to a history-capable path."""
    from cgx.solve.auto import auto_solve

    s = poisson3d_stencil(10, 11, 9)
    b = jnp.asarray(rng.standard_normal(s.shape[0]), jnp.float32)
    ref = cgx.cg_solve(s, b, tol=1e-6, maxiter=1500)
    res = auto_solve(s, b, tol=1e-6, maxiter=1500, backend="sr_stencil")
    assert int(res.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               atol=1e-5)
    hist = auto_solve(s, b, tol=1e-6, maxiter=1500, backend="sr_stencil",
                      track_history=True)
    assert hist.history.shape[0] > 0


def test_sr_mode_ladder():
    """Footprint tiers: denser residency at smaller n; None past the
    p-resident reach."""
    taps7 = ((0, 0, 0), (0, 0, 1), (0, 0, -1), (0, 1, 0), (0, -1, 0),
             (1, 0, 0), (-1, 0, 0))
    assert sr_mode(128, 128, 128, taps7) == "rpq"
    assert sr_mode(216, 216, 216, taps7) == "rp"
    assert sr_mode(288, 288, 288, taps7) == "p"
    assert sr_mode(430, 430, 430, taps7) is None
