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


def _scaled_poisson3d_dia(nx, ny, nz, rng):
    """Variable-coefficient SPD 7-point operator: D A D for random D > 0."""
    from cgx.io.poisson import poisson3d_dia
    from cgx.sparse.types import DIAMatrix
    a = poisson3d_dia(nx, ny, nz)
    n = a.shape[0]
    d = rng.uniform(0.5, 2.0, n)
    data = np.asarray(a.data).copy()
    for k, off in enumerate(a.offsets):
        tgt = np.arange(n) + off
        ok = (tgt >= 0) & (tgt < n)
        data[k, ok] *= d[ok] * d[tgt[ok]]
    return DIAMatrix(data=jnp.asarray(data), offsets=a.offsets,
                     shape=a.shape)


@pytest.mark.parametrize("jacobi", [True, False])
def test_sr_dia_matches_cg_solve(jacobi, rng):
    """Variable-coefficient DIA through the rpq semi-resident tier:
    streamed symmetric plane windows + weighted true-residual test ==
    (Jacobi-P)CG trajectories."""
    import cgx
    from cgx.kernels.fused_semiresident import sr_dia_cg, sr_dia_supported

    a = _scaled_poisson3d_dia(10, 9, 11, rng).astype(jnp.float32)
    assert sr_dia_supported(a)
    n = a.shape[0]
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    m = cgx.JacobiPrecond.from_matrix(a) if jacobi else None
    ref = cgx.cg_solve(a, b, tol=1e-6, maxiter=1000, preconditioner=m)
    res = sr_dia_cg(a, b, tol=1e-6, maxiter=1000, jacobi=jacobi,
                    interpret=True)
    assert bool(res.converged)
    assert abs(int(res.iterations) - int(ref.iterations)) <= 1
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=5e-3, atol=5e-4)


def test_sr_dia_multiblock_and_x0(rng):
    """Multi-block plane-window streaming (bl < l_real) and the
    initial-guess correction solve."""
    import cgx
    from cgx.kernels.fused_dia_cg import dia_prep
    from cgx.kernels.fused_semiresident import sr_cg, sr_dia_cg

    a = _scaled_poisson3d_dia(7, 19, 17, rng).astype(jnp.float32)
    n = a.shape[0]
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    nx, ny, nz, taps, coeffs, planes, e, weight, sym = dia_prep(
        a, jnp.float32, jacobi=True)
    assert sym
    g = make_sr_geometry(nx, ny, nz, taps, mode="rpq", bl=256,
                         n_planes=int(planes.shape[0]), weighted=True,
                         sym=sym)
    assert g.nb >= 2
    bb = jnp.sum(b.astype(jnp.float32) ** 2)
    res = sr_cg(g, e * b, coeffs=coeffs, planes=planes, w=weight,
                tol=1e-6, maxiter=1000, interpret=True, b_norm_sq=bb)
    m = cgx.JacobiPrecond.from_matrix(a)
    ref = cgx.cg_solve(a, b, tol=1e-6, maxiter=1000, preconditioner=m)
    assert abs(int(res.iterations) - int(ref.iterations)) <= 1
    np.testing.assert_allclose(np.asarray(e * res.x), np.asarray(ref.x),
                               rtol=5e-3, atol=5e-4)

    x0 = jnp.asarray(0.1 * rng.standard_normal(n), jnp.float32)
    ref0 = cgx.cg_solve(a, b, x0, tol=1e-6, maxiter=1000,
                        preconditioner=m)
    res0 = sr_dia_cg(a, b, x0, tol=1e-6, maxiter=1000, interpret=True)
    assert abs(int(res0.iterations) - int(ref0.iterations)) <= 1
    np.testing.assert_allclose(np.asarray(res0.x), np.asarray(ref0.x),
                               rtol=5e-3, atol=5e-4)


def test_sr_dia_wide_band_27pt(rng):
    """Generic banded 27-point variable-coefficient DIA (the wide-tap
    configuration where halving plane traffic pays most)."""
    import cgx
    from cgx.sparse.types import DIAMatrix
    from cgx.kernels.fused_semiresident import sr_dia_cg, sr_dia_supported

    nx, ny, nz = 5, 6, 7
    n = nx * ny * nz
    i = np.arange(n)
    kz = i % nz
    jy = (i // nz) % ny
    ix = i // (ny * nz)
    pos = [(dx, dy, dk) for dx in (0, 1) for dy in (-1, 0, 1)
           for dk in (-1, 0, 1) if (dx, dy, dk) > (0, 0, 0)]
    planes = {}
    diag = np.full(n, 0.05)
    for (dx, dy, dk) in pos:
        off = dx * ny * nz + dy * nz + dk
        ok = ((kz + dk >= 0) & (kz + dk < nz) & (jy + dy >= 0)
              & (jy + dy < ny) & (ix + dx < nx))
        v = np.where(ok, -rng.uniform(0.2, 1.0, n), 0.0)
        neg = np.zeros(n)
        neg[off:] = v[:-off]
        planes[off] = v
        planes[-off] = neg
        diag += np.abs(v)
        np.add.at(diag, np.arange(off, n), np.abs(v[:-off]))
    offs = sorted(list(planes) + [0])
    planes[0] = diag
    data = np.stack([planes[o] for o in offs]).astype(np.float32)
    d = DIAMatrix(data=jnp.asarray(data), offsets=tuple(offs),
                  shape=(n, n), grid=(nx, ny, nz))
    assert sr_dia_supported(d)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    m = cgx.JacobiPrecond.from_matrix(d)
    ref = cgx.cg_solve(d, b, tol=1e-6, maxiter=500, preconditioner=m)
    res = sr_dia_cg(d, b, tol=1e-6, maxiter=500, interpret=True)
    assert bool(res.converged)
    assert abs(int(res.iterations) - int(ref.iterations)) <= 1
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=5e-3, atol=5e-4)


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


@pytest.mark.parametrize("mode", ["rp", "p"])
def test_sr_dia_rp_p_tiers_match_rpq(mode, rng):
    """VERDICT r2 #4: the rp/p tiers now take streamed coefficient planes
    (the update sweep's remat apply streams the plane windows too) —
    trajectory-identical to the rpq tier and to cg_solve."""
    import cgx
    from cgx.io.poisson import poisson3d_dia
    from cgx.kernels.fused_semiresident import sr_dia_cg

    a = poisson3d_dia(8, 6, 7, dtype=np.float32)
    # Variable coefficients: symmetric D A D scaling.
    import dataclasses
    d = np.exp(rng.uniform(-0.4, 0.4, a.shape[0]))
    data = np.asarray(a.data)
    n = a.shape[0]
    sd = np.zeros_like(data)
    for t, off in enumerate(a.offsets):
        i = np.arange(max(0, -off), min(n, n - off))
        sd[t, i] = d[i] * data[t, i] * d[i + off]
    av = dataclasses.replace(a, data=jnp.asarray(sd.astype(np.float32)))

    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    rpq = sr_dia_cg(av, b, tol=1e-6, maxiter=500, interpret=True,
                    mode="rpq")
    res = sr_dia_cg(av, b, tol=1e-6, maxiter=500, interpret=True,
                    mode=mode)
    assert bool(res.converged)
    assert int(res.iterations) == int(rpq.iterations)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(rpq.x),
                               rtol=1e-5, atol=1e-6)
    m = cgx.JacobiPrecond.from_matrix(av)
    xla = cgx.cg_solve(av, b, tol=1e-6, maxiter=500, preconditioner=m)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(xla.x),
                               rtol=5e-3, atol=5e-4)
