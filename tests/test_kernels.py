"""Pallas kernel tests (interpret mode on CPU — SURVEY.md §4.1)."""
import jax.numpy as jnp
import numpy as np
import pytest

from cgx.io.poisson import poisson2d
from cgx.kernels.bsr import BlockELL, bell_from_bsr, bell_spmm, bell_spmv
from cgx.sparse.types import bsr_from_csr, csr_from_scipy
from cgx.ops.spmv import spmm, spmv

from conftest import random_spd_csr


def _bell(a_csr, bs):
    return bell_from_bsr(bsr_from_csr(a_csr, bs))


@pytest.mark.parametrize("bs,k", [(8, 8), (8, 16), (16, 8)])
def test_bell_spmm_matches_xla(bs, k, rng):
    a = poisson2d(10, 12)
    bell = _bell(a, bs)
    m = bell.shape[0]
    m_pad = bell.values.shape[0] * bs
    x = rng.standard_normal((m_pad, k)).astype(np.float32)
    y = bell_spmm(bell.astype(jnp.float32), jnp.asarray(x), interpret=True)

    a_bsr = bsr_from_csr(a, bs).astype(jnp.float32)
    ref = spmm(a_bsr, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_bell_spmv_random_spd(rng):
    s = random_spd_csr(96, 0.1, rng)
    a = csr_from_scipy(s)
    bell = _bell(a, 8).astype(jnp.float32)
    x = rng.standard_normal(96).astype(np.float32)
    y = bell_spmv(bell, jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(np.asarray(y)[:96], s @ x, rtol=1e-4,
                               atol=1e-4)


def test_bell_engines_agree_beyond_prefetch_chunk(rng):
    """The single-call DMA engine covers sizes the scalar-prefetch engine
    had to chunk (>256 block rows) — identical results from both."""
    import scipy.sparse as sp
    nbr, bs, k = 300, 8, 16          # 300 block rows > _MAX_PREFETCH_ROWS
    n = nbr * bs
    d = sp.random(nbr, nbr, density=0.01, random_state=0)
    d = d + sp.identity(nbr)
    mask = sp.kron((d != 0).astype(np.float64), np.ones((bs, bs)))
    m = sp.csr_matrix(mask.multiply(
        sp.random(n, n, density=1.0, random_state=1)))
    a = csr_from_scipy(m)
    bell = _bell(a, bs).astype(jnp.float32)
    x = rng.standard_normal((n, k)).astype(np.float32)
    y_dma = bell_spmm(bell, jnp.asarray(x), interpret=True, engine="dma")
    y_pre = bell_spmm(bell, jnp.asarray(x), interpret=True,
                      engine="prefetch")
    np.testing.assert_allclose(np.asarray(y_dma), np.asarray(y_pre),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_dma)[:n], m @ x, rtol=1e-3,
                               atol=1e-3)


def test_bell_dma_single_block_per_row(rng):
    """wb == 1: the DMA engine's j+1 prefetch branch never fires — the
    synchronous j == 0 copy must carry the whole row."""
    import scipy.sparse as sp
    nbr, bs = 12, 8
    n = nbr * bs
    d = sp.block_diag([rng.standard_normal((bs, bs)) for _ in range(nbr)],
                      format="csr")
    a = csr_from_scipy(sp.csr_matrix(d))
    bell = _bell(a, bs).astype(jnp.float32)
    assert bell.wb == 1
    x = rng.standard_normal((n, 4)).astype(np.float32)
    y = bell_spmm(bell, jnp.asarray(x), interpret=True, engine="dma")
    np.testing.assert_allclose(np.asarray(y)[:n], d @ x, rtol=1e-4,
                               atol=1e-4)


def test_bell_padding_blocks_are_inert(rng):
    """Rows with fewer blocks than wb must not pick up contributions."""
    import scipy.sparse as sp
    # Block-diagonal + one dense block row => very uneven blocks/row.
    n = 64
    d = sp.lil_matrix((n, n))
    for i in range(n):
        d[i, i] = 2.0
    d[0, :] = 1.0
    d[:, 0] = 1.0
    a = csr_from_scipy(sp.csr_matrix(d))
    bell = _bell(a, 8).astype(jnp.float32)
    assert bell.wb > 1
    x = rng.standard_normal(n).astype(np.float32)
    y = bell_spmv(bell, jnp.asarray(x), interpret=True)
    ref = sp.csr_matrix(d) @ x
    np.testing.assert_allclose(np.asarray(y)[:n], ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dims,br", [((5, 7, 6), 16), ((8, 8, 8), 32),
                                     ((11, 9, 13), 24), ((6, 6, 6), 8)])
def test_stencil3d_pallas_matches_xla(dims, br, rng):
    from cgx.kernels.stencil import stencil3d_spmv_pallas
    from cgx.sparse.stencil import poisson3d_stencil
    nx, ny, nz = dims
    s = poisson3d_stencil(nx, ny, nz)
    x = jnp.asarray(rng.standard_normal(nx * ny * nz), jnp.float32)
    y = stencil3d_spmv_pallas(x, nx=nx, ny=ny, nz=nz, block_rows=br,
                              interpret=True)
    ref = spmv(s, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("dims", [(6, 8, 7), (5, 16, 13), (9, 8, 11)])
def test_fused_stencil_cg_matches_cg_solve(dims, rng):
    from cgx.kernels.fused_cg import fused_stencil_cg, supports
    from cgx.sparse.stencil import poisson3d_stencil
    from cgx.solve.cg import cg_solve
    nx, ny, nz = dims
    s = poisson3d_stencil(nx, ny, nz)
    assert supports(s)
    n = nx * ny * nz
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    ref = cg_solve(s, b, tol=1e-5, maxiter=500)
    res = fused_stencil_cg(s, b, tol=1e-5, maxiter=500, interpret=True)
    assert bool(res.converged)
    assert abs(int(res.iterations) - int(ref.iterations)) <= 2
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=2e-3, atol=2e-4)


def test_fused_stencil_cg_fixed_iters_trajectory(rng):
    """tol=0 fixed-iteration trajectory matches the XLA loop closely."""
    from cgx.kernels.fused_cg import fused_stencil_cg
    from cgx.sparse.stencil import poisson3d_stencil
    from cgx.solve.cg import cg_solve
    s = poisson3d_stencil(4, 8, 6)
    b = jnp.asarray(rng.standard_normal(192), jnp.float32)
    ref = cg_solve(s, b, tol=0.0, maxiter=25)
    res = fused_stencil_cg(s, b, tol=0.0, maxiter=25, interpret=True)
    assert int(res.iterations) == 25
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-3, atol=1e-4)


def test_fused_stencil_cg_rejects_unsupported():
    from cgx.kernels.fused_cg import fused_stencil_cg, supports
    from cgx.sparse.stencil import poisson3d_stencil, Stencil3D
    s = Stencil3D(5000, 2, 2, 6.0, -1.0, -1.0, -1.0)  # nx > 4096
    assert not supports(s)
    import pytest as _pt
    with _pt.raises(ValueError):
        fused_stencil_cg(s, jnp.zeros(20000, jnp.float32))
    # v2 lifts the old ny % 8 restriction:
    assert supports(poisson3d_stencil(5, 7, 6))


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
def test_fused_dia_cg_matches_cg_solve(jacobi, rng):
    import cgx
    from cgx.kernels.fused_dia_cg import fused_dia_cg, supports_dia
    a = _scaled_poisson3d_dia(6, 8, 7, rng)
    assert supports_dia(a)
    n = a.shape[0]
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    a32 = a.astype(jnp.float32)
    m = cgx.JacobiPrecond.from_matrix(a32) if jacobi else None
    ref = cgx.cg_solve(a32, b, tol=1e-5, maxiter=800, preconditioner=m)
    res = fused_dia_cg(a32, b, tol=1e-5, maxiter=800, jacobi=jacobi,
                       interpret=True)
    assert bool(res.converged)
    assert abs(int(res.iterations) - int(ref.iterations)) <= 2
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=5e-3, atol=5e-4)


def test_fused_dia_cg_pattern_detection():
    from cgx.kernels.fused_dia_cg import dia_pattern_dims
    from cgx.io.poisson import poisson3d_dia, poisson2d_dia
    assert dia_pattern_dims(poisson3d_dia(4, 5, 6)) == (4, 5, 6)
    assert dia_pattern_dims(poisson2d_dia(8, 8)) is None


def test_fused_stencil_cg_x0_and_history(rng):
    from cgx.kernels.fused_cg import fused_stencil_cg
    from cgx.sparse.stencil import poisson3d_stencil
    from cgx.solve.cg import cg_solve
    s = poisson3d_stencil(6, 8, 7)
    n = 336
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 0.1)
    ref = cg_solve(s, b, x0, tol=1e-5, maxiter=500, track_history=True)
    res = fused_stencil_cg(s, b, x0, tol=1e-5, maxiter=500,
                           track_history=True, interpret=True)
    assert bool(res.converged)
    assert abs(int(res.iterations) - int(ref.iterations)) <= 2
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=5e-3, atol=5e-4)
    k = min(int(res.iterations), int(ref.iterations))
    np.testing.assert_allclose(np.asarray(res.history)[:k],
                               np.asarray(ref.history)[:k], rtol=2e-2)
    # Warm start at the solution: immediate convergence.
    res2 = fused_stencil_cg(s, b, ref.x, tol=1e-4, maxiter=500,
                            interpret=True)
    assert int(res2.iterations) == 0


def test_fused_dia_cg_x0(rng):
    import cgx
    from cgx.kernels.fused_dia_cg import fused_dia_cg
    a = _scaled_poisson3d_dia(5, 6, 7, rng).astype(jnp.float32)
    n = a.shape[0]
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 0.1)
    m = cgx.JacobiPrecond.from_matrix(a)
    ref = cgx.cg_solve(a, b, x0, tol=1e-5, maxiter=800, preconditioner=m)
    res = fused_dia_cg(a, b, x0, tol=1e-5, maxiter=800, interpret=True)
    assert bool(res.converged)
    assert abs(int(res.iterations) - int(ref.iterations)) <= 2
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=5e-3, atol=5e-4)


def test_fused_dia_wrap_entries_rejected(rng):
    """A 7-point-pattern DIA matrix with nonzero x-plane-crossing entries
    is a DIFFERENT operator under the fused lane layout (ADVICE r1): the
    check must detect it and fused_dia_cg must refuse to run."""
    from cgx.kernels.fused_dia_cg import (fused_dia_cg, supports_dia,
                                          wrap_entries_zero)
    from cgx.io.poisson import poisson3d_dia
    from cgx.sparse.types import DIAMatrix

    clean = poisson3d_dia(4, 5, 6)
    assert wrap_entries_zero(clean)

    # Inject a nonzero at an x-plane-crossing slot of offset +1:
    # position (x=1, j=ny-1, k=nz-1) -> flat 1*30 + 4*6 + 5 = 59.
    data = np.asarray(clean.data).copy()
    data[4, 59] = 1.0
    data[2, 60] = 1.0  # keep it symmetric (offset -1 at (2, 0, 0))
    dirty = DIAMatrix(data=jnp.asarray(data), offsets=clean.offsets,
                      shape=clean.shape)
    assert supports_dia(dirty)          # pattern alone still matches
    assert not wrap_entries_zero(dirty)
    b = jnp.asarray(rng.standard_normal(120), jnp.float32)
    with pytest.raises(ValueError, match="x-plane"):
        fused_dia_cg(dirty.astype(jnp.float32), b, interpret=True)


def test_fused_dia_wrap_entries_offset_nz(rng):
    from cgx.kernels.fused_dia_cg import wrap_entries_zero
    from cgx.io.poisson import poisson3d_dia
    from cgx.sparse.types import DIAMatrix

    clean = poisson3d_dia(4, 5, 6)
    # offset +nz entry inside the j == ny-1 plane: (x=0, j=4, k=2) -> 26.
    data = np.asarray(clean.data).copy()
    data[5, 26] = 0.5
    dirty = DIAMatrix(data=jnp.asarray(data), offsets=clean.offsets,
                      shape=clean.shape)
    assert not wrap_entries_zero(dirty)


def test_fused_dia_sym_engine_selected(rng):
    """Symmetric DIA data routes to the symmetric engine (3 streamed
    plane windows instead of 6 pipelined blocks — ROADMAP r2 #1); the
    unscaled path streams the diagonal as a 4th window."""
    from cgx.kernels.fused_dia_cg import (build_fused_dia,
                                          data_symmetric_or_none)
    a = _scaled_poisson3d_dia(6, 8, 7, rng).astype(jnp.float32)
    assert data_symmetric_or_none(a) is True
    eng, e, planes = build_fused_dia(a, jnp.float32, jacobi=True,
                                     interpret=True)
    assert eng.sym and planes.shape[0] == 3
    assert eng.coeffs == (1.0, None, None, None)    # unit diag folded
    eng2, _, planes2 = build_fused_dia(a, jnp.float32, jacobi=False,
                                       interpret=True)
    assert eng2.sym and planes2.shape[0] == 4


def test_fused_dia_asymmetric_falls_back(rng):
    """Non-symmetric data (an invalid CG operator, but a legal DIA
    pattern) must NOT silently enable the mirror-tap kernel: the builder
    falls back to the 6/7-plane engine, whose output matches the generic
    SpMV exactly."""
    from cgx.io.poisson import poisson3d_dia
    from cgx.kernels.fused_dia_cg import (build_fused_dia,
                                          data_symmetric_or_none)
    from cgx.sparse.types import DIAMatrix

    clean = poisson3d_dia(6, 8, 7)
    data = np.asarray(clean.data).copy()
    data[4, 100] *= 1.5          # break symmetry at one interior entry
    a = DIAMatrix(data=jnp.asarray(data, jnp.float32),
                  offsets=clean.offsets, shape=clean.shape)
    assert data_symmetric_or_none(a) is False
    eng, e, planes = build_fused_dia(a, jnp.float32, jacobi=True,
                                     interpret=True)
    assert not eng.sym and planes.shape[0] >= 6


def test_fused_2d_stencil_matches_cg_solve(rng):
    """2-D 5-point fused path (engine dims (nx, 1, ny))."""
    from cgx.kernels.fused_cg import fused_stencil_cg, supports
    from cgx.sparse.stencil import poisson2d_stencil
    from cgx.solve.cg import cg_solve
    s = poisson2d_stencil(17, 13)
    assert supports(s)
    n = 17 * 13
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    ref = cg_solve(s, b, tol=1e-5, maxiter=500)
    res = fused_stencil_cg(s, b, tol=1e-5, maxiter=500, interpret=True)
    assert bool(res.converged)
    assert abs(int(res.iterations) - int(ref.iterations)) <= 2
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=5e-3, atol=5e-4)


def test_fused_27point_matches_cg_solve(rng):
    """27-point general-stencil fused path (corner taps: simultaneous
    row + lane shifts)."""
    from cgx.kernels.fused_cg import fused_stencil_cg, supports
    from cgx.sparse.stencil import poisson3d_27point
    from cgx.solve.cg import cg_solve
    s = poisson3d_27point(6, 7, 5)
    assert supports(s)
    n = 6 * 7 * 5
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    ref = cg_solve(s, b, tol=1e-5, maxiter=500)
    res = fused_stencil_cg(s, b, tol=1e-5, maxiter=500, interpret=True)
    assert bool(res.converged)
    assert abs(int(res.iterations) - int(ref.iterations)) <= 2
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=5e-3, atol=5e-4)


def test_resident_cg_matches_cg_solve(rng):
    """Whole-solve resident kernel (one pallas_call, textbook beta):
    trajectory-identical to the XLA loop."""
    from cgx.kernels.fused_cg import stencil_taps
    from cgx.kernels.fused_resident import (make_resident_geometry,
                                            resident_cg)
    from cgx.sparse.stencil import poisson3d_stencil
    from cgx.solve.cg import cg_solve

    s = poisson3d_stencil(10, 8, 9)
    n = s.shape[0]
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    nx, ny, nz, taps, coeffs = stencil_taps(s)
    g = make_resident_geometry(nx, ny, nz, taps)
    res = resident_cg(g, b, coeffs=coeffs, tol=1e-6, maxiter=500,
                      interpret=True)
    ref = cg_solve(s, b, tol=1e-6, maxiter=500)
    assert bool(res.converged)
    assert int(res.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=5e-3, atol=5e-4)
    # warm start
    x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 0.1)
    res2 = resident_cg(g, b, x0, coeffs=coeffs, tol=1e-6, maxiter=500,
                       interpret=True)
    ref2 = cg_solve(s, b, x0, tol=1e-6, maxiter=500)
    assert abs(int(res2.iterations) - int(ref2.iterations)) <= 1


def test_resident_cg_dia_sym(rng):
    """Resident kernel on a variable-coefficient symmetric DIA operator
    (scaled planes + weighted true-residual test) == Jacobi-PCG."""
    import cgx
    from cgx.kernels.fused_dia_cg import _DIA_TAPS_SYM, build_fused_dia
    from cgx.kernels.fused_resident import (make_resident_geometry,
                                            resident_cg)
    from cgx.ops.blas import safe_recip

    a = _scaled_poisson3d_dia(10, 8, 9, rng).astype(jnp.float32)
    n = a.shape[0]
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    eng, e, planes = build_fused_dia(a, jnp.float32, jacobi=True,
                                     interpret=True)
    assert eng.sym
    g = make_resident_geometry(10, 8, 9, _DIA_TAPS_SYM)
    res = resident_cg(g, e * b, coeffs=eng.coeffs, planes=planes,
                      weight=safe_recip(e * e), tol=1e-6, maxiter=500,
                      sym=True, interpret=True)
    ref = cgx.cg_solve(a, b, tol=1e-6, maxiter=500,
                       preconditioner=cgx.JacobiPrecond.from_matrix(a))
    assert bool(res.converged)
    assert abs(int(res.iterations) - int(ref.iterations)) <= 1
    np.testing.assert_allclose(np.asarray(e * res.x), np.asarray(ref.x),
                               rtol=5e-3, atol=5e-4)


def _poisson11_dia(nx, ny, nz, rng):
    """SPD 11-point banded operator: 7-point Laplacian + symmetric
    ±(nz+1) edge coupling (grid-metadata-driven decomposition test)."""
    from cgx.io.poisson import poisson3d_dia
    from cgx.sparse.types import DIAMatrix
    a = poisson3d_dia(nx, ny, nz)
    n = a.shape[0]
    flat = np.arange(n)
    k = flat % nz
    j = (flat // nz) % ny
    c = -0.25 * (1.0 + 0.5 * rng.random(n))     # small: keep SPD
    up = np.where((k < nz - 1) & (j < ny - 1), c, 0.0)      # offset +nz+1
    dn = np.zeros(n)
    dn[nz + 1:] = up[:-(nz + 1)]                 # symmetric mirror
    data = np.concatenate([dn[None], np.asarray(a.data), up[None]])
    # strengthen the diagonal to preserve SPD
    data[1 + 3] = 6.0 + 2 * 0.5
    offsets = (-(nz + 1),) + tuple(a.offsets) + (nz + 1,)
    return DIAMatrix(data=jnp.asarray(data), offsets=offsets,
                     shape=(n, n), grid=(nx, ny, nz))


def test_fused_dia_generic_banded_11point(rng):
    """Arbitrary banded offset sets decompose via grid metadata
    (ROADMAP r2 #8): an 11-point operator (7-point + ±(nz+1) coupling)
    runs the fused engine and the resident kernel, matching cg_solve."""
    import cgx
    from cgx.kernels.fused_dia_cg import (dia_engine_spec, fused_dia_cg,
                                          supports_dia,
                                          wrap_entries_zero,
                                          data_symmetric_or_none)
    from cgx.kernels.fused_resident import resident_dia_cg

    a = _poisson11_dia(8, 7, 6, rng).astype(jnp.float32)
    spec = dia_engine_spec(a)
    assert spec is not None and supports_dia(a)
    assert spec[3][0] == (0, -1, -1) and spec[3][-1] == (0, 1, 1)
    assert wrap_entries_zero(a)
    assert data_symmetric_or_none(a) is True
    n = a.shape[0]
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    m = cgx.JacobiPrecond.from_matrix(a)
    ref = cgx.cg_solve(a, b, tol=1e-5, maxiter=800, preconditioner=m)
    res = fused_dia_cg(a, b, tol=1e-5, maxiter=800, interpret=True)
    assert bool(res.converged)
    assert abs(int(res.iterations) - int(ref.iterations)) <= 2
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=5e-3, atol=5e-4)
    res2 = resident_dia_cg(a, b, tol=1e-5, maxiter=800, interpret=True)
    assert bool(res2.converged)
    assert abs(int(res2.iterations) - int(ref.iterations)) <= 2
    np.testing.assert_allclose(np.asarray(res2.x), np.asarray(ref.x),
                               rtol=5e-3, atol=5e-4)


def test_fused_dia_2d_via_grid_metadata(rng):
    """A 2-D 5-point DIA with grid=(nx, 1, ny) reaches the fused engine
    (offsets ±1 → lane taps, ±ny → row taps)."""
    import cgx
    from cgx.io.poisson import poisson2d_dia
    from cgx.kernels.fused_dia_cg import fused_dia_cg, supports_dia
    from cgx.sparse.types import DIAMatrix
    import dataclasses

    a0 = poisson2d_dia(12, 9)
    assert not supports_dia(a0)              # no metadata: undecodable
    a = dataclasses.replace(a0.astype(jnp.float32), grid=(12, 1, 9))
    assert supports_dia(a)
    n = a.shape[0]
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    ref = cgx.cg_solve(a, b, tol=1e-5, maxiter=500,
                       preconditioner=cgx.JacobiPrecond.from_matrix(a))
    res = fused_dia_cg(a, b, tol=1e-5, maxiter=500, interpret=True)
    assert bool(res.converged)
    assert abs(int(res.iterations) - int(ref.iterations)) <= 2
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=5e-3, atol=5e-4)


def test_fused_bf16_iterate_converges(rng):
    """bf16 iterate + fp32 dot accumulation (ROADMAP r2 #2): the fused
    engine and the resident kernel both reach a bf16-appropriate
    tolerance, with residuals tracking the fp32 run's trajectory at low
    iteration counts (loss of orthogonality stays bounded)."""
    from cgx.kernels.fused_cg import fused_stencil_cg, stencil_taps
    from cgx.kernels.fused_resident import (make_resident_geometry,
                                            resident_cg)
    from cgx.sparse.stencil import poisson3d_stencil
    from cgx.solve.cg import cg_solve

    s = poisson3d_stencil(10, 8, 9)
    n = s.shape[0]
    b32 = jnp.asarray(rng.standard_normal(n), jnp.float32)
    b16 = b32.astype(jnp.bfloat16)

    # bf16 can't hit 1e-6 relative residual; 2e-2 is well within reach.
    res = fused_stencil_cg(s, b16, tol=2e-2, maxiter=200, interpret=True)
    assert bool(res.converged)
    ref = cg_solve(s, b32, tol=2e-2, maxiter=200)
    # Iterations may differ by a few in bf16 — but not blow up.
    assert int(res.iterations) <= int(ref.iterations) + 10
    np.testing.assert_allclose(np.asarray(res.x, np.float32),
                               np.asarray(ref.x), rtol=0.1, atol=0.05)

    nx, ny, nz, taps, coeffs = stencil_taps(s)
    g = make_resident_geometry(nx, ny, nz, taps)
    res2 = resident_cg(g, b16, coeffs=coeffs, tol=2e-2, maxiter=200,
                       interpret=True)
    assert bool(res2.converged)
    assert int(res2.iterations) <= int(ref.iterations) + 10
    np.testing.assert_allclose(np.asarray(res2.x, np.float32),
                               np.asarray(ref.x), rtol=0.1, atol=0.05)


def test_general_stencil_matvec_matches_scipy(rng):
    """GeneralStencil3D.matvec against an explicitly assembled matrix."""
    from cgx.sparse.stencil import poisson3d_27point
    s = poisson3d_27point(4, 3, 5)
    n = 60
    x = rng.standard_normal(n)
    # Assemble densely from the tap definition.
    a = np.zeros((n, n))
    for (dx, dy, dz), c in zip(s.taps, s.coeffs):
        for i in range(4):
            for j in range(3):
                for k in range(5):
                    ii, jj, kk = i + dx, j + dy, k + dz
                    if 0 <= ii < 4 and 0 <= jj < 3 and 0 <= kk < 5:
                        a[(i * 3 + j) * 5 + k, (ii * 3 + jj) * 5 + kk] = c
    np.testing.assert_allclose(
        np.asarray(s.matvec(jnp.asarray(x, jnp.float64))), a @ x,
        rtol=1e-12, atol=1e-12)
    # SPD sanity: all eigenvalues positive.
    assert np.linalg.eigvalsh(a).min() > 0


def test_fused_multi_rhs_stencil(rng):
    """Band-stacked multi-RHS fused CG == per-column cg_solve (VERDICT
    r1 #4 / ROADMAP #2)."""
    from cgx.kernels.fused_multi import fused_stencil_cg_multi
    from cgx.sparse.stencil import poisson3d_stencil
    from cgx.solve.block import cg_solve_multi
    s = poisson3d_stencil(6, 7, 5)
    n, k = 210, 4
    b = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
    ref = cg_solve_multi(s, b, tol=1e-5, maxiter=500)
    res = fused_stencil_cg_multi(s, b, tol=1e-5, maxiter=500,
                                 interpret=True)
    assert bool(jnp.all(res.converged))
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=5e-3, atol=5e-4)


def test_fused_multi_rhs_dia_jacobi(rng):
    import cgx
    from cgx.kernels.fused_multi import fused_dia_cg_multi
    from tests.test_kernels import _scaled_poisson3d_dia
    a = _scaled_poisson3d_dia(6, 8, 7, rng).astype(jnp.float32)
    n, k = a.shape[0], 3
    b = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
    m = cgx.JacobiPrecond.from_matrix(a)
    res = fused_dia_cg_multi(a, b, tol=1e-5, maxiter=800, interpret=True)
    assert bool(jnp.all(res.converged))
    for i in range(k):
        ref = cgx.cg_solve(a, b[:, i], tol=1e-5, maxiter=800,
                           preconditioner=m)
        np.testing.assert_allclose(np.asarray(res.x[:, i]),
                                   np.asarray(ref.x), rtol=5e-3, atol=5e-4)


def test_fused_multi_rhs_dia_k8_band_tiled(rng):
    """k=8 exercises the bps=4 band-tiled grid together with the
    symmetric plane-window sharing and the weighted residual."""
    import cgx
    from cgx.kernels.fused_multi import fused_dia_cg_multi
    from tests.test_kernels import _scaled_poisson3d_dia
    a = _scaled_poisson3d_dia(5, 6, 7, rng).astype(jnp.float32)
    n, k = a.shape[0], 8
    b = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
    m = cgx.JacobiPrecond.from_matrix(a)
    res = fused_dia_cg_multi(a, b, tol=1e-5, maxiter=800, interpret=True)
    assert bool(jnp.all(res.converged))
    for i in range(k):
        ref = cgx.cg_solve(a, b[:, i], tol=1e-5, maxiter=800,
                           preconditioner=m)
        np.testing.assert_allclose(np.asarray(res.x[:, i]),
                                   np.asarray(ref.x), rtol=5e-3, atol=5e-4)


def test_fused_multi_rhs_wide_band_27pt(rng):
    """Generic banded 27-point variable-coefficient DIA through the
    multi engine (the wide-band case where plane sharing pays 1.79x on
    chip) — interpret-mode parity vs per-column cg_solve."""
    import cgx
    from cgx.sparse.types import DIAMatrix
    from cgx.kernels.fused_multi import fused_dia_cg_multi
    from cgx.kernels.fused_dia_cg import supports_dia
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
    assert supports_dia(d)
    k = 4
    b = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
    res = fused_dia_cg_multi(d, b, tol=1e-6, maxiter=500, interpret=True)
    assert bool(jnp.all(res.converged))
    m = cgx.JacobiPrecond.from_matrix(d)
    for j in range(k):
        ref = cgx.cg_solve(d, b[:, j], tol=1e-8, maxiter=500,
                           preconditioner=m)
        np.testing.assert_allclose(np.asarray(res.x[:, j]),
                                   np.asarray(ref.x), rtol=5e-3,
                                   atol=5e-4)


def test_auto_solve_multi_rhs(rng):
    """auto_solve accepts (n, k) blocks and routes the batched solver."""
    import cgx
    from cgx.io.poisson import poisson2d
    a = poisson2d(10, 10)
    b = jnp.asarray(rng.standard_normal((100, 3)))
    res = cgx.auto_solve(a, b, tol=1e-8, maxiter=400)
    assert res.x.shape == (100, 3)
    assert bool(res.converged.all())
    for j in range(3):
        ref = cgx.cg_solve(a, b[:, j], tol=1e-8, maxiter=400)
        np.testing.assert_allclose(np.asarray(res.x[:, j]),
                                   np.asarray(ref.x), rtol=1e-5,
                                   atol=1e-7)


def test_fused_multi_rhs_x0(rng):
    from cgx.kernels.fused_multi import fused_stencil_cg_multi
    from cgx.sparse.stencil import poisson3d_stencil
    s = poisson3d_stencil(5, 6, 7)
    n, k = 210, 3
    b = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32) * 0.1)
    res = fused_stencil_cg_multi(s, b, x0, tol=1e-5, maxiter=500,
                                 interpret=True)
    assert bool(jnp.all(res.converged))
    from cgx.ops.spmv import spmm
    r = np.asarray(b) - np.asarray(spmm(s, res.x))
    assert np.linalg.norm(r) <= 2e-4 * np.linalg.norm(np.asarray(b))


def test_cg_solve_multi_fused_backend(rng):
    """cg_solve_multi(backend='fused') routes the band-stacked engine and
    matches the vmapped XLA path."""
    import cgx
    from cgx.solve.block import cg_solve_multi
    from cgx.sparse.stencil import poisson3d_stencil
    s = poisson3d_stencil(6, 7, 5)
    b = jnp.asarray(rng.standard_normal((210, 3)), jnp.float32)
    res = cg_solve_multi(s, b, tol=1e-5, maxiter=500, backend="fused")
    ref = cg_solve_multi(s, b, tol=1e-5, maxiter=500, backend="xla")
    assert bool(jnp.all(res.converged))
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=5e-3, atol=5e-4)


def test_fused_multi_rhs_bf16_planes(rng):
    """Multi-RHS engine with bf16 coefficient planes: converges to the
    perturbed operator's solutions, close to the fp32-plane results."""
    import cgx
    import dataclasses
    from cgx.kernels.fused_multi import fused_dia_cg_multi
    from cgx.io.poisson import poisson3d_dia

    d = poisson3d_dia(10, 9, 8, dtype=np.float32)
    n = d.shape[0]
    scale = jnp.asarray(1.0 + 0.3 * rng.random(n), jnp.float32)
    d = dataclasses.replace(d, data=d.data.at[3].mul(scale))
    k = 4
    b = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
    r16 = fused_dia_cg_multi(d, b, tol=1e-5, maxiter=800, interpret=True,
                             plane_dtype=jnp.bfloat16)
    r32 = fused_dia_cg_multi(d, b, tol=1e-5, maxiter=800, interpret=True)
    assert bool(jnp.all(r16.converged)) and bool(jnp.all(r32.converged))
    err = (np.linalg.norm(np.asarray(r16.x) - np.asarray(r32.x))
           / np.linalg.norm(np.asarray(r32.x)))
    assert err < 3e-2


def test_resident_bf16_planes(rng):
    """Whole-solve resident kernel with bf16 planes: converges to the
    perturbed operator's solution, close to the fp32-plane result, and
    the VMEM model reflects the narrower planes."""
    import dataclasses
    from cgx.kernels.fused_resident import (resident_dia_cg,
                                            resident_vmem_bytes,
                                            make_resident_geometry)
    from cgx.io.poisson import poisson3d_dia

    d = poisson3d_dia(10, 9, 8, dtype=np.float32)
    n = d.shape[0]
    scale = jnp.asarray(1.0 + 0.3 * rng.random(n), jnp.float32)
    d = dataclasses.replace(d, data=d.data.at[3].mul(scale))
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    r16 = resident_dia_cg(d, b, tol=1e-5, maxiter=800, interpret=True,
                          plane_dtype=jnp.bfloat16)
    r32 = resident_dia_cg(d, b, tol=1e-5, maxiter=800, interpret=True)
    assert bool(r16.converged) and bool(r32.converged)
    err = (np.linalg.norm(np.asarray(r16.x) - np.asarray(r32.x))
           / np.linalg.norm(np.asarray(r32.x)))
    assert err < 3e-2
    g = make_resident_geometry(10, 9, 8, (((0, 0, 0)), (0, 0, 1)))
    assert (resident_vmem_bytes(g, 4, True, 4, 2)
            < resident_vmem_bytes(g, 4, True, 4, 4))


def test_fused_multi_rhs_converged_column_freezes(rng):
    """Regression: a column that converges early must coast (alpha=beta=0
    on rz underflow) instead of going 0/0 = NaN — matching the vmapped
    XLA path's frozen-column semantics."""
    import cgx
    from cgx.kernels.fused_multi import fused_dia_cg_multi
    from cgx.io.poisson import poisson3d_dia

    d = poisson3d_dia(8, 8, 8, dtype=np.float32)
    n = d.shape[0]
    # Column 0: aligned with the operator's action on a smooth vector
    # (converges almost immediately); column 1: random (hard).
    easy = np.asarray(cgx.spmv(d, jnp.ones(n, jnp.float32)))
    hard = rng.standard_normal(n).astype(np.float32)
    b = jnp.stack([jnp.asarray(easy), jnp.asarray(hard)], axis=1)
    res = fused_dia_cg_multi(d, b, tol=1e-5, maxiter=600, interpret=True)
    assert np.isfinite(np.asarray(res.x)).all()
    assert bool(jnp.all(res.converged))
    for i in range(2):
        ref = cgx.cg_solve(d, b[:, i], tol=1e-5, maxiter=600,
                           preconditioner=cgx.JacobiPrecond.from_matrix(d))
        np.testing.assert_allclose(np.asarray(res.x[:, i]),
                                   np.asarray(ref.x), rtol=5e-3, atol=5e-4)


def test_bell_spmm_bf16_operands_fp32_out(rng):
    """bf16 blocks x bf16 X feed the MXU's native path; the revisited
    output block accumulates in fp32 (no precision loss across wb)."""
    import scipy.sparse as sp
    from cgx.kernels.bsr import bell_from_bsr, bell_spmm
    from cgx.sparse.types import bsr_from_csr, csr_from_scipy

    n, bs, k = 128, 16, 32
    dense = sp.random(n // bs, n // bs, 0.4, random_state=7).toarray()
    blocks = np.kron((dense != 0), np.ones((bs, bs)))
    m = sp.csr_matrix(blocks * rng.standard_normal((n, n)))
    a = bell_from_bsr(bsr_from_csr(csr_from_scipy(m), bs))
    x = rng.standard_normal((n, k)).astype(np.float32)

    y32 = bell_spmm(a, jnp.asarray(x), interpret=True)
    a16 = a.astype(jnp.bfloat16)
    y16 = bell_spmm(a16, jnp.asarray(x, jnp.bfloat16), interpret=True)
    assert y16.dtype == jnp.float32            # wide accumulator out
    rel = (np.linalg.norm(np.asarray(y16) - np.asarray(y32))
           / np.linalg.norm(np.asarray(y32)))
    assert rel < 3e-2                          # bf16 operand rounding

    yp = bell_spmm(a16, jnp.asarray(x, jnp.bfloat16), interpret=True,
                   engine="prefetch")
    np.testing.assert_allclose(np.asarray(yp), np.asarray(y16),
                               rtol=1e-6, atol=1e-6)


def test_auto_solve_multi_rhs_honors_overrides(rng):
    """Regression: 2-D b used to silently drop backend/track_history."""
    import cgx
    from cgx.io.poisson import poisson2d

    a = poisson2d(12, 12)
    b = jnp.asarray(rng.standard_normal((144, 3)))
    res = cgx.auto_solve(a, b, tol=1e-8, backend="xla")
    assert bool(res.converged.all())
    with pytest.raises(ValueError, match="track_history"):
        cgx.auto_solve(a, b, tol=1e-8, track_history=True)
    with pytest.raises(ValueError, match="mixed_precision"):
        cgx.auto_solve(a, b, tol=1e-8, mixed_precision=True)


def test_cg_solve_multi_sequential_backend_and_routing(rng):
    """VERDICT r2 #7: backend='sequential' matches the single-RHS fused
    solves exactly, and the auto router classifies narrow vs wide DIA by
    streamed-plane count (the measured winner's decision variable)."""
    import dataclasses

    from cgx.io.poisson import poisson3d_dia
    from cgx.kernels.fused_dia_cg import fused_dia_cg
    from cgx.solve.block import _narrow_band, cg_solve_multi

    a = poisson3d_dia(8, 6, 7, dtype=np.float32)
    assert _narrow_band(a)                      # 7-point sym: 4 planes
    # Non-symmetric data streams ALL 7 planes -> band engine territory.
    data = np.asarray(a.data).copy()
    data[1] *= 1.00005
    a_asym = dataclasses.replace(a, data=jnp.asarray(data))
    assert not _narrow_band(a_asym)
    n = a.shape[0]
    b = jnp.stack([jnp.asarray(rng.standard_normal(n), jnp.float32)
                   for _ in range(3)], axis=1)
    res = cg_solve_multi(a, b, tol=1e-5, maxiter=500,
                         backend="sequential")
    assert res.x.shape == (n, 3)
    for j in range(3):
        ref = fused_dia_cg(a, b[:, j], tol=1e-5, maxiter=500,
                           jacobi=False, interpret=True)
        assert int(res.iterations[j]) == int(ref.iterations)
        np.testing.assert_array_equal(np.asarray(res.x[:, j]),
                                      np.asarray(ref.x))


def test_bell_spmm_resident_matches_dma(rng):
    """The round-5 resident-x block-ELL engine (whole X in VMEM, one
    output write per row) matches the DMA engine bit-for-bit."""
    import scipy.sparse as sp

    from cgx.kernels.bsr import bell_from_bsr, bell_spmm
    from cgx.sparse.types import bsr_from_csr, csr_from_scipy

    bs, nb, k = 16, 24, 64
    n = bs * nb
    d = sp.random(nb, nb, density=0.2, random_state=5).tocsr()
    d.setdiag(1.0)
    a = sp.kron(d, np.ones((bs, bs))).tocsr() * 0.01
    a = sp.csr_matrix(a + sp.eye(n))
    bell = bell_from_bsr(bsr_from_csr(csr_from_scipy(
        a.astype(np.float32)), bs))
    x = rng.standard_normal((n, k)).astype(np.float32)
    y_d = np.asarray(bell_spmm(bell, jnp.asarray(x), interpret=True,
                               engine="dma"))
    y_r = np.asarray(bell_spmm(bell, jnp.asarray(x), interpret=True,
                               engine="resident"))
    np.testing.assert_array_equal(y_r, y_d)
    truth = a @ x.astype(np.float64)
    assert np.abs(y_r - truth).max() / np.abs(truth).max() < 1e-5
