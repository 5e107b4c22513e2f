"""One-pass fused CG engine (cgx/kernels/fused_onepass.py, v5).

The entire CG iteration in one Pallas kernel — 6 HBM streams/iter vs the
two-pass engine's ~9, with q = A p rematerialized in-pass.  Interpret mode
on CPU; numerics must match the XLA loop and the two-pass engine exactly
in iteration counts (same α/β structure — see the module docstring).
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import cgx
from cgx.kernels.fused_cg import build_fused, fused_stencil_cg
from cgx.sparse.stencil import (GeneralStencil3D, poisson2d_stencil,
                                poisson3d_stencil)


def _solve_pair(s, b, **kw):
    ref = cgx.cg_solve(s, b, **kw)
    one = fused_stencil_cg(s, b, interpret=True, one_pass=True, **kw)
    return ref, one


def test_onepass_matches_cg_3d(rng):
    s = poisson3d_stencil(12, 10, 11)
    b = jnp.asarray(rng.standard_normal(s.shape[0]), jnp.float32)
    ref, one = _solve_pair(s, b, tol=1e-6, maxiter=2000)
    assert bool(one.converged)
    assert int(one.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(one.x), np.asarray(ref.x),
                               atol=1e-5)


def test_onepass_matches_cg_2d(rng):
    s = poisson2d_stencil(33, 29)
    b = jnp.asarray(rng.standard_normal(s.shape[0]), jnp.float32)
    ref, one = _solve_pair(s, b, tol=1e-6, maxiter=3000)
    assert bool(one.converged)
    assert abs(int(one.iterations) - int(ref.iterations)) <= 1
    np.testing.assert_allclose(np.asarray(one.x), np.asarray(ref.x),
                               atol=1e-4)


def test_onepass_27point_general_stencil(rng):
    taps = tuple((dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                 for dz in (-1, 0, 1))
    coeffs = tuple(26.5 if t == (0, 0, 0) else -1.0 for t in taps)
    s = GeneralStencil3D(nx=8, ny=9, nz=10, taps=taps, coeffs=coeffs)
    b = jnp.asarray(rng.standard_normal(s.shape[0]), jnp.float32)
    ref, one = _solve_pair(s, b, tol=1e-6, maxiter=1000)
    assert bool(one.converged)
    assert int(one.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(one.x), np.asarray(ref.x),
                               atol=1e-4)


def test_onepass_x0_and_history(rng):
    s = poisson3d_stencil(9, 7, 6)
    n = s.shape[0]
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    x0 = jnp.asarray(0.1 * rng.standard_normal(n), jnp.float32)
    ref = cgx.cg_solve(s, b, x0, tol=1e-6, maxiter=1000,
                       track_history=True)
    one = fused_stencil_cg(s, b, x0, tol=1e-6, maxiter=1000,
                           interpret=True, one_pass=True,
                           track_history=True)
    assert int(one.iterations) == int(ref.iterations)
    k = int(ref.iterations) + 1
    np.testing.assert_allclose(np.asarray(one.history)[:k],
                               np.asarray(ref.history)[:k], rtol=2e-3)


def test_onepass_checkpoint_roundtrip(rng):
    """state_to_flat/state_from_flat: resume mid-solve from a flat CGState
    snapshot and land on the same trajectory (the pq/qq Gram numbers are
    rebuilt by one kernel-A launch on resume)."""
    s = poisson3d_stencil(10, 8, 9)
    n = s.shape[0]
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)

    eng = build_fused(s, jnp.float32, interpret=True, one_pass=True)
    bb = eng.norm_sq_b(b)
    tol_sq = jnp.asarray(1e-6, jnp.float32) ** 2 * bb

    st = eng.init(b)
    st = eng.run(st, 10, tol_sq)
    flat = eng.state_to_flat(st)
    st2 = eng.state_from_flat(flat)
    np.testing.assert_allclose(np.asarray(st2.rz), np.asarray(st.rz),
                               rtol=1e-5)
    fin_direct = eng.run(st, 2000, tol_sq)
    fin_resumed = eng.run(st2, 2000, tol_sq)
    assert int(fin_resumed.k) == int(fin_direct.k)
    np.testing.assert_allclose(np.asarray(fin_resumed.x),
                               np.asarray(fin_direct.x), atol=1e-5)


def test_onepass_rejects_unsupported():
    s = poisson3d_stencil(8, 8, 8)
    with pytest.raises(ValueError, match="single-device"):
        build_fused(s, jnp.float32, one_pass=True, n_shards=2)
    from cgx.kernels.fused_engine import make_geometry
    from cgx.kernels.fused_onepass import OnePassCG
    g = make_geometry(8, 8, 8, ((0, 0, 0), (0, 0, 1), (0, 0, -1)),
                      one_pass=True)
    with pytest.raises(ValueError, match="constant-coefficient"):
        OnePassCG(g, dtype=jnp.float32, coeffs=(1.0, None, None))


def test_onepass_geometry_window_invariant():
    """make_geometry(one_pass=True) always yields bl_a >= 2*sl (the
    p-window origin) and double-buffered streaming geometry."""
    from cgx.kernels.fused_engine import make_geometry
    taps = ((0, 0, 0), (0, 0, 1), (0, 0, -1), (0, 1, 0), (0, -1, 0),
            (1, 0, 0), (-1, 0, 0))
    for dims in [(8, 8, 8), (216, 216, 216), (12, 100, 130)]:
        g = make_geometry(*dims, taps, one_pass=True)
        assert g.bl_a >= 2 * g.sl
        assert g.double_buffer
        assert g.l_pad % g.bl_a == 0
