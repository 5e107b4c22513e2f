"""Unit tests: sparse containers and XLA SpMV/SpMM vs scipy ground truth.

Covers the capability surface of the reference's mv_ops library
(``mv_ops.c``): SpMV (mv_mult), dot (dot_product), axpy-family (sv_mult /
vec_add / vec_sub) — plus the SpMM and multi-format storage the north star
adds (SURVEY.md §2.1).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from cgx.sparse.types import (bsr_from_csr, coo_from_scipy, csr_from_scipy,
                              dia_from_csr, ell_from_csr)
from cgx.ops.spmv import spmv, spmm
from cgx.ops import blas
from cgx.io.poisson import poisson2d, poisson2d_dia, poisson3d, poisson3d_dia

from conftest import random_spd_csr


def _random_csr(n, m, density, rng, dtype=np.float64):
    s = sp.random(n, m, density=density,
                  random_state=np.random.RandomState(rng.integers(2**31)),
                  dtype=dtype).tocsr()
    s.sort_indices()
    return s


@pytest.mark.parametrize("shape,density", [((40, 40), 0.1), ((64, 33), 0.07),
                                           ((7, 120), 0.3)])
def test_csr_coo_spmv_matches_scipy(shape, density, rng):
    s = _random_csr(*shape, density, rng)
    x = rng.standard_normal(shape[1])
    expected = s @ x
    for a in (csr_from_scipy(s), coo_from_scipy(s)):
        got = np.asarray(spmv(a, jnp.asarray(x)))
        np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-12)


def test_csr_spmv_empty_rows(rng):
    # Rows with zero nonzeros must produce exact zeros.
    s = sp.csr_matrix((np.array([1.5, -2.0]), np.array([0, 3]),
                       np.array([0, 0, 1, 1, 2, 2])), shape=(5, 4))
    x = rng.standard_normal(4)
    got = np.asarray(spmv(csr_from_scipy(s), jnp.asarray(x)))
    np.testing.assert_allclose(got, s @ x, rtol=1e-14)


@pytest.mark.parametrize("width_multiple", [1, 8])
def test_ell_spmv_matches_scipy(width_multiple, rng):
    s = _random_csr(50, 50, 0.08, rng)
    a = ell_from_csr(csr_from_scipy(s), width_multiple=width_multiple)
    x = rng.standard_normal(50)
    np.testing.assert_allclose(np.asarray(spmv(a, jnp.asarray(x))), s @ x,
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("bs", [2, 4, 8])
def test_bsr_spmv_matches_scipy(bs, rng):
    n = 37  # deliberately not a blocksize multiple — exercises padding
    s = random_spd_csr(n, 0.1, rng)
    a = bsr_from_csr(csr_from_scipy(s), blocksize=bs)
    x = rng.standard_normal(n)
    xp = np.zeros(a.shape[1])
    xp[:n] = x
    got = np.asarray(spmv(a, jnp.asarray(xp)))[:n]
    np.testing.assert_allclose(got, s @ x, rtol=1e-12, atol=1e-12)


def test_dia_spmv_matches_scipy(rng):
    s = poisson2d(9, 7)
    d = dia_from_csr(s)
    x = rng.standard_normal(63)
    ref = np.asarray(spmv(s, jnp.asarray(x)))
    got = np.asarray(spmv(d, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-13, atol=1e-13)


def test_dia_direct_builders_match_csr(rng):
    for (a_csr, a_dia) in [
        (poisson2d(5, 8), poisson2d_dia(5, 8)),
        (poisson3d(4, 3, 5), poisson3d_dia(4, 3, 5)),
    ]:
        n = a_csr.shape[0]
        x = rng.standard_normal(n)
        np.testing.assert_allclose(
            np.asarray(spmv(a_dia, jnp.asarray(x))),
            np.asarray(spmv(a_csr, jnp.asarray(x))), rtol=1e-13, atol=1e-13)


@pytest.mark.parametrize("k", [1, 3, 16])
def test_spmm_matches_scipy(k, rng):
    s = _random_csr(30, 45, 0.1, rng)
    x = rng.standard_normal((45, k))
    expected = s @ x
    csr = csr_from_scipy(s)
    for a in (csr, coo_from_scipy(s), ell_from_csr(csr)):
        got = np.asarray(spmm(a, jnp.asarray(x)))
        np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-12)


def test_bsr_spmm_matches_scipy(rng):
    n, k, bs = 32, 5, 8
    s = random_spd_csr(n, 0.1, rng)
    a = bsr_from_csr(csr_from_scipy(s), blocksize=bs)
    x = rng.standard_normal((n, k))
    got = np.asarray(spmm(a, jnp.asarray(x)))[:n]
    np.testing.assert_allclose(got, s @ x, rtol=1e-12, atol=1e-12)


def test_diagonal_extraction(rng):
    s = random_spd_csr(25, 0.15, rng)
    a = csr_from_scipy(s)
    np.testing.assert_allclose(np.asarray(a.diagonal()), s.diagonal(),
                               rtol=1e-14)
    d = dia_from_csr(poisson2d(6, 6))
    np.testing.assert_allclose(np.asarray(d.diagonal()), 4.0)


def test_blas_ops(rng):
    a = rng.standard_normal(100)
    b = rng.standard_normal(100)
    np.testing.assert_allclose(float(blas.dot(jnp.asarray(a), jnp.asarray(b))),
                               a @ b, rtol=1e-13)
    np.testing.assert_allclose(float(blas.norm(jnp.asarray(a))),
                               np.linalg.norm(a), rtol=1e-13)
    np.testing.assert_allclose(
        np.asarray(blas.axpy(2.5, jnp.asarray(a), jnp.asarray(b))),
        2.5 * a + b, rtol=1e-13)
    with pytest.raises(ValueError):
        blas.dot(jnp.zeros(3), jnp.zeros(4))


def test_pytree_roundtrip_and_jit(rng):
    """Containers must traverse jit boundaries with static metadata intact."""
    s = random_spd_csr(20, 0.2, rng)
    a = csr_from_scipy(s)
    x = jnp.asarray(rng.standard_normal(20))

    @jax.jit
    def f(a, x):
        return spmv(a, x)

    np.testing.assert_allclose(np.asarray(f(a, x)), s @ np.asarray(x),
                               rtol=1e-12)
    leaves, treedef = jax.tree_util.tree_flatten(a)
    a2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert a2.shape == a.shape


def test_astype_and_fp32_path(rng):
    s = random_spd_csr(16, 0.2, rng)
    a = csr_from_scipy(s).astype(jnp.float32)
    x = rng.standard_normal(16).astype(np.float32)
    got = np.asarray(spmv(a, jnp.asarray(x)))
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, (s @ x).astype(np.float32), rtol=1e-5)


def test_dot_compensated_accuracy(rng):
    """Kahan-compensated fp32 dot: ~1 ulp of the fp64 truth on data where
    the naive fp32 reduction loses several digits (SURVEY §7 mixed
    precision)."""
    import jax.numpy as jnp
    from cgx.ops.blas import dot_compensated

    n = 200_001
    # bf16 inputs: fp32 products are EXACT (8+8 mantissa bits < 24), so
    # the compensated sum recovers full fp32-level accuracy; a naive bf16
    # or blockwise-fp32 reduction loses several digits at this n.
    a16 = jnp.asarray(rng.standard_normal(n) * 1e2, jnp.bfloat16)
    b16 = jnp.asarray(rng.standard_normal(n), jnp.bfloat16)
    a64 = np.asarray(a16, np.float64)
    b64 = np.asarray(b16, np.float64)
    truth = float(a64 @ b64)
    comp = float(dot_compensated(a16, b16))
    assert abs(comp - truth) <= abs(truth) * 3e-7 + 1e-3
    # sharded: one psum, same value
    import jax
    from jax.sharding import PartitionSpec as P
    mesh = jax.make_mesh((8,), ("rows",))
    f = jax.shard_map(
        lambda x, y: dot_compensated(x, y, axis_name="rows"),
        mesh=mesh, in_specs=(P("rows"), P("rows")), out_specs=P())
    n8 = n - (n % 8)
    comp_sh = float(f(a16[:n8], b16[:n8]))
    truth8 = float(a64[:n8] @ b64[:n8])
    assert abs(comp_sh - truth8) <= abs(truth8) * 3e-7 + 1e-3


def test_suitesparse_standin_classes(rng):
    """VERDICT r2 #9: every stand-in class builds SPD with the documented
    sparsity character, and PCG with the full preconditioner set runs on
    a shrunken instance."""
    import scipy.sparse as sp

    import cgx
    from cgx.io.suitesparse import SUITESPARSE_SPD, standin

    for name, scale in [("ecology2", 0.002), ("G3_circuit", 0.005),
                        ("parabolic_fem", 0.01)]:
        a = standin(name, scale=scale)
        av = sp.csr_matrix((np.asarray(a.values, np.float64),
                            np.asarray(a.col_indices),
                            np.asarray(a.indptr)), shape=a.shape)
        n = av.shape[0]
        # symmetric
        assert abs(av - av.T).max() < 1e-12
        # positive definite (smallest eigenvalue of a small instance)
        w = np.linalg.eigvalsh(av.toarray())
        assert w[0] > 0, (name, w[0])
        # nnz/row character matches the published figure within 2x
        target = (SUITESPARSE_SPD[name]["nnz"]
                  / SUITESPARSE_SPD[name]["n"])
        got = av.nnz / n
        assert 0.5 * target < got < 2.0 * target, (name, got, target)

        # f64 ground-truth solve (fp32 behavior on these conditioning
        # classes is the on-chip bench's story — G3-class kappa ~1e6 sits
        # at fp32's true-residual floor by construction).
        b = jnp.asarray(rng.standard_normal(n), jnp.float64)
        m = cgx.JacobiPrecond(
            inv_diag=jnp.asarray(1.0 / av.diagonal(), jnp.float64))
        res = cgx.cg_solve(a, b, tol=1e-8, maxiter=5 * n,
                           preconditioner=m)
        assert bool(res.converged), name
        x = np.asarray(res.x, np.float64)
        rel = np.linalg.norm(np.asarray(b) - av @ x) / np.linalg.norm(
            np.asarray(b))
        assert rel < 1e-6, (name, rel)
