"""Distributed solver tests on a virtual 8-device CPU mesh (SURVEY.md §4.3).

Asserts (a) numerical identity with the single-device path, (b) halo-exchange
correctness on stencil matrices, (c) the communication plan — 2 psums per
iteration plus halo ppermutes (not all-gathers) for banded operators —
via compiled-HLO inspection.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgx.dist.halo import halo_exchange, local_matvec
from cgx.dist.partition import (partition_csr, partition_dia, pad_vector,
                                unpad_vector)
from cgx.dist.solve import dist_cg_solve, make_row_mesh, operator_specs
from cgx.io.poisson import poisson2d, poisson2d_dia, poisson3d_dia
from cgx.ops.spmv import spmv
from cgx.solve.cg import cg_solve
from cgx.sparse.types import csr_from_scipy

from conftest import random_spd_csr
from jax.sharding import NamedSharding, PartitionSpec as P
from functools import partial

MESH = None


def setup_module():
    global MESH
    MESH = make_row_mesh(8)


def _sharded_matvec(part, x_pad):
    specs = operator_specs(part)
    f = jax.shard_map(
        lambda a_loc, xl: local_matvec(a_loc, xl, axis_name="rows"),
        mesh=MESH, in_specs=(specs, P("rows")), out_specs=P("rows"))
    a_dev = jax.device_put(part, jax.tree.map(
        lambda s: NamedSharding(MESH, s), specs,
        is_leaf=lambda v: isinstance(v, P)))
    x_dev = jax.device_put(x_pad, NamedSharding(MESH, P("rows")))
    return np.asarray(jax.jit(f)(a_dev, x_dev))


def test_halo_exchange_correctness():
    """Each shard sees its neighbors' boundary entries at the right slots."""
    n_local, hl, hr = 4, 2, 3
    x = jnp.arange(32.0)

    f = jax.shard_map(lambda xl: halo_exchange(xl, hl, hr, "rows"),
                      mesh=MESH, in_specs=P("rows"),
                      out_specs=P("rows"))
    out = np.asarray(f(x)).reshape(8, hl + n_local + hr)
    for p in range(8):
        lo = (p * n_local - hl) % 32
        left = [(lo + i) % 32 for i in range(hl)]
        mid = list(range(p * n_local, (p + 1) * n_local))
        right = [((p + 1) * n_local + i) % 32 for i in range(hr)]
        np.testing.assert_array_equal(out[p], np.array(left + mid + right,
                                                       dtype=float))


@pytest.mark.parametrize("mode", ["halo", "allgather"])
def test_partitioned_ell_matvec_matches_global(mode, rng):
    a = poisson2d(20, 13)  # n = 260, not divisible by 8
    n = a.shape[0]
    part = partition_csr(a, 8, mode=mode)
    x = rng.standard_normal(n)
    x_pad = pad_vector(jnp.asarray(x), part.n_padded)
    got = unpad_vector(_sharded_matvec(part, x_pad), n)
    ref = np.asarray(spmv(a, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)


def test_partitioned_ell_general_matrix_allgather(rng):
    s = random_spd_csr(100, 0.15, rng)  # dense-ish pattern → full bandwidth
    a = csr_from_scipy(s)
    part = partition_csr(a, 8, mode="auto")
    assert part.mode == "allgather"
    x = rng.standard_normal(100)
    x_pad = pad_vector(jnp.asarray(x), part.n_padded)
    got = unpad_vector(_sharded_matvec(part, x_pad), 100)
    np.testing.assert_allclose(got, s @ x, rtol=1e-12, atol=1e-12)


def test_partitioned_dia_matvec_matches_global(rng):
    a = poisson2d_dia(24, 16)
    n = a.shape[0]
    part = partition_dia(a, 8)
    x = rng.standard_normal(n)
    x_pad = pad_vector(jnp.asarray(x), part.n_padded)
    got = unpad_vector(_sharded_matvec(part, x_pad), n)
    ref = np.asarray(spmv(a, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("jacobi", [False, True])
def test_dist_cg_identical_to_single_device(jacobi, rng):
    """Sharded CG == single-device CG, bit-comparable in fp64."""
    a = poisson2d(16, 16)
    n = 256
    b = rng.standard_normal(n)

    ref = cg_solve(a, jnp.asarray(b), tol=1e-10, maxiter=600,
                   preconditioner=None if not jacobi else
                   __import__("cgx").JacobiPrecond.from_matrix(a))

    part = partition_csr(a, 8)
    assert part.mode == "halo"
    res = dist_cg_solve(part, jnp.asarray(b), MESH, tol=1e-10, maxiter=600,
                        jacobi=jacobi)
    assert bool(res.converged)
    x = unpad_vector(np.asarray(res.x), n)
    np.testing.assert_allclose(x, np.asarray(ref.x), rtol=1e-9, atol=1e-11)
    # Same iteration count — the trajectories are numerically identical
    # modulo reduction order.
    assert abs(int(res.iterations) - int(ref.iterations)) <= 2


def test_dist_cg_dia_3d_poisson(rng):
    a = poisson3d_dia(12, 10, 11)
    n = a.shape[0]
    b = rng.standard_normal(n)
    part = partition_dia(a, 8)
    res = dist_cg_solve(part, jnp.asarray(b), MESH, tol=1e-9, jacobi=True,
                        maxiter=2000)
    assert bool(res.converged)
    x = unpad_vector(np.asarray(res.x), n)
    from cgx.io.poisson import poisson3d
    s = poisson3d(12, 10, 11)
    r = b - np.asarray(spmv(s, jnp.asarray(x)))
    assert np.linalg.norm(r) <= 1e-8 * np.linalg.norm(b)


def test_dist_cg_history_tracks(rng):
    a = poisson2d_dia(16, 16)
    b = rng.standard_normal(256)
    part = partition_dia(a, 8)
    res = dist_cg_solve(part, jnp.asarray(b), MESH, tol=0.0, maxiter=30,
                        track_history=True)
    hist = np.asarray(res.history)
    assert hist.shape == (31,)
    ref = cg_solve(poisson2d(16, 16), jnp.asarray(b), tol=0.0, maxiter=30,
                   track_history=True)
    np.testing.assert_allclose(hist, np.asarray(ref.history), rtol=1e-8)


def test_halo_mode_emits_no_allgather():
    """Communication plan check: banded operator uses ppermute halos and
    psum scalars only — no all-gather of the iterate (SURVEY.md §4.3c)."""
    a = poisson2d_dia(16, 16)
    part = partition_dia(a, 8)
    b = jnp.ones(256)

    from cgx.dist.solve import operator_specs, AXIS
    specs = operator_specs(part)
    b_pad = pad_vector(b, part.n_padded)

    def local_solve(a_loc, b_loc):
        mv = partial(local_matvec, a_loc, axis_name="rows")
        return cg_solve(mv, b_loc, tol=1e-6, maxiter=50, axis_name="rows").x

    f = jax.shard_map(local_solve, mesh=MESH, in_specs=(specs, P("rows")),
                      out_specs=P("rows"))
    hlo = jax.jit(f).lower(part, b_pad).compile().as_text()
    assert "all-gather" not in hlo, "halo mode must not all-gather x"
    assert "collective-permute" in hlo
    assert "all-reduce" in hlo  # the psum dots


def test_launch_single_process_noop():
    from cgx.dist.launch import initialize, is_multihost
    initialize()  # must no-op without coordinator config
    assert not is_multihost()


def test_profiling_stats():
    from cgx.utils.profiling import solve_stats
    s = solve_stats(0.1, 100, 14_581_760, bytes_per_iter=16 * 2**20)
    assert abs(s["gnnz_per_s"] - 14.58176) < 0.01
    assert s["s_per_iter"] == 0.001


def test_2d_partition_matvec_matches_global(rng):
    from cgx.dist.grid2d import (make_grid_mesh, matvec_2d,
                                 partition_csr_2d, ROWS, COLS)
    a = poisson2d(14, 13)   # n=182, not divisible by 2
    n = a.shape[0]
    part = partition_csr_2d(a, 2)
    mesh = make_grid_mesh(2)
    x = rng.standard_normal(n)
    x_pad = jnp.pad(jnp.asarray(x), (0, part.n_padded - n))

    op_spec = jax.tree.map(lambda l: P(ROWS, COLS, None, None), part)
    f = jax.shard_map(matvec_2d, mesh=mesh, in_specs=(op_spec, P(ROWS)),
                      out_specs=P(ROWS))
    got = np.asarray(jax.jit(f)(part, x_pad))[:n]
    ref = np.asarray(spmv(a, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("jacobi", [False, True])
def test_2d_cg_matches_single_device(jacobi, rng):
    from cgx.dist.grid2d import (dist_cg_solve_2d, make_grid_mesh,
                                 partition_csr_2d)
    a = poisson2d(16, 16)
    n = 256
    b = rng.standard_normal(n)
    part = partition_csr_2d(a, 2)
    mesh = make_grid_mesh(2)
    res = dist_cg_solve_2d(part, jnp.asarray(b), mesh, tol=1e-10,
                           maxiter=600, jacobi=jacobi)
    assert bool(res.converged)
    ref = cg_solve(a, jnp.asarray(b), tol=1e-10, maxiter=600,
                   preconditioner=None if not jacobi else
                   __import__("cgx").JacobiPrecond.from_matrix(a))
    np.testing.assert_allclose(np.asarray(res.x)[:n], np.asarray(ref.x),
                               rtol=1e-9, atol=1e-11)
    assert abs(int(res.iterations) - int(ref.iterations)) <= 2


def test_dist_cg_single_reduction_method(rng):
    a = poisson2d_dia(16, 16)
    b = rng.standard_normal(256)
    part = partition_dia(a, 8)
    res = dist_cg_solve(part, jnp.asarray(b), MESH, tol=1e-10, maxiter=600,
                        jacobi=True, method="single_reduction")
    assert bool(res.converged)
    ref = dist_cg_solve(part, jnp.asarray(b), MESH, tol=1e-10, maxiter=600,
                        jacobi=True)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-7, atol=1e-9)


# ---------------------------------------------------------------------------
# Distributed fused engine (cgx/dist/fused.py)
# ---------------------------------------------------------------------------

def test_dist_fused_stencil_matches_single_device(rng):
    """8-way sharded fused CG == single-device fused CG (VERDICT r1 #1)."""
    from cgx.dist.fused import dist_fused_cg, dist_fused_supported
    from cgx.kernels.fused_cg import fused_stencil_cg
    from cgx.sparse.stencil import poisson3d_stencil
    s = poisson3d_stencil(16, 6, 7)
    assert dist_fused_supported(s, MESH)
    n = 16 * 6 * 7
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    ref = fused_stencil_cg(s, b, tol=1e-5, maxiter=600, interpret=True)
    res = dist_fused_cg(s, b, MESH, tol=1e-5, maxiter=600)
    assert bool(res.converged)
    assert abs(int(res.iterations) - int(ref.iterations)) <= 2
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=5e-4, atol=5e-5)
    # And against the plain XLA solver (independent ground truth).
    xla = cg_solve(s, b, tol=1e-5, maxiter=600)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(xla.x),
                               rtol=5e-3, atol=5e-4)


def test_dist_fused_stencil_x0_and_history(rng):
    from cgx.dist.fused import dist_fused_cg
    from cgx.kernels.fused_cg import fused_stencil_cg
    from cgx.sparse.stencil import poisson3d_stencil
    s = poisson3d_stencil(8, 9, 5)
    n = 8 * 9 * 5
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 0.1)
    ref = fused_stencil_cg(s, b, x0, tol=1e-5, maxiter=600,
                           track_history=True, interpret=True)
    res = dist_fused_cg(s, b, MESH, x0=x0, tol=1e-5, maxiter=600,
                        track_history=True)
    assert bool(res.converged)
    assert abs(int(res.iterations) - int(ref.iterations)) <= 2
    k = min(int(res.iterations), int(ref.iterations))
    np.testing.assert_allclose(np.asarray(res.history)[:k],
                               np.asarray(ref.history)[:k], rtol=2e-2)


def test_dist_fused_dia_jacobi(rng):
    """Sharded fused DIA Jacobi-PCG vs single-device fused and XLA PCG."""
    import cgx
    from cgx.dist.fused import dist_fused_cg, dist_fused_supported
    from cgx.kernels.fused_dia_cg import fused_dia_cg
    from tests.test_kernels import _scaled_poisson3d_dia
    a = _scaled_poisson3d_dia(8, 6, 7, rng).astype(jnp.float32)
    assert dist_fused_supported(a, MESH)
    n = a.shape[0]
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    ref = fused_dia_cg(a, b, tol=1e-5, maxiter=800, interpret=True)
    res = dist_fused_cg(a, b, MESH, jacobi=True, tol=1e-5, maxiter=800)
    assert bool(res.converged)
    assert abs(int(res.iterations) - int(ref.iterations)) <= 2
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=5e-4, atol=5e-5)
    m = cgx.JacobiPrecond.from_matrix(a)
    xla = cgx.cg_solve(a, b, tol=1e-5, maxiter=800, preconditioner=m)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(xla.x),
                               rtol=5e-3, atol=5e-4)


def test_dist_fused_emits_no_allgather(rng):
    """The fused sharded loop exchanges two boundary rows by
    collective-permute and reduces scalars by all-reduce — it must never
    all-gather the iterate."""
    from cgx.dist import fused as df
    from cgx.sparse.stencil import poisson3d_stencil
    s = poisson3d_stencil(16, 6, 7)
    n = 16 * 6 * 7
    b = jnp.zeros((n,), jnp.float32)
    f = df._cached_stencil_solver(MESH, s, "float32", 1e-5, 0.0, 50, False,
                                  False, True)
    hlo = f.lower(b).compile().as_text()
    assert "all-gather" not in hlo, "fused dist must not all-gather x"
    assert "collective-permute" in hlo
    assert "all-reduce" in hlo


# ---------------------------------------------------------------------------
# Distributed preconditioner breadth (VERDICT r1 #5)
# ---------------------------------------------------------------------------

def test_dist_block_jacobi_matches_single_device(rng):
    """Sharded block-Jacobi PCG == single-device BlockJacobiPrecond PCG."""
    from cgx.solve.precond import BlockJacobiPrecond
    a = poisson2d_dia(16, 16)                 # n=256, rows_local=32
    part = partition_dia(a, 8)
    b = jnp.asarray(rng.standard_normal(256))
    res = dist_cg_solve(part, b, MESH, tol=1e-10, maxiter=400,
                        preconditioner="block_jacobi", blocksize=8)
    assert bool(res.converged)
    m = BlockJacobiPrecond.from_matrix(
        csr_from_scipy(__import__("scipy.sparse", fromlist=["x"]).csr_matrix(
            _dia_to_scipy(a))), 8)
    ref = cg_solve(a, b, tol=1e-10, maxiter=400, preconditioner=m)
    assert int(res.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(res.x)[:256], np.asarray(ref.x),
                               rtol=1e-9, atol=1e-11)


def _dia_to_scipy(a):
    import scipy.sparse as sp
    import numpy as _np
    n = a.shape[0]
    m = sp.lil_matrix((n, n))
    data = _np.asarray(a.data)
    for k, off in enumerate(a.offsets):
        for i in range(n):
            j = i + off
            if 0 <= j < n and data[k, i] != 0:
                m[i, j] = data[k, i]
    return m.tocsr()


def test_dist_block_jacobi_ell_matches_single_device(rng):
    """Same, through the ELL (CSR-partitioned) local layout."""
    from cgx.solve.precond import BlockJacobiPrecond
    a_sp = random_spd_csr(256, 0.03, rng)
    a = csr_from_scipy(a_sp)
    part = partition_csr(a, 8)
    b = jnp.asarray(rng.standard_normal(256))
    res = dist_cg_solve(part, b, MESH, tol=1e-10, maxiter=400,
                        preconditioner="block_jacobi", blocksize=8)
    assert bool(res.converged)
    m = BlockJacobiPrecond.from_matrix(a, 8)
    ref = cg_solve(a, b, tol=1e-10, maxiter=400, preconditioner=m)
    assert int(res.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(res.x)[:256], np.asarray(ref.x),
                               rtol=1e-9, atol=1e-11)


def test_dist_poly_precond_matches_single_device(rng):
    from cgx.solve.precond import PolynomialPrecond
    a = poisson2d_dia(16, 16)
    part = partition_dia(a, 8)
    b = jnp.asarray(rng.standard_normal(256))
    res = dist_cg_solve(part, b, MESH, tol=1e-10, maxiter=400,
                        preconditioner="poly", poly_steps=3)
    assert bool(res.converged)
    m = PolynomialPrecond.from_matrix(a, steps=3)
    ref = cg_solve(a, b, tol=1e-10, maxiter=400, preconditioner=m)
    assert int(res.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(res.x)[:256], np.asarray(ref.x),
                               rtol=1e-9, atol=1e-11)


def test_dist_chebyshev_matches_single_device(rng):
    """method='chebyshev' under shard_map (zero per-iteration reductions)
    == single-device chebyshev_solve with the same bounds."""
    from cgx.solve.chebyshev import chebyshev_solve
    a = poisson2d_dia(16, 16)
    part = partition_dia(a, 8)
    b = jnp.asarray(rng.standard_normal(256))
    lo, hi = 0.07, 8.0
    res = dist_cg_solve(part, b, MESH, tol=1e-8, maxiter=3000,
                        method="chebyshev", lam_min=lo, lam_max=hi)
    assert bool(res.converged)
    ref = chebyshev_solve(a, b, lo, hi, tol=1e-8, maxiter=3000)
    assert int(res.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(res.x)[:256], np.asarray(ref.x),
                               rtol=1e-8, atol=1e-10)


def test_dist_chebyshev_estimated_bounds(rng):
    """Chebyshev with distributed power-iteration bound estimation."""
    a = poisson2d_dia(16, 16)
    part = partition_dia(a, 8)
    b = jnp.asarray(rng.standard_normal(256))
    res = dist_cg_solve(part, b, MESH, tol=1e-8, maxiter=5000,
                        method="chebyshev", preconditioner="jacobi")
    assert bool(res.converged)
    x = np.asarray(res.x)[:256]
    r = np.asarray(b) - np.asarray(_dia_to_scipy(a) @ x)
    assert np.linalg.norm(r) <= 1e-7 * np.linalg.norm(np.asarray(b))


def test_halo_exchange_multi_step_wide_halo():
    """Halos wider than one shard (multi ring steps) deliver the exact
    neighbor entries with O(halo) traffic (VERDICT r1 weak #6)."""
    n_local, hl, hr = 4, 7, 9               # ceil(7/4)=2, ceil(9/4)=3 steps
    x = jnp.arange(32.0)
    f = jax.shard_map(lambda xl: halo_exchange(xl, hl, hr, "rows"),
                      mesh=MESH, in_specs=P("rows"), out_specs=P("rows"))
    out = np.asarray(f(x)).reshape(8, hl + n_local + hr)
    for p in range(8):
        lo = (p * n_local - hl) % 32
        left = [(lo + i) % 32 for i in range(hl)]
        mid = list(range(p * n_local, (p + 1) * n_local))
        right = [((p + 1) * n_local + i) % 32 for i in range(hr)]
        np.testing.assert_array_equal(out[p], np.array(left + mid + right,
                                                       dtype=float))


def test_dist_fused_single_plane_per_shard(rng):
    """Edge: nxl == 1 (one x-plane per device) — both halo rows are
    neighbor data; and the 27-point pattern's corner taps cross shards."""
    from cgx.dist.fused import dist_fused_cg
    from cgx.kernels.fused_cg import fused_stencil_cg
    from cgx.sparse.stencil import poisson3d_stencil, poisson3d_27point
    for s in (poisson3d_stencil(8, 6, 7), poisson3d_27point(8, 6, 7)):
        n = 8 * 6 * 7
        b = jnp.asarray(rng.standard_normal(n), jnp.float32)
        ref = fused_stencil_cg(s, b, tol=1e-5, maxiter=600, interpret=True)
        res = dist_fused_cg(s, b, MESH, tol=1e-5, maxiter=600)
        assert bool(res.converged)
        assert abs(int(res.iterations) - int(ref.iterations)) <= 2
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                                   rtol=5e-4, atol=5e-5)


def test_dist_fused_2d_stencil(rng):
    """2-D 5-point operator through the sharded fused engine."""
    from cgx.dist.fused import dist_fused_cg, dist_fused_supported
    from cgx.sparse.stencil import poisson2d_stencil
    from cgx.solve.cg import cg_solve
    s = poisson2d_stencil(16, 33)
    assert dist_fused_supported(s, MESH)
    n = 16 * 33
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    ref = cg_solve(s, b, tol=1e-5, maxiter=1200)
    res = dist_fused_cg(s, b, MESH, tol=1e-5, maxiter=1200)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=5e-3, atol=5e-4)


def test_dist_fused_multi_stencil_matches_single_device(rng):
    """8-way sharded fused multi-RHS CG == single-device batched engine."""
    from cgx.dist.fused import dist_fused_cg_multi
    from cgx.kernels.fused_multi import fused_stencil_cg_multi
    from cgx.sparse.stencil import poisson3d_stencil

    s = poisson3d_stencil(16, 6, 7)
    n = 16 * 6 * 7
    k = 4
    b = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
    ref = fused_stencil_cg_multi(s, b, tol=1e-5, maxiter=600,
                                 interpret=True)
    res = dist_fused_cg_multi(s, b, MESH, tol=1e-5, maxiter=600)
    assert np.asarray(res.converged).all()
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=5e-4, atol=5e-5)
    # Independent ground truth per column.
    for c in range(k):
        xla = cg_solve(s, b[:, c], tol=1e-5, maxiter=600)
        np.testing.assert_allclose(np.asarray(res.x[:, c]),
                                   np.asarray(xla.x), rtol=5e-3, atol=5e-4)


def test_dist_fused_multi_dia_jacobi(rng):
    """Sharded fused multi-RHS DIA Jacobi-PCG (sym planes exchanged once)
    vs single-device batched engine."""
    from cgx.dist.fused import dist_fused_cg_multi
    from cgx.kernels.fused_multi import fused_dia_cg_multi
    from tests.test_kernels import _scaled_poisson3d_dia

    a = _scaled_poisson3d_dia(8, 6, 7, rng).astype(jnp.float32)
    n = a.shape[0]
    k = 4
    b = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
    ref = fused_dia_cg_multi(a, b, tol=1e-5, maxiter=800, interpret=True)
    res = dist_fused_cg_multi(a, b, MESH, jacobi=True, tol=1e-5,
                              maxiter=800)
    assert np.asarray(res.converged).all()
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=5e-4, atol=5e-5)


# ---------------------------------------------------------------------------
# Distributed IC(0): one-level additive Schwarz with sweep applies
# ---------------------------------------------------------------------------

def test_dist_ic0_sweep_single_shard_matches_ic0sweep(rng):
    """With one shard the Schwarz block IS the whole matrix: trajectory
    identity with the single-device IC0SweepPrecond."""
    from cgx.solve.ic0 import IC0SweepPrecond
    a = poisson2d_dia(16, 16)
    a_csr = poisson2d(16, 16)
    part = partition_dia(a, 1)
    mesh1 = make_row_mesh(1)
    b = jnp.asarray(rng.standard_normal(256))
    res = dist_cg_solve(part, b, mesh1, tol=1e-10, maxiter=400,
                        preconditioner="ic0_sweep", nsweeps=2)
    assert bool(res.converged)
    m = IC0SweepPrecond.from_matrix(a_csr, nsweeps=2)
    ref = cg_solve(a, b, tol=1e-10, maxiter=400, preconditioner=m)
    assert int(res.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(res.x)[:256], np.asarray(ref.x),
                               rtol=1e-9, atol=1e-11)


def test_dist_ic0_sweep_8shard_matches_blockwise_reference(rng):
    """8-shard Schwarz-IC(0) trajectory == single-device PCG with the
    equivalent block-diagonal preconditioner built from the same data."""
    from cgx.dist.schwarz import ic0_sweep_blocks, sweep_apply
    a = poisson2d_dia(16, 16)                 # n=256, rl=32, no padding
    part = partition_dia(a, 8)
    blocks = ic0_sweep_blocks(part)
    b = jnp.asarray(rng.standard_normal(256))
    res = dist_cg_solve(part, b, MESH, tol=1e-10, maxiter=400,
                        preconditioner="ic0_sweep", nsweeps=1)
    assert bool(res.converged)

    def ref_apply(r):
        rp = r.reshape(part.n_shards, part.rows_local)
        return jnp.concatenate([
            sweep_apply(blocks, 1, rp[s], shard_index=s)
            for s in range(part.n_shards)])

    ref = cg_solve(a, b, tol=1e-10, maxiter=400, preconditioner=ref_apply)
    assert int(res.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(res.x)[:256], np.asarray(ref.x),
                               rtol=1e-9, atol=1e-11)


def test_dist_ic0_sweep_beats_jacobi_iterations(rng):
    """Block-IC(0) sweeps must cut iterations vs distributed Jacobi."""
    a = poisson2d_dia(32, 32)
    part = partition_dia(a, 8)
    b = jnp.asarray(rng.standard_normal(1024))
    it_jac = int(dist_cg_solve(part, b, MESH, tol=1e-8, maxiter=2000,
                               preconditioner="jacobi").iterations)
    res = dist_cg_solve(part, b, MESH, tol=1e-8, maxiter=2000,
                        preconditioner="ic0_sweep", nsweeps=1)
    assert bool(res.converged)
    assert int(res.iterations) < it_jac


def test_dist_ic0_sweep_ell_and_padding(rng):
    """ELL (CSR-partitioned) layout + ragged n (padding rows) both work;
    solution matches the plain single-device solve."""
    a_csr = poisson2d(15, 15)                 # n=225 → rl=29, 7 pad rows
    part = partition_csr(a_csr, 8)
    n = 225
    b = jnp.asarray(rng.standard_normal(n))
    res = dist_cg_solve(part, b, MESH, tol=1e-10, maxiter=600,
                        preconditioner="ic0_sweep", nsweeps=2)
    assert bool(res.converged)
    ref = cg_solve(a_csr, b, tol=1e-10, maxiter=600)
    np.testing.assert_allclose(np.asarray(res.x)[:n], np.asarray(ref.x),
                               rtol=1e-7, atol=1e-9)


def test_dist_fused_bf16_planes(rng):
    """bf16 coefficient planes through the distributed fused DIA engine:
    recurrence converges; solution close to the fp32-plane result."""
    from cgx.dist.fused import dist_fused_cg
    a = poisson3d_dia(16, 6, 5, dtype=np.float32)
    import dataclasses
    n = a.shape[0]
    scale = jnp.asarray(1.0 + 0.3 * rng.random(n), jnp.float32)
    a = dataclasses.replace(a, data=a.data.at[3].mul(scale))
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    res16 = dist_fused_cg(a, b, MESH, tol=1e-5, maxiter=600, jacobi=True,
                          plane_dtype=jnp.bfloat16)
    res32 = dist_fused_cg(a, b, MESH, tol=1e-5, maxiter=600, jacobi=True)
    assert bool(res16.converged) and bool(res32.converged)
    err = (np.linalg.norm(np.asarray(res16.x) - np.asarray(res32.x))
           / np.linalg.norm(np.asarray(res32.x)))
    assert err < 3e-2


def test_dist_fused_uneven_nx_stencil(rng):
    """nx % n_devices != 0 (VERDICT r2 #6): the decoupled-plane pad route
    is trajectory-identical to the single-device solve."""
    from cgx.dist.fused import (dist_fused_cg, dist_fused_supported,
                                _pad_to_whole_planes)
    from cgx.sparse.stencil import poisson3d_stencil
    import scipy.sparse as sp

    s = poisson3d_stencil(9, 6, 7)             # 9 % 8 != 0
    assert dist_fused_supported(s, MESH)
    n = 9 * 6 * 7

    # The padded operator is exactly blockdiag(A, c*I).
    a_pad, n_real, n_pad = _pad_to_whole_planes(s, 8)
    assert (n_real, n_pad) == (n, 16 * 6 * 7)
    from cgx.ops.spmv import spmv
    v = jnp.asarray(rng.standard_normal(n_pad), jnp.float32)
    y_pad = np.asarray(spmv(a_pad, v))
    y_real = np.asarray(spmv(s, v[:n]))
    np.testing.assert_allclose(y_pad[:n], y_real, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(y_pad[n:], 6.0 * np.asarray(v[n:]),
                               rtol=1e-6)      # c_center * I on pad rows

    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    res = dist_fused_cg(s, b, MESH, tol=1e-5, maxiter=600)
    assert bool(res.converged)
    assert res.x.shape == (n,)
    xla = cg_solve(s, b, tol=1e-5, maxiter=600)
    assert abs(int(res.iterations) - int(xla.iterations)) <= 2
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(xla.x),
                               rtol=5e-3, atol=5e-4)


def test_dist_fused_uneven_nx_dia_jacobi(rng):
    """Uneven DIA with Jacobi: pad rows get a unit diagonal; trajectory
    matches single-device PCG."""
    import cgx
    from cgx.dist.fused import dist_fused_cg, dist_fused_supported
    from tests.test_kernels import _scaled_poisson3d_dia

    a = _scaled_poisson3d_dia(10, 6, 7, rng).astype(jnp.float32)  # 10 % 8
    assert dist_fused_supported(a, MESH)
    n = a.shape[0]
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    res = dist_fused_cg(a, b, MESH, jacobi=True, tol=1e-5, maxiter=800)
    assert bool(res.converged)
    assert res.x.shape == (n,)
    m = cgx.JacobiPrecond.from_matrix(a)
    xla = cgx.cg_solve(a, b, tol=1e-5, maxiter=800, preconditioner=m)
    assert abs(int(res.iterations) - int(xla.iterations)) <= 2
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(xla.x),
                               rtol=5e-3, atol=5e-4)


def test_dist_fused_uneven_nx_multi(rng):
    """Uneven nx through the band-stacked multi-RHS engine."""
    from cgx.dist.fused import dist_fused_cg_multi
    from cgx.sparse.stencil import poisson3d_stencil

    s = poisson3d_stencil(9, 5, 6)
    n = 9 * 5 * 6
    k = 3
    b = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
    res = dist_fused_cg_multi(s, b, MESH, tol=1e-5, maxiter=600)
    assert res.x.shape == (n, k)
    for j in range(k):
        xla = cg_solve(s, b[:, j], tol=1e-5, maxiter=600)
        np.testing.assert_allclose(np.asarray(res.x[:, j]),
                                   np.asarray(xla.x),
                                   rtol=5e-3, atol=5e-4)


# ---------------------------------------------------------------------------
# Distributed WBELL: the unstructured engine under shard_map (VERDICT r3 #3)
# ---------------------------------------------------------------------------

def _wbell_test_matrix(n=3000, density=0.004, seed=3):
    import scipy.sparse as sp
    a = sp.random(n, n, density=density, random_state=seed, format="csr")
    a = sp.csr_matrix((a + a.T) + sp.eye(n) * (2.0 + density * n))
    a.sort_indices()
    return a


def test_dist_wbell_matvec_matches_single_device(rng):
    """8-shard WBELL matvec == the single-device resident kernel."""
    from cgx.dist.wbell import (partition_wbell, local_wbell_matvec,
                                _operator_specs)
    from cgx.kernels.wbell import wbell_spmv
    from cgx.sparse.wbell import wbell_from_csr

    a = _wbell_test_matrix()
    n = a.shape[0]
    wb = wbell_from_csr(a)
    part = partition_wbell(a, 8)
    x = rng.standard_normal(n).astype(np.float32)

    y_ref = np.asarray(wb.from_internal(
        wbell_spmv(wb, wb.to_internal(jnp.asarray(x)))))

    specs = _operator_specs(part)
    f = jax.shard_map(
        lambda p, xl: local_wbell_matvec(p, xl, axis_name="rows",
                                         interpret=True),
        mesh=MESH, in_specs=(specs, P("rows")), out_specs=P("rows"),
        check_vma=False)
    part_dev = jax.device_put(part, jax.tree.map(
        lambda s: NamedSharding(MESH, s), specs,
        is_leaf=lambda v: isinstance(v, P)))
    xi = jax.device_put(part.to_internal(jnp.asarray(x)),
                        NamedSharding(MESH, P("rows")))
    y_sh = jax.device_put(f(part_dev, xi), NamedSharding(MESH, P()))
    y = np.asarray(part.from_internal(y_sh))
    np.testing.assert_allclose(y, y_ref, rtol=2e-5, atol=1e-4)


@pytest.mark.parametrize("precond", ["none", "jacobi", "block_jacobi",
                                     "poly"])
def test_dist_wbell_cg_matches_single_device(rng, precond):
    """8-shard WBELL (P)CG: same iteration count and solution as the
    single-device engine with the matching preconditioner."""
    from cgx.dist.wbell import partition_wbell, dist_wbell_cg_solve
    from cgx.solve.wbell import wbell_cg_solve
    from cgx.sparse.wbell import wbell_from_csr

    a = _wbell_test_matrix()
    n = a.shape[0]
    b = rng.standard_normal(n).astype(np.float32)
    part = partition_wbell(a, 8)
    res = dist_wbell_cg_solve(part, jnp.asarray(b), MESH, tol=1e-6,
                              maxiter=600, preconditioner=precond)
    assert bool(res.converged)

    wb = wbell_from_csr(a)
    kw = dict(tol=1e-6, maxiter=600)
    if precond == "jacobi":
        ref = wbell_cg_solve(wb, jnp.asarray(b), jacobi=True, **kw)
    elif precond in ("block_jacobi", "poly"):
        ref = wbell_cg_solve(wb, jnp.asarray(b), precond=precond, **kw)
    else:
        ref = wbell_cg_solve(wb, jnp.asarray(b), **kw)
    # psum reduction order differs from the single-device dots: same
    # trajectory up to fp32 rounding.
    assert abs(int(res.iterations) - int(ref.iterations)) <= 1
    rel = np.linalg.norm(a @ np.asarray(res.x, np.float64) - b) \
        / np.linalg.norm(b)
    assert rel <= 2e-6


def test_dist_wbell_no_allgather_hlo(rng):
    """The distributed WBELL solve moves halo GROUP slabs by
    collective-permute and scalars by all-reduce — never the iterate by
    all-gather (VERDICT r3 #3 done-criterion)."""
    from cgx.dist.wbell import (partition_wbell, _operator_specs,
                                _cached_solver, _static_key)

    a = _wbell_test_matrix(n=2200)
    part = partition_wbell(a, 8)
    specs = _operator_specs(part)
    f = _cached_solver(MESH, specs, 1e-6, 0.0, 100, "jacobi", 3, False,
                       True)
    part_dev = jax.device_put(part, jax.tree.map(
        lambda s: NamedSharding(MESH, s), specs,
        is_leaf=lambda v: isinstance(v, P)))
    bi = jax.device_put(part.to_internal(
        jnp.ones((2200,), jnp.float32)), NamedSharding(MESH, P("rows")))
    hlo = f.lower(part_dev, bi).compile().as_text()
    assert "all-gather" not in hlo, "dist wbell must not all-gather x"
    assert "collective-permute" in hlo
    assert "all-reduce" in hlo


@pytest.mark.parametrize("method", ["single_reduction", "pipelined",
                                    "chebyshev"])
def test_dist_wbell_methods(rng, method):
    """Latency-optimized methods through the distributed WBELL engine:
    1 fused psum/iter (single_reduction), overlapped reduction
    (pipelined), zero reductions/iter (chebyshev)."""
    from cgx.dist.wbell import partition_wbell, dist_wbell_cg_solve

    a = _wbell_test_matrix(n=2200)
    b = rng.standard_normal(2200).astype(np.float32)
    part = partition_wbell(a, 8)
    res = dist_wbell_cg_solve(part, jnp.asarray(b), MESH, tol=1e-5,
                              maxiter=800, preconditioner="jacobi",
                              method=method)
    assert bool(res.converged), method
    rel = np.linalg.norm(a @ np.asarray(res.x, np.float64) - b) \
        / np.linalg.norm(b)
    assert rel <= 5e-5, method


@pytest.mark.parametrize("n", [9000, 3500])
def test_dist_wbell_uneven_and_degenerate_shards(rng, n):
    """ng_real not divisible by the shard count (9000 rows → 9 groups on
    8 shards) and fewer real groups than shards (3500 rows → 4 groups on
    8 shards: empty shards carry only pad planes)."""
    from cgx.dist.wbell import partition_wbell, dist_wbell_cg_solve

    a = _wbell_test_matrix(n=n, density=0.002, seed=n)
    b = rng.standard_normal(n).astype(np.float32)
    part = partition_wbell(a, 8)
    res = dist_wbell_cg_solve(part, jnp.asarray(b), MESH, tol=1e-6,
                              maxiter=800, preconditioner="jacobi")
    assert bool(res.converged)
    rel = np.linalg.norm(a @ np.asarray(res.x, np.float64) - b) \
        / np.linalg.norm(b)
    assert rel <= 2e-6


def test_dist_wbell_elastic_restart_from_snapshot(rng):
    """SURVEY §5.c elastic recovery, distributed WBELL form: a preempted
    solve resumes from the last iterate snapshot (x0 warm start) and
    finishes in far fewer iterations than from scratch — the launch
    wrapper's documented recovery story (cgx/dist/launch.py)."""
    from cgx.dist.wbell import partition_wbell, dist_wbell_cg_solve

    a = _wbell_test_matrix(n=3000)
    b = rng.standard_normal(3000).astype(np.float32)
    part = partition_wbell(a, 8)
    full = dist_wbell_cg_solve(part, jnp.asarray(b), MESH, tol=1e-6,
                               maxiter=600, preconditioner="jacobi")
    assert bool(full.converged)

    # "Preemption": stop early, snapshot the iterate (this is what
    # cgx.utils.checkpoint persists), relaunch, resume from x0.
    partial = dist_wbell_cg_solve(part, jnp.asarray(b), MESH, tol=1e-6,
                                  maxiter=max(2, int(full.iterations) // 2),
                                  preconditioner="jacobi")
    snap_x = np.asarray(partial.x)                      # persisted iterate
    resumed = dist_wbell_cg_solve(part, jnp.asarray(b), MESH,
                                  x0=jnp.asarray(snap_x), tol=1e-6,
                                  maxiter=600, preconditioner="jacobi")
    assert bool(resumed.converged)
    assert int(resumed.iterations) < int(full.iterations)
    rel = np.linalg.norm(a @ np.asarray(resumed.x, np.float64) - b) \
        / np.linalg.norm(b)
    assert rel <= 2e-6


# ---------------------------------------------------------------------------
# Distributed df64: TRUE relres <= tol on a mesh (VERDICT r4 next #1)
# ---------------------------------------------------------------------------

def _kappa1e7_matrix(n=3000):
    """Diag-scaled irregular SPD, κ ≥ 1e7: the fp32 recurrence converges
    but LIES about the true residual (the ir_df64 use case)."""
    import scipy.sparse as sp
    a = _wbell_test_matrix(n=n)
    d = sp.diags(np.logspace(0, 3.5, n))
    a = sp.csr_matrix(d @ a @ d)
    a.sort_indices()
    return a


def test_dist_ir_df64_reaches_true_tol():
    """8-shard df64 iterative refinement over distributed WBELL inners
    reaches TRUE relres ≤ 1e-6 on a κ ≥ 1e7 system where the fp32
    distributed solve's 'converged' recurrence is off by ≥ 10x on the
    true residual — accuracy AND distribution in one path (the reference
    is double-precision at cluster ambition, mv_ops.h:19-21 +
    Makefile:26-27)."""
    from cgx.dist.hp import dist_ir_df64_solve
    from cgx.dist.wbell import partition_wbell, dist_wbell_cg_solve
    from cgx.ops.df64 import df_to_f64

    n = 3000
    a = _kappa1e7_matrix(n)
    b = np.random.default_rng(5).standard_normal(n)

    # The fp32 engine path alone: recurrence-converged, true residual
    # above tol (this is WHY the df64 outer exists).
    part = partition_wbell(a, 8)
    r32 = dist_wbell_cg_solve(part, jnp.asarray(b, jnp.float32), MESH,
                              tol=1e-6, maxiter=4000,
                              preconditioner="jacobi")
    t32 = np.linalg.norm(b - a @ np.asarray(r32.x, np.float64)) \
        / np.linalg.norm(b)
    assert t32 > 1e-6

    res, info = dist_ir_df64_solve(a, b, MESH, tol=1e-6, inner_tol=1e-2,
                                   inner_maxiter=3000)
    true_rel = np.linalg.norm(b - a @ df_to_f64(res.x)) / np.linalg.norm(b)
    assert true_rel <= 1.5e-6, (true_rel, info)
    assert bool(res.converged)
    assert info["n_shards"] == 8


def test_dist_ir_df64_matches_single_device():
    """Outer-cycle trajectory parity with the single-device
    ir_df64_solve(inner_format='wbell') on the same system: same cycle
    count (±1), both under tol, solutions agree to fp32-engine
    accuracy."""
    from cgx.dist.hp import dist_ir_df64_solve
    from cgx.ops.df64 import df_to_f64
    from cgx.solve.hp import ir_df64_solve
    import cgx

    n = 2200
    a = _kappa1e7_matrix(n)
    b = np.random.default_rng(7).standard_normal(n)

    res_d, info_d = dist_ir_df64_solve(a, b, MESH, tol=1e-6,
                                       inner_tol=1e-2, inner_maxiter=3000)
    m = cgx.JacobiPrecond(
        inv_diag=jnp.asarray(1.0 / a.diagonal(), jnp.float32))
    res_s, info_s = ir_df64_solve(a, b, tol=1e-6, inner_tol=1e-2,
                                  inner_maxiter=3000, preconditioner=m,
                                  inner_format="wbell")
    assert abs(info_d["outer"] - info_s["outer"]) <= 1, (info_d, info_s)
    xd, xs = df_to_f64(res_d.x), df_to_f64(res_s.x)
    bn = np.linalg.norm(b)
    assert np.linalg.norm(b - a @ xd) / bn <= 1.5e-6
    assert np.linalg.norm(b - a @ xs) / bn <= 1.5e-6
    # Both iterates solve the same system to tol: difference is bounded
    # by the residual gap through kappa — compare loosely in x.
    assert np.linalg.norm(xd - xs) / max(np.linalg.norm(xs), 1e-30) < 1e-2


def test_dist_ir_df64_residual_no_allgather_hlo():
    """The sharded df64 true-residual step moves halos by
    collective-permute and the norm by all-reduce — the df64 iterate is
    never all-gathered."""
    from cgx.dist.hp import (partition_df64_ell, _cached_residual)
    from cgx.dist.wbell import partition_wbell
    from jax.sharding import NamedSharding

    n = 2200
    a = _kappa1e7_matrix(n)
    part = partition_wbell(a, 8)
    opd = partition_df64_ell(a, part)
    op_specs = jax.tree.map(lambda _: P("rows"), opd)
    f = _cached_residual(MESH, op_specs)
    vec = NamedSharding(MESH, P("rows"))
    opd_dev = jax.device_put(opd, jax.tree.map(
        lambda s: NamedSharding(MESH, s), op_specs,
        is_leaf=lambda v: isinstance(v, P)))
    z = jax.device_put(part.to_internal(jnp.ones((n,), jnp.float32)), vec)
    hlo = f.lower(opd_dev, z, z, z, z).compile().as_text()
    assert "all-gather" not in hlo
    assert "all-reduce" in hlo
    if opd.halo_lo or opd.halo_hi:
        assert "collective-permute" in hlo


def test_dist_ir_df64_inner_chunk_restart():
    """inner_chunk bounds each inner dispatch (warm-restarted chunks);
    the refinement still reaches TRUE tol."""
    from cgx.dist.hp import dist_ir_df64_solve
    from cgx.ops.df64 import df_to_f64

    n = 2200
    a = _kappa1e7_matrix(n)
    b = np.random.default_rng(9).standard_normal(n)
    res, info = dist_ir_df64_solve(a, b, MESH, tol=1e-6, inner_tol=1e-2,
                                   inner_maxiter=3000, inner_chunk=7)
    true_rel = np.linalg.norm(b - a @ df_to_f64(res.x)) / np.linalg.norm(b)
    assert true_rel <= 1.5e-6, (true_rel, info)


def test_dist_wbell_multi_rhs_matches_single_device(rng):
    """8-shard multi-RHS WBELL CG == the single-device band-stacked
    engine: per-column iteration counts (±1, psum rounding) and
    solutions (VERDICT r4 next #8)."""
    from cgx.dist.wbell import partition_wbell, dist_wbell_cg_solve_multi
    from cgx.solve.wbell import wbell_cg_solve_multi
    from cgx.sparse.wbell import wbell_from_csr

    n, k = 3000, 3
    a = _wbell_test_matrix(n=n)
    b = rng.standard_normal((n, k)).astype(np.float32)
    part = partition_wbell(a, 8)
    res = dist_wbell_cg_solve_multi(part, jnp.asarray(b), MESH, tol=1e-6,
                                    maxiter=600, jacobi=True)
    assert bool(np.asarray(res.converged).all())

    wb = wbell_from_csr(a)
    ref = wbell_cg_solve_multi(wb, jnp.asarray(b), tol=1e-6, maxiter=600,
                               jacobi=True)
    it_d = np.asarray(res.iterations)
    it_s = np.asarray(ref.iterations)
    assert (np.abs(it_d - it_s) <= 1).all(), (it_d, it_s)
    for j in range(k):
        rel = np.linalg.norm(a @ np.asarray(res.x[:, j], np.float64)
                             - b[:, j]) / np.linalg.norm(b[:, j])
        assert rel <= 2e-6, (j, rel)


def test_partition_wbell_per_shard_matches_global(rng):
    """per_shard=True packs each shard from its CSR row slab without the
    global plane array (VERDICT r4 next #9): same halos/geometry as the
    global build, matvec identical to the global-build partition, and
    the solve trajectory matches the single-device engine."""
    from cgx.dist.wbell import (partition_wbell, dist_wbell_cg_solve,
                                local_wbell_matvec, _operator_specs)

    n = 3000
    a = _wbell_test_matrix(n=n)
    pg = partition_wbell(a, 8)
    ps = partition_wbell(a, 8, per_shard=True)
    # Same ordering + geometry.
    np.testing.assert_array_equal(np.asarray(pg.perm), np.asarray(ps.perm))
    assert (pg.gs, pg.ng_real, pg.halo_lo, pg.halo_hi, pg.span) == \
        (ps.gs, ps.ng_real, ps.halo_lo, ps.halo_hi, ps.span)
    np.testing.assert_allclose(np.asarray(pg.diag_internal),
                               np.asarray(ps.diag_internal))

    x = rng.standard_normal(n).astype(np.float32)

    def dist_matvec(part):
        specs = _operator_specs(part)
        f = jax.shard_map(
            lambda p, xl: local_wbell_matvec(p, xl, axis_name="rows",
                                             interpret=True),
            mesh=MESH, in_specs=(specs, P("rows")), out_specs=P("rows"),
            check_vma=False)
        pd = jax.device_put(part, jax.tree.map(
            lambda s: NamedSharding(MESH, s), specs,
            is_leaf=lambda v: isinstance(v, P)))
        xi = jax.device_put(part.to_internal(jnp.asarray(x)),
                            NamedSharding(MESH, P("rows")))
        y = jax.device_put(f(pd, xi), NamedSharding(MESH, P()))
        return np.asarray(part.from_internal(y))

    y_g, y_s = dist_matvec(pg), dist_matvec(ps)
    np.testing.assert_allclose(y_s, y_g, rtol=2e-5, atol=1e-4)

    b = rng.standard_normal(n).astype(np.float32)
    r_s = dist_wbell_cg_solve(ps, jnp.asarray(b), MESH, tol=1e-6,
                              maxiter=600, preconditioner="jacobi")
    r_g = dist_wbell_cg_solve(pg, jnp.asarray(b), MESH, tol=1e-6,
                              maxiter=600, preconditioner="jacobi")
    assert bool(r_s.converged)
    assert abs(int(r_s.iterations) - int(r_g.iterations)) <= 1
    rel = np.linalg.norm(a @ np.asarray(r_s.x, np.float64) - b) \
        / np.linalg.norm(b)
    assert rel <= 2e-6


def test_dist_ir_df64_per_shard_build_matches():
    """dist df64 over a per-shard-built WBELL partition (the multi-host
    memory-bounded build path) reaches TRUE tol with the same outer
    trajectory as the global build."""
    from cgx.dist.hp import make_dist_ir_df64_solver
    from cgx.ops.df64 import df_to_f64

    n = 2200
    a = _kappa1e7_matrix(n)
    b = np.random.default_rng(11).standard_normal(n)
    r_g, i_g = make_dist_ir_df64_solver(a, MESH, tol=1e-6,
                                        inner_tol=1e-2,
                                        inner_maxiter=3000)(b)
    r_p, i_p = make_dist_ir_df64_solver(a, MESH, tol=1e-6,
                                        inner_tol=1e-2,
                                        inner_maxiter=3000,
                                        per_shard=True)(b)
    assert abs(i_g["outer"] - i_p["outer"]) <= 1
    bn = np.linalg.norm(b)
    for r in (r_g, r_p):
        assert np.linalg.norm(b - a @ df_to_f64(r.x)) / bn <= 1.5e-6


def test_dist_wbell_multi_rhs_tiered_matches_untied(rng):
    """Shard-level width-tier plans (round 5): same trajectory as the
    flat per-shard kernel."""
    from cgx.dist.wbell import partition_wbell, dist_wbell_cg_solve_multi

    n, k = 3000, 2
    a = _wbell_test_matrix(n=n)
    b = rng.standard_normal((n, k)).astype(np.float32)
    part = partition_wbell(a, 8)
    r_t = dist_wbell_cg_solve_multi(part, jnp.asarray(b), MESH, tol=1e-6,
                                    maxiter=600, jacobi=True)
    r_u = dist_wbell_cg_solve_multi(part, jnp.asarray(b), MESH, tol=1e-6,
                                    maxiter=600, jacobi=True,
                                    tiered=False)
    assert bool(np.asarray(r_t.converged).all())
    assert (np.abs(np.asarray(r_t.iterations)
                   - np.asarray(r_u.iterations)) <= 1).all()
    for j in range(k):
        rel = np.linalg.norm(a @ np.asarray(r_t.x[:, j], np.float64)
                             - b[:, j]) / np.linalg.norm(b[:, j])
        assert rel <= 2e-6


def test_dist_ir_df64_multi_rhs_reaches_true_tol():
    """The full composition cube (round 5): df64 accuracy × 8-shard
    distribution × a block of RHS — every column reaches TRUE relres
    ≤ tol through batched distributed engine inners and a sharded
    batched df64 residual."""
    from cgx.dist.hp import dist_ir_df64_solve_multi
    from cgx.ops.df64 import df_to_f64

    n, k = 2200, 3
    a = _kappa1e7_matrix(n)
    B = np.random.default_rng(13).standard_normal((n, k))
    res, info = dist_ir_df64_solve_multi(a, B, MESH, tol=1e-6,
                                         inner_tol=1e-2,
                                         inner_maxiter=3000)
    assert bool(np.asarray(res.converged).all()), info
    X = df_to_f64(res.x)
    for j in range(k):
        rel = np.linalg.norm(B[:, j] - a @ X[:, j]) \
            / np.linalg.norm(B[:, j])
        assert rel <= 1.5e-6, (j, rel, info)
    assert info["n_shards"] == 8


def test_dist_ir_df64_resume_from_iterate():
    """Distributed df64 elastic recovery: resume from a preempted
    solve's df64 iterate, finishing in fewer cycles to the same TRUE
    accuracy."""
    from cgx.dist.hp import make_dist_ir_df64_solver
    from cgx.ops.df64 import df_to_f64

    n = 2200
    a = _kappa1e7_matrix(n)
    b = np.random.default_rng(17).standard_normal(n)
    solver = make_dist_ir_df64_solver(a, MESH, tol=1e-8, inner_tol=1e-2,
                                      inner_maxiter=3000)
    full, info_full = solver(b)
    assert bool(full.converged)

    partial_solver = make_dist_ir_df64_solver(
        a, MESH, tol=1e-8, inner_tol=1e-2, inner_maxiter=3000,
        max_outer=max(1, info_full["outer"] // 2))
    part, _ = partial_solver(b)
    res, info_res = solver(b, x0=part.x)
    assert bool(res.converged)
    assert info_res["outer"] < info_full["outer"] or info_full["outer"] <= 1
    true_rel = np.linalg.norm(b - a @ df_to_f64(res.x)) / np.linalg.norm(b)
    assert true_rel <= 1.5e-8
