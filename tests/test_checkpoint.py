"""Checkpoint / resume tests (SURVEY.md §5.c/d)."""
import os

import jax.numpy as jnp
import numpy as np

from cgx.io.poisson import poisson2d
from cgx.solve.cg import cg_chunk, cg_init, cg_solve
from cgx.solve.precond import JacobiPrecond
from cgx.utils.checkpoint import (cg_solve_checkpointed, load_state,
                                  save_state)


def test_chunked_matches_monolithic(rng):
    a = poisson2d(12, 12)
    b = jnp.asarray(rng.standard_normal(144))
    ref = cg_solve(a, b, tol=0.0, maxiter=40)

    state = cg_init(a, b)
    for _ in range(4):
        state = cg_chunk(a, state, 10)
    assert int(state.k) == 40
    np.testing.assert_allclose(np.asarray(state.x), np.asarray(ref.x),
                               rtol=1e-12, atol=1e-14)


def test_snapshot_roundtrip(tmp_path, rng):
    a = poisson2d(10, 10)
    b = jnp.asarray(rng.standard_normal(100))
    state = cg_chunk(a, cg_init(a, b), 7)
    p = str(tmp_path / "snap.npz")
    save_state(p, state)
    state2 = load_state(p)
    for f in ("x", "r", "z", "p"):
        np.testing.assert_array_equal(np.asarray(getattr(state, f)),
                                      np.asarray(getattr(state2, f)))
    assert int(state2.k) == 7


def test_resume_after_preemption_identical_trajectory(tmp_path, rng):
    """Kill-and-relaunch: resumed solve == uninterrupted solve."""
    a = poisson2d(14, 14)
    n = 196
    b = jnp.asarray(rng.standard_normal(n))
    m = JacobiPrecond.from_matrix(a)

    ref = cg_solve_checkpointed(a, b, tol=1e-10, maxiter=400,
                                preconditioner=m, chunk=25)

    ckpt = str(tmp_path / "cg.npz")
    seen = []

    class Preempt(Exception):
        pass

    def killer(state):
        seen.append(int(state.k))
        if len(seen) == 2:
            raise Preempt

    try:
        cg_solve_checkpointed(a, b, tol=1e-10, maxiter=400,
                              preconditioner=m, chunk=25,
                              checkpoint_path=ckpt, on_chunk=killer)
        assert False, "should have been preempted"
    except Preempt:
        pass
    assert os.path.exists(ckpt)

    res = cg_solve_checkpointed(a, b, tol=1e-10, maxiter=400,
                                preconditioner=m, chunk=25,
                                checkpoint_path=ckpt)
    assert bool(res.converged)
    assert int(res.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-12, atol=1e-14)


def test_chunk_respects_maxiter(rng):
    a = poisson2d(8, 8)
    b = jnp.asarray(rng.standard_normal(64))
    res = cg_solve_checkpointed(a, b, tol=0.0, maxiter=33, chunk=10)
    assert int(res.iterations) == 33


def test_chunk_early_exit_on_tol(rng):
    a = poisson2d(8, 8)
    b = jnp.asarray(rng.standard_normal(64))
    state = cg_init(a, b)
    state = cg_chunk(a, state, 1000, b=b, tol=1e-10)
    ref = cg_solve(a, b, tol=1e-10, maxiter=1000)
    assert int(state.k) == int(ref.iterations)


def test_checkpointed_accepts_callable_matvec(rng):
    """`a` may be a matvec closure (not a JAX type): it must be closed
    over, not traced (ADVICE r1 TypeError at the first chunk)."""
    from conftest import random_spd_csr
    from cgx.sparse.types import csr_from_scipy
    from cgx.ops.spmv import spmv
    from cgx.utils.checkpoint import cg_solve_checkpointed
    import cgx

    a = csr_from_scipy(random_spd_csr(60, 0.1, rng))
    b = jnp.asarray(rng.standard_normal(60))
    res = cg_solve_checkpointed(lambda v: spmv(a, v), b, tol=1e-10,
                                chunk=7, maxiter=200)
    ref = cgx.cg_solve(a, b, tol=1e-10, maxiter=200)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-10, atol=1e-12)


import pytest


@pytest.mark.parametrize("op_kind", ["stencil", "dia_jacobi"])
def test_fused_resume_after_preemption_identical_trajectory(tmp_path, rng,
                                                            op_kind):
    """VERDICT r1 #3: checkpoint/resume on the fused backend — the kernels
    auto_solve actually routes big problems to — with snapshot files in the
    backend-interchangeable flat CGState format."""
    from cgx.io.poisson import poisson3d_dia
    from cgx.sparse.stencil import poisson3d_stencil

    if op_kind == "stencil":
        a = poisson3d_stencil(8, 7, 6)
        m = None
    else:
        a = poisson3d_dia(8, 7, 6, dtype=np.float32)
        m = JacobiPrecond.from_matrix(a)
    n = 8 * 7 * 6
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)

    ref = cg_solve_checkpointed(a, b, tol=1e-6, maxiter=400,
                                preconditioner=m, chunk=25, backend="fused")
    assert bool(ref.converged)
    # Matches the monolithic fused solve exactly (chunking only moves where
    # the host observes the state).
    if op_kind == "stencil":
        from cgx.kernels.fused_cg import fused_stencil_cg
        mono = fused_stencil_cg(a, b, tol=1e-6, maxiter=400, interpret=True)
    else:
        from cgx.kernels.fused_dia_cg import fused_dia_cg
        mono = fused_dia_cg(a, b, tol=1e-6, maxiter=400, interpret=True)
    assert int(ref.iterations) == int(mono.iterations)
    np.testing.assert_allclose(np.asarray(ref.x), np.asarray(mono.x),
                               rtol=1e-6, atol=1e-7)

    ckpt = str(tmp_path / "fused.npz")
    seen = []

    class Preempt(Exception):
        pass

    def killer(state):
        seen.append(int(state.k))
        if len(seen) == 2:
            raise Preempt

    try:
        cg_solve_checkpointed(a, b, tol=1e-6, maxiter=400,
                              preconditioner=m, chunk=25, backend="fused",
                              checkpoint_path=ckpt, on_chunk=killer)
        assert False, "should have been preempted"
    except Preempt:
        pass
    assert os.path.exists(ckpt)

    res = cg_solve_checkpointed(a, b, tol=1e-6, maxiter=400,
                                preconditioner=m, chunk=25, backend="fused",
                                checkpoint_path=ckpt)
    assert bool(res.converged)
    assert int(res.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-5, atol=1e-6)


def test_fused_checkpoint_cross_backend_resume(tmp_path, rng):
    """A snapshot written by the fused backend resumes under the XLA
    backend (and lands on the same solution)."""
    from cgx.io.poisson import poisson3d_dia

    a = poisson3d_dia(8, 7, 6, dtype=np.float32)
    m = JacobiPrecond.from_matrix(a)
    n = 8 * 7 * 6
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)

    ckpt = str(tmp_path / "x.npz")

    class Stop(Exception):
        pass

    def once(state):
        raise Stop

    try:
        cg_solve_checkpointed(a, b, tol=1e-6, maxiter=400, preconditioner=m,
                              chunk=20, backend="fused",
                              checkpoint_path=ckpt, on_chunk=once)
    except Stop:
        pass
    assert os.path.exists(ckpt)

    res = cg_solve_checkpointed(a, b, tol=1e-6, maxiter=400,
                                preconditioner=m, chunk=20, backend="xla",
                                checkpoint_path=ckpt)
    assert bool(res.converged)
    ref = cg_solve(a, b, tol=1e-6, maxiter=400, preconditioner=m)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("op_kind", ["stencil", "dia_jacobi"])
def test_resident_resume_after_preemption_identical_trajectory(
        tmp_path, rng, op_kind):
    """VERDICT r2 #3: checkpoint/resume on the whole-solve RESIDENT kernel
    — the backend auto_solve actually routes ≥200 k-row problems to.  The
    kernel's maxiter bound is the chunk length; (x, r, p, rz, rw) round-
    trip through its resume inputs; snapshots are flat CGState files."""
    from cgx.io.poisson import poisson3d_dia
    from cgx.kernels.fused_resident import (resident_dia_cg,
                                            resident_stencil_cg)
    from cgx.sparse.stencil import poisson3d_stencil

    if op_kind == "stencil":
        a = poisson3d_stencil(8, 7, 6)
        m = None
    else:
        a = poisson3d_dia(8, 7, 6, dtype=np.float32)
        m = JacobiPrecond.from_matrix(a)
    n = 8 * 7 * 6
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)

    ref = cg_solve_checkpointed(a, b, tol=1e-6, maxiter=400,
                                preconditioner=m, chunk=25,
                                backend="resident")
    assert bool(ref.converged)
    # Chunking only moves where the host observes the state: matches the
    # monolithic whole-solve kernel exactly.
    if op_kind == "stencil":
        mono = resident_stencil_cg(a, b, tol=1e-6, maxiter=400,
                                   interpret=True)
    else:
        mono = resident_dia_cg(a, b, tol=1e-6, maxiter=400,
                               interpret=True)
    assert int(ref.iterations) == int(mono.iterations)
    np.testing.assert_array_equal(np.asarray(ref.x), np.asarray(mono.x))

    ckpt = str(tmp_path / "res.npz")
    seen = []

    class Preempt(Exception):
        pass

    def killer(state):
        seen.append(int(state.k))
        if len(seen) == 2:
            raise Preempt

    try:
        cg_solve_checkpointed(a, b, tol=1e-6, maxiter=400,
                              preconditioner=m, chunk=25,
                              backend="resident",
                              checkpoint_path=ckpt, on_chunk=killer)
        assert False, "should have been preempted"
    except Preempt:
        pass
    assert os.path.exists(ckpt)

    res = cg_solve_checkpointed(a, b, tol=1e-6, maxiter=400,
                                preconditioner=m, chunk=25,
                                backend="resident",
                                checkpoint_path=ckpt)
    assert bool(res.converged)
    assert int(res.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-6, atol=1e-7)


def test_resident_checkpoint_cross_backend_resume(tmp_path, rng):
    """A snapshot written by the resident backend resumes under the XLA
    backend (flat CGState interop)."""
    from cgx.io.poisson import poisson3d_dia

    a = poisson3d_dia(8, 7, 6, dtype=np.float32)
    m = JacobiPrecond.from_matrix(a)
    n = 8 * 7 * 6
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)

    ckpt = str(tmp_path / "rx.npz")

    class Stop(Exception):
        pass

    def once(state):
        raise Stop

    try:
        cg_solve_checkpointed(a, b, tol=1e-6, maxiter=400, preconditioner=m,
                              chunk=20, backend="resident",
                              checkpoint_path=ckpt, on_chunk=once)
    except Stop:
        pass
    assert os.path.exists(ckpt)

    res = cg_solve_checkpointed(a, b, tol=1e-6, maxiter=400,
                                preconditioner=m, chunk=20, backend="xla",
                                checkpoint_path=ckpt)
    assert bool(res.converged)
    ref = cg_solve(a, b, tol=1e-6, maxiter=400, preconditioner=m)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("op_kind", ["stencil", "dia_jacobi"])
def test_sr_resume_after_preemption_identical_trajectory(
        tmp_path, rng, op_kind):
    """VERDICT r2 #3, sr leg: checkpoint/resume on the semi-resident
    residency-ladder kernel."""
    from cgx.io.poisson import poisson3d_dia
    from cgx.kernels.fused_semiresident import sr_dia_cg, sr_stencil_cg
    from cgx.sparse.stencil import poisson3d_stencil

    if op_kind == "stencil":
        a = poisson3d_stencil(8, 7, 6)
        m = None
    else:
        a = poisson3d_dia(8, 7, 6, dtype=np.float32)
        m = JacobiPrecond.from_matrix(a)
    n = 8 * 7 * 6
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)

    ref = cg_solve_checkpointed(a, b, tol=1e-6, maxiter=400,
                                preconditioner=m, chunk=25, backend="sr")
    assert bool(ref.converged)
    if op_kind == "stencil":
        mono = sr_stencil_cg(a, b, tol=1e-6, maxiter=400, interpret=True)
    else:
        mono = sr_dia_cg(a, b, tol=1e-6, maxiter=400, interpret=True)
    assert int(ref.iterations) == int(mono.iterations)
    np.testing.assert_array_equal(np.asarray(ref.x), np.asarray(mono.x))

    ckpt = str(tmp_path / "sr.npz")
    seen = []

    class Preempt(Exception):
        pass

    def killer(state):
        seen.append(int(state.k))
        if len(seen) == 2:
            raise Preempt

    try:
        cg_solve_checkpointed(a, b, tol=1e-6, maxiter=400,
                              preconditioner=m, chunk=25, backend="sr",
                              checkpoint_path=ckpt, on_chunk=killer)
        assert False, "should have been preempted"
    except Preempt:
        pass
    assert os.path.exists(ckpt)

    res = cg_solve_checkpointed(a, b, tol=1e-6, maxiter=400,
                                preconditioner=m, chunk=25, backend="sr",
                                checkpoint_path=ckpt)
    assert bool(res.converged)
    assert int(res.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-6, atol=1e-7)


def test_sr_checkpoint_cross_backend_resume(tmp_path, rng):
    """A snapshot written by the sr backend resumes under the XLA backend
    (flat CGState interop), and vice versa."""
    from cgx.io.poisson import poisson3d_dia

    a = poisson3d_dia(8, 7, 6, dtype=np.float32)
    m = JacobiPrecond.from_matrix(a)
    n = 8 * 7 * 6
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)

    ckpt = str(tmp_path / "sx.npz")

    class Stop(Exception):
        pass

    def once(state):
        raise Stop

    try:
        cg_solve_checkpointed(a, b, tol=1e-6, maxiter=400, preconditioner=m,
                              chunk=20, backend="sr",
                              checkpoint_path=ckpt, on_chunk=once)
    except Stop:
        pass
    assert os.path.exists(ckpt)

    res = cg_solve_checkpointed(a, b, tol=1e-6, maxiter=400,
                                preconditioner=m, chunk=20, backend="xla",
                                checkpoint_path=ckpt)
    assert bool(res.converged)
    ref = cg_solve(a, b, tol=1e-6, maxiter=400, preconditioner=m)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-4, atol=1e-5)

    # xla snapshot -> sr resume
    ckpt2 = str(tmp_path / "xs.npz")
    try:
        cg_solve_checkpointed(a, b, tol=1e-6, maxiter=400, preconditioner=m,
                              chunk=20, backend="xla",
                              checkpoint_path=ckpt2, on_chunk=once)
    except Stop:
        pass
    res2 = cg_solve_checkpointed(a, b, tol=1e-6, maxiter=400,
                                 preconditioner=m, chunk=20, backend="sr",
                                 checkpoint_path=ckpt2)
    assert bool(res2.converged)
    np.testing.assert_allclose(np.asarray(res2.x), np.asarray(ref.x),
                               rtol=1e-4, atol=1e-5)


def test_sr_checkpointed_with_initial_guess(rng):
    """x0 folds as r0 = b − A·x0 with the threshold on the ORIGINAL ‖b‖
    (cg_solve semantics)."""
    from cgx.io.poisson import poisson3d_dia

    a = poisson3d_dia(8, 7, 6, dtype=np.float32)
    n = 8 * 7 * 6
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal(n), jnp.float32) * 0.1

    res = cg_solve_checkpointed(a, b, x0, tol=1e-6, maxiter=400,
                                chunk=25, backend="sr")
    ref = cg_solve(a, b, x0, tol=1e-6, maxiter=400)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-4, atol=1e-5)


def test_resident_maxiter_zero_reports_unconverged(rng):
    """maxiter=0 on a fresh resident/sr checkpointed solve must report the
    TRUE initial residual, not fake convergence from the zero seed."""
    from cgx.io.poisson import poisson3d_dia

    a = poisson3d_dia(8, 7, 6, dtype=np.float32)
    b = jnp.asarray(rng.standard_normal(8 * 7 * 6), jnp.float32)
    for backend in ("resident", "sr"):
        res = cg_solve_checkpointed(a, b, tol=1e-6, maxiter=0, chunk=25,
                                    backend=backend)
        assert not bool(res.converged), backend
        assert int(res.iterations) == 0
        # residual == ||b||^2 (x0 = 0)
        np.testing.assert_allclose(float(res.residual_norm_sq),
                                   float(jnp.sum(b * b)), rtol=1e-5)


def test_wbell_checkpointed_default_maxiter(rng):
    """Internal-layout RHS (WBELL (nt, 8, 128)): the default maxiter must
    bound by element count, not shape[0] (= tile count)."""
    import scipy.sparse as sp

    from cgx.sparse.types import csr_from_scipy
    from cgx.sparse.wbell import wbell_from_csr
    from cgx.utils.checkpoint import make_checkpointed_solver

    # 1-D Poisson: CG needs O(n) >> nt iterations, so a maxiter falsely
    # capped at the tile count would return unconverged at iteration nt.
    a_sp = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(300, 300),
                    format="csr", dtype=np.float64)
    wb = wbell_from_csr(csr_from_scipy(a_sp))
    assert wb.nt < 50                        # shape[0] would cap absurdly
    b = jnp.asarray(rng.standard_normal(300), jnp.float32)
    solve = make_checkpointed_solver(wb, tol=1e-5, chunk=50)  # no maxiter
    res = solve(wb.to_internal(b))
    assert bool(res.converged)
    assert int(res.iterations) > wb.nt       # ran past the old false cap


def test_wbell_checkpointed_precond_specs(rng):
    """Payload-safe WBELL preconditioners through the chunked solver
    (round 4): ('poly', steps) builds the apply from the TRACED operator
    inside each chunk jit, and WBellBlockJacobiPrecond rides as a traced
    argument via its .apply alias — neither bakes the slot planes into
    the compile payload (the HTTP 413 rule)."""
    import scipy.sparse as sp

    from cgx.sparse.wbell import wbell_from_csr
    from cgx.solve.wbell import WBellBlockJacobiPrecond, wbell_cg_solve
    from cgx.utils.checkpoint import make_checkpointed_solver

    a = sp.random(600, 600, density=0.02, random_state=3, format="csr")
    a = sp.csr_matrix((a + a.T) + sp.eye(600) * 14.0)
    wb = wbell_from_csr(a)
    b = jnp.asarray(rng.standard_normal(600), jnp.float32)

    ref = wbell_cg_solve(wb, b, tol=1e-6, maxiter=500, precond="poly")
    solve = make_checkpointed_solver(wb, tol=1e-6, maxiter=500, chunk=20,
                                     preconditioner=("poly", 3))
    res = solve(wb.to_internal(b))
    assert bool(res.converged)
    assert int(res.iterations) == int(ref.iterations)

    m = WBellBlockJacobiPrecond.from_wbell(wb)
    ref2 = wbell_cg_solve(wb, b, tol=1e-6, maxiter=500, precond=m)
    solve2 = make_checkpointed_solver(wb, tol=1e-6, maxiter=500, chunk=20,
                                      preconditioner=m)
    res2 = solve2(wb.to_internal(b))
    assert bool(res2.converged)
    assert int(res2.iterations) == int(ref2.iterations)
