"""Golden parity tests against the compiled reference C binary.

Compiles the reference solver (read-only tree at /root/reference) into a
temp dir, generates a 2D Poisson problem in the reference's 4-line input
format (cg.c:146-218), runs both solvers for a fixed iteration count, and
compares the solutions.  This is the "matches the reference within its float
tolerance" requirement from BASELINE.json, north-star config 1.

Notes on reference semantics verified here (SURVEY.md §3.2):
* ``cg <input> k`` performs k+1 CG updates (break after the x/r update of
  iteration k), so cgx runs ``maxiter = k + 1`` with ``tol = 0``.
* Output: ``print_sparse`` dumps every x entry as ``\t%f`` (mv_ops.c:77-95).
"""
import os
import shutil
import subprocess

import jax.numpy as jnp
import numpy as np
import pytest

from cgx.io.legacy import read_legacy, write_legacy
from cgx.io.poisson import poisson2d
from cgx.solve.cg import cg_solve

REF_DIR = "/root/reference"
HAVE_REF = os.path.exists(os.path.join(REF_DIR, "cg.c"))
HAVE_GCC = shutil.which("gcc") is not None


@pytest.fixture(scope="module")
def ref_binary(tmp_path_factory):
    if not (HAVE_REF and HAVE_GCC):
        pytest.skip("reference source or gcc unavailable")
    d = tmp_path_factory.mktemp("refbuild")
    exe = d / "cg"
    subprocess.run(
        ["gcc", "-O2", "-o", str(exe),
         os.path.join(REF_DIR, "cg.c"), os.path.join(REF_DIR, "mv_ops.c"),
         "-I", REF_DIR, "-lm"],
        check=True, capture_output=True)
    return str(exe)


def run_reference(exe, input_path, max_iterations):
    out = subprocess.run([exe, input_path, str(max_iterations)],
                         check=True, capture_output=True, text=True).stdout
    xs = [float(line.strip()) for line in out.splitlines()
          if line.startswith("\t") and _is_float(line.strip())]
    return np.array(xs)


def _is_float(s):
    try:
        float(s)
        return True
    except ValueError:
        return False


def test_legacy_format_roundtrip(tmp_path):
    a = poisson2d(6, 5)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(30)
    p = str(tmp_path / "io.txt")
    write_legacy(p, a, b)
    a2, b2 = read_legacy(p)
    np.testing.assert_array_equal(np.asarray(a2.indptr), np.asarray(a.indptr))
    np.testing.assert_array_equal(np.asarray(a2.col_indices),
                                  np.asarray(a.col_indices))
    np.testing.assert_allclose(np.asarray(a2.values), np.asarray(a.values))
    np.testing.assert_allclose(np.asarray(b2), b)


@pytest.mark.parametrize("iters", [5, 30])
def test_solution_matches_reference_binary(ref_binary, tmp_path, iters):
    """x from cgx == x from the C binary on 2D Poisson (fp64, fixed iters)."""
    nx = ny = 16
    a = poisson2d(nx, ny)
    n = nx * ny
    rng = np.random.default_rng(11)
    b = rng.standard_normal(n)

    p = str(tmp_path / f"poisson_{iters}.txt")
    write_legacy(p, a, b)

    x_ref = run_reference(ref_binary, p, iters)
    assert x_ref.shape == (n,)

    # Reference runs iters+1 updates (break is post-update at k == iters).
    res = cg_solve(a, jnp.asarray(b), tol=0.0, maxiter=iters + 1)
    x_cgx = np.asarray(res.x)

    # %f prints 6 decimals — compare at that tolerance.
    np.testing.assert_allclose(x_cgx, x_ref, atol=5e-6)


def test_residual_trajectory_vs_reference_converges(ref_binary, tmp_path):
    """Both solvers drive the true residual to the same magnitude."""
    a = poisson2d(8, 8)
    rng = np.random.default_rng(2)
    b = rng.standard_normal(64)
    p = str(tmp_path / "traj.txt")
    write_legacy(p, a, b)

    x_ref = run_reference(ref_binary, p, 63)
    res = cg_solve(a, jnp.asarray(b), tol=0.0, maxiter=64)

    import scipy.sparse as sp
    s = sp.csr_matrix((np.asarray(a.values), np.asarray(a.col_indices),
                       np.asarray(a.indptr)), shape=a.shape)
    r_ref = np.linalg.norm(b - s @ x_ref)
    r_cgx = np.linalg.norm(b - s @ np.asarray(res.x))
    nb = np.linalg.norm(b)
    assert r_cgx <= max(r_ref / nb, 1e-12) * nb * 1.5 + 1e-5 * nb


def test_cli_legacy_compat_matches_reference_binary(ref_binary, tmp_path):
    """End-to-end: `cgx solve --legacy-compat` output == C binary output."""
    from cgx.cli import main as cli_main
    import io
    from contextlib import redirect_stdout, redirect_stderr

    a = poisson2d(10, 10)
    rng = np.random.default_rng(4)
    b = rng.standard_normal(100)
    p = str(tmp_path / "cli.txt")
    write_legacy(p, a, b)

    x_ref = run_reference(ref_binary, p, 20)

    out = io.StringIO()
    with redirect_stdout(out), redirect_stderr(io.StringIO()):
        code = cli_main(["solve", "--input", p, "--dtype", "f64",
                         "--maxiter", "20", "--legacy-compat"])
    assert code == 0
    x_cli = np.array([float(l) for l in out.getvalue().split()])
    assert x_cli.shape == x_ref.shape
    np.testing.assert_allclose(x_cli, x_ref, atol=5e-6)
