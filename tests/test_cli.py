"""CLI tests (golden-file style, SURVEY.md §4.5) — all on CPU."""
import json
import subprocess
import sys

import numpy as np

from cgx.cli import main


def run_cli(argv, capsys):
    code = main(argv)
    out, err = capsys.readouterr()
    return code, out, err


def test_gen_and_solve_legacy_roundtrip(tmp_path, capsys):
    p = str(tmp_path / "prob.txt")
    code, out, err = run_cli(["gen", "--poisson", "8x8", "--out", p], capsys)
    assert code == 0 and "n=64" in err

    code, out, err = run_cli(
        ["solve", "--input", p, "--dtype", "f64", "--tol", "1e-8",
         "--precond", "jacobi"], capsys)
    assert code == 0
    assert "converged=True" in err


def test_solve_legacy_compat_output_format(tmp_path, capsys):
    p = str(tmp_path / "prob.txt")
    run_cli(["gen", "--poisson", "5x5", "--out", p], capsys)
    code, out, err = run_cli(
        ["solve", "--input", p, "--dtype", "f64", "--maxiter", "30",
         "--legacy-compat"], capsys)
    assert code == 0
    lines = out.splitlines()
    assert len(lines) == 25
    assert all(l.startswith("\t") for l in lines)
    float(lines[0])  # parses as %f


def test_bench_json_line(capsys):
    code, out, err = run_cli(
        ["bench", "--poisson", "16x16", "--format", "dia", "--dtype", "f64",
         "--precond", "jacobi", "--reps", "2"], capsys)
    assert code == 0
    rec = json.loads(out.strip())
    assert rec["n"] == 256 and rec["converged"]
    assert rec["spmv_gnnz_s"] > 0


def test_solve_distributed(capsys):
    code, out, err = run_cli(
        ["solve", "--poisson", "16x16", "--format", "dia", "--dtype", "f64",
         "--precond", "jacobi", "--devices", "8", "--tol", "1e-8"], capsys)
    assert code == 0
    assert "converged=True" in err


def test_mtx_input(tmp_path, capsys):
    p = str(tmp_path / "a.mtx")
    code, out, err = run_cli(["gen", "--poisson", "7x6", "--out", p], capsys)
    assert code == 0
    code, out, err = run_cli(
        ["solve", "--input", p, "--dtype", "f64", "--tol", "1e-8"], capsys)
    assert code == 0 and "converged=True" in err


def test_print_sparse_format(capsys):
    import jax.numpy as jnp
    from cgx.utils.debug import format_sparse
    from cgx.io.poisson import poisson2d
    s = format_sparse(jnp.asarray([1.5, 0.0, -2.25]))
    lines = s.splitlines()
    assert lines[0] == "Size: 3" and lines[1] == "NNZ: 2"
    assert lines[2] == "\t1.500000"
    a = poisson2d(3, 3)
    s2 = format_sparse(a, max_entries=4)
    assert "Size: 9" in s2 and "more)" in s2


def test_solve_stencil_format(capsys):
    code, out, err = run_cli(
        ["solve", "--poisson", "8x8x8", "--format", "stencil",
         "--dtype", "f32", "--tol", "1e-5"], capsys)
    assert code == 0 and "converged=True" in err
