"""Native (C++) component tests: parity with the Python fallbacks."""
import numpy as np
import pytest

from cgx.io.legacy import write_legacy
from cgx.io.poisson import poisson2d
from cgx.native import ic0_factor_native, lib, parse_legacy
from cgx.solve.ic0 import _tril_pattern, ic0_factor

HAVE_NATIVE = lib() is not None


@pytest.mark.skipif(not HAVE_NATIVE, reason="no native toolchain")
def test_native_parser_matches_python(tmp_path, rng):
    a = poisson2d(9, 7)
    b = rng.standard_normal(63)
    p = str(tmp_path / "in.txt")
    write_legacy(p, a, b)

    cols, rp, av, bv = parse_legacy(p)
    np.testing.assert_array_equal(cols, np.asarray(a.col_indices))
    np.testing.assert_array_equal(rp, np.asarray(a.indptr))
    np.testing.assert_allclose(av, np.asarray(a.values))
    np.testing.assert_allclose(bv, b)


@pytest.mark.skipif(not HAVE_NATIVE, reason="no native toolchain")
def test_native_parser_missing_file():
    with pytest.raises(IOError):
        parse_legacy("/nonexistent/file.txt")


@pytest.mark.skipif(not HAVE_NATIVE, reason="no native toolchain")
def test_native_ic0_matches_python(rng):
    from conftest import random_spd_csr
    from cgx.sparse.types import csr_from_scipy
    a = csr_from_scipy(random_spd_csr(80, 0.08, rng))

    lv_py, lc, lp = ic0_factor(a, use_native=False)
    lv_nat, lc2, lp2 = ic0_factor(a, use_native=True)
    np.testing.assert_array_equal(lc, lc2)
    np.testing.assert_array_equal(lp, lp2)
    np.testing.assert_allclose(lv_nat, lv_py, rtol=1e-12, atol=1e-14)


@pytest.mark.skipif(not HAVE_NATIVE, reason="no native toolchain")
def test_native_ic0_breakdown(rng):
    import scipy.sparse as sp
    from cgx.sparse.types import csr_from_scipy
    a = csr_from_scipy(sp.csr_matrix(np.array([[1.0, 2.0], [2.0, 1.0]])))
    lv, lc, lp = _tril_pattern(a)
    with pytest.raises(np.linalg.LinAlgError):
        ic0_factor_native(lp, lc, lv)


@pytest.mark.skipif(not HAVE_NATIVE, reason="no native toolchain")
def test_native_ic0_levels_match_python_schedule(rng):
    from cgx.solve.ic0 import _level_schedule
    a = poisson2d(12, 10)
    lv, lc, lp = _tril_pattern(a)
    _, levels = ic0_factor_native(lp, lc, lv)
    ref = _level_schedule(lc, lp, a.shape[0])
    np.testing.assert_array_equal(levels, ref)


@pytest.mark.skipif(not HAVE_NATIVE, reason="no native toolchain")
def test_native_parser_no_trailing_newline(tmp_path):
    """File not ending in whitespace: the '\\0' sentinel keeps strtod in
    bounds (ADVICE r1 heap over-read)."""
    p = tmp_path / "in.txt"
    p.write_text("0,1\n0,1,2\n2.0,3.0\n1.5,2.5")  # no final newline
    cols, rp, av, bv = parse_legacy(str(p))
    np.testing.assert_array_equal(cols, [0, 1])
    np.testing.assert_array_equal(rp, [0, 1, 2])
    np.testing.assert_allclose(av, [2.0, 3.0])
    np.testing.assert_allclose(bv, [1.5, 2.5])


@pytest.mark.skipif(not HAVE_NATIVE, reason="no native toolchain")
def test_native_parser_malformed_token(tmp_path):
    """A non-numeric token is a clean error, not an infinite loop
    (ADVICE r1: strtol returning next == p never advanced)."""
    p = tmp_path / "bad.txt"
    p.write_text("0,xyz,2\n0,1,2\n2.0,3.0\n1.5,2.5\n")
    with pytest.raises(IOError):
        parse_legacy(str(p))
