"""Matrix Market (.mtx) and SuiteSparse loaders.

The reference reads only its private 4-line CSV format (``cg.c:146-218``);
the north star adds the standard sparse exchange formats so SuiteSparse SPD
benchmark matrices (bcsstk*, thermal2, ...) drop straight in
(BASELINE.json config 3).  Parsing is host-side (scipy's battle-tested
``mmread``), conversion to device pytrees happens once at setup.

SuiteSparse download is gated: this environment has no network egress, so
:func:`load_suitesparse` resolves only against a local directory (e.g. a
pre-populated ``~/suitesparse`` cache) and raises with instructions
otherwise.
"""
from __future__ import annotations

import gzip
import io
import os
import tarfile
from typing import Optional

import numpy as np

__all__ = ["read_matrix_market", "write_matrix_market", "load_suitesparse"]


def read_matrix_market(path: str, dtype=np.float64):
    """Read ``.mtx`` / ``.mtx.gz`` → :class:`cgx.sparse.types.CSRMatrix`.

    Symmetric storage is expanded to full; pattern matrices get unit values.
    """
    import scipy.io
    import scipy.sparse as sp
    from cgx.sparse.types import csr_from_scipy

    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        m = scipy.io.mmread(f)
    if not sp.issparse(m):
        m = sp.csr_matrix(m)
    m = m.tocsr().astype(dtype)
    return csr_from_scipy(m)


def write_matrix_market(path: str, a, comment: str = "") -> None:
    """Write a cgx CSR matrix as coordinate-format ``.mtx``."""
    import scipy.io
    import scipy.sparse as sp

    s = sp.csr_matrix(
        (np.asarray(a.values), np.asarray(a.col_indices),
         np.asarray(a.indptr)), shape=a.shape)
    scipy.io.mmwrite(path, s, comment=comment)


def load_suitesparse(name: str, directory: Optional[str] = None,
                     dtype=np.float64):
    """Load a SuiteSparse matrix by name from a local cache directory.

    Accepts ``<dir>/<name>.mtx``, ``<dir>/<name>.mtx.gz``, or the official
    ``<dir>/<name>.tar.gz`` bundle (which contains ``<name>/<name>.mtx``).
    """
    directory = directory or os.environ.get(
        "CGX_SUITESPARSE_DIR", os.path.expanduser("~/suitesparse"))
    candidates = [
        os.path.join(directory, f"{name}.mtx"),
        os.path.join(directory, f"{name}.mtx.gz"),
    ]
    for p in candidates:
        if os.path.exists(p):
            return read_matrix_market(p, dtype)
    tar = os.path.join(directory, f"{name}.tar.gz")
    if os.path.exists(tar):
        with tarfile.open(tar, "r:gz") as t:
            member = t.getmember(f"{name}/{name}.mtx")
            data = t.extractfile(member).read()
        import scipy.io
        from cgx.sparse.types import csr_from_scipy
        m = scipy.io.mmread(io.BytesIO(data)).tocsr().astype(dtype)
        return csr_from_scipy(m)
    raise FileNotFoundError(
        f"SuiteSparse matrix {name!r} not found under {directory}. This "
        "environment has no network egress; place <name>.mtx[.gz] or the "
        "official <name>.tar.gz there (set CGX_SUITESPARSE_DIR to change "
        "the search path).")
