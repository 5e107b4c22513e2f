"""Reader/writer for the reference's 4-line comma-separated input format.

Format (reference ``read_input_file``, ``cg.c:146-218``; see SURVEY.md §3.3):

```
line 0: col_indices (nnz ints)
line 1: row_ptr     (n+1 ints)     — A.size = count - 1 (cg.c:204)
line 2: A values    (nnz doubles)
line 3: b values    (n doubles)
```

The reference parses this one character at a time through a global 64-byte
token stack (``cg.c:310-356``); here it is one vectorized
``numpy.fromstring`` per line.  Re-implemented solely so residual
trajectories can be cross-validated against the compiled C binary on
identical inputs; the writer generates inputs *for* the C binary.
"""
from __future__ import annotations

import numpy as np

__all__ = ["read_legacy", "write_legacy"]


def read_legacy(path: str, dtype=np.float64):
    """Parse the 4-line format → (CSRMatrix, b) on device.

    Prefers the native C++ parser (:mod:`cgx.native`) — the production path
    for reference-scale inputs (~18 M nnz); falls back to vectorized NumPy
    splitting when no toolchain is available.
    """
    from cgx.sparse.types import CSRMatrix
    import jax.numpy as jnp

    from cgx.native import parse_legacy
    parsed = parse_legacy(path)
    if parsed is not None:
        col_indices, indptr, values, b = parsed
        values = values.astype(dtype, copy=False)
        b = b.astype(dtype, copy=False)
    else:
        with open(path, "r") as f:
            lines = [f.readline().strip() for _ in range(4)]
        col_indices = np.array(lines[0].split(","), dtype=np.int64)
        indptr = np.array(lines[1].split(","), dtype=np.int64)
        values = np.array(lines[2].split(","), dtype=dtype)
        b = np.array(lines[3].split(","), dtype=dtype)
    n = len(indptr) - 1
    a = CSRMatrix.from_arrays(values, col_indices, indptr, (n, n))
    return a, jnp.asarray(b)


def write_legacy(path: str, a, b) -> None:
    """Write (CSR matrix, rhs) in the reference's 4-line format.

    ``.tolist()`` first: converting whole arrays to Python scalars in one C
    call is ~20x faster than per-element numpy-scalar conversion at the
    reference's full-problem scale (18 M nnz).
    """
    cols = np.asarray(a.col_indices)
    indptr = np.asarray(a.indptr)
    values = np.asarray(a.values, dtype=np.float64)
    bv = np.asarray(b, dtype=np.float64)
    with open(path, "w") as f:
        f.write(",".join(map(str, cols.tolist())) + "\n")
        f.write(",".join(map(str, indptr.tolist())) + "\n")
        f.write(",".join(map(repr, values.tolist())) + "\n")
        f.write(",".join(map(repr, bv.tolist())) + "\n")
