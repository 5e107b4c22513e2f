"""Synthetic SPD problem generators: 2D/3D Poisson finite-difference stencils.

North-star benchmark configs 1, 2 and 5 (BASELINE.json): 2D 5-point and 3D
7-point Laplacians with Dirichlet boundaries.  Generation is host-side NumPy
(it happens once, outside jit); builders return host CSR arrays or cgx
containers in any format.

These replace the reference's reliance on pre-baked course datasets
(``input/Ab.txt`` ≈ 52,269² with ≈ 18.02 M nnz, hard-coded capacities at
``cg.c:235,260-265``) with parameterized generators of any size.
"""
from __future__ import annotations

import numpy as np

__all__ = [
    "poisson2d_csr_arrays",
    "poisson3d_csr_arrays",
    "poisson2d",
    "poisson3d",
    "poisson2d_dia",
    "poisson3d_dia",
    "poisson3d_dia27",
]


def poisson2d_csr_arrays(nx: int, ny: int, dtype=np.float64):
    """5-point 2D Laplacian (Dirichlet) as host CSR arrays.

    Returns ``(values, col_indices, indptr, n)`` with row-major grid
    numbering: node (i, j) → i * ny + j.  Diagonal 4, off-diagonals -1.
    """
    n = nx * ny
    i = np.arange(nx)[:, None]
    j = np.arange(ny)[None, :]
    idx = (i * ny + j)

    rows, cols, vals = [], [], []

    def add(mask, r, c, v):
        rows.append(r[mask].ravel())
        cols.append(c[mask].ravel())
        vals.append(np.full(int(mask.sum()), v, dtype=dtype))

    full = np.ones((nx, ny), bool)
    add(full, idx, idx, 4.0)
    west = np.broadcast_to(j > 0, (nx, ny))
    add(west, np.broadcast_to(idx, (nx, ny)), idx - 1, -1.0)
    east = np.broadcast_to(j < ny - 1, (nx, ny))
    add(east, np.broadcast_to(idx, (nx, ny)), idx + 1, -1.0)
    north = np.broadcast_to(i > 0, (nx, ny))
    add(north, np.broadcast_to(idx, (nx, ny)), idx - ny, -1.0)
    south = np.broadcast_to(i < nx - 1, (nx, ny))
    add(south, np.broadcast_to(idx, (nx, ny)), idx + ny, -1.0)

    return _triplets_to_csr(np.concatenate(rows), np.concatenate(cols),
                            np.concatenate(vals), n)


def poisson3d_csr_arrays(nx: int, ny: int, nz: int, dtype=np.float64):
    """7-point 3D Laplacian (Dirichlet) as host CSR arrays.

    Node (i, j, k) → (i * ny + j) * nz + k.  Diagonal 6, off-diagonals -1.
    """
    n = nx * ny * nz
    i = np.arange(nx)[:, None, None]
    j = np.arange(ny)[None, :, None]
    k = np.arange(nz)[None, None, :]
    idx = (i * ny + j) * nz + k
    shape = (nx, ny, nz)

    rows, cols, vals = [], [], []

    def add(mask, c_off, v):
        m = np.broadcast_to(mask, shape)
        r = np.broadcast_to(idx, shape)
        rows.append(r[m].ravel())
        cols.append((r + c_off)[m].ravel())
        vals.append(np.full(int(m.sum()), v, dtype=dtype))

    add(np.ones(shape, bool), 0, 6.0)
    add(k > 0, -1, -1.0)
    add(k < nz - 1, +1, -1.0)
    add(j > 0, -nz, -1.0)
    add(j < ny - 1, +nz, -1.0)
    add(i > 0, -ny * nz, -1.0)
    add(i < nx - 1, +ny * nz, -1.0)

    return _triplets_to_csr(np.concatenate(rows), np.concatenate(cols),
                            np.concatenate(vals), n)


def _triplets_to_csr(rows, cols, vals, n):
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    indptr = np.zeros(n + 1, dtype=np.int32)
    np.add.at(indptr, rows + 1, 1)
    indptr = np.cumsum(indptr, dtype=np.int64).astype(np.int32)
    return vals, cols.astype(np.int32), indptr, n


def poisson2d(nx: int, ny: int, dtype=np.float64):
    """2D Poisson as a :class:`cgx.sparse.types.CSRMatrix`."""
    from cgx.sparse.types import CSRMatrix
    vals, cols, indptr, n = poisson2d_csr_arrays(nx, ny, dtype)
    return CSRMatrix.from_arrays(vals, cols, indptr, (n, n))


def poisson3d(nx: int, ny: int, nz: int, dtype=np.float64):
    """3D Poisson as a :class:`cgx.sparse.types.CSRMatrix`."""
    from cgx.sparse.types import CSRMatrix
    vals, cols, indptr, n = poisson3d_csr_arrays(nx, ny, nz, dtype)
    return CSRMatrix.from_arrays(vals, cols, indptr, (n, n))


def poisson2d_dia(nx: int, ny: int, dtype=np.float64):
    """2D Poisson directly in DIA form (no CSR intermediate)."""
    from cgx.sparse.types import DIAMatrix
    import jax.numpy as jnp
    n = nx * ny
    j = np.tile(np.arange(ny), nx)
    i = np.repeat(np.arange(nx), ny)
    data = np.zeros((5, n), dtype=dtype)
    offsets = (-ny, -1, 0, 1, ny)
    data[0] = np.where(i > 0, -1.0, 0.0)          # A[r, r-ny]
    data[1] = np.where(j > 0, -1.0, 0.0)          # A[r, r-1]
    data[2] = 4.0                                  # A[r, r]
    data[3] = np.where(j < ny - 1, -1.0, 0.0)     # A[r, r+1]
    data[4] = np.where(i < nx - 1, -1.0, 0.0)     # A[r, r+ny]
    return DIAMatrix(data=jnp.asarray(data), offsets=offsets, shape=(n, n))


def poisson3d_dia(nx: int, ny: int, nz: int, dtype=np.float64):
    """3D Poisson directly in DIA form (no CSR intermediate)."""
    from cgx.sparse.types import DIAMatrix
    import jax.numpy as jnp
    n = nx * ny * nz
    flat = np.arange(n)
    k = flat % nz
    j = (flat // nz) % ny
    i = flat // (ny * nz)
    data = np.zeros((7, n), dtype=dtype)
    offsets = (-ny * nz, -nz, -1, 0, 1, nz, ny * nz)
    data[0] = np.where(i > 0, -1.0, 0.0)
    data[1] = np.where(j > 0, -1.0, 0.0)
    data[2] = np.where(k > 0, -1.0, 0.0)
    data[3] = 6.0
    data[4] = np.where(k < nz - 1, -1.0, 0.0)
    data[5] = np.where(j < ny - 1, -1.0, 0.0)
    data[6] = np.where(i < nx - 1, -1.0, 0.0)
    return DIAMatrix(data=jnp.asarray(data), offsets=offsets, shape=(n, n),
                     grid=(nx, ny, nz))


def poisson3d_dia27(nx: int, ny: int, nz: int, *, variable: bool = False,
                    seed: int = 0, dtype=np.float32):
    """Wrap-free SPD 27-point banded operator in DIA form.

    The 27-point box stencil (all |dx|,|dy|,|dk| ≤ 1 neighbours) is the
    widest-band operator the fused DIA engine decomposes natively
    (``fused_dia_cg.dia_engine_spec``); this builder is the
    variable-coefficient testbed used for the bf16-coefficient-plane
    measurements (docs/PERF_NOTES.md round 2h).  ``variable=True`` draws
    per-entry couplings from U[0.2, 1); either way the diagonal is made
    strictly dominant (SPD) and every grid-boundary-crossing slot is
    zero, so ``wrap_entries_zero`` holds and ``auto_solve`` routes the
    fused engine.  Symmetry is entrywise (``data[-off][i+off] ==
    data[off][i]``), so the symmetric 3-plane-per-axis streaming path
    engages.

    The reference has no generators at all (it hard-codes one course
    dataset, ``cg.c:235,260-265``); this extends §6's Poisson family to
    the wide-band case.
    """
    from cgx.sparse.types import DIAMatrix
    import jax.numpy as jnp
    n = nx * ny * nz
    flat = np.arange(n)
    k = flat % nz
    j = (flat // nz) % ny
    i = flat // (ny * nz)
    rng = np.random.default_rng(seed)
    # Positive-offset taps in lexicographic order; negatives mirrored.
    pos = [(dx, dy, dk) for dx in (0, 1) for dy in (-1, 0, 1)
           for dk in (-1, 0, 1) if (dx, dy, dk) > (0, 0, 0)]
    offs_pos = [dx * ny * nz + dy * nz + dk for (dx, dy, dk) in pos]
    offsets = sorted([-o for o in offs_pos] + [0] + offs_pos)
    data = np.zeros((len(offsets), n), dtype=dtype)
    row = {o: r for r, o in enumerate(offsets)}
    diag = np.full(n, 0.05, dtype=np.float64)
    for (dx, dy, dk), off in zip(pos, offs_pos):
        ok = ((k + dk >= 0) & (k + dk < nz) & (j + dy >= 0)
              & (j + dy < ny) & (i + dx < nx))
        mag = rng.uniform(0.2, 1.0, n) if variable else 1.0
        v = np.where(ok, -mag, 0.0)
        data[row[off]] = v
        data[row[-off]][off:] = v[:-off]          # symmetric mirror
        diag += np.abs(v)
        diag[off:] += np.abs(v[:-off])
    data[row[0]] = diag.astype(dtype)
    return DIAMatrix(data=jnp.asarray(data), offsets=tuple(offsets),
                     shape=(n, n), grid=(nx, ny, nz))
