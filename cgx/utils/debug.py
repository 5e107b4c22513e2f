"""Debug printers — parity with the reference's ``print_sparse``.

The reference dumps size, nnz and every value with ``\\t%f`` lines
(``mv_ops.c:77-95``) and uses it both for debugging and for emitting the
final solution (``cg.c:78``).  :func:`print_sparse` reproduces that format
for any cgx container or dense vector; :func:`format_sparse` returns the
string.  For on-device tracing inside jitted code use ``jax.debug.print``.
"""
from __future__ import annotations

import io
import sys
from typing import Optional

import numpy as np

__all__ = ["print_sparse", "format_sparse"]


def format_sparse(a, max_entries: Optional[int] = None) -> str:
    """Reference-format dump: ``Size: n``, ``NNZ: k``, then ``\\t%f`` values.

    Accepts a cgx matrix pytree (anything with ``.values``/``.data``) or a
    dense vector/array.
    """
    out = io.StringIO()
    if hasattr(a, "values"):
        vals = np.asarray(a.values).ravel()
        n = a.shape[0]
    elif hasattr(a, "data"):
        vals = np.asarray(a.data).ravel()
        n = a.shape[0]
    else:
        vals = np.asarray(a).ravel()
        n = vals.shape[0]
    nnz = int(np.count_nonzero(vals)) if vals.size else 0
    out.write(f"Size: {n}\n")
    out.write(f"NNZ: {nnz}\n")
    shown = vals if max_entries is None else vals[:max_entries]
    for v in shown:
        out.write("\t%f\n" % float(v))
    if max_entries is not None and vals.size > max_entries:
        out.write(f"\t... ({vals.size - max_entries} more)\n")
    return out.getvalue()


def print_sparse(a, max_entries: Optional[int] = None, file=None) -> None:
    (file or sys.stdout).write(format_sparse(a, max_entries))
