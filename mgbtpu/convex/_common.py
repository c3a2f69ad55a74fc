"""Shared helpers for the convex-set constructors (host-side sampling)."""
from __future__ import annotations

import numpy as np


def resolve_x(mg):
    """Flat (n_nodes, dim) node coordinates from a MultiGrid/Geometry/array."""
    if mg is None:
        raise ValueError("a mesh (mg=) or explicit grids are required")
    if hasattr(mg, "geometry"):
        g = mg.geometry
    else:
        g = mg
    if hasattr(g, "xflat"):
        return np.asarray(g.xflat())
    return np.asarray(mg)


def sample_grid(fn, x, dtype, width=None):
    """Sample closure ``fn(x_row)`` over nodes into an (n, width) grid."""
    from ..utils.maps import sample_rows

    return sample_rows(fn, x, dtype, width=width)


def scatter_vec(idx, vals, N):
    """Scatter a gradient over selected positions into a length-N vector.

    ``idx=None`` is the identity (Colon semantics). Mirrors reference
    ``_scatter_gradient`` (``src/convex_linear.jl:237-249``). DD-aware
    (double-float values scatter componentwise).
    """
    from ..ops.ddarray import zeros

    if idx is None:
        return vals
    z = zeros((N,), like=vals)
    return z.at[np.asarray(idx, dtype=np.int32)].set(vals)


def scatter_mat(idx, H, N):
    """Scatter a Hessian over selected positions into an N-by-N matrix.

    ``idx=None`` is the identity. Mirrors reference ``_scatter_hessian``
    (``src/convex_linear.jl:258-280``). DD-aware.
    """
    from ..ops.ddarray import zeros

    if idx is None:
        return H
    ii = np.asarray(idx, dtype=np.int32)
    z = zeros((N, N), like=H)
    return z.at[np.ix_(ii, ii)].set(H)


def gather(idx, y):
    """y[idx] with static 0-based indices; identity for idx=None."""
    if idx is None:
        return y
    return y[np.asarray(idx, dtype=np.int32)]
