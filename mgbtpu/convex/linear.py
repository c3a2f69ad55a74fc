"""Linear inequality constraints: A(x) y[idx] + b(x) > 0 componentwise.

Barrier: -sum(log(F_i)). Mirrors reference ``src/convex_linear.jl:87-223``.
A is (nc, ni) per node (stored row-major flattened), b is (nc,) per node.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import ddarray
from ..ops.ddarray import cat
from ..utils.log import Log
from ._common import resolve_x, sample_grid, scatter_vec, scatter_mat, gather
from .convex import Convex, input_spec_from_idx


def convex_linear(mg=None, *, idx=None, A=None, b=None,
                  A_grid=None, b_grid=None, x=None, dtype=None):
    if dtype is None:
        from .._config import default_dtype

        dtype = default_dtype()
    xs = resolve_x(mg) if x is None else np.asarray(x)
    n = xs.shape[0]
    idx_t = None if idx is None else tuple(int(i) for i in idx)

    if A_grid is None:
        if A is None:
            if idx_t is None:
                raise ValueError("idx=None with identity A cannot determine the "
                                 "constraint size; pass idx, A, or A_grid")
            ni = len(idx_t)
            A_grid = np.tile(np.eye(ni, dtype=dtype).reshape(1, -1), (n, 1))
            nc = ni
        else:
            A0 = np.asarray(A(xs[0]), dtype=dtype)
            nc, ni = A0.shape
            A_grid = sample_grid(lambda xi: np.asarray(A(xi), dtype=dtype).reshape(-1),
                                 xs, dtype)
    else:
        A_grid = np.asarray(A_grid, dtype=dtype)
        if b_grid is None and not callable(b):
            raise ValueError("explicit A_grid needs b_grid (or callable b) to fix nc")
        nc = None
        ni = None

    if b_grid is None:
        if b is None:
            b_grid = np.zeros((n, nc), dtype=dtype)
        else:
            b0 = np.asarray(b(xs[0]))
            if b0.ndim == 0:
                if nc is None:
                    raise ValueError("scalar-valued b needs A (or idx) to fix nc")
                b_grid = np.tile(
                    np.zeros((1, nc), dtype=dtype), (n, 1))
                for i in range(n):
                    b_grid[i, :] = b(xs[i])
            else:
                b_grid = sample_grid(lambda xi: np.asarray(b(xi), dtype=dtype), xs, dtype)
    else:
        b_grid = np.asarray(b_grid, dtype=dtype)
    nc = b_grid.shape[1]
    if A_grid.shape[1] % nc != 0:
        raise ValueError(
            f"A_grid has {A_grid.shape[1]} columns/node, not a multiple of nc={nc}")
    ni = A_grid.shape[1] // nc
    if idx_t is not None and ni != len(idx_t):
        raise ValueError(f"A implies ni={ni} but len(idx)={len(idx_t)}")

    spec = input_spec_from_idx(idx_t, ni)

    def _parts(A_row, b_row, y):
        Ax = A_row.reshape(nc, ni)
        yi = gather(idx_t, y)
        return Ax, Ax @ yi + b_row

    def F0(A_row, b_row, y):
        _, F = _parts(A_row, b_row, y)
        return -(Log(F).sum())

    def F1(A_row, b_row, y):
        Ax, F = _parts(A_row, b_row, y)
        g = -(Ax.T @ (1.0 / F))
        return scatter_vec(idx_t, g, y.shape[0])

    def F2(A_row, b_row, y):
        Ax, F = _parts(A_row, b_row, y)
        H = Ax.T @ (Ax / (F * F)[:, None])
        return scatter_mat(idx_t, H, y.shape[0])

    def C0(A_row, b_row, yhat):
        Ax, F = _parts(A_row, b_row, yhat[:-1])
        return -(Log(F + yhat[-1]).sum())

    def C1(A_row, b_row, yhat):
        Ax, F = _parts(A_row, b_row, yhat[:-1])
        invF = 1.0 / (F + yhat[-1])
        g = -(Ax.T @ invF)
        out = scatter_vec(idx_t, g, yhat.shape[0] - 1)
        return cat([out, (-(invF.sum()))[None]])

    def C2(A_row, b_row, yhat):
        Ax, F = _parts(A_row, b_row, yhat[:-1])
        inv = 1.0 / (F + yhat[-1])
        invF2 = inv * inv
        H = Ax.T @ (Ax * invF2[:, None])
        cross = Ax.T @ invF2
        N1 = yhat.shape[0]
        out = ddarray.zeros((N1, N1), like=yhat)
        ii = np.arange(N1 - 1) if idx_t is None else np.asarray(idx_t, dtype=np.int32)
        out = out.at[np.ix_(ii, ii)].set(H)
        out = out.at[ii, N1 - 1].set(cross)
        out = out.at[N1 - 1, ii].set(cross)
        out = out.at[N1 - 1, N1 - 1].set(invF2.sum())
        return out

    def Slack(A_row, b_row, y):
        _, F = _parts(A_row, b_row, y)
        return -jnp.min(F)

    return Convex(
        args=(jnp.asarray(A_grid), jnp.asarray(b_grid)),
        barrier=(F0, F1, F2),
        cobarrier=(C0, C1, C2),
        slack=Slack,
        input_spec=spec,
    )
