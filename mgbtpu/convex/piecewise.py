"""Piecewise-active constraint combination.

At each node, over the active pieces k (``select(x)[k]`` truthy):
barrier = sum_k, cobarrier = sum_k, slack = max_k. The selection grid is a
per-node float matrix (nonzero = active). Inactive pieces contribute exactly
zero (or -inf for the slack max) with the contribution dropped *before*
arithmetic — a piece whose barrier is +/-inf at an inactive node must not
poison the sum, so ``jnp.where`` masks values, never multiplies them.
Mirrors reference ``src/convex_piecewise.jl:114-182``.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import ddarray
from ._common import resolve_x, sample_grid, comp as _comp
from .convex import Convex


def _mask_scalar(active, v):
    return jnp.where(active, jnp.where(active, v, 0.0), 0.0)


def convex_piecewise(Q, *, mg=None, select=None, select_grid=None,
                     x=None, dtype=None):
    """Combine pieces ``Q`` (tuple of Convex) with spatial selectivity."""
    Q = tuple(Q)
    npc = len(Q)
    if dtype is None:
        from .._config import default_dtype

        dtype = default_dtype()
    if select_grid is None:
        xs = resolve_x(mg) if x is None else np.asarray(x)
        if select is None:
            select_grid = np.ones((xs.shape[0], npc), dtype=dtype)
        else:
            select_grid = sample_grid(
                lambda xi: np.asarray(select(xi), dtype=dtype), xs, dtype)
    else:
        select_grid = np.asarray(select_grid, dtype=dtype)
    if select_grid.shape[1] != npc:
        raise ValueError("select grid width must equal the piece count")

    # args layout: (select_row, piece1 args..., piece2 args..., ..., y)
    arg_counts = [len(q.args) for q in Q]
    starts = np.cumsum([0] + arg_counts)

    def _piece_args(all_args, k):
        return all_args[starts[k]:starts[k + 1]]

    def _combine(fn_of_piece, zero_of, reducer):
        def F(sel_row, *rest):
            y = rest[-1]
            piece_rows = rest[:-1]
            total = None
            for k in range(npc):
                val = fn_of_piece(k)(*_piece_args(piece_rows, k), y)
                active = _comp(sel_row, k) != 0
                masked = ddarray.where(active, val, zero_of(val))
                total = masked if total is None else reducer(total, masked)
            return total
        return F

    def _zero(val):
        if isinstance(val, ddarray.DD):
            return ddarray.zeros(val.shape, like=val)
        return jnp.zeros_like(val)

    def _neginf(val):
        return jnp.full_like(val, -jnp.inf)

    import operator

    barrier = tuple(
        _combine(lambda k, i=i: Q[k].barrier[i], _zero, operator.add)
        for i in range(3))
    cobarrier = tuple(
        _combine(lambda k, i=i: Q[k].cobarrier[i], _zero, operator.add)
        for i in range(3))
    slack = _combine(lambda k: Q[k].slack, _neginf, jnp.maximum)

    all_args = (jnp.asarray(select_grid),) + tuple(
        a for q in Q for a in q.args)

    return Convex(
        args=all_args,
        barrier=barrier,
        cobarrier=cobarrier,
        slack=slack,
        input_spec=("all", tuple(q.input_spec for q in Q)),
    )
