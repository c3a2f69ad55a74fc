"""Double-float ("df64") arithmetic: ~49-bit-mantissa reals as float32 pairs.

TPU v5e has no hardware float64; the multigrid barrier method needs
higher-than-f32 accuracy in exactly two places — the reductions that
assemble the Newton system (sums of PSD per-node contributions whose f32
rounding makes the assembled Hessian numerically indefinite) and the solve's
residual/decrement dot products. This module provides error-free transforms
(Knuth two_sum, Dekker split/two_prod — all plain IEEE f32 adds/muls, no FMA
required) and fully vectorized pairwise tree reductions over an axis, so
every df64 reduction is a log-depth chain of elementwise VPU ops.

A df64 value is a pair (hi, lo) with |lo| <= ulp(hi)/2; arrays are pairs of
equal-shape f32 arrays. Relative accuracy ~ 2^-48 ~ 4e-15.
"""
from __future__ import annotations

import jax.numpy as jnp

_SPLIT = 4097.0  # 2^12 + 1 (Dekker splitting constant for float32)


def two_sum(a, b):
    """Error-free a + b = s + e (Knuth, 6 flops, no branch)."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def quick_two_sum(a, b):
    """Error-free a + b = s + e assuming |a| >= |b|."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    c = _SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free a * b = p + e via Dekker splitting (IEEE f32 ops only)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def dd_add(x, y):
    """(hi,lo) + (hi,lo) -> (hi,lo)."""
    xh, xl = x
    yh, yl = y
    s, e = two_sum(xh, yh)
    e = e + (xl + yl)
    return quick_two_sum(s, e)


def dd_add_f(x, b):
    xh, xl = x
    s, e = two_sum(xh, b)
    return quick_two_sum(s, e + xl)


def dd_neg(x):
    return (-x[0], -x[1])


def dd_sub(x, y):
    return dd_add(x, dd_neg(y))


def dd_mul_f(x, b):
    """(hi,lo) * f32 -> (hi,lo)."""
    xh, xl = x
    p, e = two_prod(xh, b)
    e = e + xl * b
    return quick_two_sum(p, e)


def dd_mul(x, y):
    xh, xl = x
    yh, yl = y
    p, e = two_prod(xh, yh)
    e = e + (xh * yl + xl * yh)
    return quick_two_sum(p, e)


def dd_from_f(a):
    return (a, jnp.zeros_like(a))


def dd_to_f(x):
    return x[0] + x[1]


def dd_tree_sum(x, axis):
    """Pairwise (tree) reduction of a df64 array along ``axis``.

    log2(K) vectorized dd_add rounds; equivalent accuracy to sequential
    compensated summation but fully parallel (VPU-friendly).
    """
    hi, lo = x
    hi = jnp.moveaxis(hi, axis, -1)
    lo = jnp.moveaxis(lo, axis, -1)
    n = hi.shape[-1]
    while n > 1:
        m = n // 2
        a = (hi[..., :m], lo[..., :m])
        b = (hi[..., m:2 * m], lo[..., m:2 * m])
        s = dd_add(a, b)
        if n % 2:
            sh = jnp.concatenate([s[0], hi[..., -1:]], axis=-1)
            sl = jnp.concatenate([s[1], lo[..., -1:]], axis=-1)
        else:
            sh, sl = s
        hi, lo = sh, sl
        n = hi.shape[-1]
    return hi[..., 0], lo[..., 0]


def dd_dot(a, b):
    """df64 dot product of two f32 vectors."""
    p, e = two_prod(a, b)
    return dd_tree_sum((p, e), axis=-1)


def dd_sum_f(a, axis):
    """df64 sum of an f32 array along axis."""
    return dd_tree_sum((a, jnp.zeros_like(a)), axis=axis)


def dd_matvec(Ah, Al, x):
    """df64 matvec: (Ah + Al) @ x with x f32; returns a df64 pair."""
    p, e = two_prod(Ah, x[None, :])
    e = e + Al * x[None, :]
    return dd_tree_sum((p, e), axis=-1)


# ---------------------------------------------------------------------------
# Stacked df64 scalars: shape (2,) arrays [hi, lo] flowing through jit carries
# (objective values in the float32 Newton path — their differences along a
# line search are ~lambda^2, far below the f32 ulp of the value itself).
# ---------------------------------------------------------------------------

def s_pack(hi, lo=None):
    hi = jnp.asarray(hi)
    lo = jnp.zeros_like(hi) if lo is None else lo
    return jnp.stack([hi, lo])


def s_hi(y):
    return y[0]


def s_val(y):
    return y[0] + y[1]


def s_add_f(y, b):
    s, e = two_sum(y[0], b)
    s2, e2 = quick_two_sum(s, e + y[1])
    return jnp.stack([s2, e2])


def s_le(a, b):
    """a <= b for stacked dd scalars (normalized -> lexicographic)."""
    return (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] <= b[1]))


def s_min(a, b):
    return jnp.where(s_le(a, b), a, b)


def s_isfinite(y):
    return jnp.isfinite(y[0]) & jnp.isfinite(y[1])
