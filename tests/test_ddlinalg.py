"""Blocked dd Cholesky / triangular solve (ops/ddlinalg.py) vs f64 oracles.

The blocked forms route their trailing updates through the Ozaki split
MXU GEMM; accuracy must match the rolled elementwise-EFT forms (dd grade,
~2^-40 of the matrix scale after a full factorization). Oracle bars are
set for CPU: XLA:CPU jit wobbles EFT compositions at ~eps(f32) in some
fusion patterns, so bars sit well above 2^-48 but far below f32.
"""
import numpy as np
import jax.numpy as jnp

from mgbtpu.ops.df64 import f64_split
from mgbtpu.ops.ddlinalg import (dd_cholesky, dd_tri_solve_right,
                                 dd_tri_solve_left, _BLOCK)


def _spd(rng, Bk, n, cond=1e6):
    Q, _ = np.linalg.qr(rng.standard_normal((Bk, n, n)))
    ev = np.logspace(0, -np.log10(cond), n)
    return np.einsum("bij,j,bkj->bik", Q, ev, Q)


def test_blocked_cholesky_oracle():
    rng = np.random.default_rng(0)
    Bk, n = 3, 100                      # crosses several _BLOCK panels
    assert n > 2 * _BLOCK
    A = _spd(rng, Bk, n)
    Ah, Al = map(jnp.asarray, f64_split(A))
    Lh, Ll = dd_cholesky(Ah, Al)
    L = np.asarray(Lh, np.float64) + np.asarray(Ll, np.float64)
    # L L^T == A to dd grade; strictly upper part zero
    err = np.abs(L @ np.swapaxes(L, -1, -2) - A).max()
    assert err <= 1e-10, err
    assert np.abs(np.triu(L, 1)).max() == 0.0


def test_blocked_tri_solve_right_oracle():
    rng = np.random.default_rng(1)
    Bk, n, m = 2, 90, 37
    A = _spd(rng, Bk, n)
    L = np.linalg.cholesky(A)
    B = rng.standard_normal((Bk, m, n))
    Lh, Ll = map(jnp.asarray, f64_split(L))
    Bh, Bl = map(jnp.asarray, f64_split(B))
    Xh, Xl = dd_tri_solve_right(Lh, Ll, Bh, Bl)
    X = np.asarray(Xh, np.float64) + np.asarray(Xl, np.float64)
    want = np.linalg.solve(
        np.swapaxes(L, -1, -2)[:, None].repeat(1, 1),
        np.swapaxes(B, -1, -2)).swapaxes(-1, -2) \
        if False else B @ np.linalg.inv(np.swapaxes(L, -1, -2))
    err = np.abs(X - want).max() / max(np.abs(want).max(), 1.0)
    assert err <= 1e-9, err


def test_blocked_vs_rolled_consistency():
    """The blocked path must agree with the rolled path to dd grade on the
    same inputs (they are algebraically identical factorizations)."""
    from mgbtpu.ops.ddlinalg import (_dd_cholesky_rolled,
                                     _dd_tri_solve_right_rolled)

    rng = np.random.default_rng(2)
    Bk, n = 2, 80
    A = _spd(rng, Bk, n, cond=1e4)
    Ah, Al = map(jnp.asarray, f64_split(A))
    Lb = dd_cholesky(Ah, Al)
    Lr = _dd_cholesky_rolled(Ah, Al)
    b = (np.asarray(Lb[0], np.float64) + np.asarray(Lb[1], np.float64))
    r = (np.asarray(Lr[0], np.float64) + np.asarray(Lr[1], np.float64))
    assert np.abs(b - r).max() <= 1e-11 * np.abs(r).max()
