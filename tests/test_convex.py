"""Convex/barrier layer: hand-coded gradients/Hessians vs autodiff oracle.

Mirrors the reference's test strategy of validating barrier functors against
mathematical oracles (SURVEY.md section 4).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mgbtpu.convex import (convex_euclidian_power, convex_linear,
                           convex_piecewise, intersect)


def _check_derivs(Q, y_rows, node=0, co=False):
    """Hand-coded F1/F2 must match jax.grad/jax.hessian of F0 at feasible y."""
    F0, F1, F2 = Q.cobarrier if co else Q.barrier
    args_rows = [np.asarray(a)[node] for a in Q.args]
    for y in y_rows:
        y = jnp.asarray(y, dtype=jnp.float64)
        v = F0(*args_rows, y)
        assert np.isfinite(v), f"infeasible test point {y}"
        g = F1(*args_rows, y)
        g_ad = jax.grad(lambda yy: F0(*args_rows, yy))(y)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad),
                                   rtol=1e-8, atol=1e-10)
        H = F2(*args_rows, y)
        H_ad = jax.hessian(lambda yy: F0(*args_rows, yy))(y)
        np.testing.assert_allclose(np.asarray(H), np.asarray(H_ad),
                                   rtol=1e-7, atol=1e-9)
        # Symmetry
        np.testing.assert_allclose(np.asarray(H), np.asarray(H).T, atol=1e-12)


X = np.linspace(-1, 1, 5).reshape(-1, 1)


@pytest.mark.parametrize("p", [1.0, 1.5, 2.0, 3.0])
def test_euclidian_power_derivatives(p):
    Q = convex_euclidian_power(x=X, idx=(1, 2), p=p, dtype=np.float64)
    # y = (u, q, s) with s > |q|^p
    ys = [[0.3, 0.5, 2.0], [-1.0, -0.4, 1.3], [0.0, 0.0, 0.7]]
    _check_derivs(Q, ys)
    # cobarrier: appended slack
    ys_co = [[0.3, 0.5, 2.0, 0.5], [-1.0, -0.4, 1.3, 0.1]]
    _check_derivs(Q, ys_co, co=True)


def test_euclidian_power_infeasible_is_inf():
    Q = convex_euclidian_power(x=X, idx=(1, 2), p=1.0, dtype=np.float64)
    F0 = Q.barrier[0]
    args_rows = [np.asarray(a)[0] for a in Q.args]
    v = F0(*args_rows, jnp.array([0.0, 2.0, 1.0]))  # s < |q| for p=1
    assert not np.isfinite(v)
    v2 = F0(*args_rows, jnp.array([0.0, 0.5, -1.0]))  # s < 0
    assert not np.isfinite(v2)


def test_euclidian_power_slack():
    Q = convex_euclidian_power(x=X, idx=(1, 2), p=2.0, dtype=np.float64)
    args_rows = [np.asarray(a)[0] for a in Q.args]
    s = Q.slack(*args_rows, jnp.array([0.0, 2.0, 1.0]))  # |q|^2=4 > s=1
    np.testing.assert_allclose(float(s), 3.0)  # -(1-4) = 3
    s2 = Q.slack(*args_rows, jnp.array([0.0, 0.5, 1.0]))
    np.testing.assert_allclose(float(s2), -0.75)


def test_affine_euclidian_power():
    # Minimal-surface-style affine packing: A,b nontrivial
    d = 1
    nz = 3
    A = lambda x: np.array([[0.0, 1.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    b = lambda x: np.array([0.0, 1.0, 0.0])
    Q = convex_euclidian_power(x=X, idx=(0, 1, 2), A=A, b=b, p=1.0,
                               dtype=np.float64)
    ys = [[0.2, 0.3, 2.0], [0.0, -1.0, 3.0]]
    _check_derivs(Q, ys)


def test_linear_derivatives():
    A = lambda x: np.array([[1.0], [-1.0]])
    b = lambda x: np.array([0.1, 1.0])
    Q = convex_linear(x=X, idx=(0,), A=A, b=b, dtype=np.float64)
    ys = [[0.3, 9.9], [-0.05, 0.0]]
    _check_derivs(Q, ys)
    ys_co = [[0.3, 9.9, 0.2]]
    _check_derivs(Q, ys_co, co=True)
    # slack = -min(F)
    args_rows = [np.asarray(a)[0] for a in Q.args]
    s = Q.slack(*args_rows, jnp.array([0.5, 0.0]))
    np.testing.assert_allclose(float(s), -0.5)  # F = (0.6, 0.5); -min = -0.5


def test_piecewise_sum_and_mask():
    Q1 = convex_euclidian_power(x=X, idx=(1, 2), p=2.0, dtype=np.float64)
    Q2 = convex_linear(x=X, idx=(0,), A=lambda x: np.array([[1.0]]),
                       b=lambda x: np.array([1.0]), dtype=np.float64)
    Qp = convex_piecewise((Q1, Q2), x=X, select=lambda x: (1.0, x[0] >= 0))
    _check_derivs(Qp, [[0.3, 0.5, 2.0]], node=4)  # x=1: both active
    # node 0 (x=-1): only piece 1 active; a piece-2-infeasible y must be fine
    F0 = Qp.barrier[0]
    args_rows = [np.asarray(a)[0] for a in Qp.args]
    v = F0(*args_rows, jnp.array([-5.0, 0.5, 2.0]))  # u=-5 violates piece 2
    assert np.isfinite(v)
    # slack at node 0 is piece-1 slack only
    s = Qp.slack(*args_rows, jnp.array([-5.0, 2.0, 1.0]))
    np.testing.assert_allclose(float(s), 3.0)


def test_intersect_matches_manual_sum():
    Q1 = convex_euclidian_power(x=X, idx=(1, 2), p=2.0, dtype=np.float64)
    Q2 = convex_linear(x=X, idx=(0,), A=lambda x: np.array([[1.0]]),
                       b=lambda x: np.array([1.0]), dtype=np.float64)
    Qi = intersect(X, Q1, Q2)
    args_rows = [np.asarray(a)[0] for a in Qi.args]
    y = jnp.array([0.3, 0.5, 2.0])
    v = Qi.barrier[0](*args_rows, y)
    v1 = Q1.barrier[0](*[np.asarray(a)[0] for a in Q1.args], y)
    v2 = Q2.barrier[0](*[np.asarray(a)[0] for a in Q2.args], y)
    np.testing.assert_allclose(float(v), float(v1 + v2), rtol=1e-12)


def test_vmap_over_nodes():
    Q = convex_euclidian_power(x=X, idx=(1, 2), p=1.5, dtype=np.float64)
    n = X.shape[0]
    Y = jnp.tile(jnp.array([0.1, 0.2, 3.0]), (n, 1))
    vals = jax.vmap(Q.barrier[0])(*Q.args, Y)
    assert vals.shape == (n,)
    assert np.all(np.isfinite(vals))
    grads = jax.vmap(Q.barrier[1])(*Q.args, Y)
    assert grads.shape == (n, 3)
