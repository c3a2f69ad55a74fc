"""Embedded-manifold analytic solutions (reference test_manifold.jl model):
solve -Laplace_Gamma(u) + u = (k^2+1) cos(k theta) on the unit circle; the
exact solution is cos(k theta). Embedding-independence: the circle in R^2
and a tilted circle in R^3 must agree."""
import numpy as np
import pytest

from mgbtpu import amg, assemble, fem1d, intersect, mgb_solve
from mgbtpu.convex import convex_euclidian_power


def _circle_geometry(n, tilt3d=False):
    th = np.linspace(0, 2 * np.pi, n + 1)
    pts = np.stack([np.cos(th), np.sin(th)], axis=1)
    if tilt3d:
        # rotate the plane z=0 about the x-axis by 0.7 rad
        a = 0.7
        pts3 = np.stack([pts[:, 0], np.cos(a) * pts[:, 1],
                         np.sin(a) * pts[:, 1]], axis=1)
        pts = pts3
    K = np.empty((2, n, pts.shape[1]))
    K[0] = pts[:-1]
    K[1] = pts[1:]
    return fem1d(K=K, ambient=pts.shape[1], k=2), th


def _solve_helmholtz(geom, f_vals):
    """min int (s + r)/2 - f u  with s >= |grad_Gamma u|^2, r >= u^2:
    at the optimum this solves -Laplace_Gamma u + u = f."""
    mg = amg(geom, dirichlet_nodes={"dirichlet": []})   # closed manifold
    e = geom.x.shape[2]
    ops = ["dx", "dy", "dz"][:e]
    D = [("u", "id")] + [("u", o) for o in ops] + [("s", "id"), ("r", "id")]
    nD = len(D)
    Q = intersect(
        mg,
        convex_euclidian_power(mg, idx=tuple(range(1, e + 1)) + (nD - 2,),
                               p=2.0),
        convex_euclidian_power(mg, idx=(0, nD - 1), p=2.0))
    n = geom.n_nodes
    f_grid = np.zeros((n, nD))
    f_grid[:, 0] = -f_vals
    f_grid[:, nD - 2] = 0.5
    f_grid[:, nD - 1] = 0.5
    g_grid = np.zeros((n, 3))
    g_grid[:, 1] = 100.0
    g_grid[:, 2] = 100.0
    prob = assemble(mg, state_variables=[("u", "dirichlet"),
                                         ("s", "full"), ("r", "full")],
                    D=D, f_grid=f_grid, g_grid=g_grid, Q=Q)
    return mgb_solve(prob, tol=1e-7)


def _theta_of(geom, tilt3d=False):
    xf = geom.xflat()
    if tilt3d:
        a = 0.7
        y = np.cos(a) * xf[:, 1] + np.sin(a) * xf[:, 2]
        return np.arctan2(y, xf[:, 0])
    return np.arctan2(xf[:, 1], xf[:, 0])


@pytest.mark.parametrize("k", [1, 2])
def test_circle_laplace_beltrami(k):
    geom, _ = _circle_geometry(16)
    th = _theta_of(geom)
    f = (k ** 2 + 1) * np.cos(k * th)
    sol = _solve_helmholtz(geom, f)
    err = np.abs(sol.z[:, 0] - np.cos(k * th)).max()
    assert err < 2e-2, err


def test_embedding_independence():
    geom2, _ = _circle_geometry(12)
    geom3, _ = _circle_geometry(12, tilt3d=True)
    th2 = _theta_of(geom2)
    th3 = _theta_of(geom3, tilt3d=True)
    f2 = 2 * np.cos(th2)
    f3 = 2 * np.cos(th3)
    u2 = _solve_helmholtz(geom2, f2).z[:, 0]
    u3 = _solve_helmholtz(geom3, f3).z[:, 0]
    # same parametrization order: nodal values must agree closely
    assert np.abs(u2 - u3).max() < 1e-5


