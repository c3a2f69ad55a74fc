"""Operator-exactness oracles for TensorFEM (reference test_tensorfem.jl model):
Q_k dx differentiates degree-<=k polynomials exactly; Clenshaw-Curtis
quadrature integrates exactly; connectivity/dedup consistency."""
import numpy as np
import pytest

from mgbtpu.discretize import fem1d, fem2d, fem3d, tensor_dofmap
from mgbtpu.discretize.tensorfem import (cheb_lobatto_nodes,
                                         clenshaw_curtis_weights,
                                         find_boundary_tensorfem,
                                         refine_connectivity, refine_local)


def test_cc_weights_integrate_polys():
    for k in (1, 2, 3, 5):
        x = cheb_lobatto_nodes(k)
        w = clenshaw_curtis_weights(k)
        np.testing.assert_allclose(w.sum(), 2.0, rtol=1e-13)
        for deg in range(k + 1):
            exact = (1 - (-1) ** (deg + 1)) / (deg + 1)
            np.testing.assert_allclose((w * x ** deg).sum(), exact, atol=1e-12)


@pytest.mark.parametrize("k", [1, 2, 3])
def test_fem1d_dx_exact(k):
    g = fem1d(nodes=np.linspace(-1, 1, 4), k=k)
    xf = g.xflat()[:, 0]
    for deg in range(k + 1):
        u = xf ** deg
        du = g.operators["dx"] @ u
        np.testing.assert_allclose(du, deg * xf ** max(deg - 1, 0) if deg else 0 * xf,
                                   atol=1e-10)


@pytest.mark.parametrize("k", [1, 2])
def test_fem2d_ops_exact(k):
    g = fem2d(k=k)
    xf = g.xflat()
    u = xf[:, 0] ** k + xf[:, 1] * xf[:, 0]
    dux = g.operators["dx"] @ u
    duy = g.operators["dy"] @ u
    np.testing.assert_allclose(dux, k * xf[:, 0] ** (k - 1) + xf[:, 1], atol=1e-10)
    np.testing.assert_allclose(duy, xf[:, 0], atol=1e-10)
    # quadrature: area of [-1,1]^2 = 4
    np.testing.assert_allclose(g.w.sum(), 4.0, rtol=1e-12)


def test_fem3d_ops_exact():
    g = fem3d(k=2)
    xf = g.xflat()
    u = xf[:, 0] * xf[:, 1] + xf[:, 2] ** 2
    np.testing.assert_allclose(g.operators["dz"] @ u, 2 * xf[:, 2], atol=1e-10)
    np.testing.assert_allclose(g.w.sum(), 8.0, rtol=1e-12)


def test_embedded_curve_arclength():
    # quarter circle approximated by chords: total weight ~ arc length
    th = np.linspace(0, np.pi / 2, 33)
    pts = np.stack([np.cos(th), np.sin(th)], axis=1)
    K = np.empty((2, 32, 2))
    K[0] = pts[:-1]
    K[1] = pts[1:]
    g = fem1d(K=K, ambient=2)
    np.testing.assert_allclose(g.w.sum(), np.pi / 2, rtol=1e-3)


def test_find_boundary_1d_2d():
    g = fem1d(nodes=np.linspace(-1, 1, 4), k=1)
    pairs = find_boundary_tensorfem(g)
    labels = g.t
    ids = sorted({labels[v, e] for v, e in pairs})
    # boundary = the two endpoints
    assert len(ids) == 2

    g2 = fem2d(k=2)  # single element: everything on the boundary except centre
    pairs2 = find_boundary_tensorfem(g2)
    ids2 = {g2.t[v, e] for v, e in pairs2}
    assert len(ids2) == 8  # 9 nodes, centre interior


def test_tensor_dofmap_matches_dedup():
    # On a plain mesh, the topological dofmap must induce the same partition
    # of broken nodes as coordinate dedup (reference test_connectivity.jl).
    g = fem2d(k=2)
    gr = fem2d(k=2, K=None)
    # 2x1 mesh of unit quads
    K = np.empty((4, 2, 2))
    K[:, 0, :] = [[-1, -1], [0, -1], [-1, 1], [0, 1]]
    K[:, 1, :] = [[0, -1], [1, -1], [0, 1], [1, 1]]
    g2 = fem2d(K=K, k=3)
    # corner connectivity from dedup of corners
    from mgbtpu.discretize.geometry import dedupe
    from mgbtpu.discretize.tensorfem import extract_corners

    corners = extract_corners(g2.x, 3, 2)
    _, clabels = dedupe(corners.reshape(4 * 2, 2, order="F"))
    t_corner = clabels.reshape(4, 2, order="F")
    t_topo = tensor_dofmap(t_corner, 3, 2)
    # same-partition check: bijection between label maps
    a = t_topo.reshape(-1, order="F")
    b = g2.t.reshape(-1, order="F")
    m1, m2 = {}, {}
    for x, y in zip(a, b):
        assert m1.setdefault(x, y) == y
        assert m2.setdefault(y, x) == x


def test_refine_connectivity_counts():
    g = fem2d(k=1)
    t2 = refine_connectivity(g.t, 1, 2)
    assert t2.shape == (4, 4)
    assert t2.max() + 1 == 9  # 3x3 grid of corner nodes


def test_refine_local_partition_of_unity():
    for d, k in ((1, 2), (2, 1), (2, 2)):
        P = refine_local(k, d)
        np.testing.assert_allclose(P.sum(axis=1), 1.0, atol=1e-12)
