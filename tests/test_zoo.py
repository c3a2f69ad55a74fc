"""Zoo smoke tests: every problem solves to a finite solution at loose tol
(reference test/test_zoo.jl model), plus targeted behavioral checks."""
import numpy as np
import pytest

from mgbtpu import amg, fem1d, fem2d_P2, mgb_solve
from mgbtpu import zoo


@pytest.fixture(scope="module")
def mg2d():
    return amg(fem2d_P2())


@pytest.fixture(scope="module")
def mg1d():
    return amg(fem1d(nodes=np.linspace(-1, 1, 5)))


def _solve(prob, **kw):
    kw.setdefault("tol", 1e-3)
    sol = mgb_solve(prob, **kw)
    assert np.all(np.isfinite(sol.z))
    return sol


def test_p_harmonic(mg2d):
    _solve(zoo.p_harmonic(mg2d, p=1.5))


def test_norton_hoff(mg2d):
    _solve(zoo.norton_hoff(mg2d, p=1.5))


def test_rof(mg1d):
    sol = _solve(zoo.rof(mg1d))
    # denoised u stays within the data range
    assert sol.z[:, 0].max() <= 0.5 + 1e-6
    assert sol.z[:, 0].min() >= -0.5 - 1e-6


def test_two_sided_obstacle(mg1d):
    sol = _solve(zoo.two_sided_obstacle(mg1d))
    u = sol.z[:, 0]
    assert u.min() >= -0.1 - 1e-6   # lower obstacle respected
    assert u.max() <= 1.0 + 1e-6
    # forcing pushes u down to the obstacle somewhere
    assert u.min() < -0.09


def test_elastoplastic_torsion(mg1d):
    sol = _solve(zoo.elastoplastic_torsion(mg1d))
    g = mg1d.geometry
    du = g.operators["dx"] @ sol.z[:, 0]
    assert np.abs(du).max() <= 1.0 + 1e-3   # yield bound |grad u| <= smax


def test_minimal_surface(mg1d):
    sol = _solve(zoo.minimal_surface(mg1d))
    g = mg1d.geometry
    du = g.operators["dx"] @ sol.z[:, 0]
    s = sol.z[:, 1]
    assert np.all(s ** 2 >= du ** 2 + 1 - 1e-3)
