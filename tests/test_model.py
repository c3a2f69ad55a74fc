"""Modeling DSL cross-validation: models built via the front end must match
direct low-level solves (reference test_jump.jl model)."""
import numpy as np
import pytest

from mgbtpu import amg, assemble, fem1d, fem2d_P2, mgb_solve
from mgbtpu.frontends.model import Model


@pytest.fixture(scope="module")
def mg1():
    return amg(fem1d(nodes=np.linspace(-1, 1, 3)))


def test_p_laplacian_matches_direct(mg1):
    # DSL: min int s + u/2  s.t.  s >= |u'|  (p=1), u = x on the boundary
    m = Model(mg1)
    u = m.variable("u")
    s = m.variable("s", start=2.0)
    m.dirichlet(u, lambda x: x[0])
    m.epigraph(s, [u.dx()], p=1.0)
    m.minimize(s + 0.5 * u)
    sol = m.solve()
    gold = np.array([[-1, 0], [-1, 0], [-1, 2], [1, 2.0]])
    # direct (the golden fem1d p=1 problem)
    assert np.abs(m.value(u) - gold[:, 0]).max() < 1e-6
    assert m.status == "optimal"


def test_obstacle_model(mg1):
    # min int |u'|^2/2 + u  with -0.1 <= u <= 1 (two_sided_obstacle shape)
    m = Model(mg1)
    u = m.variable("u")
    s = m.variable("s", start=10.0)
    m.dirichlet(u, 0.0)
    m.epigraph(s, [u.dx()], p=2.0)
    m.constrain(u >= -0.1)
    m.constrain(u <= 1.0)
    m.minimize(0.5 * s + 1.0 * u)
    m.solve(tol=1e-6)
    uv = m.value(u)
    assert uv.min() >= -0.1 - 1e-6
    assert uv.min() < -0.09          # forcing reaches the obstacle
    # central-path duals: the lower-bound multiplier is positive on the
    # active set and ~0 where inactive
    mu = m.dual(m.constraints[1])
    act = uv <= -0.099
    if act.any() and (~act).any():
        assert mu[act].max() > 10 * mu[~act].min()


def test_region_restricted_constraint(mg1):
    # yield bound only on x >= 0
    m = Model(mg1)
    u = m.variable("u")
    s = m.variable("s", start=10.0)
    m.dirichlet(u, 0.0)
    m.epigraph(s, [u.dx()], p=2.0)
    m.constrain(u >= -0.05, where=lambda x: x[0] >= 0)
    m.minimize(0.5 * s + 2.0 * u)
    m.solve(tol=1e-5)
    uv = m.value(u)
    xf = mg1.geometry.xflat()[:, 0]
    assert uv[xf >= 0].min() >= -0.05 - 1e-4


def test_spatially_varying_coefficient(mg1):
    # min int s - f(x) u with f(x) = x: affine coefficient in the objective
    m = Model(mg1)
    u = m.variable("u")
    s = m.variable("s", start=5.0)
    m.dirichlet(u, 0.0)
    m.epigraph(s, [u.dx()], p=2.0)
    m.constrain(u >= -1.0)
    m.constrain(1.0 - u >= 0.0)
    m.minimize(s + u * (lambda x: float(x[0])))
    m.solve(tol=1e-5)
    uv = m.value(u)
    # forcing x pushes u down for x>0 and up for x<0 (odd-ish solution)
    xf = mg1.geometry.xflat()[:, 0]
    assert uv[np.argmax(xf)] <= uv[np.argmin(xf)] + 1e-6


def test_infeasible_status(mg1):
    from mgbtpu import MGBConvergenceFailure

    m = Model(mg1)
    u = m.variable("u")
    s = m.variable("s", start=5.0)
    m.epigraph(s, [u.dx()], p=2.0)
    m.constrain(u >= 1.0)
    m.constrain(-1.0 * u >= 0.0)   # u <= 0: contradiction
    m.constrain(10.0 - s >= 0.0)   # bound s so the phase-I minimizer is interior
    m.minimize(s + u)
    with pytest.raises(MGBConvergenceFailure):
        m.solve()
    assert m.status == "infeasible"
