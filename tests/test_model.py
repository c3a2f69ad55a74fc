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
    # reference accessors (mgb_solution / solver_log,
    # src/jump_frontend.jl:135-147)
    assert m.mgb_solution() is sol
    assert "mgb_solve" in m.solver_log()


def test_obstacle_model(mg1):
    # min int |u'|^2/2 + u  with -0.1 <= u <= 1 (two_sided_obstacle shape)
    m = Model(mg1)
    u = m.variable("u")
    s = m.variable("s", start=10.0)
    m.dirichlet(u, 0.0)
    m.epigraph(s, [u.dx()], p=2.0)
    c_lo = m.constrain(u >= -0.1)
    m.constrain(u <= 1.0)
    m.minimize(0.5 * s + 1.0 * u)
    m.solve(tol=1e-6)
    uv = m.value(u)
    assert uv.min() >= -0.1 - 1e-6
    assert uv.min() < -0.09          # forcing reaches the obstacle
    # central-path duals: the lower-bound multiplier is positive on the
    # active set and ~0 where inactive
    mu = m.dual(c_lo)
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


def test_equality_reaction_duals():
    """Equality (Dirichlet) duals are assembled reactions: for
    -u'' = f with u(+-1) = 0 the boundary reactions equal -u'(x) n(x)
    (flux), validated against the analytic derivative. Reference
    test_jump.jl's equality-dual design."""
    mg = amg(fem1d(nodes=np.linspace(-1, 1, 9)))
    m = Model(mg)
    u = m.variable("u")
    s = m.variable("s", start=10.0)
    ceq = m.dirichlet(u, 0.0)
    m.epigraph(s, [u.dx()], p=2.0)
    m.minimize(0.5 * s + 1.0 * u)   # min int |u'|^2/2 + u  => -u'' = -1
    m.solve(tol=1e-8)
    react = m.dual(ceq)
    # exact: u = (x^2 - 1)/2, u' = x; reaction at x=+-1 is u'(x) n = 1
    # (both signs positive: outward flux of the convex objective)
    nz = react[react != 0]
    assert len(nz) == 2
    assert np.abs(np.abs(nz) - 1.0).max() < 1e-2
    # interior reactions vanish
    assert np.abs(react).sum() < 2.1


def test_pair_region_constraint():
    """On(pairs)-style region: the bound applies only at the listed nodes."""
    mg = amg(fem1d(nodes=np.linspace(-1, 1, 5)))
    m = Model(mg)
    u = m.variable("u")
    s = m.variable("s", start=10.0)
    m.dirichlet(u, 0.0)
    m.epigraph(s, [u.dx()], p=2.0)
    geom = mg.geometry
    x = geom.xflat()
    left = [i for i in range(len(x)) if x[i, 0] <= 0]
    m.constrain(u >= -0.02, where=left)
    m.minimize(0.5 * s + 2.0 * u)
    m.solve(tol=1e-6)
    uv = m.value(u)
    xs = x[:, 0]
    assert uv[xs <= 0].min() >= -0.02 - 1e-6
    assert uv[xs > 0].min() < -0.03   # unconstrained side digs deeper


def test_warm_start_resolve(mg1):
    m = Model(mg1)
    u = m.variable("u")
    s = m.variable("s", start=2.0)
    m.dirichlet(u, lambda x: x[0])
    m.epigraph(s, [u.dx()], p=1.0)
    m.minimize(s + 0.5 * u)
    m.solve()
    u1 = m.value(u)
    m2 = Model(mg1)
    u2v = m2.variable("u")
    s2v = m2.variable("s")
    m2.dirichlet(u2v, lambda x: x[0])
    m2.epigraph(s2v, [u2v.dx()], p=1.0)
    m2.minimize(s2v + 0.5 * u2v)
    m2.set_start(u2v, u1)
    m2.set_start(s2v, m.value(s) + 1.0)
    m2.solve()
    assert np.abs(m2.value(u2v) - u1).max() < 1e-6


def test_spectral_fallback_whole_boundary():
    """Spectral discretizations route whole-boundary equality conditions
    onto the truncation :dirichlet subspace (reference
    ext/MultiGridBarrierJuMPExt:1018-1048)."""
    from mgbtpu import spectral1d

    mg = amg(spectral1d(n=8))
    m = Model(mg)
    u = m.variable("u")
    s = m.variable("s", start=4.0)
    m.dirichlet(u, lambda x: x[0])
    m.epigraph(s, [u.dx()], p=1.0)
    m.minimize(s + 0.5 * u)
    m.solve(tol=1e-6)
    uv = m.value(u)
    x = mg.geometry.xflat()[:, 0]
    assert abs(uv[np.argmin(x)] + 1) < 1e-5
    assert abs(uv[np.argmax(x)] - 1) < 1e-5
