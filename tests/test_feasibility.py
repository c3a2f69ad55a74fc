"""Phase-I behavioral tests (reference test/test_feasibility.jl model):
solver internals asserted through the log and exception codes only."""
import numpy as np
import pytest

from mgbtpu import (MGBConvergenceFailure, amg, assemble, convex_linear,
                    fem1d, mgb_solve)


def _lower_bound_problem(lower, nodes=5):
    """Minimize int u subject to u >= lower, from the infeasible start u=0."""
    mg = amg(fem1d(nodes=np.linspace(-1, 1, nodes)))
    Q = convex_linear(mg, idx=(0,), A=lambda x: np.array([[1.0]]),
                      b=lambda x: np.array([-lower]))
    return assemble(mg, state_variables=[("u", "full")], D=[("u", "id")],
                    f=lambda x: np.array([1.0]), g=lambda x: np.array([0.0]),
                    Q=Q)


def test_far_feasible_box_escalation():
    # u >= 50 is outside the initial box R = 10: phase I must press the wall,
    # grow R, and find a strictly feasible point; the main phase drives u
    # down onto the constraint.
    sol = mgb_solve(_lower_bound_problem(50.0))
    assert sol.SOL_feasibility is not None
    assert np.abs(sol.z - 50.0).max() < 1e-3
    assert "bounding box R=100" in sol.log
    assert "device" in sol.log


def test_certified_infeasible():
    # u >= 1 and u <= 0 simultaneously: the phase-I minimizer sits at
    # u ~ 1/2, far inside the box, so the activity test certifies
    # infeasibility instead of escalating to Rmax.
    mg = amg(fem1d(nodes=np.linspace(-1, 1, 5)))
    Q = convex_linear(mg, idx=(0,), A=lambda x: np.array([[1.0], [-1.0]]),
                      b=lambda x: np.array([-1.0, 0.0]))
    prob = assemble(mg, state_variables=[("u", "full")], D=[("u", "id")],
                    f=lambda x: np.array([1.0]), g=lambda x: np.array([0.0]),
                    Q=Q)
    with pytest.raises(MGBConvergenceFailure) as e:
        mgb_solve(prob)
    assert e.value.code == "infeasible"
    assert "infeasible" in str(e.value)
    assert "inside the bounding box" in str(e.value)


def test_feasibility_rmax_honest_failure():
    # u >= 1e6 is feasible, but not within feasibility_Rmax = 1000
    with pytest.raises(MGBConvergenceFailure) as e:
        mgb_solve(_lower_bound_problem(1.0e6), feasibility_Rmax=1000.0)
    assert e.value.code == "feasibility_Rmax"
    assert "feasibility_Rmax" in str(e.value)


def test_feasible_start_skips_phase1():
    sol = mgb_solve(_lower_bound_problem(-50.0))
    assert sol.SOL_feasibility is None
    assert np.abs(sol.z + 50.0).max() < 1e-3
