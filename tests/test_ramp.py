"""Fused on-device t-ramp vs the classic host-stepped loop.

The TPU path runs the whole path-following loop in one jitted program
(``solver/ramp.py``); these tests force it on CPU (MGBTPU_FUSED_RAMP=1) and
require bit-level agreement of the trajectory endpoints with the host loop,
plus the phase-I early stop through the fused feasibility check.
"""
import io

import numpy as np
import pytest


@pytest.fixture()
def fused(monkeypatch):
    monkeypatch.setenv("MGBTPU_FUSED_RAMP", "1")


def test_fused_matches_host_loop(fused, monkeypatch):
    from mgbtpu import amg, assemble, fem1d, mgb_solve, subdivide

    geom = subdivide(fem1d(dtype=np.float64), 1)
    mg = amg(geom)
    buf = io.StringIO()
    sol_f = mgb_solve(assemble(mg, p=1.5, dtype=np.float64), logfile=buf)
    assert "fused ramp chunk" in buf.getvalue()

    monkeypatch.setenv("MGBTPU_FUSED_RAMP", "0")
    sol_h = mgb_solve(assemble(mg, p=1.5, dtype=np.float64))
    assert np.abs(sol_f.z - sol_h.z).max() < 1e-10
    # same t-trajectory endpoints and comparable step counts
    assert sol_f.SOL_main["ts"][-1] == sol_h.SOL_main["ts"][-1]
    assert abs(len(sol_f.SOL_main["ts"]) - len(sol_h.SOL_main["ts"])) <= 1


def test_fused_phase1_early_stop(fused):
    """Infeasible start: phase I must run its fused feasibility ramp and
    stop at the 2*t_first margin, then the main solve proceeds."""
    from mgbtpu import amg, assemble, fem1d, mgb_solve, subdivide

    geom = subdivide(fem1d(dtype=np.float64), 1)
    mg = amg(geom)
    # g puts the slack below the cone: |u'|^1.5 > s at the start
    prob = assemble(mg, p=1.5,
                    g=lambda x: np.array([x[0], 0.01]))
    buf = io.StringIO()
    sol = mgb_solve(prob, logfile=buf)
    log = buf.getvalue()
    assert "entering phase I" in log
    assert sol.SOL_feasibility is not None
    assert np.all(np.isfinite(sol.z))


def test_ramp_lands_exactly_on_target(fused, monkeypatch):
    """The t-ramp clamps every jump at target = 1/tol: the unclamped final
    step centered up to kappa x past the target and was the most expensive
    centering of the whole ramp (L=8 profile: 98 of 378 Newton its).
    Both loops must land the final t exactly on 1/tol."""
    from mgbtpu import amg, assemble, fem1d, mgb_solve, subdivide

    geom = subdivide(fem1d(dtype=np.float64), 1)
    prob = assemble(amg(geom), p=1.5, dtype=np.float64)
    tol = 1e-6
    sol_f = mgb_solve(prob, tol=tol)
    assert sol_f.SOL_main["ts"][-1] == 1.0 / tol

    monkeypatch.setenv("MGBTPU_FUSED_RAMP", "0")
    sol_h = mgb_solve(prob, tol=tol)
    assert sol_h.SOL_main["ts"][-1] == 1.0 / tol


def test_predictor_equivalence_and_gain(monkeypatch):
    """The central-path tangent predictor (newton._predict) is a warm start
    only: solutions must match the cold-start ramp to solver tolerance, and
    it must not cost iterations (measured at this size: 42 its vs 59).
    Fresh amg() per variant — the ramp kernel caches per AMGSystem and the
    PREDICTOR flag is baked into the traced program."""
    import mgbtpu.solver.mgb as Mg
    import mgbtpu.solver.newton as N
    import mgbtpu.solver.ramp as R
    from mgbtpu import amg, assemble, fem2d_P2, mgb_solve, subdivide

    sol_on = mgb_solve(assemble(amg(subdivide(fem2d_P2(dtype=np.float64), 2)),
                                p=1.0, dtype=np.float64))
    its_on = int(np.asarray(sol_on.SOL_main["its"]).sum())
    for m in (N, Mg, R):
        monkeypatch.setattr(m, "PREDICTOR", False)
    sol_off = mgb_solve(assemble(amg(subdivide(fem2d_P2(dtype=np.float64), 2)),
                                 p=1.0, dtype=np.float64))
    its_off = int(np.asarray(sol_off.SOL_main["its"]).sum())
    assert np.abs(sol_on.z - sol_off.z).max() < 1e-8
    assert its_on <= its_off
