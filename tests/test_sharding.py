"""Multi-chip sharding dry run on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest


def test_dryrun_multichip_8():
    n = min(8, len(jax.devices()))
    if n < 2:
        pytest.skip("needs multiple devices")
    import __graft_entry__ as ge

    ge.dryrun_multichip(n)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    x, y, k, status = out
    assert np.isfinite(float(y))


def test_sharded_solve_matches_unsharded():
    """Full mgb_solve through an 8-device mesh == single-device solution."""
    n = min(8, len(jax.devices()))
    if n < 2:
        pytest.skip("needs multiple devices")
    from mgbtpu import amg, assemble, fem2d_P2, mgb_solve, subdivide
    from mgbtpu.parallel import make_mesh

    g = subdivide(fem2d_P2(), 2)   # 32 elements: divisible by 8
    mg = amg(g)
    prob = assemble(mg, p=1.5)
    z0 = mgb_solve(prob).z
    z1 = mgb_solve(prob, mesh=make_mesh(n)).z
    assert np.abs(z0 - z1).max() < 1e-8
