"""V-cycle-preconditioned CG: iteration counts stay bounded across levels.

The BASELINE metric is "V-cycle iterations vs DOFs": with a multigrid
preconditioner built from the same AMG hierarchy the barrier method searches
over, the CG iteration count of a Newton solve must be roughly level-
independent (it may grow slowly with the barrier parameter, never with the
mesh). DENSE_MAX is forced down so small problems route through the PCG
path.
"""
import numpy as np
import jax.numpy as jnp
import pytest


@pytest.mark.parametrize("dtype", [np.float64])
def test_vcycle_cg_iterations_level_independent(monkeypatch, dtype):
    from mgbtpu import amg, assemble, fem2d_P2, subdivide
    from mgbtpu.solver import mgb as M
    from mgbtpu.solver.mgb import _kernels_for, barrier_weights
    from mgbtpu.solver.newton import linesearch_backtracking, pcg_solve
    from mgbtpu.solver.levelops import GramHessian

    monkeypatch.setattr(M.ProblemKernels, "DENSE_MAX", 50)
    monkeypatch.setattr(M.ProblemKernels, "DENSE_BASE", 40)
    counts = {}
    for L in (2, 3, 4):
        geom = subdivide(fem2d_P2(dtype=dtype), L)
        mg = amg(geom)
        prob = assemble(mg, p=2.0, dtype=dtype)
        M1, _ = prob.M
        kern = _kernels_for(M1, prob.Q.barrier, linesearch_backtracking(),
                            dtype)
        l = M1.depth - 1
        ops = kern.ops(l)
        assert ops.pcg_ctx is not None, "PCG path must engage"
        w = M1.w.astype(dtype)
        bw = barrier_weights(w, None)
        t = 100.0
        wc = (w[:, None] * (t * prob.f_grid)).astype(dtype)
        z = np.asarray(prob.g_grid, dtype=dtype).T.reshape(-1)
        fa = kern._fargs(l, z, wc, bw, tuple(prob.Q.args))
        f1, f2 = kern.fns[1], kern.fns[2]
        s0 = jnp.zeros((ops.n_J,), dtype)
        g = f1(s0, *fa)
        H = f2(s0, *fa)
        assert isinstance(H, GramHessian) and H.ctx is not None
        x, k = pcg_solve(H, g, return_stats=True)
        assert np.all(np.isfinite(np.asarray(x)))
        counts[L] = int(k)
    ks = list(counts.values())
    # bounded: the fine-level count must not grow with the mesh by more
    # than a small factor
    assert max(ks) <= 3 * max(min(ks), 1) + 10, counts
    assert max(ks) < 120, counts
