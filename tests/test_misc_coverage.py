"""API-surface coverage (reference test_algebraic_coverage.jl model):
uniform subspace, auxiliary_postprocess, barrier_nodes, early_stop,
finalize=False, logfile."""
import io

import numpy as np
import scipy.sparse as sp

from mgbtpu import (amg, assemble, convex_linear, fem1d, fem2d_P2,
                    mgb_solve, stopping_exact)


def test_uniform_subspace():
    # a global-constant component: mean-like variable rides :uniform
    mg = amg(fem1d(nodes=np.linspace(-1, 1, 5)))
    Q = convex_linear(mg, idx=(0, 1),
                      A=lambda x: np.array([[1.0, 0.0], [-1.0, 0.0],
                                            [0.0, 1.0], [0.0, -1.0]]),
                      b=lambda x: np.array([1.0, 1.0, 1.0, 1.0]))
    prob = assemble(mg, state_variables=[("u", "full"), ("c", "uniform")],
                    D=[("u", "id"), ("c", "id")],
                    f=lambda x: np.array([1.0, 0.1]),
                    g=lambda x: np.array([0.0, 0.0]), Q=Q)
    sol = mgb_solve(prob, tol=1e-6)
    # the uniform component is the same value at every node
    c = sol.z[:, 1]
    assert np.abs(c - c[0]).max() < 1e-10


def test_auxiliary_postprocess_hook():
    # swap the auxiliary stiffness for a graph Laplacian of the same sparsity
    def graphify(K):
        K = sp.csr_matrix(K)
        coo = K.tocoo()
        off = coo.row != coo.col
        A = sp.csr_matrix((-np.ones(off.sum()),
                           (coo.row[off], coo.col[off])), shape=K.shape)
        deg = -np.asarray(A.sum(axis=1)).ravel()
        return (A + sp.diags(deg)).tocsr()

    g = fem1d(nodes=np.linspace(-1, 1, 9))
    mg = amg(g, auxiliary_postprocess=graphify)
    sol = mgb_solve(assemble(mg, p=1.5), tol=1e-6)
    assert np.all(np.isfinite(sol.z))


def test_barrier_nodes_and_finalize_false():
    g = fem1d(nodes=np.linspace(-1, 1, 5))
    mg = amg(g)
    prob = assemble(mg, p=2.0)
    n = g.n_nodes
    sol_all = mgb_solve(prob, barrier_nodes="all", finalize=False)
    mask = np.ones(n, dtype=bool)
    sol_mask = mgb_solve(prob, barrier_nodes=mask)
    assert np.abs(sol_all.z - sol_mask.z).max() < 1e-5


def test_early_stop_and_logfile():
    g = fem1d(nodes=np.linspace(-1, 1, 3))
    mg = amg(g)
    buf = io.StringIO()
    seen = []

    def stopper(z):
        seen.append(1)
        return len(seen) > 3     # halt the ramp after a few steps

    sol = mgb_solve(assemble(mg, p=2.0), early_stop=stopper, logfile=buf)
    assert len(seen) > 3
    assert "mgb_core" in buf.getvalue()
    # stopping early means t did not reach 1/tol
    assert sol.SOL_main["ts"][-1] < 1.0 / np.sqrt(np.finfo(np.float64).eps)
