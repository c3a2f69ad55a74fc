"""Multigrid-preconditioned CG Newton solve (the large-level path) must
reproduce the dense-path solution."""
import importlib
import os

import numpy as np
import pytest


def test_pcg_path_matches_dense(monkeypatch):
    from mgbtpu import amg, assemble, fem2d_P2, mgb_solve, subdivide
    from mgbtpu.solver.mgb import ProblemKernels

    monkeypatch.setattr(ProblemKernels, "DENSE_MAX", 300)
    monkeypatch.setattr(ProblemKernels, "DENSE_BASE", 150)
    g = subdivide(fem2d_P2(), 3)
    z_pcg = mgb_solve(assemble(amg(g), p=1.0)).z
    monkeypatch.setattr(ProblemKernels, "DENSE_MAX", 10 ** 9)
    g2 = subdivide(fem2d_P2(), 3)
    z_dense = mgb_solve(assemble(amg(g2), p=1.0)).z
    assert np.abs(z_pcg - z_dense).max() < 1e-5


def test_gram_matvec_matches_dense():
    import jax.numpy as jnp

    from mgbtpu import amg, assemble, fem2d_P2, subdivide
    from mgbtpu.solver.barrier import node_factors
    from mgbtpu.solver.levelops import gram_diag, gram_matvec
    from mgbtpu.solver.mgb import _kernels_for, barrier_weights
    from mgbtpu.solver.newton import linesearch_backtracking

    mg = amg(subdivide(fem2d_P2(), 2))
    prob = assemble(mg, p=1.0)
    M1, _ = prob.M
    Q = prob.Q
    kern = _kernels_for(M1, Q.barrier, linesearch_backtracking(), np.float64)
    l = M1.depth - 1
    ops = kern.ops(l)
    z = prob.g_grid.T.reshape(-1)
    import jax

    Dz = jnp.asarray(M1.apply_D_full(z))
    Y = jax.vmap(Q.barrier[2])(*Q.args, Dz)
    bw = barrier_weights(M1.w, None)
    Yw = bw[:, None, None] * Y
    L = node_factors(Yw)
    H_dense = np.asarray(ops.assemble_dense(jnp.asarray(Yw)))
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(ops.n_J))
    hv = np.asarray(gram_matvec(ops, L, v))
    np.testing.assert_allclose(hv, H_dense @ np.asarray(v),
                               rtol=1e-9, atol=1e-10)
    d = np.asarray(gram_diag(ops, L))
    np.testing.assert_allclose(d, np.diag(H_dense), rtol=1e-9, atol=1e-10)
