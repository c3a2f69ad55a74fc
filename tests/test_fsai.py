"""FSAI preconditioner: pattern plan, factor normalization, CG benefit.

The FSAI factor G (solver/fsai.py) plays the role of the reference's cuDSS
sparse direct factorization on the large-level Newton systems
(ext/MultiGridBarrierCUDAExt/cudss_solver.jl): M^-1 = G'G approximates
Hs^-1 on the equilibrated level Gram Hessian with diag(G Hs G') = 1
(Kolotilina-Yeremin normalization).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _fsai_setup(monkeypatch, L=3, p=1.0):
    from mgbtpu import amg, assemble, fem2d_P2, subdivide
    from mgbtpu.solver.mgb import ProblemKernels, _kernels_for
    from mgbtpu.solver.newton import linesearch_backtracking

    monkeypatch.setattr(ProblemKernels, "DENSE_MAX", 50)
    monkeypatch.setattr(ProblemKernels, "DENSE_BASE", 40)
    g = subdivide(fem2d_P2(), L)
    prob = assemble(amg(g), p=p)
    M1 = prob.M[0]
    kern = _kernels_for(M1, prob.Q.barrier, linesearch_backtracking(),
                        np.float64)
    ops = kern.ops(M1.depth - 1)
    assert ops.pcg_ctx is not None and ops.pcg_ctx.fsai is not None
    return ops


def _identity_lnode(ops, dtype=np.float64):
    Lnode = np.zeros((ops.n_nodes, ops.nD, ops.nD), dtype)
    for i in range(ops.nD):
        Lnode[:, i, i] = 1.0
    return jnp.asarray(Lnode)


def test_fsai_diag_normalization(monkeypatch):
    """diag(G Hs G') == 1 exactly on rows whose full lower pattern is kept
    (the Kolotilina-Yeremin property), near 1 on capped rows."""
    from mgbtpu.solver.fsai import fsai_values

    ops = _fsai_setup(monkeypatch)
    plan = ops.pcg_ctx.fsai
    Lnode = _identity_lnode(ops)
    G_vals, Gt_vals, dpos = jax.jit(fsai_values)(plan, ops, Lnode)
    assert np.isfinite(np.asarray(G_vals)).all()

    H = np.asarray(ops.assemble_gram(Lnode))
    d = np.asarray(dpos)
    Hs = H / d[:, None] / d[None, :]
    n = plan.n_J
    G = np.zeros((n, n))
    li = np.asarray(plan.low_idx)
    lm = np.asarray(plan.low_mask)
    gv = np.asarray(G_vals)
    for i in range(n):
        G[i, li[i][lm[i]]] = gv[i][lm[i]]
    diag = np.einsum("ij,jk,ik->i", G, Hs, G)
    # rows are normalized up to the 1e-6 jitter fsai_values adds for
    # batched-solve robustness
    assert abs(diag - 1.0).max() < 1e-3

    # G' ELL mirrors G exactly
    Gt = np.zeros((n, n))
    ti = np.asarray(plan.t_col)
    tm = np.asarray(plan.t_mask)
    tv = np.asarray(Gt_vals)
    for i in range(n):
        Gt[i, ti[i][tm[i]]] = tv[i][tm[i]]
    assert abs(Gt - G.T).max() == 0.0


def test_fsai_pattern_capped(monkeypatch):
    """The lower pattern is truncated at MGBTPU_FSAI_K entries per row
    (hub rows otherwise inflate the ELL width to their max count)."""
    monkeypatch.setenv("MGBTPU_FSAI_K", "6")
    from mgbtpu.solver.fsai import build_fsai_plan

    ops = _fsai_setup(monkeypatch)
    plan = build_fsai_plan(np.asarray(ops.cols), ops.n_J)
    assert plan.low_idx.shape[1] <= 6
    lm = np.asarray(plan.low_mask)
    li = np.asarray(plan.low_idx)
    # diagonal kept in the last slot of every row
    assert (li[np.arange(plan.n_J), -1] == np.arange(plan.n_J)).all()
    assert lm[:, -1].all()


def test_fsai_beats_jacobi_cg(monkeypatch):
    """Preconditioned CG with M^-1 = G'G needs measurably fewer iterations
    than diagonal (Jacobi) preconditioning on the same equilibrated system."""
    from mgbtpu.solver.fsai import fsai_apply, fsai_values

    ops = _fsai_setup(monkeypatch)
    plan = ops.pcg_ctx.fsai
    Lnode = _identity_lnode(ops)
    G_vals, Gt_vals, dpos = jax.jit(fsai_values)(plan, ops, Lnode)
    H = np.asarray(ops.assemble_gram(Lnode))
    d = np.asarray(dpos)
    Hs = H / d[:, None] / d[None, :]
    rng = np.random.default_rng(0)
    b = rng.standard_normal(plan.n_J)

    def cg_iters(M_apply, tol=1e-8, maxit=500):
        x = np.zeros_like(b)
        r = b.copy()
        z = M_apply(r)
        p2 = z.copy()
        rz = r @ z
        for k in range(maxit):
            if np.linalg.norm(r) <= tol * np.linalg.norm(b):
                return k
            Hp = Hs @ p2
            alpha = rz / (p2 @ Hp)
            x += alpha * p2
            r -= alpha * Hp
            z = M_apply(r)
            rz2 = r @ z
            p2 = z + (rz2 / rz) * p2
            rz = rz2
        return maxit

    k_fsai = cg_iters(lambda r: np.asarray(
        fsai_apply(plan, G_vals, Gt_vals, jnp.asarray(r))))
    k_jac = cg_iters(lambda r: r / np.diag(Hs))
    assert k_fsai < 0.7 * k_jac, (k_fsai, k_jac)
