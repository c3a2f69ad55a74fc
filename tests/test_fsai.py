"""FSAI preconditioner: pattern plan, factor normalization, CG benefit.

The FSAI factor G (solver/fsai.py) plays the role of the reference's cuDSS
sparse direct factorization on the large-level Newton systems
(ext/MultiGridBarrierCUDAExt/cudss_solver.jl): M^-1 = G'G approximates
Hs^-1 on the equilibrated level Gram Hessian with diag(G Hs G') = 1
(Kolotilina-Yeremin normalization). The apply runs through 128-block BSR
tiles (ops/bsr.py).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _fsai_setup(monkeypatch, L=3, p=1.0):
    from mgbtpu import amg, assemble, fem2d_P2, subdivide
    from mgbtpu.solver import newton as NW
    from mgbtpu.solver.mgb import ProblemKernels, _kernels_for
    from mgbtpu.solver.newton import linesearch_backtracking

    monkeypatch.setattr(ProblemKernels, "DENSE_MAX", 50)
    monkeypatch.setattr(ProblemKernels, "DENSE_BASE", 40)
    # the default large-level solver is the nested-dissection direct
    # factorization; these tests exercise the FSAI machinery specifically
    monkeypatch.setattr(NW, "BIG_PRE", "fsai2")
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


def _dense_G(plan, Gtiles):
    """Reconstruct the dense FSAI factor from its BSR tiles."""
    from mgbtpu.ops.bsr import B

    n = plan.n_J
    Gfull = np.zeros((plan.g_nrt * B, plan.g_nct * B))
    tiles = np.asarray(Gtiles)
    rid = np.asarray(plan.g_rid)
    cid = np.asarray(plan.g_cid)
    for t in range(plan.g_T):
        r0, c0 = rid[t] * B, cid[t] * B
        Gfull[r0:r0 + B, c0:c0 + B] += tiles[t]
    return Gfull[:n, :n]


def test_fsai_diag_normalization(monkeypatch):
    """diag(G Hs G') == 1 (the Kolotilina-Yeremin property), and the BSR
    apply equals the dense G'G r."""
    from mgbtpu.solver.fsai import fsai_apply, fsai_values

    ops = _fsai_setup(monkeypatch)
    plan = ops.pcg_ctx.fsai
    Lnode = _identity_lnode(ops)
    Gtiles, dpos = jax.jit(fsai_values)(plan, ops, Lnode)
    assert np.isfinite(np.asarray(Gtiles)).all()

    H = np.asarray(ops.assemble_gram(Lnode))
    d = np.asarray(dpos)
    assert np.allclose(d, np.sqrt(np.diag(H)), rtol=1e-6)
    Hs = H / d[:, None] / d[None, :]
    G = _dense_G(plan, Gtiles)
    # lower triangular with positive diagonal
    assert abs(np.triu(G, 1)).max() == 0.0
    assert np.diag(G).min() > 0
    diag = np.einsum("ij,jk,ik->i", G, Hs, G)
    # normalized up to the 1e-6 jitter fsai_values adds for solve robustness
    assert abs(diag - 1.0).max() < 1e-3

    rng = np.random.default_rng(0)
    r = rng.standard_normal(plan.n_J)
    out = np.asarray(fsai_apply(plan, Gtiles, jnp.asarray(r)))
    ref = G.T @ (G @ r)
    assert abs(out - ref).max() < 1e-10 * abs(ref).max()


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
    Gtiles, dpos = jax.jit(fsai_values)(plan, ops, Lnode)
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
        fsai_apply(plan, Gtiles, jnp.asarray(r))))
    k_jac = cg_iters(lambda r: r / np.diag(Hs))
    assert k_fsai < 0.7 * k_jac, (k_fsai, k_jac)


def test_fsai2_coarse_correction_cuts_cg(monkeypatch):
    """The two-level cycle (FSAI smoothing + Galerkin coarse correction,
    MGBTPU_BIG_PRE=fsai2) needs fewer CG iterations than plain FSAI on the
    same system — the coarse solve removes the smooth modes a local
    approximate inverse cannot see."""
    from mgbtpu.solver.fsai import fsai_apply, fsai_values

    ops = _fsai_setup(monkeypatch, L=3)
    ctx = ops.pcg_ctx
    plan = ctx.fsai
    assert ctx.coarse_T is not None
    Lnode = _identity_lnode(ops)
    Gtiles, dpos = jax.jit(fsai_values)(plan, ops, Lnode)
    H = np.asarray(ops.assemble_gram(Lnode))
    d = np.asarray(dpos)
    Hs = H / d[:, None] / d[None, :]
    Hc = np.asarray(ctx.coarse_ops[ctx.dense_level].assemble_gram(Lnode))
    Hc_inv = np.linalg.inv(Hc)
    T_c = ctx.coarse_T

    def coarse_corr(rs):
        w = np.asarray(T_c.rmv(jnp.asarray(d * rs)))
        return d * np.asarray(T_c.mv(jnp.asarray(Hc_inv @ w)))

    def fsai_only(r):
        return np.asarray(fsai_apply(plan, Gtiles, jnp.asarray(r)))

    def two_level(rs):
        x1 = fsai_only(rs)
        x2 = x1 + coarse_corr(rs - Hs @ x1)
        return x2 + fsai_only(rs - Hs @ x2)

    rng = np.random.default_rng(1)
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

    k2 = cg_iters(two_level)
    k1 = cg_iters(fsai_only)
    assert k2 < k1, (k2, k1)
