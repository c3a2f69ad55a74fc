"""A/B the ND leaf size + Ozaki slice bits at one level: the per-op
breakdown (perop_l6_rolled_levels_r5.log) shows the LEAF pform is 44 of
the 70 ms dd factor, and its cost is dominated by the full-width Ozaki
GEMM combines (S(S+1)/2 = 36 bf16 products tree-summed on the VPU per
GEMM) — both knobs shrink exactly that: smaller leaves shrink the
trailing width quadratically, fewer slice bits shrink the product count
quadratically. Measures make_nd_pre + dense_ir_solve + nd_solve_dd per
config in ONE process (configs re-plan the hierarchy; programs re-jit)."""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import os
import time

os.environ["MGBTPU_NO_X64"] = "1"
from mgbtpu._config import enable_compile_cache  # noqa: E402

enable_compile_cache()
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

L = int(os.environ.get("AB_L", "6"))
LEAVES = [int(x) for x in os.environ.get("AB_LEAVES", "16,8,4").split(",")]


def bench(fn, x0, R=64):
    stepped = jax.jit(lambda x: lax.fori_loop(0, R, lambda i, v: fn(v), x0))
    r = stepped(x0)
    jax.block_until_ready(r)
    t0 = time.time()
    r = stepped(x0)
    jax.block_until_ready(r)
    return (time.time() - t0) / R * 1e3


for leaf in LEAVES:
    os.environ["MGBTPU_ND_LEAF"] = str(leaf)
    from mgbtpu import amg, assemble, fem2d_P2, subdivide
    from mgbtpu.solver.mgb import ProblemKernels
    from mgbtpu.solver.newton import (dense_ir_solve, linesearch_backtracking,
                                      make_nd_pre)
    from mgbtpu.ops.ndchol import nd_solve_dd
    from mgbtpu.ops.ddarray import DD

    ProblemKernels.ND_LEAF_ELEMS = leaf
    g = subdivide(fem2d_P2(dtype=np.float32), L)
    mg = amg(g)
    prob = assemble(mg, p=1.0, dtype=np.float32)
    M1 = prob.M[0]
    kern = ProblemKernels(M1, prob.Q.barrier, linesearch_backtracking(),
                          np.float32)
    l = M1.depth - 1
    ops = kern.ops(l)
    ndp = ops.pcg_ctx.nd
    lv = [(Lv.nk, Lv.amax, Lv.bmax) for Lv in ndp.levels]
    z0 = np.asarray(prob.g_grid, np.float64).T.reshape(-1)
    Dz0 = kern._Dz0_for(z0)
    dtype = np.float32
    w = M1.w.astype(dtype)
    c = np.asarray(prob.f_grid, dtype)
    wc = jnp.asarray(w[:, None] * (1.0 * c))
    bw = jnp.asarray(np.full(len(w), 1.0 / len(w), dtype))
    args = tuple(prob.Q.args)
    f0, f1, f2 = kern.fns
    s0 = jnp.zeros((ops.n_J,), dtype)
    H = jax.jit(f2)(s0, ops, Dz0, wc, bw, *args)
    gvec = jax.jit(f1)(s0, ops, Dz0, wc, bw, *args)
    import dataclasses as _dc

    x = jnp.ones((ops.n_J,), dtype)

    def ndf(v):
        H2 = _dc.replace(H, Lnode=H.Lnode + v[0] * 1e-30)
        p = make_nd_pre(H2)
        return v + 1e-12 * p[0][0][0][0][0, 0, 0]

    t_factor = bench(ndf, x, R=32)
    pre_nd = jax.jit(make_nd_pre)(H)
    fact_nd = pre_nd[0]

    def ndsolve(v):
        xh, xl = nd_solve_dd(ndp, fact_nd, x * (1.0 + v[0] * 1e-30))
        return v + 1e-12 * xh[0]

    t_solve = bench(ndsolve, x, R=64)
    gdd = (gvec.hi, gvec.lo) if hasattr(gvec, "hi") else (
        gvec, jnp.zeros_like(gvec))

    def irs(v):
        g2 = DD(gdd[0] + v * 1e-30, gdd[1])
        d, st = dense_ir_solve(H, g2, pre=pre_nd, return_stats=True)
        from mgbtpu.ops.ddarray import fl as _fl
        return v + 1e-12 * _fl(d)

    t_ir = bench(irs, x, R=64)
    print(f"LEAF={leaf}: factor={t_factor:.2f}ms solve={t_solve:.2f}ms "
          f"ir={t_ir:.2f}ms levels={lv}", flush=True)
