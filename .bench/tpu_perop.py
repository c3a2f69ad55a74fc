import sys; sys.path.insert(0, "/root/repo")
"""Per-op device cost at the L=5 fine level via in-jit repetition:
each benched op runs R times inside one jit (chained through the carry so
XLA cannot elide it); wall time of the warm call / R ~= per-op cost.
Dispatch/sync overhead through the axon tunnel amortizes out."""
import os, time
os.environ["MGBTPU_NO_X64"] = "1"
from mgbtpu._config import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from mgbtpu import amg, assemble, fem2d_P2, subdivide
from mgbtpu.solver.mgb import _kernels_for
from mgbtpu.solver.newton import linesearch_backtracking, make_pcg_pre, make_dense_pre
from mgbtpu.solver import levelops as lo

L = int(os.environ.get("PEROP_L", "5"))
g = subdivide(fem2d_P2(dtype=np.float32), L); mg = amg(g)
prob = assemble(mg, p=1.0, dtype=np.float32)
M1 = prob.M[0]
kern = _kernels_for(M1, prob.Q.barrier, linesearch_backtracking(), np.float32)
l = M1.depth - 1
ops = kern.ops(l)
z0 = np.asarray(prob.g_grid, np.float64).T.reshape(-1)
Dz0 = kern._Dz0_for(z0)
dtype = np.float32
w = M1.w.astype(dtype); c = np.asarray(prob.f_grid, dtype)
wc = jnp.asarray(w[:, None] * (1.0 * c))
bw = jnp.asarray(np.full(len(w), 1.0/len(w), dtype))
args = tuple(prob.Q.args)
f0, f1, f2 = kern.fns
s0 = jnp.zeros((ops.n_J,), dtype)
print("setup done; compiling f2/f1", flush=True)
H = jax.jit(f2)(s0, ops, Dz0, wc, bw, *args)
gvec = jax.jit(f1)(s0, ops, Dz0, wc, bw, *args)
print("n_J", ops.n_J, "N", ops.N, "ctx", H.ctx is not None, flush=True)

def bench(name, fn, x0, R=512):
    def body(i, x):
        return fn(x)
    stepped = jax.jit(lambda x: lax.fori_loop(0, R, body, x))
    r = stepped(x0)
    jax.tree_util.tree_map(lambda a: np.asarray(a), r)  # warm + sync
    t0 = time.time()
    r = stepped(x0)
    s = jax.tree_util.tree_map(lambda a: float(np.asarray(a).ravel()[0]), r)
    el = (time.time() - t0) / R
    print(f"{name:28s} {el*1e3:9.3f} ms", flush=True)

from mgbtpu.ops.ddarray import DD, fl
x = jnp.ones((ops.n_J,), dtype)
Ydd = H.Ydd
bench("y_matvec_rel (CG matvec)", lambda v: lo.y_matvec_rel(ops, Ydd, v) * 0.5 + v * 1e-9, x)
bench("y_matvec_dd (IR matvec)", lambda v: lo.y_matvec_dd(ops, Ydd, v)[0] * 0.5 + v * 1e-9, x)
bench("gram_matvec f32", lambda v: lo.gram_matvec(ops, H.Lnode, v) * 0.5 + v * 1e-9, x)
if H.ctx is None:
    H32 = H.H32
    bench("dense H32 @ v (f32 MXU)", lambda v: (H32 @ v) * 1e-9 + v, x)
    pre = make_dense_pre(H)
    Minv, dinv = pre
    bench("Minv @ r (pre apply)", lambda v: (Minv @ v) * 1e-9 + v, x)
from mgbtpu.ops import df64
bench("dd_dot pair", lambda v: v + df64.dd_dot(v, v)[0] * 1e-20, x)
if H.ctx is not None and getattr(H.ctx, "fsai", None) is not None:
    from mgbtpu.solver.fsai import fsai_values, fsai_apply
    from mgbtpu.solver.newton import make_pcg_pre
    plan = H.ctx.fsai
    def fv(v):
        Gt, dp = fsai_values(plan, ops, H.Lnode + v[0] * 1e-30)
        return v + Gt[0, 0, 0] * 1e-12
    bench("fsai_values (refresh)", fv, x, R=64)
    import dataclasses as _dc
    def fp(v):
        H2 = _dc.replace(H, Lnode=H.Lnode + v[0] * 1e-30)
        pre = make_pcg_pre(H2)
        return v + pre[0][0, 0, 0] * 1e-12
    bench("make_pcg_pre (full)", fp, x, R=32)
    Gt, dp = jax.jit(fsai_values)(plan, ops, H.Lnode)
    bench("fsai_apply", lambda v: fsai_apply(plan, Gt, v) * 0.5 + v * 1e-9, x)
    if H.ctx.coarse_T is not None:
        T_c = H.ctx.coarse_T
        bench("coarse_T mv+rmv", lambda v: T_c.mv(T_c.rmv(v)) * 0.5 + v * 1e-9, x)
elif H.ctx is not None and getattr(H.ctx, "nd", None) is None:
    pre = make_pcg_pre(H)
    dense_chos, diags, diag_top = pre
    ctx = H.ctx
    def vcycle(r):
        def cyc(li, rr):
            if li <= ctx.dense_level:
                Minv_l, dinv = dense_chos[li]
                return dinv * (Minv_l @ (dinv * rr))
            d = diag_top if li == ctx.n_levels else diags[li]
            dinv = jnp.where(d > 0, 0.7 / d, 0.0)
            xx = dinv * rr
            o = ops if li == ctx.n_levels else ctx.coarse_ops[li]
            resid = rr - lo.gram_matvec(o, H.Lnode, xx)
            T = ctx.transfers[li - 1]
            xc = cyc(li - 1, T.rmv(resid))
            xx = xx + T.mv(xc)
            return xx + dinv * (rr - lo.gram_matvec(o, H.Lnode, xx))
        return cyc(ctx.n_levels, r)
    bench("V-cycle apply", lambda v: vcycle(v) * 0.5 + v * 1e-9, x)
bench("f1 gradient", lambda v: fl(f1(v, ops, Dz0, wc, bw, *args)) * 1e-9 + v, x)
bench("f0 objective", lambda v: v + 1e-12 * df64.s_hi(f0(v, ops, Dz0, wc, bw, *args)).astype(dtype), x, R=256)
def f2cost(v):
    Hh = f2(v, ops, Dz0, wc, bw, *args)
    leaf = Hh.Ydd[0].hi if isinstance(Hh.Ydd, tuple) else Hh.Ydd.hi
    return v + 1e-12 * jnp.sum(leaf).astype(dtype)
bench("f2 hessian build", f2cost, x, R=64)

# --- nested-dissection path (default BIG_PRE=nd): factor + IR solve ---
if H.ctx is not None and getattr(H.ctx, "nd", None) is not None:
    import dataclasses as _dc
    from mgbtpu.solver.newton import make_nd_pre, dense_ir_solve
    pre_nd = jax.jit(make_nd_pre)(H)
    def ndf(v):
        H2 = _dc.replace(H, Lnode=H.Lnode + v[0] * 1e-30)
        p = make_nd_pre(H2)
        return v + 1e-12 * p[0][0][0][0][0, 0, 0]
    bench("nd factor (make_nd_pre)", ndf, x, R=64)
    gdd = (gvec.hi, gvec.lo) if hasattr(gvec, "hi") else (gvec, jnp.zeros_like(gvec))
    from mgbtpu.ops.ddarray import DD as _DD
    def nds(v):
        g2 = _DD(gdd[0] + v * 1e-30, gdd[1])
        d, st = dense_ir_solve(H, g2, pre=pre_nd, return_stats=True)
        from mgbtpu.ops.ddarray import fl as _fl
        return v + 1e-12 * _fl(d)
    bench("dense_ir_solve (nd pre)", nds, x, R=64)

    # --- two-phase cheap (f32) factor + solve ---
    def ndf32(v):
        H2 = _dc.replace(H, Lnode=H.Lnode + v[0] * 1e-30)
        p = make_nd_pre(H2, nd_dd=False)
        return v + 1e-12 * p[0][0][0][0, 0, 0]
    bench("nd factor f32 (cheap)", ndf32, x, R=64)
    pre32 = jax.jit(lambda h: make_nd_pre(h, nd_dd=False))(H)
    def nds32(v):
        g2 = _DD(gdd[0] + v * 1e-30, gdd[1])
        d, st = dense_ir_solve(H, g2, pre=pre32, return_stats=True)
        from mgbtpu.ops.ddarray import fl as _fl
        return v + 1e-12 * _fl(d)
    bench("dense_ir_solve (f32 pre)", nds32, x, R=64)

    # --- dd factor sub-phases at the leaf level (the rolled-loop bill) ---
    from mgbtpu.ops import ddlinalg as ddl
    from mgbtpu.ops.ndchol import _leaf_assemble_dd, nd_solve_dd
    from mgbtpu.solver.levelops import gram_element_blocks_dd, gram_diag
    ndp = H.ctx.nd
    d_ = gram_diag(ops, H.Lnode)
    dinv_ = jnp.where(d_ > 0, jax.lax.rsqrt(d_), 1.0)
    Heh, Hel = jax.jit(gram_element_blocks_dd)(ops, H.Ydd, dinv_)
    def leafasm(v):
        Fh, Fl = _leaf_assemble_dd(ndp, Heh + v[0] * 1e-30, Hel)
        return v + 1e-12 * Fh[0, 0, 0]
    bench("nd leaf assemble dd", leafasm, x, R=64)
    Fh, Fl = jax.jit(_leaf_assemble_dd)(ndp, Heh, Hel)
    L0 = ndp.levels[0]
    a0 = L0.amax
    Ah = Fh[:, :a0, :a0] + jnp.broadcast_to(
        0.1 * jnp.eye(a0, dtype=dtype), (Fh.shape[0], a0, a0))
    Al = Fl[:, :a0, :a0]
    def leafchol(v):
        P = ddl.dd_cholesky_pform(Ah + v[0] * 1e-30, Al)
        return v + 1e-12 * P[0][0, 0, 0]
    bench(f"dd chol pform leaf({Fh.shape[0]}x{a0})", leafchol, x, R=32)
    Bh = Fh[:, a0:, :a0]; Bl = Fl[:, a0:, :a0]
    Pp = jax.jit(ddl.dd_cholesky_pform)(Ah, Al)
    def solveright(v):
        U = ddl.dd_tri_solve_right_pinv(Pp[0], Pp[1] + v[0] * 1e-30, Bh, Bl)
        return v + 1e-12 * U[0][0, 0, 0]
    bench("dd solve_right_pinv leaf", solveright, x, R=32)
    Uu = jax.jit(ddl.dd_tri_solve_right_pinv)(Pp[0], Pp[1], Bh, Bl)
    def syrk(v):
        S = ddl.dd_syrk_sub(Fh[:, a0:, a0:] + v[0] * 1e-30, Fl[:, a0:, a0:],
                            Uu[0], Uu[1])
        return v + 1e-12 * S[0][0, 0, 0]
    bench("dd syrk_sub leaf", syrk, x, R=32)
    fact_nd = pre_nd[0]
    def ndsolve_only(v):
        xh, xl = nd_solve_dd(ndp, fact_nd, x * (1.0 + v[0] * 1e-30))
        return v + 1e-12 * xh[0]
    bench("nd_solve_dd (one apply)", ndsolve_only, x, R=64)

    # --- per-tree-level factor cost (PEROP_LEVELS=1: one compile per
    # truncation, ~depth compiles — the cost difference between k and k-1
    # levels is level k's bill: panel chain + solve_right + syrk) ---
    if os.environ.get("PEROP_LEVELS"):
        import dataclasses as _dc2
        from mgbtpu.ops.ndchol import nd_factor_dd
        nlev = len(ndp.levels)
        prev = None
        for k in range(1, nlev + 1):
            dpk = _dc2.replace(
                ndp, levels=ndp.levels[:k],
                parent_gather=ndp.parent_gather[:max(k - 1, 0)],
                child_maps=ndp.child_maps[:max(k - 1, 0)],
                b_inc=ndp.b_inc[:k])
            def fk(v, dpk=dpk):
                f = nd_factor_dd(dpk, Heh + v[0] * 1e-30, Hel,
                                 jnp.asarray(1e-8, dtype))
                return v + 1e-12 * f[-1][0][0][0, 0, 0]
            lv = ndp.levels[k - 1]
            bench(f"nd_factor_dd depth {k} (nk={lv.nk} a={lv.amax} "
                  f"b={lv.bmax})", fk, x, R=16)
