"""ND direct-solver per-op cost on the TPU at level NDPROF_L (default 5).

Times nd_factor_dd / nd_solve_dd / y_matvec_dd / full dense_ir_solve
standalone (in-jit repetition, warm), printing compile + per-op times.
Run at L=6 to bisect the worker crash: if these pass, the crash is in the
composed ramp program, not the ND numerics.
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import os
import time

os.environ.setdefault("MGBTPU_NO_X64", "1")
from mgbtpu._config import enable_compile_cache  # noqa: E402

enable_compile_cache()
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from mgbtpu import amg, assemble, fem2d_P2, subdivide  # noqa: E402
from mgbtpu.solver.mgb import _kernels_for  # noqa: E402
from mgbtpu.solver.newton import (  # noqa: E402
    linesearch_backtracking, make_nd_pre, dense_ir_solve)
from mgbtpu.solver import levelops as lo  # noqa: E402
from mgbtpu.ops.ndchol import nd_factor_dd, nd_solve_dd  # noqa: E402

L = int(os.environ.get("NDPROF_L", "5"))
print(f"=== ndprof L={L} backend={jax.default_backend()}", flush=True)
t0 = time.time()
g = subdivide(fem2d_P2(dtype=np.float32), L)
prob = assemble(amg(g), p=1.0, dtype=np.float32)
M1 = prob.M[0]
kern = _kernels_for(M1, prob.Q.barrier, linesearch_backtracking(),
                    np.float32)
lvl = M1.depth - 1
ops = kern.ops(lvl)
print(f"setup {time.time()-t0:.1f}s n_J={ops.n_J} N={ops.N} "
      f"nd={ops.pcg_ctx.nd is not None}", flush=True)
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

t0 = time.time()
H = jax.jit(f2)(s0, ops, Dz0, wc, bw, *args)
jax.block_until_ready(H.Lnode)
print(f"f2 hessian compile+run {time.time()-t0:.1f}s", flush=True)
gvec = jax.jit(f1)(s0, ops, Dz0, wc, bw, *args)
ndp = H.ctx.nd

from mgbtpu.solver.levelops import (  # noqa: E402
    gram_diag, gram_element_blocks_dd)

d = gram_diag(ops, H.Lnode)
dinv = jnp.where(d > 0, jax.lax.rsqrt(d), 1.0)
Heh, Hel = jax.jit(gram_element_blocks_dd)(ops, H.Ydd, dinv)
jax.block_until_ready(Heh)
print(f"He blocks (N,C,C)={tuple(Heh.shape)}", flush=True)


def bench(name, make_prog, R=32):
    t0 = time.time()
    prog = make_prog(R)
    r = prog()
    jax.block_until_ready(r)
    comp = time.time() - t0
    t0 = time.time()
    r = prog()
    jax.block_until_ready(r)
    el = (time.time() - t0) / R
    print(f"{name:26s} compile={comp:7.1f}s per-op={el*1e3:9.2f} ms",
          flush=True)
    return el


# --- factor: chain the shift through the carry so XLA keeps every rep
def mk_factor(R):
    shift = jnp.asarray(2.0 ** -46, dtype)

    @jax.jit
    def prog():
        def body(i, s):
            fact = nd_factor_dd(ndp, Heh, Hel, s)
            return s + fact[0][0][0][0, 0, 0] * 1e-30
        return lax.fori_loop(0, R, body, shift)
    return prog


# --- solve: chain rhs
fact0 = jax.jit(lambda s: nd_factor_dd(ndp, Heh, Hel, s))(
    jnp.asarray(2.0 ** -46, dtype))
jax.block_until_ready(fact0[0][0][0])
rhs = jnp.asarray(np.random.default_rng(0).standard_normal(ops.n_J), dtype)


def mk_solve(R):
    @jax.jit
    def prog():
        def body(i, r):
            xh, xl = nd_solve_dd(ndp, fact0, r)
            return r + xh * 1e-30
        return lax.fori_loop(0, R, body, rhs)
    return prog


def mk_matvec(R):
    @jax.jit
    def prog():
        def body(i, v):
            hh, hl = lo.y_matvec_dd(ops, H.Ydd, v)
            return v + hh * 1e-30
        return lax.fori_loop(0, R, body, rhs)
    return prog


def mk_irsolve(R):
    pre = make_nd_pre(H)

    @jax.jit
    def prog():
        def body(i, gv):
            x, k = dense_ir_solve(H, gv, pre=pre, return_stats=True)
            return gv + x * 1e-30
        return lax.fori_loop(0, R, body, gvec)
    return prog


t_mv = bench("y_matvec_dd", mk_matvec, R=64)
t_sol = bench("nd_solve_dd", mk_solve, R=16)
t_fac = bench("nd_factor_dd", mk_factor, R=8)
t_ir = bench("dense_ir_solve (full)", mk_irsolve, R=8)
print(f"SUMMARY L={L} matvec={t_mv*1e3:.2f}ms solve={t_sol*1e3:.2f}ms "
      f"factor={t_fac*1e3:.2f}ms ir={t_ir*1e3:.2f}ms", flush=True)
