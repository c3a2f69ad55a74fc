"""A/B the dd ND factor on TPU: gather vs GEMM leaf assembly, plus
nd_solve, at NDPROF_L (fem2d_P2)."""
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
from mgbtpu.solver.newton import linesearch_backtracking  # noqa: E402
from mgbtpu.solver.levelops import gram_diag, gram_element_blocks_dd  # noqa: E402
from mgbtpu.ops import ndchol  # noqa: E402

L = int(os.environ.get("NDPROF_L", "5"))
print(f"=== factor_ab L={L} backend={jax.default_backend()}", flush=True)
g = subdivide(fem2d_P2(dtype=np.float32), L)
prob = assemble(amg(g), p=1.0, dtype=np.float32)
M1 = prob.M[0]
kern = _kernels_for(M1, prob.Q.barrier, linesearch_backtracking(),
                    np.float32)
ops = kern.ops(M1.depth - 1)
dp = ops.pcg_ctx.nd
z0 = np.asarray(prob.g_grid, np.float64).T.reshape(-1)
Dz0 = kern._Dz0_for(z0)
w = M1.w.astype(np.float32)
c = np.asarray(prob.f_grid, np.float32)
wc = jnp.asarray(w[:, None] * (1.0 * c))
bw = jnp.asarray(np.full(len(w), 1.0 / len(w), np.float32))
f0, f1, f2 = kern.fns
s0 = jnp.zeros((ops.n_J,), np.float32)
H = jax.jit(f2)(s0, ops, Dz0, wc, bw, *prob.Q.args)
d = gram_diag(ops, H.Lnode)
dinv = jnp.where(d > 0, jax.lax.rsqrt(d), 1.0)
Heh, Hel = jax.jit(gram_element_blocks_dd)(ops, H.Ydd, dinv)
jax.block_until_ready(Heh)
rhs = jnp.asarray(np.random.default_rng(0).standard_normal(
    ops.n_J).astype(np.float32))


def bench(name, fn, R=8):
    """fn: scalar eps -> scalar (threads a data dependency through reps)."""
    def loop(e0):
        return lax.fori_loop(0, R, lambda i, e: fn(e), e0)

    t0 = time.time()
    r = jax.jit(loop)(jnp.asarray(0.0, jnp.float32))
    jax.block_until_ready(r)
    comp = time.time() - t0
    t0 = time.time()
    r = jax.jit(loop)(jnp.asarray(0.0, jnp.float32))
    jax.block_until_ready(r)
    el = (time.time() - t0) / R
    print(f"{name:28s} compile={comp:7.1f}s per-op={el*1e3:9.2f} ms",
          flush=True)


sh = jnp.full((ops.n_J + 1,), 2.0 ** -40, jnp.float32)
bench("factor (gemm asm)", lambda e: ndchol.nd_factor_dd(
    dp, Heh + e, Hel, sh)[0][0][0][0, 0, 0] * 1e-30)
fact = jax.jit(lambda: ndchol.nd_factor_dd(dp, Heh, Hel, sh))()
jax.block_until_ready(fact[0][0][0])
bench("solve", lambda e: ndchol.nd_solve_dd(
    dp, fact, rhs + e)[0][0] * 1e-30)
# correctness: relative residual through a CPU-sparse H apply
import scipy.sparse as sp
He = np.asarray(Heh, np.float64) + np.asarray(Hel, np.float64)
cols = np.asarray(ops.cols)
n = ops.n_J
Hs = sp.coo_matrix((He.reshape(-1),
                    (np.repeat(cols, cols.shape[1], 1).reshape(-1),
                     np.tile(cols, (1, cols.shape[1])).reshape(-1))),
                   shape=(n, n)).tocsr()
xh, xl = jax.jit(lambda: ndchol.nd_solve_dd(dp, fact, rhs))()
x = np.asarray(xh, np.float64) + np.asarray(xl, np.float64)
b = np.asarray(rhs, np.float64)
r = np.linalg.norm(Hs @ x + 2.0 ** -40 * x - b) / np.linalg.norm(b)
print(f"solve rel resid = {r:.3e}", flush=True)
