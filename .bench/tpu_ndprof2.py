"""Component-level cost of nd_factor_dd at level NDPROF_L: leaf assembly,
per-ND-level dd_cholesky / NS inverse / U GEMM / Schur SYRK, timed
separately (in-jit repetition)."""
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
from mgbtpu.ops import df64  # noqa: E402
from mgbtpu.ops.ddlinalg import (  # noqa: E402
    dd_cholesky, dd_matmul_nt_any, dd_syrk_sub, dd_tri_inverse)

L = int(os.environ.get("NDPROF_L", "5"))
print(f"=== ndprof2 L={L} backend={jax.default_backend()}", flush=True)
g = subdivide(fem2d_P2(dtype=np.float32), L)
prob = assemble(amg(g), p=1.0, dtype=np.float32)
M1 = prob.M[0]
kern = _kernels_for(M1, prob.Q.barrier, linesearch_backtracking(),
                    np.float32)
ops = kern.ops(M1.depth - 1)
dp = ops.pcg_ctx.nd
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
from mgbtpu.solver.levelops import gram_diag, gram_element_blocks_dd  # noqa: E402

d = gram_diag(ops, H.Lnode)
dinv = jnp.where(d > 0, jax.lax.rsqrt(d), 1.0)
Heh, Hel = jax.jit(gram_element_blocks_dd)(ops, H.Ydd, dinv)
jax.block_until_ready(Heh)
print("levels:", [(Lv.nk, Lv.amax, Lv.bmax) for Lv in dp.levels], flush=True)


def bench(name, fn, x0, R=4):
    stepped = jax.jit(lambda x: lax.fori_loop(0, R, lambda i, v: fn(v), x0))
    t0 = time.time()
    r = stepped(x0)
    jax.block_until_ready(r)
    comp = time.time() - t0
    t0 = time.time()
    r = stepped(x0)
    jax.block_until_ready(r)
    el = (time.time() - t0) / R
    print(f"{name:34s} compile={comp:6.1f}s per-op={el*1e3:9.2f} ms",
          flush=True)
    return el


# --- leaf assembly only
def leaf_assemble(e):
    eh = jnp.pad(e, ((0, 1), (0, 1), (0, 1)))
    el = jnp.pad(Hel, ((0, 1), (0, 1), (0, 1)))
    ee = dp.elems_of_leaf[:, :, None, None]
    la = dp.leaf_loc_inv[:, :, :, None]
    lb = dp.leaf_loc_inv[:, :, None, :]
    Fh, Fl = df64.dd_tree_sum((eh[ee, la, lb], el[ee, la, lb]), axis=1)
    return e + Fh[0, 0, 0] * 1e-30


tot = 0.0
tot += bench("leaf assembly", leaf_assemble, Heh, R=4)

# --- synthetic SPD dd fronts of each ND level's (nk, amax, bmax)
rng = np.random.default_rng(0)
for li, Lv in enumerate(dp.levels):
    nk, amax, bmax = Lv.nk, Lv.amax, Lv.bmax
    G = rng.standard_normal((nk, amax, amax)).astype(np.float32)
    A = G @ np.swapaxes(G, 1, 2) + amax * np.eye(amax, dtype=np.float32)
    Ah = jnp.asarray(A)
    Al = jnp.zeros_like(Ah)
    Bh = jnp.asarray(rng.standard_normal((nk, bmax, amax)).astype(np.float32))
    Bl = jnp.zeros_like(Bh)
    Ch = jnp.asarray(
        rng.standard_normal((nk, bmax, bmax)).astype(np.float32))
    Ch = Ch + jnp.swapaxes(Ch, 1, 2)
    Cl = jnp.zeros_like(Ch)
    pre = f"lvl{li} ({nk},{amax},{bmax})"
    t1 = bench(f"{pre} dd_cholesky",
               lambda a: dd_cholesky(a, Al)[0] * (1 + 1e-30), Ah, R=4)
    Lf = jax.jit(lambda: dd_cholesky(Ah, Al))()
    jax.block_until_ready(Lf[0])
    t2 = bench(f"{pre} NS tri-inverse",
               lambda a: dd_tri_inverse(a, Lf[1])[0], Lf[0], R=4)
    Li = jax.jit(lambda: dd_tri_inverse(Lf[0], Lf[1]))()
    t3 = bench(f"{pre} U gemm (B Li^T)",
               lambda b: dd_matmul_nt_any((b, Bl), Li)[0], Bh, R=4)
    U = jax.jit(lambda: dd_matmul_nt_any((Bh, Bl), Li))()
    t4 = bench(f"{pre} schur syrk",
               lambda c: dd_syrk_sub(c, Cl, U[0], U[1])[0], Ch, R=4)
    tot += t1 + t2 + t3 + t4
print(f"SUM of components = {tot*1e3:.1f} ms (vs whole factor ~389 ms)",
      flush=True)
