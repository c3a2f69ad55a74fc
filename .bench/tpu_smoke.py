"""TPU smoke test: dd-exactness of the EFT foundation and the Pallas
kernels ON HARDWARE, then an end-to-end pallas-path solve.

The CPU interpreter cannot assert dd exactness (XLA:CPU recomputes
broadcast products across fusion boundaries with differing FMA
contraction, breaking error-free transforms at ~f32 eps — see
tests/test_pallas.py); the TPU backend has no such excess-precision pass,
so here the bars are dd-level.
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import os
import time

os.environ["MGBTPU_NO_X64"] = "1"
from mgbtpu._config import enable_compile_cache  # noqa: E402

enable_compile_cache()
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mgbtpu.ops import df64, pallas_dd  # noqa: E402

print("backend:", jax.default_backend(),
      "pallas enabled:", pallas_dd.enabled(), flush=True)

# 1. EFT exactness under jit, incl. the broadcast pattern that wobbles CPU
rng = np.random.default_rng(9)
a32 = (rng.random(256) + 0.5).astype(np.float32)
d32 = rng.standard_normal((256, 8)).astype(np.float32)
oracle = d32.astype(np.float64) * a32.astype(np.float64)[:, None]
h, l = jax.jit(lambda a, d: df64.quick_two_sum(*df64.two_prod(d, a[:, None])))(
    jnp.asarray(a32), jnp.asarray(d32))
err = np.abs(np.asarray(h, np.float64) + np.asarray(l, np.float64)
             - oracle).max()
print("TPU EFT two_prod+qts err:", err, flush=True)
assert err == 0.0, "EFT broken on TPU!"

# 2. Pallas panel kernels vs f64 oracle (dd-level bar)
nD, N, p, C = 3, 300, 7, 11
panels = rng.standard_normal((nD, N, p, C)).astype(np.float32)
Yh = rng.standard_normal((N, p, nD)).astype(np.float32)
Yl = (rng.standard_normal((N, p, nD)) * 1e-8).astype(np.float32)
adj_oracle = np.einsum("kNpc,Npk->Nc", panels.astype(np.float64),
                       Yh.astype(np.float64) + Yl.astype(np.float64))
ch, cl = pallas_dd.adj_contrib(jnp.asarray(panels.transpose(0, 2, 3, 1)),
                               jnp.asarray(Yh.transpose(1, 2, 0)),
                               jnp.asarray(Yl.transpose(1, 2, 0)))
got = (np.asarray(ch, np.float64) + np.asarray(cl, np.float64)).T
rel = np.abs(got - adj_oracle).max() / np.abs(adj_oracle).max()
print("adj_contrib vs f64 oracle rel:", rel, flush=True)
assert rel < 1e-12, "adj kernel not dd-accurate on TPU"

sg = rng.standard_normal((N, C)).astype(np.float32)
fwd_oracle = np.einsum("kNpc,Nc->pkN", panels.astype(np.float64),
                       sg.astype(np.float64))
fh, fl_ = pallas_dd.fwd_dd(jnp.asarray(panels.transpose(0, 2, 3, 1)),
                           jnp.asarray(sg.T))
gotf = np.asarray(fh, np.float64) + np.asarray(fl_, np.float64)
relf = np.abs(gotf - fwd_oracle).max() / np.abs(fwd_oracle).max()
print("fwd_dd vs f64 oracle rel:", relf, flush=True)
assert relf < 1e-12, "fwd kernel not dd-accurate on TPU"

# 3. nested-dissection factor exactness on hardware (f32 bar)
from mgbtpu.ops.ndchol import NDPlan, NDDevicePlan, nd_factor, nd_solve  # noqa: E402

elems = []
for i in range(16):
    for j in range(16):
        a = i * 17 + j; b = (i + 1) * 17 + j
        elems.append([a, b, a + 1]); elems.append([b, b + 1, a + 1])
cols = np.array(elems)
xy = np.stack([(cols // 17).mean(axis=1), (cols % 17).mean(axis=1)], axis=1)
nnd = 17 * 17
He = np.zeros((len(cols), 3, 3), np.float32)
for e in range(len(cols)):
    B = rng.standard_normal((5, 3)).astype(np.float32)
    He[e] = B.T @ B + 0.5 * np.eye(3, dtype=np.float32)
dpnd = NDDevicePlan(NDPlan(cols, nnd, xy, leaf_elems=8)).to_device()
fact = jax.jit(nd_factor)(dpnd, jnp.asarray(He), 1e-6)
b = jnp.asarray(rng.standard_normal(nnd), jnp.float32)
x = np.asarray(jax.jit(nd_solve)(dpnd, fact, b))
import scipy.sparse as sp
rows = np.repeat(cols[:, :, None], 3, axis=2).reshape(-1)
cc = np.repeat(cols[:, None, :], 3, axis=1).reshape(-1)
Hs = sp.coo_matrix((He.reshape(-1).astype(np.float64), (rows, cc)),
                   shape=(nnd, nnd)).tocsr() + 1e-6 * sp.identity(nnd)
rel_nd = np.linalg.norm(np.asarray(b) - Hs @ x) / np.linalg.norm(np.asarray(b))
print("nd_solve rel res (TPU):", rel_nd, flush=True)
assert rel_nd < 1e-4, "ND factorization inaccurate on TPU"

# 3b. Ozaki split dd-GEMM exactness on the MXU (bf16 matmuls must
# accumulate our bounded-span products exactly; asserted vs an f64 oracle)
from mgbtpu.ops.df64 import f64_split  # noqa: E402
from mgbtpu.ops.ozaki import dd_matmul_nt  # noqa: E402

Af = rng.standard_normal((2, 17, 128)) * np.exp(
    3.0 * rng.uniform(-1, 1, (2, 17, 128)))
Bf = rng.standard_normal((2, 9, 128))
A = tuple(map(jnp.asarray, f64_split(Af)))
Bz = tuple(map(jnp.asarray, f64_split(Bf)))
oh, ol = jax.jit(dd_matmul_nt)(A, Bz)
got = np.asarray(oh, np.float64) + np.asarray(ol, np.float64)
want = Af @ np.swapaxes(Bf, -1, -2)
rel_oz = np.abs(got - want).max() / np.abs(want).max()
print("ozaki dd-GEMM rel err (TPU):", rel_oz, flush=True)
assert rel_oz < 2.0 ** -42, "Ozaki split GEMM inaccurate on TPU MXU"

# 4. end-to-end solve through the kernels
from mgbtpu import amg, assemble, fem2d_P2, mgb_solve, subdivide  # noqa: E402

L = int(os.environ.get("SMOKE_L", "4"))
prob = assemble(amg(subdivide(fem2d_P2(dtype=np.float32), L)), p=1.0,
                dtype=np.float32)
t0 = time.time(); sol = mgb_solve(prob); w = time.time() - t0  # noqa: E702
t0 = time.time(); sol = mgb_solve(prob); s = time.time() - t0  # noqa: E702
m = sol.SOL_main
print(f"L={L} warm={w:.1f}s solve={s:.2f}s its={int(m['its'].sum())} "
      f"cg={int(m['cg'].sum())} finite={bool(np.isfinite(sol.z).all())}",
      flush=True)
