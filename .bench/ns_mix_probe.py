"""Which TRI_INV use hurts: Cholesky-internal panel inverses, or the
front-level inverse used by the solve? Mix-and-match probe, plus the
partitioned-inverse (P-form) apply."""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ["MGBTPU_NO_X64"] = "1"
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["MGBTPU_DD_TRI_INV"] = "panel"

import numpy as np
import jax.numpy as jnp

import mgbtpu  # noqa: F401
from mgbtpu.ops import df64
from mgbtpu.ops import ddlinalg as ddl

rng = np.random.default_rng(0)
n = 96
Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
ev = np.logspace(-10, 0, n)
A = 0.5 * ((Q * ev) @ Q.T + ((Q * ev) @ Q.T).T)
Ah, Al = df64.f64_split(A[None], dtype=np.float32)
Ah, Al = jnp.asarray(Ah), jnp.asarray(Al)


def chol(tri):
    ddl.TRI_INV = tri
    ddl.TRI_PANEL = tri
    return ddl.dd_cholesky(Ah, Al)


def apply_via(L, mode):
    I3 = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), (1, n, n))
    if mode == "subst":
        Z = ddl.dd_tri_solve_right(L[0], L[1], I3, jnp.zeros_like(I3))
        Y = ddl.dd_matmul_nt_any(Z, Z)
    elif mode == "panel":
        P = ddl.dd_tri_pinv(L[0], L[1])
        Z = ddl.dd_tri_solve_right_pinv(P[0], P[1], I3, jnp.zeros_like(I3))
        Y = ddl.dd_matmul_nt_any(Z, Z)
    else:
        Li = ddl.dd_tri_inverse(L[0], L[1])
        Y = ddl.dd_matmul_nt_any(
            (jnp.swapaxes(Li[0], 1, 2), jnp.swapaxes(Li[1], 1, 2)),
            (jnp.swapaxes(Li[0], 1, 2), jnp.swapaxes(Li[1], 1, 2)))
    M = np.asarray(Y[0], np.float64) + np.asarray(Y[1], np.float64)
    return np.linalg.norm(np.eye(n) - M[0] @ A, 2)


for chol_tri in (False, True):
    L = chol(chol_tri)
    for mode in ("subst", "panel", "inv"):
        print(f"chol_tri_inv={chol_tri} apply={mode}: "
              f"|I-MA| = {apply_via(L, mode):.3e}", flush=True)

# left-solve apply quality (the nd_solve_dd path): y = A^-1 b via
# L, L^T solves; compare panel vs subst on a random rhs
L = chol(True)
b = rng.standard_normal(n).astype(np.float32)
bh = jnp.asarray(b[None])
bl = jnp.zeros_like(bh)
x_ref = np.linalg.solve(A, b.astype(np.float64))
ddl.TRI_PANEL = True
P = ddl.dd_tri_pinv(L[0], L[1])
y = ddl.dd_tri_solve_left_pinv(P[0], P[1], bh, bl)
x_p = ddl.dd_tri_solve_left_pinv(P[0], P[1], y[0], y[1], transpose=True)
y = ddl.dd_tri_solve_left(L[0], L[1], bh, bl)
x_s = ddl.dd_tri_solve_left(L[0], L[1], y[0], y[1], transpose=True)
for tag, x in (("panel", x_p), ("subst", x_s)):
    xd = np.asarray(x[0], np.float64)[0] + np.asarray(x[1], np.float64)[0]
    print(f"left-solve {tag}: rel err = "
          f"{np.linalg.norm(xd - x_ref) / np.linalg.norm(x_ref):.3e}",
          flush=True)
