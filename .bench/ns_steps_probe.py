"""NS-steps quality probe: dd Cholesky + explicit inverses on a synthetic
ill-conditioned SPD matrix (kappa ~ 1e10, like the deep-t equilibrated
barrier Hessian). Measures ||I - M A|| for the full factor+solve chain.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ["MGBTPU_NO_X64"] = "1"
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

import mgbtpu  # noqa: F401  (config side effects)


def run(steps_env, tri):
    os.environ["MGBTPU_DD_TRI_INV"] = "1" if tri else "0"
    os.environ["MGBTPU_DD_NS_STEPS"] = str(steps_env)
    # fresh import of the module-level flags
    for m in list(sys.modules):
        if m.startswith("mgbtpu.ops.ddlinalg"):
            del sys.modules[m]
    import importlib

    ddl = importlib.import_module("mgbtpu.ops.ddlinalg")
    from mgbtpu.ops import df64

    rng = np.random.default_rng(0)
    n = 96
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    ev = np.logspace(-10, 0, n)
    A = (Q * ev) @ Q.T
    A = 0.5 * (A + A.T)
    Ah, Al = df64.f64_split(A[None], dtype=np.float32)
    import jax.numpy as jnp

    Lh, Ll = ddl.dd_cholesky(jnp.asarray(Ah), jnp.asarray(Al))
    # solve A X = I column block via the factor: forward + back substitution
    if ddl.TRI_INV:
        Li = ddl.dd_tri_inverse(Lh, Ll)
        # M = L^-T L^-1
        Y = ddl.dd_matmul_nt_any(
            (jnp.swapaxes(Li[0], 1, 2), jnp.swapaxes(Li[1], 1, 2)),
            (jnp.swapaxes(Li[0], 1, 2), jnp.swapaxes(Li[1], 1, 2)))
        M = np.asarray(Y[0], np.float64) + np.asarray(Y[1], np.float64)
    else:
        I3 = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), (1, n, n))
        Z = ddl.dd_tri_solve_right(Lh, Ll, I3, jnp.zeros_like(I3))
        # Z = I L^-T  => M = Z Z^T? no: solve L Y = I then L^T X = Y.
        Y = ddl.dd_matmul_nt_any(Z, Z)
        M = np.asarray(Y[0], np.float64) + np.asarray(Y[1], np.float64)
    E = np.eye(n) - M[0] @ A
    return np.linalg.norm(E, 2)


for tri, st in [(False, 0), (True, 2), (True, 3), (True, 4)]:
    print(f"tri_inv={tri} ns_steps={st}: |I - MA| = {run(st, tri):.3e}",
          flush=True)
