"""TPU parabolic scale run: time-dependent p=1 p-Laplacian (implicit Euler).

The BASELINE config list names "parabolic_solve time-dependent p-Laplacian
at 1M+ DOFs"; this measures the per-timestep cost at depth on the real
chip (kernels are cached across steps, so step 2+ is the steady-state
number). Usage: python .bench/tpu_parabolic.py [L] [steps]
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import json
import os
import time

os.environ.setdefault("MGBTPU_NO_X64", "1")
if os.environ.get("MGB_FORCE_CPU"):
    # smoke-test mode: sitecustomize overrides JAX_PLATFORMS, so the
    # config API (before backend init) is the only reliable CPU switch
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    from mgbtpu._config import enable_compile_cache

    enable_compile_cache()
import numpy as np  # noqa: E402

from mgbtpu import amg, fem2d_P1, subdivide  # noqa: E402
from mgbtpu.solver.parabolic import parabolic_solve  # noqa: E402

L = int(sys.argv[1]) if len(sys.argv) > 1 else 7
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
# f32 + dd on the TPU path; plain f64 for the CPU smoke-test mode
DTYPE = (np.float64 if (os.environ.get("MGB_FORCE_CPU")
                        and not os.environ.get("MGBTPU_NO_X64"))
         else np.float32)
t0 = time.time()
mg = amg(subdivide(fem2d_P1(dtype=DTYPE), L))
setup_s = time.time() - t0
h = 0.2
t0 = time.time()
sol = parabolic_solve(mg, p=1.0, h=h, t0=0.0, t1=h * steps,
                      dtype=DTYPE)
total_s = time.time() - t0
u_last = np.asarray(sol.u[-1])
n = u_last.size
finite = bool(np.isfinite(u_last).all())
print(json.dumps({
    "metric": f"parabolic fem2d_P1 p=1 L={L} ({n} u-dofs) x {steps} steps",
    "setup_s": round(setup_s, 1), "total_s": round(total_s, 1),
    "per_step_s": round(total_s / steps, 2), "finite": finite}),
    flush=True)
