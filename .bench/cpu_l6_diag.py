"""CPU reproduction of the TPU L=6 cg blow-up (1907 CG its / 103 Newton).

Runs the identical f32/dd code path (MGBTPU_NO_X64=1) on CPU and prints
per-ramp-step t / its / cg so we can see WHERE the CG iterations go.
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import os
import time

os.environ.setdefault("MGBTPU_NO_X64", "1")
from mgbtpu._config import enable_compile_cache  # noqa: E402

enable_compile_cache()
import numpy as np  # noqa: E402

from mgbtpu import amg, assemble, fem2d_P2, mgb_solve, subdivide  # noqa: E402

L = int(sys.argv[1]) if len(sys.argv) > 1 else 6
t0 = time.time()
geom = subdivide(fem2d_P2(dtype=np.float32), L)
prob = assemble(amg(geom), p=1.0, dtype=np.float32)
print(f"setup {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
sol = mgb_solve(prob)
print(f"solve(warm-inclusive) {time.time()-t0:.1f}s", flush=True)
m = sol.SOL_main
its = np.atleast_2d(m["its"])   # (levels, steps)
cg = m["cg"]                    # (steps,)
ts = m["ts"]
print(f"total its={its.sum()} cg={cg.sum()} steps={len(ts)} "
      f"its.shape={its.shape}")
print(" step        t   its(sum over levels)   cg")
for i in range(len(ts)):
    print(f"{i:5d} {ts[i]:10.3e}  {int(its[:, i].sum()):5d}  {int(cg[i]):6d}",
          flush=True)
print("finite:", bool(np.isfinite(sol.z).all()))
