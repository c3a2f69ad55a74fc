import sys; sys.path.insert(0, "/root/repo")
import os, sys, time
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
L = int(sys.argv[1]) if len(sys.argv) > 1 else 3
from mgbtpu import amg, assemble, fem2d_P2, mgb_solve, subdivide
g64 = subdivide(fem2d_P2(), L); mg64 = amg(g64)
z64 = mgb_solve(assemble(mg64, p=1.0)).z
g = subdivide(fem2d_P2(dtype=np.float32), L); mg = amg(g)
prob = assemble(mg, p=1.0, dtype=np.float32)
t0 = time.time()
sol = mgb_solve(prob)
m = sol.SOL_main
err = np.abs(sol.z - z64).max()
cfg = {k.replace("MGBTPU_",""): os.environ.get(k, "-") for k in
       ("MGBTPU_IR_RTOL", "MGBTPU_FORCING_RTOL", "MGBTPU_IR_TAU")}
print(f"L={L} {cfg} its={int(m['its'].sum())} cg={int(m['cg'].sum())} "
      f"err={err:.2e} wall={time.time()-t0:.0f}s", flush=True)
