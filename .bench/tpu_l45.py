import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ["MGBTPU_NO_X64"]="1"
from mgbtpu._config import enable_compile_cache
enable_compile_cache()
import numpy as np
from mgbtpu import amg, assemble, fem2d_P2, mgb_solve, subdivide
for L in (4, 5):
    geom = subdivide(fem2d_P2(dtype=np.float32), L)
    mg = amg(geom)
    prob = assemble(mg, p=1.0, dtype=np.float32)
    for trial in range(2):
        t0=time.time()
        sol = mgb_solve(prob)
        el = time.time()-t0
        m = sol.SOL_main
        print(f"L={L} trial={trial}: wall={el:.2f}s its={int(m['its'].sum())} "
              f"cg={int(m['cg'].sum())} t_end={m['ts'][-1]:.3g}", flush=True)
