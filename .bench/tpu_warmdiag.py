"""Warm-time anatomy at L=4: what eats the first-solve wall through the
axon tunnel — per-module compile times (jax_log_compiles), AOT export
cache hits (mgbtpu.aot), and phase walls. Run twice in fresh processes:
run 2's compile lines reveal what misses the persistent caches."""
import sys; sys.path.insert(0, "/root/repo")
import faulthandler
faulthandler.dump_traceback_later(45, repeat=True)   # catch silent phases
import os, time, logging
os.environ.setdefault("MGBTPU_NO_X64", "1")
logging.basicConfig(level=logging.WARNING,
                    format="%(asctime)s %(name)s %(message)s")
logging.getLogger("mgbtpu.aot").setLevel(logging.INFO)
import jax
jax.config.update("jax_log_compiles", True)
from mgbtpu._config import enable_compile_cache
enable_compile_cache()
import numpy as np
from mgbtpu import amg, assemble, fem2d_P2, mgb_solve, subdivide

L = int(os.environ.get("WARMDIAG_L", "4"))
t0 = time.time()
geom = subdivide(fem2d_P2(dtype=np.float32), L)
prob = assemble(amg(geom), p=1.0, dtype=np.float32)
print(f"[warmdiag] setup {time.time()-t0:.1f}s", flush=True)
t0 = time.time(); sol = mgb_solve(prob)
print(f"[warmdiag] warm solve {time.time()-t0:.1f}s its="
      f"{int(sol.SOL_main['its'].sum())}", flush=True)
t0 = time.time(); sol = mgb_solve(prob)
print(f"[warmdiag] steady solve {time.time()-t0:.3f}s", flush=True)
