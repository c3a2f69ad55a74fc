cd /root/repo
run() { env MGBTPU_DENSE_MAX=4096 "$@" timeout 3000 python - <<'EOF' 2>&1 | grep "^PCG"
import sys; sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms","cpu")
import os, numpy as np, time
from mgbtpu import amg, assemble, fem2d_P2, mgb_solve, subdivide
g = subdivide(fem2d_P2(dtype=np.float32), 5); mg = amg(g)
t0=time.time()
s = mgb_solve(assemble(mg, p=1.0, dtype=np.float32))
m = s.SOL_main
cfg = {k.replace("MGBTPU_",""): os.environ.get(k,"-") for k in
       ("MGBTPU_SMOOTHER","MGBTPU_CHEB_DEG","MGBTPU_MAX_VCYCLE")}
print(f"PCG L=5 {cfg} its={int(m['its'].sum())} cg={int(m['cg'].sum())} wall={time.time()-t0:.0f}s")
EOF
}
run MGBTPU_SMOOTHER=jacobi
run MGBTPU_SMOOTHER=cheby MGBTPU_CHEB_DEG=3
run MGBTPU_SMOOTHER=cheby MGBTPU_CHEB_DEG=3 MGBTPU_MAX_VCYCLE=5
run MGBTPU_SMOOTHER=cheby MGBTPU_CHEB_DEG=2
