"""L=7 TPU-worker crash bisect: run each solver stage in its OWN
subprocess (a kernel-fault kills the worker for the whole process; the
next subprocess reconnects) and report which program faults.

Usage: python .bench/l7_bisect.py [stage ...] — default all stages.
Stages: f2, factor, ir, newton, ramp1 (one fused-ramp step), ramp.
"""
import os
import subprocess
import sys
import time

STAGE_SRC = r"""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ["MGBTPU_NO_X64"] = "1"
from mgbtpu._config import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp
from mgbtpu import amg, assemble, fem2d_P2, subdivide
from mgbtpu.solver.mgb import ProblemKernels
from mgbtpu.solver.newton import (dense_ir_solve, linesearch_backtracking,
                                  make_nd_pre)
from mgbtpu.ops.ddarray import DD

stage = sys.argv[1]
L = int(os.environ.get("BISECT_L", "7"))
t0 = time.time()
g = subdivide(fem2d_P2(dtype=np.float32), L)
mg = amg(g)
prob = assemble(mg, p=1.0, dtype=np.float32)
M1 = prob.M[0]
kern = ProblemKernels(M1, prob.Q.barrier, linesearch_backtracking(),
                      np.float32)
l = M1.depth - 1
ops = kern.ops(l)
print(f"setup {time.time()-t0:.1f}s n_J={ops.n_J} N={ops.N}", flush=True)
z0 = np.asarray(prob.g_grid, np.float64).T.reshape(-1)
Dz0 = kern._Dz0_for(z0)
dtype = np.float32
w = M1.w.astype(dtype); c = np.asarray(prob.f_grid, dtype)
wc = jnp.asarray(w[:, None] * (1.0 * c))
bw = jnp.asarray(np.full(len(w), 1.0/len(w), dtype))
args = tuple(prob.Q.args)
f0, f1, f2 = kern.fns
s0 = jnp.zeros((ops.n_J,), dtype)

if stage == "f2":
    t0 = time.time()
    H = jax.jit(f2)(s0, ops, Dz0, wc, bw, *args)
    jax.block_until_ready(jax.tree_util.tree_leaves(H))
    print(f"f2 OK {time.time()-t0:.1f}s", flush=True)
elif stage == "factor":
    H = jax.jit(f2)(s0, ops, Dz0, wc, bw, *args)
    t0 = time.time()
    pre = jax.jit(make_nd_pre)(H)
    jax.block_until_ready(jax.tree_util.tree_leaves(pre))
    print(f"factor OK {time.time()-t0:.1f}s", flush=True)
elif stage == "ir":
    H = jax.jit(f2)(s0, ops, Dz0, wc, bw, *args)
    gv = jax.jit(f1)(s0, ops, Dz0, wc, bw, *args)
    pre = jax.jit(make_nd_pre)(H)
    t0 = time.time()
    d, st = jax.jit(lambda H, g, pre: dense_ir_solve(
        H, g, pre=pre, return_stats=True))(H, gv, pre)
    jax.block_until_ready(d)
    print(f"ir OK {time.time()-t0:.1f}s cg={st}", flush=True)
elif stage == "newton":
    t0 = time.time()
    x, y, k, status, cg = kern.run_newton(
        l, z0, wc, bw, args, maxit=3,
        stopping=("inexact", 0.5, 0.25))
    print(f"newton OK {time.time()-t0:.1f}s k={k} status={status} cg={cg}",
          flush=True)
elif stage == "full":
    # the real mgb_solve with phase logging: the stage bisect passes but
    # the full solve crashes the worker — find WHICH program/phase dies
    from mgbtpu import mgb_solve
    t0 = time.time()
    sol = mgb_solve(prob, verbose=True)
    m = sol.SOL_main
    print(f"full OK {time.time()-t0:.1f}s its={int(m['its'].sum())} "
          f"cg={int(m['cg'].sum())}", flush=True)
elif stage in ("ramp1", "ramp"):
    steps = 1 if stage == "ramp1" else 40
    t0 = time.time()
    chunk = kern.run_ramp(
        z0, 1.0, 16.0, np.inf, wc / 1.0, bw, args,
        target=float(os.environ.get("BISECT_TARGET", 64.0)),
        kappa0=16.0, max_newton=50, max_newton_retry=100, easy_its=8,
        stopping=("inexact", 0.5, 0.25), feas_block=None, max_steps=steps)
    print(f"{stage} OK {time.time()-t0:.1f}s its={chunk.its.sum()}",
          flush=True)
else:
    raise SystemExit(f"unknown stage {stage}")
"""

stages = sys.argv[1:] or ["f2", "factor", "ir", "newton", "ramp1", "ramp"]
for st in stages:
    print(f"=== stage {st}", flush=True)
    t0 = time.time()
    r = subprocess.run([sys.executable, "-c", STAGE_SRC, st],
                       cwd="/root/repo", timeout=3600,
                       capture_output=True, text=True)
    out = (r.stdout or "") + (r.stderr or "")
    with open(f"/root/repo/.bench/l7_stage_{st}.out", "w") as f:
        f.write(out)
    tail = [ln for ln in out.splitlines()
            if ln and "Warning" not in ln and "warn" not in ln][-6:]
    print("\n".join(tail), flush=True)
    print(f"=== stage {st} rc={r.returncode} wall={time.time()-t0:.0f}s",
          flush=True)
    if r.returncode != 0:
        print(f"*** stage {st} FAILED — fault isolated here", flush=True)
        break
