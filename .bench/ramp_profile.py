"""Per-step ramp profile: (t, kappa, its-by-level) for a deep fem2d_P1 solve.

Instruments the deep-L iteration tail (VERDICT #6): is the its/sqrt(n)
drift coming from more t-steps, from expensive late-ramp centerings, or
from multi-level jump overhead?  Usage:

    python .bench/ramp_profile.py [L] [p] [fem2d_P1|fem2d_P2]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
# sitecustomize force-registers the axon TPU plugin and overrides
# JAX_PLATFORMS; the config API (before any backend init) is the only
# reliable CPU switch — with the tunnel down, env-var-only hangs forever.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# separate CPU-only cache dir: mixing XLA:CPU AOT artifacts into the shared
# TPU cache risks machine-feature SIGILLs on reload (see bench._force_cpu)
jax.config.update("jax_compilation_cache_dir", "/tmp/mgbtpu_cpuprof_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import numpy as np  # noqa: E402

from mgbtpu import amg, assemble, fem2d_P1, fem2d_P2, mgb_solve, subdivide


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    p = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    fam = sys.argv[3] if len(sys.argv) > 3 else "fem2d_P1"
    ctor = {"fem2d_P1": fem2d_P1, "fem2d_P2": fem2d_P2}[fam]
    t0 = time.time()
    geom = subdivide(ctor(dtype=np.float64), L)
    prob = assemble(amg(geom), p=p, dtype=np.float64)
    print(f"setup {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    sol = mgb_solve(prob)
    m = sol.SOL_main
    its = np.asarray(m["its"])           # (levels, steps)
    ts = np.asarray(m["ts"])
    ks = np.asarray(m["kappas"])
    tot = its.sum()
    n = its.shape[0]
    print(f"solve {time.time() - t0:.1f}s  total_its={tot} steps={len(ts)} "
          f"accepted={m.get('steps_accepted')} "
          f"attempted={m.get('steps_attempted')}", flush=True)
    print(f"{'step':>4} {'t':>12} {'kappa':>8} {'its_tot':>7}  its by level")
    for i in range(len(ts)):
        col = its[:, i] if its.ndim == 2 else np.array([its[i]])
        print(f"{i:>4} {ts[i]:>12.4g} {ks[i]:>8.3f} {int(col.sum()):>7}  "
              + " ".join(str(int(v)) for v in col))
    # tail share: fraction of total its spent in the last quarter of steps
    q = max(1, len(ts) // 4)
    tail = its[:, -q:].sum() if its.ndim == 2 else its[-q:].sum()
    print(f"tail: last {q}/{len(ts)} steps = {tail}/{tot} its "
          f"({100.0 * tail / max(tot, 1):.0f}%)  levels={n}")


if __name__ == "__main__":
    main()
