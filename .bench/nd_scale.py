"""ND plan build + factor memory at scale (the 1M-DOF BASELINE target).

For each level: host AMG setup, fine-level PanelOps, nested-dissection
symbolic plan, analytic factor/transient memory (ops/ndchol.py
nd_memory_report), peak RSS. Pure host work — runs with the TPU down.

Usage: python .bench/nd_scale.py [levels, default "9,10,11"]
"""
import resource
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    levels = [int(x) for x in
              (sys.argv[1] if len(sys.argv) > 1 else "9,10,11").split(",")]
    from mgbtpu import amg, assemble, fem2d_P1, subdivide
    from mgbtpu.ops.ndchol import NDPlan, NDDevicePlan, nd_memory_report
    from mgbtpu.solver.levelops import build_panel_ops
    from mgbtpu.solver.mgb import ProblemKernels

    for L in levels:
        t0 = time.time()
        g = subdivide(fem2d_P1(dtype=np.float32), L)
        mg = amg(g)
        prob = assemble(mg, p=1.0, dtype=np.float32)
        setup_s = time.time() - t0
        M = prob.M[0]
        l = M.depth - 1
        t0 = time.time()
        p_nodes = M.geometry.x.shape[0]   # broken nodes per element
        ops = build_panel_ops(M.D_fine, M.nu, M.R_fine[l], p_nodes,
                              np.float32, dd=True)
        ops_s = time.time() - t0
        cols = ops.host_cols
        X = np.asarray(M.geometry.xflat(), np.float64)
        exy = X.reshape(ops.N, ops.p, -1).mean(axis=1)
        t0 = time.time()
        plan = NDPlan(cols, ops.n_J, exy,
                      leaf_elems=ProblemKernels.ND_LEAF_ELEMS)
        dev = NDDevicePlan(plan)
        plan_s = time.time() - t0
        rep = nd_memory_report(dev)
        top = rep["levels"][-1]
        print(f"L={L}: n_J={ops.n_J} N={ops.N} depth={plan.depth} | "
              f"setup {setup_s:.1f}s panel_ops {ops_s:.1f}s "
              f"nd_plan {plan_s:.1f}s | "
              f"factor_dd {rep['factor_dd_bytes']/1e9:.3f} GB "
              f"peak_dd {rep['peak_dd_bytes']/1e9:.3f} GB "
              f"top_front a={top['amax']} b={top['bmax']} | "
              f"rss {rss_gb():.1f} GB", flush=True)


if __name__ == "__main__":
    main()
