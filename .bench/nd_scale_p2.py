"""ND memory report for fem2d_P2 at L=6/7 — chasing the L=7 TPU worker
crash (queue3 2026-08-19). Host-only."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    levels = [int(x) for x in
              (sys.argv[1] if len(sys.argv) > 1 else "6,7").split(",")]
    from mgbtpu import amg, assemble, fem2d_P2, subdivide
    from mgbtpu.ops.ndchol import NDDevicePlan, NDPlan, nd_memory_report
    from mgbtpu.solver.levelops import build_panel_ops
    from mgbtpu.solver.mgb import ProblemKernels

    for L in levels:
        t0 = time.time()
        g = subdivide(fem2d_P2(dtype=np.float32), L)
        mg = amg(g)
        prob = assemble(mg, p=1.0, dtype=np.float32)
        setup_s = time.time() - t0
        M = prob.M[0]
        li = M.depth - 1
        p_nodes = M.geometry.x.shape[0]
        ops = build_panel_ops(M.D_fine, M.nu, M.R_fine[li], p_nodes,
                              np.float32, dd=True)
        cols = ops.host_cols
        X = np.asarray(M.geometry.xflat(), np.float64)
        exy = X.reshape(ops.N, ops.p, -1).mean(axis=1)
        plan = NDPlan(cols, ops.n_J, exy,
                      leaf_elems=ProblemKernels.ND_LEAF_ELEMS)
        dev = NDDevicePlan(plan)
        rep = nd_memory_report(dev)
        print(f"L={L}: n_J={ops.n_J} N={ops.N} C={cols.shape[1]} "
              f"depth={plan.depth} setup={setup_s:.0f}s")
        print(f"  factor_dd {rep['factor_dd_bytes'] / 1e9:.3f} GB  "
              f"peak {rep.get('peak_bytes', 0) / 1e9:.3f} GB")
        for i, lv in enumerate(rep["levels"]):
            print(f"  lvl {i}: {lv}")
        # leaf-assembly transient (the GEMM-form P/T panels)
        nk0, m_max = dev.elems_of_leaf.shape
        f0p1 = dev.leaf_loc_inv.shape[2]
        C = cols.shape[1]
        P_b = nk0 * m_max * C * f0p1 * 4
        T_b = 2 * nk0 * m_max * C * f0p1 * 4
        Hb_b = 2 * nk0 * m_max * C * C * 4
        print(f"  leaf-gemm transients: P {P_b / 1e9:.3f} GB, "
              f"T(dd) {T_b / 1e9:.3f} GB, Hb(dd) {Hb_b / 1e9:.3f} GB "
              f"(nk0={nk0} m={m_max} C={C} f0p1={f0p1})")


main()
