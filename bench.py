"""Benchmark: fem2d_P2 p=1 p-Laplacian solve wall time (the reference's
headline workload, bench.md). Prints ONE JSON line.

Baseline: reference CUDA extension (A40, structured batched-GEMM path)
solve times from bench.md: L=4: 0.664 s, L=5: 1.039 s, L=6: 1.851 s,
L=7: 5.122 s. vs_baseline = baseline_seconds / our_seconds (>1 = faster).

Both the TPU float32 path (double-float barrier evaluation + mixed-
precision GMRES-IR Newton solves) and the CPU float64 path solve to the
reference's Float64 tolerance tol = sqrt(eps(f64)); the f32/dd solution
matches the f64 one to ~4e-6 at L=4 (the residual gap is the f32 rounding
of the problem data itself).
"""
import json
import os
import sys
import time

# remember whether the caller forced float32 before we default it: the
# CPU branch below picks float64 only when the caller didn't
_CALLER_NO_X64 = bool(os.environ.get("MGBTPU_NO_X64"))
os.environ.setdefault("MGBTPU_NO_X64", "1")

import numpy as np


def _enable_cache():
    from mgbtpu._config import enable_compile_cache

    enable_compile_cache()


BASELINE_GPU = {4: 0.664, 5: 1.039, 6: 1.851, 7: 5.122}


def run(L: int, dtype):
    from mgbtpu import amg, assemble, fem2d_P2, mgb_solve, subdivide

    t0 = time.time()
    geom = subdivide(fem2d_P2(dtype=dtype), L)
    mg = amg(geom)
    setup_s = time.time() - t0

    # assemble once: the solve metric matches the reference's bench.md,
    # which times the solver given an assembled problem (re-assembling
    # would re-trace the jitted programs and measure host tracing instead)
    prob = assemble(mg, p=1.0, dtype=dtype)

    def solve():
        t1 = time.time()
        sol = mgb_solve(prob)
        return time.time() - t1, sol

    warm_s, sol = solve()          # includes jit compiles
    solve_s, sol = solve()         # warm caches
    n_dofs = sol.z.size
    its = int(sol.SOL_main["its"].sum())
    return dict(setup_s=setup_s, warm_s=warm_s, solve_s=solve_s,
                n_dofs=n_dofs, newton_its=its,
                finite=bool(np.all(np.isfinite(sol.z))))


def main():
    _enable_cache()
    import jax

    L = int(os.environ.get("MGB_BENCH_L", "5"))
    backend = jax.default_backend()
    if backend == "cpu" and not _CALLER_NO_X64:
        jax.config.update("jax_enable_x64", True)
        dtype = np.float64
    else:
        dtype = np.float32
    # optional scaling curve (MGB_BENCH_CURVE=4,5,6): extra levels recorded
    # alongside the headline L in "extra.curve"
    curve = {}
    for Lc in [int(x) for x in
               os.environ.get("MGB_BENCH_CURVE", "").split(",") if x]:
        if Lc == L:
            continue
        try:
            rc = run(Lc, dtype)
            basec = BASELINE_GPU.get(Lc)
            curve[Lc] = {"solve_s": round(rc["solve_s"], 4),
                         "warm_s": round(rc["warm_s"], 3),
                         "newton_its": rc["newton_its"],
                         "vs_baseline": round(basec / rc["solve_s"], 3)
                         if basec else None}
        except Exception as e:  # pragma: no cover - curve is best-effort
            curve[Lc] = {"error": f"{type(e).__name__}: {e}"[:200]}
    r = run(L, dtype)
    base = BASELINE_GPU.get(L)
    vs = (base / r["solve_s"]) if base else None
    print(json.dumps({
        "metric": f"fem2d_P2 p=1 L={L} ({r['n_dofs']//2} dofs/component) "
                  f"solve wall time, {backend} {np.dtype(dtype).name}",
        "value": round(r["solve_s"], 4),
        "unit": "s",
        "vs_baseline": round(vs, 3) if vs else None,
        "extra": {"warm_s": round(r["warm_s"], 3),
                  "setup_s": round(r["setup_s"], 3),
                  "newton_its": r["newton_its"],
                  "finite": r["finite"],
                  "baseline_A40_s": base,
                  **({"curve": curve} if curve else {})},
    }))


if __name__ == "__main__":
    main()
