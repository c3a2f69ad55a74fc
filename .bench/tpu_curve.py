"""TPU scaling curve: fem2d_P2 p=1 at L=4..7, fused ramp, ND solver.

Prints one line per level (setup/warm/solve/its/cg) plus a JSON summary;
`python .bench/tpu_curve.py 4 5 6` selects levels. MGBTPU_DENSE_MAX can
force the ND path down to smaller levels for A/B runs.
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import json
import os
import time

os.environ.setdefault("MGBTPU_NO_X64", "1")
from mgbtpu._config import enable_compile_cache  # noqa: E402

enable_compile_cache()
import numpy as np  # noqa: E402

from mgbtpu import amg, assemble, fem2d_P2, mgb_solve, subdivide  # noqa: E402
from mgbtpu.utils.errors import MGBConvergenceFailure  # noqa: E402

BASELINE_A40 = {4: 0.664, 5: 1.039, 6: 1.851, 7: 5.122}


def persist(out):
    """Merge into last_tpu_curve.json NOW: a tunnel drop mid-curve kills
    this process via the queue's timeout, and anything not yet on disk is
    a lost hardware measurement (they are hours apart some days)."""
    import datetime

    path = os.path.join(os.path.dirname(__file__), "last_tpu_curve.json")
    prev = {}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f).get("curve", {})
    prev.update({str(k): v for k, v in out.items()})
    with open(path, "w") as f:
        json.dump({"curve": prev,
                   "recorded_utc":
                   datetime.datetime.now(datetime.UTC).isoformat()}, f)


out = {}
for L in [int(a) for a in (sys.argv[1:] or ["4", "5", "6"])]:
    t0 = time.time()
    geom = subdivide(fem2d_P2(dtype=np.float32), L)
    prob = assemble(amg(geom), p=1.0, dtype=np.float32)
    setup_s = time.time() - t0
    rec = {"setup_s": round(setup_s, 1)}
    try:
        t0 = time.time(); sol = mgb_solve(prob); warm = time.time() - t0
        t0 = time.time(); sol = mgb_solve(prob); solve = time.time() - t0
        m = sol.SOL_main
        n_dofs = int(sol.z.shape[0])
        rec.update(warm_s=round(warm, 1), solve_s=round(solve, 3),
                   its=int(m["its"].sum()), cg=int(m["cg"].sum()),
                   n_dofs=n_dofs,
                   its_per_sqrt_n=round(float(m["its"].sum())
                                        / np.sqrt(n_dofs), 3),
                   finite=bool(np.isfinite(sol.z).all()),
                   vs_baseline=round(BASELINE_A40.get(L, 0) / solve, 3)
                   if BASELINE_A40.get(L) else None)
        print(f"L={L}: setup={setup_s:.1f}s warm={warm:.1f}s "
              f"solve={solve:.3f}s its={rec['its']} cg={rec['cg']} "
              f"vs_A40={rec['vs_baseline']}", flush=True)
    except MGBConvergenceFailure as e:
        rec["error"] = str(e)
        print(f"L={L}: FAIL {e}", flush=True)
    except Exception as e:  # noqa: BLE001 - record and continue the curve
        rec["error"] = f"{type(e).__name__}: {e}"[:300]
        print(f"L={L}: ERROR {rec['error']}", flush=True)
    out[L] = rec
    try:  # persist for bench.py to attach as provenance-marked extra data
        persist(out)
    except Exception as e:  # pragma: no cover
        print("persist failed:", e)
print("CURVE " + json.dumps(out), flush=True)
