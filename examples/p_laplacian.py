"""The README workload: p=1 p-Laplacian on P2+bubble triangles."""
import numpy as np

from mgbtpu import amg, assemble, fem2d_P2, mgb_solve, subdivide
from mgbtpu.plot import plot

mg = amg(subdivide(fem2d_P2(), 4))
sol = mgb_solve(assemble(mg, p=1.0), verbose=True)
print("solved:", sol.z.shape, "t-steps:", len(sol.SOL_main["ts"]),
      "newton its:", int(sol.SOL_main["its"].sum()))
ax = plot(sol)
ax.figure.savefig("p_laplacian.png", dpi=120)
