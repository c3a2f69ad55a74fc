"""Solve every Zoo problem and plot the primal field."""
import numpy as np

from mgbtpu import amg, fem1d, fem2d_P2, mgb_solve, subdivide, zoo
from mgbtpu.plot import plot

mg2 = amg(subdivide(fem2d_P2(), 3))
mg1 = amg(fem1d(nodes=np.linspace(-1, 1, 17)))
problems = {
    "p_harmonic": zoo.p_harmonic(mg2, p=1.5),
    "norton_hoff": zoo.norton_hoff(mg2, p=1.5),
    "rof": zoo.rof(mg1),
    "two_sided_obstacle": zoo.two_sided_obstacle(mg1),
    "elastoplastic_torsion": zoo.elastoplastic_torsion(mg1),
    "minimal_surface": zoo.minimal_surface(mg1),
}
for name, prob in problems.items():
    sol = mgb_solve(prob, tol=1e-6)
    print(f"{name:24s} its={int(sol.SOL_main['its'].sum()):4d} "
          f"|z|max={np.abs(sol.z).max():.3f}")
    plot(sol).figure.savefig(f"zoo_{name}.png", dpi=100)
