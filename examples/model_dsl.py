"""Declarative modeling: elastoplastic torsion via the Model front end."""
import numpy as np

from mgbtpu import Model, amg, fem2d_P2, subdivide

mg = amg(subdivide(fem2d_P2(), 3))
m = Model(mg)
u = m.variable("u")
s = m.variable("s", start=0.5)
m.dirichlet(u, 0.0)
m.epigraph(s, u.grad(), p=2.0)          # s >= |grad u|^2
m.constrain(1.0 - 1.0 * s >= 0.0)       # yield bound s <= smax^2
m.minimize(0.5 * s + 4.0 * u)
m.solve(tol=1e-6)
uv = m.value(u)
print("status:", m.status, " min u:", uv.min())
print("yield-bound duals (max):", m.dual(m.constraints[1]).max())
