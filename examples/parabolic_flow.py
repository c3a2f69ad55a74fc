"""Total-variation (p=1) gradient flow, saved as an animation."""
from mgbtpu import amg, fem2d_P2, parabolic_solve
from mgbtpu.plot import save_animation

psol = parabolic_solve(amg(fem2d_P2()), p=1.0, h=0.2, verbose=True)
save_animation(psol, "flow.mp4")
print("steps:", len(psol.u))
