"""Channel flow past a cylinder — wake formation behind an obstacle
(reference recipe: examples/grids/Wake_Flow.ipynb)."""
import _path  # noqa: F401 — sys.path bootstrap for script execution
from phiflow_tpu.flow import *

NX, NY = 128, 64
bounds = Box(x=float(NX), y=float(NY))
# inflow u=1 at x-, open outflow at x+, free-slip walls in y
v_boundary = extrapolation.combine_sides(
    x=(vec(x=1.0, y=0.0), ZERO_GRADIENT), y=ZERO_GRADIENT)
velocity = StaggeredGrid((1.0, 0.0), v_boundary, x=NX, y=NY, bounds=bounds)
cylinder = Obstacle(Sphere(x=24, y=NY / 2 + 1, radius=6))  # slight offset seeds asymmetry


@jit_compile
def step(v, p):
    v = advect.semi_lagrangian(v, v, 1.0)
    v, p = fluid.make_incompressible(
        v, (cylinder,), Solve('CG', 1e-3, 0., x0=p, suppress=(ConvergenceException,)))
    return v, p


pressure = None
for i in range(120):
    velocity, pressure = step(velocity, pressure)
u = velocity.at_centers().values[{'vector': 'x'}]
wake = u.x[30:60].y[NY // 2 - 4:NY // 2 + 4]     # behind the cylinder
free = u.x[30:60].y[4:12]                        # near-wall stream, same x range
wake_deficit = float(math.mean(free) - math.mean(wake))
uy = velocity.at_centers().values[{'vector': 'y'}]
print(f"wake velocity deficit: {wake_deficit:.3f} (positive = slowed wake)")
print(f"max |u_y| (wake unsteadiness): {float(math.max(abs(uy))):.3f}")
assert wake_deficit > 0.05, "flow behind the cylinder must be slower than the free stream"
