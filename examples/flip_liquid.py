"""FLIP liquid dam break (reference recipe: docs/FLIP.ipynb)."""
import _path  # noqa: F401 — sys.path bootstrap for script execution
from phiflow_tpu.flow import *
from phiflow_tpu.field import distribute_points, finite_fill, mask as field_mask

domain = Box(x=64, y=64)
particles = distribute_points(Box['x,y', 10:35, 30:55], x=64, y=64) * (0, 0)


def step(particles, pressure=None, dt=.1):
    grid_v = prev_v = finite_fill(resample(particles, StaggeredGrid(0, 0, domain, x=64, y=64),  # closed walls
                                           scatter=True, outside_handling='clamp'))
    occupied = resample(field_mask(particles), CenteredGrid(0, grid_v.boundary.spatial_gradient(),
                                                            domain, x=64, y=64), scatter=True)
    grid_v, pressure = fluid.make_incompressible(grid_v + (0, -9.81 * dt), [], active=occupied,
                                                 solve=Solve('CG', 1e-4, suppress=(ConvergenceException,)))
    particles = particles + resample(grid_v - prev_v, particles)
    particles = advect.points(particles, grid_v, dt, advect.finite_rk4)
    particles = fluid.boundary_push(particles, [~domain])
    return particles, pressure


pressure = None
for i in range(40):
    particles, pressure = step(particles, pressure)
ys = particles.points.vector['y']
print(f"{particles.points.shape.instance.volume} particles, "
      f"max height: {float(math.max(ys, ys.shape)):.1f}")
