"""FLIP liquid over heightmap terrain (reference recipe: examples/particles/Terrain.ipynb
+ docs/Heightmaps.ipynb): a block of liquid drops onto a sinusoidal hillside and
flows downhill; the Heightmap acts as obstacle in the projection and pushes
penetrating particles back above the surface."""
import _path  # noqa: F401 — sys.path bootstrap for script execution
import numpy as np

from phiflow_tpu.flow import *
from phiflow_tpu.field import distribute_points, finite_fill, mask as field_mask

domain = Box(x=64, y=64)
xs = math.linspace(0., 64., spatial(x=65))
terrain = Heightmap(12 + 8 * math.sin(xs / 64 * 2 * np.pi), domain, max_dist=4.)
particles = distribute_points(Box['x,y', 6:26, 36:56], x=64, y=64) * (0, 0)


def step(particles, dt=.1):
    grid_v = prev_v = finite_fill(resample(particles, StaggeredGrid(0, 0, domain, x=64, y=64),
                                           scatter=True, outside_handling='clamp'))
    occupied = resample(field_mask(particles), CenteredGrid(0, grid_v.boundary.spatial_gradient(),
                                                            domain, x=64, y=64), scatter=True)
    grid_v, pressure = fluid.make_incompressible(grid_v + (0, -9.81 * dt), [Obstacle(terrain)], active=occupied,
                                                 solve=Solve('CG', 1e-4, suppress=(ConvergenceException,)))
    particles = particles + resample(grid_v - prev_v, particles)
    particles = advect.points(particles, grid_v, dt, advect.finite_rk4)
    particles = fluid.boundary_push(particles, [terrain, ~domain])
    return particles


if __name__ == '__main__':
    for i in range(30):
        particles = step(particles)
    pts = particles.points
    ys = pts.vector['y']
    xs_p = pts.vector['x']
    surface = 12 + 8 * np.sin(np.asarray(xs_p.native()) / 64 * 2 * np.pi)
    above = np.asarray(ys.native()) >= surface - 1.0  # allow 1-cell tolerance
    print(f"{pts.shape.instance.volume} particles, {above.mean() * 100:.1f}% above terrain, "
          f"mean height {float(math.mean(ys, ys.shape)):.1f}")
    assert above.mean() > 0.97, "particles sank through the terrain"
