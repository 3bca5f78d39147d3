"""Moving & rotating obstacles (reference recipe: examples/grids/Moving_Obstacles.ipynb):
a translating box and a spinning fan stir a closed tank; obstacle masks and
velocities are rebuilt every step, the projection enforces the solid-wall BCs."""
import _path  # noqa: F401 — sys.path bootstrap for script execution
import jax
import numpy as np

from phiflow_tpu.flow import *

DOMAIN = dict(x=48, y=48, bounds=Box(x=48, y=48))
velocity = StaggeredGrid(0., 0., **DOMAIN)
dt = 0.5


@jax.jit  # time is a traced argument: the moving geometry does NOT retrace
def step(velocity, t):
    box = Obstacle(Cuboid(vec(x=10 + t * dt, y=24), half_size=vec(x=3, y=3)), velocity=(1. / dt * 0 + 2., 0.))
    fan = Obstacle(Sphere(x=34, y=24, radius=5), angular_velocity=0.8)
    velocity, pressure = fluid.make_incompressible(
        velocity, [box, fan], Solve('CG', 1e-4, 1e-4, suppress=(ConvergenceException,)))
    velocity = advect.semi_lagrangian(velocity, velocity, dt)
    return velocity


if __name__ == '__main__':
    for t in range(8):
        velocity = step(velocity, jax.numpy.asarray(float(t)))
        vmax = float(math.max(abs(velocity.values)))
        print(f"t={t}: max |v| = {vmax:.3f}")
        assert np.isfinite(vmax)
    print("done")
