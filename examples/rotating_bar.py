"""Rotating bar stirrer (reference recipe: examples/grids/Rotating_Bar.ipynb):
a long rotated Cuboid spins in a closed tank, dragging fluid with the
obstacle's angular velocity; the projection enforces the moving-wall BCs."""
import _path  # noqa: F401 — sys.path bootstrap for script execution
import jax
import numpy as np

from phiflow_tpu.flow import *

DOMAIN = dict(x=64, y=64, bounds=Box(x=64, y=64))
velocity = StaggeredGrid(0., 0., **DOMAIN)
dt = 0.5
OMEGA = 0.4


@jax.jit  # the bar angle is a traced argument: the spinning geometry does NOT retrace
def step(velocity, angle):
    bar = Obstacle(Cuboid(vec(x=32., y=32.), half_size=vec(x=14., y=2.), rotation=angle),
                   angular_velocity=OMEGA)
    velocity, pressure = fluid.make_incompressible(
        velocity, [bar], Solve('CG', 1e-4, 1e-4, suppress=(ConvergenceException,)))
    velocity = advect.semi_lagrangian(velocity, velocity, dt)
    return velocity


if __name__ == '__main__':
    for i in range(10):
        velocity = step(velocity, jax.numpy.asarray(i * dt * OMEGA))
        vmax = float(math.max(abs(velocity.values)))
        print(f"step {i}: max |v| = {vmax:.3f}")
        assert np.isfinite(vmax)
    assert vmax > 0.5, "the bar should have stirred the fluid"
