"""Time-varying boundary conditions (reference recipe:
examples/grids/Variable_Boundaries.ipynb): the inflow speed at x− oscillates in
time; boundary values are plain tensors so changing them per step is cheap and
the jitted step re-traces only if the STRUCTURE changes, not the value."""
import _path  # noqa: F401 — sys.path bootstrap for script execution
import jax
import numpy as np

from phiflow_tpu.flow import *

DOMAIN = dict(x=64, y=32, bounds=Box(x=64, y=32))
dt = 0.5


def make_velocity(inflow_speed):
    bc = {'x-': vec(x=inflow_speed, y=0.), 'x+': ZERO_GRADIENT, 'y': 0.}
    return StaggeredGrid(vec(x=inflow_speed, y=0.), bc, **DOMAIN)


@jax.jit
def step(values, inflow_speed):
    velocity = make_velocity(inflow_speed).with_values(values)
    velocity = advect.semi_lagrangian(velocity, velocity, dt)
    velocity, pressure = fluid.make_incompressible(
        velocity, (), Solve('CG', 1e-4, 1e-4, suppress=(ConvergenceException,)))
    return velocity.values


if __name__ == '__main__':
    velocity = make_velocity(1.0)
    values = velocity.values
    for i in range(12):
        speed = 1.0 + 0.5 * np.sin(i * 0.5)  # oscillating inflow
        values = step(values, jax.numpy.asarray(speed, jax.numpy.float32))
    vel = make_velocity(1.0).with_values(values)
    mean_ux = float(math.mean(vel.values[{'vector': 'x'}]))
    print(f"mean u_x after oscillating inflow: {mean_ux:.3f}")
    assert np.isfinite(mean_ux) and 0.3 < mean_ux < 2.0
