"""Smoke jets filling a Φ-logo obstacle (reference recipe:
/root/reference/examples/grids/Fluid_Logo.ipynb): three inflows of different
strengths, a union-of-boxes obstacle, CG-adaptive pressure solve."""
import _path  # noqa: F401 — sys.path bootstrap for script execution
import jax
import numpy as np

from phiflow_tpu.flow import *

domain = dict(x=64, y=64, bounds=Box(x=100, y=100))
geometries = [Box(x=(15 + x * 7, 15 + (x + 1) * 7), y=(41, 83)) for x in range(1, 10, 2)] + \
    [Box['x,y', 43:50, 41:48], Box['x,y', 15:43, 83:90], Box['x,y', 50:85, 83:90]]
geometry = union(geometries)

inflow = CenteredGrid(Box(x=(14, 21), y=(6, 10)), extrapolation.ZERO_GRADIENT, **domain) + \
    CenteredGrid(Box(x=(81, 88), y=(6, 10)), extrapolation.ZERO_GRADIENT, **domain) * 0.9 + \
    CenteredGrid(Box(x=(44, 47), y=(49, 51)), extrapolation.ZERO_GRADIENT, **domain) * 0.4


@jax.jit
def step(smoke, v, pressure):
    smoke = advect.semi_lagrangian(smoke, v, 1) + inflow
    buoyancy_force = resample(smoke * (0, 0.1), to=v)
    v = advect.semi_lagrangian(v, v, 1) + buoyancy_force
    v, pressure = fluid.make_incompressible(
        v, geometry, Solve('CG-adaptive', 1e-5, 1e-5, x0=pressure,
                           suppress=(ConvergenceException,)))
    return smoke, v, pressure


if __name__ == '__main__':
    v0 = StaggeredGrid(0, boundary=0, **domain)
    smoke0 = CenteredGrid(0, boundary=extrapolation.ZERO_GRADIENT, **domain)
    p0 = CenteredGrid(0., fluid._pressure_extrapolation(v0.boundary), **domain)
    smoke, v, p = smoke0, v0, p0
    for i in range(12):
        smoke, v, p = step(smoke, v, p)
    total = float(math.sum(smoke.values))
    vmax = float(math.max(abs(v.values)))
    div = field.divergence(v)
    inside = resample(geometry, div, soft=False)
    div_out = float(math.max(abs(div.values) * (1 - inside.values)))
    print(f"total smoke: {total:.2f}, max |v|: {vmax:.3f}, max |div| outside logo: {div_out:.2e}")
    assert np.isfinite(total) and np.isfinite(vmax)
    assert total > 10, "inflows should have emitted smoke"
    assert div_out < 1e-2
    print("done")
