"""Buoyant smoke plume (reference recipe: examples/grids/Smoke_Plume.ipynb).

Run: python examples/smoke_plume.py [resolution] [steps]
"""
import _path  # noqa: F401 — sys.path bootstrap for script execution
import sys
import jax

from phiflow_tpu.flow import *

res = int(sys.argv[1]) if len(sys.argv) > 1 else 64
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50

velocity = StaggeredGrid(0., 0., x=res, y=res, bounds=Box(x=res, y=res))
smoke = CenteredGrid(0., ZERO_GRADIENT, x=res, y=res, bounds=Box(x=res, y=res))
inflow = Sphere(x=res / 2, y=res / 8, radius=res / 12)
pressure = CenteredGrid(0., ZERO_GRADIENT, x=res, y=res, bounds=Box(x=res, y=res))


@jit_compile
def step(v, s, p):
    s = advect.mac_cormack(s, v, 1.) + 0.2 * resample(inflow, to=s, soft=True)
    buoyancy = resample(s * (0., 0.1), to=v)
    v = advect.semi_lagrangian(v, v, 1.) + buoyancy
    v, p = fluid.make_incompressible(v, (), Solve('CG', 1e-3, x0=p, suppress=(ConvergenceException,)))
    return v, s, p


for i in range(steps):
    velocity, smoke, pressure = step(velocity, smoke, pressure)

from phiflow_tpu.vis._console import heatmap
print(heatmap(smoke))
print(f"total smoke: {float(math.sum(smoke.values)):.2f}, "
      f"max |div|: {float(math.max(abs(divergence(velocity).values))):.2e}")
