"""Batched smoke plumes — a batch dim of inflow strengths runs through the FULL
solver (advection + projection) as one program
(reference recipe: examples/grids/Batched_Smoke.ipynb)."""
import _path  # noqa: F401 — sys.path bootstrap for script execution
from phiflow_tpu.flow import *

N = 64
bounds = Box(x=float(N), y=float(N))
rates = wrap([0.2, 0.5, 1.0, 2.0], batch('inflow_rate'))
velocity = StaggeredGrid(0.0, extrapolation.ZERO, x=N, y=N, bounds=bounds)
smoke = CenteredGrid(0.0, ZERO_GRADIENT, x=N, y=N, bounds=bounds)
inflow = resample(Sphere(x=N / 2, y=6, radius=4), to=smoke, soft=True) * rates


@jit_compile
def step(v, s, dt=1.0):
    s = advect.mac_cormack(s, v, dt) + dt * inflow
    buoyancy = resample(s * (0.0, 0.1), to=v)
    v = advect.semi_lagrangian(v, v, dt) + dt * buoyancy
    v, p = fluid.make_incompressible(v, (), Solve('CG', 1e-3, 0., suppress=(ConvergenceException,)))
    return v, s


for i in range(30):
    velocity, smoke = step(velocity, smoke)
totals = math.sum(smoke.values, 'x,y')
print("total smoke per batch entry:", [round(float(t), 1) for t in totals.inflow_rate])
arr = totals.numpy('inflow_rate')
assert all(arr[i] < arr[i + 1] for i in range(len(arr) - 1)), \
    "stronger inflow must accumulate more smoke"
print(f"batched run OK — one compiled program advanced {rates.shape.volume} simulations")
