"""Gray-Scott reaction-diffusion — maze pattern formation
(reference recipe: examples/grids/Reaction_Diffusion.ipynb)."""
import _path  # noqa: F401 — sys.path bootstrap for script execution
import numpy as np
from phiflow_tpu.flow import *

N = 128
bounds = Box(x=float(N), y=float(N))  # dx=1: classic Gray-Scott scaling
DU, DV, F, KILL = 0.16, 0.08, 0.029, 0.057  # maze regime (dx=1, dt=1)

rng = np.random.RandomState(0)
u_np = np.ones((N, N), np.float32)
v_np = np.zeros((N, N), np.float32)
c = N // 2
u_np[c - 10:c + 10, c - 10:c + 10] = 0.50   # seeded square + noise breaks symmetry
v_np[c - 10:c + 10, c - 10:c + 10] = 0.25
u_np += 0.02 * rng.randn(N, N).astype(np.float32)
v_np = np.clip(v_np + 0.02 * rng.rand(N, N).astype(np.float32), 0, 1)
u = CenteredGrid(wrap(u_np, spatial('x,y')), PERIODIC, x=N, y=N, bounds=bounds)
v = CenteredGrid(wrap(v_np, spatial('x,y')), PERIODIC, x=N, y=N, bounds=bounds)


@jit_compile
def step(u, v, dt=1.0):
    uvv = u * v * v
    u = diffuse.explicit(u, DU, dt) + dt * (-uvv + F * (1 - u))
    v = diffuse.explicit(v, DV, dt) + dt * (uvv - (F + KILL) * v)
    return u, v


for i in range(1500):
    u, v = step(u, v)
v_max = float(math.max(v.values))
active = float(math.mean(math.to_float(v.values > 0.1)))
print(f"pattern: max v {v_max:.3f}, active fraction {active:.3f}")
assert v_max > 0.2 and active > 0.05, "maze pattern should spread from the seed"
