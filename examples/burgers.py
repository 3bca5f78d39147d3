"""Burgers' equation (reference recipe: examples/grids/Burgers.ipynb)."""
import _path  # noqa: F401 — sys.path bootstrap for script execution
from phiflow_tpu.flow import *

velocity = CenteredGrid(Noise(vector='x,y'), PERIODIC, x=128, y=128, bounds=Box(x=128, y=128)) * 2


@jit_compile
def step(v, dt=0.5):
    v = advect.semi_lagrangian(v, v, dt)
    return diffuse.explicit(v, 0.1, dt)


for i in range(100):
    velocity = step(velocity)
print(f"kinetic energy: {float(math.mean(math.vec_squared(velocity.values))):.4f}")
