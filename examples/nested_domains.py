"""Nested simulation domains — a fine grid embedded in a coarse one, coupled
through FieldEmbedding boundaries
(reference recipe: examples/grids/Multi_Grid_Fluid.ipynb; phi/field/_embed.py).

The coarse domain advects a smooth scalar; the fine domain covers the center
quarter at 4x resolution and pads its ghost cells by SAMPLING the coarse
solution, so structures advect seamlessly across the refinement boundary.
"""
import _path  # noqa: F401 — sys.path bootstrap for script execution
import numpy as np
from phiflow_tpu.flow import *
from phiflow_tpu.field import FieldEmbedding

N = 64
coarse_bounds = Box(x=1, y=1)
fine_bounds = Box['x,y', 0.25:0.75, 0.25:0.75]
velocity = StaggeredGrid(lambda pos: math.stack(
    {'x': -math.sin(np.pi * pos.vector['y']) * 0.2 + 0.25,
     'y': math.sin(np.pi * pos.vector['x']) * 0.2}, channel('vector')),
    PERIODIC, x=N, y=N, bounds=coarse_bounds)
blob = lambda pos: math.exp(-150 * ((pos.vector['x'] - 0.3) ** 2 + (pos.vector['y'] - 0.5) ** 2))
coarse = CenteredGrid(blob, PERIODIC, x=N, y=N, bounds=coarse_bounds)
fine = CenteredGrid(blob, FieldEmbedding(coarse), x=2 * N, y=2 * N, bounds=fine_bounds)


@jit_compile
def step(coarse, fine, dt=0.004):
    coarse = advect.semi_lagrangian(coarse, velocity, dt)
    fine = fine.with_boundary(FieldEmbedding(coarse))  # refresh embedded BC
    fine = advect.semi_lagrangian(fine, velocity, dt)
    return coarse, fine


for i in range(100):
    coarse, fine = step(coarse, fine)
# compare in the interior of the fine domain
fine_on_coarse = resample(fine, to=CenteredGrid(0., PERIODIC, x=N, y=N, bounds=coarse_bounds),
                          keep_boundary=False)
inner = {'x': slice(N // 4 + 2, 3 * N // 4 - 2), 'y': slice(N // 4 + 2, 3 * N // 4 - 2)}
diff = abs(fine_on_coarse.values[inner] - coarse.values[inner])
err = float(math.max(diff))
mx = float(math.max(fine.values))
print(f"fine-domain peak after advection: {mx:.3f} (blob advected through the nest)")
print(f"max |fine - coarse| in the overlap: {err:.4f}")
assert mx > 0.3, "the blob should have advected into/through the fine domain"
assert err < 0.15, "nested solution must track the coarse one across the embedding"
