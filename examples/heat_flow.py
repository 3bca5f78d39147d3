"""Heat diffusion around a cold obstacle with mixed boundaries
(reference recipe: examples/grids/Heat_Flow.ipynb, examples/mesh/FVM_Heat.ipynb)."""
import _path  # noqa: F401 — sys.path bootstrap for script execution
from phiflow_tpu.flow import *

# hot left wall (T=1), cold right wall (T=0), insulated top/bottom
boundary = extrapolation.combine_sides(x=(1.0, 0.0), y=ZERO_GRADIENT)
temperature = CenteredGrid(0.0, boundary, x=128, y=128, bounds=Box(x=1, y=1))
obstacle = Sphere(x=0.5, y=0.5, radius=0.15)
cold_mask = resample(obstacle, to=temperature, soft=True)


@jit_compile
def step(t, dt=2e-4):
    t = diffuse.implicit(t, 1.0, dt, solve=Solve('CG', 1e-5, 0.))
    return t * (1 - cold_mask)  # obstacle held at T=0


for i in range(100):
    temperature = step(temperature)
mean_t = float(math.mean(temperature.values))
flux = spatial_gradient(temperature, stack_dim=channel('g')).values[{'g': 0}]
print(f"mean temperature: {mean_t:.4f} (hot wall drives ~0.2-0.4)")
print(f"max |dT/dx|: {float(math.max(abs(flux))):.2f}")
assert 0.05 < mean_t < 0.6
