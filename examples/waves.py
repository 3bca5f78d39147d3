"""2D wave equation — leapfrog on (u, u_t) with closed reflecting walls
(reference recipe: examples/grids/Waves.ipynb)."""
import _path  # noqa: F401 — sys.path bootstrap for script execution
from phiflow_tpu.flow import *

bounds = Box(x=2, y=2)
u = CenteredGrid(lambda pos: math.exp(-40 * ((pos.vector['x'] - 1) ** 2
                                             + (pos.vector['y'] - 1) ** 2)),
                 ZERO_GRADIENT, x=128, y=128, bounds=bounds)
ut = CenteredGrid(0.0, ZERO_GRADIENT, x=128, y=128, bounds=bounds)
C2 = 0.5  # wave speed squared


@jit_compile
def step(u, ut, dt=5e-3):
    # leapfrog: kick-drift-kick keeps the discrete energy bounded
    ut = ut + 0.5 * dt * C2 * laplace(u)
    u = u + dt * ut
    ut = ut + 0.5 * dt * C2 * laplace(u)
    return u, ut


def energy(u, ut):
    g = spatial_gradient(u, stack_dim=channel('g')).values
    return float(math.mean(ut.values ** 2 + C2 * math.sum(g ** 2, 'g')))


e0 = energy(u, ut)
for i in range(400):
    u, ut = step(u, ut)
e1 = energy(u, ut)
print(f"wave energy: start {e0:.5f} end {e1:.5f} (drift {abs(e1 - e0) / e0:.1%})")
assert abs(e1 - e0) / e0 < 0.05, "leapfrog should conserve energy to a few %"
