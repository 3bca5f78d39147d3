"""Taylor-Green vortex — analytic Navier-Stokes validation
(reference recipe: examples/grids/Taylor_Green.ipynb).

u(x,y,t) =  sin(x) cos(y) e^{-2νt},  v = −cos(x) sin(y) e^{-2νt}
"""
import _path  # noqa: F401 — sys.path bootstrap for script execution
import numpy as np
from phiflow_tpu.flow import *

N, NU, DT = 64, 0.1, 0.02
bounds = Box(x=2 * np.pi, y=2 * np.pi)


def taylor_green(t):
    decay = float(np.exp(-2 * NU * t))
    return StaggeredGrid(
        lambda pos: math.stack({
            'x': math.sin(pos.vector['x']) * math.cos(pos.vector['y']) * decay,
            'y': -math.cos(pos.vector['x']) * math.sin(pos.vector['y']) * decay,
        }, channel('vector')), PERIODIC, x=N, y=N, bounds=bounds)


velocity = taylor_green(0.)


@jit_compile
def step(v):
    v = advect.semi_lagrangian(v, v, DT)
    v = diffuse.explicit(v, NU, DT)
    v, _ = fluid.make_incompressible(v, (), Solve('CG', 1e-5, 0., suppress=(ConvergenceException,)))
    return v


T_STEPS = 50
for i in range(T_STEPS):
    velocity = step(velocity)
exact = taylor_green(T_STEPS * DT)
err = float(math.max(abs(velocity.values - exact.values)))
ke = float(math.mean(math.vec_squared(velocity.at_centers().values)))
ke_exact = float(math.mean(math.vec_squared(exact.at_centers().values)))
print(f"t={T_STEPS * DT:.2f}: max|u - u_exact| = {err:.4f}, "
      f"KE {ke:.4f} (exact {ke_exact:.4f})")
assert err < 0.05, "solver should track the analytic Taylor-Green decay"
