"""FVM backward-facing step (reference recipe: examples/mesh/FVM_BackStep.ipynb):
channel flow expands over a step; a recirculation zone forms behind it.
Mesh built with build_mesh using a box obstacle as the step."""
import _path  # noqa: F401 — sys.path bootstrap for script execution
from phiflow_tpu.flow import *
from phiflow_tpu.geom._mesh import build_mesh

step_geo = Box['x,y', 0:1.0, 0:0.5]  # the step occupies the lower-left corner
m = build_mesh(Box(x=4, y=1), x=64, y=16, obstacles=step_geo)
bc = {'x-': vec(x=1., y=0.), 'x+': ZERO_GRADIENT, 'y-': 0., 'y+': 0., 'boundary': 0.}
v = Field(m, vec(x=1., y=0.), bc)


@jit_compile_linear
def momentum_eq(u, u_prev, dt, viscosity=0.005):
    diffusion = viscosity * laplace(u).values
    advection = advect.differential(u, u_prev, order=1).values
    return u.with_values(u.values - dt * (advection + diffusion))


if __name__ == '__main__':
    import numpy as np
    dt = 0.05
    for i in range(30):
        v = math.solve_linear(momentum_eq, v, Solve('biCG-stab', 1e-5, 1e-5, x0=v,
                                                    suppress=(ConvergenceException,)), v, dt)
        v, p = fluid.make_incompressible(v, (), Solve('biCG-stab', 1e-5, 1e-5,
                                                      suppress=(ConvergenceException,)))
    ux = np.asarray(v.values.vector['x'].native())
    centers = np.asarray(m.center.native('cells,vector'))
    # recirculation: some negative u_x just downstream of the step, below its height
    zone = (centers[:, 0] > 1.0) & (centers[:, 0] < 2.0) & (centers[:, 1] < 0.5)
    print(f"mean u_x: {ux.mean():.3f}, min u_x behind step: {ux[zone].min():.3f}")
    assert np.isfinite(ux).all()
    assert ux[zone].min() < 0.02, "expected slow/reversed flow behind the step"
