"""FVM channel flow around an obstacle (reference recipe: examples/mesh/FVM_Cylinder_GMsh.ipynb,
built with build_mesh instead of an external .msh file)."""
import _path  # noqa: F401 — sys.path bootstrap for script execution
from phiflow_tpu.flow import *
from phiflow_tpu.geom._mesh import build_mesh

m = build_mesh(Box(x=4, y=1), x=48, y=12, obstacles=Sphere(x=1, y=0.5, radius=0.2))
bc = {'x-': vec(x=1., y=0.), 'x+': ZERO_GRADIENT, 'y-': 0., 'y+': 0., 'boundary': 0.}
v = Field(m, vec(x=1., y=0.), bc)


@jit_compile_linear
def momentum_eq(u, u_prev, dt, viscosity=0.01):
    """Backward-Euler operator: u_next − dt·(advection + diffusion) = u_prev,
    with advection = −u·∇u and diffusion = +ν·Δu (reference composition:
    examples/mesh/FVM_Cylinder_GMsh.ipynb passes dt=−dt into u + dt·(...))."""
    diffusion = viscosity * laplace(u).values
    advection = advect.differential(u, u_prev, order=1).values
    return u.with_values(u.values - dt * (advection + diffusion))


dt = 0.05
for i in range(20):
    v = math.solve_linear(momentum_eq, v, Solve('biCG-stab', 1e-5, 1e-5, x0=v, suppress=(ConvergenceException,)), v, dt)
    v, p = fluid.make_incompressible(v, (), Solve('biCG-stab', 1e-5, 1e-5, suppress=(ConvergenceException,)))
print(f"mean u_x: {float(math.mean(v.values[{'vector': 'x'}])):.3f}")
