"""FVM heat conduction on an unstructured mesh (reference recipe:
examples/mesh/FVM_Heat.ipynb): implicit (backward-Euler) diffusion between a hot
left wall and a cold right wall; the steady state is a linear temperature profile."""
import _path  # noqa: F401 — sys.path bootstrap for script execution
from phiflow_tpu.flow import *
from phiflow_tpu.geom._mesh import build_mesh

m = build_mesh(Box(x=2, y=1), x=32, y=16)
T = Field(m, 0., {'x-': 1., 'x+': 0., 'y-': ZERO_GRADIENT, 'y+': ZERO_GRADIENT})


@jit_compile_linear
def implicit_heat(t, dt, diffusivity=0.5):
    """Backward-Euler heat operator: t_next − dt·κ·Δt_next = t_prev."""
    return t.with_values(t.values - dt * diffusivity * laplace(t).values)


if __name__ == '__main__':
    dt = 0.2
    for i in range(60):
        T = math.solve_linear(implicit_heat, T, Solve('CG', 1e-6, 1e-6, x0=T, suppress=(ConvergenceException,)), dt)
    # steady conduction: T(x) = 1 − x/2, exact for the linear profile
    x = m.center.vector['x']
    err = float(math.max(abs(T.values - (1 - x / 2))))
    print(f"max |T − steady|: {err:.4f}")
    assert err < 0.05, "did not reach the linear conduction profile"
