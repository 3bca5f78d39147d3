"""Topology optimization through the differentiable solver
(reference demo family: demos/Top_Opt/ — 3D topology optimization driver).

Heat-conduction variant ("volume-to-point"): distribute a limited budget of
high-conductivity material (SIMP interpolation kappa = k_min + rho^3 k_max) so a
uniformly heated plate with one cold boundary reaches the lowest mean
temperature. The steady state comes from a matrix-free CG solve of
div(kappa grad T) = -f, and gradients flow THROUGH the solve via implicit
differentiation (jax.lax.custom_linear_solve inside math.solve_linear).

Run: python examples/top_opt.py
"""
import _path  # noqa: F401 — sys.path bootstrap for script execution
import numpy as np
import jax
import jax.numpy as jnp
import optax

from phiflow_tpu.math import (
    Solve, Tensor, extrapolation, spatial, jit_compile_linear, solve_linear,
)
from phiflow_tpu.field import CenteredGrid, spatial_gradient, divergence, resample

N = 48
K_MIN, K_MAX = 0.01, 1.0
VOL_FRAC = 0.35
SOURCE = 1.0

# temperature: cold (Dirichlet 0) on the lower-x wall, insulated elsewhere
T_BOUNDARY = extrapolation.combine_sides(
    x=(extrapolation.ZERO, extrapolation.ZERO_GRADIENT),
    y=extrapolation.ZERO_GRADIENT)
_template = CenteredGrid(0., T_BOUNDARY, x=N, y=N)


@jit_compile_linear(auxiliary_args='kappa_face')
def heat_operator(T, kappa_face):
    """div(kappa grad T) — linear in T, kappa enters as auxiliary data.
    The gradient gets a face-keeping output boundary (ZERO_GRADIENT) so flux
    through the Dirichlet (cold) wall is part of the operator — same pattern as
    fluid.masked_laplace; T's own boundary still provides the ghost values."""
    grad = spatial_gradient(T, extrapolation.ZERO_GRADIENT, at='face')
    return divergence(grad * kappa_face)


def solve_temperature(rho_values: jnp.ndarray):
    rho = _template.with_values(Tensor(rho_values, spatial(x=N, y=N)))
    kappa = K_MIN + rho ** 3 * (K_MAX - K_MIN)  # SIMP penalization
    grad_template = spatial_gradient(_template, extrapolation.ZERO_GRADIENT, at='face')  # face layout of the T-gradient
    kf = resample(kappa, to=grad_template, keep_boundary=False)  # face conductivities
    source = _template.with_values(Tensor(jnp.full((N, N), -SOURCE, jnp.float32), spatial(x=N, y=N)))
    T = solve_linear(heat_operator, source, Solve('CG', 1e-4, 1e-4, max_iterations=500), kf)
    return T


def loss_fn(logits: jnp.ndarray):
    rho = jax.nn.sigmoid(logits)
    T = solve_temperature(rho)
    compliance = jnp.mean(T.values.native(('x', 'y')))
    # one-sided quadratic: only penalize exceeding the material budget
    excess = jnp.maximum(jnp.mean(rho) - VOL_FRAC, 0.0)
    return compliance + 5e4 * excess ** 2, compliance


def main(iterations=60):
    logits = jnp.zeros((N, N), jnp.float32) - 0.5
    opt = optax.adam(0.2)
    opt_state = opt.init(logits)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    history = []
    for it in range(iterations):
        (loss, compliance), g = grad_fn(logits)
        updates, opt_state = opt.update(g, opt_state)
        logits = optax.apply_updates(logits, updates)
        history.append(float(compliance))
        if it % 10 == 0:
            print(f"iter {it:3d}  compliance {float(compliance):.4f}  "
                  f"volume {float(jnp.mean(jax.nn.sigmoid(logits))):.3f}")
    assert history[-1] < history[0] * 0.9, "optimization must reduce thermal compliance"
    print(f"done: compliance {history[0]:.4f} -> {history[-1]:.4f}")
    rho = np.asarray(jax.nn.sigmoid(logits))
    # ASCII render of the optimized material layout (tree-like fingers expected)
    for row in rho[::4].T[::-1][::2]:
        print(''.join('#' if v > 0.5 else ('+' if v > 0.25 else '.') for v in row[::1]))
    return history


if __name__ == '__main__':
    main()
