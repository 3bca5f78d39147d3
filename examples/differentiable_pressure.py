"""Differentiable pressure solve — optimize a velocity field through
`make_incompressible` (reference recipe: examples/optim/Differentiable_Pressure.ipynb;
gradient test: tests/commit/physics/test_fluid.py:56-73).

Gradients flow through the CG solve via implicit differentiation
(`jax.lax.custom_linear_solve`): the backward pass solves the transposed
system instead of unrolling CG iterations.
"""
import _path  # noqa: F401 — sys.path bootstrap for script execution
import numpy as np
from phiflow_tpu.flow import *

N = 32
bounds = Box(x=1, y=1)
target = StaggeredGrid(
    lambda pos: math.stack({
        'x': math.sin(2 * np.pi * pos.vector['y']),
        'y': math.cos(2 * np.pi * pos.vector['x']) * 0.5,
    }, channel('vector')), PERIODIC, x=N, y=N, bounds=bounds)
target, _ = fluid.make_incompressible(target, (), Solve('CG', 1e-8, 0., suppress=(ConvergenceException,)))


def loss(v):
    div_free, _ = fluid.make_incompressible(v, (), Solve('CG', 1e-8, 0., suppress=(ConvergenceException,)))
    return math.mean(math.vec_squared((div_free - target).uniform_values()))


grad_fn = jit_compile(gradient(loss, wrt='v', get_output=True))

v = StaggeredGrid(Noise(), PERIODIC, x=N, y=N, bounds=bounds) * 0.3
lr = 800.0  # mean-loss gradients scale as 1/#entries; GD stable for lr < #entries
losses = []
for i in range(40):
    l, dv = grad_fn(v=v)
    losses.append(float(l))
    v = v - lr * dv
print(f"loss: {losses[0]:.5f} -> {losses[-1]:.6f} over {len(losses)} gradient steps")
assert losses[-1] < 0.01 * losses[0], "optimization through the solve should reduce loss 100x"
div = float(math.max(abs(divergence(v).values)))
print(f"optimized field max|div| before projection: {div:.3f} (projection handles it)")
