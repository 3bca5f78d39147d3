"""Higher-order scheme accuracy tests (reference strategy:
tests/commit/physics/test_higher_order.py — verify schemes against analytic
solutions)."""
import numpy as np
import pytest

import phiflow_tpu.math as math
from phiflow_tpu.math import extrapolation, Solve
from phiflow_tpu.geom import Box
from phiflow_tpu.field import CenteredGrid, StaggeredGrid, Noise, spatial_gradient, laplace, divergence
from phiflow_tpu.physics import fluid, advect


def _sine_grid(n=32, k=2):
    bounds = Box(x=2 * np.pi, y=2 * np.pi)
    return CenteredGrid(lambda pos: math.sin(k * pos.vector['x']), extrapolation.PERIODIC,
                        x=n, y=n, bounds=bounds), k


@pytest.mark.parametrize('order', [2, 4, 6])
def test_gradient_orders_sine(order):
    g, k = _sine_grid()
    grad = spatial_gradient(g, at='center', order=order)
    expected = CenteredGrid(lambda pos: k * math.cos(k * pos.vector['x']), extrapolation.PERIODIC,
                            x=32, y=32, bounds=Box(x=2 * np.pi, y=2 * np.pi))
    err = float(math.max(abs(grad.values[{'vector': 'x'}] - expected.values)))
    tol = {2: 0.12, 4: 0.01, 6: 1e-3}[order]
    assert err < tol, f"order {order}: err {err}"


@pytest.mark.parametrize('order', [2, 4, 6])
def test_laplace_orders_sine(order):
    g, k = _sine_grid()
    lap = laplace(g, order=order)
    expected_vals = -k ** 2 * g.values
    err = float(math.max(abs(lap.values - expected_vals)))
    tol = {2: 0.5, 4: 0.04, 6: 4e-3}[order]
    assert err < tol, f"order {order}: err {err}"


def test_order_convergence():
    """Higher order → smaller error at fixed resolution."""
    errors = {}
    for order in (2, 4, 6):
        g, k = _sine_grid(n=24, k=3)
        lap = laplace(g, order=order)
        errors[order] = float(math.max(abs(lap.values + k ** 2 * g.values)))
    assert errors[4] < errors[2]
    assert errors[6] < errors[4]


def test_incompressible_rk4_runs():
    """Kolmogorov-style RK4 with pressure in the loop (reference: fluid.py:291)."""
    bounds = Box(x=2 * np.pi, y=2 * np.pi)
    v = StaggeredGrid(Noise(vector='x,y'), extrapolation.PERIODIC, x=16, y=16, bounds=bounds) * 0.1
    p = CenteredGrid(0., extrapolation.PERIODIC, x=16, y=16, bounds=bounds)

    def pde(v_):
        return advect.differential(v_, v_, order=2) * 1.0

    v1, p1 = fluid.incompressible_rk4(pde, v, p, dt=0.01, pressure_order=2,
                                      pressure_solve=Solve('CG', 1e-4, 1e-4, suppress=(math.ConvergenceException,)))
    assert float(math.max(abs(divergence(v1).values))) < 1e-3
