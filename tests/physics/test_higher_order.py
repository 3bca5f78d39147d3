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


def test_incompressible_rk4_taylor_green_accuracy():
    """Viscous Taylor-Green vortex: u = sin(x)cos(y)e^{-2 nu t}. With order-6
    spatial schemes the time error dominates; halving dt must shrink the error
    by ≈2^4 (guard against RK stage-coefficient regressions, e.g. k3 vs k2)."""
    import numpy as np
    from phiflow_tpu.math import Solve, extrapolation, ConvergenceException, spatial, channel, wrap, stack
    from phiflow_tpu.field import CenteredGrid
    from phiflow_tpu.physics import advect, diffuse, fluid
    from phiflow_tpu.geom import Box

    n = 8         # spectral schemes are exact for the k=1 TGV mode
    nu = 1.0      # strong decay so the RK4 time error rises above the f32 floor
    L = 2 * np.pi
    bounds = Box(x=L, y=L)

    def make_v0():
        return CenteredGrid(
            lambda pos: stack({'x': _sin(pos.vector['x']) * _cos(pos.vector['y']),
                               'y': -_cos(pos.vector['x']) * _sin(pos.vector['y'])},
                              channel(vector='x,y')),
            extrapolation.PERIODIC, x=n, y=n, bounds=bounds)

    def _sin(t):
        import phiflow_tpu.math as m
        return m.sin(t)

    def _cos(t):
        import phiflow_tpu.math as m
        return m.cos(t)

    def pde(v):
        return advect.differential(v, v, order=6) + diffuse.differential(v, nu, order=6)

    solve = Solve('CG', 1e-6, 1e-6, suppress=(ConvergenceException,))

    def one_step_error(dt):
        """Local (single-step) error vs the analytic decay — measures the TIME
        order without the dt-independent spatial eigenvalue bias of the order-6
        compact scheme (λ̂ = −1.99985 ≠ −2 at kh = π/4) polluting the ratio."""
        v = make_v0()
        p = CenteredGrid(0., extrapolation.PERIODIC, x=n, y=n, bounds=bounds)
        v1, p1 = fluid.incompressible_rk4(pde, v, p, dt, pressure_order=6, pressure_solve=solve)
        analytic = make_v0() * float(np.exp(-2 * nu * dt))
        err = v1.values - analytic.values
        return float(np.abs(np.asarray(err.native(('x', 'y', 'vector')))).max())

    e_coarse = one_step_error(0.3)
    e_fine = one_step_error(0.15)
    # 4th-order local error shrinks 32×; spatial bias floors it around 10⁻⁵.
    # Ratio > 10 rules out 1st/2nd-order stage regressions (e.g. k2 reused for k4,
    # or wrong stage-pressure scaling), which give ratios ≤ 8.
    assert e_coarse / e_fine > 10, (e_coarse, e_fine)


# ---------------------------------------------------------------------------
# Non-periodic higher-order accuracy (reference strategy:
# tests/commit/physics/test_higher_order.py — pipe/Poiseuille validation in
# float64 with BC-aware one-sided stencils)
# ---------------------------------------------------------------------------

def _dirichlet_sine_laplace_error(n, order):
    bounds = Box(x=1., y=1.)
    g = CenteredGrid(lambda pos: math.sin(np.pi * pos.vector['x']) * math.sin(np.pi * pos.vector['y']),
                     extrapolation.ZERO, x=n, y=n, bounds=bounds)
    lap = laplace(g, order=order)
    expected = -2 * np.pi ** 2 * g.values
    return float(math.max(abs(lap.values - expected)))


@pytest.mark.parametrize('order', [4, 6])
def test_laplace_nonperiodic_convergence_f64(order):
    """One-sided boundary stencils must keep the nominal order with Dirichlet
    walls (engine: field/_stencil1d.py; reference analog validates order-6
    against Poiseuille at 1e-10 in float64)."""
    with math.precision(64):
        e_coarse = _dirichlet_sine_laplace_error(24, order)
        e_fine = _dirichlet_sine_laplace_error(48, order)
    rate = np.log2(e_coarse / e_fine)
    assert rate > order - 0.7, (e_coarse, e_fine, rate)


def test_laplace_zero_gradient_f64():
    """Neumann walls: u = cos(πx) has u'(0)=u'(1)=0; order-6 compact with
    one-sided rows should hit ~1e-9 at n=48 in float64."""
    with math.precision(64):
        bounds = Box(x=1., y=1.)
        n = 48
        g = CenteredGrid(lambda pos: math.cos(np.pi * pos.vector['x']),
                         extrapolation.ZERO_GRADIENT, x=n, y=n, bounds=bounds)
        lap = laplace(g, order=6)
        err = float(math.max(abs(lap.values + np.pi ** 2 * g.values)))
    assert err < 1e-8, err


def test_poiseuille_steady_state_f64():
    """Channel flow u_x(y): ν·u'' + G·sin(πy) = 0 with no-slip walls has the
    steady profile u = G/(ν·π²)·sin(πy). March implicit diffusion + forcing to
    steady state with order-6 stencils and compare (float64, engine path)."""
    from phiflow_tpu.physics import diffuse
    with math.precision(64):
        n = 48
        nu, G = 0.1, 1.0
        bounds = Box(y=1.)
        u = CenteredGrid(0., extrapolation.ZERO, y=n, bounds=bounds)
        force = CenteredGrid(lambda pos: G * math.sin(np.pi * pos.vector['y']),
                             extrapolation.ZERO, y=n, bounds=bounds)
        dt = 2.0
        for _ in range(25):  # transient decays as e^{−ν·π²·t}: fully converged
            u = u + dt * force
            # compact order-6 operator is nonsymmetric (one-sided boundary rows)
            # → biCG-stab(2), same method the reference prescribes for this
            # config (reference: tests/commit/physics/test_higher_order.py:31)
            u = diffuse.implicit(u, nu, dt, order=6,
                                 solve=Solve('biCG-stab(2)', 1e-10, 1e-10, max_iterations=500))
        analytic = G / (nu * np.pi ** 2) * math.sin(
            np.pi * (math.wrap(np.arange(n) + 0.5, u.values.shape['y']) / n))
        err = float(math.max(abs(u.values - analytic)))
        assert err < 2e-4 * G / (nu * np.pi ** 2), err


def test_face_gradient_order4_dirichlet():
    """Order-4 center→face gradient with Dirichlet boundaries (staggered
    one-sided rows)."""
    with math.precision(64):
        n = 64
        bounds = Box(x=1., y=1.)
        g = CenteredGrid(lambda pos: math.sin(np.pi * pos.vector['x']),
                         extrapolation.ZERO, x=n, y=n, bounds=bounds)
        grad = spatial_gradient(g, extrapolation.ZERO, at='face', order=4)
        comp = grad.vector['x']
        xf = np.arange(1, n) / n  # interior faces (ZERO boundary drops outer faces)
        expected = np.pi * np.cos(np.pi * xf)
        vals = np.asarray(comp.values.native(('x', 'y')))[:, 0]
        err = np.max(np.abs(vals - expected))
    assert err < 1e-5, err


# ---------------------------------------------------------------------------
# High-order center<->face interpolation (the reference's _dyadic_interpolate)
# ---------------------------------------------------------------------------

def _face_interp_err(n, order, periodic):
    """Max error of center->face interpolation of sin(2πx) on [0,1]."""
    with math.precision(64):
        if periodic:
            ext = extrapolation.PERIODIC
            fn = lambda pos: math.sin(2 * np.pi * pos.vector['x'])
            exact = np.sin(2 * np.pi * np.arange(n) / n)
        else:
            ext = extrapolation.ZERO  # Dirichlet 0: outer faces are BC-determined
            fn = lambda pos: math.sin(np.pi * pos.vector['x'])
            exact = np.sin(np.pi * np.arange(1, n) / n)  # interior faces only
        f = CenteredGrid(fn, ext, bounds=Box(x=1, y=1), x=n, y=4)
        faces = f.at_faces(boundary=ext, order=order)
        arr = np.asarray(faces.values[{'~vector': 'x'}].native('x,y'))[:, 0]
        return np.abs(arr - exact).max()


@pytest.mark.parametrize('periodic', [True, False])
def test_face_interp_convergence_rates(periodic):
    for order, min_rate in ((4, 3.5), (6, 5.0)):
        e1 = _face_interp_err(16, order, periodic)
        e2 = _face_interp_err(32, order, periodic)
        rate = np.log2(e1 / e2)
        assert rate > min_rate, f"order {order}: observed rate {rate:.2f} (e16={e1:.2e}, e32={e2:.2e})"


def test_face_interp_quadratic_exact_dirichlet():
    """Order-6 BC-constrained interpolation reproduces a quadratic exactly at
    every stored (interior) face, including the one-sided boundary rows."""
    with math.precision(64):
        n = 16
        f = CenteredGrid(lambda pos: pos.vector['x'] * (1 - pos.vector['x']),
                         extrapolation.ZERO, bounds=Box(x=1, y=1), x=n, y=4)
        faces = f.at_faces(boundary=extrapolation.ZERO, order=6)
        arr = np.asarray(faces.values[{'~vector': 'x'}].native('x,y'))[:, 0]
        x = np.arange(1, n) / n
        np.testing.assert_allclose(arr, x * (1 - x), atol=1e-12)


def test_face_to_center_interp_order6():
    """Staggered -> centered at order 6: far more accurate than 2-point average."""
    with math.precision(64):
        n = 24
        ext = extrapolation.PERIODIC
        v = StaggeredGrid(lambda pos: math.sin(2 * np.pi * pos.vector['x']), ext,
                          bounds=Box(x=1, y=1), x=n, y=8)
        exact = np.sin(2 * np.pi * (np.arange(n) + 0.5) / n)
        c2 = v.at_centers(order=2).values[{'vector': 'x'}]
        c6 = v.at_centers(order=6).values[{'vector': 'x'}]
        e2 = np.abs(np.asarray(c2.native('x,y'))[:, 0] - exact).max()
        e6 = np.abs(np.asarray(c6.native('x,y'))[:, 0] - exact).max()
        assert e6 < e2 / 100, f"order-6 {e6:.2e} vs order-2 {e2:.2e}"
