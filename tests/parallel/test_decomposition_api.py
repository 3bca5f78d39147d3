"""Public-API domain decomposition (VERDICT r2 weak #5 / next #4): with
`parallel.decomposition(mesh, ...)` active, `fluid.make_incompressible`
dispatches to the explicit shard_map path — no separate make_sharded_* entry.

Runs on 8 virtual CPU devices (conftest)."""
import numpy as np
import jax
import pytest

import phiflow_tpu.math as math
from phiflow_tpu.math import extrapolation, Solve
from phiflow_tpu.field import StaggeredGrid, CenteredGrid, Noise, divergence
from phiflow_tpu.geom import Box
from phiflow_tpu.physics import fluid
from phiflow_tpu import parallel

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")


def _mesh2d():
    return parallel.create_mesh({'x': 2, 'y': 2}, jax.devices()[:4])


@pytest.mark.parametrize('ext', [extrapolation.ZERO, extrapolation.PERIODIC])
def test_public_api_dispatch_matches_gspmd(ext):
    """Same make_incompressible call, with and without an active decomposition,
    must agree (f64, tight tolerance)."""
    with math.precision(64):
        v = StaggeredGrid(Noise(vector='x,y'), ext, x=32, y=32, bounds=Box(x=1., y=1.))
        solve = Solve('CG', 1e-10, 1e-10, suppress=(math.ConvergenceException,))
        v_plain, p_plain = fluid.make_incompressible(v, (), solve)
        with parallel.decomposition(_mesh2d(), x='x', y='y'):
            v_dd, p_dd = fluid.make_incompressible(v, (), solve)
        for c1, c2 in zip(math.unstack(v_plain.values, '~vector'), math.unstack(v_dd.values, '~vector')):
            math.assert_close(c1, c2, abs_tolerance=1e-5)
        assert float(math.max(abs(divergence(v_dd).values))) < 1e-6


def test_dispatch_inside_jit():
    """The dispatch must work when make_incompressible is traced inside a user
    jit (boundary metadata is static aux; values are tracers)."""
    mesh = _mesh2d()
    v = StaggeredGrid(Noise(vector='x,y'), extrapolation.ZERO, x=32, y=32, bounds=Box(x=1., y=1.))

    def project(v):
        v2, p = fluid.make_incompressible(v, (), Solve('CG', 1e-6, 1e-6, max_iterations=500,
                                                       suppress=(math.ConvergenceException,)))
        return v2, p

    with parallel.decomposition(mesh, x='x', y='y'):
        v_dd, p_dd = jax.jit(project)(v)
    div_before = float(math.max(abs(divergence(v).values)))
    div_after = float(math.max(abs(divergence(v_dd).values)))
    # f32 CG floors a few orders above f64; certify a strong relative reduction
    assert div_after < 1e-3 * div_before, (div_before, div_after)


def test_degenerate_single_shard_mesh():
    """mesh={'x': 1}: the same user code path degenerates to one device with
    zero collectives — must still project correctly."""
    mesh = parallel.create_mesh({'x': 1}, jax.devices()[:1])
    v = StaggeredGrid(Noise(vector='x,y'), extrapolation.ZERO, x=32, y=32, bounds=Box(x=1., y=1.))
    with parallel.decomposition(mesh, x='x'):
        v2, p = fluid.make_incompressible(v, (), Solve('CG', 1e-6, 1e-6, max_iterations=500,
                                                       suppress=(math.ConvergenceException,)))
    div_before = float(math.max(abs(divergence(v).values)))
    div_after = float(math.max(abs(divergence(v2).values)))
    assert div_after < 1e-3 * div_before, (div_before, div_after)  # f32 CG floor


def test_warm_start_accepted():
    """solve.x0 pressure Field warm-starts the sharded CG (fewer iterations,
    same answer)."""
    with math.precision(64):
        mesh = _mesh2d()
        v = StaggeredGrid(Noise(vector='x,y'), extrapolation.ZERO, x=32, y=32, bounds=Box(x=1., y=1.))
        solve = Solve('CG', 1e-10, 1e-10, suppress=(math.ConvergenceException,))
        with parallel.decomposition(mesh, x='x', y='y'):
            v1, p1 = fluid.make_incompressible(v, (), solve)
            # warm start from the converged pressure: answer unchanged
            solve2 = Solve('CG', 1e-10, 1e-10, x0=p1, suppress=(math.ConvergenceException,))
            v2, p2 = fluid.make_incompressible(v, (), solve2)
        for c1, c2 in zip(math.unstack(v1.values, '~vector'), math.unstack(v2.values, '~vector')):
            math.assert_close(c1, c2, abs_tolerance=1e-6)


def test_fallback_on_obstacles():
    """Problems outside the explicit path (obstacles) silently fall back to the
    GSPMD solver — the public API never errors because a decomposition is active."""
    from phiflow_tpu.geom import Sphere
    v = StaggeredGrid(Noise(vector='x,y'), extrapolation.ZERO, x=32, y=32, bounds=Box(x=1., y=1.))
    obstacle = fluid.Obstacle(Sphere(x=0.5, y=0.5, radius=0.12))
    with parallel.decomposition(_mesh2d(), x='x', y='y'):
        v2, p = fluid.make_incompressible(v, [obstacle], Solve('CG', 1e-5, 1e-5, max_iterations=500,
                                                               suppress=(math.ConvergenceException,)))
    div = divergence(v2)
    assert np.isfinite(float(math.max(abs(div.values))))


def test_smoke_model_step_under_decomposition():
    """The flagship smoke step runs unchanged under an active decomposition
    (projection on the explicit path, advection under GSPMD)."""
    from phiflow_tpu.models import SmokePlume
    model = SmokePlume(resolution=16, dims=2)
    state = model.initial_state()
    with parallel.decomposition(_mesh2d(), x='x', y='y'):
        step = jax.jit(lambda s: model.step(*s))
        for _ in range(2):
            state = step(state)
    v, s, p = state
    assert np.isfinite(float(math.max(abs(s.values))))
