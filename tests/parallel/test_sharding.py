"""Distributed-consistency tests (SURVEY.md §4: 'single-device vs sharded
multi-device consistency — the distributed test the reference lacks').

Runs on 8 virtual CPU devices (conftest sets xla_force_host_platform_device_count).
"""
import numpy as np
import jax
import pytest

import phiflow_tpu.math as math
from phiflow_tpu.math import extrapolation, Solve, batch, spatial
from phiflow_tpu.geom import Box, Sphere
from phiflow_tpu.field import CenteredGrid, StaggeredGrid, Noise, divergence, laplace, resample
from phiflow_tpu.physics import fluid, advect
from phiflow_tpu.parallel import create_mesh, shard_field, sharding_for, shard_tensor

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")


def _mesh2d():
    return create_mesh({'x': 2, 'y': 2}, jax.devices()[:4])


def test_sharded_laplace_matches_single():
    g = CenteredGrid(Noise(), extrapolation.PERIODIC, x=32, y=32)
    expected = laplace(g).values
    mesh = _mesh2d()
    gs = shard_field(g, mesh)
    with mesh:
        result = jax.jit(lambda f: laplace(f).values)(gs)
    math.assert_close(expected, result, abs_tolerance=1e-5)


def test_sharded_advection_matches_single():
    v = StaggeredGrid(Noise(vector='x,y'), extrapolation.PERIODIC, x=32, y=32)
    s = CenteredGrid(Noise(), extrapolation.PERIODIC, x=32, y=32)
    expected = advect.semi_lagrangian(s, v, 0.7).values
    mesh = _mesh2d()
    ss = shard_field(s, mesh)
    with mesh:
        result = jax.jit(lambda s_, v_: advect.semi_lagrangian(s_, v_, 0.7).values)(ss, v)
    math.assert_close(expected, result, abs_tolerance=1e-4)


def test_sharded_pressure_solve_matches_single():
    v = StaggeredGrid(Noise(vector='x,y'), extrapolation.ZERO, x=32, y=32)
    v_single, p_single = fluid.make_incompressible(v, (), Solve('CG', 1e-6, 1e-6,
                                                                suppress=(math.ConvergenceException,)))
    mesh = _mesh2d()
    vs = shard_field(v, mesh, {'y': 'y'})  # staggered x-sizes differ; shard y

    @jax.jit
    def project(v_):
        v2, p = fluid.make_incompressible(v_, (), Solve('CG', 1e-6, 1e-6,
                                                        suppress=(math.ConvergenceException,)))
        return v2, p

    with mesh:
        v_sharded, p_sharded = project(vs)
    math.assert_close(p_single.values, p_sharded.values, abs_tolerance=1e-3)
    assert float(math.max(abs(divergence(v_sharded).values))) < 1e-3


def test_batch_sharding():
    mesh = create_mesh({'batch': 4}, jax.devices()[:4])
    g = CenteredGrid(Noise(batch(b=8)), extrapolation.PERIODIC, x=16, y=16)
    gs = shard_field(g, mesh, {'b': 'batch'})
    expected = laplace(g).values
    with mesh:
        result = jax.jit(lambda f: laplace(f).values)(gs)
    math.assert_close(expected, result, abs_tolerance=1e-5)
    # result sharding spans devices
    leaves = jax.tree_util.tree_leaves(result)
    assert len(leaves[0].sharding.device_set) >= 1


def test_smoke_step_sharded():
    """Full smoke step under spatial sharding (GSPMD halo exchange + psum CG)."""
    res = 32
    bounds = Box(x=res, y=res)
    velocity = StaggeredGrid(0., 0., x=res, y=res, bounds=bounds)
    smoke = CenteredGrid(0., extrapolation.BOUNDARY, x=res, y=res, bounds=bounds)
    inflow = Sphere(x=res / 2, y=4., radius=3.)

    def step(v, s, p):
        s = advect.mac_cormack(s, v, 1.) + 0.2 * resample(inflow, to=s, soft=True)
        b = resample(s * (0., 0.1), to=v)
        v = advect.semi_lagrangian(v, v, 1.) + b
        v, p = fluid.make_incompressible(v, (), Solve('CG', 1e-3, 1e-3, x0=p,
                                                      suppress=(math.ConvergenceException,)))
        return v, s, p

    # single device
    v1, s1, p1 = step(velocity, smoke, None)
    v1, s1, p1 = step(v1, s1, p1)
    # sharded
    mesh = _mesh2d()
    smoke_sharded = shard_field(smoke, mesh)
    with mesh:
        v2, s2, p2 = jax.jit(step)(velocity, smoke_sharded, None)
        v2, s2, p2 = jax.jit(step)(v2, s2, p2)
    math.assert_close(s1.values, s2.values, abs_tolerance=1e-4)


def test_sharded_scene_io_roundtrip():
    """Chunked per-shard field IO (SURVEY.md §7 step 12 — the reference's
    Scene IO is host-gather only)."""
    import tempfile, os
    import numpy as np
    from phiflow_tpu.field._field_io import write_sharded, read_sharded
    g = CenteredGrid(Noise(), extrapolation.PERIODIC, x=16, y=16)
    mesh = _mesh2d()
    gs = shard_field(g, mesh)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, 'field.npz')
        write_sharded(gs, path)
        assert os.path.isfile(os.path.join(d, 'field.manifest.npz'))
        assert os.path.isfile(os.path.join(d, 'field.shard0.npz'))
        # host assembly
        back = read_sharded(path)
        np.testing.assert_allclose(np.asarray(back.values.native(('x', 'y'))),
                                   np.asarray(g.values.native(('x', 'y'))), rtol=1e-6)
        # direct-to-device placement with the original sharding
        back_sharded = read_sharded(path, sharding=gs.values.native().sharding)
        assert len(back_sharded.values.native().addressable_shards) == 4
        np.testing.assert_allclose(np.asarray(back_sharded.values.native(('x', 'y'))),
                                   np.asarray(g.values.native(('x', 'y'))), rtol=1e-6)
