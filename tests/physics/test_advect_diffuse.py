import numpy as np
import pytest

import phiflow_tpu.math as math
from phiflow_tpu.math import spatial, channel, extrapolation, wrap, Solve, instance
from phiflow_tpu.geom import Box
from phiflow_tpu.field import CenteredGrid, StaggeredGrid, Noise, PointCloud, resample
from phiflow_tpu.physics import advect, diffuse


def test_semi_lagrangian_translation():
    """Constant velocity translates the field by v·dt (periodic)."""
    bounds = Box(x=16, y=16)
    f = CenteredGrid(lambda pos: math.sin(2 * np.pi * pos.vector['x'] / 16), extrapolation.PERIODIC,
                     x=16, y=16, bounds=bounds)
    v = StaggeredGrid((1., 0.), extrapolation.PERIODIC, x=16, y=16, bounds=bounds)
    f1 = advect.semi_lagrangian(f, v, dt=1.)
    expected = CenteredGrid(lambda pos: math.sin(2 * np.pi * (pos.vector['x'] - 1) / 16),
                            extrapolation.PERIODIC, x=16, y=16, bounds=bounds)
    math.assert_close(f1.values, expected.values, abs_tolerance=1e-4)


def test_mac_cormack_preserves_extrema():
    f = CenteredGrid(Noise(), extrapolation.PERIODIC, x=16, y=16)
    v = StaggeredGrid(Noise(vector='x,y'), extrapolation.PERIODIC, x=16, y=16)
    f1 = advect.mac_cormack(f, v, dt=0.5)
    assert float(math.max(f1.values)) <= float(math.max(f.values)) + 1e-4
    assert float(math.min(f1.values)) >= float(math.min(f.values)) - 1e-4


def test_staggered_self_advection():
    v = StaggeredGrid(Noise(vector='x,y'), extrapolation.PERIODIC, x=16, y=16)
    v1 = advect.semi_lagrangian(v, v, dt=0.1)
    assert v1.is_staggered
    for d in 'xy':
        assert v1.vector[d].values.shape == v.vector[d].values.shape


def test_advect_points():
    pts = math.vec(x=wrap([2.], instance(points=1)), y=wrap([2.], instance(points=1)))
    cloud = PointCloud(pts, values=1.)
    v = StaggeredGrid((1., 1.), extrapolation.PERIODIC, x=8, y=8)
    moved = advect.points(cloud, v, dt=0.5)
    new_pos = moved.points
    assert np.allclose(new_pos.numpy(('points', 'vector')), [[2.5, 2.5]], atol=1e-5)


def test_diffuse_explicit_conserves():
    f = CenteredGrid(Noise(), extrapolation.PERIODIC, x=16, y=16)
    f1 = diffuse.explicit(f, 0.2, 1., substeps=2)
    math.assert_close(math.mean(f.values), math.mean(f1.values), abs_tolerance=1e-5)
    assert float(math.std(f1.values)) < float(math.std(f.values))


def test_diffuse_implicit():
    f = CenteredGrid(Noise(), extrapolation.PERIODIC, x=16, y=16)
    f1 = diffuse.implicit(f, 0.5, 1., Solve('CG', 1e-5, 1e-5))
    math.assert_close(math.mean(f.values), math.mean(f1.values), abs_tolerance=1e-4)
    assert float(math.std(f1.values)) < float(math.std(f.values))


def test_diffuse_fourier_matches_explicit_small_dt():
    f = CenteredGrid(Noise(), extrapolation.PERIODIC, x=32, y=32, bounds=Box(x=32, y=32))
    nu, dt = 0.1, 0.1
    explicit = diffuse.explicit(f, nu, dt, substeps=10)
    fourier = diffuse.fourier(f, nu, dt)
    math.assert_close(explicit.values, fourier.values, abs_tolerance=0.1, rel_tolerance=0.05)


def test_diffuse_staggered():
    v = StaggeredGrid(Noise(vector='x,y'), extrapolation.PERIODIC, x=16, y=16)
    v1 = diffuse.explicit(v, 0.1, 1.)
    assert v1.is_staggered


def test_semi_lagrangian_substeps_high_cfl():
    """substeps=n keeps per-application displacement inside the bounded window:
    at CFL≈4, 4 substeps of the K=2 kernel track the unbounded-gather result
    closely while a single clamped application does not."""
    import warnings as _w
    bounds = Box(x=32, y=32)
    ext = extrapolation.PERIODIC
    vel = StaggeredGrid((4.0, 0.0), ext, bounds=bounds, x=32, y=32)  # CFL 4 at dt=1
    smoke = CenteredGrid(lambda pos: math.exp(-0.5 * ((pos.vector['x'] - 16) ** 2
                                                      + (pos.vector['y'] - 16) ** 2) / 4), ext,
                         bounds=bounds, x=32, y=32)
    exact = advect.semi_lagrangian(smoke, vel, 1.0, max_cells=None)       # unbounded gather
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        clamped = advect.semi_lagrangian(smoke, vel, 1.0)                 # clamped at ±2
    sub = advect.semi_lagrangian(smoke, vel, 1.0, substeps=4)             # 4 × CFL-1 steps
    err_clamped = float(math.max(abs(clamped.values - exact.values)))
    err_sub = float(math.max(abs(sub.values - exact.values)))
    assert err_sub < 1e-5, err_sub          # uniform velocity: substeps land exactly
    assert err_clamped > 0.1                # clamping visibly wrong at CFL 4
