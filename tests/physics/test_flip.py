"""FLIP liquid regression tests — mirrors the reference release suite
(/root/reference/tests/release/test_flip.py: single particles fall, pool stays,
falling block keeps shape)."""
import numpy as np
import pytest

import phiflow_tpu.math as math
from phiflow_tpu.math import extrapolation, Solve, instance
from phiflow_tpu.geom import Box, union
from phiflow_tpu.field import (
    CenteredGrid, StaggeredGrid, PointCloud, distribute_points, finite_fill, resample, mask,
    data_bounds,
)
import phiflow_tpu.field as field
from phiflow_tpu.physics import fluid, advect


def flip_step(particles, obstacles, dt, bounds, **grid_resolution):
    """The canonical FLIP step (reference: tests/release/test_flip.py:8-18)."""
    velocity = prev_velocity = finite_fill(resample(
        particles, StaggeredGrid(0, 0, bounds, **grid_resolution),
        outside_handling='clamp', scatter=True))
    occupied = resample(mask(particles),
                        CenteredGrid(0, velocity.extrapolation.spatial_gradient(), velocity.bounds,
                                     **{d: velocity.resolution.get_size(d) for d in velocity.resolution.names}),
                        scatter=True)
    velocity, pressure = fluid.make_incompressible(
        velocity + (0, -9.81 * dt), obstacles, active=occupied,
        solve=Solve('CG', 1e-5, 1e-5, suppress=(math.ConvergenceException,)))
    particles = particles + resample(velocity - prev_velocity, particles)  # FLIP update
    if obstacles:
        move_v = velocity * resample(~union([o.geometry if hasattr(o, 'geometry') else o for o in obstacles]), to=velocity)
    else:
        move_v = velocity
    particles = advect.points(particles, move_v, dt, advect.finite_rk4)
    particles = fluid.boundary_push(particles, list(obstacles) + [~bounds])
    return particles


def test_distribute_points():
    cloud = distribute_points(Box['x,y', 0:8, 0:4], x=8, y=8, points_per_cell=2)
    assert cloud.points.shape.instance.volume == 8 * 4 * 2
    assert bool(math.all(cloud.points.vector['y'] < 4.01))


def test_single_particles_fall():
    particles = initial = distribute_points(
        union(Box['x,y', 0:1, 10:11], Box['x,y', 15:16, 10:11]), x=16, y=16, points_per_cell=1) * (0, 0)
    for _ in range(5):
        particles = flip_step(particles, [], dt=0.05, bounds=Box(x=16, y=16), x=16, y=16)
    assert bool(math.all(particles.points.vector['y'] < initial.points.vector['y']))


def test_pool_stays():
    particles = initial = distribute_points(Box['x,y', 0:16, 0:5], x=16, y=16) * (0, 0)
    for _ in range(3):
        particles = flip_step(particles, [], dt=0.05, bounds=Box(x=16, y=16), x=16, y=16)
    math.assert_close(initial.points, particles.points, abs_tolerance=1e-2)


def test_falling_block_keeps_shape():
    particles = initial = distribute_points(Box['x,y', 6:10, 24:28], x=16, y=32) * (0, 0)
    b0 = data_bounds(initial)
    for _ in range(5):
        particles = flip_step(particles, [], dt=0.05, bounds=Box(x=16, y=32), x=16, y=32)
        math.assert_close(data_bounds(particles).size, b0.size, abs_tolerance=1e-3)
    assert float(math.max(particles.points.vector['y'], 'points')) < \
        float(math.max(initial.points.vector['y'], 'points'))


def test_flip_3d_step():
    """3D FLIP step: P2G scatter, active-mask projection, G2P, RK4 advection
    (the reference's FLIP recipe is 2D — this covers the 3D scatter path)."""
    import numpy as np
    from phiflow_tpu.math import Solve, extrapolation, ConvergenceException
    from phiflow_tpu.geom import Box
    from phiflow_tpu.field import (CenteredGrid, StaggeredGrid, distribute_points,
                                   finite_fill, resample, mask)
    from phiflow_tpu.physics import advect, fluid

    r = 12
    bounds = Box(x=float(r), y=float(r), z=float(r))
    particles = distribute_points(Box['x,y,z', 2:6, 2:8, 2:6], x=r, y=r, z=r,
                                  points_per_cell=2) * (0, 0, 0)
    for _ in range(2):
        grid_v = prev_v = finite_fill(resample(
            particles, StaggeredGrid(0, 0, bounds, x=r, y=r, z=r), scatter=True,
            outside_handling='clamp'))
        occupied = resample(mask(particles),
                            CenteredGrid(0, grid_v.boundary.spatial_gradient(), bounds, x=r, y=r, z=r),
                            scatter=True)
        grid_v, pressure = fluid.make_incompressible(
            grid_v + (0, -9.81 * 0.1, 0), [], active=occupied,
            solve=Solve('CG', 1e-4, 0., max_iterations=500, suppress=(ConvergenceException,)))
        particles = particles + resample(grid_v - prev_v, particles)
        particles = advect.points(particles, grid_v, 0.1, advect.finite_rk4)
        particles = fluid.boundary_push(particles, [~bounds])
    pts = np.asarray(particles.points.native((particles.points.shape.instance.names[0], 'vector')))
    assert np.isfinite(pts).all()
    assert (pts > -0.5).all() and (pts < r + 0.5).all(), "particles left the box"
    # gravity pulls the block down on average
    assert pts[:, 1].mean() < 5.0


def test_flip3d_p2g_kernel_dispatch_matches_generic():
    """The field-layer P2G dispatch (field/_resample._p2g_fast_path → the MXU
    one-hot kernel, interpret mode here) must reproduce the generic
    math.scatter FLIP step, including NaN bases on empty cells."""
    import numpy as np
    import jax
    from phiflow_tpu.models import FlipLiquid
    from phiflow_tpu.ops import p2g as p2g_mod

    model = FlipLiquid(resolution=24, dims=3, points_per_cell=8, cg_tol=1e-5,
                       max_iterations=500)
    n_particles = int(model.particles0.geometry.center.shape.instance.volume)
    assert n_particles >= 4096, n_particles  # below ops.p2g.supported()'s floor the dispatch is a no-op
    state = model.initial_state()
    step = jax.jit(lambda s: model.step(*s))
    ref, _ = step(state)
    p2g_mod.FORCE_INTERPRET = True
    try:
        step2 = jax.jit(lambda s: model.step(*s))
        got, _ = step2(state)
    finally:
        p2g_mod.FORCE_INTERPRET = False
    a = np.asarray(ref.geometry.center.native(('points', 'vector')))
    b = np.asarray(got.geometry.center.native(('points', 'vector')))
    np.testing.assert_allclose(b, a, atol=5e-4)
