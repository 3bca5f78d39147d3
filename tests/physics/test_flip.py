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
