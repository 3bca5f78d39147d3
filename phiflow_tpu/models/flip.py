"""FLIP liquid simulation model (reference recipe: /root/reference/docs/FLIP.ipynb,
tests/release/test_flip.py — P2G scatter, free-surface pressure solve, G2P + RK4)."""
from __future__ import annotations

from ..math import Solve, extrapolation, ConvergenceException
from ..geom import Box
from ..field import CenteredGrid, StaggeredGrid, distribute_points, finite_fill, resample, mask
from ..physics import advect, fluid

__all__ = ['FlipLiquid']


class FlipLiquid:
    """Dam-break FLIP liquid in a closed box."""

    def __init__(self, resolution: int = 64, block=(0.15, 0.55, 0.45, 0.85), gravity: float = -9.81,
                 dt: float = 0.1, points_per_cell: int = 8, cg_tol: float = 1e-4, max_iterations: int = 200):
        self.resolution = resolution
        self.bounds = Box(x=float(resolution), y=float(resolution))
        self.gravity = gravity
        self.dt = dt
        self.cg_tol = cg_tol
        self.max_iterations = max_iterations
        x0, x1, y0, y1 = (b * resolution for b in block)
        self.particles0 = distribute_points(
            Box['x,y', x0:x1, y0:y1], x=resolution, y=resolution,
            points_per_cell=points_per_cell) * (0, 0)

    def initial_state(self):
        from . import to_device
        return to_device((self.particles0,))

    def step(self, particles):
        r = self.resolution
        grid_v = prev_v = finite_fill(resample(
            particles, StaggeredGrid(0, 0, self.bounds, x=r, y=r), scatter=True, outside_handling='clamp'))
        occupied = resample(mask(particles),
                            CenteredGrid(0, grid_v.boundary.spatial_gradient(), self.bounds, x=r, y=r),
                            scatter=True)
        grid_v, pressure = fluid.make_incompressible(
            grid_v + (0, self.gravity * self.dt), [], active=occupied,
            solve=Solve('CG', self.cg_tol, 0., max_iterations=self.max_iterations,
                        suppress=(ConvergenceException,)))
        particles = particles + resample(grid_v - prev_v, particles)  # FLIP velocity update
        particles = advect.points(particles, grid_v, self.dt, advect.finite_rk4)
        particles = fluid.boundary_push(particles, [~self.bounds])
        return (particles,)
