"""FLIP liquid simulation model (reference recipe: /root/reference/docs/FLIP.ipynb,
tests/release/test_flip.py — P2G scatter, free-surface pressure solve, G2P + RK4)."""
from __future__ import annotations

from ..math import Solve, extrapolation, ConvergenceException
from ..geom import Box
from ..field import CenteredGrid, StaggeredGrid, distribute_points, finite_fill, resample, mask
from ..physics import advect, fluid

__all__ = ['FlipLiquid']


class FlipLiquid:
    """Dam-break FLIP liquid in a closed box (2D or 3D).

    ``block`` gives per-axis (lo, hi) extents of the initial liquid block as
    fractions of the domain: flat ``(x0, x1, y0, y1[, z0, z1])``. Gravity acts
    along the LAST axis (y in 2D, z in 3D), matching the smoke-plume convention.
    """

    def __init__(self, resolution: int = 64, dims: int = 2, block=None, gravity: float = -9.81,
                 dt: float = 0.1, points_per_cell: int = 8, cg_tol: float = 1e-4, max_iterations: int = 200):
        self.resolution = resolution
        names = ['x', 'y', 'z'][:dims]
        self.bounds = Box(**{n: float(resolution) for n in names})
        self.gravity = gravity
        self.dt = dt
        self.cg_tol = cg_tol
        self.max_iterations = max_iterations
        if block is None:
            block = (0.15, 0.55) * (dims - 1) + (0.45, 0.85)  # raised block, falls under gravity
        extents = {n: (block[2 * i] * resolution, block[2 * i + 1] * resolution)
                   for i, n in enumerate(names)}
        sizes = {n: resolution for n in names}
        self.particles0 = distribute_points(
            Box(**extents), points_per_cell=points_per_cell, **sizes) * ((0,) * dims)
        self._names = names

    def initial_state(self):
        from . import to_device
        from ..physics.fluid import _pressure_extrapolation
        sizes = {n: self.resolution for n in self._names}
        v0 = StaggeredGrid(0, 0, self.bounds, **sizes)
        p0 = CenteredGrid(0., _pressure_extrapolation(v0.boundary), self.bounds, **sizes)
        return to_device((self.particles0, p0))

    def step(self, particles, pressure=None):
        r = self.resolution
        sizes = {n: r for n in self._names}
        grid_v = prev_v = finite_fill(resample(
            particles, StaggeredGrid(0, 0, self.bounds, **sizes), scatter=True, outside_handling='clamp'))
        occupied = resample(mask(particles),
                            CenteredGrid(0, grid_v.boundary.spatial_gradient(), self.bounds, **sizes),
                            scatter=True)
        g_vec = (0,) * (len(self._names) - 1) + (self.gravity * self.dt,)
        # warm-start the free-surface solve at the previous step's pressure —
        # the active mask moves by < 1 cell per step (CFL), so it is an
        # excellent initial iterate (zeroed on newly blocked cells in-solve)
        grid_v, pressure = fluid.make_incompressible(
            grid_v + g_vec, [], active=occupied,
            solve=Solve('CG', self.cg_tol, 0., x0=pressure, max_iterations=self.max_iterations,
                        suppress=(ConvergenceException,)))
        particles = particles + resample(grid_v - prev_v, particles)  # FLIP velocity update
        particles = advect.points(particles, grid_v, self.dt, advect.finite_rk4)
        particles = fluid.boundary_push(particles, [~self.bounds])
        return particles, pressure
