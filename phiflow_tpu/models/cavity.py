"""Lid-driven cavity / moving obstacles (reference recipes:
/root/reference/examples/grids/Lid_Driven_Cavity.ipynb, Moving_Obstacles.ipynb —
obstacle masks in the Poisson solve, phi/physics/fluid.py:127-137)."""
from __future__ import annotations

from ..math import Solve, extrapolation, ConvergenceException, vec
from ..geom import Box, Sphere
from ..field import StaggeredGrid
from ..physics import advect, diffuse, fluid
from ..physics.fluid import Obstacle

__all__ = ['LidDrivenCavity']


class LidDrivenCavity:
    """Closed box with a moving lid (top boundary velocity) and optional obstacle."""

    def __init__(self, resolution: int = 64, lid_speed: float = 1., viscosity: float = 0.01,
                 dt: float = 0.5, obstacle: bool = False, cg_tol: float = 1e-4, max_iterations: int = 500):
        r = resolution
        self.dt = dt
        self.viscosity = viscosity
        self.cg_tol = cg_tol
        self.max_iterations = max_iterations
        bounds = Box(x=float(r), y=float(r))
        # no-slip walls; lid (y+) moves with lid_speed in x
        boundary = {'x-': 0., 'x+': 0., 'y-': 0., 'y+': vec(x=lid_speed, y=0.)}
        self.v0 = StaggeredGrid(0., extrapolation.combine_sides(**boundary), bounds=bounds, x=r, y=r)
        # zero initial pressure with the BC make_incompressible would derive, so the
        # state treedef is identical from step 0 on (x0=None would retrace once)
        from ..field import CenteredGrid
        from ..physics.fluid import _pressure_extrapolation
        self.p0 = CenteredGrid(0., _pressure_extrapolation(self.v0.boundary), bounds=bounds, x=r, y=r)
        self.obstacles = [Obstacle(Sphere(x=r / 2, y=r / 2, radius=r / 8))] if obstacle else []

    def initial_state(self):
        from . import to_device
        return to_device((self.v0, self.p0))

    def step(self, v, p):
        v = advect.semi_lagrangian(v, v, self.dt)
        v = diffuse.explicit(v, self.viscosity, self.dt)
        v, p = fluid.make_incompressible(v, self.obstacles,
                                         Solve('CG', self.cg_tol, 0., x0=p,
                                               max_iterations=self.max_iterations,
                                               suppress=(ConvergenceException,)))
        return v, p
