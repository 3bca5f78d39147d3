"""Burgers' equation (reference recipe: /root/reference/examples/grids/Burgers.ipynb:
semi-Lagrangian advection + diffusion on a periodic CenteredGrid)."""
from __future__ import annotations

from ..math import Solve, extrapolation
from ..geom import Box
from ..field import CenteredGrid, Noise
from ..physics import advect, diffuse

__all__ = ['Burgers']


class Burgers:

    def __init__(self, resolution: int = 128, dims: int = 2, viscosity: float = 0.1,
                 dt: float = 0.5, implicit=False):
        names = ['x', 'y', 'z'][:dims]
        sizes = {n: resolution for n in names}
        bounds = Box(**{n: float(resolution) for n in names})
        self.viscosity = viscosity
        self.dt = dt
        self.implicit = implicit
        self.v0 = CenteredGrid(Noise(vector=','.join(names)), extrapolation.PERIODIC,
                               bounds=bounds, **sizes) * 2

    def initial_state(self):
        from . import to_device
        return to_device((self.v0,))

    def step(self, v):
        v = advect.semi_lagrangian(v, v, self.dt)
        if self.implicit:
            v = diffuse.implicit(v, self.viscosity, self.dt, Solve('CG', 1e-5, 1e-5))
        else:
            v = diffuse.explicit(v, self.viscosity, self.dt)
        return (v,)
