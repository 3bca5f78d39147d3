"""Higher-order Kolmogorov flow (reference recipe:
/root/reference/examples/grids/Higher_order_Kolmogorov.ipynb — order-6
advection/diffusion, incompressible_rk4 pressure-in-the-loop integration)."""
from __future__ import annotations

import numpy as np

from ..math import Solve, extrapolation, ConvergenceException, channel, stack, wrap
from ..geom import Box
from ..field import Field, CenteredGrid, Noise
from ..physics import advect, diffuse, fluid

__all__ = ['KolmogorovFlow']


class KolmogorovFlow:
    """2D periodic turbulence driven by a sinusoidal body force.

    Uses centered grids with order-`order` differential advection/diffusion and
    RK4 integration with the pressure solve inside the loop (fluid.py:291)."""

    def __init__(self, resolution: int = 128, reynolds: float = 1000., forcing_wavenumber: int = 4,
                 dt: float = 0.005, order: int = 6, cg_tol: float = 1e-4, max_iterations: int = 200):
        self.order = order
        self.dt = dt
        self.viscosity = 1.0 / reynolds
        L = 2 * np.pi
        bounds = Box(x=L, y=L)
        self.solve_params = dict(cg_tol=cg_tol, max_iterations=max_iterations)
        k = forcing_wavenumber
        self.forcing = CenteredGrid(
            lambda pos: stack({'x': _sin(k * pos.vector['y']), 'y': pos.vector['x'] * 0},
                              channel(vector='x,y')),
            extrapolation.PERIODIC, x=resolution, y=resolution, bounds=bounds)
        self.v0 = CenteredGrid(Noise(vector='x,y'), extrapolation.PERIODIC,
                               x=resolution, y=resolution, bounds=bounds) * 0.5
        self.p0 = CenteredGrid(0., extrapolation.PERIODIC, x=resolution, y=resolution, bounds=bounds)

    def initial_state(self):
        from . import to_device
        return to_device((self.v0, self.p0))

    def pde(self, v: Field) -> Field:
        adv = advect.differential(v, v, order=min(self.order, 4) if not _periodic_only(v) else self.order)
        diff = diffuse.differential(v, self.viscosity, order=self.order)
        return adv + diff + self.forcing

    def step(self, v: Field, p: Field):
        solve = Solve('CG', self.solve_params['cg_tol'], 0.,
                      max_iterations=self.solve_params['max_iterations'],
                      suppress=(ConvergenceException,))
        return fluid.incompressible_rk4(self.pde, v, p, self.dt, pressure_order=self.order,
                                        pressure_solve=solve)


def _sin(x):
    from ..math import sin
    return sin(x)


def _periodic_only(v: Field) -> bool:
    return v.boundary == extrapolation.PERIODIC
