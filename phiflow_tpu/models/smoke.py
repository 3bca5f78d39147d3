"""Buoyant smoke-plume simulation — the flagship benchmark config
(reference recipe: /root/reference/examples/grids/Smoke_Plume.ipynb;
solver path: phi/physics/fluid.py:94-162, SURVEY.md §3.1).
"""
from __future__ import annotations

from typing import Optional, Tuple

from ..math import Solve, extrapolation, wrap, ConvergenceException
from ..geom import Box, Sphere
from ..field import Field, CenteredGrid, StaggeredGrid, resample
from ..physics import advect, fluid

__all__ = ['SmokePlume']


class SmokePlume:
    """2D/3D buoyant smoke: MacCormack smoke advection + semi-Lagrangian
    self-advection + pressure projection (Solve('CG', 1e-3))."""

    def __init__(self, resolution: int = 64, dims: int = 2, buoyancy: float = 0.1,
                 inflow_rate: float = 0.2, dt: float = 0.5, cg_tol: float = 1e-3,
                 max_iterations: int = 1000, batch_shape=None, max_cells: int = 2):
        names = ['x', 'y', 'z'][:dims]
        sizes = {n: resolution for n in names}
        bounds = Box(**{n: float(resolution) for n in names})
        self.dt = dt
        self.max_cells = max_cells
        self.cg_tol = cg_tol
        self.max_iterations = max_iterations
        self.buoyancy_dir = tuple(0. if i < dims - 1 else buoyancy for i in range(dims))
        self.inflow_rate = inflow_rate
        inflow_center = {n: resolution / 2 for n in names}
        inflow_center[names[-1]] = resolution / 8
        self.inflow = Sphere(radius=resolution / 10, **inflow_center)
        from ..field import Noise
        self.velocity0 = StaggeredGrid(0., 0., bounds=bounds, **sizes)
        smoke0 = CenteredGrid(0., extrapolation.BOUNDARY, bounds=bounds, **sizes)
        if batch_shape is not None:
            from ..math import expand
            smoke0 = smoke0.with_values(expand(smoke0.values, batch_shape))
        self.smoke0 = smoke0
        self.pressure0 = CenteredGrid(0., extrapolation.BOUNDARY, bounds=bounds, **sizes)
        # precompute the (constant) soft inflow mask eagerly — avoids embedding a
        # resolution³ literal into the jit trace (reference recipe recomputes it,
        # but it is time-independent). Stored on device: jax hoists device-array
        # closure constants as runtime const-args instead of HLO literals.
        import jax as _jax
        mask = resample(self.inflow, to=smoke0, soft=True)
        self.inflow_mask = mask.with_values(mask.values._op1(lambda n: _jax.device_put(n)))

    def initial_state(self) -> Tuple[Field, Field, Field]:
        return self.velocity0, self.smoke0, self.pressure0

    def step(self, velocity: Field, smoke: Field, pressure: Optional[Field]):
        dt = self.dt
        smoke = advect.mac_cormack(smoke, velocity, dt, max_cells=self.max_cells) + \
            self.inflow_rate * self.inflow_mask
        buoyancy = resample(smoke * self.buoyancy_dir, to=velocity)
        velocity = advect.semi_lagrangian(velocity, velocity, dt, max_cells=self.max_cells) + buoyancy * dt
        velocity, pressure = fluid.make_incompressible(
            velocity, (), Solve('CG', self.cg_tol, 0., x0=pressure, max_iterations=self.max_iterations,
                                suppress=(ConvergenceException,)))
        return velocity, smoke, pressure
