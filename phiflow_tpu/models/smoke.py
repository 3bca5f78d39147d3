"""Buoyant smoke-plume simulation — the flagship benchmark config
(reference recipe: /root/reference/examples/grids/Smoke_Plume.ipynb;
solver path: phi/physics/fluid.py:94-162, SURVEY.md §3.1).
"""
from __future__ import annotations

from typing import Optional, Tuple

from ..math import Solve, dual, extrapolation, stack, wrap, ConvergenceException
from ..geom import Box, Sphere
from ..field import Field, CenteredGrid, StaggeredGrid, resample
from ..physics import advect, fluid

__all__ = ['SmokePlume']


class SmokePlume:
    """2D/3D buoyant smoke: MacCormack smoke advection + semi-Lagrangian
    self-advection + pressure projection (Solve('CG', 1e-3))."""

    def __init__(self, resolution: int = 64, dims: int = 2, buoyancy: float = 0.1,
                 inflow_rate: float = 0.2, dt: float = 0.5, cg_tol: float = 1e-3,
                 max_iterations: int = 1000, batch_shape=None, max_cells: int = 1):
        # max_cells=1: this config's CFL stays < 1 (bench.py certifies
        # max|disp| <= max_cells IN-GRAPH on every run), and the K=1 window
        # kernel skips both the wide window and the adaptive-K min/max
        # reduction + cond. Pass max_cells=2 (or substeps='auto') for
        # higher-CFL runs.
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
        self._names = names
        self._resolution = resolution
        self._inflow_center = dict(inflow_center)
        self._inflow_radius = resolution / 10

    def _inflow_mask_values(self, smoke: Field):
        """Soft inflow mask built from iota positions INSIDE the trace — neither
        an HLO literal nor a closure device constant (a resolution³ constant in
        either form overflows the remote-compile request at 512³)."""
        import jax.numpy as jnp
        from ..math import Tensor
        names = self._names
        d2 = None
        for ax, nm in enumerate(names):
            c = jnp.arange(self._resolution, dtype=jnp.float32) + 0.5  # dx=1, origin 0
            c = c.reshape((-1,) + (1,) * (len(names) - ax - 1))
            t = (c - self._inflow_center[nm]) ** 2
            d2 = t if d2 is None else d2 + t
        dist = jnp.sqrt(d2)
        # 1-cell smooth band ≈ resample(Sphere, soft=True) fraction-inside
        frac = jnp.clip(0.5 + (self._inflow_radius - dist), 0., 1.)
        return smoke.with_values(Tensor(frac, smoke.resolution))

    def initial_state(self) -> Tuple[Field, Field, Field]:
        from . import to_device
        return to_device((self.velocity0, self.smoke0, self.pressure0))

    def advect_smoke(self, velocity: Field, smoke: Field) -> Field:
        """Phase 1: MacCormack smoke advection + soft inflow.

        Static single-pass window (adaptive K=1/K=2): the benchmark certifies
        max|disp| ≤ max_cells in-graph after every run (bench.py CFL
        certification), which keeps the lookup provably exact without paying
        the auto-substep cond's HBM cost — the cond holds every staggered
        displacement stack live simultaneously, which OOMs 512³ (16.9G
        program). Pass substeps='auto' here for long-horizon runs past
        CFL=max_cells."""
        return advect.mac_cormack(smoke, velocity, self.dt, max_cells=self.max_cells) + \
            self.inflow_rate * self._inflow_mask_values(smoke)

    def advect_velocity(self, velocity: Field, smoke: Field) -> Field:
        """Phase 2: buoyancy + semi-Lagrangian self-advection (static window,
        certified unclamped by the benchmark — see advect_smoke).

        Buoyancy acts only along the last axis, so only THAT face component is
        interpolated — resampling the mostly-zero vector field costs d× the
        bandwidth for identical values (0·interp ≡ 0 exactly)."""
        adv = advect.semi_lagrangian(velocity, velocity, self.dt, max_cells=self.max_cells)
        up = self._names[-1]
        lift = resample(smoke * (self.buoyancy_dir[-1] * self.dt), to=adv.vector[up])
        comps = [adv.vector[d].values + lift.values if d == up else adv.vector[d].values
                 for d in self._names]
        return adv.with_values(stack(comps, dual(vector=self._names)))

    def project(self, velocity: Field, pressure: Optional[Field]):
        """Phase 3: pressure projection (MG-preconditioned CG)."""
        return fluid.make_incompressible(
            velocity, (), Solve('CG', self.cg_tol, 0., x0=pressure, max_iterations=self.max_iterations,
                                suppress=(ConvergenceException,)))

    def step(self, velocity: Field, smoke: Field, pressure: Optional[Field]):
        smoke = self.advect_smoke(velocity, smoke)
        velocity = self.advect_velocity(velocity, smoke)
        velocity, pressure = self.project(velocity, pressure)
        return velocity, smoke, pressure
