"""FVM cylinder wake — vortex shedding on an unstructured mesh at production
scale (reference workload: examples/mesh/FVM_Cylinder_GMsh.ipynb; solver path
phi/physics/fluid.py:170-200).

Operator-split incompressible Navier-Stokes: implicit (backward-Euler)
momentum with upwind FVM advection + viscous diffusion, then pressure
projection with the Chebyshev(Jacobi)-preconditioned BiCGStab mesh solve
(fluid._mesh_chebyshev_preconditioner). Free-stream Dirichlet top/bottom
walls, uniform inflow, zero-gradient outflow. Pressure lift/drag on the
cylinder surface detect the periodic shedding (St ≈ 0.16-0.2 at Re ≈ 100-200).
"""
from __future__ import annotations

import numpy as np

from ..math import Tensor, Solve, ConvergenceException, wrap, channel, vec
from ..math import _ops as ops
from ..math import solve_linear, jit_compile_linear
from ..math.extrapolation import ZERO_GRADIENT
from ..geom import Box, Sphere
from ..geom._mesh import build_mesh
from ..field import Field
from ..physics import advect, fluid

__all__ = ['CylinderWake']


@jit_compile_linear(auxiliary_args='dt,viscosity,upwind', forget_traces=True)
def _momentum_eq(u, u_prev, dt, viscosity, upwind=True):
    """Backward-Euler operator u − dt·(−u_prev·∇u + ν Δu) = u_prev.
    upwind=False uses central (linear) face interpolation — less numerical
    diffusion, which vortex shedding needs at moderate cells-per-diameter."""
    from ..field import laplace as field_laplace
    diffusion = viscosity * field_laplace(u).values
    advection = advect.differential(u, u_prev, order=1, upwind=upwind).values
    return u.with_values(u.values - dt * (advection + diffusion))


class CylinderWake:
    """Flow past a circular cylinder in a free stream on a quad FVM mesh."""

    def __init__(self, nx: int = 400, ny: int = 128, re: float = 150., dt: float = 0.05,
                 domain: Box = None, diameter: float = 0.5, perturb: float = 0.05,
                 solve_tol: float = 1e-4, max_iterations: int = 500, upwind: bool = False):
        self.domain = domain if domain is not None else Box(x=8., y=4.)
        size = np.asarray((self.domain.upper - self.domain.lower).native())
        center = np.asarray(self.domain.lower.native()) + np.array([size[0] * 0.25, size[1] * 0.5])
        self.diameter = diameter
        self.re = re
        self.viscosity = 1.0 * diameter / re  # U∞ = 1
        self.dt = dt
        self.perturb = perturb
        self.solve_tol = solve_tol
        self.max_iterations = max_iterations
        self.upwind = upwind
        self.cylinder = Sphere(x=float(center[0]), y=float(center[1]), radius=diameter / 2)
        self.mesh = build_mesh(self.domain, x=nx, y=ny, obstacles=self.cylinder)
        self.n_cells = self.mesh.cell_count
        # free-stream Dirichlet far-field walls keep the outer flow uniform;
        # the unnamed obstacle faces fall into the default 'boundary' group
        self.bc = {'x-': vec(x=1., y=0.), 'x+': ZERO_GRADIENT,
                   'y-': vec(x=1., y=0.), 'y+': vec(x=1., y=0.), 'boundary': 0.}

    def initial_state(self):
        """Uniform stream + a transverse kick upstream of the cylinder to seed
        the shedding instability (an impulsive symmetric start can hold the
        unstable symmetric wake for thousands of steps)."""
        cx = self.mesh.center[{'vector': 'x'}]
        vy = self.perturb * ops.exp(-(cx - self.cylinder.center[{'vector': 'x'}]) ** 2)
        values = ops.stack({'x': ops.ones_like(cx), 'y': vy}, channel(vector='x,y'))
        # (cells, vector) layout — the order the solver outputs, so the jit
        # cache sees ONE treedef for initial and stepped states (no retrace)
        values = Tensor(values.native(('cells', 'vector')),
                        values.shape.only(['cells', 'vector'], reorder=True))
        v = Field(self.mesh, values, self.bc)
        p = Field(self.mesh, ops.zeros_like(cx), fluid._pressure_extrapolation(v.boundary))
        from . import to_device  # host numpy mesh tables -> device arrays, so the
        return to_device((v, p))  # jit cache sees ONE leaf type across steps

    def step(self, v: Field, p: Field):
        mom_solve = Solve('biCG-stab', self.solve_tol, self.solve_tol, x0=v,
                          max_iterations=self.max_iterations, suppress=(ConvergenceException,))
        v = solve_linear(_momentum_eq, v, mom_solve, v, self.dt, self.viscosity, self.upwind)
        prs_solve = Solve('auto', self.solve_tol, self.solve_tol, x0=p,
                          max_iterations=self.max_iterations, suppress=(ConvergenceException,))
        v, p = fluid.make_incompressible(v, (), prs_solve)
        return v, p

    def forces(self, p: Field) -> Tensor:
        """Pressure force exerted on the cylinder, F = Σ_faces p A n̂ over the
        obstacle ('boundary') faces — n̂ is the fluid-cell outward normal, which
        points into the body. Returns a vector (drag = F·x̂, lift = F·ŷ)."""
        mask = self.mesh.boundary_mask('boundary')
        contrib = mask * p.values * self.mesh.face_areas * self.mesh.face_normals
        return ops.sum_(ops.sum_(contrib, '~faces'), 'cells')
