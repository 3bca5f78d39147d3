"""phiflow_tpu.physics — PDE solvers (reference: /root/reference/phi/physics/)."""
from . import advect
from . import diffuse
from . import fluid
from . import integrate
from .fluid import Obstacle, make_incompressible, apply_boundary_conditions, boundary_push, incompressible_rk4

try:
    from . import sph
except ImportError:
    pass
from ._boundaries import Domain, OPEN, CLOSED, PERIODIC_DOMAIN, STICKY, SLIPPERY
