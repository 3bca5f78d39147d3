"""phiflow_tpu — a TPU-native differentiable PDE-simulation framework.

Built from scratch with the capabilities of tum-pbs/PhiFlow (reference mounted at
/root/reference), redesigned for TPU: a JAX-only named-dim tensor core compiled
straight to XLA, Pallas kernels for the hot stencil/gather/scatter paths,
matrix-free on-device Krylov solvers with implicit differentiation, and
first-class spatial sharding with halo exchange over the ICI mesh.

Import `phiflow_tpu.flow` for the full user namespace.
"""
import os

__version__ = '0.1.0'

from . import math
from . import geom
from . import field
from . import physics


def verify():
    """Print setup status (reference analog: phi.verify())."""
    import jax
    print(f"phiflow_tpu {__version__}")
    print(f"jax {jax.__version__}, default backend: {jax.default_backend()}")
    print(f"devices: {jax.devices()}")
    from .math import spatial
    from .field import CenteredGrid, Noise, laplace
    g = CenteredGrid(Noise(), 0., x=8, y=8)
    _ = laplace(g)
    print("basic field ops: OK")


from ._troubleshoot import troubleshoot, assert_minimal_config


def detect_backends():
    import jax
    return [f"jax-{d.platform}" for d in jax.devices()]


def set_logging_level(level='debug'):
    import logging
    logging.getLogger('phiflow_tpu').setLevel(getattr(logging, level.upper()))
