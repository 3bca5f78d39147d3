"""Prebuilt simulation models — the benchmark configs of BASELINE.md
(smoke plume, Burgers, Kolmogorov flow, FLIP liquid, lid-driven cavity)."""
import jax as _jax
import jax.numpy as _jnp


def to_device(state):
    """Move every array leaf of a model state to the default device.

    Host (numpy) leaves and device leaves occupy distinct jit-cache entries,
    so a step function fed the host-resident initial state compiles twice.
    Models call this at the end of ``initial_state`` so the first step hits
    the same cache entry as every later step.
    """
    return _jax.tree_util.tree_map(_jnp.asarray, state)


from .smoke import SmokePlume
from .burgers import Burgers
from .kolmogorov import KolmogorovFlow
from .flip import FlipLiquid
from .cavity import LidDrivenCavity
from .sph_dam import SphDamBreak
from .cylinder_wake import CylinderWake
