"""Prebuilt simulation models — the benchmark configs of BASELINE.md
(smoke plume, Burgers, Kolmogorov flow, FLIP liquid, lid-driven cavity)."""
import jax as _jax
import jax.numpy as _jnp


def to_device(state):
    """Move every array leaf of a model state to the default device with
    DEFAULT (major-to-minor) layouts.

    Host (numpy) leaves and device leaves occupy distinct jit-cache entries,
    so a step function fed the host-resident initial state compiles twice.
    Models call this at the end of ``initial_state`` so the first step hits
    the same cache entry as every later step.

    Layout normalization: eager construction (stack/transpose chains) can
    commit arrays with transposed on-device layouts. jit boundaries then pin
    those layouts for every step (donation requires in == out), inserting two
    relayout copies per component per step (~6 ms/step at 512³). A one-time
    host round-trip rebuilds the leaf with the default layout. The explicit
    ``Format``/``device_put``-with-layout API is avoided — it wedges the axon
    TPU runtime."""
    import numpy as _np

    def put(x):
        x = _jnp.asarray(x)
        try:
            mtm = tuple(x.format.layout.major_to_minor)
        except Exception:
            return x
        if mtm != tuple(range(x.ndim)):
            return _jnp.asarray(_np.asarray(x))
        return x

    return _jax.tree_util.tree_map(put, state)


from .smoke import SmokePlume
from .burgers import Burgers
from .kolmogorov import KolmogorovFlow
from .flip import FlipLiquid
from .cavity import LidDrivenCavity
from .moving_obstacle import MovingObstacles
from .sph_dam import SphDamBreak
from .cylinder_wake import CylinderWake
