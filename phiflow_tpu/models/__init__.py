"""Prebuilt simulation models — the benchmark configs of BASELINE.md
(smoke plume, Burgers, Kolmogorov flow, FLIP liquid, lid-driven cavity)."""
from .smoke import SmokePlume
from .burgers import Burgers
from .kolmogorov import KolmogorovFlow
from .flip import FlipLiquid
from .cavity import LidDrivenCavity
