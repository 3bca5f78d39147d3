"""Prebuilt simulation models — the benchmark configs of BASELINE.md
(smoke plume, Burgers, lid-driven cavity, Kolmogorov flow, FLIP)."""
from .smoke import SmokePlume
from .burgers import Burgers
