"""Halo-exchange planning for explicit shard_map execution.

The default execution path relies on XLA GSPMD to insert halo exchanges for
stencil pads/shifts (see package docstring). This module provides the metadata
for the explicit path (shard_map + ppermute / Pallas ring DMA), used when manual
overlap of communication with compute is profitable.
"""
from __future__ import annotations

from typing import Dict, Tuple

__all__ = ['halo_exchange_spec']


def halo_exchange_spec(stencil_orders: Dict[str, int]) -> Dict[str, Tuple[int, int]]:
    """Halo widths per sharded spatial dim for a given stencil order.

    order 2 → 1 ghost cell each side; order 4 → 2; order 6 → 3.
    """
    return {dim: (order // 2, order // 2) for dim, order in stencil_orders.items()}
