"""Explicit halo exchange for shard_map execution — the manual-scheduling
alternative to GSPMD's automatic partitioning (SURVEY.md §2.7: the TPU-native
domain-decomposition layer the reference lacks entirely).

Inside a `jax.shard_map` region each device holds one block of the global
array. `halo_exchange` pads every decomposed axis with `width` cells fetched
from the ring neighbors via `lax.ppermute` (ICI neighbor collectives); at
non-periodic global edges the halo is filled from the boundary condition
instead ('neumann' zero-gradient replicates the edge cell, 'ghost0' is a zero
Dirichlet ghost, 'value' a constant).

The companion `_shardmap` module builds complete solvers (pressure CG) on top.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = ['halo_exchange', 'halo_exchange_spec', 'AxisSpec']


class AxisSpec:
    """Decomposition of one array axis: (array_axis, mesh_axis, n_shards,
    bc_lo, bc_hi) with bc in {'periodic', 'neumann', 'ghost0'} or
    ('value', c)."""

    def __init__(self, array_axis: int, mesh_axis: str, n_shards: int,
                 bc_lo='periodic', bc_hi='periodic'):
        self.array_axis = array_axis
        self.mesh_axis = mesh_axis
        self.n_shards = n_shards
        self.bc_lo = bc_lo
        self.bc_hi = bc_hi

    @property
    def periodic(self):
        per = self.bc_lo == 'periodic'
        assert per == (self.bc_hi == 'periodic'), "periodic must apply to both sides"
        return per


def _edge_fill(block, halo, axis, width, bc, lower: bool):
    """Boundary-condition ghost values replacing an invalid ring halo at the
    global domain edge."""
    if bc == 'neumann':  # zero-gradient: replicate the outermost plane(s)
        idx = [slice(None)] * block.ndim
        idx[axis] = slice(0, 1) if lower else slice(-1, None)
        edge = block[tuple(idx)]
        reps = [1] * block.ndim
        reps[axis] = width
        return jnp.tile(edge, reps)
    if bc == 'ghost0':
        return jnp.zeros_like(halo)
    if isinstance(bc, tuple) and bc[0] == 'value':
        return jnp.full_like(halo, bc[1])
    raise ValueError(f"unsupported edge bc {bc!r}")


_COMM_TRACKER = None


class CommTracker:
    """Accumulates per-shard ppermute traffic at TRACE time (shapes are static).
    Call sites inside `lax.while_loop` bodies are traced once, so `loop_bytes`
    counts bytes per loop ITERATION for those — multiply by the measured
    iteration count for totals."""

    def __init__(self):
        self.bytes = 0       # per-shard bytes ppermuted, per traced call site
        self.ppermutes = 0   # number of ppermute ops traced

    def note(self, n_bytes: int):
        self.bytes += int(n_bytes)
        self.ppermutes += 1


def track_comm():
    """Context manager: track ppermute halo traffic traced inside the block."""
    import contextlib

    @contextlib.contextmanager
    def _ctx():
        global _COMM_TRACKER
        prev = _COMM_TRACKER
        t = CommTracker()
        _COMM_TRACKER = t
        try:
            yield t
        finally:
            _COMM_TRACKER = prev
    return _ctx()


def halo_exchange(block: jnp.ndarray, specs: Sequence[AxisSpec], width: int = 1) -> jnp.ndarray:
    """Pad each decomposed axis of a shard_map block with `width` neighbor cells.

    Must be called inside shard_map with the mesh axes named in `specs`.
    Returns the block grown by 2·width along each spec'd axis.
    """
    for spec in specs:
        ax, name, n = spec.array_axis, spec.mesh_axis, spec.n_shards
        ax = ax % block.ndim
        lo_idx = [slice(None)] * block.ndim
        lo_idx[ax] = slice(0, width)
        hi_idx = [slice(None)] * block.ndim
        hi_idx[ax] = slice(block.shape[ax] - width, block.shape[ax])
        own_lo = block[tuple(lo_idx)]
        own_hi = block[tuple(hi_idx)]
        if n == 1:
            if spec.periodic:
                left_halo, right_halo = own_hi, own_lo
            else:
                left_halo = _edge_fill(block, own_lo, ax, width, spec.bc_lo, lower=True)
                right_halo = _edge_fill(block, own_hi, ax, width, spec.bc_hi, lower=False)
            block = jnp.concatenate([left_halo, block, right_halo], axis=ax)
            continue
        # ring exchange: shard i receives left halo from i−1 and right from i+1
        fwd = [(i, (i + 1) % n) for i in range(n)]   # my top rows → right neighbor
        bwd = [(i, (i - 1) % n) for i in range(n)]   # my bottom rows → left neighbor
        if _COMM_TRACKER is not None:
            import numpy as _np
            slab = int(_np.prod(own_hi.shape)) * jnp.dtype(own_hi.dtype).itemsize
            _COMM_TRACKER.note(2 * slab)
        left_halo = lax.ppermute(own_hi, name, fwd)
        right_halo = lax.ppermute(own_lo, name, bwd)
        if not spec.periodic:
            pos = lax.axis_index(name)
            left_fix = _edge_fill(block, left_halo, ax, width, spec.bc_lo, lower=True)
            right_fix = _edge_fill(block, right_halo, ax, width, spec.bc_hi, lower=False)
            left_halo = jnp.where(pos == 0, left_fix, left_halo)
            right_halo = jnp.where(pos == n - 1, right_fix, right_halo)
        block = jnp.concatenate([left_halo, block, right_halo], axis=ax)
    return block


def halo_exchange_spec(stencil_orders: Dict[str, int]) -> Dict[str, Tuple[int, int]]:
    """Halo widths per sharded spatial dim for a given stencil order.

    order 2 → 1 ghost cell each side; order 4 → 2; order 6 → 3.
    """
    return {dim: (order // 2, order // 2) for dim, order in stencil_orders.items()}
