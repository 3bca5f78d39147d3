"""Cell-list neighbor search — the scalable backend of `pairwise_differences`
(reference semantics: phiml `math.pairwise_differences(method='auto')`, SPH call
site /root/reference/phi/physics/sph.py:58; plan: SURVEY.md §7 step 9).

TPU-first design: no dynamic shapes anywhere. The domain is binned into a
STATIC cell grid (cell edge ≥ cutoff), particles are scattered into
fixed-capacity buckets (capacity overflow drops extra particles — callers pick
`capacity_factor` with headroom), and each particle gathers the 3^d surrounding
buckets as a fixed-width candidate list. Everything lowers to one sort +
scatter + gathers of static shapes; memory is O(N·3^d·capacity) instead of the
dense O(N²).
"""
from __future__ import annotations

import itertools
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['cell_list_neighbors']


def cell_list_neighbors(positions: jnp.ndarray, cutoff: float,
                        lower: Sequence[float], upper: Sequence[float],
                        periodic: bool = False, capacity: Optional[int] = None,
                        capacity_factor: float = 2.0):
    """Fixed-width neighbor candidates for each particle.

    positions: (N, d) float array; cutoff: interaction radius (static float);
    lower/upper: static domain bounds; capacity: max particles per cell
    (default: capacity_factor × mean occupancy, ≥ 4).

    Returns (indices, deltas, mask):
      indices: (N, M) int32 — candidate particle ids (M = 3^d · capacity)
      deltas:  (N, M, d)  — positions[j] − positions[i] (min-image if periodic)
      mask:    (N, M) bool — valid candidate AND distance < cutoff AND j ≠ i
    """
    N, d = positions.shape
    lower = np.asarray(lower, np.float32).reshape(d)
    upper = np.asarray(upper, np.float32).reshape(d)
    size = upper - lower
    nc = np.maximum(1, np.floor(size / cutoff).astype(int))  # static cells per axis
    cell_size = size / nc
    n_cells = int(np.prod(nc))
    if capacity is None:
        # Poisson-tail bound: P(occupancy > λ + 5√λ + 8) is negligible for
        # near-uniform distributions; capacity_factor scales the whole bound
        # for strongly clustered data. Overflowing particles are silently
        # dropped from buckets — pass `capacity` explicitly if clustering is
        # extreme.
        mean_occ = N / n_cells
        capacity = max(4, int(np.ceil(capacity_factor * 0.5 * (mean_occ + 5 * np.sqrt(mean_occ) + 8))))

    # --- bin particles ---
    rel = (positions - lower) / cell_size
    coords = jnp.clip(jnp.floor(rel).astype(jnp.int32), 0, jnp.asarray(nc - 1, jnp.int32))
    strides = np.concatenate([np.cumprod(nc[::-1])[::-1][1:], [1]]).astype(np.int32)
    cell_id = jnp.sum(coords * strides, axis=-1)

    # --- fixed-capacity buckets via sort + rank-in-cell scatter ---
    order = jnp.argsort(cell_id)
    sorted_cells = cell_id[order]
    counts = jnp.zeros(n_cells, jnp.int32).at[cell_id].add(1)
    starts = jnp.cumsum(counts) - counts
    rank = jnp.arange(N, dtype=jnp.int32) - starts[sorted_cells]
    valid_slot = rank < capacity
    flat_slot = sorted_cells * capacity + jnp.minimum(rank, capacity - 1)
    buckets = jnp.full(n_cells * capacity, -1, jnp.int32)
    # overflow slots target an out-of-bounds index → dropped by mode='drop'
    buckets = buckets.at[jnp.where(valid_slot, flat_slot, n_cells * capacity)].set(
        order.astype(jnp.int32), mode='drop')
    buckets = buckets.reshape(n_cells, capacity)

    # --- candidate gather: 3^d surrounding cells ---
    offsets = np.array(list(itertools.product(*[(-1, 0, 1)] * d)), np.int32)  # (3^d, d)
    cand_parts = []
    cand_valid_parts = []
    for off in offsets:
        nb = coords + jnp.asarray(off, jnp.int32)
        if periodic:
            nb = nb % jnp.asarray(nc, jnp.int32)
            in_range = jnp.ones(N, bool)
        else:
            in_range = jnp.all((nb >= 0) & (nb < jnp.asarray(nc, jnp.int32)), axis=-1)
            nb = jnp.clip(nb, 0, jnp.asarray(nc - 1, jnp.int32))
        nb_id = jnp.sum(nb * strides, axis=-1)
        cand = buckets[nb_id]                              # (N, capacity)
        cand_parts.append(jnp.where(in_range[:, None], cand, -1))
        cand_valid_parts.append(in_range)
    indices = jnp.concatenate(cand_parts, axis=1)          # (N, 3^d·capacity)

    # --- deltas + mask ---
    safe_idx = jnp.maximum(indices, 0)
    deltas = positions[safe_idx] - positions[:, None, :]
    if periodic:
        size_j = jnp.asarray(size, positions.dtype)
        deltas = jnp.mod(deltas + size_j / 2, size_j) - size_j / 2
    dist2 = jnp.sum(deltas ** 2, axis=-1)
    own = indices == jnp.arange(N, dtype=jnp.int32)[:, None]
    mask = (indices >= 0) & ~own & (dist2 < np.float32(cutoff) ** 2)
    return indices, deltas, mask
