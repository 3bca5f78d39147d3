"""Fused stencil kernels (Pallas TPU).

The pressure-CG matvec (grad → mask → div ≡ masked 5/7-point laplacian) is the
hot loop of `make_incompressible` (SURVEY.md §3.1). This module provides a fused
VMEM-tiled Laplacian with halo-aware BlockSpecs and a custom VJP, plus the
pure-XLA reference used for testing and as the CPU fallback.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_AVAILABLE = True
except ImportError:  # pragma: no cover
    _PALLAS_AVAILABLE = False

__all__ = ['laplacian_2d', 'laplacian_2d_xla', 'use_pallas']


def use_pallas() -> bool:
    """Whether to dispatch to Pallas kernels (TPU backend present)."""
    try:
        return _PALLAS_AVAILABLE and jax.default_backend() not in ('cpu',)
    except Exception:
        return False


def laplacian_2d_xla(x: jnp.ndarray, dx2: float = 1.0, periodic: bool = True) -> jnp.ndarray:
    """Reference 5-point Laplacian (XLA ops)."""
    if periodic:
        up = jnp.roll(x, -1, 0)
        down = jnp.roll(x, 1, 0)
        left = jnp.roll(x, 1, 1)
        right = jnp.roll(x, -1, 1)
    else:
        up = jnp.pad(x, ((0, 1), (0, 0)), mode='edge')[1:, :]
        down = jnp.pad(x, ((1, 0), (0, 0)), mode='edge')[:-1, :]
        left = jnp.pad(x, ((0, 0), (1, 0)), mode='edge')[:, :-1]
        right = jnp.pad(x, ((0, 0), (0, 1)), mode='edge')[:, 1:]
    return (up + down + left + right - 4 * x) / dx2


def _lap2d_kernel(x_ref, out_ref, *, dx2: float):
    """Per-tile 5-point stencil. The input block includes a 1-cell halo on the
    row axis (overlapping BlockSpec); columns are kept whole per tile row so the
    lane dimension stays 128-aligned."""
    x = x_ref[:]  # (TILE+2, N)
    center = x[1:-1, :]
    up = x[2:, :]
    down = x[:-2, :]
    left = jnp.concatenate([x[1:-1, :1], x[1:-1, :-1]], axis=1)
    right = jnp.concatenate([x[1:-1, 1:], x[1:-1, -1:]], axis=1)
    out_ref[:] = (up + down + left + right - 4 * center) / dx2


def _laplacian_2d_pallas(x: jnp.ndarray, dx2: float, periodic: bool) -> jnp.ndarray:
    """Pallas path: pad once in HBM (wrap/edge), then tile rows with halo overlap.

    Columns are handled inside the kernel via shifted slices of the padded
    block, so each grid step reads a (TILE+2, N+2) VMEM block and writes
    (TILE, N) — a single HBM round-trip per tile.
    """
    m, n = x.shape
    mode = 'wrap' if periodic else 'edge'
    xp = jnp.pad(x, ((1, 1), (1, 1)), mode=mode)  # (m+2, n+2)
    TILE = min(256, m)
    while m % TILE:
        TILE //= 2
    TILE = max(TILE, 1)
    grid = (m // TILE,)

    def kernel(xp_ref, out_ref):
        # input stays whole in VMEM; overlapping (halo) row windows are sliced
        # in-kernel (BlockSpec index_map counts in block units, so overlapping
        # windows cannot be expressed as a blocked spec)
        i = pl.program_id(0)
        blk = xp_ref[pl.ds(i * TILE, TILE + 2), :]  # (TILE+2, n+2)
        center = blk[1:-1, 1:-1]
        up = blk[2:, 1:-1]
        down = blk[:-2, 1:-1]
        left = blk[1:-1, :-2]
        right = blk[1:-1, 2:]
        out_ref[:] = (up + down + left + right - 4 * center) / dx2

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY if hasattr(pltpu, 'ANY') else pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(xp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def laplacian_2d(x: jnp.ndarray, dx2: float = 1.0, periodic: bool = True) -> jnp.ndarray:
    """Fused 5-point Laplacian: Pallas on TPU, XLA elsewhere. Differentiable
    (the Laplacian is self-adjoint for periodic BCs; edge-replicate adjoint is
    handled by the XLA fallback in backward)."""
    if use_pallas():
        return _laplacian_2d_pallas(x, dx2, periodic)
    return laplacian_2d_xla(x, dx2, periodic)


def _lap_fwd(x, dx2, periodic):
    return laplacian_2d(x, dx2, periodic), None


def _lap_bwd(dx2, periodic, _, g):
    if periodic:
        # self-adjoint
        return (laplacian_2d(g, dx2, periodic),)
    # adjoint of edge-replicate laplacian via transpose of the XLA computation
    _, vjp = jax.vjp(lambda y: laplacian_2d_xla(y, dx2, periodic), jnp.zeros_like(g))
    return vjp(g)


laplacian_2d.defvjp(_lap_fwd, _lap_bwd)
