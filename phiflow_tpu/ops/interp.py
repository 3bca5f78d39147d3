"""Pallas TPU kernel: bounded window-shift interpolation (advection backtrace).

The XLA fori_loop formulation (math._nd.shift_window_interp) re-reads the padded
grid from HBM for every one of the (2K+2)^d integer shifts. This kernel loads
each x-tile (plus halo) into VMEM **once** and runs the entire window sum
on-chip: HBM traffic drops from ~(2K+2)^d·N to ~4·N — the speed-of-light layout
for this op (VPU-bound inner loop, all window slices static).

Interface (3D, float32):
    out = window_interp_3d(padded, rel3, frac3, K)
      padded: (X+2C, Y+2C, Z+2C) with C=K+1, pre-padded with the BC
      rel3:   (3, X, Y, Z) int32  — clipped floor displacement per axis
      frac3:  (3, X, Y, Z) f32    — fractional displacement per axis
      out:    (X, Y, Z)
With compute_extrema=True also returns the 2^d-corner min/max (MacCormack clamp).
A 2D variant handles (X, Y) grids. Interpret mode is used on CPU for testing.
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
try:
    from jax.experimental.pallas import tpu as pltpu
    _TPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _TPU = False

__all__ = ['window_interp_3d', 'window_interp_2d', 'pallas_available']


def pallas_available() -> bool:
    try:
        return _TPU and jax.default_backend() not in ('cpu',)
    except Exception:
        return False


def _pick_tile(x: int, vmem_budget_elems: int, slab_elems_per_row: int, c2: int) -> int:
    tile = max(1, min(x, vmem_budget_elems // max(slab_elems_per_row, 1) - c2))
    while x % tile:
        tile -= 1
    return max(tile, 1)


def window_interp_3d(padded: jnp.ndarray, rel3: jnp.ndarray, frac3: jnp.ndarray, K: int,
                     compute_extrema: bool = False, interpret: bool = False):
    C = K + 1
    W = 2 * K + 2
    X = rel3.shape[1]
    Y = rel3.shape[2]
    Z = rel3.shape[3]
    Yp, Zp = Y + 2 * C, Z + 2 * C
    # VMEM budget: slab (TILE+2C)·Yp·Zp + 6 aux TILE·Y·Z + acc(s)
    budget = (10 * 1024 * 1024) // 4  # 10 MB of f32 elements
    per_row = Yp * Zp + 6 * Y * Z + (3 if compute_extrema else 1) * Y * Z
    TILE = _pick_tile(X, budget, per_row, 2 * C)
    grid = (X // TILE,)
    big = np.float32(3.4e38)

    def kernel(padded_ref, rel_ref, frac_ref, *out_refs):
        if _TPU and not interpret:
            def body(slab, sem):
                cp = pltpu.make_async_copy(padded_ref.at[pl.ds(pl.program_id(0) * TILE, TILE + 2 * C)], slab, sem)
                cp.start()
                cp.wait()
                _compute(slab[:], rel_ref, frac_ref, out_refs)
            pl.run_scoped(body, slab=pltpu.VMEM((TILE + 2 * C, Yp, Zp), jnp.float32),
                          sem=pltpu.SemaphoreType.DMA)
        else:
            slab = padded_ref[pl.ds(pl.program_id(0) * TILE, TILE + 2 * C), :, :]
            _compute(slab, rel_ref, frac_ref, out_refs)

    def _compute(slab, rel_ref, frac_ref, out_refs):
        relx = rel_ref[0]
        rely = rel_ref[1]
        relz = rel_ref[2]
        fracx = frac_ref[0]
        fracy = frac_ref[1]
        fracz = frac_ref[2]
        acc = jnp.zeros((TILE, Y, Z), jnp.float32)
        if compute_extrema:
            lo_acc = jnp.full((TILE, Y, Z), big, jnp.float32)
            up_acc = jnp.full((TILE, Y, Z), -big, jnp.float32)
        for sx in range(-K, K + 2):
            wx = jnp.where(relx == sx, 1.0 - fracx, jnp.where(relx == sx - 1, fracx, 0.0))
            cx = (relx == sx) | (relx == sx - 1)
            for sy in range(-K, K + 2):
                wy = jnp.where(rely == sy, 1.0 - fracy, jnp.where(rely == sy - 1, fracy, 0.0))
                wxy = wx * wy
                cxy = cx & ((rely == sy) | (rely == sy - 1))
                for sz in range(-K, K + 2):
                    window = slab[C + sx:C + sx + TILE, C + sy:C + sy + Y, C + sz:C + sz + Z]
                    wz = jnp.where(relz == sz, 1.0 - fracz, jnp.where(relz == sz - 1, fracz, 0.0))
                    acc = acc + window * (wxy * wz)
                    if compute_extrema:
                        cm = cxy & ((relz == sz) | (relz == sz - 1))
                        lo_acc = jnp.minimum(lo_acc, jnp.where(cm, window, big))
                        up_acc = jnp.maximum(up_acc, jnp.where(cm, window, -big))
        out_refs[0][:] = acc
        if compute_extrema:
            out_refs[1][:] = lo_acc
            out_refs[2][:] = up_acc

    aux_spec = pl.BlockSpec((3, TILE, Y, Z), lambda i: (0, i, 0, 0),
                            **({'memory_space': pltpu.VMEM} if _TPU and not interpret else {}))
    out_spec = pl.BlockSpec((TILE, Y, Z), lambda i: (i, 0, 0),
                            **({'memory_space': pltpu.VMEM} if _TPU and not interpret else {}))
    hbm_space = {'memory_space': pltpu.ANY} if _TPU and not interpret else {}
    n_out = 3 if compute_extrema else 1
    out_shapes = tuple(jax.ShapeDtypeStruct((X, Y, Z), jnp.float32) for _ in range(n_out))
    result = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(**hbm_space), aux_spec, aux_spec],
        out_specs=tuple(out_spec for _ in range(n_out)) if n_out > 1 else out_spec,
        out_shape=out_shapes if n_out > 1 else out_shapes[0],
        interpret=interpret,
    )(padded, rel3, frac3)
    return result


def window_interp_2d(padded: jnp.ndarray, rel2: jnp.ndarray, frac2: jnp.ndarray, K: int,
                     compute_extrema: bool = False, interpret: bool = False):
    C = K + 1
    X = rel2.shape[1]
    Y = rel2.shape[2]
    Yp = Y + 2 * C
    budget = (10 * 1024 * 1024) // 4
    per_row = Yp + 4 * Y + (3 if compute_extrema else 1) * Y
    TILE = _pick_tile(X, budget, per_row, 2 * C)
    grid = (X // TILE,)
    big = np.float32(3.4e38)

    def kernel(padded_ref, rel_ref, frac_ref, *out_refs):
        slab = padded_ref[pl.ds(pl.program_id(0) * TILE, TILE + 2 * C), :]
        relx, rely = rel_ref[0], rel_ref[1]
        fracx, fracy = frac_ref[0], frac_ref[1]
        acc = jnp.zeros((TILE, Y), jnp.float32)
        if compute_extrema:
            lo_acc = jnp.full((TILE, Y), big, jnp.float32)
            up_acc = jnp.full((TILE, Y), -big, jnp.float32)
        for sx in range(-K, K + 2):
            wx = jnp.where(relx == sx, 1.0 - fracx, jnp.where(relx == sx - 1, fracx, 0.0))
            cx = (relx == sx) | (relx == sx - 1)
            for sy in range(-K, K + 2):
                window = slab[C + sx:C + sx + TILE, C + sy:C + sy + Y]
                wy = jnp.where(rely == sy, 1.0 - fracy, jnp.where(rely == sy - 1, fracy, 0.0))
                acc = acc + window * (wx * wy)
                if compute_extrema:
                    cm = cx & ((rely == sy) | (rely == sy - 1))
                    lo_acc = jnp.minimum(lo_acc, jnp.where(cm, window, big))
                    up_acc = jnp.maximum(up_acc, jnp.where(cm, window, -big))
        out_refs[0][:] = acc
        if compute_extrema:
            out_refs[1][:] = lo_acc
            out_refs[2][:] = up_acc

    aux_spec = pl.BlockSpec((2, TILE, Y), lambda i: (0, i, 0))
    out_spec = pl.BlockSpec((TILE, Y), lambda i: (i, 0))
    n_out = 3 if compute_extrema else 1
    out_shapes = tuple(jax.ShapeDtypeStruct((X, Y), jnp.float32) for _ in range(n_out))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(), aux_spec, aux_spec],
        out_specs=tuple(out_spec for _ in range(n_out)) if n_out > 1 else out_spec,
        out_shape=out_shapes if n_out > 1 else out_shapes[0],
        interpret=interpret,
    )(padded, rel2, frac2)
