"""Pallas TPU kernel: bounded window-shift interpolation (advection backtrace).

The XLA fori_loop formulation (math._nd.shift_window_interp) re-reads the padded
grid from HBM for every one of the (2K+2)^d integer shifts. This kernel loads
each x-tile (plus halo) into VMEM **once** and runs the entire window sum
on-chip: HBM traffic drops from ~(2K+2)^d·N to ~4·N — the speed-of-light layout
for this op (VPU-bound inner loop).

Mosaic tiling: vector slices must be (8, 128)-aligned in the last two dims, so
in-kernel window shifts along the sublane (y) and lane (z) axes are expressed as
`pltpu.roll` (supported lane/sublane rotates) followed by FIXED aligned slices;
only the untiled leading (x) axis is sliced directly. The grid is staged into an
aligned slab with y-halo at row 8 and z-halo at lane 128.

Dispatch requirements (else the XLA fori_loop fallback runs):
  3D: Y % 8 == 0 and Z % 128 == 0 (e.g. 128³, 256³)
  2D: X % 8 == 0 and Y % 128 == 0
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

__all__ = ['window_interp_3d', 'window_interp_2d', 'pallas_available', 'supported_3d', 'supported_2d']

_Y_HALO = 8     # sublane-aligned halo offset
_Z_HALO = 128   # lane-aligned halo offset


def pallas_available() -> bool:
    try:
        return _TPU and jax.default_backend() not in ('cpu',)
    except Exception:
        return False


def supported_3d(X: int, Y: int, Z: int, K: int) -> bool:
    return K + 1 <= _Y_HALO and X >= 8 and Y >= 8 and Z >= 64


def supported_2d(X: int, Y: int, K: int) -> bool:
    return K + 1 <= _Y_HALO and X >= 8 and Y >= 64


def _make_roll(interpret: bool):
    if _TPU and not interpret:
        def roll(x, shift, axis):
            size = x.shape[axis]
            return pltpu.roll(x, shift % size, axis)  # pltpu.roll requires shift ≥ 0
        return roll
    return lambda x, shift, axis: jnp.roll(x, shift, axis)


def _stage_aligned_3d(padded: jnp.ndarray, C: int, Y: int, Z: int) -> jnp.ndarray:
    """Embed the C-halo padded array into an (x-unchanged, y@8, z@128) aligned slab."""
    Xp = padded.shape[0]
    Ys = _Y_HALO + Y + _Y_HALO
    Zs = _Z_HALO + Z + _Z_HALO
    Ys = ((Ys + 7) // 8) * 8
    Zs = ((Zs + 127) // 128) * 128
    slab = jnp.zeros((Xp, Ys, Zs), padded.dtype)
    return jax.lax.dynamic_update_slice(slab, padded, (0, _Y_HALO - C, _Z_HALO - C))


def window_interp_3d(padded: jnp.ndarray, rel3: jnp.ndarray, frac3: jnp.ndarray, K: int,
                     compute_extrema: bool = False, interpret: bool = False):
    """See module docstring. padded: (X+2C, Y+2C, Z+2C); rel3/frac3: (3, X, Y, Z).
    Arbitrary Y/Z sizes: inputs are zero-padded to (8,128)-aligned shapes and the
    outputs cropped (zero rel/frac in the pad region reads slab zeros — harmless)."""
    C = K + 1
    X, Y0, Z0 = rel3.shape[1], rel3.shape[2], rel3.shape[3]
    Y = ((Y0 + 7) // 8) * 8
    Z = ((Z0 + 127) // 128) * 128
    if (Y, Z) != (Y0, Z0):
        rel3 = jnp.pad(rel3, ((0, 0), (0, 0), (0, Y - Y0), (0, Z - Z0)))
        frac3 = jnp.pad(frac3, ((0, 0), (0, 0), (0, Y - Y0), (0, Z - Z0)))
        padded = jnp.pad(padded, ((0, 0), (0, Y - Y0), (0, Z - Z0)))
    slab_full = _stage_aligned_3d(padded, C, Y, Z)
    Ys, Zs = slab_full.shape[1], slab_full.shape[2]
    # VMEM budget (f32 elements)
    budget = (5 * 1024 * 1024) // 4  # leave headroom for Mosaic roll temporaries (16MB scoped VMEM)
    per_row = Ys * Zs + (6 + (3 if compute_extrema else 1)) * Y * Z
    TILE = max(1, min(X, budget // per_row - 2 * C))
    while X % TILE:
        TILE -= 1
    grid = (X // TILE,)
    big = np.float32(3.4e38)

    _roll = _make_roll(interpret)
    W = 2 * K + 2

    def compute(slab, rel_ref, frac_ref, out_refs):
        relx, rely, relz = rel_ref[0], rel_ref[1], rel_ref[2]
        fracx, fracy, fracz = frac_ref[0], frac_ref[1], frac_ref[2]
        acc0 = jnp.zeros((TILE, Y, Z), jnp.float32)
        lo0 = jnp.full((TILE, Y, Z), big, jnp.float32)
        up0 = jnp.full((TILE, Y, Z), -big, jnp.float32)

        # fori_loop over all (2K+2)^d shifts: ONE body → Mosaic reuses the roll
        # temporaries instead of stacking 216 live buffers (VMEM-bound otherwise)
        def body(k, carry):
            acc, lo_acc, up_acc = carry
            sz = k % W - K
            sy = (k // W) % W - K
            sx = (k // (W * W)) - K
            x_slab = slab[pl.ds(C + sx, TILE), :, :]  # ref load with dynamic start (leading axis)
            rolled = _roll(_roll(x_slab, -sy, 1), -sz, 2)
            window = rolled[:, _Y_HALO:_Y_HALO + Y, _Z_HALO:_Z_HALO + Z]
            wx = jnp.where(relx == sx, 1.0 - fracx, jnp.where(relx == sx - 1, fracx, 0.0))
            wy = jnp.where(rely == sy, 1.0 - fracy, jnp.where(rely == sy - 1, fracy, 0.0))
            wz = jnp.where(relz == sz, 1.0 - fracz, jnp.where(relz == sz - 1, fracz, 0.0))
            acc = acc + window * (wx * wy * wz)
            if compute_extrema:
                cm = ((relx == sx) | (relx == sx - 1)) & ((rely == sy) | (rely == sy - 1)) \
                    & ((relz == sz) | (relz == sz - 1))
                lo_acc = jnp.minimum(lo_acc, jnp.where(cm, window, big))
                up_acc = jnp.maximum(up_acc, jnp.where(cm, window, -big))
            return acc, lo_acc, up_acc

        acc, lo_acc, up_acc = jax.lax.fori_loop(0, W ** 3, body, (acc0, lo0, up0))
        out_refs[0][:] = acc
        if compute_extrema:
            out_refs[1][:] = lo_acc
            out_refs[2][:] = up_acc

    if _TPU and not interpret:
        def kernel(slab_hbm, rel_ref, frac_ref, *out_refs):
            def body(slab_vmem, sem):
                cp = pltpu.make_async_copy(
                    slab_hbm.at[pl.ds(pl.program_id(0) * TILE, TILE + 2 * C)], slab_vmem, sem)
                cp.start()
                cp.wait()
                compute(slab_vmem, rel_ref, frac_ref, out_refs)
            pl.run_scoped(body, slab_vmem=pltpu.VMEM((TILE + 2 * C, Ys, Zs), jnp.float32),
                          sem=pltpu.SemaphoreType.DMA)
        in0_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        aux_spec = pl.BlockSpec((3, TILE, Y, Z), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((TILE, Y, Z), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    else:
        def kernel(slab_hbm, rel_ref, frac_ref, *out_refs):
            compute(slab_hbm.at[pl.ds(pl.program_id(0) * TILE, TILE + 2 * C)], rel_ref, frac_ref, out_refs)
        in0_spec = pl.BlockSpec()
        aux_spec = pl.BlockSpec((3, TILE, Y, Z), lambda i: (0, i, 0, 0))
        out_spec = pl.BlockSpec((TILE, Y, Z), lambda i: (i, 0, 0))

    n_out = 3 if compute_extrema else 1
    out_shapes = tuple(jax.ShapeDtypeStruct((X, Y, Z), jnp.float32) for _ in range(n_out))
    result = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in0_spec, aux_spec, aux_spec],
        out_specs=tuple(out_spec for _ in range(n_out)) if n_out > 1 else out_spec,
        out_shape=out_shapes if n_out > 1 else out_shapes[0],
        interpret=interpret,
    )(slab_full, rel3, frac3)
    if (Y, Z) != (Y0, Z0):
        crop = lambda a: a[:, :Y0, :Z0]
        result = tuple(crop(r) for r in result) if n_out > 1 else crop(result)
    return result


def window_interp_2d(padded: jnp.ndarray, rel2: jnp.ndarray, frac2: jnp.ndarray, K: int,
                     compute_extrema: bool = False, interpret: bool = False):
    """2D variant: both axes shifted via roll (x = sublane @8, y = lane @128)."""
    C = K + 1
    X0, Y0 = rel2.shape[1], rel2.shape[2]
    X = ((X0 + 7) // 8) * 8
    Y = ((Y0 + 127) // 128) * 128
    if (X, Y) != (X0, Y0):
        rel2 = jnp.pad(rel2, ((0, 0), (0, X - X0), (0, Y - Y0)))
        frac2 = jnp.pad(frac2, ((0, 0), (0, X - X0), (0, Y - Y0)))
        padded = jnp.pad(padded, ((0, X - X0), (0, Y - Y0)))
    Xs = ((_Y_HALO + X + _Y_HALO + 7) // 8) * 8
    Ys = ((_Z_HALO + Y + _Z_HALO + 127) // 128) * 128
    slab = jnp.zeros((Xs, Ys), padded.dtype)
    slab = jax.lax.dynamic_update_slice(slab, padded, (_Y_HALO - C, _Z_HALO - C))
    big = np.float32(3.4e38)

    _roll = _make_roll(interpret)

    W = 2 * K + 2

    def kernel(slab_ref, rel_ref, frac_ref, *out_refs):
        s_full = slab_ref[:]
        relx, rely = rel_ref[0], rel_ref[1]
        fracx, fracy = frac_ref[0], frac_ref[1]
        acc0 = jnp.zeros((X, Y), jnp.float32)
        lo0 = jnp.full((X, Y), big, jnp.float32)
        up0 = jnp.full((X, Y), -big, jnp.float32)

        def body(k, carry):
            acc, lo_acc, up_acc = carry
            sy = k % W - K
            sx = (k // W) - K
            rolled = _roll(_roll(s_full, -sx, 0), -sy, 1)
            window = rolled[_Y_HALO:_Y_HALO + X, _Z_HALO:_Z_HALO + Y]
            wx = jnp.where(relx == sx, 1.0 - fracx, jnp.where(relx == sx - 1, fracx, 0.0))
            wy = jnp.where(rely == sy, 1.0 - fracy, jnp.where(rely == sy - 1, fracy, 0.0))
            acc = acc + window * (wx * wy)
            if compute_extrema:
                cm = ((relx == sx) | (relx == sx - 1)) & ((rely == sy) | (rely == sy - 1))
                lo_acc = jnp.minimum(lo_acc, jnp.where(cm, window, big))
                up_acc = jnp.maximum(up_acc, jnp.where(cm, window, -big))
            return acc, lo_acc, up_acc

        acc, lo_acc, up_acc = jax.lax.fori_loop(0, W * W, body, (acc0, lo0, up0))
        out_refs[0][:] = acc
        if compute_extrema:
            out_refs[1][:] = lo_acc
            out_refs[2][:] = up_acc

    n_out = 3 if compute_extrema else 1
    out_shapes = tuple(jax.ShapeDtypeStruct((X, Y), jnp.float32) for _ in range(n_out))
    kwargs = {'memory_space': pltpu.VMEM} if _TPU and not interpret else {}
    result = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(**kwargs), pl.BlockSpec(**kwargs), pl.BlockSpec(**kwargs)],
        out_specs=tuple(pl.BlockSpec(**kwargs) for _ in range(n_out)) if n_out > 1 else pl.BlockSpec(**kwargs),
        out_shape=out_shapes if n_out > 1 else out_shapes[0],
        interpret=interpret,
    )(slab, rel2, frac2)
    if (X, Y) != (X0, Y0):
        crop = lambda a: a[:X0, :Y0]
        result = tuple(crop(r) for r in result) if n_out > 1 else crop(result)
    return result
