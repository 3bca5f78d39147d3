"""Pallas TPU kernel: bounded window-shift interpolation (advection backtrace).

The XLA fori_loop formulation (math._nd.shift_window_interp) re-reads the padded
grid from HBM for every one of the (2K+2)^d integer shifts. This kernel loads
each x-tile (plus halo) into VMEM **once** and runs the entire window sum
on-chip: HBM traffic drops from ~(2K+2)^d·N to ~3·N — the speed-of-light layout
for this op (VPU-bound inner loop).

Mosaic notes:
 * Vector slices must be (8, 128)-aligned in the last two dims, so in-kernel
   window shifts along the sublane (y) and lane (z) axes are `pltpu.roll`
   rotates followed by the FIXED slice [:Y], [:Z]; only the untiled leading (x)
   axis is sliced with a dynamic start.
 * Halos are staged **circularly**: pad to the aligned total, then rotate by −C
   so the interior starts at offset 0 and the left halo wraps to the end of the
   axis — rolls then bring it into window position. This keeps slabs minimal
   (ceil_align(N + 2C)) vs. a both-sides-aligned layout, cutting roll cost and
   VMEM ~25-35% at 128³/256³.
 * Interpolation weights are the hat function w(s) = max(0, 1 − |δ − s|) —
   exact linear-interp weights straight from the raw displacement, so the
   kernel needs ONE aux plane per axis instead of separate floor/frac planes.
 * The (2K+1)^d-shift loop is an in-kernel fori_loop (one body → Mosaic reuses
   the roll temporaries; unrolled versions exhaust the 16MB scoped VMEM).

Inputs: padded grid (N+2C per axis, C=K) and disp (d, *N) float32 displacement
in cells; disp is clamped to [−K, K]: the symmetric width-(2K+1) window — one
column narrower than the naive [−K, K+1] formulation, since displacements at
exactly ±K give the outermost tap weight 1 and the (K+1)-tap weight 0.
"""
from __future__ import annotations

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


def _compiler_params():
    """Raise Mosaic's scoped-VMEM cap from the 16MB default to 32MB (v5e has
    128MB VMEM/core). The traffic model budgets ~13MB of live buffers, but when
    the kernel sits inside a scan/cond nest (auto-substeps) Mosaic charges extra
    stack to the while body and the real allocation lands at ~16.1MB — 1% over
    the DEFAULT limit, a compile-time OOM. Lifting the cap is strictly better
    than shrinking tiles: tile choice (and so perf + compile caching) stays
    identical, only headroom changes."""
    if pltpu is None:
        return None
    cp = getattr(pltpu, 'CompilerParams', None) or getattr(pltpu, 'TPUCompilerParams', None)
    return cp(vmem_limit_bytes=32 * 1024 * 1024) if cp is not None else None


def pallas_available() -> bool:
    try:
        return _TPU and jax.default_backend() not in ('cpu',)
    except Exception:
        return False


def supported_3d(X: int, Y: int, Z: int, K: int) -> bool:
    return X >= 8 and Y >= 8 and Z >= 64


def supported_2d(X: int, Y: int, K: int) -> bool:
    return X >= 8 and Y >= 64


def _make_roll(interpret: bool):
    if _TPU and not interpret:
        def roll(x, shift, axis):
            size = x.shape[axis]
            if isinstance(shift, int) and shift % size == 0:
                return x  # static zero shift: skip the rotate entirely
            return pltpu.roll(x, shift % size, axis)  # pltpu.roll requires shift ≥ 0
        return roll

    def roll_xla(x, shift, axis):
        if isinstance(shift, int) and shift % x.shape[axis] == 0:
            return x
        return jnp.roll(x, shift, axis)
    return roll_xla


def _stage_circular(padded: jnp.ndarray, C: int, aligns, lead_axes: int) -> jnp.ndarray:
    """Circular-halo slab: per trailing axis, layout [interior(N) | right halo(C) |
    0-gap | left halo(C)]. Built as pad-to-aligned-total + roll(−C), which places
    ALL 2^d halo corners correctly (they wrap with their axes)."""
    n_tr = len(aligns)
    pads = [(0, 0)] * lead_axes
    for ax, a in zip(range(lead_axes, padded.ndim), aligns):
        total = ((padded.shape[ax] + a - 1) // a) * a
        pads.append((0, total - padded.shape[ax]))
    slab = jnp.pad(padded, pads)
    for i in range(n_tr):
        slab = jnp.roll(slab, -C, lead_axes + i)
    return slab


_FORCE_TILES = None  # (TILE, YT) override for tools/bench_window.py
_Y_OFF = 8  # y-halo offset in the staged slab (8-aligned, >= C for K <= 7)


def window_interp_3d(padded: jnp.ndarray, disp3, K: int,
                     compute_extrema: bool = False, negate: bool = False,
                     const_pad=None, disp_scale=None, interpret: bool = False):
    """See module docstring. padded: (X+2C, Y+2C, Z+2C); disp3: (3, X, Y, Z)
    stacked OR a sequence of three (X, Y, Z) arrays — the sequence form feeds
    each axis as its own pallas operand, skipping the jnp.stack HBM pass.
    ``negate`` flips the displacement sign IN-KERNEL (MacCormack's forward
    pass = −backward displacement without materializing the negation).
    Arbitrary Y/Z sizes: aux/grid are zero-padded to (8,128)-aligned shapes and
    the outputs cropped (δ=0 in the pad region reads slab values — harmless).

    Tiling: 2D pallas grid over (x, y). x-tiles are sliced from the slab with a
    dynamic leading-axis start; y-tiles carry an explicit ±8 halo in the staged
    slab (sublane-aligned, so the post-roll window slice [8:8+YT] stays legal);
    z keeps the circular halo layout. y-tiling is what keeps the per-step VMEM
    footprint under the 16MB scoped limit at 512³ (full 512×512 planes + DMA
    double-buffering overflow it)."""
    C = K
    dxyz = [disp3[i] for i in range(3)]
    X, Y0, Z0 = dxyz[0].shape
    Y = ((Y0 + 7) // 8) * 8
    Z = ((Z0 + 127) // 128) * 128
    if const_pad is not None and (Y, Z) != (Y0, Z0):
        # alignment zero-pad would sit where the constant halo belongs —
        # pre-pad generically instead (rare: unaligned grids)
        padded = jnp.pad(padded, C, constant_values=const_pad)
        const_pad = None
    # displacement clamping to ±K happens IN-KERNEL on the VMEM-resident aux
    # planes — a jnp.clip here would cost a full extra HBM pass over (3,X,Y,Z)
    if (Y, Z) != (Y0, Z0):
        dxyz = [jnp.pad(d, ((0, 0), (0, Y - Y0), (0, Z - Z0))) for d in dxyz]
        padded = jnp.pad(padded, ((0, 0), (0, 0 if Y == Y0 else Y - Y0), (0, 0 if Z == Z0 else Z - Z0)))
    Ys = Y + 2 * _Y_OFF
    z_total = ((Z + 2 * C + 127) // 128) * 128
    Zs = z_total
    if const_pad is not None:
        # Constant halos (e.g. zero-velocity walls): `padded` is the RAW grid;
        # the whole slab — x halos, y offset region, z circular halos and gap —
        # is constant, so ONE jnp.pad builds it (vs pad→concat→pad, 3 passes)
        slab_full = jnp.pad(padded, ((C, C), (_Y_OFF, Ys - Y - _Y_OFF), (0, z_total - Z)),
                            constant_values=jnp.float32(const_pad))
    else:
        # stage: z circular (single concat = pad-to-aligned + rotate by −C
        # fused), y placed at fixed offset 8 via one asymmetric pad
        gap = z_total - (padded.shape[2] - C)  # zero gap between right and left halo
        zslab = jnp.concatenate([
            padded[:, :, C:],
            jnp.zeros(padded.shape[:2] + (gap - C,), padded.dtype),
            padded[:, :, :C]], axis=2)
        slab_full = jnp.pad(zslab, ((0, 0), (_Y_OFF - C, Ys - (padded.shape[1]) - (_Y_OFF - C)), (0, 0)))
    n_out = 3 if compute_extrema else 1
    # --- pick (TILE, YT) minimizing estimated on-chip traffic within VMEM ---
    # Halo overhead multiplies every roll by ((T+2C)(YT+2·OFF))/(T·YT): tiny
    # tiles waste most of the roll bandwidth on halos, so we search all legal
    # (T, YT) pairs with a traffic model instead of greedily growing one axis.
    budget = (13 * 1024 * 1024) // 4  # f32 elems, with margin for Mosaic spills
    W = 2 * K + 1

    def vmem_elems(tile, yt):
        slab_b = 2 * (tile + 2 * C) * (yt + 2 * _Y_OFF) * Zs  # double-buffered slab scratch
        io_b = 2 * (3 + n_out) * tile * yt * Z             # aux+out blocks, double-buffered
        carry_b = (n_out + 3) * tile * yt * Z              # acc/lo/up carries + x/y partials
        wts_b = 3 * W * (2 if compute_extrema else 1) * tile * yt * Z  # hoisted weight/mask planes
        roll_b = 3 * (tile + 2 * C) * (yt + 2 * _Y_OFF) * Zs  # slab value + roll temporaries
        return slab_b + io_b + carry_b + wts_b + roll_b

    def traffic(tile, yt):
        slab_b = (tile + 2 * C) * (yt + 2 * _Y_OFF) * Zs
        blk = tile * yt * Z
        per_tile = (W + W * W) * slab_b + (2 * W ** 3 + W * W + W) * blk
        return (X // tile) * (Y // yt) * per_tile

    TILE, YT = 1, 8
    best_cost = None
    for t in [t for t in range(1, X + 1) if X % t == 0]:
        for yt in [yt for yt in range(8, Y + 1, 8) if Y % yt == 0]:
            if vmem_elems(t, yt) > budget:
                continue
            c = traffic(t, yt)
            if best_cost is None or c < best_cost:
                best_cost, TILE, YT = c, t, yt
    if _FORCE_TILES is not None:  # benchmarking hook (tools/bench_window.py)
        TILE, YT = _FORCE_TILES
    grid = (X // TILE, Y // YT)
    big = np.float32(3.4e38)

    _roll = _make_roll(interpret)
    W = 2 * K + 1

    def compute(slab, disp_refs, out_refs):
        kf = float(K)
        sgn = -1.0 if negate else 1.0
        sc = disp_scale or (1.0, 1.0, 1.0)  # dt/dx folded in-register: identity
        # velocity components can then alias their arrays with NO scaling pass
        dx_ = jnp.clip((sgn * float(sc[0])) * disp_refs[0][:], -kf, kf)
        dy_ = jnp.clip((sgn * float(sc[1])) * disp_refs[1][:], -kf, kf)
        dz_ = jnp.clip((sgn * float(sc[2])) * disp_refs[2][:], -kf, kf)
        acc0 = jnp.zeros((TILE, YT, Z), jnp.float32)
        lo0 = jnp.full((TILE, YT, Z), big, jnp.float32)
        up0 = jnp.full((TILE, YT, Z), -big, jnp.float32)
        slab_v = slab[:]  # full (TILE+2C, YT+2·OFF, Zs) tile incl. halos

        # Per-axis weight planes are HOISTED: wx/wz/ (and the extrema masks)
        # depend only on their own tap index, so computing them inside the
        # (iy, iz) nest repeated the abs/max W²-fold — ~30% of the kernel's VPU
        # work at K=1. One plane per (axis, tap) now, reused by every iteration.
        wxs = [jnp.maximum(0., 1. - jnp.abs(dx_ - (ix - K))) for ix in range(W)]
        wys = [jnp.maximum(0., 1. - jnp.abs(dy_ - (iy - K))) for iy in range(W)]
        wzs = [jnp.maximum(0., 1. - jnp.abs(dz_ - (iz - K))) for iz in range(W)]
        if compute_extrema:
            xms = [jnp.abs(dx_ - (ix - K)) < 1. for ix in range(W)]
            yms = [jnp.abs(dy_ - (iy - K)) < 1. for iy in range(W)]
            zms = [jnp.abs(dz_ - (iz - K)) < 1. for iz in range(W)]

        # Loop nesting puts the expensive vector ROLLS on the outer axes and the
        # cheap leading-axis slices innermost. y is OUTER so the y-window slice
        # (OFF:OFF+YT) happens immediately after each of the W y-rolls — the W²
        # inner z-rolls then rotate the y-SLICED array (YT rows instead of
        # YT+2·OFF), cutting the dominant roll traffic by 2·OFF/(YT+2·OFF).
        # The W³ x-windows are static leading-axis slices — register-addressed,
        # no lane movement. STATIC zero shifts skip the rotate entirely.
        # out = Σ_sy wy · Σ_sz wz · Σ_sx wx · window   (hierarchical FMA)
        acc, lo_acc, up_acc = acc0, lo0, up0
        for iy in range(W):
            sy = iy - K
            ys = _roll(slab_v, -sy, 1)[:, _Y_OFF:_Y_OFF + YT, :]  # (TILE+2C, YT, Zs)
            z_acc = jnp.zeros((TILE, YT, Z), jnp.float32)
            for iz in range(W):
                sz = iz - K
                zy = _roll(ys, -sz, 2)[:, :, :Z]  # (TILE+2C, YT, Z)
                if compute_extrema:
                    yzm = yms[iy] & zms[iz]
                x_acc = jnp.zeros((TILE, YT, Z), jnp.float32)
                for ix in range(W):
                    sx = ix - K
                    window = zy[C + sx:C + sx + TILE]
                    x_acc = x_acc + window * wxs[ix]
                    if compute_extrema:
                        cm = yzm & xms[ix]
                        lo_acc = jnp.minimum(lo_acc, jnp.where(cm, window, big))
                        up_acc = jnp.maximum(up_acc, jnp.where(cm, window, -big))
                z_acc = z_acc + x_acc * wzs[iz]
            acc = acc + z_acc * wys[iy]
        out_refs[0][:] = acc
        if compute_extrema:
            out_refs[1][:] = lo_acc
            out_refs[2][:] = up_acc

    NY = Y // YT
    n_total = (X // TILE) * NY

    if _TPU and not interpret:
        def kernel(slab_hbm, dx_ref, dy_ref, dz_ref, *rest):
            out_refs = rest[:n_out]
            slabs, sems = rest[n_out], rest[n_out + 1]
            # Double-buffered slab pipeline: start tile g+1's DMA before
            # computing tile g, so the copy overlaps the window loop (the
            # blocked disp/out streams are auto-pipelined by Pallas already).
            g = pl.program_id(0) * NY + pl.program_id(1)

            def copy_for(step, slot):
                i = step // NY
                j = step - i * NY
                return pltpu.make_async_copy(
                    slab_hbm.at[pl.ds(i * TILE, TILE + 2 * C),
                                pl.ds(j * YT, YT + 2 * _Y_OFF)],
                    slabs.at[slot], sems.at[slot])

            @pl.when(g == 0)
            def _():
                copy_for(0, 0).start()

            @pl.when(g + 1 < n_total)
            def _():
                copy_for(g + 1, jax.lax.rem(g + 1, 2)).start()

            slot = jax.lax.rem(g, 2)
            copy_for(g, slot).wait()
            compute(slabs.at[slot], (dx_ref, dy_ref, dz_ref), out_refs)
        in0_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        aux_spec = pl.BlockSpec((TILE, YT, Z), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((TILE, YT, Z), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((2, TILE + 2 * C, YT + 2 * _Y_OFF, Zs), jnp.float32),
                   pltpu.SemaphoreType.DMA((2,))]
    else:
        def kernel(slab_hbm, dx_ref, dy_ref, dz_ref, *out_refs):
            compute(slab_hbm.at[pl.ds(pl.program_id(0) * TILE, TILE + 2 * C),
                                pl.ds(pl.program_id(1) * YT, YT + 2 * _Y_OFF)],
                    (dx_ref, dy_ref, dz_ref), out_refs)
        in0_spec = pl.BlockSpec()
        aux_spec = pl.BlockSpec((TILE, YT, Z), lambda i, j: (i, j, 0))
        out_spec = pl.BlockSpec((TILE, YT, Z), lambda i, j: (i, j, 0))
        scratch = []

    out_shapes = tuple(jax.ShapeDtypeStruct((X, Y, Z), jnp.float32) for _ in range(n_out))
    cp = _compiler_params() if _TPU and not interpret else None
    result = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in0_spec, aux_spec, aux_spec, aux_spec],
        out_specs=tuple(out_spec for _ in range(n_out)) if n_out > 1 else out_spec,
        out_shape=out_shapes if n_out > 1 else out_shapes[0],
        interpret=interpret,
        **({'scratch_shapes': scratch} if scratch else {}),
        **({'compiler_params': cp} if cp is not None else {}),
    )(slab_full, *(d.astype(jnp.float32) for d in dxyz))
    if (Y, Z) != (Y0, Z0):
        crop = lambda a: a[:, :Y0, :Z0]
        result = tuple(crop(r) for r in result) if n_out > 1 else crop(result)
    return result


def window_interp_2d(padded: jnp.ndarray, disp2, K: int,
                     compute_extrema: bool = False, negate: bool = False,
                     disp_scale=None, interpret: bool = False):
    """2D variant: both axes shifted via roll (x = sublane @8, y = lane @128).
    disp2: (2, X, Y) stacked or a sequence of two (X, Y) arrays."""
    C = K
    dxy = [disp2[i] for i in range(2)]
    X0, Y0 = dxy[0].shape
    X = ((X0 + 7) // 8) * 8
    Y = ((Y0 + 127) // 128) * 128
    if (X, Y) != (X0, Y0):
        dxy = [jnp.pad(d, ((0, X - X0), (0, Y - Y0))) for d in dxy]
        padded = jnp.pad(padded, ((0, X - X0), (0, Y - Y0)))
    slab = _stage_circular(padded, C, (8, 128), lead_axes=0)
    big = np.float32(3.4e38)

    _roll = _make_roll(interpret)

    W = 2 * K + 1

    def kernel(slab_ref, dx_ref, dy_ref, *out_refs):
        s_full = slab_ref[:]
        kf = float(K)
        sgn = -1.0 if negate else 1.0
        sc = disp_scale or (1.0, 1.0)
        dx_ = jnp.clip((sgn * float(sc[0])) * dx_ref[:], -kf, kf)  # in-kernel clamp + dt/dx scale
        dy_ = jnp.clip((sgn * float(sc[1])) * dy_ref[:], -kf, kf)
        acc0 = jnp.zeros((X, Y), jnp.float32)
        lo0 = jnp.full((X, Y), big, jnp.float32)
        up0 = jnp.full((X, Y), -big, jnp.float32)

        # hierarchical accumulation (see 3D kernel): x outer, y inner
        def x_body(ix, carry):
            acc, lo_acc, up_acc = carry
            sx = ix - K
            xs_roll = _roll(s_full, -sx, 0)
            ax = jnp.abs(dx_ - sx)
            wx = jnp.maximum(0., 1. - ax)
            axm = ax < 1.

            def y_body(iy, carry_y):
                accy, lo_y, up_y = carry_y
                sy = iy - K
                window = _roll(xs_roll, -sy, 1)[:X, :Y]
                ay = jnp.abs(dy_ - sy)
                accy = accy + window * jnp.maximum(0., 1. - ay)
                if compute_extrema:
                    cm = axm & (ay < 1.)
                    lo_y = jnp.minimum(lo_y, jnp.where(cm, window, big))
                    up_y = jnp.maximum(up_y, jnp.where(cm, window, -big))
                return accy, lo_y, up_y

            y_acc, lo_acc, up_acc = jax.lax.fori_loop(
                0, W, y_body, (jnp.zeros((X, Y), jnp.float32), lo_acc, up_acc))
            return acc + y_acc * wx, lo_acc, up_acc

        acc, lo_acc, up_acc = jax.lax.fori_loop(0, W, x_body, (acc0, lo0, up0))
        out_refs[0][:] = acc
        if compute_extrema:
            out_refs[1][:] = lo_acc
            out_refs[2][:] = up_acc

    n_out = 3 if compute_extrema else 1
    out_shapes = tuple(jax.ShapeDtypeStruct((X, Y), jnp.float32) for _ in range(n_out))
    kwargs = {'memory_space': pltpu.VMEM} if _TPU and not interpret else {}
    cp = _compiler_params() if _TPU and not interpret else None
    result = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(**kwargs), pl.BlockSpec(**kwargs), pl.BlockSpec(**kwargs)],
        out_specs=tuple(pl.BlockSpec(**kwargs) for _ in range(n_out)) if n_out > 1 else pl.BlockSpec(**kwargs),
        out_shape=out_shapes if n_out > 1 else out_shapes[0],
        interpret=interpret,
        **({'compiler_params': cp} if cp is not None else {}),
    )(slab, *(d.astype(jnp.float32) for d in dxy))
    if (X, Y) != (X0, Y0):
        crop = lambda a: a[:X0, :Y0]
        result = tuple(crop(r) for r in result) if n_out > 1 else crop(result)
    return result
