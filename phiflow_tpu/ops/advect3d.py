"""Fused 3D advection megakernel — semi-Lagrangian window interpolation with
IN-KERNEL displacement construction from the raw staggered velocity arrays.

Motivation (round-4 headline): the per-component advection path costs ~6
interpolation HBM passes (off-component `sample_grid_at_centers` to build
displacements), 4 slab stagings, and 4 separate window-kernel invocations per
step; at 512³ the smoke + velocity advection phases dominate the step. A MAC
staggered grid makes every displacement component a 2- or 4-point average of a
neighbor component — a couple of VMEM slices — so the displacements never need
to exist in HBM at all. This module stages each velocity component (and the
advected scalar) into a zero-halo slab ONCE, then runs pallas calls that DMA
all slabs tile-by-tile and produce every advected output:

  * the 3 staggered velocity components (self-advection), with the buoyancy
    source fused in as a blocked operand (reference: Smoke_Plume.ipynb's
    `advect + buoyancy_force`),
  * the MacCormack forward pass of the centered scalar with its 2^d-corner
    extrema planes, and the backward pass fused with the correct-and-clamp
    combine, the soft-sphere inflow source, and the buoyancy lift plane
    (reference: phi/physics/advect.py:182-215).

HBM traffic for BOTH advection phases drops to: stage 4-5 slabs + read the
slabs per call + write the outputs (≈ 35 full-field passes at 512³, vs ≈ 90+
for the separate formulation). The window loops are the same hierarchical
roll/slice FMA as ops/interp.py (see that module's Mosaic notes).

Geometry conventions (closed box, ZERO velocity extrapolation — the smoke
flagship; other boundary types fall back to the per-component path):
cells are indexed 0..N−1 per axis with centers at (i+½)·dx. Component d lives
on interior faces f = 1..N−1 of axis d (outer faces are dropped by the
constant BC and valid-outer-faces rule, value 0). Every array is embedded in a
common LOGICAL (N+1)³ face/cell grid: component d at logical own-axis index f,
cell axes at logical index = cell index. The slab for array e pads that
logical grid with C ≥ K zero halo rows in x, an 8-row y offset, and circular
zero fill in z (taps past either wall read exact zeros — the constant
extrapolation value). Centered scalars with non-constant boundaries are staged
from a pre-padded (extrapolation-applied) array instead.

Displacements at an output point of component d (logical ξ), in velocity
units, before the in-register dt/dx scaling:
  δ_d(ξ) = P_d[ξ]                                (own faces — alias)
  δ_e(ξ) = ¼ Σ_{a∈{−1,0}} Σ_{b∈{0,1}} P_e[ξ + a·ê_d + b·ê_e]   (e ≠ d)
and at a cell-centered output point:
  δ_e(ξ) = ½ (P_e[ξ] + P_e[ξ + ê_e])
which are exactly the MAC-grid linear resamplings the reference performs via
`sample` (phi/field/_resample.py:75,241).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

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

__all__ = ['stage_slab', 'stage_slab_padded', 'fused_advect_3d', 'OutSpec',
           'supported', 'pallas_ok', 'slab_dims']

_Y_OFF = 8  # y halo margin in the slab (≥ K+1 for K ≤ 7)


def pallas_ok() -> bool:
    try:
        return _TPU and jax.default_backend() not in ('cpu',)
    except Exception:
        return False


def supported(N: Sequence[int], K: int) -> bool:
    """Kernel applicability: 3D grids, window K ≤ 7, alignable sizes."""
    return len(N) == 3 and min(N) >= 8 and N[2] >= 64 and 1 <= K <= 7


def _align(n: int, a: int) -> int:
    return ((n + a - 1) // a) * a


def _compiler_params():
    if pltpu is None:
        return None
    cp = getattr(pltpu, 'CompilerParams', None) or getattr(pltpu, 'TPUCompilerParams', None)
    return cp(vmem_limit_bytes=64 * 1024 * 1024) if cp is not None else None


def slab_dims(N: Sequence[int], K: int) -> Tuple[int, int, int]:
    C = K
    Xs = N[0] + 2 + 2 * C       # logical N+1 rows + C halos + 1 spare fetch row
    Ys = _align(N[1] + 1 + 2 * _Y_OFF, 8)
    Zs = _align(N[2] + 1 + 2 * C, 128)  # 2C: room for a full left halo after the
    # right one even when N+1+C lands exactly on a lane-multiple (stage_slab_padded)
    return Xs, Ys, Zs


def stage_slab(arr: jnp.ndarray, own_axis: Optional[int], N: Sequence[int], K: int,
               const: float = 0.0) -> jnp.ndarray:
    """Embed a raw component / scalar array into its constant-halo slab.

    arr: component d raw array (own axis N−1 interior faces, cell axes N) or a
    centered scalar (N per axis). ONE jnp.pad — the whole halo region is the
    constant boundary value. Logical index ξ sits at slab position
    (C+ξ, _Y_OFF+ξ, ξ) per axis; raw index a maps to logical a+1 on the own
    axis, a on cell axes."""
    C = K
    dims = slab_dims(N, K)
    d = [1 if own_axis == ax else 0 for ax in range(3)]
    lo = (C + d[0], _Y_OFF + d[1], d[2])
    pads = [(lo[ax], dims[ax] - arr.shape[ax] - lo[ax]) for ax in range(3)]
    return jnp.pad(arr.astype(jnp.float32), pads, constant_values=np.float32(const))


def stage_slab_padded(padded: jnp.ndarray, N: Sequence[int], K: int) -> jnp.ndarray:
    """Stage a CENTERED scalar whose K-cell halos are already filled by its
    extrapolation (shape N+2K per axis): x halo lands at slab rows [C−K, …),
    y at [_Y_OFF−K, …); the z-lower halo wraps circularly to the end of the
    lane axis (negative logical z indices are reached by rolls)."""
    C = K
    Xs, Ys, Zs = slab_dims(N, K)
    zl = padded[:, :, :K]
    zr = padded[:, :, K:]
    gap = Zs - zr.shape[2] - K
    z_staged = jnp.concatenate(
        [zr, jnp.zeros(padded.shape[:2] + (gap,), padded.dtype), zl], axis=2)
    pads = [(C - K, Xs - padded.shape[0] - (C - K)),
            (_Y_OFF - K, Ys - padded.shape[1] - (_Y_OFF - K)),
            (0, 0)]
    return jnp.pad(z_staged.astype(jnp.float32), pads)


def stage_slab_periodic(arr: jnp.ndarray, own_axis: Optional[int], N: Sequence[int],
                        K: int) -> jnp.ndarray:
    """Stage a PERIODIC staggered component (own axis holds all N faces; the
    periodic valid-outer-faces rule keeps the lower face only) or a periodic
    centered scalar: halos wrap instead of holding a boundary constant.

    The logical convention is SHARED across all slabs (logical index = face
    index along the component's own axis, cell index elsewhere) — the kernel's
    cross-component displacement taps depend on it — so raw face a sits at
    logical a (NO own-axis shift; periodic face 0 is the kept lower face).
    Component outputs then come out at faces 1..N (row r = face r+1, since
    base_x = C+ds): the caller crops N rows and rolls +1 along the own axis to
    recover faces 0..N−1 (face N ≡ face 0). The wrap margin is (K, K+1) so
    logical N+K is covered, which the ds-shifted own-axis taps reach."""
    p = jnp.pad(arr.astype(jnp.float32), [(K, K + 1)] * 3, mode='wrap')
    return stage_slab_padded(p, N, K)


class OutSpec(NamedTuple):
    """One advected output of the fused call.

    slab:    index of the slab to window-interpolate.
    d_own:   staggered component axis (0/1/2) or None for a centered field.
    negate:  flip the displacement sign in-register (MacCormack backward pass).
    extrema: also emit the window min/max planes (MacCormack clamp).
    combine: optional (field_idx, lo_idx, up_idx, strength) indices into the
             BLOCKED extra operands — MacCormack combine: the window result w
             becomes clip(center + strength·0.5·(field − w), lo, up), where
             `center` is the advected slab's own center region (the forward
             result when this call advects the forward array).
    add_blocked: optional (extra_idx, scale) — val += scale·blocked operand
             (pre-computed buoyancy lift on the vertical faces).
    add_ball: optional (cx, cy, cz, radius, rate) — soft-sphere source term
             evaluated from iota cell-center coordinates in-register (the
             smoke inflow; matches resample(Sphere, soft=True) to one cell).
    emit_lift: optional (axis, scale) — emit an EXTRA output plane
             scale·½(val[k] + val[k+1]) along `axis`: the buoyancy lift of
             THIS output (the new smoke) at the axis' interior faces, indexed
             so lift[a] pairs with face a+1 of a staggered component.
    """
    slab: int
    d_own: Optional[int] = None
    negate: bool = False
    extrema: bool = False
    combine: Optional[Tuple[int, int, int, float]] = None
    add_blocked: Optional[Tuple[int, float]] = None
    add_ball: Optional[Tuple[float, float, float, float, float]] = None
    emit_lift: Optional[Tuple[int, float]] = None


def _n_planes(o: OutSpec) -> int:
    return 1 + (2 if o.extrema else 0) + (1 if o.emit_lift else 0)


def _make_roll(interpret: bool):
    if _TPU and not interpret:
        def roll(x, shift, axis):
            size = x.shape[axis]
            if isinstance(shift, int) and shift % size == 0:
                return x
            return pltpu.roll(x, shift % size, axis)
        return roll

    def roll_xla(x, shift, axis):
        if isinstance(shift, int) and shift % x.shape[axis] == 0:
            return x
        return jnp.roll(x, shift, axis)
    return roll_xla


def _pick_tiles(N, K, n_slabs, n_out_planes, budget_elems):
    """(TILE, YT) minimizing the slab-fetch traffic model under the VMEM budget
    (same approach as ops/interp.py, scaled for multiple slabs)."""
    X, Y, Z = N[0], _align(N[1], 8), _align(N[2], 128)
    _, _, Zs = slab_dims(N, K)
    C = K
    W = 2 * K + 1
    best, best_cost = (1, 8), None
    for t in [t for t in range(1, X + 1) if X % t == 0]:
        for yt in [yt for yt in range(8, Y + 1, 8) if Y % yt == 0]:
            slab_elems = (t + 2 * C + 1) * (yt + 2 * _Y_OFF) * Zs
            blk = t * yt * Z
            vmem = 2 * n_slabs * slab_elems \
                + 2 * n_out_planes * blk \
                + (n_out_planes + 6) * blk \
                + 3 * W * blk \
                + 3 * slab_elems  # roll temporaries
            if vmem > budget_elems:
                continue
            cost = (X // t) * (Y // yt) * (n_slabs * slab_elems + n_out_planes * blk)
            if best_cost is None or cost < best_cost:
                best, best_cost = (t, yt), cost
    return best


def fused_advect_3d(slabs: Sequence[jnp.ndarray], N: Sequence[int], K: int,
                    outs: Sequence[OutSpec], scales: Sequence[float],
                    blocked_extras: Sequence[jnp.ndarray] = (),
                    interpret: bool = False):
    """Run the fused advection call. slabs from `stage_slab` (indices 0..2 MUST
    be the x/y/z velocity component slabs — displacements are built from them;
    further slabs carry advected scalars); scales = dt/dx per axis converting
    velocity units to cells; blocked_extras: (X, alignY, alignZ)-shaped arrays
    streamed tile-by-tile (MacCormack combine operands, buoyancy lift).

    Returns a list with one entry per OutSpec: the advected array, a
    (value, lo, up) tuple when extrema is set, or (value, lift) when emit_lift
    is set. Outputs are on the PADDED (X, alignY, alignZ) grid; the caller
    crops (staggered component d: row a along the own axis is face a+1, so
    valid rows are 0..N_d−2)."""
    C = K
    W = 2 * K + 1
    X = N[0]
    Y = _align(N[1], 8)
    Z = _align(N[2], 128)
    Xs, Ys, Zs = slab_dims(N, K)
    n_slabs = len(slabs)
    n_out_planes = sum(_n_planes(o) for o in outs)
    budget = (26 * 1024 * 1024) // 4
    TILE, YT = _pick_tiles(N, K, n_slabs, n_out_planes, budget)
    grid = (X // TILE, Y // YT)
    NY = Y // YT
    n_total = grid[0] * grid[1]
    big = np.float32(3.4e38)
    _roll = _make_roll(interpret)
    scales = tuple(float(s) for s in scales)

    # ---- in-kernel helpers -------------------------------------------------
    def make_tap(cache):
        def tap(si, slab_t, off, base_x):
            """Value plane (TILE, YT, Z) of slab si at logical offset `off`
            from the output tile origin. Rolled/sliced intermediates are cached
            per (slab, oy, oz) so x-offset variants cost only a static slice."""
            ox, oy, oz = off
            key = (si, oy, oz)
            if key not in cache:
                a = _roll(slab_t, -oy, 1) if oy else slab_t
                a = a[:, _Y_OFF:_Y_OFF + YT, :]
                a = _roll(a, -oz, 2) if oz else a
                cache[key] = a[:, :, :Z]
            return cache[key][base_x + ox: base_x + ox + TILE]
        return tap

    def disp_planes(tap, slab_tiles, spec):
        """(δx, δy, δz) planes (TILE, YT, Z) in velocity units at the output
        points of `spec` (see module docstring)."""
        d = spec.d_own
        ds = [0, 0, 0]
        if d is not None:
            ds[d] = 1  # logical = output + 1 on the own axis
        base_x = C + ds[0]

        def ltap(e, rel):
            # rel is relative to the OUTPUT point ξ; ds[0] is folded into
            # base_x, but the y/z own-axis shifts must ride the tap offsets
            return tap(e, slab_tiles[e], (rel[0], rel[1] + ds[1], rel[2] + ds[2]), base_x)

        planes = []
        for e in range(3):
            if d is not None and e == d:
                planes.append(ltap(e, (0, 0, 0)))
            elif d is not None:
                acc = None
                for b in (0, 1):          # e-axis offset outer: shares the roll
                    for a in (-1, 0):     # d-axis offset
                        off = [0, 0, 0]
                        off[d] += a
                        off[e] += b
                        v = ltap(e, tuple(off))
                        acc = v if acc is None else acc + v
                planes.append(acc * np.float32(0.25))
            else:
                off = [0, 0, 0]
                off[e] = 1
                v0 = ltap(e, (0, 0, 0))
                v1 = ltap(e, tuple(off))
                planes.append((v0 + v1) * np.float32(0.5))
        return planes, ds, base_x

    def window_pass(slab_t, dxyz, ds, base_x, extrema):
        """Hierarchical W³ window FMA over slab_t with displacement planes dxyz
        (already scaled/clamped to cells). Mirrors ops/interp.py `compute`."""
        acc = jnp.zeros((TILE, YT, Z), jnp.float32)
        lo_acc = jnp.full((TILE, YT, Z), big, jnp.float32)
        up_acc = jnp.full((TILE, YT, Z), -big, jnp.float32)
        dx_, dy_, dz_ = dxyz
        wxs = [jnp.maximum(0., 1. - jnp.abs(dx_ - (ix - K))) for ix in range(W)]
        wys = [jnp.maximum(0., 1. - jnp.abs(dy_ - (iy - K))) for iy in range(W)]
        wzs = [jnp.maximum(0., 1. - jnp.abs(dz_ - (iz - K))) for iz in range(W)]
        if extrema:
            xms = [jnp.abs(dx_ - (ix - K)) < 1. for ix in range(W)]
            yms = [jnp.abs(dy_ - (iy - K)) < 1. for iy in range(W)]
            zms = [jnp.abs(dz_ - (iz - K)) < 1. for iz in range(W)]
        for iy in range(W):
            sy = iy - K + ds[1]
            ys = _roll(slab_t, -sy, 1)[:, _Y_OFF:_Y_OFF + YT, :]
            z_acc = jnp.zeros((TILE, YT, Z), jnp.float32)
            for iz in range(W):
                sz = iz - K + ds[2]
                zy = _roll(ys, -sz, 2)[:, :, :Z]
                if extrema:
                    yzm = yms[iy] & zms[iz]
                x_acc = jnp.zeros((TILE, YT, Z), jnp.float32)
                for ix in range(W):
                    sx = ix - K
                    window = zy[base_x + sx: base_x + sx + TILE]
                    x_acc = x_acc + window * wxs[ix]
                    if extrema:
                        cm = yzm & xms[ix]
                        lo_acc = jnp.minimum(lo_acc, jnp.where(cm, window, big))
                        up_acc = jnp.maximum(up_acc, jnp.where(cm, window, -big))
                z_acc = z_acc + x_acc * wzs[iz]
            acc = acc + z_acc * wys[iy]
        return (acc, lo_acc, up_acc) if extrema else (acc,)

    n_extra = len(blocked_extras)

    def compute(slab_tiles, extra_refs, out_refs, pid_x, pid_y):
        cache = {}
        tap = make_tap(cache)
        oi = 0
        for spec in outs:
            planes, ds, base_x = disp_planes(tap, slab_tiles, spec)
            sgn = -1.0 if spec.negate else 1.0
            kf = float(K)
            dxyz = [jnp.clip((sgn * np.float32(scales[e])) * planes[e], -kf, kf)
                    for e in range(3)]
            res = window_pass(slab_tiles[spec.slab], dxyz, ds, base_x, spec.extrema)
            val = res[0]
            if spec.combine is not None:
                f_idx, lo_idx, up_idx, strength = spec.combine
                center = tap(spec.slab, slab_tiles[spec.slab], (0, 0, 0), base_x)
                corrected = center + np.float32(0.5 * strength) * (extra_refs[f_idx][:] - val)
                val = jnp.clip(corrected, extra_refs[lo_idx][:], extra_refs[up_idx][:])
            if spec.add_blocked is not None:
                extra_idx, scale = spec.add_blocked
                val = val + np.float32(scale) * extra_refs[extra_idx][:]
            if spec.add_ball is not None:
                cx, cy, cz, radius, rate = spec.add_ball
                gx = (pid_x * TILE + jax.lax.broadcasted_iota(jnp.int32, (TILE, 1, 1), 0)
                      ).astype(jnp.float32) + 0.5
                gy = (pid_y * YT + jax.lax.broadcasted_iota(jnp.int32, (1, YT, 1), 1)
                      ).astype(jnp.float32) + 0.5
                gz = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Z), 2).astype(jnp.float32) + 0.5
                dist = jnp.sqrt((gx - np.float32(cx)) ** 2 + (gy - np.float32(cy)) ** 2
                                + (gz - np.float32(cz)) ** 2)
                frac = jnp.clip(0.5 + (np.float32(radius) - dist), 0., 1.)
                val = val + np.float32(rate) * frac
            out_refs[oi][:] = val
            oi += 1
            if spec.extrema:
                out_refs[oi][:] = res[1]
                out_refs[oi + 1][:] = res[2]
                oi += 2
            if spec.emit_lift is not None:
                axis, scale = spec.emit_lift
                nxt = _roll(val, -1, axis)
                out_refs[oi][:] = np.float32(0.5 * scale) * (val + nxt)
                oi += 1

    # ---- pallas plumbing ---------------------------------------------------
    if _TPU and not interpret:
        def kernel(*refs):
            slab_hbms = refs[:n_slabs]
            extra_refs = refs[n_slabs:n_slabs + n_extra]
            out_refs = refs[n_slabs + n_extra:n_slabs + n_extra + n_out_planes]
            slab_bufs = refs[-2]
            sems = refs[-1]
            g = pl.program_id(0) * NY + pl.program_id(1)

            def copy_for(step, slot, si):
                i = step // NY
                j = step - i * NY
                return pltpu.make_async_copy(
                    slab_hbms[si].at[pl.ds(i * TILE, TILE + 2 * C + 1),
                                     pl.ds(j * YT, YT + 2 * _Y_OFF)],
                    slab_bufs.at[slot, si], sems.at[slot, si])

            @pl.when(g == 0)
            def _():
                for si in range(n_slabs):
                    copy_for(0, 0, si).start()

            @pl.when(g + 1 < n_total)
            def _():
                for si in range(n_slabs):
                    copy_for(g + 1, jax.lax.rem(g + 1, 2), si).start()

            slot = jax.lax.rem(g, 2)
            tiles = []
            for si in range(n_slabs):
                copy_for(g, slot, si).wait()
                tiles.append(slab_bufs[slot, si])
            compute(tiles, extra_refs, out_refs, pl.program_id(0), pl.program_id(1))

        slab_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        blk_spec = pl.BlockSpec((TILE, YT, Z), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((2, n_slabs, TILE + 2 * C + 1, YT + 2 * _Y_OFF, Zs), jnp.float32),
                   pltpu.SemaphoreType.DMA((2, n_slabs))]
    else:
        def kernel(*refs):
            slab_hbms = refs[:n_slabs]
            extra_refs = refs[n_slabs:n_slabs + n_extra]
            out_refs = refs[n_slabs + n_extra:]
            i = pl.program_id(0)
            j = pl.program_id(1)
            tiles = [s[pl.ds(i * TILE, TILE + 2 * C + 1), pl.ds(j * YT, YT + 2 * _Y_OFF)]
                     for s in slab_hbms]
            compute(tiles, extra_refs, out_refs, i, j)

        slab_spec = pl.BlockSpec()
        blk_spec = pl.BlockSpec((TILE, YT, Z), lambda i, j: (i, j, 0))
        scratch = []

    out_shapes = tuple(jax.ShapeDtypeStruct((X, Y, Z), jnp.float32) for _ in range(n_out_planes))
    cp = _compiler_params() if _TPU and not interpret else None
    extras = [e.astype(jnp.float32) for e in blocked_extras]
    results = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[slab_spec] * n_slabs + [blk_spec] * n_extra,
        out_specs=tuple(blk_spec for _ in range(n_out_planes)),
        out_shape=out_shapes,
        interpret=interpret,
        **({'scratch_shapes': scratch} if scratch else {}),
        **({'compiler_params': cp} if cp is not None else {}),
    )(*(list(slabs) + extras))
    # regroup per OutSpec
    grouped = []
    oi = 0
    for spec in outs:
        n = _n_planes(spec)
        grouped.append(results[oi] if n == 1 else tuple(results[oi:oi + n]))
        oi += n
    return grouped
