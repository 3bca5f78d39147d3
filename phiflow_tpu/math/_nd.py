"""N-dimensional spatial ops on named tensors: interpolation, stencils, spectral ops.

`_grid_sample_xla` is the gather-interpolation backbone of semi-Lagrangian
advection (reference hot path: /root/reference/phi/field/_resample.py:259 →
math.grid_sample). It lowers to 2^d corner gathers + fused multiply-adds, which
XLA fuses into a single gather-heavy kernel on TPU; a Pallas variant lives in
`phiflow_tpu.ops.interp` for large 3D grids.
"""
from __future__ import annotations

import itertools
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ._shape import Shape, Dim, EMPTY_SHAPE, spatial, channel, batch, instance, dual, merge_shapes, concat_shapes, SPATIAL
from ._tensor import Tensor, TensorStack, wrap, _align_native, default_float
from ._extrapolation import Extrapolation, ConstantExtrapolation, PERIODIC, BOUNDARY, ZERO, as_extrapolation
from . import _ops as ops


def _linear_weights_and_indices(coords_n, sizes, periodic_dims):
    """coords_n: (..., d) float index coords. Returns per-dim (lo_idx, frac)."""
    lo = jnp.floor(coords_n)
    frac = coords_n - lo
    lo = lo.astype(jnp.int32)
    return lo, frac


def _grid_sample_xla(grid: Tensor, coordinates: Tensor, extrap: Optional[Extrapolation]) -> Tensor:
    """Multi-linear interpolation. `coordinates` has channel dim 'vector' labeled
    with the grid's spatial dim names (float index space: 0 = first cell center)."""
    if isinstance(grid, TensorStack):
        grid = grid._contiguous()
    ch = coordinates.shape.channel
    assert ch.rank == 1, f"coordinates must have one channel dim, got {coordinates.shape}"
    dims = ch.labels[0] or grid.shape.spatial.names
    d = len(dims)
    sizes = [grid.shape.get_size(n) for n in dims]
    periodic = [isinstance(extrap, type(PERIODIC)) or (hasattr(extrap, '_get') and _side_periodic(extrap, n)) for n in dims] \
        if extrap is not None else [False] * d
    # pad grid by 1 for non-periodic boundary handling
    if extrap is not None and not all(periodic):
        widths = {n: ((0, 0) if p else (1, 1)) for n, p in zip(dims, periodic)}
        grid_p = extrap.pad(grid, widths)
        offsets = [0 if p else 1 for p in periodic]
    else:
        grid_p = grid
        offsets = [0] * d
    if isinstance(grid_p, TensorStack):
        grid_p = grid_p._contiguous()
    p_sizes = [grid_p.shape.get_size(n) for n in dims]
    kept = grid_p.shape.without(dims)  # batch/channel dims of grid
    out_dims = coordinates.shape.without(ch.name)  # listing dims of the query
    # dims present in BOTH the grid (batch) and the query → aligned batched gather
    shared = [n for n in kept.names if n in out_dims]
    kept_rest = kept.without(shared)
    gt = grid_p._transposed(tuple(shared) + tuple(dims) + kept_rest.names)
    shared_sizes = [kept.get_size(n) for n in shared]
    spatial_vol = int(np.prod(p_sizes))
    flat_grid = gt.native().reshape((int(np.prod(shared_sizes)) * spatial_vol if shared else spatial_vol,)
                                    + tuple(kept_rest.sizes))
    coords_native = coordinates.native(out_dims.names + (ch.name,))  # (..., d)
    labels = ch.labels[0]
    if labels and tuple(labels) != tuple(dims):
        perm = [labels.index(n) for n in dims]
        coords_native = coords_native[..., perm]
    lo, frac = _linear_weights_and_indices(coords_native, p_sizes, periodic)
    # linear offset from shared batch dims
    shared_lin = None
    out_sizes = tuple(out_dims.sizes)
    for n, size in zip(shared, shared_sizes):
        axis = out_dims.index(n)
        iota = jax.lax.broadcasted_iota(jnp.int32, out_sizes, axis)
        shared_lin = iota if shared_lin is None else shared_lin * size + iota
    # --- slab-gather fast path (TPU) ---------------------------------------
    # TPU gather costs ~7 ns PER INDEX regardless of row width (measured:
    # 1M scalar-row takes = 6.7 ms, 100k 128-wide-row takes = 0.38 ms). The
    # generic path spends 2^d indices per query point; this path fetches ONE
    # (2, 2, Zp) slab per (x, y) corner-pair index — 4× (3D) / 2× (2D) fewer
    # indices with wide rows — and performs the z interpolation in-register
    # via hat weights over the full row. Exact for clamped (non-periodic)
    # boundaries: float positions are clipped BEFORE the floor/frac split,
    # which reproduces per-corner clamping.
    n_query = int(np.prod(out_sizes)) if out_sizes else 1
    Zp = p_sizes[-1]
    slab_ok = (d in (2, 3) and not any(periodic) and kept_rest.rank == 0
               and shared_lin is None and n_query >= 2048
               and spatial_vol * (4 if d == 3 else 2) <= 64 * 1024 * 1024
               and n_query * Zp * (4 if d == 3 else 2) <= 128 * 1024 * 1024)
    if slab_ok:
        g3 = flat_grid.reshape(tuple(p_sizes))
        pos = [jnp.clip(coords_native[..., k] + offsets[k], 0., p_sizes[k] - 1.)
               for k in range(d)]
        # The contraction stays in the FLAT (N, 2^{d-1}·Zp) row layout: reshaping
        # the gathered rows to (..., 2, 2, Zp) forces physical relayouts on TPU
        # (tiled (8,128) → different tiling), and per-corner selects re-read the
        # 4·Zp rows once per corner. Profiled on a FLIP 64³ step: reshape+copy+
        # select of the row intermediates was 24 ms of a 44 ms step. Instead the
        # xy-corner weights are folded into the z hat weights to one combined
        # (N, 2^{d-1}·Zp) weight array whose construction XLA fuses into the
        # single multiply-reduce over the rows — one pass, no reshapes.
        flat_q = (-1,)
        zf_flat = jnp.clip(pos[-1].reshape(flat_q), 0., Zp - 1.)
        if d == 3:
            Xp, Yp = p_sizes[0], p_sizes[1]
            ix = jnp.clip(jnp.floor(pos[0]), 0, Xp - 2).astype(jnp.int32)
            iy = jnp.clip(jnp.floor(pos[1]), 0, Yp - 2).astype(jnp.int32)
            fx = (pos[0] - ix).astype(g3.dtype).reshape(flat_q + (1,))
            fy = (pos[1] - iy).astype(g3.dtype).reshape(flat_q + (1,))
            table = jnp.stack([g3[:-1, :-1], g3[:-1, 1:], g3[1:, :-1], g3[1:, 1:]],
                              axis=2).reshape((Xp - 1) * (Yp - 1), 4 * Zp)
            rows = jnp.take(table, (ix * (Yp - 1) + iy).reshape(-1), axis=0)  # (N, 4·Zp)
            # combined trilinear weights built DIRECTLY in the (N, 4·Zp) row
            # layout from a lane iota (j = c·Zp + z): any (N,4,Zp)→(N,4·Zp)
            # reshape is a physical relayout on TPU (0.58 ms × 12/step at 125k
            # particles); this form fuses into the multiply-reduce instead
            j = jax.lax.broadcasted_iota(jnp.int32, (1, 4 * Zp), 1)
            zlane = (j % Zp).astype(g3.dtype)
            c = j // Zp
            wzl = jnp.maximum(0., 1. - jnp.abs(zlane - zf_flat[:, None].astype(g3.dtype)))
            wx = jnp.where(c >= 2, fx, 1. - fx)
            wy = jnp.where(c % 2 == 1, fy, 1. - fy)
            W = wx * wy * wzl
        else:
            Xp = p_sizes[0]
            ix = jnp.clip(jnp.floor(pos[0]), 0, Xp - 2).astype(jnp.int32)
            fx = (pos[0] - ix).astype(g3.dtype).reshape(flat_q + (1,))
            table = jnp.stack([g3[:-1], g3[1:]], axis=1).reshape(Xp - 1, 2 * Zp)
            rows = jnp.take(table, ix.reshape(-1), axis=0)                    # (N, 2·Zp)
            j = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * Zp), 1)
            zlane = (j % Zp).astype(g3.dtype)
            wzl = jnp.maximum(0., 1. - jnp.abs(zlane - zf_flat[:, None].astype(g3.dtype)))
            W = jnp.where(j // Zp == 1, fx, 1. - fx) * wzl
        # zero-weight taps are MASKED, not multiplied: 0·NaN = NaN would let a
        # single non-finite row entry (FLIP's NaN ghost padding) poison the
        # whole contraction, where the 2-corner form never touches it
        W = W.astype(g3.dtype)
        result = jnp.sum(jnp.where(W > 0, rows * W, jnp.zeros((), g3.dtype)), axis=-1)
        result = result.reshape(out_sizes)
        return Tensor(result, concat_shapes(out_dims, kept_rest))

    # ONE batched gather for all 2^d corners (a separate jnp.take per corner
    # costs 2^d small gather kernels with per-op overhead that dominated the
    # FLIP particle G2P path — 96 takes per RK4 step at 125k particles)
    idx_corners = []
    w_corners = []
    for corner in itertools.product((0, 1), repeat=d):
        idx = None
        w = None
        for k in range(d):
            ik = lo[..., k] + corner[k] + offsets[k]
            if periodic[k]:
                ik = ik % p_sizes[k]
            else:
                ik = jnp.clip(ik, 0, p_sizes[k] - 1)
            idx = ik if idx is None else idx * p_sizes[k] + ik
            wk = frac[..., k] if corner[k] else 1.0 - frac[..., k]
            w = wk if w is None else w * wk
        if shared_lin is not None:
            idx = jnp.broadcast_to(idx, out_sizes) + shared_lin * spatial_vol
        idx_corners.append(idx)
        w_corners.append(w)
    idx_all = jnp.stack(idx_corners, 0)                      # (2^d, *out)
    vals_all = jnp.take(flat_grid, idx_all.reshape(-1), axis=0) \
        .reshape(idx_all.shape + tuple(kept_rest.sizes))
    result = None
    for c in range(len(idx_corners)):
        w = w_corners[c].reshape(w_corners[c].shape + (1,) * kept_rest.rank)
        contrib = vals_all[c] * w.astype(vals_all.dtype)
        result = contrib if result is None else result + contrib
    return Tensor(result, concat_shapes(out_dims, kept_rest))


def _side_periodic(extrap, dim) -> bool:
    try:
        lo = extrap._get(dim, False)
        return lo == PERIODIC
    except Exception:
        return False


def _closest_grid_values(grid: Tensor, coordinates: Tensor, extrap: Extrapolation, stack_dim_prefix='closest_') -> Tensor:
    """The 2^d corner values around each coordinate, stacked in dims
    `closest_<dim>` of size 2 (reference: MacCormack clamp, phi/physics/advect.py:211)."""
    if isinstance(grid, TensorStack):
        grid = grid._contiguous()
    ch = coordinates.shape.channel
    dims = ch.labels[0] or grid.shape.spatial.names
    d = len(dims)
    periodic = [extrap is not None and _is_periodic_like(extrap, n) for n in dims]
    if extrap is not None and not all(periodic):
        widths = {n: ((0, 0) if p else (1, 1)) for n, p in zip(dims, periodic)}
        grid_p = extrap.pad(grid, widths)
        offsets = [0 if p else 1 for p in periodic]
    else:
        grid_p = grid
        offsets = [0] * d
    if isinstance(grid_p, TensorStack):
        grid_p = grid_p._contiguous()
    p_sizes = [grid_p.shape.get_size(n) for n in dims]
    kept = grid_p.shape.without(dims)
    out_dims = coordinates.shape.without(ch.name)
    shared = [n for n in kept.names if n in out_dims]
    kept_rest = kept.without(shared)
    shared_sizes = [kept.get_size(n) for n in shared]
    spatial_vol = int(np.prod(p_sizes))
    gt = grid_p._transposed(tuple(shared) + tuple(dims) + kept_rest.names)
    flat_grid = gt.native().reshape((int(np.prod(shared_sizes)) * spatial_vol if shared else spatial_vol,)
                                    + tuple(kept_rest.sizes))
    coords_native = coordinates.native(out_dims.names + (ch.name,))
    labels = ch.labels[0]
    if labels and tuple(labels) != tuple(dims):
        perm = [labels.index(n) for n in dims]
        coords_native = coords_native[..., perm]
    lo = jnp.floor(coords_native).astype(jnp.int32)
    out_sizes = tuple(out_dims.sizes)
    shared_lin = None
    for n, size in zip(shared, shared_sizes):
        axis = out_dims.index(n)
        iota = jax.lax.broadcasted_iota(jnp.int32, out_sizes, axis)
        shared_lin = iota if shared_lin is None else shared_lin * size + iota
    corner_results = {}
    for corner in itertools.product((0, 1), repeat=d):
        idx = None
        for k in range(d):
            ik = lo[..., k] + corner[k] + offsets[k]
            ik = ik % p_sizes[k] if periodic[k] else jnp.clip(ik, 0, p_sizes[k] - 1)
            idx = ik if idx is None else idx * p_sizes[k] + ik
        if shared_lin is not None:
            idx = jnp.broadcast_to(idx, out_sizes) + shared_lin * spatial_vol
        vals = jnp.take(flat_grid, idx.reshape(-1), axis=0).reshape(idx.shape + tuple(kept_rest.sizes))
        corner_results[corner] = Tensor(vals, concat_shapes(out_dims, kept_rest))
    # stack into closest_<dim> dims
    def build(prefix_corner):
        if len(prefix_corner) == d:
            return corner_results[prefix_corner]
        k = len(prefix_corner)
        lo_t = build(prefix_corner + (0,))
        up_t = build(prefix_corner + (1,))
        return ops.stack([lo_t, up_t], channel(**{f"{stack_dim_prefix}{dims[k]}": 2}))
    return build(())


def _is_periodic_like(extrap, dim) -> bool:
    if extrap == PERIODIC:
        return True
    return _side_periodic(extrap, dim)


# ---------------------------------------------------------------------------
# tensor-level stencil ops (API parity with phiml.math)
# ---------------------------------------------------------------------------

def spatial_gradient_t(grid: Tensor, dx=1, difference='central', padding=BOUNDARY,
                       dims=None, stack_dim=channel('gradient')) -> Tensor:
    """Finite-difference gradient of a tensor along spatial dims."""
    from ._ops import shift, stack
    dims = grid.shape.spatial.names if dims is None else dims
    dx_t = wrap(dx)
    if difference == 'central':
        lo, up = shift(grid, (-1, 1), dims, padding, stack_dim=stack_dim)
        return (up - lo) / (2 * dx_t)
    elif difference == 'forward':
        lo, up = shift(grid, (0, 1), dims, padding, stack_dim=stack_dim)
        return (up - lo) / dx_t
    elif difference == 'backward':
        lo, up = shift(grid, (-1, 0), dims, padding, stack_dim=stack_dim)
        return (up - lo) / dx_t
    raise ValueError(difference)


def laplace_t(x: Tensor, dx=1, padding=BOUNDARY, dims=None, weights=None) -> Tensor:
    """Second-order finite-difference Laplacian over spatial dims."""
    from ._ops import shift, sum_
    dims = x.shape.spatial.names if dims is None else dims
    dx_t = wrap(dx)
    lo, ce, up = shift(x, (-1, 0, 1), dims, padding, stack_dim=channel('_lap'))
    if weights is not None:
        result = (lo + up - 2 * ce) * weights
    else:
        result = lo + up - 2 * ce
    if 'vector' in dx_t.shape or dx_t.shape.channel:
        dx2 = ops.rename_dims(dx_t * dx_t, dx_t.shape.channel, channel('_lap'))
        result = result / dx2
    else:
        result = result / (dx_t * dx_t)
    return sum_(result, '_lap')


# ---------------------------------------------------------------------------
# matmul-based spectral ops (TPU-safe: no device FFT, which is unavailable on
# this TPU runtime; per-axis DFT/circulant matrices are host-precomputed and
# applied as MXU matmuls — O(N) matrices are trace-time literals)
# ---------------------------------------------------------------------------

import functools as _functools


@_functools.lru_cache(maxsize=64)
def _circulant(spectrum_key) -> np.ndarray:
    """Real circulant matrix C = F⁻¹·diag(spectrum)·F for a real, even-in-k
    spectrum (length-n tuple). C[i, j] = c[(i − j) mod n], c = ifft(spectrum)."""
    spectrum = np.asarray(spectrum_key, np.float64)
    n = len(spectrum)
    c = np.real(np.fft.ifft(spectrum))
    idx = (np.arange(n)[:, None] - np.arange(n)[None, :]) % n
    return c[idx]


@_functools.lru_cache(maxsize=32)
def _dft_mats(n: int):
    """(re, im) parts of the unitary-free DFT matrix W[k, j] = exp(−2πi·k·j/n)
    and of its inverse (with the 1/n factor folded into the inverse)."""
    j = np.arange(n)
    ang = -2 * np.pi * np.outer(j, j) / n
    fwd = np.cos(ang), np.sin(ang)
    inv = np.cos(ang).T / n, -np.sin(ang).T / n
    return fwd, inv


def _axis_matmul(native, axis: int, M: np.ndarray, dtype=None):
    out_dtype = dtype or native.dtype
    Mj = jnp.asarray(M.astype(np.float64 if out_dtype == jnp.float64 else np.float32))
    out = jnp.tensordot(native, Mj, axes=((axis,), (1,)), precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(out, -1, axis).astype(out_dtype)


def _spectral_separable(grid: Tensor, per_axis_spectra: dict, combine: str) -> Tensor:
    """Apply F⁻¹·diag(Π_d or Σ_d s_d(k_d))·F via per-axis circulant matmuls.
    combine='mul': factors multiply (sequential application);
    combine='sum': factors add (summed applications)."""
    native = grid.native()
    names = grid.shape.names
    if combine == 'mul':
        out = native
        for dim, spec in per_axis_spectra.items():
            out = _axis_matmul(out, names.index(dim), _circulant(tuple(np.asarray(spec))))
    else:
        out = None
        for dim, spec in per_axis_spectra.items():
            term = _axis_matmul(native, names.index(dim), _circulant(tuple(np.asarray(spec))))
            out = term if out is None else out + term
    return Tensor(out, grid.shape)


def _spectral_pointwise(grid: Tensor, factor_nd: np.ndarray, dims) -> Tensor:
    """Full N-D spectral filter F⁻¹·diag(factor)·F via per-axis matmul-DFTs
    (complex arithmetic tracked as separate real/imag arrays)."""
    native = grid.native()
    names = grid.shape.names
    axes = [names.index(d) for d in dims]
    re, im = native, jnp.zeros_like(native)
    for ax in axes:
        (fr, fi), _ = _dft_mats(native.shape[ax])
        re, im = (_axis_matmul(re, ax, fr) - _axis_matmul(im, ax, fi),
                  _axis_matmul(re, ax, fi) + _axis_matmul(im, ax, fr))
    fshape = [native.shape[a] if a in axes else 1 for a in range(native.ndim)]
    f = jnp.asarray(factor_nd.astype(np.float32 if native.dtype != jnp.float64 else np.float64)).reshape(fshape)
    re, im = re * f, im * f
    for ax in axes:
        _, (ir, ii) = _dft_mats(native.shape[ax])
        re, im = (_axis_matmul(re, ax, ir) - _axis_matmul(im, ax, ii),
                  _axis_matmul(re, ax, ii) + _axis_matmul(im, ax, ir))
    return Tensor(re, grid.shape)


def _k_grids(grid: Tensor, dx):
    """Per-axis wavenumber arrays k_d (cycles per unit length) as numpy."""
    dims = grid.shape.spatial.names
    if hasattr(dx, 'native'):
        dx_arr = np.asarray(dx.native(dx.shape.names), np.float64).reshape(-1)
    else:
        dx_arr = np.asarray(dx, np.float64).reshape(-1)
    if dx_arr.size == 1:
        dx_arr = np.repeat(dx_arr, len(dims))
    return {d: np.fft.fftfreq(grid.shape.get_size(d), d=dx_arr[i]) for i, d in enumerate(dims)}


def fourier_laplace(grid: Tensor, dx, times=1) -> Tensor:
    """Exact spectral Laplacian (periodic): F⁻¹·(−(2πk)²)ⁿ·F.
    Reference: phi/field/_field_math.py:730. Evaluated as per-axis circulant
    matmuls (times=1: Σ_d −4π²k_d² is separable as a sum); the general power
    goes through the full matmul-DFT."""
    ks = _k_grids(grid, dx)
    if times == 1:
        return _spectral_separable(grid, {d: -4 * np.pi ** 2 * k ** 2 for d, k in ks.items()}, 'sum')
    dims = list(ks)
    k2 = sum(np.square(k).reshape([-1 if i == j else 1 for j in range(len(dims))])
             for i, (d, k) in enumerate(ks.items()))
    return _spectral_pointwise(grid, (-4 * np.pi ** 2 * k2) ** times, dims)


def fourier_poisson(grid: Tensor, dx, times=1) -> Tensor:
    """Inverse Laplacian (periodic), zero-mean solution — full matmul-DFT with
    the 1/(−(2πk)²)ⁿ multiplier (k=0 mode zeroed)."""
    ks = _k_grids(grid, dx)
    dims = list(ks)
    k2 = sum(np.square(k).reshape([-1 if i == j else 1 for j in range(len(dims))])
             for i, (d, k) in enumerate(ks.items()))
    lap = (-4 * np.pi ** 2 * k2) ** times
    with np.errstate(divide='ignore', invalid='ignore'):
        inv = np.where(lap != 0, 1.0 / np.where(lap == 0, 1.0, lap), 0.0)
    return _spectral_pointwise(grid, inv, dims)


def downsample2x(grid: Tensor, padding=BOUNDARY, dims=None) -> Tensor:
    dims = grid.shape.spatial.names if dims is None else dims
    for dim in dims:
        size = grid.shape.get_size(dim)
        if size % 2:
            grid = padding.pad(grid, {dim: (0, 1)})
            size += 1
        lo = grid[{dim: slice(0, size, 2)}]
        up = grid[{dim: slice(1, size, 2)}]
        grid = (lo + up) * 0.5
    return grid


def upsample2x(grid: Tensor, padding=BOUNDARY, dims=None) -> Tensor:
    """Linear 2x upsampling (each cell splits into 2 with 3/4-1/4 interpolation)."""
    dims = grid.shape.spatial.names if dims is None else dims
    for dim in dims:
        padded = padding.pad(grid, {dim: (1, 1)})
        size = grid.shape.get_size(dim)
        left = padded[{dim: slice(0, size)}]
        center = padded[{dim: slice(1, size + 1)}]
        right = padded[{dim: slice(2, size + 2)}]
        a = 0.25 * left + 0.75 * center
        b = 0.75 * center + 0.25 * right
        an, bn = a.native(), b.native()
        axis = a.shape.index(dim)
        stacked = jnp.stack([an, bn], axis=axis + 1)
        new_sizes = list(a.shape.sizes)
        new_sizes[axis] = size * 2
        native = stacked.reshape(new_sizes)
        grid = Tensor(native, a.shape.with_dim_size(dim, size * 2))
    return grid


def masked_fill(values: Tensor, valid: Tensor, distance=1) -> Tuple[Tensor, Tensor]:
    """Propagate values into invalid cells by averaging valid neighbors, `distance` times.
    Returns (filled_values, new_valid). Reference: phiml masked_fill used by
    field.finite_fill (phi/field/_field_math.py:1076)."""
    from ._ops import shift, where, sum_, maximum, to_float
    valid_f = to_float(valid)
    for _ in range(distance):
        values_v = values * valid_f
        neighbor_sum = ops.zeros_like(values_v)
        neighbor_count = ops.zeros_like(valid_f)
        for dim in values.shape.spatial.names:
            lo, up = shift(values_v, (-1, 1), dim, ZERO, stack_dim=None)
            vlo, vup = shift(valid_f, (-1, 1), dim, ZERO, stack_dim=None)
            neighbor_sum += lo + up
            neighbor_count += vlo + vup
        avg = ops.safe_div(neighbor_sum, neighbor_count)
        values = where(ops.cast(valid_f, jnp.bool_), values, avg)
        valid_f = ops.cast(maximum(valid_f, ops.minimum(neighbor_count, 1.0)), valid_f.dtype)
    return values, ops.cast(valid_f, jnp.bool_)


# ---------------------------------------------------------------------------
# window-shift interpolation (TPU-native gather replacement)
# ---------------------------------------------------------------------------

def shift_window_interp(grid: Tensor, displacement_cells, extrap: Extrapolation,
                        max_cells: int = 2, compute_extrema: bool = False,
                        negate: bool = False, disp_scale=None):
    """Linear interpolation of `grid` at its own sample lattice displaced by
    `displacement_cells` (in units of cells, channel 'vector' labeled by dims).

    TPU rationale: XLA's general gather serializes on TPU (no hardware gather
    unit). When the displacement is bounded — |δ| ≤ `max_cells`, i.e. CFL ≤ K,
    which holds for every advection scheme that is numerically sane — the lookup
    is a *local* operation: interpolation = Σ_s w_s(δ) · shift(grid, s) over the
    (2K+1)^d integer shifts s ∈ [−K, K]^d (δ clamped to ±K: at δ = ±K the
    outermost tap has weight 1, so the symmetric window is exact). Shifted windows are contiguous slices of the
    padded grid, so the whole operation lowers to fused elementwise FMA streams
    at HBM bandwidth (~30× faster than gather at 64³).

    Displacements beyond ±max_cells are clamped (stable, slightly diffusive).

    Returns interp, or (interp, corner_min, corner_max) when compute_extrema
    (the MacCormack clamp values — reference: phi/physics/advect.py:210-215).

    ``displacement_cells`` is a channel-'vector' Tensor, or a raw LIST of
    per-axis jnp arrays in the grid's spatial order (the advection fast path
    feeds these straight from fused resample expressions — no Tensor plumbing,
    no stack pass). ``negate`` flips the displacement sign inside the kernel.
    """
    out_shape = grid.shape
    out_order = out_shape.names
    if isinstance(displacement_cells, (list, tuple)):
        dims = tuple(out_shape.spatial.names)
        raw_disps = list(displacement_cells)
    else:
        ch = displacement_cells.shape.channel
        dims = ch.labels[0]
        raw_disps = [displacement_cells[{ch.name: n}].native(out_order) for n in dims]
    d = len(dims)
    K = max_cells
    W = 2 * K + 1  # shifts per axis: s ∈ [-K, K] (symmetric window)
    big = jnp.asarray(3.4e38, jnp.float32)
    # Constant extrapolation (velocity's ZERO walls): the Pallas kernel can
    # build the halo slab with ONE jnp.pad of the raw grid — skip the generic
    # pad→concat→pad staging chain (2-3 HBM passes per call)
    const_val = None
    if isinstance(extrap, ConstantExtrapolation):
        try:
            const_val = float(extrap.value)
        except Exception:
            const_val = None  # tensor-valued / traced constant → generic path

    def make_padded():
        padded_t = extrap.pad(grid, {n: (K, K) for n in dims})
        if isinstance(padded_t, TensorStack):
            padded_t = padded_t._contiguous()
        return padded_t.native(out_order)

    grid_native = grid.native(out_order)
    # per-axis displacement aligned to the output layout — clamping to ±K (and
    # the optional negation) happens inside the Pallas kernel (VMEM-resident) /
    # the fallback body, NOT here: a jnp.clip per axis costs d full HBM passes
    disps = [dd.astype(grid_native.dtype) for dd in raw_disps]
    axis_pos = [out_shape.index(n) for n in dims]
    out_sizes = tuple(out_shape.sizes)
    rank = len(out_sizes)
    # --- Pallas fast path: tile+halo loaded into VMEM once, all windows on-chip ---
    from ..ops.interp import pallas_available, window_interp_3d, window_interp_2d, supported_3d, supported_2d
    plain = (rank == d and tuple(out_shape.names) == tuple(dims)
             and grid_native.dtype == jnp.float32)
    if plain and d == 3:
        plain = supported_3d(*out_sizes, K)
    elif plain and d == 2:
        plain = supported_2d(*out_sizes, K)
    else:
        plain = False
    if plain and pallas_available():
        disp_list = tuple(dd.astype(jnp.float32) for dd in disps)
        fn = window_interp_3d if d == 3 else window_interp_2d
        # constant halos → the kernel builds the slab from the raw grid in one
        # pad (const_pad); otherwise hand it the generically padded array
        use_const = const_val is not None and d == 3
        if use_const:
            padded32 = grid_native.astype(jnp.float32)
            kw = {'const_pad': const_val}
        else:
            padded32 = make_padded().astype(jnp.float32)
            kw = {}
        if disp_scale is not None:
            kw['disp_scale'] = tuple(disp_scale)
        if K > 1 and d == 3:
            # Adaptive window radius: the K=1 kernel costs ~3× less per cell
            # ((2K+2)³ window terms). When every displacement fits its window
            # [−1, 2] the small kernel is EXACT, so select at runtime — typical
            # CFL<1 flows never pay for the wide window.
            scales = disp_scale or (1.0,) * d
            bounds = []
            for s, dd in zip(scales, disp_list):
                mn, mx = jnp.min(dd), jnp.max(dd)
                bounds.append((jnp.minimum(s * mn, s * mx), jnp.maximum(s * mn, s * mx)))
            lo = _functools.reduce(jnp.minimum, [bb[0] for bb in bounds])
            hi = _functools.reduce(jnp.maximum, [bb[1] for bb in bounds])
            k1_ok = jnp.logical_and(lo >= -1.0, hi <= 1.0)
            crop = tuple(slice(K - 1, -(K - 1)) for _ in range(d)) if not use_const else ()

            def k1(args):
                pad_, *disp_ = args
                return fn(pad_[crop] if crop else pad_, disp_, 1,
                          compute_extrema=compute_extrema, negate=negate, **kw)

            def kK(args):
                pad_, *disp_ = args
                return fn(pad_, disp_, K, compute_extrema=compute_extrema, negate=negate, **kw)

            result = jax.lax.cond(k1_ok, k1, kK, (padded32, *disp_list))
        else:
            result = fn(padded32, disp_list, K, compute_extrema=compute_extrema, negate=negate, **kw)
        if compute_extrema:
            return (Tensor(result[0], out_shape), Tensor(result[1], out_shape), Tensor(result[2], out_shape))
        return Tensor(result, out_shape)
    # The joint (2K+2)^d-corner sum runs as a fori_loop: one dynamic-slice window
    # + fused FMA per iteration. Correct for spatially-varying displacement
    # (weights evaluated at the OUTPUT lattice) with an O(1)-size HLO —
    # python-unrolled windows crash remote compilers at 256³+.
    padded = make_padded()
    zero = jnp.zeros(out_sizes, padded.dtype)
    init = (zero, jnp.full(out_sizes, big, padded.dtype), jnp.full(out_sizes, -big, padded.dtype)) \
        if compute_extrema else zero

    def body(k, acc):
        starts = [0] * rank
        w = None
        cm = None
        kk = k
        for i in range(d):
            s = kk % W - K
            kk = kk // W
            starts[axis_pos[i]] = K + s
            sc_i = (disp_scale or (1.0,) * d)[i] * (-1.0 if negate else 1.0)
            di = jnp.clip(sc_i * disps[i], -float(K), float(K))  # fused into the loop body
            ai = jnp.abs(di - s)
            wi = jnp.maximum(0.0, 1.0 - ai)  # hat function = exact linear-interp weight
            w = wi if w is None else w * wi
            if compute_extrema:
                ci = ai < 1.0
                cm = ci if cm is None else cm & ci
        window = jax.lax.dynamic_slice(padded, starts, out_sizes)
        if compute_extrema:
            total, lo_acc, up_acc = acc
            total = total + window * w
            lo_acc = jnp.minimum(lo_acc, jnp.where(cm, window, big))
            up_acc = jnp.maximum(up_acc, jnp.where(cm, window, -big))
            return total, lo_acc, up_acc
        return acc + window * w

    result = jax.lax.fori_loop(0, W ** d, body, init)
    if compute_extrema:
        total, lo_acc, up_acc = result
        return (Tensor(total, out_shape), Tensor(lo_acc, out_shape), Tensor(up_acc, out_shape))
    return Tensor(result, out_shape)
