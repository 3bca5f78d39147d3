"""Sampling & resampling between discretizations
(reference: /root/reference/phi/field/_resample.py, SURVEY.md §2.3).

Hot paths:
 * grid→points interpolation lowers to `math.grid_sample` (XLA gather-fused,
   Pallas variant in phiflow_tpu.ops.interp) — the semi-Lagrangian backbone.
 * center↔face resampling of aligned grids uses exact pad+average arithmetic
   (the reference's `_shift_resample` fast path, _resample.py:341) rather than
   general interpolation.
 * particles→grid scatter lowers to `math.scatter` (XLA sorted-segment updates).
"""
from __future__ import annotations

from numbers import Number
from typing import Union

import numpy as np

from ..math import (
    Shape, Tensor, TensorStack, wrap, spatial, channel, dual, instance, batch,
    stack, unstack, expand, rename_dims,
)
from ..math import _ops as ops
from ..math import extrapolation as extrapolation_mod
from ..math.extrapolation import Extrapolation, ConstantExtrapolation
from ..geom import Geometry, Box, BaseBox, UniformGrid, Point
from ._field import Field, FieldInitializer, as_boundary

__all__ = ['resample', 'sample', 'reduce_sample', 'scatter_to_centers', 'grid_scatter', 'sample_grid_at_centers']


def resample(value, to=None, keep_boundary=False, soft=False, scatter=False,
             outside_handling='discard', balance=0.5, **kwargs) -> Field:
    """Sample `value` at the sample points of `to`, returning a Field on `to`'s geometry
    (reference: phi/field/_resample.py:13)."""
    if to is None and 'at' in kwargs:
        to = kwargs.pop('at')
    assert isinstance(to, Field), f"'to' must be a Field but got {type(to)}"
    if isinstance(value, Geometry):
        values = sample(value, to.geometry if to.is_centered else to.sampled_elements,
                        at=to.sampled_at, boundary=to.boundary, soft=soft, balance=balance, **kwargs)
        return to.with_values(values)
    if isinstance(value, (Number, bool)) or (isinstance(value, Tensor) and not value.shape.spatial and not value.shape.instance):
        return to.with_values(value if isinstance(value, Tensor) else wrap(value))
    if isinstance(value, Field) and value.is_point_cloud and not to.is_point_cloud:
        values = scatter_to_grid(value, to, scatter=scatter, outside_handling=outside_handling,
                                 soft=soft, balance=balance)
        return to.with_values(values)
    if isinstance(value, Field):
        # keep_boundary=False uses the target's boundary for sampling AND the result
        # (reference: _resample.py:57-65) — staggered sizes follow the target extrapolation.
        extrap = value.boundary if keep_boundary else to.boundary
        values = sample(value, to.geometry, at=to.sampled_at, boundary=extrap,
                        dot_face_normal=to.geometry if to.is_staggered else None, **kwargs)
        return Field(to.geometry, values, extrap)
    if isinstance(value, FieldInitializer) or callable(value):
        values = sample(value, to.geometry, at=to.sampled_at, boundary=to.boundary,
                        dot_face_normal=to.geometry if to.is_staggered else None, **kwargs)
        return to.with_values(values)
    if isinstance(value, Tensor):
        return to.with_values(value)
    raise ValueError(f"cannot resample {type(value)}")


def sample(value, geometry, at: str = 'center', boundary=None, dot_face_normal=None,
           soft=False, balance=0.5, **kwargs) -> Tensor:
    """Sample `value` at the points of `geometry` (→ Tensor)
    (reference: phi/field/_resample.py:75)."""
    if isinstance(geometry, Field):
        geometry = geometry.sampled_elements if geometry.is_staggered else geometry.geometry
    if isinstance(geometry, Tensor):  # raw point tensor (reference: sample accepts Tensor locations)
        from ..geom._geom import Point
        assert 'vector' in geometry.shape, f"point tensor must have a 'vector' channel dim, got {geometry.shape}"
        geometry = Point(geometry)
    boundary = as_boundary(boundary, geometry) if boundary is not None else None
    # --- Geometry masks ---
    if isinstance(value, Geometry):
        if at == 'face':
            return _sample_at_faces(lambda g: _geometry_mask(value, g, soft, balance), geometry, boundary, None)
        return _geometry_mask(value, geometry, soft, balance)
    # --- Initializers ---
    if isinstance(value, FieldInitializer):
        if at == 'face' and dot_face_normal is not None:
            return _sample_at_faces(lambda g: _init_sample(value, g, boundary, **kwargs), geometry, boundary, None)
        return _init_sample(value, geometry, boundary, at=at, **kwargs)
    # --- plain callables ---
    if callable(value) and not isinstance(value, Field):
        from ..geom._geom import sample_function
        if at == 'face':
            return _sample_at_faces(lambda g: _wrap_sampled(sample_function(value, g, 'center', boundary)), geometry, boundary, None)
        return _wrap_sampled(sample_function(value, geometry, at, boundary))
    # --- constants ---
    if isinstance(value, (Number, bool)):
        value = wrap(value)
    if isinstance(value, (tuple, list)):
        value = wrap(list(value), channel(vector=geometry.shape.get_labels('vector')))
    if isinstance(value, Tensor) and not isinstance(value, Field):
        if at == 'face' and dot_face_normal is not None and isinstance(geometry, UniformGrid):
            from ._grid import expand_staggered
            return expand_staggered(value, geometry.resolution, boundary or extrapolation_mod.ZERO)
        target = geometry.shape.non_channel.non_dual.non_batch
        return expand(value, target.without(value.shape.names))
    # --- Fields ---
    assert isinstance(value, Field), f"cannot sample {type(value)}"
    if value.is_grid:
        return _sample_grid_field(value, geometry, at, boundary, dot_face_normal, **kwargs)
    if value.is_mesh:  # before is_point_cloud: mesh fields satisfy both flags
        from ._mesh_math import sample_mesh_field
        return sample_mesh_field(value, geometry, at, boundary, dot_face_normal)
    if value.is_point_cloud:
        if isinstance(geometry, (UniformGrid,)) or at == 'face':
            # points → grid
            dummy = Field(geometry, 0. if not value.shape.channel else
                          wrap([0.] * value.shape.channel.volume, value.shape.channel), boundary or 0.)
            if at == 'face':
                return _sample_at_faces(
                    lambda g: scatter_to_points_target(value, g), geometry, boundary, value)
            return scatter_to_points_target(value, geometry)
        # points → points: nearest / direct
        return _sample_points_at_points(value, geometry)
    raise NotImplementedError(f"sampling {type(value.geometry)}")


def reduce_sample(value: Field, points, dim=None) -> Tensor:
    """Sample staggered components at per-component point sets (each component at
    its own lookup location) — used by advection
    (reference: phi/field/_resample.py:66)."""
    if isinstance(points, Geometry):
        points = points.center
    if not isinstance(value, Field):
        raise ValueError(type(value))
    if value.is_staggered and isinstance(points, Tensor) and points.shape.dual:
        comps = []
        names = value.resolution.names
        for dim_name in names:
            comp_field = value.vector[dim_name]
            pts = points[{'~vector': dim_name}]
            comps.append(sample_grid_at_points(comp_field, pts))
        return stack(comps, dual(vector=names))
    return sample(value, Point(points) if isinstance(points, Tensor) else points)


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _wrap_sampled(values) -> Tensor:
    return values if isinstance(values, Tensor) else wrap(values)


def _geometry_mask(geom: Geometry, target: Geometry, soft: bool, balance) -> Tensor:
    from ..geom._geom_ops import GeometryStack
    if isinstance(target, GeometryStack):  # staggered target: per-component masks
        comps = [_geometry_mask(geom, g, soft, balance) for g in target.geometries]
        return stack(comps, target.stack_dim)
    if soft:
        return geom.approximate_fraction_inside(target, balance)
    return ops.to_float(geom.lies_inside(target.center))


def _init_sample(value: FieldInitializer, geometry, boundary, at='center', **kwargs) -> Tensor:
    from ..geom._geom_ops import GeometryStack
    if isinstance(geometry, GeometryStack) and geometry.stack_dim.dims[0].is_dual:
        comps = [value._sample(g, 'center', boundary, **kwargs) for g in geometry.geometries]
        return stack(comps, geometry.stack_dim)
    return value._sample(geometry, at, boundary, **kwargs)


def _project_face_component(values: Tensor, dim: str) -> Tensor:
    """Vector-valued sample on an axis-aligned face grid → normal component
    (dot with n̂ = e_dim); scalar samples pass through."""
    if 'vector' in values.shape and values.shape.get_labels('vector'):
        return values[{'vector': dim}]
    return values


def _sample_at_faces(f_on_grid, geometry, boundary, value):
    """Evaluate `f_on_grid(face_grid)` for each axis face-grid and stack over '~vector'."""
    assert isinstance(geometry, UniformGrid) or hasattr(geometry, 'geometries'), f"face sampling needs a grid, got {type(geometry)}"
    from ..geom._geom_ops import GeometryStack
    if isinstance(geometry, GeometryStack):
        labels = geometry.stack_dim.dims[0].labels or (None,) * len(geometry.geometries)
        comps = [_project_face_component(f_on_grid(g), lbl) if lbl else f_on_grid(g)
                 for g, lbl in zip(geometry.geometries, labels)]
        return stack(comps, geometry.stack_dim)
    boundary = boundary or extrapolation_mod.ZERO
    names = geometry.resolution.names
    comps = []
    for dim in names:
        face_grid = geometry.stagger(dim, *boundary.valid_outer_faces(dim))
        comps.append(_project_face_component(f_on_grid(face_grid), dim))
    return stack(comps, dual(vector=names))


def _sample_grid_field(value: Field, geometry, at: str, boundary, dot_face_normal,
                       order: int = 2, implicit=None, **_ignored) -> Tensor:
    from ..geom._geom_ops import GeometryStack
    boundary = boundary if boundary is not None else value.boundary
    if at == 'face' or isinstance(geometry, GeometryStack):
        # --- staggered target ---
        if isinstance(geometry, GeometryStack):
            labels = geometry.stack_dim.dims[0].labels
            face_grids = dict(zip(labels, geometry.geometries))
            names = list(labels)
        else:
            names = list(geometry.resolution.names)
            face_grids = {dim: geometry.stagger(dim, *boundary.valid_outer_faces(dim)) for dim in names}
        comps = []
        for dim in names:
            fg = face_grids[dim]
            if dot_face_normal is not None and 'vector' in value.shape:
                comp_value = value.vector[dim] if not value.is_staggered else value.vector[dim]
            else:
                comp_value = value
            comps.append(sample_grid_at_centers(comp_value, fg, order=order, implicit=implicit))
        return stack(comps, dual(vector=names))
    # --- centered target ---
    if isinstance(geometry, UniformGrid):
        if value.is_centered and isinstance(value.geometry, UniformGrid) and value.geometry == geometry:
            return value.values
        if value.is_staggered:
            comps = [sample_grid_at_centers(value.vector[d], geometry, order=order, implicit=implicit)
                     for d in value.resolution.names]
            return stack({d: c for d, c in zip(value.resolution.names, comps)}, channel('vector'))
        return sample_grid_at_centers(value, geometry, order=order, implicit=implicit)
    # sample at arbitrary geometry centers (point clouds etc.)
    points = geometry.center
    if value.is_staggered:
        comps = [sample_grid_at_points(value.vector[d], points) for d in value.resolution.names]
        return stack({d: c for d, c in zip(value.resolution.names, comps)}, channel('vector'))
    return sample_grid_at_points(value, points)


def sample_grid_at_centers(value: Field, target_grid: UniformGrid, order: int = 2,
                           implicit=None) -> Tensor:
    """Interpolate a (possibly staggered) grid field at the cell centers of
    `target_grid` (reference: phi/field/_resample.py:241). Uses the exact
    half-cell-shift fast path when grids are aligned (order>2: high-order
    compact interpolation matrices, see `_shift_resample`), else
    gather-interpolation."""
    if value.is_staggered:
        comps = {d: sample_grid_at_centers(value.vector[d], target_grid, order, implicit)
                 for d in value.resolution.names}
        return stack(comps, channel('vector'))
    if _half_shift_alignment(value, target_grid) is not None:
        return _shift_resample(value, target_grid, order=order, implicit=implicit)
    points = target_grid.center
    return sample_grid_at_points(value, points)


def sample_grid_at_points(value: Field, points: Tensor) -> Tensor:
    """grid_sample at world-space points (the gather-interp hot path)."""
    if isinstance(points, TensorStack) and not points.is_uniform:
        comps = [sample_grid_at_points(value, c) for c in points.components]
        return stack(comps, points.stack_dim)
    if value.is_staggered:
        comps = {d: sample_grid_at_points(value.vector[d], points) for d in value.resolution.names}
        return stack(comps, channel('vector'))
    resolution = value.values.shape.spatial  # works for single staggered component too
    local = value.bounds.global_to_local(points)
    coords = local * wrap([float(s) for s in resolution.sizes], channel(vector=resolution.names)) - 0.5
    return ops.grid_sample(value.values, coords, value.boundary)


def _half_shift_alignment(value: Field, target_grid: UniformGrid):
    """Detect the center↔face aligned case: same resolution up to ±1 along each
    dim and same cell size, offset by half a cell. Returns the per-dim (lower_pad,
    upper_pad) dict to realize the resample as pad+average, or None."""
    source = value.geometry
    if not isinstance(source, UniformGrid):
        return None
    s_res, t_res = source.resolution, target_grid.resolution
    if set(s_res.names) != set(t_res.names):
        return None
    try:
        s_dx = np.asarray(source.dx.native())
        t_dx = np.asarray(target_grid.dx.native())
        s_lower = np.asarray(source.bounds.lower.native())
        t_lower = np.asarray(target_grid.bounds.lower.native())
    except Exception:
        return None
    if s_dx.shape != t_dx.shape or not np.allclose(s_dx, t_dx, rtol=1e-5):
        return None
    # offset in cells
    offset = (t_lower - s_lower) / s_dx
    plan = {}
    for i, dim in enumerate(s_res.names):
        diff = t_res.get_size(dim) - s_res.get_size(dim)
        off = offset[i]
        if abs(off) < 1e-6 and diff == 0:
            plan[dim] = None  # aligned
        elif abs(abs(off) - 0.5) < 1e-6 and diff in (-1, 0, 1):
            lower_pad = 1 if off < 0 else 0
            upper_pad = diff + (1 if off < 0 else 0) - (1 if off < 0 else 0)
            # faces: pad so that after averaging sizes match
            # new_size = size + lp + up - 1  => lp + up = diff + 1
            total = diff + 1
            lp = 1 if off < 0 else 0
            up = total - lp
            if lp < 0 or up < 0 or lp > 1 or up > 1:
                return None
            plan[dim] = (lp, up)
        else:
            return None
    if all(v is None for v in plan.values()):
        return {}
    return plan


def _shift_resample(value: Field, target_grid: UniformGrid, order: int = 2,
                    implicit=None) -> Tensor:
    """Exact resample between half-cell-shifted aligned grids
    (reference fast path: phi/field/_resample.py:341).

    order 2 (default): pad + 2-point average. order 4/6: per-axis high-order
    (compact for order 6) interpolation matrices applied as MXU matmuls —
    the reference's `_dyadic_interpolate` (phi/field/_resample.py:296)
    re-designed as trace-time dense operators. Falls back to order 2 along
    axes whose boundaries cannot be classified."""
    from ._stencil1d import interp_matrix, apply_axis_matrix, classify_side
    plan = _half_shift_alignment(value, target_grid)
    v = value.values
    ext = value.boundary
    implicit_order = 2 if order >= 6 else 0
    for dim, p in plan.items():
        if p is None:
            continue
        lp, up = p
        if order > 2:
            lo = classify_side(ext, dim, False)
            hi = classify_side(ext, dim, True)
            classified = lo is not None and hi is not None and \
                (('periodic' not in (lo, hi)) or lo == hi)
            if classified:
                n = v.shape.get_size(dim)
                n_out = n + lp + up - 1
                start = -0.5 if lp == 1 else 0.5
                M, affine = interp_matrix(n, order, start, n_out, lo, hi,
                                          implicit_order=implicit_order)
                axis = v.shape.names.index(dim)
                native = apply_axis_matrix(v.native(), axis, M, affine)
                v = Tensor(native, v.shape.with_dim_size(dim, n_out))
                continue
        padded = ops.pad(v, {dim: (lp, up)}, ext)
        size = padded.shape.get_size(dim)
        v = (padded[{dim: slice(0, size - 1)}] + padded[{dim: slice(1, size)}]) * 0.5
    return v


# ---------------------------------------------------------------------------
# particles ⇄ grid
# ---------------------------------------------------------------------------

def scatter_to_points_target(value: Field, target: Geometry) -> Tensor:
    """Point-cloud values sampled on target geometry via hard/soft membership
    (reference: scatter_to_centers, phi/field/_resample.py:192)."""
    return scatter_to_grid(value, Field(target, 0., 0.), scatter=False, outside_handling='discard',
                           soft=False, balance=0.5)


def scatter_to_grid(value: Field, to: Field, scatter: bool, outside_handling: str,
                    soft: bool, balance) -> Tensor:
    """Particles → grid transfer.

    scatter=True: true scatter-add/mean via math.scatter (FLIP P2G hot path,
    reference: grid_scatter, phi/field/_resample.py:220-238).
    scatter=False: geometry-overlap accumulation (soft fraction or hard center containment).
    """
    if to.is_staggered:
        from ..geom._geom_ops import GeometryStack
        elems = to.sampled_elements
        assert isinstance(elems, GeometryStack)
        comps = []
        names = to.resolution.names
        for dim, g in zip(names, elems.geometries):
            comp_values = value.values.vector[dim] if 'vector' in value.values.shape else value.values
            comp = Field(value.geometry, comp_values, value.boundary)
            comps.append(_scatter_to_centered(comp, g, scatter, outside_handling, soft, balance,
                                              extrap=to.boundary))
        return stack(comps, dual(vector=names))
    return _scatter_to_centered(value, to.geometry, scatter, outside_handling, soft, balance, extrap=to.boundary)


def _scatter_to_centered(value: Field, grid: UniformGrid, scatter: bool, outside_handling: str,
                         soft: bool, balance, extrap) -> Tensor:
    if scatter:
        assert isinstance(grid, UniformGrid)
        points = value.points
        fast = _p2g_fast_path(value, grid, outside_handling)
        if fast is not None:
            return fast
        idx = grid.voxel_at(points, clamp=(outside_handling == 'clamp'))
        # unwritten cells default to the PARTICLE field's boundary value — NaN for
        # FLIP free-surface grids (reference: grid_scatter, _resample.py:236-238
        # `base += data.boundary.value`; distribute_points default extrapolation=NAN)
        base = ops.zeros(grid.resolution & value.values.shape.non_instance.non_spatial)
        if isinstance(value.boundary, ConstantExtrapolation):
            base = base + value.boundary.value
        result = ops.scatter(base, idx, value.values, mode='mean', outside_handling=outside_handling)
        return result
    # overlap-based (no scatter): accumulate fraction-weighted values per cell
    points_geom = value.geometry
    if soft:
        # (cells, points) overlap would be O(N·M); restrict to hard centers for large sets
        frac = points_geom.approximate_fraction_inside(grid, balance)
        return frac if not value.shape.channel else frac * _mean_value(value)
    inside = points_geom.lies_inside(grid.center)
    result = ops.to_float(inside)
    if value.shape.channel:
        result = result * _mean_value(value)
    return result


def _p2g_fast_path(value: Field, grid: UniformGrid, outside_handling: str):
    """Dispatch the scalar 3D P2G mean-scatter to the MXU one-hot kernel
    (ops/p2g.py — VERDICT r4 #2; XLA's serialized scatter costs ~2.5 ms per
    contrib+counts pair at 125k particles where the contraction costs ~0.5 ms).
    Returns the scattered Tensor or None (generic math.scatter path)."""
    from ..ops import p2g as _p2g
    from ..math import Tensor, spatial
    import numpy as _np
    if not (_p2g.pallas_ok() or _p2g.FORCE_INTERPRET):
        return None
    points = value.points
    inst = points.shape.instance
    vals = value.values
    if inst.rank != 1 or 'vector' not in points.shape:
        return None
    # scalar value per particle; uniform base (boundary constant or 0)
    if vals.shape.names not in ((inst.name,),):
        return None
    res = tuple(int(s) for s in grid.resolution.sizes)
    if len(res) != 3 or not _p2g.supported(res, inst.volume):
        return None
    if isinstance(value.boundary, ConstantExtrapolation):
        try:
            base = float(_np.asarray(value.boundary.value.native()))
        except Exception:
            return None
    else:
        base = 0.0
    try:
        lower = tuple(float(v) for v in _np.asarray(grid.bounds.lower.native()).reshape(-1))
        inv_dx = tuple(1.0 / float(v) for v in _np.asarray(grid.dx.native(grid.dx.shape.names)).reshape(-1))
    except Exception:
        return None  # traced geometry: generic path
    dims = grid.resolution.names
    pos = points.native((inst.name, 'vector'))  # (N, 3) in dim order
    order = points.shape.get_labels('vector')
    if tuple(order) != tuple(dims):
        return None
    out = _p2g.p2g_mean_3d(pos, vals.native((inst.name,)), res, lower, inv_dx,
                           outside_handling == 'clamp', base)
    return Tensor(out, spatial(**dict(zip(dims, res))))


def _mean_value(value: Field):
    inst = value.values.shape.instance
    return ops.mean(value.values, inst) if inst else value.values


def grid_scatter(data: Field, bounds: Box, resolution: Shape, outside_handling: str = 'discard', mode='mean') -> Tensor:
    """Scatter point values into a new grid (reference: phi/field/_resample.py:220)."""
    grid = UniformGrid(resolution, bounds)
    idx = grid.voxel_at(data.points, clamp=(outside_handling == 'clamp'))
    base = ops.zeros(resolution)
    return ops.scatter(base, idx, data.values, mode=mode, outside_handling=outside_handling)


def _sample_points_at_points(value: Field, target: Geometry) -> Tensor:
    """Nearest-neighbor transfer between point sets; exact when positions match."""
    src_pts = value.points
    tgt_pts = target.center
    src_inst = src_pts.shape.instance
    if src_inst and tgt_pts.shape.instance and src_inst.volume == tgt_pts.shape.instance.volume:
        return rename_dims(value.values, src_inst, tgt_pts.shape.instance) \
            if src_inst.names != tgt_pts.shape.instance.names else value.values
    idx = ops.find_closest(src_pts, tgt_pts)
    return ops.gather(value.values, idx, dims=src_inst)
