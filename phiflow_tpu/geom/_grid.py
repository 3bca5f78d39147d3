"""UniformGrid — the discretization anchor of all grid Fields
(reference: /root/reference/phi/geom/_grid.py:41-240).

A UniformGrid is `resolution` (spatial Shape) + `bounds` (Box). It is a pytree:
bounds tensors trace through jit; the resolution is static — this is exactly the
static-shape contract XLA needs.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax

from ..math import (
    Tensor, Shape, EMPTY_SHAPE, wrap, channel, spatial, dual, stack, linspace, meshgrid,
    rename_dims, const_vec,
)
from ..math import _ops as ops
from ..math import extrapolation as extrapolation_mod
from ..math._magic import slicing_dict
from ._geom import Geometry
from ._box import Box, BaseBox, Cuboid

__all__ = ['UniformGrid', 'enclosing_grid']


def _get_bounds(bounds, resolution: Shape) -> Box:
    if bounds is None:
        return Box(const_vec(0, resolution), wrap([float(s) for s in resolution.sizes], channel(vector=resolution.names)))
    if isinstance(bounds, BaseBox):
        return bounds.corner_representation()
    if isinstance(bounds, (int, float)):
        return Box(const_vec(0, resolution), const_vec(float(bounds), resolution))
    raise ValueError(f"bounds must be Box, float or None, got {type(bounds)}")


class UniformGrid(Geometry):
    """All cells of a regular grid as a batch of boxes."""

    def __init__(self, resolution: Shape = None, bounds=None, **resolution_):
        resolution = (resolution or EMPTY_SHAPE).spatial & spatial(**resolution_)
        bounds = _get_bounds(bounds, resolution)
        labels = bounds.shape.get_labels('vector')
        if labels:
            resolution = resolution.only(labels, reorder=True)
        self.resolution = resolution
        self._bounds = bounds

    @property
    def bounds(self) -> Box:
        return self._bounds

    @property
    def spatial_rank(self) -> int:
        return self.resolution.rank

    @property
    def shape(self) -> Shape:
        return self.resolution & self.bounds.shape.non_channel & channel(vector=self.resolution.names)

    @property
    def center(self) -> Tensor:
        local = meshgrid(**{d.name: d.size for d in self.resolution.dims})
        local = (ops.to_float(local) + 0.5) / wrap([float(s) for s in self.resolution.sizes],
                                                   channel(vector=self.resolution.names))
        return self.bounds.local_to_global(local)

    @property
    def dx(self) -> Tensor:
        return self.bounds.size / wrap([float(s) for s in self.resolution.sizes],
                                       channel(vector=self.resolution.names))

    size = dx

    @property
    def grid_size(self):
        return self.bounds.size

    @property
    def half_size(self):
        return self.dx * 0.5

    @property
    def lower(self):
        return self.center - self.half_size

    @property
    def upper(self):
        return self.center + self.half_size

    @property
    def volume(self) -> Tensor:
        return ops.prod(self.dx, 'vector')

    def position_of(self, voxel_index: Tensor) -> Tensor:
        return self.bounds.lower + (ops.to_float(voxel_index) + 0.5) * self.dx

    def voxel_at(self, location: Tensor, clamp=True) -> Tensor:
        float_idx = (location - self.bounds.lower) / self.dx
        index = ops.to_int32(ops.floor(float_idx))
        if clamp:
            upper = wrap([s - 1 for s in self.resolution.sizes], channel(vector=self.resolution.names))
            index = ops.minimum(ops.maximum(index, 0), upper)
        return index

    # --- faces (reference: phi/geom/_grid.py:86-117) ---
    @property
    def boundary_faces(self) -> Dict[str, Dict[str, object]]:
        result = {}
        for dim in self.resolution.names:
            result[dim + '-'] = {'~vector': dim, dim: slice(1)}
            result[dim + '+'] = {'~vector': dim, dim: slice(-1, None)}
        return result

    @property
    def face_centers(self) -> Tensor:
        centers = [self.stagger(dim, True, True).center for dim in self.resolution.names]
        return stack(centers, dual(vector=self.resolution.names))

    @property
    def faces(self) -> Geometry:
        from ._geom_ops import GeometryStack
        slices = tuple(self.stagger(d, True, True) for d in self.resolution.names)
        return GeometryStack(slices, dual(vector=self.resolution.names))

    @property
    def face_normals(self) -> Tensor:
        normals = [ops.vec(**{d: float(d == dim) for d in self.resolution.names}) for dim in self.resolution.names]
        return stack(normals, dual(vector=self.resolution.names))

    @property
    def face_areas(self) -> Tensor:
        labels = self.resolution.names
        areas = [ops.prod(self.dx[{'vector': [d for d in labels if d != dim]}], 'vector') if len(labels) > 1 else wrap(1.)
                 for dim in labels]
        return stack(areas, dual(vector=labels), expand_values=True)

    @property
    def face_shape(self) -> Shape:
        from ..math._shape import Dim, DUAL
        return Shape((Dim('~vector', len(self.resolution.names), DUAL, tuple(self.resolution.names)),)) & self.resolution

    # --- staggering (reference: phi/geom/_grid.py:204-230) ---
    def stagger(self, dim: str, lower: bool, upper: bool) -> 'UniformGrid':
        mask = np.array([1. if d == dim else 0. for d in self.resolution.names])
        unit = self.dx * wrap(mask, channel(vector=self.resolution.names))
        bounds = Box(self.bounds.lower + unit * (-0.5 if lower else 0.5),
                     self.bounds.upper + unit * (0.5 if upper else -0.5))
        sizes = [s + (int(lower) + int(upper) - 1 if d == dim else 0)
                 for d, s in zip(self.resolution.names, self.resolution.sizes)]
        return UniformGrid(self.resolution.with_sizes(sizes), bounds)

    def staggered_cells(self, boundaries) -> Dict[str, 'UniformGrid']:
        return {dim: self.stagger(dim, *boundaries.valid_outer_faces(dim)) for dim in self.resolution.names}

    def padded(self, widths: dict) -> 'UniformGrid':
        resolution, bounds = self.resolution, self.bounds
        for dim, (lower, upper) in widths.items():
            masked_dx = self.dx * ops.dim_mask(self.resolution, dim)
            resolution = resolution.with_dim_size(dim, resolution.get_size(dim) + lower + upper)
            bounds = Box(bounds.lower - masked_dx * lower, bounds.upper + masked_dx * upper)
        return UniformGrid(resolution, bounds)

    def with_scaled_resolution(self, scale) -> 'UniformGrid':
        return UniformGrid(self.resolution.with_sizes([int(s * scale) for s in self.resolution.sizes]), self.bounds)

    # --- geometry interface ---
    def lies_inside(self, location: Tensor) -> Tensor:
        return self.bounds.lies_inside(location)

    def approximate_signed_distance(self, location: Tensor) -> Tensor:
        return self.bounds.approximate_signed_distance(location)

    def bounding_radius(self) -> Tensor:
        return ops.vec_length(self.half_size)

    def bounding_half_extent(self) -> Tensor:
        return self.half_size

    def bounding_box(self) -> Box:
        return self.bounds

    def corner_representation(self) -> Box:
        return Box(self.lower, self.upper)

    box = corner_representation

    def center_representation(self) -> Cuboid:
        return Cuboid(self.center, self.half_size)

    cuboid = center_representation

    def at(self, center: Tensor) -> Geometry:
        if center.shape.spatial:
            return Cuboid(center, self.half_size)
        return UniformGrid(self.resolution, self.bounds.at(center))

    def shifted(self, delta: Tensor) -> Geometry:
        if delta.shape.spatial:
            return Cuboid(self.center + delta, self.half_size)
        return UniformGrid(self.resolution, self.bounds.shifted(delta))

    def rotated(self, angle) -> Geometry:
        raise NotImplementedError("Grids cannot be rotated; use center_representation()")

    def scaled(self, factor) -> 'UniformGrid':
        return UniformGrid(self.resolution, self.bounds.scaled(factor))

    def __getitem__(self, item):
        item = slicing_dict(self, item)
        resolution = self.resolution
        bounds = self.bounds
        if 'vector' in item:
            sel = item['vector']
            if isinstance(sel, str):
                names = [n.strip() for n in sel.split(',')]
            elif isinstance(sel, (list, tuple)):
                names = list(sel)
            else:
                names = [resolution.names[sel]] if isinstance(sel, int) else list(resolution.names)
            resolution = resolution.only(names, reorder=True)
            bounds = Box(bounds.lower[{'vector': ','.join(names)}] if len(names) > 1 else bounds.lower[{'vector': names[0]}],
                         bounds.upper[{'vector': ','.join(names)}] if len(names) > 1 else bounds.upper[{'vector': names[0]}])
            if len(names) == 1:
                # keep vector dim with single entry
                lo = stack({names[0]: bounds.lower}, channel('vector'))
                up = stack({names[0]: bounds.upper}, channel('vector'))
                bounds = Box(lo, up)
        for dim, sel in item.items():
            if dim in resolution:
                assert isinstance(sel, slice), f"grid dims can only be sliced with slices, got {dim}: {sel}"
                start = sel.start or 0
                stop = sel.stop if sel.stop is not None else resolution.get_size(dim)
                if start < 0:
                    start += self.resolution.get_size(dim)
                if stop < 0:
                    stop += self.resolution.get_size(dim)
                mask = ops.dim_mask(self.resolution, dim)
                lower = bounds.lower + start * mask * self.dx
                upper = bounds.upper + (stop - self.resolution.get_size(dim)) * mask * self.dx
                bounds = Box(lower, upper)
                resolution = resolution.with_dim_size(dim, stop - start)
        return UniformGrid(resolution, bounds)

    def __eq__(self, other):
        return isinstance(other, UniformGrid) and self.resolution == other.resolution and self.bounds == other.bounds

    def __hash__(self):
        return hash(self.resolution)

    def __repr__(self):
        return f"{self.resolution}, bounds={self.bounds}"


def _grid_flatten(g: UniformGrid):
    """UniformGrid is fully static under jit (matches the reference semantics:
    Field.variable_attrs=('values',) — geometry is not traced,
    /root/reference/phi/field/_field.py:78-81). Static bounds let half-cell
    alignment checks resolve at trace time so center↔face resampling lowers to
    pad+average instead of gathers (big TPU win)."""
    import numpy as np
    from ..math._static import HashableArray
    try:
        lower = np.asarray(g.bounds.lower.native())
        upper = np.asarray(g.bounds.upper.native())
        labels = g.bounds.shape.get_labels('vector')
        return (), (g.resolution, HashableArray(lower), HashableArray(upper), labels)
    except Exception:  # traced bounds (grid built from traced values): keep dynamic
        return (g.bounds,), (g.resolution, None, None, None)


def _grid_unflatten(aux, children):
    resolution, lower, upper, labels = aux
    if lower is None:
        return UniformGrid(resolution, children[0])
    from ..math import wrap, channel
    bounds = Box(wrap(lower.array, channel(vector=labels)), wrap(upper.array, channel(vector=labels)))
    return UniformGrid(resolution, bounds)


jax.tree_util.register_pytree_node(UniformGrid, _grid_flatten, _grid_unflatten)


def enclosing_grid(*geometries: Geometry, voxel_count: int, rel_margin=0., abs_margin=0.) -> UniformGrid:
    """Smallest uniform grid covering all `geometries` with ≈`voxel_count` cells
    (reference: phi/geom/_grid.py:269)."""
    from ._box import bounding_box
    boxes = [g.bounding_box() for g in geometries]
    lower = ops.min_([b.lower for b in boxes])
    upper = ops.max_([b.upper for b in boxes])
    center, half = (lower + upper) / 2, (upper - lower) / 2
    half = half * (1 + rel_margin) + abs_margin
    bounds = Box(center - half, center + half)
    size_np = np.asarray(bounds.size.native())
    volume = float(np.prod(size_np))
    cell_vol = volume / voxel_count
    d = len(size_np)
    cell_size = cell_vol ** (1 / d)
    sizes = {n: max(1, int(round(float(s) / cell_size))) for n, s in zip(bounds.shape.get_labels('vector'), size_np)}
    return UniformGrid(spatial(**sizes), bounds)
