"""CenteredGrid / StaggeredGrid constructor functions
(reference: /root/reference/phi/field/_grid.py:21-201 — in PhiFlow 3.x these are
functions returning a unified `Field`, SURVEY.md §2.3).
"""
from __future__ import annotations

from numbers import Number
from typing import Union

import numpy as np

from ..math import Shape, Tensor, TensorStack, wrap, spatial, channel, dual, batch, stack, unstack, expand, rename_dims
from ..math import _ops as ops
from ..math.extrapolation import Extrapolation
from ..geom import Geometry, Box, BaseBox, UniformGrid
from ._field import Field, FieldInitializer, as_boundary

__all__ = ['CenteredGrid', 'StaggeredGrid', 'unstack_staggered_tensor', 'expand_staggered',
           'resolution_from_staggered_tensor', 'Grid', 'grid_sample_coords']

Grid = Field  # alias (reference: phi.field.Grid type alias)


def _get_resolution(resolution, resolution_, bounds) -> Shape:
    if isinstance(resolution, int):
        assert bounds is not None and isinstance(bounds, BaseBox)
        names = bounds.shape.get_labels('vector')
        return spatial(**{n: resolution for n in names})
    res = (resolution or spatial()) & spatial(**{k: int(v) for k, v in resolution_.items()})
    return res


def CenteredGrid(values=0., boundary=0., bounds=None, resolution=None,
                 extrapolation=None, convert=True, **resolution_) -> Field:
    """Create a Field sampled at cell centers of a uniform grid
    (reference: phi/field/_grid.py:21)."""
    boundary = boundary if extrapolation is None else extrapolation
    boundary = as_boundary(boundary, UniformGrid)
    if resolution is None and not resolution_:
        assert isinstance(values, Tensor), "resolution must be specified when values is not a Tensor"
        resolution = values.shape.spatial
        bounds = _as_bounds(bounds, resolution)
        elements = UniformGrid(resolution, bounds)
    else:
        resolution = _get_resolution(resolution, resolution_, bounds)
        bounds = _as_bounds(bounds, resolution)
        elements = UniformGrid(resolution, bounds)
        if isinstance(values, Tensor):
            values = expand(values, resolution)
        elif isinstance(values, (Number, bool)):
            values = expand(wrap(values), resolution)
        # Geometry / Field / FieldInitializer / callable handled by Field ctor sampling
    if isinstance(values, Tensor) and values.dtype.kind not in 'fc':
        values = ops.to_float(values)
    result = Field(elements, values, boundary)
    if result.values.dtype.kind not in 'fc':
        result = result.with_values(ops.to_float(result.values))
    return result


def StaggeredGrid(values=0., boundary=0., bounds=None, resolution=None,
                  extrapolation=None, convert=True, **resolution_) -> Field:
    """Create a Field sampled at the face centers of a uniform grid (MAC layout).

    Component sizes along their own dim depend on `boundary.valid_outer_faces`
    (reference: phi/field/_grid.py:89-167). Values are stored as a TensorStack
    over the dual dim '~vector' — one uniform jax.Array per axis.
    """
    boundary = boundary if extrapolation is None else extrapolation
    boundary = as_boundary(boundary, UniformGrid)
    if resolution is None and not resolution_:
        assert isinstance(values, Tensor), "resolution must be specified when values is not a Tensor"
        assert '~vector' in values.shape or 'vector' in values.shape, "need staggered components"
        if '~vector' not in values.shape:
            resolution = resolution_from_staggered_tensor(values, boundary)
            values = unstack_staggered_tensor(values, boundary)
        else:
            resolution = _staggered_resolution(values, boundary)
        bounds = _as_bounds(bounds, resolution)
        elements = UniformGrid(resolution, bounds)
        return Field(elements, values, boundary)
    resolution = _get_resolution(resolution, resolution_, bounds)
    bounds = _as_bounds(bounds, resolution)
    elements = UniformGrid(resolution, bounds)
    if isinstance(values, Tensor):
        if '~vector' in values.shape:
            pass  # already staggered components
        elif 'vector' in values.shape and values.shape.spatial:
            # possibly a padded staggered tensor (resolution+1); else component stack
            if all(values.shape.get_size(d) == resolution.get_size(d) + 1 for d in resolution.names):
                values = unstack_staggered_tensor(values, boundary)
            else:
                values = rename_dims(values, 'vector', dual(vector=resolution.names))
        else:
            values = expand_staggered(values, resolution, boundary)
    elif isinstance(values, (Number, bool)):
        values = expand_staggered(wrap(float(values)), resolution, boundary)
    elif isinstance(values, (tuple, list)):
        values = expand_staggered(wrap(list(values), channel(vector=resolution.names)), resolution, boundary)
    else:
        from ._resample import sample
        values = sample(values, elements, at='face', boundary=boundary, dot_face_normal=elements)
    if isinstance(values, Tensor) and 'vector' in values.shape and '~vector' in values.shape:
        values = stack([values[{'vector': i, '~vector': i}] for i in range(resolution.rank)],
                       dual(vector=resolution.names))
    result = Field(elements, values, boundary)
    if result.values.dtype.kind not in 'fc':
        result = result.with_values(result.values._op1(lambda n: n.astype(np.float32)))
    return result


def _as_bounds(bounds, resolution: Shape) -> Box:
    if bounds is None:
        return Box(**{n: float(s) for n, s in zip(resolution.names, resolution.sizes)})
    if isinstance(bounds, (int, float)):
        return Box(**{n: float(bounds) for n in resolution.names})
    assert isinstance(bounds, BaseBox)
    return bounds.corner_representation()


def _staggered_resolution(values: Tensor, ext: Extrapolation) -> Shape:
    comps = unstack(values, '~vector')
    labels = values.shape.get_labels('~vector') or values.shape.spatial.names
    sizes = {}
    for dim, comp in zip(labels, comps):
        lo, up = ext.valid_outer_faces(dim)
        sizes[dim] = comp.shape.get_size(dim) - int(lo) - int(up) + 1
    return spatial(**sizes)


def unstack_staggered_tensor(data: Tensor, extrapolation: Extrapolation) -> TensorStack:
    """Slice a padded uniform staggered tensor (resolution+1 per dim) into
    per-axis components (reference: phi/field/_grid.py:179-187)."""
    sliced = []
    names = data.shape.spatial.names
    for dim in names:
        component = data[{'vector': dim}] if 'vector' in data.shape else data
        lo_valid, up_valid = extrapolation.valid_outer_faces(dim)
        slices = {d: slice(0, -1) for d in names}
        slices[dim] = slice(int(not lo_valid), (-int(not up_valid)) or None)
        sliced.append(component[slices])
    return stack(sliced, dual(vector=names))


def expand_staggered(values: Tensor, resolution: Shape, extrapolation: Extrapolation) -> Tensor:
    """Expand a constant / vector to staggered components (reference: phi/field/_grid.py:190-199)."""
    cells = UniformGrid(resolution, Box(**{n: 1. for n in resolution.names}))
    if 'vector' in values.shape:
        components = [values[{'vector': i}] for i in range(resolution.rank)]
    else:
        components = [values] * resolution.rank
    tensors = []
    for dim, component in zip(resolution.names, components):
        comp_cells = cells.stagger(dim, *extrapolation.valid_outer_faces(dim))
        tensors.append(expand(component, comp_cells.resolution))
    return stack(tensors, dual(vector=resolution.names))


def resolution_from_staggered_tensor(values: Tensor, extrapolation: Extrapolation) -> Shape:
    any_dim = values.shape.spatial.names[0]
    x_shape = values.shape.spatial
    ext_lower, ext_upper = extrapolation.valid_outer_faces(any_dim)
    delta = int(ext_lower) + int(ext_upper) - 1
    if '~vector' in values.shape:
        return _staggered_resolution(values, extrapolation)
    return x_shape.with_sizes([s - 1 for s in x_shape.sizes])


def grid_sample_coords(field: Field, world_pos: Tensor, component_dim: str = None) -> Tensor:
    """World position → float index coordinates of a (component) grid."""
    resolution = field.resolution
    local = field.bounds.global_to_local(world_pos)
    return local * wrap([float(s) for s in resolution.sizes], channel(vector=resolution.names)) - 0.5
