"""Field — a physical quantity sampled on a Geometry with boundary conditions.

TPU-native rebuild of the reference's unified Field dataclass
(/root/reference/phi/field/_field.py:49-881, SURVEY.md §2.3). One class covers
centered grids, staggered grids, point clouds and (later) meshes — the
discretization is determined by `geometry` and by which of its sample-point sets
the `values` match.

Staggered grids store values as a `TensorStack` over the dual dim ``~vector``
with per-component spatial sizes determined by
``boundary.valid_outer_faces(dim)`` — each component is a uniform, shardable
`jax.Array` (the dict-of-arrays design from SURVEY.md §7 step 1).

Field is a JAX pytree (geometry, values, boundary all traced), so physics
functions on Fields jit/grad/vmap/shard_map natively.
"""
from __future__ import annotations

import warnings
from numbers import Number
from typing import Callable, Tuple, Union

import numpy as np
import jax

from ..math import (
    Shape, Tensor, TensorStack, EMPTY_SHAPE, wrap, tensor, channel, spatial, dual, batch, instance,
    non_batch, merge_shapes, concat_shapes, stack, unstack, expand, rename_dims,
)
from ..math import _ops as ops
from ..math import extrapolation as extrapolation_mod
from ..math.extrapolation import Extrapolation, ConstantExtrapolation, domain_slice
from ..math._magic import BoundDim, slicing_dict
from ..geom import Geometry, Box, BaseBox, Point, UniformGrid, Sphere

__all__ = ['Field', 'FieldInitializer', 'as_boundary', 'is_staggered', 'get_sample_points']


class FieldInitializer:
    """Protocol for analytic initializers (Noise, masks, AngularVelocity)
    (reference: phi/field/_field.py:17-21)."""

    def _sample(self, geometry: Geometry, at: str, boundaries: Extrapolation, **kwargs) -> Tensor:
        raise NotImplementedError(type(self))


def as_boundary(obj, geometry=None) -> Extrapolation:
    """Convert a value to an Extrapolation (reference: phi/field/_field.py as_boundary)."""
    if isinstance(obj, Extrapolation):
        return obj
    if isinstance(obj, Field):
        from ._embed import FieldEmbedding
        return FieldEmbedding(obj)
    if isinstance(obj, dict):
        converted = {k: as_boundary(v) for k, v in obj.items()}
        return extrapolation_mod.combine_sides(**converted)
    if isinstance(obj, (int, float, complex, Tensor)):
        return ConstantExtrapolation(wrap(obj))
    if obj is None:
        return extrapolation_mod.NONE
    return extrapolation_mod.as_extrapolation(obj)


def is_staggered(values, geometry: Geometry) -> bool:
    """Whether `values` are sampled at element faces (dual dims present)
    (reference: phi/field/_field.py:867)."""
    return bool(values.shape.dual) if isinstance(values, Tensor) else False


class Field:
    """See module docstring. Construct via `Field(geometry, values, boundary)`
    or the `CenteredGrid` / `StaggeredGrid` / `PointCloud` convenience functions."""

    def __init__(self, geometry: Geometry, values, boundary=0., **sampling_kwargs):
        assert isinstance(geometry, Geometry), f"geometry must be a Geometry but got {type(geometry)}"
        boundary = as_boundary(boundary, geometry)
        if values is not None and not isinstance(values, Tensor):
            if isinstance(values, (Number, bool)):
                values = wrap(values)
            elif isinstance(values, (tuple, list)) and len(values) == geometry.spatial_rank:
                values = wrap(list(values), channel(vector=geometry.shape.get_labels('vector')))
            else:
                from ._resample import sample
                values = sample(values, geometry, 'center', boundary, **sampling_kwargs)
        if isinstance(values, Tensor) and not values.shape.dual:
            # expand to element centers if not matching any sample set
            sets = geometry.sets
            matching = [s for s, s_shape in sets.items() if all(n in values.shape for n in s_shape.names)]
            if not matching:
                target = non_batch(geometry).non_channel
                values = expand(values, target.without(values.shape.names))
        self._geometry = geometry
        self._values = values
        self._boundary = boundary

    # --- core attributes ---
    @property
    def geometry(self) -> Geometry:
        return self._geometry

    elements = geometry

    @property
    def values(self) -> Tensor:
        return self._values

    data = values

    @property
    def boundary(self) -> Extrapolation:
        return self._boundary

    extrapolation = boundary

    @property
    def shape(self) -> Shape:
        if self.is_staggered and self.is_grid:
            resolution = self._geometry.resolution
            extra = self._values.shape.without(resolution.names).without('~vector')
            from ..math._shape import Dim, DUAL, CHANNEL
            vec = Shape((Dim('vector', len(resolution.names), CHANNEL, tuple(resolution.names)),))
            return concat_shapes(extra.batch, resolution, vec)
        return merge_shapes(self._values.shape, batch(self._geometry))

    @property
    def spatial_rank(self) -> int:
        return self._geometry.spatial_rank

    @property
    def resolution(self) -> Shape:
        return self._geometry.shape.non_channel.non_dual.non_batch

    @property
    def bounds(self) -> BaseBox:
        """Physical extent: grid bounds, or bounding box of the geometry."""
        if hasattr(self._geometry, 'bounds') and isinstance(self._geometry.bounds, BaseBox):
            return self._geometry.bounds
        center = self.center
        extent = self._geometry.bounding_half_extent()
        lo = ops.min_(center - extent, center.shape.non_batch.without('vector'))
        up = ops.max_(center + extent, center.shape.non_batch.without('vector'))
        return Box(lo, up)

    box = bounds

    @property
    def dx(self) -> Tensor:
        assert self.resolution.spatial, f"dx requires a grid but got {self._geometry}"
        return self.bounds.size / wrap([float(s) for s in self.resolution.sizes],
                                       channel(vector=self.resolution.names))

    @property
    def is_grid(self) -> bool:
        return isinstance(self._geometry, UniformGrid)

    @property
    def is_mesh(self) -> bool:
        try:
            from ..geom._mesh import Mesh
            return isinstance(self._geometry, Mesh)
        except ImportError:
            return False

    @property
    def is_graph(self) -> bool:
        try:
            from ..geom._graph import Graph
            return isinstance(self._geometry, Graph)
        except ImportError:
            return False

    @property
    def is_point_cloud(self) -> bool:
        if isinstance(self._geometry, (UniformGrid,)):
            return False
        if isinstance(self._geometry, (Point, Sphere)):
            return True
        from ..geom import _geom_ops
        if isinstance(self._geometry, _geom_ops.GeometryStack):
            return True
        return bool(self._geometry.shape.instance)

    @property
    def is_staggered(self) -> bool:
        return is_staggered(self._values, self._geometry)

    @property
    def is_centered(self) -> bool:
        return not self.is_staggered

    @property
    def sampled_at(self) -> str:
        return 'face' if self.is_staggered else 'center'

    @property
    def sampled_elements(self) -> Geometry:
        """The geometry at whose points the values are sampled: `geometry` for
        centered fields, the face grids for staggered fields."""
        if self.is_staggered and self.is_grid:
            from ..geom._geom_ops import GeometryStack
            grids = tuple(self._geometry.stagger(d, *self._boundary.valid_outer_faces(d))
                          for d in self.resolution.names)
            return GeometryStack(grids, dual(vector=self.resolution.names))
        return self._geometry

    @property
    def cells(self):
        assert self.is_grid
        return self._geometry

    @property
    def grid(self) -> UniformGrid:
        assert isinstance(self._geometry, UniformGrid)
        return self._geometry

    @property
    def center(self) -> Tensor:
        """Sample-point locations."""
        return self.sampled_elements.center

    points = center

    @property
    def face_centers(self):
        return self._geometry.face_centers

    @property
    def face_normals(self):
        return self._geometry.face_normals

    @property
    def face_areas(self):
        return self._geometry.face_areas

    @property
    def boundary_names(self) -> Tuple[str, ...]:
        if self.is_grid:
            return tuple(self.resolution.names)
        keys = getattr(self._geometry, 'boundaries', None)
        return tuple(keys) if keys else tuple(self.resolution.names)

    @property
    def dtype(self):
        return self._values.dtype

    # --- modification ---
    def with_values(self, values, **sampling_kwargs) -> 'Field':
        if not isinstance(values, Tensor) and not callable(values) and isinstance(values, (Number, bool)):
            if self.is_staggered:
                comps = [ops.zeros_like(c) + values for c in self._values.components] \
                    if isinstance(self._values, TensorStack) else None
                if comps is not None:
                    return Field(self._geometry, TensorStack(comps, self._values.stack_dim), self._boundary)
            values = wrap(values)
        return Field(self._geometry, values, self._boundary, **sampling_kwargs)

    def with_boundary(self, boundary) -> 'Field':
        """Change the boundary condition. For staggered grids, component sizes may
        change (valid_outer_faces); values are re-padded/trimmed accordingly
        (reference: with_extrapolation, phi/field/_field.py:455-476)."""
        boundary = as_boundary(boundary, self._geometry)
        if self.is_staggered and self.is_grid and boundary != self._boundary:
            comps = []
            for dim in self.resolution.names:
                comp = self.vector[dim]
                old_lo, old_up = self._boundary.valid_outer_faces(dim)
                new_lo, new_up = boundary.valid_outer_faces(dim)
                v = comp.values
                if old_lo and not new_lo:
                    v = v[{dim: slice(1, None)}]
                elif not old_lo and new_lo:
                    v = self._boundary[{'vector': dim}].pad(v, {dim: (1, 0)})
                if old_up and not new_up:
                    v = v[{dim: slice(0, -1)}]
                elif not old_up and new_up:
                    v = self._boundary[{'vector': dim}].pad(v, {dim: (0, 1)})
                comps.append(v)
            values = stack(comps, dual(vector=self.resolution.names))
            return Field(self._geometry, values, boundary)
        return Field(self._geometry, self._values, boundary)

    with_extrapolation = with_boundary

    def with_geometry(self, geometry: Geometry) -> 'Field':
        return Field(geometry, self._values, self._boundary)

    with_elements = with_geometry

    def with_bounds(self, bounds: Box) -> 'Field':
        assert self.is_grid
        return Field(UniformGrid(self._geometry.resolution, bounds), self._values, self._boundary)

    def shifted(self, delta) -> 'Field':
        return self.with_geometry(self._geometry.shifted(delta))

    def at(self, representation, keep_boundary=False, **kwargs) -> 'Field':
        """Resample to the sample points of `representation`
        (reference: phi/field/_field.py:349)."""
        from ._resample import resample
        return resample(self, representation, keep_boundary, **kwargs)

    def at_centers(self, **kwargs) -> 'Field':
        if self.is_centered:
            return self
        from ._resample import sample
        values = sample(self, self._geometry, at='center', boundary=self._boundary, **kwargs)
        return Field(self._geometry, values, self._boundary)

    def at_faces(self, boundary=None, **kwargs) -> 'Field':
        if self.is_staggered and not boundary:
            return self
        boundary = as_boundary(boundary, self._geometry) if boundary else self._boundary
        from ._resample import sample
        values = sample(self, self._geometry, at='face', boundary=boundary, **kwargs)
        return Field(self._geometry, values, boundary)

    def sample(self, where, at: str = 'center', **kwargs) -> Tensor:
        from ._resample import sample
        return sample(self, where, at=at, **kwargs)

    def closest_values(self, points: Tensor) -> Tensor:
        """Gather the 2^d neighboring grid values around each point
        (reference: phi/field/_field.py closest_values; used by MacCormack clamp)."""
        assert self.is_grid and self.is_centered
        local = self.bounds.global_to_local(points) * wrap(
            [float(s) for s in self.resolution.sizes], channel(vector=self.resolution.names)) - 0.5
        return ops.closest_grid_values(self._values, local, self._boundary)

    def grid_scatter(self, *args, **kwargs):
        from ._resample import grid_scatter
        return grid_scatter(self, *args, **kwargs)

    # --- staggered handling ---
    def uniform_values(self) -> Tensor:
        """Values as a single uniform tensor. For staggered grids, pads components
        to a common shape (`staggered_tensor`)."""
        if not isinstance(self._values, TensorStack) or self._values.is_uniform:
            return self._values if not isinstance(self._values, TensorStack) else self._values._contiguous()
        return self.staggered_tensor()

    def staggered_tensor(self) -> Tensor:
        """Pad all components to resolution+1 and stack into a uniform tensor
        (reference: phi/field/_field.py:586-604)."""
        assert self.is_staggered and self.is_grid
        padded = []
        for dim in self.resolution.names:
            comp = self._values[{'~vector': dim}]
            widths = {d: (0, 1) for d in self.resolution.names}
            lo_valid, up_valid = self._boundary.valid_outer_faces(dim)
            widths[dim] = (int(not lo_valid), int(not up_valid))
            ext = self._boundary[{'vector': dim}]
            padded.append(ops.pad(comp, widths, ext))
        from ..math._shape import Dim, CHANNEL
        vec = Shape((Dim('vector', len(self.resolution.names), CHANNEL, tuple(self.resolution.names)),))
        return stack(padded, vec)

    # --- numpy / display ---
    def numpy(self, order=None):
        if order is None and self.is_grid:
            if self.is_staggered:
                return [c.numpy() for c in unstack(self._values, '~vector')]
            order = self.shape.batch.names + self.resolution.names + self.shape.channel.names
        return self._values.numpy(order)

    def uniform_numpy(self, order=None):
        return self.uniform_values().numpy(order)

    # --- operators (reference: _op1/_op2 with boundary arithmetic, _field.py:774-813) ---
    def _op1(self, operator) -> 'Field':
        values = operator(self._values)
        extrapolation_ = operator(self._boundary)
        return Field(self._geometry, values, extrapolation_)

    def _op2(self, other, operator) -> 'Field':
        if isinstance(other, Geometry):
            raise ValueError(f"Cannot combine Field with Geometry {other}")
        if isinstance(other, Field):
            if self._geometry == other._geometry:
                values = operator(self._values, other._values)
                try:
                    extrapolation_ = operator(self._boundary, other._boundary)
                    if extrapolation_ is NotImplemented:
                        extrapolation_ = self._boundary
                except (TypeError, NotImplementedError):
                    extrapolation_ = self._boundary
                return Field(self._geometry, values, extrapolation_)
            from ._resample import sample
            other_values = sample(other, self._geometry, self.sampled_at, self._boundary, dot_face_normal=self._geometry)
            values = operator(self._values, other_values)
            try:
                boundary = operator(self._boundary, other._boundary)
            except Exception:
                boundary = self._boundary
            return Field(self._geometry, values, boundary)
        else:
            if isinstance(other, (tuple, list)):
                ch = self.shape.channel
                if ch.rank == 1 and ch.volume == len(other):
                    other = wrap(list(other), ch)
                else:
                    # scalar field × vector constant → vector field labeled by physical axes
                    labels = self._geometry.shape.get_labels('vector') or self.resolution.names
                    assert len(other) == len(labels), f"vector constant {other} does not match dims {labels}"
                    other = wrap(list(other), channel(vector=labels))
            else:
                other = wrap(other)
            if self.is_staggered and 'vector' in other.shape and 'vector' not in self._values.shape:
                # align vector constants with staggered components (reference: _field.py:811 as_dual)
                other = rename_dims(other, 'vector', dual(vector=other.shape.get_labels('vector')))
            values = operator(self._values, other)
            # constants don't affect boundary conditions (reference: _field.py:810 legacy behavior)
            return Field(self._geometry, values, self._boundary)

    def __add__(self, other): return self._op2(other, lambda a, b: a + b)
    def __radd__(self, other): return self._op2(other, lambda a, b: b + a)
    def __sub__(self, other): return self._op2(other, lambda a, b: a - b)
    def __rsub__(self, other): return self._op2(other, lambda a, b: b - a)
    def __mul__(self, other): return self._op2(other, lambda a, b: a * b)
    def __rmul__(self, other): return self._op2(other, lambda a, b: b * a)
    def __truediv__(self, other): return self._op2(other, lambda a, b: a / b)
    def __rtruediv__(self, other): return self._op2(other, lambda a, b: b / a)
    def __pow__(self, other): return self._op2(other, lambda a, b: a ** b)

    def __matmul__(self, other):
        """`self @ target` resamples onto `target`'s sample points (reference: _field.py:344)."""
        from ._resample import resample
        return resample(self, other)
    def __neg__(self): return self._op1(lambda x: -x)
    def __abs__(self): return self._op1(lambda x: abs(x))
    def __gt__(self, other): return self._op2(other, lambda a, b: a > b)
    def __ge__(self, other): return self._op2(other, lambda a, b: a >= b)
    def __lt__(self, other): return self._op2(other, lambda a, b: a < b)
    def __le__(self, other): return self._op2(other, lambda a, b: a <= b)
    def __and__(self, other):
        if isinstance(other, Field) and self.shape.instance and other.shape.instance:
            from ._field_math import concat
            return concat([self, other], self.shape.instance[0:1])
        return self._op2(other, lambda a, b: a & b)
    def __or__(self, other): return self._op2(other, lambda a, b: a | b)
    def __invert__(self): return self._op1(lambda x: ~x)

    def __getitem__(self, item) -> 'Field':
        item = slicing_dict(self, item)
        if not item:
            return self
        boundary = domain_slice(self._boundary, item, self.boundary_names)
        item_without_vec = {dim: sel for dim, sel in item.items() if dim != 'vector'}
        geometry = self._geometry[item_without_vec] if item_without_vec else self._geometry
        if self.is_staggered and 'vector' in item:
            # vector slice of a staggered grid selects the component grid(s)
            sel = item['vector']
            labels = self.resolution.names
            if isinstance(sel, int):
                names = [labels[sel]]
            elif isinstance(sel, str):
                names = [n.strip() for n in sel.split(',')]
            elif isinstance(sel, (tuple, list)):
                names = [labels[i] if isinstance(i, int) else i for i in sel]
            else:
                names = list(labels)
            item = dict(item)
            del item['vector']
            item['~vector'] = names[0] if len(names) == 1 else ','.join(names)
            if len(names) == 1:
                geometry = geometry.stagger(names[0], *self._boundary.valid_outer_faces(names[0])) \
                    if isinstance(geometry, UniformGrid) else geometry
        values = self._values[{k: v for k, v in item.items() if k in self._values.shape or k == '~vector'}]
        return Field(geometry, values, boundary)

    def dimension(self, name):
        return BoundDim(self, name)

    def __getattr__(self, name):
        if name.startswith('_'):
            raise AttributeError(name)
        if name == 'vector':
            # works for staggered (via slicing) and centered vector fields
            return BoundDim(self, 'vector')
        try:
            shape = self.shape
        except Exception:
            raise AttributeError(name)
        if name in shape:
            return BoundDim(self, name)
        raise AttributeError(f"Field has no attribute '{name}' (shape: {shape})")

    # --- convenience numerics (delegate to field math) ---
    def gradient(self, boundary=None, at='center', dims=None, stack_dim=channel('vector'),
                 order=2, implicit=None, scheme=None, upwind=None, gradient_extrapolation=None):
        from ._field_math import spatial_gradient
        return spatial_gradient(self, gradient_extrapolation if gradient_extrapolation is not None else boundary,
                                at=at, dims=dims, stack_dim=stack_dim, order=order, implicit=implicit, upwind=upwind)

    def divergence(self, order=2, implicit=None, upwind=None):
        from ._field_math import divergence
        return divergence(self, order=order, implicit=implicit, upwind=upwind)

    def curl(self, at='corner'):
        from ._field_math import curl
        return curl(self, at=at)

    def laplace(self, axes=None, gradient=None, order=2, implicit=None, weights=None, upwind=None, correct_skew=True):
        from ._field_math import laplace
        return laplace(self, axes=axes, gradient=gradient, order=order, implicit=implicit, weights=weights,
                       upwind=upwind, correct_skew=correct_skew)

    def downsample(self, factor: int):
        from ._field_math import downsample2x
        result = self
        while factor >= 2:
            result = downsample2x(result)
            factor /= 2
        return result

    def as_boundary(self) -> Extrapolation:
        from ._embed import FieldEmbedding
        return FieldEmbedding(self)

    # --- magic ---
    def __stack__(self, values, dim: Shape, **kwargs):
        from ._field_math import stack as field_stack
        return field_stack(values, dim, kwargs.get('bounds', None))

    @staticmethod
    def __concat__(values, dim, **kwargs):
        from ._field_math import concat as field_concat
        return field_concat(values, dim)

    def __expand__(self, dims: Shape, **kwargs):
        return self.with_values(expand(self._values, dims))

    def __value_attrs__(self):
        return ('values',)

    def __variable_attrs__(self):
        return ('values',)

    def __eq__(self, other):
        if not isinstance(other, Field):
            return False
        if self._geometry != other._geometry:
            return False
        if self._boundary != other._boundary:
            return False
        try:
            return bool(ops.always_close(self._values, other._values))
        except Exception:
            return False

    def __hash__(self):
        return hash((type(self._geometry).__name__,))

    def __repr__(self):
        kind = 'StaggeredGrid' if self.is_staggered and self.is_grid else \
            'CenteredGrid' if self.is_grid else \
            'PointCloud' if self.is_point_cloud else 'Field'
        try:
            return f"{kind}[{self.shape}, boundary={self._boundary}]"
        except Exception:
            return f"{kind}[{type(self._geometry).__name__}]"


def _mesh_type():
    from ..geom._mesh import Mesh
    return Mesh


def get_sample_points(geometry: Geometry, at: str, boundary: Extrapolation):
    if at == 'center':
        return geometry.center
    if at == 'face':
        return geometry.face_centers
    raise ValueError(at)


# --- pytree registration ---

def _field_flatten(f: Field):
    return (f._geometry, f._values, f._boundary), None


def _field_unflatten(aux, children):
    geometry, values, boundary = children
    obj = object.__new__(Field)
    obj._geometry = geometry
    obj._values = values
    obj._boundary = boundary
    return obj


jax.tree_util.register_pytree_node(Field, _field_flatten, _field_unflatten)
