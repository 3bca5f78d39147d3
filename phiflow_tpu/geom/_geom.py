"""Geometry base class and trivial geometries (Point, NoGeometry, InvertedGeometry).

TPU-native rebuild of the reference's geometry interface
(/root/reference/phi/geom/_geom.py:13-605, see SURVEY.md §2.2). Geometries are
immutable pytrees: their tensor attributes (centers, sizes) trace through
jax.jit/grad, while structure (dim names) is static.
"""
from __future__ import annotations

from typing import Dict, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from ..math import (
    Tensor, Shape, EMPTY_SHAPE, wrap, channel, spatial, instance, dual, batch,
    merge_shapes, concat_shapes, stack, expand,
)
from ..math import _ops as ops
from ..math._magic import BoundDim, slicing_dict

__all__ = ['Geometry', 'Point', 'NoGeometry', 'InvertedGeometry', 'invert', 'sample_function', 'rotate', 'scale',
           'GeometryException', 'assert_same_rank']


class GeometryException(Exception):
    """Raised when an operation is not defined for a geometry (reference: phi/geom/_geom.py)."""


def assert_same_rank(rank1, rank2, error_message):
    rank1 = rank1.spatial_rank if hasattr(rank1, 'spatial_rank') else rank1
    rank2 = rank2.spatial_rank if hasattr(rank2, 'spatial_rank') else rank2
    assert rank1 == rank2, f"{error_message} ranks {rank1} != {rank2}"


class Geometry:
    """Abstract base: a physical shape in d-dimensional space.

    Subclasses implement `center`, `shape`, `volume`, `lies_inside`,
    `approximate_signed_distance`, and optionally face sets for FVM
    (reference interface: phi/geom/_geom.py:13)."""

    @property
    def center(self) -> Tensor:
        raise NotImplementedError(type(self))

    @property
    def shape(self) -> Shape:
        raise NotImplementedError(type(self))

    @property
    def volume(self) -> Tensor:
        raise NotImplementedError(type(self))

    @property
    def spatial_rank(self) -> int:
        return self.shape.get_size('vector')

    # --- face interface (FVM; defaults: no faces) ---
    @property
    def face_centers(self) -> Tensor:
        raise NotImplementedError(f"{type(self)} does not define faces")

    @property
    def face_areas(self) -> Tensor:
        raise NotImplementedError(f"{type(self)} does not define faces")

    @property
    def face_normals(self) -> Tensor:
        raise NotImplementedError(f"{type(self)} does not define faces")

    @property
    def face_shape(self) -> Shape:
        return EMPTY_SHAPE

    @property
    def faces(self) -> 'Geometry':
        raise NotImplementedError(type(self))

    @property
    def boundary_elements(self) -> Dict[str, Dict[str, slice]]:
        return {}

    @property
    def boundary_faces(self) -> Dict[str, Dict[str, slice]]:
        return {}

    @property
    def sets(self) -> Dict[str, Shape]:
        """Named sample-point sets that a Field can match values against
        (reference: phi/geom/_geom.py:131; used by Field shape resolution)."""
        if self.face_shape and self.face_shape.volume > 0:
            return {'center': non_batch_non_channel(self.shape),
                    'face': self.face_shape.non_batch}
        return {'center': non_batch_non_channel(self.shape)}

    def get_points(self, set_key: str) -> Tensor:
        if set_key == 'center':
            return self.center
        if set_key == 'face':
            return self.face_centers
        raise ValueError(set_key)

    def get_boundary(self, set_key: str) -> Dict[str, Dict[str, slice]]:
        if set_key == 'center':
            return self.boundary_elements
        if set_key == 'face':
            return self.boundary_faces
        raise ValueError(set_key)

    # --- spatial queries ---
    def lies_inside(self, location: Tensor) -> Tensor:
        raise NotImplementedError(type(self))

    def approximate_signed_distance(self, location: Tensor) -> Tensor:
        raise NotImplementedError(type(self))

    def approximate_closest_surface(self, location: Tensor) -> Tuple[Tensor, Tensor, Tensor, Tensor, Tensor]:
        """Returns (signed_distance, delta, normal, offset, face_index)."""
        raise NotImplementedError(type(self))

    def approximate_fraction_inside(self, other_geometry: 'Geometry', balance=0.5) -> Tensor:
        """Fraction of `other_geometry` (cells) lying inside this geometry — soft
        voxelization (reference default impl: phi/geom/_geom.py:278): estimated
        from the signed distance at the cell center relative to the cell size."""
        radius = other_geometry.bounding_radius()
        location = other_geometry.center
        distance = self.approximate_signed_distance(location)
        inside_fraction = balance - distance / radius
        return ops.clip(inside_fraction, 0, 1)

    def push(self, positions: Tensor, outward: bool = True, shift_amount: float = 0) -> Tensor:
        """Shift positions out of (or into) this geometry
        (reference: phi/geom/_geom.py:310; used by fluid.boundary_push)."""
        from ..math import where
        sdf = self.approximate_signed_distance(positions)
        if outward:
            shift_needed = sdf < shift_amount
            sgd = self.approximate_signed_distance  # finite-diff normal
            normal = _sdf_normal(sgd, positions)
            delta = (shift_amount - sdf) * normal
            return where(shift_needed, positions + delta, positions)
        else:
            shift_needed = sdf > -shift_amount
            normal = _sdf_normal(self.approximate_signed_distance, positions)
            delta = (-shift_amount - sdf) * normal
            return where(shift_needed, positions + delta, positions)

    def sample_uniform(self, *shape: Shape) -> Tensor:
        raise NotImplementedError(type(self))

    # --- bounds ---
    def bounding_radius(self) -> Tensor:
        raise NotImplementedError(type(self))

    def bounding_half_extent(self) -> Tensor:
        raise NotImplementedError(type(self))

    def bounding_box(self) -> 'Geometry':
        from ._box import Box
        center = self.center
        half = self.bounding_half_extent()
        reduce = self.shape.non_batch.non_channel  # instance dims etc.
        if reduce:
            lower = ops.min_(center - half, reduce)
            upper = ops.max_(center + half, reduce)
        else:
            lower, upper = center - half, center + half
        return Box(lower, upper)

    @property
    def bounds(self) -> 'Geometry':
        return self.bounding_box()

    # --- transforms ---
    def shifted(self, delta: Tensor) -> 'Geometry':
        return self.at(self.center + delta)

    def at(self, center: Tensor) -> 'Geometry':
        raise NotImplementedError(type(self))

    def rotated(self, angle) -> 'Geometry':
        raise NotImplementedError(type(self))

    def scaled(self, factor) -> 'Geometry':
        raise NotImplementedError(type(self))

    # --- surface integrals (FVM primitives, reference _geom.py:163-205) ---
    def integrate_surface(self, face_values: Tensor, divide_volume=False) -> Tensor:
        dual_dims = self.face_shape.dual
        result = ops.sum_(face_values * self.face_areas, dual_dims)
        if divide_volume:
            result = result / self.volume
        return result

    def integrate_flux(self, flux: Tensor, divide_volume=False) -> Tensor:
        dual_dims = self.face_shape.dual
        result = ops.sum_(ops.sum_(flux * self.face_normals, 'vector') * self.face_areas, dual_dims)
        if divide_volume:
            result = result / self.volume
        return result

    # --- python protocol ---
    def __invert__(self) -> 'Geometry':
        return InvertedGeometry(self)

    def __getattr__(self, name):
        if name.startswith('_') or name in ('shape',):
            raise AttributeError(name)
        try:
            shape = self.shape
        except NotImplementedError:
            raise AttributeError(name)
        if name in shape:
            return BoundDim(self, name)
        raise AttributeError(f"{type(self).__name__} has no attribute '{name}'")

    def __getitem__(self, item):
        raise NotImplementedError(type(self))

    def __add__(self, other):
        from ._geom_ops import union
        return union(self, other)

    def __or__(self, other):
        from ._geom_ops import union
        return union(self, other)

    def __and__(self, other):
        from ._geom_ops import intersection
        return intersection(self, other)

    def __stack__(self, values, dim: Shape, **kwargs):
        from ._geom_ops import GeometryStack
        if all(type(v) == type(values[0]) for v in values) and hasattr(values[0], '__field_stack__'):
            return values[0].__field_stack__(values, dim)
        return GeometryStack(tuple(values), dim)


def non_batch_non_channel(shape: Shape) -> Shape:
    return shape.non_batch.non_channel


def _sdf_normal(sdf_fn, positions: Tensor, eps=1e-3) -> Tensor:
    comps = {}
    labels = positions.shape.get_labels('vector')
    for i, n in enumerate(labels):
        offset = ops.dim_mask(positions.shape.only('vector').with_size(len(labels), labels), n) * eps
        hi = sdf_fn(positions + offset)
        lo = sdf_fn(positions - offset)
        comps[n] = (hi - lo) / (2 * eps)
    grad = stack(comps, channel('vector'), expand_values=True)
    return ops.vec_normalize(grad, epsilon=1e-12)


class InvertedGeometry(Geometry):
    """Complement of a geometry (reference: phi/geom/_geom.py:505; `~geom`)."""

    def __init__(self, geometry: Geometry):
        self.geometry = geometry

    @property
    def center(self) -> Tensor:
        return self.geometry.center

    @property
    def shape(self) -> Shape:
        return self.geometry.shape

    @property
    def volume(self) -> Tensor:
        return -self.geometry.volume

    def lies_inside(self, location: Tensor) -> Tensor:
        return ~self.geometry.lies_inside(location)

    def approximate_signed_distance(self, location: Tensor) -> Tensor:
        return -self.geometry.approximate_signed_distance(location)

    def approximate_fraction_inside(self, other_geometry: Geometry, balance=0.5) -> Tensor:
        return 1 - self.geometry.approximate_fraction_inside(other_geometry, 1 - balance)

    def push(self, positions: Tensor, outward: bool = True, shift_amount: float = 0) -> Tensor:
        return self.geometry.push(positions, outward=not outward, shift_amount=shift_amount)

    def bounding_radius(self):
        return self.geometry.bounding_radius()

    def bounding_half_extent(self):
        return self.geometry.bounding_half_extent()

    def at(self, center):
        return InvertedGeometry(self.geometry.at(center))

    def __invert__(self):
        return self.geometry

    def __getitem__(self, item):
        return InvertedGeometry(self.geometry[item])

    def __eq__(self, other):
        return isinstance(other, InvertedGeometry) and self.geometry == other.geometry

    def __hash__(self):
        return -hash(self.geometry)

    def __repr__(self):
        return f"~{self.geometry}"


def invert(geometry: Geometry) -> Geometry:
    return ~geometry


jax.tree_util.register_pytree_node(
    InvertedGeometry,
    lambda g: ((g.geometry,), None),
    lambda aux, ch: InvertedGeometry(ch[0]),
)


class NoGeometry(Geometry):
    """Empty geometry (reference: phi/geom/_geom.py:588)."""

    def __init__(self, vector_labels=('x', 'y')):
        self._labels = tuple(vector_labels)

    @property
    def shape(self):
        return channel(vector=self._labels)

    @property
    def center(self):
        return ops.zeros(channel(vector=self._labels))

    @property
    def volume(self):
        return wrap(0.)

    def lies_inside(self, location):
        return ops.zeros_like(location.vector[0]) > 1

    def approximate_signed_distance(self, location):
        return ops.vec_length(location) + np.inf

    def approximate_fraction_inside(self, other_geometry, balance=0.5):
        return ops.zeros_like(other_geometry.center.vector[0])

    def bounding_radius(self):
        return wrap(0.)

    def bounding_half_extent(self):
        return ops.zeros(channel(vector=self._labels))

    def at(self, center):
        return self


jax.tree_util.register_pytree_node(
    NoGeometry, lambda g: ((), g._labels), lambda aux, ch: NoGeometry(aux))


class Point(Geometry):
    """Zero-size geometry at given location(s) (reference: phi/geom/_geom.py Point)."""

    def __init__(self, location: Tensor):
        self._location = wrap(location)

    @property
    def center(self) -> Tensor:
        return self._location

    @property
    def shape(self) -> Shape:
        return self._location.shape

    @property
    def volume(self) -> Tensor:
        return wrap(0.)

    def lies_inside(self, location):
        return ops.zeros_like(location.vector[0]) > 1

    def approximate_signed_distance(self, location: Tensor):
        return ops.vec_length(location - self._location)

    def bounding_radius(self):
        return wrap(0.)

    def bounding_half_extent(self):
        return ops.zeros_like(self._location)

    def at(self, center):
        return Point(center)

    def rotated(self, angle):
        return self

    def scaled(self, factor):
        return self

    def sample_uniform(self, *shape):
        return expand(self._location, *shape)

    def __getitem__(self, item):
        item = slicing_dict(self, item)
        return Point(self._location[{k: v for k, v in item.items() if k in self._location.shape}])

    def __field_stack__(self, values, dim):
        return Point(stack([v._location for v in values], dim))

    def __eq__(self, other):
        return isinstance(other, Point) and ops.equal(self._location, other._location)

    def __hash__(self):
        return hash('Point')

    def __repr__(self):
        return f"Point({self._location})"


jax.tree_util.register_pytree_node(
    Point, lambda g: ((g._location,), None), lambda aux, ch: Point(ch[0]))


def sample_function(f, elements, at: str, extrapolation):
    """Call a user function on sample-point coordinates (reference:
    phi/field/_grid.py:210-234 signature sniffing, simplified)."""
    import inspect
    points = elements.get_points(at) if hasattr(elements, 'get_points') else elements.center
    try:
        n_params = len(inspect.signature(f).parameters)
    except (TypeError, ValueError):
        n_params = 1
    if n_params == 1:
        return f(points)
    comps = [points.vector[i] for i in range(points.shape.get_size('vector'))]
    return f(*comps)


def rotate(geometry, angle, pivot=None):
    """Rotate a geometry or vector (reference: phi/geom/_transform.py:36)."""
    if isinstance(geometry, Tensor):
        from ._transform import rotate_vector
        return rotate_vector(geometry, angle)
    if pivot is None:
        return geometry.rotated(angle)
    center = pivot + rotate(geometry.center - pivot, angle)
    return geometry.rotated(angle).at(center)


def scale(geometry, factor, pivot=None):
    """Scale a geometry about its center or `pivot` (reference: phi/geom/_transform.py:9)."""
    if isinstance(geometry, Tensor):
        return geometry * factor
    if pivot is None:
        return geometry.scaled(factor)
    center = pivot + factor * (geometry.center - pivot)
    return geometry.scaled(factor).at(center)
