"""Geometry composition: union, intersection, stacks
(reference: /root/reference/phi/geom/_geom_ops.py)."""
from __future__ import annotations

from typing import Sequence, Tuple

import jax

from ..math import Tensor, Shape, wrap, instance, channel, stack, merge_shapes
from ..math import _ops as ops
from ..math._magic import slicing_dict
from ._geom import Geometry, NoGeometry

__all__ = ['union', 'intersection', 'GeometryStack', 'Intersection', 'expel']


class GeometryStack(Geometry):
    """Multiple geometries stacked along a dim; if the dim is an instance dim
    named 'union', queries reduce over it (union semantics)."""

    def __init__(self, geometries: Tuple[Geometry, ...], stack_dim: Shape):
        self.geometries = tuple(geometries)
        self.stack_dim = Shape((stack_dim.dims[0].with_size(len(self.geometries), stack_dim.dims[0].labels),))

    @property
    def shape(self) -> Shape:
        inner = merge_shapes(*[g.shape for g in self.geometries], allow_varying_sizes=True)
        return self.stack_dim & inner

    @property
    def center(self) -> Tensor:
        return stack([g.center for g in self.geometries], self.stack_dim, expand_values=True)

    @property
    def volume(self) -> Tensor:
        return stack([g.volume for g in self.geometries], self.stack_dim, expand_values=True)

    def _is_union(self):
        return self.stack_dim.dims[0].name == 'union'

    def lies_inside(self, location: Tensor) -> Tensor:
        inside = [g.lies_inside(location) for g in self.geometries]
        if self._is_union():
            result = inside[0]
            for i in inside[1:]:
                result = result | i
            return result
        return stack(inside, self.stack_dim, expand_values=True)

    def approximate_signed_distance(self, location: Tensor) -> Tensor:
        dists = [g.approximate_signed_distance(location) for g in self.geometries]
        if self._is_union():
            return ops.min_(dists)
        return stack(dists, self.stack_dim, expand_values=True)

    def approximate_fraction_inside(self, other_geometry: Geometry, balance=0.5) -> Tensor:
        fracs = [g.approximate_fraction_inside(other_geometry, balance) for g in self.geometries]
        if self._is_union():
            return ops.min_([ops.sum_(fracs), wrap(1.)]) if False else ops.clip(sum(fracs[1:], fracs[0]), 0, 1)
        return stack(fracs, self.stack_dim, expand_values=True)

    def push(self, positions: Tensor, outward: bool = True, shift_amount: float = 0) -> Tensor:
        for g in self.geometries:
            positions = g.push(positions, outward=outward, shift_amount=shift_amount)
        return positions

    def bounding_radius(self) -> Tensor:
        return ops.max_([g.bounding_radius() for g in self.geometries])

    def bounding_half_extent(self) -> Tensor:
        uppers = [g.bounding_box().upper for g in self.geometries]
        lowers = [g.bounding_box().lower for g in self.geometries]
        upper = ops.max_(stack(uppers, instance('_g'), expand_values=True), '_g')
        lower = ops.min_(stack(lowers, instance('_g'), expand_values=True), '_g')
        return (upper - lower) * 0.5

    @property
    def bounding_box_center(self):
        uppers = [g.bounding_box().upper for g in self.geometries]
        lowers = [g.bounding_box().lower for g in self.geometries]
        upper = ops.max_(stack(uppers, instance('_g'), expand_values=True), '_g')
        lower = ops.min_(stack(lowers, instance('_g'), expand_values=True), '_g')
        return (upper + lower) * 0.5

    def bounding_box(self):
        from ._box import Box
        c = self.bounding_box_center
        h = self.bounding_half_extent()
        return Box(c - h, c + h)

    def at(self, center: Tensor) -> Geometry:
        delta = center - self.bounding_box_center
        return GeometryStack(tuple(g.shifted(delta) for g in self.geometries), self.stack_dim)

    def shifted(self, delta: Tensor) -> Geometry:
        name = self.stack_dim.dims[0].name
        if isinstance(delta, Tensor) and name in delta.shape:
            parts = [delta[{name: i}] for i in range(len(self.geometries))]
            return GeometryStack(tuple(g.shifted(p) for g, p in zip(self.geometries, parts)), self.stack_dim)
        return GeometryStack(tuple(g.shifted(delta) for g in self.geometries), self.stack_dim)

    def rotated(self, angle) -> Geometry:
        return GeometryStack(tuple(g.rotated(angle) for g in self.geometries), self.stack_dim)

    def scaled(self, factor) -> Geometry:
        return GeometryStack(tuple(g.scaled(factor) for g in self.geometries), self.stack_dim)

    def __getitem__(self, item):
        item = slicing_dict(self, item)
        name = self.stack_dim.dims[0].name
        if name in item:
            sel = item.pop(name)
            if isinstance(sel, int):
                g = self.geometries[sel]
                return g[item] if item else g
            geoms = self.geometries[sel] if isinstance(sel, slice) else [self.geometries[i] for i in sel]
            result = GeometryStack(tuple(geoms), self.stack_dim)
            return result[item] if item else result
        return GeometryStack(tuple(g[item] for g in self.geometries), self.stack_dim)

    def __eq__(self, other):
        return isinstance(other, GeometryStack) and self.stack_dim == other.stack_dim \
            and all(a == b for a, b in zip(self.geometries, other.geometries))

    def __hash__(self):
        return hash(self.stack_dim)

    def __repr__(self):
        return f"GeometryStack[{self.stack_dim} over {[type(g).__name__ for g in self.geometries]}]"


jax.tree_util.register_pytree_node(
    GeometryStack,
    lambda g: (g.geometries, g.stack_dim),
    lambda aux, ch: GeometryStack(tuple(ch), aux))


class Intersection(Geometry):
    """Intersection of geometries (reference: phi/geom/_geom_ops.py:180)."""

    def __init__(self, geometries: Tuple[Geometry, ...]):
        self.geometries = tuple(geometries)

    @property
    def shape(self):
        return merge_shapes(*[g.shape for g in self.geometries])

    @property
    def center(self):
        return self.geometries[0].center

    @property
    def volume(self):
        raise NotImplementedError("volume of Intersection")

    def lies_inside(self, location: Tensor) -> Tensor:
        inside = [g.lies_inside(location) for g in self.geometries]
        result = inside[0]
        for i in inside[1:]:
            result = result & i
        return result

    def approximate_signed_distance(self, location: Tensor) -> Tensor:
        return ops.max_([g.approximate_signed_distance(location) for g in self.geometries])

    def approximate_fraction_inside(self, other_geometry, balance=0.5):
        fracs = [g.approximate_fraction_inside(other_geometry, balance) for g in self.geometries]
        result = fracs[0]
        for f in fracs[1:]:
            result = ops.minimum(result, f)
        return result

    def bounding_radius(self):
        return ops.min_([g.bounding_radius() for g in self.geometries])

    def bounding_half_extent(self):
        return self.geometries[0].bounding_half_extent()

    def at(self, center):
        return Intersection(tuple(g.at(center) for g in self.geometries))

    def __eq__(self, other):
        return isinstance(other, Intersection) and all(a == b for a, b in zip(self.geometries, other.geometries))

    def __hash__(self):
        return hash(len(self.geometries))


jax.tree_util.register_pytree_node(
    Intersection, lambda g: (g.geometries, None), lambda aux, ch: Intersection(tuple(ch)))


def union(*geometries, dim=instance('union')) -> Geometry:
    """Union of geometries (reference: phi/geom/_geom_ops.py:297)."""
    if len(geometries) == 1 and isinstance(geometries[0], (tuple, list)):
        geometries = tuple(geometries[0])
    geometries = tuple(geometries)
    if len(geometries) == 0:
        return NoGeometry()
    if len(geometries) == 1:
        return geometries[0]
    if all(type(g) == type(geometries[0]) for g in geometries) and hasattr(geometries[0], '__field_stack__'):
        return geometries[0].__field_stack__(list(geometries), dim)
    return GeometryStack(geometries, dim)


def intersection(*geometries, dim=instance('intersection')) -> Geometry:
    if len(geometries) == 1 and isinstance(geometries[0], (tuple, list)):
        geometries = tuple(geometries[0])
    if len(geometries) == 0:
        return NoGeometry()
    if len(geometries) == 1:
        return geometries[0]
    return Intersection(tuple(geometries))


def expel(geometry: Geometry, location: Tensor, min_separation=0, invert=False) -> Tensor:
    """Shift locations out of the geometry (reference: phi/geom/_geom_ops.py:350)."""
    return geometry.push(location, outward=not invert, shift_amount=min_separation)
