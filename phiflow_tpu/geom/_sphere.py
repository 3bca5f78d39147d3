"""Sphere geometry (reference: /root/reference/phi/geom/_sphere.py)."""
from __future__ import annotations

import numpy as np
import jax

from ..math import Tensor, Shape, wrap, channel, stack, expand
from ..math import _ops as ops
from ..math._magic import slicing_dict
from ._geom import Geometry

__all__ = ['Sphere']


class Sphere(Geometry):
    """N-dimensional sphere: center vector + radius.

    Constructor forms (reference: phi/geom/_sphere.py:13-41):
      Sphere(center_vec, radius)
      Sphere(x=50, y=10, radius=5)
    """

    def __init__(self, center: Tensor = None, radius=None, volume=None, **center_kw):
        if center_kw:
            center = stack({k: wrap(float(v) if isinstance(v, int) else v) for k, v in center_kw.items()},
                           channel('vector'), expand_values=True)
        assert center is not None, "Sphere requires a center"
        self._center = wrap(center)
        if radius is None and volume is not None:
            radius = Sphere.radius_from_volume(wrap(volume), self._center.shape.get_size('vector'))
        assert radius is not None, "Sphere requires a radius or volume"
        self._radius = wrap(radius)

    @property
    def center(self) -> Tensor:
        return self._center

    @property
    def radius(self) -> Tensor:
        return self._radius

    @property
    def shape(self) -> Shape:
        return self._center.shape & self._radius.shape

    @property
    def volume(self) -> Tensor:
        return Sphere.volume_from_radius(self._radius, self.spatial_rank)

    @staticmethod
    def volume_from_radius(radius, rank: int):
        """Used by SPH particle sizing (reference: phi/physics/sph.py:83)."""
        radius = wrap(radius)
        if rank == 1:
            return 2 * radius
        if rank == 2:
            return np.pi * radius ** 2
        if rank == 3:
            return (4 / 3 * np.pi) * radius ** 3
        raise NotImplementedError(f"{rank}-D sphere volume")

    @staticmethod
    def radius_from_volume(volume, rank: int):
        volume = wrap(volume)
        if rank == 1:
            return volume / 2
        if rank == 2:
            return ops.sqrt(volume / np.pi)
        if rank == 3:
            return (volume / (4 / 3 * np.pi)) ** (1 / 3)
        raise NotImplementedError(f"{rank}-D sphere radius")

    def lies_inside(self, location: Tensor) -> Tensor:
        result = ops.vec_squared(location - self._center) <= self._radius ** 2
        reduce = self.shape.instance.without(location.shape.instance.names)
        return ops.any_(result, reduce) if reduce else result  # union over instances (ref: _geom.py:226)

    def approximate_signed_distance(self, location: Tensor) -> Tensor:
        result = ops.vec_length(location - self._center, eps=1e-12) - self._radius
        reduce = self.shape.instance.without(location.shape.instance.names)
        return ops.min_(result, reduce) if reduce else result

    def approximate_closest_surface(self, location: Tensor):
        delta_c = location - self._center
        dist = ops.vec_length(delta_c, eps=1e-12)
        sgn_dist = dist - self._radius
        normal = delta_c / ops.maximum(dist, 1e-12)
        delta = -sgn_dist * normal
        return sgn_dist, delta, normal, None, None

    def sample_uniform(self, *shape: Shape):
        labels = self.shape.get_labels('vector')
        v = ops.random_normal(*shape, channel(vector=labels))
        v = ops.vec_normalize(v)
        r = self._radius * ops.random_uniform(*shape) ** (1 / self.spatial_rank)
        return self._center + v * r

    def bounding_radius(self) -> Tensor:
        return self._radius

    def bounding_half_extent(self) -> Tensor:
        return expand(self._radius, self.shape.only('vector'))

    def at(self, center: Tensor) -> 'Sphere':
        return Sphere(center, self._radius)

    def rotated(self, angle) -> 'Sphere':
        return self

    def scaled(self, factor) -> 'Sphere':
        return Sphere(self._center, self._radius * factor)

    def __getitem__(self, item):
        item = slicing_dict(self, item)
        c = self._center[{k: v for k, v in item.items() if k in self._center.shape}]
        r = self._radius[{k: v for k, v in item.items() if k in self._radius.shape}]
        return Sphere(c, r)

    def __field_stack__(self, values, dim):
        return Sphere(stack([v._center for v in values], dim),
                      stack([v._radius for v in values], dim, expand_values=True))

    def __eq__(self, other):
        return isinstance(other, Sphere) and ops.equal(self._center, other._center) and ops.equal(self._radius, other._radius)

    def __hash__(self):
        return hash('Sphere')

    def __repr__(self):
        return f"Sphere(center={self._center}, radius={self._radius})"


jax.tree_util.register_pytree_node(
    Sphere, lambda s: ((s._center, s._radius), None), lambda aux, ch: Sphere(ch[0], ch[1]))
