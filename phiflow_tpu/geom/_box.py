"""Axis-aligned boxes and rotated cuboids — the geometry workhorse
(reference: /root/reference/phi/geom/_box.py; grids' `bounds`).

Supports the reference's constructor forms:
  Box(x=1, y=(0, None))      — kwargs with open/infinite sides
  Box(lower_vec, upper_vec)  — positional tensors
  Box['x,y', 0:1, 0:1]       — slicing syntax (BoxType metaclass, _box.py:28-41)
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..math import Tensor, Shape, wrap, channel, spatial, instance, stack, expand
from ..math import _ops as ops
from ..math._magic import slicing_dict
from ._geom import Geometry

__all__ = ['Box', 'Cuboid', 'BaseBox', 'bounding_box', 'box_from_limits']


class BoxType(type):
    """Enables ``Box['x,y', 0:1, 0:1]`` (reference: phi/geom/_box.py:28)."""

    def __getitem__(cls, item):
        if not isinstance(item, tuple):
            item = (item,)
        assert isinstance(item[0], str), "Box[...] first argument must be dim names, e.g. 'x,y'"
        names = [n.strip() for n in item[0].split(',')]
        lower, upper = [], []
        for s in item[1:]:
            assert isinstance(s, slice), f"Box[...] bounds must be slices, got {s}"
            lower.append(float(s.start) if s.start is not None else -np.inf)
            upper.append(float(s.stop) if s.stop is not None else np.inf)
        lo = wrap(lower, channel(vector=names))
        up = wrap(upper, channel(vector=names))
        return Box(lo, up)


class BaseBox(Geometry):
    """Common interface for Box and Cuboid."""

    @property
    def lower(self) -> Tensor:
        raise NotImplementedError

    @property
    def upper(self) -> Tensor:
        raise NotImplementedError

    @property
    def size(self) -> Tensor:
        raise NotImplementedError

    @property
    def half_size(self) -> Tensor:
        return self.size * 0.5

    @property
    def volume(self) -> Tensor:
        return ops.prod(self.size, 'vector')

    def global_to_local(self, global_position: Tensor, scale=True, origin='lower') -> Tensor:
        """Map world coordinates to box-local coordinates
        (reference: phi/geom/_box.py global_to_local; used by grid sampling
        phi/field/_resample.py:258)."""
        if origin == 'lower':
            pos = global_position - self.lower
        elif origin == 'center':
            pos = global_position - self.center
        else:
            pos = global_position - self.upper
        if scale:
            pos = pos / self.size
        return pos

    def local_to_global(self, local_position: Tensor, scale=True, origin='lower') -> Tensor:
        if scale:
            local_position = local_position * self.size
        if origin == 'lower':
            return local_position + self.lower
        elif origin == 'center':
            return local_position + self.center
        return local_position + self.upper

    def lies_inside(self, location: Tensor) -> Tensor:
        bool_inside = (location >= self.lower) & (location <= self.upper)
        result = ops.all_(bool_inside, 'vector')
        reduce = self.shape.instance.without(location.shape.instance.names)
        return ops.any_(result, reduce) if reduce else result  # union over instances (ref: _geom.py:226)

    def approximate_signed_distance(self, location: Tensor) -> Tensor:
        """Exact SDF of an axis-aligned box."""
        center = self.center
        q = abs(location - center) - self.half_size
        outside = ops.vec_length(ops.maximum(q, 0.0))
        inside = ops.minimum(ops.max_(q, 'vector'), 0.0)
        result = outside + inside
        reduce = self.shape.instance.without(location.shape.instance.names)
        return ops.min_(result, reduce) if reduce else result

    def approximate_closest_surface(self, location: Tensor):
        q = location - self.center
        aq = abs(q) - self.half_size
        sgn_dist = self.approximate_signed_distance(location)
        # normal: axis of largest component of aq, signed by q
        normal_comps = {}
        labels = q.shape.get_labels('vector')
        max_aq = ops.max_(aq, 'vector')
        for n in labels:
            is_max = ops.to_float(aq.vector[n] >= max_aq - 1e-6)
            normal_comps[n] = is_max * ops.sign(q.vector[n])
        normal = ops.vec_normalize(stack(normal_comps, channel('vector')), epsilon=1e-12)
        delta = -sgn_dist * normal
        surface_pos = location + delta
        return sgn_dist, delta, normal, None, None

    def push(self, positions: Tensor, outward: bool = True, shift_amount: float = 0) -> Tensor:
        """Axis-wise box push: only particles violating the geometry are moved
        (reference semantics: phi/geom/_box.py:271-286)."""
        from ..math import where
        loc_to_center = positions - self.center
        sgn_dist = abs(loc_to_center) - self.half_size  # per-axis signed distance
        if outward:
            # particles inside (all components < 0): push out along the closest axis
            closest = (sgn_dist >= ops.max_(sgn_dist, 'vector') - 1e-12) & (sgn_dist < 0)
            shift = ops.to_float(closest) * (sgn_dist - shift_amount)
        else:
            # particles outside (component > 0): pull in by dist + margin, at most to center
            shift = (sgn_dist + shift_amount) * ops.to_float(sgn_dist > 0)
            shift = where(abs(shift) > abs(loc_to_center), abs(loc_to_center), shift)
        return positions + where(loc_to_center < 0, 1., -1.) * shift

    def sample_uniform(self, *shape: Shape) -> Tensor:
        uniform = ops.random_uniform(*shape, channel(vector=self.shape.get_labels('vector')))
        return self.lower + uniform * self.size

    def bounding_radius(self) -> Tensor:
        return ops.vec_length(self.half_size)

    def bounding_half_extent(self) -> Tensor:
        return self.half_size

    def bounding_box(self):
        return Box(self.lower, self.upper)

    @property
    def vector(self):
        from ..math._magic import BoundDim
        return BoundDim(self, 'vector')

    def corner_representation(self) -> 'Box':
        return Box(self.lower, self.upper)

    def center_representation(self) -> 'Cuboid':
        return Cuboid(self.center, self.half_size)

    def contains(self, other: 'BaseBox') -> Tensor:
        return ops.all_((other.lower >= self.lower) & (other.upper <= self.upper), 'vector')


class Box(BaseBox, metaclass=BoxType):
    """Axis-aligned box defined by lower and upper corner vectors."""

    def __init__(self, lower: Tensor = None, upper: Tensor = None, **size):
        if lower is not None and upper is None and not size and not isinstance(lower, Tensor):
            raise ValueError("Box requires lower and upper or kwargs")
        if size:
            names = tuple(size.keys())
            lo, up = [], []
            for v in size.values():
                if isinstance(v, (tuple, list)):
                    l = float(v[0]) if v[0] is not None else -np.inf
                    u = float(v[1]) if v[1] is not None else np.inf
                elif v is None:
                    l, u = -np.inf, np.inf
                elif isinstance(v, (int, float)):
                    l, u = 0., float(v)
                elif isinstance(v, Tensor):
                    l, u = 0., v
                else:
                    raise ValueError(f"invalid Box size {v!r}")
                lo.append(l)
                up.append(u)
            if any(isinstance(x, Tensor) for x in lo + up):
                lower = stack({n: wrap(l) for n, l in zip(names, lo)}, channel('vector'), expand_values=True)
                upper = stack({n: wrap(u) for n, u in zip(names, up)}, channel('vector'), expand_values=True)
            else:
                lower = wrap(lo, channel(vector=names))
                upper = wrap(up, channel(vector=names))
        else:
            lower = wrap(lower) if not isinstance(lower, Tensor) else lower
            upper = wrap(upper) if not isinstance(upper, Tensor) else upper
        self._lower = lower
        self._upper = upper

    @property
    def lower(self) -> Tensor:
        return self._lower

    @property
    def upper(self) -> Tensor:
        return self._upper

    @property
    def size(self) -> Tensor:
        return self._upper - self._lower

    @property
    def center(self) -> Tensor:
        return (self._lower + self._upper) * 0.5

    @property
    def shape(self) -> Shape:
        return self._lower.shape & self._upper.shape

    def at(self, center: Tensor) -> 'Box':
        half = self.half_size
        return Box(center - half, center + half)

    def shifted(self, delta: Tensor) -> 'Box':
        return Box(self._lower + delta, self._upper + delta)

    def rotated(self, angle) -> 'Cuboid':
        return Cuboid(self.center, self.half_size, rotation=angle)

    def scaled(self, factor) -> 'Box':
        center = self.center
        half = self.half_size * factor
        return Box(center - half, center + half)

    def __getitem__(self, item):
        item = slicing_dict(self, item)
        lo = self._lower[{k: v for k, v in item.items() if k in self._lower.shape}]
        up = self._upper[{k: v for k, v in item.items() if k in self._upper.shape}]
        return Box(lo, up)

    def __field_stack__(self, values, dim):
        return Box(stack([v.lower for v in values], dim), stack([v.upper for v in values], dim))

    def __mul__(self, other):
        """Cartesian product of boxes over disjoint dims: Box(x=1) * Box(y=2)."""
        if isinstance(other, Box):
            from ..math import concat
            lo = stack({**_vec_dict(self._lower), **_vec_dict(other._lower)}, channel('vector'), expand_values=True)
            up = stack({**_vec_dict(self._upper), **_vec_dict(other._upper)}, channel('vector'), expand_values=True)
            return Box(lo, up)
        return NotImplemented

    def __eq__(self, other):
        return isinstance(other, BaseBox) and self.shape == other.shape \
            and ops.equal(self._lower, other.lower) and ops.equal(self._upper, other.upper)

    def __hash__(self):
        return hash('Box')

    def __repr__(self):
        if self._lower.available:
            names = self.shape.get_labels('vector') or ()
            try:
                comps = ', '.join(f"{n}=({float(self._lower.vector[n])},{float(self._upper.vector[n])})" for n in names)
                return f"Box({comps})"
            except Exception:
                pass
        return f"Box[{self.shape}]"


def _vec_dict(t: Tensor) -> dict:
    return {n: t.vector[n] for n in t.shape.get_labels('vector')}


jax.tree_util.register_pytree_node(
    Box, lambda b: ((b._lower, b._upper), None), lambda aux, ch: Box(ch[0], ch[1]))


class Cuboid(BaseBox):
    """Box defined by center and half-size, optionally rotated
    (reference: phi/geom/_box.py:418)."""

    def __init__(self, center: Tensor = 0, half_size: Tensor = None, rotation=None, size: Tensor = None, **half_size_kw):
        if half_size is None and size is not None:
            half_size = wrap(size) * 0.5
        if half_size_kw:
            half_size = stack({k: wrap(v) for k, v in half_size_kw.items()}, channel('vector'), expand_values=True)
        self._center = wrap(center)
        self._half_size = wrap(half_size)
        if self._center.shape.rank == 0 and 'vector' in self._half_size.shape:
            self._center = expand(self._center, self._half_size.shape.only('vector'))
        self._rotation = wrap(rotation) if rotation is not None else None

    @property
    def center(self) -> Tensor:
        return self._center

    @property
    def half_size(self) -> Tensor:
        return self._half_size

    @property
    def size(self) -> Tensor:
        return self._half_size * 2

    @property
    def lower(self) -> Tensor:
        return self._center - self._half_size

    @property
    def upper(self) -> Tensor:
        return self._center + self._half_size

    @property
    def rotation_matrix(self):
        from ._transform import rotation_matrix
        return rotation_matrix(self._rotation, self.shape.get_labels('vector')) if self._rotation is not None else None

    @property
    def shape(self) -> Shape:
        s = self._center.shape & self._half_size.shape
        return s

    def _to_local(self, location: Tensor) -> Tensor:
        """World → body frame (undo rotation)."""
        delta = location - self._center
        if self._rotation is not None:
            from ._transform import rotate_vector
            delta = rotate_vector(delta, self._rotation, invert=True)
        return delta

    def lies_inside(self, location: Tensor) -> Tensor:
        q = self._to_local(location)
        return ops.all_(abs(q) <= self._half_size, 'vector')

    def approximate_signed_distance(self, location: Tensor) -> Tensor:
        q = abs(self._to_local(location)) - self._half_size
        outside = ops.vec_length(ops.maximum(q, 0.0))
        inside = ops.minimum(ops.max_(q, 'vector'), 0.0)
        return outside + inside

    def at(self, center: Tensor) -> 'Cuboid':
        return Cuboid(center, self._half_size, self._rotation)

    def rotated(self, angle) -> 'Cuboid':
        if self._rotation is None:
            return Cuboid(self._center, self._half_size, angle)
        return Cuboid(self._center, self._half_size, self._rotation + wrap(angle))

    def scaled(self, factor) -> 'Cuboid':
        return Cuboid(self._center, self._half_size * factor, self._rotation)

    def bounding_half_extent(self) -> Tensor:
        if self._rotation is None:
            return self._half_size
        m = self.rotation_matrix
        return ops.sum_(abs(m) * ops.rename_dims(self._half_size, 'vector', '~vector'), '~vector')

    def __getitem__(self, item):
        item = slicing_dict(self, item)
        c = self._center[{k: v for k, v in item.items() if k in self._center.shape}]
        h = self._half_size[{k: v for k, v in item.items() if k in self._half_size.shape}]
        r = self._rotation[{k: v for k, v in item.items() if k in self._rotation.shape}] if self._rotation is not None else None
        return Cuboid(c, h, r)

    def __field_stack__(self, values, dim):
        rot = None
        if any(v._rotation is not None for v in values):
            rot = stack([v._rotation if v._rotation is not None else ops.zeros_like(values[0]._rotation) for v in values], dim)
        return Cuboid(stack([v._center for v in values], dim),
                      stack([v._half_size for v in values], dim), rot)

    def __eq__(self, other):
        return isinstance(other, Cuboid) and ops.equal(self._center, other._center) \
            and ops.equal(self._half_size, other._half_size)

    def __hash__(self):
        return hash('Cuboid')

    def __repr__(self):
        return f"Cuboid(center={self._center}, half_size={self._half_size})"


def _cuboid_flatten(c: Cuboid):
    return (c._center, c._half_size, c._rotation), None


def _cuboid_unflatten(aux, ch):
    return Cuboid(ch[0], ch[1], ch[2])


jax.tree_util.register_pytree_node(Cuboid, _cuboid_flatten, _cuboid_unflatten)


def bounding_box(geometry_or_tensor) -> Box:
    """Smallest enclosing axis-aligned box (reference: phi/geom/_box.py:450)."""
    if isinstance(geometry_or_tensor, Tensor):
        t = geometry_or_tensor
        reduce = t.shape.non_batch.without('vector')
        return Box(ops.min_(t, reduce), ops.max_(t, reduce))
    return geometry_or_tensor.bounding_box()


def box_from_limits(lower: Tensor, upper: Tensor) -> Box:
    return Box(lower, upper)
