"""Rotational velocity field initializer for moving obstacles
(reference: /root/reference/phi/field/_angular_velocity.py:10-41; used by
fluid.apply_boundary_conditions, phi/physics/fluid.py:236)."""
from __future__ import annotations

from ..math import Tensor, wrap, channel, stack
from ..math import _ops as ops
from ..geom import Geometry
from ._field import FieldInitializer

__all__ = ['AngularVelocity']


class AngularVelocity(FieldInitializer):
    """v(x) = ω × (x − x₀), optionally with falloff."""

    def __init__(self, location: Tensor, strength=1.0, falloff=None):
        self.location = wrap(location)
        self.strength = wrap(strength)
        self.falloff = falloff

    def _sample(self, geometry: Geometry, at: str, boundaries, **kwargs) -> Tensor:
        points = geometry.face_centers if at == 'face' else geometry.center
        distances = points - self.location
        labels = points.shape.get_labels('vector')
        if len(labels) == 2:
            x, y = labels
            velocity = stack({x: -distances.vector[y], y: distances.vector[x]},
                             channel(vector=labels)) * self.strength
        elif len(labels) == 3:
            velocity = ops.cross(self.strength, distances)
        else:
            raise NotImplementedError(f"AngularVelocity in {len(labels)}D")
        if self.falloff is not None:
            velocity = velocity * self.falloff(distances)
        reduce = self.location.shape.instance.without(points.shape.instance.names)
        if reduce:
            velocity = ops.sum_(velocity, reduce)
        return velocity
