"""Geometry mask initializers (reference: /root/reference/phi/field/_mask.py)."""
from __future__ import annotations

from ..math import Tensor, wrap
from ..math import _ops as ops
from ..geom import Geometry
from ._field import FieldInitializer

__all__ = ['HardGeometryMask', 'SoftGeometryMask', 'GeometryMask']


class HardGeometryMask(FieldInitializer):
    """1 inside the geometry, 0 outside (binary by cell center)
    (reference: phi/field/_mask.py:10)."""

    def __init__(self, geometry: Geometry):
        self.geometry = geometry

    def _sample(self, geometry: Geometry, at: str, boundaries, **kwargs) -> Tensor:
        points = geometry.face_centers if at == 'face' else geometry.center
        return ops.to_float(self.geometry.lies_inside(points))


class SoftGeometryMask(HardGeometryMask):
    """Fraction of each cell inside the geometry (soft voxelization)
    (reference: phi/field/_mask.py:29)."""

    def __init__(self, geometry: Geometry, balance=0.5):
        super().__init__(geometry)
        self.balance = balance

    def _sample(self, geometry: Geometry, at: str, boundaries, **kwargs) -> Tensor:
        target = geometry.faces if at == 'face' else geometry
        return self.geometry.approximate_fraction_inside(target, self.balance)


GeometryMask = HardGeometryMask
