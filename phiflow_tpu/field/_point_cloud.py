"""Point clouds / particles (reference: /root/reference/phi/field/_point_cloud.py)."""
from __future__ import annotations

from numbers import Number

import numpy as np

from ..math import Tensor, Shape, wrap, channel, instance, spatial, stack, expand
from ..math import _ops as ops
from ..math import extrapolation as extrapolation_mod
from ..geom import Geometry, Point, Sphere, UniformGrid, Box
from ._field import Field, as_boundary

__all__ = ['PointCloud', 'nonzero', 'distribute_points']


def PointCloud(elements, values=1., extrapolation=0., bounds=None, **kwargs) -> Field:
    """Create a Field sampled at discrete points (reference: phi/field/_point_cloud.py:13).

    `elements` may be a Geometry (Point/Sphere with instance dims) or a point
    tensor with an instance dim.
    """
    if 'boundary' in kwargs:
        extrapolation = kwargs.pop('boundary')
    if isinstance(elements, Tensor):
        if not elements.shape.instance:
            assert elements.shape.channel, f"point tensor requires a vector dim"
            elements = expand(elements, instance(points=1)) if not elements.shape.spatial else elements
        elements = Point(elements)
    assert isinstance(elements, Geometry), f"elements must be a Geometry or point tensor, got {type(elements)}"
    if isinstance(values, (Number, bool)):
        values = wrap(values)
    elif isinstance(values, (tuple, list)):
        values = wrap(list(values), channel(vector=elements.shape.get_labels('vector')))
    return Field(elements, values, as_boundary(extrapolation, elements))


def nonzero(field: Field) -> Field:
    """Point cloud of the nonzero cells of a grid (reference: phi/field/_point_cloud.py:61)."""
    indices = ops.nonzero(field.values, list_dim=instance('points'))
    points = ops.gather(field.center, indices)
    return PointCloud(Point(points), 1., 0.)


def distribute_points(geometries, dim=instance('points'), points_per_cell: int = 8,
                      center: bool = False, radius: float = None, extrapolation=float('nan'),
                      **domain) -> Field:
    """Transform geometries into a PointCloud with particles distributed in cells
    covered by the geometry (reference: phi/field/_point_cloud.py:67-124; default
    NAN extrapolation is the FLIP convention)."""
    from ._resample import sample
    if isinstance(geometries, (tuple, list)):
        from ..geom import union
        geometries = union(*geometries)
    if isinstance(geometries, Field):
        mask_grid = geometries
    else:
        from ._grid import CenteredGrid
        mask_grid = CenteredGrid(geometries, 0., **domain)
    occupied = np.asarray(mask_grid.values.numpy(mask_grid.resolution.names)) > 0.5
    idx = np.argwhere(occupied)  # (n_cells, d)
    n_cells = idx.shape[0]
    d = idx.shape[1]
    dx = np.asarray(mask_grid.dx.native())
    lower = np.asarray(mask_grid.bounds.lower.native())
    # per-cell jittered points
    rng = np.random.default_rng(0)
    if center:
        points_per_cell = 1
        offsets = np.full((n_cells, 1, d), 0.5)
    else:
        offsets = rng.uniform(0, 1, (n_cells, points_per_cell, d))
    pts = (idx[:, None, :] + offsets) * dx + lower
    pts = pts.reshape(-1, d).astype(np.float32)
    labels = mask_grid.resolution.names
    points = wrap(pts, dim.with_size(pts.shape[0]), channel(vector=labels))
    if radius is None:
        radius = float(0.5 * np.mean(dx) * 0.5)
    elements = Sphere(points, radius=radius)
    return Field(elements, wrap(0.), as_boundary(extrapolation, elements))
