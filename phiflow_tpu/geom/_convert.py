"""Geometry conversions (reference: /root/reference/phi/geom/_convert.py:15-151)."""
from __future__ import annotations

import numpy as np

from ..math import Tensor, Shape, spatial, instance, wrap
from ..math import _ops as ops
from ._geom import Geometry
from ._box import Box, BaseBox
from ._sdf import SDF
from ._sdf_grid import SDFGrid, sample_sdf

__all__ = ['as_sdf', 'surface_mesh']


def as_sdf(geo: Geometry, bounds=None, rel_margin=None, abs_margin=0., separate=None, method='auto') -> SDF:
    """Represent a geometry as a signed distance function (reference: _convert.py:15)."""
    if isinstance(geo, (SDF, SDFGrid)):
        return geo
    if bounds is None:
        bounds = geo.bounding_box()
        margin = rel_margin if rel_margin is not None else 0.1
        half = bounds.half_size * (1 + 2 * margin) + abs_margin
        bounds = Box(bounds.center - half, bounds.center + half)
    return SDF(geo.approximate_signed_distance, bounds, geo.center,
               volume=None, bounding_radius=geo.bounding_radius())


def surface_mesh(geo: Geometry, rel_dx: float = None, abs_dx: float = None, method='auto'):
    """Extract a triangle surface mesh from a geometry via marching squares/cubes
    on its sampled SDF (reference: _convert.py:84, which uses an external lib).

    2D: returns (vertices, segments). 3D uses scipy-based marching cubes if
    available, else raises."""
    import numpy as np
    bounds = geo.bounding_box()
    d = geo.spatial_rank
    dx = abs_dx if abs_dx is not None else float(ops.min_(bounds.size)) * (rel_dx or 0.02)
    sizes = {n: max(4, int(float(bounds.size.vector[n]) / dx)) for n in bounds.shape.get_labels('vector')}
    grid_sdf = sample_sdf(geo, bounds, **sizes)
    values = np.asarray(grid_sdf.values.numpy(tuple(sizes.keys())))
    try:
        from skimage import measure  # pragma: no cover
        verts, faces, *_ = measure.marching_cubes(values, 0.0)
        return verts, faces
    except ImportError:
        pass
    if d == 2:
        # marching squares via matplotlib contour
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        cs = ax.contour(values.T, levels=[0.0])
        paths = []
        for collection_path in cs.get_paths() if hasattr(cs, 'get_paths') else []:
            paths.append(collection_path.vertices)
        plt.close(fig)
        return paths
    raise NotImplementedError("3D surface_mesh requires scikit-image (not in this environment)")
