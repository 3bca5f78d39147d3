"""Matplotlib plotting backend (reference: /root/reference/phi/vis/_matplotlib/_matplotlib_plots.py).

Recipes: heatmap (2D scalar grids), quiver (2D vector fields), point clouds,
line plots (1D), staggered vector grids (resampled to centers), geometries.
"""
from __future__ import annotations

import numpy as np

from ..math import Tensor, instance, channel, spatial
from ..field import Field
from ..geom import Geometry, BaseBox, Sphere, Point, UniformGrid
from ._vis_base import Recipe, PlottingLibrary

import matplotlib
matplotlib.use('Agg')  # headless default; callers may switch
import matplotlib.pyplot as plt


class MatplotlibPlots(PlottingLibrary):

    def __init__(self):
        super().__init__('matplotlib', [
            Heatmap2D(), VectorField2D(), PointCloud2D(), LinePlot(), Geometry2D(),
        ])

    def create_figure(self, size, rows, cols, subplots=None, titles=None, log_dims=()):
        figure, axes = plt.subplots(rows, cols, figsize=size, squeeze=False)
        return figure, {(r, c): axes[r][c] for r in range(rows) for c in range(cols)}

    def finalize(self, figure):
        figure[0].tight_layout() if isinstance(figure, tuple) else figure.tight_layout()

    def show(self, figure):
        fig = figure[0] if isinstance(figure, tuple) else figure
        fig.show()

    def save(self, figure, path, dpi=120, transparent=False):
        fig = figure[0] if isinstance(figure, tuple) else figure
        fig.savefig(path, dpi=dpi, transparent=transparent)
        plt.close(fig)


class Heatmap2D(Recipe):

    def can_plot(self, data, space) -> bool:
        return isinstance(data, Field) and data.is_grid and data.spatial_rank == 2 \
            and not data.shape.channel and data.is_centered

    def plot(self, data: Field, figure, axis, space, **kwargs):
        dims = data.resolution.names
        values = np.asarray(data.values.numpy(tuple(reversed(dims))))
        lower = np.asarray(data.bounds.lower.native())
        upper = np.asarray(data.bounds.upper.native())
        im = axis.imshow(values, origin='lower', extent=(lower[0], upper[0], lower[1], upper[1]),
                         cmap=kwargs.get('cmap', 'viridis'), aspect='auto')
        figure_obj = figure[0] if isinstance(figure, tuple) else figure
        figure_obj.colorbar(im, ax=axis)
        axis.set_xlabel(dims[0])
        axis.set_ylabel(dims[1])
        return im


class VectorField2D(Recipe):

    def can_plot(self, data, space) -> bool:
        return isinstance(data, Field) and data.is_grid and data.spatial_rank == 2 \
            and (data.is_staggered or 'vector' in data.shape)

    def plot(self, data: Field, figure, axis, space, **kwargs):
        if data.is_staggered:
            data = data.at_centers()
        dims = data.resolution.names
        centers = data.center
        x = np.asarray(centers.vector[dims[0]].numpy(dims))
        y = np.asarray(centers.vector[dims[1]].numpy(dims))
        u = np.asarray(data.values[{'vector': dims[0]}].numpy(dims))
        v = np.asarray(data.values[{'vector': dims[1]}].numpy(dims))
        # subsample for readability
        res = max(x.shape)
        stride = max(1, res // 24)
        sl = (slice(None, None, stride),) * 2
        q = axis.quiver(x[sl], y[sl], u[sl], v[sl], angles='xy')
        axis.set_xlabel(dims[0])
        axis.set_ylabel(dims[1])
        return q


class PointCloud2D(Recipe):

    def can_plot(self, data, space) -> bool:
        return isinstance(data, Field) and data.is_point_cloud and data.spatial_rank == 2

    def plot(self, data: Field, figure, axis, space, **kwargs):
        pts = data.points
        labels = pts.shape.get_labels('vector')
        x = np.asarray(pts.vector[labels[0]].native()).flatten()
        y = np.asarray(pts.vector[labels[1]].native()).flatten()
        return axis.scatter(x, y, s=kwargs.get('s', 6))


class LinePlot(Recipe):

    def can_plot(self, data, space) -> bool:
        if isinstance(data, Field):
            return data.is_grid and data.spatial_rank == 1
        return isinstance(data, Tensor) and data.rank <= 2

    def plot(self, data, figure, axis, space, **kwargs):
        if isinstance(data, Field):
            dim = data.resolution.names[0]
            x = np.asarray(data.center.vector[dim].numpy(dim))
            y = np.asarray(data.values.numpy(dim))
            return axis.plot(x, y)
        t = data
        if t.rank == 1:
            return axis.plot(np.asarray(t.native()))
        dims = t.shape.names
        return axis.plot(np.asarray(t.numpy(tuple(dims))))


class Geometry2D(Recipe):

    def can_plot(self, data, space) -> bool:
        return isinstance(data, Geometry) and data.spatial_rank == 2

    def plot(self, data: Geometry, figure, axis, space, **kwargs):
        import matplotlib.patches as patches
        if isinstance(data, Sphere):
            centers = np.atleast_2d(np.asarray(data.center.native()).reshape(-1, 2))
            radius = np.atleast_1d(np.asarray(data.radius.native()).flatten())
            for i, c in enumerate(centers):
                r = radius[i % len(radius)]
                axis.add_patch(patches.Circle(c, r, fill=kwargs.get('fill', True), alpha=0.7))
        elif isinstance(data, BaseBox):
            lower = np.atleast_2d(np.asarray(data.lower.native()).reshape(-1, 2))
            upper = np.atleast_2d(np.asarray(data.upper.native()).reshape(-1, 2))
            for lo, up in zip(lower, upper):
                axis.add_patch(patches.Rectangle(lo, *(up - lo), fill=kwargs.get('fill', True), alpha=0.7))
        else:
            c = np.atleast_2d(np.asarray(data.center.native()).reshape(-1, 2))
            axis.scatter(c[:, 0], c[:, 1])
        axis.autoscale_view()


MATPLOTLIB = MatplotlibPlots()
