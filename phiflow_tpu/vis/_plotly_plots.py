"""Plotly plotting backend (reference: /root/reference/phi/vis/_dash/_plotly_plots.py:34-706).

Gated on plotly availability — plotly is NOT a hard dependency. When installed,
`PLOTLY` registers the interactive recipes (2D heatmaps/quivers, 3D volume,
point clouds, line plots); otherwise importing this module still succeeds and
`PLOTLY is None`, with `plot(..., lib='plotly')` raising a clear error.
"""
from __future__ import annotations

import numpy as np

from ..math import Tensor
from ..field import Field
from ..geom import Geometry
from ._vis_base import Recipe, PlottingLibrary

try:
    import plotly.graph_objects as go
    from plotly.subplots import make_subplots
    _PLOTLY_AVAILABLE = True
except ImportError:  # pragma: no cover — plotly not installed in this image
    go = None
    make_subplots = None
    _PLOTLY_AVAILABLE = False

__all__ = ['PLOTLY', 'plotly_available']


def plotly_available() -> bool:
    return _PLOTLY_AVAILABLE


class _PlotlyRecipe(Recipe):
    pass


class LinePlotP(_PlotlyRecipe):
    """reference: _plotly_plots.py LinePlot:204"""

    def can_plot(self, data, space) -> bool:
        return isinstance(data, Field) and data.is_grid and data.spatial_rank == 1

    def plot(self, data: Field, figure, subplot, space, **kwargs):
        dim = data.resolution.names[0]
        x = np.asarray(data.points.numpy(dim)) if not data.shape.channel else \
            np.asarray(data.points[{'vector': dim}].numpy(dim))
        y = np.asarray(data.values.numpy(dim))
        figure.add_trace(go.Scatter(x=x, y=y, mode='lines'), row=subplot[0] + 1, col=subplot[1] + 1)


class Heatmap2DP(_PlotlyRecipe):
    """reference: _plotly_plots.py Heatmap2D:228"""

    def can_plot(self, data, space) -> bool:
        return isinstance(data, Field) and data.is_grid and data.spatial_rank == 2 \
            and not data.shape.channel and data.is_centered

    def plot(self, data: Field, figure, subplot, space, **kwargs):
        dims = data.resolution.names
        values = np.asarray(data.values.numpy(tuple(reversed(dims))))
        figure.add_trace(go.Heatmap(z=values, colorscale='Viridis'),
                         row=subplot[0] + 1, col=subplot[1] + 1)


class VectorField2DP(_PlotlyRecipe):
    """reference: _plotly_plots.py VectorCloud2D:331 (cone/quiver analog)"""

    def can_plot(self, data, space) -> bool:
        return isinstance(data, Field) and data.is_grid and data.spatial_rank == 2 \
            and bool(data.shape.channel)

    def plot(self, data: Field, figure, subplot, space, **kwargs):
        at_c = data.at_centers() if data.is_staggered else data
        dims = at_c.resolution.names
        pts = at_c.points
        xs = np.asarray(pts[{'vector': dims[0]}].numpy(dims)).ravel()
        ys = np.asarray(pts[{'vector': dims[1]}].numpy(dims)).ravel()
        u = np.asarray(at_c.values[{'vector': dims[0]}].numpy(dims)).ravel()
        v = np.asarray(at_c.values[{'vector': dims[1]}].numpy(dims)).ravel()
        # plotly has no native quiver in graph_objects: draw line segments
        scale = 0.4 * float(np.median(np.abs(np.diff(np.unique(xs))))) / (np.abs(u).max() + 1e-12)
        lines_x, lines_y = [], []
        for x, y, du, dv in zip(xs, ys, u, v):
            lines_x += [x, x + du * scale, None]
            lines_y += [y, y + dv * scale, None]
        figure.add_trace(go.Scatter(x=lines_x, y=lines_y, mode='lines'),
                         row=subplot[0] + 1, col=subplot[1] + 1)


class Heatmap3DP(_PlotlyRecipe):
    """Volume rendering (reference: _plotly_plots.py Heatmap3D:274)."""

    def can_plot(self, data, space) -> bool:
        return isinstance(data, Field) and data.is_grid and data.spatial_rank == 3 \
            and not data.shape.channel and data.is_centered

    def plot(self, data: Field, figure, subplot, space, **kwargs):
        dims = data.resolution.names
        values = np.asarray(data.values.numpy(dims))
        pts = data.points
        coords = [np.asarray(pts[{'vector': d}].numpy(dims)).ravel() for d in dims]
        figure.add_trace(go.Volume(
            x=coords[0], y=coords[1], z=coords[2], value=values.ravel(),
            opacity=0.1, surface_count=17), row=subplot[0] + 1, col=subplot[1] + 1)


class PointCloud2DP(_PlotlyRecipe):
    """reference: _plotly_plots.py PointCloud2D:347"""

    def can_plot(self, data, space) -> bool:
        return isinstance(data, Field) and data.is_point_cloud and data.spatial_rank == 2

    def plot(self, data: Field, figure, subplot, space, **kwargs):
        pts = data.points
        labels = data.geometry.shape.get_labels('vector')
        xs = np.asarray(pts[{'vector': labels[0]}].numpy()).ravel()
        ys = np.asarray(pts[{'vector': labels[1]}].numpy()).ravel()
        figure.add_trace(go.Scatter(x=xs, y=ys, mode='markers', marker=dict(size=3)),
                         row=subplot[0] + 1, col=subplot[1] + 1)


class PointCloud3DP(_PlotlyRecipe):
    """reference: _plotly_plots.py Scatter3D:508"""

    def can_plot(self, data, space) -> bool:
        return isinstance(data, Field) and data.is_point_cloud and data.spatial_rank == 3

    def plot(self, data: Field, figure, subplot, space, **kwargs):
        pts = data.points
        labels = data.geometry.shape.get_labels('vector')
        xyz = [np.asarray(pts[{'vector': l}].numpy()).ravel() for l in labels]
        figure.add_trace(go.Scatter3d(x=xyz[0], y=xyz[1], z=xyz[2], mode='markers',
                                      marker=dict(size=2)), row=subplot[0] + 1, col=subplot[1] + 1)


class SurfaceMesh3DP(_PlotlyRecipe):
    """Triangle-surface plot of 3D meshes / mesh fields
    (reference: _plotly_plots.py SurfaceMesh3D:586)."""

    def can_plot(self, data, space) -> bool:
        from ..geom._mesh import Mesh
        if isinstance(data, Field) and data.is_mesh and data.spatial_rank == 3:
            return True
        return isinstance(data, Mesh) and data.spatial_rank == 3 and data.element_rank == 2

    def plot(self, data, figure, subplot, space, **kwargs):
        from ..geom._mesh import Mesh
        mesh = data.geometry if isinstance(data, Field) else data
        verts = np.asarray(mesh.vertices.center.native(('vertices', 'vector')))
        elems = np.asarray(mesh.elements).reshape(-1, 3)
        intensity = None
        if isinstance(data, Field):
            intensity = np.asarray(data.values.native()).ravel()
        figure.add_trace(go.Mesh3d(x=verts[:, 0], y=verts[:, 1], z=verts[:, 2],
                                   i=elems[:, 0], j=elems[:, 1], k=elems[:, 2],
                                   intensity=intensity, opacity=0.8),
                         row=subplot[0] + 1, col=subplot[1] + 1)


class SDF3DP(_PlotlyRecipe):
    """Isosurface of an SDF grid (reference: _plotly_plots.py SDF3D:682)."""

    def can_plot(self, data, space) -> bool:
        from ..geom._sdf_grid import SDFGrid
        return isinstance(data, SDFGrid) and data.spatial_rank == 3

    def plot(self, data, figure, subplot, space, **kwargs):
        vals = np.asarray(data.values.native(data.values.shape.names))
        dims = data.values.shape.names
        grids = np.meshgrid(*[np.arange(s) for s in vals.shape], indexing='ij')
        figure.add_trace(go.Isosurface(
            x=grids[0].ravel(), y=grids[1].ravel(), z=grids[2].ravel(),
            value=vals.ravel(), isomin=0.0, isomax=0.0, surface_count=1),
            row=subplot[0] + 1, col=subplot[1] + 1)


class PlotlyPlots(PlottingLibrary):
    """reference: _plotly_plots.py PlotlyPlots:34"""

    def __init__(self):
        super().__init__('plotly', [
            Heatmap2DP(), VectorField2DP(), Heatmap3DP(), PointCloud2DP(), LinePlotP(),
            PointCloud3DP(), SurfaceMesh3DP(), SDF3DP(),
        ])

    def create_figure(self, size, rows, cols, subplots=None, titles=None, log_dims=()):
        figure = make_subplots(rows=rows, cols=cols)
        figure.update_layout(width=size[0] * 90, height=size[1] * 90)
        return figure, {(r, c): (r, c) for r in range(rows) for c in range(cols)}

    def finalize(self, figure):
        pass

    def show(self, figure):
        fig = figure[0] if isinstance(figure, tuple) else figure
        fig.show()

    def save(self, figure, path, dpi=120, transparent=False):
        fig = figure[0] if isinstance(figure, tuple) else figure
        if path.endswith('.html'):
            fig.write_html(path)
        else:
            fig.write_image(path)  # requires kaleido


PLOTLY = PlotlyPlots() if _PLOTLY_AVAILABLE else None
