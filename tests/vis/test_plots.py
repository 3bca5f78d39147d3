"""Plotting smoke tests (reference strategy: tests/commit/vis/test__plots.py —
every recipe, asserting figure creation)."""
import os
import tempfile

import numpy as np
import pytest

import phiflow_tpu.math as math
from phiflow_tpu.math import extrapolation, instance, wrap, batch
from phiflow_tpu.geom import Box, Sphere
from phiflow_tpu.field import CenteredGrid, StaggeredGrid, Noise, PointCloud
from phiflow_tpu.vis import plot, write_image, smooth
from phiflow_tpu.vis._console import heatmap, quiver


def test_plot_heatmap():
    g = CenteredGrid(Noise(), extrapolation.PERIODIC, x=16, y=16)
    fig = plot(g)
    assert fig is not None


def test_plot_vector_and_staggered():
    v = StaggeredGrid(Noise(vector='x,y'), extrapolation.PERIODIC, x=16, y=16)
    fig = plot(v)
    assert fig is not None
    vc = CenteredGrid(Noise(vector='x,y'), extrapolation.PERIODIC, x=16, y=16)
    assert plot(vc) is not None


def test_plot_point_cloud_and_geometry():
    pts = math.vec(x=wrap([1., 2.], instance(points=2)), y=wrap([3., 4.], instance(points=2)))
    pc = PointCloud(pts)
    assert plot(pc) is not None
    assert plot(Sphere(x=1, y=1, radius=0.5)) is not None
    assert plot(Box(x=2, y=2)) is not None


def test_plot_1d():
    g = CenteredGrid(lambda pos: math.sin(pos.vector['x']), extrapolation.PERIODIC, x=32, bounds=Box(x=6.28))
    assert plot(g) is not None


def test_plot_dict_and_save():
    g = CenteredGrid(Noise(), extrapolation.PERIODIC, x=8, y=8)
    fig = plot({'noise': g, 'same': g})
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, 'fig.png')
        write_image(path, fig)
        assert os.path.isfile(path)


def test_console_plots():
    g = CenteredGrid(Noise(), extrapolation.PERIODIC, x=16, y=16)
    art = heatmap(g)
    assert len(art.splitlines()) >= 10
    v = StaggeredGrid(Noise(vector='x,y'), extrapolation.PERIODIC, x=16, y=16)
    arrows = quiver(v)
    assert len(arrows.splitlines()) >= 5


def test_scene_logging():
    from phiflow_tpu.field import Scene
    from phiflow_tpu.vis import SceneLog, load_scalars
    with tempfile.TemporaryDirectory() as d:
        scene = Scene.create(d)
        log = SceneLog(scene)
        for i in range(5):
            log.log_scalars(i, energy=float(i) ** 2)
        curve = load_scalars(scene, 'energy')
        assert curve.shape.get_size('iteration') == 5


def test_smooth():
    data = np.random.randn(100).astype(np.float32)
    sm = smooth(wrap(data, math.spatial('t')), 10)
    assert np.std(sm) < np.std(data)


# ---------------------------------------------------------------------------
# 3D + specialized recipes (reference: tests/commit/vis/test__plots.py:15-24,
# recipes from phi/vis/_matplotlib/_matplotlib_plots.py:222-795)
# ---------------------------------------------------------------------------

def test_plot_heatmap_3d():
    g = CenteredGrid(lambda pos: math.sin(pos.vector['x']) + math.cos(pos.vector['y']),
                     extrapolation.PERIODIC, x=12, y=12, z=12, bounds=Box(x=6.28, y=6.28, z=6.28))
    assert plot(g) is not None


def test_plot_vector_field_3d():
    v = CenteredGrid(Noise(vector='x,y,z'), extrapolation.PERIODIC, x=8, y=8, z=8)
    assert plot(v) is not None
    vs = StaggeredGrid(Noise(vector='x,y,z'), extrapolation.PERIODIC, x=8, y=8, z=8)
    assert plot(vs) is not None


def test_plot_point_cloud_3d():
    pts = math.vec(x=wrap([1., 2.], instance(points=2)), y=wrap([3., 4.], instance(points=2)),
                   z=wrap([0., 1.], instance(points=2)))
    assert plot(PointCloud(pts)) is not None


def test_plot_streamlines():
    v = CenteredGrid(Noise(vector='x,y'), extrapolation.PERIODIC, x=16, y=16)
    assert plot(v, plot_type='stream') is not None


def test_plot_histogram_and_bar():
    t = wrap(np.random.randn(200).astype(np.float32), instance('samples'))
    assert plot(t, plot_type='histogram') is not None
    labeled = wrap([3., 1., 2.], math.channel(metric='a,b,c'))
    assert plot(labeled, plot_type='bar') is not None


def test_plot_vector_cloud_2d():
    pts = math.vec(x=wrap([1., 2.], instance(points=2)), y=wrap([3., 4.], instance(points=2)))
    vel = math.vec(x=wrap([0.5, -0.5], instance(points=2)), y=wrap([0.1, 0.2], instance(points=2)))
    pc = PointCloud(pts).with_values(vel)
    assert plot(pc) is not None


def test_plot_mesh_field():
    from phiflow_tpu.geom._mesh import build_mesh
    from phiflow_tpu.field import Field
    m = build_mesh(Box(x=2, y=1), x=12, y=6)
    f = Field(m, math.vec(x=1., y=0.), {'x-': math.vec(x=1., y=0.), 'x+': extrapolation.ZERO_GRADIENT,
                                        'y-': 0., 'y+': 0.})
    assert plot(f) is not None


def test_plot_geometry_3d():
    assert plot(Sphere(x=1, y=1, z=1, radius=0.5)) is not None


def test_plot_animation():
    g = CenteredGrid(Noise(batch(time=3)), extrapolation.PERIODIC, x=8, y=8)
    anim = plot(g, animate='time')
    assert anim is not None


def test_show_hist():
    from phiflow_tpu.vis import show_hist
    t = wrap(np.random.randn(100).astype(np.float32), instance('samples'))
    assert show_hist(t) is not None


def test_plot_overlay():
    """overlay() renders multiple fields into one axis (reference:
    phi/vis/_vis.py:449)."""
    from phiflow_tpu.vis import overlay
    g = CenteredGrid(Noise(), extrapolation.PERIODIC, x=16, y=16)
    geo = Sphere(x=8, y=8, radius=3)
    fig = plot(overlay(g, geo))
    assert fig is not None


def test_plot_row_col_dims():
    """Batch dims laid out over subplot rows/cols (reference: _vis.py:178-181)."""
    g = CenteredGrid(Noise(batch(b=2, c=3)), extrapolation.PERIODIC, x=8, y=8)
    fig = plot(g, row_dims='b', col_dims='c')
    assert fig is not None
    f = fig[0] if isinstance(fig, tuple) else fig
    assert len(f.axes) >= 6  # 2×3 grid (+colorbars)
