"""Plotly 3D recipe coverage (reference: phi/vis/_dash/_plotly_plots.py
VectorCloud3D:296, Object3D:425, Graph3D:558, SplineSheet3D:706).

plotly is not installed in the CI image, so the go.* constructors are faked:
each test verifies recipe dispatch (can_plot) and runs the full plot body,
checking the geometry arrays handed to plotly. The tessellation helpers are
pure numpy and tested directly.
"""
import numpy as np
import pytest

from phiflow_tpu.math import instance, channel, wrap, vec
from phiflow_tpu.field import Field, PointCloud
from phiflow_tpu.geom import Sphere, Cylinder, Box
from phiflow_tpu.vis import _plotly_plots as pp


# --- fake plotly -----------------------------------------------------------

class _FakeTrace:
    def __init__(self, kind, **kwargs):
        self.kind = kind
        self.kwargs = kwargs


class _FakeGo:
    def __getattr__(self, kind):
        return lambda **kwargs: _FakeTrace(kind, **kwargs)


class _FakeFigure:
    def __init__(self):
        self.traces = []

    def add_trace(self, trace, row=None, col=None):
        self.traces.append(trace)


@pytest.fixture()
def fake_go(monkeypatch):
    monkeypatch.setattr(pp, 'go', _FakeGo())
    return _FakeFigure()


# --- tessellation helpers --------------------------------------------------

def test_sphere_surface_radius_and_closure():
    verts, faces = pp.sphere_surface(np.array([[1., 2., 3.]]), np.array([0.5]), n=8)
    d = np.linalg.norm(verts - np.array([1., 2., 3.]), axis=1)
    np.testing.assert_allclose(d, 0.5, atol=1e-12)
    assert faces.min() >= 0 and faces.max() < len(verts)
    # two spheres → disjoint index ranges
    v2, f2 = pp.sphere_surface(np.zeros((2, 3)), np.array([1., 2.]), n=6)
    assert len(v2) == 2 * len(verts) * len(v2) // (2 * len(verts))  # non-empty
    assert f2[len(f2) // 2:].min() >= len(v2) // 2


def test_cuboid_surface():
    verts, faces = pp.cuboid_surface(np.array([[0., 0., 0.]]), np.array([[1., 2., 3.]]))
    assert verts.shape == (8, 3)
    assert faces.shape == (12, 3)
    np.testing.assert_allclose(verts.min(0), [0, 0, 0])
    np.testing.assert_allclose(verts.max(0), [1, 2, 3])
    # closed surface: every edge shared by exactly 2 triangles
    edges = {}
    for tri in faces:
        for a, b in ((tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])):
            key = (min(a, b), max(a, b))
            edges[key] = edges.get(key, 0) + 1
    assert all(c == 2 for c in edges.values())


def test_cylinder_surface():
    verts, faces = pp.cylinder_surface(np.array([[0., 0., 0.]]), 1.0, 4.0, axis_index=2, n=16)
    r = np.linalg.norm(verts[:32, :2], axis=1)
    np.testing.assert_allclose(r, 1.0, atol=1e-12)
    assert verts[:, 2].min() == -2.0 and verts[:, 2].max() == 2.0
    assert faces.max() < len(verts)


# --- recipes ---------------------------------------------------------------

def _cloud3d(values_vec=False):
    pts = wrap(np.random.RandomState(0).rand(10, 3).astype(np.float32),
               instance(points=10), channel(vector='x,y,z'))
    cloud = PointCloud(pts)
    if values_vec:
        vals = wrap(np.random.RandomState(1).rand(10, 3).astype(np.float32),
                    instance(points=10), channel(vector='x,y,z'))
        cloud = cloud.with_values(vals)
    return cloud


def test_vector_cloud_3d(fake_go):
    recipe = pp.VectorCloud3DP()
    data = _cloud3d(values_vec=True)
    assert recipe.can_plot(data, None)
    assert not recipe.can_plot(_cloud3d(values_vec=False), None)
    recipe.plot(data, fake_go, (0, 0), None)
    (trace,) = fake_go.traces
    assert trace.kind == 'Cone'
    assert len(trace.kwargs['x']) == 10 and len(trace.kwargs['u']) == 10


def test_object3d_spheres(fake_go):
    recipe = pp.Object3DP()
    spheres = Sphere(wrap(np.array([[0., 0, 0], [5, 5, 5]], np.float32),
                          instance(points=2), channel(vector='x,y,z')), radius=1.)
    data = Field(spheres, wrap(1.), 0.)
    assert recipe.can_plot(data, None)
    recipe.plot(data, fake_go, (0, 0), None)
    (trace,) = fake_go.traces
    assert trace.kind == 'Mesh3d'
    xs = np.asarray(trace.kwargs['x'])
    assert xs.min() >= -1.001 and xs.max() <= 6.001


def test_object3d_box_and_cylinder(fake_go):
    recipe = pp.Object3DP()
    box_cloud = Field(Box(x=(0, 1.), y=(0, 2.), z=(0, 3.)), wrap(1.), 0.)
    cyl = Cylinder(vec(x=0., y=0., z=0.), radius=1., depth=2., axis='z')
    cyl_cloud = Field(cyl, wrap(1.), 0.)
    for data in (box_cloud, cyl_cloud):
        if recipe.can_plot(data, None):
            recipe.plot(data, fake_go, (0, 0), None)
    assert len(fake_go.traces) >= 1
    assert all(t.kind == 'Mesh3d' for t in fake_go.traces)


def test_graph3d(fake_go):
    from phiflow_tpu.geom import graph as make_graph
    from phiflow_tpu.geom._graph import Graph
    pts = wrap(np.array([[0., 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
               instance(points=3), channel(vector='x,y,z'))
    dense = wrap(np.array([[0, 1, 1], [1, 0, 0], [1, 0, 0]], np.float32),
                 instance(points=3), instance(points2=3))
    g = make_graph(PointCloud(pts).geometry, dense)
    recipe = pp.Graph3DP()
    assert recipe.can_plot(g, None)
    recipe.plot(g, fake_go, (0, 0), None)
    (trace,) = fake_go.traces
    assert trace.kind == 'Scatter3d'
    # 4 nonzero entries → 4 segments of 3 points (start, end, nan)
    assert len(trace.kwargs['x']) == 4 * 3


def test_spline_sheet_3d(fake_go):
    from phiflow_tpu.geom._spline_sheet import BSplineSheet
    ctrl = np.zeros((4, 4, 3), np.float32)
    ctrl[..., 0] = np.arange(4)[:, None]
    ctrl[..., 1] = np.arange(4)[None, :]
    sheet = BSplineSheet(ctrl, degrees=(2, 2))
    recipe = pp.SplineSheet3DP()
    assert recipe.can_plot(sheet, None)
    recipe.plot(sheet, fake_go, (0, 0), None)
    (trace,) = fake_go.traces
    assert trace.kind == 'Mesh3d'
    assert len(trace.kwargs['i']) == 2 * 23 * 23  # quads split into 2 tris


def test_recipes_registered():
    lib = pp.PlotlyPlots.__init__
    # instantiating requires plotly's make_subplots only at figure creation;
    # the registry itself must include the four 3D recipes
    names = [cls.__name__ for cls in (pp.VectorCloud3DP, pp.Object3DP, pp.Graph3DP, pp.SplineSheet3DP)]
    import inspect
    src = inspect.getsource(pp.PlotlyPlots)
    for n in names:
        assert n in src
