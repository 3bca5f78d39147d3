import numpy as np

import phiflow_tpu.math as math
from phiflow_tpu.math import instance, channel, wrap
from phiflow_tpu.geom._spline import b_spline_knots, eval_nurbs_bases, spline_eval
from phiflow_tpu.geom._mesh_builder import MeshBuilder, join_meshes, decimate_tri_mesh


def test_knots():
    k = b_spline_knots(4, degree=2)
    assert len(k) == 7
    assert k[0] == 0 and k[-1] == 1


def test_basis_partition_of_unity():
    knots = b_spline_knots(5, degree=2)
    u = wrap(np.linspace(0.01, 0.99, 17).astype(np.float32), math.spatial('u'))
    bases = eval_nurbs_bases(u, knots, degree=2, control_count=5)
    total = math.sum(bases, 'basis')
    assert np.allclose(total.numpy('u'), 1.0, atol=1e-5)


def test_spline_eval_endpoints():
    pts = wrap(np.array([[0., 0.], [1., 2.], [2., 0.]], np.float32),
               instance(points=3), channel(vector='x,y'))
    start = spline_eval(pts, wrap(0.))
    end = spline_eval(pts, wrap(1.))
    assert np.allclose(start.numpy('vector'), [0., 0.], atol=1e-5)
    assert np.allclose(end.numpy('vector'), [2., 0.], atol=1e-5)


def test_mesh_builder():
    b = MeshBuilder()
    b.add_polygon((0., 0.), (1., 0.), (1., 1.), (0., 1.))
    b.add_polygon((1., 0.), (2., 0.), (2., 1.), (1., 1.))
    m = b.build()
    assert m.cell_count == 2
    assert abs(float(math.sum(m.volume)) - 2.0) < 1e-5


def test_decimate():
    verts = np.random.rand(100, 3).astype(np.float32)
    faces = np.random.randint(0, 100, (50, 3)).astype(np.int32)
    v2, f2 = decimate_tri_mesh(verts, faces, 0.3)
    assert len(v2) < len(verts)


# --- surface sheets & solids ---

def test_bspline_sheet_flat():
    """A flat control net must reproduce the plane exactly (linear precision)."""
    import numpy as np
    from phiflow_tpu.geom import BSplineSheet
    u, v = np.meshgrid(np.linspace(0, 2, 5), np.linspace(0, 3, 4), indexing='ij')
    control = np.stack([u, v, np.zeros_like(u)], -1)
    sheet = BSplineSheet(control, degrees=(2, 2))
    p = sheet.eval(0.5, 0.5).numpy('vector')
    assert abs(p[0] - 1.0) < 1e-5 and abs(p[1] - 1.5) < 1e-5 and abs(p[2]) < 1e-6
    n = sheet.normal(0.5, 0.5).numpy('vector')
    assert abs(abs(n[2]) - 1.0) < 1e-4  # normal ⟂ plane
    assert abs(sheet.area(24) - 6.0) < 0.05  # 2×3 rectangle
    pts, faces = sheet.to_mesh(8, 8)
    assert pts.shape == (64, 3) and faces.shape == (49, 4)


def test_spline_solid_cube():
    import numpy as np
    from phiflow_tpu.geom import SplineVolume
    g = np.linspace(0, 1, 4)
    u, v, w = np.meshgrid(g, g, g, indexing='ij')
    solid = SplineVolume(np.stack([u, v, w], -1))
    c = solid.eval(0.5, 0.5, 0.5).numpy('vector')
    assert np.allclose(c, 0.5, atol=1e-5)
    assert abs(solid.volume(12) - 1.0) < 0.05
    sheets = solid.to_sheets()
    assert len(sheets) == 6


def test_to_spline_box_exact():
    import numpy as np
    from phiflow_tpu.geom import Box, to_spline_volume
    ss = to_spline_volume(Box(x=2., y=1., z=1.))
    assert abs(ss.volume(12) - 2.0) < 1e-3


def test_to_spline_sphere_approximate():
    import numpy as np
    from phiflow_tpu.geom import Sphere, to_spline_volume
    sp = to_spline_volume(Sphere(x=0., y=0., z=0., radius=1.), control_resolution=(8, 20, 30))
    exact = 4 / 3 * np.pi
    assert abs(sp.volume(20) - exact) / exact < 0.25  # control-net approximation


def test_double_cover_closes_sheet():
    import numpy as np
    from phiflow_tpu.geom import BSplineSheet, double_cover
    sheet = BSplineSheet(np.random.default_rng(0).standard_normal((4, 4, 3)).astype(np.float32))
    dc = double_cover(sheet)
    assert dc.control.shape[0] == 8
    # forward and backward covers share the end control rows
    np.testing.assert_allclose(dc.control[3], dc.control[4])
