"""Thickened-sheet SplineSolid (reference: phi/geom/_spline_solid.py:20-486)."""
import numpy as np
import pytest

from phiflow_tpu.math import wrap, spatial, channel, vec
from phiflow_tpu.math import _ops as ops
from phiflow_tpu.geom import (SplineSolid, to_spline, apply_spline_bounds, transform_with_spline,
                              closest_param, Box, Sphere, Cylinder)
from phiflow_tpu.math._tensor import Tensor


def flat_sheet(nu=3, nv=4, lx=2., ly=3., thickness=0.5, fillet=None):
    """Flat sheet in the z=0 plane spanning [0,lx]x[0,ly]."""
    u, v = np.meshgrid(np.linspace(0, lx, nu), np.linspace(0, ly, nv), indexing='ij')
    pts = np.stack([u, v, np.zeros_like(u)], -1).astype(np.float32)
    points = Tensor(pts, spatial(u=nu, v=nv) & channel(vector='x,y,z'))
    return SplineSolid(points, thickness, fillet or {}, {'u': 1, 'v': 1})


def test_vertex_normals_flat():
    s = flat_sheet()
    n = s.vertex_normals.numpy(('u', 'v', 'vector'))
    assert np.allclose(np.abs(n[..., 2]), 1.0, atol=1e-5)
    assert np.allclose(n[..., :2], 0.0, atol=1e-5)


def test_volume_flat():
    s = flat_sheet(lx=2., ly=3., thickness=0.5)
    assert abs(float(ops.sum_(s.volume, 'u,v')) - 2. * 3. * 0.5) < 1e-4


def test_surface_points_offset():
    s = flat_sheet(thickness=1.0)
    sp = s.surface_points
    z = sp.numpy(('~side', 'u', 'v', 'vector'))[..., 2]
    assert np.allclose(sorted(np.unique(np.round(z, 5))), [-0.5, 0.5])


def test_signed_distance_slab_interior():
    """Away from edges the SDF must match the infinite-slab distance |z| - r."""
    s = flat_sheet(lx=4., ly=4., thickness=1.0)
    query = vec(x=2., y=2., z=0.8)
    d = float(s.approximate_signed_distance(query))
    assert abs(d - (0.8 - 0.5)) < 1e-2
    inside = vec(x=2., y=2., z=0.2)
    d_in = float(s.approximate_signed_distance(inside))
    assert abs(d_in - (0.2 - 0.5)) < 1e-2
    assert bool(s.lies_inside(inside))
    assert not bool(s.lies_inside(query))


def test_signed_distance_sharp_edge():
    """Beyond a sharp (fillet 0 -> eps) edge, distance grows with the overrun."""
    s = flat_sheet(lx=4., ly=4., thickness=1.0)
    d = float(s.approximate_signed_distance(vec(x=5., y=2., z=0.)))
    assert 0.8 < d < 1.2  # ~1 beyond the u+ edge (min sphere radius shrinks it slightly)


def test_closest_param_projects():
    s = flat_sheet(lx=2., ly=3.)
    loc = vec(x=1.2, y=0.7, z=2.0)
    on_skel, uv, unbounded, tangents = closest_param(s.order, s.points, loc)
    p = on_skel.numpy('vector')
    assert np.allclose(p, [1.2, 0.7, 0.0], atol=1e-3)
    # batched queries
    locs = Tensor(np.array([[0.5, 0.5, 1.], [1.9, 2.9, -1.]], np.float32),
                  spatial(q=2) & channel(vector='x,y,z'))
    on_skel, uv, unbounded, _ = closest_param(s.order, s.points, locs)
    pn = on_skel.numpy(('q', 'vector'))
    assert np.allclose(pn[0], [0.5, 0.5, 0.0], atol=1e-3)
    assert np.allclose(pn[1], [1.9, 2.9, 0.0], atol=1e-3)


def test_to_spline_box_roundtrip():
    box = Box(x=2., y=3., z=0.5)
    s = to_spline(box)
    assert isinstance(s, SplineSolid)
    assert abs(float(ops.sum_(s.volume, spatial)) - 3.0) < 1e-3  # 2*3*0.5
    # interior query agrees with the box SDF away from edges: Box(z=0.5) spans
    # [0, 0.5] -> sheet at z=0.25, half-thickness 0.25; z=0.4 is 0.1 inside
    q = vec(x=1.0, y=1.5, z=0.4)
    d_spline = float(s.approximate_signed_distance(q))
    assert abs(d_spline - (-0.1)) < 2e-2
    d_out = float(s.approximate_signed_distance(vec(x=1.0, y=1.5, z=0.75)))
    assert abs(d_out - 0.25) < 2e-2


def test_to_spline_cylinder_caps():
    cyl = Cylinder(vec(x=0., y=0., z=0.), radius=1., depth=4., axis='z')
    s = to_spline(cyl)
    assert s.fillet['v-'].numpy().max() == 1.0  # round caps
    # point on the cylinder mantle: SDF ~ 0
    d = float(s.approximate_signed_distance(vec(x=1., y=0., z=0.)))
    assert abs(d) < 0.1


def test_to_spline_sphere():
    sp = to_spline(Sphere(x=0., y=0., z=0., radius=1.))
    d_surface = float(sp.approximate_signed_distance(vec(x=0., y=0., z=1.)))
    assert abs(d_surface) < 5e-2
    d_out = float(sp.approximate_signed_distance(vec(x=0., y=0., z=2.)))
    assert abs(d_out - 1.) < 5e-2


def test_face_areas_flat():
    s = flat_sheet(lx=2., ly=3., thickness=0.2)
    areas = s.face_areas
    # front/back spline faces sum to 2 * lx*ly plus edge/corner strips
    total = float(ops.sum_(areas, areas.shape))
    assert total > 2 * 2. * 3.


def test_surface_mesh_closed():
    s = flat_sheet(nu=3, nv=3, lx=2., ly=2., thickness=0.5,
                   fillet={'u-': .5, 'u+': .5, 'v-': .5, 'v+': .5})
    mesh = s.surface_mesh(min_cyl_segments=3, min_corner_segments=2)
    assert mesh.cell_count > 20
    # closed surface: every edge shared by exactly 2 polygons
    from collections import Counter
    edges = Counter()
    for poly in mesh._element_lists:
        for k in range(len(poly)):
            a, b = poly[k], poly[(k + 1) % len(poly)]
            edges[(min(a, b), max(a, b))] += 1
    counts = np.array(list(edges.values()))
    assert (counts == 2).mean() > 0.9  # allow tolerance at degenerate corner seams


def test_apply_spline_bounds_rectifies():
    pts = np.array([[[0., 0., 0.], [0., 1., 0.]],
                    [[1., 0.3, 0.], [1., 1.3, 0.]]], np.float32)  # sheared quad
    s = SplineSolid(Tensor(pts, spatial(u=2, v=2) & channel(vector='x,y,z')), 0.1,
                    {'u-': 1.5, 'u+': -0.2}, {'u': 1, 'v': 1})
    r = apply_spline_bounds(s)
    p = r.points.numpy(('u', 'v', 'vector'))
    du = p[1, 0] - p[0, 0]
    dv = p[0, 1] - p[0, 0]
    assert abs(np.dot(du, dv)) < 1e-5  # orthogonalized
    assert float(r.fillet['u-'].numpy().max()) <= 1.0
    assert float(r.fillet['u+'].numpy().min()) >= 0.0


def test_transform_with_spline_translation():
    src = flat_sheet(lx=2., ly=2., thickness=0.5)
    tgt = src.shifted(vec(x=1., y=0., z=2.))
    pts = Tensor(np.array([[0.5, 0.5, 0.1], [1.5, 1.0, -0.2]], np.float32),
                 spatial(q=2) & channel(vector='x,y,z'))
    moved = transform_with_spline(pts, src, tgt)
    expect = pts + vec(x=1., y=0., z=2.)
    np.testing.assert_allclose(moved.numpy(('q', 'vector')), expect.numpy(('q', 'vector')), atol=1e-2)


def test_scaled_and_arithmetic():
    s = flat_sheet(thickness=0.5)
    s2 = s.scaled(2.)
    assert abs(float(ops.sum_(s2.volume, spatial)) - 8 * float(ops.sum_(s.volume, spatial))) < 1e-3
    s3 = s * 2.
    assert abs(float(s3.thickness.numpy().max()) - 1.0) < 1e-6
    s4 = s + s
    assert abs(float(s4.thickness.numpy().max()) - 1.0) < 1e-6
