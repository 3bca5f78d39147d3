"""Surface meshing via marching tetrahedra (reference analog:
phi/geom/_convert.py:84 — marching cubes through scikit-image; here
self-contained and vectorized, `geom/_convert.py:marching_tetrahedra`)."""
import numpy as np

from phiflow_tpu.geom import Sphere, Box, union
from phiflow_tpu.geom._convert import surface_mesh, marching_tetrahedra


def _area(verts, faces):
    tri = verts[faces]
    return 0.5 * np.linalg.norm(np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1).sum()


def _watertight(faces):
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    edges.sort(axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    return np.all(counts == 2)


def test_sphere_surface():
    verts, faces = surface_mesh(Sphere(x=0, y=0, z=0, radius=1.), rel_dx=0.04)
    r = np.linalg.norm(verts, axis=1)
    assert r.min() > 0.99 and r.max() <= 1.0 + 1e-6
    assert abs(_area(verts, faces) - 4 * np.pi) / (4 * np.pi) < 0.01
    assert _watertight(faces)


def test_union_surface_watertight():
    geo = union(Sphere(x=0, y=0, z=0, radius=1.), Sphere(x=1.2, y=0, z=0, radius=0.8))
    verts, faces = surface_mesh(geo, rel_dx=0.04)
    assert len(faces) > 100
    assert _watertight(faces)


def test_marching_tetrahedra_plane():
    # zero level of f(x,y,z) = z - 0.5 on a unit lattice: a flat plane of area (n-1)^2
    n = 9
    z = np.arange(n, dtype=float)
    values = np.broadcast_to(z - 4.5, (n, n, n)).copy()
    verts, faces = marching_tetrahedra(values, origin=(0., 0., 0.), dx=(1., 1., 1.))
    assert np.allclose(verts[:, 2], 4.5)
    assert abs(_area(verts, faces) - (n - 1) ** 2) < 1e-3


def test_empty_and_full():
    values = np.ones((5, 5, 5))      # all outside
    verts, faces = marching_tetrahedra(values, (0., 0., 0.), (1., 1., 1.))
    assert len(verts) == 0 and len(faces) == 0
    verts, faces = marching_tetrahedra(-values, (0., 0., 0.), (1., 1., 1.))
    assert len(faces) == 0


def test_surface_mesh_2d_contours():
    paths = surface_mesh(Sphere(x=0, y=0, radius=1.), rel_dx=0.02)
    assert len(paths) > 0
    r = np.linalg.norm(paths[0], axis=1)       # world coordinates on the circle
    assert 0.95 < r.min() and r.max() < 1.05
