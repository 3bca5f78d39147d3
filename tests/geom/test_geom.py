import numpy as np
import jax

import phiflow_tpu.math as math
from phiflow_tpu.math import spatial, channel, instance, wrap
from phiflow_tpu.geom import Box, Cuboid, Sphere, UniformGrid, union, Point, rotate_vector


def test_box_constructors():
    b = Box(x=1, y=2)
    assert float(b.volume) == 2.0
    b2 = Box['x,y', 0:1, 0:2]
    assert float(b2.volume) == 2.0
    b3 = Box(math.vec(x=0., y=0.), math.vec(x=1., y=2.))
    assert float(b3.volume) == 2.0


def test_box_sdf():
    b = Box(x=2, y=2)
    assert float(b.approximate_signed_distance(math.vec(x=1., y=1.))) == -1.0
    assert abs(float(b.approximate_signed_distance(math.vec(x=3., y=1.))) - 1.0) < 1e-6
    assert bool(b.lies_inside(math.vec(x=0.5, y=0.5)))
    assert not bool(b.lies_inside(math.vec(x=2.5, y=0.5)))


def test_sphere():
    s = Sphere(x=0, y=0, radius=2)
    assert abs(float(s.volume) - np.pi * 4) < 1e-4
    assert bool(s.lies_inside(math.vec(x=1., y=1.)))
    assert abs(float(s.approximate_signed_distance(math.vec(x=3., y=0.))) - 1.0) < 1e-5
    assert abs(float(Sphere.radius_from_volume(Sphere.volume_from_radius(1.5, 3), 3)) - 1.5) < 1e-5


def test_union_instance_reduction():
    u = union(Sphere(x=0, y=0, radius=1), Sphere(x=5, y=5, radius=1))
    pts = math.vec(x=wrap([0., 5., 2.5], instance(p=3)), y=wrap([0., 5., 2.5], instance(p=3)))
    inside = u.lies_inside(pts)
    assert inside.numpy('p').tolist() == [True, True, False]
    # batched same-type union stacks into one Sphere
    assert isinstance(u, Sphere)


def test_inverted():
    s = Sphere(x=0, y=0, radius=1)
    inv = ~s
    assert not bool(inv.lies_inside(math.vec(x=0., y=0.)))
    assert bool(inv.lies_inside(math.vec(x=2., y=0.)))
    assert abs(float(inv.approximate_signed_distance(math.vec(x=0., y=0.))) - 1.0) < 1e-5


def test_uniform_grid():
    g = UniformGrid(spatial(x=4, y=2), Box(x=8, y=4))
    assert np.allclose(np.asarray(g.dx.native()), [2., 2.])
    c = g.center
    assert c.shape.get_size('x') == 4
    assert np.allclose(c.numpy(('x', 'y', 'vector'))[0, 0], [1., 1.])
    assert float(g.volume) == 4.0
    # staggering
    sx = g.stagger('x', True, True)
    assert sx.resolution.get_size('x') == 5
    sxi = g.stagger('x', False, False)
    assert sxi.resolution.get_size('x') == 3
    # voxel lookup
    idx = g.voxel_at(math.vec(x=5., y=1.))
    assert idx.numpy('vector').tolist() == [2, 0]


def test_grid_slicing():
    g = UniformGrid(spatial(x=4, y=4), Box(x=4, y=4))
    s = g[{'x': slice(1, 3)}]
    assert s.resolution.get_size('x') == 2
    assert float(s.bounds.lower.vector['x']) == 1.0


def test_rotation():
    v = math.vec(x=1., y=0.)
    r = rotate_vector(v, np.pi / 2)
    assert np.allclose(r.numpy('vector'), [0., 1.], atol=1e-6)
    r_inv = rotate_vector(r, np.pi / 2, invert=True)
    assert np.allclose(r_inv.numpy('vector'), [1., 0.], atol=1e-6)


def test_cuboid_rotation():
    c = Cuboid(math.vec(x=0., y=0.), half_size=math.vec(x=2., y=0.5), rotation=np.pi / 2)
    assert bool(c.lies_inside(math.vec(x=0., y=1.9)))
    assert not bool(c.lies_inside(math.vec(x=1.9, y=0.)))


def test_geometry_jit():
    s = Sphere(x=1, y=1, radius=2)

    @jax.jit
    def f(geom, pts):
        return geom.approximate_signed_distance(pts)

    d = f(s, math.vec(x=1., y=1.))
    assert abs(float(d) + 2.0) < 1e-6


def test_push():
    b = Box(x=2, y=2)
    pts = math.vec(x=wrap([1., 5.], instance(p=2)), y=wrap([1., 1.], instance(p=2)))
    pushed = (~b).push(pts, shift_amount=0.1)  # push back inside the box
    inside = b.lies_inside(pushed)
    assert bool(math.all(inside))
