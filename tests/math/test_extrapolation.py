import numpy as np

import phiflow_tpu.math as math
from phiflow_tpu.math import wrap, spatial, channel
from phiflow_tpu.math import extrapolation as e


def _t():
    return wrap(np.array([0., 1., 2., 3., 4.], np.float32), spatial('x'))


def test_pad_modes():
    t = _t()
    assert np.allclose(e.ZERO.pad(t, {'x': (2, 1)}).numpy('x'), [0, 0, 0, 1, 2, 3, 4, 0])
    assert np.allclose(e.ONE.pad(t, {'x': (1, 0)}).numpy('x'), [1, 0, 1, 2, 3, 4])
    assert np.allclose(e.PERIODIC.pad(t, {'x': (2, 1)}).numpy('x'), [3, 4, 0, 1, 2, 3, 4, 0])
    assert np.allclose(e.BOUNDARY.pad(t, {'x': (1, 2)}).numpy('x'), [0, 0, 1, 2, 3, 4, 4, 4])
    assert np.allclose(e.SYMMETRIC.pad(t, {'x': (2, 0)}).numpy('x'), [1, 0, 0, 1, 2, 3, 4])
    assert np.allclose(e.REFLECT.pad(t, {'x': (2, 0)}).numpy('x'), [2, 1, 0, 1, 2, 3, 4])
    assert np.allclose(e.ANTISYMMETRIC.pad(t, {'x': (2, 0)}).numpy('x'), [-1, 0, 0, 1, 2, 3, 4])
    assert np.allclose(e.ANTIREFLECT.pad(t, {'x': (2, 0)}).numpy('x'), [-2, -1, 0, 1, 2, 3, 4])


def test_combine_sides():
    t = _t()
    mix = e.combine_sides(x=(e.ZERO, e.BOUNDARY))
    assert np.allclose(mix.pad(t, {'x': (1, 1)}).numpy('x'), [0, 0, 1, 2, 3, 4, 4])
    assert mix.valid_outer_faces('x') == (False, True)


def test_valid_outer_faces():
    assert e.ZERO.valid_outer_faces('x') == (False, False)
    assert e.PERIODIC.valid_outer_faces('x') == (True, False)
    assert e.BOUNDARY.valid_outer_faces('x') == (True, True)


def test_constant_vector_pad():
    t = wrap(np.zeros((3, 2), np.float32), spatial('x'), channel(vector='x,y'))
    const = e.ConstantExtrapolation(math.vec(x=1., y=2.))
    p = const.pad(t, {'x': (1, 0)})
    assert np.allclose(p.numpy(('x', 'vector'))[0], [1., 2.])


def test_arithmetic():
    assert (e.ZERO + e.ONE) == e.ConstantExtrapolation(1.)
    assert (e.PERIODIC - e.PERIODIC) == e.PERIODIC
    assert (e.BOUNDARY * 2) == e.BOUNDARY
    assert -e.ONE == e.ConstantExtrapolation(-1.)


def test_spatial_gradient_map():
    assert e.ZERO.spatial_gradient() == e.ZERO
    assert e.PERIODIC.spatial_gradient() == e.PERIODIC
    assert e.BOUNDARY.spatial_gradient() == e.ZERO
    assert e.remove_constant_offset(e.ConstantExtrapolation(5.)) == e.ZERO


def test_serialization():
    for ext in [e.ZERO, e.PERIODIC, e.BOUNDARY, e.combine_sides(x=(e.ZERO, e.PERIODIC)),
                e.combine_by_direction(e.ZERO, e.BOUNDARY)]:
        d = ext.to_dict()
        assert e.from_dict(d) == ext


def test_normal_tangential():
    nt = e.combine_by_direction(e.ZERO, e.BOUNDARY)
    assert e.get_normal(nt) == e.ZERO
    assert e.get_tangential(nt) == e.BOUNDARY
