import numpy as np
import pytest

import phiflow_tpu.math as math
from phiflow_tpu.math import spatial, channel, batch, extrapolation, wrap
from phiflow_tpu.geom import Box, Sphere
from phiflow_tpu.field import (
    CenteredGrid, StaggeredGrid, Noise, resample, sample, divergence, spatial_gradient,
    laplace, curl, assert_close as field_assert_close,
)


def test_centered_constructors():
    g = CenteredGrid(0., 0., x=8, y=8)
    assert g.shape.spatial.sizes == (8, 8)
    g2 = CenteredGrid(Noise(), extrapolation.PERIODIC, x=16, y=16, bounds=Box(x=2, y=2))
    assert abs(float(math.mean(g2.values))) < 1e-4
    g3 = CenteredGrid(lambda pos: pos.vector['x'], 0., x=4, y=4, bounds=Box(x=4, y=4))
    assert np.allclose(g3.values.numpy(('x', 'y'))[:, 0], [0.5, 1.5, 2.5, 3.5])
    g4 = CenteredGrid(Sphere(x=2, y=2, radius=1), 0., x=4, y=4, bounds=Box(x=4, y=4))
    assert float(math.max(g4.values)) > 0


def test_staggered_sizes():
    for ext, sizes_x in [(extrapolation.ZERO, (7, 8)), (extrapolation.PERIODIC, (8, 8)),
                         (extrapolation.BOUNDARY, (9, 8))]:
        v = StaggeredGrid(0., ext, x=8, y=8)
        assert v.vector['x'].values.shape.sizes == sizes_x, f"{ext}: {v.vector['x'].values.shape}"


def test_staggered_tensor_roundtrip():
    v = StaggeredGrid(Noise(vector='x,y'), extrapolation.ZERO, x=8, y=8)
    uniform = v.staggered_tensor()
    assert uniform.shape.spatial.sizes == (9, 9)
    v2 = StaggeredGrid(uniform, extrapolation.ZERO, x=8, y=8)
    field_assert_close(v.vector['x'], v2.vector['x'], abs_tolerance=1e-6)


def test_grid_sampling_identity():
    g = CenteredGrid(Noise(), extrapolation.PERIODIC, x=16, y=16)
    g2 = resample(g, CenteredGrid(0., extrapolation.PERIODIC, x=16, y=16))
    field_assert_close(g, g2, abs_tolerance=1e-6)


def test_resample_coarser():
    g = CenteredGrid(lambda pos: pos.vector['x'], extrapolation.BOUNDARY, x=16, y=16, bounds=Box(x=4, y=4))
    coarse = resample(g, CenteredGrid(0., extrapolation.BOUNDARY, x=8, y=8, bounds=Box(x=4, y=4)))
    ref = CenteredGrid(lambda pos: pos.vector['x'], extrapolation.BOUNDARY, x=8, y=8, bounds=Box(x=4, y=4))
    field_assert_close(coarse, ref, abs_tolerance=1e-5)


def test_divergence_free_constant():
    v = StaggeredGrid((1., 2.), extrapolation.PERIODIC, x=8, y=8)
    div = divergence(v)
    assert float(math.max(abs(div.values))) < 1e-6


def test_div_grad_equals_laplace_periodic():
    p = CenteredGrid(Noise(), extrapolation.PERIODIC, x=16, y=16)
    gp = spatial_gradient(p, extrapolation.PERIODIC, at='face')
    lap = laplace(p)
    field_assert_close(divergence(gp), lap, abs_tolerance=1e-4)


def test_gradient_linear_exact():
    # gradient of a linear function is constant (away from boundary effects)
    g = CenteredGrid(lambda pos: 3 * pos.vector['x'], extrapolation.BOUNDARY, x=8, y=8, bounds=Box(x=8, y=8))
    grad = spatial_gradient(g, at='center')
    inner = grad.values[{'x': slice(1, -1), 'vector': 'x'}]
    assert np.allclose(inner.numpy(('x', 'y')), 3.0, atol=1e-5)


def test_laplace_quadratic():
    # Δ(x²) = 2
    g = CenteredGrid(lambda pos: pos.vector['x'] ** 2, extrapolation.BOUNDARY, x=16, y=4, bounds=Box(x=16, y=4))
    lap = laplace(g)
    inner = lap.values[{'x': slice(2, -2)}]
    assert np.allclose(inner.numpy(('x', 'y')), 2.0, atol=1e-4)


def test_curl_2d():
    # v = (-y, x) → curl = 2
    v = CenteredGrid(lambda pos: math.stack({'x': -pos.vector['y'], 'y': pos.vector['x']},
                                            channel('vector')), extrapolation.BOUNDARY,
                     x=8, y=8, bounds=Box(x=8, y=8))
    c = curl(v, at='center')
    inner = c.values[{'x': slice(1, -1), 'y': slice(1, -1)}]
    assert np.allclose(inner.numpy(('x', 'y')), 2.0, atol=1e-4)


def test_batch_dims():
    g = CenteredGrid(Noise(batch(b=3)), extrapolation.PERIODIC, x=8, y=8)
    assert g.shape.batch.sizes == (3,)
    lap = laplace(g)
    assert lap.shape.batch.sizes == (3,)


def test_field_arithmetic():
    a = CenteredGrid(1., 0., x=4, y=4)
    b = CenteredGrid(2., 0., x=4, y=4)
    c = a + b * 2
    assert float(c.values.x[0].y[0]) == 5.0
    v = StaggeredGrid(1., extrapolation.ZERO, x=4, y=4) * 3
    assert float(v.vector['x'].values.x[0].y[0]) == 3.0


def test_vector_slicing_staggered():
    v = StaggeredGrid((1., 2.), extrapolation.PERIODIC, x=8, y=8)
    vx = v.vector['x']
    assert vx.is_centered  # single component is a centered field on the face grid
    assert float(vx.values.x[0].y[0]) == 1.0
    assert vx.geometry.resolution.get_size('x') == 8


def test_scene_batch_create_write_read():
    """Batch dims → one directory per index (reference: phi/field/_scene.py:111-152)."""
    import tempfile
    import numpy as np
    from phiflow_tpu.field import Scene, CenteredGrid, Noise
    from phiflow_tpu.math import batch as batch_dim, extrapolation
    with tempfile.TemporaryDirectory() as d:
        sb = Scene.create(d, batch_dim(b=3), copy_calling_script=False)
        assert len(sb.paths) == 3
        g = CenteredGrid(Noise(batch_dim(b=3)), extrapolation.PERIODIC, x=8, y=8)
        sb.write(smoke=g)
        back = sb.read_field('smoke')
        a = np.asarray(back.values.native(('b', 'x', 'y')))
        b = np.asarray(g.values.native(('b', 'x', 'y')))
        np.testing.assert_allclose(a, b)
