import numpy as np
import jax
import pytest

import phiflow_tpu.math as math
from phiflow_tpu.math import (
    Tensor, TensorStack, wrap, spatial, channel, batch, instance, dual, stack, unstack,
)


def test_wrap_and_native():
    t = wrap(np.arange(12, dtype=np.float32).reshape(3, 4), spatial('y,x'))
    assert t.shape.names == ('y', 'x')
    assert t.native(('x', 'y')).shape == (4, 3)
    assert np.allclose(t.numpy(('y', 'x')), np.arange(12).reshape(3, 4))


def test_broadcast_by_name():
    a = math.ones(spatial(x=4))
    b = math.ones(spatial(y=3)) * 2
    c = a + b
    assert set(c.shape.names) == {'x', 'y'}
    assert float(c.x[0].y[0]) == 3.0


def test_labels_getitem():
    v = math.vec(x=1.0, y=2.0)
    assert float(v.vector['y']) == 2.0
    assert float(v[{'vector': 'x'}]) == 1.0


def test_slicing():
    t = wrap(np.arange(12, dtype=np.float32).reshape(3, 4), spatial('y,x'))
    assert t.y[0].shape.names == ('x',)
    assert t[{'y': slice(1, 3)}].shape.get_size('y') == 2
    assert float(t[{'y': 1, 'x': 2}]) == 6.0


def test_non_uniform_stack():
    a = math.ones(spatial(x=3, y=4))
    b = math.ones(spatial(x=4, y=3))
    st = stack([a, b], dual(vector='x,y'))
    assert isinstance(st, TensorStack)
    assert st[{'~vector': 'x'}].shape.sizes == (3, 4)
    doubled = st * 2
    assert float(doubled[{'~vector': 'y'}].x[0].y[0]) == 2.0


def test_jit_pytree():
    t = wrap(np.ones(4, np.float32), spatial('x'))

    @jax.jit
    def f(x):
        return x * 2 + 1

    r = f(t)
    assert isinstance(r, Tensor)
    assert np.allclose(r.numpy('x'), 3.0)


def test_reductions():
    t = wrap(np.arange(6, dtype=np.float32).reshape(2, 3), spatial('y,x'))
    assert float(math.sum(t)) == 15
    assert float(math.max(t)) == 5
    assert math.sum(t, 'x').shape.names == ('y',)
    assert float(math.mean(t)) == 2.5


def test_pack_unpack():
    t = math.ones(spatial(x=4, y=3))
    p = math.pack_dims(t, 'x,y', instance('points'))
    assert p.shape.get_size('points') == 12
    u = math.unpack_dim(p, 'points', spatial(x=4, y=3))
    assert u.shape.spatial.sizes == (4, 3)


def test_gather_scatter():
    base = math.zeros(spatial(x=5))
    idx = wrap(np.array([[1], [3]], np.int32), instance(points=2), channel(vector='x'))
    vals = wrap(np.array([10., 20.], np.float32), instance(points=2))
    r = math.scatter(base, idx, vals, mode='add')
    assert np.allclose(r.numpy('x'), [0, 10, 0, 20, 0])
    g = math.gather(r, idx)
    assert np.allclose(g.numpy('points'), [10, 20])


def test_fft_roundtrip():
    t = math.random_normal(spatial(x=16, y=8))
    rt = math.real(math.ifft(math.fft(t)))
    math.assert_close(t, rt, abs_tolerance=1e-5)


def test_grid_sample_linear():
    g = wrap(np.array([0., 1., 2., 3.], np.float32), spatial('x'))
    coords = wrap(np.array([[0.5], [1.25]], np.float32), instance(p=2), channel(vector='x'))
    v = math.grid_sample(g, coords, math.extrapolation.ZERO)
    assert np.allclose(v.numpy('p'), [0.5, 1.25])


def test_neighbor_mean():
    import numpy as np
    from phiflow_tpu.math import neighbor_mean, wrap, spatial
    g = wrap(np.arange(6, dtype=np.float32), spatial('x'))
    out = neighbor_mean(g, 'x')
    np.testing.assert_allclose(np.asarray(out.native()), np.arange(5) + 0.5)


def test_sample_subgrid():
    import numpy as np
    from phiflow_tpu.math import sample_subgrid, wrap, spatial, channel
    g = wrap(np.arange(20, dtype=np.float32).reshape(4, 5), spatial(x=4, y=5))
    sub = sample_subgrid(g, wrap([0.5, 1.0], channel(vector=['x', 'y'])), spatial(x=3, y=3))
    expected = (np.arange(20).reshape(4, 5)[:3, 1:4] + np.arange(20).reshape(4, 5)[1:4, 1:4]) / 2
    np.testing.assert_allclose(np.asarray(sub.native(('x', 'y'))), expected)


def test_quantile_median():
    import numpy as np
    from phiflow_tpu.math import wrap, spatial, batch
    import phiflow_tpu.math as math
    from phiflow_tpu.math._ops import quantile, median
    data = np.arange(101, dtype=np.float32)
    t = wrap(data, spatial('x'))
    assert abs(float(median(t).native()) - 50.0) < 1e-5
    q = quantile(t, [0.25, 0.75])
    np.testing.assert_allclose(np.asarray(q.native()), [25., 75.], atol=1e-4)


def test_histogram():
    import numpy as np
    from phiflow_tpu.math import wrap, instance
    from phiflow_tpu.math._ops import histogram
    rng = np.random.default_rng(0)
    t = wrap(rng.uniform(0, 1, 1000).astype(np.float32), instance('samples'))
    counts, edges = histogram(t, bins=10)
    assert counts.shape.get_size('bins') == 10
    assert int(np.asarray(counts.native()).sum()) == 1000


def test_grid_sample_slab_path_matches_generic_and_nan_safe():
    """The slab-gather fast path (one wide-row take per (x,y) corner pair,
    engaged at >=2048 query points) must match the per-corner generic path,
    and a NaN ghost ANYWHERE in a z-row must not poison queries whose weights
    never touch it (FLIP's ConstantExtrapolation(NaN) convention)."""
    import numpy as np
    import jax.numpy as jnp
    from phiflow_tpu.math import _nd, extrapolation
    from phiflow_tpu.math import Tensor as T
    from phiflow_tpu.math import spatial, channel

    rng = np.random.default_rng(3)
    vals = rng.standard_normal((12, 10, 140)).astype(np.float32)
    grid = T(jnp.asarray(vals), spatial(x=12, y=10, z=140))
    N = 4096
    coords = rng.uniform(-1.0, 14.0, (N, 3)).astype(np.float32)
    ct_big = T(jnp.asarray(coords), spatial(points=N) & channel(vector='x,y,z'))
    ct_small = T(jnp.asarray(coords[:64]), spatial(points=64) & channel(vector='x,y,z'))
    fast = _nd._grid_sample_xla(grid, ct_big, extrapolation.BOUNDARY).native(('points',))
    slow = _nd._grid_sample_xla(grid, ct_small, extrapolation.BOUNDARY).native(('points',))
    assert float(jnp.max(jnp.abs(fast[:64] - slow))) < 1e-5
    # NaN ghosts: pad with NaN, query strictly interior points
    nan_ext = extrapolation.ConstantExtrapolation(float('nan'))
    inner = rng.uniform(2.0, 7.0, (N, 3)).astype(np.float32)
    ct_in = T(jnp.asarray(inner), spatial(points=N) & channel(vector='x,y,z'))
    out = _nd._grid_sample_xla(grid, ct_in, nan_ext).native(('points',))
    assert bool(jnp.all(jnp.isfinite(out))), "interior queries must not see NaN ghosts"
