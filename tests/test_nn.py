"""NN API tests (reference usage: examples/optim/Learn_Throw.ipynb — train a net
with physics inside the loss)."""
import numpy as np
import pytest

import phiflow_tpu.math as math
from phiflow_tpu.math import batch, channel, spatial, instance, wrap, extrapolation
from phiflow_tpu import nn
from phiflow_tpu.field import CenteredGrid, Noise, native_call


def test_dense_net_train():
    net = nn.dense_net(1, 1, [16, 16])
    opt = nn.adam(net, 1e-2)
    x = np.linspace(-1, 1, 64, dtype=np.float32)[:, None]
    y = x ** 2

    def loss():
        pred = net(x)
        return wrap(float(np.sum((np.asarray(pred) - y) ** 2)))

    # numpy-free differentiable loss
    import jax.numpy as jnp

    def loss2():
        pred = net(x)
        return jnp.sum((pred - y) ** 2)

    l0 = float(loss2())
    for _ in range(50):
        nn.update_weights(net, opt, loss2)
    l1 = float(loss2())
    assert l1 < 0.5 * l0


def test_parameter_count_and_state_io(tmp_path):
    net = nn.dense_net(2, 3, [8])
    n = nn.parameter_count(net)
    assert n == 2 * 8 + 8 + 8 * 3 + 3
    path = nn.save_state(net, str(tmp_path / 'weights'))
    import jax
    before = jax.tree_util.tree_leaves(net.params)
    net.params = jax.tree_util.tree_map(lambda p: p * 0, net.params)
    nn.load_state(net, path)
    after = jax.tree_util.tree_leaves(net.params)
    assert all(np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after))


def test_u_net_shapes():
    net = nn.u_net(2, 3, levels=3, filters=4, in_spatial=2)
    x = np.zeros((2, 32, 32, 2), np.float32)
    y = net(x)
    assert y.shape == (2, 32, 32, 3)


def test_conv_and_res_net():
    x = np.zeros((1, 16, 16, 1), np.float32)
    assert nn.conv_net(1, 2, [8, 8])(x).shape == (1, 16, 16, 2)
    assert nn.res_net(1, 2, [8, 8])(x).shape == (1, 16, 16, 2)


def test_conv_classifier():
    net = nn.conv_classifier(1, (16, 16), num_classes=4, blocks=(8, 16))
    x = np.zeros((3, 16, 16, 1), np.float32)
    y = net(x)
    assert y.shape == (3, 4)
    assert np.allclose(np.asarray(y).sum(-1), 1.0, atol=1e-5)


def test_invertible_net():
    net = nn.invertible_net(num_blocks=2, in_channels=4)
    x = np.random.randn(5, 4).astype(np.float32)
    y = net(x)
    x2 = net.inverse(y)
    assert np.allclose(np.asarray(x2), x, atol=1e-4)


def test_native_call_with_field():
    net = nn.conv_net(1, 1, [4], in_spatial=2)
    grid = CenteredGrid(Noise(), extrapolation.PERIODIC, x=16, y=16)
    out = native_call(net, grid)
    assert out.shape.spatial.sizes == (16, 16)
    assert 'vector' in out.shape


def test_learning_rate():
    net = nn.dense_net(1, 1, [4])
    opt = nn.adam(net, 1e-3)
    assert nn.get_learning_rate(opt) == 1e-3
    nn.set_learning_rate(opt, 1e-4)
    assert nn.get_learning_rate(opt) == 1e-4
