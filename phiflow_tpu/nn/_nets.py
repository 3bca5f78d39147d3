"""Network architectures (reference: phiml.backend.<fw>.nets re-exported at
/root/reference/phi/torch/nets.py:7-9; architectures: dense_net, u_net,
conv_net, res_net, conv_classifier, invertible_net)."""
from __future__ import annotations

import pickle
from typing import Callable, List, Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as linen

__all__ = ['Network', 'dense_net', 'mlp', 'u_net', 'conv_net', 'res_net', 'conv_classifier',
           'invertible_net', 'parameter_count', 'get_parameters', 'save_state', 'load_state']

_ACTIVATIONS = {
    'relu': linen.relu, 'silu': linen.silu, 'gelu': linen.gelu, 'tanh': jnp.tanh,
    'sigmoid': linen.sigmoid, 'softplus': linen.softplus, 'leakyrelu': lambda x: linen.leaky_relu(x),
}


def _act(name) -> Callable:
    if callable(name):
        return name
    return _ACTIVATIONS[name.lower().replace('_', '')]


class Network:
    """Stateful handle pairing a flax module with its parameters.

    Calling it applies the module: ``net(x)`` with x channels-last
    (batch, spatial..., channels) — the layout `math.native_call` produces.
    """

    def __init__(self, module: linen.Module, params, input_shape):
        self.module = module
        self.params = params
        self.input_shape = input_shape

    def __call__(self, *args):
        x = args[0] if len(args) == 1 else jnp.concatenate([jnp.asarray(a) for a in args], axis=-1)
        return self.module.apply({'params': self.params}, jnp.asarray(x))

    @property
    def parameters(self):
        return self.params

    def __repr__(self):
        return f"Network[{type(self.module).__name__}, {parameter_count(self)} parameters]"


def _init(module: linen.Module, input_shape, seed=0) -> Network:
    rng = jax.random.PRNGKey(seed)
    x = jnp.zeros((1,) + tuple(input_shape), jnp.float32)
    variables = module.init(rng, x)
    return Network(module, variables['params'], input_shape)


# --- architectures ---

class _DenseNet(linen.Module):
    layers: Sequence[int]
    out_channels: int
    activation: str = 'relu'
    batch_norm: bool = False
    softmax: bool = False

    @linen.compact
    def __call__(self, x):
        act = _act(self.activation)
        for width in self.layers:
            x = linen.Dense(width)(x)
            x = act(x)
        x = linen.Dense(self.out_channels)(x)
        if self.softmax:
            x = linen.softmax(x)
        return x


def dense_net(in_channels: int, out_channels: int, layers: Sequence[int],
              batch_norm=False, activation='ReLU', softmax=False) -> Network:
    """Fully-connected network (reference API: phiml.nn.dense_net)."""
    module = _DenseNet(tuple(layers), out_channels, activation, batch_norm, softmax)
    return _init(module, (in_channels,))


mlp = dense_net


class _ConvBlock(linen.Module):
    filters: int
    activation: str
    batch_norm: bool
    periodic: bool
    d: int

    @linen.compact
    def __call__(self, x):
        act = _act(self.activation)
        padding = 'CIRCULAR' if self.periodic else 'SAME'
        x = linen.Conv(self.filters, (3,) * self.d, padding=padding)(x)
        if self.batch_norm:
            x = linen.GroupNorm(num_groups=min(8, self.filters))(x)
        return act(x)


class _UNet(linen.Module):
    """U-Net over d spatial dims with skip connections (reference: phiml u_net)."""
    out_channels: int
    levels: int
    filters: Union[int, Sequence[int]]
    activation: str
    batch_norm: bool
    d: int
    periodic: bool

    @linen.compact
    def __call__(self, x):
        filters = [self.filters * 2 ** i if isinstance(self.filters, int) else self.filters[i]
                   for i in range(self.levels)]
        skips = []
        for level in range(self.levels - 1):
            x = _ConvBlock(filters[level], self.activation, self.batch_norm, self.periodic, self.d)(x)
            x = _ConvBlock(filters[level], self.activation, self.batch_norm, self.periodic, self.d)(x)
            skips.append(x)
            x = linen.max_pool(x, (2,) * self.d, strides=(2,) * self.d)
        x = _ConvBlock(filters[-1], self.activation, self.batch_norm, self.periodic, self.d)(x)
        x = _ConvBlock(filters[-1], self.activation, self.batch_norm, self.periodic, self.d)(x)
        for level in reversed(range(self.levels - 1)):
            target = skips[level]
            # nearest-neighbor upsample
            for axis in range(1, self.d + 1):
                x = jnp.repeat(x, 2, axis=axis)
            x = x[tuple(slice(0, s) for s in target.shape[:-1])]
            x = jnp.concatenate([x, target], axis=-1)
            x = _ConvBlock(filters[level], self.activation, self.batch_norm, self.periodic, self.d)(x)
            x = _ConvBlock(filters[level], self.activation, self.batch_norm, self.periodic, self.d)(x)
        return linen.Conv(self.out_channels, (1,) * self.d)(x)


def u_net(in_channels: int, out_channels: int, levels: int = 4, filters: Union[int, Sequence[int]] = 16,
          batch_norm: bool = True, activation='ReLU', in_spatial: Union[int, tuple] = 2,
          periodic=False, use_res_blocks=False, **kwargs) -> Network:
    """U-Net (reference API: phiml.nn.u_net)."""
    d = in_spatial if isinstance(in_spatial, int) else len(in_spatial)
    module = _UNet(out_channels, levels, filters, activation, batch_norm, d, periodic)
    spatial_size = 2 ** levels * 2
    return _init(module, (spatial_size,) * d + (in_channels,))


class _ConvNet(linen.Module):
    out_channels: int
    layers: Sequence[int]
    activation: str
    batch_norm: bool
    d: int
    periodic: bool

    @linen.compact
    def __call__(self, x):
        for width in self.layers:
            x = _ConvBlock(width, self.activation, self.batch_norm, self.periodic, self.d)(x)
        return linen.Conv(self.out_channels, (1,) * self.d)(x)


def conv_net(in_channels: int, out_channels: int, layers: Sequence[int], batch_norm=False,
             activation='ReLU', in_spatial: Union[int, tuple] = 2, periodic=False) -> Network:
    """Plain convolutional network (reference API: phiml.nn.conv_net)."""
    d = in_spatial if isinstance(in_spatial, int) else len(in_spatial)
    module = _ConvNet(out_channels, tuple(layers), activation, batch_norm, d, periodic)
    return _init(module, (16,) * d + (in_channels,))


class _ResNet(linen.Module):
    out_channels: int
    layers: Sequence[int]
    activation: str
    batch_norm: bool
    d: int
    periodic: bool

    @linen.compact
    def __call__(self, x):
        act = _act(self.activation)
        padding = 'CIRCULAR' if self.periodic else 'SAME'
        for width in self.layers:
            inp = x
            y = linen.Conv(width, (3,) * self.d, padding=padding)(x)
            y = act(y)
            y = linen.Conv(width, (3,) * self.d, padding=padding)(y)
            if inp.shape[-1] != width:
                inp = linen.Conv(width, (1,) * self.d)(inp)
            x = act(inp + y)
        return linen.Conv(self.out_channels, (1,) * self.d)(x)


def res_net(in_channels: int, out_channels: int, layers: Sequence[int], batch_norm=False,
            activation='ReLU', in_spatial: Union[int, tuple] = 2, periodic=False) -> Network:
    """Residual network (reference API: phiml.nn.res_net)."""
    d = in_spatial if isinstance(in_spatial, int) else len(in_spatial)
    module = _ResNet(out_channels, tuple(layers), activation, batch_norm, d, periodic)
    return _init(module, (16,) * d + (in_channels,))


class _ConvClassifier(linen.Module):
    num_classes: int
    blocks: Sequence[int]
    dense_layers: Sequence[int]
    activation: str
    batch_norm: bool
    d: int
    periodic: bool
    softmax: bool

    @linen.compact
    def __call__(self, x):
        act = _act(self.activation)
        for width in self.blocks:
            x = _ConvBlock(width, self.activation, self.batch_norm, self.periodic, self.d)(x)
            x = linen.max_pool(x, (2,) * self.d, strides=(2,) * self.d)
        x = x.reshape((x.shape[0], -1))
        for width in self.dense_layers:
            x = act(linen.Dense(width)(x))
        x = linen.Dense(self.num_classes)(x)
        return linen.softmax(x) if self.softmax else x


def conv_classifier(in_features: int, in_spatial: Union[tuple, list], num_classes: int,
                    blocks=(64, 128, 256), block_sizes=None, dense_layers=(256,),
                    batch_norm=True, activation='ReLU', softmax=True, periodic=False) -> Network:
    """Convolutional classifier (reference API: phiml.nn.conv_classifier)."""
    spatial_shape = tuple(in_spatial)
    d = len(spatial_shape)
    module = _ConvClassifier(num_classes, tuple(blocks), tuple(dense_layers),
                             activation, batch_norm, d, periodic, softmax)
    return _init(module, spatial_shape + (in_features,))


class _CouplingLayer(linen.Module):
    """Additive/affine coupling (RealNVP-style) for invertible nets."""
    channels: int
    hidden: int
    activation: str
    swap: bool

    @linen.compact
    def __call__(self, x, invert=False):
        act = _act(self.activation)
        c = self.channels
        h = c // 2
        a, b = (x[..., :h], x[..., h:]) if not self.swap else (x[..., h:], x[..., :h])
        net = linen.Sequential([linen.Dense(self.hidden), act, linen.Dense(self.hidden), act,
                                linen.Dense(2 * (c - h))])
        params = net(a)
        scale, shift = params[..., :c - h], params[..., c - h:]
        scale = jnp.tanh(scale)
        if invert:
            b = (b - shift) * jnp.exp(-scale)
        else:
            b = b * jnp.exp(scale) + shift
        return jnp.concatenate([a, b] if not self.swap else [b, a], axis=-1)


class _InvertibleNet(linen.Module):
    channels: int
    num_blocks: int
    hidden: int
    activation: str

    @linen.compact
    def __call__(self, x, invert=False):
        layers = [_CouplingLayer(self.channels, self.hidden, self.activation, swap=bool(i % 2))
                  for i in range(self.num_blocks)]
        if invert:
            for layer in reversed(layers):
                x = layer(x, invert=True)
        else:
            for layer in layers:
                x = layer(x)
        return x


class InvertibleNetwork(Network):

    def inverse(self, y):
        return self.module.apply({'params': self.params}, jnp.asarray(y), invert=True)


def invertible_net(num_blocks: int = 3, construct_net='dense', in_channels: int = 2,
                   hidden: int = 64, activation='ReLU', **kwargs) -> InvertibleNetwork:
    """Invertible coupling network (reference API: phiml.nn.invertible_net)."""
    module = _InvertibleNet(in_channels, num_blocks, hidden, activation)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, in_channels), jnp.float32)
    variables = module.init(rng, x)
    return InvertibleNetwork(module, variables['params'], (in_channels,))


# --- parameter utilities (reference: phiml.nn.parameter_count etc.) ---

def parameter_count(net: Network) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(net.params))


def get_parameters(net: Network) -> dict:
    flat = jax.tree_util.tree_leaves_with_path(net.params)
    return {jax.tree_util.keystr(path): leaf for path, leaf in flat}


def save_state(obj, path: str):
    """Save network or optimizer state (reference: phiml.nn.save_state)."""
    from ._optim import Optimizer
    if isinstance(obj, Network):
        data = jax.tree_util.tree_map(lambda x: np.asarray(x), obj.params)
    elif isinstance(obj, Optimizer):
        data = jax.tree_util.tree_map(lambda x: np.asarray(x), obj.state)
    else:
        data = jax.tree_util.tree_map(lambda x: np.asarray(x), obj)
    if not path.endswith('.pkl') and not path.endswith('.npz'):
        path += '.pkl'
    with open(path, 'wb') as f:
        pickle.dump(data, f)
    return path


def load_state(obj, path: str):
    """Load network or optimizer state in place (reference: phiml.nn.load_state)."""
    from ._optim import Optimizer
    if not path.endswith('.pkl') and not path.endswith('.npz'):
        path += '.pkl'
    with open(path, 'rb') as f:
        data = pickle.load(f)
    data = jax.tree_util.tree_map(jnp.asarray, data)
    if isinstance(obj, Network):
        obj.params = data
    elif isinstance(obj, Optimizer):
        obj.state = data
    return obj
