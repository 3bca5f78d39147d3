"""Spectral noise initializer (reference: /root/reference/phi/field/_noise.py:9-61)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..math import Shape, Tensor, EMPTY_SHAPE, wrap, spatial, channel, batch
from ..math import _ops as ops
from ..geom import Geometry, UniformGrid
from ._field import FieldInitializer

__all__ = ['Noise']


class Noise(FieldInitializer):
    """Random smooth noise: spectrum filtered by 1/k^(2·smoothness)
    (reference: phi/field/_noise.py:38-57). Sampled via inverse FFT on the grid."""

    def __init__(self, *shape: Shape, scale=10., smoothness=1.0, **channel_dims):
        self.scale = scale
        self.smoothness = smoothness
        self._shape = shape[0] if shape else EMPTY_SHAPE
        for s in shape[1:]:
            self._shape = self._shape & s
        if channel_dims:
            self._shape = self._shape & channel(**channel_dims)

    @property
    def shape(self):
        return self._shape

    def _sample(self, geometry: Geometry, at: str, boundaries, **kwargs) -> Tensor:
        if isinstance(geometry, UniformGrid):
            return self._sample_grid(geometry.resolution, geometry.bounds.size)
        # sample white noise at geometry centers
        pts_shape = geometry.shape.non_channel
        return ops.random_normal(pts_shape & self._shape)

    def _sample_grid(self, resolution: Shape, physical_size) -> Tensor:
        shape = self._shape & resolution
        rndj = (ops.random_normal(shape) + 1j * ops.random_normal(shape))._op1(lambda n: n)
        k_parts = {}
        for d in resolution.dims:
            k_parts[d.name] = wrap(np.fft.fftfreq(d.size).astype(np.float32) * d.size, Shape((d,)))
        k = ops.stack(k_parts, channel('vector'), expand_values=True)
        # normalize frequencies by physical size ratio
        k2 = ops.vec_squared(k)
        lowest_frequency = 0.1
        weight_mask = ops.to_float(k2 > lowest_frequency ** 2)
        # 1/k^(2 smoothness) spectrum filter
        inv_k2 = ops.safe_div(ops.ones_like(k2), k2)
        amplitude = inv_k2 ** self.smoothness
        fft = rndj._op2(amplitude * weight_mask, lambda a, b: a * b.astype(a.dtype))
        result = ops.real(ops.ifft(fft, resolution))
        std = ops.std(result, resolution)
        result = ops.safe_div(result, std) * self.scale
        result = result - ops.mean(result, resolution)
        return ops.to_float(result)

    def __repr__(self):
        return f"Noise(scale={self.scale}, smoothness={self.smoothness})"
