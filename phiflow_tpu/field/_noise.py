"""Spectral noise initializer (reference: /root/reference/phi/field/_noise.py:9-61)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..math import Shape, Tensor, EMPTY_SHAPE, wrap, spatial, channel, batch
from ..math._tensor import Tensor
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
        """Spectral synthesis on the HOST (numpy FFT): this is setup code, and
        host arrays embed into jit traces as literals. (Some TPU runtimes, e.g.
        the axon tunnel, do not implement device FFT at all.)"""
        shape = self._shape & resolution
        rnd = np.asarray(ops.random_normal(shape).native()) + 1j * np.asarray(ops.random_normal(shape).native())
        spatial_axes = [shape.index(n) for n in resolution.names]
        k_grids = np.meshgrid(*[np.fft.fftfreq(d.size) * d.size for d in resolution.dims], indexing='ij')
        k2 = np.zeros_like(k_grids[0])
        for kg in k_grids:
            k2 = k2 + kg ** 2
        lowest_frequency = 0.1
        weight_mask = (k2 > lowest_frequency ** 2).astype(np.float32)
        with np.errstate(divide='ignore'):
            inv_k2 = np.where(k2 > 0, 1.0 / np.where(k2 > 0, k2, 1.0), 0.0)
        amplitude = (inv_k2 ** self.smoothness) * weight_mask
        # broadcast the spectral filter over leading non-spatial dims
        full = np.ones([d.size if i in spatial_axes else 1 for i, d in enumerate(shape.dims)], np.float32)
        amp_full = full * amplitude.reshape([shape.dims[i].size if i in spatial_axes else 1
                                             for i in range(len(shape.dims))])
        filtered = rnd * amp_full
        from ..math._tensor import default_float
        result = np.real(np.fft.ifftn(filtered, axes=spatial_axes)).astype(np.dtype(default_float()))
        std = result.std(axis=tuple(spatial_axes), keepdims=True)
        std[std == 0] = 1
        result = result / std * self.scale
        result = result - result.mean(axis=tuple(spatial_axes), keepdims=True)
        return Tensor(result, shape)

    def __repr__(self):
        return f"Noise(scale={self.scale}, smoothness={self.smoothness})"
