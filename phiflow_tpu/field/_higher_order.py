"""Higher-order (4th/6th) finite-difference schemes.

Reference counterpart: the compact-FD engine in
/root/reference/phi/field/_field_math.py:259-470 (get_stencils /
perform_finite_difference_operation / Taylor-table get_coefficients:1191).

TPU-native design (see `_stencil1d`): each 1-D derivative along an axis —
including BC-aware one-sided boundary rows and the compact (implicit) LHS —
is precomputed at trace time as a dense operator matrix and applied as a
single MXU `tensordot`. This covers periodic (circulant), Dirichlet, and
zero-gradient boundaries uniformly, replaces the reference's per-application
tridiagonal solves, and uses no device FFT (broken on this TPU runtime).
"""
from __future__ import annotations

import numpy as np

from ..math import Tensor, Shape, wrap, channel, dual, spatial
from ..math import _ops as ops
from ..math import extrapolation as extrapolation_mod
from ._field import Field
from ._stencil1d import derivative_matrix, apply_axis_matrix, classify_side

__all__ = ['higher_order_laplace', 'higher_order_gradient']


def _axis_bc(field: Field, dim: str):
    """(bc_lo, bc_hi) specs for `derivative_matrix`, or None if the boundary
    cannot be classified (caller falls back / raises)."""
    lo = classify_side(field.boundary, dim, False)
    hi = classify_side(field.boundary, dim, True)
    if lo is None or hi is None:
        return None
    if ('periodic' in (lo, hi)) and lo != hi:
        return None
    return lo, hi


def _apply_derivative(values: Tensor, field: Field, dim: str, deriv: int, order: int,
                      implicit_order: int, staggered_out=False,
                      out_lo_valid=True, out_hi_valid=True) -> Tensor:
    bc = _axis_bc(field, dim)
    assert bc is not None, \
        f"order-{order} derivatives require periodic / constant / zero-gradient " \
        f"boundaries along {dim}, got {field.boundary}"
    n = field.resolution.get_size(dim)
    h = float(field.dx.vector[dim])
    M, affine = derivative_matrix(n, deriv, order, h, bc[0], bc[1],
                                  staggered_out=staggered_out,
                                  out_lo_valid=out_lo_valid, out_hi_valid=out_hi_valid,
                                  implicit_order=implicit_order)
    axis = values.shape.names.index(dim)
    native = apply_axis_matrix(values.native(), axis, M, affine)
    out_shape = values.shape.with_dim_size(dim, native.shape[axis])
    return Tensor(native, out_shape)


def _implicitness(order: int, implicit) -> int:
    """Scheme selection: order 6 uses the compact (tridiagonal) scheme as in the
    reference; its LHS is folded into the operator matrix at trace time, so the
    `implicit` Solve argument is accepted for API parity but not needed."""
    return 2 if (order >= 6 or implicit is not None) else 0


def higher_order_gradient(field: Field, grad_ext, at: str, dims, stack_dim, order: int, implicit) -> Field:
    """Order-4/6 (compact) gradient with BC-aware one-sided boundary stencils.
    Reference: spatial_gradient order-6 path, phi/field/_field_math.py:148-257."""
    dims = dims or field.resolution.names
    impl = _implicitness(order, implicit)
    if at == 'face':
        comps = []
        for dim in dims:
            lo_v, up_v = grad_ext.valid_outer_faces(dim)
            comps.append(_apply_derivative(field.values, field, dim, 1, order, impl,
                                           staggered_out=True, out_lo_valid=lo_v, out_hi_valid=up_v))
        values = ops.stack(comps, dual(vector=list(dims)))
        return Field(field.geometry, values, grad_ext)
    comps = {}
    for dim in dims:
        comps[dim] = _apply_derivative(field.values, field, dim, 1, order, impl)
    values = ops.stack(comps, stack_dim)
    return Field(field.geometry, values, grad_ext)


def higher_order_laplace(field: Field, order: int = 6, implicit=None) -> Field:
    """Order-4/6 (compact) Laplacian with BC-aware one-sided boundary stencils.
    Reference: laplace higher-order path, phi/field/_field_math.py:46-117."""
    impl = _implicitness(order, implicit)
    result = None
    for dim in field.resolution.names:
        term = _apply_derivative(field.values, field, dim, 2, order, impl)
        result = term if result is None else result + term
    return Field(field.geometry, result, field.boundary.spatial_gradient())
