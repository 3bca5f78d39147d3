"""phiflow_tpu.math — JAX-only named-dim tensor core (replaces phi.math / phiml.math).

Public API mirrors the surface PhiFlow consumes from phiml.math (SURVEY.md §2.1),
compiled straight to XLA with no backend abstraction.
"""
import numpy as _np

from ._shape import (
    Shape, Dim, EMPTY_SHAPE, batch, spatial, channel, instance, dual,
    shape_of as shape, merge_shapes, concat_shapes, parse_dim_order,
    non_batch, non_spatial, non_channel, non_instance, non_dual, primal,
    BATCH, SPATIAL, CHANNEL, INSTANCE, DUAL, DimFilter,
)
from ._magic import (
    IncompatibleShapes, ConvergenceException, Diverged, NotConverged, BoundDim, slicing_dict,
)
from ._tensor import (
    Tensor, TensorStack, wrap, tensor, NUMPY, precision, set_global_precision, get_precision,
    backend_dtype, default_float,
)
from ._ops import (
    zeros, ones, zeros_like, ones_like, random_uniform, random_normal, linspace, arange,
    range_tensor, meshgrid, seed,
    stack, unstack, concat, expand, rename_dims, pack_dims, unpack_dim, transpose, squeeze, flatten,
    abs_ as abs, sign, sqrt, exp, log, log2, log10, sin, cos, tan, arcsin, arccos, arctan, arctan2,
    sinh, cosh, tanh, round_ as round, floor, ceil, is_finite, is_nan, is_inf, real, imag, conjugate,
    sigmoid, erf, factorial, degrees_to_radians, radians_to_degrees,
    to_float, to_int32, to_int64, to_bool, cast,
    maximum, minimum, clip, where, safe_div, nan_to_0,
    sum_ as sum, mean, prod, max_ as max, min_ as min, std, any_ as any, all_ as all,
    finite_mean, finite_sum, finite_max, finite_min, at_max, argmax, argmin, cumulative_sum, dot,
    close, always_close, assert_close, equal,
    gather, scatter, boolean_mask, nonzero,
    pad, shift, grid_sample, closest_grid_values, neighbor_mean, sample_subgrid,
    quantile, median, histogram,
    fft, ifft, fftfreq,
    vec, vec_length, vec_squared, vec_normalize, norm, length, squared_norm, normalize,
    cross, cross_product, dim_mask,
    convolve, native_call, reshaped_native, reshaped_tensor,
    pairwise_differences, find_closest, assert_finite, stop_gradient, print_ as print, map_ as map,
)
from ._nd import (
    spatial_gradient_t as spatial_gradient, laplace_t as laplace,
    fourier_laplace, fourier_poisson, downsample2x, upsample2x, masked_fill,
)
from . import _extrapolation as extrapolation
from ._extrapolation import Extrapolation, as_extrapolation
from ._functional import (
    jit_compile, jit_compile_linear, LinearFunction, gradient, functional_gradient, jacobian,
    custom_gradient, iterate, map_s2b, map_d2c, map_c2d, broadcast, get_function_parameters,
    trace_check, when_available, perf_counter,
)
from ._solve import (
    Solve, SolveInfo, SolveTape, solve_linear, solve_nonlinear, minimize, copy_solve,
)
from ._layout import Layout, layout
from ._sparse import (
    SparseCooTensor, sparse_tensor, is_sparse, dense, to_format, stored_indices, stored_values,
    matrix_from_function,
)

PI = _np.pi
INF = _np.inf
NAN = _np.nan


def copy_with(obj, **updates):
    """Replace attributes of a value object (phiml `copy_with` / `math.copy_with`)."""
    if isinstance(obj, Solve):
        return copy_solve(obj, **updates)
    if hasattr(obj, '__with_attrs__'):
        return obj.__with_attrs__(**updates)
    import dataclasses
    if dataclasses.is_dataclass(obj):
        return dataclasses.replace(obj, **updates)
    import copy as _copy
    new = _copy.copy(obj)
    for k, v in updates.items():
        setattr(new, k, v)
    return new


def const_vec(value, dims) -> Tensor:
    """Vector with equal components for each dim in `dims` (phiml const_vec)."""
    from ._shape import parse_dim_order as _p
    if isinstance(dims, Shape):
        names = dims.spatial.names if dims.spatial else dims.names
    else:
        names = _p(dims)
    return stack({n: wrap(value) for n in names}, channel('vector'))


def masked(value):  # pragma: no cover - convenience
    return value


def l2_loss(x, reduce=None) -> Tensor:
    """½·Σ x² over all non-batch dims (phiml math.l2_loss parity)."""
    from ._tensor import TensorStack as _TS
    if isinstance(x, _TS):
        return sum([l2_loss(c) for c in x.components])
    x = wrap(x)
    from . import _ops as _o
    return _o.sum_(x ** 2, reduce if reduce is not None else x.shape.non_batch) * 0.5


def l1_loss(x, reduce=None) -> Tensor:
    """Σ |x| over all non-batch dims (phiml math.l1_loss parity)."""
    from ._tensor import TensorStack as _TS
    if isinstance(x, _TS):
        return sum([l1_loss(c) for c in x.components])
    x = wrap(x)
    from . import _ops as _o
    return _o.sum_(abs(x), reduce if reduce is not None else x.shape.non_batch)
