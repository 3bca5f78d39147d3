"""phiflow_tpu.field — field layer (reference: /root/reference/phi/field/)."""
from ._field import Field, FieldInitializer, as_boundary, is_staggered
from ._grid import CenteredGrid, StaggeredGrid, Grid, unstack_staggered_tensor, expand_staggered
from ._resample import resample, sample, reduce_sample, grid_scatter
from ._field_math import (
    laplace, spatial_gradient, divergence, curl, stagger, fourier_laplace, fourier_poisson,
    where, maximum, minimum, clip, abs_ as abs, sign, round_ as round, ceil, floor, sqrt, exp, sin, cos,
    is_finite, real, imag, sigmoid, mean, normalize, center_of_mass, vec_length, vec_abs, vec_squared,
    finite_fill, discretize, integrate, pack_dims, support, mask, native_call, safe_mul,
    bake_extrapolation, assert_close, data_bounds, pad, downsample2x, upsample2x, concat, stack,
    stop_gradient, l2_loss,
)
from ._noise import Noise
from ._mask import HardGeometryMask, SoftGeometryMask, GeometryMask
from ._angular_velocity import AngularVelocity
from ._point_cloud import PointCloud, nonzero, distribute_points
from ._embed import FieldEmbedding
from ._field_io import write, read
from ._scene import Scene, SceneBatch

# aliases & re-exports matching the reference namespace (phi/field/__init__.py)
SampledField = Field  # PhiFlow 2.x alias
from ._field_math import l1_loss, frequency_loss
from ..math import (
    to_float, to_int32, to_int64, cast, unstack, shift,
    jit_compile, jit_compile_linear, gradient, functional_gradient, jacobian,
    solve_linear, solve_nonlinear, minimize,
)
from ._field_math import is_finite as isfinite


def convert(field, backend=None, use_dlpack=True):
    """Backend conversion is a no-op in the JAX-only core (reference: phi.field.convert)."""
    return field
