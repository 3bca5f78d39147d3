"""Spatial differential operators and field arithmetic on grids
(reference: /root/reference/phi/field/_field_math.py, SURVEY.md §2.3).

All operators are pure functions on Field pytrees, trace through jit/grad, and
lower to XLA pad/slice/add chains that fuse into single stencil kernels on TPU
(Pallas fused variants in phiflow_tpu.ops.stencil for the 3D hot paths).
"""
from __future__ import annotations

import functools
from typing import Callable, Union

import numpy as np

from ..math import (
    Shape, Tensor, TensorStack, wrap, spatial, channel, dual, batch, instance,
    stack as math_stack, unstack, expand, rename_dims, concat_shapes,
)
from ..math import _ops as ops
from ..math import extrapolation as extrapolation_mod
from ..math.extrapolation import Extrapolation, ConstantExtrapolation
from ..math._functional import jit_compile_linear
from ..geom import Geometry, Box, UniformGrid
from ._field import Field, as_boundary
from ._grid import CenteredGrid, StaggeredGrid

__all__ = [
    'laplace', 'spatial_gradient', 'divergence', 'curl', 'stagger', 'fourier_laplace', 'fourier_poisson',
    'where', 'maximum', 'minimum', 'clip', 'abs_', 'sign', 'round_', 'ceil', 'floor', 'sqrt', 'exp', 'sin', 'cos',
    'is_finite', 'real', 'imag', 'sigmoid', 'mean', 'normalize', 'center_of_mass', 'vec_length', 'vec_squared',
    'finite_fill', 'discretize', 'integrate', 'pack_dims', 'support', 'mask', 'native_call', 'safe_mul',
    'bake_extrapolation', 'assert_close', 'data_bounds', 'pad', 'downsample2x', 'upsample2x', 'concat', 'stack',
    'stop_gradient', 'jit_compile_linear', 'l2_loss', 'l1_loss', 'frequency_loss',
]


def _dx(field: Field, dim: str) -> Tensor:
    return field.dx.vector[dim]


def bake_extrapolation(grid: Field) -> Field:
    """Pad a grid by 1 ghost cell and make the boundary NONE — materializes BC
    values into the tensor (reference: phi/field/_field_math.py:20)."""
    if grid.boundary == extrapolation_mod.NONE:
        return grid
    if grid.is_staggered:
        comps = []
        for dim in grid.resolution.names:
            comp = grid.vector[dim]
            lo, up = grid.boundary.valid_outer_faces(dim)
            widths = {dim: (int(not lo), int(not up))}
            comps.append(ops.pad(comp.values, widths, grid.boundary[{'vector': dim}]))
        values = math_stack(comps, dual(vector=grid.resolution.names))
        return Field(grid.geometry, values, extrapolation_mod.NONE)
    values = ops.pad(grid.values, {d: (1, 1) for d in grid.resolution.names}, grid.boundary)
    return Field(grid.geometry.padded({d: (1, 1) for d in grid.resolution.names}), values, extrapolation_mod.NONE)


def _axes_periodic(field: Field, dims) -> bool:
    """True if the field boundary is periodic along every dim in `dims`."""
    from ._stencil1d import classify_side
    return all(classify_side(field.boundary, d, False) == 'periodic' and
               classify_side(field.boundary, d, True) == 'periodic' for d in dims)


def _use_ghost_pad_order4(field: Field, dims) -> bool:
    """Dispatch for order-4 explicit schemes: the cheap shift/ghost-pad path is
    exact for periodic BCs; for exotic (unclassifiable) boundaries it is the
    only option (2nd-order accurate at the boundary). Classifiable non-periodic
    BCs go through the one-sided matrix engine instead."""
    from ._higher_order import _axis_bc
    if _axes_periodic(field, dims):
        return True
    return any(_axis_bc(field, d) is None for d in dims)


# ---------------------------------------------------------------------------
# laplace
# ---------------------------------------------------------------------------

def laplace(field: Field, axes=None, gradient: Field = None, order=2, implicit=None,
            weights: Union[Tensor, Field] = None, upwind=None, correct_skew=True) -> Field:
    """Finite-difference Laplacian Δf on a grid (reference: phi/field/_field_math.py:46).

    order=2: compact 5/7-point stencil with ghost cells from `field.boundary`.
    order=4: explicit 4th-order central stencil.
    """
    if field.is_mesh:
        from ._mesh_math import mesh_laplace
        return mesh_laplace(field, gradient=gradient, order=order, upwind=upwind, correct_skew=correct_skew)
    assert field.is_grid and field.is_centered, f"laplace requires a centered grid, got {field}"
    dims = [n for n in (axes or field.resolution.names) if n in field.resolution.names]
    if isinstance(weights, Field):
        weights = weights.at(field).values if weights.geometry != field.geometry else weights.values
    v = field.values
    if order == 2:
        result = None
        for dim in dims:
            dx2 = _dx(field, dim) ** 2
            padded = ops.pad(v, {dim: (1, 1)}, field.boundary, bounds=field.bounds)
            n = v.shape.get_size(dim)
            lo = padded[{dim: slice(0, n)}]
            ce = padded[{dim: slice(1, n + 1)}]
            up = padded[{dim: slice(2, n + 2)}]
            term = (lo + up - 2 * ce) / dx2
            result = term if result is None else result + term
    elif order == 4 and implicit is None and _use_ghost_pad_order4(field, dims):
        # periodic: standard 4th-order central (-1, 16, -30, 16, -1) / (12 dx²)
        # via wrap-around pads; non-periodic BCs go through the matrix engine
        # below (ghost-cell pads are only 2nd-order accurate at boundaries)
        result = None
        for dim in dims:
            dx2 = _dx(field, dim) ** 2
            padded = ops.pad(v, {dim: (2, 2)}, field.boundary, bounds=field.bounds)
            n = v.shape.get_size(dim)
            m2 = padded[{dim: slice(0, n)}]
            m1 = padded[{dim: slice(1, n + 1)}]
            ce = padded[{dim: slice(2, n + 2)}]
            p1 = padded[{dim: slice(3, n + 3)}]
            p2 = padded[{dim: slice(4, n + 4)}]
            term = (-m2 + 16 * m1 - 30 * ce + 16 * p1 - p2) / (12 * dx2)
            result = term if result is None else result + term
    else:
        from ._higher_order import higher_order_laplace
        return higher_order_laplace(field, order=order, implicit=implicit)
    if weights is not None:
        result = result * weights
    return Field(field.geometry, result, field.boundary.spatial_gradient())


# ---------------------------------------------------------------------------
# spatial gradient
# ---------------------------------------------------------------------------

def spatial_gradient(field: Field,
                     boundary: Union[Extrapolation, None] = None,
                     at: str = 'center',
                     dims=None,
                     stack_dim: Shape = channel('vector'),
                     order=2,
                     implicit=None,
                     upwind=None,
                     scheme=None) -> Field:
    """∇f of a centered grid (reference: phi/field/_field_math.py:148).

    at='center': central differences (order 2/4), result channel-stacked.
    at='face': forward differences on the staggered face grid (MAC gradient) —
    this is the pressure-gradient path of make_incompressible.
    """
    if field.is_mesh:
        from ._mesh_math import green_gauss_gradient, least_squares_gradient
        grad_fn = least_squares_gradient if scheme in ('least-squares', 'least_squares') else green_gauss_gradient
        if field.shape.channel:  # vector field → per-component gradients stacked as 'gradient'
            ch = field.shape.channel[0:1]
            if stack_dim.dims[0].name == ch.name:
                stack_dim = channel('gradient')
            labels = field.shape.get_labels(ch.name) or tuple(range(ch.volume))
            comps = [grad_fn(field[{ch.name: l}], stack_dim=stack_dim, boundary=boundary)
                     for l in labels]
            values = math_stack([c.values for c in comps], ch)
            return Field(field.geometry, values, comps[0].boundary)
        return grad_fn(field, stack_dim=stack_dim, boundary=boundary)
    assert field.is_grid, f"spatial_gradient requires a grid, got {type(field.geometry)}"
    grad_ext = as_boundary(boundary, field.geometry) if boundary is not None else field.boundary.spatial_gradient()
    dims = [n for n in (dims or field.resolution.names) if n in field.resolution.names]
    v = field.values
    if at == 'center':
        comps = {}
        for dim in dims:
            dx = _dx(field, dim)
            if order == 2:
                padded = ops.pad(v, {dim: (1, 1)}, field.boundary, bounds=field.bounds)
                n = v.shape.get_size(dim)
                comps[dim] = (padded[{dim: slice(2, n + 2)}] - padded[{dim: slice(0, n)}]) / (2 * dx)
            elif order == 4 and _use_ghost_pad_order4(field, [dim]):
                padded = ops.pad(v, {dim: (2, 2)}, field.boundary, bounds=field.bounds)
                n = v.shape.get_size(dim)
                m2 = padded[{dim: slice(0, n)}]
                m1 = padded[{dim: slice(1, n + 1)}]
                p1 = padded[{dim: slice(3, n + 3)}]
                p2 = padded[{dim: slice(4, n + 4)}]
                comps[dim] = (m2 - 8 * m1 + 8 * p1 - p2) / (12 * dx)
            else:
                from ._higher_order import higher_order_gradient
                return higher_order_gradient(field, grad_ext, at, dims, stack_dim, order, implicit)
        values = math_stack(comps, stack_dim)
        return Field(field.geometry, values, grad_ext)
    elif at == 'face':
        assert field.is_centered
        if order > 2:
            from ._higher_order import higher_order_gradient
            return higher_order_gradient(field, grad_ext, at, dims, stack_dim, order, implicit)
        comps = []
        for dim in dims:
            dx = _dx(field, dim)
            padded = ops.pad(v, {dim: (1, 1)}, field.boundary, bounds=field.bounds)
            n = v.shape.get_size(dim)
            # all n+1 face values (forward differences of the padded array)
            faces = (padded[{dim: slice(1, n + 2)}] - padded[{dim: slice(0, n + 1)}]) / dx
            lo_valid, up_valid = grad_ext.valid_outer_faces(dim)
            faces = faces[{dim: slice(int(not lo_valid), (n + 1) - int(not up_valid))}]
            comps.append(faces)
        values = math_stack(comps, dual(vector=dims))
        return Field(field.geometry, values, grad_ext)
    raise ValueError(at)


def stagger(field: Field, face_function: Callable, boundary, at='face', dims=None) -> Field:
    """Sample a centered grid at faces by combining the two adjacent cell values
    with `face_function` (reference: phi/field/_field_math.py:535; used for
    hard_bcs = stagger(accessible, math.minimum, ...) in fluid.py:135)."""
    boundary = as_boundary(boundary, field.geometry)
    dims = dims or field.resolution.names
    assert field.is_centered and field.is_grid
    if at == 'center':
        # evaluate face function at cell centers from neighbors on both sides
        comps = {}
        for dim in dims:
            padded = ops.pad(field.values, {dim: (1, 1)}, field.boundary, bounds=field.bounds)
            n = field.values.shape.get_size(dim)
            lo = face_function(padded[{dim: slice(0, n)}], padded[{dim: slice(1, n + 1)}])
            up = face_function(padded[{dim: slice(1, n + 1)}], padded[{dim: slice(2, n + 2)}])
            comps[dim] = face_function(lo, up)
        return Field(field.geometry, math_stack(comps, channel('vector')), boundary)
    comps = []
    for dim in dims:
        padded = ops.pad(field.values, {dim: (1, 1)}, field.boundary, bounds=field.bounds)
        n = field.values.shape.get_size(dim)
        lower = padded[{dim: slice(0, n + 1)}]
        upper = padded[{dim: slice(1, n + 2)}]
        faces = face_function(lower, upper)
        lo_valid, up_valid = boundary.valid_outer_faces(dim)
        faces = faces[{dim: slice(int(not lo_valid), (n + 1) - int(not up_valid))}]
        comps.append(faces)
    values = math_stack(comps, dual(vector=list(dims)))
    return Field(field.geometry, values, boundary)


# ---------------------------------------------------------------------------
# divergence & curl
# ---------------------------------------------------------------------------

def divergence(field: Field, order=2, implicit=None, upwind=None) -> Field:
    """∇·v (reference: phi/field/_field_math.py:589).

    Staggered grids: exact forward-difference sum over face components (MAC).
    Centered grids: central differences per component.
    """
    if field.is_mesh:
        from ._mesh_math import mesh_divergence
        return mesh_divergence(field, order=order, upwind=upwind)
    if field.is_staggered:
        assert order == 2, f"higher-order staggered divergence not yet supported"
        result = None
        for dim in field.resolution.names:
            comp = field.values[{'~vector': dim}]
            dx = _dx(field, dim)
            lo_valid, up_valid = field.boundary.valid_outer_faces(dim)
            ext = field.boundary[{'vector': dim}]
            padded = ops.pad(comp, {dim: (int(not lo_valid), int(not up_valid))}, ext)
            n = field.resolution.get_size(dim)
            term = (padded[{dim: slice(1, n + 1)}] - padded[{dim: slice(0, n)}]) / dx
            result = term if result is None else result + term
        return Field(field.geometry, result, field.boundary.spatial_gradient())
    else:
        assert 'vector' in field.values.shape, f"divergence requires a vector field"
        components = []
        for dim in field.resolution.names:
            comp = Field(field.geometry, field.values[{'vector': dim}], field.boundary[{'vector': dim}])
            grad = spatial_gradient(comp, at='center', dims=[dim], order=order, stack_dim=channel('_div'))
            components.append(grad.values[{'_div': 0}])
        result = components[0]
        for c in components[1:]:
            result = result + c
        return Field(field.geometry, result, field.boundary.spatial_gradient())


def curl(field: Field, at='corner') -> Field:
    """∇×v for 2D (scalar vorticity) and staggered 2D grids
    (reference: phi/field/_field_math.py:642)."""
    assert field.is_grid
    if field.is_centered and field.spatial_rank == 2 and 'vector' in field.values.shape:
        if at == 'center':
            vx = Field(field.geometry, field.values[{'vector': 'x'}], field.boundary[{'vector': 'x'}])
            vy = Field(field.geometry, field.values[{'vector': 'y'}], field.boundary[{'vector': 'y'}])
            dvy_dx = spatial_gradient(vy, at='center', dims=['x'], stack_dim=channel('_c')).values[{'_c': 0}]
            dvx_dy = spatial_gradient(vx, at='center', dims=['y'], stack_dim=channel('_c')).values[{'_c': 0}]
            return Field(field.geometry, dvy_dx - dvx_dy, field.boundary.spatial_gradient())
        # corner-sampled curl
        x, y = field.resolution.names
        v = field.values
        ext = field.boundary
        vx_pad = ops.pad(v[{'vector': x}], {y: (1, 1)}, ext[{'vector': x}])
        vy_pad = ops.pad(v[{'vector': y}], {x: (1, 1)}, ext[{'vector': y}])
        nx, ny = field.resolution.get_size(x), field.resolution.get_size(y)
        dvy_dx = (vy_pad[{x: slice(1, nx + 2)}] - vy_pad[{x: slice(0, nx + 1)}]) / _dx(field, x)
        dvx_dy = (vx_pad[{y: slice(1, ny + 2)}] - vx_pad[{y: slice(0, ny + 1)}]) / _dx(field, y)
        # both now corner-sampled (nx+1, ny+1) after cross-interpolation
        dvy_dx = 0.5 * (ops.pad(dvy_dx, {y: (1, 1)}, ext[{'vector': y}])[{y: slice(0, ny + 1)}] +
                        ops.pad(dvy_dx, {y: (1, 1)}, ext[{'vector': y}])[{y: slice(1, ny + 2)}])
        dvx_dy = 0.5 * (ops.pad(dvx_dy, {x: (1, 1)}, ext[{'vector': x}])[{x: slice(0, nx + 1)}] +
                        ops.pad(dvx_dy, {x: (1, 1)}, ext[{'vector': x}])[{x: slice(1, nx + 2)}])
        corner_grid = UniformGrid(field.resolution.with_sizes([s + 1 for s in field.resolution.sizes]),
                                  Box(field.bounds.lower - field.dx / 2, field.bounds.upper + field.dx / 2))
        return Field(corner_grid, dvy_dx - dvx_dy, extrapolation_mod.BOUNDARY)
    if field.is_staggered and field.spatial_rank == 2:
        cen = field.at_centers()
        return curl(cen, at=at)
    raise NotImplementedError(f"curl for {field}")


# ---------------------------------------------------------------------------
# spectral
# ---------------------------------------------------------------------------

def fourier_laplace(grid: Field, times=1) -> Field:
    from ..math._nd import fourier_laplace as _fl
    values = _fl(grid.values, grid.dx, times=times)
    return grid.with_values(values)


def fourier_poisson(grid: Field, times=1) -> Field:
    from ..math._nd import fourier_poisson as _fp
    values = _fp(grid.values, grid.dx, times=times)
    return grid.with_values(values)


# ---------------------------------------------------------------------------
# elementwise field functions
# ---------------------------------------------------------------------------

def where(mask, field_true, field_false) -> Field:
    template = None
    for x in (mask, field_true, field_false):
        if isinstance(x, Field):
            template = x
            break
    def val(x):
        if isinstance(x, Field):
            return x.values if x.geometry == template.geometry else x.at(template).values
        if isinstance(x, Geometry):
            return ops.to_float(x.lies_inside(template.center))
        return wrap(x)
    values = ops.where(val(mask), val(field_true), val(field_false))
    boundary = template.boundary
    if isinstance(field_true, Field) and isinstance(field_false, Field):
        try:
            m_ext = mask.boundary if isinstance(mask, Field) else None
            boundary = extrapolation_mod.where(True, field_true.boundary, field_true.boundary)
            boundary = field_true.boundary  # keep true-branch BC (matches common reference usage)
        except Exception:
            pass
    return Field(template.geometry, values, boundary)


def _unary_field(fn):
    def f(field: Field) -> Field:
        return field._op1(lambda v: fn(v) if isinstance(v, Tensor) else v)
    return f


abs_ = _unary_field(lambda v: abs(v))
sign = _unary_field(ops.sign)
round_ = _unary_field(ops.round_)
ceil = _unary_field(ops.ceil)
floor = _unary_field(ops.floor)
sqrt = _unary_field(ops.sqrt)
exp = _unary_field(ops.exp)
sin = _unary_field(ops.sin)
cos = _unary_field(ops.cos)
sigmoid = _unary_field(ops.sigmoid)
real = _unary_field(ops.real)
imag = _unary_field(ops.imag)
stop_gradient = _unary_field(ops.stop_gradient)


def is_finite(field: Field) -> Field:
    return Field(field.geometry, ops.is_finite(field.values), _finite_ext(field.boundary))


def _finite_ext(ext):
    if isinstance(ext, ConstantExtrapolation):
        return ConstantExtrapolation(ops.is_finite(ext.value))
    return ext


def maximum(f1, f2) -> Field:
    f1, f2 = _align_fields(f1, f2)
    return f1.with_values(ops.maximum(f1.values, f2.values if isinstance(f2, Field) else f2))


def minimum(f1, f2) -> Field:
    f1, f2 = _align_fields(f1, f2)
    return f1.with_values(ops.minimum(f1.values, f2.values if isinstance(f2, Field) else f2))


def clip(field: Field, lower=0., upper=1.) -> Field:
    return field.with_values(ops.clip(field.values, lower, upper))


def _align_fields(f1, f2):
    if isinstance(f1, Field) and isinstance(f2, Field):
        if f1.geometry != f2.geometry:
            f2 = f2.at(f1)
        return f1, f2
    if isinstance(f1, Field):
        return f1, f1.with_values(wrap(f2)) if not isinstance(f2, Tensor) else f1.with_values(f2)
    f2, f1 = _align_fields(f2, f1)
    return f1, f2


def safe_mul(a, b):
    """Multiplication treating 0·NaN as 0 (reference: phi/field/_field_math.py:1288;
    used for obstacle masking of possibly-NaN velocities)."""
    if isinstance(a, Field) and isinstance(b, Field):
        bv = b.values if a.geometry == b.geometry else b.at(a).values
        values = _safe_mul_values(a.values, bv)
        return a.with_values(values)
    if isinstance(a, Field):
        return a.with_values(_safe_mul_values(a.values, wrap(b) if not isinstance(b, Tensor) else b))
    if isinstance(b, Field):
        return b.with_values(_safe_mul_values(wrap(a) if not isinstance(a, Tensor) else a, b.values))
    return _safe_mul_values(wrap(a), wrap(b))


def _safe_mul_values(a, b):
    zero_a = a == 0 if isinstance(a, Tensor) else wrap(a == 0)
    zero_b = b == 0 if isinstance(b, Tensor) else wrap(b == 0)
    an = ops.where(zero_b, ops.zeros_like(a) if isinstance(a, Tensor) else 0, a)
    bn = ops.where(zero_a, ops.zeros_like(b) if isinstance(b, Tensor) else 0, b)
    return an * bn


# ---------------------------------------------------------------------------
# reductions & analysis
# ---------------------------------------------------------------------------

def mean(field: Field, dim=None) -> Tensor:
    """Mean over sample points (reference: phi/field/_field_math.py:780)."""
    if dim is None:
        dims = field.values.shape.non_channel.non_batch
    else:
        dims = dim
    return ops.mean(field.values, dims)


def normalize(field: Field, norm: Field = None, epsilon=1e-15) -> Field:
    source = norm if norm is not None else field
    total = ops.sum_(source.values, source.values.shape.non_batch)
    return field.with_values(ops.safe_div(field.values, total))


def center_of_mass(density: Field) -> Tensor:
    total = ops.sum_(density.values, density.values.shape.non_batch)
    weighted = density.center * density.values
    return ops.sum_(weighted, density.values.shape.non_batch) / total


def vec_length(field: Field) -> Field:
    if field.is_staggered:
        field = field.at_centers()
    return Field(field.geometry, ops.vec_length(field.values), extrapolation_mod.map(
        lambda e: ConstantExtrapolation(ops.vec_length(e.value)) if isinstance(e, ConstantExtrapolation) and 'vector' in e.value.shape else abs(e),
        field.boundary))


vec_abs = vec_length


def vec_squared(field: Field) -> Field:
    if field.is_staggered:
        field = field.at_centers()
    return field.with_values(ops.vec_squared(field.values))


def finite_fill(grid: Field, distance=1, diagonal=False) -> Field:
    """Flood-fill NaN cells from finite neighbors (reference:
    phi/field/_field_math.py:1076; FLIP velocity extension)."""
    assert grid.is_grid
    if grid.is_staggered:
        comps = []
        for dim in grid.resolution.names:
            comp = grid.vector[dim]
            filled = _finite_fill_values(comp.values, distance)
            comps.append(filled)
        return Field(grid.geometry, math_stack(comps, dual(vector=grid.resolution.names)), grid.boundary)
    return grid.with_values(_finite_fill_values(grid.values, distance))


def _finite_fill_values(values: Tensor, distance: int) -> Tensor:
    from ..math._nd import masked_fill
    valid = ops.is_finite(values)
    clean = ops.where(valid, values, ops.zeros_like(values))
    filled, _ = masked_fill(clean, valid, distance)
    # restore NaN where nothing was reachable? reference keeps filling only distance cells
    reach_valid = valid
    for _ in range(distance):
        reach = ops.to_float(reach_valid)
        for dim in values.shape.spatial.names:
            lo, up = ops.shift(reach, (-1, 1), dim, extrapolation_mod.ZERO, stack_dim=None)
            reach = ops.maximum(reach, ops.maximum(lo, up))
        reach_valid = reach > 0
    return ops.where(reach_valid, filled, values)


def discretize(grid: Field, filled_fraction=0.25) -> Field:
    """Make continuous field binary by keeping the top `filled_fraction` of cells."""
    import numpy as np
    v = np.sort(np.asarray(grid.values.native()).flatten())
    threshold = v[int((1 - filled_fraction) * len(v))]
    filled = ops.where(grid.values > float(threshold), ops.ones_like(grid.values), ops.zeros_like(grid.values))
    return grid.with_values(filled)


def integrate(field: Field, region: Geometry = None, **kwargs) -> Tensor:
    """∫ f dV over the field's region (reference: phi/field/_field_math.py:1112)."""
    if region is None:
        return ops.sum_(field.values * field.geometry.volume, field.values.shape.non_channel.non_batch)
    weight = region.approximate_fraction_inside(field.geometry, **kwargs)
    return ops.sum_(field.values * weight * field.geometry.volume, field.values.shape.non_channel.non_batch)


def pack_dims(field: Field, dims, packed_dim: Shape, **kwargs) -> Field:
    values = ops.pack_dims(field.values, dims, packed_dim)
    geometry = field.geometry  # geometry dims unaffected for batch packing
    return Field(geometry, values, field.boundary)


def support(field: Field, list_dim=instance('nonzero')) -> Tensor:
    """Positions of nonzero cells (reference: phi/field/_field_math.py:1156)."""
    idx = ops.nonzero(field.values, list_dim=list_dim)
    return ops.gather(_flatten_centers(field), idx) if False else _centers_at(field, idx)


def _centers_at(field, idx):
    centers = field.center
    return ops.gather(centers, idx)


def _flatten_centers(field):
    return field.center


def mask(obj) -> Field:
    """1 where obj is defined/nonzero (reference: phi/field/_field_math.py:1170)."""
    if isinstance(obj, Field):
        if obj.is_point_cloud:
            return Field(obj.geometry, wrap(1.), 0.)
        values = ops.to_float(obj.values != 0)
        return Field(obj.geometry, values, extrapolation_mod.map(
            lambda e: ConstantExtrapolation(0.) if isinstance(e, ConstantExtrapolation) else e, obj.boundary))
    assert isinstance(obj, Geometry), f"mask requires a Field or Geometry, got {type(obj)}"
    from ._mask import HardGeometryMask
    return Field(obj, wrap(1.), 0.)


def native_call(f, *inputs, channels_last=None, channel_dim='vector', extrapolation=None, **kwargs):
    """Call a native function (e.g. a neural net) on grid values
    (reference: phi/field/_field_math.py:744)."""
    if isinstance(inputs[0], Field):
        template = inputs[0]
        tensors = [i.values if isinstance(i, Field) else i for i in inputs]
        values = ops.native_call(f, *tensors, channels_last=True if channels_last is None else channels_last,
                                 channel_dim=channel_dim)
        return Field(template.geometry, values, extrapolation if extrapolation is not None else template.boundary)
    return ops.native_call(f, *inputs, channels_last=bool(channels_last), channel_dim=channel_dim)


def data_bounds(loc) -> Box:
    if isinstance(loc, Field):
        loc = loc.center
    assert isinstance(loc, Tensor)
    return Box(ops.min_(loc, loc.shape.non_batch.without('vector')),
               ops.max_(loc, loc.shape.non_batch.without('vector')))


def assert_close(*fields, rel_tolerance=1e-5, abs_tolerance=0, msg="", verbose=True):
    """Assert fields/tensors are close (reference: phi/field/_field_math.py:986)."""
    inner = [f.values if isinstance(f, Field) else wrap(f) for f in fields]
    # resample to first field's geometry if needed
    if isinstance(fields[0], Field):
        f0 = fields[0]
        inner = [f.at(f0).values if isinstance(f, Field) and f.geometry != f0.geometry
                 else (f.values if isinstance(f, Field) else wrap(f)) for f in fields]
    ops.assert_close(*inner, rel_tolerance=rel_tolerance, abs_tolerance=abs_tolerance, msg=msg)


def l2_loss(field) -> Tensor:
    if isinstance(field, Field):
        field = field.values
    if isinstance(field, TensorStack):
        return sum([l2_loss(c) for c in field.components])
    return ops.sum_(field ** 2, field.shape.non_batch) * 0.5


def l1_loss(field) -> Tensor:
    if isinstance(field, Field):
        field = field.values
    if isinstance(field, TensorStack):
        return sum([l1_loss(c) for c in field.components])
    return ops.sum_(abs(field), field.shape.non_batch)


def frequency_loss(field, frequency_falloff=100, threshold=1e-5, ignore_mean=False) -> Tensor:
    """Loss on the weighted frequency spectrum (reference: phiml frequency_loss;
    penalizes low frequencies more)."""
    values = field.values if isinstance(field, Field) else field
    if isinstance(values, TensorStack):
        return sum([frequency_loss(c, frequency_falloff, threshold, ignore_mean) for c in values.components])
    if ignore_mean:
        values = values - ops.mean(values, values.shape.non_batch)
    # |û|²-weighted loss via matmul-DFT (TPU-safe: no device FFT)
    import jax.numpy as jnp
    import numpy as np
    from ..math._nd import _dft_mats, _axis_matmul
    native = values.native()
    names = values.shape.names
    dims = values.shape.spatial.names
    axes = [names.index(d) for d in dims]
    re, im = native, jnp.zeros_like(native)
    for ax in axes:
        (fr, fi), _ = _dft_mats(native.shape[ax])
        re, im = (_axis_matmul(re, ax, fr) - _axis_matmul(im, ax, fi),
                  _axis_matmul(re, ax, fi) + _axis_matmul(im, ax, fr))
    k2_nd = None
    for i, (d, ax) in enumerate(zip(dims, axes)):
        k = np.fft.fftfreq(native.shape[ax]) ** 2
        k = k.reshape([-1 if j == i else 1 for j in range(len(dims))])
        k2_nd = k if k2_nd is None else k2_nd + k
    w_nd = np.exp(-0.5 * k2_nd * frequency_falloff ** 2).astype(np.float32)
    fshape = [native.shape[a] if a in axes else 1 for a in range(native.ndim)]
    w = jnp.asarray(w_nd).reshape(fshape)
    sq = (re ** 2 + im ** 2) * w
    batch_axes = tuple(i for i, nm in enumerate(names) if values.shape[nm].is_batch)
    total = jnp.sum(sq, axis=tuple(a for a in range(native.ndim) if a not in batch_axes)) * 0.5
    from ..math._shape import Shape as _Shape
    return Tensor(total, values.shape.batch)


# ---------------------------------------------------------------------------
# resolution / layout changes
# ---------------------------------------------------------------------------

def pad(grid: Field, widths: Union[int, tuple, list, dict]) -> Field:
    """Pad a grid, growing its geometry (reference: phi/field/_field_math.py:819)."""
    if isinstance(widths, int):
        widths = {d: (widths, widths) for d in grid.resolution.names}
    elif isinstance(widths, (tuple, list)):
        widths = {d: (w[0], w[1]) if isinstance(w, (tuple, list)) else (w, w)
                  for d, w in zip(grid.resolution.names, widths)}
    assert grid.is_grid
    if grid.is_staggered:
        comps = []
        for dim in grid.resolution.names:
            comp = grid.vector[dim].values
            w = {d: ww for d, ww in widths.items()}
            comps.append(ops.pad(comp, w, grid.boundary[{'vector': dim}]))
        values = math_stack(comps, dual(vector=grid.resolution.names))
    else:
        values = ops.pad(grid.values, widths, grid.boundary)
    geometry = grid.geometry.padded(widths)
    return Field(geometry, values, grid.boundary)


def downsample2x(grid: Field) -> Field:
    """Half resolution (reference: phi/field/_field_math.py:861)."""
    from ..math._nd import downsample2x as _ds
    assert grid.is_grid and grid.is_centered
    values = _ds(grid.values, grid.boundary)
    geometry = UniformGrid(grid.resolution.with_sizes([s // 2 + (s % 2) for s in grid.resolution.sizes]) if False
                           else grid.resolution.with_sizes([(s + 1) // 2 for s in grid.resolution.sizes]), grid.bounds)
    return Field(geometry, values, grid.boundary)


def upsample2x(grid: Field) -> Field:
    from ..math._nd import upsample2x as _us
    assert grid.is_grid and grid.is_centered
    values = _us(grid.values, grid.boundary)
    geometry = UniformGrid(grid.resolution.with_sizes([s * 2 for s in grid.resolution.sizes]), grid.bounds)
    return Field(geometry, values, grid.boundary)


def concat(fields, dim) -> Field:
    """Concatenate fields along a dim, fusing bounds for spatial concat
    (reference: phi/field/_field_math.py:914)."""
    assert len(fields) > 0
    f0 = fields[0]
    name = dim if isinstance(dim, str) else dim.name
    values = ops.concat([f.values for f in fields], dim if isinstance(dim, Shape) else f0.values.shape[name])
    if name in f0.resolution:
        raise NotImplementedError("spatial concat of grids with bounds fusion")
    if f0.is_point_cloud:
        from ..geom import Point
        geoms = [f.geometry for f in fields]
        if all(type(g) == type(geoms[0]) for g in geoms) and hasattr(geoms[0], '__field_stack__'):
            centers = ops.concat([g.center for g in geoms], dim if isinstance(dim, Shape) else instance(**{name: 0}).with_dim_size(name, 0))
            geometry = Point(centers) if isinstance(geoms[0], Point) else geoms[0].at(centers)
        else:
            geometry = f0.geometry
        return Field(geometry, values, f0.boundary)
    return Field(f0.geometry, values, f0.boundary)


def stack(fields, dim: Shape, dim_bounds=None) -> Field:
    """Stack fields along a new dim (reference: phi/field/_field_math.py:946)."""
    fields = list(fields)
    f0 = fields[0]
    values = math_stack([f.values for f in fields], dim)
    if dim.dims[0].is_spatial:
        raise NotImplementedError("spatial stacking of grids (dim_bounds)")
    geoms = [f.geometry for f in fields]
    if all(g == geoms[0] for g in geoms):
        geometry = geoms[0]
    elif all(type(g) == type(geoms[0]) for g in geoms) and hasattr(geoms[0], '__field_stack__'):
        geometry = geoms[0].__field_stack__(geoms, dim)
    else:
        from ..geom._geom_ops import GeometryStack
        geometry = GeometryStack(tuple(geoms), dim)
    boundary = f0.boundary
    return Field(geometry, values, boundary)
