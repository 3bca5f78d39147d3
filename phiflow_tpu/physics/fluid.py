"""Incompressible fluid solver (reference: /root/reference/phi/physics/fluid.py,
SURVEY.md §2.4 and call stack §3.1/§3.2).

`make_incompressible` projects a velocity field onto its divergence-free part by
solving the pressure Poisson system. The linear operator (`masked_laplace`) stays
matrix-free: each CG iteration applies grad→mask→div as one XLA-fused stencil,
with psum-able dot products for multi-chip sharding (phiflow_tpu.parallel).
"""
from __future__ import annotations

import warnings
from typing import Callable, List, Optional, Tuple, Union

import numpy as np

from ..math import (
    Tensor, Solve, wrap, channel, batch, spatial, non_channel, merge_shapes, expand, copy_with,
    NUMPY, shape as shape_of,
)
from ..math import _ops as ops
from ..math import extrapolation, solve_linear, jit_compile_linear
from ..math.extrapolation import Extrapolation, ConstantExtrapolation
from ..geom import Geometry, union
from ..field import (
    Field, CenteredGrid, StaggeredGrid, AngularVelocity, PointCloud, resample, spatial_gradient,
    divergence, where, safe_mul, stagger as field_stagger, mean as field_mean, is_finite as field_is_finite,
)
from ..field._embed import FieldEmbedding

__all__ = ['Obstacle', 'make_incompressible', 'masked_laplace', 'apply_boundary_conditions',
           'boundary_push', 'incompressible_rk4']


class Obstacle:
    """Boundary conditions inside a geometry, optionally moving/rotating
    (reference: fluid.py:21-84)."""

    def __init__(self, geometry: Geometry, velocity=0, angular_velocity=0):
        self.geometry = geometry
        self.velocity = wrap(list(velocity), channel(vector=geometry.shape.get_labels('vector'))) \
            if isinstance(velocity, (tuple, list)) else wrap(velocity)
        self.angular_velocity = wrap(angular_velocity)
        self.shape = merge_shapes(shape_of(geometry), non_channel(self.velocity), non_channel(self.angular_velocity))

    @property
    def is_stationary(self):
        return not self.is_moving and not self.is_rotating

    @property
    def is_rotating(self):
        return not ops.always_close(self.angular_velocity, 0)

    @property
    def is_moving(self):
        return not ops.always_close(self.velocity, 0)

    def with_geometry(self, geometry):
        return Obstacle(geometry, self.velocity, self.angular_velocity)

    def shifted(self, delta):
        return self.with_geometry(self.geometry.shifted(delta))

    def at(self, position):
        return self.with_geometry(self.geometry.at(position))

    def rotated(self, angle):
        return self.with_geometry(self.geometry.rotated(angle))

    def __variable_attrs__(self):
        return 'geometry', 'velocity', 'angular_velocity'

    def __eq__(self, other):
        return isinstance(other, Obstacle) and self.geometry == other.geometry \
            and ops.equal(self.velocity, other.velocity) and ops.equal(self.angular_velocity, other.angular_velocity)

    def __hash__(self):
        return hash('Obstacle')

    def __repr__(self):
        return f"Obstacle({self.geometry})"


import jax as _jax

_jax.tree_util.register_pytree_node(
    Obstacle,
    lambda o: ((o.geometry, o.velocity, o.angular_velocity), None),
    lambda aux, ch: Obstacle(ch[0], ch[1], ch[2]))


def _get_obstacles_for(obstacles, space: Field) -> List[Obstacle]:
    obstacles = [obstacles] if isinstance(obstacles, (Obstacle, Geometry)) else obstacles
    assert isinstance(obstacles, (tuple, list)), f"obstacles must be Obstacle/Geometry or tuple/list, got {type(obstacles)}"
    return [Obstacle(o) if isinstance(o, Geometry) else o for o in obstacles]


def _linearize_pressure_bc(ext):
    """The HOMOGENEOUS linear part of a pressure extrapolation: pad values that
    do not depend on the padded field (FieldEmbedding samples of another field,
    nonzero constants) contribute only an affine offset — their linearization
    is a zero ghost (Dirichlet). Preconditioners must apply THIS boundary, not
    the original: re-adding the affine offset on every M(r) application made
    CG diverge on the nested-domain recipe (Multi_Grid_Fluid.ipynb)."""
    from ..math._extrapolation import _MixedExtrapolation
    if isinstance(ext, ConstantExtrapolation):
        return ext if ops.always_close(ext.value, 0) else extrapolation.ZERO
    if isinstance(ext, _MixedExtrapolation):
        return _MixedExtrapolation({dim: (_linearize_pressure_bc(lo), _linearize_pressure_bc(hi))
                                    for dim, (lo, hi) in ext.ext.items()})
    if _is_homogeneous_pressure_bc(ext):
        return ext
    return extrapolation.ZERO  # FieldEmbedding / unknown value-type pads


def solve_pressure_field(div: Field, v_boundary: Extrapolation, solve: Solve) -> Field:
    """The UNMASKED pressure solve of make_incompressible, entered with a
    ready divergence Field: closed-box balancing + rank deficiency, derived
    x0, MG preconditioning, homogeneity-aware solve_linear. Used by fused
    model paths that build the divergence with their own kernels (e.g.
    SmokePlume._fused_project) — keep in sync with make_incompressible's
    unmasked branch."""
    if not v_boundary.is_flexible:
        solve = solve.with_preprocessing(_balance_divergence, None)
        if solve.rank_deficiency is None:
            solve = copy_with(solve, rank_deficiency=1)
    if solve.x0 is None:
        solve = copy_with(solve, x0=Field(div.geometry, wrap(0.), _pressure_extrapolation(v_boundary)))
    if solve.preconditioner in (None, 'auto', 'multigrid') \
            and solve.method in ('auto', 'CG', 'CG-adaptive', 'CG-native'):
        x0_lin = solve.x0.with_boundary(_linearize_pressure_bc(solve.x0.boundary))
        M = _grid_multigrid_preconditioner(x0_lin, v_boundary)
        if M is not None:
            solve = copy_with(solve, preconditioner=M)
    if not callable(solve.preconditioner):
        solve = copy_with(solve, preconditioner=None)
    homogeneous = _is_homogeneous_pressure_bc(
        solve.x0.boundary if isinstance(solve.x0, Field) else None)
    return solve_linear(masked_laplace, div, solve, v_boundary, None, None,
                        wide_stencil=False, order=2, assume_homogeneous=homogeneous)


def _is_homogeneous_pressure_bc(ext) -> bool:
    """True iff padding a ZERO field with `ext` yields zeros — the condition
    for masked_laplace(0) = 0 (enables assume_homogeneous / the fused-dot CG).
    Derived pressure BCs (periodic / zero-gradient / constant-0, see
    _pressure_extrapolation) qualify; FieldEmbedding (nested domains) and
    nonzero constants do not."""
    from ..math._extrapolation import (_PeriodicExtrapolation, _BoundaryExtrapolation,
                                       _SymmetricExtrapolation, _ReflectExtrapolation,
                                       _AntiSymmetricExtrapolation, _AntiReflectExtrapolation,
                                       _MixedExtrapolation, ConstantExtrapolation)
    if ext is None:
        return True  # x0 will be derived via _pressure_extrapolation
    if isinstance(ext, (_PeriodicExtrapolation, _BoundaryExtrapolation, _SymmetricExtrapolation,
                        _ReflectExtrapolation, _AntiSymmetricExtrapolation, _AntiReflectExtrapolation)):
        return True
    if isinstance(ext, ConstantExtrapolation):
        return ops.always_close(ext.value, 0)
    if isinstance(ext, _MixedExtrapolation):
        return all(_is_homogeneous_pressure_bc(e) for pair in ext.ext.values() for e in pair)
    return False  # FieldEmbedding / unknown: be safe, subtract f(0)


def make_incompressible(velocity: Field,
                        obstacles=(),
                        solve: Solve = Solve(),
                        active: Field = None,
                        order: int = 2,
                        correct_skew=False,
                        wide_stencil: bool = None) -> Tuple[Field, Field]:
    """Project velocity onto its divergence-free part via a pressure solve
    (reference: fluid.py:94-162; call stack SURVEY.md §3.2)."""
    obstacles = _get_obstacles_for(obstacles, velocity)
    assert order <= 2 or len(obstacles) == 0, "obstacles require order=2"
    # --- explicit domain-decomposition path (parallel.decomposition active) ---
    # same public entry point from 1 chip to a full slice: ppermute halo rings +
    # psum'd CG instead of GSPMD auto-partitioning (SURVEY.md §2.7). Covers the
    # plain, batched, stationary-obstacle (cavity) and free-surface/`active`
    # (FLIP) cases; anything else falls back to GSPMD below.
    if order == 2 and velocity.is_staggered:
        from ..parallel._context import current_decomposition
        dd = current_decomposition()
        if dd is not None:
            from ..parallel._shardmap import sharded_make_incompressible
            result = sharded_make_incompressible(dd, velocity, solve,
                                                 obstacles=obstacles, active=active)
            if result is not None:
                return result
    input_velocity = velocity
    # --- obstacle masks ---
    all_active = active is None
    hard_bcs = None
    if obstacles:
        accessible_boundary = _accessible_extrapolation(input_velocity.boundary)
        accessible = Field(velocity.geometry, ~union([obs.geometry for obs in obstacles]), accessible_boundary)
        hard_bcs = field_stagger(accessible, ops.minimum, velocity.boundary, at=velocity.sampled_at,
                                 dims=velocity.resolution.names)
        active = accessible.with_boundary(extrapolation.NONE) if active is None else active * accessible
        velocity = apply_boundary_conditions(velocity, obstacles)
    div = divergence(velocity, order=order)
    if active is not None:
        div = div * active
    # --- singular-system handling (closed/periodic domains) ---
    if not all_active:
        div = where(field_is_finite(div), div, 0)
    if not input_velocity.boundary.is_flexible and all_active:
        solve = solve.with_preprocessing(_balance_divergence, active)
        if solve.rank_deficiency is None:
            solve = copy_with(solve, rank_deficiency=1)
    if solve.x0 is None:
        pressure_extrapolation = _pressure_extrapolation(input_velocity.boundary)
        solve = copy_with(solve, x0=Field(div.geometry, wrap(0.), pressure_extrapolation))
    if wide_stencil is None:
        wide_stencil = not velocity.is_staggered
    # --- multigrid preconditioning (TPU-native replacement for phiml's ILU) ---
    # Only for UNMASKED systems: with obstacles/free surfaces the operator has
    # identity blocks + interface Dirichlet rows that the all-domain Poisson
    # V-cycle approximates badly (and all-Neumann MG is semidefinite, which
    # breaks CG on the nonsingular masked system).
    if solve.preconditioner in (None, 'auto', 'multigrid') and solve.method in ('auto', 'CG', 'CG-adaptive', 'CG-native') \
            and order == 2 and not wide_stencil and not div.is_mesh and all_active and not obstacles:
        # linearized x0 boundary: an embedded/affine pressure BC contributes a
        # constant offset that the solver subtracts — the preconditioner must
        # approximate the LINEAR operator only
        x0_lin = solve.x0.with_boundary(_linearize_pressure_bc(solve.x0.boundary))
        M = _grid_multigrid_preconditioner(x0_lin, input_velocity.boundary)
        if M is not None:
            solve = copy_with(solve, preconditioner=M)
    elif (obstacles or not all_active) and solve.preconditioner in (None, 'auto', 'multigrid') \
            and solve.method in ('auto', 'CG', 'CG-adaptive', 'CG-native') \
            and order == 2 and not wide_stencil and not div.is_mesh:
        # masked systems (obstacles / free surfaces): VERDICT r3 #8 — previously
        # unpreconditioned. Chebyshev(Jacobi) on the exact masked diagonal is
        # uniformly safe; the projected V-cycle is stronger when the system has
        # no free-surface Dirichlet rows (selected empirically, see
        # tests/physics/test_masked_preconditioner.py).
        M = None
        if MASKED_PRECONDITIONER == 'vcycle':
            M = _masked_vcycle_preconditioner(solve.x0, input_velocity.boundary, hard_bcs, active)
        elif MASKED_PRECONDITIONER == 'chebyshev':
            M = _masked_chebyshev_preconditioner(solve.x0, input_velocity.boundary, hard_bcs, active)
        solve = copy_with(solve, preconditioner=M)
    elif div.is_mesh and solve.preconditioner in (None, 'auto'):
        # FVM pressure systems: diagonal-scaled Chebyshev (TPU-native stand-in
        # for the reference's scipy splu / phiml ILU, phi/physics/fluid.py:193-194
        # — sequential triangular solves do not map to the TPU; a fixed-degree
        # matvec polynomial does). A = V⁻¹L is nonsymmetric for nonuniform cell
        # volumes, so 'auto' routes to BiCGStab (right-preconditioned, no SPD
        # requirement on M).
        solve = copy_with(solve, preconditioner=_mesh_chebyshev_preconditioner(solve.x0, order=order))
        if solve.method == 'auto':
            solve = copy_with(solve, method='biCG-stab')
    elif not callable(solve.preconditioner):
        solve = copy_with(solve, preconditioner=None)
    # --- linear solve for pressure ---
    # assume_homogeneous: DERIVED pressure BCs are periodic / zero-gradient /
    # constant-0 (see _pressure_extrapolation) and obstacle masks only multiply,
    # so masked_laplace(0) = 0 exactly — enables the fused ⟨p, A·p⟩ CG epilogue.
    # A USER-supplied x0 can carry inhomogeneous boundaries though — e.g. the
    # nested-domain recipe embeds the coarse pressure as the fine boundary
    # (Multi_Grid_Fluid.ipynb, FieldEmbedding) — where skipping the affine
    # f(0) subtraction made CG diverge (observed |p| → 3e7).
    homogeneous = _is_homogeneous_pressure_bc(
        solve.x0.boundary if isinstance(solve.x0, Field) else None)
    pressure = solve_linear(masked_laplace, div, solve, input_velocity.boundary, hard_bcs, active,
                            wide_stencil=wide_stencil, order=order, assume_homogeneous=homogeneous)
    # --- subtract pressure gradient ---
    grad_pressure = spatial_gradient(pressure, input_velocity.boundary, at=velocity.sampled_at, order=order)
    if hard_bcs is not None:
        grad_pressure = grad_pressure * hard_bcs
    velocity = (velocity - grad_pressure).with_boundary(input_velocity.boundary)
    return velocity, pressure


@jit_compile_linear(auxiliary_args='wide_stencil,order', forget_traces=True)
def masked_laplace(pressure: Field,
                   v_boundary: Extrapolation,
                   hard_bcs: Field,
                   active: Field,
                   wide_stencil=False,
                   order=2) -> Field:
    """Laplace of pressure respecting obstacle masks — the CG matvec
    (reference: fluid.py:165-202). On uniform grids with classifiable BCs this
    dispatches to the fused Poisson stencil (ops.poisson — single Pallas kernel
    on TPU); otherwise it composes grad → mask → div from generic field ops."""
    if pressure.is_mesh:
        from ..field import laplace as field_laplace
        return field_laplace(pressure, order=order)
    if order > 2 and not wide_stencil:
        from ..field import laplace as field_laplace
        return field_laplace(pressure, order=order)
    if order == 2 and not wide_stencil:
        fused = _fused_masked_laplace(pressure, v_boundary, hard_bcs, active)
        if fused is not None:
            return fused
    if wide_stencil and hard_bcs is None and active is None:
        grad = spatial_gradient(pressure, v_boundary, at='center', order=order)
        grad = grad.with_boundary(extrapolation.remove_constant_offset(grad.boundary))
        return divergence(grad, order=order)
    grad = spatial_gradient(pressure, v_boundary, at='face', order=2)
    valid_grad = grad * hard_bcs if hard_bcs is not None else grad
    valid_grad = valid_grad.with_boundary(extrapolation.remove_constant_offset(valid_grad.boundary))
    div = divergence(valid_grad)
    return where(active, div, pressure) if active is not None else div


def _classify_pressure_bc(p_ext: Extrapolation, v_ext: Extrapolation, dims) -> Optional[tuple]:
    """Per-(axis, side) boundary mode of the linearized pressure operator, or
    None if the extrapolations fall outside {periodic, const, zero-gradient}.

    A side is 'periodic' if the velocity wraps; 'neumann' if its outer face
    flux vanishes (face dropped by a constant velocity BC, or kept but the
    pressure pads edge-replicate); 'ghost0' if the face is kept and the
    pressure pads a zero constant (ghost cell = 0)."""
    from ..math._extrapolation import _MixedExtrapolation, _BoundaryExtrapolation, _PeriodicExtrapolation

    def component(ext, dim, upper):
        while isinstance(ext, _MixedExtrapolation):
            ext = ext._get(dim, upper)
        return ext

    bc = []
    for dim in dims:
        sides = []
        for upper in (False, True):
            v = component(extrapolation.get_normal(v_ext[{'vector': dim}] if 'vector' in getattr(v_ext, 'shape', ()) else v_ext), dim, upper)
            p = component(p_ext, dim, upper)
            if isinstance(v, _PeriodicExtrapolation):
                if not isinstance(p, _PeriodicExtrapolation):
                    return None
                sides.append('periodic')
            elif isinstance(v, ConstantExtrapolation):
                sides.append('neumann')  # face dropped → zero flux
            elif isinstance(v, _BoundaryExtrapolation):
                if isinstance(p, ConstantExtrapolation):
                    if not ops.always_close(p.value, 0):
                        return None  # nonzero affine offset — generic path handles it
                    sides.append('ghost0')
                elif isinstance(p, _BoundaryExtrapolation):
                    sides.append('neumann')
                elif isinstance(p, _PeriodicExtrapolation):
                    return None
                else:
                    return None
            else:
                return None
        lo, hi = sides
        if ('periodic' in sides) and lo != hi:
            return None
        bc.append((lo, hi))
    return tuple(bc)


FUSED_POISSON = True  # dispatch masked_laplace to ops.poisson on uniform grids (tests toggle this)
MASKED_PRECONDITIONER = 'chebyshev'  # 'chebyshev' | 'vcycle' | None — masked-system preconditioner


def _fused_masked_laplace(pressure: Field, v_boundary: Extrapolation,
                          hard_bcs: Optional[Field], active: Optional[Field]) -> Optional[Field]:
    """Fast path: the masked pressure laplacian as one fused stencil
    (ops.poisson.poisson_apply). Returns None when not applicable."""
    from ..geom._grid import UniformGrid
    from ..ops import poisson
    if not FUSED_POISSON:
        return None
    if not isinstance(pressure.geometry, UniformGrid) or not pressure.is_centered:
        return None
    dims = pressure.resolution.names
    bc = _classify_pressure_bc(pressure.boundary, v_boundary, dims)
    if bc is None:
        return None
    try:
        dx_np = np.asarray(pressure.geometry.dx.native(pressure.geometry.dx.shape.names)).reshape(-1)
        inv_dx2 = tuple(1.0 / float(d) ** 2 for d in dx_np)
    except Exception:
        return None  # traced geometry
    values = pressure.values
    lead = values.shape.without(dims)
    order = lead.names + tuple(dims)
    arr = values.native(order)
    mA_list = c0 = act_arr = None
    if hard_bcs is not None:
        full_masks = []
        for dim in dims:
            comp = hard_bcs.values[{'~vector': dim}]
            lo_valid, up_valid = v_boundary.valid_outer_faces(dim)
            comp_order = [n for n in order if n in comp.shape]
            m = comp.native(tuple(comp_order))
            # pad dropped outer faces with zero mask (their flux is dropped)
            ax = comp_order.index(dim)
            pad_cfg = [(0, 0)] * m.ndim
            if bc[dims.index(dim)][0] == 'periodic':
                pad_cfg[ax] = (0, 0)
            else:
                pad_cfg[ax] = (int(not lo_valid), int(not up_valid))
            m = jnp.pad(m, pad_cfg)
            # restore leading axes for broadcast compatibility with `arr`
            missing = len(order) - m.ndim
            m = m.reshape((1,) * missing + m.shape)
            full_masks.append(m)
        mA_list, c0 = poisson.stage_masks(full_masks, bc, inv_dx2)
    if active is not None:
        act_arr = active.values.native([n for n in order if n in active.values.shape])
        act_arr = act_arr.reshape((1,) * (len(order) - act_arr.ndim) + act_arr.shape)
    result = poisson.poisson_apply(arr, inv_dx2, bc, mA_list=mA_list, c0=c0,
                                   active=act_arr, mode='matvec')
    out_shape = values.shape.only(list(order), reorder=True)
    bout = extrapolation.remove_constant_offset(v_boundary).spatial_gradient()
    return Field(pressure.geometry, Tensor(result, out_shape), bout)


import jax.numpy as jnp


def _bc_mode(ext: Extrapolation, dim: str, upper: bool) -> str:
    """Classify the pressure BC on one face for the multigrid smoother
    (fallback when the joint velocity/pressure classifier does not apply)."""
    from ..math._extrapolation import _MixedExtrapolation
    if isinstance(ext, _MixedExtrapolation):
        ext = ext._get(dim, upper)
    if ext == extrapolation.PERIODIC:
        return 'periodic'
    if isinstance(ext, ConstantExtrapolation):
        return 'ghost0'
    return 'neumann'  # ZERO_GRADIENT and anything exotic: Neumann is the safe smoother BC


def _mesh_chebyshev_preconditioner(x0: Field, order: int = 2, degree: int = 4,
                                   eig_ratio: float = 30.):
    """Chebyshev(Jacobi) preconditioner for FVM mesh Poisson systems.

    z ≈ A⁻¹r via a degree-`degree` Chebyshev polynomial in B = D⁻¹A, with D the
    analytic operator diagonal (`mesh_laplace_diagonal`). B's spectrum lies in
    (0, 2] for the diagonally-scaled Laplacian (Gershgorin: interior row sums of
    |off-diagonals| equal |diag|), so fixed bounds [λmax/eig_ratio, λmax=2] need
    no power iteration — the preconditioner costs exactly degree−1 extra matvecs
    per application and nothing at setup, which matters because it is rebuilt
    inside every traced step."""
    from ..field import laplace as field_laplace
    from ..field._mesh_math import mesh_laplace_diagonal
    diag = mesh_laplace_diagonal(x0)
    inv_diag = 1. / diag
    lmax = 2.0
    a, b = lmax / eig_ratio, lmax
    theta, delta = (b + a) / 2., (b - a) / 2.
    sigma1 = theta / delta

    def preconditioner(r: Field) -> Field:
        rs = r.values * inv_diag
        z = rs / theta
        d = z
        rho = 1. / sigma1
        for _ in range(degree - 1):
            Bz = field_laplace(r.with_values(z), order=order).values * inv_diag
            rho_new = 1. / (2. * sigma1 - rho)
            d = rho_new * rho * d + (2. * rho_new / delta) * (rs - Bz)
            z = z + d
            rho = rho_new
        return r.with_values(z)

    return preconditioner


def _masked_diagonal(x0: Field, v_boundary: Extrapolation, hard_bcs: Optional[Field],
                     active: Optional[Field]) -> Optional[Tensor]:
    """Exact diagonal of the masked pressure operator via checkerboard probing:
    the 2nd-order masked Laplacian is a nearest-neighbor stencil, so for a
    parity-c indicator field e_c, (A·e_c)_i = diag_i wherever cell i has parity
    c (all stencil neighbors have opposite parity and contribute 0). Two
    matvecs recover the full diagonal — including identity rows for inactive
    cells and the BC-dependent edge rows — with no per-BC case analysis.
    Returns None when parity is ill-defined (odd-sized periodic axis)."""
    names = x0.resolution.names
    try:
        sizes = [int(s) for s in x0.resolution.sizes]
    except Exception:
        return None  # traced resolution
    for i, dim in enumerate(names):
        lo = _bc_mode(x0.boundary, dim, False)
        if lo == 'periodic' and sizes[i] % 2:
            return None  # wrap-around neighbor has the same parity
    from ..math import Tensor as _Tensor
    idx = sum(jnp.arange(s).reshape([s if j == i else 1 for j in range(len(sizes))])
              for i, s in enumerate(sizes))
    parity = (idx % 2).astype(x0.values.dtype)
    sp_shape = x0.values.shape.only(list(names), reorder=True)

    def apply_A(arr):
        f = x0.with_values(_Tensor(arr, sp_shape))
        return masked_laplace(f, v_boundary, hard_bcs, active, wide_stencil=False, order=2)

    d_even = apply_A(1. - parity)
    d_odd = apply_A(parity)
    par = _Tensor(parity, sp_shape)
    return (1. - par) * d_even.values + par * d_odd.values


def _masked_chebyshev_preconditioner(x0: Field, v_boundary: Extrapolation,
                                     hard_bcs: Optional[Field], active: Optional[Field],
                                     degree: int = 4, eig_ratio: float = 30.):
    """Chebyshev(Jacobi) preconditioner for OBSTACLE-MASKED / free-surface
    pressure systems (VERDICT r3 #8: these previously ran unpreconditioned
    because the all-domain MG V-cycle approximates the masked operator badly).

    B = D⁻¹A with D the exact masked diagonal (checkerboard probe): identity
    rows map to eigenvalue 1, active rows are diagonally dominant, so B's
    spectrum lies in (0, 2] and fixed Chebyshev bounds [2/eig_ratio, 2] need no
    power iteration. Cost: 2 matvecs at (traced) build + degree−1 matvecs per
    application, each the fused Poisson stencil. M = p(B)D⁻¹ is symmetric in
    the D-inner product, preserving CG convergence theory."""
    lin_bc = _linearize_pressure_bc(x0.boundary)
    x0 = x0.with_boundary(lin_bc)  # probe/apply the LINEAR operator only
    diag = _masked_diagonal(x0, v_boundary, hard_bcs, active)
    if diag is None:
        return None
    eps = 1e-30
    inv_diag = ops.where(abs(diag) > eps, 1. / ops.where(abs(diag) > eps, diag, 1.), 1.)
    lmax = 2.0
    a, b = lmax / eig_ratio, lmax
    theta, delta = (b + a) / 2., (b - a) / 2.
    sigma1 = theta / delta

    def apply_B(z_field):
        Az = masked_laplace(z_field, v_boundary, hard_bcs, active, wide_stencil=False, order=2)
        return Az.values * inv_diag

    def preconditioner(r: Field) -> Field:
        r = r.with_boundary(lin_bc)  # solver rebuilds r with x0's (possibly affine) boundary
        rs = r.values * inv_diag
        z = rs / theta
        d = z
        rho = 1. / sigma1
        for _ in range(degree - 1):
            Bz = apply_B(r.with_values(z))
            rho_new = 1. / (2. * sigma1 - rho)
            d = rho_new * rho * d + (2. * rho_new / delta) * (rs - Bz)
            z = z + d
            rho = rho_new
        return r.with_values(z)

    return preconditioner


def _masked_vcycle_preconditioner(x0: Field, v_boundary: Extrapolation,
                                  hard_bcs: Optional[Field], active: Optional[Field]):
    """Projected multigrid for masked systems: z = P·V(P·r) + (I−P)·r with P
    the active-cell projection and V the unmasked Poisson V-cycle. Identity
    rows are exact; near the obstacle interface V only approximates, which
    degrades (not breaks) CG. Symmetric because V is and P is diagonal."""
    x0 = x0.with_boundary(_linearize_pressure_bc(x0.boundary))  # linear part only
    M_inner = _grid_multigrid_preconditioner(x0, v_boundary)
    if M_inner is None or active is None:
        return M_inner
    act = active.values

    def preconditioner(r: Field) -> Field:
        rm = r.with_values(r.values * act)
        z = M_inner(rm)
        return r.with_values(z.values * act + r.values * (1. - act))

    return preconditioner


def _grid_multigrid_preconditioner(x0: Field, v_boundary: Extrapolation = None):
    """Build a geometric-multigrid V-cycle preconditioner for the pressure system
    on a uniform grid, or None when not applicable. The V-cycle ignores obstacle
    masks (it approximates the unobstructed Poisson inverse) — CG convergence
    stays exact because the matvec is the true masked operator; obstacles only
    reduce the preconditioner's effectiveness locally."""
    from ..geom._grid import UniformGrid
    from ..math._multigrid import make_poisson_vcycle
    from ..math import Tensor as _Tensor
    geometry = x0.geometry
    if not isinstance(geometry, UniformGrid):
        return None
    res_shape = geometry.resolution
    names = res_shape.names
    try:
        resolution = tuple(int(s) for s in res_shape.sizes)
        dx_np = np.asarray(geometry.dx.native(geometry.dx.shape.names)).reshape(-1)
        dx = tuple(float(d) for d in dx_np)
    except Exception:
        return None  # traced geometry — skip preconditioning
    if max(resolution) < 16:
        return None  # plain CG converges in a handful of iterations anyway
    pext = x0.boundary
    bcs = _classify_pressure_bc(pext, v_boundary, names) if v_boundary is not None else None
    if bcs is None:
        bcs = tuple((_bc_mode(pext, n, False), _bc_mode(pext, n, True)) for n in names)
    vcycle = make_poisson_vcycle(resolution, dx, bcs)

    def preconditioner(r: Field) -> Field:
        values = r.values
        b_names = values.shape.without(names).names  # batch dims first
        order = tuple(b_names) + tuple(names)
        arr = values.native(order)
        flat = arr.reshape((-1,) + resolution)
        z = vcycle(flat)
        from ..math._shape import merge_shapes
        out_shape = values.shape.only(list(order), reorder=True)
        return r.with_values(_Tensor(z.reshape(arr.shape), out_shape))

    return preconditioner


def _balance_divergence(div: Field, active: Optional[Field]) -> Field:
    """Subtract the mean so the singular Poisson system is solvable
    (reference: fluid.py:205)."""
    if active is not None:
        return div - active * (field_mean(div) / field_mean(active))
    return div - field_mean(div)


def apply_boundary_conditions(velocity: Field, obstacles):
    """Blend obstacle velocities into the velocity field
    (reference: fluid.py:212-241)."""
    obstacles = _get_obstacles_for(obstacles, velocity)
    for obstacle in obstacles:
        obs_mask = resample(obstacle.geometry, velocity, soft=True, balance=1)
        if obstacle.is_stationary:
            velocity = safe_mul(1 - obs_mask, velocity)
        else:
            if obstacle.is_rotating:
                angular_velocity = resample(
                    AngularVelocity(location=obstacle.geometry.center, strength=obstacle.angular_velocity,
                                    falloff=None), to=velocity)
            else:
                angular_velocity = velocity * 0
            velocity = safe_mul(1 - obs_mask, velocity) + safe_mul(obs_mask, angular_velocity + obstacle.velocity)
    return velocity


def boundary_push(particles: Field, obstacles, separation: float = 0.5) -> Field:
    """Push particles out of obstacles / back into the domain
    (reference: fluid.py:243-262)."""
    pos = particles.geometry.center
    for obj in obstacles:
        geometry = obj.geometry if isinstance(obj, Obstacle) else obj
        assert isinstance(geometry, Geometry), f"expected Geometry, got {type(obj)}"
        pos = geometry.push(pos, shift_amount=separation)
    return particles.with_geometry(particles.geometry.at(pos))


def _pressure_extrapolation(vext: Extrapolation) -> Extrapolation:
    """Derive the pressure BC from the velocity BC (reference: fluid.py:264-276)."""
    if vext == extrapolation.PERIODIC:
        return extrapolation.PERIODIC
    elif vext == extrapolation.BOUNDARY:
        return extrapolation.ZERO
    elif isinstance(vext, ConstantExtrapolation):
        return extrapolation.BOUNDARY
    elif isinstance(vext, FieldEmbedding):
        return extrapolation.BOUNDARY
    return extrapolation.map(_pressure_extrapolation, vext)


def _accessible_extrapolation(vext: Extrapolation) -> Extrapolation:
    """Derive the accessible-cells BC from the velocity BC (reference: fluid.py:278-288)."""
    vext = extrapolation.get_normal(vext)
    if vext == extrapolation.PERIODIC:
        return extrapolation.PERIODIC
    elif vext == extrapolation.BOUNDARY:
        return extrapolation.ONE
    elif isinstance(vext, ConstantExtrapolation):
        return extrapolation.ZERO
    elif isinstance(vext, FieldEmbedding):
        return extrapolation.ONE
    return extrapolation.map(_accessible_extrapolation, vext)


def incompressible_rk4(pde: Callable, velocity: Field, pressure: Field, dt, pressure_order=4,
                       pressure_solve=Solve('CG'), **pde_aux_kwargs):
    """RK4 time integration with the pressure projection inside every stage
    (Kampanis-Ekaterinaris scheme; reference behavior: fluid.py:291-334).

    Each stage evaluates the PDE right-hand side minus the current pressure
    gradient, advances a trial velocity by the stage step, and re-projects it;
    the stage pressure accumulates the projection correction scaled by 1/step
    (the solve returns step·Δp)."""
    at = velocity.sampled_at

    def stage(stage_dt, rhs, p_prev):
        """Advance velocity by stage_dt·rhs, project, update the pressure."""
        trial = velocity + stage_dt * rhs
        projected, correction = make_incompressible(trial, solve=pressure_solve, order=pressure_order)
        return projected, p_prev + correction / stage_dt

    def momentum(v, p):
        return pde(v, **pde_aux_kwargs) - p.gradient(at=at, order=pressure_order)

    k1 = momentum(velocity, pressure)
    v_half, p_half = stage(dt / 2, k1, pressure)
    k2 = momentum(v_half, p_half)
    v_half2, p_half2 = stage(dt / 2, k2, p_half)
    k3 = momentum(v_half2, p_half2)
    v_full, p_full = stage(dt, k3, p_half2)
    k4 = momentum(v_full, p_full)
    # classical RK4 combination of the four slopes / stage pressures
    v_next, p_next = stage(dt, (k1 + 2 * k2 + 2 * k3 + k4) / 6,
                           (pressure + 2 * p_half + 2 * p_half2 + p_full) / 6)
    return v_next, p_next
