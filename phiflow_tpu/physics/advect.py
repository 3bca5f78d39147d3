"""Advection schemes (reference: /root/reference/phi/physics/advect.py, SURVEY.md §2.4).

Semi-Lagrangian and MacCormack lower to gather-interpolation (`math.grid_sample`),
the TPU hot path; `differential` provides the conservative −u·∇u forms for
higher-order/FVM solvers.

Integrators take the advected Field and return backtraced lookup *points*
(matching the reference's euler/rk4 at advect.py:20-47).
"""
from __future__ import annotations

from typing import Callable, Union

from ..math import Tensor, channel, dual, stack, unstack, wrap
from ..math import _ops as ops
from ..math import extrapolation as extrapolation_mod
from ..geom import Geometry, Point
from ..field import Field, PointCloud, spatial_gradient, sample, reduce_sample, resample
from ..field._resample import sample_grid_at_points

__all__ = ['euler', 'rk4', 'finite_rk4', 'advect', 'differential', 'finite_difference',
           'points', 'semi_lagrangian', 'mac_cormack', 'max_displacement_cells']


def _sample_velocity(velocity: Field, field: Field) -> Tensor:
    """Full velocity vector at the sample points of `field` (all components,
    even at staggered face points — reference: sample without dot_face_normal)."""
    return sample(velocity, field.geometry, at=field.sampled_at, boundary=field.boundary)


def euler(field: Field, velocity: Field, dt: float, v0: Tensor = None) -> Tensor:
    """1st-order lookup points (reference: advect.py:20)."""
    if v0 is None:
        v0 = _sample_velocity(velocity, field)
    return field.points + dt * v0


def rk4(field: Field, velocity: Field, dt: float, v0: Tensor = None) -> Tensor:
    """4th-order Runge-Kutta lookup points (reference: advect.py:27)."""
    if v0 is None:
        v0 = _sample_velocity(velocity, field)
    pts = field.points
    vel_half = sample(velocity, Point(pts + 0.5 * dt * v0))
    vel_half2 = sample(velocity, Point(pts + 0.5 * dt * vel_half))
    vel_full = sample(velocity, Point(pts + dt * vel_half2))
    vel_rk4 = (1 / 6.) * (v0 + 2 * (vel_half + vel_half2) + vel_full)
    return pts + dt * vel_rk4


def finite_rk4(field: Field, velocity: Field, dt: float, v0: Tensor = None) -> Tensor:
    """RK4 that treats NaN velocities as zero (FLIP; reference: advect.py:38)."""
    if v0 is None:
        v0 = _sample_velocity(velocity, field)
    v0 = ops.nan_to_0(v0)
    pts = field.points
    vel_half = ops.nan_to_0(sample(velocity, Point(pts + 0.5 * dt * v0)))
    vel_half2 = ops.nan_to_0(sample(velocity, Point(pts + 0.5 * dt * vel_half)))
    vel_full = ops.nan_to_0(sample(velocity, Point(pts + dt * vel_half2)))
    vel_rk4 = (1 / 6.) * (v0 + 2 * (vel_half + vel_half2) + vel_full)
    return pts + dt * vel_rk4


def advect(field: Field, velocity: Field, dt: Union[float, Tensor],
           integrator=euler, **kwargs) -> Field:
    """Dispatcher (reference: advect.py:50)."""
    if field.is_point_cloud:
        return points(field, velocity, dt=dt, integrator=integrator)
    if field.is_grid:
        return semi_lagrangian(field, velocity, dt=dt, integrator=integrator, **kwargs)
    raise NotImplementedError(f"advection of {field}")


def differential(u: Field, velocity: Field, density: float = 1., order=2, implicit=None, upwind=True) -> Field:
    """Discretized −u·∇u advection term for differential solvers
    (reference: advect.py:78)."""
    if u.is_grid and u.is_centered:
        grad = spatial_gradient(u, at='center', order=order, stack_dim=channel('_gradient'))
        vel_c = velocity.at(u, order=order, implicit=implicit) \
            if (velocity.geometry != u.geometry or velocity.is_staggered) else velocity
        comps = [vel_c.values[{'vector': d}] * grad.values[{'_gradient': i}]
                 for i, d in enumerate(u.resolution.names)]
        total = comps[0]
        for c in comps[1:]:
            total = total + c
        return Field(u.geometry, -total * density, u.boundary)
    if u.is_grid and u.is_staggered:
        comps = []
        for dim in u.resolution.names:
            comp = u.vector[dim]
            grad = spatial_gradient(comp, at='center', order=order, stack_dim=channel('_gradient'))
            vel_at = sample(velocity, comp.geometry, at='center', order=order, implicit=implicit)
            terms = [vel_at[{'vector': d}] * grad.values[{'_gradient': i}]
                     for i, d in enumerate(u.resolution.names)]
            total = terms[0]
            for t in terms[1:]:
                total = total + t
            comps.append(-total * density)
        values = stack(comps, dual(vector=u.resolution.names))
        return Field(u.geometry, values, u.boundary)
    if u.is_mesh:
        from ..field._mesh_math import mesh_advection_differential
        return mesh_advection_differential(u, velocity, density=density, order=order, upwind=upwind)
    raise NotImplementedError(type(u.geometry))


finite_difference = differential


def points(points_: Union[Field, Geometry, Tensor], velocity: Field, dt: float, integrator=euler):
    """Lagrangian particle advection (reference: advect.py:136)."""
    field = points_ if isinstance(points_, Field) else PointCloud(points_)
    lookup = integrator(field, velocity, dt)
    new_elements = field.geometry.at(lookup)
    result = field.with_geometry(new_elements)
    if isinstance(points_, Field):
        return result
    return result.geometry if isinstance(points_, Geometry) else result.center


def _displacement(field: Field, velocity: Field, dt, integrator, v0=None) -> Tensor:
    """Backtrace displacement (world units) at field's sample points.
    For the euler integrator this is just dt·v — computed WITHOUT materializing
    absolute sample positions (huge literals at 256³+). Other integrators derive
    it from the lookup points."""
    if v0 is None:
        v0 = _sample_velocity(velocity, field)
    if integrator is euler:
        return dt * v0
    lookup = integrator(field, velocity, dt, v0=v0)
    return lookup - field.points


def _euler_disp_natives(field: Field, velocity: Field, dt_signed):
    """Fast-path displacement builder for window advection with the euler
    integrator: per-axis raw jnp displacement arrays in CELL units at `field`'s
    sample points, with the dt/dx scaling FUSED into each resample expression.

    Skips the generic path's dual-vector Tensor stacking/slicing (several full
    HBM passes over the (d, X, Y, Z) stack per call at 256³+) by handing the
    window kernel one materialized array per axis — and the same-component
    case (v_x at x-faces) aliases the existing component array outright.

    Returns {t_dim: [disp_axis0, ...]} for staggered fields, [disp_axis0, ...]
    for centered fields, or None when the layout is unsupported (non-grid,
    mismatched bounds/resolution, extra batch dims — generic path applies).
    """
    from ..geom import UniformGrid
    import numpy as np
    if not (field.is_grid and velocity.is_grid and velocity.is_staggered):
        return None
    if not isinstance(field.geometry, UniformGrid) or not isinstance(velocity.geometry, UniformGrid):
        return None
    if field.geometry.bounds != velocity.geometry.bounds or field.resolution != velocity.resolution:
        return None
    names = field.resolution.names
    try:
        dx = np.asarray(field.dx.native(field.dx.shape.names), np.float64)
    except Exception:
        return None
    from ..field._resample import sample_grid_at_centers

    try:
        scales = tuple(float(dt_signed) / float(dx[i]) for i in range(len(names)))
    except Exception:
        return None  # traced dt → generic path

    def disp_at(comp_field, t_dim):
        target_grid = field.geometry if t_dim is None else comp_field.geometry
        if not isinstance(target_grid, UniformGrid):
            raise _FastPathUnsupported()
        out = []
        for s in names:
            if t_dim is not None and s == t_dim:
                vals = velocity.vector[s].values  # own faces: identity, zero-copy
            else:
                vals = sample_grid_at_centers(velocity.vector[s], target_grid)
            if set(vals.shape.names) != set(names):
                raise _FastPathUnsupported()
            # UNSCALED: dt/dx is applied in-register by the window kernel
            # (disp_scale), so identity components alias the velocity arrays
            # with no extra HBM pass. native(names) fixes the axis ORDER; the
            # transpose fuses into the pallas operand materialization.
            out.append(vals.native(names))
        return out

    try:
        if field.is_staggered:
            return {t: disp_at(field.vector[t], t) for t in names}, scales
        return disp_at(field, None), scales
    except Exception:
        return None


class _FastPathUnsupported(Exception):
    pass


def _window_interp_field_native(field: Field, disp_and_scale, max_cells: int,
                                extrema=False, negate=False):
    """Window-interpolate `field` at its own points displaced by the raw
    per-axis arrays from `_euler_disp_natives` (velocity units; the dt/dx
    cell-unit conversion is applied in-register by the kernel)."""
    from ..math._nd import shift_window_interp
    disp_map, scales = disp_and_scale
    if field.is_staggered:
        comps, los, ups = [], [], []
        for dim in field.resolution.names:
            comp = field.vector[dim]
            r = shift_window_interp(comp.values, disp_map[dim], comp.boundary, max_cells,
                                    compute_extrema=extrema, negate=negate, disp_scale=scales)
            if extrema:
                comps.append(r[0]); los.append(r[1]); ups.append(r[2])
            else:
                comps.append(r)
        values = stack(comps, dual(vector=field.resolution.names))
        if extrema:
            return values, stack(los, dual(vector=field.resolution.names)), stack(ups, dual(vector=field.resolution.names))
        return values
    return shift_window_interp(field.values, disp_map, field.boundary, max_cells,
                               compute_extrema=extrema, negate=negate, disp_scale=scales)


def _window_interp_field(field: Field, displacement: Tensor, max_cells: int, extrema=False):
    """Interpolate `field` at its own points displaced by `displacement` (world
    units) via bounded window shifts (TPU-native gather replacement, see
    math._nd.shift_window_interp). Returns values, or (values, lim_lo, lim_up)."""
    from ..math._nd import shift_window_interp
    if field.is_staggered:
        comps, los, ups = [], [], []
        for dim in field.resolution.names:
            comp = field.vector[dim]
            disp = (displacement[{'~vector': dim}] if '~vector' in displacement.shape else displacement) / field.dx
            r = shift_window_interp(comp.values, disp, comp.boundary, max_cells, compute_extrema=extrema)
            if extrema:
                comps.append(r[0]); los.append(r[1]); ups.append(r[2])
            else:
                comps.append(r)
        values = stack(comps, dual(vector=field.resolution.names))
        if extrema:
            return values, stack(los, dual(vector=field.resolution.names)), stack(ups, dual(vector=field.resolution.names))
        return values
    disp = displacement / field.dx
    return shift_window_interp(field.values, disp, field.boundary, max_cells, compute_extrema=extrema)


def _max_disp_cells(displacement: Tensor, field: Field):
    """Traced scalar (jnp, f32): max |displacement| in CELL units over every
    component and axis — safe to compute inside jit (unlike _warn_if_clamped)."""
    import functools
    import jax.numpy as jnp
    if field.is_staggered and '~vector' in displacement.shape:
        items = [displacement[{'~vector': d}] for d in field.resolution.names]
    else:
        items = [displacement]
    maxima = []
    for it in items:
        cells = it / field.dx  # per-axis cell units ('vector'-channel division)
        t = cells._contiguous() if hasattr(cells, '_contiguous') else cells
        natives = [c.native() for c in t.components] if hasattr(t, 'components') else [t.native()]
        for n in natives:
            maxima.append(jnp.max(jnp.abs(n)).astype(jnp.float32))
    return functools.reduce(jnp.maximum, maxima)


def max_displacement_cells(field: Field, velocity: Field, dt, integrator=euler):
    """In-graph CFL probe: the largest backtrace displacement (in cells) that
    `semi_lagrangian(field, velocity, dt)` would look up. Returns a traced jnp
    scalar, so it can certify inside jit that the bounded window interpolation
    (|disp| ≤ max_cells) is exact — bench.py records this for the headline run."""
    disp = _displacement(field, velocity, -dt, integrator)
    return _max_disp_cells(disp, field)


def _auto_substep_window(field: Field, disp: Tensor, max_cells: int, max_substeps: int,
                         apply_window):
    """Split a window-bounded advection into n = ceil(max|disp|/max_cells)
    substeps, decided IN-GRAPH (clamped to max_substeps), so the scheme stays
    exact at any CFL under jit.

    `disp` is the FULL-step displacement at field's sample points; the advecting
    velocity is frozen during the step, so each substep reuses disp/n — no
    re-sampling. The common n == 1 case runs through an outer cond that applies
    the already-computed displacement directly: its only overhead vs the plain
    path is one max-reduction. The substep path is a static-length scan with a
    cond-skipped body — reverse-mode differentiable.

    apply_window(field, displacement) -> values Tensor.
    """
    import jax
    import jax.numpy as jnp
    m = _max_disp_cells(disp, field)
    n = jnp.clip(jnp.ceil(m / max_cells), 1, max_substeps).astype(jnp.int32)

    def one(vals):
        return apply_window(field.with_values(vals), disp)

    def multi(vals):
        sub_disp = disp * (1.0 / n.astype(jnp.float32))

        def body(v, i):
            v2 = jax.lax.cond(i < n, lambda vv: apply_window(field.with_values(vv), sub_disp),
                              lambda vv: vv, v)
            return v2, None

        out, _ = jax.lax.scan(body, vals, jnp.arange(max_substeps))
        return out

    vals = jax.lax.cond(n <= 1, one, multi, field.values)
    return field.with_values(vals)


def _warn_if_clamped(displacement: Tensor, field: Field, max_cells: int, caller: str):
    """Eager-mode CFL guard: warn when the bounded window interpolation would
    clamp the backtrace (|disp| > max_cells·dx). Traced values are skipped —
    under jit the CFL ≤ max_cells contract is documented at the API level."""
    import jax
    try:
        parts = list(displacement.components) if hasattr(displacement, 'components') else [displacement]
        natives = [t.native() for t in parts]
    except Exception:
        return
    if any(isinstance(n, jax.core.Tracer) for n in natives):
        return
    import numpy as np
    import jax.numpy as jnp
    dx_min = float(np.min(np.asarray(field.dx.native(field.dx.shape.names))))
    # reduce ON DEVICE; only the scalar maxima cross the host boundary
    max_disp = max(float(jnp.max(jnp.abs(n))) for n in natives)
    if max_disp > max_cells * dx_min:
        import warnings
        warnings.warn(
            f"{caller}: backtrace displacement {max_disp:.3g} exceeds max_cells={max_cells} "
            f"× dx={dx_min:.3g}; the window interpolation clamps it (over-diffusive). "
            f"Raise max_cells, reduce dt, or pass max_cells=None for unbounded gather lookups.",
            RuntimeWarning)


def semi_lagrangian(field: Field, velocity: Field, dt: float, integrator=euler,
                    max_cells: int = 2, substeps=1, max_substeps: int = 4) -> Field:
    """Backtrace + interpolate (reference: advect.py:156).

    TPU note: with `max_cells=K` (default 2), the backtrace lookup uses bounded
    window-shift interpolation — exact whenever the CFL number ≤ K (displacements
    beyond K cells are clamped; eager mode warns when that happens). Pass
    max_cells=None for the reference's global gather semantics (slow on TPU,
    needed only for CFL > K), `substeps=n` to split the step into n
    semi-Lagrangian applications of dt/n each — keeps per-step displacements
    inside the window at high CFL while staying on the fast bounded kernel
    (slightly more diffusive than one exact large-CFL gather, far more accurate
    than clamping) — or `substeps='auto'` to pick n = ceil(max|disp|/K) IN-GRAPH
    (≤ `max_substeps`), which keeps the scheme exact at any CFL ≤ K·max_substeps
    under jit with no Python-side control flow."""
    if substeps == 'auto':
        assert field.is_grid and max_cells is not None, "substeps='auto' requires the bounded window path"
        disp = _displacement(field, velocity, -dt, integrator)
        return _auto_substep_window(field, disp, max_cells, max_substeps,
                                    lambda f, d: _window_interp_field(f, d, max_cells))
    if substeps > 1:
        for _ in range(substeps):
            field = semi_lagrangian(field, velocity, dt / substeps, integrator, max_cells)
        return field
    if field.is_grid and max_cells is not None:
        if integrator is euler:
            fast = _euler_disp_natives(field, velocity, -dt)
            if fast is not None:
                return field.with_values(_window_interp_field_native(field, fast, max_cells))
        disp = _displacement(field, velocity, -dt, integrator)
        _warn_if_clamped(disp, field, max_cells, 'semi_lagrangian')
        values = _window_interp_field(field, disp, max_cells)
        return field.with_values(values)
    lookup = integrator(field, velocity, -dt)
    interpolated = reduce_sample(field, lookup)
    return field.with_values(interpolated)


def _mac_cormack_window(field: Field, disp_bwd: Tensor, disp_fwd: Tensor,
                        correction_strength, max_cells: int) -> Tensor:
    """MacCormack fwd/bwd window passes + monotonicity clamp; returns values."""
    fwd_vals, lim_lo, lim_up = _window_interp_field(field, disp_bwd, max_cells, extrema=True)
    fwd_adv = field.with_values(fwd_vals)
    bwd_vals = _window_interp_field(fwd_adv, disp_fwd, max_cells)
    bwd_adv = fwd_adv.with_values(bwd_vals)
    new_field = fwd_adv + correction_strength * 0.5 * (field - bwd_adv)
    if field.is_staggered:
        comps = []
        for dim in field.resolution.names:
            comps.append(ops.clip(new_field.vector[dim].values,
                                  lim_lo[{'~vector': dim}], lim_up[{'~vector': dim}]))
        return stack(comps, dual(vector=field.resolution.names))
    return ops.clip(new_field.values, lim_lo, lim_up)


def mac_cormack(field: Field, velocity: Field, dt: float, correction_strength=1.0, integrator=euler,
                max_cells: int = 2, substeps=1, max_substeps: int = 4) -> Field:
    """MacCormack advection with monotonicity clamp (reference: advect.py:182-215).

    TPU note: `max_cells` as in `semi_lagrangian` — bounded window-shift
    interpolation with the 2^d-corner clamp fused into the same window pass.
    `substeps='auto'` splits the step in-graph when CFL > max_cells (see
    `semi_lagrangian`)."""
    if substeps == 'auto':
        assert field.is_grid and max_cells is not None, "substeps='auto' requires the bounded window path"
        disp_bwd = _displacement(field, velocity, -dt, euler)
        # euler: disp_fwd == −disp_bwd, and the frozen-velocity displacement
        # scales linearly with the substep length — reuse it for every substep
        return _auto_substep_window(field, disp_bwd, max_cells, max_substeps,
                                    lambda f, d: _mac_cormack_window(f, d, -d, correction_strength, max_cells))
    if substeps != 1:
        for _ in range(substeps):
            field = mac_cormack(field, velocity, dt / substeps, correction_strength, integrator, max_cells)
        return field
    if field.is_grid and max_cells is not None and integrator is euler:
        fast = _euler_disp_natives(field, velocity, -dt)  # backward displacement
        if fast is not None:
            # euler: forward displacement == −backward — reuse the SAME arrays
            # with the kernel's in-register negate instead of materializing −d
            fwd_vals, lim_lo, lim_up = _window_interp_field_native(field, fast, max_cells, extrema=True)
            fwd_adv = field.with_values(fwd_vals)
            bwd_vals = _window_interp_field_native(fwd_adv, fast, max_cells, negate=True)
            bwd_adv = fwd_adv.with_values(bwd_vals)
            new_field = fwd_adv + correction_strength * 0.5 * (field - bwd_adv)
            if field.is_staggered:
                comps = [ops.clip(new_field.vector[dim].values,
                                  lim_lo[{'~vector': dim}], lim_up[{'~vector': dim}])
                         for dim in field.resolution.names]
                return field.with_values(stack(comps, dual(vector=field.resolution.names)))
            return field.with_values(ops.clip(new_field.values, lim_lo, lim_up))
    v0 = _sample_velocity(velocity, field)
    if field.is_grid and max_cells is not None:
        disp_bwd = _displacement(field, velocity, -dt, integrator, v0=v0)
        disp_fwd = _displacement(field, velocity, dt, integrator, v0=v0)
        _warn_if_clamped(disp_bwd, field, max_cells, 'mac_cormack')
        return field.with_values(_mac_cormack_window(field, disp_bwd, disp_fwd, correction_strength, max_cells))
    points_bwd = integrator(field, velocity, -dt, v0=v0)
    points_fwd = integrator(field, velocity, dt, v0=v0)
    fwd_adv = field.with_values(reduce_sample(field, points_bwd))
    bwd_adv = fwd_adv.with_values(reduce_sample(fwd_adv, points_fwd))
    new_field = fwd_adv + correction_strength * 0.5 * (field - bwd_adv)
    # --- clamp to the 2^d neighborhood of the backward lookup (reference :210-215) ---
    closest_dims = [f"closest_{d}" for d in field.resolution.names]
    if field.is_staggered:
        comps = []
        for dim in field.resolution.names:
            comp = field.vector[dim]
            pts = points_bwd[{'~vector': dim}] if '~vector' in points_bwd.shape else points_bwd
            res = comp.values.shape.spatial
            local = comp.bounds.global_to_local(pts) * wrap(
                [float(s) for s in res.sizes], channel(vector=res.names)) - 0.5
            neighbors = ops.closest_grid_values(comp.values, local, comp.boundary, 'closest_')
            lim_lo = ops.min_(neighbors, closest_dims)
            lim_up = ops.max_(neighbors, closest_dims)
            comps.append(ops.clip(new_field.vector[dim].values, lim_lo, lim_up))
        values = stack(comps, dual(vector=field.resolution.names))
        return Field(field.geometry, values, field.boundary)
    limits = field.closest_values(points_bwd)
    lim_lo = ops.min_(limits, closest_dims)
    lim_up = ops.max_(limits, closest_dims)
    values_clamped = ops.clip(new_field.values, lim_lo, lim_up)
    return new_field.with_values(values_clamped)
