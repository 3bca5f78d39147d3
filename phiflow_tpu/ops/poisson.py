"""Fused masked-Poisson stencil kernels — the pressure-solve hot loop.

`make_incompressible`'s CG matvec is grad → mask → div (reference:
/root/reference/phi/physics/fluid.py:165-202). Composed from generic field ops
it costs ~10 HBM round-trips per application (pad/concat chains with unaligned
N±1 sizes). This module computes the same linear operator as ONE fused stencil:

    lap(c) = Σ_d inv_dx²_d · [ a⁺_d(c)·p(c+e_d) + a⁻_d(c)·p(c−e_d) ] + c0(c)·p(c)
    out(c) = active(c) ? lap(c) : p(c)

with per-axis/per-side boundary modes derived from the velocity/pressure
extrapolations:

  * ``periodic`` — neighbor wraps around.
  * ``neumann``  — outer face flux dropped (closed wall, or zero-gradient
    pressure pad): no ghost contribution.
  * ``ghost0``   — outer face kept with ghost cell value 0 (open boundary:
    pressure ConstantExtrapolation pads the ghost with the constant, which is 0
    for the linearized operator).

Obstacle face masks (``hard_bcs``) enter as per-axis full-face mask arrays and
are staged ONCE per solve into cell-aligned ``mA`` arrays plus a combined
center-coefficient array ``c0`` — the per-iteration kernel then reads only
aligned, loop-invariant arrays.

Three epilogues share the stencil: ``matvec`` (out = A·p), ``residual``
(out = b − A·p), ``jacobi`` (out = p + ω/diag·(b − A·p)) — the latter two are
the multigrid V-cycle's inner loop.

The Pallas TPU kernel tiles the leading (x) spatial axis with a 1-cell halo
(DMA'd from HBM per tile) and performs y/z neighbor shifts as in-register
`pltpu.roll` rotates — wrap-around values are annihilated by the zero boundary
coefficients, so no y/z halo staging is needed. The XLA path (used on CPU and
as the correctness oracle) expresses the same math with `jnp.roll`.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
try:
    from jax.experimental.pallas import tpu as pltpu
    _TPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _TPU = False

__all__ = ['poisson_apply', 'poisson_smooth', 'stage_masks', 'pallas_ok']

PERIODIC, NEUMANN, GHOST0 = 'periodic', 'neumann', 'ghost0'


def pallas_ok() -> bool:
    try:
        return _TPU and jax.default_backend() not in ('cpu',)
    except Exception:
        return False


# ---------------------------------------------------------------------------
# staging: face masks → cell-aligned coefficient arrays (once per solve)
# ---------------------------------------------------------------------------

def stage_masks(full_face_masks: Sequence[jnp.ndarray], bc: Sequence[Tuple[str, str]],
                inv_dx2: Sequence[float]):
    """Stage per-axis FULL-face mask arrays into (mA_list, c0).

    full_face_masks[d]: mask of every face along axis d — shape equals the cell
    grid except axis d has N+1 entries (N for periodic, where face N ≡ face 0).
    Arrays are broadcast-compatible with the cell grid on other axes.

    Returns:
      mA[d]: per-cell lower-face coefficient a⁻/inv (plane 0 zeroed unless
             periodic) — the kernel derives a⁺ as roll(mA, -1, d).
      c0:    full center-coefficient array −Σ_d inv_d·(cA_d + cB_d) including
             ghost0 outer-face corrections.
    """
    ndim = len(bc)
    mA_list = []
    c0 = None
    for d, (F, (lo, hi), inv) in enumerate(zip(full_face_masks, bc, inv_dx2)):
        ax = F.ndim - ndim + d
        n_faces = F.shape[ax]
        if (lo, hi) == (PERIODIC, PERIODIC):
            N = n_faces
            mA = F
            cA = F
            cB = jnp.roll(F, -1, ax)
        else:
            N = n_faces - 1
            face_lo = jax.lax.slice_in_dim(F, 0, 1, axis=ax)
            face_hi = jax.lax.slice_in_dim(F, N, N + 1, axis=ax)
            inner = jax.lax.slice_in_dim(F, 0, N, axis=ax)       # faces 0..N-1, per cell c → face c
            upper = jax.lax.slice_in_dim(F, 1, N + 1, axis=ax)   # faces 1..N,   per cell c → face c+1
            zero_plane = jnp.zeros_like(face_lo)
            # a⁻ per cell: face c, but outer face 0 belongs to c0 (ghost), not a⁻
            mA = jnp.concatenate([zero_plane, jax.lax.slice_in_dim(inner, 1, N, axis=ax)], axis=ax)
            cA = jnp.concatenate([face_lo if lo == GHOST0 else zero_plane,
                                  jax.lax.slice_in_dim(inner, 1, N, axis=ax)], axis=ax)
            cB = jnp.concatenate([jax.lax.slice_in_dim(upper, 0, N - 1, axis=ax),
                                  face_hi if hi == GHOST0 else zero_plane], axis=ax)
        mA_list.append(mA * np.float32(1.0))
        term = (cA + cB) * np.float32(inv)
        c0 = term if c0 is None else c0 + term
    return mA_list, -c0


# ---------------------------------------------------------------------------
# XLA path (all backends; correctness oracle)
# ---------------------------------------------------------------------------

def _axis_plane(shape, ax, idx):
    """Boolean array selecting plane `idx` along axis `ax` (broadcastable)."""
    n = shape[ax]
    sel = jnp.arange(n) == (idx % n)
    return sel.reshape((n,) + (1,) * (len(shape) - ax - 1))


def _unmasked_coeffs_1d(n, lo, hi, dtype):
    """(a⁻, a⁺, c0) 1-axis profiles (length n) for the unmasked operator, /inv."""
    am = np.ones(n, np.float64)
    ap = np.ones(n, np.float64)
    c0 = np.full(n, -2.0, np.float64)
    if lo != PERIODIC:
        am[0] = 0.0
        c0[0] = -(1.0 + (1.0 if lo == GHOST0 else 0.0))
    if hi != PERIODIC:
        ap[n - 1] = 0.0
        c0[n - 1] = -(1.0 + (1.0 if hi == GHOST0 else 0.0))
    return am.astype(dtype), ap.astype(dtype), c0.astype(dtype)


def _lap_xla(p, inv_dx2, bc, mA_list, c0):
    """A·p via jnp.roll; p: (..., *spatial) with len(bc) trailing spatial axes."""
    ndim = len(bc)
    lap = None
    c0_eff = c0
    for d, ((lo, hi), inv) in enumerate(zip(bc, inv_dx2)):
        ax = p.ndim - ndim + d
        pm = jnp.roll(p, 1, ax)
        pp = jnp.roll(p, -1, ax)
        if mA_list is not None:
            mA = mA_list[d]
            max_ = mA.ndim - ndim + d
            term = mA * pm + jnp.roll(mA, -1, max_) * pp
        else:
            am, ap, c0d = _unmasked_coeffs_1d(p.shape[ax], lo, hi, p.dtype)
            prof_shape = (p.shape[ax],) + (1,) * (ndim - d - 1)
            term = am.reshape(prof_shape) * pm + ap.reshape(prof_shape) * pp
            c0_term = (c0d * np.float32(inv)).reshape(prof_shape)
            c0_eff = c0_term if c0_eff is None else c0_eff + c0_term
        term = term * np.float32(inv)
        lap = term if lap is None else lap + term
    return lap + c0_eff * p


def _apply_xla(p, inv_dx2, bc, mA_list, c0, active, b, mode, omega_over_diag):
    lap = _lap_xla(p, inv_dx2, bc, mA_list, c0)
    if mode == 'matvec':
        out = lap
    elif mode == 'residual':
        out = b - lap
    elif mode == 'jacobi':
        out = p + omega_over_diag * (b - lap)
    else:
        raise ValueError(mode)
    if active is not None:
        out = jnp.where(active != 0, out, p)
    return out


# ---------------------------------------------------------------------------
# Pallas TPU kernel (3D)
# ---------------------------------------------------------------------------

def _pick_tile(X, n_blocked, plane_elems, budget_bytes=11 * 1024 * 1024):
    """Largest tile T dividing X whose double-buffered blocked inputs + output
    fit the 16MB VMEM budget (with margin for roll temporaries)."""
    best = 1
    for t in range(1, X + 1):
        if X % t:
            continue
        elems = 2 * (n_blocked + 1) * t * plane_elems  # double-buffered in + out
        if elems * 4 <= budget_bytes:
            best = t
    return best


def _apply_pallas_3d(p, inv_dx2, bc, mA_list, c0, active, b, mode, omega_over_diag,
                     interpret=False):
    """p: (X, Y, Z) float32. Returns same shape. See module docstring.

    Layout: the x axis is tiled; every input uses a regular blocked VMEM spec so
    Pallas double-buffers the HBM→VMEM pipeline automatically. The x-halo is
    fetched as two single-row blocks of the SAME array via index maps addressing
    rows i·T−1 and i·T+T (block shape (1, Y, Z) makes block units = element
    rows) — no pre-staging pass, no extra HBM traffic beyond 2 rows per tile.
    y/z neighbor shifts are in-register rotates whose wrap-around values are
    annihilated by the zero boundary coefficients; x wrap (periodic) is handled
    by taking the halo row indices modulo X.
    """
    X, Y, Z = p.shape
    masked = mA_list is not None
    x_per = bc[0] == (PERIODIC, PERIODIC)
    blocked = [p]        # (X, Y, Z) arrays, block (T, Y, Z)
    if masked:
        mx, my, mz = (m.astype(jnp.float32) for m in mA_list)
        blocked += [mx, my, mz, c0.astype(jnp.float32)]
    if active is not None:
        blocked.append(active.astype(jnp.float32))
    if mode in ('residual', 'jacobi'):
        blocked.append(b)
    TILE = _pick_tile(X, len(blocked), Y * Z)
    grid = (X // TILE,)
    n_b = len(blocked)
    inv_x, inv_y, inv_z = (np.float32(v) for v in inv_dx2)
    w_over_diag = None if omega_over_diag is None else np.float32(omega_over_diag)

    if _TPU and not interpret:
        def roll(a, shift, axis):
            return pltpu.roll(a, shift % a.shape[axis], axis)
    else:
        def roll(a, shift, axis):
            return jnp.roll(a, shift, axis)

    def kernel(*refs):
        p_ref = refs[0]
        lo_ref, hi_ref = refs[n_b], refs[n_b + 1]
        out_ref = refs[-1]
        pc = p_ref[:]
        if TILE > 1:
            pxm = jnp.concatenate([lo_ref[:], pc[:TILE - 1]], axis=0)
            pxp = jnp.concatenate([pc[1:], hi_ref[:]], axis=0)
        else:
            pxm = lo_ref[:]
            pxp = hi_ref[:]
        pym = roll(pc, 1, 1)
        pyp = roll(pc, -1, 1)
        pzm = roll(pc, 1, 2)
        pzp = roll(pc, -1, 2)
        k = 1
        if masked:
            mx_t = refs[k][:]; my_t = refs[k + 1][:]; mz_t = refs[k + 2][:]; c0_t = refs[k + 3][:]
            k += 4
            mxhi_ref = refs[n_b + 2]
            axp = jnp.concatenate([mx_t[1:], mxhi_ref[:]], axis=0) if TILE > 1 else mxhi_ref[:]
            if not x_per:
                # global last row: no upper x-neighbor — the clamped halo row
                # (mA_x(X−1)) must not leak in; a⁺_x(X−1) is 0 by definition.
                gx_m = pl.program_id(0) * TILE + jax.lax.broadcasted_iota(jnp.int32, (TILE, Y, Z), 0)
                axp = jnp.where(gx_m == X - 1, jnp.float32(0.), axp)
            ayp = roll(my_t, -1, 1)
            azp = roll(mz_t, -1, 2)
            lap = inv_x * (mx_t * pxm + axp * pxp) \
                + inv_y * (my_t * pym + ayp * pyp) \
                + inv_z * (mz_t * pzm + azp * pzp) + c0_t * pc
        else:
            # BROADCASTABLE 1-D profiles — (T,1,1)/(1,Y,1)/(1,1,Z) shaped, so the
            # wheres run on rows/planes and the FMAs broadcast in-register. The
            # earlier full (TILE,Y,Z) iota/where materialization tripled the
            # kernel's VMEM traffic (measured 2.96 ms → this form ~matches the
            # fused-Jacobi kernel's per-sweep cost).
            one = jnp.float32(1.)
            zero = jnp.float32(0.)

            def prof(g, n, lo_mode, hi_mode):
                if (lo_mode, hi_mode) == (PERIODIC, PERIODIC):
                    return one, one, jnp.float32(-2.)
                am = jnp.where(g > 0, one, one if lo_mode == PERIODIC else zero)
                ap = jnp.where(g < n - 1, one, one if hi_mode == PERIODIC else zero)
                c0d = jnp.full_like(am, -2.)
                if lo_mode != PERIODIC:
                    c0d = jnp.where(g == 0, np.float32(-(1. + (1. if lo_mode == GHOST0 else 0.))), c0d)
                if hi_mode != PERIODIC:
                    c0d = jnp.where(g == n - 1, np.float32(-(1. + (1. if hi_mode == GHOST0 else 0.))), c0d)
                return am, ap, c0d
            gx = pl.program_id(0) * TILE + jax.lax.broadcasted_iota(jnp.int32, (TILE, 1, 1), 0)
            axm, axp, c0x = prof(gx, X, *bc[0])
            aym, ayp, c0y = prof(jax.lax.broadcasted_iota(jnp.int32, (1, Y, 1), 1), Y, *bc[1])
            azm, azp, c0z = prof(jax.lax.broadcasted_iota(jnp.int32, (1, 1, Z), 2), Z, *bc[2])
            lap = inv_x * (axm * pxm + axp * pxp + c0x * pc) \
                + inv_y * (aym * pym + ayp * pyp + c0y * pc) \
                + inv_z * (azm * pzm + azp * pzp + c0z * pc)
        act_t = None
        if active is not None:
            act_t = refs[k][:]
            k += 1
        if mode == 'matvec':
            out = lap
        elif mode == 'residual':
            out = refs[k][:] - lap
        else:  # jacobi
            out = pc + w_over_diag * (refs[k][:] - lap)
        if act_t is not None:
            out = jnp.where(act_t != 0, out, pc)
        out_ref[:] = out

    kwargs = {'memory_space': pltpu.VMEM} if _TPU and not interpret else {}
    tile_spec = pl.BlockSpec((TILE, Y, Z), lambda i: (i, 0, 0), **kwargs)
    # halo rows as 1-row blocks of the same arrays: block units == element rows
    n_tiles = X // TILE
    if x_per:
        lo_spec = pl.BlockSpec((1, Y, Z), lambda i: ((i * TILE - 1) % X, 0, 0), **kwargs)
        hi_spec = pl.BlockSpec((1, Y, Z), lambda i: ((i * TILE + TILE) % X, 0, 0), **kwargs)
    else:
        lo_spec = pl.BlockSpec((1, Y, Z), lambda i: (jnp.maximum(i * TILE - 1, 0), 0, 0), **kwargs)
        hi_spec = pl.BlockSpec((1, Y, Z), lambda i: (jnp.minimum(i * TILE + TILE, X - 1), 0, 0), **kwargs)
    extra = [p, p]
    in_specs = [tile_spec] * n_b + [lo_spec, hi_spec]
    if masked:
        extra.append(mA_list[0].astype(jnp.float32))
        in_specs.append(hi_spec)  # mA_x(i·T+T); clamped row is annihilated by zero coeff... see below
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((X, Y, Z), jnp.float32),
        interpret=interpret,
    )(*(blocked + extra))


# ---------------------------------------------------------------------------
# fused two-sweep Jacobi (unmasked) — the V-cycle smoothing hot loop
# ---------------------------------------------------------------------------

def _divisor_tile(X, plane_elems, rows_coef, rows_const, budget_bytes=14 * 1024 * 1024):
    """Largest tile T dividing X with (rows_coef·T + rows_const) VMEM rows in
    budget; 0 if even T=1 does not fit (caller falls back to single sweeps)."""
    best = 0
    for t in range(1, X + 1):
        if X % t:
            continue
        if (rows_coef * t + rows_const) * plane_elems * 4 <= budget_bytes:
            best = t
    return best


def _jacobi2_pallas_3d(p, b, inv_dx2, bc, w, zero_init, interpret=False):
    """TWO fused damped-Jacobi sweeps (three with ``zero_init``) in ONE HBM pass.

    Sweep 1 is computed on an x-extended (T+2)-row block (x-halo of 2 fetched as
    four single-row BlockSpecs of the same array); sweep 2 then only needs the
    sweep-1 halo already in VMEM. With ``zero_init`` the initial iterate u₀ = w·b
    is formed in-register from the b halo, so pre-smoothing with ν=3 costs a
    single read of b. y/z neighbor shifts are in-register rolls whose wrap-around
    is annihilated by the zero boundary coefficients (exact for periodic).
    Sweep-1 values on domain-ghost rows are garbage but carry zero coefficient
    into sweep 2. Unmasked operator only (the MG preconditioner's case).

    Returns None if no tile fits VMEM (caller falls back).
    """
    X, Y, Z = b.shape
    rows_coef, rows_const = (7, 24) if zero_init else (10, 28)
    T = _divisor_tile(X, Y * Z, rows_coef, rows_const)
    if T == 0:
        return None
    grid = (X // T,)
    inv_x, inv_y, inv_z = (np.float32(v) for v in inv_dx2)
    w = np.float32(w)
    x_per = bc[0] == (PERIODIC, PERIODIC)

    if _TPU and not interpret:
        def roll(a, shift, axis):
            return pltpu.roll(a, shift % a.shape[axis], axis)
    else:
        def roll(a, shift, axis):
            return jnp.roll(a, shift, axis)

    def prof(g, n, lo_mode, hi_mode):
        """(a⁻, a⁺, c0) broadcastable profiles for one axis at global indices g."""
        if (lo_mode, hi_mode) == (PERIODIC, PERIODIC):
            return np.float32(1.), np.float32(1.), np.float32(-2.)
        one, zero = jnp.float32(1.), jnp.float32(0.)
        am = jnp.where(g > 0, one, one if lo_mode == PERIODIC else zero)
        ap = jnp.where(g < n - 1, one, one if hi_mode == PERIODIC else zero)
        c0d = jnp.full_like(am, -2.)
        if lo_mode != PERIODIC:
            c0d = jnp.where(g == 0, np.float32(-(1. + (1. if lo_mode == GHOST0 else 0.))), c0d)
        if hi_mode != PERIODIC:
            c0d = jnp.where(g == n - 1, np.float32(-(1. + (1. if hi_mode == GHOST0 else 0.))), c0d)
        return am, ap, c0d

    def kernel(*refs):
        out_ref = refs[-1]
        if zero_init:
            b_ref, blo2, blo1, bhi1, bhi2 = refs[:5]
            b_t = b_ref[:]
            b_ext2 = jnp.concatenate([blo2[:], blo1[:], b_t, bhi1[:], bhi2[:]], axis=0)
            u_ext2 = w * b_ext2                       # u₀ = w·b (zero-start sweep)
            b_ext = b_ext2[1:T + 3]
        else:
            p_ref, b_ref, plo2, plo1, phi1, phi2, blo1, bhi1 = refs[:8]
            b_t = b_ref[:]
            u_ext2 = jnp.concatenate([plo2[:], plo1[:], p_ref[:], phi1[:], phi2[:]], axis=0)
            b_ext = jnp.concatenate([blo1[:], b_t, bhi1[:]], axis=0)
        R = T + 2
        gx_e = (pl.program_id(0) * T - 1) + jax.lax.broadcasted_iota(jnp.int32, (R, 1, 1), 0)
        amx, apx, c0x = prof(gx_e, X, *bc[0])
        amy, apy, c0y = prof(jax.lax.broadcasted_iota(jnp.int32, (1, Y, 1), 1), Y, *bc[1])
        amz, apz, c0z = prof(jax.lax.broadcasted_iota(jnp.int32, (1, 1, Z), 2), Z, *bc[2])
        uc = u_ext2[1:T + 3]
        lap = inv_x * (amx * u_ext2[0:T + 2] + apx * u_ext2[2:T + 4] + c0x * uc) \
            + inv_y * (amy * roll(uc, 1, 1) + apy * roll(uc, -1, 1) + c0y * uc) \
            + inv_z * (amz * roll(uc, 1, 2) + apz * roll(uc, -1, 2) + c0z * uc)
        u1 = uc + w * (b_ext - lap)
        u1c = u1[1:T + 1]
        if isinstance(amx, jnp.ndarray):
            amx, apx, c0x = amx[1:T + 1], apx[1:T + 1], c0x[1:T + 1]
        lap2 = inv_x * (amx * u1[0:T] + apx * u1[2:T + 2] + c0x * u1c) \
            + inv_y * (amy * roll(u1c, 1, 1) + apy * roll(u1c, -1, 1) + c0y * u1c) \
            + inv_z * (amz * roll(u1c, 1, 2) + apz * roll(u1c, -1, 2) + c0z * u1c)
        out_ref[:] = u1c + w * (b_t - lap2)

    kwargs = {'memory_space': pltpu.VMEM} if _TPU and not interpret else {}
    tile_spec = pl.BlockSpec((T, Y, Z), lambda i: (i, 0, 0), **kwargs)

    def row_spec(offset):
        if x_per:
            return pl.BlockSpec((1, Y, Z), lambda i, o=offset: ((i * T + o) % X, 0, 0), **kwargs)
        return pl.BlockSpec((1, Y, Z),
                            lambda i, o=offset: (jnp.clip(i * T + o, 0, X - 1), 0, 0), **kwargs)

    halo = [row_spec(-2), row_spec(-1), row_spec(T), row_spec(T + 1)]
    if zero_init:
        inputs = [b, b, b, b, b]
        in_specs = [tile_spec] + halo
    else:
        inputs = [p, b, p, p, p, p, b, b]
        in_specs = [tile_spec, tile_spec] + halo + [row_spec(-1), row_spec(T)]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((X, Y, Z), jnp.float32),
        interpret=interpret,
    )(*inputs)


def poisson_smooth(u: Optional[jnp.ndarray], b: jnp.ndarray,
                   inv_dx2: Sequence[float], bc: Sequence[Tuple[str, str]],
                   omega_over_diag: float, sweeps: int, zero_init: bool = False,
                   fuse_pairs: bool = False,
                   use_pallas: Optional[bool] = None, interpret: bool = False) -> jnp.ndarray:
    """``sweeps`` damped-Jacobi sweeps of the unmasked Poisson operator.
    ``zero_init`` starts from u = 0 (u may be None); when VMEM permits, the
    zero-start triple u₀ = w·b → J → J fuses into ONE Pallas pass reading only
    b (`_jacobi2_pallas_3d`) — a measured win (2.3→1.7ms at 256³ pre-smooth).
    ``fuse_pairs`` additionally fuses remaining sweep PAIRS; measured NEUTRAL
    to slightly slower inside large jits (the 2-row tiles the pair kernel
    needs at ≥256² planes amplify halo traffic), so off by default.
    Semantics match looping `poisson_apply(mode='jacobi')` exactly (same
    scalar ω/diag)."""
    w = omega_over_diag
    ndim = len(bc)
    if use_pallas is None:
        use_pallas = pallas_ok() or interpret
    fused_ok = (use_pallas and ndim == 3 and b.dtype == jnp.float32
                and min(b.shape[-3:]) >= 8 and b.shape[-1] % 128 == 0
                and b.shape[-2] % 8 == 0)

    def batched(fn, *arrays):
        spatial_shape = b.shape[-3:]
        flat = [a.reshape((-1,) + spatial_shape) for a in arrays]
        if flat[0].shape[0] > 1:
            out = jax.lax.map(lambda xs: fn(*xs), tuple(flat))
        else:
            out = fn(*(a.reshape(spatial_shape) for a in flat))
        return out.reshape(b.shape)

    remaining = sweeps
    if zero_init:
        if fused_ok and remaining >= 3 and _divisor_tile(b.shape[-3], b.shape[-1] * b.shape[-2], 7, 24):
            u = batched(lambda bb: _jacobi2_pallas_3d(None, bb, inv_dx2, bc, w, True,
                                                      interpret=interpret), b)
            remaining -= 3
        else:
            u = np.float32(w) * b if b.dtype == jnp.float32 else w * b
            remaining -= 1
    can_pair = fuse_pairs and fused_ok and _divisor_tile(b.shape[-3], b.shape[-1] * b.shape[-2], 10, 28)
    while remaining >= 2 and can_pair:
        u = batched(lambda uu, bb: _jacobi2_pallas_3d(uu, bb, inv_dx2, bc, w, False,
                                                      interpret=interpret), u, b)
        remaining -= 2
    for _ in range(remaining):
        u = poisson_apply(u, inv_dx2, bc, b=b, mode='jacobi', omega_over_diag=w,
                          use_pallas=use_pallas, interpret=interpret)
    return u


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def poisson_apply(p: jnp.ndarray, inv_dx2: Sequence[float], bc: Sequence[Tuple[str, str]],
                  mA_list: Optional[Sequence[jnp.ndarray]] = None,
                  c0: Optional[jnp.ndarray] = None,
                  active: Optional[jnp.ndarray] = None,
                  b: Optional[jnp.ndarray] = None,
                  mode: str = 'matvec',
                  omega_over_diag: Optional[float] = None,
                  use_pallas: Optional[bool] = None,
                  interpret: bool = False) -> jnp.ndarray:
    """Apply the (masked) Poisson stencil. p: (*batch, *spatial) with len(bc)
    trailing spatial axes. mA_list/c0 from `stage_masks` (None = unmasked).
    modes: 'matvec' → A·p | 'residual' → b − A·p | 'jacobi' → p + ω/diag·(b − A·p).
    """
    ndim = len(bc)
    if use_pallas is None:
        use_pallas = pallas_ok() or interpret

    def _no_lead(a):
        return a is None or all(s == 1 for s in a.shape[:-ndim])

    if use_pallas and ndim == 3 and p.dtype == jnp.float32 and min(p.shape[-3:]) >= 8 \
            and p.shape[-1] % 128 == 0 and p.shape[-2] % 8 == 0 \
            and all(_no_lead(a) for a in [c0, active] + list(mA_list or [])):
        spatial_shape = p.shape[-3:]
        p3 = p.reshape((-1,) + spatial_shape)
        m_list3 = [m.reshape(m.shape[-3:]) for m in mA_list] if mA_list is not None else None
        c03 = c0.reshape(c0.shape[-3:]) if c0 is not None else None
        act3 = active.reshape(active.shape[-3:]) if active is not None else None

        def one(args):
            pp, bb = args
            return _apply_pallas_3d(pp, inv_dx2, bc, m_list3, c03, act3,
                                    bb if mode in ('residual', 'jacobi') else None,
                                    mode, omega_over_diag, interpret=interpret)
        if p3.shape[0] > 1:
            b3 = b.reshape((-1,) + spatial_shape) if b is not None else jnp.zeros_like(p3)
            out = jax.lax.map(one, (p3, b3))
        else:
            b1 = b.reshape(spatial_shape) if b is not None else None
            out = one((p3.reshape(spatial_shape), b1))
        return out.reshape(p.shape)
    return _apply_xla(p, inv_dx2, bc, mA_list, c0, active, b, mode, omega_over_diag)
