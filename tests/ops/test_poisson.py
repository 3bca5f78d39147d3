"""Fused Poisson stencil (ops.poisson) vs the generic grad→mask→div field
composition — the correctness oracle for the pressure-CG matvec fast path
(reference operator: /root/reference/phi/physics/fluid.py:165-202)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from phiflow_tpu.math import extrapolation, wrap, batch, expand
from phiflow_tpu.geom import Box, Sphere, union
from phiflow_tpu.field import CenteredGrid, StaggeredGrid, Field, stagger as field_stagger
from phiflow_tpu.physics import fluid
from phiflow_tpu.math import _ops as ops
from phiflow_tpu.ops import poisson


def _rand_pressure(boundary, dims=2, n=16, b=None):
    rng = np.random.RandomState(0)
    sizes = {name: n for name in ['x', 'y', 'z'][:dims]}
    g = CenteredGrid(0., boundary, bounds=Box(**{k: float(n) for k in sizes}), **sizes)
    vals = rng.randn(*([b] if b else []), *[n] * dims).astype(np.float32)
    shape = g.values.shape if not b else batch(b=b) & g.values.shape
    from phiflow_tpu.math import Tensor
    return g.with_values(Tensor(jnp.asarray(vals), shape))


def _compare(pressure, v_boundary, hard_bcs=None, active=None, tol=1e-5):
    args = (pressure, v_boundary, hard_bcs, active)
    fluid.FUSED_POISSON = False
    try:
        ref = fluid.masked_laplace.f(*args)
    finally:
        fluid.FUSED_POISSON = True
    fast = fluid._fused_masked_laplace(*args)
    assert fast is not None, "fast path did not engage"
    r = np.asarray(ref.values.native(ref.values.shape.names))
    f = np.asarray(fast.values.native(ref.values.shape.names))
    np.testing.assert_allclose(f, r, atol=tol, rtol=tol)


BOUNDARIES = [
    ('periodic', extrapolation.PERIODIC, extrapolation.PERIODIC),
    ('closed', extrapolation.ZERO, extrapolation.BOUNDARY),
    ('open', extrapolation.BOUNDARY, extrapolation.ZERO),
]


@pytest.mark.parametrize('name,v_ext,p_ext', BOUNDARIES)
@pytest.mark.parametrize('dims', [2, 3])
def test_fused_matches_generic_unmasked(name, v_ext, p_ext, dims):
    p = _rand_pressure(p_ext, dims=dims)
    _compare(p, v_ext)


def test_fused_matches_generic_mixed_bc():
    """Different BCs per axis/side: x periodic is not allowed mixed, so use
    closed-x, open-y."""
    v_ext = extrapolation.combine_sides(x=extrapolation.ZERO, y=extrapolation.BOUNDARY)
    p_ext = extrapolation.combine_sides(x=extrapolation.BOUNDARY, y=extrapolation.ZERO)
    p = _rand_pressure(p_ext, dims=2)
    _compare(p, v_ext)


@pytest.mark.parametrize('v_ext,p_ext', [(extrapolation.ZERO, extrapolation.BOUNDARY),
                                         (extrapolation.PERIODIC, extrapolation.PERIODIC)])
def test_fused_matches_generic_masked(v_ext, p_ext):
    """Obstacle masks: hard_bcs from a sphere, active from accessible cells."""
    n = 16
    p = _rand_pressure(p_ext, dims=2, n=n)
    velocity = StaggeredGrid(0., v_ext, bounds=p.bounds, x=n, y=n)
    geo = ~union([Sphere(x=8, y=8, radius=3)])
    accessible = Field(velocity.geometry, geo, fluid._accessible_extrapolation(v_ext))
    hard_bcs = field_stagger(accessible, ops.minimum, v_ext, at='face', dims=('x', 'y'))
    active = accessible.with_boundary(extrapolation.NONE)
    _compare(p, v_ext, hard_bcs, active)


def test_fused_matches_generic_batched():
    p = _rand_pressure(extrapolation.BOUNDARY, dims=2, b=3)
    _compare(p, extrapolation.ZERO)


def test_fused_3d_masked():
    n = 16
    v_ext = extrapolation.ZERO
    p = _rand_pressure(extrapolation.BOUNDARY, dims=3, n=n)
    velocity = StaggeredGrid(0., v_ext, bounds=p.bounds, x=n, y=n, z=n)
    geo = ~union([Sphere(x=8, y=8, z=8, radius=3)])
    accessible = Field(velocity.geometry, geo, fluid._accessible_extrapolation(v_ext))
    hard_bcs = field_stagger(accessible, ops.minimum, v_ext, at='face', dims=('x', 'y', 'z'))
    active = accessible.with_boundary(extrapolation.NONE)
    _compare(p, v_ext, hard_bcs, active)


# ---------------------------------------------------------------------------
# Pallas kernel vs XLA path (interpret mode — runs on CPU)
# ---------------------------------------------------------------------------

def _random_case(masked, active_on, mode, bc):
    rng = np.random.RandomState(7)
    X, Y, Z = 16, 16, 128
    p = jnp.asarray(rng.randn(X, Y, Z).astype(np.float32))
    inv_dx2 = (1.0, 0.25, 4.0)
    mA_list = c0 = act = b = None
    if masked:
        masks = []
        for d, n_cells in enumerate((X, Y, Z)):
            shape = [X, Y, Z]
            shape[d] += 0 if bc[d] == ('periodic', 'periodic') else 1
            masks.append(jnp.asarray((rng.rand(*shape) > 0.2).astype(np.float32)))
        mA_list, c0 = poisson.stage_masks(masks, bc, inv_dx2)
    if active_on:
        act = jnp.asarray((rng.rand(X, Y, Z) > 0.1).astype(np.float32))
    if mode in ('residual', 'jacobi'):
        b = jnp.asarray(rng.randn(X, Y, Z).astype(np.float32))
    w = 0.8 / (-2 * sum(inv_dx2)) if mode == 'jacobi' else None
    return p, inv_dx2, mA_list, c0, act, b, w


@pytest.mark.parametrize('masked', [False, True])
@pytest.mark.parametrize('mode', ['matvec', 'residual', 'jacobi'])
@pytest.mark.parametrize('bc0', ['periodic', 'neumann', 'ghost0'])
def test_pallas_matches_xla(masked, mode, bc0):
    bc = ((bc0, bc0), ('neumann', 'ghost0'), ('periodic', 'periodic'))
    p, inv_dx2, mA_list, c0, act, b, w = _random_case(masked, masked, mode, bc)
    ref = poisson.poisson_apply(p, inv_dx2, bc, mA_list, c0, act, b, mode, w, use_pallas=False)
    out = poisson.poisson_apply(p, inv_dx2, bc, mA_list, c0, act, b, mode, w,
                                use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_symmetry():
    """The masked operator must be symmetric (CG requirement): <Ax, y> == <x, Ay>."""
    bc = (('neumann', 'neumann'), ('neumann', 'ghost0'), ('periodic', 'periodic'))
    p, inv_dx2, mA_list, c0, act, _, _ = _random_case(True, False, 'matvec', bc)
    rng = np.random.RandomState(3)
    y = jnp.asarray(rng.randn(*p.shape).astype(np.float32))
    Ap = poisson.poisson_apply(p, inv_dx2, bc, mA_list, c0, use_pallas=False)
    Ay = poisson.poisson_apply(y, inv_dx2, bc, mA_list, c0, use_pallas=False)
    lhs = float(jnp.vdot(Ap, y))
    rhs = float(jnp.vdot(p, Ay))
    assert abs(lhs - rhs) < 1e-2 * max(1.0, abs(lhs))


def test_solve_consistency_end_to_end():
    """make_incompressible produces the same projection with and without the
    fused path — smoke-config boundaries, with obstacle."""
    from phiflow_tpu.math import Solve, ConvergenceException
    from phiflow_tpu.physics import fluid as fl
    n = 24
    bounds = Box(x=float(n), y=float(n))
    v = StaggeredGrid(lambda pos: (pos.vector['y'] * 0.01, 0.02 * pos.vector['x']),
                      0., bounds=bounds, x=n, y=n)
    obstacles = [fl.Obstacle(Sphere(x=12, y=12, radius=4))]
    solve = Solve('CG', 1e-6, 1e-6, max_iterations=500, suppress=(ConvergenceException,))
    fl.FUSED_POISSON = False
    try:
        v_ref, p_ref = fl.make_incompressible(v, obstacles, solve)
    finally:
        fl.FUSED_POISSON = True
    v_fast, p_fast = fl.make_incompressible(v, obstacles, solve)
    for a, b_ in ((v_ref, v_fast), (p_ref, p_fast)):
        for dim in (['x', 'y'] if a.is_staggered else [None]):
            ra = a.values[{'~vector': dim}] if dim else a.values
            rb = b_.values[{'~vector': dim}] if dim else b_.values
            np.testing.assert_allclose(np.asarray(rb.native(rb.shape.names)),
                                       np.asarray(ra.native(ra.shape.names)), atol=1e-4)


# ---------------------------------------------------------------------------
# fused two-sweep Jacobi smoother (interpret mode — runs on CPU)
# ---------------------------------------------------------------------------

def _ref_sweeps(b, inv_dx2, bc, w, sweeps, zero_init, u0=None):
    u = w * b if zero_init else u0
    for _ in range(sweeps - (1 if zero_init else 0)):
        u = poisson.poisson_apply(u, inv_dx2, bc, b=b, mode='jacobi',
                                  omega_over_diag=w, use_pallas=False)
    return u


@pytest.mark.parametrize('bc0', ['periodic', 'neumann', 'ghost0'])
@pytest.mark.parametrize('zero_init,sweeps', [(True, 3), (False, 2), (True, 5), (False, 3)])
def test_poisson_smooth_matches_loop(bc0, zero_init, sweeps):
    bc = ((bc0, bc0), ('neumann', 'ghost0'), ('periodic', 'periodic'))
    rng = np.random.RandomState(11)
    X, Y, Z = 16, 16, 128
    b = jnp.asarray(rng.randn(X, Y, Z).astype(np.float32))
    u0 = None if zero_init else jnp.asarray(rng.randn(X, Y, Z).astype(np.float32))
    inv_dx2 = (1.0, 0.25, 4.0)
    w = np.float32(0.9 / (-2 * sum(inv_dx2)))
    ref = _ref_sweeps(b, inv_dx2, bc, w, sweeps, zero_init, u0)
    out = poisson.poisson_smooth(u0, b, inv_dx2, bc, w, sweeps, zero_init=zero_init,
                                 fuse_pairs=True, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_poisson_smooth_single_tile_and_batched():
    bc = (('periodic', 'periodic'),) * 3
    rng = np.random.RandomState(5)
    b = jnp.asarray(rng.randn(2, 8, 8, 128).astype(np.float32))
    inv_dx2 = (1.0, 1.0, 1.0)
    w = np.float32(-0.15)
    ref = _ref_sweeps(b, inv_dx2, bc, w, 3, True)
    out = poisson.poisson_smooth(None, b, inv_dx2, bc, w, 3, zero_init=True,
                                 fuse_pairs=True, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize('bc0', ['periodic', 'neumann'])
def test_poisson_smooth_multi_tile(monkeypatch, bc0):
    """Force tiles < (X, Y) so the 2-D halo-assembly logic is exercised."""
    monkeypatch.setattr(poisson, '_pick_tile_jacobi2',
                        lambda X, Y, Z, n, hx=2, budget_bytes=22 << 20: (2 * hx, 8))
    bc = ((bc0, bc0), ('neumann', 'ghost0'), ('periodic', 'periodic'))
    rng = np.random.RandomState(13)
    b = jnp.asarray(rng.randn(16, 16, 128).astype(np.float32))
    u0 = jnp.asarray(rng.randn(16, 16, 128).astype(np.float32))
    inv_dx2 = (1.0, 0.25, 4.0)
    w = np.float32(0.9 / (-2 * sum(inv_dx2)))
    for zero_init, sweeps, u in ((True, 3, None), (False, 2, u0)):
        ref = _ref_sweeps(b, inv_dx2, bc, w, sweeps, zero_init, u)
        out = poisson.poisson_smooth(u, b, inv_dx2, bc, w, sweeps, zero_init=zero_init,
                                     fuse_pairs=True, use_pallas=True, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
