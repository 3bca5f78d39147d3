"""High-CFL advection correctness under jit (reference semantics:
/root/reference/phi/physics/advect.py:156-180 — exact backtrace at ANY CFL).

The TPU window-interpolation path clamps displacements to ±max_cells, which is
only exact for CFL ≤ max_cells. These tests certify the two safety nets:
in-graph CFL diagnostics (`max_displacement_cells`) and in-graph auto
substepping (`substeps='auto'`), including reverse-mode differentiability.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phiflow_tpu.math import extrapolation, spatial, Tensor
from phiflow_tpu.field import CenteredGrid, StaggeredGrid
from phiflow_tpu.geom import Box
from phiflow_tpu.physics import advect


N = 64


def _setup(speed):
    bounds = Box(x=float(N), y=float(N))
    xs = np.arange(N) + 0.5
    f0 = np.sin(2 * np.pi * xs / N)[:, None] * np.ones((1, N), np.float32)
    field = CenteredGrid(Tensor(jnp.asarray(f0, jnp.float32), spatial(x=N, y=N)),
                         extrapolation.PERIODIC, bounds, x=N, y=N)
    vel = StaggeredGrid((speed, 0.), extrapolation.PERIODIC, bounds, x=N, y=N)
    exact = np.sin(2 * np.pi * (xs - speed) / N)[:, None] * np.ones((1, N))
    return field, vel, exact


def _l2(result, exact):
    return float(np.sqrt(np.mean((np.asarray(result.values.native(('x', 'y'))) - exact) ** 2)))


def test_max_displacement_cells_probe():
    field, vel, _ = _setup(3.3)
    m = jax.jit(lambda f: advect.max_displacement_cells(f, vel, 1.0))(field)
    assert abs(float(m) - 3.3) < 1e-5


def test_auto_substeps_match_gather_at_high_cfl():
    """CFL 3.3 > max_cells=2: plain window clamps (badly wrong); substeps='auto'
    must land near the unbounded-gather reference."""
    field, vel, exact = _setup(3.3)
    clamped = advect.semi_lagrangian(field, vel, 1.0, max_cells=2)
    auto = jax.jit(lambda f: advect.semi_lagrangian(f, vel, 1.0, max_cells=2, substeps='auto'))(field)
    gather = advect.semi_lagrangian(field, vel, 1.0, max_cells=None)
    e_clamp, e_auto, e_gather = _l2(clamped, exact), _l2(auto, exact), _l2(gather, exact)
    assert e_clamp > 0.05, "test setup should make clamping visibly wrong"
    assert e_auto < 0.005, f"auto-substeps not exact enough: {e_auto}"
    assert e_auto < e_clamp / 10
    assert abs(e_auto - e_gather) < 0.005


def test_auto_substeps_integer_displacement_exact():
    """Displacement 4.0 cells with max_cells=2 → 2 substeps of exactly 2.0 cells:
    integer shifts make the window path EXACTLY equal to the gather path."""
    field, vel, _ = _setup(4.0)
    auto = jax.jit(lambda f: advect.semi_lagrangian(f, vel, 1.0, max_cells=2, substeps='auto'))(field)
    gather = advect.semi_lagrangian(field, vel, 1.0, max_cells=None)
    np.testing.assert_allclose(np.asarray(auto.values.native(('x', 'y'))),
                               np.asarray(gather.values.native(('x', 'y'))), atol=1e-5)


def test_auto_substeps_low_cfl_noop():
    """CFL < max_cells: auto must take exactly one substep and equal the plain path."""
    field, vel, _ = _setup(0.7)
    auto = jax.jit(lambda f: advect.semi_lagrangian(f, vel, 1.0, max_cells=2, substeps='auto'))(field)
    plain = advect.semi_lagrangian(field, vel, 1.0, max_cells=2)
    np.testing.assert_allclose(np.asarray(auto.values.native(('x', 'y'))),
                               np.asarray(plain.values.native(('x', 'y'))), atol=1e-6)


def test_auto_substeps_differentiable():
    """scan + cond construction must support reverse-mode (static trip count)."""
    field, vel, _ = _setup(3.3)

    def loss(values):
        f = field.with_values(values)
        out = advect.semi_lagrangian(f, vel, 1.0, max_cells=2, substeps='auto')
        return jnp.sum(out.values.native(('x', 'y')) ** 2)

    g = jax.jit(jax.grad(lambda v: loss(v)))(field.values)
    gn = np.asarray(g.native(('x', 'y')))
    assert np.all(np.isfinite(gn))
    assert np.abs(gn).max() > 0


def test_mac_cormack_auto_substeps():
    field, vel, exact = _setup(3.3)
    auto = jax.jit(lambda f: advect.mac_cormack(f, vel, 1.0, max_cells=2, substeps='auto'))(field)
    e_auto = _l2(auto, exact)
    clamped = advect.mac_cormack(field, vel, 1.0, max_cells=2)
    assert e_auto < 0.005
    assert e_auto < _l2(clamped, exact) / 5


def test_staggered_auto_substeps():
    """Self-advection of a staggered velocity field at CFL > K stays bounded and
    beats clamping against the gather reference."""
    bounds = Box(x=float(N), y=float(N))
    xs = np.arange(N) + 0.5
    base = 3.0 + np.sin(2 * np.pi * xs / N)[:, None] * np.ones((1, N), np.float32)
    vel = StaggeredGrid((3.0, 0.), extrapolation.PERIODIC, bounds, x=N, y=N)
    vel = vel.with_values(vel.values)  # concrete stack
    adv_auto = jax.jit(lambda v: advect.semi_lagrangian(v, v, 1.0, max_cells=2, substeps='auto'))(vel)
    adv_gather = advect.semi_lagrangian(vel, vel, 1.0, max_cells=None)
    for d in ('x', 'y'):
        a = np.asarray(adv_auto.vector[d].values.native(('x', 'y')))
        b = np.asarray(adv_gather.vector[d].values.native(('x', 'y')))
        np.testing.assert_allclose(a, b, atol=1e-4)
