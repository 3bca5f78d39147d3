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


def test_dam_break_collapses():
    model = SphDamBreak(nx=20, ny=40)
    step = jax.jit(lambda s: model.step(*s))
    state = model.initial_state()
    for _ in range(3000):
        state = step(state)
    assert step._cache_size() == 1
    pos = np.asarray(state[0].geometry.center.native(('points', 'vector')))
    assert np.isfinite(pos).all()
    assert pos[:, 0].max() > 0.45, f"dam should spread right, reached {pos[:, 0].max():.3f}"
    assert pos.min() > -0.05 and pos.max() < 1.05
    # column must have dropped: center of mass below the initial block center
    y0 = 0.05 + 40 * 0.008 / 2
    assert pos[:, 1].mean() < y0
