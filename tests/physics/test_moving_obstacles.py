"""MovingObstacles model: jit-traced obstacle state, periodic wrap, projection
validity (reference recipe: examples/grids/Moving_Obstacles.ipynb)."""
import jax
import numpy as np
import pytest

from phiflow_tpu.models import MovingObstacles


@pytest.fixture(scope='module')
def trajectory():
    model = MovingObstacles(resolution=64, dt=0.5)
    state = model.initial_state()
    step = jax.jit(lambda *s: model.step(*s))
    states = [state]
    for _ in range(4):
        states.append(step(*states[-1]))
    return model, states


def test_obstacles_advance_and_trace(trajectory):
    model, states = trajectory
    _, _, o1, o2 = states[-1]
    # cuboid: +x at 5 per unit time, dt=0.5, 4 steps -> +10; sphere: (1,4) -> (+2,+8)
    np.testing.assert_allclose(np.asarray(o1.geometry.center.native()), [30., 80.], atol=1e-4)
    np.testing.assert_allclose(np.asarray(o2.geometry.center.native()), [22., 28.], atol=1e-4)
    # sphere keeps its angular velocity through the jit-traced update
    assert float(np.asarray(o2.angular_velocity.native())) == pytest.approx(0.5)


def test_projection_divergence_free_outside(trajectory):
    from phiflow_tpu.field import divergence, resample
    from phiflow_tpu.geom import union
    import phiflow_tpu.math as pmath
    model, states = trajectory
    v, p, o1, o2 = states[-1]
    div = divergence(v)
    hard = resample(union([o1.geometry, o2.geometry]), div, soft=False)
    max_div = float(np.asarray(pmath.max(abs(div.values) * (1 - hard.values)).native()))
    # velocities are O(5); the masked CG runs at rel_tol 1e-4
    assert max_div < 2e-2, max_div


def test_periodic_wrap():
    model = MovingObstacles(resolution=32, dt=0.5)
    _, _, o1, o2 = model.initial_state()
    # drive the cuboid across the x=100 boundary: 20 + 5*0.5*40 = 120 -> wraps to 20
    step = jax.jit(model.move_obstacle)
    for _ in range(40):
        o1 = step(o1)
    c = np.asarray(o1.geometry.center.native())
    np.testing.assert_allclose(c, [20., 80.], atol=1e-3)
