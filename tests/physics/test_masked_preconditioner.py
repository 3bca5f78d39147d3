"""Masked-system Chebyshev(Jacobi) preconditioner (VERDICT r3 #8: obstacle /
free-surface pressure systems previously ran unpreconditioned).

Checks (a) the checkerboard diagonal probe is exact against brute-force basis
probing, (b) preconditioned CG reaches the same pressure as unpreconditioned,
(c) the iteration count drops by >2x on a lid-driven cavity with an obstacle
(reference workload: /root/reference/examples/grids/Lid_Driven_Cavity.ipynb)."""
import jax
import numpy as np
import pytest

from phiflow_tpu.math import Solve, SolveTape, ConvergenceException
from phiflow_tpu.physics import fluid, advect, diffuse
from phiflow_tpu.models import LidDrivenCavity


@pytest.fixture
def cavity_state():
    model = LidDrivenCavity(resolution=48, obstacle=True)
    v, p = model.initial_state()
    step = jax.jit(model.step)
    for _ in range(2):
        v, p = step(v, p)

    def pre(v):
        v = advect.semi_lagrangian(v, v, model.dt)
        return diffuse.explicit(v, model.viscosity, model.dt)

    return model, jax.jit(pre)(v), p


def _project(model, v_adv, p, mode, tol=1e-6):
    old = fluid.MASKED_PRECONDITIONER
    fluid.MASKED_PRECONDITIONER = mode
    try:
        def proj(vel, prev_p):
            solve = Solve('CG', tol, 0., x0=prev_p, max_iterations=3000,
                          suppress=(ConvergenceException,), implicit_diff=False)
            with SolveTape() as tape:
                v2, p2 = fluid.make_incompressible(vel, model.obstacles, solve)
            return v2, p2, tape.solve_infos[-1].iterations
        v2, p2, it = jax.jit(proj)(v_adv, p)
        return np.asarray(p2.values.native(('x', 'y'))), int(np.asarray(it))
    finally:
        fluid.MASKED_PRECONDITIONER = old


def test_masked_diagonal_exact(cavity_state):
    """Checkerboard probe == brute-force column probing of masked_laplace."""
    model, v_adv, p = cavity_state
    from phiflow_tpu.field import Field, stagger as field_stagger
    from phiflow_tpu.math import _ops as ops
    from phiflow_tpu.math import extrapolation
    from phiflow_tpu.geom import union
    velocity = v_adv
    accessible_boundary = fluid._accessible_extrapolation(velocity.boundary)
    accessible = Field(velocity.geometry, ~union([o.geometry for o in model.obstacles]),
                       accessible_boundary)
    hard_bcs = field_stagger(accessible, ops.minimum, velocity.boundary,
                             at=velocity.sampled_at, dims=velocity.resolution.names)
    active = accessible.with_boundary(extrapolation.NONE)
    x0 = fluid.Field(p.geometry, p.values, p.boundary)
    diag = fluid._masked_diagonal(x0, velocity.boundary, hard_bcs, active)
    assert diag is not None
    diag_np = np.asarray(diag.native(('x', 'y')))
    # brute force: probe 5 random unit vectors e_i -> (A e_i)_i
    rng = np.random.default_rng(0)
    n = diag_np.shape[0]
    from phiflow_tpu.math import Tensor, spatial
    import jax.numpy as jnp
    for _ in range(5):
        i, j = rng.integers(0, n, 2)
        e = np.zeros(diag_np.shape, np.float32)
        e[i, j] = 1.
        f = x0.with_values(Tensor(jnp.asarray(e), x0.values.shape.only(('x', 'y'), reorder=True)))
        Ae = fluid.masked_laplace(f, velocity.boundary, hard_bcs, active,
                                  wide_stencil=False, order=2)
        got = np.asarray(Ae.values.native(('x', 'y')))[i, j]
        assert abs(got - diag_np[i, j]) < 1e-5 * max(1., abs(got)), (i, j, got, diag_np[i, j])


def test_chebyshev_matches_unpreconditioned(cavity_state):
    model, v_adv, p = cavity_state
    p_none, it_none = _project(model, v_adv, p, None)
    p_cheb, it_cheb = _project(model, v_adv, p, 'chebyshev')
    scale = np.sqrt(np.mean(p_none ** 2)) + 1e-30
    assert np.sqrt(np.mean((p_cheb - p_none) ** 2)) / scale < 1e-3
    assert it_cheb * 2 < it_none, (it_cheb, it_none)


def test_default_is_preconditioned(cavity_state):
    """make_incompressible with obstacles uses the masked preconditioner by default."""
    model, v_adv, p = cavity_state
    assert fluid.MASKED_PRECONDITIONER == 'chebyshev'
    _, it_default = _project(model, v_adv, p, fluid.MASKED_PRECONDITIONER)
    _, it_none = _project(model, v_adv, p, None)
    assert it_default < it_none
