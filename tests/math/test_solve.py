import numpy as np
import pytest

import phiflow_tpu.math as math
from phiflow_tpu.math import Solve, SolveTape, spatial, batch, wrap, NotConverged


def _neg_lap_periodic(x):
    lo, up = math.shift(x, (-1, 1), 'x', math.extrapolation.PERIODIC, stack_dim=None)
    return 2 * x - lo - up


def _neg_lap_dirichlet(x):
    lo, up = math.shift(x, (-1, 1), 'x', math.extrapolation.ZERO, stack_dim=None)
    return 2 * x - lo - up


def test_cg_dirichlet():
    rhs = math.random_normal(spatial(x=32))
    x = math.solve_linear(_neg_lap_dirichlet, rhs, Solve('CG', 1e-6, 1e-6))
    math.assert_close(_neg_lap_dirichlet(x), rhs, abs_tolerance=1e-4)


def test_cg_singular_periodic():
    rhs = math.random_normal(spatial(x=32))
    rhs = rhs - math.mean(rhs)
    x = math.solve_linear(_neg_lap_periodic, rhs, Solve('CG', 1e-6, 1e-6, rank_deficiency=1))
    math.assert_close(_neg_lap_periodic(x), rhs, abs_tolerance=1e-4)


def test_cg_adaptive():
    """'CG-adaptive' is a DISTINCT method (phiml semantics): step size from the
    current residual + explicit re-conjugation, not an alias of 'CG'."""
    from phiflow_tpu.math import _solve as solve_mod
    assert solve_mod._cg_adaptive is not solve_mod._cg
    rhs = math.random_normal(spatial(x=32))
    x = math.solve_linear(_neg_lap_dirichlet, rhs, Solve('CG-adaptive', 1e-6, 1e-6))
    math.assert_close(_neg_lap_dirichlet(x), rhs, abs_tolerance=1e-4)
    # singular (periodic) system with rank deficiency, like the pressure solve
    rhs2 = math.random_normal(spatial(x=32))
    rhs2 = rhs2 - math.mean(rhs2)
    x2 = math.solve_linear(_neg_lap_periodic, rhs2, Solve('CG-adaptive', 1e-6, 1e-6, rank_deficiency=1))
    math.assert_close(_neg_lap_periodic(x2), rhs2, abs_tolerance=1e-4)


def test_bicgstab():
    rhs = math.random_normal(spatial(x=16))
    x = math.solve_linear(_neg_lap_dirichlet, rhs, Solve('biCG-stab(2)', 1e-6, 1e-6))
    math.assert_close(_neg_lap_dirichlet(x), rhs, abs_tolerance=1e-4)


def test_direct():
    rhs = math.random_normal(spatial(x=16))
    x = math.solve_linear(_neg_lap_dirichlet, rhs, Solve('scipy-direct', 1e-6, 1e-6))
    math.assert_close(_neg_lap_dirichlet(x), rhs, abs_tolerance=1e-4)


def test_batched_solve():
    rhs = math.random_normal(batch(b=3), spatial(x=16))
    x = math.solve_linear(_neg_lap_dirichlet, rhs, Solve('CG', 1e-6, 1e-6))
    assert 'b' in x.shape
    math.assert_close(_neg_lap_dirichlet(x), rhs, abs_tolerance=1e-4)


def test_gradient_through_solve():
    rhs = math.random_normal(spatial(x=16))

    def loss(r):
        x = math.solve_linear(_neg_lap_dirichlet, r, Solve('CG', 1e-6, 1e-6))  # 1e-7 is below f32 CG stall level
        return math.sum(x ** 2)

    grad_fn = math.gradient(loss, wrt=0, get_output=True)
    val, grad = grad_fn(rhs)
    # finite difference check on one entry
    eps = 1e-2
    e3 = math.tensor(np.eye(16, dtype=np.float32)[3], spatial(x=16))
    fd = (float(loss(rhs + e3 * eps)) - float(loss(rhs - e3 * eps))) / (2 * eps)
    assert abs(fd - float(grad.x[3])) / (abs(fd) + 1e-6) < 0.05


def test_solve_tape():
    rhs = math.random_normal(spatial(x=16))
    with SolveTape() as tape:
        math.solve_linear(_neg_lap_dirichlet, rhs, Solve('CG', 1e-6, 1e-6))
    assert len(tape) == 1
    assert tape[0].converged


def test_not_converged_raises():
    rhs = math.random_normal(spatial(x=64))
    with pytest.raises(NotConverged):
        math.solve_linear(_neg_lap_dirichlet, rhs, Solve('CG', 1e-12, 1e-12, max_iterations=2))


def test_affine_offset():
    # f(x) = A x + c (constant offset from boundary padding) — must be handled
    def affine(x):
        return _neg_lap_dirichlet(x) + 5.0

    rhs = math.random_normal(spatial(x=16))
    x = math.solve_linear(affine, rhs, Solve('CG', 1e-6, 1e-6))
    math.assert_close(affine(x), rhs, abs_tolerance=3e-4)


def test_minimize():
    from phiflow_tpu.math import minimize
    target = wrap(np.array([1., 2., 3.], np.float32), spatial('x'))

    def loss(x):
        return math.sum((x - target) ** 2)

    x0 = math.zeros(spatial(x=3))
    x = minimize(loss, Solve('BFGS', 1e-6, 1e-6, x0=x0))
    math.assert_close(x, target, abs_tolerance=1e-3)


def test_minimize_lbfgs():
    """Device-resident L-BFGS (reference relies on scipy L-BFGS-B for the
    optim examples)."""
    import numpy as np
    from phiflow_tpu.math import minimize, Solve, wrap, spatial
    x0 = wrap(np.array([-1.2, 1.0], np.float64), spatial('x'))
    import phiflow_tpu.math as math
    with math.precision(64):
        def rosen(t):
            a = t.x[0]
            b = t.x[1]
            return (1 - a) ** 2 + 100 * (b - a ** 2) ** 2
        x = minimize(rosen, Solve('L-BFGS-B', abs_tol=1e-10, x0=x0, max_iterations=200))
    np.testing.assert_allclose(np.asarray(x.native()), [1., 1.], atol=1e-5)


def test_solve_tape_runtime_stats():
    """record_runtime=True delivers concrete iteration counts under jit via
    host callback (CPU path; the axon TPU uses Solve(implicit_diff=False))."""
    import jax
    from phiflow_tpu.math import SolveTape

    tape = SolveTape(record_runtime=True)
    with tape:
        @jax.jit
        def solve_it(rhs):
            return math.solve_linear(_neg_lap_dirichlet, rhs, Solve('CG', 1e-6, 1e-6))
        x = solve_it(math.random_normal(spatial(x=16)))
        import numpy as np
        np.asarray(x.native())  # sync → callbacks flushed
    stats = tape.solve_infos[-1].runtime_stats
    assert stats.get('iterations', 0) > 0
    assert 'residual_norm' in stats


def test_solve_nonlinear_newton():
    """Matrix-free Newton-Krylov on a coupled nonlinear system."""
    import numpy as np
    from phiflow_tpu.math import solve_nonlinear

    def f(x):
        # f(x) = x³ + x (monotone, unique root structure)
        return x ** 3 + x

    target = wrap(np.array([2., 10., -2.], np.float32), spatial('x'))
    x0 = math.zeros(spatial(x=3))
    x = solve_nonlinear(f, target, Solve('Newton', 1e-6, 1e-6, x0=x0))
    math.assert_close(f(x), target, abs_tolerance=1e-4)


def test_bicgstab2_is_genuine_l2():
    """'biCG-stab(2)' must dispatch to the Sleijpen–Fokkema ℓ=2 solver (two
    BiCG steps + quadratic MR polynomial per outer iteration), not alias plain
    BiCGStab (reference: phiml exposes it distinctly; used by
    tests/commit/physics/test_higher_order.py:31 at 1e-10)."""
    import jax.numpy as jnp
    from phiflow_tpu.math import _solve as solve_mod
    assert solve_mod._bicgstab2 is not solve_mod._bicgstab

    with math.precision(64):
        rng = np.random.RandomState(7)
        n = 96
        # stiff nonsymmetric: 1D biharmonic-like band + asymmetric perturbation
        D = (np.diag(np.full(n, 6.)) + np.diag(np.full(n - 1, -4.), 1)
             + np.diag(np.full(n - 1, -4.), -1) + np.diag(np.full(n - 2, 1.), 2)
             + np.diag(np.full(n - 2, 1.), -2) + np.diag(np.full(n - 1, 0.3), 1) * 0
             + 0.5 * np.eye(n))
        D[0, :4] += [1.5, -2.0, 0.5, 0.1]   # one-sided boundary rows → nonsymmetric
        D[-1, -4:] += [0.1, 0.5, -2.0, 1.5]
        rhs = rng.randn(n)
        A = lambda xs: [jnp.asarray(D) @ xs[0]]
        x, res, it, conv = solve_mod._bicgstab2(
            A, [jnp.asarray(rhs)], [jnp.zeros(n, jnp.float64)], 1e-10, 1e-10, 4000)
        assert bool(conv), (float(res), int(it))
        err = np.max(np.abs(np.asarray(x[0]) - np.linalg.solve(D, rhs)))
        assert err < 1e-7, err


def test_bicgstab2_through_solve_linear_batched():
    """End-to-end 'biCG-stab(2)' via solve_linear with a batch dim: frozen
    convergence per batch entry, right preconditioning path unused."""
    with math.precision(64):
        # simple SPD-ish shifted operator via laplace on a periodic grid
        from phiflow_tpu.math import extrapolation as _ext
        def f(x):
            return 4 * x - math.laplace(x, padding=_ext.PERIODIC)
        rhs = math.random_normal(batch(b=2), spatial(x=32))
        x = math.solve_linear(f, rhs, Solve('biCG-stab(2)', 1e-9, 1e-9))
        math.assert_close(f(x), rhs, abs_tolerance=1e-7)


def test_direct_large_mesh_parity():
    """'scipy-direct' performs a TRUE dense direct solve up to
    DIRECT_MAX_UNKNOWNS (raised 4096 -> 16384, VERDICT r4 #7): a 72x64 = 4608-
    unknown system — above the old cutoff — must solve directly (no reroute
    warning) and match a tight iterative solution."""
    import warnings as _warnings
    from phiflow_tpu.math._solve import DIRECT_MAX_UNKNOWNS
    assert DIRECT_MAX_UNKNOWNS >= 16384

    def op(x):
        lo_x, up_x = math.shift(x, (-1, 1), 'x', math.extrapolation.ZERO, stack_dim=None)
        lo_y, up_y = math.shift(x, (-1, 1), 'y', math.extrapolation.ZERO, stack_dim=None)
        return 4 * x - lo_x - up_x - lo_y - up_y

    with math.precision(64):
        rhs = math.random_normal(spatial(x=72, y=64))
        with _warnings.catch_warnings():
            _warnings.simplefilter('error')  # a reroute warning would fail the test
            x_direct = math.solve_linear(op, rhs, Solve('scipy-direct', 1e-6, 1e-6))
        x_iter = math.solve_linear(op, rhs, Solve('CG', 1e-10, 1e-10, max_iterations=20000))
        math.assert_close(x_direct, x_iter, abs_tolerance=1e-4)


def test_direct_reroutes_above_cutoff():
    """Beyond DIRECT_MAX_UNKNOWNS the request reroutes to tightened BiCGStab
    with a warning (documented in docs/Unstructured_Meshes.md)."""
    def op(x):  # diagonally dominant -> well-conditioned at any size
        lo, up = math.shift(x, (-1, 1), 'x', math.extrapolation.ZERO, stack_dim=None)
        return 3 * x - lo - up

    rhs = math.random_normal(spatial(x=20000))
    with pytest.warns(UserWarning, match='BiCGStab'):
        x = math.solve_linear(op, rhs, Solve('scipy-direct', 1e-5, 1e-5))
    math.assert_close(op(x), rhs, abs_tolerance=1e-3)
