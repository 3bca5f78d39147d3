"""Geometric multigrid V-cycle: contraction, symmetry, CG-preconditioning parity."""
import numpy as np
import jax.numpy as jnp

from phiflow_tpu.math._multigrid import make_poisson_vcycle


def _laplace_np(u, bcs):
    out = np.zeros_like(u)
    for ax, (blo, bhi) in enumerate(bcs):
        first = np.take(u, [0], axis=ax)
        last = np.take(u, [u.shape[ax] - 1], axis=ax)
        lo = {'periodic': last, 'neumann': first, 'dirichlet': -first}[blo]
        hi = {'periodic': first, 'neumann': last, 'dirichlet': -last}[bhi]
        up = np.concatenate([lo, u, hi], axis=ax)
        sl = [slice(None)] * u.ndim
        sl_lo, sl_hi = list(sl), list(sl)
        sl_lo[ax] = slice(0, u.shape[ax])
        sl_hi[ax] = slice(2, u.shape[ax] + 2)
        out += up[tuple(sl_lo)] + up[tuple(sl_hi)] - 2 * u
    return out


def test_vcycle_reduces_residual():
    """One V-cycle must shrink the residual by ~5-10x (textbook MG contraction)."""
    rng = np.random.default_rng(0)
    n = 32
    bcs = (('neumann', 'neumann'), ('neumann', 'neumann'))
    b = rng.standard_normal((1, n, n)).astype(np.float32)
    b -= b.mean()  # compatible RHS for the singular Neumann system
    vc = make_poisson_vcycle((n, n), (1.0, 1.0), bcs)
    u = np.array(vc(jnp.asarray(b)))
    u -= u.mean()
    r = b - _laplace_np(u[0], bcs)[None]
    r -= r.mean()
    assert np.linalg.norm(r) < 0.25 * np.linalg.norm(b), np.linalg.norm(r) / np.linalg.norm(b)


def test_vcycle_symmetric():
    """vᵀM(w) == wᵀM(v) — required for use as a CG preconditioner."""
    rng = np.random.default_rng(1)
    n = 16
    bcs = (('periodic', 'periodic'), ('dirichlet', 'dirichlet'))
    vc = make_poisson_vcycle((n, n), (1.0, 1.0), bcs)
    v = rng.standard_normal((1, n, n)).astype(np.float32)
    w = rng.standard_normal((1, n, n)).astype(np.float32)
    lhs = float(np.sum(v * np.asarray(vc(jnp.asarray(w)))))
    rhs = float(np.sum(w * np.asarray(vc(jnp.asarray(v)))))
    assert abs(lhs - rhs) < 1e-3 * max(abs(lhs), abs(rhs)), (lhs, rhs)


def test_preconditioned_pressure_solve_matches_plain():
    """make_incompressible with MG preconditioning == without (same projection)."""
    import phiflow_tpu.math as math
    from phiflow_tpu.math import Solve, extrapolation
    from phiflow_tpu.field import StaggeredGrid, CenteredGrid, Noise, divergence
    from phiflow_tpu.physics import fluid
    math.seed(7)  # decouple from global-RNG test ordering
    v = StaggeredGrid(Noise(), 0., x=32, y=32)
    v_mg, p_mg = fluid.make_incompressible(v, solve=Solve('CG', 1e-5, 1e-5))
    v_plain, p_plain = fluid.make_incompressible(v, solve=Solve('CG', 1e-5, 1e-5, preconditioner='none'))
    div_mg = divergence(v_mg).values.numpy(('x', 'y'))
    assert np.abs(div_mg).max() < 5e-4  # both solves stop at rel_tol=1e-5 (f32)
    dv = v_mg.values - v_plain.values
    for c in ('x', 'y'):
        assert np.abs(dv.vector[c].numpy()).max() < 3e-3
