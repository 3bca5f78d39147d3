"""Pallas kernel vs pure-XLA consistency (SURVEY.md §4b test tier).
Kernels run in interpret mode on CPU."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest



def _pallas_interpret_laplacian(x, dx2=1.0, periodic=True):
    from jax.experimental import pallas as pl
    m, n = x.shape
    mode = 'wrap' if periodic else 'edge'
    xp = jnp.pad(x, ((1, 1), (1, 1)), mode=mode)
    TILE = m // 2

    def kernel(xp_ref, out_ref):
        i = pl.program_id(0)
        blk = xp_ref[pl.ds(i * TILE, TILE + 2), :]
        center = blk[1:-1, 1:-1]
        up = blk[2:, 1:-1]
        down = blk[:-2, 1:-1]
        left = blk[1:-1, :-2]
        right = blk[1:-1, 2:]
        out_ref[:] = (up + down + left + right - 4 * center) / dx2

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid=(m // TILE,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TILE, n), lambda i: (i, 0)),
        interpret=True,
    )(xp)


def _roll_laplacian(x, dx2=1.0, periodic=True):
    if periodic:
        up, down = jnp.roll(x, -1, 0), jnp.roll(x, 1, 0)
        left, right = jnp.roll(x, 1, 1), jnp.roll(x, -1, 1)
    else:
        xp = jnp.pad(x, 1, mode='edge')
        up, down = xp[2:, 1:-1], xp[:-2, 1:-1]
        left, right = xp[1:-1, :-2], xp[1:-1, 2:]
    return (up + down + left + right - 4 * x) / dx2


@pytest.mark.parametrize('periodic', [True, False])
def test_laplacian_kernel_matches_xla(periodic):
    x = jnp.asarray(np.random.randn(32, 64).astype(np.float32))
    expected = _roll_laplacian(x, 0.25, periodic)
    got = _pallas_interpret_laplacian(x, 0.25, periodic)
    assert np.allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


def test_poisson_apply_matches_naive():
    """The fused masked-Poisson stencil (ops.poisson — the REAL CG matvec
    kernel) against a naive roll formulation."""
    from phiflow_tpu.ops import poisson_apply
    x = jnp.asarray(np.random.randn(16, 32).astype(np.float32))
    out = poisson_apply(x, (1.0, 1.0), (('periodic', 'periodic'),) * 2, use_pallas=False)
    expected = _roll_laplacian(x, 1.0, True)
    assert np.allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_window_interp_3d_matches_fori():
    """Pallas window-interp kernel (interpret mode) vs the XLA fori_loop reference."""
    from phiflow_tpu.ops.interp import window_interp_3d
    rng = np.random.default_rng(0)
    K = 2
    C = K  # symmetric window: taps s ∈ [-K, K], displacements within [-K, K]
    X = Y = Z = 16
    padded = jnp.asarray(rng.standard_normal((X + 2 * C, Y + 2 * C, Z + 2 * C)).astype(np.float32))
    rel = jnp.asarray(rng.integers(-K, K, (3, X, Y, Z)).astype(np.int32))
    frac = jnp.asarray(rng.uniform(0.01, 0.99, (3, X, Y, Z)).astype(np.float32))
    disp = rel.astype(jnp.float32) + frac
    out, lo, up = window_interp_3d(padded, disp, K, compute_extrema=True, interpret=True)
    # reference: direct corner evaluation
    grid = np.asarray(padded)
    r = np.asarray(rel); f = np.asarray(frac)
    expected = np.zeros((X, Y, Z), np.float32)
    exp_lo = np.full((X, Y, Z), np.inf, np.float32)
    exp_up = np.full((X, Y, Z), -np.inf, np.float32)
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                ix = np.arange(X)[:, None, None] + r[0] + cx + C
                iy = np.arange(Y)[None, :, None] + r[1] + cy + C
                iz = np.arange(Z)[None, None, :] + r[2] + cz + C
                vals = grid[ix, iy, iz]
                w = ((f[0] if cx else 1 - f[0]) * (f[1] if cy else 1 - f[1]) * (f[2] if cz else 1 - f[2]))
                expected += vals * w
                exp_lo = np.minimum(exp_lo, vals)
                exp_up = np.maximum(exp_up, vals)
    assert np.allclose(np.asarray(out), expected, atol=2e-4), np.abs(np.asarray(out) - expected).max()
    assert np.allclose(np.asarray(lo), exp_lo, atol=1e-6)
    assert np.allclose(np.asarray(up), exp_up, atol=1e-6)


def test_window_interp_2d_matches():
    from phiflow_tpu.ops.interp import window_interp_2d
    rng = np.random.default_rng(1)
    K = 2
    C = K  # symmetric window (see 3D test)
    X, Y = 16, 24
    padded = jnp.asarray(rng.standard_normal((X + 2 * C, Y + 2 * C)).astype(np.float32))
    rel = jnp.asarray(rng.integers(-K, K, (2, X, Y)).astype(np.int32))
    frac = jnp.asarray(rng.uniform(0.01, 0.99, (2, X, Y)).astype(np.float32))
    disp = rel.astype(jnp.float32) + frac
    out = window_interp_2d(padded, disp, K, interpret=True)
    grid = np.asarray(padded); r = np.asarray(rel); f = np.asarray(frac)
    expected = np.zeros((X, Y), np.float32)
    for cx in (0, 1):
        for cy in (0, 1):
            ix = np.arange(X)[:, None] + r[0] + cx + C
            iy = np.arange(Y)[None, :] + r[1] + cy + C
            w = (f[0] if cx else 1 - f[0]) * (f[1] if cy else 1 - f[1])
            expected += grid[ix, iy] * w
    assert np.allclose(np.asarray(out), expected, atol=2e-4)


def test_poisson_apply_xy_tiled_matches_xla():
    """Force TX<X and TY<Y so the tile-edge halo substitution (y-roll wrap rows
    replaced by fetched halo columns) is exercised for every BC/mode/mask combo."""
    from phiflow_tpu.ops import poisson as P
    orig = P._pick_tile_xy
    P._pick_tile_xy = lambda X, Y, Z, n, budget_bytes=0: (4, 8)
    try:
        key = jax.random.PRNGKey(1)
        X, Y, Z = 16, 24, 128
        p = jax.random.normal(key, (X, Y, Z), jnp.float32)
        b = jax.random.normal(jax.random.PRNGKey(2), (X, Y, Z), jnp.float32)
        act = (jax.random.uniform(jax.random.PRNGKey(3), (X, Y, Z)) > 0.3).astype(jnp.float32)
        bcs_list = [
            (('neumann', 'neumann'),) * 3,
            (('periodic', 'periodic'),) * 3,
            (('neumann', 'ghost0'), ('periodic', 'periodic'), ('ghost0', 'neumann')),
        ]
        inv = (1.0, 0.7, 1.3)
        for bcs in bcs_list:
            for mode in ('matvec', 'residual', 'jacobi'):
                for use_act in (False, True):
                    ref = P._apply_xla(p, inv, bcs, None, None, act if use_act else None, b, mode, 0.15)
                    got = P._apply_pallas_3d(p, inv, bcs, None, None, act if use_act else None,
                                             b if mode != 'matvec' else None, mode, 0.15, interpret=True)
                    assert float(jnp.max(jnp.abs(got - ref))) < 2e-5, (bcs, mode, use_act)
            masks = []
            for d in range(3):
                shape = [X, Y, Z]
                if bcs[d] != ('periodic', 'periodic'):
                    shape[d] += 1
                masks.append((jax.random.uniform(jax.random.PRNGKey(10 + d), tuple(shape)) > 0.2)
                             .astype(jnp.float32))
            mA, c0 = P.stage_masks(masks, bcs, inv)
            for mode in ('matvec', 'jacobi'):
                ref = P._apply_xla(p, inv, bcs, mA, c0, act, b, mode, 0.15)
                got = P._apply_pallas_3d(p, inv, bcs, mA, c0, act, b if mode != 'matvec' else None,
                                         mode, 0.15, interpret=True)
                assert float(jnp.max(jnp.abs(got - ref))) < 2e-5, ('masked', bcs, mode)
    finally:
        P._pick_tile_xy = orig


def test_jacobi2_xy_tiled_matches_sweeps():
    """The fused pair/triple (and zero-init three-sweep) Jacobi kernels with
    forced 2-D tiling must equal looped single jacobi applications (up to
    f32 reassociation — verified elsewhere to vanish in f64)."""
    from phiflow_tpu.ops import poisson as P
    orig = P._pick_tile_jacobi2
    P._pick_tile_jacobi2 = lambda X, Y, Z, n, hx=2, budget_bytes=0: (4 if hx == 2 else 8, 8)
    try:
        X, Y, Z = 16, 24, 128
        b = jax.random.normal(jax.random.PRNGKey(2), (X, Y, Z), jnp.float32)
        p = jax.random.normal(jax.random.PRNGKey(1), (X, Y, Z), jnp.float32)
        inv = (1.0, 0.7, 1.3)
        w = 0.9 / (2.0 * sum(inv))
        for bcs in [(('neumann', 'neumann'),) * 3, (('periodic', 'periodic'),) * 3,
                    (('neumann', 'ghost0'), ('periodic', 'periodic'), ('ghost0', 'neumann'))]:
            got = P._jacobi2_pallas_3d(None, b, inv, bcs, w, True, interpret=True)
            ref = w * b
            for _ in range(2):
                ref = P._apply_xla(ref, inv, bcs, None, None, None, b, 'jacobi', w)
            assert float(jnp.max(jnp.abs(got - ref))) < 5e-6, ('zero-init', bcs)
            for sweeps in (2, 3):
                got = P._jacobi2_pallas_3d(p, b, inv, bcs, w, False, sweeps=sweeps, interpret=True)
                ref = p
                for _ in range(sweeps):
                    ref = P._apply_xla(ref, inv, bcs, None, None, None, b, 'jacobi', w)
                assert float(jnp.max(jnp.abs(got - ref))) < 2e-5, (sweeps, bcs)
    finally:
        P._pick_tile_jacobi2 = orig


def test_fused_advect_3d_matches_separate_phases():
    """The fused advection megakernel (ops/advect3d.py: one slab staging + 3
    pallas calls for MacCormack smoke + staggered self-advection + buoyancy)
    must reproduce the separate per-component path bit-for-bit up to f32
    roundoff (interpret mode; the TPU path is certified on-chip by bench.py)."""
    import numpy as np
    from phiflow_tpu.models import SmokePlume

    model = SmokePlume(resolution=64, dims=3)
    v, s, p = model.initial_state()
    for _ in range(2):  # build a nontrivial state with the reference phases
        s = model.advect_smoke(v, s)
        v = model.advect_velocity(v, s)
        v, p = model.project(v, p)
    assert model._fused_advect_available(v, s, interpret=True)
    s_old = model.advect_smoke(v, s)
    v_old = model.advect_velocity(v, s_old)
    v_new, s_new = model._fused_advect(v, s, interpret=True)

    def nat(f):
        t = f.values
        if hasattr(t, 'components'):
            return [np.asarray(c.native()) for c in t.components]
        return [np.asarray(t.native())]

    np.testing.assert_allclose(nat(s_new)[0], nat(s_old)[0], atol=2e-5)
    for a, b_ in zip(nat(v_new), nat(v_old)):
        np.testing.assert_allclose(a, b_, atol=2e-5)


def _fused_vs_separate(model, steps=2, atol=2e-5):
    import numpy as np
    v, s, p = model.initial_state()
    for _ in range(steps):  # nontrivial state via the reference phases
        s = model.advect_smoke(v, s)
        v = model.advect_velocity(v, s)
        v, p = model.project(v, p)
    assert model._fused_advect_available(v, s, interpret=True)
    s_old = model.advect_smoke(v, s)
    v_old = model.advect_velocity(v, s_old)
    v_new, s_new = model._fused_advect(v, s, interpret=True)

    def nat(f):
        t = f.values
        if hasattr(t, 'components'):
            return [np.asarray(c.native()) for c in t.components]
        return [np.asarray(t.native())]

    np.testing.assert_allclose(nat(s_new)[0], nat(s_old)[0], atol=atol)
    for a, b_ in zip(nat(v_new), nat(v_old)):
        np.testing.assert_allclose(a, b_, atol=atol)


def test_fused_advect_3d_physical_domain():
    """VERDICT r4 #3: a physically-scaled domain (bounds ≠ resolution, dx ≠ 1)
    must take the fused path — the dt/dx conversion rides in-register — and
    match the per-component path."""
    from phiflow_tpu.models import SmokePlume
    model = SmokePlume(resolution=64, dims=3, size=100., dt=0.5)
    assert abs(model._dx - 100. / 64) < 1e-12
    _fused_vs_separate(model)


def test_fused_advect_3d_periodic():
    """VERDICT r4 #3: periodic velocity + smoke take the fused path (wrapped
    halo staging, N-face own-axis layout) and match the per-component path."""
    from phiflow_tpu.models import SmokePlume
    model = SmokePlume(resolution=64, dims=3, periodic=True, dt=0.5)
    _fused_vs_separate(model)


def test_capture_matvec_dot_fused_epilogue():
    """The fused ⟨p, A·p⟩ kernel epilogue (capture_matvec_dot → matvec with_dot)
    must equal sum(p * poisson_apply(p)) for unmasked and masked systems, with
    forced 2-D tiling so the per-tile partial-sum layout is exercised."""
    from phiflow_tpu.ops import poisson as P
    orig = P._pick_tile_xy
    P._pick_tile_xy = lambda X, Y, Z, n, budget_bytes=0: (4, 8)
    try:
        X, Y, Z = 16, 24, 128
        p = jax.random.normal(jax.random.PRNGKey(5), (X, Y, Z), jnp.float32)
        inv = (1.0, 0.7, 1.3)
        for bcs in [(('neumann', 'neumann'),) * 3, (('periodic', 'periodic'),) * 3]:
            for masked in (False, True):
                if masked:
                    masks = []
                    for d in range(3):
                        shape = [X, Y, Z]
                        if bcs[d] != ('periodic', 'periodic'):
                            shape[d] += 1
                        masks.append((jax.random.uniform(jax.random.PRNGKey(20 + d), tuple(shape)) > 0.2)
                                     .astype(jnp.float32))
                    mA, c0 = P.stage_masks(masks, bcs, inv)
                else:
                    mA, c0 = None, None
                ref_out = P._apply_xla(p, inv, bcs, mA, c0, None, None, 'matvec', None)
                ref_dot = float(np.sum(np.asarray(ref_out, np.float64) * np.asarray(p, np.float64)))
                box = {}
                with P.capture_matvec_dot(box, p.size):
                    got = P.poisson_apply(p, inv, bcs, mA_list=mA, c0=c0, interpret=True)
                assert 'dot' in box, (bcs, masked)
                assert float(jnp.max(jnp.abs(got - ref_out))) < 2e-5
                scale = max(abs(ref_dot), 1.0)
                assert abs(float(box['dot']) - ref_dot) / scale < 1e-5, (bcs, masked)
    finally:
        P._pick_tile_xy = orig


def test_cg_fused_dot_solution_matches_unfused():
    """solve_linear(assume_homogeneous=True) (fused-dot CG) must reproduce the
    plain path on a periodic Poisson problem (XLA fallback capture on CPU)."""
    from phiflow_tpu import math as pm
    from phiflow_tpu.math import solve_linear, Solve, jit_compile_linear
    from phiflow_tpu import field
    from phiflow_tpu.geom import UniformGrid, Box

    grid = UniformGrid(pm.spatial(x=16, y=16), bounds=Box(x=1.0, y=1.0))
    rhs_np = np.random.RandomState(0).randn(16, 16).astype(np.float32)
    rhs_np -= rhs_np.mean()
    rhs = field.Field(grid, pm.wrap(rhs_np, pm.spatial('x,y')), 'periodic')

    lap = jit_compile_linear(lambda f: field.laplace(f))
    sol_plain = solve_linear(lap, rhs, Solve('CG', 1e-6, 1e-6, x0=rhs * 0, rank_deficiency=1))
    sol_fused = solve_linear(lap, rhs, Solve('CG', 1e-6, 1e-6, x0=rhs * 0, rank_deficiency=1),
                             assume_homogeneous=True)
    diff = float(pm.max(abs(sol_plain.values - sol_fused.values)))
    assert diff < 1e-5, diff


def test_residual_restrict_fused_matches_unfused():
    """Fused residual+restrict kernel (interpret mode) vs residual → mean-pool."""
    from phiflow_tpu.ops import poisson as P
    from phiflow_tpu.ops.transfer import restrict_mean
    rng = np.random.RandomState(5)
    u = jnp.asarray(rng.randn(4, 16, 256).astype(np.float32))
    b = jnp.asarray(rng.randn(4, 16, 256).astype(np.float32))
    inv = (1.0, 0.5, 2.0)
    for bcs in [(('neumann', 'neumann'),) * 3,
                (('periodic', 'periodic'),) * 3,
                (('neumann', 'ghost0'), ('periodic', 'periodic'), ('neumann', 'neumann'))]:
        ref = restrict_mean(P.poisson_apply(u, inv, bcs, b=b, mode='residual',
                                            use_pallas=False), 3)
        got = P._residual_restrict_pallas_3d(u, b, inv, bcs, interpret=True)
        assert got is not None
        err = float(jnp.max(jnp.abs(got - ref)))
        assert err < 1e-5, (bcs, err)


def test_prolong_add_pallas_matches_xla():
    """Fused prolong+add kernel (interpret mode) vs repeat-upsample + add."""
    from phiflow_tpu.ops import transfer as T
    rng = np.random.RandomState(6)
    c = jnp.asarray(rng.randn(8, 8, 128).astype(np.float32))
    u = jnp.asarray(rng.randn(16, 16, 256).astype(np.float32))
    ref = u + T._prolong_xla(c, 3)
    got = T._prolong_add_pallas_3d(c, u, interpret=True)
    assert got is not None
    assert float(jnp.max(jnp.abs(got - ref))) == 0.0
    # plain prolong (no add)
    ref2 = T._prolong_xla(c, 3)
    got2 = T._prolong_add_pallas_3d(c, None, interpret=True)
    assert float(jnp.max(jnp.abs(got2 - ref2))) == 0.0


def test_restrict_mean_matches_tensordot_restrict():
    """reduce_window restriction == the tensordot full-weighting (2D and 3D)."""
    from phiflow_tpu.ops.transfer import restrict_mean
    from phiflow_tpu.math._multigrid import _restrict
    rng = np.random.RandomState(7)
    for shape in [(1, 8, 12), (2, 16, 8, 6)]:
        r = jnp.asarray(rng.randn(*shape).astype(np.float32))
        ref = _restrict(r)
        got = restrict_mean(r, r.ndim - 1)
        assert float(jnp.max(jnp.abs(got - ref))) < 1e-6


def test_smooth_dot_epilogue_matches_separate_dot():
    """capture_smooth_dot: the fused triple's <z, b> epilogue equals the
    separately computed dot (interpret mode)."""
    from phiflow_tpu.ops import poisson as P
    rng = np.random.RandomState(8)
    u = jnp.asarray(rng.randn(8, 16, 256).astype(np.float32))
    b = jnp.asarray(rng.randn(8, 16, 256).astype(np.float32))
    inv = (1.0, 1.0, 1.0)
    bcs = (('neumann', 'neumann'),) * 3
    w = np.float32(0.9 / 6.0)
    box = {}
    with P.capture_smooth_dot(box, b.size):
        z = P.poisson_smooth(u, b, inv, bcs, w, 3, fuse_pairs=True,
                             use_pallas=True, interpret=True)
    assert 'dot' in box
    ref = P.poisson_smooth(u, b, inv, bcs, w, 3, fuse_pairs=True,
                           use_pallas=True, interpret=True)
    want = float(jnp.sum(ref * b))
    got = float(box['dot'])
    assert abs(got - want) / max(abs(want), 1.0) < 1e-5
    assert float(jnp.max(jnp.abs(z - ref))) == 0.0


def test_p2g_mean_kernel_matches_scatter():
    """The MXU one-hot P2G kernel (ops/p2g.py — the FLIP hot path, VERDICT r4
    #2) must match the XLA scatter mean in both outside_handling modes, keep
    NaN bases for unwritten cells, and carry the mean-scatter VJP."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from phiflow_tpu.ops.p2g import p2g_mean_3d, _p2g_xla

    rng = np.random.default_rng(0)
    N = 7000
    res = (12, 10, 14)
    pos = jnp.asarray(rng.uniform(-1, 13, (N, 3)).astype(np.float32))
    vals = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    for clamp in (True, False):
        ref_s, ref_c = _p2g_xla(pos, vals, res, (0., 0., 0.), (1., 1., 1.), clamp)
        ref = np.where(np.asarray(ref_c) > 0,
                       np.asarray(ref_s) / np.maximum(np.asarray(ref_c), 1), np.nan)
        got = np.asarray(p2g_mean_3d(pos, vals, res, (0., 0., 0.), (1., 1., 1.),
                                     clamp, float('nan'), True))
        assert np.array_equal(np.isnan(got), np.isnan(ref))
        assert np.nanmax(np.abs(got - ref)) < 5e-5  # hi/lo bf16 split precision

    def loss(vals):
        m = p2g_mean_3d(pos, vals, res, (0., 0., 0.), (1., 1., 1.), True, 0.0, True)
        w = jnp.arange(m.size, dtype=jnp.float32).reshape(m.shape) * 1e-3
        return jnp.sum(m * w)

    g = jax.grad(loss)(vals)
    i, eps = 17, 1e-2
    fd = (loss(vals.at[i].add(eps)) - loss(vals)) / eps
    np.testing.assert_allclose(float(g[i]), float(fd), atol=1e-4)
