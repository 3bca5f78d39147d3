"""Round-4 perf triage: break the FLIP step and the smoke pressure phase into
sub-phases on the real chip, plus a scatter micro-benchmark comparing P2G
strategies. Run: python tools/profile_r4.py [flip|pressure|scatter]"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(*xs):
    for x in jax.tree_util.tree_leaves(xs):
        if hasattr(x, 'block_until_ready'):
            x.block_until_ready()


def timeit(f, args, n=10):
    out = f(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1000


def profile_flip(res=64, dims=3):
    from phiflow_tpu.models import FlipLiquid
    from phiflow_tpu.field import CenteredGrid, StaggeredGrid, distribute_points, finite_fill, resample, mask
    from phiflow_tpu.physics import advect, fluid
    from phiflow_tpu.math import Solve, ConvergenceException

    model = FlipLiquid(resolution=res, dims=dims)
    (particles,) = model.initial_state()
    step = jax.jit(lambda p: model.step(p))
    for _ in range(3):
        (particles,) = step(particles)
    _sync(particles)
    print(f"full step: {timeit(step, (particles,), 5):.2f} ms")

    r = model.resolution
    sizes = {n: r for n in model._names}

    def p2g(particles):
        return resample(particles, StaggeredGrid(0, 0, model.bounds, **sizes),
                        scatter=True, outside_handling='clamp')
    f_p2g = jax.jit(p2g)
    grid_raw = f_p2g(particles)
    print(f"p2g scatter: {timeit(f_p2g, (particles,), 10):.2f} ms")

    f_fill = jax.jit(finite_fill)
    grid_v = f_fill(grid_raw)
    print(f"finite_fill: {timeit(f_fill, (grid_raw,), 10):.2f} ms")

    def occ(particles):
        return resample(mask(particles), CenteredGrid(0, grid_v.boundary.spatial_gradient(),
                                                      model.bounds, **sizes), scatter=True)
    f_occ = jax.jit(occ)
    occupied = f_occ(particles)
    print(f"occupancy scatter: {timeit(f_occ, (particles,), 10):.2f} ms")

    g_vec = (0,) * (len(model._names) - 1) + (model.gravity * model.dt,)

    def press(grid_v, occupied):
        return fluid.make_incompressible(grid_v + g_vec, [], active=occupied,
                                         solve=Solve('CG', model.cg_tol, 0.,
                                                     max_iterations=model.max_iterations,
                                                     suppress=(ConvergenceException,)))
    f_press = jax.jit(press)
    vp = f_press(grid_v, occupied)
    print(f"pressure (masked): {timeit(f_press, (grid_v, occupied), 5):.2f} ms")
    v2 = vp[0]

    def g2p(particles, v2, grid_v):
        return particles + resample(v2 - grid_v, particles)
    f_g2p = jax.jit(g2p)
    pts = f_g2p(particles, v2, grid_v)
    print(f"g2p flip update: {timeit(f_g2p, (particles, v2, grid_v), 10):.2f} ms")

    def adv(particles, v2):
        return advect.points(particles, v2, model.dt, advect.finite_rk4)
    f_adv = jax.jit(adv)
    _ = f_adv(pts, v2)
    print(f"advect rk4: {timeit(f_adv, (pts, v2), 10):.2f} ms")

    f_push = jax.jit(lambda p: fluid.boundary_push(p, [~model.bounds]))
    _ = f_push(pts)
    print(f"boundary_push: {timeit(f_push, (pts,), 10):.2f} ms")


def profile_pressure(res=256):
    from phiflow_tpu.models import SmokePlume
    from phiflow_tpu.physics import fluid
    from phiflow_tpu.math import Solve, ConvergenceException

    model = SmokePlume(resolution=res, dims=3)
    v, s, p = model.initial_state()
    step = jax.jit(model.step)
    for _ in range(3):
        v, s, p = step(v, s, p)
    _sync(v)
    if model._fused_advect_available(v, s):
        v2, s2 = jax.jit(model._fused_advect)(v, s)
    else:
        s2 = jax.jit(model.advect_smoke)(v, s)
        v2 = jax.jit(model.advect_velocity)(v, s2)
    _sync(v2)

    f_proj = jax.jit(model.project)
    out = f_proj(v2, p)
    print(f"projection total: {timeit(f_proj, (v2, p), 10):.2f} ms")

    # sub-phases: divergence, one matvec, one V-cycle application, CG algebra
    from phiflow_tpu.field import divergence as fdiv

    f_div = jax.jit(lambda v: fdiv(v, order=2))
    div = f_div(v2)
    print(f"divergence: {timeit(f_div, (v2,), 10):.2f} ms")

    x0 = fluid.Field(div.geometry, div.values * 0, fluid._pressure_extrapolation(v2.boundary))

    def matvec(x):
        return fluid.masked_laplace(x, v2.boundary, None, None, wide_stencil=False, order=2)
    f_mv = jax.jit(matvec)
    _ = f_mv(x0.with_values(div.values))
    print(f"poisson matvec: {timeit(f_mv, (x0.with_values(div.values),), 20):.3f} ms")

    M = fluid._grid_multigrid_preconditioner(x0, v2.boundary)
    f_M = jax.jit(M)
    _ = f_M(div)
    print(f"V-cycle: {timeit(f_M, (div,), 20):.3f} ms")

    # CG algebra per iteration (dots + axpys at this size)
    a = div.values.native()

    def algebra(x, r, pvec, ap):
        alpha = jnp.sum(pvec * ap)
        rr = jnp.sum(r * r)
        x = x + alpha * pvec
        r = r - alpha * ap
        rz = jnp.sum(r * x)
        pvec = r + (rz / alpha) * pvec
        return x, r, pvec, rz + rr
    f_alg = jax.jit(algebra)
    _ = f_alg(a, a, a, a)
    print(f"CG algebra/iter: {timeit(f_alg, (a, a, a, a), 20):.3f} ms")


def profile_scatter(res=64, n_particles=125000):
    key = jax.random.PRNGKey(0)
    C = res ** 3
    ids = jax.random.randint(key, (n_particles,), 0, C)
    vals = jax.random.normal(jax.random.PRNGKey(1), (n_particles,))

    def plain_add(ids, vals):
        return jnp.zeros((C,), jnp.float32).at[ids].add(vals)
    print(f"scatter-add plain: {timeit(jax.jit(plain_add), (ids, vals), 20):.3f} ms")

    def plain_mean(ids, vals):
        tot = jnp.zeros((C,), jnp.float32).at[ids].add(vals)
        cnt = jnp.zeros((C,), jnp.float32).at[ids].add(jnp.ones_like(vals))
        return jnp.where(cnt > 0, tot / jnp.maximum(cnt, 1), 0)
    print(f"scatter-mean plain: {timeit(jax.jit(plain_mean), (ids, vals), 20):.3f} ms")

    def sorted_add(ids, vals):
        sid, sval = jax.lax.sort([ids, vals], num_keys=1)
        return jnp.zeros((C,), jnp.float32).at[sid].add(sval, indices_are_sorted=True)
    print(f"sort+scatter-add sorted-hint: {timeit(jax.jit(sorted_add), (ids, vals), 20):.3f} ms")

    def sort_only(ids, vals):
        return jax.lax.sort([ids, vals], num_keys=1)
    print(f"sort only: {timeit(jax.jit(sort_only), (ids, vals), 20):.3f} ms")

    def cumsum_seg(ids, vals):
        sid, sval = jax.lax.sort([ids, vals], num_keys=1)
        csum = jnp.cumsum(sval)
        ccnt = jnp.cumsum(jnp.ones_like(sval))
        is_last = jnp.concatenate([sid[1:] != sid[:-1], jnp.array([True])])
        idx = jnp.where(is_last, sid, C)
        end = jnp.zeros((C + 1,), jnp.float32).at[idx].max(jnp.where(is_last, csum, -jnp.inf),
                                                           unique_indices=False)
        endc = jnp.zeros((C + 1,), jnp.float32).at[idx].max(jnp.where(is_last, ccnt, -jnp.inf))
        is_first = jnp.concatenate([jnp.array([True]), sid[1:] != sid[:-1]])
        idxf = jnp.where(is_first, sid, C)
        csum_ex = csum - sval
        ccnt_ex = ccnt - 1
        start = jnp.zeros((C + 1,), jnp.float32).at[idxf].min(jnp.where(is_first, csum_ex, jnp.inf))
        startc = jnp.zeros((C + 1,), jnp.float32).at[idxf].min(jnp.where(is_first, ccnt_ex, jnp.inf))
        tot = (end - start)[:C]
        cnt = (endc - startc)[:C]
        return jnp.where(cnt > 0, tot / jnp.maximum(cnt, 1), 0)
    print(f"sort+cumsum-seg mean: {timeit(jax.jit(cumsum_seg), (ids, vals), 20):.3f} ms")

    def segsum(ids, vals):
        sid, sval = jax.lax.sort([ids, vals], num_keys=1)
        return jax.ops.segment_sum(sval, sid, num_segments=C, indices_are_sorted=True)
    print(f"sort+segment_sum: {timeit(jax.jit(segsum), (ids, vals), 20):.3f} ms")


if __name__ == '__main__':
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    if which in ('flip', 'all'):
        print('== FLIP 64^3 ==')
        profile_flip()
    if which in ('pressure', 'all'):
        print('== pressure 256^3 ==')
        profile_pressure(256)
    if which in ('scatter', 'all'):
        print('== scatter micro ==')
        profile_scatter()
