"""Kernel-level profiling for the smoke-plume hot path — tunnel-proof.

Per-call timings through the axon tunnel carry a ~2-4 ms round-trip, so every
measurement here runs the op k times inside ONE jitted lax.scan and reports the
slope (t(k_hi) − t(k_lo)) / (k_hi − k_lo): pure device execution time per
application, no dispatch pollution.

Usage: python tools/prof_kernels.py [256 [512 ...]]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _setup():
    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), '.jax_cache')
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    return jax


def _sync(x):
    import jax
    import jax.numpy as jnp
    leaves = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, 'dtype')]
    return sum(float(np.asarray(jnp.sum(l))) for l in leaves)


def slope_time(jax, fn, init, k_lo=2, k_hi=10, reps=3):
    """fn: state -> state (same pytree). Returns seconds per application."""
    import jax.numpy as jnp

    def k_fold(k):
        def run(state):
            def body(s, _):
                return fn(s), None
            s, _ = jax.lax.scan(body, state, None, length=k)
            return s
        return jax.jit(run)

    f_lo, f_hi = k_fold(k_lo), k_fold(k_hi)
    _sync(f_lo(init)); _sync(f_hi(init))  # compile

    def timed(f):
        best = float('inf')
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(init)
            _sync(out)
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(f_lo), timed(f_hi)
    return (t_hi - t_lo) / (k_hi - k_lo)


def report(label, secs, passes=None, cells=None):
    msg = f"{label:14s} {secs * 1e3:8.3f} ms"
    if passes is not None and cells is not None:
        gbs = passes * cells * 4 / secs / 1e9
        msg += f"   {gbs:6.1f} GB/s effective ({passes} ideal passes)"
    print(msg, flush=True)


def main(resolutions):
    jax = _setup()
    import jax.numpy as jnp
    from phiflow_tpu.ops import poisson
    from phiflow_tpu.math._multigrid import make_poisson_vcycle
    from phiflow_tpu.models import SmokePlume

    print(f"device: {jax.devices()[0]}", flush=True)
    for R in resolutions:
        N = R ** 3
        print(f"\n=== {R}^3 ({N / 1e6:.0f} Mcells, {N * 4 / 2 ** 20:.0f} MB/field) ===", flush=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (R, R, R), jnp.float32)
        b = jax.random.normal(jax.random.PRNGKey(1), (R, R, R), jnp.float32)

        t = slope_time(jax, lambda s: 0.5 * s + 1.0, x)
        report('axpy-ish', t, passes=2, cells=N)

        bc = (('neumann', 'neumann'),) * 3
        inv_dx2 = (1.0, 1.0, 1.0)
        t = slope_time(jax, lambda p: poisson.poisson_apply(p, inv_dx2, bc, mode='matvec'), x)
        report('matvec', t, passes=2, cells=N)
        t = slope_time(jax, lambda u: poisson.poisson_apply(u, inv_dx2, bc, b=b, mode='jacobi',
                                                            omega_over_diag=0.15), x)
        report('jacobi1', t, passes=3, cells=N)
        t = slope_time(jax, lambda bb: poisson.poisson_smooth(None, bb, inv_dx2, bc, 0.15, 3, zero_init=True), b)
        report('jacobi3z', t, passes=2, cells=N)
        vcycle = make_poisson_vcycle((R, R, R), (1., 1., 1.), bc)
        t = slope_time(jax, lambda bb: vcycle(bb.reshape(1, R, R, R)).reshape(R, R, R), b)
        report('vcycle', t, passes=8, cells=N)
        del x, b
        import gc
        gc.collect()

        model = SmokePlume(resolution=R, dims=3)
        v0, s0, p0 = model.initial_state()
        step = jax.jit(model.step)
        v, s, p = step(v0, s0, p0)
        v, s, p = step(v, s, p)  # realistic fields, stable pytree
        _sync(s.values.native())
        del v0, s0, p0

        t = slope_time(jax, lambda st: (st[0], model.advect_smoke(st[0], st[1]), st[2]), (v, s, p),
                       k_lo=2, k_hi=6)
        report('advect_smoke', t)
        t = slope_time(jax, lambda st: (model.advect_velocity(st[0], st[1]), st[1], st[2]), (v, s, p),
                       k_lo=2, k_hi=6)
        report('advect_vel', t)

        def proj_step(st):
            vv, ss, pp = st
            v2, p2 = model.project(vv, pp)
            return v2, ss, p2
        t = slope_time(jax, proj_step, (v, s, p), k_lo=2, k_hi=6)
        report('project', t)

        def full(st):
            return model.step(*st)
        t = slope_time(jax, full, (v, s, p), k_lo=1, k_hi=5)
        report('full_step', t)
        print(f"{'':14s} -> {N / t / 1e6:.1f} Mcells/s", flush=True)
        del v, s, p
        gc.collect()


if __name__ == '__main__':
    main([int(a) for a in sys.argv[1:]] or [256])
