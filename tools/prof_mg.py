"""Slope-timed microbenchmarks of the MG V-cycle pieces at a given resolution.

The axon tunnel's host readback costs ~54 ms, so single-dispatch timings are
polluted. Here every op is timed by the SLOPE between 10 and 60 chained
dispatches with one sync at the end — per-op cost to ~0.1 ms accuracy.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    leaves = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, 'dtype')]
    return sum(float(np.asarray(jnp.sum(l))) for l in leaves)


def slope(f, x, n_lo=10, n_hi=60):
    """Per-call ms for chained y = f(y) dispatches (f must be shape-preserving
    in its first arg)."""
    jf = jax.jit(f)
    y = jf(x)
    sync(y)

    def run(n):
        t0 = time.perf_counter()
        y = x
        for _ in range(n):
            y = jf(y)
        sync(y)
        return time.perf_counter() - t0
    run(5)
    t_lo, t_hi = run(n_lo), run(n_hi)
    return (t_hi - t_lo) / (n_hi - n_lo) * 1000


def main(res=512):
    from phiflow_tpu.ops import poisson
    from phiflow_tpu.math._multigrid import make_poisson_vcycle, _restrict, _prolong

    shape = (res,) * 3
    GB = np.prod(shape) * 4 / 1e9
    b = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)
    bc = (('neumann', 'neumann'),) * 3
    inv = (1.0, 1.0, 1.0)
    w = np.float32(0.9 / 6.0)

    t = slope(lambda x: x * np.float32(1.0000001), b)
    print(f"copy pass:            {t:6.2f} ms  ({2*GB/(t/1e3):5.0f} GB/s)  [field = {GB*1e3:.0f} MB]")
    t = slope(lambda x: poisson.poisson_apply(x, inv, bc), b)
    print(f"matvec:               {t:6.2f} ms  ({2*GB/(t/1e3):5.0f} GB/s apparent)")
    t = slope(lambda x: poisson.poisson_apply(x, inv, bc, b=x, mode='residual'), b)
    print(f"residual (b=x):       {t:6.2f} ms")
    t = slope(lambda x: poisson.poisson_smooth(None, x, inv, bc, w, 3, zero_init=True, fuse_pairs=True), b)
    print(f"pre-smooth nu=3 zi:   {t:6.2f} ms  (ideal 2 passes = {2*GB/742*1e3:.2f})")
    t = slope(lambda x: poisson.poisson_smooth(x, x * np.float32(0.5), inv, bc, w, 3, zero_init=False, fuse_pairs=True), b)
    print(f"post-smooth nu=3:     {t:6.2f} ms  (ideal 3 passes + the b-producing pass)")
    t = slope(lambda x: _prolong(_restrict(x.reshape((1,) + shape))).reshape(shape), b)
    print(f"restrict+prolong:     {t:6.2f} ms  (ideal ~2.2 passes)")
    vc = make_poisson_vcycle(shape, (1., 1., 1.), bc)
    t = slope(lambda x: vc(x.reshape((1,) + shape)).reshape(shape), b)
    print(f"V-cycle:              {t:6.2f} ms")
    # one full CG iteration worth of vector algebra (no matvec/M)
    def cg_alg(x):
        p, r = x, x * np.float32(0.999)
        alpha = jnp.float32(0.5)
        x2 = x + alpha * p
        r2 = r - alpha * p
        rr = jnp.sum(r2 * r2)
        p2 = r2 + (rr / (rr + 1)) * p
        return x2 + 0 * p2
    t = slope(cg_alg, b)
    print(f"cg vec algebra:       {t:6.2f} ms")


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
