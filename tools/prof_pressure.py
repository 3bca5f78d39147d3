"""Pressure-solve microbenchmarks at a given resolution: divergence, one
Poisson matvec, one MG V-cycle, and the full projection with its CG iteration
count — localizes where the 512^3 projection time goes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update('jax_compilation_cache_dir', os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import jax.numpy as jnp
import numpy as np


def _sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return sum(float(np.asarray(jnp.sum(l))) for l in leaves if hasattr(l, 'dtype'))


def timeit(f, args, n=6, donate=None):
    jf = jax.jit(f, donate_argnums=donate) if donate else jax.jit(f)
    out = jf(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = jf(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1000


def main(res=512):
    from phiflow_tpu.models import SmokePlume
    from phiflow_tpu.math import Solve, SolveTape, ConvergenceException
    from phiflow_tpu.physics import fluid
    from phiflow_tpu.field import divergence
    from phiflow_tpu.ops import poisson
    from phiflow_tpu.math._multigrid import make_poisson_vcycle

    model = SmokePlume(resolution=res, dims=3)
    v, s, p = model.initial_state()
    step = jax.jit(model.step, donate_argnums=(0, 1, 2))
    for _ in range(3):
        v, s, p = step(v, s, p)
    _sync(p.values.native())

    # raw array benchmarks
    shape = (res,) * 3
    key = jax.random.PRNGKey(0)
    arr = jax.random.normal(key, shape, jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)
    bc = (('neumann', 'neumann'),) * 2 + (('neumann', 'neumann'),)
    inv = (1.0, 1.0, 1.0)

    print(f"copy (read+write 1 field): {timeit(lambda x: x + 1.0, (arr,)):.2f} ms")
    print(f"poisson matvec: {timeit(lambda x: poisson.poisson_apply(x, inv, bc), (arr,)):.2f} ms")
    print(f"poisson jacobi (1 sweep): {timeit(lambda x, bb: poisson.poisson_apply(x, inv, bc, b=bb, mode='jacobi', omega_over_diag=0.15), (arr, b)):.2f} ms")
    vc = make_poisson_vcycle(shape, (1., 1., 1.), bc)
    print(f"MG V-cycle: {timeit(lambda x: vc(x.reshape((1,) + shape)), (b,)):.2f} ms")
    print(f"dot(a,b): {timeit(lambda x, y: jnp.vdot(x, y), (arr, b)):.2f} ms")
    print(f"axpy: {timeit(lambda x, y: x + 0.5 * y, (arr, b)):.2f} ms")

    print(f"divergence(v): {timeit(lambda vv: divergence(vv), (v,)):.2f} ms")

    def project_iters(vel, prev_p):
        solve = Solve('CG', model.cg_tol, 0., x0=prev_p, max_iterations=100,
                      suppress=(ConvergenceException,), implicit_diff=False)
        with SolveTape() as tape:
            vel2, p2 = fluid.make_incompressible(vel, (), solve)
        return vel2, p2, tape.solve_infos[-1].iterations

    f = jax.jit(project_iters)
    v3, p3, it = f(v, p)
    _sync(v3.values.components[0].native())
    print(f"projection CG iterations: {int(np.asarray(it))}")
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        v3, p3, it = f(v, p)
    _sync(v3.values.components[0].native())
    print(f"projection (same state, x0=prev p): {(time.perf_counter()-t0)/n*1000:.1f} ms")


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
