"""Per-phase timing of the 3D FLIP step on the live backend (VERDICT r3 #3 scoping)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update('jax_compilation_cache_dir', os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from phiflow_tpu.models import FlipLiquid
from phiflow_tpu.math import Solve, ConvergenceException
from phiflow_tpu.field import CenteredGrid, StaggeredGrid, distribute_points, finite_fill, resample, mask
from phiflow_tpu.physics import advect, fluid


def timeit(f, args, n=10):
    out = f(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    return (time.perf_counter() - t0) / n * 1000, out


def main(res=64):
    model = FlipLiquid(res, dims=3)
    (particles,) = model.initial_state()
    n_particles = particles.values.shape.instance.volume
    print(f"res={res}^3  particles={n_particles}")
    sizes = {n: res for n in model._names}

    def p2g(particles):
        return resample(particles, StaggeredGrid(0, 0, model.bounds, **sizes),
                        scatter=True, outside_handling='clamp')

    def p2g_filled(particles):
        return finite_fill(p2g(particles))

    def occupied_fn(particles, grid_v):
        return resample(mask(particles),
                        CenteredGrid(0, grid_v.boundary.spatial_gradient(), model.bounds, **sizes),
                        scatter=True)

    def project(grid_v, occupied):
        g_vec = (0, 0, model.gravity * model.dt)
        return fluid.make_incompressible(
            grid_v + g_vec, [], active=occupied,
            solve=Solve('CG', model.cg_tol, 0., max_iterations=model.max_iterations,
                        suppress=(ConvergenceException,)))

    def g2p(particles, grid_v, prev_v):
        return particles + resample(grid_v - prev_v, particles)

    def advect_pts(particles, grid_v):
        return advect.points(particles, grid_v, model.dt, advect.finite_rk4)

    def push(particles):
        return fluid.boundary_push(particles, [~model.bounds])

    j = jax.jit
    ms, raw_v = timeit(j(p2g), (particles,))
    print(f"p2g (staggered scatter)      {ms:8.2f} ms")
    ms, grid_v = timeit(j(p2g_filled), (particles,))
    print(f"p2g + finite_fill            {ms:8.2f} ms")
    ms, occupied = timeit(j(occupied_fn), (particles, grid_v))
    print(f"occupied scatter             {ms:8.2f} ms")
    ms, (vel2, pressure) = timeit(j(project), (grid_v, occupied))
    print(f"make_incompressible          {ms:8.2f} ms")
    ms, particles2 = timeit(j(g2p), (particles, vel2, grid_v))
    print(f"g2p FLIP update              {ms:8.2f} ms")
    ms, particles3 = timeit(j(advect_pts), (particles2, vel2))
    print(f"advect.points finite_rk4     {ms:8.2f} ms")
    ms, _ = timeit(j(push), (particles3,))
    print(f"boundary_push                {ms:8.2f} ms")
    ms, _ = timeit(j(model.step), (particles,))
    print(f"FULL STEP                    {ms:8.2f} ms")


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
