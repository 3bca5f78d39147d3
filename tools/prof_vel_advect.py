"""Break down the velocity self-advection phase at a given resolution:
displacement build (sample_grid_at_centers x6), window kernels given
precomputed displacements, staging, and the full phase.

Usage: python tools/prof_vel_advect.py [resolution]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return sum(float(np.asarray(jnp.sum(l))) for l in leaves if hasattr(l, 'dtype'))


def timeit(f, args, n=6):
    jf = jax.jit(f)
    out = jf(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = jf(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1000


def main(res=512):
    from phiflow_tpu.models import SmokePlume
    from phiflow_tpu.physics import advect
    from phiflow_tpu.physics.advect import _euler_disp_natives, _window_interp_field_native
    from phiflow_tpu.field import resample

    model = SmokePlume(resolution=res, dims=3)
    v, s, p = model.initial_state()
    step = jax.jit(model.step, donate_argnums=(0, 1, 2))
    for _ in range(3):
        v, s, p = step(v, s, p)
    _sync(s)

    dt = model.dt

    def disp_only(vel):
        fast = _euler_disp_natives(vel, vel, -dt)
        disp_map, scales = fast
        return disp_map

    t = timeit(disp_only, (v,))
    print(f"disp build (6 interps + 3 alias): {t:.1f} ms")

    def full_semi_lagrangian(vel):
        return advect.semi_lagrangian(vel, vel, dt, max_cells=model.max_cells).values

    t_full = timeit(full_semi_lagrangian, (v,))
    print(f"semi_lagrangian(v, v) total: {t_full:.1f} ms")

    # window kernels only, with displacement arrays precomputed OUTSIDE
    fast = _euler_disp_natives(v, v, -dt)
    disp_map, scales = fast
    disp_concrete = jax.jit(lambda vel: _euler_disp_natives(vel, vel, -dt)[0])(v)

    def kernels_only(vel, dmap):
        return _window_interp_field_native(vel, (dmap, scales), model.max_cells)

    t_k = timeit(kernels_only, (v, disp_concrete))
    print(f"window kernels only (3 comps, disp precomputed): {t_k:.1f} ms")

    def buoyancy_only(vel, smoke):
        return model.advect_velocity(vel, smoke).values

    t_b = timeit(buoyancy_only, (v, s))
    print(f"advect_velocity full phase (incl. buoyancy): {t_b:.1f} ms")

    # single component window kernel
    from phiflow_tpu.math._nd import shift_window_interp
    comp = v.vector['x']

    def one_comp(vel, dmap):
        return shift_window_interp(vel.vector['x'].values, dmap['x'], comp.boundary,
                                   model.max_cells, disp_scale=scales)

    t_1 = timeit(one_comp, (v, disp_concrete))
    print(f"one component window kernel: {t_1:.1f} ms")


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
