"""Decompose semi-Lagrangian / MacCormack advection cost at one resolution.

Slope-timed (lax.scan) like prof_kernels.py — pure device time per part:

  disp_prep      _sample_velocity(v, v): 9 staggered comp-interps
  win1_raw       shift_window_interp on ONE centered comp, K forced 1
  win2_raw       same with K=2 (adaptive cond active)
  win_field      _window_interp_field over the staggered field (3 comps)
  sl_vel         full semi_lagrangian(v, v, dt)
  mc_smoke       full mac_cormack(s, v, dt)

Usage: python tools/prof_advect.py [256]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from prof_kernels import _setup, _sync, slope_time, report  # noqa: E402


def main(R):
    jax = _setup()
    import jax.numpy as jnp
    from phiflow_tpu.models import SmokePlume
    from phiflow_tpu.physics import advect
    from phiflow_tpu.physics.advect import _sample_velocity, _displacement, _window_interp_field
    from phiflow_tpu.math._nd import shift_window_interp

    print(f"device: {jax.devices()[0]}  R={R}^3", flush=True)
    N = R ** 3
    model = SmokePlume(resolution=R, dims=3)
    v0, s0, p0 = model.initial_state()
    step = jax.jit(model.step)
    v, s, p = step(v0, s0, p0)
    v, s, p = step(v, s, p)
    _sync(s.values.native())
    del v0, s0, p0

    # --- displacement prep: sample all 3 comps at all 3 staggered point sets ---
    def prep(st):
        vv, ss = st
        d = _sample_velocity(vv, vv)
        # fold back into a same-structure state to keep scan carry type stable
        return vv.with_values(vv.values + 0 * d), ss
    t = slope_time(jax, prep, (v, s), k_lo=2, k_hi=6)
    report('disp_prep', t)

    # --- raw window kernel on one centered component ---
    key = jax.random.PRNGKey(0)
    from phiflow_tpu.math import Tensor, spatial, channel, wrap
    names = tuple(s.resolution.names)
    grid = s.values
    disp_small = Tensor(0.8 * jax.random.normal(key, (3,) + (R,) * 3, jnp.float32),
                        channel(vector=names) & spatial(**{n: R for n in names}))

    def win_k1(g):
        return shift_window_interp(g, disp_small, s.boundary, 1)
    t = slope_time(jax, win_k1, grid, k_lo=2, k_hi=8)
    report('win1_raw', t, passes=5, cells=N)

    def win_k2(g):
        return shift_window_interp(g, disp_small, s.boundary, 2)
    t = slope_time(jax, win_k2, grid, k_lo=2, k_hi=8)
    report('win2_raw', t, passes=5, cells=N)

    def win_k2x(g):
        return shift_window_interp(g, disp_small, s.boundary, 2, compute_extrema=True)[0]
    t = slope_time(jax, win_k2x, grid, k_lo=2, k_hi=8)
    report('win2_extrema', t, passes=7, cells=N)

    # --- staggered field window interp with fixed displacement ---
    disp = _displacement(v, v, -model.dt, advect.euler)

    def win_field(st):
        vv, ss = st
        vals = _window_interp_field(vv, disp, model.max_cells)
        return vv.with_values(vals), ss
    t = slope_time(jax, win_field, (v, s), k_lo=2, k_hi=6)
    report('win_field(3)', t)

    # --- full phases ---
    def sl(st):
        vv, ss = st
        return advect.semi_lagrangian(vv, vv, model.dt, max_cells=model.max_cells), ss
    t = slope_time(jax, sl, (v, s), k_lo=2, k_hi=6)
    report('sl_vel', t)

    def mc(st):
        vv, ss = st
        return vv, advect.mac_cormack(ss, vv, model.dt, max_cells=model.max_cells)
    t = slope_time(jax, mc, (v, s), k_lo=2, k_hi=6)
    report('mc_smoke', t)


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
