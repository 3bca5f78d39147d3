"""Generate golden-trajectory arrays from the independent NumPy reference
(numpy_ref.py) and verify the framework matches before committing them.

Run from the repo root:  python tests/golden/generate_golden.py
Writes tests/golden/golden.npz and prints the framework-vs-reference L2 errors
(all must be < 1e-5 before the file is committed).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np

import numpy_ref as ref


def generate(n=24, steps=3, seed=7):
    rng = np.random.default_rng(seed)
    h = 1.0 / n
    data = {'n': n, 'steps': steps, 'h': h}

    # --- config 1: periodic Burgers (centered vector grid) ---
    vx = rng.standard_normal((n, n)) * 0.3
    vy = rng.standard_normal((n, n)) * 0.3
    data['burgers_vx0'], data['burgers_vy0'] = vx.copy(), vy.copy()
    nu, dt = 0.02, 0.4 * h  # CFL << 1: window clamp never active
    data['burgers_nu'], data['burgers_dt'] = nu, dt
    for _ in range(steps):
        vx, vy = ref.burgers_step(vx, vy, dt, nu, h)
    data['burgers_vx'], data['burgers_vy'] = vx, vy

    # --- config 2: closed-box projection (cavity-style MAC pressure solve) ---
    ux = rng.standard_normal((n - 1, n)) * 0.5
    uy = rng.standard_normal((n, n - 1)) * 0.5
    data['proj_ux0'], data['proj_uy0'] = ux.copy(), uy.copy()
    ux_p, uy_p, p = ref.mac_project(ux, uy, n, h)
    data['proj_ux'], data['proj_uy'], data['proj_p'] = ux_p, uy_p, p

    # --- config 3: buoyant smoke step (advect + buoyancy + project) ---
    smoke = np.exp(-(((np.arange(n) + 0.5) / n - 0.5)[:, None] ** 2 +
                     ((np.arange(n) + 0.5) / n - 0.25)[None, :] ** 2) / 0.02)
    ux = rng.standard_normal((n - 1, n)) * 0.2
    uy = rng.standard_normal((n, n - 1)) * 0.2
    data['smoke_s0'], data['smoke_ux0'], data['smoke_uy0'] = smoke.copy(), ux.copy(), uy.copy()
    buoy, dt_s = 0.5, 0.3 * h
    data['smoke_buoy'], data['smoke_dt'] = buoy, dt_s
    for _ in range(steps):
        smoke, ux, uy, p = ref.smoke_step(smoke, ux, uy, dt_s, buoy, n, h)
    data['smoke_s'], data['smoke_ux'], data['smoke_uy'] = smoke, ux, uy

    # --- config 4: obstacle-masked projection (closed box + sphere) ---
    ux = rng.standard_normal((n - 1, n)) * 0.5
    uy = rng.standard_normal((n, n - 1)) * 0.5
    cx, cy, R = 0.5, 0.5, 0.2
    data['obs_ux0'], data['obs_uy0'] = ux.copy(), uy.copy()
    data['obs_center'], data['obs_radius'] = np.array([cx, cy]), R
    ox, oy, op = ref.sphere_masked_project(ux, uy, n, h, cx, cy, R)
    data['obs_ux'], data['obs_uy'], data['obs_p'] = ox, oy, op

    # --- config 4b: MOVING + ROTATING obstacle projection (2-step trajectory:
    # the center advances by v_obs·dt between projections, so the framework side
    # must rebuild masks from a jit-TRACED center; reference recipe
    # examples/grids/Moving_Obstacles.ipynb, fluid.py:212-241) ---
    ux = rng.standard_normal((n - 1, n)) * 0.5
    uy = rng.standard_normal((n, n - 1)) * 0.5
    mv_cx, mv_cy, mv_R = 0.4, 0.45, 0.2
    mv_vx, mv_vy, mv_omega, mv_dt = 0.3, -0.2, 0.8, 0.25
    data['mv_ux0'], data['mv_uy0'] = ux.copy(), uy.copy()
    data['mv_center'], data['mv_radius'] = np.array([mv_cx, mv_cy]), mv_R
    data['mv_vel'], data['mv_omega'], data['mv_dt'] = np.array([mv_vx, mv_vy]), mv_omega, mv_dt
    for k in range(2):
        cx_k, cy_k = mv_cx + mv_vx * mv_dt * k, mv_cy + mv_vy * mv_dt * k
        ux, uy, _ = ref.sphere_masked_project(ux, uy, n, h, cx_k, cy_k, mv_R,
                                              vx_o=mv_vx, vy_o=mv_vy, omega=mv_omega)
    data['mv_ux'], data['mv_uy'] = ux, uy

    # --- config 5: 3D closed-box projection ---
    n3 = 12
    h3 = 1.0 / n3
    ux = rng.standard_normal((n3 - 1, n3, n3)) * 0.5
    uy = rng.standard_normal((n3, n3 - 1, n3)) * 0.5
    uz = rng.standard_normal((n3, n3, n3 - 1)) * 0.5
    data['p3_n'], data['p3_h'] = n3, h3
    data['p3_ux0'], data['p3_uy0'], data['p3_uz0'] = ux.copy(), uy.copy(), uz.copy()
    px, py, pz, pp = ref.mac_project_3d(ux, uy, uz, n3, h3)
    data['p3_ux'], data['p3_uy'], data['p3_uz'] = px, py, pz
    return data


def verify(data):
    """Run the framework on the same configs and report L2 errors."""
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import phiflow_tpu.math as math
    from phiflow_tpu.math import extrapolation, Solve, ConvergenceException, channel, wrap, stack
    from phiflow_tpu.field import CenteredGrid, StaggeredGrid, resample
    from phiflow_tpu.geom import Box
    from phiflow_tpu.physics import advect, diffuse, fluid
    from tests.golden.test_golden import (run_burgers, run_projection, run_smoke)  # shared runners

    n, steps, h = data['n'], data['steps'], data['h']
    errs = {}
    import phiflow_tpu.math as _math
    ctx = _math.precision(64)
    ctx.__enter__()
    vx, vy = run_burgers(data)
    errs['burgers'] = max(_l2(vx, data['burgers_vx']), _l2(vy, data['burgers_vy']))
    ux, uy = run_projection(data)
    errs['projection'] = max(_l2(ux, data['proj_ux']), _l2(uy, data['proj_uy']))
    s, ux, uy = run_smoke(data)
    errs['smoke'] = max(_l2(s, data['smoke_s']), _l2(ux, data['smoke_ux']), _l2(uy, data['smoke_uy']))
    from tests.golden.test_golden import run_obstacle_projection, run_projection_3d, \
        run_moving_obstacle_projection
    ux, uy = run_obstacle_projection(data)
    errs['obstacle'] = max(_l2(ux, data['obs_ux']), _l2(uy, data['obs_uy']))
    ux, uy = run_moving_obstacle_projection(data)
    errs['moving_obstacle'] = max(_l2(ux, data['mv_ux']), _l2(uy, data['mv_uy']))
    px, py, pz = run_projection_3d(data)
    errs['projection3d'] = max(_l2(px, data['p3_ux']), _l2(py, data['p3_uy']), _l2(pz, data['p3_uz']))
    ctx.__exit__(None, None, None)
    return errs


def _l2(a, b):
    return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))


if __name__ == '__main__':
    data = generate()
    path = os.path.join(os.path.dirname(__file__), 'golden.npz')
    np.savez_compressed(path, **data)
    print(f"wrote {path}")
    errs = verify(data)
    for k, v in errs.items():
        status = "OK" if v < 1e-5 else "MISMATCH"
        print(f"{k}: L2 {v:.3e}  [{status}]")
    assert all(v < 1e-5 for v in errs.values()), "framework does not match the NumPy reference"
