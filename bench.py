"""Benchmark: 3D smoke plume cells/sec/chip (driver metric, BASELINE.md).

Runs the flagship config (MacCormack smoke + semi-Lagrangian staggered velocity +
pressure CG projection — reference recipe examples/grids/Smoke_Plume.ipynb) on
the default device and prints ONE JSON line. Per-phase timings (advect_smoke /
advect_velocity / pressure projection) and CG iteration counts are included so
perf regressions can be localized.
"""
import json
import os
import sys
import time


def _setup_jax():
    import jax
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), '.jax_cache')
    os.makedirs(cache, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    return jax


def _hard_sync(*fields):
    """Block until computed: reduce ON DEVICE and fetch one scalar per field —
    np.asarray(full_field) would pull resolution³ floats through the tunnel."""
    import numpy as np
    import jax.numpy as jnp
    out = 0.0
    for f in fields:
        t = f.values if hasattr(f, 'values') else f
        if hasattr(t, 'components'):
            natives = [c.native() for c in t.components]
        elif hasattr(t, 'native'):
            natives = [t.native()]
        else:
            natives = [t]  # raw jax array
        out += sum(float(np.asarray(jnp.sum(n))) for n in natives)
    return out


def _time_fn(fn, args, steps, sync):
    """Median-free simple timing: total wall clock over `steps` calls + sync."""
    out = None
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / steps, out


def _retrace_guard(jitted, label):
    """Snapshot the jit cache size post-warmup; calling the returned check after
    the timed loop raises if the cache grew — a growing cache means the model
    re-traces (and on TPU re-fetches executables) EVERY step, so every timing
    below it would be silently wrong (this shipped a 100x-wrong FLIP number in
    BENCH_r02.json)."""
    size0 = jitted._cache_size()

    def check():
        size1 = jitted._cache_size()
        if size1 != size0:
            raise RuntimeError(
                f"{label}: jit cache grew {size0} -> {size1} during the timed loop — per-step retrace")
    return check


def _dispatch_overhead_ms(jax, n=20):
    """Per-call dispatch+sync overhead through the runtime (axon tunnel: ~12-15 ms).
    Phase timings below ~3x this number measure the tunnel, not the kernel."""
    import jax.numpy as jnp
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    x = f(x)
    _hard_sync(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(x)
    _hard_sync(x)
    return (time.perf_counter() - t0) / n * 1000


def run_bench(resolution: int, dims: int = 3, steps: int = 20, warmup: int = 3, cg_tol: float = 1e-3,
              max_iterations: int = 100, phases: bool = True):
    jax = _setup_jax()
    from phiflow_tpu.models import SmokePlume
    from phiflow_tpu.math import SolveTape

    model = SmokePlume(resolution=resolution, dims=dims, cg_tol=cg_tol, max_iterations=max_iterations)
    v, s, p = model.initial_state()

    # the timed 3D configs MUST run the fused advection megakernel (VERDICT r4
    # #4/#3): a silent fall-back to the ~90-pass per-component path would
    # publish numbers for the wrong code path
    if dims == 3:
        from phiflow_tpu.ops import advect3d
        if advect3d.pallas_ok() and advect3d.supported((resolution,) * 3, model.max_cells):
            assert model._fused_advect_available(v, s), \
                f"fused advection path inactive for the timed {resolution}^3 config"
        else:
            sys.stderr.write(f"note: fused advect kernel unavailable at {resolution}^{dims} "
                             f"(pallas_ok={advect3d.pallas_ok()})\n")

    # batch several physics steps into one dispatch at small sizes — the axon
    # tunnel costs ~12 ms per call, comparable to the whole step below 128³
    steps_per_call = 4 if resolution <= 128 else 1

    def multi_step(v, s, p):
        for _ in range(steps_per_call):
            v, s, p = model.step(v, s, p)
        return v, s, p

    # donate the state buffers: XLA reuses them for the outputs, halving the
    # resident state footprint (critical at 512³ where velocity alone is 1.6GB)
    step = jax.jit(multi_step, donate_argnums=(0, 1, 2))
    t_compile = time.perf_counter()
    # warmup: ≥2 calls — the state pytree structure stabilizes after the first step
    for _ in range(max(warmup, 2)):
        v, s, p = step(v, s, p)
    _hard_sync(s)
    t_compile = time.perf_counter() - t_compile

    check_retrace = _retrace_guard(step, f'smoke {resolution}^{dims}')
    calls = max(1, steps // steps_per_call)
    t0 = time.perf_counter()
    vv, ss, pp = v, s, p
    for _ in range(calls):
        vv, ss, pp = step(vv, ss, pp)
    _hard_sync(ss)
    elapsed = time.perf_counter() - t0
    check_retrace()
    v, s, p = vv, ss, pp  # donated inputs are invalid; keep only the live state
    per_step = elapsed / (calls * steps_per_call)
    cells = resolution ** dims
    result = {
        'resolution': resolution,
        'dims': dims,
        'per_step_ms': per_step * 1000,
        'cells_per_sec': cells / per_step,
        'compile_s': t_compile,
    }
    # --- CFL certification: the headline number must bench UNCLAMPED physics ---
    # (the window kernel clamps |disp| > max_cells; auto-substeps extend exactness
    # to max_cells * max_substeps — certify we stay inside that envelope)
    try:
        import numpy as _np
        from phiflow_tpu.physics import advect as _advect
        probe = jax.jit(lambda v, s: (_advect.max_displacement_cells(s, v, model.dt),
                                      _advect.max_displacement_cells(v, v, model.dt)))
        m_smoke, m_vel = probe(v, s)
        max_disp = max(float(_np.asarray(m_smoke)), float(_np.asarray(m_vel)))
        result['max_disp_cells'] = round(max_disp, 3)
        envelope = model.max_cells  # static single-pass window (SmokePlume.advect_smoke)
        result['certified_unclamped'] = bool(max_disp <= envelope)
        if max_disp > envelope:
            sys.stderr.write(f"WARNING bench {resolution}^{dims}: max displacement {max_disp:.2f} cells "
                             f"exceeds the exact envelope {envelope} — timings bench clamped physics!\n")
    except Exception as exc:
        sys.stderr.write(f"CFL probe failed at {resolution}^{dims}: {type(exc).__name__}: {exc}\n")

    if phases:
        # --- per-phase timings by IN-STEP DIFFERENCING (VERDICT r4 #4b) ---
        # Time the same donated multi-step jit with the projection replaced by
        # identity: advect_ms = that variant, pressure_ms = per_step - advect_ms.
        # By construction advect_ms + pressure_ms == per_step_ms, so the JSON is
        # self-consistent (the old isolated re-jits measured non-donated,
        # separately-scheduled programs and summed to more than the step).
        import numpy as np
        from phiflow_tpu.math import Solve, ConvergenceException
        from phiflow_tpu.physics import fluid

        ph = {}

        def project_with_iters(vel, prev_p):
            """Projection with a forward-only solve (implicit_diff=False) so the
            CG iteration count is a main-trace value we can return from jit."""
            solve = Solve('CG', model.cg_tol, 0., x0=prev_p, max_iterations=model.max_iterations,
                          suppress=(ConvergenceException,), implicit_diff=False)
            with SolveTape() as tape:
                vel2, p2 = fluid.make_incompressible(vel, (), solve)
            return vel2, p2, tape.solve_infos[-1].iterations

        try:
            # probe on the POST-ADVECT velocity (the in-step solve's actual
            # input) — projecting the already-projected state would measure a
            # near-converged warm start, not the real per-step iteration count
            def one_advect(v, s):
                if model._fused_advect_available(v, s):
                    v2, _ = model._fused_advect(v, s)
                    return v2
                s2 = model.advect_smoke(v, s)
                return model.advect_velocity(v, s2)

            v_adv = jax.jit(one_advect)(v, s)
            f_proj_it = jax.jit(project_with_iters)
            v3, p3, iters = f_proj_it(v_adv, p)
            _hard_sync(v3)
            ph['cg_iterations'] = int(np.asarray(iters))
            del v3, p3, v_adv
        except Exception as exc:
            sys.stderr.write(f"iteration probe failed at {resolution}^{dims}: {type(exc).__name__}: {exc}\n")

        try:
            def multi_step_advect_only(v, s, p):
                for _ in range(steps_per_call):
                    if model._fused_advect_available(v, s):
                        v, s = model._fused_advect(v, s)
                    else:
                        s = model.advect_smoke(v, s)
                        v = model.advect_velocity(v, s)
                return v, s, p

            # seeded with the live state, which is DONATED here — (v, s, p) are
            # invalid after this block, so it must run last at this resolution
            adv_step = jax.jit(multi_step_advect_only, donate_argnums=(0, 1, 2))
            va, sa, pa = adv_step(v, s, p)
            va, sa, pa = adv_step(va, sa, pa)
            _hard_sync(sa)
            calls_a = max(1, steps // steps_per_call)
            t0 = time.perf_counter()
            for _ in range(calls_a):
                va, sa, pa = adv_step(va, sa, pa)
            _hard_sync(sa)
            advect_ms = (time.perf_counter() - t0) / (calls_a * steps_per_call) * 1000
            del va, sa, pa
            ph['advect_ms'] = advect_ms
            ph['pressure_ms'] = per_step * 1000 - advect_ms
        except Exception as exc:
            sys.stderr.write(f"advect phase timing failed at {resolution}^{dims}: {type(exc).__name__}: {exc}\n")
        result['phases'] = ph
    return result


def run_kolmogorov(resolution: int = 512, steps: int = 10, warmup: int = 2, order: int = 6):
    """Flagship config #4 (BASELINE.md): order-6 Kolmogorov flow with
    incompressible_rk4 — validates the FFT-free compact-scheme path on TPU."""
    jax = _setup_jax()
    from phiflow_tpu.models import KolmogorovFlow
    model = KolmogorovFlow(resolution=resolution, order=order, dt=0.002)
    v, p = model.initial_state()
    steps_per_call = 4

    def multi_step(v, p):
        for _ in range(steps_per_call):
            v, p = model.step(v, p)
        return v, p

    step = jax.jit(multi_step)
    for _ in range(max(warmup, 2)):
        v, p = step(v, p)
    _hard_sync(v)
    check_retrace = _retrace_guard(step, f'kolmogorov {resolution}^2')
    calls = max(1, steps // steps_per_call)
    t0 = time.perf_counter()
    for _ in range(calls):
        v, p = step(v, p)
    _hard_sync(v)
    per_step = (time.perf_counter() - t0) / (calls * steps_per_call)
    check_retrace()
    return {'resolution': resolution, 'order': order, 'per_step_ms': per_step * 1000,
            'cells_per_sec': resolution ** 2 / per_step}


def run_flip(resolution: int = 128, steps: int = 10, warmup: int = 2, dims: int = 2,
             points_per_cell: int = 4):
    """Flagship config #5 (BASELINE.md): FLIP liquid — P2G scatter + active-mask
    pressure CG + G2P gather + RK4 particle advection. dims=3 exercises the 3D
    scatter/gather path (VERDICT r2 #10: never timed in 3D before)."""
    jax = _setup_jax()
    import numpy as np
    from phiflow_tpu.models import FlipLiquid
    model = FlipLiquid(resolution=resolution, dims=dims, points_per_cell=points_per_cell)
    state = model.initial_state()
    n_particles = state[0].geometry.center.shape.instance.volume
    steps_per_call = 4

    def multi_step(*state):
        for _ in range(steps_per_call):
            state = model.step(*state)
        return state

    step = jax.jit(multi_step)
    for _ in range(max(warmup, 2)):
        state = step(*state)
    _hard_sync(state[0].geometry.center)
    check_retrace = _retrace_guard(step, f'flip {resolution}^{dims}')
    calls = max(1, steps // steps_per_call)
    t0 = time.perf_counter()
    for _ in range(calls):
        state = step(*state)
    _hard_sync(state[0].geometry.center)
    per_step = (time.perf_counter() - t0) / (calls * steps_per_call)
    check_retrace()
    return {'resolution': resolution, 'n_particles': int(n_particles),
            'per_step_ms': per_step * 1000}


def run_cavity(resolution: int = 256, steps: int = 20, warmup: int = 3, obstacle: bool = False):
    """BASELINE config #3: lid-driven cavity (+ optional moving-obstacle mask) —
    times the obstacle-masked Poisson solve path (reference:
    examples/grids/Lid_Driven_Cavity.ipynb, masks phi/physics/fluid.py:127-137)."""
    jax = _setup_jax()
    import numpy as np
    from phiflow_tpu.models import LidDrivenCavity
    from phiflow_tpu.math import Solve, SolveTape, ConvergenceException
    from phiflow_tpu.physics import fluid

    model = LidDrivenCavity(resolution=resolution, obstacle=obstacle)
    v, p = model.initial_state()
    steps_per_call = 4

    def multi_step(v, p):
        for _ in range(steps_per_call):
            v, p = model.step(v, p)
        return v, p

    step = jax.jit(multi_step, donate_argnums=(0, 1))
    for _ in range(max(warmup, 2)):
        v, p = step(v, p)
    _hard_sync(v)
    check_retrace = _retrace_guard(step, f'cavity {resolution}^2 obstacle={obstacle}')
    calls = max(1, steps // steps_per_call)
    t0 = time.perf_counter()
    vv, pp = v, p
    for _ in range(calls):
        vv, pp = step(vv, pp)
    _hard_sync(vv)
    per_step = (time.perf_counter() - t0) / (calls * steps_per_call)
    check_retrace()
    v, p = vv, pp

    # CG iteration count on the post-advect-diffuse state (the in-step solve's
    # actual input; isolated probe, forward-only solve)
    from phiflow_tpu.physics import advect, diffuse

    def project_with_iters(vel, prev_p):
        solve = Solve('CG', model.cg_tol, 0., x0=prev_p, max_iterations=model.max_iterations,
                      suppress=(ConvergenceException,), implicit_diff=False)
        with SolveTape() as tape:
            vel2, p2 = fluid.make_incompressible(vel, model.obstacles, solve)
        return vel2, p2, tape.solve_infos[-1].iterations

    def pre_project(vel):
        vel = advect.semi_lagrangian(vel, vel, model.dt)
        return diffuse.explicit(vel, model.viscosity, model.dt)

    v_adv = jax.jit(pre_project)(v)
    _, _, iters = jax.jit(project_with_iters)(v_adv, p)
    iters = int(np.asarray(iters))
    del v_adv

    # projection wall-clock by IN-STEP DIFFERENCING (VERDICT r4 #4b): time the
    # donated multi-step with the projection removed; the difference is the
    # projection's true in-step cost (advect+diffuse ≈ per_step - projection).
    def multi_step_noproj(v, p):
        for _ in range(steps_per_call):
            v = advect.semi_lagrangian(v, v, model.dt)
            v = diffuse.explicit(v, model.viscosity, model.dt)
        return v, p

    np_step = jax.jit(multi_step_noproj, donate_argnums=(0, 1))
    vv, pp = np_step(v, p)  # donates the live state — last use of (v, p)
    vv, pp = np_step(vv, pp)
    _hard_sync(vv)
    t0 = time.perf_counter()
    for _ in range(calls):
        vv, pp = np_step(vv, pp)
    _hard_sync(vv)
    noproj_ms = (time.perf_counter() - t0) / (calls * steps_per_call) * 1000
    return {'resolution': resolution, 'obstacle': obstacle, 'per_step_ms': per_step * 1000,
            'steps_per_sec': 1.0 / per_step, 'projection_ms': per_step * 1000 - noproj_ms,
            'advect_diffuse_ms': noproj_ms, 'cg_iterations': iters}


def run_moving_obstacles(resolution: int = 256, steps: int = 16, warmup: int = 2):
    """BASELINE config #3b: moving + rotating obstacles (reference:
    examples/grids/Moving_Obstacles.ipynb) — obstacles are jit-traced state, so
    the accessible/face masks AND the masked-Poisson preconditioner inputs are
    rebuilt in-graph every step. Validates in-device: max |divergence| outside
    the obstacles after projection (the projection's defining property)."""
    jax = _setup_jax()
    import numpy as np
    from phiflow_tpu.models import MovingObstacles
    model = MovingObstacles(resolution=resolution)
    state = model.initial_state()
    steps_per_call = 4

    def multi_step(*state):
        for _ in range(steps_per_call):
            state = model.step(*state)
        return state

    step = jax.jit(multi_step)
    for _ in range(max(warmup, 2)):
        state = step(*state)
    _hard_sync(state[0])
    check_retrace = _retrace_guard(step, f'moving_obstacles {resolution}^2')
    calls = max(1, steps // steps_per_call)
    t0 = time.perf_counter()
    for _ in range(calls):
        state = step(*state)
    _hard_sync(state[0])
    per_step = (time.perf_counter() - t0) / (calls * steps_per_call)
    check_retrace()

    # certification: the live post-projection state is divergence-free outside
    # the (current) obstacles
    def max_div_outside(v, p, *obstacles):
        from phiflow_tpu.field import divergence, resample
        from phiflow_tpu.geom import union
        import phiflow_tpu.math as pmath
        div = divergence(v)
        hard = resample(union([o.geometry for o in obstacles]), div, soft=False)
        return pmath.max(abs(div.values) * (1 - hard.values))

    max_div = float(np.asarray(jax.jit(max_div_outside)(*state).native()))
    return {'resolution': resolution, 'per_step_ms': per_step * 1000,
            'steps_per_sec': 1.0 / per_step, 'max_div_outside': max_div,
            'certified_divergence_free': bool(max_div < 2e-2)}


def run_burgers_bench(resolution: int = 128, steps: int = 40, warmup: int = 2, implicit: bool = True):
    """BASELINE config #1: Burgers 2D, semi-Lagrangian + implicit diffusion on a
    periodic grid (reference: examples/grids/Burgers.ipynb)."""
    jax = _setup_jax()
    from phiflow_tpu.models import Burgers
    model = Burgers(resolution=resolution, dims=2, implicit=implicit, viscosity=0.1, dt=0.5)
    (v,) = model.initial_state()
    steps_per_call = 8  # small grid: amortize the tunnel dispatch

    def multi_step(v):
        for _ in range(steps_per_call):
            (v,) = model.step(v)
        return v

    step = jax.jit(multi_step)
    for _ in range(max(warmup, 2)):
        v = step(v)
    _hard_sync(v)
    check_retrace = _retrace_guard(step, f'burgers {resolution}^2')
    calls = max(1, steps // steps_per_call)
    t0 = time.perf_counter()
    for _ in range(calls):
        v = step(v)
    _hard_sync(v)
    per_step = (time.perf_counter() - t0) / (calls * steps_per_call)
    check_retrace()
    return {'resolution': resolution, 'implicit': implicit, 'per_step_ms': per_step * 1000,
            'steps_per_sec': 1.0 / per_step}


def run_golden_gate():
    """On-DEVICE numerical certification (VERDICT r3 #5): run the 2D golden
    trajectories (independent NumPy MAC oracle, tests/golden/numpy_ref.py) on
    the default device in f32 and record L2 vs golden. Catches Mosaic
    miscompiles / tile-boundary bugs that interpret-mode tests cannot see.
    Thresholds are f32-scaled (golden was generated in f64 at 1e-12)."""
    import importlib.util
    import numpy as np
    here = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        'golden_runners', os.path.join(here, 'tests', 'golden', 'test_golden.py'))
    g = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(g)
    data = dict(np.load(os.path.join(here, 'tests', 'golden', 'golden.npz')).items())

    def l2(a, b):
        return float(np.sqrt(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)))

    # f32 device run: 1e-12 tolerances are unreachable (CG would burn its full
    # max_iterations budget stalling); 1e-7 converges quickly with the MG /
    # masked-Chebyshev preconditioners and lands well under the 1e-4 gate
    out = {}
    vx, vy = g.run_burgers(data, use_jit=True)
    out['burgers_l2'] = max(l2(vx, data['burgers_vx']), l2(vy, data['burgers_vy']))
    ux, uy = g.run_projection(data, tol=1e-7, use_jit=True)
    out['projection_l2'] = max(l2(ux, data['proj_ux']), l2(uy, data['proj_uy']))
    ux, uy = g.run_obstacle_projection(data, tol=1e-7, use_jit=True)
    out['obstacle_projection_l2'] = max(l2(ux, data['obs_ux']), l2(uy, data['obs_uy']))
    ux, uy = g.run_moving_obstacle_projection(data, tol=1e-7, use_jit=True)
    out['moving_obstacle_l2'] = max(l2(ux, data['mv_ux']), l2(uy, data['mv_uy']))
    s, ux, uy = g.run_smoke(data, tol=1e-7, use_jit=True)
    out['smoke_l2'] = max(l2(s, data['smoke_s']), l2(ux, data['smoke_ux']), l2(uy, data['smoke_uy']))
    out['pass'] = bool(all(val < 1e-4 for val in out.values()))
    return out


def main():
    jax = _setup_jax()
    results = {}
    dispatch_ms = None
    try:
        dispatch_ms = _dispatch_overhead_ms(jax)
        sys.stderr.write(f"per-call dispatch overhead: {dispatch_ms:.1f} ms "
                         f"(phase timings below ~{3 * dispatch_ms:.0f} ms measure the tunnel, not the kernel)\n")
    except Exception as exc:
        sys.stderr.write(f"dispatch overhead probe failed: {type(exc).__name__}: {exc}\n")
    # On-device numerical certification BEFORE timing (VERDICT r3 #5): golden
    # 2D trajectories vs the independent NumPy MAC oracle — catches Mosaic
    # miscompiles / tile-boundary bugs that interpret-mode tests cannot see.
    golden = None
    try:
        golden = run_golden_gate()
        sys.stderr.write(f"golden gate: {golden}\n")
    except Exception as exc:
        sys.stderr.write(f"golden gate failed to run: {type(exc).__name__}: {exc}\n")
    if golden is not None and not golden['pass']:
        # HARD FAIL (VERDICT r4 #4a): publishing timings of numerically wrong
        # kernels is worse than publishing nothing. Emit the gate evidence and
        # exit nonzero — no timings.
        sys.stderr.write("GOLDEN GATE FAILED — refusing to time numerically wrong kernels\n")
        print(json.dumps({'metric': 'cells/sec/chip 3D smoke plume', 'value': 0.0,
                          'unit': 'cells/s', 'vs_baseline': None,
                          'error': 'golden gate failed',
                          'golden': {k: (float(f"{vv:.3e}") if isinstance(vv, float) else vv)
                                     for k, vv in golden.items()}}))
        sys.exit(1)
    # Kolmogorov first: it is small; running it after a 512³ OOM inherits a
    # fragmented heap
    kolmogorov = None
    try:
        kolmogorov = run_kolmogorov(512)
        sys.stderr.write(f"kolmogorov 512^2 order-6 (f32): {kolmogorov['per_step_ms']:.1f} ms/step\n")
    except Exception as exc:
        sys.stderr.write(f"kolmogorov bench failed: {type(exc).__name__}: {exc}\n")
    # f64 variant matching the reference recipe's set_global_precision(64)
    # (Higher_order_Kolmogorov.ipynb). x64 mode is process-global, so run it in
    # a subprocess; TPU executes f64 via software emulation, so this row is
    # honest about the reference config rather than fast.
    kolmogorov64 = None
    try:
        import subprocess
        here = os.path.dirname(os.path.abspath(__file__))
        proc = subprocess.run(
            [sys.executable, '-c', (
                "import json, sys; sys.path.insert(0, %r)\n"
                "import jax; jax.config.update('jax_enable_x64', True)\n"
                "from phiflow_tpu.math import set_global_precision\n"
                "set_global_precision(64)\n"
                "import bench\n"
                "print('K64JSON ' + json.dumps(bench.run_kolmogorov(512, steps=8)))" % here)],
            capture_output=True, text=True, timeout=1200, cwd=here)
        for line in proc.stdout.splitlines():
            if line.startswith('K64JSON '):
                kolmogorov64 = json.loads(line[len('K64JSON '):])
                sys.stderr.write(f"kolmogorov 512^2 order-6 (f64): {kolmogorov64['per_step_ms']:.1f} ms/step\n")
        if kolmogorov64 is None:
            sys.stderr.write(f"kolmogorov f64 bench produced no result: {proc.stderr[-400:]}\n")
    except Exception as exc:
        sys.stderr.write(f"kolmogorov f64 bench failed: {type(exc).__name__}: {exc}\n")
    flip = None
    try:
        flip = run_flip(128)
        sys.stderr.write(f"flip 128^2 ({flip['n_particles']} particles): "
                         f"{flip['per_step_ms']:.1f} ms/step\n")
    except Exception as exc:
        sys.stderr.write(f"flip bench failed: {type(exc).__name__}: {exc}\n")
    flip3d = None
    try:
        flip3d = run_flip(64, dims=3, points_per_cell=8)
        sys.stderr.write(f"flip 64^3 ({flip3d['n_particles']} particles): "
                         f"{flip3d['per_step_ms']:.1f} ms/step\n")
    except Exception as exc:
        sys.stderr.write(f"flip 3D bench failed: {type(exc).__name__}: {exc}\n")
    cavity = cavity_obs = burgers = None
    try:
        cavity = run_cavity(256, obstacle=False)
        sys.stderr.write(f"cavity 256^2: {cavity['per_step_ms']:.1f} ms/step, "
                         f"projection {cavity['projection_ms']:.1f} ms, {cavity['cg_iterations']} CG iters\n")
    except Exception as exc:
        sys.stderr.write(f"cavity bench failed: {type(exc).__name__}: {exc}\n")
    try:
        cavity_obs = run_cavity(256, obstacle=True)
        sys.stderr.write(f"cavity+obstacle 256^2: {cavity_obs['per_step_ms']:.1f} ms/step, "
                         f"projection {cavity_obs['projection_ms']:.1f} ms, {cavity_obs['cg_iterations']} CG iters\n")
    except Exception as exc:
        sys.stderr.write(f"cavity+obstacle bench failed: {type(exc).__name__}: {exc}\n")
    try:
        burgers = run_burgers_bench(128)
        sys.stderr.write(f"burgers 128^2: {burgers['per_step_ms']:.2f} ms/step\n")
    except Exception as exc:
        sys.stderr.write(f"burgers bench failed: {type(exc).__name__}: {exc}\n")
    moving_obs = None
    try:
        moving_obs = run_moving_obstacles(256)
        sys.stderr.write(f"moving obstacles 256^2: {moving_obs['per_step_ms']:.1f} ms/step, "
                         f"max|div| outside {moving_obs['max_div_outside']:.2e}\n")
    except Exception as exc:
        sys.stderr.write(f"moving obstacles bench failed: {type(exc).__name__}: {exc}\n")
    for res in (64, 128, 256, 512):
        try:
            # per-phase sub-timings guarded internally; at 512³ an OOM in one
            # phase drops only that entry (VERDICT r3 #7)
            results[res] = run_bench(res, dims=3, steps=10 if res < 512 else 4, warmup=3,
                                     phases=True)
            r = results[res]
            ph = r.get('phases', {})
            detail = (f" [advect {ph.get('advect_ms', 0):.1f} + pressure {ph.get('pressure_ms', 0):.1f} ms,"
                      f" {ph.get('cg_iterations', '?')} CG iters]" if ph else "")
            sys.stderr.write(f"bench {res}^3: {r['per_step_ms']:.1f} ms/step "
                             f"({r['cells_per_sec'] / 1e6:.1f} Mcells/s){detail}\n")
        except Exception as exc:  # OOM or compile failure at large sizes
            sys.stderr.write(f"bench {res}^3 failed: {type(exc).__name__}: {exc}\n")
            break
        finally:
            import gc
            gc.collect()
    if not results:
        print(json.dumps({'metric': 'cells/sec/chip 3D smoke plume', 'value': 0.0,
                          'unit': 'cells/s', 'vs_baseline': None, 'error': 'all sizes failed'}))
        return
    best_res = max(results)
    best = results[best_res]
    print(json.dumps({
        'metric': f'cells/sec/chip 3D smoke plume {best_res}^3',
        'value': round(best['cells_per_sec'], 1),
        'unit': 'cells/s',
        'vs_baseline': None,  # reference publishes no numbers (BASELINE.md)
        'per_step_ms': round(best['per_step_ms'], 2),
        'all': {f"{k}^3": round(val['cells_per_sec'], 1) for k, val in results.items()},
        'phases': {f"{k}^3": {kk: (round(vv, 2) if isinstance(vv, float) else vv)
                              for kk, vv in val.get('phases', {}).items()}
                   for k, val in results.items()},
        'dispatch_overhead_ms': round(dispatch_ms, 2) if dispatch_ms is not None else None,
        'cfl': {f"{k}^3": {'max_disp_cells': val.get('max_disp_cells'),
                           'certified_unclamped': val.get('certified_unclamped')}
                for k, val in results.items() if 'max_disp_cells' in val},
        'kolmogorov_512^2_order6': ({'per_step_ms': round(kolmogorov['per_step_ms'], 2),
                                     'precision': 'float32'} if kolmogorov else None),
        'kolmogorov_512^2_order6_f64': ({'per_step_ms': round(kolmogorov64['per_step_ms'], 2),
                                         'precision': 'float64 (reference recipe; TPU emulates f64)'}
                                        if kolmogorov64 else None),
        'phases_method': 'in-step differencing of donated jits: pressure_ms = per_step_ms - advect_ms '
                         '(cavity: projection_ms = per_step_ms - advect_diffuse_ms); '
                         'cg_iterations from an isolated forward-only probe',
        'flip_128^2': ({'per_step_ms': round(flip['per_step_ms'], 2),
                        'n_particles': flip['n_particles']} if flip else None),
        'flip_64^3': ({'per_step_ms': round(flip3d['per_step_ms'], 2),
                       'n_particles': flip3d['n_particles']} if flip3d else None),
        'cavity_256^2': ({k: (round(vv, 3) if isinstance(vv, float) else vv)
                          for k, vv in cavity.items()} if cavity else None),
        'cavity_obstacle_256^2': ({k: (round(vv, 3) if isinstance(vv, float) else vv)
                                   for k, vv in cavity_obs.items()} if cavity_obs else None),
        'moving_obstacles_256^2': ({k: (round(vv, 4) if isinstance(vv, float) else vv)
                                    for k, vv in moving_obs.items()} if moving_obs else None),
        'burgers_128^2': ({k: (round(vv, 3) if isinstance(vv, float) else vv)
                           for k, vv in burgers.items()} if burgers else None),
        'golden': ({k: (float(f"{vv:.3e}") if isinstance(vv, float) else vv)
                    for k, vv in golden.items()} if golden else None),
        'device': str(jax.devices()[0]),
    }))


if __name__ == '__main__':
    main()
