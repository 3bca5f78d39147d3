"""Benchmark: 3D smoke plume cells/sec/chip (driver metric, BASELINE.md).

Runs the flagship config (MacCormack smoke + semi-Lagrangian staggered velocity +
pressure CG projection — reference recipe examples/grids/Smoke_Plume.ipynb) on
the default device and prints ONE JSON line.
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


def run_bench(resolution: int, dims: int = 3, steps: int = 20, warmup: int = 3, cg_tol: float = 1e-3,
              max_iterations: int = 100):
    jax = _setup_jax()
    from phiflow_tpu.models import SmokePlume

    model = SmokePlume(resolution=resolution, dims=dims, cg_tol=cg_tol, max_iterations=max_iterations)
    v, s, p = model.initial_state()

    import numpy as np

    def hard_sync(field):
        # value fetch: block_until_ready can return early on tunneled backends.
        # Reduce ON DEVICE and fetch one scalar — np.asarray(full_field) would
        # pull resolution³ floats through the tunnel (512MB at 512³) and
        # dominate the measurement.
        import jax.numpy as jnp
        return float(np.asarray(jnp.sum(field.values.native())))

    step = jax.jit(model.step)
    t_compile = time.perf_counter()
    # warmup: ≥2 calls — the state pytree structure stabilizes after the first step
    for _ in range(max(warmup, 2)):
        v, s, p = step(v, s, p)
    hard_sync(s)
    t_compile = time.perf_counter() - t_compile

    t0 = time.perf_counter()
    for _ in range(steps):
        v, s, p = step(v, s, p)
    hard_sync(s)
    elapsed = time.perf_counter() - t0
    per_step = elapsed / steps
    cells = resolution ** dims
    return {
        'resolution': resolution,
        'dims': dims,
        'per_step_ms': per_step * 1000,
        'cells_per_sec': cells / per_step,
        'compile_s': t_compile,
    }


def main():
    jax = _setup_jax()
    results = {}
    for res in (64, 128, 256, 512):
        try:
            results[res] = run_bench(res, dims=3, steps=10 if res < 512 else 4, warmup=3)
            sys.stderr.write(f"bench {res}^3: {results[res]['per_step_ms']:.1f} ms/step "
                             f"({results[res]['cells_per_sec'] / 1e6:.1f} Mcells/s)\n")
        except Exception as exc:  # OOM or compile failure at large sizes
            sys.stderr.write(f"bench {res}^3 failed: {type(exc).__name__}: {exc}\n")
            break
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
        'device': str(jax.devices()[0]),
    }))


if __name__ == '__main__':
    main()
