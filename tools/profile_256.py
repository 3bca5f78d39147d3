"""Fine-grained phase timing for the 256^3 smoke step on the real chip.

Each phase is iterated N times INSIDE one jit (lax.scan) so the per-iteration
number has zero dispatch overhead — unlike bench.py's per-phase timings, these
are true kernel costs. Used to target VERDICT r2 #2 (>=450 Mcells/s @256^3).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), '.jax_cache')
jax.config.update('jax_compilation_cache_dir', cache)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

RES = int(os.environ.get('PROFILE_RES', '256'))
N = int(os.environ.get('PROFILE_N', '10'))

from phiflow_tpu.models import SmokePlume
from phiflow_tpu.physics import fluid, advect
from phiflow_tpu.field import resample

model = SmokePlume(resolution=RES, dims=3)
v, s, p = model.initial_state()

step = jax.jit(lambda v, s, p: model.step(v, s, p))
# settle into a realistic state
for _ in range(3):
    v, s, p = step(v, s, p)
jax.block_until_ready(v.values.components[0].native())


def _sync(out):
    """Force execution: on-device reduce + fetch ONE scalar per leaf group
    (block_until_ready alone has proven unreliable through the axon tunnel)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    while hasattr(leaf, 'components'):
        leaf = leaf.components[0]
    if hasattr(leaf, 'native'):
        leaf = leaf.native()
    return float(np.asarray(jnp.sum(leaf)))


def timed(label, fn, *args, n=N, reps=3):
    """DIFFERENTIAL scan timing: the axon tunnel adds a large VARIABLE
    round-trip latency (~27-35 ms) to every synced dispatch, so a single
    total/n reading is biased by latency/n. Time scan-of-n and scan-of-2n,
    take the min over reps of each, and report (T(2n) - T(n)) / n — the fixed
    latency cancels exactly."""
    def make(length):
        def many(*a):
            def body(carry, _):
                return fn(*carry), None
            out, _ = jax.lax.scan(body, a, None, length=length)
            return out
        return jax.jit(many)

    f1, f2 = make(n), make(2 * n)
    _sync(f1(*args)); _sync(f2(*args))  # compile both
    t1 = t2 = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter(); _sync(f1(*args)); t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter(); _sync(f2(*args)); t2 = min(t2, time.perf_counter() - t0)
    dt = (t2 - t1) / n * 1000
    print(f"{label:42s} {dt:8.2f} ms")
    return dt


def tuple_fn(fn):
    return lambda *a: tuple(x for x in ((fn(*a),) if not isinstance(fn(*a), tuple) else fn(*a)))


print(f"=== {RES}^3, {N} in-graph iterations per phase ===")

# full step
timed('full step', lambda v, s, p: model.step(v, s, p), v, s, p)

# phase 1: smoke advection (MacCormack + inflow)
timed('advect_smoke (MacCormack)', lambda v, s: (v, model.advect_smoke(v, s)), v, s)

# phase 2: velocity self-advection + buoyancy
timed('advect_velocity (SL + buoyancy)', lambda v, s: (model.advect_velocity(v, s), s), v, s)

# phase 2a: semi_lagrangian alone
timed('  semi_lagrangian(v, v)', lambda v: (advect.semi_lagrangian(v, v, model.dt, max_cells=model.max_cells),), v)

# phase 2b: buoyancy resample alone
def buoy(v, s):
    return (v + resample(s * model.buoyancy_dir, to=v) * model.dt, s)
timed('  buoyancy resample+add', buoy, v, s)

# phase 3: projection
def proj(v, p):
    v2, p2 = model.project(v, p)
    return v2, p2
timed('project (div+CG+grad)', proj, v, p)

# 3a: MG V-cycle alone on the divergence field
from phiflow_tpu.field import divergence
from phiflow_tpu.math._multigrid import make_poisson_vcycle

div = divergence(v, order=2)
arr = div.values.native(div.values.shape.names).reshape((1,) + (RES,) * 3)
bcs = tuple(fluid._classify_pressure_bc(model.pressure0.boundary, v.boundary, ('x', 'y', 'z')))
vcycle = make_poisson_vcycle((RES,) * 3, (1.0,) * 3, bcs)
timed('  MG V-cycle (1 application)', lambda a: (vcycle(a),), arr)

# 3b: fused Poisson matvec alone
from phiflow_tpu.ops import poisson
a3 = arr.reshape((RES,) * 3)
timed('  poisson matvec (1 apply)', lambda a: (poisson.poisson_apply(a, (1., 1., 1.), bcs),), a3)

# window kernel alone (K=1 and K=2), one component — chain output back into the
# padded source so the scan carry keeps a consistent shape (realistic reuse, too)
from phiflow_tpu.ops.interp import window_interp_3d
disp = jnp.zeros((3,) + (RES,) * 3, jnp.float32) + 0.3


def win(K, **kw):
    def f(pad, d):
        out = window_interp_3d(pad, d, K, **kw)
        if isinstance(out, tuple):
            out = out[0]
        return pad.at[(slice(K, -K),) * 3].set(out), d
    return f


timed('  window_interp_3d K=1', win(1), jnp.pad(a3, 1), disp)
timed('  window_interp_3d K=2', win(2), jnp.pad(a3, 2), disp)
timed('  window_interp_3d K=1 extrema', win(1, compute_extrema=True), jnp.pad(a3, 1), disp)

# displacement fast-path builder alone (9 per-pair resamples, dt/dx fused)
from phiflow_tpu.physics.advect import _euler_disp_natives

fast_probe = _euler_disp_natives(v, v, -model.dt)
print(f"  fast disp path engaged: {fast_probe is not None}")


def disp_probe(vv):
    fast = _euler_disp_natives(vv, vv, -model.dt)
    s = sum(jnp.sum(a) for arrs in fast.values() for a in arrs)
    return (vv * (1.0 + 0.0 * s),)


timed('  _euler_disp_natives(v) + v-copy', disp_probe, v)
timed('  v-copy alone (baseline for above)', lambda vv: (vv * 1.0000001,), v)
