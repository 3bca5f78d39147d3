"""Per-phase wall-clock at large resolutions with donated buffers.

Measures smoke advection / velocity self-advection / pressure projection
separately, each as its own donated jit, so 512^3 fits HBM (VERDICT r3 #7:
phases were disabled at 512^3 because the non-donated per-phase buffers OOM'd).

Usage: python tools/prof_phases.py [resolution] [steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def _sync(*xs):
    import jax.numpy as jnp
    out = 0.0
    for f in xs:
        t = f.values if hasattr(f, 'values') else f
        if hasattr(t, 'components'):
            natives = [c.native() for c in t.components]
        elif hasattr(t, 'native'):
            natives = [t.native()]
        else:
            natives = [t]
        out += sum(float(np.asarray(jnp.sum(n))) for n in natives)
    return out


def main(res=512, steps=6):
    from phiflow_tpu.models import SmokePlume
    model = SmokePlume(resolution=res, dims=3)
    v, s, p = model.initial_state()

    step = jax.jit(model.step, donate_argnums=(0, 1, 2))
    for _ in range(3):
        v, s, p = step(v, s, p)
    _sync(s)
    t0 = time.perf_counter()
    vv, ss, pp = v, s, p
    for _ in range(steps):
        vv, ss, pp = step(vv, ss, pp)
    _sync(ss)
    full_ms = (time.perf_counter() - t0) / steps * 1000
    v, s, p = vv, ss, pp
    print(f"full step: {full_ms:.1f} ms ({res**3/full_ms*1000/1e6:.1f} Mcells/s)")

    # phase timings: donate only the args not needed downstream
    f_smoke = jax.jit(model.advect_smoke)          # (v, s) -> s2 ; keep v
    f_vel = jax.jit(model.advect_velocity)         # (v, s2) -> v2 ; donating v would kill it
    f_proj = jax.jit(model.project, donate_argnums=(0,))  # (v2, p) -> v3, p2

    s2 = f_smoke(v, s); _sync(s2)
    t0 = time.perf_counter()
    for _ in range(steps):
        s2 = f_smoke(v, s)
    _sync(s2)
    print(f"advect_smoke: {(time.perf_counter()-t0)/steps*1000:.1f} ms")

    v2 = f_vel(v, s2); _sync(v2)
    t0 = time.perf_counter()
    for _ in range(steps):
        v2 = f_vel(v, s2)
    _sync(v2)
    print(f"advect_velocity: {(time.perf_counter()-t0)/steps*1000:.1f} ms")

    v2, p3 = f_proj(v2, p)  # donated v2 replaced by the projected field
    _sync(v2)
    del p3
    t0 = time.perf_counter()
    for i in range(steps):
        v2, p3 = f_proj(v2, p)
        del p3
    _sync(v2)
    print(f"pressure projection: {(time.perf_counter()-t0)/steps*1000:.1f} ms")


if __name__ == '__main__':
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    main(res, steps)
