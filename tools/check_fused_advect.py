"""Validate the fused advection megakernel against the per-component path.

Runs the SmokePlume model to a nontrivial state with the ORIGINAL phases,
then compares `_fused_advect` output against `advect_smoke`+`advect_velocity`
on the same state. Usage: python tools/check_fused_advect.py [res] [steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _nat(f):
    t = f.values
    if hasattr(t, 'components'):
        return [np.asarray(c.native()) for c in t.components]
    return [np.asarray(t.native())]


def main(res=64, warm=5):
    from phiflow_tpu.models import SmokePlume
    model = SmokePlume(resolution=res, dims=3)
    v, s, p = model.initial_state()

    def old_step(v, s, p):
        s2 = model.advect_smoke(v, s)
        v2 = model.advect_velocity(v, s2)
        v3, p2 = model.project(v2, p)
        return v3, s2, p2

    step = jax.jit(old_step)
    for _ in range(warm):
        v, s, p = step(v, s, p)

    def old_advect(v, s):
        s2 = model.advect_smoke(v, s)
        v2 = model.advect_velocity(v, s2)
        return v2, s2

    v_old, s_old = jax.jit(old_advect)(v, s)
    v_new, s_new = jax.jit(lambda v, s: model._fused_advect(v, s))(v, s)

    s_o, s_n = _nat(s_old)[0], _nat(s_new)[0]
    err_s = np.max(np.abs(s_o - s_n)) / (np.max(np.abs(s_o)) + 1e-30)
    print(f"smoke  max rel err: {err_s:.3e}  (scale {np.max(np.abs(s_o)):.3e})")
    for d, (a, b) in enumerate(zip(_nat(v_old), _nat(v_new))):
        err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-30)
        print(f"vel[{d}] max rel err: {err:.3e}  (scale {np.max(np.abs(a)):.3e})")
    ok = err_s < 2e-5 and all(
        np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-30) < 2e-5
        for a, b in zip(_nat(v_old), _nat(v_new)))
    print("PASS" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 64,
                  int(sys.argv[2]) if len(sys.argv) > 2 else 5))
