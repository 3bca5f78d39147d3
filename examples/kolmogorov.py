"""Higher-order Kolmogorov flow (reference recipe:
examples/grids/Higher_order_Kolmogorov.ipynb): order-6 compact schemes via the
BC-aware matrix engine (no device FFT), incompressible_rk4 time integration."""
import _path  # noqa: F401 — sys.path bootstrap for script execution
import time

import numpy as np
import jax

from phiflow_tpu.models import KolmogorovFlow
from phiflow_tpu.field import divergence

model = KolmogorovFlow(resolution=128, reynolds=1000., order=6, dt=0.005)
v, p = model.initial_state()
step = jax.jit(model.step)

t0 = time.perf_counter()
for i in range(50):
    v, p = step(v, p)
    if i % 10 == 0:
        vn = np.asarray(v.values.native(('x', 'y', 'vector')))
        div = np.asarray(divergence(v, order=6).values.native(('x', 'y')))
        ke = 0.5 * float(np.mean(vn ** 2))
        print(f"step {i:3d}: kinetic energy {ke:.4f}, max|v| {np.abs(vn).max():.3f}, "
              f"max|div| {np.abs(div).max():.2e}")
print(f"50 steps in {time.perf_counter() - t0:.1f}s")
assert np.isfinite(vn).all(), "velocity diverged"
