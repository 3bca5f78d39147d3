"""Lid-driven cavity (reference recipe: examples/grids/Lid_Driven_Cavity.ipynb):
no-slip walls, the top lid moving at constant speed, obstacle-free pressure
projection. Prints the center-line velocity profile summary at the end."""
import _path  # noqa: F401
import numpy as np
import jax

from phiflow_tpu.models import LidDrivenCavity
from phiflow_tpu.field import divergence

model = LidDrivenCavity(resolution=64, lid_speed=1., viscosity=0.05, dt=0.5)
v, p = model.initial_state()
step = jax.jit(model.step)
for i in range(60):
    v, p = step(v, p)

ux = np.asarray(v.vector['x'].values.native(('x', 'y')))
div = np.asarray(divergence(v).values.native(('x', 'y')))
mid = ux[ux.shape[0] // 2, :]
print(f"center-line u_x: bottom {mid[0]:+.3f} → top {mid[-1]:+.3f} (lid 1.0)")
print(f"max |div|: {np.abs(div).max():.2e}")
assert mid[-1] > 0.3, "lid should drag the fluid near the top"
assert np.abs(div).max() < 1e-2
assert np.isfinite(ux).all()
print("OK")
