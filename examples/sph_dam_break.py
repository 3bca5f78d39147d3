"""SPH dam break driven end-to-end through the framework SPH stack
(reference workloads: phi/physics/sph.py + examples/particles SPH notebooks).

N = 10,000 weakly-compressible particles collapse under gravity in a unit box.
Every physics term is a library call on named tensors: cell-list
`sph.neighbor_graph`, summation `sph.density`, `sph.tait_pressure`,
symmetric `sph.pressure_acceleration` (models/sph_dam.py)."""
import _path  # noqa: F401
import numpy as np
import jax

from phiflow_tpu.models import SphDamBreak

model = SphDamBreak(nx=50, ny=200)  # 10,000 particles
print(f"{model.n_particles} particles, support radius {model.support:.4f}, rho0 {model.rho0:.0f}")
step = jax.jit(lambda s: model.step(*s))
state = model.initial_state()
for i in range(1200):
    state = step(state)
    if i % 200 == 0:
        pos = np.asarray(state[0].geometry.center.native(('points', 'vector')))
        vel = np.asarray(state[0].values.native(('points', 'vector')))
        print(f"step {i:4d}: x-extent [{pos[:, 0].min():.3f}, {pos[:, 0].max():.3f}], "
              f"max speed {np.abs(vel).max():.2f}")
assert step._cache_size() == 1, "SPH step must trace once"
pos = np.asarray(state[0].geometry.center.native(('points', 'vector')))
assert np.isfinite(pos).all()
assert pos[:, 0].max() > 0.45, "dam should collapse and spread to the right"
assert pos.min() > -0.05 and pos.max() < 1.05, "particles must stay in the box"
print(f"OK — {model.n_particles} particles, front reached x={pos[:, 0].max():.2f}")
