"""N-body gravity — symplectic leapfrog, pairwise inverse-square forces
(reference recipe: examples/particles/Gravity.ipynb)."""
import _path  # noqa: F401 — sys.path bootstrap for script execution
import numpy as np
from phiflow_tpu.flow import *

rng = np.random.RandomState(3)
N_BODIES, G, SOFT = 64, 1.0, 0.2
pos_np = rng.randn(N_BODIES, 2).astype(np.float32) * 2.0
mass_np = rng.rand(N_BODIES).astype(np.float32) + 0.5
# circular-ish initial velocities around the origin
vel_np = np.stack([-pos_np[:, 1], pos_np[:, 0]], -1) * 0.4
pos = wrap(pos_np, instance(bodies=N_BODIES), channel(vector='x,y'))
vel = wrap(vel_np, instance(bodies=N_BODIES), channel(vector='x,y'))
mass = wrap(mass_np, instance(bodies=N_BODIES))


def acceleration(pos):
    delta = math.rename_dims(pos, 'bodies', '~bodies') - pos      # to other bodies
    r2 = math.sum(delta ** 2, 'vector') + SOFT ** 2
    m_other = math.rename_dims(mass, 'bodies', '~bodies')
    return G * math.sum(m_other * delta / r2 ** 1.5, '~bodies')


@jit_compile
def step(pos, vel, dt=0.01):
    vel = vel + 0.5 * dt * acceleration(pos)                      # leapfrog kick-drift-kick
    pos = pos + dt * vel
    vel = vel + 0.5 * dt * acceleration(pos)
    return pos, vel


def energy(pos, vel):
    ke = 0.5 * float(math.sum(mass * math.vec_squared(vel)))
    delta = math.rename_dims(pos, 'bodies', '~bodies') - pos
    r = math.sqrt(math.sum(delta ** 2, 'vector') + SOFT ** 2)
    pe = -0.5 * G * float(math.sum(mass * math.rename_dims(mass, 'bodies', '~bodies') / r))
    return ke + pe


e0 = energy(pos, vel)
p0 = float(math.vec_length(math.sum(mass * vel, 'bodies')))
for i in range(1000):
    pos, vel = step(pos, vel)
e1 = energy(pos, vel)
p1 = float(math.vec_length(math.sum(mass * vel, 'bodies')))
print(f"energy: {e0:.3f} -> {e1:.3f} (drift {abs(e1 - e0) / abs(e0):.2%})")
print(f"|total momentum|: {p0:.4f} -> {p1:.4f}")
assert abs(e1 - e0) / abs(e0) < 0.05, "leapfrog should conserve energy"
assert abs(p1 - p0) < 1e-2, "pairwise forces conserve momentum"
