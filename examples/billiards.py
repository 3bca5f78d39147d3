"""Billiards — elastic sphere collisions with impulse resolution
(reference recipe: docs/Billiards.ipynb / examples/particles).

A cue ball strikes a triangular rack; equal-mass elastic collisions exchange
the normal velocity components. Total momentum and kinetic energy are
conserved up to the soft-contact model tolerance.
"""
import _path  # noqa: F401 — sys.path bootstrap for script execution
import numpy as np
from phiflow_tpu.flow import *

RADIUS = 0.5
SPACING = 1.06  # small gaps: collisions resolve pairwise (the exchange is exact per pair)
# triangular rack + cue ball, slightly off-center so the break is sequential
pts = [(10.0, 5.35)]
for row in range(4):
    for j in range(row + 1):
        pts.append((16.0 + row * (2 * RADIUS * SPACING * 0.87),
                    5.0 + (j - row / 2) * 2 * RADIUS * SPACING))
pos = wrap(np.array(pts, np.float32), instance(balls=len(pts)), channel(vector='x,y'))
vel = wrap(np.array([(8.0, 0.0)] + [(0.0, 0.0)] * (len(pts) - 1), np.float32),
           instance(balls=len(pts)), channel(vector='x,y'))


@jit_compile
def step(pos, vel, dt=0.002):
    # pairwise elastic impulse: equal masses exchange normal velocity on contact
    delta = math.rename_dims(pos, 'balls', '~balls') - pos          # (balls, ~balls, vector)
    dist = math.vec_length(delta, eps=1e-9)
    touching = math.to_float((dist < 2 * RADIUS) & (dist > 1e-6))
    normal = delta / dist
    dv = math.rename_dims(vel, 'balls', '~balls') - vel
    approach = math.sum(dv * normal, 'vector')                     # <0 = approaching
    impulse = touching * math.minimum(approach, 0.) * normal
    vel = vel + math.sum(impulse, '~balls')
    pos = pos + dt * vel
    # table walls: reflect
    lo, hi = 0.5, 29.5
    for d in ('x', 'y'):
        p_d, v_d = pos.vector[d], vel.vector[d]
        v_d = math.where((p_d < lo) & (v_d < 0), -v_d, v_d)
        v_d = math.where((p_d > hi) & (v_d > 0), -v_d, v_d)
        vel = vel.vector[d].set_(v_d) if hasattr(vel, 'set_') else math.stack(
            {dd: (v_d if dd == d else vel.vector[dd]) for dd in ('x', 'y')}, channel('vector'))
    return pos, vel


p0 = math.sum(vel, 'balls')
e0 = 0.5 * float(math.sum(math.vec_squared(vel)))
for i in range(1500):
    pos, vel = step(pos, vel)
p1 = math.sum(vel, 'balls')
e1 = 0.5 * float(math.sum(math.vec_squared(vel)))
moving = int(math.sum(math.to_float(math.vec_length(vel) > 0.1)))
print(f"balls moving after break: {moving}/{pos.balls.size}")
print(f"momentum: {p0} -> {p1}")
print(f"kinetic energy: {e0:.2f} -> {e1:.2f}")
assert moving >= 3, "the break should scatter several balls"
assert abs(e1 - e0) / e0 < 0.01, "elastic collisions conserve kinetic energy"
