"""Rope dynamics — chains of stiff springs under gravity, fixed anchors
(reference recipe: examples/particles/Ropes.ipynb)."""
import _path  # noqa: F401 — sys.path bootstrap for script execution
import numpy as np
from phiflow_tpu.flow import *

N_SEG, N_ROPES = 24, 3
REST, STIFF, DAMP, GRAV = 0.5, 4000.0, 6.0, (0.0, -9.81)
# three ropes hanging from different anchors, initially horizontal
pos_np = np.zeros((N_ROPES, N_SEG + 1, 2), np.float32)
for r in range(N_ROPES):
    pos_np[r, :, 0] = 2.0 + 3.0 * r + REST * np.arange(N_SEG + 1)
    pos_np[r, :, 1] = 10.0
pos = wrap(pos_np, batch(ropes=N_ROPES), instance(nodes=N_SEG + 1), channel(vector='x,y'))
vel = pos * 0.0
anchor = pos.nodes[0]
gravity = wrap(np.array(GRAV, np.float32), channel(vector='x,y'))


def spring_force(pos, vel):
    seg = pos.nodes[1:] - pos.nodes[:-1]                 # (nodes-1) segment vectors
    length = math.vec_length(seg, eps=1e-6)
    t = seg / length
    f_seg = STIFF * (length - REST) * t                  # tension on the lower node
    dv = vel.nodes[1:] - vel.nodes[:-1]
    f_seg = f_seg + DAMP * math.sum(dv * t, 'vector') * t
    zero = f_seg.nodes[:1] * 0
    # node force = tension of segment above − tension of segment below
    return math.concat([f_seg, zero], 'nodes') - math.concat([zero, f_seg], 'nodes')


@jit_compile
def step(pos, vel, dt=0.001):
    acc = spring_force(pos, vel) + gravity - 0.8 * vel  # drag damps pendulum swing
    vel = vel + dt * acc
    pos = pos + dt * vel
    # re-pin anchors
    pin = math.to_float(math.arange(instance(nodes=N_SEG + 1)) == 0)
    pos = pin * anchor + (1 - pin) * pos
    vel = (1 - pin) * vel
    return pos, vel


for i in range(8000):
    pos, vel = step(pos, vel)
import numpy as _np
tip = pos.nodes[-1]
droop = float(_np.mean((anchor - tip).vector['y'].numpy('ropes')))
sway = float(_np.abs(vel.numpy('ropes,nodes,vector')).max())
lengths = math.vec_length(pos.nodes[1:] - pos.nodes[:-1], eps=1e-6)
stretch = float(_np.mean(lengths.numpy('ropes,nodes'))) / REST
print(f"tip droop below anchor: {droop:.2f} (rope length {N_SEG * REST})")
print(f"mean segment stretch: {stretch:.3f} (≥1: gravity stretches the rope)")
print(f"residual motion max|v|: {sway:.3f}")
assert droop > 0.8 * N_SEG * REST, "rope should hang nearly straight down at rest"
assert 1.0 <= stretch < 1.2, "springs stretched but near rest length"
