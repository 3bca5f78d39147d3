"""Differentiable-physics training (reference recipe: examples/optim/Learn_Throw.ipynb):
train a network to predict the initial velocity that makes a projectile hit a target."""
import _path  # noqa: F401 — sys.path bootstrap for script execution
import numpy as np
import jax.numpy as jnp

from phiflow_tpu.flow import *
from phiflow_tpu import nn


def simulate_hit(v0x, v0y, steps=20, dt=0.1, gravity=-9.81):
    x = y = 0.
    vx, vy = v0x, v0y
    for _ in range(steps):
        x = x + vx * dt
        y = y + vy * dt
        vy = vy + gravity * dt
    return x


net = nn.dense_net(1, 2, [32, 64, 32])
opt = nn.adam(net, 1e-3)
targets = np.linspace(2, 8, 32, dtype=np.float32)[:, None]


def loss():
    throw = net(targets)
    hits = simulate_hit(throw[:, 0], throw[:, 1])
    return jnp.sum((hits - targets[:, 0]) ** 2)


for i in range(200):
    nn.update_weights(net, opt, loss)
print(f"final loss: {float(loss()):.4f}")
