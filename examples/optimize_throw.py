"""Optimize a projectile's launch velocity by pure gradient descent through
the analytic flight simulation (reference recipe:
/root/reference/examples/optim/Optimize_Throw.ipynb — the non-NN counterpart
of learn_to_throw.py)."""
import _path  # noqa: F401 — sys.path bootstrap for script execution
import numpy as np

from phiflow_tpu.flow import *


def simulate_hit(pos, height, vel, angle, gravity=1.):
    vel_x, vel_y = math.cos(angle) * vel, math.sin(angle) * vel
    height = math.maximum(height, .01)
    hit_time = (vel_y + math.sqrt(vel_y ** 2 + 2 * gravity * height)) / gravity
    return pos + vel_x * hit_time, hit_time, height, vel_x, vel_y


def sample_trajectory(pos, height, vel, angle, gravity=1., steps=spatial(time=100)):
    _, hit_time, height, vel_x, vel_y = simulate_hit(pos, height, vel, angle, gravity)
    t = math.linspace(0., 1., steps) * hit_time  # scaled unit grid: linspace end may be a Tensor
    return vec(x=pos + vel_x * t, y=height + vel_y * t - gravity / 2 * t ** 2)


def loss_function(pos, height, vel, angle, target):
    return math.l2_loss(simulate_hit(pos, height, vel, angle)[0] - target)


grad_fun = math.gradient(loss_function, wrt='vel', get_output=False)


def gradient_descent_step(vel, pos, height, angle, target, step_size=.1):
    return vel - step_size * grad_fun(pos, height, vel, angle, target)


if __name__ == '__main__':
    fixed = dict(pos=0., height=1., angle=0.)
    vel_trj = math.iterate(gradient_descent_step, batch(iter=25), wrap(1.), target=10., **fixed)
    vel_final = float(vel_trj.iter[-1])
    hit_x = float(simulate_hit(vel=vel_trj.iter[-1], **fixed)[0])
    print(f"optimized velocity: {vel_final:.4f}, hit at x = {hit_x:.4f} (target 10)")
    assert abs(hit_x - 10.) < 0.05, hit_x

    trj = sample_trajectory(vel=vel_trj.iter[-1], **fixed)
    ys = np.asarray(trj.vector['y'].native(('time',)))
    assert ys[0] == 1. and abs(ys[-1]) < 1e-4, "trajectory spans launch to impact"
    print("done")
