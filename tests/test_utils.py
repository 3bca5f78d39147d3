import os
import numpy as np

import phiflow_tpu.math as math
from phiflow_tpu.math import spatial, extrapolation
from phiflow_tpu import utils
from phiflow_tpu.field import CenteredGrid, Noise


def test_benchmark():
    g = CenteredGrid(Noise(), extrapolation.PERIODIC, x=16, y=16)
    per_step, state = utils.benchmark(lambda f: f * 1.001, (g,), n=3, warmup=1)
    assert per_step > 0


def test_timer():
    with utils.Timer() as t:
        sum(range(1000))
    assert t.elapsed >= 0


def test_checkpoint_roundtrip(tmp_path):
    state = {'step': np.asarray(5), 'values': np.random.randn(4, 4).astype(np.float32)}
    path = utils.save_checkpoint(str(tmp_path / 'ckpt'), state)
    restored = utils.load_checkpoint(path, template=state)
    assert np.allclose(restored['values'], state['values'])


def test_checkpoint_manager(tmp_path):
    mgr = utils.CheckpointManager(str(tmp_path / 'runs'), max_to_keep=2)
    for step in range(3):
        mgr.save(step, {'w': np.full((2,), float(step), np.float32)})
    assert mgr.latest_step == 2
    restored = mgr.restore(template={'w': np.zeros((2,), np.float32)})
    assert np.allclose(restored['w'], 2.0)
