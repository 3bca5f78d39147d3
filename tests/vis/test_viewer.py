"""Viewer run-loop + Record trajectory tests
(reference behavior: /root/reference/phi/vis/_viewer.py:31-313)."""
import numpy as np

from phiflow_tpu.field import CenteredGrid
from phiflow_tpu.math import extrapolation, spatial
from phiflow_tpu.vis import view, Record


def test_viewer_range_plain():
    smoke = CenteredGrid(0.0, extrapolation.ZERO, x=8, y=8)
    viewer = view('smoke', log_performance=False)
    frames = [f for f in viewer.range(3)]
    assert frames == [0, 1, 2]
    assert viewer.steps == 3


def test_viewer_record_trajectory():
    smoke = CenteredGrid(1.0, extrapolation.ZERO, x=8, y=8)
    viewer = view('smoke', log_performance=False)
    for frame in viewer.range(frames=4):
        smoke = smoke + 1.0
    assert isinstance(viewer.rec, Record)
    assert viewer.rec.recording_size('smoke') == 5  # initial + 4 steps
    traj = viewer.rec.smoke
    assert 'frames' in traj.shape.names
    assert traj.shape.get_size('frames') == 5
    vals = traj.values.native(('frames', 'x', 'y'))
    np.testing.assert_allclose(np.asarray(vals)[:, 0, 0], [1, 2, 3, 4, 5])
    # dict-style access and repr
    assert viewer.rec['smoke'] is not None
    assert 'smoke' in repr(viewer.rec)
