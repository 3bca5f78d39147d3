"""Viewer — run-loop controller over user-namespace fields
(reference: /root/reference/phi/vis/_viewer.py:17-314).

The reference's Dash web UI is replaced round-1 by a lightweight console/notebook
viewer; the observable-model machinery matches the reference so GUI backends can
attach later.
"""
from __future__ import annotations

import inspect
import time
from typing import Union

from ..field import Field, Scene
from ._vis_base import VisModel, Control, Action, benchmark
from ._log import SceneLog

__all__ = ['Viewer', 'view', 'create_viewer']


class Viewer(VisModel):
    """Tracks Field variables of the calling namespace and provides a step loop
    with per-step performance logging (reference: _viewer.py:31-246)."""

    def __init__(self, namespace: dict, fields: tuple, scene: Scene = None, log_performance=True):
        super().__init__(scene=scene)
        self._namespace = namespace
        self._field_names = fields
        self.log_performance = log_performance
        self.log = SceneLog(scene)
        self._step_fn = None

    @property
    def field_names(self):
        return self._field_names

    def get_field(self, name, dim_selection: dict = None):
        value = self._namespace.get(name)
        if dim_selection and isinstance(value, Field):
            return value[dim_selection]
        return value

    def range(self, *args, warmup=0, **rec_dim):
        """Iterate the run loop: ``for frame in viewer.range(100):``
        (reference: _viewer.py range())."""
        n = args[0] if args else (next(iter(rec_dim.values())) if rec_dim else None)
        frame = 0
        while n is None or frame < n:
            t0 = time.perf_counter()
            yield frame
            elapsed = time.perf_counter() - t0
            self.steps += 1
            if self.log_performance and self.scene is not None and frame >= warmup:
                self.log.log_scalars(frame, step_time=elapsed)
            self.invalidate()
            frame += 1

    def log_scalars(self, frame=None, **values):
        self.log.log_scalars(frame if frame is not None else self.steps, **values)

    def progress(self):
        if self._step_fn is not None:
            self._step_fn()
            self.steps += 1


def create_viewer(namespace: dict, fields: tuple, scene=None, log_performance=True) -> Viewer:
    return Viewer(namespace, fields, scene, log_performance)


def view(*fields: str, scene: Union[bool, Scene] = False, play=False, log_performance=True, **config) -> Viewer:
    """Create a Viewer over the caller's Field variables (reference: phi/vis view())."""
    frame = inspect.currentframe().f_back
    namespace = {**frame.f_globals, **frame.f_locals}
    if not fields:
        fields = tuple(name for name, v in namespace.items() if isinstance(v, Field))
    if scene is True:
        scene = Scene.create('~/phiflow_tpu_scenes')
    return Viewer(namespace, fields, scene if isinstance(scene, Scene) else None, log_performance)
