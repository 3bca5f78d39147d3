"""Training-state checkpointing on orbax (beyond the reference: SURVEY.md §5
notes the reference has no elastic-recovery story; Scene .npz covers simulation
state, this covers training/optimizer state with atomic, versioned saves)."""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

__all__ = ['CheckpointManager', 'save_checkpoint', 'load_checkpoint']


def _to_saveable(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    """Versioned checkpoints: keeps the latest `max_to_keep` steps."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp
        self.directory = os.path.abspath(os.path.expanduser(directory))
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory, options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def save(self, step: int, state: Any):
        import orbax.checkpoint as ocp
        self._mgr.save(step, args=ocp.args.StandardSave(_to_saveable(state)))
        self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None, template: Any = None):
        import orbax.checkpoint as ocp
        step = step if step is not None else self._mgr.latest_step()
        assert step is not None, f"no checkpoints in {self.directory}"
        if template is not None:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(_to_saveable(template)))
        return self._mgr.restore(step)

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return self._mgr.all_steps()


def save_checkpoint(path: str, state: Any):
    """One-shot checkpoint save of an arbitrary pytree (atomic: tmp + rename).

    The saved file is self-describing: the whole (numpy-converted) pytree is
    pickled, so restoring does not require a structure template. Leaves are
    stored separately too so a `template` restore still works even if the
    container classes changed between save and load.
    """
    import pickle
    path = os.path.abspath(os.path.expanduser(path))
    if not path.endswith('.pkl'):
        path += '.pkl'
    os.makedirs(os.path.dirname(path), exist_ok=True)
    saveable = _to_saveable(state)
    leaves, _ = jax.tree_util.tree_flatten(saveable)
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        pickle.dump({'tree': saveable, 'leaves': leaves}, f)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str, template: Any = None):
    """Restore a pytree saved by `save_checkpoint`.

    Without `template`, returns the pickled tree itself (self-describing). With
    `template`, the stored leaves are unflattened into the template's structure
    — use this when class definitions changed since the save.

    Security note: this uses pickle — only load checkpoint files you trust
    (pickle.load of untrusted data can execute arbitrary code).
    """
    import pickle
    path = os.path.abspath(os.path.expanduser(path))
    if not path.endswith('.pkl'):
        path += '.pkl'
    with open(path, 'rb') as f:
        data = pickle.load(f)
    if template is not None:
        treedef = jax.tree_util.tree_structure(template)
        return jax.tree_util.tree_unflatten(treedef, data['leaves'])
    if 'tree' in data:
        return data['tree']
    return data['leaves']  # legacy format without template
