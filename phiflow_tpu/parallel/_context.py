"""Active domain decomposition — the switch that routes the PUBLIC solver API
(`fluid.make_incompressible`) onto the explicit shard_map path.

The reference has no distributed runtime (SURVEY.md §2.7); this is the
TPU-native extension. Usage::

    mesh = parallel.create_mesh({'x': 2, 'y': 4})
    with parallel.decomposition(mesh, x='x', y='y'):
        v, p = fluid.make_incompressible(v, solve=Solve('CG', 1e-4))

Everything traced inside the context uses ppermute halo exchange + psum'd
MG-CG over the mesh instead of leaving the partitioning to GSPMD. A
decomposition with one shard per axis (``mesh={'x': 1}``) degenerates to the
single-device kernel path with zero collectives, so the same user code runs
from 1 chip to a full slice.
"""
from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Dict, NamedTuple, Optional

from jax.sharding import Mesh

__all__ = ['decomposition', 'set_decomposition', 'current_decomposition']


class Decomposition(NamedTuple):
    mesh: Mesh
    axes: Dict[str, str]  # spatial dim name -> mesh axis name


_state = threading.local()


def current_decomposition() -> Optional[Decomposition]:
    """The decomposition active on this thread, or None."""
    return getattr(_state, 'active', None)


def set_decomposition(mesh: Optional[Mesh], axes: Dict[str, str] = None, **dim_axes: str):
    """Activate (or with mesh=None, clear) a domain decomposition globally.
    Prefer the `decomposition` context manager for scoped use."""
    if mesh is None:
        _state.active = None
        return None
    all_axes = dict(axes or {})
    all_axes.update(dim_axes)
    if not all_axes:  # default: spatial dims map to same-named mesh axes
        all_axes = {a: a for a in mesh.axis_names if a != 'batch'}
    for dim, axis in all_axes.items():
        assert axis in mesh.axis_names, f"mesh has no axis {axis!r} (for dim {dim!r}); axes: {mesh.axis_names}"
    _state.active = Decomposition(mesh, all_axes)
    return _state.active


@contextmanager
def decomposition(mesh: Mesh, axes: Dict[str, str] = None, **dim_axes: str):
    """Scoped domain decomposition: solvers traced inside dispatch to the
    explicit shard_map path (halo rings + psum reductions on `mesh`)."""
    prev = current_decomposition()
    set_decomposition(mesh, axes, **dim_axes)
    try:
        yield _state.active
    finally:
        _state.active = prev
