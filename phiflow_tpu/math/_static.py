"""Hashable wrappers for static (non-traced) array metadata.

The reference treats Field.geometry as a non-variable attribute
(variable_attrs=('values',), /root/reference/phi/field/_field.py:78-81): grid
bounds do not participate in autodiff/tracing. We exploit that on TPU: grid
geometry becomes static jit aux-data, so half-cell alignment checks resolve at
trace time and center↔face resampling lowers to pad+average instead of gathers.
"""
from __future__ import annotations

import numpy as np

__all__ = ['HashableArray']


class HashableArray:
    """Immutable numpy array usable as pytree aux data (hashable, comparable)."""
    __slots__ = ('array', '_bytes')

    def __init__(self, array):
        self.array = np.asarray(array)
        self.array.setflags(write=False)
        self._bytes = self.array.tobytes()

    def __eq__(self, other):
        return isinstance(other, HashableArray) and self.array.shape == other.array.shape \
            and self.array.dtype == other.array.dtype and self._bytes == other._bytes

    def __hash__(self):
        return hash((self.array.shape, str(self.array.dtype), self._bytes))

    def __repr__(self):
        return f"static{self.array!r}"
