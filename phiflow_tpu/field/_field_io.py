"""Field ⇄ .npz serialization (reference: /root/reference/phi/field/_field_io.py:13-119;
format spec: one .npz per field per frame with dim metadata + serialized boundary).
"""
from __future__ import annotations

import os
from typing import Union

import numpy as np

from ..math import Tensor, Shape, wrap, spatial, channel, batch, instance
from ..math import _ops as ops
from ..math import extrapolation as extrapolation_mod
from ..geom import Box, UniformGrid
from ._field import Field
from ._grid import CenteredGrid, StaggeredGrid, unstack_staggered_tensor

__all__ = ['write', 'read']


def write(field: Field, file: Union[str, Tensor]):
    """Write a grid Field to `<file>.npz` (reference schema: write_single_field,
    phi/field/_field_io.py:45-68). Batched file-name tensors write one file per entry."""
    if isinstance(file, Tensor):
        for idx in file.shape.meshgrid():
            write(field[{k: v for k, v in idx.items() if k in field.shape}], str(np.asarray(file[idx].native())))
        return
    _write_single(field, file)


def _write_single(field: Field, file: str):
    assert field.is_grid, f"write() only supports grids, got {type(field.geometry)}"
    if field.is_staggered:
        data = field.staggered_tensor()
        field_type = 'StaggeredGrid'
    else:
        data = field.values
        field_type = 'CenteredGrid'
    dim_names = data.shape.names
    dim_types = data.shape.types
    dim_item_names = [','.join(l) if l else '' for l in data.shape.labels]
    lower = np.asarray(field.bounds.lower.native())
    upper = np.asarray(field.bounds.upper.native())
    import json
    extrap = json.dumps(field.boundary.to_dict())
    if not file.endswith('.npz'):
        file += '.npz'
    os.makedirs(os.path.dirname(os.path.abspath(file)), exist_ok=True)
    np.savez_compressed(file,
                        data=np.asarray(data.native()),
                        dim_names=np.array(dim_names),
                        dim_types=np.array(dim_types),
                        dim_item_names=np.array(dim_item_names),
                        field_type=np.array(field_type),
                        lower=lower, upper=upper, extrapolation=np.array(extrap))


def read(file: Union[str, Tensor], convert_to_backend=True) -> Field:
    """Read a Field written by `write` (reference: phi/field/_field_io.py:71)."""
    if isinstance(file, Tensor):
        fields = []
        for idx in file.shape.meshgrid():
            fields.append(read(str(np.asarray(file[idx].native()))))
        from ._field_math import stack as field_stack
        result = fields
        for d in reversed(file.shape.dims):
            n = d.size
            result = [field_stack(result[i:i + n], Shape((d,))) for i in range(0, len(result), n)]
        return result[0]
    if not file.endswith('.npz'):
        file += '.npz'
    import json
    with np.load(file, allow_pickle=False) as data:
        arr = data['data']
        dim_names = [str(n) for n in data['dim_names']]
        dim_types = [str(t) for t in data['dim_types']]
        dim_item_names = [str(i) for i in data['dim_item_names']]
        field_type = str(data['field_type'])
        lower, upper = data['lower'], data['upper']
        extrap = extrapolation_mod.from_dict(json.loads(str(data['extrapolation'])))
    from ..math._shape import Dim
    dims = []
    for name, size, dtype, items in zip(dim_names, arr.shape, dim_types, dim_item_names):
        labels = tuple(items.split(',')) if items else None
        dims.append(Dim(name, size, dtype, labels))
    values = wrap(arr, Shape(tuple(dims)))
    names = [d.name for d in dims if d.dim_type == 'spatial']
    bounds = Box(wrap(lower.astype(np.float32), channel(vector=names)),
                 wrap(upper.astype(np.float32), channel(vector=names)))
    if field_type == 'StaggeredGrid':
        return StaggeredGrid(values, extrap, bounds=bounds,
                             resolution=spatial(**{n: s - 1 for n, s in zip(names, [values.shape.get_size(n) for n in names])}))
    return CenteredGrid(values, extrap, bounds=bounds)
