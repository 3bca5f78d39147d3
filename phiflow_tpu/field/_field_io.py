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

__all__ = ['write', 'read', 'write_sharded', 'read_sharded']


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


def write_sharded(field: Field, file: str):
    """Sharding-aware chunked write (SURVEY.md §7 step 12 — beyond the
    reference, whose Scene IO is host-gather only): each device's local shard
    of a multi-device Field is saved as its own chunk file
    ``<file>.shard<k>.npz`` (no cross-device gather, no full-array host copy),
    plus a ``<file>.manifest.npz`` with the global metadata."""
    assert field.is_grid and field.is_centered, "sharded IO currently supports centered grids"
    import json
    values = field.values
    arr = values.native()
    if not hasattr(arr, 'addressable_shards') or len(arr.addressable_shards) <= 1:
        _write_single(field, file)  # not sharded: plain single-file write
        return
    base = file[:-4] if file.endswith('.npz') else file
    os.makedirs(os.path.dirname(os.path.abspath(base)) or '.', exist_ok=True)
    chunk_meta = []
    for k, shard in enumerate(arr.addressable_shards):
        starts = [s.start or 0 for s in shard.index]
        np.savez_compressed(f"{base}.shard{k}.npz", data=np.asarray(shard.data),
                            starts=np.asarray(starts, np.int64))
        chunk_meta.append(f"{base}.shard{k}.npz")
    extrap = json.dumps(field.boundary.to_dict())
    np.savez_compressed(f"{base}.manifest.npz",
                        global_shape=np.asarray(arr.shape, np.int64),
                        n_chunks=np.asarray(len(chunk_meta)),
                        dim_names=np.array(values.shape.names),
                        dim_types=np.array(values.shape.types),
                        dim_item_names=np.array([','.join(l) if l else '' for l in values.shape.labels]),
                        lower=np.asarray(field.bounds.lower.native()),
                        upper=np.asarray(field.bounds.upper.native()),
                        extrapolation=np.array(extrap))


def read_sharded(file: str, sharding=None) -> Field:
    """Read a chunked field written by `write_sharded`. With a
    `jax.sharding.Sharding`, chunks are placed directly onto their devices via
    `jax.make_array_from_single_device_arrays`; otherwise they are assembled
    on host."""
    import json
    import jax
    base = file[:-4] if file.endswith('.npz') else file
    manifest_path = f"{base}.manifest.npz"
    if not os.path.isfile(manifest_path):
        return read(file)
    with np.load(manifest_path, allow_pickle=False) as m:
        global_shape = tuple(int(s) for s in m['global_shape'])
        n_chunks = int(m['n_chunks'])
        dim_names = [str(n) for n in m['dim_names']]
        dim_types = [str(t) for t in m['dim_types']]
        dim_item_names = [str(i) for i in m['dim_item_names']]
        lower, upper = m['lower'], m['upper']
        extrap = extrapolation_mod.from_dict(json.loads(str(m['extrapolation'])))
    chunks = []
    for k in range(n_chunks):
        with np.load(f"{base}.shard{k}.npz", allow_pickle=False) as c:
            chunks.append((tuple(int(s) for s in c['starts']), np.asarray(c['data'])))
    if sharding is not None:
        dev_arrays = []
        devices = sharding._device_assignment if hasattr(sharding, '_device_assignment') else list(sharding.device_set)
        # match chunks to the sharding's own index map
        import jax.numpy as jnp
        idx_map = sharding.devices_indices_map(global_shape)
        chunk_by_start = {st: data for st, data in chunks}
        for dev, index in idx_map.items():
            starts = tuple(s.start or 0 for s in index)
            data = chunk_by_start[starts]
            dev_arrays.append(jax.device_put(data, dev))
        arr = jax.make_array_from_single_device_arrays(global_shape, sharding, dev_arrays)
    else:
        arr = np.zeros(global_shape, chunks[0][1].dtype)
        for starts, data in chunks:
            sl = tuple(slice(s, s + d) for s, d in zip(starts, data.shape))
            arr[sl] = data
    from ..math._shape import Dim
    dims = [Dim(n, s, t, tuple(i.split(',')) if i else None)
            for n, s, t, i in zip(dim_names, global_shape, dim_types, dim_item_names)]
    values = Tensor(arr if sharding is not None else wrap(arr, Shape(tuple(dims))).native(), Shape(tuple(dims)))
    names = [d.name for d in dims if d.dim_type == 'spatial']
    bounds = Box(wrap(lower.astype(np.float32), channel(vector=names)),
                 wrap(upper.astype(np.float32), channel(vector=names)))
    return CenteredGrid(values, extrap, bounds=bounds)


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
