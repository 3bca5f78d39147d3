"""Device-mesh construction and named-dim-aware sharding specs."""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Union

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..math import Tensor, TensorStack, Shape
from ..field import Field

__all__ = ['create_mesh', 'sharding_for', 'shard_tensor', 'shard_field', 'replicate',
           'with_sharding_constraint_field', 'simulation_mesh']


def create_mesh(axis_sizes: Dict[str, int], devices: Optional[Sequence] = None) -> Mesh:
    """Create a `jax.sharding.Mesh` with named axes, e.g.
    ``create_mesh({'batch': 2, 'x': 2, 'y': 2})``."""
    devices = list(devices if devices is not None else jax.devices())
    names = tuple(axis_sizes.keys())
    sizes = tuple(axis_sizes.values())
    n = int(np.prod(sizes))
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    dev_array = np.array(devices[:n]).reshape(sizes)
    return Mesh(dev_array, names)


def simulation_mesh(n_devices: int = None, batch: int = 1, spatial_dims: Sequence[str] = ('x',),
                    devices=None) -> Mesh:
    """Default mesh layout for PDE simulations: one axis per sharded spatial dim,
    remaining device factor on the batch (data) axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    per_spatial = max(1, int(round((n // batch) ** (1 / max(1, len(spatial_dims))))))
    sizes = {'batch': batch}
    rem = n // batch
    for d in spatial_dims:
        s = min(per_spatial, rem)
        sizes[d] = s
        rem //= s
    return create_mesh(sizes, devices)


def _spec_for_shape(shape: Shape, mesh: Mesh, dim_to_axis: Dict[str, str]) -> PartitionSpec:
    entries = []
    for d in shape.dims:
        axis = dim_to_axis.get(d.name)
        if axis is not None and axis in mesh.axis_names and d.size is not None \
                and d.size % mesh.shape[axis] == 0:
            entries.append(axis)
        else:
            entries.append(None)
    return PartitionSpec(*entries)


def sharding_for(shape: Shape, mesh: Mesh, dim_to_axis: Dict[str, str]) -> NamedSharding:
    """NamedSharding for a named tensor shape: map tensor dims → mesh axes."""
    return NamedSharding(mesh, _spec_for_shape(shape, mesh, dim_to_axis))


def shard_tensor(t: Tensor, mesh: Mesh, dim_to_axis: Dict[str, str]) -> Tensor:
    """device_put a named tensor with the given per-dim sharding."""
    if isinstance(t, TensorStack):
        return TensorStack([shard_tensor(c, mesh, dim_to_axis) for c in t.components], t.stack_dim)
    sharding = sharding_for(t.shape, mesh, dim_to_axis)
    return Tensor(jax.device_put(t.native(), sharding), t.shape)


def shard_field(field: Field, mesh: Mesh, dim_to_axis: Dict[str, str] = None) -> Field:
    """Shard a Field's values across the mesh. By default, spatial dims map to
    same-named mesh axes and batch dims to the 'batch' axis.

    Note: staggered components are sharded on their own (interior-face) sizes;
    exact divisibility is not required — non-divisible dims stay replicated.
    """
    if dim_to_axis is None:
        dim_to_axis = {}
        for d in field.values.shape.dims if not isinstance(field.values, TensorStack) else field.shape.dims:
            if d.is_spatial and d.name in mesh.axis_names:
                dim_to_axis[d.name] = d.name
            elif d.is_batch and 'batch' in mesh.axis_names:
                dim_to_axis[d.name] = 'batch'
    values = shard_tensor(field.values, mesh, dim_to_axis)
    return field.with_values(values)


def replicate(field_or_tensor, mesh: Mesh):
    """Fully replicate across the mesh."""
    if isinstance(field_or_tensor, Field):
        return shard_field(field_or_tensor, mesh, {})
    return shard_tensor(field_or_tensor, mesh, {})


def with_sharding_constraint_field(field: Field, mesh: Mesh, dim_to_axis: Dict[str, str]) -> Field:
    """Inside jit: constrain intermediate Field values to a sharding."""
    def constrain(t: Tensor) -> Tensor:
        if isinstance(t, TensorStack):
            return TensorStack([constrain(c) for c in t.components], t.stack_dim)
        sharding = sharding_for(t.shape, mesh, dim_to_axis)
        return Tensor(jax.lax.with_sharding_constraint(t.native(), sharding), t.shape)
    return field.with_values(constrain(field.values))
