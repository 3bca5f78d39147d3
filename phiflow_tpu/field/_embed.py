"""FieldEmbedding — an Extrapolation whose pad values are sampled from another Field
(reference: /root/reference/phi/field/_embed.py:12-143; used for nested domains
and the pressure/accessible interplay at phi/physics/fluid.py:271,286)."""
from __future__ import annotations

import jax

from ..math import Tensor, Shape, wrap
from ..math import _ops as ops
from ..math import extrapolation as extrapolation_mod
from ..math.extrapolation import Extrapolation
from ..geom import UniformGrid

__all__ = ['FieldEmbedding']


class FieldEmbedding(Extrapolation):

    def __init__(self, field):
        super().__init__(pad_rank=1)
        self.field = field

    def to_dict(self) -> dict:
        return {'type': 'field-embedding'}

    def valid_outer_faces(self, dim):
        return True, True

    def determines_boundary_values(self, key) -> bool:
        return False

    @property
    def is_flexible(self) -> bool:
        return True

    def spatial_gradient(self) -> Extrapolation:
        return extrapolation_mod.BOUNDARY

    def pad_values(self, value: Tensor, width: int, dim: str, upper_edge: bool,
                   bounds=None, already_padded=None, **kwargs) -> Tensor:
        """Sample the embedded field at the ghost-cell positions
        (reference: phi/field/_embed.py:56)."""
        from ._resample import sample_grid_at_points
        assert bounds is not None or value.shape.spatial, "FieldEmbedding.pad requires grid context"
        # Reconstruct ghost-cell world positions from the value tensor + bounds.
        if bounds is None:
            # fallback: replicate edge (cannot locate in space)
            return extrapolation_mod.BOUNDARY.pad_values(value, width, dim, upper_edge)
        resolution = value.shape.spatial
        grid = UniformGrid(resolution, bounds)
        ghost = grid.padded({dim: (0, width) if upper_edge else (width, 0)})
        if upper_edge:
            region = ghost[{dim: slice(-width, None)}]
        else:
            region = ghost[{dim: slice(0, width)}]
        return sample_grid_at_points(self.field, region.center)

    def __getitem__(self, item):
        if isinstance(item, dict):
            sliced = self.field[{k: v for k, v in item.items() if k in self.field.shape}]
            return FieldEmbedding(sliced)
        return self

    def __eq__(self, other):
        return isinstance(other, FieldEmbedding) and other.field is self.field

    def __hash__(self):
        return hash('field-embedding')

    def __repr__(self):
        return f"FieldEmbedding({self.field})"


jax.tree_util.register_pytree_node(
    FieldEmbedding,
    lambda e: ((e.field,), None),
    lambda aux, ch: FieldEmbedding(ch[0]))
