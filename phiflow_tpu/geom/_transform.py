"""Rotation/scaling helpers (reference: /root/reference/phi/geom/_transform.py)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..math import Tensor, wrap, channel, dual, stack, rename_dims
from ..math import _ops as ops

__all__ = ['rotation_matrix', 'rotate_vector', 'rotation_angles']


def rotation_matrix(angle, labels=('x', 'y')) -> Tensor:
    """Rotation matrix with dims (vector, ~vector).

    2D: scalar angle. 3D: Euler-angle vector (rotation about x, then y, then z)."""
    angle = wrap(angle)
    labels = tuple(labels)
    if len(labels) == 2:
        c, s = ops.cos(angle), ops.sin(angle)
        rows = [stack({labels[0]: c, labels[1]: -s}, channel(vector=labels), expand_values=True),
                stack({labels[0]: s, labels[1]: c}, channel(vector=labels), expand_values=True)]
        return stack({labels[0]: rows[0], labels[1]: rows[1]}, dual(vector=labels), expand_values=True)
    elif len(labels) == 3:
        if 'vector' in angle.shape:
            ax, ay, az = angle.vector[0], angle.vector[1], angle.vector[2]
        else:
            ax = ay = wrap(0.)
            az = angle
        cx, sx = ops.cos(ax), ops.sin(ax)
        cy, sy = ops.cos(ay), ops.sin(ay)
        cz, sz = ops.cos(az), ops.sin(az)
        # R = Rz @ Ry @ Rx
        m = [
            [cz * cy, cz * sy * sx - sz * cx, cz * sy * cx + sz * sx],
            [sz * cy, sz * sy * sx + cz * cx, sz * sy * cx - cz * sx],
            [-sy, cy * sx, cy * cx],
        ]
        rows = []
        for r in range(3):
            rows.append(stack({labels[c]: m[r][c] for c in range(3)}, channel(vector=labels), expand_values=True))
        return stack({labels[r]: rows[r] for r in range(3)}, dual(vector=labels), expand_values=True)
    raise NotImplementedError(f"rotation in {len(labels)}D")


def rotate_vector(v: Tensor, angle, invert=False) -> Tensor:
    """Rotate vector(s) `v` by `angle` (scalar 2D / Euler 3D / matrix)."""
    if angle is None:
        return v
    labels = v.shape.get_labels('vector')
    m = angle if isinstance(angle, Tensor) and '~vector' in angle.shape else rotation_matrix(angle, labels)
    # m[~vector=row, vector=col]: y_row = Σ_col R[row,col] x_col
    if invert:
        # R⁻¹ = Rᵀ: contract over rows (~vector) instead
        vd = rename_dims(v, 'vector', dual(vector=labels))
        return ops.sum_(m * vd, '~vector')
    out = ops.sum_(m * v, 'vector')
    return rename_dims(out, '~vector', channel(vector=labels))


def rotation_angles(matrix: Tensor):
    """Extract rotation angle(s) from a rotation matrix (2D only for now)."""
    labels = matrix.shape.get_labels('vector')
    if len(labels) == 2:
        return ops.arctan2(matrix[{'vector': 1, '~vector': 0}], matrix[{'vector': 0, '~vector': 0}])
    raise NotImplementedError("3D rotation_angles")
