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


def rotation_matrix_from_axis_and_angle(axis, angle, vec_dim='vector', is_axis_normalized=False, epsilon=1e-5) -> Tensor:
    """Rodrigues rotation matrix for 3D axis+angle (reference: phi/geom/_functions.py)."""
    from ..math import _ops as ops
    axis = wrap(axis) if not isinstance(axis, Tensor) else axis
    labels = axis.shape.get_labels('vector')
    assert len(labels) == 3, "axis-angle rotations are 3D"
    if not is_axis_normalized:
        axis = ops.vec_normalize(axis, epsilon=epsilon)
    angle = wrap(angle)
    c, s = ops.cos(angle), ops.sin(angle)
    t = 1 - c
    x, y, z = axis.vector[labels[0]], axis.vector[labels[1]], axis.vector[labels[2]]
    m = [
        [t * x * x + c, t * x * y - s * z, t * x * z + s * y],
        [t * x * y + s * z, t * y * y + c, t * y * z - s * x],
        [t * x * z - s * y, t * y * z + s * x, t * z * z + c],
    ]
    rows = [stack({labels[cc]: m[r][cc] for cc in range(3)}, channel(vector=labels), expand_values=True)
            for r in range(3)]
    return stack({labels[r]: rows[r] for r in range(3)}, dual(vector=labels), expand_values=True)


def rotation_matrix_from_directions(source_dir: Tensor, target_dir: Tensor, vec_dim='vector', epsilon=1e-5) -> Tensor:
    """Rotation taking source_dir to target_dir (reference: phi/geom)."""
    from ..math import _ops as ops
    source_dir = ops.vec_normalize(source_dir, epsilon=epsilon)
    target_dir = ops.vec_normalize(target_dir, epsilon=epsilon)
    labels = source_dir.shape.get_labels('vector')
    if len(labels) == 2:
        a_s = ops.arctan2(source_dir.vector[labels[1]], source_dir.vector[labels[0]])
        a_t = ops.arctan2(target_dir.vector[labels[1]], target_dir.vector[labels[0]])
        return rotation_matrix(a_t - a_s, labels)
    axis = ops.cross(source_dir, target_dir)
    sin_a = ops.vec_length(axis, eps=1e-12)
    cos_a = ops.sum_(source_dir * target_dir, 'vector')
    angle = ops.arctan2(sin_a, cos_a)
    safe_axis = ops.where(sin_a > epsilon, ops.safe_div(axis, sin_a),
                          ops.vec(**{labels[0]: 1., labels[1]: 0., labels[2]: 0.}))
    return rotation_matrix_from_axis_and_angle(safe_axis, angle, is_axis_normalized=True)
