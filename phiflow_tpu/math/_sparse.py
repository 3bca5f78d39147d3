"""Sparse tensors with named dims — phiml API parity
(reference call sites: /root/reference/phi/geom/_mesh.py:11-16,49-51 sparse
connectivity, phi/physics/sph.py:42 neighbor matrices; SURVEY.md §2.1).

TPU-native note: on TPU, unstructured sparsity rarely beats dense masked or
padded-dense layouts (the Mesh/Graph classes use those for compute). This module
exists for API parity and for genuinely sparse host-side data (large incidence
matrices): a COO representation over named dims with matmul via segment-sum,
convertible to dense.
"""
from __future__ import annotations

from typing import Union

import numpy as np
import jax
import jax.numpy as jnp

from ._shape import Shape, Dim, EMPTY_SHAPE, channel, instance, dual, concat_shapes, merge_shapes
from ._tensor import Tensor, wrap
from . import _ops as ops

__all__ = ['SparseCooTensor', 'sparse_tensor', 'is_sparse', 'dense', 'to_format',
           'stored_indices', 'stored_values', 'matrix_from_function']


class SparseCooTensor(Tensor):
    """COO sparse tensor: (indices, values) over named sparse dims.

    indices: int tensor (instance 'entries', channel 'sparse_idx' labeled with
    the sparse dim names); values: (entries,) tensor; dense_shape: the full Shape.
    """

    def __init__(self, indices: Tensor, values: Tensor, dense_shape: Shape):
        self._indices = indices
        self._values = values
        self._dense_shape = dense_shape
        self._native = None
        self._shape = None

    @property
    def shape(self) -> Shape:
        return self._dense_shape

    @property
    def dtype(self):
        return self._values.dtype

    @property
    def available(self):
        return self._values.available

    @property
    def sparse_dims(self) -> Shape:
        labels = self._indices.shape.get_labels('sparse_idx')
        return self._dense_shape.only(list(labels), reorder=True)

    @property
    def entries(self) -> int:
        return self._indices.shape.get_size('entries')

    def _dense(self) -> Tensor:
        base = ops.zeros(self._dense_shape, dtype=self._values.dtype)
        idx = ops.rename_dims(self._indices, 'sparse_idx',
                              channel(vector=self._indices.shape.get_labels('sparse_idx')))
        return ops.scatter(base, idx, self._values, mode='add')

    def native(self, order=None):
        return self._dense().native(order)

    def numpy(self, order=None):
        return self._dense().numpy(order)

    def _op1(self, fn):
        return SparseCooTensor(self._indices, self._values._op1(fn), self._dense_shape)

    def _op2(self, other, fn, reverse=False):
        if isinstance(other, (int, float)):
            return SparseCooTensor(self._indices, self._values._op2(other, fn, reverse), self._dense_shape)
        return self._dense()._op2(other, fn, reverse)

    def __getitem__(self, item):
        return self._dense()[item]

    def __matmul__(self, other: Tensor) -> Tensor:
        """Sparse–dense matvec: contracts dual dims of self with matching primal
        dims of other via gather + segment-sum (phiml: sparse matmul)."""
        dual_dims = self.sparse_dims.dual
        assert dual_dims.rank == 1, "sparse matmul requires one dual dim"
        dual_name = dual_dims.name
        primal_name = dual_name.lstrip('~')
        row_dims = self.sparse_dims.without(dual_name)
        labels = self._indices.shape.get_labels('sparse_idx')
        col_idx = self._indices[{'sparse_idx': labels.index(dual_name)}]
        row_idx = self._indices[{'sparse_idx': labels.index(row_dims.name)}]
        gathered = ops.gather(other, col_idx, dims=primal_name)
        contrib = gathered * self._values
        out = ops.scatter(ops.zeros(row_dims, dtype=self._values.dtype),
                          ops.expand(row_idx, channel(vector=[row_dims.name])),
                          contrib, mode='add')
        return out

    def __repr__(self):
        return f"SparseCoo[{self._dense_shape}, {self.entries} entries]"


jax.tree_util.register_pytree_node(
    SparseCooTensor,
    lambda t: ((t._indices, t._values), t._dense_shape),
    lambda shape, ch: SparseCooTensor(ch[0], ch[1], shape))


def sparse_tensor(indices: Tensor, values: Tensor, dense_shape: Shape,
                  can_contain_double_entries=True, indices_sorted=False, format='coo',
                  default=0) -> Tensor:
    """Create a sparse tensor (reference API: phiml.math.sparse_tensor)."""
    if format == 'dense':
        return SparseCooTensor(indices, values, dense_shape)._dense()
    return SparseCooTensor(indices, values, dense_shape)


def is_sparse(x) -> bool:
    return isinstance(x, SparseCooTensor)


def dense(x: Tensor) -> Tensor:
    return x._dense() if isinstance(x, SparseCooTensor) else x


def to_format(x: Tensor, format: str) -> Tensor:
    """'coo'/'csr'/'csc' all map to COO internally (TPU executes dense/segment ops);
    'dense' densifies."""
    if format == 'dense':
        return dense(x)
    if isinstance(x, SparseCooTensor):
        return x
    # densify→sparsify round trip for dense inputs
    arr = np.asarray(x.native())
    nz = np.argwhere(arr != 0)
    vals = arr[tuple(nz.T)]
    idx = wrap(nz.astype(np.int32), instance(entries=nz.shape[0]),
               channel(sparse_idx=x.shape.names))
    return SparseCooTensor(idx, wrap(vals.astype(arr.dtype), instance(entries=len(vals))), x.shape)


def stored_indices(x: SparseCooTensor, list_dim=instance('entries'), index_dim=channel('index')) -> Tensor:
    assert is_sparse(x)
    return ops.rename_dims(x._indices, 'sparse_idx', index_dim.with_size(
        len(x._indices.shape.get_labels('sparse_idx')), x._indices.shape.get_labels('sparse_idx')))


def stored_values(x: SparseCooTensor, list_dim=instance('entries')) -> Tensor:
    assert is_sparse(x)
    return x._values


def matrix_from_function(f, *args, auto_compress=True, **kwargs):
    """Explicit sparse matrix + bias of an affine function (reference API:
    phiml matrix_from_function; used by phi.field for matrix export and direct
    solvers). Returns ``(matrix, bias)`` with ``f(x) == matrix @ x + bias``.

    The matrix rows carry the output dims, columns the dual of the input dims.

    TPU note: the solve path stays matrix-free (jit_compile_linear + CG); this
    exists for host-side export / inspection / direct solvers. The Jacobian is
    probed densely via jax.jacfwd (eager only — O(n) linearized evaluations),
    then sparsified, so it is intended for moderate problem sizes."""
    x0 = args[0]
    rest = args[1:]
    in_shape = x0.shape
    zero_in = ops.zeros(in_shape, dtype=x0.dtype)
    bias = f(zero_in, *rest, **kwargs)
    out_shape = bias.shape
    n_in = int(np.prod(in_shape.sizes, dtype=np.int64)) if in_shape.rank else 1
    in_order = in_shape.names
    out_order = out_shape.names

    def g(vec):
        x = Tensor(vec.reshape(tuple(in_shape.sizes)), in_shape)
        y = f(x, *rest, **kwargs)
        return (y - bias).native(out_order).reshape(-1)

    J = np.asarray(jax.jacfwd(g)(jnp.zeros((n_in,), jnp.float32)))  # (n_out, n_in)
    nz = np.argwhere(J != 0) if auto_compress else np.argwhere(np.ones_like(J, bool))
    vals = J[tuple(nz.T)]
    out_coords = np.unravel_index(nz[:, 0], tuple(out_shape.sizes)) if out_shape.rank else ()
    in_coords = np.unravel_index(nz[:, 1], tuple(in_shape.sizes)) if in_shape.rank else ()
    coords = np.stack(list(out_coords) + list(in_coords), -1).astype(np.int32)
    dual_in = dual(**{n: s for n, s in zip(in_order, in_shape.sizes)})
    col_names = list(out_order) + list(dual_in.names)
    idx = wrap(coords, instance(entries=coords.shape[0]), channel(sparse_idx=tuple(col_names)))
    matrix = SparseCooTensor(idx, wrap(vals.astype(np.float32), instance(entries=len(vals))),
                             out_shape & dual_in)
    return matrix, bias
