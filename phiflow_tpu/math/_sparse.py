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

__all__ = ['SparseCooTensor', 'SparseCompressedTensor', 'CompactSparseTensor',
           'sparse_tensor', 'is_sparse', 'dense', 'to_format',
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


class SparseCompressedTensor(Tensor):
    """CSR/CSC sparse matrix over two named sparse dims (reference API:
    phiml compressed formats, used by phi/geom/_mesh.py:36-52 face tables).

    pointers: (n_compressed+1,) int array; indices: (nnz,) uncompressed-dim
    coordinates; values: (nnz,). format 'csr' compresses the primal (row) dim,
    'csc' the dual (column) dim. Matmul expands per-entry row ids with a
    searchsorted (static shapes, TPU-safe) and contracts via gather+scatter-add.
    """

    def __init__(self, pointers, indices, values, dense_shape: Shape, format: str,
                 compressed_dim: str, uncompressed_dim: str):
        assert format in ('csr', 'csc')
        self._pointers = jnp.asarray(pointers)
        self._idx = jnp.asarray(indices)
        self._vals = jnp.asarray(values)
        self._dense_shape = dense_shape
        self._format = format
        self._compressed = compressed_dim
        self._uncompressed = uncompressed_dim
        self._native = None
        self._shape = None

    @property
    def shape(self) -> Shape:
        return self._dense_shape

    @property
    def dtype(self):
        return self._vals.dtype

    @property
    def format(self) -> str:
        return self._format

    @property
    def entries(self) -> int:
        return int(self._idx.shape[0])

    def _entry_coords(self):
        """(compressed_ids, uncompressed_ids) per stored entry."""
        nnz = self._idx.shape[0]
        comp_ids = jnp.searchsorted(self._pointers, jnp.arange(nnz), side='right') - 1
        return comp_ids.astype(jnp.int32), self._idx.astype(jnp.int32)

    def _dense(self) -> Tensor:
        comp_ids, unc_ids = self._entry_coords()
        n_comp = self._dense_shape.get_size(self._compressed)
        n_unc = self._dense_shape.get_size(self._uncompressed)
        arr = jnp.zeros((n_comp, n_unc), self._vals.dtype).at[comp_ids, unc_ids].add(self._vals)
        order = (self._compressed, self._uncompressed)
        out = Tensor(arr, self._dense_shape.only(list(order), reorder=True))
        return out

    def native(self, order=None):
        return self._dense().native(order)

    def numpy(self, order=None):
        return self._dense().numpy(order)

    def _op1(self, fn):
        return SparseCompressedTensor(self._pointers, self._idx, fn(self._vals), self._dense_shape,
                                      self._format, self._compressed, self._uncompressed)

    def _op2(self, other, fn, reverse=False):
        if isinstance(other, (int, float)):
            ov = jnp.asarray(other, self._vals.dtype)
            new = fn(ov, self._vals) if reverse else fn(self._vals, ov)
            return SparseCompressedTensor(self._pointers, self._idx, new, self._dense_shape,
                                          self._format, self._compressed, self._uncompressed)
        return self._dense()._op2(other, fn, reverse)

    def __matmul__(self, other: Tensor) -> Tensor:
        dual_name = self._dense_shape.dual.name
        primal_name = dual_name.lstrip('~')
        row_name = self._dense_shape.without(dual_name).name
        comp_ids, unc_ids = self._entry_coords()
        rows = comp_ids if self._compressed == row_name else unc_ids
        cols = unc_ids if self._compressed == row_name else comp_ids
        x = other.native((primal_name,))
        contrib = self._vals * x[cols]
        n_rows = self._dense_shape.get_size(row_name)
        out = jnp.zeros((n_rows,), self._vals.dtype).at[rows].add(contrib)
        return Tensor(out, self._dense_shape.only(row_name))

    def __repr__(self):
        return f"Sparse{self._format.upper()}[{self._dense_shape}, {self.entries} entries]"


class CompactSparseTensor(Tensor):
    """Fixed-width per-row sparsity — the TPU-native layout (reference API:
    phiml CompactSparseTensor): column indices and values as dense
    (rows, ~capacity) arrays, invalid slots marked by index −1. All ops are
    dense gathers/reductions of static shapes (no ragged anything); this is
    also the output layout of the cell-list neighbor search."""

    def __init__(self, col_indices: Tensor, values: Tensor, dense_shape: Shape):
        self._cols = col_indices
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
    def capacity(self) -> int:
        return self._cols.shape.sizes[-1] if self._cols.shape.rank else 0

    def _dense(self) -> Tensor:
        dual_name = self._dense_shape.dual.name
        row_name = self._dense_shape.without(dual_name).name
        n_rows = self._dense_shape.get_size(row_name)
        n_cols = self._dense_shape.get_size(dual_name)
        cap_dim = [n for n in self._cols.shape.names if n != row_name][0]
        cols = self._cols.native((row_name, cap_dim))
        vals = self._values.native((row_name, cap_dim))
        valid = cols >= 0
        rows = jnp.broadcast_to(jnp.arange(n_rows)[:, None], cols.shape)
        arr = jnp.zeros((n_rows, n_cols), vals.dtype).at[
            rows, jnp.where(valid, cols, 0)].add(jnp.where(valid, vals, 0))
        return Tensor(arr, self._dense_shape.only([row_name, dual_name], reorder=True))

    def native(self, order=None):
        return self._dense().native(order)

    def numpy(self, order=None):
        return self._dense().numpy(order)

    def _op1(self, fn):
        return CompactSparseTensor(self._cols, self._values._op1(fn), self._dense_shape)

    def _op2(self, other, fn, reverse=False):
        if isinstance(other, (int, float)):
            return CompactSparseTensor(self._cols, self._values._op2(other, fn, reverse), self._dense_shape)
        return self._dense()._op2(other, fn, reverse)

    def __matmul__(self, other: Tensor) -> Tensor:
        dual_name = self._dense_shape.dual.name
        primal_name = dual_name.lstrip('~')
        row_name = self._dense_shape.without(dual_name).name
        cap_dim = [n for n in self._cols.shape.names if n != row_name][0]
        cols = self._cols.native((row_name, cap_dim))
        vals = self._values.native((row_name, cap_dim))
        x = other.native((primal_name,))
        valid = cols >= 0
        contrib = jnp.where(valid, vals * x[jnp.where(valid, cols, 0)], 0)
        return Tensor(jnp.sum(contrib, axis=1), self._dense_shape.only(row_name))

    def __repr__(self):
        return f"CompactSparse[{self._dense_shape}, capacity {self.capacity}]"


jax.tree_util.register_pytree_node(
    CompactSparseTensor,
    lambda t: ((t._cols, t._values), t._dense_shape),
    lambda shape, ch: CompactSparseTensor(ch[0], ch[1], shape))


def sparse_tensor(indices: Tensor, values: Tensor, dense_shape: Shape,
                  can_contain_double_entries=True, indices_sorted=False, format='coo',
                  default=0) -> Tensor:
    """Create a sparse tensor (reference API: phiml.math.sparse_tensor)."""
    coo = SparseCooTensor(indices, values, dense_shape)
    if format == 'dense':
        return coo._dense()
    if format in ('csr', 'csc', 'compact'):
        return to_format(coo, format)
    return coo


def is_sparse(x) -> bool:
    return isinstance(x, (SparseCooTensor, SparseCompressedTensor, CompactSparseTensor))


def dense(x: Tensor) -> Tensor:
    return x._dense() if is_sparse(x) else x


def _coo_of(x: Tensor) -> 'SparseCooTensor':
    if isinstance(x, SparseCooTensor):
        return x
    arr = np.asarray(dense(x).native(x.shape.names))
    nz = np.argwhere(arr != 0)
    vals = arr[tuple(nz.T)]
    idx = wrap(nz.astype(np.int32), instance(entries=nz.shape[0]),
               channel(sparse_idx=x.shape.names))
    return SparseCooTensor(idx, wrap(vals.astype(arr.dtype), instance(entries=len(vals))), x.shape)


def to_format(x: Tensor, format: str) -> Tensor:
    """Convert between 'dense', 'coo', 'csr', 'csc', and 'compact' formats
    (reference API: phiml to_format; mesh face tables use csr/csc,
    phi/geom/_mesh.py:36-52)."""
    if format == 'dense':
        return dense(x)
    if format == 'coo':
        return _coo_of(x)
    coo = _coo_of(x)
    labels = coo._indices.shape.get_labels('sparse_idx')
    dual_names = [n for n in labels if n.startswith('~')]
    row_names = [n for n in labels if not n.startswith('~')]
    assert len(dual_names) == 1 and len(row_names) == 1, \
        f"{format} requires a (row, ~col) matrix, got sparse dims {labels}"
    row_name, dual_name = row_names[0], dual_names[0]
    idx_np = np.asarray(coo._indices.native(('entries', 'sparse_idx')))
    vals_np = np.asarray(coo._values.native())
    rows = idx_np[:, labels.index(row_name)]
    cols = idx_np[:, labels.index(dual_name)]
    n_rows = coo._dense_shape.get_size(row_name)
    n_cols = coo._dense_shape.get_size(dual_name)
    if format in ('csr', 'csc'):
        comp, unc, n_comp = (rows, cols, n_rows) if format == 'csr' else (cols, rows, n_cols)
        order = np.argsort(comp, kind='stable')
        pointers = np.zeros(n_comp + 1, np.int32)
        np.add.at(pointers, comp + 1, 1)
        pointers = np.cumsum(pointers).astype(np.int32)
        return SparseCompressedTensor(pointers, unc[order].astype(np.int32), vals_np[order],
                                      coo._dense_shape, format,
                                      compressed_dim=row_name if format == 'csr' else dual_name,
                                      uncompressed_dim=dual_name if format == 'csr' else row_name)
    if format == 'compact':
        counts = np.bincount(rows, minlength=n_rows)
        cap = max(1, int(counts.max()))
        col_arr = np.full((n_rows, cap), -1, np.int32)
        val_arr = np.zeros((n_rows, cap), vals_np.dtype)
        slot = np.zeros(n_rows, np.int32)
        for r, c, v in zip(rows, cols, vals_np):
            col_arr[r, slot[r]] = c
            val_arr[r, slot[r]] = v
            slot[r] += 1
        from ._shape import Dim, DUAL, INSTANCE
        cap_shape = Shape((coo._dense_shape.get_dim(row_name), Dim('~entries_per_row', cap, DUAL, None)))
        return CompactSparseTensor(Tensor(jnp.asarray(col_arr), cap_shape),
                                   Tensor(jnp.asarray(val_arr), cap_shape), coo._dense_shape)
    raise ValueError(f"unknown sparse format {format!r}")


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
