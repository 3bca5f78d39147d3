"""Named-dim Tensor over `jax.Array` — the TPU-native analog of phiml's Tensor.

Design (SURVEY.md §7 step 1): a `Tensor` is a thin, immutable wrapper pairing one
`jax.Array` (native axis order == shape order) with a `Shape`. It is registered
as a JAX pytree with the array as the only leaf and the `Shape` as static
aux-data, so `jax.jit`/`grad`/`vmap`/`shard_map` traverse it natively — there is
no separate backend abstraction (the reference's 4-backend layer, SURVEY.md §1
layer 0, is collapsed into XLA).

Non-uniform stacks (components of different spatial sizes, as needed for
staggered grids — reference /root/reference/phi/field/_grid.py:162) are
represented by `TensorStack`, which holds one uniform `Tensor` per slice of the
stack dim and maps operations over them.
"""
from __future__ import annotations

import operator
from typing import Callable, Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from ._shape import (
    Shape, Dim, EMPTY_SHAPE, BATCH, SPATIAL, CHANNEL, INSTANCE, DUAL,
    batch, spatial, channel, instance, dual, merge_shapes, concat_shapes,
    parse_dim_order, shape_of, after_gather, _resolve_filter,
)
from ._magic import BoundDim, slicing_dict, IncompatibleShapes

__all__ = ['Tensor', 'TensorStack', 'wrap', 'tensor', 'backend_dtype', 'NUMPY', 'precision', 'set_global_precision', 'get_precision']


# --- precision control (reference: math.set_global_precision, Kolmogorov nb) ---
_PRECISION = [32]


def set_global_precision(bits: int):
    assert bits in (16, 32, 64)
    if bits == 64:
        jax.config.update('jax_enable_x64', True)
    _PRECISION[0] = bits


def get_precision() -> int:
    return _PRECISION[0]


class precision:
    """Context manager for float precision: ``with math.precision(64): ...``.
    Restores both the default float width AND the jax x64 flag on exit."""
    def __init__(self, bits: int):
        self.bits = bits

    def __enter__(self):
        self.old = _PRECISION[0]
        self.old_x64 = jax.config.read('jax_enable_x64')
        if self.bits == 64:
            jax.config.update('jax_enable_x64', True)
        _PRECISION[0] = self.bits

    def __exit__(self, *args):
        _PRECISION[0] = self.old
        jax.config.update('jax_enable_x64', self.old_x64)


def default_float():
    return {16: jnp.float16, 32: jnp.float32, 64: jnp.float64}[_PRECISION[0]]


def backend_dtype(kind='float'):
    if kind == 'float':
        return default_float()
    if kind == 'int':
        return jnp.int32
    if kind == 'complex':
        return jnp.complex64 if _PRECISION[0] <= 32 else jnp.complex128
    if kind == 'bool':
        return jnp.bool_
    raise ValueError(kind)


class _NumpyContext:
    """Compatibility shim for the reference's ``with math.NUMPY:`` eager-setup blocks
    (/root/reference/phi/physics/fluid.py:132). In the JAX-only design there is a single
    backend, so this is a no-op context; setup code traced under jit stays traceable."""
    def __enter__(self):
        return self

    def __exit__(self, *args):
        return False

    def __repr__(self):
        return 'numpy-compat (no-op: JAX-only core)'


NUMPY = _NumpyContext()


class Tensor:
    """Uniform named-dim tensor: one `jax.Array` + `Shape`. Immutable."""
    __slots__ = ('_native', '_shape')
    # numpy must defer to our __radd__ etc. instead of iterating the Tensor
    __array_priority__ = 100.0
    __array_ufunc__ = None

    def __init__(self, native, shape: Shape):
        assert isinstance(shape, Shape), f"shape must be Shape, got {type(shape)}"
        if not isinstance(native, (jax.Array, np.ndarray)) and not hasattr(native, 'shape'):
            native = jnp.asarray(native)
        assert tuple(native.shape) == tuple(shape.sizes), \
            f"native shape {tuple(native.shape)} does not match {shape}"
        self._native = native
        self._shape = shape

    # --- core accessors ---
    @property
    def shape(self) -> Shape:
        return self._shape

    @property
    def dtype(self):
        return self._native.dtype

    @property
    def rank(self) -> int:
        return self._shape.rank

    @property
    def available(self) -> bool:
        return not isinstance(self._native, jax.core.Tracer)

    def native(self, order=None):
        """Native `jax.Array` transposed to `order` (missing dims broadcast to size 1)."""
        if order is None:
            return self._native
        names = parse_dim_order(order)
        return _align_native(self._native, self._shape, names)

    def numpy(self, order=None):
        return np.asarray(self.native(order))

    def item(self):
        return self._native.item()

    def __float__(self):
        return float(self._native)

    def __int__(self):
        return int(self._native)

    def __bool__(self):
        return bool(self._native)

    def __len__(self):
        assert self.rank >= 1
        return self._shape.sizes[0]

    # --- shape manipulation ---
    def _transposed(self, order_names: Tuple[str, ...]) -> 'Tensor':
        perm = tuple(self._shape.index(n) for n in order_names)
        if perm == tuple(range(self.rank)):
            return self
        native = jnp.transpose(self._native, perm)
        return Tensor(native, Shape(tuple(self._shape.get_dim(n) for n in order_names)))

    def _with_shape(self, shape: Shape) -> 'Tensor':
        return Tensor(self._native, shape)

    def _expand(self, dims: Shape) -> 'Tensor':
        """Add new dims (broadcast); existing dims are verified."""
        new = [d for d in dims.dims if d.name not in self._shape]
        if not new:
            return self
        target = tuple(d.size for d in new) + tuple(self._shape.sizes)
        native = self._native.reshape((1,) * len(new) + tuple(self._shape.sizes))
        if isinstance(native, np.ndarray):  # keep host arrays host (jit-literal safe)
            native = np.broadcast_to(native, target)
        else:
            native = jnp.broadcast_to(native, target)
        return Tensor(native, Shape(tuple(new) + self._shape.dims))

    # --- slicing ---
    def __getitem__(self, item):
        if isinstance(item, Tensor):
            if item.dtype == jnp.bool_:
                from ._ops import boolean_mask
                return boolean_mask(self, item.shape.non_batch if item.shape.non_batch else item.shape, item)
            from ._ops import gather
            return gather(self, item)
        sel = slicing_dict(self, item)
        return self._getitem_dict(sel)

    def _getitem_dict(self, sel: dict) -> 'Tensor':
        if not sel:
            return self
        sel = dict(sel)
        tensor_sel = {k: v for k, v in sel.items() if isinstance(v, Tensor)}
        for k in tensor_sel:
            del sel[k]
        idx = []
        for d in self._shape.dims:
            if d.name in sel:
                s = sel[d.name]
                if isinstance(s, str):
                    if ',' in s:
                        assert d.labels, f"dim {d.name} has no labels"
                        s = [d.labels.index(n.strip()) for n in s.split(',')]
                    else:
                        assert d.labels, f"dim {d.name} has no labels"
                        s = d.labels.index(s.strip())
                if isinstance(s, (tuple, list)):
                    if s and all(isinstance(n, str) for n in s):
                        assert d.labels, f"dim {d.name} has no labels"
                        s = [d.labels.index(n) for n in s]
                    s = np.asarray(s)
                if isinstance(s, Shape):
                    assert d.labels
                    s = [d.labels.index(n) for n in s.names]
                    s = np.asarray(s)
                idx.append(s)
            else:
                idx.append(slice(None))
        # numpy advanced indexing on separate axes: do sequentially to avoid axis reordering
        native = self._native
        offset = 0
        for axis, s in enumerate(idx):
            if isinstance(s, slice) and s == slice(None):
                continue
            native = jnp.take(native, jnp.asarray(s), axis=axis - offset) if isinstance(s, np.ndarray) \
                else native[(slice(None),) * (axis - offset) + (s,)]
            if isinstance(s, int):
                offset += 1
        new_shape = _shape_after_getitem(self._shape, sel)
        result = Tensor(native, new_shape)
        if tensor_sel:
            from ._ops import gather
            for k, v in tensor_sel.items():
                result = gather(result, v, k)
        return result

    def __getattr__(self, name):
        if name.startswith('_') or name in ('shape', 'dtype'):
            raise AttributeError(name)
        shape = self.shape
        if name in shape:
            return BoundDim(self, name)
        if '~' + name in shape:
            return BoundDim(self, '~' + name)
        raise AttributeError(f"{type(self).__name__} has no attribute '{name}' (shape: {shape})")

    def dimension(self, name):
        return BoundDim(self, name)

    # --- iteration / unstack ---
    def _unstack(self, dim: str) -> tuple:
        axis = self._shape.index(dim)
        new_shape = self._shape.without(dim)
        natives = [jnp.squeeze(x, axis) for x in jnp.split(self._native, self._shape.get_size(dim), axis)]
        return tuple(Tensor(n, new_shape) for n in natives)

    # --- arithmetic ---
    def _op1(self, fn) -> 'Tensor':
        return Tensor(_keep_host(fn(self._native), self._native), self._shape)

    def _op2(self, other, fn, reverse=False) -> 'Tensor':
        if isinstance(other, TensorStack):
            return NotImplemented  # let TensorStack handle it via reflected op
        if isinstance(other, Tensor):
            a, b, shape = _broadcast(self, other)
            return Tensor(_keep_host(fn(b, a) if reverse else fn(a, b), a, b), shape)
        if isinstance(other, (int, float, bool, complex)) or (isinstance(other, (np.ndarray, jax.Array)) and np.ndim(other) == 0):
            res = fn(other, self._native) if reverse else fn(self._native, other)
            return Tensor(_keep_host(res, self._native), self._shape)
        if isinstance(other, (tuple, list, np.ndarray, jax.Array)):
            other = wrap(other, channel(vector=len(other)))
            return self._op2(other, fn, reverse)
        if hasattr(other, '__tensor_op2__') or hasattr(other, 'shape') and not isinstance(other, Tensor):
            return NotImplemented
        return NotImplemented

    def __add__(self, other): return self._op2(other, operator.add)
    def __radd__(self, other): return self._op2(other, operator.add, reverse=True)
    def __sub__(self, other): return self._op2(other, operator.sub)
    def __rsub__(self, other): return self._op2(other, operator.sub, reverse=True)
    def __mul__(self, other): return self._op2(other, operator.mul)
    def __rmul__(self, other): return self._op2(other, operator.mul, reverse=True)
    def __truediv__(self, other): return self._op2(other, operator.truediv)
    def __rtruediv__(self, other): return self._op2(other, operator.truediv, reverse=True)
    def __floordiv__(self, other): return self._op2(other, operator.floordiv)
    def __rfloordiv__(self, other): return self._op2(other, operator.floordiv, reverse=True)
    def __mod__(self, other): return self._op2(other, operator.mod)
    def __rmod__(self, other): return self._op2(other, operator.mod, reverse=True)
    def __pow__(self, other): return self._op2(other, operator.pow)
    def __rpow__(self, other): return self._op2(other, operator.pow, reverse=True)
    def __neg__(self): return self._op1(operator.neg)
    def __abs__(self): return self._op1(jnp.abs)
    def __invert__(self): return self._op1(jnp.logical_not if self.dtype == jnp.bool_ else operator.invert)
    def __and__(self, other): return self._op2(other, jnp.logical_and if self.dtype == jnp.bool_ else operator.and_)
    def __rand__(self, other): return self._op2(other, jnp.logical_and if self.dtype == jnp.bool_ else operator.and_, reverse=True)
    def __or__(self, other): return self._op2(other, jnp.logical_or if self.dtype == jnp.bool_ else operator.or_)
    def __ror__(self, other): return self._op2(other, jnp.logical_or if self.dtype == jnp.bool_ else operator.or_, reverse=True)
    def __xor__(self, other): return self._op2(other, operator.xor)
    def __gt__(self, other): return self._op2(other, operator.gt)
    def __ge__(self, other): return self._op2(other, operator.ge)
    def __lt__(self, other): return self._op2(other, operator.lt)
    def __le__(self, other): return self._op2(other, operator.le)

    def __eq__(self, other):
        if other is None:
            return wrap(False)
        try:
            return self._op2(other, lambda a, b: a == b)
        except (IncompatibleShapes, TypeError):
            return wrap(False)

    def __ne__(self, other):
        if other is None:
            return wrap(True)
        try:
            return self._op2(other, lambda a, b: a != b)
        except (IncompatibleShapes, TypeError):
            return wrap(True)

    def __hash__(self):
        return id(self)

    def __repr__(self):
        if self.rank == 0:
            if self.available:
                return f"{self._native}"
            return f"Tensor[traced, {self.dtype}]"
        if self.available and self._shape.volume <= 16:
            return f"{self._shape} {np.asarray(self._native).tolist()}"
        extra = ''
        if self.available:
            try:
                n = np.asarray(self._native)
                if n.dtype.kind in 'fiu' and n.size:
                    extra = f" [{n.min():.3g}...{n.max():.3g}]"
            except Exception:
                pass
        return f"Tensor[{self._shape}, {self.dtype}]{extra}"

    # --- magic interop ---
    def __stack__(self, values, dim: Shape, **kwargs):
        from ._ops import stack
        return stack(values, dim, **kwargs)

    def __expand__(self, dims: Shape, **kwargs):
        return self._expand(dims)


class TensorStack(Tensor):
    """Stack of uniform Tensors along one dim; component shapes may differ
    (non-uniform, e.g. staggered-grid components — /root/reference/phi/field/_grid.py:162)."""
    __slots__ = ('_components', '_stack_dim')

    def __init__(self, components: Sequence[Tensor], stack_dim: Shape):
        assert len(stack_dim) == 1
        components = tuple(components)
        assert all(isinstance(c, Tensor) for c in components)
        sd = stack_dim.dims[0].with_size(len(components), stack_dim.dims[0].labels)
        self._components = components
        self._stack_dim = Shape((sd,))
        self._native = None
        self._shape = None  # computed lazily

    @property
    def shape(self) -> Shape:
        inner = merge_shapes(*[c.shape for c in self._components], allow_varying_sizes=True)
        return concat_shapes(self._stack_dim, inner)

    @property
    def stack_dim(self) -> Shape:
        return self._stack_dim

    @property
    def components(self) -> Tuple[Tensor, ...]:
        return self._components

    @property
    def is_uniform(self) -> bool:
        s0 = self._components[0].shape
        key0 = {(d.name, d.size) for d in s0.dims}
        return all({(d.name, d.size) for d in c.shape.dims} == key0 for c in self._components)

    @property
    def dtype(self):
        return self._components[0].dtype

    @property
    def rank(self):
        return self.shape.rank

    @property
    def available(self):
        return all(c.available for c in self._components)

    def _contiguous(self) -> Tensor:
        assert self.is_uniform, f"cannot densify non-uniform stack {self.shape}"
        order = self._components[0].shape.names
        comps = [c._transposed(order) if c.shape.names != order else c for c in self._components]
        natives = [c.native() for c in comps]
        native = jnp.stack(natives, axis=0)
        return Tensor(native, concat_shapes(self._stack_dim, comps[0].shape))

    def native(self, order=None):
        return self._contiguous().native(order)

    def numpy(self, order=None):
        return np.asarray(self.native(order))

    def _unstack(self, dim: str) -> tuple:
        if dim == self._stack_dim.name:
            return self._components
        return tuple(TensorStack([c._getitem_dict({}) if dim not in c.shape else c._unstack(dim)[i]
                                  for c in self._components], self._stack_dim)
                     for i in range(self.shape.get_size(dim)))

    def __getitem__(self, item):
        sel = slicing_dict(self, item)
        return self._getitem_dict(sel)

    def _getitem_dict(self, sel: dict) -> Tensor:
        sel = dict(sel)
        sname = self._stack_dim.name
        if sname in sel:
            s = sel.pop(sname)
            labels = self._stack_dim.dims[0].labels
            if isinstance(s, str):
                if ',' in s:
                    s = [labels.index(n.strip()) for n in s.split(',')]
                else:
                    s = labels.index(s.strip())
            if isinstance(s, int):
                comp = self._components[s]
                return comp._getitem_dict({k: v for k, v in sel.items() if k in comp.shape}) if sel else comp
            if isinstance(s, slice):
                comps = self._components[s]
                new_labels = labels[s] if labels else None
                sd = Shape((Dim(sname, len(comps), self._stack_dim.dims[0].dim_type, new_labels),))
                result = TensorStack(comps, sd)
                return result._getitem_dict(sel) if sel else result
            if isinstance(s, (tuple, list)):
                comps = [self._components[i] for i in s]
                new_labels = tuple(labels[i] for i in s) if labels else None
                sd = Shape((Dim(sname, len(comps), self._stack_dim.dims[0].dim_type, new_labels),))
                result = TensorStack(comps, sd)
                return result._getitem_dict(sel) if sel else result
            raise ValueError(f"invalid selection {s!r} for stack dim")
        if not sel:
            return self
        comps = [c._getitem_dict({k: v for k, v in sel.items() if k in c.shape}) for c in self._components]
        return TensorStack(comps, self._stack_dim)

    def _op1(self, fn) -> 'TensorStack':
        return TensorStack([c._op1(fn) for c in self._components], self._stack_dim)

    def _op2(self, other, fn, reverse=False) -> 'TensorStack':
        sname = self._stack_dim.name
        if isinstance(other, Tensor) and sname in other.shape:
            others = other._unstack(sname)
            comps = [c._op2(o, fn, reverse) for c, o in zip(self._components, others)]
        elif isinstance(other, Tensor) or isinstance(other, (int, float, bool, complex, tuple, list)) or (
                isinstance(other, (np.ndarray, jax.Array))):
            comps = [c._op2(other, fn, reverse) for c in self._components]
        else:
            return NotImplemented
        return TensorStack(comps, self._stack_dim)

    def _expand(self, dims: Shape) -> 'TensorStack':
        new = dims.without(self._stack_dim.name)
        return TensorStack([c._expand(new) for c in self._components], self._stack_dim)

    def _transposed(self, order_names):
        return self  # order is semantic-free; no-op for stacks

    def __repr__(self):
        return f"TensorStack[{self._stack_dim} over {len(self._components)} components]"


def _shape_after_getitem(shape: Shape, sel: dict) -> Shape:
    dims = []
    for d in shape.dims:
        if d.name not in sel:
            dims.append(d)
            continue
        s = sel[d.name]
        if isinstance(s, str):
            if ',' in s:
                names = tuple(n.strip() for n in s.split(','))
                dims.append(Dim(d.name, len(names), d.dim_type, names))
            continue  # single label or int → removed
        if isinstance(s, int):
            continue
        if isinstance(s, slice):
            start, stop, step = s.indices(d.size)
            n = len(range(start, stop, step))
            labels = d.labels[s] if d.labels else None
            dims.append(Dim(d.name, n, d.dim_type, labels))
        elif isinstance(s, (tuple, list, np.ndarray)):
            s = list(s)
            if s and all(isinstance(n, str) for n in s):
                s = [d.labels.index(n) for n in s]
            labels = tuple(d.labels[i] for i in s) if d.labels else None
            dims.append(Dim(d.name, len(s), d.dim_type, labels))
        elif isinstance(s, Shape):
            labels = s.names
            dims.append(Dim(d.name, len(labels), d.dim_type, labels))
        else:
            dims.append(d)
    return Shape(tuple(dims))


def _keep_host(result, *inputs):
    """If every array input lived on the host (numpy), bring an eagerly-computed
    jax result back to the host. This keeps setup constants (boundary values,
    geometry metadata) host-resident, so they embed into jit traces as literals —
    the axon TPU backend cannot fetch device arrays during lowering."""
    if isinstance(result, jax.Array) and not isinstance(result, jax.core.Tracer):
        if all(isinstance(i, (np.ndarray, np.generic, int, float, bool, complex)) for i in inputs):
            result = np.asarray(result)
    if isinstance(result, (np.ndarray, np.generic)):
        # numpy NEP-50 promotion widens f32⋆i32 → f64 (and i32/i32 → f64);
        # jax would give f32. Keep host math at the session precision so
        # eager-host state matches jit-traced state dtype-for-dtype (a f64
        # leaf in a model state forces an extra jit trace).
        if result.dtype == np.float64 and get_precision() != 64 \
                and not any(getattr(i, 'dtype', None) == np.float64 for i in inputs):
            result = result.astype(np.float32)
        elif result.dtype == np.int64 and not any(getattr(i, 'dtype', None) == np.int64 for i in inputs):
            result = result.astype(np.int32)
        elif result.dtype == np.complex128 and get_precision() != 64 \
                and not any(getattr(i, 'dtype', None) == np.complex128 for i in inputs):
            result = result.astype(np.complex64)
    return result


def _align_native(native, shape: Shape, order: Tuple[str, ...]):
    """Transpose/expand `native` to axis order `order`; missing dims get size 1.
    Host (numpy) inputs stay host so they embed into jit traces as literals."""
    xp = np if isinstance(native, np.ndarray) else jnp
    present = [n for n in order if n in shape]
    perm = [shape.index(n) for n in present]
    extra = [n for n in shape.names if n not in order]
    assert not extra or all(shape.get_size(n) == 1 for n in extra), \
        f"cannot convert {shape} to order {order}: dims {extra} missing from order"
    x = native
    if extra:
        x = xp.squeeze(x, axis=tuple(shape.index(n) for n in extra))
        kept = [n for n in shape.names if n in order]
        perm = [kept.index(n) for n in present]
    x = xp.transpose(x, perm) if perm != list(range(len(perm))) else x
    missing_axes = [i for i, n in enumerate(order) if n not in shape]
    for ax in missing_axes:
        x = xp.expand_dims(x, ax)
    return x


def _broadcast(a: Tensor, b: Tensor):
    """Align two uniform tensors to their merged shape; returns (a_native, b_native, shape)."""
    if a._shape == b._shape:
        return a._native, b._native, a._shape
    shape = merge_shapes(a._shape, b._shape)
    an = _align_native(a._native, a._shape, shape.names)
    bn = _align_native(b._native, b._shape, shape.names)
    return an, bn, shape


def wrap(value, *shape: Shape) -> Tensor:
    """Wrap a value (number, array, list, Tensor) as a Tensor without copying."""
    if isinstance(value, Tensor):
        if shape:
            target = concat_shapes(*shape)
            assert set(target.names) == set(value.shape.names), f"wrap: shape mismatch {target} vs {value.shape}"
            return value
        return value
    if isinstance(value, (tuple, list)):
        if any(isinstance(v, Tensor) for v in value):
            from ._ops import stack
            dim = concat_shapes(*shape) if shape else channel(vector=len(value))
            return stack([wrap(v) for v in value], dim)
        value = np.asarray(value)
        if value.dtype == np.float64 and get_precision() != 64:
            value = value.astype(np.float32)
        if value.dtype == np.int64:
            value = value.astype(np.int32)
    if isinstance(value, (int, float, bool, complex)):
        # host (numpy) scalars: they embed into jit traces as inline constants
        # without a device→host fetch (axon backends cannot fetch some
        # trace-time device arrays) and avoid device round-trips in eager setup
        native = np.asarray(value, dtype=_dtype_for(value))
        assert not shape or concat_shapes(*shape).volume in (1,), "scalar with non-scalar shape"
        return Tensor(native, EMPTY_SHAPE)
    if isinstance(value, np.ndarray) or isinstance(value, jax.Array) or hasattr(value, 'shape'):
        if isinstance(value, np.ndarray):
            if value.dtype == np.float64 and get_precision() != 64:
                value = value.astype(np.float32)
            elif value.dtype == np.int64:
                value = value.astype(np.int32)
        if np.ndim(value) == 0:
            return Tensor(value if isinstance(value, (np.ndarray, np.generic)) else jnp.asarray(value), EMPTY_SHAPE)
        if not shape:
            raise ValueError(f"wrap(array) requires dims for array of shape {value.shape}")
        target = concat_shapes(*shape)
        sizes = tuple(value.shape)
        assert len(sizes) == target.rank, f"array rank {len(sizes)} != shape rank {target.rank} ({target})"
        target = target.with_sizes(sizes) if not target.well_defined else target
        assert tuple(target.sizes) == sizes, f"array shape {sizes} != {target}"
        # numpy stays host (embeds into traces as a literal — see _keep_host)
        native = value if isinstance(value, (np.ndarray, jax.Array)) else jnp.asarray(value)
        return Tensor(native, target)
    raise TypeError(f"cannot wrap {type(value)}")


def _dtype_for(value):
    if isinstance(value, bool):
        return jnp.bool_
    if isinstance(value, int):
        return jnp.int32
    if isinstance(value, float):
        return default_float()
    if isinstance(value, complex):
        return backend_dtype('complex')
    raise TypeError(type(value))


def tensor(value, *shape: Shape, convert=True) -> Tensor:
    """Like `wrap` but converts to the default float/int types."""
    t = wrap(value, *shape)
    if convert and t.dtype in (jnp.float64, jnp.float16) and get_precision() == 32:
        t = t._op1(lambda x: x.astype(jnp.float32))
    return t


# --- pytree registration ---

def _tensor_flatten(t: Tensor):
    return (t._native,), t._shape


def _tensor_unflatten(shape: Shape, children):
    native, = children
    if isinstance(native, (jax.Array, np.ndarray)) or hasattr(native, 'shape'):
        try:
            if tuple(native.shape) != tuple(shape.sizes):
                # sizes changed under transformation (e.g. vmap) — re-derive
                return Tensor(native, shape.with_sizes(tuple(native.shape)))
        except Exception:
            pass
    return Tensor(native, shape)


jax.tree_util.register_pytree_node(Tensor, _tensor_flatten, _tensor_unflatten)


def _stack_flatten(t: TensorStack):
    return tuple(t._components), t._stack_dim


def _stack_unflatten(stack_dim: Shape, children):
    return TensorStack(tuple(children), stack_dim)


jax.tree_util.register_pytree_node(TensorStack, _stack_flatten, _stack_unflatten)
