"""Op library over named-dim Tensors, compiled straight to XLA.

Covers the op surface PhiFlow uses from phiml.math (SURVEY.md §2.1 op table;
usage counts measured over /root/reference/phi/). All ops are traceable under
`jax.jit` and differentiable; hot paths (grid_sample, scatter, stencils) have
Pallas TPU implementations in `phiflow_tpu.ops` that these wrappers dispatch to.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from ._shape import (
    Shape, Dim, EMPTY_SHAPE, batch, spatial, channel, instance, dual,
    merge_shapes, concat_shapes, parse_dim_order, shape_of, _resolve_filter,
    DimFilter, BATCH, SPATIAL, CHANNEL, INSTANCE, DUAL,
)
from ._tensor import Tensor, TensorStack, wrap, tensor, default_float, backend_dtype, _broadcast, _align_native

_NAN_CTX = None  # sentinel


# ---------------------------------------------------------------------------
# creation
# ---------------------------------------------------------------------------

def zeros(*shape: Shape, dtype=None) -> Tensor:
    # host (numpy) natives: embed into jit traces as literals without a
    # device→host fetch (the axon TPU backend cannot fetch large trace-time
    # device constants) and XLA folds zero literals for free
    s = concat_shapes(*shape)
    return Tensor(np.zeros(s.sizes, dtype=dtype or default_float()), s)


def ones(*shape: Shape, dtype=None) -> Tensor:
    s = concat_shapes(*shape)
    return Tensor(np.ones(s.sizes, dtype=dtype or default_float()), s)


def zeros_like(t) -> Tensor:
    if isinstance(t, TensorStack):
        return TensorStack([zeros_like(c) for c in t.components], t.stack_dim)
    if isinstance(t, Tensor):
        return Tensor(jnp.zeros_like(t.native()), t.shape)
    return t * 0


def ones_like(t) -> Tensor:
    if isinstance(t, TensorStack):
        return TensorStack([ones_like(c) for c in t.components], t.stack_dim)
    return Tensor(jnp.ones_like(t.native()), t.shape)


_RNG_KEY = [jax.random.PRNGKey(0)]


def seed(s: int):
    _RNG_KEY[0] = jax.random.PRNGKey(s)


def _next_key():
    _RNG_KEY[0], sub = jax.random.split(_RNG_KEY[0])
    return sub


def random_uniform(*shape: Shape, low=0., high=1., dtype=None) -> Tensor:
    s = concat_shapes(*shape)
    dtype = dtype or default_float()
    if jnp.issubdtype(dtype, jnp.integer):
        return Tensor(jax.random.randint(_next_key(), s.sizes, low, high, dtype=dtype), s)
    return Tensor(jax.random.uniform(_next_key(), s.sizes, dtype=dtype, minval=low, maxval=high), s)


def random_normal(*shape: Shape, dtype=None) -> Tensor:
    s = concat_shapes(*shape)
    return Tensor(jax.random.normal(_next_key(), s.sizes, dtype=dtype or default_float()), s)


def linspace(start, stop, dim: Shape) -> Tensor:
    assert dim.rank == 1
    if isinstance(start, (int, float)) and isinstance(stop, (int, float)):
        return Tensor(np.linspace(start, stop, dim.size, dtype=default_float()), dim)
    return Tensor(jnp.linspace(start, stop, dim.size, dtype=default_float()), dim)


def arange(dim: Shape, start=0, stop=None, step=1) -> Tensor:
    if stop is None:
        stop = start + dim.size * step if dim.size is not None else None
        if dim.size is None:
            dim = dim.with_size(int(np.ceil((stop - start) / step)))
    n = np.arange(start, stop, step, dtype=np.int32)
    return Tensor(n, dim.with_size(int(n.shape[0])))


range_tensor = arange


def meshgrid(dims=spatial, stack_dim=channel('vector'), **sizes) -> Tensor:
    """Index grid: returns int tensor with spatial dims + channel 'vector' labeled by dim names."""
    dim_fn = dims if callable(dims) else spatial
    grid_shape = dim_fn(**{k: (v if isinstance(v, int) else len(v)) for k, v in sizes.items()})
    arrays = [np.arange(v, dtype=np.int32) if isinstance(v, int) else np.asarray(v) for v in sizes.values()]
    mesh = np.meshgrid(*arrays, indexing='ij')
    sd = Shape((stack_dim.dims[0].with_size(len(arrays), tuple(sizes.keys())),))
    native = np.stack(mesh, axis=-1)  # host literal: no device const fetch under jit
    return Tensor(native, concat_shapes(grid_shape, sd))


# ---------------------------------------------------------------------------
# shape manipulation
# ---------------------------------------------------------------------------

def stack(values, dim: Shape, expand_values=False, **kwargs) -> Tensor:
    """Stack tensors (or dict label→tensor) along a new dim. Non-uniform inputs → TensorStack."""
    if isinstance(values, dict):
        labels = tuple(values.keys())
        dim = Shape((dim.dims[0].with_size(len(labels), labels),))
        values = list(values.values())
    values = [wrap(v) for v in values]
    if expand_values:
        common = merge_shapes(*[v.shape for v in values], allow_varying_sizes=True)
        definite = Shape(tuple(d for d in common.dims if d.size is not None))
        values = [v._expand(definite.without(v.shape.names)) for v in values]
    dim = Shape((dim.dims[0].with_size(len(values), dim.dims[0].labels),))
    # canonicalize axis order: same dims in different order are still uniform
    names0 = values[0].shape.names
    values = [v._transposed(names0) if (set(v.shape.names) == set(names0) and v.shape.names != names0) else v
              for v in values]
    shapes = [v.shape for v in values]
    uniform = all(s == shapes[0] for s in shapes)
    if uniform and not any(isinstance(v, TensorStack) for v in values):
        natives = [v.native() for v in values]
        if all(isinstance(n, (np.ndarray, np.generic)) for n in natives):
            native = np.stack(natives, axis=0)  # host stays host (jit-literal safe)
        else:
            native = jnp.stack(natives, axis=0)
        return Tensor(native, concat_shapes(dim, shapes[0]))
    return TensorStack(values, dim)


def unstack(value, dim: DimFilter) -> tuple:
    names = _resolve_filter(dim, value.shape)
    if len(names) > 1:
        value = pack_dims(value, names, batch('_unstack'))
        return value._unstack('_unstack')
    return value._unstack(names[0])


def concat(values: Sequence[Tensor], dim) -> Tensor:
    values = [wrap(v) for v in values]
    name = dim if isinstance(dim, str) else dim.name
    # broadcast missing dims
    common = merge_shapes(*[v.shape.without(name) for v in values])
    result_natives = []
    labels_parts = []
    total = 0
    d0 = None
    for v in values:
        if name not in v.shape:
            v = v._expand(Shape((Dim(name, 1, dim.dim_type if isinstance(dim, Shape) else CHANNEL),)))
        d = v.shape.get_dim(name)
        d0 = d0 or d
        labels_parts.append(d.labels)
        total += d.size
        order = (name,) + common.names
        an = _align_native(v.native() if not isinstance(v, TensorStack) else v._contiguous().native(), v.shape, order)
        result_natives.append(jnp.broadcast_to(an, (d.size,) + tuple(common.sizes)))
    if all(isinstance(n, (np.ndarray, np.generic)) for n in result_natives):
        native = np.concatenate(result_natives, axis=0)
    else:
        native = jnp.concatenate(result_natives, axis=0)
    labels = None
    if all(lp is not None for lp in labels_parts):
        labels = tuple(l for lp in labels_parts for l in lp)
    out_dim = Dim(name, total, d0.dim_type, labels)
    return Tensor(native, concat_shapes(Shape((out_dim,)), common))


def expand(value, *dims: Shape) -> Tensor:
    value = wrap(value)
    target = concat_shapes(*dims)
    return value._expand(target)


def rename_dims(value, dims: DimFilter, names) -> Tensor:
    # retype form: rename_dims(x, spatial, batch) keeps names, changes dim type
    # (reference: phiml rename_dims with a dim-type target, used by
    # examples/optim/Learn_Potential.ipynb)
    from . import _shape as _sh
    _TYPE_CTORS = {_sh.batch: _sh.BATCH, _sh.spatial: _sh.SPATIAL, _sh.channel: _sh.CHANNEL,
                   _sh.instance: _sh.INSTANCE, _sh.dual: _sh.DUAL}
    if callable(names) and names in _TYPE_CTORS:
        ty = _TYPE_CTORS[names]
        if isinstance(value, Shape):
            old = _resolve_filter(dims, value)
            return Shape(tuple(d.as_type(ty) if d.name in old else d for d in value.dims))
        value = wrap(value)
        old = _resolve_filter(dims, value.shape)
        by_name = {d.name: d for d in value.shape.dims}
        return rename_dims(value, old, Shape(tuple(by_name[n].as_type(ty) for n in old)))
    if isinstance(value, Shape):
        old = _resolve_filter(dims, value)
        new = names if isinstance(names, Shape) else None
        new_names = parse_dim_order(names)
        result = []
        for d in value.dims:
            if d.name in old:
                i = old.index(d.name)
                if new is not None:
                    nd = new.dims[i]
                    result.append(Dim(nd.name, d.size, nd.dim_type, nd.labels or d.labels))
                else:
                    result.append(Dim(new_names[i], d.size, d.dim_type, d.labels))
            else:
                result.append(d)
        return Shape(tuple(result))
    value = wrap(value)
    if isinstance(value, TensorStack):
        old = _resolve_filter(dims, value.shape)
        if value.stack_dim.name in old:
            new_sd = rename_dims(value.stack_dim, value.stack_dim.name,
                                 names if isinstance(names, Shape) else parse_dim_order(names)[old.index(value.stack_dim.name)])
            rest_old = tuple(n for n in old if n != value.stack_dim.name)
            comps = value.components
            if rest_old:
                comps = [rename_dims(c, rest_old, [n for o, n in zip(old, parse_dim_order(names)) if o != value.stack_dim.name]) for c in comps]
            return TensorStack(comps, new_sd)
        return TensorStack([rename_dims(c, dims, names) for c in value.components], value.stack_dim)
    new_shape = rename_dims(value.shape, dims, names)
    return Tensor(value.native(), new_shape)


def pack_dims(value: Tensor, dims: DimFilter, packed_dim: Shape, pos=None) -> Tensor:
    value = wrap(value)
    if isinstance(value, TensorStack):
        value = value._contiguous()
    names = [n for n in _resolve_filter(dims, value.shape) if n in value.shape]
    if not names:
        return value._expand(packed_dim.with_size(1))
    if len(names) == 1 and packed_dim.rank == 1:
        return rename_dims(value, names[0], packed_dim)
    other = [n for n in value.shape.names if n not in names]
    order = tuple(other[:pos] if pos is not None else other) + tuple(names) + (tuple(other[pos:]) if pos is not None else ())
    if pos is None:
        order = tuple(names) + tuple(other)
    t = value._transposed(order)
    sizes = t.shape.sizes
    k = len(names)
    start = order.index(names[0])
    new_sizes = sizes[:start] + (int(np.prod([t.shape.get_size(n) for n in names])),) + sizes[start + k:]
    native = t.native().reshape(new_sizes)
    pd = packed_dim.dims[0].with_size(new_sizes[start])
    new_dims = t.shape.dims[:start] + (pd,) + t.shape.dims[start + k:]
    return Tensor(native, Shape(new_dims))


flatten = lambda value, flat_dim=instance('flat'): pack_dims(value, lambda s: s, flat_dim)


def unpack_dim(value: Tensor, dim, *unpacked: Shape) -> Tensor:
    value = wrap(value)
    name = dim if isinstance(dim, str) else dim.name
    target = concat_shapes(*unpacked)
    i = value.shape.index(name)
    sizes = value.shape.sizes
    new_sizes = sizes[:i] + tuple(target.sizes) + sizes[i + 1:]
    native = value.native().reshape(new_sizes)
    new_dims = value.shape.dims[:i] + target.dims + value.shape.dims[i + 1:]
    return Tensor(native, Shape(new_dims))


def transpose(value: Tensor, order) -> Tensor:
    return wrap(value)._transposed(parse_dim_order(order))


def squeeze(value: Tensor, dims: DimFilter) -> Tensor:
    names = _resolve_filter(dims, value.shape)
    for n in names:
        assert value.shape.get_size(n) == 1
        value = value[{n: 0}]
    return value


# ---------------------------------------------------------------------------
# elementwise math
# ---------------------------------------------------------------------------

def _unary(fn):
    def op(x, *args, **kwargs):
        x = wrap(x)
        return x._op1(lambda n: fn(n, *args, **kwargs))
    return op


abs_ = _unary(jnp.abs)
sign = _unary(jnp.sign)
sqrt = _unary(jnp.sqrt)
exp = _unary(jnp.exp)
log = _unary(jnp.log)
log2 = _unary(jnp.log2)
log10 = _unary(jnp.log10)
sin = _unary(jnp.sin)
cos = _unary(jnp.cos)
tan = _unary(jnp.tan)
arcsin = _unary(jnp.arcsin)
arccos = _unary(jnp.arccos)
_arctan1 = _unary(jnp.arctan)


def arctan(x, divide_by=None) -> Tensor:
    """arctan(x), or the full-quadrant arctan2(x, divide_by) when `divide_by`
    is given (phiml math.arctan parity)."""
    if divide_by is None:
        return _arctan1(x)
    return wrap(x)._op2(wrap(divide_by), jnp.arctan2)
sinh = _unary(jnp.sinh)
cosh = _unary(jnp.cosh)
tanh = _unary(jnp.tanh)
round_ = _unary(jnp.round)
floor = _unary(jnp.floor)
ceil = _unary(jnp.ceil)
is_finite = _unary(jnp.isfinite)
is_nan = _unary(jnp.isnan)
is_inf = _unary(jnp.isinf)
real = _unary(jnp.real)
imag = _unary(jnp.imag)
conjugate = _unary(jnp.conj)
sigmoid = _unary(jax.nn.sigmoid)
erf = _unary(jax.lax.erf)
factorial = _unary(jax.scipy.special.factorial)


def degrees_to_radians(x): return wrap(x) * (np.pi / 180)
def radians_to_degrees(x): return wrap(x) * (180 / np.pi)


def to_float(x) -> Tensor:
    return wrap(x)._op1(lambda n: n.astype(default_float()))


def to_int32(x) -> Tensor:
    return wrap(x)._op1(lambda n: n.astype(jnp.int32))


def to_int64(x) -> Tensor:
    return wrap(x)._op1(lambda n: n.astype(jnp.int64))


def to_bool(x) -> Tensor:
    return wrap(x)._op1(lambda n: n.astype(jnp.bool_))


def cast(x, dtype) -> Tensor:
    return wrap(x)._op1(lambda n: n.astype(dtype))


def arctan2(y, x) -> Tensor:
    y, x = wrap(y), wrap(x)
    return y._op2(x, jnp.arctan2)


def maximum(a, b) -> Tensor:
    a = wrap(a) if isinstance(a, (int, float)) and isinstance(b, Tensor) else a
    return wrap(a)._op2(b, jnp.maximum)


def minimum(a, b) -> Tensor:
    return wrap(a)._op2(b, jnp.minimum)


def clip(x, lower=0., upper=1.) -> Tensor:
    x = wrap(x)
    result = maximum(x, lower)
    return minimum(result, upper)


def where(condition, value_true=1., value_false=0.) -> Tensor:
    if any(hasattr(x, 'geometry') and hasattr(x, 'values') for x in (condition, value_true, value_false)):
        from ..field._field_math import where as field_where
        return field_where(condition, value_true, value_false)
    condition = wrap(condition)
    vt = wrap(value_true)
    vf = wrap(value_false)
    if isinstance(condition, TensorStack) or isinstance(vt, TensorStack) or isinstance(vf, TensorStack):
        for t in (condition, vt, vf):
            if isinstance(t, TensorStack):
                sd = t.stack_dim
                break
        n = sd.size
        def comp(t, i):
            return t[{sd.name: i}] if sd.name in t.shape else t
        return TensorStack([where(comp(condition, i), comp(vt, i), comp(vf, i)) for i in range(n)], sd)
    shape = merge_shapes(condition.shape, vt.shape, vf.shape)
    c = _align_native(condition.native(), condition.shape, shape.names)
    a = _align_native(vt.native(), vt.shape, shape.names)
    b = _align_native(vf.native(), vf.shape, shape.names)
    if all(isinstance(x, (np.ndarray, np.generic)) for x in (c, a, b)):
        native = np.broadcast_to(np.where(c, a, b), tuple(shape.sizes))
    else:
        native = jnp.broadcast_to(jnp.where(c, a, b), tuple(shape.sizes))
    return Tensor(native, shape)


def safe_div(numerator, denominator) -> Tensor:
    n, d = wrap(numerator), wrap(denominator)
    return n._op2(d, lambda a, b: jnp.where(b == 0, jnp.zeros_like(a * b), a / jnp.where(b == 0, jnp.ones_like(b), b)))


def nan_to_0(x) -> Tensor:
    return wrap(x)._op1(lambda n: jnp.nan_to_num(n, nan=0.0, posinf=0.0, neginf=0.0))


# ---------------------------------------------------------------------------
# reductions
# ---------------------------------------------------------------------------

def _reduce(value, dim: DimFilter, native_fn, default_filter=lambda s: s.non_batch) -> Tensor:
    value = wrap(value)
    if isinstance(value, TensorStack):
        if value.is_uniform:
            value = value._contiguous()
        else:
            # non-uniform (staggered) stack: reduce each component, then reduce
            # the per-component results over the stack dim — valid when the
            # requested dims cover all of each component's reduced dims (full
            # reductions and reductions including the stack dim).
            stack_name = value.stack_dim.name
            reduced = [_reduce(c, dim, native_fn, default_filter) for c in value.components]
            if dim is None or stack_name in _resolve_filter(dim, value.shape):
                if any(r.shape for r in reduced):
                    raise NotImplementedError("partial reduction over non-uniform stack: reduce components first")
                natives = jnp.stack([r.native() for r in reduced])
                return Tensor(native_fn(natives, (0,)), EMPTY_SHAPE)
            return TensorStack(reduced, value.stack_dim)
    if dim is None:
        names = default_filter(value.shape).names
        if not names:
            return value
    else:
        names = [n for n in _resolve_filter(dim, value.shape) if n in value.shape]
        if not names:
            return value
    axes = tuple(value.shape.index(n) for n in names)
    native = native_fn(value.native(), axes)
    return Tensor(native, value.shape.without(names))


def sum_(value, dim: DimFilter = None) -> Tensor:
    if isinstance(value, (tuple, list)):
        return functools.reduce(lambda a, b: wrap(a) + b, value)
    return _reduce(value, dim, lambda n, a: jnp.sum(n, axis=a))


def mean(value, dim: DimFilter = None, weight=None) -> Tensor:
    if weight is not None:
        w = wrap(weight)
        return sum_(wrap(value) * w, dim) / sum_(w, dim)
    return _reduce(value, dim, lambda n, a: jnp.mean(n, axis=a))


def prod(value, dim: DimFilter = None) -> Tensor:
    return _reduce(value, dim, lambda n, a: jnp.prod(n, axis=a))


def max_(value, dim: DimFilter = None) -> Tensor:
    if isinstance(value, (tuple, list)):
        return functools.reduce(maximum, [wrap(v) for v in value])
    return _reduce(value, dim, lambda n, a: jnp.max(n, axis=a))


def min_(value, dim: DimFilter = None) -> Tensor:
    if isinstance(value, (tuple, list)):
        return functools.reduce(minimum, [wrap(v) for v in value])
    return _reduce(value, dim, lambda n, a: jnp.min(n, axis=a))


def std(value, dim: DimFilter = None) -> Tensor:
    return _reduce(value, dim, lambda n, a: jnp.std(n, axis=a))


def any_(value, dim: DimFilter = None) -> Tensor:
    return _reduce(value, dim, lambda n, a: jnp.any(n, axis=a), default_filter=lambda s: s)


def all_(value, dim: DimFilter = None) -> Tensor:
    return _reduce(value, dim, lambda n, a: jnp.all(n, axis=a), default_filter=lambda s: s)


def finite_mean(value, dim: DimFilter = None) -> Tensor:
    value = wrap(value)
    fin = is_finite(value)
    total = sum_(where(fin, value, 0), dim)
    count = sum_(to_float(fin), dim)
    return safe_div(total, count)


def finite_sum(value, dim: DimFilter = None) -> Tensor:
    value = wrap(value)
    return sum_(where(is_finite(value), value, 0), dim)


def finite_max(value, dim: DimFilter = None) -> Tensor:
    value = wrap(value)
    return max_(where(is_finite(value), value, -jnp.inf), dim)


def finite_min(value, dim: DimFilter = None) -> Tensor:
    value = wrap(value)
    return min_(where(is_finite(value), value, jnp.inf), dim)


def at_max(value, key, dim: DimFilter):
    """Value(s) of `value` at the position where `key` is maximal along `dim`."""
    key = wrap(key)
    names = [n for n in _resolve_filter(dim, key.shape) if n in key.shape]
    key_packed = pack_dims(key, names, instance('_amax')) if len(names) > 1 else key
    idx = argmax(key_packed, names[0] if len(names) == 1 else '_amax')
    value = wrap(value)
    vp = pack_dims(value, names, instance('_amax')) if len(names) > 1 else value
    return gather(vp, idx, dims=names[0] if len(names) == 1 else '_amax')


def argmax(value: Tensor, dim: DimFilter) -> Tensor:
    value = wrap(value)
    names = _resolve_filter(dim, value.shape)
    assert len(names) == 1
    axis = value.shape.index(names[0])
    native = jnp.argmax(value.native(), axis=axis).astype(jnp.int32)
    return Tensor(native, value.shape.without(names[0]))


def argmin(value: Tensor, dim: DimFilter) -> Tensor:
    value = wrap(value)
    names = _resolve_filter(dim, value.shape)
    axis = value.shape.index(names[0])
    native = jnp.argmin(value.native(), axis=axis).astype(jnp.int32)
    return Tensor(native, value.shape.without(names[0]))


def cumulative_sum(value: Tensor, dim: DimFilter) -> Tensor:
    value = wrap(value)
    names = _resolve_filter(dim, value.shape)
    axis = value.shape.index(names[0])
    return Tensor(jnp.cumsum(value.native(), axis=axis), value.shape)


def dot(a: Tensor, a_dims, b: Tensor, b_dims) -> Tensor:
    a, b = wrap(a), wrap(b)
    a_names = _resolve_filter(a_dims, a.shape)
    b_names = _resolve_filter(b_dims, b.shape)
    a_axes = [a.shape.index(n) for n in a_names]
    b_axes = [b.shape.index(n) for n in b_names]
    # batch dims = shared remaining names
    a_rem = a.shape.without(a_names)
    b_rem = b.shape.without(b_names)
    shared = [n for n in a_rem.names if n in b_rem]
    native = jax.lax.dot_general(
        a.native(), b.native(),
        dimension_numbers=((tuple(a_axes), tuple(b_axes)),
                           (tuple(a.shape.index(n) for n in shared), tuple(b.shape.index(n) for n in shared))),
        preferred_element_type=jnp.float32 if a.dtype in (jnp.bfloat16, jnp.float16) else None)
    out_shape = concat_shapes(a.shape.only(shared, reorder=True), a_rem.without(shared), b_rem.without(shared))
    return Tensor(native, out_shape)


# ---------------------------------------------------------------------------
# comparison / testing
# ---------------------------------------------------------------------------

def close(*tensors, rel_tolerance=1e-5, abs_tolerance=0, equal_nan=False) -> bool:
    tensors = [wrap(t) for t in tensors]
    first = tensors[0]
    for other in tensors[1:]:
        an, bn, _ = _broadcast(first if not isinstance(first, TensorStack) else first._contiguous(),
                               other if not isinstance(other, TensorStack) else other._contiguous())
        import jax
        if isinstance(an, jax.core.Tracer) or isinstance(bn, jax.core.Tracer):
            # value unknowable at trace time — cannot assert closeness
            # (matches phiml always_close semantics under jit)
            return False
        if not np.allclose(np.asarray(an), np.asarray(bn), rtol=rel_tolerance, atol=abs_tolerance, equal_nan=equal_nan):
            return False
    return True


always_close = close


def assert_close(*tensors, rel_tolerance=1e-5, abs_tolerance=0, msg="", equal_nan=False):
    tensors = [wrap(t) for t in tensors]
    first = tensors[0]
    for other in tensors[1:]:
        f = first._contiguous() if isinstance(first, TensorStack) else first
        o = other._contiguous() if isinstance(other, TensorStack) else other
        an, bn, _ = _broadcast(f, o)
        np.testing.assert_allclose(np.asarray(an), np.asarray(bn), rtol=rel_tolerance, atol=abs_tolerance,
                                   err_msg=msg, equal_nan=True if equal_nan else False)


def equal(a, b) -> bool:
    try:
        return close(a, b, rel_tolerance=0, abs_tolerance=0)
    except Exception:
        return False


# ---------------------------------------------------------------------------
# gather / scatter / boolean mask
# ---------------------------------------------------------------------------

def gather(values: Tensor, indices: Tensor, dims: DimFilter = None) -> Tensor:
    """Gather slices of `values` at `indices`.

    `indices` either has a channel dim whose labels name the gathered dims
    (reference semantics: phiml `math.gather`), or `dims` names a single dim and
    `indices` is integer-valued.
    """
    values, indices = wrap(values), wrap(indices)
    if isinstance(values, TensorStack) and not values.is_uniform:
        raise NotImplementedError("gather on non-uniform stack")
    if isinstance(values, TensorStack):
        values = values._contiguous()
    if dims is None:
        ch = indices.shape.channel
        if ch.rank == 1 and ch.labels[0]:
            dims = ch.labels[0]
            idx_components = [indices[{ch.name: i}] for i in range(len(dims))]
        else:
            dims = values.shape.instance.names or values.shape.spatial.names
            assert len(dims) == 1
            idx_components = [indices]
    else:
        dims = _resolve_filter(dims, values.shape)
        if indices.shape.channel.rank == 1 and indices.shape.channel.size == len(dims) and len(dims) > 1:
            chn = indices.shape.channel.name
            idx_components = [indices[{chn: i}] for i in range(len(dims))]
        else:
            assert len(dims) == 1
            idx_components = [indices]
    dims = tuple(dims) if not isinstance(dims, tuple) else dims
    batch_shape = merge_shapes(*[c.shape for c in idx_components])
    kept = values.shape.without(dims)
    # ravel gathered dims
    vt = values._transposed(tuple(dims) + kept.names)
    sizes = [values.shape.get_size(d) for d in dims]
    flat = vt.native().reshape((int(np.prod(sizes)),) + tuple(kept.sizes))
    lin = None
    for c, n, d in zip(idx_components, sizes, dims):
        cn = _align_native(c.native(), c.shape, batch_shape.names)
        lin = cn if lin is None else lin * n + cn
        if lin is not cn:
            pass
    # recompute linear index properly (row-major over dims order)
    lin = None
    for c, n in zip(idx_components, sizes):
        cn = _align_native(c.native(), c.shape, batch_shape.names).astype(jnp.int32)
        cn = jnp.broadcast_to(cn, batch_shape.sizes)
        lin = cn if lin is None else lin * n + cn
    gathered = jnp.take(flat, lin.reshape(-1), axis=0)
    gathered = gathered.reshape(tuple(batch_shape.sizes) + tuple(kept.sizes))
    return Tensor(gathered, concat_shapes(batch_shape, kept))


def scatter(base_grid, indices: Tensor, values, mode: str = 'update',
            outside_handling: str = 'discard', indices_gradient=False, default=None) -> Tensor:
    """Scatter `values` into `base_grid` at `indices`.

    Reference semantics: /root/reference callers use modes 'update', 'add', 'mean'
    with outside_handling ∈ {'discard','clamp','undefined'}
    (phi/field/_resample.py:220-238). `base_grid` may be a Shape (zeros created).

    TPU note: implemented with `jnp.ndarray.at[...]` scatter, which XLA lowers to
    sorted-segment updates on TPU.
    """
    if isinstance(base_grid, Shape):
        fill = 0 if default is None else default
        vshape = shape_of(values) if not isinstance(values, (int, float)) else EMPTY_SHAPE
        out_shape = merge_shapes(base_grid, vshape.without(vshape.instance).without(vshape.spatial) if False else EMPTY_SHAPE)
        base = zeros(base_grid) + fill
    else:
        base = wrap(base_grid)
    values = wrap(values)
    indices = wrap(indices)
    ch = indices.shape.channel
    if ch.rank == 1 and ch.labels[0]:
        dims = ch.labels[0]
        idx_components = [indices[{ch.name: i}] for i in range(len(dims))]
    else:
        dims = base.shape.instance.names or base.shape.spatial.names
        assert len(dims) == 1, f"scatter: cannot infer target dims"
        idx_components = [indices]
    list_shape = merge_shapes(*[c.shape for c in idx_components])
    kept = base.shape.without(dims)
    # broadcast values over list dims and kept dims
    val_order = list_shape.names + kept.names
    vn = _align_native(values.native() if not isinstance(values, TensorStack) else values._contiguous().native(),
                       values.shape, val_order)
    vn = jnp.broadcast_to(vn, tuple(list_shape.sizes) + tuple(kept.sizes))
    sizes = [base.shape.get_size(d) for d in dims]
    lin = None
    valid = None
    for c, n in zip(idx_components, sizes):
        cn = _align_native(c.native(), c.shape, list_shape.names).astype(jnp.int32)
        cn = jnp.broadcast_to(cn, list_shape.sizes)
        if outside_handling == 'clamp':
            cn = jnp.clip(cn, 0, n - 1)
        elif outside_handling == 'discard':
            v = (cn >= 0) & (cn < n)
            valid = v if valid is None else (valid & v)
            cn = jnp.clip(cn, 0, n - 1)
        lin = cn if lin is None else lin * n + cn
    flat_size = int(np.prod(sizes))
    bt = base._transposed(tuple(dims) + kept.names)
    flat_base = bt.native().reshape((flat_size,) + tuple(kept.sizes))
    lin_flat = lin.reshape(-1)
    vals_flat = vn.reshape((-1,) + tuple(kept.sizes)).astype(flat_base.dtype)
    if valid is not None and outside_handling == 'discard':
        # redirect invalid writes to a dummy slot (extra row, dropped after)
        lin_flat = jnp.where(valid.reshape(-1), lin_flat, flat_size)
        flat_base = jnp.concatenate([flat_base, jnp.zeros((1,) + tuple(kept.sizes), flat_base.dtype)], axis=0)
    if mode == 'update':
        out = flat_base.at[lin_flat].set(vals_flat)
    elif mode == 'add':
        out = flat_base.at[lin_flat].add(vals_flat)
    elif mode == 'mean':
        contrib = jnp.zeros_like(flat_base).at[lin_flat].add(vals_flat)
        ones_v = jnp.ones(vals_flat.shape[:1] + (1,) * (vals_flat.ndim - 1), flat_base.dtype)
        counts = jnp.zeros((flat_base.shape[0],) + (1,) * (vals_flat.ndim - 1), flat_base.dtype).at[lin_flat].add(ones_v)
        out = jnp.where(counts > 0, contrib / jnp.maximum(counts, 1), flat_base)
    elif mode in ('max', 'maximum'):
        out = flat_base.at[lin_flat].max(vals_flat)
    elif mode in ('min', 'minimum'):
        out = flat_base.at[lin_flat].min(vals_flat)
    else:
        raise ValueError(f"scatter mode {mode!r}")
    if valid is not None and outside_handling == 'discard':
        out = out[:-1]
    out = out.reshape(tuple(bt.shape.sizes))
    return Tensor(out, bt.shape)._transposed(base.shape.names)


def boolean_mask(value: Tensor, dim: DimFilter, mask: Tensor) -> Tensor:
    """Select slices where mask is True. NOT jit-compatible (dynamic shape)."""
    value, mask = wrap(value), wrap(mask)
    names = _resolve_filter(dim, value.shape)
    assert len(names) == 1, "boolean_mask supports a single dim"
    name = names[0]
    idx = np.nonzero(np.asarray(mask.native()))[0]
    axis = value.shape.index(name)
    native = jnp.take(value.native(), jnp.asarray(idx), axis=axis)
    return Tensor(native, value.shape.with_dim_size(name, len(idx)))


def nonzero(value: Tensor, list_dim=instance('nonzero'), index_dim=channel('vector')) -> Tensor:
    value = wrap(value)
    dims = value.shape.non_batch.non_channel
    arr = np.asarray(value.native())
    idx = np.stack(np.nonzero(arr), axis=-1).astype(np.int32)
    ld = list_dim.dims[0].with_size(idx.shape[0])
    cd = index_dim.dims[0].with_size(len(dims.names), dims.names)
    return Tensor(jnp.asarray(idx), Shape((ld, cd)))


# ---------------------------------------------------------------------------
# padding & shifting (boundary-aware versions in _extrapolation / _nd)
# ---------------------------------------------------------------------------

def pad(value: Tensor, widths: dict, mode=0, **kwargs) -> Tensor:
    """Pad along named dims. `mode` is an Extrapolation, Tensor, or number."""
    from ._extrapolation import Extrapolation, as_extrapolation
    value = wrap(value)
    if isinstance(value, TensorStack):
        return TensorStack([pad(c, {k: v for k, v in widths.items() if k in c.shape}, mode, **kwargs)
                            for c in value.components], value.stack_dim)
    mode = as_extrapolation(mode)
    return mode.pad(value, widths, **kwargs)


def shift(value: Tensor, offsets: tuple, dims: DimFilter = spatial, padding=None, stack_dim=channel('shift'), extend_bounds=0):
    """List of shifted copies of `value`; pads with `padding` if given, else trims.

    Mirrors phiml's `math.shift` used throughout _field_math.
    Returns a list of Tensors (one per offset), each with `stack_dim` over dims.
    """
    from ._extrapolation import as_extrapolation
    value = wrap(value)
    names = [n for n in _resolve_filter(dims, value.shape) if n in value.shape.spatial or n in value.shape]
    pad_lower = max(0, -min(offsets)) + extend_bounds
    pad_upper = max(0, max(offsets)) + extend_bounds
    if padding is not None:
        value = pad(value, {n: (pad_lower, pad_upper) for n in names}, padding)
    offset_results = []
    for offset in offsets:
        components = {}
        for n in names:
            size = value.shape.get_size(n)
            if padding is not None:
                start = pad_lower + offset
                length = size - pad_lower - pad_upper
            else:
                start = offset - min(offsets)
                length = size - (max(offsets) - min(offsets))
            sliced = value[{n: slice(start, start + length)}]
            components[n] = sliced
        if stack_dim is None:
            assert len(names) == 1
            offset_results.append(components[names[0]])
        else:
            offset_results.append(stack(components, stack_dim))
    return offset_results


def quantile(value: Tensor, quantiles, dims: DimFilter = None) -> Tensor:
    """Quantiles of `value` over `dims` (default: all non-batch dims)
    (reference API: phiml math.quantile)."""
    value = wrap(value)
    names = tuple(_resolve_filter(dims, value.shape)) if dims is not None else value.shape.non_batch.names
    q_list = quantiles if isinstance(quantiles, (tuple, list)) else [quantiles]
    keep = value.shape.without(names)
    native = value.native(tuple(keep.names) + tuple(names))
    flat = native.reshape(tuple(keep.sizes) + (-1,))
    result = jnp.quantile(flat, jnp.asarray(q_list, flat.dtype), axis=-1)  # (q, *keep)
    result = jnp.moveaxis(result, 0, -1)
    from ._shape import Dim, concat_shapes as _concat
    out_shape = _concat(keep, Shape((Dim('quantiles', len(q_list), 'channel', None),)))
    out = Tensor(result, out_shape)
    if not isinstance(quantiles, (tuple, list)):
        out = out[{'quantiles': 0}]
    return out


def median(value: Tensor, dims: DimFilter = None) -> Tensor:
    """Median over `dims` (reference API: phiml math.median)."""
    return quantile(value, 0.5, dims)


def histogram(values: Tensor, bins=20, weights=None, same_bins: DimFilter = None):
    """Histogram of `values` (reference API: phiml math.histogram).
    Returns (counts, bin_edges) with counts over a spatial 'bins' dim."""
    values = wrap(values)
    native = values.native().reshape(-1)
    if isinstance(bins, int):
        lo = jnp.min(native)
        hi = jnp.max(native)
        edges = jnp.linspace(lo, hi, bins + 1)
    else:
        edges = jnp.asarray(bins if not isinstance(bins, Tensor) else bins.native())
    w = None if weights is None else wrap(weights).native().reshape(-1)
    counts, edges_out = jnp.histogram(native, bins=edges, weights=w)
    n_bins = counts.shape[0]
    return (Tensor(counts, spatial(bins=n_bins)),
            Tensor(edges_out, spatial(bins=n_bins + 1)))


def neighbor_mean(grid: Tensor, dims: DimFilter = spatial, padding=None) -> Tensor:
    """Mean of adjacent values along `dims` (reference: phiml neighbor_mean,
    used by the 3D curl path phi/field/_field_math.py:703-708). With
    padding=None each averaged dim shrinks by 1 (values at midpoints)."""
    grid = wrap(grid)
    names = [n for n in _resolve_filter(dims, grid.shape) if n in grid.shape]
    for n in names:
        lo, up = shift(grid, (0, 1), n, padding, stack_dim=None)
        grid = (lo + up) * 0.5
    return grid


def sample_subgrid(grid: Tensor, start: Tensor, size: Shape) -> Tensor:
    """Linearly interpolated sub-grid of `grid`: window of `size` cells whose
    origin sits at the (fractional) index offset `start` (reference: phiml
    sample_subgrid; call site phi/field/_resample.py:363).

    start: channel-'vector' tensor labeled by the sampled spatial dims (float,
    index units). Out-of-range reads clamp to the border."""
    grid = wrap(grid)
    start = wrap(start)
    labels = start.shape.get_labels('vector') or size.names
    for dim in labels:
        n_out = size.get_size(dim)
        n_in = grid.shape.get_size(dim)
        s = start[{'vector': dim}]
        i0 = floor(s)
        frac = s - i0
        i0i = cast(i0, jnp.int32)
        idx_lo = clip(wrap(np.arange(n_out), spatial(**{dim: n_out})) + i0i, 0, n_in - 1)
        idx_hi = clip(idx_lo + 1, 0, n_in - 1)
        lo = gather(grid, idx_lo, dims=dim)
        hi = gather(grid, idx_hi, dims=dim)
        grid = lo * (1 - frac) + hi * frac
    return grid


# ---------------------------------------------------------------------------
# interpolation / sampling
# ---------------------------------------------------------------------------

def grid_sample(grid: Tensor, coordinates: Tensor, extrap, **kwargs) -> Tensor:
    """Multi-linear interpolation of `grid` at float index `coordinates`.

    `coordinates` has a channel 'vector' dim labeled with grid spatial dim names.
    The hot path of semi-Lagrangian advection
    (/root/reference/phi/field/_resample.py:259); dispatches to the Pallas TPU
    gather-interp kernel for 2D/3D grids where beneficial.
    """
    from ._extrapolation import as_extrapolation, PERIODIC
    from ._nd import _grid_sample_xla
    extrap = as_extrapolation(extrap) if extrap is not None else None
    return _grid_sample_xla(grid, coordinates, extrap)


def closest_grid_values(grid: Tensor, coordinates: Tensor, extrap, stack_dim_prefix='closest_', **kwargs) -> Tensor:
    from ._nd import _closest_grid_values
    from ._extrapolation import as_extrapolation
    return _closest_grid_values(grid, coordinates, as_extrapolation(extrap), stack_dim_prefix)


# ---------------------------------------------------------------------------
# fourier
# ---------------------------------------------------------------------------

def fft(x: Tensor, dims: DimFilter = spatial) -> Tensor:
    x = wrap(x)
    names = _resolve_filter(dims, x.shape)
    axes = tuple(x.shape.index(n) for n in names)
    n = x.native()
    if isinstance(n, (np.ndarray, np.generic)):  # host input → host FFT
        return Tensor(np.fft.fftn(n, axes=axes), x.shape)
    return Tensor(jnp.fft.fftn(n, axes=axes), x.shape)


def ifft(k: Tensor, dims: DimFilter = spatial) -> Tensor:
    k = wrap(k)
    names = _resolve_filter(dims, k.shape)
    axes = tuple(k.shape.index(n) for n in names)
    n = k.native()
    if isinstance(n, (np.ndarray, np.generic)):
        return Tensor(np.fft.ifftn(n, axes=axes), k.shape)
    return Tensor(jnp.fft.ifftn(n, axes=axes), k.shape)


def fftfreq(resolution: Shape, dx=1, dtype=None) -> Tensor:
    """Fourier frequencies for each spatial dim, stacked in channel 'vector'."""
    comps = {}
    for d in resolution.spatial.dims:
        f = np.fft.fftfreq(d.size, d=1.0)
        comps[d.name] = Tensor(f.astype(dtype or default_float()), Shape((d,)))
    k = stack(comps, channel('vector'), expand_values=True)
    return k / wrap(dx)


# ---------------------------------------------------------------------------
# vector math
# ---------------------------------------------------------------------------

def vec(name='vector', **components) -> Tensor:
    return stack({k: wrap(v) for k, v in components.items()}, channel(name), expand_values=True)


def vec_length(v: Tensor, vec_dim: DimFilter = channel, eps=None) -> Tensor:
    v = wrap(v)
    sq = vec_squared(v, vec_dim)
    if eps is not None:
        sq = maximum(sq, eps)
    return sqrt(sq)


norm = vec_length
length = vec_length


def vec_squared(v: Tensor, vec_dim: DimFilter = channel) -> Tensor:
    v = wrap(v)
    if isinstance(v, TensorStack):
        return sum_([c ** 2 for c in v.components])
    return sum_(v ** 2, vec_dim)


squared_norm = vec_squared


def vec_normalize(v: Tensor, vec_dim: DimFilter = channel, epsilon=1e-15) -> Tensor:
    v = wrap(v)
    return v / vec_length(v, vec_dim, eps=epsilon)


normalize = vec_normalize


def cross(a: Tensor, b: Tensor) -> Tensor:
    a, b = wrap(a), wrap(b)
    ch = a.shape.channel.only('vector') if 'vector' in a.shape else a.shape.channel[0:1]
    n = ch.size if ch else b.shape.channel.size
    if n == 2:
        ax, ay = a.vector[0], a.vector[1]
        bx, by = b.vector[0], b.vector[1]
        return ax * by - ay * bx
    assert n == 3
    comps = {}
    labels = a.shape.get_labels('vector') or ('x', 'y', 'z')
    av = [a.vector[i] for i in range(3)]
    bv = [b.vector[i] for i in range(3)]
    comps[labels[0]] = av[1] * bv[2] - av[2] * bv[1]
    comps[labels[1]] = av[2] * bv[0] - av[0] * bv[2]
    comps[labels[2]] = av[0] * bv[1] - av[1] * bv[0]
    return stack(comps, channel('vector'), expand_values=True)


cross_product = cross


def rotate_vector(v: Tensor, angle, invert=False) -> Tensor:
    from ..geom._transform import rotate_vector as _rv
    return _rv(v, angle, invert=invert)


def dim_mask(all_dims: Shape, dims: DimFilter, mask_dim=channel('vector')) -> Tensor:
    if all_dims.rank == 1 and all_dims.dims[0].labels:
        all_names = all_dims.dims[0].labels  # labeled vector dim: mask over its labels
    elif all_dims.spatial:
        all_names = all_dims.spatial.names
    else:
        all_names = all_dims.names
    names = parse_dim_order(dims) if not callable(dims) or isinstance(dims, Shape) else dims(all_dims).names
    vals = [1.0 if n in names else 0.0 for n in all_names]
    d = mask_dim.dims[0].with_size(len(all_names), all_names)
    return Tensor(np.asarray(vals, default_float()), Shape((d,)))


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------

def convolve(value: Tensor, kernel: Tensor, extrapolation=None) -> Tensor:
    """N-d convolution over spatial dims (kernel centered)."""
    from ._extrapolation import as_extrapolation, ZERO
    value, kernel = wrap(value), wrap(kernel)
    sp = value.shape.spatial.only(kernel.shape.spatial)
    extrapolation = as_extrapolation(extrapolation) if extrapolation is not None else None
    if extrapolation is not None:
        widths = {d.name: (kernel.shape.get_size(d.name) // 2, (kernel.shape.get_size(d.name) - 1) // 2) for d in sp.dims}
        value = pad(value, widths, extrapolation)
    v_batch = value.shape.without(sp.names).names
    vn = value._transposed(tuple(v_batch) + sp.names).native().reshape((-1, 1) + tuple(value.shape.get_size(n) for n in sp.names))
    kn = kernel._transposed(kernel.shape.without(sp.names).names + sp.names).native().reshape(
        (-1, 1) + tuple(kernel.shape.get_size(n) for n in sp.names))
    assert kn.shape[0] == 1, "batched kernels not supported yet"
    out = jax.lax.conv_general_dilated(vn.astype(default_float()), kn.astype(default_float()),
                                       window_strides=(1,) * sp.rank, padding='VALID')
    out_sp_sizes = out.shape[2:]
    out_shape = value.shape.without(sp.names)
    dims = tuple(out_shape.dims) + tuple(Dim(n, s, SPATIAL) for n, s in zip(sp.names, out_sp_sizes))
    return Tensor(out.reshape(tuple(out_shape.sizes) + out_sp_sizes), Shape(dims))._transposed(value.shape.names)


def native_call(f, *inputs, channels_last=True, channel_dim='vector', spatial_dim=None):
    """Call a native-array function (e.g. a flax net) on named tensors.

    Converts (batch..., spatial..., channel) → native layout NHWC (channels_last)
    or NCHW, calls `f`, converts back. Reference: phiml `math.native_call` used at
    /root/reference/phi/field/_field_math.py:744.
    """
    inputs = [wrap(i) for i in inputs]
    b = merge_shapes(*[i.shape.batch for i in inputs])
    natives = []
    for i in inputs:
        sp = i.shape.spatial
        ch = i.shape.channel
        if channels_last:
            order = b.names + sp.names + ch.names
        else:
            order = b.names + ch.names + sp.names
        n = i.native(order)
        n = n.reshape((b.volume if b else 1,) + n.shape[len(b.names):])
        if not ch:  # scalar fields get a singleton channel axis (NHWC expected by nets)
            n = n[..., None] if channels_last else n.reshape((n.shape[0], 1) + n.shape[1:])
        natives.append(n)
    result = f(*natives)
    rs = np.shape(result)
    sp = inputs[0].shape.spatial
    if channels_last:
        ch_size = rs[-1]
        out_shape = concat_shapes(b, sp, channel(**{channel_dim: ch_size}))
        native = jnp.reshape(result, tuple(b.sizes) + tuple(sp.sizes) + (ch_size,))
    else:
        ch_size = rs[1]
        out_shape = concat_shapes(b, channel(**{channel_dim: ch_size}), sp)
        native = jnp.reshape(result, tuple(b.sizes) + (ch_size,) + tuple(sp.sizes))
    return Tensor(native, out_shape)


def reshaped_native(value: Tensor, groups, force_expand=True):
    value = wrap(value)
    if isinstance(value, TensorStack):
        value = value._contiguous()
    sizes = []
    order = []
    for g in groups:
        if isinstance(g, Shape):
            names = [n for n in g.names if n in value.shape]
            order.extend(names)
            sizes.append(int(np.prod([value.shape.get_size(n) for n in names])) if names else 1)
        else:
            order.append(g)
            sizes.append(value.shape.get_size(g))
    native = value.native(tuple(order))
    return native.reshape(sizes)


def reshaped_tensor(native, groups, convert=True):
    dims = []
    for g in groups:
        if isinstance(g, Shape):
            dims.extend(g.dims)
        else:
            raise TypeError(g)
    target = Shape(tuple(dims))
    return Tensor(jnp.reshape(jnp.asarray(native), target.sizes), target)


def pairwise_differences(positions: Tensor, max_distance=None, format='dense', method='auto',
                         default=None, domain=None, periodic=False, avg_neighbors=8.):
    """Neighbor search: pairwise position deltas within `max_distance`.

    TPU-native design: dense (N×N) masked form for small N; the cell-list
    backend (sort-by-cell + fixed-capacity buckets, math._neighbors) activates
    for method='cell-list', or automatically for large N when `domain` and
    `max_distance` are given. The cell-list result is COMPACT: the dual dim is
    '~neighbors' of static width 3^d·capacity (candidate neighborhoods), not
    the full particle count — invalid entries hold `default` (NaN).
    Reference semantics: phiml `math.pairwise_differences` used by SPH
    (/root/reference/phi/physics/sph.py:58).
    """
    positions = wrap(positions)
    inst = positions.shape.instance
    assert inst.rank == 1
    n_particles = inst.volume
    use_cell_list = method == 'cell-list' or (
        method == 'auto' and domain is not None and max_distance is not None
        and n_particles is not None and n_particles > 4096)
    if use_cell_list:
        assert domain is not None and max_distance is not None, \
            "cell-list search requires `domain` and `max_distance`"
        from ._neighbors import cell_list_neighbors
        labels = positions.shape.get_labels('vector')
        pos_n = positions.native((inst.names[0], 'vector'))
        lo = np.asarray(domain[0].native() if isinstance(domain[0], Tensor) else domain[0]).reshape(-1)
        up = np.asarray(domain[1].native() if isinstance(domain[1], Tensor) else domain[1]).reshape(-1)
        idx, deltas_n, mask_n = cell_list_neighbors(pos_n, float(max_distance), lo, up,
                                                    periodic=bool(periodic))
        fill = jnp.nan if default is None else default
        deltas_n = jnp.where(mask_n[..., None], deltas_n, fill)
        M = idx.shape[1]
        from ._shape import Dim as _Dim
        out_shape = Shape((_Dim(inst.names[0], pos_n.shape[0], 'instance', None),
                           _Dim('~neighbors', M, 'dual', None),
                           _Dim('vector', len(labels), 'channel', tuple(labels))))
        return Tensor(deltas_n, out_shape)
    dual_dim = Shape((inst.dims[0].as_type(DUAL),))
    others = rename_dims(positions, inst, dual_dim)
    deltas = others - positions  # (instance, dual, vector)
    if periodic and domain is not None:
        lo, up = domain
        size = wrap(up) - wrap(lo)
        deltas = (deltas + size / 2) % size - size / 2
    if max_distance is not None:
        dist = vec_length(deltas)
        mask = (dist < max_distance) & (dist > 0)
        deltas = where(mask, deltas, float('nan') if default is None else default)
    return deltas


def find_closest(vectors: Tensor, query: Tensor, index_dim=channel('index')) -> Tensor:
    vectors, query = wrap(vectors), wrap(query)
    inst = vectors.shape.instance or vectors.shape.spatial
    diffs = vectors - rename_dims(query, query.shape.instance, instance('_query')) if query.shape.instance else vectors - query
    dist = vec_squared(diffs)
    idx = argmin(dist, inst)
    if query.shape.instance:
        idx = rename_dims(idx, '_query', query.shape.instance)
    return idx


def assert_finite(t: Tensor):
    assert bool(all_(is_finite(t))), "tensor contains non-finite values"


def stop_gradient(x):
    if isinstance(x, Tensor):
        return x._op1(jax.lax.stop_gradient)
    return jax.tree_util.tree_map(jax.lax.stop_gradient, x)


def print_(value=None, name=""):
    if name:
        print(name)
    print(value)


def map_(fn, *values, dims=None, **kwargs):
    """Apply `fn` elementwise over `dims` (python loop at trace time for small dims)."""
    values = [wrap(v) for v in values]
    if dims is None:
        loop_shape = merge_shapes(*[v.shape for v in values])
    else:
        loop_shape = merge_shapes(*[v.shape.only(dims) for v in values])
    results = []
    for idx in loop_shape.meshgrid():
        args = [v[{k: i for k, i in idx.items() if k in v.shape}] for v in values]
        results.append(fn(*args, **kwargs))
    if not results:
        return None
    out = results
    for d in reversed(loop_shape.dims):
        n = d.size
        out = [stack(out[i:i + n], Shape((d,))) for i in range(0, len(out), n)]
    return out[0]
