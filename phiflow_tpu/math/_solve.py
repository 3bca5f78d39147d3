"""Linear & nonlinear solves: Solve spec, matrix-free CG / BiCGStab on device,
implicit differentiation, SolveTape.

TPU-native rebuild of phiml's solve subsystem (SURVEY.md §2.1 "Solve subsystem";
reference call sites: fluid.py:156 `math.solve_linear(masked_laplace, div, solve, ...)`,
diffuse.py:90, tests/commit/test_fluid.py:56-73 for implicit gradients).

Design:
 * The linear operator stays **matrix-free**: the field-valued function is closed
   over its auxiliary args and applied inside a `lax.while_loop` CG body. XLA
   fuses each stencil matvec with the CG vector ops into a few kernels per
   iteration — the TPU-friendly equivalent of the reference's explicit sparse
   matrix + cusparse path.
 * Gradients flow through solves via `jax.lax.custom_linear_solve`, which
   implements the implicit-function theorem (adjoint solve) without
   backpropagating through iterations.
 * All state is batched: multiple independent systems (batch dims) are solved
   in one while_loop with per-system convergence masking.
"""
from __future__ import annotations

import functools
import warnings
from dataclasses import dataclass, field as dc_field
from typing import Any, Callable, Optional, Union

import numpy as np
import jax
import jax.numpy as jnp

from ._shape import Shape, EMPTY_SHAPE, batch, channel, shape_of
from ._tensor import Tensor, TensorStack, wrap
from ._magic import ConvergenceException, Diverged, NotConverged
from ._functional import LinearFunction
from . import _ops as ops

__all__ = ['Solve', 'SolveInfo', 'SolveTape', 'solve_linear', 'solve_nonlinear', 'minimize',
           'ConvergenceException', 'Diverged', 'NotConverged']

# 'direct' / 'scipy-direct' dense-solve size limit: 2·N²·4B ≈ 2 GB at 16384 —
# fits one chip's HBM with room for the operator trace; beyond it requests
# reroute to tightened BiCGStab (see solve_linear / docs/Unstructured_Meshes.md)
DIRECT_MAX_UNKNOWNS = 16384


class Solve:
    """Specifies a linear or nonlinear solve: method, tolerances, initial guess.

    Mirrors the reference API (`Solve('CG', 1e-3, x0=p)` in Smoke_Plume;
    `solve.with_preprocessing` + `rank_deficiency` in fluid.py:145-148).
    """

    def __init__(self, method: str = 'auto', rel_tol: float = None, abs_tol: float = None,
                 x0=None, max_iterations: int = 1000, suppress: tuple = (),
                 preprocessing=None, preprocessing_args: tuple = (), rank_deficiency: int = None,
                 preconditioner=None, gradient_solve: 'Solve' = None, implicit_diff: bool = True):
        self.method = method
        self.rel_tol = rel_tol
        self.abs_tol = abs_tol
        self.x0 = x0
        self.max_iterations = max_iterations
        self.suppress = tuple(suppress)
        self.preprocessing = preprocessing
        self.preprocessing_args = preprocessing_args
        self.rank_deficiency = rank_deficiency
        self.preconditioner = preconditioner
        self._gradient_solve = gradient_solve
        # implicit_diff=False runs the Krylov loop directly (no custom_linear_solve
        # wrapper). Forward-only: reverse-mode grads cannot flow through the
        # while_loop — but SolveInfo diagnostics (iterations, residual) become
        # main-trace values that jitted callers can return as outputs.
        self.implicit_diff = implicit_diff

    @property
    def gradient_solve(self) -> 'Solve':
        return self._gradient_solve if self._gradient_solve is not None else self

    def with_preprocessing(self, preprocessing: Callable, *args) -> 'Solve':
        return copy_solve(self, preprocessing=preprocessing, preprocessing_args=args)

    def with_defaults(self, mode: str) -> 'Solve':
        rel = self.rel_tol if self.rel_tol is not None else (1e-5 if mode == 'solve' else 1e-3)
        abs_ = self.abs_tol if self.abs_tol is not None else 1e-5
        return copy_solve(self, rel_tol=rel, abs_tol=abs_)

    def __repr__(self):
        return f"Solve('{self.method}', rel_tol={self.rel_tol}, abs_tol={self.abs_tol}, max_iterations={self.max_iterations})"

    def __attrs__(self):
        return dict(method=self.method, rel_tol=self.rel_tol, abs_tol=self.abs_tol, x0=self.x0,
                    max_iterations=self.max_iterations, suppress=self.suppress,
                    preprocessing=self.preprocessing, preprocessing_args=self.preprocessing_args,
                    rank_deficiency=self.rank_deficiency, preconditioner=self.preconditioner,
                    gradient_solve=self._gradient_solve, implicit_diff=self.implicit_diff)


def copy_solve(solve: Solve, **updates) -> Solve:
    kw = solve.__attrs__()
    kw['gradient_solve'] = kw.pop('gradient_solve', None)
    kw.update(updates)
    return Solve(**kw)


# register Solve as pytree so it can be passed through jit (x0 traced, rest static)
def _solve_flatten(s: Solve):
    return (s.x0, s.preprocessing_args), (s.method, s.rel_tol, s.abs_tol, s.max_iterations,
                                          s.suppress, s.preprocessing, s.rank_deficiency,
                                          s.preconditioner, s._gradient_solve, s.implicit_diff)


def _solve_unflatten(aux, children):
    x0, pre_args = children
    method, rel_tol, abs_tol, max_iter, suppress, preprocessing, rank_def, precond, grad_solve, impl_diff = aux
    return Solve(method, rel_tol, abs_tol, x0, max_iter, suppress, preprocessing, pre_args, rank_def, precond,
                 grad_solve, impl_diff)


jax.tree_util.register_pytree_node(Solve, _solve_flatten, _solve_unflatten)


class SolveInfo:
    """Result diagnostics of a solve.

    Inside jit, `iterations`/`residual`/`converged` are tracers; concrete
    per-execution numbers are delivered asynchronously into `runtime_stats`
    (a dict filled via jax.debug.callback when a SolveTape was active during
    tracing — read it after the computation has been synced)."""

    def __init__(self, solve: Solve, x, residual, iterations, function_evaluations, converged, diverged, method, msg="",
                 runtime_stats: Optional[dict] = None):
        self.solve = solve
        self.x = x
        self.residual = residual
        self.iterations = iterations
        self.function_evaluations = function_evaluations
        self.converged = converged
        self.diverged = diverged
        self.method = method
        self.msg = msg
        self.runtime_stats = runtime_stats if runtime_stats is not None else {}

    def __repr__(self):
        return f"SolveInfo({self.method}: iterations={self.iterations}, converged={self.converged}, diverged={self.diverged})"


_SOLVE_TAPES: list = []


class SolveTape:
    """Records diagnostics of solves within its context (phiml API parity).

    record_runtime=True additionally delivers concrete per-execution iteration
    counts / residuals into `SolveInfo.runtime_stats` via a host callback —
    works under jit on CPU, but NOT on runtimes without host-callback support
    (the tunneled axon TPU); prefer `Solve(implicit_diff=False)` there, which
    makes `SolveInfo.iterations` a returnable main-trace value."""

    def __init__(self, *solves: Solve, record_trajectories=False, record_runtime=False):
        self.solves = solves
        # record_trajectories: accepted for API parity; per-iteration solution
        # snapshots are not recorded (the while_loop body is compiled — use
        # max_iterations sweeps to inspect convergence instead)
        self.record_trajectories = record_trajectories
        self.record_runtime = record_runtime
        self.solve_infos: list = []

    def __enter__(self):
        _SOLVE_TAPES.append(self)
        return self

    def __exit__(self, *args):
        _SOLVE_TAPES.remove(self)

    def __getitem__(self, item) -> SolveInfo:
        if isinstance(item, Solve):
            for info in self.solve_infos:
                if info.solve is item:
                    return info
            raise KeyError(item)
        return self.solve_infos[item]

    def __iter__(self):
        return iter(self.solve_infos)

    def __len__(self):
        return len(self.solve_infos)


def _record(info: SolveInfo):
    for tape in _SOLVE_TAPES:
        tape.solve_infos.append(info)


# ---------------------------------------------------------------------------
# flattening helpers: Field / Tensor / pytree ⇄ (batched) native vector
# ---------------------------------------------------------------------------

class _VecFormat:
    """Packs an arbitrary pytree state (Field, Tensor, tuple) into a (B, N) native array."""

    def __init__(self, template, batch_shape: Shape = None):
        self.template = template
        self.batch_shape = batch_shape if batch_shape is not None else _batch_shape_of(template)

    def flatten(self, state) -> jnp.ndarray:
        """→ (batch_volume, N) array."""
        b = self.batch_shape
        parts = []
        for t in _tensor_leaves(state):
            order = b.names + t.shape.without(b.names).names
            n = t.native(order)
            n = jnp.broadcast_to(n, tuple(b.sizes) + n.shape[len(b.names):])
            parts.append(n.reshape((max(b.volume, 1) if b else 1, -1)))
        return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]

    def to_list(self, state) -> list:
        """→ list of natives, each (*batch, *rest) — no concat/reshape copies.

        The Krylov loops run directly on these natural layouts; flattening to
        (B, N) costs a relayout copy per matvec at 256³+ and is only kept for
        the dense direct solver."""
        b = self.batch_shape
        out = []
        for t in _tensor_leaves(state):
            order = b.names + t.shape.without(b.names).names
            n = t.native(order)
            n = jnp.broadcast_to(n, tuple(b.sizes) + n.shape[len(b.names):])
            out.append(n)
        return out

    def from_list(self, arrs: list):
        b = self.batch_shape
        tensors = []
        from ._shape import concat_shapes
        for t, a in zip(_tensor_leaves(self.template), arrs):
            rest = t.shape.without(b.names)
            tensors.append(Tensor(a.reshape(tuple(b.sizes) + tuple(rest.sizes)), concat_shapes(b, rest)))
        return _rebuild_from_tensors(self.template, tensors)

    def unflatten(self, vec: jnp.ndarray):
        b = self.batch_shape
        tensors = _tensor_leaves(self.template)
        out = []
        offset = 0
        for t in tensors:
            rest = t.shape.without(b.names)
            size = rest.volume if rest else 1
            chunk = vec[:, offset:offset + size]
            offset += size
            native = chunk.reshape(tuple(b.sizes) + tuple(rest.sizes))
            from ._shape import concat_shapes
            out.append(Tensor(native, concat_shapes(b, rest)))
        return _rebuild_from_tensors(self.template, out)


def _batch_shape_of(state) -> Shape:
    from ._shape import merge_shapes
    shapes = [t.shape.batch for t in _tensor_leaves(state)]
    return merge_shapes(*shapes) if shapes else EMPTY_SHAPE


def _tensor_leaves(state):
    result = []

    def visit(x):
        if isinstance(x, TensorStack):
            result.extend(x.components)
        elif isinstance(x, Tensor):
            result.append(x)
        elif hasattr(x, 'values') and hasattr(x, 'geometry'):
            visit(x.values)
        elif isinstance(x, (tuple, list)):
            for i in x:
                visit(i)
        elif isinstance(x, dict):
            for i in x.values():
                visit(i)
        elif x is None:
            pass
        else:
            result.append(wrap(x))
    visit(state)
    return result


def _rebuild_from_tensors(template, tensors: list):
    tensors = list(tensors)

    def rebuild(x):
        if isinstance(x, TensorStack):
            comps = [tensors.pop(0) for _ in x.components]
            return TensorStack(comps, x.stack_dim)
        if isinstance(x, Tensor):
            return tensors.pop(0)
        if hasattr(x, 'values') and hasattr(x, 'geometry'):
            return x.with_values(rebuild(x.values))
        if isinstance(x, tuple):
            return tuple(rebuild(i) for i in x)
        if isinstance(x, list):
            return [rebuild(i) for i in x]
        if isinstance(x, dict):
            return {k: rebuild(v) for k, v in x.items()}
        if x is None:
            return None
        return tensors.pop(0)
    return rebuild(template)


# ---------------------------------------------------------------------------
# Krylov solvers on (B, N) arrays — lax.while_loop bodies, fully on device
# ---------------------------------------------------------------------------

def _ldot(us, vs, nb: int):
    """Σ_leaves Σ_non-batch u·v → (*batch) array."""
    tot = None
    for u, v in zip(us, vs):
        s = jnp.sum(u * v, axis=tuple(range(nb, u.ndim))) if u.ndim > nb else u * v
        tot = s if tot is None else tot + s
    return tot


def _lbc(scalar, leaf, nb: int):
    """Broadcast a (*batch) scalar against a (*batch, *rest) leaf."""
    return scalar.reshape(scalar.shape + (1,) * (leaf.ndim - nb))


def _lcomb(xs, a, ys, nb: int):
    """x + a·y per leaf with (*batch)-shaped a."""
    return [x + _lbc(a, x, nb) * y for x, y in zip(xs, ys)]


def _lmean(xs, nb: int):
    """Global mean over all non-batch entries (nullspace projection helper)."""
    total = None
    count = 0
    for x in xs:
        s = jnp.sum(x, axis=tuple(range(nb, x.ndim))) if x.ndim > nb else x
        n = int(np.prod(x.shape[nb:])) if x.ndim > nb else 1
        total = s if total is None else total + s
        count += n
    return total / count


def _lsub_mean(xs, nb: int):
    m = _lmean(xs, nb)
    return [x - _lbc(m, x, nb) for x in xs]


def _matvec_with_dot(A, p, nb: int, fused_dot: bool):
    """Apply A and return (Ap, ⟨p, Ap⟩ or None). When `fused_dot` (the operator
    is known homogeneous — A(p) = op(p) with no affine offset), arm the
    ops.poisson capture so the fused stencil kernel emits the dot as an
    epilogue instead of a separate full-field reduce (VERDICT r3 #1a)."""
    if fused_dot and nb == 0 and len(p) == 1:
        from ..ops import poisson as _poisson
        box = {}
        with _poisson.capture_matvec_dot(box, p[0].size):
            Ap = A(p)
        return Ap, box.get('dot')
    return A(p), None


def _precond_with_dot(M, r, nb: int, fused_dot: bool):
    """Apply M and return (z, ⟨r, z⟩ or None). When `fused_dot`, arm the
    ops.poisson smooth-dot capture so the V-cycle's final post-smooth kernel
    emits ⟨z, r⟩ as an epilogue instead of a separate 2-pass reduce."""
    if fused_dot and nb == 0 and len(r) == 1:
        from ..ops import poisson as _poisson
        box = {}
        with _poisson.capture_smooth_dot(box, r[0].size):
            z = M(r)
        return z, box.get('dot')
    return M(r), None


def _cg(A, b, x0, rtol, atol, max_iter, M=None, nb: int = 0, fused_dot: bool = False):
    """Conjugate gradients on lists of (*batch, *rest) arrays; returns
    (x, res_norm, iters, converged). Runs on the natural array layouts — no
    flatten/concat relayouts in the loop body.

    Works for positive- AND negative-definite operators (the pressure system
    div∘grad is negative semi-definite) — denominator guards preserve sign."""
    dtype = b[0].dtype
    eps = jnp.asarray(1e-30, dtype)

    def safe_denom(x):
        return jnp.where(jnp.abs(x) < eps, jnp.where(x < 0, -eps, eps), x)

    b_norm_sq = _ldot(b, b, nb)
    tol_sq = jnp.maximum(jnp.asarray(atol, dtype), jnp.asarray(rtol, dtype) * jnp.sqrt(b_norm_sq)) ** 2
    x = x0
    Ax = A(x)
    r = [bi - axi for bi, axi in zip(b, Ax)]
    if M is not None:
        z, rz0 = _precond_with_dot(M, r, nb, fused_dot)
    else:
        z, rz0 = r, None
    p = z
    rz = rz0 if rz0 is not None else _ldot(r, z, nb)
    # carry r·r through the loop state: `cond` runs once per iteration check and
    # the freeze test needs it again — recomputing burns 2 full HBM read passes
    # per iteration at 512³ (the dot fuses into the r-update pass instead)
    rr = _ldot(r, r, nb)

    def cond(state):
        x, r, z, p, rz, rr, it = state
        return jnp.logical_and(it < max_iter, jnp.any(rr > tol_sq))

    def body(state):
        x, r, z, p, rz, rr, it = state
        Ap, pap = _matvec_with_dot(A, p, nb, fused_dot)
        alpha = rz / safe_denom(pap if pap is not None else _ldot(p, Ap, nb))
        # freeze converged systems: alpha→0 where already converged
        active = (rr > tol_sq).astype(dtype)
        alpha = alpha * active
        x = _lcomb(x, alpha, p, nb)
        r = _lcomb(r, -alpha, Ap, nb)
        rr_new = _ldot(r, r, nb)
        if M is not None:
            z_new, rz_f = _precond_with_dot(M, r, nb, fused_dot)
        else:
            z_new, rz_f = r, None
        rz_new = rz_f if rz_f is not None else _ldot(r, z_new, nb)
        beta = rz_new / safe_denom(rz)
        p = _lcomb(z_new, beta, p, nb)
        return x, r, z_new, p, rz_new, rr_new, it + 1

    x, r, z, p, rz, rr, it = jax.lax.while_loop(
        cond, body, (x, r, z, p, rz, rr, jnp.asarray(0, jnp.int32)))
    res = jnp.sqrt(rr)
    converged = jnp.all(rr <= tol_sq)
    return x, res, it, converged


def _cg_adaptive(A, b, x0, rtol, atol, max_iter, M=None, nb: int = 0, fused_dot: bool = False):
    """Conjugate gradients with ADAPTIVE step size (phiml's 'CG-adaptive'):
    the step size is recomputed from the CURRENT residual every iteration
    (α = ⟨d, r⟩ / ⟨d, A·d⟩ instead of the rz/β recurrences) and the new search
    direction is explicitly re-conjugated against A·d. One matvec per
    iteration, like plain CG, but self-correcting against float32 drift in the
    recurrence — the reference exposes it as a distinct method for exactly the
    low-precision case. Preconditioning enters through the direction update
    (d ← M·r − β·d)."""
    dtype = b[0].dtype
    eps = jnp.asarray(1e-30, dtype)

    def safe_denom(x):
        return jnp.where(jnp.abs(x) < eps, jnp.where(x < 0, -eps, eps), x)

    b_norm_sq = _ldot(b, b, nb)
    tol_sq = jnp.maximum(jnp.asarray(atol, dtype), jnp.asarray(rtol, dtype) * jnp.sqrt(b_norm_sq)) ** 2
    x = x0
    Ax = A(x)
    r = [bi - axi for bi, axi in zip(b, Ax)]
    d = M(r) if M is not None else r
    Ad, dAd = _matvec_with_dot(A, d, nb, fused_dot)
    if dAd is None:
        dAd = _ldot(d, Ad, nb)
    rr = _ldot(r, r, nb)  # carried: see _cg

    def cond(state):
        x, r, d, Ad, dAd, rr, it = state
        return jnp.logical_and(it < max_iter, jnp.any(rr > tol_sq))

    def body(state):
        x, r, d, Ad, d_Ad, rr, it = state
        alpha = _ldot(d, r, nb) / safe_denom(d_Ad)       # adaptive: from current r
        active = (rr > tol_sq).astype(dtype)
        alpha = alpha * active
        x = _lcomb(x, alpha, d, nb)
        r = _lcomb(r, -alpha, Ad, nb)
        rr_new = _ldot(r, r, nb)
        z = M(r) if M is not None else r
        beta = _ldot(z, Ad, nb) / safe_denom(d_Ad)       # re-conjugate vs A·d
        d = _lcomb(z, -beta, d, nb)
        Ad_new, dAd_new = _matvec_with_dot(A, d, nb, fused_dot)
        if dAd_new is None:
            dAd_new = _ldot(d, Ad_new, nb)
        return x, r, d, Ad_new, dAd_new, rr_new, it + 1

    x, r, d, Ad, dAd, rr, it = jax.lax.while_loop(
        cond, body, (x, r, d, Ad, dAd, rr, jnp.asarray(0, jnp.int32)))
    res = jnp.sqrt(rr)
    converged = jnp.all(rr <= tol_sq)
    return x, res, it, converged


def _bicgstab(A, b, x0, rtol, atol, max_iter, M=None, nb: int = 0):
    """BiCGStab on lists of (*batch, *rest) arrays (covers the reference's
    'biCG-stab(2)' use cases)."""
    dtype = b[0].dtype
    eps = jnp.asarray(1e-30, dtype)

    def safe_denom(v):
        return jnp.where(jnp.abs(v) < eps, jnp.where(v < 0, -eps, eps), v)

    b_norm_sq = _ldot(b, b, nb)
    tol_sq = jnp.maximum(jnp.asarray(atol, dtype), jnp.asarray(rtol, dtype) * jnp.sqrt(b_norm_sq)) ** 2
    x = x0
    Ax = A(x)
    r = [bi - axi for bi, axi in zip(b, Ax)]
    r_hat = r
    ones = jnp.ones_like(b_norm_sq)
    rho = alpha = omega = ones
    v = [jnp.zeros_like(ri) for ri in r]
    p = [jnp.zeros_like(ri) for ri in r]
    rr = _ldot(r, r, nb)  # carried: see _cg

    def cond(state):
        x, r, r_hat, rho, alpha, omega, v, p, rr, it = state
        return jnp.logical_and(it < max_iter, jnp.any(rr > tol_sq))

    def body(state):
        x, r, r_hat, rho, alpha, omega, v, p, rr, it = state
        rho_new = _ldot(r_hat, r, nb)
        beta = (rho_new / safe_denom(rho)) * (alpha / safe_denom(omega))
        p = [ri + _lbc(beta, ri, nb) * (pi - _lbc(omega, ri, nb) * vi) for ri, pi, vi in zip(r, p, v)]
        ph = M(p) if M is not None else p
        v = A(ph)
        alpha = rho_new / safe_denom(_ldot(r_hat, v, nb))
        s = _lcomb(r, -alpha, v, nb)
        sh = M(s) if M is not None else s
        t = A(sh)
        omega = _ldot(t, s, nb) / safe_denom(_ldot(t, t, nb))
        active = (rr > tol_sq).astype(dtype)
        x = [xi + _lbc(active, xi, nb) * (_lbc(alpha, xi, nb) * phi + _lbc(omega, xi, nb) * shi)
             for xi, phi, shi in zip(x, ph, sh)]
        r = _lcomb(s, -omega, t, nb)
        rr_new = _ldot(r, r, nb)
        return x, r, r_hat, rho_new, alpha, omega, v, p, rr_new, it + 1

    state = (x, r, r_hat, rho, alpha, omega, v, p, rr, jnp.asarray(0, jnp.int32))
    out = jax.lax.while_loop(cond, body, state)
    x, r, rr, it = out[0], out[1], out[-2], out[-1]
    res = jnp.sqrt(rr)
    converged = jnp.all(rr <= tol_sq)
    return x, res, it, converged


def _bicgstab2(A, b, x0, rtol, atol, max_iter, M=None, nb: int = 0):
    """BiCGStab(2) — the genuine ℓ=2 Sleijpen–Fokkema variant: two BiCG steps
    followed by a 2-dimensional minimal-residual polynomial per outer iteration
    (4 matvecs). The quadratic MR polynomial keeps the recurrence stable on
    stiff/indefinite systems where plain BiCGStab's linear ω-polynomial
    stagnates — the reference prescribes exactly this method for its order-4/6
    implicit systems at 1e-10 (reference:
    tests/commit/physics/test_higher_order.py:31, phiml Solve('biCG-stab(2)')).

    Preconditioning is applied on the RIGHT (Â = A∘M): residuals stay in
    b-space, so the tolerance test is unchanged; x-updates go through M.
    Because every preconditioner here is a LINEAR operator (Jacobi diagonal,
    Chebyshev polynomial, zero-initial-guess V-cycle), the preconditioned
    companions M·u, M·r are carried through the same recurrences instead of
    recomputed — 4 M-applications per outer iteration (one per matvec, the
    minimum) instead of 8 (ADVICE r4 fix).
    `it` counts matvecs/2 so reported iteration cost is comparable to
    one-matvec-per-iteration CG."""
    dtype = b[0].dtype
    eps = jnp.asarray(1e-30, dtype)

    def safe_denom(v):
        return jnp.where(jnp.abs(v) < eps, jnp.where(v < 0, -eps, eps), v)

    Mfn = M if M is not None else (lambda v: v)
    b_norm_sq = _ldot(b, b, nb)
    tol_sq = jnp.maximum(jnp.asarray(atol, dtype), jnp.asarray(rtol, dtype) * jnp.sqrt(b_norm_sq)) ** 2
    x = x0
    Ax = A(x)
    r0 = [bi - axi for bi, axi in zip(b, Ax)]
    r_hat = r0
    ones = jnp.ones_like(b_norm_sq)
    rho = -ones          # ρ₀ pre-negated: body starts with ρ ← −ω·ρ and ω₀ = 1
    alpha = jnp.zeros_like(ones)
    omega = ones
    u0 = [jnp.zeros_like(ri) for ri in r0]
    mr0 = Mfn(r0)        # companion M·r0, carried through the linear recurrences
    mu0 = [jnp.zeros_like(ri) for ri in r0]  # companion M·u0

    rr = _ldot(r0, r0, nb)  # carried: see _cg

    def cond(state):
        x, r0, u0, mr0, mu0, rho, alpha, omega, rr, it = state
        return jnp.logical_and(it < max_iter, jnp.any(rr > tol_sq))

    def body(state):
        x, r0, u0, mr0, mu0, rho, alpha, omega, rr, it = state
        active = (rr > tol_sq).astype(dtype)
        rho = -omega * rho
        # --- even BiCG step (j = 0) ---
        rho1 = _ldot(r0, r_hat, nb)
        beta = alpha * rho1 / safe_denom(rho)
        rho = rho1
        u0 = _lcomb(r0, -beta, u0, nb)
        mu0 = _lcomb(mr0, -beta, mu0, nb)
        u1 = A(mu0)
        mu1 = Mfn(u1)
        alpha = rho / safe_denom(_ldot(u1, r_hat, nb))
        alpha = alpha * active
        r0 = _lcomb(r0, -alpha, u1, nb)
        mr0 = _lcomb(mr0, -alpha, mu1, nb)
        r1 = A(mr0)
        mr1 = Mfn(r1)
        x = _lcomb(x, alpha, mu0, nb)
        # --- odd BiCG step (j = 1) ---
        rho1 = _ldot(r1, r_hat, nb)
        beta = alpha * rho1 / safe_denom(rho)
        rho = rho1
        u0 = _lcomb(r0, -beta, u0, nb)
        mu0 = _lcomb(mr0, -beta, mu0, nb)
        u1 = _lcomb(r1, -beta, u1, nb)
        mu1 = _lcomb(mr1, -beta, mu1, nb)
        u2 = A(mu1)
        mu2 = Mfn(u2)
        alpha = rho / safe_denom(_ldot(u2, r_hat, nb))
        alpha = alpha * active
        r0 = _lcomb(r0, -alpha, u1, nb)
        mr0 = _lcomb(mr0, -alpha, mu1, nb)
        r1 = _lcomb(r1, -alpha, u2, nb)
        mr1 = _lcomb(mr1, -alpha, mu2, nb)
        r2 = A(mr1)
        mr2 = Mfn(r2)
        x = _lcomb(x, alpha, mu0, nb)
        # --- MR part: minimize ‖r0 − γ₁r1 − γ₂r2‖ (2×2 normal equations) ---
        s11 = _ldot(r1, r1, nb)
        s12 = _ldot(r1, r2, nb)
        s22 = _ldot(r2, r2, nb)
        t1 = _ldot(r1, r0, nb)
        t2 = _ldot(r2, r0, nb)
        det = safe_denom(s11 * s22 - s12 * s12)
        g1 = (s22 * t1 - s12 * t2) / det * active
        g2 = (s11 * t2 - s12 * t1) / det * active
        x = _lcomb(_lcomb(x, g1, mr0, nb), g2, mr1, nb)
        r0 = _lcomb(_lcomb(r0, -g1, r1, nb), -g2, r2, nb)
        mr0 = _lcomb(_lcomb(mr0, -g1, mr1, nb), -g2, mr2, nb)
        u0 = _lcomb(_lcomb(u0, -g1, u1, nb), -g2, u2, nb)
        mu0 = _lcomb(_lcomb(mu0, -g1, mu1, nb), -g2, mu2, nb)
        omega = g2
        rr_new = _ldot(r0, r0, nb)
        return x, r0, u0, mr0, mu0, rho, alpha, omega, rr_new, it + 2

    state = (x, r0, u0, mr0, mu0, rho, alpha, omega, rr, jnp.asarray(0, jnp.int32))
    out = jax.lax.while_loop(cond, body, state)
    x, r0, rr, it = out[0], out[1], out[-2], out[-1]
    res = jnp.sqrt(rr)
    converged = jnp.all(rr <= tol_sq)
    return x, res, it, converged


def _direct(A, b, x0, rank_deficiency=0):
    """Dense direct solve: materialize A by applying it to basis vectors (small N only)."""
    n = b.shape[-1]
    eye = jnp.eye(n, dtype=b.dtype)
    cols = jax.vmap(lambda e: A(jnp.broadcast_to(e, b.shape)), out_axes=-1)(eye)  # (B, N, N)
    mat = cols
    if rank_deficiency:
        # regularize the nullspace (constant vector) for singular Neumann systems
        ones_v = jnp.ones((n,), b.dtype) / n
        mat = mat + ones_v[None, :, None] * ones_v[None, None, :]
    x = jnp.linalg.solve(mat, b[..., None])[..., 0]
    return x, jnp.zeros_like(b[..., :1]), jnp.asarray(n, jnp.int32), jnp.asarray(True)


# ---------------------------------------------------------------------------
# solve_linear
# ---------------------------------------------------------------------------

def solve_linear(f, y, solve: Solve, *f_args, grad_for_f=False, f_kwargs: dict = None,
                 assume_homogeneous: bool = False, **f_kwargs_additional):
    """Solve ``f(x, *f_args) = y`` for x.

    `f` may be a `LinearFunction` (from `jit_compile_linear`), a plain linear
    callable, or an explicit matrix Tensor. Mirrors phiml `math.solve_linear`
    (reference: fluid.py:156, diffuse.py:90). Supports affine `f` (constant
    boundary offsets are subtracted automatically), preprocessing, rank-deficient
    (Neumann/periodic) systems, and implicit differentiation.

    ``assume_homogeneous``: caller guarantees f(0) = 0 (no affine boundary
    offsets). Skips the f(0) evaluation and enables the fused ⟨p, A·p⟩ kernel
    epilogue in CG (the pressure projection sets this — its derived BCs are
    periodic / zero-gradient / constant-0, all homogeneous).
    """
    f_kwargs = dict(f_kwargs or {})
    f_kwargs.update(f_kwargs_additional)
    solve = solve.with_defaults('solve')
    x0 = solve.x0 if solve.x0 is not None else (y * 0)
    if isinstance(f, LinearFunction):
        op = lambda x: f.f(x, *f_args, **f_kwargs)
    elif callable(f):
        op = lambda x: f(x, *f_args, **f_kwargs)
    else:
        raise NotImplementedError(f"matrix solve_linear with {type(f)}; pass a callable")
    # --- preprocessing of the right-hand side (e.g. _balance_divergence) ---
    if solve.preprocessing is not None:
        y = solve.preprocessing(y, *solve.preprocessing_args)
    from ._shape import merge_shapes as _merge
    shared_batch = _merge(_batch_shape_of(x0), _batch_shape_of(y))
    nb = len(shared_batch.names)
    fmt = _VecFormat(x0, shared_batch)
    y_fmt = _VecFormat(y, shared_batch)
    y_list = y_fmt.to_list(y)
    x0_list = fmt.to_list(x0)
    # --- affine offset: b0 = op(0) (constant boundary contributions) ---
    if assume_homogeneous:
        rhs = y_list

        def A(x_list):
            return y_fmt.to_list(op(fmt.from_list(x_list)))
    else:
        zero_state = _rebuild_from_tensors(x0, [ops.zeros_like(t) for t in _tensor_leaves(x0)])
        b0_list = y_fmt.to_list(op(zero_state))
        rhs = [yi - bi for yi, bi in zip(y_list, b0_list)]

        def A(x_list):
            fx = op(fmt.from_list(x_list))
            return [fi - bi for fi, bi in zip(y_fmt.to_list(fx), b0_list)]

    rank_def = solve.rank_deficiency or 0
    if rank_def:
        # project rhs onto range(A): remove mean (nullspace = constants for Poisson-Neumann)
        rhs = _lsub_mean(rhs, nb)

    # --- preconditioner: state-level callable M(state) ≈ A⁻¹ state ---
    M_list = None
    if callable(solve.preconditioner):
        def M_list(r_list):
            z = fmt.to_list(solve.preconditioner(fmt.from_list(r_list)))
            return _lsub_mean(z, nb) if rank_def else z

    method = solve.method
    if method in ('auto', 'CG', 'CG-native'):
        krylov = _cg
    elif method == 'CG-adaptive':
        krylov = _cg_adaptive
    elif method in ('biCG', 'biCG-stab', 'biCG-stab(1)'):
        krylov = _bicgstab
    elif method == 'biCG-stab(2)':
        krylov = _bicgstab2
    elif method in ('direct', 'scipy-direct'):
        # the dense direct path materializes A column-by-column: O(N²) memory
        # and N matvecs — viable up to DIRECT_MAX_UNKNOWNS (16384 → basis +
        # matrix ≈ 2·N²·4B = 2 GB f32, comfortably inside one chip's HBM, and
        # the O(N³) LU ≈ 4e12 FLOP runs in tens of ms on the MXU). Larger
        # systems reroute to BiCGStab with tightened tolerances (reference uses
        # scipy splu — sequential triangular solves with no TPU-resident
        # equivalent; docs/Unstructured_Meshes.md documents the rerouting).
        n_unknowns = sum(int(np.prod(t.shape.sizes)) for t in _tensor_leaves(x0))
        if n_unknowns > DIRECT_MAX_UNKNOWNS:
            warnings.warn(f"'{method}' with {n_unknowns} unknowns would materialize a dense "
                          f"{n_unknowns}x{n_unknowns} matrix; using BiCGStab instead")
            krylov = _bicgstab
            solve = copy_solve(solve, rel_tol=min(solve.rel_tol or 1e-5, 1e-6),
                              abs_tol=min(solve.abs_tol or 1e-5, 1e-6))
        else:
            krylov = None
    else:
        warnings.warn(f"unknown solve method {method!r}; falling back to CG")
        krylov = _cg

    it_box = {}

    def _flatten_list(arrs):
        b_vol = max(shared_batch.volume, 1) if shared_batch else 1
        parts = [a.reshape((b_vol, -1)) for a in arrs]
        return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]

    def _unflatten_to_list(vec, template_arrs):
        out = []
        offset = 0
        for t in template_arrs:
            size = int(np.prod(t.shape[nb:])) if t.ndim > nb else 1
            out.append(vec[:, offset:offset + size].reshape(t.shape))
            offset += size
        return out

    def run_solve(matvec, b_list):
        if krylov is None:
            A_flat = lambda v: _flatten_list(matvec(_unflatten_to_list(v, x0_list)))
            x_flat, res, it, conv = _direct(A_flat, _flatten_list(b_list), _flatten_list(x0_list),
                                            rank_deficiency=rank_def)
            x_list = _unflatten_to_list(x_flat, x0_list)
        else:
            kw = {'fused_dot': True} if (assume_homogeneous and krylov in (_cg, _cg_adaptive)) else {}
            x_list, res, it, conv = krylov(matvec, b_list, x0_list, solve.rel_tol, solve.abs_tol,
                                           solve.max_iterations, M=M_list, nb=nb, **kw)
        if rank_def:
            x_list = _lsub_mean(x_list, nb)
        it_box['iterations'] = it
        it_box['residual'] = res
        it_box['converged'] = conv
        if any(t.record_runtime for t in _SOLVE_TAPES) and 'runtime_stats' not in it_box:
            # Deliver concrete per-execution diagnostics to SolveTape even under
            # jit: a host callback fills this dict when the computation runs.
            stats = it_box['runtime_stats'] = {}

            def _deliver(i, r, c):
                stats['iterations'] = int(np.asarray(i))
                stats['residual_norm'] = float(np.max(np.asarray(r)))
                stats['converged'] = bool(np.asarray(c))
            jax.debug.callback(_deliver, it, res, conv)
        return x_list

    if not solve.implicit_diff:
        # direct Krylov run (forward-only): diagnostics in it_box are
        # main-trace values
        x_out = run_solve(A, rhs)
    else:
        # custom_linear_solve gives us implicit differentiation (adjoint solve on
        # the transpose system) without differentiating through the iteration loop.
        sym = krylov in (_cg, _cg_adaptive, None)  # CG/direct used only for symmetric systems here
        try:
            x_out = jax.lax.custom_linear_solve(A, rhs, lambda mv, b: run_solve(mv, b),
                                                transpose_solve=lambda mv, b: run_solve(mv, b),
                                                symmetric=sym)
        except TypeError:
            x_out = jax.lax.custom_linear_solve(A, rhs, lambda mv, b: run_solve(mv, b),
                                                transpose_solve=lambda mv, b: run_solve(mv, b))
    x = fmt.from_list(x_out)
    # --- diagnostics & convergence checks ---
    # custom_linear_solve traces its solve closure, so iteration diagnostics from
    # it_box are tracers even in eager mode. When x is concrete, verify
    # convergence post-hoc with one extra matvec (reference behavior: raise
    # Diverged/NotConverged eagerly, phiml Solve API).
    if not any(isinstance(xi, jax.core.Tracer) for xi in x_out):
        r_list = [ri - ai for ri, ai in zip(rhs, A(x_out))]
        res_sq = np.asarray(_ldot([jnp.asarray(np.asarray(ri)) for ri in r_list],
                                  [jnp.asarray(np.asarray(ri)) for ri in r_list], nb))
        res = np.sqrt(res_sq)
        b_norm = np.sqrt(np.asarray(_ldot(rhs, rhs, nb)))
        tol = np.maximum(solve.abs_tol, solve.rel_tol * b_norm)
        div_val = not bool(np.all(np.isfinite(res)))
        # allow ~10x margin: the while_loop stops on the recurrence residual,
        # which drifts from the true residual in float32
        conv_val = bool(np.all(res <= np.maximum(tol, 1e-12) * 10)) and not div_val
        info = SolveInfo(solve, x, res, -1, -1, conv_val, div_val, solve.method,
                         msg=f"max residual {res.max():.3e} vs tolerance {np.max(tol):.3e}",
                         runtime_stats=it_box.get('runtime_stats'))
        _record(info)
        if div_val and Diverged not in solve.suppress and ConvergenceException not in solve.suppress:
            raise Diverged(info)
        if not conv_val and NotConverged not in solve.suppress and ConvergenceException not in solve.suppress:
            raise NotConverged(info)
    else:
        # Traced (inside jit): exceptions cannot fire here — convergence state is
        # surfaced as TRACERS through SolveTape instead (`info.converged`,
        # `info.residual`, `info.iterations` are jax values the caller can
        # return from the jitted function or inspect via jax.debug.callback).
        _record(SolveInfo(solve, x, it_box.get('residual'),
                          it_box.get('iterations', -1), it_box.get('iterations', -1),
                          it_box.get('converged', True), False, solve.method, msg="traced",
                          runtime_stats=it_box.get('runtime_stats')))
    return x


# ---------------------------------------------------------------------------
# nonlinear solves / minimize
# ---------------------------------------------------------------------------

def _lbfgs(value_and_grad: Callable, x0: jnp.ndarray, max_iter: int, tol: float,
           history: int = 10):
    """Limited-memory BFGS with backtracking (Armijo) line search, fully
    jit-able: fixed-size cyclic history buffers + two-loop recursion over
    masked slots (the reference relies on scipy L-BFGS-B; this is the
    device-resident equivalent, without box constraints)."""
    n = x0.shape[0]
    m = history
    f0, g0 = value_and_grad(x0)

    def two_loop(g, S, Y, rho, count):
        """H·g using the stored (s, y) pairs (most recent = slot (count−1) % m)."""
        q = g
        alphas = jnp.zeros(m, x0.dtype)

        def bwd(i, carry):
            q, alphas = carry
            j = (count - 1 - i) % m
            valid = i < jnp.minimum(count, m)
            a = jnp.where(valid, rho[j] * jnp.dot(S[j], q), 0.0)
            q = q - a * Y[j]
            return q, alphas.at[j].set(a)

        q, alphas = jax.lax.fori_loop(0, m, bwd, (q, alphas))
        # initial Hessian scale from the most recent pair
        last = (count - 1) % m
        sy = jnp.dot(S[last], Y[last])
        yy = jnp.dot(Y[last], Y[last])
        gamma = jnp.where((count > 0) & (yy > 1e-30), sy / jnp.maximum(yy, 1e-30), 1.0)
        r = gamma * q

        def fwd(i, r):
            j = (count - jnp.minimum(count, m) + i) % m
            valid = i < jnp.minimum(count, m)
            beta = jnp.where(valid, rho[j] * jnp.dot(Y[j], r), 0.0)
            return r + jnp.where(valid, (alphas[j] - beta), 0.0) * S[j]

        return jax.lax.fori_loop(0, m, fwd, r)

    try:  # strong-Wolfe search (guarantees s·y > 0 so the history stays useful)
        from jax._src.scipy.optimize.line_search import line_search as _wolfe
    except ImportError:  # pragma: no cover — fall back to Armijo backtracking
        _wolfe = None

    def line_search(x, fx, g, direction):
        if _wolfe is not None:
            ls = _wolfe(lambda z: value_and_grad(z)[0], x, direction, old_fval=fx, gfk=g)
            ok = jnp.isfinite(ls.a_k) & (ls.a_k > 0)
            return jnp.where(ok, ls.a_k, jnp.asarray(1e-8, x.dtype))
        # Armijo backtracking fallback
        g_dot_d = jnp.dot(g, direction)

        def cond(state):
            step, fnew, tries = state
            return (fnew > fx + 1e-4 * step * g_dot_d) & (tries < 20)

        def body(state):
            step, _, tries = state
            step = step * 0.5
            fnew, _ = value_and_grad(x + step * direction)
            return step, fnew, tries + 1

        f1, _ = value_and_grad(x + direction)
        step, fnew, _ = jax.lax.while_loop(cond, body, (jnp.asarray(1.0, x.dtype), f1, 0))
        return step

    def cond(state):
        x, fx, g, S, Y, rho, count, it = state
        return (jnp.max(jnp.abs(g)) > tol) & (it < max_iter)

    def body(state):
        x, fx, g, S, Y, rho, count, it = state
        d = -two_loop(g, S, Y, rho, count)
        # safeguard: fall back to steepest descent on non-descent directions
        d = jnp.where(jnp.dot(d, g) < 0, d, -g)
        step = line_search(x, fx, g, d)
        x_new = x + step * d
        f_new, g_new = value_and_grad(x_new)
        s = x_new - x
        y = g_new - g
        sy = jnp.dot(s, y)
        slot = count % m
        good = sy > 1e-10
        S = jnp.where(good, S.at[slot].set(s), S)
        Y = jnp.where(good, Y.at[slot].set(y), Y)
        rho = jnp.where(good, rho.at[slot].set(1.0 / jnp.maximum(sy, 1e-30)), rho)
        count = count + jnp.where(good, 1, 0)
        return x_new, f_new, g_new, S, Y, rho, count, it + 1

    S0 = jnp.zeros((m, n), x0.dtype)
    Y0 = jnp.zeros((m, n), x0.dtype)
    rho0 = jnp.zeros(m, x0.dtype)
    state = (x0, f0, g0, S0, Y0, rho0, jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
    x, fx, g, *_, it = jax.lax.while_loop(cond, body, state)
    return x, fx, jnp.max(jnp.abs(g)), it


def minimize(f: Callable, solve: Solve):
    """Minimize a scalar function of the Solve's x0 (reference: examples/optim).

    Methods: 'L-BFGS-B' (default 'auto' — device-resident L-BFGS, no box
    constraints), 'BFGS' (jax.scipy.optimize), 'GD'."""
    solve = solve.with_defaults('optimization')
    x0 = solve.x0
    fmt = _VecFormat(x0)
    x0_vec = fmt.flatten(x0)
    shape_bn = x0_vec.shape

    def loss_flat(xf):
        state = fmt.unflatten(xf.reshape(shape_bn))
        loss = f(state)
        lt = loss.values if hasattr(loss, 'values') else loss
        lt = wrap(lt)
        return jnp.sum(lt.native())

    method = solve.method if solve.method not in (None, 'auto') else 'L-BFGS-B'
    if method in ('L-BFGS-B', 'L-BFGS', 'lbfgs'):
        vag = jax.value_and_grad(loss_flat)
        x_flat, fx, gmax, it = _lbfgs(vag, x0_vec.reshape(-1),
                                      max_iter=solve.max_iterations,
                                      tol=solve.abs_tol if solve.abs_tol else 1e-6)
        x = fmt.unflatten(x_flat.reshape(shape_bn))
        if not isinstance(gmax, jax.core.Tracer):
            success = bool(np.asarray(gmax) <= max(solve.abs_tol or 1e-6, 1e-6) * 10) \
                or bool(np.asarray(it) < solve.max_iterations)
            info = SolveInfo(solve, x, fx, int(np.asarray(it)), -1, success, False, 'L-BFGS-B')
        else:
            info = SolveInfo(solve, x, fx, it, -1, True, False, 'L-BFGS-B', msg='traced')
        _record(info)
        return x
    from jax.scipy.optimize import minimize as jsp_minimize
    result = jsp_minimize(loss_flat, x0_vec.reshape(-1), method='BFGS',
                          options={'maxiter': solve.max_iterations})
    x = fmt.unflatten(result.x.reshape(shape_bn))
    success = bool(result.success) if not isinstance(result.success, jax.core.Tracer) else True
    info = SolveInfo(solve, x, result.fun, int(result.nit) if not isinstance(result.nit, jax.core.Tracer) else -1,
                     -1, success, False, 'BFGS')
    _record(info)
    if not success and NotConverged not in solve.suppress and ConvergenceException not in solve.suppress:
        warnings.warn(f"minimize did not converge: {result.status}")
    return x


def solve_nonlinear(f: Callable, y, solve: Solve):
    """Solve f(x) = y for a nonlinear f (reference API: phiml solve_nonlinear).

    method 'auto'/'Newton': matrix-free Newton-Krylov — each Newton step solves
    J·dx = −r with BiCGStab on the JVP of f (no Jacobian materialization),
    followed by a backtracking damping search on ‖r‖². Other methods fall back
    to minimizing ‖f(x) − y‖² with the chosen optimizer.
    """
    if solve.method not in ('auto', 'Newton', 'newton'):
        def loss(x):
            diff = f(x) - y
            leaves = _tensor_leaves(diff)
            return sum([ops.sum_(t ** 2) for t in leaves])
        return minimize(loss, solve)
    solve = solve.with_defaults('solve')
    x0 = solve.x0
    assert x0 is not None, "solve_nonlinear requires solve.x0"
    fmt = _VecFormat(x0)
    x_vec = fmt.flatten(x0).reshape(-1)
    y_vec = _VecFormat(y).flatten(y).reshape(-1)

    def residual_flat(xf):
        state = fmt.unflatten(xf.reshape(fmt.flatten(x0).shape))
        r = f(state)
        return _VecFormat(y).flatten(r).reshape(-1) - y_vec

    tol = max(solve.abs_tol or 1e-5, 1e-12)
    max_newton = min(solve.max_iterations, 50)
    for it in range(max_newton):
        r = residual_flat(x_vec)
        r_norm = float(jnp.linalg.norm(r)) if not isinstance(r, jax.core.Tracer) else None
        if r_norm is not None and r_norm < tol:
            break
        jvp = lambda v: jax.jvp(residual_flat, (x_vec,), (v,))[1]
        dx, _, _, _ = _bicgstab(lambda vs: [jvp(vs[0])], [-r], [jnp.zeros_like(r)],
                                rtol=1e-3, atol=1e-12, max_iter=200)
        dx = dx[0]
        # backtracking damping on ‖r‖²
        step = 1.0
        base = jnp.sum(r ** 2)
        for _ in range(8):
            r_new = residual_flat(x_vec + step * dx)
            if isinstance(r_new, jax.core.Tracer) or float(jnp.sum(r_new ** 2)) < float(base):
                break
            step *= 0.5
        x_vec = x_vec + step * dx
    x = fmt.unflatten(x_vec.reshape(fmt.flatten(x0).shape))
    r_final = residual_flat(x_vec)
    if not isinstance(r_final, jax.core.Tracer):
        res = float(jnp.linalg.norm(r_final))
        info = SolveInfo(solve, x, res, it + 1, -1, res < tol * 10, not np.isfinite(res), 'Newton-Krylov')
        _record(info)
        if not info.converged and NotConverged not in solve.suppress \
                and ConvergenceException not in solve.suppress:
            raise NotConverged(info)
    return x
