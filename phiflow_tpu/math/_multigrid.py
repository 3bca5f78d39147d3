"""Geometric multigrid V-cycle for uniform-grid Poisson systems.

Used as a CG preconditioner for the pressure solve (reference exposes
`Solve(preconditioner=...)` — phiml builds an ILU preconditioner on explicit
sparse matrices; ILU is inherently sequential (triangular solves) and a poor
fit for TPU. Geometric multigrid is the TPU-native choice: every component —
Jacobi smoothing, mean-pool restriction, repeat prolongation — is a dense
elementwise/stencil op, and the level hierarchy is static so the whole V-cycle
unrolls into one compiled program. Unpreconditioned CG on a 256³ Poisson system
needs O(N^{1/3}·κ) ≈ hundreds of iterations; MG-preconditioned CG converges in
~10-20.

The smoothing/residual stencils dispatch to the fused Pallas kernels in
`phiflow_tpu.ops.poisson` ('jacobi' / 'residual' modes) — one HBM round-trip
per sweep instead of the pad/concat chains of the naive formulation. Boundary
modes are the same {periodic, neumann, ghost0} as the CG matvec, so the
preconditioner approximates exactly the operator being solved.

Symmetry (required for CG): damped-Jacobi pre/post smoothing with equal sweep
counts, restriction R = (1/2^d)·Pᵀ of the piecewise-constant prolongation P,
and a symmetric recursive coarse solve make the V-cycle operator symmetric
(negative-)definite, matching the negative-definite div∘grad system.
"""
from __future__ import annotations

from typing import Callable, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['make_poisson_vcycle']


def _lap(u: jnp.ndarray, inv_dx2, bcs) -> jnp.ndarray:
    """A·u on (batch, *res) arrays via the fused stencil (XLA path — only used
    for the host-side coarse pinv; device stencils go through poisson_apply)."""
    from ..ops.poisson import poisson_apply
    return poisson_apply(u, inv_dx2, bcs, mode='matvec', use_pallas=False)


import functools


@functools.lru_cache(maxsize=64)
def _incidence(n: int, dtype=np.float32) -> np.ndarray:
    """(n, n/2) pairing matrix: column c has ones at rows 2c and 2c+1."""
    R = np.zeros((n, n // 2), dtype)
    idx = np.arange(n // 2)
    R[2 * idx, idx] = 1.0
    R[2 * idx + 1, idx] = 1.0
    return R


def _restrict(r: jnp.ndarray) -> jnp.ndarray:
    """Full-weighting to the 2×-coarser cell-centered grid: mean over 2^d children.
    Contracted with per-axis pairing matrices — strided slices gather every
    other lane (layout-hostile on TPU), whereas these small matmuls ride the
    MXU at a tiny fraction of a memory pass."""
    for ax in range(1, r.ndim):
        R = 0.5 * _incidence(r.shape[ax], np.dtype(r.dtype).type)
        r = jnp.moveaxis(jnp.tensordot(r, R, axes=((ax,), (0,)), precision=jax.lax.Precision.HIGHEST), -1, ax)
    return r


def _prolong(e: jnp.ndarray) -> jnp.ndarray:
    """Piecewise-constant interpolation to the 2×-finer grid (adjoint of _restrict
    up to the 1/2^d factor — keeps the V-cycle symmetric): transpose contraction
    with the same pairing matrices."""
    for ax in range(1, e.ndim):
        P = _incidence(2 * e.shape[ax], np.dtype(e.dtype).type).T  # (n/2, n)
        e = jnp.moveaxis(jnp.tensordot(e, P, axes=((ax,), (0,)), precision=jax.lax.Precision.HIGHEST), -1, ax)
    return e


@functools.lru_cache(maxsize=32)
def _coarse_pinv(res: Tuple[int, ...], inv_dx2, bcs) -> np.ndarray:
    """Exact coarse solve: assemble the coarse Laplacian on host numpy (pure
    Kronecker structure from the same per-axis profiles the device stencil
    uses, ops/poisson._unmasked_coeffs_1d) and pseudo-invert it (pinv handles
    the singular Neumann/periodic nullspace). Stays a HOST constant — embedded
    as a literal, symmetric by construction. NumPy assembly avoids any device
    round trip: an identity-matvec through the axon TPU tunnel was measured at
    75 s at first build; this is < 1 ms."""
    from ..ops.poisson import _unmasked_coeffs_1d
    mats = []
    for n_d, (lo, hi), inv in zip(res, bcs, inv_dx2):
        am, ap, c0 = _unmasked_coeffs_1d(n_d, lo, hi, np.float64)
        T = np.zeros((n_d, n_d), np.float64)
        idx = np.arange(n_d)
        T[idx, idx] = c0
        # += matches jnp.roll semantics when (i±1) wraps onto the same column
        np.add.at(T, (idx, (idx - 1) % n_d), am)
        np.add.at(T, (idx, (idx + 1) % n_d), ap)
        mats.append(T * float(inv))
    A = None
    for d, T in enumerate(mats):
        term = np.array([[1.0]])
        for k in range(len(mats)):
            term = np.kron(term, T if k == d else np.eye(res[k]))
        A = term if A is None else A + term
    return np.linalg.pinv(A, rcond=1e-5).astype(np.float32)


def make_poisson_vcycle(resolution: Tuple[int, ...], dx: Tuple[float, ...], bcs,
                        nu: int = 3, omega: float = 0.9, min_size: int = 4,
                        max_direct: int = 512,
                        dtype='auto') -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Build ``vcycle(b) -> u ≈ A⁻¹ b`` for the Poisson operator on a uniform
    cell-centered grid. `b`, `u`: (batch, *resolution) float arrays.

    resolution/dx: per-axis cell counts and spacings (static Python values).
    bcs: per-axis (lower, upper) modes from {'periodic','neumann','ghost0'}
         — same modes as `ops.poisson` (matching the CG matvec operator).
    nu: pre- and post-smoothing damped-Jacobi sweeps per level (nu=3, ω=0.9
        measured fastest for the 256³ pressure solve on TPU v5e: 3 CG
        iterations at rel 1e-3 vs 6 with nu=2, ω=0.8).
    dtype: storage precision of the V-cycle's internal level arrays. 'auto' →
        bfloat16 on TPU for 3D grids (kernels compute in f32 registers; bf16
        shares f32's exponent range so no under/overflow — halves the
        preconditioner's HBM traffic, which bounds the pressure solve). The
        CG outer iteration keeps f32 residuals, so solution accuracy is set by
        the solve tolerance, not the preconditioner's storage precision.
    The coarsest level is solved exactly via a host-precomputed pseudo-inverse
    (≤ max_direct unknowns), or damped-Jacobi sweeps otherwise.
    """
    from ..ops.poisson import pallas_ok
    if dtype == 'auto':
        dtype = jnp.bfloat16 if (pallas_ok() and len(resolution) == 3
                                 and max(resolution) >= 64) else jnp.float32
    from ..ops.poisson import poisson_apply
    # --- build the static level hierarchy ---
    levels = []  # (resolution, inv_dx2)
    res = tuple(int(n) for n in resolution)
    d = tuple(float(x) for x in dx)
    while True:
        levels.append((res, tuple(1.0 / (x * x) for x in d)))
        if any(n % 2 for n in res) or min(res) <= min_size:
            break
        res = tuple(n // 2 for n in res)
        d = tuple(2 * x for x in d)
    coarse_res, coarse_inv_dx2 = levels[-1]
    n_coarse = int(np.prod(coarse_res))
    bcs = tuple(tuple(b) for b in bcs)  # hashable for the pinv cache
    coarse_inv = _coarse_pinv(coarse_res, coarse_inv_dx2, bcs) if n_coarse <= max_direct else None

    from ..ops.poisson import poisson_smooth

    def smooth(u, b, inv_dx2, sweeps, skip_first=False, out_dtype=None):
        # sweeps are pairwise-fused into two-sweep Pallas passes; with
        # skip_first (u == 0) the zero-start sweep u = w·b fuses in as well,
        # so e.g. ν=3 pre-smoothing is ONE kernel pass (ops/poisson.py).
        w = np.float32(omega / (-2.0 * sum(inv_dx2)))
        return poisson_smooth(u, b, inv_dx2, bcs, w, sweeps, zero_init=skip_first,
                              fuse_pairs=True, out_dtype=out_dtype)

    from ..ops.poisson import residual_restrict
    from ..ops.transfer import prolong_add

    def vcycle_level(b, level: int, out_dtype):
        # b keeps whatever dtype it arrived with (f32 CG residual at the fine
        # level, bf16 restricted residuals below); level arrays u/e are stored
        # in `dtype` and the final smooth writes `out_dtype` directly — every
        # cast rides inside a kernel, no standalone cast passes.
        res_l, inv_dx2 = levels[level]
        if level + 1 == len(levels):
            if coarse_inv is not None:
                flat = b.reshape(b.shape[0], -1).astype(jnp.float32)
                e = jnp.einsum('ij,bj->bi', coarse_inv, flat).reshape(b.shape)
                return e.astype(out_dtype)
            return smooth(None, b, inv_dx2, 24, skip_first=True, out_dtype=out_dtype)
        u = smooth(None, b, inv_dx2, nu, skip_first=True, out_dtype=dtype)
        # downward transfer: restrict(b − A·u) fused into one pass — the fine
        # residual is never materialized in HBM (ops/poisson.residual_restrict)
        rc = residual_restrict(u, b, inv_dx2, bcs)
        e = vcycle_level(rc, level + 1, dtype)
        # upward transfer: u += prolong(e) fused (ops/transfer.prolong_add)
        if e.dtype != u.dtype:
            e = e.astype(u.dtype)
        u = prolong_add(e, u, len(res_l))
        return smooth(u, b, inv_dx2, nu, out_dtype=out_dtype)

    def vcycle(b: jnp.ndarray) -> jnp.ndarray:
        return vcycle_level(b, 0, b.dtype)

    return vcycle
