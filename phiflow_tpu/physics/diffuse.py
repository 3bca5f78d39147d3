"""Diffusion operators (reference: /root/reference/phi/physics/diffuse.py, SURVEY.md §2.4)."""
from __future__ import annotations

import warnings
from typing import Union

from ..math import Tensor, Solve, wrap, channel, dual, stack
from ..math import _ops as ops
from ..math import solve_linear, jit_compile_linear
from ..math import extrapolation as extrapolation_mod
from ..field import Field, laplace as field_laplace, fourier_laplace as field_fourier_laplace
from ..field._field_math import where as field_where

__all__ = ['explicit', 'implicit', 'differential', 'fourier']


def explicit(u: Field, diffusivity: Union[float, Tensor, Field], dt: Union[float, Tensor],
             substeps: int = 1, order: int = 2, implicit: Solve = None,
             gradient: Field = None, upwind=None, correct_skew=True) -> Field:
    """Explicit Euler diffusion: u + dt·ν·Δu with `substeps` sub-iterations
    (reference: diffuse.py:13; CFL warning at :49-54)."""
    amount = diffusivity * (dt / substeps)
    if isinstance(amount, Field):
        amount = amount.at(u)
    # CFL warning (only when values available eagerly)
    a_max = None
    try:
        a_val = amount.values if isinstance(amount, Field) else wrap(amount)
        if a_val.available:
            import numpy as np
            dx_min = float(min(np.asarray(u.dx.native()))) if u.is_grid else None
            if dx_min is not None:
                a_max = float(ops.max_(abs(a_val))) if a_val.rank else abs(float(a_val))
                # d-dimensional explicit-Euler stability limit: dx²/(2d)
                limit = 0.5 * dx_min ** 2 / len(u.resolution)
                if a_max > limit:
                    warnings.warn(f"diffuse.explicit: amount {a_max} exceeds CFL limit {limit}; "
                                  f"increase substeps for stability", stacklevel=2)
    except Exception:
        pass
    for _ in range(substeps):
        if u.is_staggered:
            # laplace per staggered component
            comps = []
            for dim in u.resolution.names:
                comp = u.vector[dim]
                lap = field_laplace(comp, order=order)
                comps.append(comp.values + (lap.values * amount if not isinstance(amount, Field) else lap.values * amount.values))
            u = Field(u.geometry, stack(comps, dual(vector=u.resolution.names)), u.boundary)
        else:
            delta = field_laplace(u, order=order, gradient=gradient, upwind=upwind, correct_skew=correct_skew)
            incr = delta.values * (amount.values if isinstance(amount, Field) else amount)
            u = u.with_values(u.values + incr)
    return u


def implicit(u: Field, diffusivity, dt, solve: Solve = Solve('CG'),
             order: int = 1, gradient: Field = None, upwind=None, correct_skew=True) -> Field:
    """Backward-Euler diffusion: solve (1 − dt·ν·Δ) u_next = u
    (reference: diffuse.py:63-95, via solve_linear of the sharpen operator)."""
    @jit_compile_linear
    def sharpen(x: Field) -> Field:
        return explicit(x, diffusivity, -dt, order=order if order >= 2 else 2,
                        gradient=gradient, upwind=upwind, correct_skew=correct_skew)

    if solve.x0 is None:
        from ..math import copy_solve
        solve = copy_solve(solve, x0=u)
    return solve_linear(sharpen, y=u, solve=solve)


def differential(u: Field, diffusivity, gradient: Field = None, order: int = 2,
                 implicit: Solve = None, upwind=None, correct_skew=True) -> Field:
    """The diffusion term ν·Δu for use in PDE right-hand sides
    (reference: diffuse.py:98-145). Supports spatially-varying diffusivity via
    face-interpolated coefficients."""
    if isinstance(diffusivity, Field):
        # spatially-varying diffusivity: weighted laplace (reference: diffuse.py:129-145)
        return field_laplace(u, order=order, weights=diffusivity)
    if u.is_staggered:
        comps = []
        for dim in u.resolution.names:
            comp = u.vector[dim]
            lap_c = field_laplace(comp, order=order)
            comps.append(lap_c.values * diffusivity)
        return Field(u.geometry, stack(comps, dual(vector=u.resolution.names)), u.boundary)
    lap = field_laplace(u, order=order)
    return Field(u.geometry, lap.values * diffusivity, u.boundary)


def fourier(u: Field, diffusivity, dt) -> Field:
    """Exact spectral diffusion for periodic grids: û·exp(−(2πk)²·ν·dt)
    (reference: diffuse.py:147).

    TPU-safe evaluation: the decay factor is separable across axes
    (exp(−Σ_d k_d²·a) = Π_d exp(−k_d²·a)), so it is applied as per-axis
    circulant matmuls precomputed on host — no device FFT. Requires a concrete
    (non-traced) `diffusivity·dt`."""
    assert u.is_grid and u.is_centered, "fourier diffusion requires a centered grid"
    import numpy as np
    import jax
    from ..math._nd import _spectral_separable, _k_grids
    amount = diffusivity * dt
    amount = float(amount.native() if hasattr(amount, 'native') else amount)
    ks = _k_grids(u.values, u.dx.native(u.dx.shape.names))
    spectra = {d: np.exp(-(4 * np.pi ** 2) * k ** 2 * amount) for d, k in ks.items()}
    return u.with_values(_spectral_separable(u.values, spectra, 'mul'))
