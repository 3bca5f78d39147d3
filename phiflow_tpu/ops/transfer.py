"""Multigrid transfer operators — restriction and prolongation at HBM roofline.

The V-cycle preconditioner (math/_multigrid.py) moves residuals down and
corrections up the level hierarchy once per smoothing pass. Composed from
generic ops these transfers are layout-hostile on TPU: axis-by-axis
``tensordot`` + ``moveaxis`` materializes a physically transposed intermediate
per axis (~9 ms for a 512³ restrict+prolong round trip, vs a ~1.6 ms traffic
bound), and any ``reshape`` that splits a minor axis into (n, 2) explodes into
(8, 128)-tile padding (a 34 GB allocation at 512³).

TPU-native formulation:

* ``restrict_mean`` — ``lax.reduce_window`` mean pooling. XLA's TPU window
  reducer runs the 2×2×2 pool in one pass at copy speed (measured 1.0 ms at
  512³ against a 0.8 ms bound). Exactly R = (1/2^d)·Pᵀ of the
  piecewise-constant prolongation P, so V-cycle symmetry is preserved.
* ``prolong_add`` — one Pallas kernel: DMA the coarse tile + the fine operand
  tile, upsample in VMEM (x/y via ``pltpu.repeat``; z — the lane axis, where
  element interleaves are shuffles — as an MXU matmul against the 0/1 pairing
  matrix at HIGHEST precision, which is exact), add, write. One read of each
  operand, one write: ~2.1 field passes total.

Reference counterpart: PhiML's sparse transfer matrices inside its multigrid
(no public file — the reference delegates to scipy/ILU preconditioning,
/root/reference/phi/math/backend/_backend.py conjugate_gradient hooks). The
design here is TPU-first rather than a translation.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
try:
    from jax.experimental.pallas import tpu as pltpu
    _TPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _TPU = False

from .poisson import pallas_ok, _compiler_params

__all__ = ['restrict_mean', 'prolong_pc', 'prolong_add']

_HI = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=64)
def _pairing_np(n: int) -> np.ndarray:
    """(n, n/2) 0/1 matrix pairing rows 2c, 2c+1 into column c."""
    R = np.zeros((n, n // 2), np.float32)
    idx = np.arange(n // 2)
    R[2 * idx, idx] = 1.0
    R[2 * idx + 1, idx] = 1.0
    return R


# ---------------------------------------------------------------------------
# restriction — full-weighting (mean over 2^d children)
# ---------------------------------------------------------------------------

def restrict_mean(r: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Mean-pool the trailing `ndim` spatial axes by 2×. r: (*lead, *spatial)."""
    lead = r.ndim - ndim
    window = (1,) * lead + (2,) * ndim
    pooled = jax.lax.reduce_window(r, np.array(0, r.dtype), jax.lax.add,
                                   window, window, 'VALID')
    return pooled * np.asarray(0.5 ** ndim, r.dtype)


# ---------------------------------------------------------------------------
# prolongation — piecewise-constant (nearest) upsample, optionally fused + add
# ---------------------------------------------------------------------------

def _prolong_xla(c: jnp.ndarray, ndim: int) -> jnp.ndarray:
    for ax in range(c.ndim - ndim, c.ndim):
        c = jnp.repeat(c, 2, axis=ax)
    return c


def _pick_tile_prolong(Xc, Yc, Zc, budget_bytes=24 * 1024 * 1024):
    """(TXc, TYc) whose double-buffered coarse-in + fine-u-in + fine-out blocks
    fit VMEM."""
    best = None
    for txc in [t for t in range(1, Xc + 1) if Xc % t == 0]:
        for tyc in [t for t in range(8, Yc + 1, 8) if Yc % t == 0]:
            blk_c = txc * tyc * Zc
            blk_f = 8 * blk_c
            elems = 2 * (blk_c + blk_f + blk_f) + 4 * blk_f  # io dbl-buffered + temps
            if elems * 4 > budget_bytes:
                continue
            if best is None or txc * tyc > best[0] * best[1]:
                best = (txc, tyc)
    return best


def _prolong_add_pallas_3d(c: jnp.ndarray, u: Optional[jnp.ndarray],
                           interpret: bool = False) -> Optional[jnp.ndarray]:
    """u + upsample2x(c) (or plain upsample when u is None) for 3D f32 arrays.
    Returns None when no VMEM-fitting tile exists (caller falls back)."""
    Xc, Yc, Zc = c.shape
    if Zc % 128 or Yc % 8:
        return None
    picked = _pick_tile_prolong(Xc, Yc, Zc)
    if picked is None:
        return None
    TXc, TYc = picked
    grid = (Xc // TXc, Yc // TYc)
    Pz = jnp.asarray(_pairing_np(2 * Zc).T)  # (Zc, 2Zc)
    # bf16 coarse values interleave exactly through a bf16 MXU pass; f32 needs
    # the 3-pass HIGHEST decomposition for bit-exactness
    prec = jax.lax.Precision.DEFAULT if c.dtype == jnp.bfloat16 else _HI

    def rep2(a, axis):
        """Element-interleaved doubling of a leading/sublane axis (not lanes —
        the z/lane axis doubles via the MXU pairing matmul instead)."""
        assert axis < a.ndim - 1
        if _TPU and not interpret:
            e = pltpu.repeat(jnp.expand_dims(a, axis + 1), 2, axis + 1)
        else:
            e = jnp.repeat(jnp.expand_dims(a, axis + 1), 2, axis=axis + 1)
        return e.reshape(a.shape[:axis] + (2 * a.shape[axis],) + a.shape[axis + 1:])

    def kernel(*refs):
        c_ref, pz_ref = refs[0], refs[1]
        out_ref = refs[-1]
        cc = c_ref[:].astype(jnp.float32)
        fz = jax.lax.dot_general(cc, pz_ref[:], (((2,), (0,)), ((), ())),
                                 precision=prec, preferred_element_type=jnp.float32)
        fy = rep2(fz, 1)
        fx = rep2(fy, 0)
        if u is not None:
            fx = fx + refs[2][:].astype(jnp.float32)
        out_ref[:] = fx.astype(out_ref.dtype)

    kwargs = {'memory_space': pltpu.VMEM} if _TPU and not interpret else {}
    c_spec = pl.BlockSpec((TXc, TYc, Zc), lambda i, j: (i, j, 0), **kwargs)
    pz_spec = pl.BlockSpec((Zc, 2 * Zc), lambda i, j: (0, 0), **kwargs)
    f_spec = pl.BlockSpec((2 * TXc, 2 * TYc, 2 * Zc), lambda i, j: (i, j, 0), **kwargs)
    inputs = [c, Pz] + ([u] if u is not None else [])
    in_specs = [c_spec, pz_spec] + ([f_spec] if u is not None else [])
    cp = _compiler_params()
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=f_spec,
        out_shape=jax.ShapeDtypeStruct((2 * Xc, 2 * Yc, 2 * Zc),
                                       c.dtype if u is None else u.dtype),
        interpret=interpret,
        **({'compiler_params': cp} if cp is not None and _TPU and not interpret else {}),
    )(*inputs)


def _batched3(fn, out_shape, *arrays):
    """Run fn over (lead..., X, Y, Z) arrays by flattening lead dims."""
    flat = [a.reshape((-1,) + a.shape[-3:]) for a in arrays]
    if flat[0].shape[0] > 1:
        out = jax.lax.map(lambda xs: fn(*xs), tuple(flat))
    else:
        out = fn(*(a[0] for a in flat))
    return out.reshape(out_shape)


def prolong_pc(c: jnp.ndarray, ndim: int, use_pallas: Optional[bool] = None,
               interpret: bool = False) -> jnp.ndarray:
    """Piecewise-constant 2× upsample of the trailing `ndim` spatial axes."""
    if use_pallas is None:
        use_pallas = pallas_ok() or interpret
    if use_pallas and ndim == 3 and c.dtype in (jnp.float32, jnp.bfloat16) \
            and c.shape[-1] % 128 == 0 and c.shape[-2] % 8 == 0 \
            and _pick_tile_prolong(*c.shape[-3:]) is not None:
        out_shape = c.shape[:-3] + tuple(2 * s for s in c.shape[-3:])
        return _batched3(lambda cc: _prolong_add_pallas_3d(cc, None, interpret=interpret),
                         out_shape, c)
    return _prolong_xla(c, ndim)


def prolong_add(c: jnp.ndarray, u: jnp.ndarray, ndim: int,
                use_pallas: Optional[bool] = None, interpret: bool = False) -> jnp.ndarray:
    """u + piecewise-constant-upsample(c); fused into one Pallas pass on TPU."""
    if use_pallas is None:
        use_pallas = pallas_ok() or interpret
    if use_pallas and ndim == 3 and c.dtype in (jnp.float32, jnp.bfloat16) and u.dtype == c.dtype \
            and c.shape[-1] % 128 == 0 and c.shape[-2] % 8 == 0 \
            and _pick_tile_prolong(*c.shape[-3:]) is not None:
        return _batched3(lambda cc, uu: _prolong_add_pallas_3d(cc, uu, interpret=interpret),
                         u.shape, c, u)
    return u + _prolong_xla(c, ndim)
