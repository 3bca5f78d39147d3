"""Pallas kernel vs pure-XLA consistency (SURVEY.md §4b test tier).
Kernels run in interpret mode on CPU."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phiflow_tpu.ops.stencil import laplacian_2d_xla


def _pallas_interpret_laplacian(x, dx2=1.0, periodic=True):
    from jax.experimental import pallas as pl
    m, n = x.shape
    mode = 'wrap' if periodic else 'edge'
    xp = jnp.pad(x, ((1, 1), (1, 1)), mode=mode)
    TILE = m // 2

    def kernel(xp_ref, out_ref):
        i = pl.program_id(0)
        blk = xp_ref[pl.ds(i * TILE, TILE + 2), :]
        center = blk[1:-1, 1:-1]
        up = blk[2:, 1:-1]
        down = blk[:-2, 1:-1]
        left = blk[1:-1, :-2]
        right = blk[1:-1, 2:]
        out_ref[:] = (up + down + left + right - 4 * center) / dx2

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid=(m // TILE,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TILE, n), lambda i: (i, 0)),
        interpret=True,
    )(xp)


@pytest.mark.parametrize('periodic', [True, False])
def test_laplacian_kernel_matches_xla(periodic):
    x = jnp.asarray(np.random.randn(32, 64).astype(np.float32))
    expected = laplacian_2d_xla(x, 0.25, periodic)
    got = _pallas_interpret_laplacian(x, 0.25, periodic)
    assert np.allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


def test_laplacian_dispatch_cpu_fallback():
    from phiflow_tpu.ops import laplacian_2d, use_pallas
    assert not use_pallas()  # tests run on CPU
    x = jnp.asarray(np.random.randn(16, 16).astype(np.float32))
    out = laplacian_2d(x, 1.0, True)
    assert np.allclose(np.asarray(out), np.asarray(laplacian_2d_xla(x, 1.0, True)), atol=1e-6)
    # differentiable
    g = jax.grad(lambda y: jnp.sum(laplacian_2d(y, 1.0, True) ** 2))(x)
    assert np.all(np.isfinite(np.asarray(g)))
