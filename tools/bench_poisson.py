"""Microbenchmark variants of the Poisson matvec kernel at 256^3 (real chip).

Isolates where poisson_apply's 3 ms goes: XLA fallback vs pallas, tile size,
halo-row BlockSpecs, pure-copy overhead floor.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), '.jax_cache')
jax.config.update('jax_compilation_cache_dir', cache)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

RES = int(os.environ.get('RES', '256'))
N = int(os.environ.get('N', '20'))

from phiflow_tpu.ops import poisson

bcs = (('neumann', 'neumann'),) * 3
inv = (1., 1., 1.)
key = jax.random.PRNGKey(0)
p = jax.random.normal(key, (RES, RES, RES), jnp.float32)


def _sync(out):
    """Force execution: on-device reduce + fetch ONE scalar (block_until_ready
    alone has proven unreliable through the axon tunnel)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(jnp.sum(leaf)))


def timed(label, fn, *args, n=N):
    def many(*a):
        def body(carry, _):
            return fn(*carry), None
        out, _ = jax.lax.scan(body, a, None, length=n)
        return out
    f = jax.jit(many)
    _sync(f(*args))
    t0 = time.perf_counter()
    _sync(f(*args))
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{label:46s} {dt:8.3f} ms")
    return dt


timed('poisson_apply (current pallas)', lambda a: (poisson.poisson_apply(a, inv, bcs),), p)
timed('poisson_apply (XLA rolls)', lambda a: (poisson.poisson_apply(a, inv, bcs, use_pallas=False),), p)
timed('poisson_smooth zero-init 3 sweeps', lambda a: (poisson.poisson_smooth(None, a, inv, bcs, 0.9 / 6, 3, zero_init=True),), p)


# --- variant A: pure copy with same blocked structure (overhead floor) ---
def copy_kernel_variant(tile):
    X, Y, Z = p.shape
    spec = pl.BlockSpec((tile, Y, Z), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def kern(p_ref, o_ref):
        o_ref[:] = p_ref[:] * 2.0
    f = pl.pallas_call(kern, grid=(X // tile,), in_specs=[spec], out_specs=spec,
                       out_shape=jax.ShapeDtypeStruct((X, Y, Z), jnp.float32))
    return f


for t in (4, 8, 16):
    timed(f'copy*2 kernel TILE={t}', lambda a, f=copy_kernel_variant(t): (f(a),), p)


# --- variant B: matvec with halo inside the tile via extended block (T+2 rows
# fetched as one (T,Y,Z) block + 2 one-row blocks, like current) vs
# variant C: x-neighbors via in-kernel roll on a full-X single block per y-tile.
def matvec_rollx(tile_y):
    """Tile along Y instead of X: x stays whole in VMEM? No — X·tile_y·Z too big.
    Instead: variant with halo rows but bigger TILE."""
    return None


def matvec_tile(tile):
    X, Y, Z = p.shape
    spec = pl.BlockSpec((tile, Y, Z), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    row = lambda off: pl.BlockSpec((1, Y, Z), lambda i, o=off: (jnp.clip(i * tile + o, 0, X - 1), 0, 0),
                                   memory_space=pltpu.VMEM)
    ivx, ivy, ivz = (np.float32(v) for v in inv)

    def kern(p_ref, lo_ref, hi_ref, o_ref):
        pc = p_ref[:]
        pxm = jnp.concatenate([lo_ref[:], pc[:tile - 1]], axis=0)
        pxp = jnp.concatenate([pc[1:], hi_ref[:]], axis=0)
        pym = pltpu.roll(pc, 1, 1)
        pyp = pltpu.roll(pc, Y - 1, 1)
        pzm = pltpu.roll(pc, 1, 2)
        pzp = pltpu.roll(pc, Z - 1, 2)
        one = jnp.float32(1.)
        zero = jnp.float32(0.)
        gx = pl.program_id(0) * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1, 1), 0)
        axm = jnp.where(gx > 0, one, zero)
        axp = jnp.where(gx < X - 1, one, zero)
        c0x = jnp.where((gx == 0) | (gx == X - 1), jnp.float32(-1.), jnp.float32(-2.))
        gy = jax.lax.broadcasted_iota(jnp.int32, (1, Y, 1), 1)
        aym = jnp.where(gy > 0, one, zero)
        ayp = jnp.where(gy < Y - 1, one, zero)
        c0y = jnp.where((gy == 0) | (gy == Y - 1), jnp.float32(-1.), jnp.float32(-2.))
        gz = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Z), 2)
        azm = jnp.where(gz > 0, one, zero)
        azp = jnp.where(gz < Z - 1, one, zero)
        c0z = jnp.where((gz == 0) | (gz == Z - 1), jnp.float32(-1.), jnp.float32(-2.))
        o_ref[:] = ivx * (axm * pxm + axp * pxp + c0x * pc) \
            + ivy * (aym * pym + ayp * pyp + c0y * pc) \
            + ivz * (azm * pzm + azp * pzp + c0z * pc)

    inner = pl.pallas_call(kern, grid=(X // tile,), in_specs=[spec, row(-1), row(tile)],
                           out_specs=spec, out_shape=jax.ShapeDtypeStruct((X, Y, Z), jnp.float32))
    return lambda a: inner(a, a, a)


for t in (4, 8, 16):
    try:
        timed(f'matvec halo-rows TILE={t}', lambda a, f=matvec_tile(t): (f(a),), p)
    except Exception as e:
        print(f'matvec TILE={t} failed: {type(e).__name__}: {e}')


# --- variant D: no halo-row inputs; whole array in ANY + manual DMA of T+2 rows
def matvec_dma(tile):
    """Input pre-padded to (X+2, Y, Z): slab i covers rows i*T .. i*T+T+1."""
    X, Y, Z = p.shape
    ivx, ivy, ivz = (np.float32(v) for v in inv)
    spec_out = pl.BlockSpec((tile, Y, Z), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def kern(p_hbm, o_ref):
        def body(slab, sem):
            cp = pltpu.make_async_copy(p_hbm.at[pl.ds(pl.program_id(0) * tile, tile + 2)], slab, sem)
            cp.start()
            cp.wait()
            pc = slab[1:tile + 1]
            pxm = slab[0:tile]
            pxp = slab[2:tile + 2]
            pym = pltpu.roll(pc, 1, 1)
            pyp = pltpu.roll(pc, Y - 1, 1)
            pzm = pltpu.roll(pc, 1, 2)
            pzp = pltpu.roll(pc, Z - 1, 2)
            one = jnp.float32(1.)
            zero = jnp.float32(0.)
            gx = pl.program_id(0) * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1, 1), 0)
            axm = jnp.where(gx > 0, one, zero)
            axp = jnp.where(gx < X - 1, one, zero)
            c0x = jnp.where((gx == 0) | (gx == X - 1), jnp.float32(-1.), jnp.float32(-2.))
            gy = jax.lax.broadcasted_iota(jnp.int32, (1, Y, 1), 1)
            aym = jnp.where(gy > 0, one, zero)
            ayp = jnp.where(gy < Y - 1, one, zero)
            c0y = jnp.where((gy == 0) | (gy == Y - 1), jnp.float32(-1.), jnp.float32(-2.))
            gz = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Z), 2)
            azm = jnp.where(gz > 0, one, zero)
            azp = jnp.where(gz < Z - 1, one, zero)
            c0z = jnp.where((gz == 0) | (gz == Z - 1), jnp.float32(-1.), jnp.float32(-2.))
            # NOTE: clamped halo rows double-count at the global edges — weights
            # there are zero, so the value never enters (axm/axp annihilate)
            o_ref[:] = ivx * (axm * pxm + axp * pxp + c0x * pc) \
                + ivy * (aym * pym + ayp * pyp + c0y * pc) \
                + ivz * (azm * pzm + azp * pzp + c0z * pc)
        pl.run_scoped(body, slab=pltpu.VMEM((tile + 2, Y, Z), jnp.float32),
                      sem=pltpu.SemaphoreType.DMA)

    inner = pl.pallas_call(kern, grid=(X // tile,),
                           in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                           out_specs=spec_out, out_shape=jax.ShapeDtypeStruct((X, Y, Z), jnp.float32))
    return lambda a: inner(jnp.pad(a, ((1, 1), (0, 0), (0, 0))))


for t in (8, 16, 32):
    try:
        timed(f'matvec manual-DMA TILE={t}', lambda a, f=matvec_dma(t): (f(a),), p)
    except Exception as e:
        print(f'matvec DMA TILE={t} failed: {type(e).__name__}: {e}')

# correctness cross-check of variant B/D vs XLA
ref = poisson.poisson_apply(p, inv, bcs, use_pallas=False)
for name, f in [('halo-rows T=8', matvec_tile(8)), ('DMA T=8', matvec_dma(8))]:
    got = f(p)
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f'check {name}: max|err| = {err:.2e}')
