"""Empirical (TILE, YT) scan for window_interp_3d at a given size on the real
chip — checks the analytic traffic model's choice against measured reality.
Usage: RES=512 K=1 python tools/bench_window.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), '.jax_cache'))

RES = int(os.environ.get('RES', '512'))
K = int(os.environ.get('K', '1'))
EXT = os.environ.get('EXTREMA', '0') == '1'
N = int(os.environ.get('N', '6'))

from phiflow_tpu.ops import interp as I

rng = np.random.default_rng(0)
pad1 = jnp.asarray(rng.standard_normal((RES + 2 * K,) * 3).astype(np.float32))
disp = tuple(jnp.asarray(rng.uniform(-K, K, (RES,) * 3).astype(np.float32)) for _ in range(3))


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(jnp.sum(leaf)))


def timed(fn, *args, n=N):
    def make(length):
        def many(*a):
            out, _ = jax.lax.scan(lambda c, _: (fn(*c), None), a, None, length=length)
            return out
        return jax.jit(many)
    f1, f2 = make(n), make(2 * n)
    sync(f1(*args)); sync(f2(*args))
    t1 = t2 = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); sync(f1(*args)); t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter(); sync(f2(*args)); t2 = min(t2, time.perf_counter() - t0)
    return (t2 - t1) / n * 1000


def win(pad, dx, dy, dz):
    out = I.window_interp_3d(pad, (dx, dy, dz), K, compute_extrema=EXT)
    if isinstance(out, tuple):
        out = out[0]
    return pad.at[(slice(K, -K),) * 3].set(out), dx, dy, dz


# current model's choice
t = timed(win, pad1, *disp)
print(f'model choice: {t:7.2f} ms')

results = []
for tx in (4, 8, 16, 32):
    for yt in (8, 16, 32, 64):
        if RES % tx or RES % yt:
            continue
        I._FORCE_TILES = (tx, yt)
        try:
            t = timed(win, pad1, *disp)
            results.append((t, tx, yt))
            print(f'TILE={tx:3d} YT={yt:3d}: {t:7.2f} ms')
        except Exception as e:
            print(f'TILE={tx:3d} YT={yt:3d}: failed {type(e).__name__}')
        finally:
            I._FORCE_TILES = None
results.sort()
print('best:', results[:3])
