"""Micro-benchmark P2G scatter strategies on the live backend (VERDICT r4 #2
scoping): 125k particles -> 64^3 grid, mode='mean', the FLIP hot path.

Strategies:
  A. at[].add contrib + counts (what math.scatter does today)
  B. one fused at[].add over all 4 targets (offset linear ids, single sort)
  C. argsort by cell id + segment_sum(indices_are_sorted=True)
  D. sort_key_val + segment_sum sorted
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, args, n=20):
    out = f(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    return (time.perf_counter() - t0) / n * 1000, out


def main(res=64, ppc=8):
    n = res ** 3 // 8 * ppc  # 125k at 64^3/8ppc over the dam region… just use dense count
    N = 125000
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (N, 3), jnp.float32, 0.0, float(res))
    vals = jax.random.normal(jax.random.PRNGKey(1), (N, 4), jnp.float32)
    ncells = res ** 3

    def cell_ids(pos, offset):
        ijk = jnp.clip(jnp.floor(pos - offset).astype(jnp.int32), 0, res - 1)
        return (ijk[:, 0] * res + ijk[:, 1]) * res + ijk[:, 2]

    offsets = [jnp.array([0.5, 0., 0.], jnp.float32), jnp.array([0., 0.5, 0.], jnp.float32),
               jnp.array([0., 0., 0.5], jnp.float32), jnp.array([0., 0., 0.], jnp.float32)]

    # --- A: per-target contrib+counts at[].add (status quo) ---
    def strat_a(pos, vals):
        outs = []
        for t in range(4):
            ids = cell_ids(pos, offsets[t])
            contrib = jnp.zeros((ncells,), jnp.float32).at[ids].add(vals[:, t])
            counts = jnp.zeros((ncells,), jnp.float32).at[ids].add(1.0)
            outs.append(jnp.where(counts > 0, contrib / jnp.maximum(counts, 1), jnp.nan))
        return outs

    # --- B: ONE at[].add over a 4x buffer ---
    def strat_b(pos, vals):
        ids = jnp.stack([cell_ids(pos, offsets[t]) + t * ncells for t in range(4)], 1).reshape(-1)
        v = vals.reshape(-1)
        contrib = jnp.zeros((4 * ncells,), jnp.float32).at[ids].add(v)
        counts = jnp.zeros((4 * ncells,), jnp.float32).at[ids].add(1.0)
        out = jnp.where(counts > 0, contrib / jnp.maximum(counts, 1), jnp.nan)
        return [out[t * ncells:(t + 1) * ncells] for t in range(4)]

    # --- C: argsort once (centered ids), permute, per-target segment_sum sorted=False ---
    def strat_c(pos, vals):
        order = jnp.argsort(cell_ids(pos, offsets[3]))
        pos_s = pos[order]
        vals_s = vals[order]
        outs = []
        for t in range(4):
            ids = cell_ids(pos_s, offsets[t])
            contrib = jax.ops.segment_sum(vals_s[:, t], ids, ncells)
            counts = jax.ops.segment_sum(jnp.ones((N,), jnp.float32), ids, ncells)
            outs.append(jnp.where(counts > 0, contrib / jnp.maximum(counts, 1), jnp.nan))
        return outs

    # --- D: per-target sort_key_val + sorted segment_sum ---
    def strat_d(pos, vals):
        outs = []
        for t in range(4):
            ids = cell_ids(pos, offsets[t])
            ids_s, v_s = jax.lax.sort_key_val(ids, vals[:, t])
            contrib = jax.ops.segment_sum(v_s, ids_s, ncells, indices_are_sorted=True)
            counts = jax.ops.segment_sum(jnp.ones((N,), jnp.float32), ids_s, ncells,
                                         indices_are_sorted=True)
            outs.append(jnp.where(counts > 0, contrib / jnp.maximum(counts, 1), jnp.nan))
        return outs

    # --- E: ONE sort over the fused 4x ids + sorted segment_sum ---
    def strat_e(pos, vals):
        ids = jnp.stack([cell_ids(pos, offsets[t]) + t * ncells for t in range(4)], 1).reshape(-1)
        v = vals.reshape(-1)
        ids_s, v_s = jax.lax.sort_key_val(ids, v)
        contrib = jax.ops.segment_sum(v_s, ids_s, 4 * ncells, indices_are_sorted=True)
        counts = jax.ops.segment_sum(jnp.ones_like(v_s), ids_s, 4 * ncells, indices_are_sorted=True)
        out = jnp.where(counts > 0, contrib / jnp.maximum(counts, 1), jnp.nan)
        return [out[t * ncells:(t + 1) * ncells] for t in range(4)]

    ref = None
    for name, f in [('A at[].add x4', strat_a), ('B fused at[].add', strat_b),
                    ('C argsort+segsum', strat_c), ('D sortkv+segsum(sorted)', strat_d),
                    ('E fused sort+segsum', strat_e)]:
        jf = jax.jit(f)
        ms, out = timeit(jf, (pos, vals))
        if ref is None:
            ref = [np.asarray(o) for o in out]
            err = 0.0
        else:
            err = max(np.nanmax(np.abs(np.asarray(o) - r)) for o, r in zip(out, ref))
        print(f"{name:26s} {ms:8.3f} ms   max|err vs A|={err:.2e}")


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
