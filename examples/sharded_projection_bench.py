"""GSPMD vs explicit shard_map pressure projection (VERDICT r1 item #6).

Compares the two multi-chip execution paths on an 8-device mesh (virtual CPU
devices unless run on real multi-chip hardware):

  * GSPMD: `fluid.make_incompressible` under jit with NamedSharding inputs —
    XLA partitions the stencils and inserts halo collectives automatically.
    Staggered components can only shard along dims with divisible sizes.
  * explicit: `parallel.make_sharded_projection` — one shard_map region with
    ppermute halo exchanges and psum'd CG dot products; the uniform lower-face
    layout shards the velocity along ALL spatial dims.
"""
import _path  # noqa: F401
import os
import time

if '--xla_force_host_platform_device_count' not in os.environ.get('XLA_FLAGS', ''):
    os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS', '') + ' --xla_force_host_platform_device_count=8'
import jax

jax.config.update('jax_platforms', 'cpu')  # virtual 8-device mesh; remove for real multi-chip

import numpy as np

import phiflow_tpu.math as math
from phiflow_tpu.math import extrapolation, Solve, ConvergenceException
from phiflow_tpu.field import StaggeredGrid, Noise, divergence
from phiflow_tpu.geom import Box
from phiflow_tpu.physics import fluid
from phiflow_tpu.parallel import create_mesh, shard_field
from phiflow_tpu.parallel._shardmap import make_sharded_projection

N = 256
mesh = create_mesh({'x': 2, 'y': 4}, jax.devices()[:8])
v = StaggeredGrid(Noise(vector='x,y'), 0., x=N, y=N, bounds=Box(x=1., y=1.))

# --- GSPMD path (y-only staggered sharding: x-comp has N−1 faces in x) ---
v_gspmd = shard_field(v, mesh, {'y': 'y'})


@jax.jit
def project_gspmd(v_):
    v2, p = fluid.make_incompressible(v_, (), Solve('CG', 1e-5, 1e-5,
                                                    suppress=(ConvergenceException,)))
    return v2


# --- explicit shard_map path (x AND y sharded) ---
project_explicit = make_sharded_projection(mesh, {'x': 'x', 'y': 'y'}, v,
                                           rel_tol=1e-5, abs_tol=1e-5)


def timeit(fn, arg, reps=5):
    out = fn(arg)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(arg)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    return (time.perf_counter() - t0) / reps * 1000


with mesh:
    t_gspmd = timeit(project_gspmd, v_gspmd)
t_explicit = timeit(lambda v_: project_explicit(v_)[0], v)
v2e, _ = project_explicit(v)
div_e = float(math.max(abs(divergence(v2e).values)))
print(f"N={N}^2, mesh {dict(mesh.shape)}:")
print(f"  GSPMD (y-sharded)        : {t_gspmd:8.2f} ms/projection")
print(f"  shard_map (x+y sharded)  : {t_explicit:8.2f} ms/projection  (max|div| {div_e:.2e})")

# --- full smoke STEP: GSPMD library composition vs one shard_map region ---
from phiflow_tpu.field import CenteredGrid, resample
from phiflow_tpu.physics import advect
from phiflow_tpu.parallel._shardmap import make_sharded_smoke_step

dt, buoy = 0.5, 0.1
smoke = CenteredGrid(Noise(), extrapolation.BOUNDARY, x=N, y=N, bounds=Box(x=1., y=1.))
smoke_gspmd = shard_field(smoke, mesh, {'y': 'y'})


@jax.jit
def step_gspmd(v_, s_):
    s2 = advect.semi_lagrangian(s_, v_, dt, max_cells=2)
    b = resample(s2 * (0., buoy), to=v_)
    v2 = advect.semi_lagrangian(v_, v_, dt, max_cells=2) + b * dt
    v3, p = fluid.make_incompressible(v2, (), Solve('CG', 1e-5, 1e-5,
                                                    suppress=(ConvergenceException,)))
    return v3, s2


step_explicit = make_sharded_smoke_step(mesh, {'x': 'x', 'y': 'y'}, v, smoke, dt, (0., buoy),
                                        rel_tol=1e-5, abs_tol=1e-5, max_iterations=1000)


def timeit2(fn, a, b, reps=5):
    out = fn(a, b)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(a, b)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    return (time.perf_counter() - t0) / reps * 1000


with mesh:
    t_step_gspmd = timeit2(step_gspmd, v_gspmd, smoke_gspmd)
t_step_explicit = timeit2(lambda a, b: step_explicit(a, b)[:2], v, smoke)
print(f"  GSPMD full step          : {t_step_gspmd:8.2f} ms/step")
print(f"  shard_map full step      : {t_step_explicit:8.2f} ms/step")
