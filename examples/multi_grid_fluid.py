"""Nested multi-grid fluid (reference recipe:
/root/reference/examples/grids/Multi_Grid_Fluid.ipynb): a coarse full-domain
simulation supplies the boundary values of a fine grid refined around an
obstacle — field-valued boundaries (FieldEmbedding) on both the fine velocity
(embedded in the coarse v) and the fine pressure solve's warm start (embedded
in the coarse p)."""
import _path  # noqa: F401 — sys.path bootstrap for script execution
import jax
import numpy as np

from phiflow_tpu.flow import *

large_domain = Box(x=100, y=100)
small_domain = Box(x=(30, 70), y=(40, 80))
obstacle = Sphere(x=50, y=60, radius=5)
inflow = Sphere(x=50, y=9.5, radius=5)
inflow_rate = 0.2


@jax.jit
def step(v, v_small, s, p, dt=1.):
    s = advect.mac_cormack(s, v_small, dt) + inflow_rate * resample(inflow, s, soft=True)
    buoyancy = s * (0, 0.1)
    v_small = advect.semi_lagrangian(v_small, v_small, dt) + buoyancy.at(v_small) * dt
    v = advect.semi_lagrangian(v, v, dt) + buoyancy.at(v) * dt
    v, p = fluid.make_incompressible(
        v, [obstacle], Solve('CG', 1e-5, 1e-5, x0=p, suppress=(ConvergenceException,)))
    # --- small-domain pressure solve with embedded boundaries ---
    p_emb_x0 = CenteredGrid(0, p, bounds=v_small.bounds, resolution=v_small.resolution)
    v_small = StaggeredGrid(v_small, extrapolation.ZERO_GRADIENT,
                            bounds=v_small.bounds, resolution=v_small.resolution)
    v_small, p_emb = fluid.make_incompressible(
        v_small, [obstacle], Solve('CG', 1e-5, 1e-5, x0=p_emb_x0,
                                   suppress=(ConvergenceException,)))
    v_small = StaggeredGrid(v_small, v, bounds=v_small.bounds, resolution=v_small.resolution)
    return v, v_small, s, p


if __name__ == '__main__':
    v0 = StaggeredGrid(0, 0, large_domain, x=32, y=32)
    v0_small = v0.at(StaggeredGrid(0, boundary=v0, bounds=small_domain, x=64, y=64))
    smoke = CenteredGrid(0, extrapolation.ZERO_GRADIENT, large_domain, x=100, y=100)
    from phiflow_tpu.physics.fluid import _pressure_extrapolation
    p = CenteredGrid(0., _pressure_extrapolation(v0.boundary), large_domain, x=32, y=32)
    v, v_small = v0, v0_small
    for i in range(30):
        v, v_small, smoke, p = step(v, v_small, smoke, p)
    vmax = float(math.max(abs(v.values)))
    vsmax = float(math.max(abs(v_small.values)))
    total = float(math.sum(smoke.values))
    div_small = field.divergence(v_small)
    hard = resample(obstacle, div_small, soft=False)
    div_np = np.abs(np.asarray(div_small.values.native(('x', 'y'))) *
                    (1 - np.asarray(hard.values.native(('x', 'y')))))
    # the outermost fine cells are re-embedded from the coarse solution every
    # step (their faces carry the coarse field's divergence at fine resolution)
    # — certify the interior, which the fine pressure solve owns
    div_int = float(div_np[2:-2, 2:-2].max())
    print(f"coarse max |v|: {vmax:.3f}, fine max |v|: {vsmax:.3f}, total smoke: {total:.2f}, "
          f"fine interior max |div|: {div_int:.2e} (rim: {float(div_np.max()):.2e})")
    assert np.isfinite(vmax) and np.isfinite(vsmax) and total > 1
    assert vsmax > 0.01, "fine grid must pick up the flow (r5: FieldEmbedding pads lost grid context)"
    assert div_int < 0.05, div_int
    print("done")
