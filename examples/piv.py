"""Particle image velocimetry: recover a velocity field from marker displacement
(reference recipe: examples/optim/PIV.ipynb).

A divergence-free velocity field advects tracer markers; given only the final
marker positions, L-BFGS recovers the field by differentiating through the
point advection — coarse-to-fine (downsampled first fit, full-resolution
refinement), as in the reference.
"""
import _path  # noqa: F401 — sys.path bootstrap for script execution

from phiflow_tpu.flow import *

math.seed(2)
v0 = StaggeredGrid(Noise(), 0, Box(x=20, y=20), x=64, y=64)
v0, _ = fluid.make_incompressible(v0)

initial_markers = v0.bounds.sample_uniform(instance(markers=1024))


@math.jit_compile
def simulate(v):
    return advect.points(initial_markers, v, dt=.1, integrator=advect.rk4)


final_markers = simulate(v0)

# coarse fit, then full-resolution refinement of the residual
fit1 = math.minimize(lambda x: math.l2_loss(final_markers - simulate(resample(x, to=v0))),
                     Solve('L-BFGS-B', abs_tol=1e-6, x0=0 * v0.downsample(4), max_iterations=100))
fit1 = resample(fit1, to=v0)
fit2 = math.minimize(lambda x: math.l2_loss(final_markers - simulate(x + fit1)),
                     Solve('L-BFGS-B', abs_tol=1e-6, x0=0 * v0, max_iterations=100))
v_estimate = fit1 + fit2

err0 = float(math.l2_loss(v0))
err = float(math.l2_loss(v_estimate - v0))
marker_err = float(math.l2_loss(final_markers - simulate(v_estimate)))
print(f"velocity MSE: {err:.5f} (field magnitude {err0:.3f}) — marker residual {marker_err:.3e}")
assert err < 0.5 * err0, "PIV reconstruction did not reduce the velocity error"

if __name__ == '__main__' and not bool(int(__import__('os').environ.get('PHIFLOW_NO_PLOT', '1'))):
    vis.plot((v_estimate - v0).curl())
    vis.show()
