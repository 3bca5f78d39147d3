"""Gradient descent on an analytic potential via `math.gradient` (reference
recipe: /root/reference/examples/optim/Gradient_Descent.ipynb): the same
descent step runs on a single start point and, batched, on EVERY grid point
at once (the landscape's sample points renamed to a batch dim)."""
import _path  # noqa: F401 — sys.path bootstrap for script execution
import numpy as np

from phiflow_tpu.flow import *


def potential(pos):
    return math.cos(math.vec_length(pos))


pot_grad = math.gradient(potential, 'pos', get_output=False)


def gradient_descent_step(x):
    return x - .1 * pot_grad(x)


if __name__ == '__main__':
    landscape = CenteredGrid(potential, x=64, y=64, bounds=Box(x=(-5, 5), y=(-5, 5)))
    x0 = vec(x=1., y=0.)
    opt_trj = math.iterate(gradient_descent_step, batch(iter=50), x0)
    final = opt_trj.iter[-1]
    pot0 = float(potential(x0))
    pot1 = float(potential(final))
    print(f"single start: potential {pot0:.4f} -> {pot1:.4f} at "
          f"{np.asarray(final.native()).round(3).tolist()}")
    assert pot1 < pot0 - 0.5, "descent should reach near the cos minimum"

    # batched descent from EVERY grid point (rename spatial dims to batch)
    starts = math.rename_dims(landscape.points, landscape.resolution, batch)
    trj = math.iterate(gradient_descent_step, batch(iter=50), starts)
    finals = trj.iter[-1]
    pots = potential(finals)
    frac_converged = float(math.mean(math.to_float(pots < -0.9), pots.shape))
    print(f"batched from {starts.shape.batch.volume} starts: "
          f"{100 * frac_converged:.1f}% reach potential < -0.9")
    assert frac_converged > 0.5
    print("done")
