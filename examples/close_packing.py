"""Close packing of mixed-radius spheres by overlap minimization
(reference recipe: examples/optim/Close_Packing.ipynb).

Spheres of radius 1 and 0.5 in a periodic box sized for ~95% fill; the loss
penalizes pairwise overlap (normalized center distance < 1) and L-BFGS finds
a packed arrangement. Distances use the periodic minimum-image convention.
"""
import _path  # noqa: F401 — sys.path bootstrap for script execution
import numpy as np

from phiflow_tpu.flow import *

N_BIG, N_SMALL = 32, 32
radii = np.concatenate([np.ones(N_BIG, np.float32), np.full(N_SMALL, 0.5, np.float32)])
R = wrap(radii, instance('spheres'))
# box sized so the disks cover 1/1.05 of the area
size = float(np.sqrt(np.sum(np.pi * radii ** 2) * 1.05))
rng = np.random.RandomState(0)
x0 = wrap(rng.uniform(0, size, (len(radii), 2)).astype(np.float32),
          instance('spheres'), channel(vector='x,y'))


def loss(x):
    """Pairwise overlap penalty with periodic minimum-image distances."""
    xo = math.rename_dims(x, 'spheres', 'o')
    dx = x - xo
    dx = (dx + size / 2) % size - size / 2          # minimum image
    ro = math.rename_dims(R, 'spheres', 'o')
    dr = math.vec_length(dx, eps=1e-8) / (R + ro)   # normalized center distance
    overlap = math.where((dr < 2e-4) | (dr > 1), wrap(0.), 1 - dr)  # self-pairs excluded via dr≈0 gate
    return math.l2_loss(overlap)


initial = float(loss(x0))
x_packed = math.minimize(loss, Solve('L-BFGS-B', abs_tol=1e-6, x0=x0, max_iterations=500)) % size
final = float(loss(x_packed))
print(f"overlap loss: {initial:.4f} -> {final:.6f}")

# largest remaining overlap depth (fraction of combined radius)
xo = math.rename_dims(x_packed, 'spheres', 'o')
dx = (x_packed - xo + size / 2) % size - size / 2
dr = math.vec_length(dx, eps=1e-8) / (R + math.rename_dims(R, 'spheres', 'o'))
worst = float(math.min(math.where(dr < 2e-4, wrap(1.), dr)))
print(f"closest pair at {worst:.3f} of combined radius (1.0 = touching)")
assert final < initial * 0.05, "packing did not converge"

if __name__ == '__main__' and not bool(int(__import__('os').environ.get('PHIFLOW_NO_PLOT', '1'))):
    vis.plot(Sphere(x_packed, radius=R))
    vis.show()
