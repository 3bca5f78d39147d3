"""Streamlines of an incompressible flow traced with point advection
(reference recipe: examples/particles/Streamlines.ipynb).

Seeds an 8x8 grid of start points in a projected noise field and integrates
each along the velocity with RK4, collecting the trajectory as a spatial dim.
"""
import _path  # noqa: F401 — sys.path bootstrap for script execution

from phiflow_tpu.flow import *
from phiflow_tpu import geom

math.seed(0)
domain = Box(x=10, y=10)
v = StaggeredGrid(Noise(vector='x,y'), 0, domain, x=128, y=128)
v, _ = fluid.make_incompressible(v)


@math.jit_compile
def move_along_field(x, step_size=.1):
    return advect.points(geom.Point(x), v, step_size, integrator=advect.rk4).center


# single streamline from the domain center
x_trj = math.iterate(move_along_field, spatial(iter=50), vec(x=5, y=5))
length = float(math.sum(math.vec_length(x_trj.iter[1:] - x_trj.iter[:-1]), 'iter'))
print(f"center streamline length over 50 RK4 steps: {length:.3f}")

# 8x8 seed grid -> bundle of streamlines
x0 = math.pack_dims(CenteredGrid(0, 0, domain, x=8, y=8).points, spatial, instance('start_point'))
x_trj = math.iterate(move_along_field, spatial(iter=50), x0)
seg = x_trj.iter[1:] - x_trj.iter[:-1]
distance = math.sum(math.vec_length(seg), 'iter')
print(f"64 streamlines: path length min={float(math.min(distance)):.3f} "
      f"mean={float(math.mean(distance)):.3f} max={float(math.max(distance)):.3f}")
assert float(math.min(distance)) > 0, "a streamline did not move"

if __name__ == '__main__' and not bool(int(__import__('os').environ.get('PHIFLOW_NO_PLOT', '1'))):
    vis.plot(PointCloud(geom.Point(math.pack_dims(x_trj, ['start_point', 'iter'], instance('p')))))
    vis.show()
