import numpy as np
import pytest

import phiflow_tpu.math as math
from phiflow_tpu.math import instance, channel, wrap
from phiflow_tpu.geom import Box, Sphere
from phiflow_tpu.physics import sph


def _particle_block(n=10, spacing=1.0, d=2):
    """Regular grid of particles with volume = spacing^d."""
    import itertools
    pts = np.array(list(itertools.product(*[range(n)] * d)), np.float32) * spacing
    centers = wrap(pts, instance(points=pts.shape[0]), channel(vector='x,y' if d == 2 else 'x,y,z'))
    radius = Sphere.radius_from_volume(wrap(spacing ** d), d)
    return Sphere(centers, radius=radius)


@pytest.mark.parametrize('kernel', ['quintic-spline', 'wendland-c2', 'poly6'])
def test_kernel_partition_of_unity(kernel):
    """∑_j W_ij · V_j ≈ 1 for interior particles of a filled block — validates
    kernel normalization (the core SPH identity)."""
    nodes = _particle_block(12, 1.0, d=2)
    graph = sph.neighbor_graph(nodes, kernel, compute='kernel')
    W = graph.edges[{'vector': 0}]
    volume = 1.0  # spacing^2
    density = math.sum(W, graph.shape.instance.as_dual()) * volume
    # interior particle index: center of the block
    vals = density.numpy('points').reshape(12, 12)
    interior = vals[4:8, 4:8]
    # self-contribution is excluded from neighbor sums; add W(0)·V
    w0 = sph.evaluate_kernel(math.vec(x=0., y=0.), wrap(0.), graph.bounding_distance, 2, kernel)['kernel']
    interior_total = interior + float(w0) * volume
    assert np.allclose(interior_total, 1.0, atol=0.08), f"{kernel}: {interior_total.mean()}"


def test_grad_antisymmetry():
    """∇W_ij = −∇W_ji (momentum conservation)."""
    nodes = _particle_block(6, 1.0, d=2)
    graph = sph.neighbor_graph(nodes, 'wendland-c2', compute='grad')
    gx = graph.edges[{'vector': 'grad_x'}]
    arr = gx.numpy(('points', '~points'))
    assert np.allclose(arr, -arr.T, atol=1e-5)


def test_support_radius_neighbor_count():
    nodes = _particle_block(12, 1.0, d=2)
    graph = sph.neighbor_graph(nodes, 'wendland-c2', compute='kernel')
    conn = graph.connectivity
    counts = math.sum(conn, graph.shape.instance.as_dual())
    interior = counts.numpy('points').reshape(12, 12)[4:8, 4:8]
    # desired 22 neighbors for wendland-c2
    assert 14 < interior.mean() < 30


def test_expected_neighbors():
    n = sph.expected_neighbors(wrap(1.0), wrap(2.0), 2)
    assert abs(float(n) - np.pi * 4) < 1e-4
