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


# ---------------------------------------------------------------------------
# cell-list neighbor search (VERDICT r1 missing #4; SURVEY.md §7 step 9)
# ---------------------------------------------------------------------------

def test_cell_list_matches_dense():
    """Same neighbor sets as the dense O(N²) search on a random 2D cloud."""
    import numpy as np
    from phiflow_tpu.math._neighbors import cell_list_neighbors
    rng = np.random.default_rng(3)
    N = 500
    pos = rng.uniform(0, 1, (N, 2)).astype(np.float32)
    cutoff = 0.08
    idx, deltas, mask = cell_list_neighbors(pos, cutoff, [0., 0.], [1., 1.], periodic=False)
    idx, mask = np.asarray(idx), np.asarray(mask)
    d2 = ((pos[None, :, :] - pos[:, None, :]) ** 2).sum(-1)
    dense_sets = [set(np.nonzero((d2[i] < cutoff ** 2) & (np.arange(N) != i))[0].tolist())
                  for i in range(N)]
    cl_sets = [set(idx[i][mask[i]].tolist()) for i in range(N)]
    assert cl_sets == dense_sets


def test_cell_list_periodic():
    import numpy as np
    from phiflow_tpu.math._neighbors import cell_list_neighbors
    pos = np.array([[0.05, 0.5], [0.95, 0.5]], np.float32)  # neighbors across the wrap
    idx, deltas, mask = cell_list_neighbors(pos, 0.2, [0., 0.], [1., 1.], periodic=True)
    sets = [set(np.asarray(idx[i])[np.asarray(mask[i])].tolist()) for i in range(2)]
    assert sets == [{1}, {0}]
    # min-image delta: from particle 0 to 1 is −0.1 in x, not +0.9
    d = np.asarray(deltas)[0][np.asarray(mask)[0]][0]
    assert abs(d[0] + 0.1) < 1e-6


def test_sph_cell_list_10k():
    """SPH density sum on N=10⁴ particles via the compact cell-list graph
    (reference scale target: phi/physics/sph.py used at large N)."""
    import numpy as np
    import phiflow_tpu.math as math
    from phiflow_tpu.math import instance, wrap, channel
    from phiflow_tpu.geom import Sphere, Box
    from phiflow_tpu.physics import sph
    rng = np.random.default_rng(0)
    N = 10_000
    pos = rng.uniform(0, 1, (N, 2)).astype(np.float32)
    from phiflow_tpu.math import Tensor
    from phiflow_tpu.math._shape import Shape, Dim
    pts = Tensor(pos, Shape((Dim('particles', N, 'instance', None), Dim('vector', 2, 'channel', ('x', 'y')))))
    radius = 0.5 / np.sqrt(N)  # particle volume ~ domain/N
    nodes = Sphere(pts, radius=radius)
    graph = sph.neighbor_graph(nodes, 'wendland-c2', compute='kernel', format='compact',
                               domain=Box(x=1., y=1.))
    assert graph.is_compact
    W = graph.edges[{'vector': 'kernel'}]
    density = math.sum(W, '~neighbors')
    dn = np.asarray(density.native())
    assert dn.shape == (N,)
    assert np.isfinite(dn).all()
    assert (dn > 0).mean() > 0.95  # almost every particle has neighbors


def test_sph_compact_matches_dense_density():
    """Compact cell-list vs dense graphs agree on the SPH density."""
    import numpy as np
    import phiflow_tpu.math as math
    from phiflow_tpu.geom import Sphere, Box
    from phiflow_tpu.physics import sph
    from phiflow_tpu.math import Tensor
    from phiflow_tpu.math._shape import Shape, Dim
    rng = np.random.default_rng(5)
    N = 800
    pos = rng.uniform(0, 1, (N, 2)).astype(np.float32)
    pts = Tensor(pos, Shape((Dim('particles', N, 'instance', None), Dim('vector', 2, 'channel', ('x', 'y')))))
    nodes = Sphere(pts, radius=0.5 / np.sqrt(N))
    g_dense = sph.neighbor_graph(nodes, 'wendland-c2', compute='kernel')
    g_comp = sph.neighbor_graph(nodes, 'wendland-c2', compute='kernel', format='compact',
                                domain=Box(x=1., y=1.))
    rho_d = np.asarray(math.sum(g_dense.edges[{'vector': 'kernel'}], '~particles').native())
    rho_c = np.asarray(math.sum(g_comp.edges[{'vector': 'kernel'}], '~neighbors').native())
    np.testing.assert_allclose(rho_d, rho_c, rtol=1e-4, atol=1e-3)
