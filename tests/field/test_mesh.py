"""FVM mesh tests (reference strategy: examples/mesh notebooks + FVM operators
against analytic fields on structured quad meshes)."""
import numpy as np
import pytest

import phiflow_tpu.math as math
from phiflow_tpu.math import extrapolation, channel, instance, wrap, Solve
from phiflow_tpu.geom import Box
from phiflow_tpu.geom._mesh import build_mesh, mesh_from_numpy
from phiflow_tpu.field import Field, laplace, divergence, spatial_gradient
from phiflow_tpu.field._mesh_math import green_gauss_gradient, centroid_to_faces


def _quad_mesh(n=8):
    return build_mesh(Box(x=1, y=1), x=n, y=n)


def test_build_mesh_basic():
    m = _quad_mesh(4)
    assert m.cell_count == 16
    assert abs(float(math.sum(m.volume)) - 1.0) < 1e-5
    # each interior cell has 4 neighbors
    interior_counts = math.sum(m.interior_mask, '~faces')
    assert float(math.max(interior_counts)) == 4


def test_mesh_with_obstacle():
    from phiflow_tpu.geom import Sphere
    m = build_mesh(Box(x=1, y=1), x=8, y=8, obstacles=Sphere(x=0.5, y=0.5, radius=0.2))
    assert m.cell_count < 64


def test_green_gauss_gradient_linear():
    """Gradient of f(x,y)=3x is (3,0) on interior cells."""
    m = _quad_mesh(8)
    f = Field(m, 3 * m.center.vector['x'], extrapolation.ZERO_GRADIENT)
    grad = green_gauss_gradient(f)
    gx = grad.values[{'vector': 'x'}]
    # interior cells (4 interior neighbors)
    interior = math.sum(m.interior_mask, '~faces') >= 4
    vals = np.asarray(gx.native())[np.asarray(interior.native())]
    assert np.allclose(vals, 3.0, atol=1e-4)


def test_mesh_laplace_quadratic():
    """Δ(x²) = 2 on interior cells."""
    m = _quad_mesh(10)
    f = Field(m, m.center.vector['x'] ** 2, extrapolation.ZERO_GRADIENT)
    lap = laplace(f)
    interior = math.sum(m.interior_mask, '~faces') >= 4
    vals = np.asarray(lap.values.native())[np.asarray(interior.native())]
    assert np.allclose(vals, 2.0, atol=1e-3)


def test_mesh_divergence_constant():
    m = _quad_mesh(6)
    v = Field(m, math.vec(x=1., y=2.), {'x-': math.vec(x=1., y=2.), 'x+': math.vec(x=1., y=2.),
                                        'y-': math.vec(x=1., y=2.), 'y+': math.vec(x=1., y=2.)})
    div = divergence(v)
    assert float(math.max(abs(div.values))) < 1e-5


def test_dirichlet_boundary_laplace():
    """Solve ∇²p = 0 with p=0 / p=1 Dirichlet walls → p is linear in x."""
    m = _quad_mesh(8)
    p = Field(m, 0., {'x-': 0., 'x+': 1., 'y-': extrapolation.ZERO_GRADIENT, 'y+': extrapolation.ZERO_GRADIENT})
    rhs = Field(m, 0., extrapolation.ZERO_GRADIENT)
    sol = math.solve_linear(lambda x: laplace(x), rhs, Solve('scipy-direct', 1e-6, 1e-6, x0=p))
    expected = np.asarray(m.center.vector['x'].native())
    got = np.asarray(sol.values.native())
    assert np.allclose(got, expected, atol=1e-3)


def test_mesh_field_jit():
    import jax
    m = _quad_mesh(6)
    f = Field(m, m.center.vector['x'], extrapolation.ZERO_GRADIENT)

    @jax.jit
    def compute(field):
        return laplace(field)

    out = compute(f)
    assert out.values.shape.get_size('cells') == 36


def test_su2_roundtrip(tmp_path):
    su2 = """NDIME= 2
NELEM= 2
5 0 1 2 0
5 0 2 3 1
NPOIN= 4
0.0 0.0 0
1.0 0.0 1
1.0 1.0 2
0.0 1.0 3
NMARK= 1
MARKER_TAG= walls
MARKER_ELEMS= 4
3 0 1
3 1 2
3 2 3
3 3 0
"""
    path = tmp_path / 'square.su2'
    path.write_text(su2)
    from phiflow_tpu.geom._mesh import load_su2
    m = load_su2(str(path))
    assert m.cell_count == 2
    assert abs(float(math.sum(m.volume)) - 1.0) < 1e-5
    assert 'walls' in m.boundaries
