"""phiflow_tpu.geom — geometry layer (reference: /root/reference/phi/geom/).

Differentiable geometry primitives registered as JAX pytrees.
"""
from ._geom import (Geometry, Point, NoGeometry, InvertedGeometry, invert, rotate, scale, sample_function,
                    GeometryException, assert_same_rank)
from ._box import Box, BaseBox, Cuboid, bounding_box, box_from_limits
from ._sphere import Sphere
from ._grid import UniformGrid, enclosing_grid
from ._geom_ops import union, intersection, GeometryStack, Intersection, expel
from ._transform import (rotation_matrix, rotate_vector, rotation_angles,
                         rotation_matrix_from_axis_and_angle, rotation_matrix_from_directions)

# extended geometry families (filled in over later build stages)
try:
    from ._cylinder import Cylinder, cylinder
except ImportError:
    pass
try:
    from ._sdf import SDF, numpy_sdf
    from ._sdf_grid import SDFGrid, sample_sdf
except ImportError:
    pass
try:
    from ._heightmap import Heightmap
except ImportError:
    pass
try:
    from ._voxels import Voxels
except ImportError:
    pass
try:
    from ._mesh import Mesh, mesh, mesh_from_numpy, load_su2, load_gmsh, load_stl, build_mesh
except ImportError:
    pass
try:
    from ._graph import Graph, graph
except ImportError:
    pass
try:
    from ._embed import embed, infinite_cylinder
except ImportError:
    pass
try:
    from ._convert import as_sdf, surface_mesh
except ImportError:
    pass
try:
    from ._functions import (
        cross, clip_length, normal_from_slope, plane_sgn_dist,
        closest_on_triangle, closest_points_on_lines, distance_line_point,
    )
    from ._geom_functions import line_trace, length, squared_length, normalize, farthest_points
except ImportError:
    pass

from ._voxels import Voxels
from ._sdf_grid import SDFGrid, sample_sdf
from ._sdf import SDF, numpy_sdf
from ._heightmap import Heightmap
from ._cylinder import Cylinder, cylinder
from ._mesh import Mesh, mesh, mesh_from_numpy, build_mesh, load_su2, load_gmsh, load_stl
from ._mesh_builder import MeshBuilder, join_meshes, decimate_tri_mesh
from ._graph import Graph, graph
from ._spline import b_spline_knots, eval_nurbs_bases, spline_eval
from ._spline_sheet import BSplineSheet, SplineVolume, to_spline_volume, double_cover
from ._spline_solid import (SplineSolid, to_spline, apply_spline_bounds, transform_with_spline,
                            closest_param, spline_eval_surface)
from ._box import bounding_box
