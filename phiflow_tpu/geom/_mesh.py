"""Unstructured mesh geometry for finite-volume simulations
(reference: /root/reference/phi/geom/_mesh.py:29-1082, SURVEY.md §2.2).

TPU-native redesign: instead of the reference's scipy.sparse CSR incidence
matrices, connectivity is stored as **padded dense per-cell face tables**:
for every cell, a fixed number of face slots (padded with -1) holding the
neighbor-cell index, face area, outward normal, face center and cell-to-cell
distance. Every FVM operator (gradient, divergence, laplace, face
interpolation) then lowers to gathers + slot-sums over static shapes — fully
vectorized on the VPU, no sparse matvec, no dynamic shapes. Mesh construction
(face matching, boundary grouping) happens host-side in NumPy at build time,
exactly like the reference's loader stage.

Boundary faces reference named boundary groups; a Field's boundary dict
({'inlet': vec(1,0), 'walls': ZERO_GRADIENT, ...}) supplies their values.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
import jax

from ..math import Tensor, Shape, wrap, channel, instance, dual, spatial, stack
from ..math import _ops as ops
from ..math._magic import slicing_dict
from ._geom import Geometry
from ._box import Box, BaseBox

__all__ = ['Mesh', 'mesh_from_numpy', 'mesh', 'build_mesh', 'load_su2', 'load_gmsh', 'load_stl']


class Mesh(Geometry):
    """Unstructured FVM mesh. All per-cell/per-face data are dense padded tensors:

    * cell_centers (cells, vector), cell_volumes (cells)
    * neighbors (cells, ~faces): neighbor cell index, −1 = unused slot,
      −(2+b) = boundary face of group b
    * face_areas/face_centers/face_normals (cells, ~faces[, vector]) — outward
    """

    def __init__(self, vertices: Tensor, element_lists, boundaries: Dict[str, int],
                 cell_centers: Tensor, cell_volumes: Tensor,
                 neighbors: Tensor, face_areas_t: Tensor, face_centers_t: Tensor,
                 face_normals_t: Tensor, neighbor_distances: Tensor, element_rank: int):
        self._vertices = vertices
        self._element_lists = element_lists  # python list of per-cell vertex index tuples (static metadata)
        self._boundaries = boundaries  # name -> boundary id
        self._cell_centers = cell_centers
        self._cell_volumes = cell_volumes
        self._neighbors = neighbors
        self._face_areas = face_areas_t
        self._face_centers = face_centers_t
        self._face_normals = face_normals_t
        self._neighbor_distances = neighbor_distances
        self.element_rank = element_rank

    # --- basic geometry interface ---
    @property
    def vertices(self) -> Tensor:
        return self._vertices

    @property
    def boundaries(self) -> Dict[str, int]:
        return self._boundaries

    @property
    def boundary_names(self) -> Tuple[str, ...]:
        return tuple(self._boundaries)

    @property
    def center(self) -> Tensor:
        return self._cell_centers

    @property
    def shape(self) -> Shape:
        return self._cell_centers.shape

    @property
    def volume(self) -> Tensor:
        return self._cell_volumes

    @property
    def spatial_rank(self) -> int:
        return self._cell_centers.shape.get_size('vector')

    @property
    def cell_count(self) -> int:
        return self.shape.get_size('cells')

    @property
    def max_faces(self) -> int:
        return self._neighbors.shape.get_size('~faces')

    # --- dense face tables ---
    @property
    def neighbors(self) -> Tensor:
        """Neighbor cell index per (cells, ~faces); −1 unused, −(2+b) boundary group b."""
        return self._neighbors

    @property
    def face_areas(self) -> Tensor:
        return self._face_areas

    @property
    def face_centers(self) -> Tensor:
        return self._face_centers

    @property
    def face_normals(self) -> Tensor:
        return self._face_normals

    @property
    def neighbor_distances(self) -> Tensor:
        """Distance between cell centers across each face (boundary: center-to-face ×2)."""
        return self._neighbor_distances

    @property
    def face_shape(self) -> Shape:
        return self._neighbors.shape

    @property
    def interior_mask(self) -> Tensor:
        return ops.to_float(self._neighbors >= 0)

    @property
    def valid_face_mask(self) -> Tensor:
        return ops.to_float(self._neighbors != -1)

    def boundary_mask(self, name: str) -> Tensor:
        bid = self._boundaries[name]
        return ops.to_float(self._neighbors == -(2 + bid))

    def gather_neighbor(self, cell_values: Tensor) -> Tensor:
        """Value of the neighbor cell per face slot (cells, ~faces); clamped for
        invalid/boundary slots (mask separately)."""
        idx = ops.maximum(self._neighbors, 0)
        return ops.gather(cell_values, idx, dims='cells')

    # --- queries ---
    def lies_inside(self, location: Tensor) -> Tensor:
        closest = ops.find_closest(self._cell_centers, location)
        d = ops.gather(self._cell_volumes, closest, dims='cells') ** (1 / self.spatial_rank)
        dist = ops.vec_length(location - ops.gather(self._cell_centers, closest, dims='cells'))
        return dist < d

    def approximate_signed_distance(self, location: Tensor) -> Tensor:
        closest = ops.find_closest(self._cell_centers, location)
        return ops.vec_length(location - ops.gather(self._cell_centers, closest, dims='cells'))

    def bounding_radius(self) -> Tensor:
        return (self._cell_volumes ** (1 / self.spatial_rank)) * 0.5

    def bounding_half_extent(self) -> Tensor:
        from ..math import expand
        return expand(self.bounding_radius(), self.shape.only('vector'))

    @property
    def bounds(self) -> Box:
        lo = ops.min_(self._vertices, 'vertices')
        up = ops.max_(self._vertices, 'vertices')
        return Box(lo, up)

    def at(self, center: Tensor) -> 'Mesh':
        delta = center - self.center
        return self.shifted(delta)

    def shifted(self, delta: Tensor) -> 'Mesh':
        return Mesh(self._vertices + delta, self._element_lists, self._boundaries,
                    self._cell_centers + delta, self._cell_volumes, self._neighbors,
                    self._face_areas, self._face_centers + delta, self._face_normals,
                    self._neighbor_distances, self.element_rank)

    def __getitem__(self, item):
        item = slicing_dict(self, item)
        if not item:
            return self
        raise NotImplementedError("Mesh slicing beyond identity not yet supported")

    def __eq__(self, other):
        return isinstance(other, Mesh) and self._element_lists is other._element_lists \
            and ops.equal(self._vertices, other._vertices)

    def __hash__(self):
        return hash(('Mesh', len(self._element_lists)))

    def __repr__(self):
        return f"Mesh[{self.cell_count} cells, {self.shape.get_size('vector')}D, boundaries={list(self._boundaries)}]"


def _mesh_flatten(m: Mesh):
    children = (m._vertices, m._cell_centers, m._cell_volumes, m._neighbors,
                m._face_areas, m._face_centers, m._face_normals, m._neighbor_distances)
    aux = (id(m._element_lists), tuple(m._boundaries.items()), m.element_rank, m._element_lists)
    return children, aux


def _mesh_unflatten(aux, ch):
    _, boundaries, element_rank, element_lists = aux
    return Mesh(ch[0], element_lists, dict(boundaries), ch[1], ch[2], ch[3], ch[4], ch[5], ch[6], ch[7], element_rank)


jax.tree_util.register_pytree_node(Mesh, _mesh_flatten, _mesh_unflatten)


# ---------------------------------------------------------------------------
# construction (host-side NumPy, build time)
# ---------------------------------------------------------------------------

def _native_face_tables(points: np.ndarray, polygons, boundaries: Dict[str, List[Tuple[int, int]]]):
    """Dispatch to the C++ face matcher; returns None to use the Python path."""
    try:
        from ..native._lib import build_face_tables_2d
    except ImportError:
        return None
    boundary_ids = {name: i for i, name in enumerate(boundaries)}
    default_id = len(boundary_ids)
    rows = []
    for name, edges in boundaries.items():
        for v0, v1 in edges:
            rows.append((min(v0, v1), max(v0, v1), boundary_ids[name]))
    max_verts = max(len(p) for p in polygons)
    polys = np.full((len(polygons), max_verts), -1, np.int32)
    for i, p in enumerate(polygons):
        polys[i, :len(p)] = p
    result = build_face_tables_2d(points, polys, rows, default_id)
    if result is None:
        return None
    centers, volumes, neighbors, areas, f_centers, normals, distances = result
    if np.any(neighbors == -(2 + default_id)):
        boundary_ids['boundary'] = default_id
    return (boundary_ids, centers, volumes, neighbors, areas, f_centers, normals, distances)


def mesh_from_numpy(points: Sequence, polygons: Sequence, boundaries: Dict[str, List[Tuple[int, int]]] = None,
                    element_rank: int = None, periodic=None, cell_dim=instance('cells'),
                    face_format: str = 'dense', axes=('x', 'y', 'z')) -> Mesh:
    """Build a Mesh from vertex coordinates + polygon vertex lists
    (reference: phi/geom/_mesh.py:618). `boundaries` maps names to lists of
    boundary edges (vertex index pairs); unlisted boundary faces go to 'boundary'."""
    points = np.asarray(points, np.float32)
    d = points.shape[1]
    labels = tuple(axes[:d])
    polygons = [tuple(int(v) for v in poly) for poly in polygons]
    n_cells = len(polygons)
    if d == 3:
        return _mesh_from_numpy_3d(points, polygons, boundaries or {}, element_rank, cell_dim, labels)
    assert d == 2, f"mesh_from_numpy supports 2D polygonal and 3D polyhedral meshes, got d={d}"
    # --- native fast path (C++ face matcher, phiflow_tpu/native/meshbuild.cpp) ---
    native = _native_face_tables(points, polygons, boundaries or {})
    if native is not None:
        boundary_ids, centers, volumes, neighbors, areas, f_centers, normals, distances = native
        cells = cell_dim.with_size(n_cells)
        faces_dim = dual(faces=neighbors.shape[1])
        vec = channel(vector=labels)
        return Mesh(
            vertices=wrap(points, instance(vertices=points.shape[0]), vec),
            element_lists=polygons,
            boundaries=boundary_ids,
            cell_centers=wrap(centers, cells, vec),
            cell_volumes=wrap(volumes, cells),
            neighbors=wrap(neighbors, cells, faces_dim),
            face_areas_t=wrap(areas, cells, faces_dim),
            face_centers_t=wrap(f_centers, cells, faces_dim, vec),
            face_normals_t=wrap(normals, cells, faces_dim, vec),
            neighbor_distances=wrap(distances, cells, faces_dim),
            element_rank=element_rank if element_rank is not None else d,
        )
    # --- cell centers & volumes (polygon area via shoelace) ---
    centers = np.zeros((n_cells, d), np.float32)
    volumes = np.zeros((n_cells,), np.float32)
    for ci, poly in enumerate(polygons):
        pts = points[list(poly)]
        x, y = pts[:, 0], pts[:, 1]
        a = 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
        volumes[ci] = abs(a)
        cx = np.sum((x + np.roll(x, -1)) * (x * np.roll(y, -1) - np.roll(x, -1) * y)) / (6 * a)
        cy = np.sum((y + np.roll(y, -1)) * (x * np.roll(y, -1) - np.roll(x, -1) * y)) / (6 * a)
        centers[ci] = (cx, cy)
    # --- face matching: edge (v0,v1) shared by two cells = interior face ---
    edge_map: Dict[Tuple[int, int], List[Tuple[int, int]]] = {}
    for ci, poly in enumerate(polygons):
        for k in range(len(poly)):
            v0, v1 = poly[k], poly[(k + 1) % len(poly)]
            edge_map.setdefault((min(v0, v1), max(v0, v1)), []).append((ci, k))
    # --- boundary name lookup ---
    boundary_ids: Dict[str, int] = {}
    edge_boundary: Dict[Tuple[int, int], int] = {}
    boundaries = boundaries or {}
    for b_i, (name, edges) in enumerate(boundaries.items()):
        boundary_ids[name] = b_i
        for v0, v1 in edges:
            edge_boundary[(min(v0, v1), max(v0, v1))] = b_i
    default_bid = None
    max_faces = max(len(p) for p in polygons)
    neighbors = np.full((n_cells, max_faces), -1, np.int32)
    areas = np.zeros((n_cells, max_faces), np.float32)
    f_centers = np.zeros((n_cells, max_faces, d), np.float32)
    normals = np.zeros((n_cells, max_faces, d), np.float32)
    distances = np.ones((n_cells, max_faces), np.float32)
    for edge, users in edge_map.items():
        p0, p1 = points[edge[0]], points[edge[1]]
        length = float(np.linalg.norm(p1 - p0))
        mid = (p0 + p1) / 2
        for (ci, k) in users:
            # outward normal: perpendicular to edge, pointing away from cell center
            t = (p1 - p0) / max(length, 1e-12)
            n = np.array([t[1], -t[0]], np.float32)
            if np.dot(n, mid - centers[ci]) < 0:
                n = -n
            areas[ci, k] = length
            f_centers[ci, k] = mid
            normals[ci, k] = n
            if len(users) == 2:
                other = users[0][0] if users[1][0] == ci else users[1][0]
                neighbors[ci, k] = other
                distances[ci, k] = float(np.linalg.norm(centers[other] - centers[ci]))
            else:
                bid = edge_boundary.get(edge)
                if bid is None:
                    if default_bid is None:
                        default_bid = len(boundary_ids)
                        boundary_ids.setdefault('boundary', default_bid)
                    bid = boundary_ids['boundary']
                neighbors[ci, k] = -(2 + bid)
                distances[ci, k] = 2 * float(np.linalg.norm(mid - centers[ci]))
    cells = cell_dim.with_size(n_cells)
    faces_dim = dual(faces=max_faces)
    vec = channel(vector=labels)
    return Mesh(
        vertices=wrap(points, instance(vertices=points.shape[0]), vec),
        element_lists=polygons,
        boundaries=boundary_ids,
        cell_centers=wrap(centers, cells, vec),
        cell_volumes=wrap(volumes, cells),
        neighbors=wrap(neighbors, cells, faces_dim),
        face_areas_t=wrap(areas, cells, faces_dim),
        face_centers_t=wrap(f_centers, cells, faces_dim, vec),
        face_normals_t=wrap(normals, cells, faces_dim, vec),
        neighbor_distances=wrap(distances, cells, faces_dim),
        element_rank=element_rank if element_rank is not None else d,
    )


# standard volume-element face templates by vertex count (SU2/VTK vertex order;
# reference builds faces per element type in phi/geom/_mesh.py mesh_from_numpy)
_FACES_3D = {
    4: [(0, 2, 1), (0, 1, 3), (1, 2, 3), (0, 3, 2)],                                  # tetrahedron
    5: [(0, 3, 2, 1), (0, 1, 4), (1, 2, 4), (2, 3, 4), (3, 0, 4)],                    # pyramid
    6: [(0, 2, 1), (3, 4, 5), (0, 1, 4, 3), (1, 2, 5, 4), (2, 0, 3, 5)],              # wedge/prism
    8: [(0, 3, 2, 1), (4, 5, 6, 7), (0, 1, 5, 4), (1, 2, 6, 5), (2, 3, 7, 6), (3, 0, 4, 7)],  # hexahedron
}


def _poly_face_geometry(pts: np.ndarray):
    """Area, centroid, and (unnormalized-orientation) unit normal of a planar
    polygon in 3D via fan triangulation around the vertex mean."""
    m = pts.mean(0)
    total_area = 0.0
    centroid = np.zeros(3, np.float64)
    normal = np.zeros(3, np.float64)
    for i in range(len(pts)):
        a, b = pts[i], pts[(i + 1) % len(pts)]
        cr = np.cross(a - m, b - m)
        tri_area = 0.5 * np.linalg.norm(cr)
        total_area += tri_area
        centroid += tri_area * (m + a + b) / 3
        normal += 0.5 * cr
    if total_area > 0:
        centroid /= total_area
    n_norm = np.linalg.norm(normal)
    normal = normal / n_norm if n_norm > 0 else normal
    return total_area, centroid.astype(np.float32), normal.astype(np.float32)


def _mesh_from_numpy_3d(points: np.ndarray, elements, boundaries: Dict[str, list],
                        element_rank, cell_dim, labels) -> Mesh:
    """3D polyhedral mesh from volume elements (tet/pyramid/wedge/hex by vertex
    count). Faces shared by two cells become interior faces; the rest map to
    named boundaries (vertex-set lookup) or 'boundary'. Same padded dense face
    tables as 2D — TPU-friendly fixed-shape gathers."""
    n_cells = len(elements)
    cell_faces = []  # per cell: list of global-vertex face tuples
    for poly in elements:
        assert len(poly) in _FACES_3D, f"unsupported 3D element with {len(poly)} vertices (tet/pyr/wedge/hex)"
        cell_faces.append([tuple(poly[i] for i in tpl) for tpl in _FACES_3D[len(poly)]])
    # --- cell centroids & volumes via outward-oriented tet decomposition ---
    centers = np.zeros((n_cells, 3), np.float32)
    volumes = np.zeros((n_cells,), np.float32)
    for ci, poly in enumerate(elements):
        vm = points[list(poly)].mean(0)
        vol = 0.0
        cent = np.zeros(3, np.float64)
        for face in cell_faces[ci]:
            pts = points[list(face)]
            f_area, f_cent, f_n = _poly_face_geometry(pts)
            if np.dot(f_n, f_cent - vm) < 0:
                pts = pts[::-1]  # flip to outward orientation
            fm = pts.mean(0)
            for i in range(len(pts)):
                a, b = pts[i], pts[(i + 1) % len(pts)]
                tet_v = np.dot(fm - vm, np.cross(a - vm, b - vm)) / 6.0
                vol += tet_v
                cent += tet_v * (vm + fm + a + b) / 4.0
        volumes[ci] = abs(vol)
        centers[ci] = (cent / vol if vol != 0 else vm).astype(np.float32)
    # --- face matching by sorted vertex set ---
    face_map: Dict[tuple, list] = {}
    for ci in range(n_cells):
        for k, face in enumerate(cell_faces[ci]):
            face_map.setdefault(tuple(sorted(face)), []).append((ci, k))
    boundary_ids = {name: i for i, name in enumerate(boundaries)}
    face_boundary = {}
    for name, faces in boundaries.items():
        for f in faces:
            face_boundary[tuple(sorted(int(v) for v in f))] = boundary_ids[name]
    max_faces = max(len(f) for f in cell_faces)
    neighbors = np.full((n_cells, max_faces), -1, np.int32)
    areas = np.zeros((n_cells, max_faces), np.float32)
    f_centers = np.zeros((n_cells, max_faces, 3), np.float32)
    normals = np.zeros((n_cells, max_faces, 3), np.float32)
    distances = np.ones((n_cells, max_faces), np.float32)
    for key, users in face_map.items():
        for ci, k in users:
            area, cent, normal = _poly_face_geometry(points[list(cell_faces[ci][k])])
            if np.dot(normal, cent - centers[ci]) < 0:
                normal = -normal
            areas[ci, k] = area
            f_centers[ci, k] = cent
            normals[ci, k] = normal
            if len(users) == 2:
                other = users[0][0] if users[1][0] == ci else users[1][0]
                neighbors[ci, k] = other
                distances[ci, k] = float(np.linalg.norm(centers[other] - centers[ci]))
            else:
                bid = face_boundary.get(key)
                if bid is None:
                    bid = boundary_ids.setdefault('boundary', len(boundary_ids))
                neighbors[ci, k] = -(2 + bid)
                distances[ci, k] = 2 * float(np.linalg.norm(cent - centers[ci]))
    cells = cell_dim.with_size(n_cells)
    faces_dim = dual(faces=max_faces)
    vec = channel(vector=labels)
    return Mesh(
        vertices=wrap(points, instance(vertices=points.shape[0]), vec),
        element_lists=[tuple(p) for p in elements],
        boundaries=boundary_ids,
        cell_centers=wrap(centers, cells, vec),
        cell_volumes=wrap(volumes, cells),
        neighbors=wrap(neighbors, cells, faces_dim),
        face_areas_t=wrap(areas, cells, faces_dim),
        face_centers_t=wrap(f_centers, cells, faces_dim, vec),
        face_normals_t=wrap(normals, cells, faces_dim, vec),
        neighbor_distances=wrap(distances, cells, faces_dim),
        element_rank=element_rank if element_rank is not None else 3,
    )


def mesh(vertices, elements, boundaries=None, element_rank=None, periodic=None,
         face_format='dense', max_cell_walk=None) -> Mesh:
    """Create a mesh from tensors/arrays (reference: phi/geom/_mesh.py:662)."""
    if isinstance(vertices, Tensor):
        vertices = np.asarray(vertices.native())
    if isinstance(elements, Tensor):
        elements = np.asarray(elements.native())
    polygons = [tuple(int(v) for v in row if v >= 0) for row in np.asarray(elements)]
    return mesh_from_numpy(vertices, polygons, boundaries, element_rank, periodic)


def build_mesh(bounds: Box = None, resolution=None, obstacles=None,
               method='quad', cell_dim=instance('cells'), face_format='dense',
               max_squish=.5, **resolution_) -> Mesh:
    """Build a structured quad mesh covering `bounds`, excluding obstacle cells
    (reference: phi/geom/_mesh.py:834)."""
    from ..math import spatial as spatial_fn
    resolution = resolution or {}
    if isinstance(resolution, Shape):
        resolution = {n: s for n, s in zip(resolution.names, resolution.sizes)}
    resolution = {**resolution, **{k: int(v) for k, v in resolution_.items()}}
    names = list(resolution.keys())
    assert len(names) == 2, "build_mesh currently supports 2D"
    nx, ny = resolution[names[0]], resolution[names[1]]
    if bounds is None:
        bounds = Box(**{names[0]: float(nx), names[1]: float(ny)})
    lo = np.asarray(bounds.lower.native())
    up = np.asarray(bounds.upper.native())
    xs = np.linspace(lo[0], up[0], nx + 1)
    ys = np.linspace(lo[1], up[1], ny + 1)
    # vertex grid
    vid = np.arange((nx + 1) * (ny + 1)).reshape(nx + 1, ny + 1)
    pts = np.stack(np.meshgrid(xs, ys, indexing='ij'), axis=-1).reshape(-1, 2)
    # cell centers for obstacle exclusion
    cx = (xs[:-1] + xs[1:]) / 2
    cy = (ys[:-1] + ys[1:]) / 2
    keep = np.ones((nx, ny), bool)
    if obstacles:
        obstacles_list = obstacles if isinstance(obstacles, (list, tuple)) else [obstacles]
        if isinstance(obstacles, dict):
            obstacles_list = list(obstacles.values())
        centers2 = np.stack(np.meshgrid(cx, cy, indexing='ij'), axis=-1).reshape(-1, 2)
        pts_t = wrap(centers2.astype(np.float32), instance(c=centers2.shape[0]), channel(vector=names))
        for obs in obstacles_list:
            inside = np.asarray(obs.lies_inside(pts_t).native()).reshape(nx, ny)
            keep &= ~inside
    polys = []
    for i in range(nx):
        for j in range(ny):
            if keep[i, j]:
                polys.append((int(vid[i, j]), int(vid[i + 1, j]), int(vid[i + 1, j + 1]), int(vid[i, j + 1])))
    # boundary edges by side
    boundaries = {}
    eps = 1e-6

    def _edges_on(pred):
        edges = []
        for poly in polys:
            for k in range(4):
                v0, v1 = poly[k], poly[(k + 1) % 4]
                if pred(pts[v0]) and pred(pts[v1]):
                    edges.append((v0, v1))
        return edges

    boundaries[names[0] + '-'] = _edges_on(lambda p: abs(p[0] - lo[0]) < eps)
    boundaries[names[0] + '+'] = _edges_on(lambda p: abs(p[0] - up[0]) < eps)
    boundaries[names[1] + '-'] = _edges_on(lambda p: abs(p[1] - lo[1]) < eps)
    boundaries[names[1] + '+'] = _edges_on(lambda p: abs(p[1] - up[1]) < eps)
    if obstacles and isinstance(obstacles, dict):
        # obstacle boundary edges: edges of kept cells adjacent to removed cells get obstacle names
        pass  # named-obstacle boundaries attach via the default 'boundary' group round 1
    return mesh_from_numpy(pts, polys, boundaries, element_rank=2, cell_dim=cell_dim, axes=tuple(names))


# ---------------------------------------------------------------------------
# file loaders (self-contained parsers; the reference shells out to meshio)
# ---------------------------------------------------------------------------

# VTK element types (SU2 uses them): id → number of vertices
_VTK_NVERTS = {3: 2, 5: 3, 9: 4, 10: 4, 12: 8, 13: 6, 14: 5}
_VTK_VOLUME = {10, 12, 13, 14}  # tetra, hexahedron, prism/wedge, pyramid
_VTK_SURFACE_2D = {5, 9}        # triangle, quad — volume elements in 2D, boundary faces in 3D


def load_su2(file_or_mesh: str, cell_dim=instance('cells'), face_format='dense') -> Mesh:
    """Parse an SU2 ASCII mesh (reference analog: phi/geom/_mesh.py:512).
    2D: triangle (VTK 5) / quad (VTK 9) volume elements, line boundary markers.
    3D: tetra (10) / hexahedron (12) / prism (13) / pyramid (14) volume elements,
    triangle/quad boundary markers."""
    with open(file_or_mesh) as f:
        lines = [l.strip() for l in f.readlines()]
    i = 0
    ndime = npoin = nelem = 0
    points = []
    elements = []
    boundaries = {}
    while i < len(lines):
        line = lines[i]
        if line.startswith('NDIME'):
            ndime = int(line.split('=')[1])
        elif line.startswith('NELEM'):
            nelem = int(line.split('=')[1])
            for k in range(nelem):
                i += 1
                parts = lines[i].split()
                vtk = int(parts[0])
                if vtk not in _VTK_NVERTS or (ndime == 2 and vtk not in _VTK_SURFACE_2D) \
                        or (ndime == 3 and vtk not in _VTK_VOLUME):
                    raise NotImplementedError(f"SU2 volume element type {vtk} in {ndime}D")
                nv = _VTK_NVERTS[vtk]
                elements.append(tuple(int(p) for p in parts[1:1 + nv]))
        elif line.startswith('NPOIN'):
            npoin = int(line.split('=')[1])
            for k in range(npoin):
                i += 1
                parts = lines[i].split()
                points.append([float(p) for p in parts[:ndime]] if ndime else [float(parts[0]), float(parts[1])])
        elif line.startswith('NMARK'):
            nmark = int(line.split('=')[1])
            for m in range(nmark):
                i += 1
                tag = lines[i].split('=')[1].strip()
                i += 1
                n_el = int(lines[i].split('=')[1])
                faces = []
                for k in range(n_el):
                    i += 1
                    parts = lines[i].split()
                    vtk = int(parts[0])
                    nv = _VTK_NVERTS.get(vtk)
                    if nv:  # line (2D boundary) or tri/quad (3D boundary)
                        faces.append(tuple(int(p) for p in parts[1:1 + nv]))
                boundaries[tag] = faces
        i += 1
    return mesh_from_numpy(points, elements, boundaries, element_rank=ndime, cell_dim=cell_dim)


def load_gmsh(file: str, boundary_names: Sequence[str] = None, cell_dim=instance('cells'),
              face_format='dense') -> Mesh:
    """Parse a Gmsh 2.2 ASCII .msh file (reference analog: phi/geom/_mesh.py:541)."""
    with open(file) as f:
        lines = [l.strip() for l in f.readlines()]
    raw_points = []
    raw_elements = []  # (etype, phys, verts)
    i = 0
    while i < len(lines):
        if lines[i] == '$Nodes':
            n = int(lines[i + 1])
            for k in range(n):
                parts = lines[i + 2 + k].split()
                raw_points.append([float(parts[1]), float(parts[2]), float(parts[3])])
            i += n + 2
        elif lines[i] == '$Elements':
            n = int(lines[i + 1])
            for k in range(n):
                parts = [int(p) for p in lines[i + 2 + k].split()]
                etype = parts[1]
                ntags = parts[2]
                tags = parts[3:3 + ntags]
                verts = tuple(v - 1 for v in parts[3 + ntags:])
                raw_elements.append((etype, tags[0] if tags else 0, verts))
            i += n + 2
        else:
            i += 1
    # gmsh types: 1=line 2=tri 3=quad 4=tet 5=hex 6=prism 7=pyramid
    is_3d = any(e[0] in (4, 5, 6, 7) for e in raw_elements)
    elements = []
    boundary_groups: Dict[int, list] = {}
    for etype, phys, verts in raw_elements:
        if is_3d:
            if etype in (4, 5, 6, 7):
                elements.append(verts)
            elif etype in (2, 3):  # surface → boundary face
                boundary_groups.setdefault(phys, []).append(verts)
        else:
            if etype in (2, 3):
                elements.append(verts)
            elif etype == 1:  # line → boundary edge
                boundary_groups.setdefault(phys, []).append(verts)
    points = [p[:3] if is_3d else p[:2] for p in raw_points]
    names = {}
    phys_ids = sorted(boundary_groups)
    for idx, phys in enumerate(phys_ids):
        name = boundary_names[idx] if boundary_names and idx < len(boundary_names) else f"boundary{phys}"
        names[name] = boundary_groups[phys]
    return mesh_from_numpy(points, elements, names, element_rank=3 if is_3d else 2, cell_dim=cell_dim)


def load_stl(file: str, face_dim=instance('faces')):
    """Parse an STL file into vertices + triangle faces (reference analog:
    phi/geom/_mesh.py:581). Returns (points, triangles) numpy arrays for
    surface meshes (volumetric FVM on STL surfaces is not defined)."""
    import struct
    with open(file, 'rb') as f:
        header = f.read(80)
        if header[:5] == b'solid':
            f.seek(0)
            text = f.read().decode('ascii', errors='ignore')
            tris = []
            current = []
            for line in text.splitlines():
                line = line.strip()
                if line.startswith('vertex'):
                    current.append([float(x) for x in line.split()[1:4]])
                    if len(current) == 3:
                        tris.append(current)
                        current = []
            tris = np.asarray(tris, np.float32)
        else:
            n, = struct.unpack('<I', f.read(4))
            data = np.frombuffer(f.read(n * 50), dtype=np.uint8).reshape(n, 50)
            tris = data[:, 12:48].copy().view('<f4').reshape(n, 3, 3)
    # deduplicate vertices
    flat = tris.reshape(-1, 3)
    verts, inverse = np.unique(flat.round(6), axis=0, return_inverse=True)
    faces = inverse.reshape(-1, 3)
    return verts.astype(np.float32), faces.astype(np.int32)
