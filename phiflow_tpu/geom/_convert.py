"""Geometry conversions (reference: /root/reference/phi/geom/_convert.py:15-151)."""
from __future__ import annotations

import numpy as np

from ..math import Tensor, Shape, spatial, instance, wrap
from ..math import _ops as ops
from ._geom import Geometry
from ._box import Box, BaseBox
from ._sdf import SDF
from ._sdf_grid import SDFGrid, sample_sdf

__all__ = ['as_sdf', 'surface_mesh', 'marching_tetrahedra']


def as_sdf(geo: Geometry, bounds=None, rel_margin=None, abs_margin=0., separate=None, method='auto') -> SDF:
    """Represent a geometry as a signed distance function (reference: _convert.py:15)."""
    if isinstance(geo, (SDF, SDFGrid)):
        return geo
    if bounds is None:
        bounds = geo.bounding_box()
        margin = rel_margin if rel_margin is not None else 0.1
        half = bounds.half_size * (1 + 2 * margin) + abs_margin
        bounds = Box(bounds.center - half, bounds.center + half)
    return SDF(geo.approximate_signed_distance, bounds, geo.center,
               volume=None, bounding_radius=geo.bounding_radius())


def surface_mesh(geo: Geometry, rel_dx: float = None, abs_dx: float = None, method='auto'):
    """Extract the zero-level surface of a geometry's sampled SDF
    (reference: _convert.py:84, which shells out to an external marching-cubes
    library; here 3D meshing is self-contained `marching_tetrahedra`).

    2D: returns a list of contour polylines (each an (n, 2) array).
    3D: returns (vertices (n, 3) float32 world coordinates,
    triangles (m, 3) int32) — the same contract as `load_stl`."""
    bb = geo.bounding_box()
    half = bb.half_size * 1.2 + 1e-6  # margin so the zero level is strictly interior
    bounds = Box(bb.center - half, bb.center + half)
    d = geo.spatial_rank
    dx = abs_dx if abs_dx is not None else float(ops.min_(bounds.size)) * (rel_dx or 0.02)
    names = bounds.shape.get_labels('vector')
    sizes = {n: max(4, int(float(bounds.size.vector[n]) / dx)) for n in names}
    grid_sdf = sample_sdf(geo, bounds, **sizes)
    values = np.asarray(grid_sdf.values.numpy(tuple(sizes.keys())))
    lower = np.asarray(bounds.lower.native()).astype(np.float64)
    size = np.asarray(bounds.size.native()).astype(np.float64)
    res = np.array([sizes[n] for n in names], np.int64)
    dx_vec = size / res
    origin = lower + 0.5 * dx_vec  # SDF samples live at cell centers
    if d == 2:
        # marching squares via matplotlib contour (world coordinates)
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        cs = ax.contour(values.T, levels=[0.0])
        paths = []
        for collection_path in cs.get_paths() if hasattr(cs, 'get_paths') else []:
            v = collection_path.vertices  # (x_index, y_index) because of .T
            paths.append(origin + v * dx_vec)
        plt.close(fig)
        return paths
    assert d == 3, f"surface_mesh requires a 2D or 3D geometry, got rank {d}"
    return marching_tetrahedra(values, origin, dx_vec)


# 6-tetrahedra decomposition of a cube around the main diagonal c0-c7;
# corner bit order: bit0→+x, bit1→+y, bit2→+z.
_CUBE_TETS = np.array([
    (0, 5, 1, 7), (0, 1, 3, 7), (0, 3, 2, 7),
    (0, 2, 6, 7), (0, 6, 4, 7), (0, 4, 5, 7),
], np.int64)


def marching_tetrahedra(values: np.ndarray, origin, dx):
    """Triangulate the zero level set of a scalar lattice `values[nx, ny, nz]`.

    Marching *tetrahedra*: each lattice cube splits into 6 tets sharing the
    main diagonal, and each tet's sign configuration yields 0, 1 or 2
    triangles — no 256-case tables, no ambiguous configurations, inherently
    watertight (the reference reaches the same result through scikit-image's
    marching cubes, _convert.py:84). Fully vectorized: one pass classifies all
    n·6 tets, one `np.unique` over crossed lattice edges dedupes vertices.

    Returns (vertices (n, 3) float32 at `origin + index·dx`, triangles (m, 3)
    int32)."""
    values = np.asarray(values, np.float64)
    nx, ny, nz = values.shape
    origin = np.asarray(origin, np.float64)
    dx = np.broadcast_to(np.asarray(dx, np.float64), (3,))
    if min(nx, ny, nz) < 2:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    # global ids of the 8 corners of every cube
    gx, gy, gz = np.meshgrid(np.arange(nx - 1), np.arange(ny - 1), np.arange(nz - 1), indexing='ij')
    base = (gx * ny + gy) * nz + gz  # (X,Y,Z) flat id of corner (i,j,k)
    base = base.ravel()
    off = np.array([((b & 1) * ny + ((b >> 1) & 1)) * nz + ((b >> 2) & 1) for b in range(8)], np.int64)
    corners = base[:, None] + off[None, :]                     # (C, 8)
    tets = corners[:, _CUBE_TETS.reshape(-1)].reshape(-1, 4)   # (C*6, 4) global corner ids
    flat_vals = values.ravel()
    tv = flat_vals[tets]                                       # (M, 4)
    inside = tv < 0
    case = inside @ (1 << np.arange(4))
    mixed = (case > 0) & (case < 15)
    tets, tv, case, inside = tets[mixed], tv[mixed], case[mixed], inside[mixed]

    tri_edges = []  # list of (K, 3, 2) arrays: per triangle, 3 edges as global (lo, hi) corner pairs

    def _edges(sel_tets, apex, others):
        """Crossing edges from local corner `apex` to each of `others` → (K, len(others), 2)."""
        a = sel_tets[:, apex]
        return np.stack([np.stack([np.minimum(a, sel_tets[:, o]), np.maximum(a, sel_tets[:, o])], -1)
                         for o in others], axis=1)

    for c in range(1, 15):
        sel = case == c
        if not sel.any():
            continue
        st = tets[sel]
        in_v = [i for i in range(4) if (c >> i) & 1]
        out_v = [i for i in range(4) if not (c >> i) & 1]
        if len(in_v) == 1:
            tri_edges.append(_edges(st, in_v[0], out_v))
        elif len(in_v) == 3:
            tri_edges.append(_edges(st, out_v[0], in_v))
        else:  # 2 in, 2 out → quad on 4 crossing edges → 2 triangles
            a, b = in_v
            p, q = out_v
            e_ap = _edges(st, a, [p])[:, 0]
            e_aq = _edges(st, a, [q])[:, 0]
            e_bp = _edges(st, b, [p])[:, 0]
            e_bq = _edges(st, b, [q])[:, 0]
            tri_edges.append(np.stack([e_ap, e_aq, e_bq], 1))
            tri_edges.append(np.stack([e_ap, e_bq, e_bp], 1))
    if not tri_edges:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    all_edges = np.concatenate([t.reshape(-1, 2) for t in tri_edges], 0)   # (T*3, 2)
    keys = all_edges[:, 0] * (nx * ny * nz) + all_edges[:, 1]
    uniq_keys, inv = np.unique(keys, return_inverse=True)
    faces = inv.reshape(-1, 3).astype(np.int32)
    ea = (uniq_keys // (nx * ny * nz)).astype(np.int64)
    eb = (uniq_keys % (nx * ny * nz)).astype(np.int64)
    va, vb = flat_vals[ea], flat_vals[eb]
    t = va / (va - vb)  # zero crossing, va<0<=vb or vice versa → t in (0, 1]
    pa = np.stack(np.unravel_index(ea, (nx, ny, nz)), -1).astype(np.float64)
    pb = np.stack(np.unravel_index(eb, (nx, ny, nz)), -1).astype(np.float64)
    pts = pa + t[:, None] * (pb - pa)
    verts = (origin + pts * dx).astype(np.float32)
    degenerate = (faces[:, 0] == faces[:, 1]) | (faces[:, 1] == faces[:, 2]) | (faces[:, 0] == faces[:, 2])
    return verts, faces[~degenerate]
