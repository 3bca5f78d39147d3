"""B-spline surface sheets & solids (reference: /root/reference/phi/geom/_spline_sheet.py:17-222,
_spline_solid.py:20-486 — tensor-product NURBS surfaces/volumes over control nets).

TPU note: evaluation is a dense tensor-product contraction (basis outer products
× control nets) — batched matmul-shaped work that XLA maps straight onto the
vector units; no per-point control flow.
"""
from __future__ import annotations

import numpy as np

from ..math import Tensor, wrap, spatial, channel, instance, stack
from ..math import _ops as ops
from ._spline import b_spline_knots, eval_nurbs_bases

__all__ = ['BSplineSheet', 'SplineVolume', 'to_spline_volume', 'double_cover']


def _tensor_eval(control: np.ndarray, params, degrees):
    """Evaluate a tensor-product B-spline at params = (u, v[, w]) ∈ [0,1]^k.
    control: (n1, …, nk, d) numpy control net. Returns Tensor (…, vector)."""
    k = control.ndim - 1
    weights = None
    for axis in range(k):
        n = control.shape[axis]
        knots = b_spline_knots(n, degrees[axis])
        bases = eval_nurbs_bases(params[axis], knots, degrees[axis], n)  # (…, basis=n)
        bn = ops.rename_dims(bases, 'basis', channel(**{f'basis{axis}': n}))
        weights = bn if weights is None else weights * bn
    # contract the joint basis weights with the control net
    labels = tuple('xyz'[:control.shape[-1]])
    comps = {}
    flat = control.reshape(-1, control.shape[-1])
    basis_dims = [f'basis{a}' for a in range(k)]
    for ci, lbl in enumerate(labels):
        coeff = wrap(np.ascontiguousarray(flat[:, ci]).reshape(control.shape[:-1]),
                     channel(**{bd: control.shape[a] for a, bd in enumerate(basis_dims)}))
        comps[lbl] = ops.sum_(weights * coeff, basis_dims)
    return stack(comps, channel(vector=labels))


class BSplineSheet:
    """Tensor-product B-spline surface from a (nu, nv, 3) control net
    (reference: phi/geom/_spline_sheet.py BSplineSheet:17)."""

    def __init__(self, control_points, degrees=(2, 2)):
        self.control = np.asarray(control_points, np.float32)
        assert self.control.ndim == 3, "control_points must be (nu, nv, d)"
        self.degrees = tuple(degrees)

    @property
    def spatial_rank(self) -> int:
        return self.control.shape[-1]

    def eval(self, u, v) -> Tensor:
        """Surface point S(u, v); u, v Tensors or floats in [0, 1]."""
        return _tensor_eval(self.control, (wrap(u), wrap(v)), self.degrees)

    def normal(self, u, v, eps=1e-4) -> Tensor:
        """Unit surface normal via central-difference partials (3D sheets)."""
        su1 = self.eval(wrap(float(u) + eps), v)
        su0 = self.eval(wrap(float(u) - eps), v)
        sv1 = self.eval(u, wrap(float(v) + eps))
        sv0 = self.eval(u, wrap(float(v) - eps))
        du = (su1 - su0).numpy('vector')
        dv = (sv1 - sv0).numpy('vector')
        n = np.cross(du, dv)
        n = n / (np.linalg.norm(n) + 1e-12)
        return wrap(n.astype(np.float32), channel(vector=tuple('xyz'[:3])))

    def sample_grid(self, nu: int, nv: int) -> Tensor:
        """Evaluate on a regular (nu, nv) parameter grid → (u, v, vector) Tensor."""
        us = wrap(np.linspace(0, 1, nu, dtype=np.float32), spatial(u=nu))
        vs = wrap(np.linspace(0, 1, nv, dtype=np.float32), spatial(v=nv))
        return _tensor_eval(self.control, (us, vs), self.degrees)

    def area(self, samples: int = 32) -> float:
        """Approximate surface area by triangulating a parameter-grid sampling."""
        pts = np.asarray(self.sample_grid(samples, samples).numpy(('u', 'v', 'vector')))
        a = pts[1:, :-1] - pts[:-1, :-1]
        b = pts[:-1, 1:] - pts[:-1, :-1]
        c = pts[1:, 1:] - pts[:-1, :-1]
        t1 = 0.5 * np.linalg.norm(np.cross(a, b), axis=-1)
        t2 = 0.5 * np.linalg.norm(np.cross(c - a, c - b), axis=-1)
        return float(t1.sum() + t2.sum())

    def to_mesh(self, nu: int = 16, nv: int = 16):
        """Quad surface mesh (points, faces) for visualization/export."""
        pts = np.asarray(self.sample_grid(nu, nv).numpy(('u', 'v', 'vector'))).reshape(nu * nv, -1)
        faces = []
        for i in range(nu - 1):
            for j in range(nv - 1):
                faces.append((i * nv + j, (i + 1) * nv + j, (i + 1) * nv + j + 1, i * nv + j + 1))
        return pts, np.asarray(faces, np.int32)

    def __repr__(self):
        return f"BSplineSheet(control={self.control.shape[:-1]}, degrees={self.degrees})"


class SplineVolume:
    """Trivariate B-spline volume from a (nu, nv, nw, 3) control net.

    Complements the reference-parity thickened-sheet `SplineSolid`
    (geom/_spline_solid.py): this class parameterizes a solid by a full 3D
    control lattice instead of a sheet + thickness."""

    def __init__(self, control_points, degrees=(2, 2, 2)):
        self.control = np.asarray(control_points, np.float32)
        assert self.control.ndim == 4, "control_points must be (nu, nv, nw, d)"
        self.degrees = tuple(degrees)

    def eval(self, u, v, w) -> Tensor:
        return _tensor_eval(self.control, (wrap(u), wrap(v), wrap(w)), self.degrees)

    def sample_grid(self, nu: int, nv: int, nw: int) -> Tensor:
        us = wrap(np.linspace(0, 1, nu, dtype=np.float32), spatial(u=nu))
        vs = wrap(np.linspace(0, 1, nv, dtype=np.float32), spatial(v=nv))
        ws = wrap(np.linspace(0, 1, nw, dtype=np.float32), spatial(w=nw))
        return _tensor_eval(self.control, (us, vs, ws), self.degrees)

    def volume(self, samples: int = 16) -> float:
        """Approximate volume by summing jacobian determinants on a parameter grid."""
        n = samples
        pts = np.asarray(self.sample_grid(n, n, n).numpy(('u', 'v', 'w', 'vector')))
        du = np.diff(pts, axis=0)[:, :-1, :-1]
        dv = np.diff(pts, axis=1)[:-1, :, :-1]
        dw = np.diff(pts, axis=2)[:-1, :-1, :]
        det = np.einsum('...i,...i->...', du, np.cross(dv, dw))
        return float(np.abs(det).sum())

    def to_sheets(self):
        """The six boundary BSplineSheets of the solid (reference: to_spline:425)."""
        c = self.control
        d = self.degrees
        return [
            BSplineSheet(c[0], (d[1], d[2])), BSplineSheet(c[-1], (d[1], d[2])),
            BSplineSheet(c[:, 0], (d[0], d[2])), BSplineSheet(c[:, -1], (d[0], d[2])),
            BSplineSheet(c[:, :, 0], (d[0], d[1])), BSplineSheet(c[:, :, -1], (d[0], d[1])),
        ]

    def __repr__(self):
        return f"SplineVolume(control={self.control.shape[:-1]}, degrees={self.degrees})"


def to_spline_volume(geo, control_resolution=(4, 4, 4)) -> 'SplineVolume':
    """Fit a SplineVolume to a primitive geometry (reference behavior:
    phi/geom/_spline_solid.py to_spline:425 converts Cylinder/Box/Sphere into
    spline-solid representations; this TPU-side variant builds a trivariate
    control net whose evaluation reproduces the primitive's volume).

    Supported: Box (exact trilinear net), Sphere and Cylinder (control net on
    spherical/cylindrical shells, accurate to the control resolution)."""
    from ._box import BaseBox
    from ._sphere import Sphere
    from ._cylinder import Cylinder
    nu, nv, nw = control_resolution
    if isinstance(geo, BaseBox):
        lower = np.asarray(geo.lower.native()).reshape(-1)
        upper = np.asarray(geo.upper.native()).reshape(-1)
        assert len(lower) == 3, "to_spline requires 3D geometry"
        us = np.linspace(0, 1, nu)
        vs = np.linspace(0, 1, nv)
        ws = np.linspace(0, 1, nw)
        U, V, W = np.meshgrid(us, vs, ws, indexing='ij')
        pts = lower + np.stack([U, V, W], -1) * (upper - lower)
        return SplineVolume(pts.astype(np.float32), degrees=(1, 1, 1))
    if isinstance(geo, Sphere):
        center = np.asarray(geo.center.native()).reshape(-1)
        radius = float(geo.radius)
        assert len(center) == 3, "to_spline requires 3D geometry"
        # (radial, polar, azimuthal) parameterization
        r = np.linspace(0, 1, nu)[:, None, None]
        theta = np.linspace(1e-3, np.pi - 1e-3, nv)[None, :, None]
        phi = np.linspace(0, 2 * np.pi, nw)[None, None, :]
        x = r * radius * np.sin(theta) * np.cos(phi)
        y = r * radius * np.sin(theta) * np.sin(phi)
        z = r * radius * np.cos(theta) * np.ones_like(phi)
        pts = center + np.stack(np.broadcast_arrays(x, y, z), -1)
        return SplineVolume(pts.astype(np.float32), degrees=(1, 2, 2))
    if isinstance(geo, Cylinder):
        center = np.asarray(geo.center.native()).reshape(-1)
        radius = float(geo.radius)
        depth = float(geo.depth)
        r = np.linspace(0, 1, nu)[:, None, None]
        phi = np.linspace(0, 2 * np.pi, nv)[None, :, None]
        z = np.linspace(-depth / 2, depth / 2, nw)[None, None, :]
        x = r * radius * np.cos(phi) * np.ones_like(z)
        y = r * radius * np.sin(phi) * np.ones_like(z)
        zz = np.ones_like(x) * z
        pts = center + np.stack(np.broadcast_arrays(x, y, zz), -1)
        return SplineVolume(pts.astype(np.float32), degrees=(1, 2, 1))
    raise NotImplementedError(f"to_spline for {type(geo)}")


def double_cover(sheet: 'BSplineSheet') -> 'BSplineSheet':
    """Closed double-cover of an open sheet: traverse the surface forward then
    backward along u (reference: phi/geom/_double_cover.py) so downstream
    algorithms can treat the sheet as a watertight (degenerate) closed surface."""
    c = sheet.control
    doubled = np.concatenate([c, c[::-1]], axis=0)
    return BSplineSheet(doubled, sheet.degrees)
