"""Graph geometry: nodes + edge connectivity (reference: /root/reference/phi/geom/_graph.py:15-165).

TPU-native design: edges are stored as a dense (instance × dual) tensor with
zeros for non-neighbors — dense masked neighborhoods vectorize on the VPU and
avoid sparse gather/scatter, which is the right trade-off for the moderate
particle counts per core used by SPH. (Cell-list bucketing for large N lives in
phiflow_tpu.ops.)
"""
from __future__ import annotations

from typing import Dict

import jax

from ..math import Tensor, Shape, wrap, instance, dual
from ..math import _ops as ops
from ._geom import Geometry

__all__ = ['Graph', 'graph']


class Graph(Geometry):
    """Nodes (a Geometry collection) plus per-pair edge values."""

    def __init__(self, nodes: Geometry, edges: Tensor, boundary: Dict[str, Dict[str, slice]] = None,
                 deltas: Tensor = None, distances: Tensor = None, bounding_distance=None,
                 indices: Tensor = None):
        self._nodes = nodes
        self._edges = edges
        self._boundary = boundary or {}
        self._deltas = deltas
        self._distances = distances
        self._bounding_distance = wrap(bounding_distance) if bounding_distance is not None else None
        # compact (cell-list) neighborhoods: per-node candidate ids along the
        # dual dim; None for dense all-pairs graphs
        self._indices = indices

    @property
    def nodes(self) -> Geometry:
        return self._nodes

    @property
    def edges(self) -> Tensor:
        return self._edges

    @property
    def indices(self) -> Tensor:
        return self._indices

    @property
    def is_compact(self) -> bool:
        return self._indices is not None

    @property
    def deltas(self) -> Tensor:
        return self._deltas

    @property
    def unit_deltas(self) -> Tensor:
        return ops.safe_div(self._deltas, self._distances)

    @property
    def distances(self) -> Tensor:
        return self._distances

    @property
    def bounding_distance(self):
        return self._bounding_distance

    @property
    def connectivity(self) -> Tensor:
        return ops.to_float(self._edges != 0) if self._edges is not None else None

    @property
    def boundary(self) -> Dict[str, Dict[str, slice]]:
        return self._boundary

    @property
    def center(self) -> Tensor:
        return self._nodes.center

    @property
    def shape(self) -> Shape:
        return self._nodes.shape

    @property
    def volume(self) -> Tensor:
        return self._nodes.volume

    @property
    def boundary_elements(self):
        return self._boundary

    def lies_inside(self, location):
        return self._nodes.lies_inside(location)

    def approximate_signed_distance(self, location):
        return self._nodes.approximate_signed_distance(location)

    def bounding_radius(self):
        return self._nodes.bounding_radius()

    def bounding_half_extent(self):
        return self._nodes.bounding_half_extent()

    def at(self, center):
        raise AssertionError("Changing the node positions of a Graph invalidates the edges; "
                             "create a new Graph instead (reference: _graph.py Graph.at)")

    def shifted(self, delta):
        return self.at(self.center + delta)

    def __getitem__(self, item):
        from ..math._magic import slicing_dict
        item = slicing_dict(self, item)
        return Graph(self._nodes[item] if item else self._nodes,
                     self._edges[{k: v for k, v in item.items() if k in self._edges.shape}] if self._edges is not None else None,
                     self._boundary,
                     self._deltas[{k: v for k, v in item.items() if k in self._deltas.shape}] if self._deltas is not None else None,
                     self._distances[{k: v for k, v in item.items() if k in self._distances.shape}] if self._distances is not None else None,
                     self._bounding_distance)

    def __repr__(self):
        return f"Graph[{self._nodes}]"


def _graph_flatten(g: Graph):
    return (g._nodes, g._edges, g._deltas, g._distances, g._bounding_distance), tuple(sorted(g._boundary.items()))


def _graph_unflatten(aux, ch):
    return Graph(ch[0], ch[1], dict(aux), ch[2], ch[3], ch[4])


jax.tree_util.register_pytree_node(Graph, _graph_flatten, _graph_unflatten)


def graph(nodes, edges: Tensor, boundary=None, build_distances=True, build_bounding_distance=False) -> Graph:
    """Create a Graph from nodes and edge values (reference: phi/geom/_graph.py:145)."""
    from ._geom import Point
    if isinstance(nodes, Tensor):
        nodes = Point(nodes)
    deltas = None
    distances = None
    if build_distances:
        from ..math import rename_dims
        inst = nodes.shape.instance
        others = rename_dims(nodes.center, inst, inst.as_dual())
        deltas = others - nodes.center
        distances = ops.vec_length(deltas)
    bounding = ops.max_(distances) if build_bounding_distance and distances is not None else None
    return Graph(nodes, edges, boundary or {}, deltas, distances, bounding)
