"""Reblocking kernels K11-K20: terminal insertion, existing-road
reweighting, Kou-style Steiner approximation, through-streets, widths.

From-scratch networkx implementation of the semantics of
`/root/reference/prclz/reblock/_reblock_graph.py` (igraph there):

* graph construction w/ coord-tuple nodes    — :212-253
* add_node_to_closest_edge                   — :504-556 (projection math
  :95-181: project onto the infinite line; accept iff the projection's
  distance to the edge midpoint ≤ half edge length, else snap to the
  nearer endpoint)
* split_edge_by_node                         — :337-369
* metric closure (K11)                       — :326-335
* Steiner approx = closure → MST → expand    — :665-710 (Kou et al.;
  the reference's igraph MST vs our networkx MST can pick different
  equal-weight trees — the reference's own tests enumerate acceptable
  ties, tests/test_reblock.py:188-190, and ours do the same)
* update_edge_types / highway weight 0 (K13) — :589-662
* set_edge_width + chain-min simplify (K14)  — :1037-1095
* calc_edge_weight                           — :1097-1139
* add_through_lines (K17)                    — :712-774
* get_steiner_linestrings (K20)              — :810-909 (split by
  weight==0 into existing vs new)
* largest-component cleanup (K15)            — :568-587

Runs per block inside applyInPandas groups; never at DataFrame level.
"""

from __future__ import annotations

import math
from itertools import combinations

import networkx as nx
import numpy as np


def _dist(a, b) -> float:
    return math.hypot(a[0] - b[0], a[1] - b[1])


class StreetGraph:
    """Per-block weighted planar street/parcel graph (value object)."""

    def __init__(self):
        self.g = nx.Graph()

    # --- construction ------------------------------------------------------

    # Coordinates are rounded to 9 decimals (~0.1 mm in degrees) on graph
    # entry: vertices shared between independently-clipped parcel rings can
    # differ in the last float bits, which would fragment the graph (the
    # igraph reference gets exact sharing because pytess emits each vertex
    # once). 9 decimals preserves every golden-test coordinate exactly.
    ROUND = 9

    @classmethod
    def from_lines(cls, lines) -> "StreetGraph":
        sg = cls()
        r = cls.ROUND
        for arr in lines:
            pts = [(round(float(x), r), round(float(y), r)) for x, y in np.asarray(arr).reshape(-1, 2)]
            for a, b in zip(pts[:-1], pts[1:]):
                sg.add_edge(a, b)
        return sg

    @classmethod
    def from_polygons(cls, rings, parcel_ids=None) -> "StreetGraph":
        sg = cls()
        r = cls.ROUND
        for pi, ring in enumerate(rings):
            pts = [(round(float(x), r), round(float(y), r)) for x, y in np.asarray(ring).reshape(-1, 2)]
            pid = parcel_ids[pi] if parcel_ids is not None else pi
            for a, b in zip(pts[:-1], pts[1:]):
                sg.add_edge(a, b, parcel_id=pid)
        return sg

    def add_edge(self, a, b, parcel_id=None, **attrs):
        if a == b:
            return
        g = self.g
        for n in (a, b):
            if n not in g:
                g.add_node(n, terminal=False)
        if not g.has_edge(a, b):
            d = _dist(a, b)
            g.add_edge(
                a,
                b,
                weight=attrs.pop("weight", d),
                eucl_dist=d,
                steiner=False,
                edge_type=None,
                width=None,
                is_through_line=False,
                parcel_ids=set(),
            )
        if parcel_id is not None:
            g.edges[a, b]["parcel_ids"].add(parcel_id)

    # --- terminal insertion (J10/J11) ---------------------------------------

    @staticmethod
    def _closest_point_on_edge(a, b, p):
        """Reference projection semantics (:371-398): accept the infinite-
        line projection iff it lies within the edge's midpoint-radius,
        else the nearer endpoint."""
        ax, ay = a
        bx, by = b
        px, py = p
        vx, vy = bx - ax, by - ay
        l2 = vx * vx + vy * vy
        if l2 == 0:
            return a
        t = ((px - ax) * vx + (py - ay) * vy) / l2
        proj = (ax + t * vx, ay + t * vy)
        mid = ((ax + bx) / 2.0, (ay + by) / 2.0)
        if _dist(proj, mid) <= _dist(a, mid):
            return proj
        return a if _dist(a, p) <= _dist(b, p) else b

    def add_node_to_closest_edge(self, coords, terminal: bool = False):
        coords = (float(coords[0]), float(coords[1]))
        best = None
        for a, b in self.g.edges():
            cp = self._closest_point_on_edge(a, b, coords)
            d = _dist(cp, coords)
            if best is None or d < best[0]:
                best = (d, a, b, cp)
        assert best is not None, "empty graph"
        _, a, b, cp = best
        self.split_edge_by_node((a, b), cp, terminal=terminal)

    def split_edge_by_node(self, edge, coords, terminal: bool = False):
        a, b = edge
        coords = (float(coords[0]), float(coords[1]))
        if coords == a or coords == b:
            self.g.nodes[coords]["terminal"] = terminal
            return
        self.g.remove_edge(a, b)
        self.add_edge(a, coords)
        self.add_edge(coords, b)
        self.g.nodes[coords]["terminal"] = terminal

    # --- metric closure + Steiner (K11/K12) ---------------------------------

    def terminals(self):
        return [n for n, t in self.g.nodes(data="terminal") if t]

    def metric_closure(self, terminals):
        """Complete graph over terminals; each edge stores the shortest-path
        distance and the underlying edge list (:326-335)."""
        h = nx.Graph()
        for u, v in combinations(terminals, 2):
            length, nodes = nx.single_source_dijkstra(self.g, u, v, weight="weight")
            path_edges = list(zip(nodes[:-1], nodes[1:]))
            h.add_edge(u, v, weight=length, path=path_edges)
        return h

    def steiner_tree_approx(self):
        terms = self.terminals()
        h = self.metric_closure(terms)
        mst = nx.minimum_spanning_edges(h, weight="weight", data=True)
        for u, v, data in mst:
            for a, b in data["path"]:
                self.g.edges[a, b]["steiner"] = True
        return h

    # --- existing-road reweighting (K13) ------------------------------------

    def update_edge_types(self, block_ring, check: bool = False):
        """Consecutive block-boundary coords define existing road spans:
        their shortest paths get edge_type='highway' and weight 0
        (:589-662). Returns (missing, total) vertex-match QC counts."""
        pts = [(float(x), float(y)) for x, y in np.asarray(block_ring).reshape(-1, 2)]
        missing = total = None
        if check:
            node_set = set(self.g.nodes())
            uniq = set(pts)
            total = len(uniq)
            missing = sum(1 for c in uniq if c not in node_set)
        for n0, n1 in zip(pts[1:], pts[:-1]):
            if n0 in self.g and n1 in self.g:
                try:
                    nodes = nx.dijkstra_path(self.g, n0, n1, weight="weight")
                except nx.NetworkXNoPath:
                    continue
                for a, b in zip(nodes[:-1], nodes[1:]):
                    self.g.edges[a, b]["edge_type"] = "highway"
        for a, b, d in self.g.edges(data=True):
            if d["edge_type"] == "highway":
                d["weight"] = 0.0
        return missing, total

    # --- width + cost (K14) --------------------------------------------------

    def set_edge_width(self, polygons, simplify: bool = True):
        """width = min distance from the edge segment to any polygon
        (:1069-1095). `polygons` are Geom objects from prclz_spark.geom."""
        from .. import geom as G

        for a, b, d in self.g.edges(data=True):
            seg = G.linestring([a, b])
            d["width"] = min(G.distance(seg, p) for p in polygons)
        if simplify:
            self._simplify_edge_width()

    def _search_chain(self, v):
        """All vertices of the maximal degree-2 chain through v (:1007-1035)."""
        seen = {v}
        frontier = [n for n in self.g.neighbors(v)]
        chain = {v}
        while frontier:
            n = frontier.pop()
            if n in seen:
                continue
            seen.add(n)
            chain.add(n)
            if self.g.degree(n) == 2:
                frontier.extend(x for x in self.g.neighbors(n) if x not in seen)
        return chain

    def _simplify_edge_width(self):
        for v in list(self.g.nodes()):
            if self.g.degree(v) == 2:
                chain = self._search_chain(v)
                edges = [
                    (a, b)
                    for a, b in self.g.edges(chain)
                    if a in chain and b in chain
                ]
                if not edges:
                    continue
                widths = [self.g.edges[e]["width"] for e in edges]
                if any(w is None for w in widths):
                    continue
                mw = min(widths)
                for e in edges:
                    self.g.edges[e]["width"] = mw

    def calc_edge_weight(self, cost_fn=None, use_edge_type: bool = True):
        """Default cost: (eucl/width) × (edge_type != 'highway') (:1097-1139)."""
        had_width = any(d["width"] is not None for _, _, d in self.g.edges(data=True))
        for a, b, d in self.g.edges(data=True):
            w = d["width"] if (had_width and d["width"] is not None) else 1.0
            if cost_fn is not None:
                d["weight"] = cost_fn(d)
            else:
                # width 0 = the edge touches a building: effectively
                # impassable (the reference would divide by zero here;
                # its momepy parcels keep edges off buildings by
                # construction, ours may not for cell-complex parcels)
                base = d["eucl_dist"] / max(w, 1e-12)
                if use_edge_type and d["edge_type"] == "highway":
                    base = 0.0
                d["weight"] = base

    # --- through streets (K17) ------------------------------------------------

    def add_through_lines(self, top_k=None, ratio_cutoff=None, cost_fn=None):
        """Connect Steiner trees whose pairwise detour ratio (opt-subgraph
        SP / original SP under eucl/width cost) exceeds the cutoff
        (:712-774)."""
        orig_weights = {(a, b): d["weight"] for a, b, d in self.g.edges(data=True)}
        if cost_fn is None:
            # same zero-width guard as calc_edge_weight: an edge touching a
            # building has width 0 (effectively impassable, not ÷0)
            cost_fn = lambda d: d["eucl_dist"] / max(
                d["width"] if d["width"] is not None else 1.0, 1e-12
            )
        for a, b, d in self.g.edges(data=True):
            d["weight"] = cost_fn(d)

        terms = self.terminals()
        orig_mc = self.metric_closure(terms)
        steiner_edges = [(a, b) for a, b, d in self.g.edges(data=True) if d["steiner"]]
        opt = StreetGraph()
        opt.g = self.g.edge_subgraph(steiner_edges).copy()
        opt_mc = opt.metric_closure(opt.terminals())

        ratios = []
        for u, v in combinations(terms, 2):
            if not opt_mc.has_edge(u, v):
                continue
            r = opt_mc.edges[u, v]["weight"] / orig_mc.edges[u, v]["weight"]
            ratios.append((r, u, v))

        chosen = []
        if top_k is not None:
            chosen = sorted(ratios, key=lambda t: -t[0])[: int(top_k)]
        elif ratio_cutoff is not None:
            chosen = [t for t in ratios if t[0] > ratio_cutoff]
        for _, u, v in chosen:
            for a, b in orig_mc.edges[u, v]["path"]:
                self.g.edges[a, b]["is_through_line"] = True

        for (a, b), w in orig_weights.items():
            self.g.edges[a, b]["weight"] = w

    # --- cleanup + extraction (K15/K20) ----------------------------------------

    def largest_component(self):
        if nx.is_connected(self.g):
            return 1, self
        comps = list(nx.connected_components(self.g))
        big = max(comps, key=len)
        out = StreetGraph()
        out.g = self.g.subgraph(big).copy()
        return len(comps), out

    def contract_degree2_chains(self):
        """K16 (:923-1035): merge A—B—C through non-terminal degree-2 nodes
        into A—C, summing weight/eucl_dist and recording the collapsed
        coordinate path (so edges can be re-expanded for output)."""
        changed = True
        while changed:
            changed = False
            for v in list(self.g.nodes()):
                if self.g.degree(v) != 2 or self.g.nodes[v].get("terminal"):
                    continue
                n0, n1 = list(self.g.neighbors(v))
                if n0 == n1 or self.g.has_edge(n0, n1):
                    continue
                d0 = self.g.edges[n0, v]
                d1 = self.g.edges[v, n1]
                path = (
                    d0.get("path", [n0, v])[:-1]
                    + [v]
                    + d1.get("path", [v, n1])[1:]
                )
                # orient stored paths consistently n0 → v → n1
                p0 = d0.get("path", [n0, v])
                if p0[0] != n0:
                    p0 = p0[::-1]
                p1 = d1.get("path", [v, n1])
                if p1[0] != v:
                    p1 = p1[::-1]
                path = p0 + p1[1:]
                attrs = {
                    "weight": d0["weight"] + d1["weight"],
                    "eucl_dist": d0["eucl_dist"] + d1["eucl_dist"],
                    "steiner": d0["steiner"] and d1["steiner"],
                    "edge_type": d0["edge_type"] if d0["edge_type"] == d1["edge_type"] else None,
                    "width": min(
                        [w for w in (d0["width"], d1["width"]) if w is not None],
                        default=None,
                    ),
                    "is_through_line": d0["is_through_line"] and d1["is_through_line"],
                    "parcel_ids": d0["parcel_ids"] | d1["parcel_ids"],
                    "path": path,
                }
                self.g.remove_node(v)
                self.g.add_edge(n0, n1, **attrs)
                changed = True

    def expand_edge(self, a, b):
        """Edge → coordinate sequence, unpacking any contracted path
        (edge_to_coords(expand=True), :425-453)."""
        d = self.g.edges[a, b]
        path = d.get("path")
        if not path:
            return [a, b]
        return path if path[0] == a else path[::-1]

    def steiner_segments(self):
        """(new_segments, existing_segments) as coordinate pairs; an optimal
        edge is existing iff its weight is 0 (:838-850)."""
        new, existing = [], []
        for a, b, d in self.g.edges(data=True):
            if d["steiner"] or d["is_through_line"]:
                (existing if d["weight"] == 0 else new).append((a, b))
        return new, existing

    def terminal_points(self):
        return sorted(self.terminals())

    @staticmethod
    def simplify_linestring(points, corridor) -> list:
        """K18 (:41-74): start from the endpoints-only chord and add the
        point farthest from the current line until the line stays inside
        the admissible `corridor` polygon (prclz_spark.geom Geom). This is
        the reference's corridor-constrained Douglas-Peucker-style loop."""
        from .. import geom as G

        pts = np.asarray(points, dtype=np.float64).reshape(-1, 2)
        if len(pts) <= 2:
            return [tuple(p) for p in pts]
        idxs = [0, len(pts) - 1]

        def inside(line_idxs):
            seg_pts = pts[line_idxs]
            for i in range(len(seg_pts) - 1):
                a, b = seg_pts[i], seg_pts[i + 1]
                for t in np.linspace(0, 1, 12):
                    p = a + t * (b - a)
                    if not G.contains_point(corridor, p[0], p[1]):
                        return False
            return True

        while not inside(idxs) and len(idxs) < len(pts):
            line = G.linestring(pts[idxs])
            remaining = [i for i in range(len(pts)) if i not in idxs]
            far = max(remaining, key=lambda i: G.distance(G.point(*pts[i]), line))
            idxs.append(far)
            idxs.sort()
        return [tuple(pts[i]) for i in idxs]

    def stats(self):
        return {
            "node_count": self.g.number_of_nodes(),
            "edge_count": self.g.number_of_edges(),
        }

    # --- persistence (S10) ---------------------------------------------------
    # The reference pickles igraph objects between stages
    # (`prclz/topology.py:259-267,395-401`); the distributed equivalent is a
    # columnar edge list that round-trips through Parquet, so a graph can
    # cross a stage/job boundary as ordinary rows.

    EDGE_SCHEMA = (
        "ax double, ay double, bx double, by double, weight double, "
        "eucl_dist double, steiner boolean, edge_type string, width double, "
        "is_through_line boolean, term_a boolean, term_b boolean"
    )

    def to_edge_rows(self) -> list:
        rows = []
        for a, b, d in self.g.edges(data=True):
            rows.append(
                (
                    float(a[0]), float(a[1]), float(b[0]), float(b[1]),
                    float(d["weight"]), float(d["eucl_dist"]), bool(d["steiner"]),
                    d["edge_type"],
                    None if d["width"] is None else float(d["width"]),
                    bool(d["is_through_line"]),
                    bool(self.g.nodes[a].get("terminal", False)),
                    bool(self.g.nodes[b].get("terminal", False)),
                )
            )
        return rows

    @classmethod
    def from_edge_rows(cls, rows) -> "StreetGraph":
        sg = cls()
        for ax, ay, bx, by, weight, eucl, steiner, etype, width, thru, ta, tb in rows:
            a, b = (ax, ay), (bx, by)
            sg.add_edge(a, b, weight=weight)
            d = sg.g.edges[a, b]
            d["eucl_dist"] = eucl
            d["steiner"] = bool(steiner)
            d["edge_type"] = etype
            d["width"] = width
            d["is_through_line"] = bool(thru)
            if ta:
                sg.g.nodes[a]["terminal"] = True
            if tb:
                sg.g.nodes[b]["terminal"] = True
        return sg
