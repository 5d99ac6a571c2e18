"""Topology-preserving simplify: shared boundaries stay shared.

Re-expresses /root/reference/pygeoops/_simplify_topo.py:21-162 without the
topojson dependency: build a shared-arc topology over ALL input geometries
(junction detection à la topojson's join/cut — a vertex is a junction when it
is observed with more than one (prev, next) neighborhood), cut rings/lines
into arcs, deduplicate shared arcs, simplify every arc ONCE, then stitch
geometries back together, make_valid, and filter to the input primitive type.

Because a shared boundary between two polygons is one arc simplified once,
neighbors keep identical common borders — the whole point of the operator.
"""

from __future__ import annotations

import numpy as np

from pygeoops_ray.geo import geom as g
from pygeoops_ray.geo import validity
from pygeoops_ray.geo.general import _collection_extract_one, _is_arraylike, collect
from pygeoops_ray.geo.simplify import simplify as _plain_simplify
from pygeoops_ray.geo.simplify import simplify_coords

__all__ = ["simplify_topo"]


def _key(pt) -> tuple[float, float]:
    return (float(pt[0]), float(pt[1]))


class _Topology:
    def __init__(self):
        self.arcs: list[np.ndarray] = []
        self._arc_index: dict[tuple, int] = {}

    def add_ring(self, coords: np.ndarray, junctions: set) -> list[tuple[int, bool]]:
        """Cut a closed ring (first==last) at junctions → [(arc_id, forward)]."""
        pts = coords[:, :2]
        n = len(pts) - 1
        cut_idx = [i for i in range(n) if _key(pts[i]) in junctions]
        if not cut_idx:
            # ring is one closed arc
            return [self._add_arc(pts)]
        # rotate so the ring starts at the first junction
        rot = np.concatenate([pts[cut_idx[0] : n], pts[: cut_idx[0] + 1]], axis=0)
        # find junction positions in rotated ring
        arcs = []
        start = 0
        for i in range(1, len(rot)):
            if _key(rot[i]) in junctions or i == len(rot) - 1:
                arcs.append(self._add_arc(rot[start : i + 1]))
                start = i
        return arcs

    def add_line(self, coords: np.ndarray, junctions: set) -> list[tuple[int, bool]]:
        pts = coords[:, :2]
        arcs = []
        start = 0
        for i in range(1, len(pts)):
            if (i == len(pts) - 1) or _key(pts[i]) in junctions:
                arcs.append(self._add_arc(pts[start : i + 1]))
                start = i
        return arcs

    def _add_arc(self, pts: np.ndarray) -> tuple[int, bool]:
        fwd = tuple(map(tuple, pts))
        rev = fwd[::-1]
        if fwd in self._arc_index:
            return (self._arc_index[fwd], True)
        if rev in self._arc_index:
            return (self._arc_index[rev], False)
        self._arc_index[fwd] = len(self.arcs)
        self.arcs.append(np.array(pts, dtype=np.float64))
        return (len(self.arcs) - 1, True)

    def stitch(self, arc_refs: list[tuple[int, bool]], simplified: list[np.ndarray]) -> np.ndarray:
        parts = []
        for arc_id, forward in arc_refs:
            a = simplified[arc_id]
            if not forward:
                a = a[::-1]
            parts.append(a if not parts else a[1:])
        return np.concatenate(parts, axis=0)


def _insert_collinear_vertices(ring_list: list[np.ndarray]) -> list[np.ndarray]:
    """Insert other rings' vertices that lie ON a segment into that segment.

    topojson's shared-path detection finds collinear overlaps (one ring's edge
    running along part of another's longer edge); inserting the on-edge
    vertices first reduces that case to plain shared-vertex junction
    detection. (Reference behaviour: tests/test_simplify_topo.py:15-38 — the
    (10,0) vertex of poly1 splits poly2's (0,0)-(11,0) edge.)
    """
    from pygeoops_ray.geo.strtree import STRtree

    all_v = np.unique(
        np.concatenate([r[:, :2] for r in ring_list], axis=0), axis=0
    )
    if len(all_v) == 0:
        return ring_list
    eps = 1e-9 * (1.0 + np.abs(all_v).max())
    vtree = STRtree(np.column_stack([all_v, all_v]))

    out = []
    for coords in ring_list:
        pts = coords[:, :2]
        inserts: dict[int, list[tuple[float, float, float]]] = {}
        for i in range(len(pts) - 1):
            a = pts[i]
            b = pts[i + 1]
            cand = vtree.query(
                min(a[0], b[0]) - eps,
                min(a[1], b[1]) - eps,
                max(a[0], b[0]) + eps,
                max(a[1], b[1]) + eps,
            )
            if len(cand) == 0:
                continue
            d = b - a
            seg_len2 = float(d[0] * d[0] + d[1] * d[1])
            if seg_len2 == 0:
                continue
            for vi in cand:
                v = all_v[vi]
                if (abs(v[0] - a[0]) <= eps and abs(v[1] - a[1]) <= eps) or (
                    abs(v[0] - b[0]) <= eps and abs(v[1] - b[1]) <= eps
                ):
                    continue
                cross = d[0] * (v[1] - a[1]) - d[1] * (v[0] - a[0])
                if abs(cross) > eps * (1.0 + seg_len2**0.5):
                    continue
                t = ((v[0] - a[0]) * d[0] + (v[1] - a[1]) * d[1]) / seg_len2
                if eps < t < 1 - eps:
                    inserts.setdefault(i, []).append((t, float(v[0]), float(v[1])))
        if not inserts:
            out.append(coords)
            continue
        new_pts = []
        for i in range(len(pts) - 1):
            new_pts.append(pts[i])
            for _, vx, vy in sorted(set(inserts.get(i, []))):
                new_pts.append(np.array([vx, vy]))
        new_pts.append(pts[-1])
        out.append(np.array(new_pts))
    return out


def _find_junctions(ring_list: list[np.ndarray]) -> set:
    """topojson-style join: a vertex seen with two different (prev,next)
    neighborhoods (order-insensitive) is a junction."""
    neighbors: dict[tuple, set] = {}
    junctions: set = set()
    for coords in ring_list:
        pts = coords[:, :2]
        closed = len(pts) > 2 and np.array_equal(pts[0], pts[-1])
        n = len(pts) - 1 if closed else len(pts)
        for i in range(n):
            k = _key(pts[i])
            if closed:
                prev_pt = pts[(i - 1) % n]
                next_pt = pts[(i + 1) % n]
            else:
                prev_pt = pts[i - 1] if i > 0 else None
                next_pt = pts[i + 1] if i < n - 1 else None
            nb = frozenset(
                _key(p) for p in (prev_pt, next_pt) if p is not None
            )
            if k in neighbors:
                if nb not in neighbors[k]:
                    junctions.add(k)
                    neighbors[k].add(nb)
            else:
                neighbors[k] = {nb}
        if not closed:
            # endpoints of open lines are always junctions
            junctions.add(_key(pts[0]))
            junctions.add(_key(pts[-1]))
    return junctions


def simplify_topo(
    geometry,
    tolerance: float,
    algorithm: str = "rdp",
    lookahead: int = 8,
    keep_points_on=None,
):
    if geometry is None:
        return None
    algorithm = algorithm.lower()
    if not _is_arraylike(geometry) or len(geometry) <= 1:
        return _plain_simplify(
            geometry,
            tolerance,
            algorithm=algorithm,
            lookahead=lookahead,
            preserve_topology=True,
            keep_points_on=keep_points_on,
        )

    geoms = list(geometry)

    # collect every ring / line of every geometry
    ring_list: list[np.ndarray] = []

    def rings_of(geom):
        if geom is None or geom.is_empty:
            return
        if isinstance(geom, g.Polygon):
            for r in geom.rings:
                ring_list.append(r)
        elif isinstance(geom, g.LineString):
            ring_list.append(geom.coords)
        elif isinstance(geom, g._Multi):
            for p in geom.geoms:
                rings_of(p)

    for geom in geoms:
        rings_of(geom)

    # reduce collinear-overlap boundaries to shared vertices, then find junctions
    augmented = _insert_collinear_vertices(ring_list)
    junctions = _find_junctions(augmented)
    aug_iter = iter(augmented)

    # build per-geometry arc references (same traversal order as rings_of)
    topo = _Topology()

    def encode(geom):
        if geom is None or geom.is_empty:
            return None
        if isinstance(geom, g.Polygon):
            return ("poly", [topo.add_ring(next(aug_iter), junctions) for _ in geom.rings])
        if isinstance(geom, g.LineString):
            return ("line", topo.add_line(next(aug_iter), junctions))
        if isinstance(geom, g._Multi):
            return ("multi", type(geom), [encode(p) for p in geom.geoms])
        return ("asis", geom)

    encoded = [encode(geom) for geom in geoms]

    # simplify each arc once; arc endpoints are kernel-pinned (first/last kept)
    simplified = [
        simplify_coords(
            arc,
            tolerance,
            algorithm=algorithm,
            lookahead=lookahead,
            simplify_lookahead_points=(algorithm == "lang+"),
            keep_points_on=keep_points_on,
        )
        for arc in topo.arcs
    ]

    def decode(enc):
        if enc is None:
            return None
        tag = enc[0]
        if tag == "asis":
            return enc[1]
        if tag == "line":
            coords = topo.stitch(enc[1], simplified)
            if len(coords) < 2:
                return None
            return g.LineString(coords)
        if tag == "poly":
            rings = [topo.stitch(refs, simplified) for refs in enc[1]]
            rings = [r for r in rings if len(r) >= 3]
            if not rings:
                return None
            closed = []
            for r in rings:
                if not np.array_equal(r[0], r[-1]):
                    r = np.concatenate([r, r[:1]], axis=0)
                if len(r) >= 4:
                    closed.append(r)
            if not closed:
                return None
            poly = g.Polygon(closed[0], closed[1:])
            return validity.make_valid(poly, keep_collapsed=True)
        if tag == "multi":
            parts = [decode(e) for e in enc[2]]
            parts = [p for p in parts if p is not None and not p.is_empty]
            return collect(parts)
        raise AssertionError(tag)

    from pygeoops_ray.geo.types import GeometryType

    out = np.empty(len(encoded), dtype=object)
    types_orig = {geom.type_id for geom in geoms if geom is not None}
    primitive_ids = {GeometryType(t).to_primitivetype.value for t in types_orig if t not in (0, 7)} if types_orig else set()
    uniform = len(primitive_ids) == 1 and not any(t in (0, 7) for t in types_orig)
    pid = primitive_ids.pop() if uniform else 0
    for i, enc in enumerate(encoded):
        geom = decode(enc)
        if uniform and geom is not None:
            geom = _collection_extract_one(geom, pid)
        out[i] = geom
    return out
