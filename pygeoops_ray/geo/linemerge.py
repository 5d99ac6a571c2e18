"""line_merge: join contiguous line segments at degree-2 nodes.

GEOS LineMerger semantics (the reference leans on shapely.line_merge in the
centerline path, _centerline.py:183-187): edges are merged through nodes where
exactly two edges meet; nodes of degree 1 or >= 3 break chains. Output is a
LineString when one chain remains, else a MultiLineString.
"""

from __future__ import annotations

import math

import numpy as np

from pygeoops_ray.geo import geom as g

__all__ = ["line_merge"]

_PREC = 1e-9


def line_merge(geometry: g.Geometry | None) -> g.Geometry | None:
    if geometry is None:
        return None
    if isinstance(geometry, g.LineString):
        return geometry
    if not isinstance(geometry, (g.MultiLineString, g.GeometryCollection)):
        raise ValueError(f"line_merge expects lines, got {geometry.geom_type}")

    lines = [p for p in geometry.geoms if isinstance(p, g.LineString) and not p.is_empty]
    if not lines:
        return g.MultiLineString()

    # endpoint node keys, snapped to _PREC — vectorized over all endpoints at
    # once (np.round is round-half-to-even like builtins.round, and the
    # quotients are < 2**53, so the keys are identical to the scalar form)
    ends = np.array(
        [[ln.coords[0, :2], ln.coords[-1, :2]] for ln in lines]
    )  # (n, 2, 2)
    keys = np.round(ends / _PREC) * _PREC
    start_key: list[tuple[float, float]] = [tuple(k) for k in keys[:, 0].tolist()]
    end_key: list[tuple[float, float]] = [tuple(k) for k in keys[:, 1].tolist()]

    # node degree map over endpoints
    degree: dict[tuple[float, float], int] = {}
    for i in range(len(lines)):
        for k in (start_key[i], end_key[i]):
            degree[k] = degree.get(k, 0) + 1

    # adjacency: endpoint key -> list of (line_idx, is_start)
    adj: dict[tuple[float, float], list[tuple[int, bool]]] = {}
    for i in range(len(lines)):
        adj.setdefault(start_key[i], []).append((i, True))
        adj.setdefault(end_key[i], []).append((i, False))

    used = [False] * len(lines)
    merged: list[np.ndarray] = []

    def walk(start_idx: int, forward: bool) -> list[np.ndarray]:
        """Collect coords chains from a line, extending through degree-2 nodes."""
        chain = [lines[start_idx].coords[:, :2] if forward else lines[start_idx].coords[::-1, :2]]
        used[start_idx] = True
        endpt = end_key[start_idx] if forward else start_key[start_idx]
        while True:
            if degree.get(endpt, 0) != 2:
                break
            nxt = [(i, s) for i, s in adj.get(endpt, []) if not used[i]]
            if len(nxt) != 1:
                break
            i, is_start = nxt[0]
            used[i] = True
            seg = lines[i].coords[:, :2] if is_start else lines[i].coords[::-1, :2]
            chain.append(seg[1:])
            endpt = end_key[i] if is_start else start_key[i]
        return chain

    # JTS LineMerger emission order (nodes live in a coordinate-ordered map;
    # edge strings are built from every non-degree-2 node in ascending (x, y)
    # order, taking that node's outgoing edges CCW from the +x axis). The
    # order is observable downstream: the centerline branch pruning breaks
    # length ties on part order, so matching it is what makes tied goldens
    # (e.g. the square's 4-way symmetric arms) resolve exactly as GEOS does.
    def _out_angle(item):
        i, is_start = item
        c = lines[i].coords[:, :2]
        seq = c if is_start else c[::-1]
        origin = seq[0]
        for p in seq[1:]:
            dx, dy = p[0] - origin[0], p[1] - origin[1]
            if dx != 0.0 or dy != 0.0:
                return math.atan2(dy, dx) % (2.0 * math.pi)
        return 0.0

    for node in sorted(k for k, d in degree.items() if d != 2):
        for i, is_start in sorted(adj.get(node, []), key=_out_angle):
            if used[i]:
                continue
            merged.append(np.concatenate(walk(i, forward=is_start), axis=0))

    # leftover closed loops (every node degree 2): input order, as JTS does
    for i in range(len(lines)):
        if not used[i]:
            merged.append(np.concatenate(walk(i, forward=True), axis=0))

    if len(merged) == 1:
        return g.LineString(merged[0])
    return g.MultiLineString([g.LineString(c) for c in merged])
