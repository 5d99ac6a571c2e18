"""Line extension: by distance and to a target geometry's boundary.

Re-expresses /root/reference/pygeoops/_extend_line.py:7-284 on the numpy
model: segment extension math, bbox extension, closest-intersection selection,
and the multi-line branch-blocker rule (a branch whose endpoint touches a
sibling branch is not extended on that side).
"""

from __future__ import annotations

import math

import numpy as np

from pygeoops_ray.geo import geom as g
from pygeoops_ray.geo import predicates

__all__ = ["extend_line_by_distance", "extend_line_to_geometry"]


def extend_line_by_distance(
    line: g.LineString, start_distance: float, end_distance: float
) -> g.LineString:
    from pygeoops_ray.geo.general import _extract_0dim

    line = _extract_0dim(line)  # 0-dim ndarray wrappers (reference parity)
    if start_distance == 0 and end_distance == 0:
        return line
    coords = line.coords[:, :2].copy()
    _, coords[0] = _extend_segment_by_distance(coords[1], coords[0], start_distance)
    _, coords[-1] = _extend_segment_by_distance(coords[-2], coords[-1], end_distance)
    return g.LineString(coords)


def extend_line_to_geometry(line, extend_to):
    from pygeoops_ray.geo.general import _extract_0dim

    line = _extract_0dim(line)
    extend_to = _extract_0dim(extend_to)
    if isinstance(extend_to, (g.Polygon, g.MultiPolygon)):
        extend_to_line = _boundary(extend_to)
    elif isinstance(extend_to, (g.LineString, g.MultiLineString)):
        extend_to_line = extend_to
    else:
        raise ValueError("geometry must be a (Multi)Polygon (Multi)LineString")

    if isinstance(line, g.LineString):
        return _extend_linestring_to_line(line, extend_to_line, [])
    if isinstance(line, g.MultiLineString):
        result = []
        for idx, part in enumerate(line.geoms):
            blockers = [ln for j, ln in enumerate(line.geoms) if j != idx]
            result.append(_extend_linestring_to_line(part, extend_to_line, blockers))
        return g.MultiLineString(result)
    raise ValueError(f"line must be (Multi)LineString, not {type(line)}")


def _boundary(poly) -> g.Geometry:
    rings = []
    if isinstance(poly, g.Polygon):
        rings = [g.LineString(r) for r in poly.rings]
    else:
        for p in poly.geoms:
            rings.extend(g.LineString(r) for r in p.rings)
    return rings[0] if len(rings) == 1 else g.MultiLineString(rings)


def _extend_linestring_to_line(linestring, extend_to, blockers) -> g.LineString:
    coords = linestring.coords[:, :2].copy()

    def blocked(pt) -> bool:
        p = g.Point(pt[0], pt[1])
        return any(predicates.intersects(p, b) for b in blockers)

    if not blocked(coords[0]):
        coords[0] = _find_closest_extend_point(coords[1], coords[0], extend_to)
    if not blocked(coords[-1]):
        coords[-1] = _find_closest_extend_point(coords[-2], coords[-1], extend_to)
    return g.LineString(coords)


def _find_closest_extend_point(p1, p2, extend_to):
    if predicates.intersects(g.Point(p2[0], p2[1]), extend_to):
        return p2
    _, p2_ext = _extend_segment_to_bbox(tuple(p1), tuple(p2), extend_to.bounds)
    # intersection points of the extension segment with the target lines
    pts = []
    for a, b in predicates._segments(extend_to):
        pts.extend(predicates.segment_intersection_points(p2, p2_ext, a, b))
    if not pts:
        return p2
    pts = np.array(pts)
    d = np.hypot(pts[:, 0] - p2[0], pts[:, 1] - p2[1])
    return pts[int(np.argmin(d))]


def _extend_segment_by_distance(p1, p2, distance: float):
    if distance < 0:
        raise ValueError(f"distance must be >= 0, received: {distance}")
    seg_len = math.hypot(p1[0] - p2[0], p1[1] - p2[1])
    if seg_len == 0:
        raise ValueError("lenght of input segment cannot be 0")
    return _extend_segment_by_ratio(p1, p2, distance / seg_len)


def _extend_segment_by_ratio(p1, p2, ratio: float):
    if ratio < 0:
        raise ValueError(f"ratio must be >= 0, received: {ratio}")
    p_ext = (p2[0] + (p2[0] - p1[0]) * ratio, p2[1] + (p2[1] - p1[1]) * ratio)
    return (p1, np.array(p_ext))


def _extend_segment_to_bbox(p1, p2, bbox):
    minx, miny, maxx, maxy = bbox
    if p1[0] == p2[0]:  # vertical
        if p1[1] < p2[1]:
            return ((p1[0], miny), (p1[0], maxy))
        return ((p1[0], maxy), (p1[0], miny))
    if p1[1] == p2[1]:  # horizontal
        if p1[0] < p2[0]:
            return ((minx, p1[1]), (maxx, p1[1]))
        return ((maxx, p1[1]), (minx, p1[1]))
    k = (p2[1] - p1[1]) / (p2[0] - p1[0])
    m = p1[1] - k * p1[0]
    candidates = [
        (minx, k * minx + m),
        (maxx, k * maxx + m),
        ((miny - m) / k, miny),
        ((maxy - m) / k, maxy),
    ]

    def bbox_dist(pt):
        dx = max(minx - pt[0], 0, pt[0] - maxx)
        dy = max(miny - pt[1], 0, pt[1] - maxy)
        return math.hypot(dx, dy)

    cand_sorted = sorted(candidates, key=bbox_dist)
    pa_, pb = cand_sorted[0], cand_sorted[1]
    if p1[0] < p2[0]:
        return (pa_, pb) if pa_[0] < pb[0] else (pb, pa_)
    return (pa_, pb) if pa_[0] > pb[0] else (pb, pa_)
