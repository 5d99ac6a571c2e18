"""Axis-aligned rectangle clipping kernels.

Rect-clip is the engine's workhorse for ``subdivide`` (SURVEY.md §2.1 #14) and
the raster-tile <-> vector-polygon clip join (SURVEY.md §2.3): polygons via
Sutherland-Hodgman against the four half-planes, lines via per-segment
parametric (Liang-Barsky) clipping.
"""

from __future__ import annotations

import numpy as np

from pygeoops_ray.geo import geom as g

__all__ = ["rect_clip", "clip_ring", "clip_polyline", "rect_clip_area"]

_EPS = 1e-12


def clip_ring(ring: np.ndarray, bounds: tuple[float, float, float, float]) -> np.ndarray:
    """Sutherland-Hodgman clip of a closed ring against a rectangle.

    Returns a closed (M,2) ring (possibly empty). Degenerate (zero-area) output
    collapses to empty.
    """
    minx, miny, maxx, maxy = bounds
    pts = ring[:, :2]
    if len(pts) and np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]

    def clip_edge(poly: np.ndarray, inside_fn, intersect_fn) -> np.ndarray:
        if len(poly) == 0:
            return poly
        out = []
        prev = poly[-1]
        prev_in = inside_fn(prev)
        for cur in poly:
            cur_in = inside_fn(cur)
            if cur_in:
                if not prev_in:
                    out.append(intersect_fn(prev, cur))
                out.append(cur)
            elif prev_in:
                out.append(intersect_fn(prev, cur))
            prev, prev_in = cur, cur_in
        return np.array(out) if out else np.zeros((0, 2))

    def ix(p, q, x):  # intersection with vertical line x
        t = (x - p[0]) / (q[0] - p[0])
        return np.array([x, p[1] + t * (q[1] - p[1])])

    def iy(p, q, y):  # intersection with horizontal line y
        t = (y - p[1]) / (q[1] - p[1])
        return np.array([p[0] + t * (q[0] - p[0]), y])

    pts = clip_edge(pts, lambda p: p[0] >= minx - _EPS, lambda p, q: ix(p, q, minx))
    pts = clip_edge(pts, lambda p: p[0] <= maxx + _EPS, lambda p, q: ix(p, q, maxx))
    pts = clip_edge(pts, lambda p: p[1] >= miny - _EPS, lambda p, q: iy(p, q, miny))
    pts = clip_edge(pts, lambda p: p[1] <= maxy + _EPS, lambda p, q: iy(p, q, maxy))

    if len(pts) < 3:
        return np.zeros((0, 2))
    # dedup consecutive identical points
    keep = np.ones(len(pts), dtype=bool)
    keep[1:] = np.any(np.abs(np.diff(pts, axis=0)) > _EPS, axis=1)
    pts = pts[keep]
    if len(pts) >= 2 and np.all(np.abs(pts[0] - pts[-1]) <= _EPS):
        pts = pts[:-1]
    if len(pts) < 3:
        return np.zeros((0, 2))
    return np.concatenate([pts, pts[:1]], axis=0)


def clip_polyline(coords: np.ndarray, bounds) -> list[np.ndarray]:
    """Clip an open polyline to a rectangle; returns list of coordinate runs."""
    minx, miny, maxx, maxy = bounds
    runs: list[list[np.ndarray]] = []
    cur: list[np.ndarray] = []
    for i in range(len(coords) - 1):
        p, q = coords[i, :2], coords[i + 1, :2]
        seg = _clip_segment(p, q, minx, miny, maxx, maxy)
        if seg is None:
            if cur:
                runs.append(cur)
                cur = []
            continue
        a, b = seg
        if cur and np.all(np.abs(cur[-1] - a) <= _EPS):
            cur.append(b)
        else:
            if cur:
                runs.append(cur)
            cur = [a, b]
    if cur:
        runs.append(cur)
    return [np.array(r) for r in runs if len(r) >= 2]


def _clip_segment(p, q, minx, miny, maxx, maxy):
    """Liang-Barsky segment clip; returns (a, b) or None."""
    dx, dy = q[0] - p[0], q[1] - p[1]
    t0, t1 = 0.0, 1.0
    for delta, lo in ((dx, minx - p[0]), (-dx, p[0] - maxx), (dy, miny - p[1]), (-dy, p[1] - maxy)):
        if abs(delta) < _EPS:
            if lo > 0:
                return None
            continue
        t = lo / delta
        if delta > 0:
            t0 = max(t0, t)
        else:
            t1 = min(t1, t)
        if t0 > t1:
            return None
    a = np.array([p[0] + t0 * dx, p[1] + t0 * dy])
    b = np.array([p[0] + t1 * dx, p[1] + t1 * dy])
    if np.all(np.abs(a - b) <= _EPS):
        return None
    return a, b


def rect_clip(geometry: g.Geometry | None, bounds) -> g.Geometry | None:
    """Clip any geometry to a rectangle; returns the narrowest result type.

    A hole that crosses the clip boundary yields rings touching the shell —
    area-exact, though not strictly OGC-valid (reference subdivide tolerates
    the same class of artifacts, _general.py:592-599).
    """
    if geometry is None:
        return None
    minx, miny, maxx, maxy = bounds
    if isinstance(geometry, g.Point):
        if geometry.is_empty:
            return g.Point()
        if minx - _EPS <= geometry.x <= maxx + _EPS and miny - _EPS <= geometry.y <= maxy + _EPS:
            return geometry
        return g.Point()
    if isinstance(geometry, g.LineString):
        runs = clip_polyline(geometry.coords, bounds)
        if not runs:
            return g.LineString()
        if len(runs) == 1:
            return g.LineString(runs[0])
        return g.MultiLineString([g.LineString(r) for r in runs])
    if isinstance(geometry, g.Polygon):
        shell = clip_ring(geometry.shell, bounds)
        if len(shell) == 0:
            return g.Polygon()
        holes = []
        for h in geometry.holes:
            hc = clip_ring(h, bounds)
            if len(hc):
                holes.append(hc)
        return g.Polygon(shell, holes)
    if isinstance(geometry, g._Multi):
        parts = [rect_clip(p, bounds) for p in geometry.geoms]
        parts = [p for p in parts if p is not None and not p.is_empty]
        from pygeoops_ray.geo.general import collect

        result = collect(parts)
        return result if result is not None else type(geometry)()
    raise ValueError(f"rect_clip unsupported for {type(geometry)}")


def rect_clip_area(geometry: g.Geometry, bounds) -> float:
    """Area of geometry ∩ rectangle (polygons only)."""
    clipped = rect_clip(geometry, bounds)
    return 0.0 if clipped is None else clipped.area
