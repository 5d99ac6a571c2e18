"""Spatial predicates on the numpy geometry model.

Supplies the GEOS predicates the reference relies on (prepared intersects /
contains in /root/reference/pygeoops/_centerline.py:177-179 and
_difference.py:157-165, point-intersects for keep_points_on in
_simplify.py:349-358) as from-scratch numpy/pure-Python kernels.

Conventions: boundary points count as intersecting (like GEOS ``intersects``);
``contains`` requires no part of b in the exterior of a and at least one
interior point (like GEOS ``contains``).
"""

from __future__ import annotations

import numpy as np

from pygeoops_ray.geo import geom as g

__all__ = [
    "segments_intersect",
    "segment_intersection_points",
    "point_in_ring",
    "point_in_polygon",
    "points_in_polygon",
    "intersects",
    "contains",
    "distance",
    "bbox_intersects",
]

_EPS = 1e-12


def _orient(ax, ay, bx, by, cx, cy) -> float:
    """Cross product (b-a) x (c-a): >0 left turn, <0 right, 0 collinear."""
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _on_segment(px, py, ax, ay, bx, by, eps=_EPS) -> bool:
    """Is p on segment a-b (inclusive), assuming p collinear-ish with a-b."""
    if abs(_orient(ax, ay, bx, by, px, py)) > eps * (1 + abs(ax) + abs(bx) + abs(py)):
        return False
    return (
        min(ax, bx) - eps <= px <= max(ax, bx) + eps
        and min(ay, by) - eps <= py <= max(ay, by) + eps
    )


def segments_intersect(a1, a2, b1, b2, eps=_EPS) -> bool:
    """Do closed segments a1-a2 and b1-b2 intersect (touching counts)?"""
    d1 = _orient(b1[0], b1[1], b2[0], b2[1], a1[0], a1[1])
    d2 = _orient(b1[0], b1[1], b2[0], b2[1], a2[0], a2[1])
    d3 = _orient(a1[0], a1[1], a2[0], a2[1], b1[0], b1[1])
    d4 = _orient(a1[0], a1[1], a2[0], a2[1], b2[0], b2[1])
    if ((d1 > eps and d2 < -eps) or (d1 < -eps and d2 > eps)) and (
        (d3 > eps and d4 < -eps) or (d3 < -eps and d4 > eps)
    ):
        return True
    if abs(d1) <= eps and _on_segment(a1[0], a1[1], b1[0], b1[1], b2[0], b2[1], eps):
        return True
    if abs(d2) <= eps and _on_segment(a2[0], a2[1], b1[0], b1[1], b2[0], b2[1], eps):
        return True
    if abs(d3) <= eps and _on_segment(b1[0], b1[1], a1[0], a1[1], a2[0], a2[1], eps):
        return True
    if abs(d4) <= eps and _on_segment(b2[0], b2[1], a1[0], a1[1], a2[0], a2[1], eps):
        return True
    return False


def segment_intersection_points(a1, a2, b1, b2, eps=_EPS) -> list[tuple[float, float]]:
    """Intersection point(s) of two closed segments (0, 1 or endpoints of overlap)."""
    ax, ay = a1
    bx, by = a2
    cx, cy = b1
    dx, dy = b2
    r = (bx - ax, by - ay)
    s = (dx - cx, dy - cy)
    denom = r[0] * s[1] - r[1] * s[0]
    qp = (cx - ax, cy - ay)
    if abs(denom) > eps:
        t = (qp[0] * s[1] - qp[1] * s[0]) / denom
        u = (qp[0] * r[1] - qp[1] * r[0]) / denom
        if -eps <= t <= 1 + eps and -eps <= u <= 1 + eps:
            return [(ax + t * r[0], ay + t * r[1])]
        return []
    # parallel: collinear overlap?
    if abs(qp[0] * r[1] - qp[1] * r[0]) > eps * (1 + abs(ax) + abs(bx)):
        return []
    rr = r[0] * r[0] + r[1] * r[1]
    if rr < eps:
        # a is a point
        return [(ax, ay)] if _on_segment(ax, ay, cx, cy, dx, dy, eps) else []
    t0 = (qp[0] * r[0] + qp[1] * r[1]) / rr
    t1 = t0 + (s[0] * r[0] + s[1] * r[1]) / rr
    lo, hi = max(0.0, min(t0, t1)), min(1.0, max(t0, t1))
    if lo > hi + eps:
        return []
    pts = [(ax + lo * r[0], ay + lo * r[1])]
    if hi - lo > eps:
        pts.append((ax + hi * r[0], ay + hi * r[1]))
    return pts


def point_in_ring(px: float, py: float, ring: np.ndarray) -> int:
    """1 = inside, 0 = on boundary, -1 = outside (even-odd / crossing number)."""
    x = ring[:, 0]
    y = ring[:, 1]
    n = len(ring) - 1  # ring closed: last == first
    if n < 3:
        return -1
    # boundary check (vectorized)
    ax, ay = x[:-1], y[:-1]
    bx, by = x[1:], y[1:]
    cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
    scale = 1 + np.abs(ax) + np.abs(bx) + abs(py)
    on = (np.abs(cross) <= _EPS * scale) & (
        (np.minimum(ax, bx) - _EPS <= px)
        & (px <= np.maximum(ax, bx) + _EPS)
        & (np.minimum(ay, by) - _EPS <= py)
        & (py <= np.maximum(ay, by) + _EPS)
    )
    if on.any():
        return 0
    # crossing number (vectorized, half-open rule avoids double counting vertices)
    cond = (ay <= py) != (by <= py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xi = ax + (py - ay) * (bx - ax) / (by - ay)
    crossings = int(np.count_nonzero(cond & (px < xi)))
    return 1 if crossings % 2 == 1 else -1


def point_in_polygon(poly: g.Polygon, px: float, py: float) -> int:
    """1 inside, 0 boundary, -1 outside, accounting for holes."""
    if poly.is_empty:
        return -1
    r = point_in_ring(px, py, poly.shell)
    if r <= 0:
        return r
    for hole in poly.holes:
        h = point_in_ring(px, py, hole)
        if h == 0:
            return 0
        if h == 1:
            return -1
    return 1


def _ring_test_dense(px, py, ax, ay, bx, by):
    """(n_pts × n_segs) crossing-number + on-boundary test. px/py are column
    vectors, seg arrays are rows. Returns (on_any, crossings) per point."""
    cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
    scale = 1 + np.abs(ax) + np.abs(bx) + np.abs(py)
    on = (np.abs(cross) <= _EPS * scale) & (
        (np.minimum(ax, bx) - _EPS <= px)
        & (px <= np.maximum(ax, bx) + _EPS)
        & (np.minimum(ay, by) - _EPS <= py)
        & (py <= np.maximum(ay, by) + _EPS)
    )
    on_any = on.any(axis=1)
    cond = (ay <= py) != (by <= py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xi = ax + (py - ay) * (bx - ax) / (by - ay)
    crossings = np.count_nonzero(cond & (px < xi), axis=1)
    return on_any, crossings


def points_in_ring_bulk(pts: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized point_in_ring for an (N,2) point array: array of {1,0,-1}.

    Small inputs run one dense (N × M) pass. Large inputs (N·M beyond ~4M
    cells, where the dense temporaries would thrash memory) take a y-binned
    path: each segment is registered in every y-bin its span ± eps touches,
    each point only tests its own bin's segments. Both the crossing
    condition and the on-boundary test are identically False for any segment
    whose y-span ± eps excludes the point, so pruned results are
    BIT-IDENTICAL to the dense pass.
    """
    if len(ring) - 1 < 3:
        return np.full(len(pts), -1, dtype=np.int8)
    pxf = pts[:, 0]
    pyf = pts[:, 1]
    x = ring[:, 0]
    y = ring[:, 1]
    n = len(pts)
    m = len(ring) - 1

    # block budget: keep every dense temporary ~16MB so the kernel stays in
    # cache-friendly territory (large fresh temporaries run 10-40x slower on
    # bandwidth-limited hosts)
    CELLS = 2_000_000

    def _run_dense(pi, ax, ay, bx, by, out):
        msub = len(ax)
        step = max(1, CELLS // max(msub, 1))
        for s in range(0, len(pi), step):
            sub = pi[s : s + step]
            on_any, crossings = _ring_test_dense(
                pxf[sub][:, None], pyf[sub][:, None], ax[None, :], ay[None, :],
                bx[None, :], by[None, :],
            )
            res = np.where(crossings % 2 == 1, 1, -1).astype(np.int8)
            res[on_any] = 0
            out[sub] = res

    out = np.full(n, -1, dtype=np.int8)
    if n * m <= CELLS:
        _run_dense(np.arange(n), x[:-1], y[:-1], x[1:], y[1:], out)
        return out

    # y-binned candidate pruning over the SEGMENT span only: a point whose y
    # lies outside every segment's span ± eps has no crossing and cannot be
    # on the boundary — it stays -1 (outside) with zero work. Both the
    # crossing condition and the on-boundary test are identically False for
    # any segment whose y-span ± eps excludes the point, so pruned results
    # are BIT-IDENTICAL to the dense pass.
    ax, ay = x[:-1], y[:-1]
    bx, by = x[1:], y[1:]
    slo = np.minimum(ay, by) - _EPS
    shi = np.maximum(ay, by) + _EPS
    ylo = float(slo.min())
    yhi = float(shi.max())
    if yhi <= ylo:
        yhi = ylo + 1.0
    nbins = int(np.clip(m // 8, 16, 4096))
    width = (yhi - ylo) / nbins
    b0 = np.clip(((slo - ylo) / width).astype(np.int64), 0, nbins - 1)
    b1 = np.clip(((shi - ylo) / width).astype(np.int64), 0, nbins - 1)
    reps = b1 - b0 + 1
    seg_idx = np.repeat(np.arange(m), reps)
    offs = np.concatenate([[0], np.cumsum(reps)[:-1]])
    seg_bin = np.repeat(b0, reps) + (np.arange(int(reps.sum())) - np.repeat(offs, reps))
    order = np.argsort(seg_bin, kind="stable")
    seg_idx = seg_idx[order]
    bin_starts = np.searchsorted(seg_bin[order], np.arange(nbins + 1))

    in_span = (pyf >= ylo) & (pyf <= yhi)
    pb = np.clip(((pyf - ylo) / width).astype(np.int64), 0, nbins - 1)
    pidx = np.nonzero(in_span)[0]
    porder = pidx[np.argsort(pb[pidx], kind="stable")]
    pstarts = np.searchsorted(pb[porder], np.arange(nbins + 1))
    for b in range(nbins):
        ps, pe = pstarts[b], pstarts[b + 1]
        if ps == pe:
            continue
        ss, se = bin_starts[b], bin_starts[b + 1]
        if ss == se:
            continue
        si = seg_idx[ss:se]
        _run_dense(porder[ps:pe], ax[si], ay[si], bx[si], by[si], out)
    return out


def points_in_polygon(poly: g.Polygon, pts: np.ndarray) -> np.ndarray:
    """Vectorized membership for an (N,2) point array: array of {1,0,-1}."""
    pts = np.asarray(pts, dtype=np.float64)[:, :2]
    if poly.is_empty or len(pts) == 0:
        return np.full(len(pts), -1, dtype=np.int8)
    out = points_in_ring_bulk(pts, poly.shell)
    inside = out == 1
    for hole in poly.holes:
        if not inside.any():
            break
        h = points_in_ring_bulk(pts[inside], hole)
        sub = out[inside]
        sub[h == 0] = 0
        sub[h == 1] = -1
        out[inside] = sub
        inside = out == 1
    return out


def bbox_intersects(a: g.Geometry, b: g.Geometry) -> bool:
    aminx, aminy, amaxx, amaxy = a.bounds
    bminx, bminy, bmaxx, bmaxy = b.bounds
    if np.isnan(aminx) or np.isnan(bminx):
        return False
    return not (amaxx < bminx or bmaxx < aminx or amaxy < bminy or bmaxy < aminy)


def _segments(geom: g.Geometry):
    """Yield (a, b) coordinate pairs for every segment of the geometry."""
    if isinstance(geom, g.LineString):
        c = geom.coords
        for i in range(len(c) - 1):
            yield c[i, :2], c[i + 1, :2]
    elif isinstance(geom, g.Polygon):
        for r in geom.rings:
            for i in range(len(r) - 1):
                yield r[i, :2], r[i + 1, :2]
    elif isinstance(geom, g._Multi):
        for p in geom.geoms:
            yield from _segments(p)


def _any_segments_cross(a: g.Geometry, b: g.Geometry) -> bool:
    segs_b = list(_segments(b))
    for a1, a2 in _segments(a):
        for b1, b2 in segs_b:
            if segments_intersect(a1, a2, b1, b2):
                return True
    return False


def _polygons_of(geom: g.Geometry) -> list[g.Polygon]:
    if isinstance(geom, g.Polygon):
        return [geom]
    if isinstance(geom, g._Multi):
        out = []
        for p in geom.geoms:
            out.extend(_polygons_of(p))
        return out
    return []


def intersects(a: g.Geometry | None, b: g.Geometry | None) -> bool:
    """GEOS-style intersects (boundary touching counts)."""
    if a is None or b is None or a.is_empty or b.is_empty:
        return False
    if not bbox_intersects(a, b):
        return False
    # point cases
    if isinstance(a, g.Point):
        return _point_intersects(a, b)
    if isinstance(b, g.Point):
        return _point_intersects(b, a)
    if isinstance(a, g._Multi) and not isinstance(a, g.Polygon):
        return any(intersects(p, b) for p in a.geoms)
    if isinstance(b, g._Multi):
        return any(intersects(a, p) for p in b.geoms)
    # segment crossing between boundaries?
    if _any_segments_cross(a, b):
        return True
    # containment without boundary crossing
    for poly in _polygons_of(a):
        c = g.get_coordinates(b)
        if len(c) and point_in_polygon(poly, c[0, 0], c[0, 1]) >= 0:
            return True
    for poly in _polygons_of(b):
        c = g.get_coordinates(a)
        if len(c) and point_in_polygon(poly, c[0, 0], c[0, 1]) >= 0:
            return True
    return False


def _point_intersects(pt: g.Point, other: g.Geometry) -> bool:
    px, py = pt.x, pt.y
    if isinstance(other, g.Point):
        return abs(px - other.x) <= _EPS and abs(py - other.y) <= _EPS
    if isinstance(other, g.LineString):
        c = other.coords
        for i in range(len(c) - 1):
            if _on_segment(px, py, c[i, 0], c[i, 1], c[i + 1, 0], c[i + 1, 1]):
                return True
        return False
    if isinstance(other, g.Polygon):
        return point_in_polygon(other, px, py) >= 0
    if isinstance(other, g._Multi):
        return any(_point_intersects(pt, p) for p in other.geoms)
    return False


def contains(a: g.Geometry | None, b: g.Geometry | None) -> bool:
    """GEOS-style contains: b within a, with at least one interior point shared.

    Implemented for the combinations the engine needs: polygon contains
    point/linestring/multilinestring (centerline edge filtering), polygon
    contains polygon (bbox-grade checks).
    """
    if a is None or b is None or a.is_empty or b.is_empty:
        return False
    if isinstance(b, g._Multi):
        return all(contains(a, p) for p in b.geoms if not p.is_empty)
    polys = _polygons_of(a)
    if not polys:
        return False
    if isinstance(b, g.Point):
        return any(point_in_polygon(p, b.x, b.y) == 1 for p in polys)
    coords = g.get_coordinates(b)
    for poly in polys:
        sides = [point_in_polygon(poly, c[0], c[1]) for c in coords]
        if any(s == -1 for s in sides):
            continue
        # all vertices inside-or-boundary; reject if an edge crosses the boundary
        # (a vertex-pair can both lie on the ring while the segment leaves the poly)
        crossed = False
        interior_seen = any(s == 1 for s in sides)
        for p1, p2 in _segments(b):
            mid = ((p1[0] + p2[0]) / 2, (p1[1] + p2[1]) / 2)
            side_mid = point_in_polygon(poly, mid[0], mid[1])
            if side_mid == -1:
                crossed = True
                break
            if side_mid == 1:
                interior_seen = True
        if not crossed and interior_seen:
            return True
    return False


def _point_seg_dist(px, py, ax, ay, bx, by) -> float:
    dx, dy = bx - ax, by - ay
    l2 = dx * dx + dy * dy
    if l2 == 0:
        return float(np.hypot(px - ax, py - ay))
    t = max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / l2))
    return float(np.hypot(px - (ax + t * dx), py - (ay + t * dy)))


def distance(a: g.Geometry | None, b: g.Geometry | None) -> float:
    """Minimum distance between two geometries (0 if they intersect)."""
    if a is None or b is None or a.is_empty or b.is_empty:
        return float("nan")
    if intersects(a, b):
        return 0.0
    best = float("inf")
    segs_a = list(_segments(a))
    segs_b = list(_segments(b))
    ca = g.get_coordinates(a)
    cb = g.get_coordinates(b)
    if not segs_a and not segs_b:
        d = np.hypot(ca[:, None, 0] - cb[None, :, 0], ca[:, None, 1] - cb[None, :, 1])
        return float(d.min())
    for px, py in ca[:, :2]:
        for b1, b2 in segs_b:
            best = min(best, _point_seg_dist(px, py, b1[0], b1[1], b2[0], b2[1]))
    for px, py in cb[:, :2]:
        for a1, a2 in segs_a:
            best = min(best, _point_seg_dist(px, py, a1[0], a1[1], a2[0], a2[1]))
    if not segs_b:
        for px, py in cb[:, :2]:
            for a1, a2 in segs_a:
                best = min(best, _point_seg_dist(px, py, a1[0], a1[1], a2[0], a2[1]))
    return best
