"""Delaunay triangulation (Bowyer-Watson) and its Voronoi-edge dual.

The centerline kernel's engine (the reference delegates to GEOS
``voronoi_polygons(only_edges=True)``, _centerline.py:163). Implemented from
the classic Bowyer-Watson incremental algorithm with a numpy-vectorized
bad-triangle search per insertion: per point, the circumcircle test runs as
one vectorized pass over the live triangle arrays.

Only finite Voronoi edges (between circumcenters of adjacent triangles) are
emitted — the infinite hull rays would be dropped by the centerline's
containment filter anyway.
"""

from __future__ import annotations

import numpy as np

__all__ = ["delaunay", "voronoi_edges"]


def _circum_exact(ax, ay, bx, by, kx, ky):
    """Exact-rational circumcenter (Fraction(float) is exact) for triangles
    where the double-precision formula loses the answer to cancellation."""
    from fractions import Fraction as F

    ax, ay, bx, by, kx, ky = F(ax), F(ay), F(bx), F(by), F(kx), F(ky)
    d = 2 * (ax * (by - ky) + bx * (ky - ay) + kx * (ay - by))
    if d == 0:
        return None, None
    a2 = ax * ax + ay * ay
    b2 = bx * bx + by * by
    k2 = kx * kx + ky * ky
    ux = (a2 * (by - ky) + b2 * (ky - ay) + k2 * (ay - by)) / d
    uy = (a2 * (kx - bx) + b2 * (ax - kx) + k2 * (bx - ax)) / d
    return float(ux), float(uy)


def delaunay(points: np.ndarray) -> np.ndarray:
    """Delaunay triangles of (N,2) points; returns (M,3) vertex index array.

    Input is centered on its mean before triangulating: survey-scale
    coordinates (1e5) with micro-scale extents otherwise lose the circumcircle
    test to catastrophic cancellation.
    """
    pts = np.asarray(points, dtype=np.float64)[:, :2]
    n = len(pts)
    if n < 3:
        return np.zeros((0, 3), dtype=np.int64)
    pts = pts - np.floor(pts.mean(axis=0))  # integer shift: exact in floats

    # super-triangle
    minx, miny = pts.min(axis=0)
    maxx, maxy = pts.max(axis=0)
    cx, cy = (minx + maxx) / 2, (miny + maxy) / 2
    size = max(maxx - minx, maxy - miny, 1e-9) * 1000
    sup = np.array(
        [[cx - 2 * size, cy - size], [cx + 2 * size, cy - size], [cx, cy + 2 * size]]
    )
    all_pts = np.concatenate([pts, sup], axis=0)
    si = n  # super vertex indices n, n+1, n+2

    cap = max(4 * n + 16, 64)
    verts = np.zeros((cap, 3), dtype=np.int64)
    ccx = np.zeros(cap)
    ccy = np.zeros(cap)
    r2 = np.zeros(cap)
    alive = np.zeros(cap, dtype=bool)
    m = 0

    # python-list coordinate access: scalar math in the hot circumcircle path
    # beats numpy scalar indexing by ~5x
    xl = all_pts[:, 0].tolist()
    yl = all_pts[:, 1].tolist()
    inf = float("inf")

    def circum(i, j, k):
        ax = xl[i]
        ay = yl[i]
        bx = xl[j]
        by = yl[j]
        kx = xl[k]
        ky = yl[k]
        d = 2 * (ax * (by - ky) + bx * (ky - ay) + kx * (ay - by))
        if d == 0:
            return (inf, inf, inf)
        a2 = ax * ax + ay * ay
        b2 = bx * bx + by * by
        k2 = kx * kx + ky * ky
        if abs(d) < 1e-7 * (a2 + b2 + k2):
            # near-degenerate (sliver) triangle: the float formula cancels
            # catastrophically (a 2×3e-10 survey sliver loses the whole
            # y-offset) — recompute the circumcenter in exact rationals
            ux, uy = _circum_exact(ax, ay, bx, by, kx, ky)
            if ux is None:
                return (inf, inf, inf)
            rr = (ax - ux) * (ax - ux) + (ay - uy) * (ay - uy)
            return (ux, uy, rr)
        ux = (a2 * (by - ky) + b2 * (ky - ay) + k2 * (ay - by)) / d
        uy = (a2 * (kx - bx) + b2 * (ax - kx) + k2 * (bx - ax)) / d
        rr = (ax - ux) * (ax - ux) + (ay - uy) * (ay - uy)
        return (ux, uy, rr)

    def add_tri(i, j, k):
        nonlocal m, cap, verts, ccx, ccy, r2, alive
        if m >= cap:
            cap *= 2
            verts = np.resize(verts, (cap, 3))
            ccx = np.resize(ccx, cap)
            ccy = np.resize(ccy, cap)
            r2 = np.resize(r2, cap)
            alive = np.resize(alive, cap)
        verts[m] = (i, j, k)
        ux, uy, rr = circum(i, j, k)
        ccx[m], ccy[m], r2[m] = ux, uy, rr
        alive[m] = True
        m += 1

    add_tri(si, si + 1, si + 2)

    # insertion in spatially-coherent order tends to keep the cavity local
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    for p in order:
        px, py = all_pts[p]
        bad = np.nonzero(alive[:m] & ((px - ccx[:m]) ** 2 + (py - ccy[:m]) ** 2 <= r2[:m]))[0]
        if len(bad) == 0:
            continue  # degenerate duplicate point
        # cavity boundary: edges appearing exactly once among the bad triangles
        edges: dict[tuple[int, int], int] = {}
        for t in bad:
            i, j, k = verts[t]
            for a, b in ((i, j), (j, k), (k, i)):
                key = (a, b) if a < b else (b, a)
                edges[key] = edges.get(key, 0) + 1
        alive[bad] = False
        for (a, b), cnt in edges.items():
            if cnt == 1:
                add_tri(a, b, p)

    live = np.nonzero(alive[:m])[0]
    tris = verts[live]
    # drop triangles touching the super-triangle
    keep = np.all(tris < n, axis=1)
    return tris[keep]


def voronoi_edges(points: np.ndarray) -> np.ndarray:
    """Finite Voronoi edges of the point set: (E, 2, 2) segment array.

    Each edge connects circumcenters of two Delaunay triangles sharing an edge.
    """
    pts = np.asarray(points, dtype=np.float64)[:, :2]
    center = np.floor(pts.mean(axis=0))  # integer shift: exact in floats
    pts = pts - center  # conditioning: circumcenters of survey-scale coords
    tris = delaunay(pts)
    if len(tris) == 0:
        return np.zeros((0, 2, 2))

    a, b, c = pts[tris[:, 0]], pts[tris[:, 1]], pts[tris[:, 2]]
    d = 2 * (
        a[:, 0] * (b[:, 1] - c[:, 1])
        + b[:, 0] * (c[:, 1] - a[:, 1])
        + c[:, 0] * (a[:, 1] - b[:, 1])
    )
    d[d == 0] = np.nan
    a2 = (a**2).sum(axis=1)
    b2 = (b**2).sum(axis=1)
    c2 = (c**2).sum(axis=1)
    ux = (a2 * (b[:, 1] - c[:, 1]) + b2 * (c[:, 1] - a[:, 1]) + c2 * (a[:, 1] - b[:, 1])) / d
    uy = (a2 * (c[:, 0] - b[:, 0]) + b2 * (a[:, 0] - c[:, 0]) + c2 * (b[:, 0] - a[:, 0])) / d
    centers = np.column_stack([ux, uy])
    # sliver triangles: the float circumcenter cancels — redo those exactly
    thin = np.nonzero(np.abs(np.nan_to_num(d)) < 1e-7 * (a2 + b2 + c2))[0]
    for t in thin:
        ex, ey = _circum_exact(a[t, 0], a[t, 1], b[t, 0], b[t, 1], c[t, 0], c[t, 1])
        if ex is not None:
            centers[t] = (ex, ey)

    edge_map: dict[tuple[int, int], list[int]] = {}
    for t in range(len(tris)):
        i, j, k = tris[t]
        for x, y in ((i, j), (j, k), (k, i)):
            key = (x, y) if x < y else (y, x)
            edge_map.setdefault(key, []).append(t)

    # envelope scale for the unbounded hull rays (GEOS clips its diagram to an
    # expanded envelope; the centerline containment filter clips further)
    minx, miny = pts.min(axis=0)
    maxx, maxy = pts.max(axis=0)
    ray_len = 2.0 * max(maxx - minx, maxy - miny, 1e-9)

    finite = np.all(np.isfinite(centers), axis=1)
    segs = []
    for (ia, ib), ts in edge_map.items():
        if len(ts) == 2:
            t0, t1 = ts
            if not (finite[t0] and finite[t1]):
                continue
            p0, p1 = centers[t0], centers[t1]
            if abs(p0[0] - p1[0]) > 1e-11 or abs(p0[1] - p1[1]) > 1e-11:
                segs.append((p0, p1))
        elif len(ts) == 1:
            # hull edge → unbounded Voronoi ray from the circumcenter,
            # perpendicular to the edge, away from the opposite vertex
            t = ts[0]
            cc = centers[t]
            if not np.all(np.isfinite(cc)):
                continue
            i, j, k = tris[t]
            third = [v for v in (i, j, k) if v not in (ia, ib)][0]
            a_pt, b_pt, c_pt = pts[ia], pts[ib], pts[third]
            mid = (a_pt + b_pt) / 2
            d = b_pt - a_pt
            n = np.array([-d[1], d[0]])
            nn = np.hypot(n[0], n[1])
            if nn == 0:
                continue
            n = n / nn
            if np.dot(n, c_pt - mid) > 0:
                n = -n
            segs.append((cc, cc + n * ray_len))
    if not segs:
        return np.zeros((0, 2, 2))
    return np.array(segs) + center  # un-center back to world coordinates
