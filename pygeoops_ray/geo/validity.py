"""Validity checking and repair (make_valid) without GEOS.

Strategy for invalid polygons (the cases the reference test suite exercises:
self-touching and self-crossing "M-shape" rings, tests/test_simplify.py:181-251):
node each ring at its self-intersections, walk the noded ring extracting simple
loops (stack-based), drop zero-area loops, and assemble the surviving loops
into a Polygon / MultiPolygon (GeometryCollection if mixed with collapsed
lower-dimension parts and keep_collapsed=True).

This matches GEOS MakeValid's *observable* behaviour on those corpus cases
(bowtie → two triangles, self-touch → split parts), not its internals.
"""

from __future__ import annotations

import numpy as np

from pygeoops_ray.geo import geom as g
from pygeoops_ray.geo.measures import ring_area
from pygeoops_ray.geo.predicates import point_in_ring, segment_intersection_points

__all__ = ["is_valid", "make_valid", "node_ring", "split_ring_loops"]

_EPS = 1e-9


def _ring_is_simple(ring: np.ndarray) -> bool:
    """No two non-adjacent segments of the ring intersect (vectorized).

    All candidate pairs (j >= i+2, excluding the closing wrap pair) go through
    a numpy bbox prefilter, then vectorized orientation tests: a proper
    crossing or any collinear/endpoint touch between non-adjacent segments
    makes the ring non-simple.
    """
    pts = ring[:, :2]
    n = len(pts) - 1
    if n < 3:
        return True
    a = pts[:-1]
    b = pts[1:]
    scale = 1.0 + np.abs(pts).max()
    eps = 1e-12 * scale

    minx = np.minimum(a[:, 0], b[:, 0])
    maxx = np.maximum(a[:, 0], b[:, 0])
    miny = np.minimum(a[:, 1], b[:, 1])
    maxy = np.maximum(a[:, 1], b[:, 1])
    if n * n <= 4_000_000:
        ovl = (
            (minx[:, None] <= maxx[None, :] + eps)
            & (minx[None, :] <= maxx[:, None] + eps)
            & (miny[:, None] <= maxy[None, :] + eps)
            & (miny[None, :] <= maxy[:, None] + eps)
        )
        iu, ju = np.nonzero(np.triu(ovl, k=2))
    else:
        # y-binned candidate pairs for large rings: the dense (n x n) bbox
        # matrix thrashes memory; bin pairs are a SUPERSET of bbox overlaps
        # (exact bbox test re-applied below) so the result is identical
        ylo = float(miny.min())
        yhi = float(maxy.max())
        if yhi <= ylo:
            yhi = ylo + 1.0
        nbins = int(np.clip(n // 8, 16, 4096))
        width = (yhi - ylo) / nbins
        b0 = np.clip(((miny - eps - ylo) / width).astype(np.int64), 0, nbins - 1)
        b1 = np.clip(((maxy + eps - ylo) / width).astype(np.int64), 0, nbins - 1)
        reps = b1 - b0 + 1
        seg_flat = np.repeat(np.arange(n), reps)
        offs = np.concatenate([[0], np.cumsum(reps)[:-1]])
        seg_bin = np.repeat(b0, reps) + (
            np.arange(int(reps.sum())) - np.repeat(offs, reps)
        )
        order = np.argsort(seg_bin, kind="stable")
        seg_flat = seg_flat[order]
        bstarts = np.searchsorted(seg_bin[order], np.arange(nbins + 1))
        pair_i, pair_j = [], []
        for bb in range(nbins):
            s0, s1 = bstarts[bb], bstarts[bb + 1]
            if s1 - s0 < 2:
                continue
            grp = np.sort(seg_flat[s0:s1])
            gsz = len(grp)
            row_step = max(1, 2_000_000 // gsz)
            for x0 in range(0, gsz - 1, row_step):
                x1 = min(x0 + row_step, gsz - 1)
                xi, yi = np.meshgrid(np.arange(x0, x1), np.arange(gsz), indexing="ij")
                sel = yi > xi
                gi = grp[xi[sel]]
                gj = grp[yi[sel]]
                ok = (
                    (minx[gi] <= maxx[gj] + eps)
                    & (minx[gj] <= maxx[gi] + eps)
                    & (miny[gi] <= maxy[gj] + eps)
                    & (miny[gj] <= maxy[gi] + eps)
                )
                pair_i.append(gi[ok])
                pair_j.append(gj[ok])
        if pair_i:
            iu = np.concatenate(pair_i)
            ju = np.concatenate(pair_j)
            pk = np.unique(iu.astype(np.int64) * n + ju)  # dedupe multi-bin pairs
            iu = pk // n
            ju = pk % n
            adj = ju - iu >= 2  # keep the dense path's triu(k=2) semantics
            iu, ju = iu[adj], ju[adj]
        else:
            iu = np.array([], dtype=np.int64)
            ju = np.array([], dtype=np.int64)
    keep = ~((iu == 0) & (ju == n - 1))
    iu, ju = iu[keep], ju[keep]
    if len(iu) == 0:
        return True

    a1 = a[iu]
    a2 = b[iu]
    b1 = a[ju]
    b2 = b[ju]

    def cross(px, py, qx, qy, rx, ry):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)

    d1 = cross(b1[:, 0], b1[:, 1], b2[:, 0], b2[:, 1], a1[:, 0], a1[:, 1])
    d2 = cross(b1[:, 0], b1[:, 1], b2[:, 0], b2[:, 1], a2[:, 0], a2[:, 1])
    d3 = cross(a1[:, 0], a1[:, 1], a2[:, 0], a2[:, 1], b1[:, 0], b1[:, 1])
    d4 = cross(a1[:, 0], a1[:, 1], a2[:, 0], a2[:, 1], b2[:, 0], b2[:, 1])
    proper = (((d1 > eps) & (d2 < -eps)) | ((d1 < -eps) & (d2 > eps))) & (
        ((d3 > eps) & (d4 < -eps)) | ((d3 < -eps) & (d4 > eps))
    )
    if proper.any():
        return False

    def on_seg(px, py, sx1, sy1, sx2, sy2):
        return (
            (np.minimum(sx1, sx2) - eps <= px)
            & (px <= np.maximum(sx1, sx2) + eps)
            & (np.minimum(sy1, sy2) - eps <= py)
            & (py <= np.maximum(sy1, sy2) + eps)
        )

    touch = (
        ((np.abs(d1) <= eps) & on_seg(a1[:, 0], a1[:, 1], b1[:, 0], b1[:, 1], b2[:, 0], b2[:, 1]))
        | ((np.abs(d2) <= eps) & on_seg(a2[:, 0], a2[:, 1], b1[:, 0], b1[:, 1], b2[:, 0], b2[:, 1]))
        | ((np.abs(d3) <= eps) & on_seg(b1[:, 0], b1[:, 1], a1[:, 0], a1[:, 1], a2[:, 0], a2[:, 1]))
        | ((np.abs(d4) <= eps) & on_seg(b2[:, 0], b2[:, 1], a1[:, 0], a1[:, 1], a2[:, 0], a2[:, 1]))
    )
    return not touch.any()


def is_valid(geometry: g.Geometry | None) -> bool:
    """Pragmatic OGC validity: simple rings, holes inside shell, positive area."""
    if geometry is None:
        return True
    if isinstance(geometry, (g.Point, g.MultiPoint, g.LineString, g.MultiLineString)):
        return True
    if isinstance(geometry, g.Polygon):
        if geometry.is_empty:
            return True
        if abs(ring_area(geometry.shell)) < _EPS * _EPS:
            return False
        if not _ring_is_simple(geometry.shell):
            return False
        for h in geometry.holes:
            if not _ring_is_simple(h):
                return False
            # hole must be inside the shell
            inside = any(point_in_ring(c[0], c[1], geometry.shell) == 1 for c in h[:-1])
            if not inside:
                return False
        return True
    if isinstance(geometry, g.MultiPolygon):
        if not all(is_valid(p) for p in geometry.geoms):
            return False
        return multipolygon_parts_valid(geometry)
    if isinstance(geometry, g.GeometryCollection):
        return all(is_valid(p) for p in geometry.geoms)
    return True


def multipolygon_parts_valid(mp: g.MultiPolygon) -> bool:
    """OGC pairwise rule for MultiPolygon parts: parts may touch at finite
    POINTS (valid), but must not overlap in area or share boundary edges.

    The previous any-intersects rule wrongly rejected point-touching parts —
    e.g. make_valid of a bowtie repairs to two triangles meeting at the
    crossing point, which GEOS reports valid (reference relies on
    shapely.is_valid semantics, pygeoops/_general.py make_valid usage).
    """
    from pygeoops_ray.geo import predicates

    parts = mp.geoms
    for i in range(len(parts)):
        for j in range(i + 1, len(parts)):
            a, b = parts[i], parts[j]
            if not predicates.bbox_intersects(a, b):
                continue
            if not predicates.intersects(a, b):
                continue
            from pygeoops_ray.geo import boolean

            # interiors overlap?
            try:
                if boolean.intersection(a, b).area > 1e-12:
                    return False
            except ValueError:
                return False
            # collinear boundary overlap (edge sharing)?
            for s1, s2 in predicates._segments(a):
                for t1, t2 in predicates._segments(b):
                    pts = predicates.segment_intersection_points(s1, s2, t1, t2)
                    if len(pts) == 2:  # overlap along a segment
                        return False
    return True


def node_ring(ring: np.ndarray) -> np.ndarray:
    """Insert the ring's self-intersection points as explicit vertices."""
    n = len(ring) - 1
    inserts: dict[int, list[tuple[float, float, float]]] = {}
    for i in range(n):
        a1, a2 = ring[i, :2], ring[i + 1, :2]
        for j in range(i + 1, n):
            if j == i + 1 or (i == 0 and j == n - 1):
                continue
        # (adjacent segments share endpoints by construction)
            for p in segment_intersection_points(a1, a2, ring[j, :2], ring[j + 1, :2]):
                seglen_a = np.hypot(a2[0] - a1[0], a2[1] - a1[1])
                ta = np.hypot(p[0] - a1[0], p[1] - a1[1]) / seglen_a if seglen_a else 0.0
                if _EPS < ta < 1 - _EPS:
                    inserts.setdefault(i, []).append((ta, p[0], p[1]))
                b1 = ring[j, :2]
                b2 = ring[j + 1, :2]
                seglen_b = np.hypot(b2[0] - b1[0], b2[1] - b1[1])
                tb = np.hypot(p[0] - b1[0], p[1] - b1[1]) / seglen_b if seglen_b else 0.0
                if _EPS < tb < 1 - _EPS:
                    inserts.setdefault(j, []).append((tb, p[0], p[1]))
    if not inserts:
        return ring
    out = []
    for i in range(n):
        out.append(ring[i, :2])
        for _, px, py in sorted(set(inserts.get(i, []))):
            out.append(np.array([px, py]))
    out.append(ring[n, :2])
    return np.array(out)


def split_ring_loops(ring: np.ndarray) -> list[np.ndarray]:
    """Split a noded ring into simple loops (stack-based repeated-vertex walk)."""
    key = [(round(p[0] / _EPS) * _EPS, round(p[1] / _EPS) * _EPS) for p in ring[:, :2]]
    path: list[int] = []
    seen: dict[tuple[float, float], int] = {}
    loops: list[np.ndarray] = []
    for idx in range(len(ring)):
        k = key[idx]
        if k in seen:
            start = seen[k]
            loop_idx = path[start:] + [idx]
            if len(loop_idx) >= 4:  # 3 distinct + closing
                loops.append(ring[loop_idx, :2])
            # unwind
            for pi in path[start + 1 :]:
                seen.pop(key[pi], None)
            path = path[: start + 1]
        else:
            seen[k] = len(path)
            path.append(idx)
    return loops


def _close(arr: np.ndarray) -> np.ndarray:
    if len(arr) and not np.array_equal(arr[0], arr[-1]):
        return np.concatenate([arr, arr[:1]], axis=0)
    return arr


def make_valid(geometry, keep_collapsed: bool = True, only_if_invalid: bool = False):
    """Repair invalid geometries; valid input is returned unchanged."""
    from pygeoops_ray.geo.general import _extract_0dim

    geometry = _extract_0dim(geometry)  # 0-dim ndarray wrappers (ref parity)
    if geometry is None:
        return None
    if isinstance(geometry, np.ndarray):
        out = np.empty(len(geometry), dtype=object)
        for i, p in enumerate(geometry):
            out[i] = make_valid(p, keep_collapsed, only_if_invalid)
        return out
    if only_if_invalid and is_valid(geometry):
        return geometry
    return _make_valid_one(geometry, keep_collapsed)


def _make_valid_one(geometry: g.Geometry, keep_collapsed: bool):
    if isinstance(geometry, (g.Point, g.MultiPoint, g.LineString, g.MultiLineString)):
        return geometry
    if isinstance(geometry, g.Polygon):
        return _make_valid_polygon(geometry, keep_collapsed)
    if isinstance(geometry, g.MultiPolygon):
        parts = [_make_valid_polygon(p, keep_collapsed) for p in geometry.geoms]
        from pygeoops_ray.geo.general import collect, get_parts_recursive

        flat = []
        for p in parts:
            if p is None or p.is_empty:
                continue
            flat.extend(get_parts_recursive(p))
        return collect(flat) if flat else g.MultiPolygon()
    if isinstance(geometry, g.GeometryCollection):
        parts = [_make_valid_one(p, keep_collapsed) for p in geometry.geoms]
        parts = [p for p in parts if p is not None and not p.is_empty]
        return g.GeometryCollection(parts)
    return geometry


def _make_valid_polygon(poly: g.Polygon, keep_collapsed: bool):
    if poly.is_empty:
        return poly
    if is_valid(poly):
        return poly
    shell_noded = node_ring(_close(poly.shell[:, :2]))
    loops = split_ring_loops(shell_noded)
    good = []
    collapsed = []
    if not loops:
        # fully degenerate ring (e.g. zero-area spike): collapses to a line
        loops_dg = [shell_noded]
    else:
        loops_dg = []
    for lp in list(loops) + loops_dg:
        a = ring_area(lp)
        if abs(a) > _EPS * _EPS:
            good.append(lp if a > 0 else lp[::-1])
        elif keep_collapsed:
            distinct = np.unique(lp[:, :2], axis=0)
            if len(distinct) >= 2:
                collapsed.append(g.LineString(distinct))
    # Re-attach valid holes to whichever loop contains them
    holes_by_loop: list[list[np.ndarray]] = [[] for _ in good]
    for h in poly.holes:
        for i, lp in enumerate(good):
            if point_in_ring(h[0, 0], h[0, 1], _close(lp)) >= 0:
                holes_by_loop[i].append(h)
                break
    polys = [g.Polygon(lp, hs) for lp, hs in zip(good, holes_by_loop)]
    if not polys:
        if collapsed and keep_collapsed:
            return collapsed[0] if len(collapsed) == 1 else g.MultiLineString(collapsed)
        return g.Polygon()
    result: g.Geometry
    if len(polys) == 1:
        result = polys[0]
    else:
        result = g.MultiPolygon(polys)
    if collapsed and keep_collapsed:
        return g.GeometryCollection(polys + collapsed)
    return result
