"""Approximate medial axis (centerline) of a polygon.

Re-expresses /root/reference/pygeoops/_centerline.py:102-219 from scratch:
densify boundary → Voronoi edges of boundary vertices (our Bowyer-Watson
dual) → keep edges inside the polygon → line_merge → prune short branches
(STRtree endpoint adjacency, _centerline.py:285-387) → simplify (RDP, auto
tolerance) → optional extend to the boundary → normalize.

Golden parity (tests/test_centerline.py): every reference golden WKT —
rectangle, ellipse (all 3 parameterizations), fancy-L (all 3), L-shape,
narrow survey sliver, degenerate collection — matches equals_exact(1e-6)
INCLUDING multiline part order (GEOS-normalize parity, see normalize_lines).
Remaining deviation: the square's 4-way-tied branch pruning picks a symmetric
variant (GEOS's overlay-internal part order decides which tied branches go;
documented in test_centerline_square).
"""

from __future__ import annotations

import math

import numpy as np

from pygeoops_ray.geo import geom as g
from pygeoops_ray.geo import predicates
from pygeoops_ray.geo.extend_line import extend_line_to_geometry
from pygeoops_ray.geo.general import _extract_0dim, _is_arraylike, format_short
from pygeoops_ray.geo.linemerge import line_merge
from pygeoops_ray.geo.measures import average_width, compactness
from pygeoops_ray.geo.simplify_kernels import simplify_coords_rdp_idx
from pygeoops_ray.geo.strtree import STRtree
from pygeoops_ray.geo.voronoi import voronoi_edges

__all__ = ["centerline", "segmentize", "normalize_lines"]


def segmentize(geom: g.Geometry, max_segment_length: float) -> g.Geometry:
    """Insert vertices so no segment exceeds max_segment_length (GEOS-style)."""

    def densify_coords(coords: np.ndarray) -> np.ndarray:
        out = [coords[0, :2]]
        for i in range(len(coords) - 1):
            p0 = coords[i, :2]
            p1 = coords[i + 1, :2]
            seg_len = math.hypot(p1[0] - p0[0], p1[1] - p0[1])
            pieces = max(int(math.ceil(seg_len / max_segment_length)), 1)
            for k in range(1, pieces):
                t = k / pieces
                out.append(p0 + t * (p1 - p0))
            out.append(p1)
        return np.array(out)

    if isinstance(geom, g.Polygon):
        return g.Polygon(densify_coords(geom.shell), [densify_coords(h) for h in geom.holes])
    if isinstance(geom, g.LineString):
        return g.LineString(densify_coords(geom.coords))
    if isinstance(geom, g._Multi):
        return type(geom)([segmentize(p, max_segment_length) for p in geom.geoms])
    return geom


def _dedup_coords(coords: np.ndarray, tol: float = 1e-8) -> np.ndarray:
    if len(coords) < 2:
        return coords
    keep = np.ones(len(coords), dtype=bool)
    keep[1:] = np.hypot(*(np.diff(coords[:, :2], axis=0).T)) > tol
    return coords[keep]


def _greedy_dedup_ring(ring: np.ndarray, tol: float) -> np.ndarray | None:
    """GEOS RepeatedPointRemover on one ring: keep a vertex only if it is
    farther than ``tol`` from the LAST KEPT vertex (greedy, not pairwise).
    Input/output rings are closed; returns None when the ring collapses
    below 4 points (GEOS raises "invalid number of points in linearring")."""
    c = ring[:, :2]
    open_c = c[:-1] if len(c) > 1 and np.array_equal(c[0], c[-1]) else c
    t2 = tol * tol
    kept = [open_c[0]]
    for p in open_c[1:]:
        d0 = p[0] - kept[-1][0]
        d1 = p[1] - kept[-1][1]
        if d0 * d0 + d1 * d1 > t2:
            kept.append(p)
    # the closure vertex is subject to the same rule: trailing points within
    # tol of the ring start are repeats of the endpoint (this is what makes
    # the 3e-10 sliver collapse → retry ladder → keep-original, as GEOS does)
    while len(kept) > 1:
        d0 = kept[-1][0] - kept[0][0]
        d1 = kept[-1][1] - kept[0][1]
        if d0 * d0 + d1 * d1 > t2:
            break
        kept.pop()
    if len(kept) < 3:
        return None
    kept.append(kept[0])
    return np.asarray(kept)


def _remove_repeated_points_poly(geom: g.Geometry, tol: float):
    """``shapely.remove_repeated_points(poly, tol)`` parity
    (reference _centerline.py:147-152): ring-wise greedy dedup; returns
    (result, collapsed) where collapsed=True maps to GEOS's linearring
    exception (a ring fell below 4 points)."""
    if isinstance(geom, g.Polygon):
        shell = _greedy_dedup_ring(geom.shell, tol)
        if shell is None:
            return None, True
        holes = []
        for hole in geom.holes:
            h = _greedy_dedup_ring(hole, tol)
            if h is None:
                return None, True
            holes.append(h)
        return g.Polygon(shell, holes), False
    if isinstance(geom, g._Multi):
        parts = []
        for p in geom.geoms:
            r, collapsed = _remove_repeated_points_poly(p, tol)
            if collapsed:
                return None, True
            parts.append(r)
        return type(geom)(parts), False
    return geom, False


def _set_precision_poly(geom: g.Geometry, grid: float):
    """Rough ``shapely.set_precision`` emulation for the reference's retry
    ladder (_centerline.py:153-156): snap coordinates to the grid, drop exact
    consecutive duplicates; None when a ring collapses (the caller's
    empty/invalid check then keeps the original geometry)."""
    if isinstance(geom, g.Polygon):
        rings = []
        for ring in [geom.shell, *geom.holes]:
            c = np.round(ring[:, :2] / grid) * grid
            r = _greedy_dedup_ring(c, 0.0)
            if r is None:
                return None
            rings.append(r)
        return g.Polygon(rings[0], rings[1:])
    if isinstance(geom, g._Multi):
        parts = [_set_precision_poly(p, grid) for p in geom.geoms]
        if any(p is None for p in parts):
            return None
        return type(geom)(parts)
    return geom


def normalize_lines(geometry: g.Geometry | None) -> g.Geometry | None:
    """GEOS-normalize parity (verified against the reference's golden WKTs,
    tests/test_centerline.py:93-131): each line is oriented so the first
    differing endpoint pair (compared from both ends inward) starts smaller;
    multi parts are sorted DESCENDING by their reversed coordinate sequence —
    the empirical ordering of ``shapely.normalize`` on every multi-part
    centerline golden."""
    if geometry is None:
        return None

    def norm_line(ln: g.LineString) -> g.LineString:
        c = ln.coords[:, :2]
        n = len(c)
        for i in range(n // 2):
            a = tuple(c[i])
            b = tuple(c[n - 1 - i])
            if a != b:
                if a > b:
                    c = c[::-1]
                break
        return g.LineString(c)

    if isinstance(geometry, g.LineString):
        return norm_line(geometry)
    if isinstance(geometry, g.MultiLineString):
        parts = sorted(
            (norm_line(p) for p in geometry.geoms),
            key=lambda ln: tuple(map(tuple, ln.coords[::-1, :2])),
            reverse=True,
        )
        if len(parts) == 1:
            return parts[0]
        return g.MultiLineString(parts)
    return geometry


def centerline(
    geometry,
    densify_distance: float = -1,
    min_branch_length: float = -1,
    simplifytolerance: float = -0.25,
    extend: bool = False,
):
    """Centerline of polygon(s); negative params auto-scale to average width."""
    if geometry is None:
        return None
    geometry = _extract_0dim(geometry)
    if _is_arraylike(geometry):
        out = np.empty(len(geometry), dtype=object)
        for i, geom in enumerate(geometry):
            out[i] = _centerline(
                geom, densify_distance, min_branch_length, simplifytolerance, extend
            )
        return out
    return _centerline(geometry, densify_distance, min_branch_length, simplifytolerance, extend)


def _translate(geom: g.Geometry, dx: float, dy: float) -> g.Geometry:
    off = np.array([dx, dy])
    if isinstance(geom, g.Point):
        return g.Point(geom.coords[0, 0] + dx, geom.coords[0, 1] + dy)
    if isinstance(geom, g.LineString):
        return g.LineString(geom.coords[:, :2] + off)
    if isinstance(geom, g.Polygon):
        return g.Polygon(geom.shell[:, :2] + off, [h[:, :2] + off for h in geom.holes])
    if isinstance(geom, g._Multi):
        return type(geom)([_translate(p, dx, dy) for p in geom.geoms])
    return geom


def _centerline(
    geom: g.Geometry | None,
    densify_distance: float = -1,
    min_branch_length: float = -1,
    simplifytolerance: float = -0.25,
    extend: bool = False,
) -> g.Geometry | None:
    if geom is None or geom.is_empty:
        return None
    # survey-scale conditioning: predicates and circumcenters on coordinates
    # like (64438.00000007, 218000.0000000003) cancel catastrophically; the
    # centerline is translation-invariant, so shift large inputs to a local
    # integer origin and shift the result back. Small inputs stay untouched
    # (bit-exact goldens).
    c0 = g.get_coordinates(geom)
    shift = (0.0, 0.0)
    if np.abs(c0[:, :2]).max() > 1e4:
        shift = tuple(np.floor(c0[:, :2].mean(axis=0)))
        geom = _translate(geom, -shift[0], -shift[1])
    res = _centerline_local(geom, densify_distance, min_branch_length, simplifytolerance, extend)
    if res is not None and shift != (0.0, 0.0):
        res = _translate(res, shift[0], shift[1])
    return res


def _centerline_local(
    geom: g.Geometry,
    densify_distance: float,
    min_branch_length: float,
    simplifytolerance: float,
    extend: bool,
) -> g.Geometry | None:
    try:
        average_width_val = None
        geom_for_voronoi = geom
        if densify_distance != 0:
            if densify_distance > 0:
                max_segment_length = densify_distance
            elif compactness(geom) < 0.001:
                max_segment_length = 0
            else:
                average_width_val = average_width(geom)
                max_segment_length = abs(densify_distance) * average_width_val
                factor_increase = (geom.length / max(max_segment_length, 1e-300)) / max(
                    geom.num_coordinates, 1
                )
                if factor_increase > 10:
                    max_segment_length *= factor_increase / 10
            if max_segment_length > 0:
                densified = segmentize(geom, max_segment_length)
                if densified is not None and not densified.is_empty:
                    min_area = min(geom.area, densified.area)
                    max_area = max(geom.area, densified.area)
                    if max_area > 0 and (max_area - min_area) / max_area <= 0.1:
                        geom_for_voronoi = densified

        # reference ladder (_centerline.py:147-159): remove_repeated_points
        # at ABSOLUTE 1e-8 (ring collapse → set_precision retry), and keep
        # the deduped geometry only if it is non-empty and still valid —
        # that validity gate is what lets micro-scale features (the 3e-10
        # sliver golden) keep their original vertices while real-world
        # lon/lat polygons with 1e-9-spaced vertices get the cleanup.
        deduped, collapsed = _remove_repeated_points_poly(geom_for_voronoi, 1e-8)
        if collapsed:
            deduped = _set_precision_poly(geom_for_voronoi, 1e-8)
        if deduped is not None and not deduped.is_empty:
            from pygeoops_ray.geo.validity import is_valid

            changed = deduped.num_coordinates != geom_for_voronoi.num_coordinates
            if not changed or is_valid(deduped):
                geom_for_voronoi = deduped

        # then drop (near-)exact duplicates among the site points as pure
        # numerical conditioning for the exact-arithmetic Voronoi
        bc = g.get_coordinates(geom_for_voronoi)
        extent = float(np.ptp(bc[:, :2], axis=0).max()) if len(bc) else 0.0
        boundary_pts = _dedup_coords(bc, tol=1e-12 * (1.0 + extent))
        segs = voronoi_edges(boundary_pts)

        # keep only edges inside the polygon (reference: prepared contains)
        kept = _edges_inside(geom, segs)
        if len(kept) == 1:
            lines = g.LineString(kept[0])
        elif len(kept) > 1:
            lines = line_merge(g.MultiLineString([g.LineString(s) for s in kept]))
        else:
            # no edge fully inside: intersect edges with the polygon instead
            # (reference fallback, _centerline.py:185-187)
            runs = []
            for s in segs:
                runs.extend(_segment_polygon_intersection(np.asarray(s), geom))
            if not runs:
                # fully degenerate input (e.g. a sliver whose deduped boundary
                # has < 3 points): return a valid zero-length line at the
                # first shell vertex rather than an empty geometry — the
                # reference's "return a valid line anyway" contract and its
                # 'Became GeometryCollection' golden (test_centerline.py:141)
                p0 = g.get_coordinates(geom)[0, :2]
                return g.LineString([p0, p0])
            lines = line_merge(g.MultiLineString([g.LineString(r) for r in runs]))

        min_branch_cur = min_branch_length
        if min_branch_cur < 0:
            if average_width_val is None:
                average_width_val = average_width(geom)
            min_branch_cur = abs(min_branch_cur) * average_width_val
        if min_branch_cur > 0:
            lines = _remove_short_branches_notempty(lines, min_branch_cur)

        if simplifytolerance is not None:
            tol = simplifytolerance
            if simplifytolerance < 0:
                if average_width_val is None:
                    average_width_val = average_width(geom)
                tol = abs(simplifytolerance) * average_width_val
            if tol > 0:
                lines = _simplify_lines_rdp(lines, tol)

        if extend:
            lines = extend_line_to_geometry(lines, geom)

        return normalize_lines(lines)
    except Exception as ex:
        raise type(ex)(f"Error for geometry {format_short(geom)}: {ex}") from ex


def _edges_inside(poly: g.Geometry, segs: np.ndarray) -> list[np.ndarray]:
    """Voronoi segments fully inside the polygon (midpoint + endpoints test
    with a boundary-crossing check against an STRtree of boundary segments)."""
    if len(segs) == 0:
        return []
    polys = predicates._polygons_of(poly)
    if not polys:
        return []
    # boundary segment tree
    bsegs = []
    for p in polys:
        for r in p.rings:
            for i in range(len(r) - 1):
                bsegs.append((r[i, 0], r[i, 1], r[i + 1, 0], r[i + 1, 1]))
    barr = np.array(bsegs)
    bbox = np.column_stack(
        [
            np.minimum(barr[:, 0], barr[:, 2]),
            np.minimum(barr[:, 1], barr[:, 3]),
            np.maximum(barr[:, 0], barr[:, 2]),
            np.maximum(barr[:, 1], barr[:, 3]),
        ]
    )

    # vectorized midpoint-inside prefilter across ALL candidate segments
    mids = (segs[:, 0, :] + segs[:, 1, :]) / 2.0
    inside_any = np.zeros(len(segs), dtype=bool)
    for p in polys:
        inside_any |= predicates.points_in_polygon(p, mids) == 1
    candidates = np.nonzero(inside_any)[0]
    if len(candidates) == 0:
        return []

    # candidate-vs-boundary crossing: y-binned bbox pair generation (a dense
    # (N x M) overlap matrix thrashes memory once both sides are large; the
    # bin pairs are a SUPERSET of the bbox-overlapping pairs and the exact
    # orientation tests below decide, so results are identical), then exact
    # orientation tests over the surviving pairs
    cs = segs[candidates]  # (N,2,2)
    a1 = cs[:, 0, :]
    a2 = cs[:, 1, :]
    b1 = barr[:, :2]
    b2 = barr[:, 2:]
    eps = 1e-12 * (1.0 + np.abs(barr).max())
    aminx = np.minimum(a1[:, 0], a2[:, 0])
    amaxx = np.maximum(a1[:, 0], a2[:, 0])
    aminy = np.minimum(a1[:, 1], a2[:, 1])
    amaxy = np.maximum(a1[:, 1], a2[:, 1])
    nseg = len(barr)
    ncand = len(cs)
    if ncand * nseg <= 2_000_000:
        ovl = (
            (aminx[:, None] <= bbox[None, :, 2] + eps)
            & (bbox[None, :, 0] <= amaxx[:, None] + eps)
            & (aminy[:, None] <= bbox[None, :, 3] + eps)
            & (bbox[None, :, 1] <= amaxy[:, None] + eps)
        )
        ii, jj = np.nonzero(ovl)
    else:
        # bins over the boundary-segment y-span; each boundary segment is
        # registered in every bin its span ± eps touches, each candidate
        # pairs with the bins its own span touches
        ylo = float((bbox[:, 1] - eps).min())
        yhi = float((bbox[:, 3] + eps).max())
        if yhi <= ylo:
            yhi = ylo + 1.0
        nbins = int(np.clip(nseg // 8, 16, 4096))
        width = (yhi - ylo) / nbins
        sb0 = np.clip(((bbox[:, 1] - eps - ylo) / width).astype(np.int64), 0, nbins - 1)
        sb1 = np.clip(((bbox[:, 3] + eps - ylo) / width).astype(np.int64), 0, nbins - 1)
        sreps = sb1 - sb0 + 1
        seg_flat = np.repeat(np.arange(nseg), sreps)
        soffs = np.concatenate([[0], np.cumsum(sreps)[:-1]])
        seg_bin = np.repeat(sb0, sreps) + (
            np.arange(int(sreps.sum())) - np.repeat(soffs, sreps)
        )
        sorder = np.argsort(seg_bin, kind="stable")
        seg_flat = seg_flat[sorder]
        bstarts = np.searchsorted(seg_bin[sorder], np.arange(nbins + 1))

        cb0 = np.clip(((aminy - eps - ylo) / width).astype(np.int64), 0, nbins - 1)
        cb1 = np.clip(((amaxy + eps - ylo) / width).astype(np.int64), 0, nbins - 1)
        # candidates fully outside the boundary span cannot cross anything
        span_ok = (amaxy >= ylo - eps) & (aminy <= yhi + eps)
        cb0 = np.where(span_ok, cb0, 0)
        cb1 = np.where(span_ok, cb1, -1)  # empty range
        creps = np.maximum(cb1 - cb0 + 1, 0)
        cand_flat = np.repeat(np.arange(ncand), creps)
        coffs = np.concatenate([[0], np.cumsum(creps)[:-1]])
        cand_bin = np.repeat(cb0, creps) + (
            np.arange(int(creps.sum())) - np.repeat(coffs, creps)
        )
        pair_cnt = bstarts[cand_bin + 1] - bstarts[cand_bin]
        total = int(pair_cnt.sum())
        ii = np.repeat(cand_flat, pair_cnt)
        poffs = np.concatenate([[0], np.cumsum(pair_cnt)[:-1]])
        jj = seg_flat[
            np.repeat(bstarts[cand_bin], pair_cnt)
            + (np.arange(total) - np.repeat(poffs, pair_cnt))
        ]
        # exact bbox test on the (chunk-bounded) pairs; duplicates from a
        # segment spanning several of a candidate's bins are harmless (the
        # crossing accumulator is a logical OR)
        keep = (
            (aminx[ii] <= bbox[jj, 2] + eps)
            & (bbox[jj, 0] <= amaxx[ii] + eps)
            & (aminy[ii] <= bbox[jj, 3] + eps)
            & (bbox[jj, 1] <= amaxy[ii] + eps)
        )
        ii = ii[keep]
        jj = jj[keep]
    crossed = np.zeros(len(cs), dtype=bool)
    if len(ii):
        p1 = a1[ii]
        p2 = a2[ii]
        q1 = b1[jj]
        q2 = b2[jj]

        def orient(ax, ay, bx, by, cx, cy):
            return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

        d1 = orient(q1[:, 0], q1[:, 1], q2[:, 0], q2[:, 1], p1[:, 0], p1[:, 1])
        d2 = orient(q1[:, 0], q1[:, 1], q2[:, 0], q2[:, 1], p2[:, 0], p2[:, 1])
        d3 = orient(p1[:, 0], p1[:, 1], p2[:, 0], p2[:, 1], q1[:, 0], q1[:, 1])
        d4 = orient(p1[:, 0], p1[:, 1], p2[:, 0], p2[:, 1], q2[:, 0], q2[:, 1])
        proper = (((d1 > eps) & (d2 < -eps)) | ((d1 < -eps) & (d2 > eps))) & (
            ((d3 > eps) & (d4 < -eps)) | ((d3 < -eps) & (d4 > eps))
        )

        def on_seg(px, py, sx1, sy1, sx2, sy2):
            return (
                (np.minimum(sx1, sx2) - eps <= px)
                & (px <= np.maximum(sx1, sx2) + eps)
                & (np.minimum(sy1, sy2) - eps <= py)
                & (py <= np.maximum(sy1, sy2) + eps)
            )

        touch = (
            ((np.abs(d1) <= eps) & on_seg(p1[:, 0], p1[:, 1], q1[:, 0], q1[:, 1], q2[:, 0], q2[:, 1]))
            | ((np.abs(d2) <= eps) & on_seg(p2[:, 0], p2[:, 1], q1[:, 0], q1[:, 1], q2[:, 0], q2[:, 1]))
            | ((np.abs(d3) <= eps) & on_seg(q1[:, 0], q1[:, 1], p1[:, 0], p1[:, 1], p2[:, 0], p2[:, 1]))
            | ((np.abs(d4) <= eps) & on_seg(q2[:, 0], q2[:, 1], p1[:, 0], p1[:, 1], p2[:, 0], p2[:, 1]))
        )
        np.logical_or.at(crossed, ii, proper | touch)

    return [np.asarray(cs[k]) for k in np.nonzero(~crossed)[0]]


def _segment_polygon_intersection(seg: np.ndarray, poly: g.Geometry) -> list[np.ndarray]:
    """Portions of segment p0-p1 inside the polygon: split at boundary hits,
    keep sub-segments whose midpoints are interior (or boundary)."""
    p0, p1 = seg[0], seg[1]
    polys = predicates._polygons_of(poly)
    ts = [0.0, 1.0]
    d = p1 - p0
    seg_len2 = float(d[0] * d[0] + d[1] * d[1])
    if seg_len2 == 0:
        return []
    for p in polys:
        for r in p.rings:
            for i in range(len(r) - 1):
                for ip in predicates.segment_intersection_points(
                    p0, p1, r[i, :2], r[i + 1, :2]
                ):
                    t = ((ip[0] - p0[0]) * d[0] + (ip[1] - p0[1]) * d[1]) / seg_len2
                    ts.append(min(max(t, 0.0), 1.0))
    ts = sorted(set(ts))
    out = []
    for t0, t1 in zip(ts[:-1], ts[1:]):
        if t1 - t0 < 1e-12:
            continue
        mid = p0 + (t0 + t1) / 2 * d
        if any(predicates.point_in_polygon(p, mid[0], mid[1]) >= 0 for p in polys):
            out.append(np.array([p0 + t0 * d, p0 + t1 * d]))
    return out


def _simplify_lines_rdp(lines: g.Geometry, tol: float) -> g.Geometry:
    def simp(ln: g.LineString) -> g.LineString:
        idx = simplify_coords_rdp_idx(ln.coords[:, :2], tol)
        return g.LineString(ln.coords[idx])

    if isinstance(lines, g.LineString):
        return simp(lines)
    if isinstance(lines, g.MultiLineString):
        return g.MultiLineString([simp(p) for p in lines.geoms])
    return lines


def _remove_short_branches_notempty(line, min_branch_length: float):
    if line is None or isinstance(line, g.LineString) or min_branch_length <= 0:
        return line
    cleaned = _remove_short_branches(line, min_branch_length, remove_one_by_one=False)
    if cleaned is None or cleaned.is_empty:
        cleaned = _remove_short_branches(line, min_branch_length, remove_one_by_one=True)
    if cleaned is None or cleaned.is_empty:
        cleaned = line
    return cleaned


def _remove_short_branches(line, min_branch_length: float, remove_one_by_one: bool):
    if line is None or isinstance(line, g.LineString) or min_branch_length <= 0:
        return line
    # normalize before pruning (reference _centerline.py:307): among
    # equal-length branch candidates the stable length sort then follows the
    # normalized part order, which decides WHICH tied branch goes first
    cleaned = normalize_lines(line)
    while isinstance(cleaned, g.MultiLineString):
        parts = list(cleaned.geoms)
        boxes = np.array([p.bounds for p in parts])
        tree = STRtree(boxes)
        order = sorted(range(len(parts)), key=lambda i: parts[i].length)
        to_remove: list[int] = []
        for idx in order:
            part = parts[idx]
            if part.length >= min_branch_length:
                continue
            adjacency = []
            for endpoint in (part.coords[0, :2], part.coords[-1, :2]):
                pt = g.Point(endpoint[0], endpoint[1])
                touching = False
                for ni in tree.query_point(endpoint[0], endpoint[1]):
                    if ni == idx:
                        continue
                    if predicates.intersects(parts[ni], pt):
                        touching = True
                        break
                adjacency.append(touching)
            if adjacency[0] != adjacency[1]:  # dangling short branch
                to_remove.append(idx)
                if remove_one_by_one:
                    break
        if not to_remove:
            break
        remaining = [p for i, p in enumerate(parts) if i not in set(to_remove)]
        if not remaining:
            return g.MultiLineString()
        cleaned = line_merge(g.MultiLineString(remaining))
    return cleaned
