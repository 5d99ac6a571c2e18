"""Delaunay triangulation (Bowyer-Watson) and its Voronoi-edge dual.

The centerline kernel's engine (the reference delegates to GEOS
``voronoi_polygons(only_edges=True)``, _centerline.py:163). Implemented from
the classic Bowyer-Watson incremental algorithm with a visibility-walk point
location + BFS cavity search over an incrementally-maintained edge-adjacency
map (expected O(n log n) with the spatially-coherent insertion order), with a
vectorized full circumcircle scan as a per-point robustness fallback whenever
the walk fails to land on a containing triangle.

Only finite Voronoi edges (between circumcenters of adjacent triangles) are
emitted — the infinite hull rays would be dropped by the centerline's
containment filter anyway.
"""

from __future__ import annotations

import numpy as np

__all__ = ["delaunay", "voronoi_edges"]


def _circum_exact(ax, ay, bx, by, kx, ky):
    """Exact circumcenter for triangles where the double-precision formula
    loses the answer to cancellation.

    Fast path: every finite float is an integer mantissa times a power of two,
    so scaling all six coordinates by a common 2**k makes them exact integers;
    the circumcenter is then a ratio of big ints (the 2**k factors cancel to a
    single ldexp) and Python's int division is correctly rounded — bit-equal
    to the Fraction result at ~23x less cost. Fraction remains the fallback
    for the (unreachable at survey scale) ldexp overflow."""
    import math

    coords = (ax, ay, bx, by, kx, ky)
    k = max((53 - math.frexp(x)[1]) if x != 0.0 else 0 for x in coords)
    try:
        ai, ayi, bi, byi, ki, kyi = (int(math.ldexp(x, k)) for x in coords)
    except (OverflowError, ValueError):
        from fractions import Fraction as F

        fax, fay, fbx, fby, fkx, fky = (F(x) for x in coords)
        d = 2 * (fax * (fby - fky) + fbx * (fky - fay) + fkx * (fay - fby))
        if d == 0:
            return None, None
        a2 = fax * fax + fay * fay
        b2 = fbx * fbx + fby * fby
        k2 = fkx * fkx + fky * fky
        ux = (a2 * (fby - fky) + b2 * (fky - fay) + k2 * (fay - fby)) / d
        uy = (a2 * (fkx - fbx) + b2 * (fax - fkx) + k2 * (fbx - fax)) / d
        return float(ux), float(uy)
    d = 2 * (ai * (byi - kyi) + bi * (kyi - ayi) + ki * (ayi - byi))
    if d == 0:
        return None, None
    a2 = ai * ai + ayi * ayi
    b2 = bi * bi + byi * byi
    k2 = ki * ki + kyi * kyi
    nx = a2 * (byi - kyi) + b2 * (kyi - ayi) + k2 * (ayi - byi)
    ny = a2 * (ki - bi) + b2 * (ai - ki) + k2 * (bi - ai)
    return math.ldexp(nx / d, -k), math.ldexp(ny / d, -k)


def _int_scale(*coords):
    """Scale floats by a common 2**k to exact integers (see _circum_exact)."""
    import math

    k = max((53 - math.frexp(x)[1]) if x != 0.0 else 0 for x in coords)
    return k, [int(math.ldexp(x, k)) for x in coords]


def _incircle_strict(ax, ay, bx, by, cx, cy, px, py):
    """True iff p is STRICTLY inside the circumcircle of CCW-or-CW triangle
    (a, b, c); cocircular points are OUTSIDE (the Lawson-flip tie rule).

    Float determinant with a conservative forward-error bound; near-tie
    cases fall through to an exact integer determinant (coordinates scaled
    by a common power of two — every finite float becomes an exact int).
    The sign is normalized by the triangle's orientation so callers don't
    need CCW input.
    """
    adx = ax - px
    ady = ay - py
    bdx = bx - px
    bdy = by - py
    cdx = cx - px
    cdy = cy - py
    ad2 = adx * adx + ady * ady
    bd2 = bdx * bdx + bdy * bdy
    cd2 = cdx * cdx + cdy * cdy
    m1 = bdx * cdy - cdx * bdy
    m2 = cdx * ady - adx * cdy
    m3 = adx * bdy - bdx * ady
    det = ad2 * m1 + bd2 * m2 + cd2 * m3
    perm = (
        ad2 * (abs(bdx * cdy) + abs(cdx * bdy))
        + bd2 * (abs(cdx * ady) + abs(adx * cdy))
        + cd2 * (abs(adx * bdy) + abs(bdx * ady))
    )
    orient = m1 + m2 + m3  # == 2 * signed area of (a, b, c)
    operm = (
        abs(bdx * cdy) + abs(cdx * bdy)
        + abs(cdx * ady) + abs(adx * cdy)
        + abs(adx * bdy) + abs(bdx * ady)
    )
    if abs(det) > 1e-12 * perm and abs(orient) > 1e-12 * operm:
        return (det > 0) == (orient > 0)
    # exact path: integer subtraction THEN integer determinant
    _, (axi, ayi, bxi, byi, cxi, cyi, pxi, pyi) = _int_scale(
        ax, ay, bx, by, cx, cy, px, py
    )
    adxi = axi - pxi
    adyi = ayi - pyi
    bdxi = bxi - pxi
    bdyi = byi - pyi
    cdxi = cxi - pxi
    cdyi = cyi - pyi
    m1i = bdxi * cdyi - cdxi * bdyi
    m2i = cdxi * adyi - adxi * cdyi
    m3i = adxi * bdyi - bdxi * adyi
    deti = (
        (adxi * adxi + adyi * adyi) * m1i
        + (bdxi * bdxi + bdyi * bdyi) * m2i
        + (cdxi * cdxi + cdyi * cdyi) * m3i
    )
    orienti = m1i + m2i + m3i
    if deti == 0 or orienti == 0:
        return False  # cocircular or degenerate: strictly-outside tie rule
    return (deti > 0) == (orienti > 0)


def _incircle_sign(ax, ay, bx, by, cx, cy, px, py):
    """Exact sign of the incircle determinant normalized by orientation:
    +1 = p strictly inside the circumcircle of (a, b, c), 0 = cocircular,
    -1 = strictly outside. Degenerate (collinear) triangles return +1,
    matching the float path's ``inf <= inf`` always-bad semantics.

    Coordinates are scaled by a common power of two to exact integers, so
    the determinant is computed without rounding (see _int_scale)."""
    _, (axi, ayi, bxi, byi, cxi, cyi, pxi, pyi) = _int_scale(
        ax, ay, bx, by, cx, cy, px, py
    )
    adx = axi - pxi
    ady = ayi - pyi
    bdx = bxi - pxi
    bdy = byi - pyi
    cdx = cxi - pxi
    cdy = cyi - pyi
    m1 = bdx * cdy - cdx * bdy
    m2 = cdx * ady - adx * cdy
    m3 = adx * bdy - bdx * ady
    det = (
        (adx * adx + ady * ady) * m1
        + (bdx * bdx + bdy * bdy) * m2
        + (cdx * cdx + cdy * cdy) * m3
    )
    orient = m1 + m2 + m3
    if orient == 0:
        return 1
    if det == 0:
        return 0
    return 1 if (det > 0) == (orient > 0) else -1


# Relative uncertainty band for the cached-circumcircle float cavity test:
# when |d2 - r^2| is within this fraction of (d2 + r^2) the float comparison
# can be wrong (huge near-degenerate circumcircles cancel the signal — a
# point 0.003 units inside the hull edge of a 4-point fan was classified
# outside, dropping a sliver triangle from the cavity) and the exact integer
# predicate decides instead.
_INCIRCLE_TOL = 1e-6

# Strict (GEOS-style Lawson) cocircular tie rule for the Bowyer-Watson
# cavity test. Default False: the shipped goldens (square 4-way tie et al.)
# are pinned on the inclusive <= semantics.
STRICT_INCIRCLE = False

# Insertion order. "brio" (default): randomized geometric rounds + Hilbert
# order within rounds (Amenta-Choi-Rote) — the performance-correct order.
# "lex": lexicographic (x, y) site order, replaying JTS/GEOS's
# DelaunayTriangulationBuilder (sites are unique'd through a sorted set and
# inserted in iteration order) — an experiment knob for golden parity on
# insertion-order-dependent degenerate fans (SURVEY §8.3.1).
INSERTION_ORDER = "brio"


def _covers_hull(pts: np.ndarray, tris: np.ndarray) -> bool:
    """True iff the triangle areas sum to the convex-hull area (within a
    span-relative tolerance). A deficit means the finite super triangle sat
    inside the circumcircle of a near-degenerate hull sliver — the classic
    finite-super Bowyer-Watson artifact (a point h from a hull edge of
    length L has circumradius ~L^2/(8h), unbounded as h -> 0) — and the
    caller must retry with a larger super triangle."""
    minx, miny = pts.min(axis=0)
    maxx, maxy = pts.max(axis=0)
    span = max(maxx - minx, maxy - miny, 1e-9)
    if len(tris) == 0:
        tri_area = 0.0
    else:
        a, b, c = pts[tris[:, 0]], pts[tris[:, 1]], pts[tris[:, 2]]
        tri_area = (
            np.abs(
                (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
                - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
            ).sum()
            / 2
        )
    # monotone-chain hull + shoelace
    P = sorted(set(map(tuple, pts.tolist())))
    if len(P) < 3:
        return True

    def half(ps):
        h = []
        for p in ps:
            while len(h) >= 2 and (
                (h[-1][0] - h[-2][0]) * (p[1] - h[-2][1])
                - (h[-1][1] - h[-2][1]) * (p[0] - h[-2][0])
            ) <= 0:
                h.pop()
            h.append(p)
        return h

    hull = half(P)[:-1] + half(P[::-1])[:-1]
    hull_area = 0.0
    for q in range(len(hull)):
        x0, y0 = hull[q - 1]
        x1, y1 = hull[q]
        hull_area += x0 * y1 - x1 * y0
    hull_area = abs(hull_area) / 2
    return hull_area - tri_area <= 1e-9 * span * span


def delaunay(points: np.ndarray) -> np.ndarray:
    """Delaunay triangles of (N,2) points; returns (M,3) vertex index array.

    Input is centered on its mean before triangulating: survey-scale
    coordinates (1e5) with micro-scale extents otherwise lose the circumcircle
    test to catastrophic cancellation.

    The finite super triangle is grown geometrically until the result tiles
    the convex hull (see _covers_hull): near-degenerate hull slivers have
    circumradii that can exceed any fixed super size, and a super vertex
    inside such a circumcircle silently drops the sliver from the output.
    """
    pts = np.asarray(points, dtype=np.float64)[:, :2]
    n = len(pts)
    if n < 3:
        return np.zeros((0, 3), dtype=np.int64)
    pts = pts - np.floor(pts.mean(axis=0))  # integer shift: exact in floats
    mult = 1000.0
    for _ in range(6):
        tris = _delaunay_core(pts, mult)
        if _covers_hull(pts, tris):
            return tris
        mult *= 4096.0
    return tris


def _delaunay_core(pts: np.ndarray, size_mult: float) -> np.ndarray:
    """One Bowyer-Watson pass with the super triangle at size_mult x extent."""
    n = len(pts)

    # super-triangle
    minx, miny = pts.min(axis=0)
    maxx, maxy = pts.max(axis=0)
    cx, cy = (minx + maxx) / 2, (miny + maxy) / 2
    size = max(maxx - minx, maxy - miny, 1e-9) * size_mult
    sup = np.array(
        [[cx - 2 * size, cy - size], [cx + 2 * size, cy - size], [cx, cy + 2 * size]]
    )
    all_pts = np.concatenate([pts, sup], axis=0)
    si = n  # super vertex indices n, n+1, n+2

    # pure-python triangle store: scalar list access/append beats numpy
    # scalar indexing/assignment ~5x in the insertion/walk/BFS hot loops
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

    vlist: list[tuple[int, int, int]] = []
    circ_l: list[tuple[float, float, float]] = []  # (ccx, ccy, r^2) per tri
    alive_l: list[bool] = []
    # edge-adjacency: sorted vertex pair -> alive triangle ids (1 or 2)
    emap: dict[tuple[int, int], list[int]] = {}
    vlist_append = vlist.append
    circ_append = circ_l.append
    alive_append = alive_l.append
    emap_get = emap.get

    def add_tri(a, b, p):
        # store CCW so the visibility walk's right-of-edge test is consistent
        if (xl[b] - xl[a]) * (yl[p] - yl[a]) - (yl[b] - yl[a]) * (xl[p] - xl[a]) < 0:
            a, b = b, a
        t = len(alive_l)
        vlist_append((a, b, p))
        circ_append(circum(a, b, p))
        alive_append(True)
        key = (a, b) if a < b else (b, a)
        lst = emap_get(key)
        if lst is None:
            emap[key] = [t]
        else:
            lst.append(t)
        key = (b, p) if b < p else (p, b)
        lst = emap_get(key)
        if lst is None:
            emap[key] = [t]
        else:
            lst.append(t)
        key = (p, a) if p < a else (a, p)
        lst = emap_get(key)
        if lst is None:
            emap[key] = [t]
        else:
            lst.append(t)
        return t

    add_tri(si, si + 1, si + 2)
    last = 0

    def locate(px, py):
        """Visibility walk from the last-created triangle; None on failure."""
        t = last
        if not alive_l[t]:
            return None
        max_steps = 200 + 4 * int(np.sqrt(len(vlist)))
        for step in range(max_steps):
            tv = vlist[t]
            nxt = -1
            for e in range(3):
                a = tv[e]
                b = tv[e - 2]  # (e+1) % 3 without the modulo
                if (xl[b] - xl[a]) * (py - yl[a]) - (yl[b] - yl[a]) * (px - xl[a]) < 0:
                    key = (a, b) if a < b else (b, a)
                    ts = emap_get(key)
                    if ts is None:
                        return None
                    for cand in ts:
                        if cand != t:
                            nxt = cand
                            break
                    if nxt >= 0:
                        break
                    return None  # hull edge crossed: outside (shouldn't happen)
            if nxt < 0:
                return t  # no edge has p strictly outside: containing triangle
            t = nxt
        return None

    # BRIO insertion order (Amenta-Choi-Rote 2003): geometric random round
    # assignment — coarse rounds first — with Hilbert-curve order inside each
    # round. Hilbert order alone keeps the walk local but has no structural
    # bound: on points sampled along smooth near-collinear chains (corridor
    # boundaries) prefix triangulations carry giant circumcircles and the
    # per-insertion cavity averaged 35 triangles; the randomized rounds
    # restore the expected-O(n) total structural change of random insertion
    # while the within-round Hilbert order keeps walks short (measured 4.6x
    # on a 24k-point corridor; pure-random order walks 50x slower). Fixed
    # seed: deterministic across runs and machines.
    from pygeoops_ray.cellindex import hilbert_xy2d

    span = max(maxx - minx, maxy - miny, 1e-9)
    if INSERTION_ORDER == "lex":
        order = np.lexsort((pts[:, 1], pts[:, 0]))
    else:
        hx = ((pts[:, 0] - minx) / span * 1023).astype(np.int64).clip(0, 1023)
        hy = ((pts[:, 1] - miny) / span * 1023).astype(np.int64).clip(0, 1023)
        hkey = hilbert_xy2d(10, hx, hy)
        rounds = np.random.default_rng(0).geometric(0.5, size=n)
        order = np.lexsort((hkey, -rounds))
    seen_xy: set[tuple[float, float]] = set()
    for p in order.tolist():
        px = xl[p]
        py = yl[p]
        # exact-duplicate points: drop (insertion-order independent; the
        # carve-the-twin's-fan path depends on on-circle float ties)
        if (px, py) in seen_xy:
            continue
        seen_xy.add((px, py))
        t0 = locate(px, py)
        bad_list: list[int]
        strict = STRICT_INCIRCLE

        def tri_strict(t):
            i, j, k2 = vlist[t]
            return _incircle_strict(
                xl[i], yl[i], xl[j], yl[j], xl[k2], yl[k2], px, py
            )

        def tri_bad(t):
            # inclusive (ties-inside) cavity test: cached float circumcircle
            # when the signal is clear, exact integer incircle in the
            # uncertainty band (huge sliver circumcircles cancel the float
            # difference — see _INCIRCLE_TOL)
            ux, uy, rr = circ_l[t]
            d2 = (px - ux) ** 2 + (py - uy) ** 2
            diff = d2 - rr
            if diff == diff and abs(diff) > _INCIRCLE_TOL * (d2 + rr):
                return diff <= 0
            i, j, k2 = vlist[t]
            return (
                _incircle_sign(xl[i], yl[i], xl[j], yl[j], xl[k2], yl[k2], px, py)
                >= 0
            )

        if t0 is not None:
            if strict:
                # strict tie rule: the CONTAINING triangle is always in the
                # cavity (split-then-flip semantics — a point lying exactly
                # on its own triangle's circumcircle must still insert)
                in0 = True
            else:
                in0 = tri_bad(t0)
        else:
            in0 = False
        if in0:
            # BFS over edge-neighbors: the bad region is connected and
            # contains the containing triangle (same <= predicate as the
            # full scan, so cocircular tie semantics are identical)
            bad_list = []
            bad_append = bad_list.append
            seen = {t0}
            seen_add = seen.add
            stack = [t0]
            stack_pop = stack.pop
            stack_append = stack.append
            while stack:
                t = stack_pop()
                if strict:
                    bad = t == t0 or tri_strict(t)
                else:
                    bad = tri_bad(t)
                if bad:
                    bad_append(t)
                    i, j, k = vlist[t]
                    for u, v in ((i, j), (j, k), (k, i)):
                        key = (u, v) if u < v else (v, u)
                        for nb in emap[key]:
                            if nb not in seen:
                                seen_add(nb)
                                stack_append(nb)
        else:
            # walk failed (degenerate geometry / duplicate point): exact
            # fallback — vectorized circumcircle scan over all live triangles
            # (arrays built on demand; this path is rare, the walk covers the
            # regular case)
            circ = np.array(circ_l)
            aalive = np.array(alive_l, dtype=bool)
            d2 = (px - circ[:, 0]) ** 2 + (py - circ[:, 1]) ** 2
            if strict:
                cand = np.nonzero(
                    aalive & (d2 <= circ[:, 2] * (1 + 1e-9) + 1e-30)
                )[0].tolist()
                bad_list = [t for t in cand if tri_strict(t)]
            else:
                rr = circ[:, 2]
                diff = d2 - rr
                with np.errstate(invalid="ignore"):
                    scale_ = d2 + rr
                    badmask = aalive & (diff <= -_INCIRCLE_TOL * scale_)
                    unsure = (
                        aalive
                        & ~badmask
                        & (
                            (np.abs(diff) <= _INCIRCLE_TOL * scale_)
                            | ~np.isfinite(diff)
                        )
                    )
                for t in np.nonzero(unsure)[0].tolist():
                    if tri_bad(t):
                        badmask[t] = True
                bad_list = np.nonzero(badmask)[0].tolist()
            if not bad_list:
                continue  # degenerate duplicate point
        # kill the cavity and count its edges in one pass: edges appearing
        # exactly once among the bad triangles form the cavity boundary
        edges: dict[tuple[int, int], int] = {}
        edges_get = edges.get
        for t in bad_list:
            alive_l[t] = False
            i, j, k = vlist[t]
            for a, b in ((i, j), (j, k), (k, i)):
                key = (a, b) if a < b else (b, a)
                edges[key] = edges_get(key, 0) + 1
                lst = emap[key]
                lst.remove(t)
                if not lst:
                    del emap[key]
        for (a, b), cnt in edges.items():
            if cnt == 1:
                last = add_tri(a, b, p)

    tris = np.array(
        [tv for t, tv in enumerate(vlist) if alive_l[t]], dtype=np.int64
    ).reshape(-1, 3)
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

    # vectorized edge-pair extraction. Emission order reproduces the previous
    # dict-of-first-occurrence order exactly (downstream line_merge keeps
    # leftover loops in input order, so segment order is golden-pinned):
    # edges are grouped by sorted vertex pair via a stable lexsort, and the
    # final segments are emitted in order of each edge's first appearance in
    # the (triangle-ascending, (i,j),(j,k),(k,i)) flat enumeration.
    T = len(tris)
    ev = np.empty((3 * T, 2), dtype=np.int64)
    ev[0::3] = tris[:, [0, 1]]
    ev[1::3] = tris[:, [1, 2]]
    ev[2::3] = tris[:, [2, 0]]
    lo = np.minimum(ev[:, 0], ev[:, 1])
    hi = np.maximum(ev[:, 0], ev[:, 1])
    order_ = np.lexsort((lo, hi))  # stable: equal edges keep appearance order
    slo, shi = lo[order_], hi[order_]
    new_grp = np.empty(3 * T, dtype=bool)
    new_grp[0] = True
    new_grp[1:] = (slo[1:] != slo[:-1]) | (shi[1:] != shi[:-1])
    starts = np.nonzero(new_grp)[0]
    counts = np.diff(np.append(starts, 3 * T))
    first_flat = order_[starts]  # stable sort → first element = first seen
    t_of = order_ // 3

    # envelope scale for the unbounded hull rays (GEOS clips its diagram to an
    # expanded envelope; the centerline containment filter clips further)
    minx, miny = pts.min(axis=0)
    maxx, maxy = pts.max(axis=0)
    ray_len = 2.0 * max(maxx - minx, maxy - miny, 1e-9)

    finite = np.all(np.isfinite(centers), axis=1)
    ngrp = len(starts)
    seg_out = np.zeros((ngrp, 2, 2))
    valid = np.zeros(ngrp, dtype=bool)

    # interior edges: two adjacent triangles → segment between circumcenters
    pair_g = np.nonzero(counts == 2)[0]
    if len(pair_g):
        t0 = t_of[starts[pair_g]]
        t1 = t_of[starts[pair_g] + 1]
        p0 = centers[t0]
        p1 = centers[t1]
        ok = (
            finite[t0]
            & finite[t1]
            & (
                (np.abs(p0[:, 0] - p1[:, 0]) > 1e-11)
                | (np.abs(p0[:, 1] - p1[:, 1]) > 1e-11)
            )
        )
        seg_out[pair_g, 0] = p0
        seg_out[pair_g, 1] = p1
        valid[pair_g] = ok

    # hull edges: unbounded Voronoi ray from the circumcenter, perpendicular
    # to the edge, away from the opposite vertex
    hull_g = np.nonzero(counts == 1)[0]
    if len(hull_g):
        flat = first_flat[hull_g]
        t = flat // 3
        e = flat % 3
        third = tris[t, (e + 2) % 3]
        a_pt = pts[ev[flat, 0]]
        b_pt = pts[ev[flat, 1]]
        c_pt = pts[third]
        cc = centers[t]
        mid = (a_pt + b_pt) / 2
        dv = b_pt - a_pt
        nv = np.column_stack([-dv[:, 1], dv[:, 0]])
        nn = np.hypot(nv[:, 0], nv[:, 1])
        ok = finite[t] & (nn != 0)
        nn_safe = np.where(nn == 0, 1.0, nn)
        nv = nv / nn_safe[:, None]
        flip = (nv * (c_pt - mid)).sum(axis=1) > 0
        nv[flip] = -nv[flip]
        seg_out[hull_g, 0] = cc
        seg_out[hull_g, 1] = cc + nv * ray_len
        valid[hull_g] = ok

    perm = np.argsort(first_flat, kind="stable")
    segs = seg_out[perm][valid[perm]]
    if len(segs) == 0:
        return np.zeros((0, 2, 2))
    return segs + center  # un-center back to world coordinates
