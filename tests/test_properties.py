"""Property-based tests (hypothesis) for the geometry kernels.

Invariants no example corpus can pin down: boolean-op area identities on
random inputs, simplify vertex-subset property, codec roundtrips, Hilbert
bijectivity, clip containment.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pygeoops_ray.geo import boolean as B
from pygeoops_ray.geo import geom as g
from pygeoops_ray.geo import wkb, wkt

# half-unit grid: excludes denormal/ulp-scale pathologies (not a realistic
# coordinate regime) while MAXIMIZING exact shared-vertex / shared-edge /
# collinear-overlap degeneracies — the hard cases for boolean clipping
coord = st.integers(min_value=-200, max_value=200).map(lambda v: v / 2.0)


@st.composite
def rects(draw):
    x0 = draw(coord)
    y0 = draw(coord)
    w = draw(st.floats(min_value=0.5, max_value=50, width=32))
    h = draw(st.floats(min_value=0.5, max_value=50, width=32))
    return g.box(x0, y0, x0 + w, y0 + h)


@st.composite
def triangles(draw):
    pts = [(draw(coord), draw(coord)) for _ in range(3)]
    ax, ay = pts[0]
    bx, by = pts[1]
    cx, cy = pts[2]
    area2 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    if abs(area2) < 1.0:
        # degenerate: nudge into a real triangle
        cx, cy = ax + 10, ay + 17
        area2 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        if abs(area2) < 1.0:
            bx, by = ax + 13, ay + 1
    ring = [(ax, ay), (bx, by), (cx, cy)]
    from pygeoops_ray.geo.measures import ring_area

    arr = np.array(ring + [ring[0]])
    if ring_area(arr) < 0:
        ring = ring[::-1]
    return g.Polygon(ring)


@settings(max_examples=60, deadline=None)
@given(rects(), rects())
def test_boolean_inclusion_exclusion_rects(a, b):
    it = B.intersection(a, b).area
    un = B.union(a, b).area
    assert un == np.float64(un)  # finite
    assert abs(un - (a.area + b.area - it)) <= 1e-6 * max(1.0, un)
    d = B.difference(a, b).area
    assert abs(d - (a.area - it)) <= 1e-6 * max(1.0, a.area)


@settings(max_examples=40, deadline=None)
@given(triangles(), triangles())
def test_boolean_inclusion_exclusion_triangles(a, b):
    it = B.intersection(a, b).area
    un = B.union(a, b).area
    assert abs(un - (a.area + b.area - it)) <= 1e-5 * max(1.0, un)
    assert it <= min(a.area, b.area) + 1e-6


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.tuples(coord, coord), min_size=3, max_size=40),
    st.floats(min_value=0.01, max_value=10),
)
def test_simplify_line_is_vertex_subset(pts, tol):
    from pygeoops_ray.geo.simplify_kernels import simplify_coords_lang_idx

    arr = np.array(pts, dtype=np.float64)
    idx = np.asarray(simplify_coords_lang_idx(arr, tol), dtype=np.int64)
    assert idx[0] == 0 and idx[-1] == len(arr) - 1
    assert np.all(np.diff(idx) > 0)  # strictly increasing subset


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(coord, coord), min_size=2, max_size=20))
def test_wkt_wkb_roundtrip_lines(pts):
    ln = g.LineString(np.array(pts, dtype=np.float64))
    assert wkt.loads(ln.wkt).equals_exact(ln, 1e-6)
    assert wkb.loads(wkb.dumps(ln)).equals_exact(ln, 0.0)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**20 - 1), min_size=1, max_size=50))
def test_hilbert_bijective(ds):
    from pygeoops_ray.cellindex import hilbert_d2xy, hilbert_xy2d

    d = np.array(ds, dtype=np.int64)
    x, y = hilbert_d2xy(10, d % (1 << 20))
    back = hilbert_xy2d(10, x, y)
    assert np.array_equal(back, d % (1 << 20))


@settings(max_examples=40, deadline=None)
@given(rects(), rects())
def test_rect_clip_contained(poly, clip_rect):
    from pygeoops_ray.geo.clip import rect_clip

    bounds = clip_rect.bounds
    out = rect_clip(poly, bounds)
    assert out.area <= poly.area + 1e-9
    if not out.is_empty:
        ob = out.bounds
        assert ob[0] >= bounds[0] - 1e-9 and ob[2] <= bounds[2] + 1e-9
        assert ob[1] >= bounds[1] - 1e-9 and ob[3] <= bounds[3] + 1e-9


# --- Delaunay invariants (walk-based kernel: voronoi.py) --------------------


def _delaunay_violations(pts: np.ndarray, tris: np.ndarray) -> int:
    """Count (triangle, point) pairs where a point sits strictly inside a
    triangle's circumcircle — must be 0 for a Delaunay triangulation
    (strictly: beyond a cocircular tolerance)."""
    from fractions import Fraction as F

    bad = 0
    for i, j, k in tris:
        ax, ay = F(float(pts[i, 0])), F(float(pts[i, 1]))
        bx, by = F(float(pts[j, 0])), F(float(pts[j, 1]))
        cx, cy = F(float(pts[k, 0])), F(float(pts[k, 1]))
        d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        if d == 0:
            continue
        a2, b2, c2 = ax * ax + ay * ay, bx * bx + by * by, cx * cx + cy * cy
        ux = (a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / d
        uy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / d
        rr = (ax - ux) ** 2 + (ay - uy) ** 2
        for p in range(len(pts)):
            if p in (i, j, k):
                continue
            px, py = F(float(pts[p, 0])), F(float(pts[p, 1]))
            if (px - ux) ** 2 + (py - uy) ** 2 < rr:
                bad += 1
    return bad


def test_delaunay_empty_circumcircle_random():
    from pygeoops_ray.geo.voronoi import delaunay

    rng = np.random.default_rng(7)
    pts = rng.random((60, 2)) * 100
    tris = delaunay(pts)
    assert len(tris) > 0
    assert _delaunay_violations(pts, tris) == 0


def test_delaunay_cocircular_grid():
    """Integer grid: every unit square's 4 corners are cocircular — the
    triangulation must still cover the hull with 2 triangles per square."""
    from pygeoops_ray.geo.voronoi import delaunay

    xs, ys = np.meshgrid(np.arange(7.0), np.arange(5.0))
    pts = np.column_stack([xs.ravel(), ys.ravel()])
    tris = delaunay(pts)
    assert len(tris) == 2 * 6 * 4  # 2 triangles per grid cell
    # total area == hull area (no overlaps / gaps given the count)
    a, b, c = pts[tris[:, 0]], pts[tris[:, 1]], pts[tris[:, 2]]
    area = np.abs(
        (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
        - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
    ).sum() / 2
    assert area == 6 * 4


def test_delaunay_duplicates_and_collinear():
    from pygeoops_ray.geo.voronoi import delaunay

    # duplicated points must not crash or create degenerate output triangles
    base = np.array([[0.0, 0], [10, 0], [10, 10], [0, 10], [5, 5]])
    pts = np.concatenate([base, base[:2]])
    tris = delaunay(pts)
    a, b, c = pts[tris[:, 0]], pts[tris[:, 1]], pts[tris[:, 2]]
    area = np.abs(
        (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
        - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
    ).sum() / 2
    assert area == 100
    # fully collinear input: no finite-area triangulation exists
    col = np.column_stack([np.arange(9.0), np.arange(9.0) * 2])
    tris = delaunay(col)
    if len(tris):
        a, b, c = col[tris[:, 0]], col[tris[:, 1]], col[tris[:, 2]]
        area = np.abs(
            (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
            - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
        ).sum()
        assert area == 0


@given(st.lists(st.tuples(coord, coord), min_size=4, max_size=40, unique=True))
@settings(max_examples=40, deadline=None)
def test_delaunay_hull_area_identity(pt_list):
    """Sum of triangle areas equals the convex hull area (half-grid coords:
    exact float arithmetic, heavy cocircular/collinear degeneracy)."""
    from pygeoops_ray.geo.voronoi import delaunay

    pts = np.array(pt_list, dtype=np.float64)
    tris = delaunay(pts)
    a, b, c = pts[tris[:, 0]], pts[tris[:, 1]], pts[tris[:, 2]]
    tri_area = np.abs(
        (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
        - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
    ).sum() / 2
    # exact hull area via the monotone-chain hull + shoelace
    P = sorted(map(tuple, pts))

    def half_hull(ps):
        h = []
        for p in ps:
            while len(h) >= 2 and (
                (h[-1][0] - h[-2][0]) * (p[1] - h[-2][1])
                - (h[-1][1] - h[-2][1]) * (p[0] - h[-2][0])
            ) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = half_hull(P)
    upper = half_hull(P[::-1])
    hull = lower[:-1] + upper[:-1]
    hull_area = 0.0
    for q in range(len(hull)):
        x0, y0 = hull[q]
        x1, y1 = hull[(q + 1) % len(hull)]
        hull_area += x0 * y1 - x1 * y0
    hull_area = abs(hull_area) / 2
    assert tri_area == hull_area


def test_delaunay_sliver_near_hull_edge_pinned():
    """Round-3 verdict regression (non-hypothesis pin): point (-9, 87.5) lies
    0.0033 units inside hull edge (74,95.5)-(-76.5,81), so triangle BCD's
    circumradius (~8.5e5) exceeds the default 1000x super-triangle distance —
    the finite-super artifact dropped the sliver (area 6649.625 of 6649.875).
    The hull-coverage retry must emit all three fan triangles."""
    from pygeoops_ray.geo.voronoi import delaunay

    pts = np.array([(0, 0), (-9, 87.5), (74, 95.5), (-76.5, 81)], dtype=float)
    tris = delaunay(pts)
    assert len(tris) == 3
    a, b, c = pts[tris[:, 0]], pts[tris[:, 1]], pts[tris[:, 2]]
    area = np.abs(
        (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
        - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
    ).sum() / 2
    assert area == 6649.875


# --- y-binned predicate equivalence (binned path vs dense reference) --------


def test_points_in_ring_bulk_binned_equals_dense():
    """Above the cell threshold the binned path must be bit-identical to the
    dense kernel (candidate supersets + identical predicates)."""
    from pygeoops_ray.geo.predicates import _ring_test_dense, points_in_ring_bulk

    rng = np.random.default_rng(3)
    base = np.array(
        [[0, 0], [10, 0], [10, 10], [6, 5], [4, 9], [0, 10], [0, 0]], dtype=float
    )
    t = np.linspace(0, 1, 800)
    dring = []
    for i in range(len(base) - 1):
        seg = base[i][None, :] * (1 - t[:, None]) + base[i + 1][None, :] * t[:, None]
        dring.append(seg[:-1])
    dring.append(base[-1:])
    dring = np.concatenate(dring)
    pts = np.column_stack([rng.random(4000) * 12 - 1, rng.random(4000) * 12 - 1])
    gx, gy = np.meshgrid(np.arange(-1.0, 12.0, 0.5), np.arange(-1.0, 12.0, 0.5))
    pts = np.concatenate(
        [pts, np.column_stack([gx.ravel(), gy.ravel()]), [[5.0, 99.0], [5.0, -99.0]]]
    )
    assert len(pts) * (len(dring) - 1) > 4_000_000  # binned path engaged
    got = points_in_ring_bulk(pts, dring)
    on_any, cr = _ring_test_dense(
        pts[:, 0][:, None], pts[:, 1][:, None],
        dring[:-1, 0][None, :], dring[:-1, 1][None, :],
        dring[1:, 0][None, :], dring[1:, 1][None, :],
    )
    ref = np.where(cr % 2 == 1, 1, -1).astype(np.int8)
    ref[on_any] = 0
    assert np.array_equal(got, ref)


def test_ring_is_simple_binned_equals_dense():
    """Large self-intersecting and simple rings agree with a brute-force
    check of the same predicates."""
    from pygeoops_ray.geo.validity import _ring_is_simple

    n = 3000
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    # simple wobbly ring
    r = 100 + 5 * np.sin(7 * th)
    simple_ring = np.column_stack([100 + r * np.cos(th), 100 + r * np.sin(th)])
    simple_ring = np.concatenate([simple_ring, simple_ring[:1]])
    assert _ring_is_simple(simple_ring) is True
    # figure-eight: proper crossing at the origin
    x = 100 * np.sin(th)
    y = 50 * np.sin(2 * th)
    eight = np.column_stack([x, y])
    eight = np.concatenate([eight, eight[:1]])
    assert _ring_is_simple(eight) is False
    # spiral with one long chord crossing many segments
    r2 = np.linspace(20, 100, n)
    spiral = np.column_stack([r2 * np.cos(4 * th), r2 * np.sin(4 * th)])
    spiral = np.concatenate([spiral, spiral[:1]])  # closing chord crosses arms
    assert _ring_is_simple(spiral) is False


@given(
    st.lists(
        st.text(alphabet="abc", min_size=0, max_size=6), min_size=2, max_size=12
    )
)
@settings(max_examples=60, deadline=None)
def test_fastss_candidate_completeness_property(words):
    """FastSS recall proof, property-tested: any two strings at TRUE edit
    distance <= 1 (full DP Levenshtein) share a key in {s} ∪ del1(s); and
    the in-group verifier used by q_fuzzy_pairs agrees with the DP exactly
    on distance <= 1."""

    def lev(a, b):
        m, n = len(a), len(b)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                cur = min(
                    d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
                )
                prev, d[j] = d[j], cur
        return d[n]

    def keys(s):
        return {s} | {s[:i] + s[i + 1 :] for i in range(len(s))}

    def ed_le1(a, b):
        if a == b:
            return True
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) <= 1
        if la > lb:
            a, b, la, lb = b, a, lb, la
        i = 0
        while i < la and a[i] == b[i]:
            i += 1
        return a[i:] == b[i + 1 :]

    uniq = sorted(set(words))
    for i, a in enumerate(uniq):
        for b in uniq[i + 1 :]:
            d = lev(a, b)
            assert ed_le1(a, b) == (d <= 1)
            if d <= 1:
                assert keys(a) & keys(b), (a, b)
