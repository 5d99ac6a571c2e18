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
