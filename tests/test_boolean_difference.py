"""Boolean ops + difference_all semantics.

Oracle cases follow /root/reference/tests/test_difference.py:12-112 (equality
with plain difference-of-union) re-expressed with our own kernels.
"""

import numpy as np
import pytest

from pygeoops_ray.geo import boolean as B
from pygeoops_ray.geo import geom as g
from pygeoops_ray.geo import wkt
from pygeoops_ray.geo.buffer import buffer_by_m, convex_hull
from pygeoops_ray.geo.difference import (
    _difference_intersecting,
    difference_all,
    difference_all_tiled,
)


def test_boolean_basic():
    a = g.box(0, 0, 10, 10)
    b = g.box(5, 5, 15, 15)
    assert B.difference(a, b).area == pytest.approx(75.0)
    assert B.intersection(a, b).area == pytest.approx(25.0)
    assert B.union(a, b).area == pytest.approx(175.0)


def test_boolean_shared_edge():
    a = g.box(0, 0, 10, 10)
    c = g.box(10, 0, 20, 10)
    assert B.difference(a, c).area == pytest.approx(100.0)
    u = B.union(a, c)
    assert u.area == pytest.approx(200.0)
    assert isinstance(u, g.Polygon)  # merged across the shared edge


def test_boolean_hole():
    a = g.box(0, 0, 10, 10)
    d = B.difference(a, g.box(3, 3, 7, 7))
    assert d.area == pytest.approx(84.0)
    assert isinstance(d, g.Polygon) and len(d.holes) == 1


def test_boolean_split():
    a = g.box(0, 0, 10, 10)
    d = B.difference(a, g.box(4, -1, 6, 11))
    assert isinstance(d, g.MultiPolygon)
    assert d.area == pytest.approx(80.0)


def test_boolean_self_annihilation():
    a = g.box(0, 0, 10, 10)
    assert B.difference(a, a).is_empty
    assert B.union(a, a).area == pytest.approx(100.0)
    assert B.intersection(a, a).area == pytest.approx(100.0)


def test_boolean_triangles():
    t1 = g.Polygon([(0, 0), (10, 0), (5, 8)])
    t2 = g.Polygon([(0, 5), (10, 5), (5, -3)])
    it = B.intersection(t1, t2)
    un = B.union(t1, t2)
    d1 = B.difference(t1, t2)
    # inclusion-exclusion closes
    assert un.area == pytest.approx(t1.area + t2.area - it.area, rel=1e-9)
    assert d1.area == pytest.approx(t1.area - it.area, rel=1e-9)


def test_difference_all():
    big = g.box(0, 0, 100, 100)
    subs = [g.box(10, 10, 20, 20), g.box(30, 30, 40, 40), g.box(200, 200, 210, 210)]
    assert difference_all(big, subs, check_intersects=True).area == pytest.approx(9800.0)
    # non-intersecting subtrahends only → unchanged geometry returned
    same = difference_all(big, [g.box(200, 200, 210, 210)], check_intersects=True)
    assert same is big


def test_difference_all_tiled_matches_untiled():
    big = g.box(0, 0, 100, 100)
    subs = [g.box(i, i, i + 8, i + 8) for i in range(0, 90, 10)]
    plain = difference_all(big, subs)
    tiled = difference_all_tiled(big, subs, subdivide_coords=4)
    assert tiled.area == pytest.approx(plain.area, rel=1e-9)


def test_difference_all_none_and_empty():
    assert difference_all(None, [g.box(0, 0, 1, 1)]) is None
    e = g.Polygon()
    assert difference_all(e, [g.box(0, 0, 1, 1)]) is e
    big = g.box(0, 0, 10, 10)
    assert difference_all_tiled(big, None) is big


def test_difference_intersecting_array():
    arr = np.array([g.box(0, 0, 10, 10), g.box(50, 50, 60, 60)], dtype=object)
    out = _difference_intersecting(arr, g.box(5, 5, 15, 15))
    assert out[0].area == pytest.approx(75.0)
    assert out[1] is arr[1]  # untouched (no intersection)


def test_convex_hull():
    pts = np.array([(0, 0), (4, 0), (4, 4), (0, 4), (2, 2), (1, 1)], dtype=float)
    hull = convex_hull(pts)
    assert len(hull) == 5  # 4 corners + closure
    from pygeoops_ray.geo.measures import ring_area

    assert ring_area(hull) == pytest.approx(16.0)


def test_buffer_by_m_line():
    # ref tests/test_buffer_by_m.py semantics: M (or Z) per-vertex radii
    ln = wkt.loads("LINESTRING Z (0 6 1, 0 0 2, 10 0 2, 13 5 4)")
    buf = buffer_by_m(ln)
    assert isinstance(buf, g.Polygon)
    assert buf.area > 0
    bounds = buf.bounds
    assert bounds[0] <= -2 and bounds[2] >= 13 + 3.9  # reaches radius 4 at the end


def test_buffer_by_m_zero_tapers():
    bt = buffer_by_m(wkt.loads("LINESTRING Z (0 0 2, 5 0 0, 10 0 2)"))
    # taper at the middle → two parts touching at (5,0)
    assert isinstance(bt, g.MultiPolygon)
    assert len(bt.geoms) == 2


def test_buffer_by_m_negative_disjoint():
    bm = buffer_by_m(wkt.loads("LINESTRING Z (0 0 2, 5 0 -1, 10 0 2)"))
    assert isinstance(bm, g.MultiPolygon)
    assert len(bm.geoms) == 2
    assert bm.area == pytest.approx(2 * np.pi * 4, rel=0.02)  # two 32-gon circles r=2


def test_buffer_by_m_requires_m():
    with pytest.raises(ValueError, match="M or Z values"):
        buffer_by_m(g.LineString([(0, 0), (1, 1)]))


def test_buffer_by_m_array_and_none():
    assert buffer_by_m(None) is None
    arr = buffer_by_m(
        np.array([wkt.loads("LINESTRING Z (0 0 1, 5 0 1)"), None], dtype=object)[:1]
    )
    assert isinstance(arr[0], g.Polygon)


@pytest.mark.parametrize(
    "descr, w, exp_type, rel",
    [
        # transcription of /root/reference/tests/test_buffer_by_m.py:27-144
        ("point_pos_m", "POINT Z (0 0 1)", g.Polygon, None),
        ("line_z", "LINESTRING Z (0 6 1, 0 0 2, 9 0 2)", g.Polygon, None),
        ("line_z0_touches", "LINESTRING Z (0 6 1, 0 0 0, 9 0 2)", g.MultiPolygon, "touches"),
        ("line_zneg_disjoint", "LINESTRING Z (0 6 1, 0 0 -1, 9 0 2)", g.MultiPolygon, "disjoint"),
        ("line_all_neg_empty", "LINESTRING Z (0 6 -1, 0 0 -1, 9 0 -2)", None, None),
        ("line_m", "LINESTRING M (0 6 1, 0 0 2, 9 0 2)", g.Polygon, None),
        ("line_zm_m0", "LINESTRING ZM (0 6 -1 1, 0 0 -1 0, 9 0 -1 2)", g.MultiPolygon, "touches"),
        ("multiline_z", "MULTILINESTRING Z ((0 6 1, 0 0 2, 9 0 2), (0 9 1, 5 9 2, 9 9 1))", g.MultiPolygon, None),
        ("poly_z", "POLYGON Z ((0 0 0, 0 5 1, 5 2.5 2, 0 0 0))", g.Polygon, None),
        (
            "multipoly_z",
            "MULTIPOLYGON Z (((0 0 0, 0 5 1, 5 5 2, 5 0 3, 0 0 0)), ((10 0 0, 10 5 1, 15 5 2, 15 0 3, 10 0 0)))",
            g.MultiPolygon,
            None,
        ),
    ],
)
def test_buffer_by_m_reference_matrix(descr, w, exp_type, rel):
    from pygeoops_ray.geo import predicates

    out = buffer_by_m(wkt.loads(w))
    if exp_type is None:
        assert out.is_empty
        return
    assert isinstance(out, exp_type)
    if rel == "touches":
        assert predicates.intersects(out.geoms[0], out.geoms[1])
    elif rel == "disjoint":
        assert not predicates.intersects(out.geoms[0], out.geoms[1])


def test_buffer_by_m_geometrycollection():
    # mixed + deeply nested collections (ref :120-144)
    gc = g.GeometryCollection(
        [
            wkt.loads("LINESTRING Z (0 6 1, 0 0 2, 9 0 2)"),
            g.Point(5, 9, 1),
            wkt.loads("POLYGON Z ((10 0 0, 10 5 1, 15 5 2, 15 0 3, 10 0 0))"),
        ]
    )
    out = buffer_by_m(gc)
    assert isinstance(out, g.MultiPolygon)
    nested = g.GeometryCollection(
        [g.GeometryCollection([g.MultiPoint([g.Point(0, 0, 1), g.Point(0, 5, 2)])])]
    )
    out2 = buffer_by_m(nested)
    assert isinstance(out2, g.MultiPolygon) and len(out2.geoms) == 2


def test_union_nary_matches_membership_oracle():
    """n-ary coverage-depth union == exact point-membership oracle (a point
    is in the union iff it is in some input polygon), on the degenerate
    corpora that break naive approaches: shared edges, duplicates, holes,
    coincident hull-chain arcs."""
    from pygeoops_ray.geo import martinez as M
    from pygeoops_ray.geo.buffer import convex_hull, point_buffer

    def sqr(x0, y0, s=1.0):
        return [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]]

    def pip(polys, x, y):
        inside = False
        for poly in polys:
            c = 0
            for ring in poly:
                a = np.asarray(ring)
                x1, y1 = a[:, 0], a[:, 1]
                x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
                cond = (y1 > y) != (y2 > y)
                with np.errstate(divide="ignore", invalid="ignore"):
                    xs = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
                c += int((cond & (x < xs)).sum())
            if c % 2:
                inside = True
        return inside

    rng = np.random.default_rng(17)
    shell = sqr(0, 0, 6)
    hole = [[1, 1], [1, 5], [5, 5], [5, 1]]  # CW
    cases = [
        [[sqr(i, j)] for i in range(3) for j in range(3)],  # full-edge sharing
        [[sqr(0, 0)], [sqr(0, 0)], [sqr(0.5, 0.5)]],  # exact duplicates
        [[shell, hole], [sqr(2, 2)], [sqr(4.5, 0.5, 2)]],  # island + bridge
    ]
    for _ in range(6):  # buffer-style hull chains with shared arc chains
        nseg = rng.integers(3, 7)
        xs = np.cumsum(rng.uniform(1, 3, nseg))
        ys = rng.uniform(0, 2, nseg)
        ms = rng.uniform(0.5, 3.0, nseg)
        bufs = [point_buffer(x, y, m, 8) for x, y, m in zip(xs, ys, ms)]
        cases.append(
            [
                [convex_hull(np.concatenate([c1, c2]))[:-1].tolist()]
                for c1, c2 in zip(bufs[:-1], bufs[1:])
            ]
        )
    for polys in cases:
        out = M.union_nary(polys)
        allpts = np.concatenate([np.asarray(r) for p in polys for r in p])
        lo = allpts.min(axis=0) - 0.5
        hi = allpts.max(axis=0) + 0.5
        for _ in range(150):
            x, y = rng.uniform(lo, hi)
            want = any(pip([p], x, y) for p in polys)
            got = pip(out, x, y)
            if got != want:
                # re-test off the sample only if it sits on a boundary
                assert got == want, (x, y, polys)


def test_difference_nary_matches_membership_oracle():
    """Fused subject-minus-union overlay == exact membership oracle
    (in some subject AND in no clip), incl. shared-edge and identical cases."""
    from pygeoops_ray.geo import martinez as M

    def sqr(x0, y0, s=1.0):
        return [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]]

    def pip(polys, x, y):
        inside = False
        for poly in polys:
            c = 0
            for ring in poly:
                a = np.asarray(ring)
                x1, y1 = a[:, 0], a[:, 1]
                x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
                cond = (y1 > y) != (y2 > y)
                with np.errstate(divide="ignore", invalid="ignore"):
                    xs = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
                c += int((cond & (x < xs)).sum())
            if c % 2:
                inside = True
        return inside

    rng = np.random.default_rng(4)
    shell = sqr(0, 0, 6)
    hole = [[1, 1], [1, 5], [5, 5], [5, 1]]
    cases = [
        ([[sqr(0, 0, 2)]], [[sqr(0, 0, 1)]]),  # clip shares two subject edges
        ([[sqr(0, 0, 2)]], [[sqr(0, 0, 2)]]),  # identical -> empty
        ([[sqr(0, 0, 3)]], [[sqr(1, 0, 1)], [sqr(1, 1, 1)], [sqr(1, 2, 1)]]),
        ([[shell, hole]], [[sqr(0, 0, 2)], [sqr(4, 4, 3)]]),
        ([[sqr(0, 0, 4)], [sqr(3, 3, 4)]], [[sqr(2, 2, 2)]]),  # overlapping subjects
    ]
    for subj, clip in cases:
        out = M.difference_nary(subj, clip)
        allpts = np.concatenate([np.asarray(r) for p in subj + clip for r in p])
        lo = allpts.min(axis=0) - 0.5
        hi = allpts.max(axis=0) + 0.5
        for _ in range(200):
            x, y = rng.uniform(lo, hi)
            want = any(pip([p], x, y) for p in subj) and not any(
                pip([p], x, y) for p in clip
            )
            assert pip(out, x, y) == want, (x, y)


def test_intersection_nary_matches_membership_oracle():
    """Two-counter overlay intersection == exact oracle (in some subject AND
    in some clip), incl. identical/shared-edge/holed cases."""
    from pygeoops_ray.geo import martinez as M

    def sqr(x0, y0, s=1.0):
        return [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]]

    def pip(polys, x, y):
        inside = False
        for poly in polys:
            c = 0
            for ring in poly:
                a = np.asarray(ring)
                x1, y1 = a[:, 0], a[:, 1]
                x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
                cond = (y1 > y) != (y2 > y)
                with np.errstate(divide="ignore", invalid="ignore"):
                    xs = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
                c += int((cond & (x < xs)).sum())
            if c % 2:
                inside = True
        return inside

    rng = np.random.default_rng(6)
    cases = [
        ([[sqr(0, 0, 2)]], [[sqr(0, 0, 2)]]),
        ([[sqr(0, 0, 2)]], [[sqr(1, 0, 2)]]),
        ([[sqr(0, 0, 6), [[1, 1], [1, 5], [5, 5], [5, 1]]]], [[sqr(0, 0, 3)]]),
        ([[sqr(0, 0, 3)], [sqr(4, 0, 3)]], [[sqr(2, 1, 3)]]),
    ]
    for subj, clip in cases:
        out = M.intersection_nary(subj, clip)
        allpts = np.concatenate([np.asarray(r) for p in subj + clip for r in p])
        lo = allpts.min(axis=0) - 0.5
        hi = allpts.max(axis=0) + 0.5
        for _ in range(200):
            x, y = rng.uniform(lo, hi)
            want = any(pip([p], x, y) for p in subj) and any(
                pip([p], x, y) for p in clip
            )
            assert pip(out, x, y) == want, (x, y)


def test_difference_nary_division_at_sweep_point_relabel():
    """Regression (fuzz-found): a collinear-overlap division landing AT the
    current sweep point re-queues a coincident piece after later events at
    that point computed their coverage — the relabel pass must rebuild the
    labels. Minimized from the snapped-star corpus: subject edge (4,8)-(6,6)
    overlaps clip edge (3,9)-(5,7) on x+y=12."""
    from pygeoops_ray.geo import martinez as M

    # list of polygons; polygon = [ring]
    subj = [[[
        [4.0, 8.0], [5.0, 10.0], [5.0, 11.0], [1.0, 10.0],
        [0.0, 7.0], [4.0, 6.0], [6.0, 6.0],
    ]]]
    clip = [
        [[[5.0, 7.0], [3.0, 9.0], [2.0, 8.0], [7.0, 5.0]]],
        [[[8.0, 7.0], [6.0, 9.0], [4.0, 9.0], [3.0, 7.0]]],
    ]

    def pip(polys, x, y):
        inside = False
        for poly in polys:
            c = 0
            for ring in poly:
                a = np.asarray(ring)
                x1, y1 = a[:, 0], a[:, 1]
                x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
                cond = (y1 > y) != (y2 > y)
                with np.errstate(divide="ignore", invalid="ignore"):
                    xs = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
                c += int((cond & (x < xs)).sum())
            if c % 2:
                inside = True
        return inside

    out = M.difference_nary(subj, clip)
    rng = np.random.default_rng(7)
    sflat = subj
    cflat = clip
    for _ in range(400):
        x, y = rng.uniform((0, 5), (8, 11))
        want = any(pip([p], x, y) for p in sflat) and not any(
            pip([p], x, y) for p in cflat
        )
        # skip points within 1e-6 of any input edge (sampling tolerance)
        def nb(polys):
            for poly in polys:
                for ring in poly:
                    a = np.asarray(ring)
                    b = np.roll(a, -1, axis=0)
                    d = b - a
                    L2 = (d * d).sum(axis=1)
                    L2[L2 == 0] = 1
                    t = np.clip(
                        ((x - a[:, 0]) * d[:, 0] + (y - a[:, 1]) * d[:, 1]) / L2, 0, 1
                    )
                    px = a[:, 0] + t * d[:, 0]
                    py = a[:, 1] + t * d[:, 1]
                    if np.min((px - x) ** 2 + (py - y) ** 2) < 1e-12:
                        return True
            return False
        if nb(sflat) or nb(cflat):
            continue
        assert pip(out, x, y) == want, (x, y)


def test_overlay_nary_rect_corpus_matches_inclusion_exclusion():
    """The driver corpus rule (q_overlay_nary) as a no-Ray property: the three
    n-ary sweeps' areas equal exact inclusion-exclusion over the rect bounds
    for every residue class of the key (coincident edges included)."""
    from pygeoops_ray.geo import boolean
    from pygeoops_ray.geo.geom import box

    def ixn(r1, r2):
        w = min(r1[2], r2[2]) - max(r1[0], r2[0])
        h = min(r1[3], r2[3]) - max(r1[1], r2[1])
        return max(w, 0) * max(h, 0)

    def ixn3(r1, r2, r3):
        w = min(r1[2], r2[2], r3[2]) - max(r1[0], r2[0], r3[0])
        h = min(r1[3], r2[3], r3[3]) - max(r1[1], r2[1], r3[1])
        return max(w, 0) * max(h, 0)

    for k in range(60):
        ra = (0, 0, 10 + k % 5, 8 + k % 3)
        rb = (4 + k % 3, 2 + k % 2, 13 + k % 3 + k % 4, 9 + 2 * (k % 2))
        rc = (2 + k % 2, 5 + k % 3, 10 + k % 2 + k % 5, 11 + k % 3 + k % 4)
        A, B, C = box(*ra), box(*rb), box(*rc)
        area = lambda r: (r[2] - r[0]) * (r[3] - r[1])  # noqa: E731
        want_u = (
            area(ra) + area(rb) + area(rc)
            - ixn(ra, rb) - ixn(ra, rc) - ixn(rb, rc) + ixn3(ra, rb, rc)
        )
        want_d = area(ra) - ixn(ra, rb) - ixn(ra, rc) + ixn3(ra, rb, rc)
        want_i = ixn(ra, rb) + ixn(ra, rc) - ixn3(ra, rb, rc)
        assert abs(boolean.union_all([A, B, C]).area - want_u) < 1e-9, k
        assert abs(boolean.difference_all_fused(A, [B, C]).area - want_d) < 1e-9, k
        got_i = boolean.intersection_all_fused([A], [B, C]).area
        assert abs(got_i - want_i) < 1e-9, k


def test_intersection_all_fused_empty_sides():
    from pygeoops_ray.geo import boolean
    from pygeoops_ray.geo.geom import box

    A = box(0, 0, 2, 2)
    assert boolean.intersection_all_fused([], [A]).is_empty
    assert boolean.intersection_all_fused([A], []).is_empty
    # disjoint
    assert boolean.intersection_all_fused([A], [box(5, 5, 6, 6)]).is_empty
