"""collect / collection_extract / remove_inner_rings / make_valid semantics.

Transcribed from /root/reference/tests/test_general.py:37-640.
"""

import numpy as np
import pytest

from pygeoops_ray.geo import geom as g
from pygeoops_ray.geo.general import (
    collect,
    collection_extract,
    empty,
    explode,
    format_short,
    get_parts_recursive,
    get_primitivetype_id,
    remove_inner_rings,
)
from pygeoops_ray.geo.types import GeometryType, PrimitiveType
from pygeoops_ray.geo.validity import make_valid


def test_collect_reference():
    assert collect(None) is None
    assert collect([None]) is None
    assert collect([None, g.Polygon(), None, g.Polygon()]) is None
    pt = g.Point(0, 0)
    assert collect(pt) is pt
    assert collect([pt]) is pt
    mp = collect([pt, pt])
    assert isinstance(mp, g.MultiPoint) and len(mp.geoms) == 2
    line = g.LineString([(0, 0), (0, 1)])
    assert isinstance(collect([line, line]), g.MultiLineString)
    p23, p34, p45 = g.box(2, 0, 3, 1), g.box(3, 0, 4, 1), g.box(4, 0, 5, 1)
    assert isinstance(collect([p23, p45]), g.MultiPolygon)
    # adjacent polygons share an edge → invalid multipolygon → GeometryCollection
    assert isinstance(collect([p34, p45]), g.GeometryCollection)
    # mixed types → GeometryCollection; multi nested → GeometryCollection
    p01 = g.box(0, 0, 1, 1)
    assert isinstance(collect([pt, line, p01]), g.GeometryCollection)
    assert isinstance(
        collect([p01, g.MultiPolygon([p23, p45])]), g.GeometryCollection
    )


def test_collection_extract_reference():
    assert collection_extract(None, 0) is None
    assert collection_extract([None], 0)[0] is None
    pt = g.Point(0, 0)
    mpt = g.MultiPoint([pt, pt])
    assert collection_extract(pt, 1) is pt
    assert collection_extract(mpt, 1) is mpt
    assert collection_extract(mpt, 2) is None
    line = g.LineString([(0, 0), (0, 1)])
    p1 = g.box(0, 0, 1, 1)
    mpoly = g.MultiPolygon([g.box(2, 0, 3, 1), g.box(4, 0, 5, 1)])
    gcoll = g.GeometryCollection([pt, line, p1, mpoly])
    assert collection_extract(gcoll, 1) is pt
    assert collection_extract(gcoll, PrimitiveType.POINT) is pt
    assert collection_extract(gcoll, 2) is line
    polys = collection_extract(gcoll, 3)
    # poly + multipoly mix → GeometryCollection, like the reference (:131-135)
    assert isinstance(polys, g.GeometryCollection)
    assert collection_extract(gcoll, 0) is gcoll
    with pytest.raises(ValueError, match="Invalid value for primitivetype"):
        collection_extract(gcoll, 4)
    with pytest.raises(ValueError, match="primitivetype is arraylike"):
        collection_extract(pt, [1, 2])
    # arraylike geometry with per-row primitive types
    out = collection_extract([gcoll, gcoll], [1, 2])
    assert out[0] is pt and out[1] is line
    with pytest.raises(ValueError, match="len must be equal"):
        collection_extract([gcoll], [1, 2])


def test_empty_explode_parts():
    assert empty(None) is None
    assert empty(GeometryType.POLYGON).is_empty
    assert empty(3).is_empty
    mp = g.MultiPoint([g.Point(0, 0), g.Point(1, 1)])
    parts = explode(mp)
    assert len(parts) == 2
    nested = g.GeometryCollection(
        [g.GeometryCollection([mp]), g.Point(9, 9)]
    )
    flat = get_parts_recursive(nested)
    assert len(flat) == 3
    assert all(not isinstance(p, g._Multi) for p in flat)
    assert explode(None) is None and get_parts_recursive(None) is None


def test_get_primitivetype_id():
    assert get_primitivetype_id(g.Point(0, 0)) == 1
    assert get_primitivetype_id(g.LineString([(0, 0), (1, 1)])) == 2
    assert get_primitivetype_id(g.box(0, 0, 1, 1)) == 3
    assert get_primitivetype_id(g.GeometryCollection([g.Point(0, 0)])) == 0
    out = get_primitivetype_id([g.Point(0, 0), g.box(0, 0, 1, 1)])
    assert list(out) == [1, 3]


def test_format_short():
    assert format_short(None) == "None"
    assert format_short(g.Point(1, 2)) == "POINT(1.0 2.0)"
    assert format_short(g.LineString([(1, 2), (3, 4)])).startswith("LINESTRING(1.0 2.0")
    assert format_short(g.box(0, 0, 1, 1)).startswith("POLYGON(")
    nested = g.GeometryCollection([g.GeometryCollection([g.Point(5, 6)])])
    s = format_short(nested)
    assert s.startswith("GEOMETRYCOLLECTION(GEOMETRYCOLLECTION(POINT(")


def test_remove_inner_rings_reference():
    assert remove_inner_rings(None, min_area_to_keep=1, crs=None) is None
    poly = g.Polygon(
        [(0, 0), (0, 10), (1, 10), (10, 10), (10, 0), (0, 0)],
        [
            [(2, 2), (2, 4), (4, 4), (4, 2), (2, 2)],  # area 4
            [(5, 5), (5, 6), (7, 6), (7, 5), (5, 5)],  # area 2
        ],
    )
    r1 = remove_inner_rings(poly, min_area_to_keep=1, crs=None)
    assert isinstance(r1, g.Polygon) and len(r1.holes) == 2
    r3 = remove_inner_rings(poly, min_area_to_keep=3, crs="epsg:31370")
    assert len(r3.holes) == 1
    r0 = remove_inner_rings(poly, min_area_to_keep=0, crs=None)
    assert len(r0.holes) == 0
    noholes = g.Polygon([(100, 100), (100, 110), (110, 110), (110, 100), (100, 100)])
    assert len(remove_inner_rings(noholes, 0, None).holes) == 0
    mp = g.MultiPolygon([poly, noholes])
    rm = remove_inner_rings(mp, min_area_to_keep=3, crs=None)
    assert isinstance(rm, g.MultiPolygon)
    assert len(rm.geoms[0].holes) == 1
    with pytest.raises(ValueError, match="remove_inner_rings impossible on LineString"):
        remove_inner_rings(g.LineString([(0, 0), (0, 1)]), 1, None)


def test_make_valid_variants():
    valid = g.box(0, 0, 1, 1)
    assert make_valid(valid, only_if_invalid=True) is valid
    bow = g.Polygon([(0, 0), (10, 10), (10, 0), (0, 10), (0, 0)])
    mv = make_valid(bow)
    assert isinstance(mv, g.MultiPolygon) and len(mv.geoms) == 2
    assert mv.area == pytest.approx(bow.shell.shape[0] and 50.0)
    # array input
    arr = make_valid(np.array([valid, bow], dtype=object))
    assert arr[0] is valid or arr[0].equals_exact(valid, 0)
    assert isinstance(arr[1], g.MultiPolygon)
    assert make_valid(None) is None


class TestGeodesicArea:
    """From-scratch WGS84 ring area (geo/geodesic.py) — the geographic-CRS
    branch of remove_inner_rings (reference _general.py:527-537)."""

    def test_latlon_box_matches_closed_form_zone_area(self):
        from pygeoops_ray.geo import geodesic as gd

        # exact ellipsoid area of a lat/lon box from the zone closed form
        for lon0, lat0, dl in [(4.0, 50.0, 1.0), (0.0, 0.0, 1.0), (120.0, -35.0, 0.5)]:
            ring = np.array(
                [
                    [lon0, lat0],
                    [lon0 + dl, lat0],
                    [lon0 + dl, lat0 + dl],
                    [lon0, lat0 + dl],
                    [lon0, lat0],
                ]
            )
            # densify the parallels so great-circle edges track them closely
            dense = []
            for a, b in zip(ring[:-1], ring[1:]):
                for t in np.linspace(0, 1, 50, endpoint=False):
                    dense.append(a + t * (b - a))
            dense.append(ring[-1])
            got = gd.geodesic_ring_area(np.array(dense))
            want = (dl / 360.0) * (gd.zone_band_area(lat0 + dl) - gd.zone_band_area(lat0))
            assert got == pytest.approx(want, rel=2e-5)

    def test_small_ring_matches_local_planar_metric(self):
        from pygeoops_ray.geo import geodesic as gd

        # a ~100 m square at lat 51: geodesic area ~= planar meters area
        lat = 51.0
        dlat = 100.0 / 111194.9  # ~meters per degree latitude (authalic)
        dlon = dlat / np.cos(np.radians(lat))
        ring = np.array(
            [[4, lat], [4 + dlon, lat], [4 + dlon, lat + dlat], [4, lat + dlat], [4, lat]]
        )
        got = gd.geodesic_ring_area(ring)
        assert got == pytest.approx(100.0 * 100.0, rel=2e-2)

    def test_winding_and_closure_invariance(self):
        from pygeoops_ray.geo import geodesic as gd

        ring = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]])
        a1 = gd.geodesic_ring_area(ring)
        a2 = gd.geodesic_ring_area(ring[::-1])
        a3 = gd.geodesic_ring_area(ring[:-1])
        assert a1 == pytest.approx(a2, rel=1e-12)
        assert a1 == pytest.approx(a3, rel=1e-12)

    def test_remove_inner_rings_geographic_crs(self):
        from pygeoops_ray.geo import geom as g
        import pygeoops_ray as pr

        # shell ~1°; holes: ~220m x 220m (≈48,500 m²) and ~110m x 110m
        # (≈12,000 m²) at lat 50 — a threshold of 20,000 m² keeps only the
        # bigger one; in DEGREE units both holes are ~1e-6 "area" and a planar
        # interpretation of the same threshold would drop both
        d2 = 0.002
        d1 = 0.001
        hole_big = [[4.1, 50.1], [4.1 + d2 / np.cos(np.radians(50)), 50.1],
                    [4.1 + d2 / np.cos(np.radians(50)), 50.1 + d2], [4.1, 50.1 + d2], [4.1, 50.1]]
        hole_small = [[4.5, 50.5], [4.5 + d1, 50.5], [4.5 + d1, 50.5 + d1],
                      [4.5, 50.5 + d1], [4.5, 50.5]]
        poly = g.Polygon(
            [[4, 50], [5, 50], [5, 51], [4, 51], [4, 50]], [hole_big, hole_small]
        )
        out = pr.remove_inner_rings(poly, min_area_to_keep=20000.0, crs="epsg:4326")
        assert len(out.holes) == 1
        # planar (crs=None): degree-unit areas, both holes survive a tiny threshold
        out_planar = pr.remove_inner_rings(poly, min_area_to_keep=1e-7, crs=None)
        assert len(out_planar.holes) == 2
        # projected crs string → planar branch (reference parity)
        out_proj = pr.remove_inner_rings(poly, min_area_to_keep=20000.0, crs="epsg:31370")
        assert len(out_proj.holes) == 0


def test_is_valid_multipolygon_ogc_point_touch():
    """OGC rule: MultiPolygon parts may touch at finite points (valid), but
    not overlap in area or share boundary edges. make_valid of a bowtie
    yields two point-touching triangles — GEOS reports that valid."""
    from pygeoops_ray.geo import geom as g
    from pygeoops_ray.geo.validity import is_valid, make_valid

    bow = g.Polygon([(0, 0), (4, 2), (4, 0), (0, 2), (0, 0)])
    assert not is_valid(bow)
    v = make_valid(bow)
    assert v.geom_type == "MultiPolygon" and len(v.geoms) == 2
    assert is_valid(v)
    assert abs(sum(p.area for p in v.geoms) - 4.0) < 1e-12

    # edge-sharing parts: still invalid
    mp = g.MultiPolygon(
        [
            g.Polygon([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]),
            g.Polygon([(1, 0), (2, 0), (2, 1), (1, 1), (1, 0)]),
        ]
    )
    assert not is_valid(mp)
    # overlapping parts: still invalid
    mp2 = g.MultiPolygon(
        [
            g.Polygon([(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]),
            g.Polygon([(1, 1), (3, 1), (3, 3), (1, 3), (1, 1)]),
        ]
    )
    assert not is_valid(mp2)


def test_squarish_grid_corpus_solver_matches_sql_semantics():
    """The driver corpus rule (q_squarish_grid) as a no-Ray property: the
    Python solver equals the SQL replay (round-half-even emulation, same
    division order) and create_grid2 materializes exactly cols*rows tiles."""
    import math

    from pygeoops_ray.geo.grid import create_grid2, squarish_grid_dims

    def rhe(x):
        f = math.floor(x)
        if x - f == 0.5:
            return int(f) + int(f) % 2
        return int(math.floor(x + 0.5))

    for k in range(500):
        W = 40.0 + (k % 7) * 10
        H = 30.0 + (k % 5) * 10
        n = 4 + k % 13
        cols, rows = squarish_grid_dims((0.0, 0.0, W, H), n)
        r = min(max(rhe(math.sqrt(n / (W / H))), 1), n)
        c = max(rhe(n / r), 1)
        assert (c, r) == (cols, rows), k
        assert len(create_grid2((0.0, 0.0, W, H), n)) == cols * rows, k


def test_driver_corpus_closed_forms_no_ray():
    """The four newest driver corpora (q_difference_rects, q_inner_rings,
    q_geom_zoo, q_subdivide_rect) as no-Ray properties: the kernel outputs
    equal the oracle's closed forms for a key sweep."""
    from pygeoops_ray.geo import geom as g
    from pygeoops_ray.geo.difference import difference_all
    from pygeoops_ray.geo.general import (
        collection_extract,
        get_parts_recursive,
        get_primitivetype_id,
        remove_inner_rings,
        subdivide,
    )

    def rect(x0, y0, x1, y1):
        return g.Polygon([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)])

    for k in range(60):
        # difference_rects
        m = 1 + k % 4
        d = difference_all(
            rect(0, 0, 20, 10), [rect(2 * i + 1, 1, 2 * i + 2, 2) for i in range(m)]
        )
        polys = d.geoms if d.geom_type == "MultiPolygon" else [d]
        assert len(polys) == 1
        assert sum(len(p.holes) for p in polys) == m
        assert abs(sum(p.area for p in polys) - (200 - m)) < 1e-9

        # inner_rings
        a = 1 + k % 9
        b = 5 + k % 13
        poly = g.Polygon(
            [(0, 0), (30, 0), (30, 30), (0, 30), (0, 0)],
            [
                [(2, 2), (3, 2), (3, 2 + a), (2, 2 + a), (2, 2)],
                [(6, 2), (7, 2), (7, 2 + b), (6, 2 + b), (6, 2)],
            ],
        )
        out = remove_inner_rings(poly, min_area_to_keep=8.0)
        assert len(out.holes) == (a > 8) + (b > 8)
        exp_area = 900 - (a if a > 8 else 0) - (b if b > 8 else 0)
        assert abs(out.area - exp_area) < 1e-9

        # geom_zoo
        p = 1 + k % 3
        l = k % 2
        q = 1 + k % 2
        geoms = [g.Point(float(i), 0.0) for i in range(p)]
        geoms += [g.LineString([(0, i + 1), (1, i + 1)]) for i in range(l)]
        geoms += [rect(3 * i, 5, 3 * i + 1, 6) for i in range(q)]
        coll = g.GeometryCollection(geoms)
        ext = collection_extract(coll, 3)
        assert (len(ext.geoms) if ext.geom_type == "MultiPolygon" else 1) == q
        assert len(get_parts_recursive(coll)) == p + l + q
        assert get_primitivetype_id(coll) == 0 and get_primitivetype_id(ext) == 3
        assert abs(ext.area - q) < 1e-12

    # subdivide_rect: exact area sum and the {4,4,3} part counts
    import numpy as np

    step = 0.25
    xs = np.arange(0, 12 + step, step)
    ys = np.arange(0, 8 + step, step)
    coords = (
        [(float(x), 0.0) for x in xs]
        + [(12.0, float(y)) for y in ys[1:]]
        + [(float(x), 8.0) for x in xs[::-1][1:]]
        + [(0.0, float(y)) for y in ys[::-1][1:]]
    )
    for kmod, exp_parts in [(0, 4), (1, 4), (2, 3)]:
        parts = subdivide(g.Polygon(coords), num_coords_max=40 + kmod * 10)
        assert len(parts) == exp_parts
        assert sum(p.area for p in parts) == 96.0


def test_keep_geom_type2primitivetype_id_reference_matrix():
    """Transcribed from reference tests/test_paramvalidation.py:8-33."""
    import numpy as np
    import pytest

    from pygeoops_ray.geo import geom as g
    from pygeoops_ray.geo.paramvalidation import keep_geom_type2primitivetype_id as f

    cases = [
        (True, g.GeometryCollection([]), 0),
        (True, g.Point(0.0, 0.0), 1),
        (True, g.LineString([(0, 0), (1, 1)]), 2),
        (True, g.Polygon([(0, 0), (1, 0), (1, 1), (0, 0)]), 3),
        (False, g.Polygon([(0, 0), (1, 0), (1, 1), (0, 0)]), 0),
        (0, g.Polygon([(0, 0), (1, 0), (1, 1), (0, 0)]), 0),
        (1, g.Polygon([(0, 0), (1, 0), (1, 1), (0, 0)]), 1),
        (2, g.Polygon([(0, 0), (1, 0), (1, 1), (0, 0)]), 2),
        (3, g.Polygon([(0, 0), (1, 0), (1, 1), (0, 0)]), 3),
        (np.int32(3), g.Polygon([(0, 0), (1, 0), (1, 1), (0, 0)]), 3),
    ]
    for keep, geom, exp in cases:
        assert f(keep, geom) == exp, (keep, exp)
    # 0-dim ndarray-wrapped geometry (reference case 11)
    arr = np.empty((), dtype=object)
    arr[()] = g.Polygon([(0, 0), (1, 0), (1, 1), (0, 0)])
    assert f(0, arr) == 0

    poly = g.Polygon([(0, 0), (1, 0), (1, 1), (0, 0)])
    with pytest.raises(ValueError, match="Invalid value for keep_geom_type"):
        f(4, poly)
    with pytest.raises(ValueError, match="Invalid value for keep_geom_type"):
        f(-1, poly)
    with pytest.raises(ValueError, match="Invalid type for keep_geom_type"):
        f("bad_type", poly)


def test_make_valid_keep_collapsed_reference_matrix():
    """Transcribed from reference tests/test_general.py:447-478
    (test_makevalid_keep_collapsed): collapsing-line MultiPolygon repairs to
    a GeometryCollection with keep_collapsed else MultiPolygon; None and
    0-dim ndarray wrappers pass through; valid boxes unchanged."""
    import numpy as np

    from pygeoops_ray.geo import geom as g
    from pygeoops_ray.geo.validity import make_valid

    mp = g.MultiPolygon(
        [
            g.Polygon([(0, 0), (0, 10), (10, 0), (10, 10), (0, 0)]),
            g.Polygon([(1, 1), (2, 1), (3, 1), (1, 1)]),
        ]
    )
    arr = np.empty((), dtype=object)
    arr[()] = mp
    for geom in (mp, arr):
        for oiv in (True, False):
            assert make_valid(geom, keep_collapsed=True, only_if_invalid=oiv).geom_type == "GeometryCollection"
            assert make_valid(geom, keep_collapsed=False, only_if_invalid=oiv).geom_type == "MultiPolygon"
    assert make_valid(None, keep_collapsed=False) is None
    none_arr = np.empty((), dtype=object)
    none_arr[()] = None
    assert make_valid(none_arr, keep_collapsed=True) is None
    box = g.Polygon([(0, 0), (5, 0), (5, 5), (0, 5), (0, 0)])
    box_arr = np.empty((), dtype=object)
    box_arr[()] = box
    assert make_valid(box, keep_collapsed=False).geom_type == "Polygon"
    assert make_valid(box_arr, keep_collapsed=True).geom_type == "Polygon"


def test_zero_dim_ndarray_accepted_across_public_api():
    """Reference parity (_extract_0dim_ndarray): every public geometry entry
    accepts a 0-dim object ndarray wrapping a geometry."""
    import numpy as np

    import pygeoops_ray as pr
    from pygeoops_ray.geo import geom as g

    def wrap(x):
        a = np.empty((), dtype=object)
        a[()] = x
        return a

    poly = g.Polygon([(0, 0), (10, 0), (10, 2), (0, 2), (0, 0)])
    line = g.LineString([(0, 0), (5, 0), (10, 0)])
    assert len(pr.subdivide(wrap(poly), 4)) == 2
    assert pr.difference_all(
        wrap(poly), [g.Polygon([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)])]
    ).area == 19.0
    assert pr.extend_line_by_distance(wrap(line), 1.0, 1.0).length == 12.0
    blocker = g.Polygon([(12, -1), (14, -1), (14, 1), (12, 1), (12, -1)])
    assert pr.extend_line_to_geometry(wrap(line), wrap(blocker)).length == 14.0
    assert pr.centerline(wrap(poly)) is not None
    assert pr.simplify(wrap(poly), 1.0) is not None
    assert pr.make_valid(wrap(poly)).geom_type == "Polygon"
    assert pr.remove_inner_rings(wrap(poly), 1.0).geom_type == "Polygon"
    assert pr.get_primitivetype_id(wrap(poly)) == 3
