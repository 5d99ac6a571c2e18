"""Core geometry model, WKT/WKB codec, measures, predicates tests."""

import numpy as np
import pytest

from pygeoops_ray.geo import geom as g
from pygeoops_ray.geo import predicates, wkb, wkt
from pygeoops_ray.geo.measures import average_width, compactness, ring_area
from pygeoops_ray.geo.types import GeometryType, PrimitiveType


def test_wkt_roundtrip():
    cases = [
        "POINT (1 2)",
        "POINT EMPTY",
        "LINESTRING (0 0, 1 1, 2 0)",
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 3 2, 3 3, 2 3, 2 2))",
        "MULTIPOINT ((1 2), (3 4))",
        "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
        "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))",
        "GEOMETRYCOLLECTION EMPTY",
    ]
    for case in cases:
        geom = wkt.loads(case)
        assert geom.wkt == case


def test_wkt_zm():
    ln = wkt.loads("LINESTRING Z (0 6 1, 0 0 2, 10 0 2)")
    assert ln.has_z and not ln.has_m
    assert ln.coords.shape == (3, 3)
    zm = wkt.loads("POINT ZM (1 2 3 4)")
    assert zm.has_z and zm.has_m


def test_wkb_roundtrip():
    cases = [
        "POINT (1.5 -2.25)",
        "LINESTRING (0 0, 1 1, 2 0)",
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 3 2, 3 3, 2 3, 2 2))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)))",
        "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))",
        "LINESTRING Z (0 6 1, 0 0 2, 10 0 2)",
    ]
    for case in cases:
        geom = wkt.loads(case)
        back = wkb.loads(wkb.dumps(geom))
        assert back.equals_exact(geom, 0.0), case
        assert back.has_z == geom.has_z


def test_area_length_bounds():
    p = wkt.loads("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 3 2, 3 3, 2 3, 2 2))")
    assert p.area == 99.0
    assert p.length == 44.0
    assert p.bounds == (0.0, 0.0, 10.0, 10.0)
    assert p.num_coordinates == 10
    assert ring_area(p.shell) == 100.0  # CCW positive


def test_types():
    assert GeometryType("polygon") == GeometryType.POLYGON
    assert GeometryType(1001).has_z
    assert GeometryType(2002).has_m
    assert GeometryType.POLYGON.to_multitype == GeometryType.MULTIPOLYGON
    assert GeometryType.MULTIPOLYGON.to_singletype == GeometryType.POLYGON
    assert GeometryType.POLYGONZM.flatten == GeometryType.POLYGON
    assert GeometryType.MULTILINESTRING.to_primitivetype == PrimitiveType.LINESTRING
    assert PrimitiveType("point").to_multitype == GeometryType.MULTIPOINT
    assert GeometryType.POLYGON.empty.is_empty
    assert GeometryType.POLYGON.name_camelcase == "Polygon"


def test_point_in_polygon():
    p = wkt.loads("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 3 2, 3 3, 2 3, 2 2))")
    assert predicates.point_in_polygon(p, 5, 5) == 1
    assert predicates.point_in_polygon(p, 2.5, 2.5) == -1  # in the hole
    assert predicates.point_in_polygon(p, 2, 2.5) == 0  # on hole boundary
    assert predicates.point_in_polygon(p, 0, 5) == 0  # on shell
    assert predicates.point_in_polygon(p, -1, 5) == -1


def test_intersects_contains():
    poly = g.box(0, 0, 10, 10)
    assert predicates.intersects(g.Point(5, 5), poly)
    assert predicates.intersects(g.Point(0, 0), poly)  # boundary counts
    assert not predicates.intersects(g.Point(11, 5), poly)
    line_in = g.LineString([(1, 1), (9, 9)])
    line_cross = g.LineString([(5, 5), (15, 5)])
    line_out = g.LineString([(11, 11), (12, 12)])
    assert predicates.intersects(line_in, poly)
    assert predicates.intersects(line_cross, poly)
    assert not predicates.intersects(line_out, poly)
    assert predicates.contains(poly, line_in)
    assert not predicates.contains(poly, line_cross)
    assert not predicates.contains(poly, line_out)
    # polygon-polygon
    assert predicates.intersects(poly, g.box(5, 5, 15, 15))
    assert predicates.intersects(poly, g.box(10, 0, 20, 10))  # touching edge
    assert not predicates.intersects(poly, g.box(20, 20, 30, 30))
    assert predicates.contains(poly, g.box(1, 1, 2, 2))


def test_distance():
    assert g.Point(0, 0).distance(g.Point(3, 4)) == 5.0
    assert g.Point(0, 0).distance(g.LineString([(0, 5), (10, 5)])) == 5.0
    assert g.box(0, 0, 1, 1).distance(g.box(3, 0, 4, 1)) == 2.0
    assert g.box(0, 0, 2, 2).distance(g.Point(1, 1)) == 0.0


def test_measures():
    sq = g.box(0, 0, 10, 10)
    assert average_width(sq) == pytest.approx(10.0)
    assert compactness(sq) == pytest.approx(4 * np.pi * 100 / 1600)


def test_get_coordinates_m_fallback():
    # z is used as m when the geometry has no explicit m (buffer_by_m contract)
    ln = wkt.loads("LINESTRING Z (0 6 1, 0 0 2, 10 0 2)")
    cm = g.get_coordinates(ln, include_m=True)
    assert cm.shape == (3, 3)
    assert list(cm[:, 2]) == [1, 2, 2]
