"""Geometry-zoo dispatch matrix: every op × every geometry kind.

Zoo transcribed from /root/reference/tests/test_helper.py:23-56 (TestData).
Asserts the per-type dispatch contracts: correct output types, None/empty
propagation, no crashes across the whole surface.
"""

import numpy as np
import pytest

import pygeoops_ray as pr
from pygeoops_ray.geo import geom as g


class Zoo:
    point = g.Point(0, 0)
    multipoint = g.MultiPoint([(0, 0), (10, 10), (20, 20)])
    linestring = g.LineString([(0, 0), (10, 10), (20, 20)])
    multilinestring = g.MultiLineString(
        [[(0, 0), (10, 10), (20, 20)], [(100, 100), (110, 110), (120, 120)]]
    )
    polygon_with_island = g.Polygon(
        [(0.01, 0), (0.01, 10), (1, 10), (10, 10), (10, 0), (0.01, 0)],
        [[(2, 2), (2, 8), (8, 8), (8, 2), (2, 2)]],
    )
    polygon_no_islands = g.Polygon(
        [(100.01, 100), (100.01, 110), (110, 110), (110, 100), (100.01, 100)]
    )
    polygon_with_island2 = g.Polygon(
        [(20, 20), (20, 30), (21, 30), (30, 30), (30, 20), (20, 20)],
        [[(22, 22), (22, 28), (28, 28), (28, 22), (22, 22)]],
    )
    multipolygon = g.MultiPolygon([polygon_no_islands, polygon_with_island2])
    geometrycollection = g.GeometryCollection(
        [point, multipoint, linestring, multilinestring, polygon_with_island, multipolygon]
    )
    polygon_small_island = g.Polygon(
        [(40, 40), (40, 50), (41, 50), (50, 50), (50, 40), (40, 40)],
        [[(42, 42), (42, 43), (43, 43), (43, 42), (42, 42)]],
    )


ALL = [
    Zoo.point,
    Zoo.multipoint,
    Zoo.linestring,
    Zoo.multilinestring,
    Zoo.polygon_with_island,
    Zoo.polygon_no_islands,
    Zoo.multipolygon,
    Zoo.geometrycollection,
]


@pytest.mark.parametrize("geom", ALL)
def test_simplify_dispatch(geom):
    out = pr.simplify(geom, 1.0, algorithm="lang")
    assert out is not None
    # primitive class preserved (point stays pointy, line liney, poly still area)
    assert out.primitivetype == geom.primitivetype or isinstance(
        out, g.GeometryCollection
    )


@pytest.mark.parametrize("geom", ALL)
def test_wkt_wkb_roundtrip_zoo(geom):
    from pygeoops_ray.geo import wkb, wkt

    assert wkt.loads(geom.wkt).equals_exact(geom, 1e-9)
    assert wkb.loads(wkb.dumps(geom)).equals_exact(geom, 0.0)


@pytest.mark.parametrize("geom", ALL)
def test_get_parts_and_types(geom):
    parts = pr.get_parts_recursive(geom)
    assert len(parts) >= 1
    assert all(not isinstance(p, g._Multi) for p in parts)
    pid = pr.get_primitivetype_id(geom)
    assert pid in (0, 1, 2, 3)


def test_collection_extract_zoo():
    gc = Zoo.geometrycollection
    pts = pr.collection_extract(gc, 1)
    lns = pr.collection_extract(gc, 2)
    pls = pr.collection_extract(gc, 3)
    from pygeoops_ray.geo.general import get_parts_recursive

    # a Multi part among the extracted geometries makes collect() return a
    # GeometryCollection (reference semantics, _general.py:58-62) — assert on
    # the primitive types of the flattened parts instead
    assert all(p.primitivetype.value == 1 for p in get_parts_recursive(pts))
    assert all(p.primitivetype.value == 2 for p in get_parts_recursive(lns))
    assert all(p.primitivetype.value == 3 for p in get_parts_recursive(pls))


def test_remove_small_island():
    out = pr.remove_inner_rings(Zoo.polygon_small_island, min_area_to_keep=2, crs=None)
    assert len(out.holes) == 0  # 1-unit island dropped
    out2 = pr.remove_inner_rings(Zoo.polygon_small_island, min_area_to_keep=0.5, crs=None)
    assert len(out2.holes) == 1


def test_buffer_difference_on_zoo_polygons():
    from pygeoops_ray.geo import boolean as B

    d = pr.difference_all(Zoo.polygon_with_island, [Zoo.polygon_with_island2])
    assert d.area == pytest.approx(Zoo.polygon_with_island.area)  # disjoint
    u = B.union(Zoo.polygon_no_islands, Zoo.polygon_with_island2)
    assert u.area == pytest.approx(
        Zoo.polygon_no_islands.area + Zoo.polygon_with_island2.area
    )


def test_centerline_on_zoo_polygon():
    cl = pr.centerline(Zoo.polygon_with_island)
    assert cl is not None and not cl.is_empty
    from pygeoops_ray.geo.predicates import point_in_polygon

    c = g.get_coordinates(cl)
    inside = sum(
        point_in_polygon(Zoo.polygon_with_island, p[0], p[1]) >= 0 for p in c
    )
    assert inside >= len(c) * 0.9  # tolerate extend/simplify endpoints on boundary


def test_0dim_ndarray_unwrap():
    """Reference accepts 0-dim ndarray-wrapped geometries at every entry
    (_general.py:94-99 _extract_0dim_ndarray): they must dispatch as scalars."""
    wrapped = np.array(Zoo.linestring, dtype=object)
    assert wrapped.ndim == 0
    s = pr.simplify(wrapped, 1.0)
    assert isinstance(s, g.LineString)
    start, end = pr.view_angles(g.Point(-5, -5), np.array(Zoo.point, dtype=object))
    assert start == end  # a point subtends a single angle
    poly = np.array(Zoo.polygon_with_island, dtype=object)
    assert isinstance(pr.centerline(poly), g.Geometry)
    assert isinstance(pr.collection_extract(poly, 3), g.Polygon)
    assert pr.get_primitivetype_id(poly) == 3
    out = pr.remove_inner_rings(poly, min_area_to_keep=1000, crs=None)
    assert len(out.holes) == 0
