"""Simplify kernels + geometry-level simplify.

Semantics transcribed from the reference suite:
/root/reference/tests/test_simplify_lang.py:12-83 (lang/lang+ window behaviour)
and tests/test_simplify.py (coord-count properties, keep_points_on, invalid
M-shape handling).
"""

import numpy as np
import pytest

from pygeoops_ray.geo import geom as g
from pygeoops_ray.geo import wkt
from pygeoops_ray.geo.simplify import simplify
from pygeoops_ray.geo.simplify_kernels import (
    simplify_coords_lang,
    simplify_coords_lang_idx,
    simplify_coords_rdp_idx,
    simplify_coords_vw_idx,
)


def test_lang_lookahead_points():
    # ref tests/test_simplify_lang.py:12-39: with lookahead=3 the 4th point of a
    # collinear run is never removed by standard lang, but lang+ removes it.
    coords = [(0, 0), (10, 10), (20, 20), (30, 30), (40, 40), (50, 30), (60, 20), (70, 10)]
    out = simplify_coords_lang(
        np.array(coords), tolerance=1, lookahead=3, simplify_lookahead_points=True
    )
    assert isinstance(out, np.ndarray)
    assert len(out) == 3


def test_lang_input_types():
    coords = [(0, 0), (10, 10), (20, 20), (30, 30), (40, 40)]
    out_list = simplify_coords_lang(coords, tolerance=1)
    assert isinstance(out_list, list)
    assert len(out_list) == 2
    out_arr = simplify_coords_lang(np.array(coords), tolerance=1)
    assert isinstance(out_arr, np.ndarray)
    assert len(out_arr) == 2


def test_lang_idx_input_types():
    coords = [(0, 0), (10, 10), (20, 20)]
    idx = simplify_coords_lang_idx(coords, tolerance=1)
    assert isinstance(idx, list)
    assert idx == [0, 2]
    idx_arr = simplify_coords_lang_idx(np.array(coords), tolerance=1)
    assert isinstance(idx_arr, np.ndarray)
    assert list(idx_arr) == [0, 2]


def test_lang_retains_endpoints():
    coords = np.array([(0.0, 0.0), (1.0, 5.0), (2.0, 0.0), (3.0, 5.0), (4.0, 0.0)])
    idx = simplify_coords_lang_idx(coords, tolerance=0.1)
    assert idx[0] == 0 and idx[-1] == len(coords) - 1
    assert len(idx) == len(coords)  # nothing within tolerance


def test_rdp_vw_basic():
    coords = np.array([(0.0, 0.0), (1.0, 0.05), (2.0, 0.0), (3.0, 2.0), (4.0, 0.0)])
    idx = simplify_coords_rdp_idx(coords, tolerance=0.1)
    assert list(idx) == [0, 2, 3, 4] or list(idx) == [0, 3, 4]
    idx_vw = simplify_coords_vw_idx(coords, tolerance=0.2)
    assert 0 in idx_vw and 4 in idx_vw
    assert 1 not in idx_vw  # tiny triangle area removed


def test_simplify_polygon_basics():
    poly = wkt.loads("POLYGON ((0 0, 1 0.01, 2 0, 4 0, 4 4, 0 4, 0 0))")
    for algo in ("lang", "lang+", "rdp", "vw"):
        out = simplify(poly, 0.5, algorithm=algo)
        assert isinstance(out, g.Polygon)
        assert out.num_coordinates < poly.num_coordinates
        assert out.area == pytest.approx(16.0, rel=0.01)


def test_simplify_none_propagation():
    assert simplify(None, 1.0) is None
    arr = np.array([None, g.box(0, 0, 4, 4)], dtype=object)
    out = simplify(arr, 1.0, algorithm="lang")
    assert out[0] is None
    assert isinstance(out[1], g.Polygon)


def test_simplify_point_passthrough():
    pt = g.Point(1, 2)
    assert simplify(pt, 10, algorithm="lang") is pt


def test_simplify_preserve_topology():
    # aggressive tolerance would collapse the ring; preserve_topology keeps original
    poly = wkt.loads("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    out = simplify(poly, 100.0, algorithm="lang+", preserve_topology=True)
    assert isinstance(out, g.Polygon)
    assert not out.is_empty
    out2 = simplify(
        g.LineString([(0, 0), (0.1, 0.01), (0.2, 0)]), 100.0, algorithm="lang",
        preserve_topology=False,
    )
    assert out2 is None or isinstance(out2, g.LineString)


def test_simplify_keep_points_on():
    # vertices on the guard geometry survive even when within tolerance
    poly = wkt.loads("POLYGON ((0 0, 2 0.01, 4 0, 4 4, 0 4, 0 0))")
    guard = g.LineString([(2, 0.01), (2, -5)])
    out_no = simplify(poly, 0.5, algorithm="lang")
    out_yes = simplify(poly, 0.5, algorithm="lang", keep_points_on=guard)
    assert out_no.num_coordinates < out_yes.num_coordinates
    coords = g.get_coordinates(out_yes)
    assert any((c[0] == 2 and c[1] == 0.01) for c in coords)


def test_simplify_multipolygon():
    mp = g.MultiPolygon([g.box(0, 0, 4, 4), g.box(10, 10, 14, 14)])
    out = simplify(mp, 0.5, algorithm="lang")
    assert isinstance(out, g.MultiPolygon)
    assert len(out.geoms) == 2


def test_simplify_invalid_algorithm():
    with pytest.raises(ValueError, match="Unsupported algorithm"):
        simplify(g.box(0, 0, 1, 1), 1.0, algorithm="bogus")


def test_simplify_topo_combination_error():
    with pytest.raises(ValueError, match="not supported"):
        simplify(
            g.box(0, 0, 1, 1),
            1.0,
            preserve_common_boundaries=True,
            preserve_topology=False,
        )


def test_simplify_basic_lang_counts():
    # ref tests/test_simplify.py:14-125 exact-count matrix
    ls = g.LineString([(0, 0), (10, 10), (20, 20)])
    assert len(simplify(ls, 1, algorithm="lang", lookahead=-1).coords) == 2
    assert len(simplify(ls, 1, algorithm="lang").coords) == 2
    poly = g.Polygon(
        [(0, 0), (0, 10), (1, 10), (10, 10), (10, 0), (0, 0)],
        [[(2, 2), (2, 8), (8, 8), (8, 2), (2, 2)]],
    )
    s = simplify(poly, 1, algorithm="lang", lookahead=-1)
    assert isinstance(s, g.Polygon) and len(s.shell) == 5
    s8 = simplify(poly, 1, algorithm="lang")
    assert len(s8.shell) == 5
    # two-point line: no simplification possible
    assert len(simplify(g.LineString([(0, 0), (20, 20)]), 1, algorithm="lang").coords) == 2
    # multilinestring
    mls = g.MultiLineString([[(0, 0), (10, 10), (20, 20)], [(100, 100), (110, 110), (120, 120)]])
    sm = simplify(mls, 1, algorithm="lang")
    assert isinstance(sm, g.MultiLineString) and len(sm.geoms) == 2
    assert len(sm.geoms[0].coords) == 2
    # multipolygon
    poly2 = g.Polygon([(100, 100), (100, 110), (110, 110), (110, 100), (100, 100)])
    smp = simplify(g.MultiPolygon([poly, poly2]), 1, algorithm="lang")
    assert isinstance(smp, g.MultiPolygon) and len(smp.geoms) == 2
    assert len(smp.geoms[0].shell) == 5
    # geometrycollection of all of the above
    gc = g.GeometryCollection([g.Point(0, 0), g.MultiPoint([(0, 0), (10, 10), (20, 20)]), ls, mls, poly, g.MultiPolygon([poly, poly2])])
    sgc = simplify(gc, 1, algorithm="lang")
    assert isinstance(sgc, g.GeometryCollection) and len(sgc.geoms) == 6


def test_simplify_invalid_geometry_reference_counts():
    # ref tests/test_simplify.py:181-251: invalid/self-touching/crossing rings
    poly = g.Polygon(
        [(0, 0), (0, 10), (5, 10), (3, 12), (3, 9), (10, 10), (10, 0), (0, 0)],
        [[(2, 2), (2, 8), (8, 8), (8, 2), (2, 2)]],
    )
    s = simplify(poly, 1, algorithm="lang")
    assert isinstance(s, g.MultiPolygon)
    counts = sorted(len(p.shell) for p in s.geoms)
    assert 7 in counts  # the big part keeps 7 exterior coords (ref :191)
    assert sum(len(p.holes) for p in s.geoms) == 1  # hole retained

    m_touch = g.Polygon(
        [(0, 0), (0, 10), (5, 5), (10, 10), (10, 0), (8, 0), (8, 5), (5, 4), (2, 5), (2, 0), (0, 0)]
    )
    st = simplify(m_touch, 1, algorithm="lang")
    assert isinstance(st, g.MultiPolygon) and len(st.geoms) == 2

    m_cross = g.Polygon(
        [(0, 0), (0, 10), (5, 5), (10, 10), (10, 0), (8, 0), (8, 5.5), (5, 4.5), (2, 5.5), (2, 0), (0, 0)]
    )
    sc = simplify(m_cross, 1, algorithm="lang")
    assert isinstance(sc, g.MultiPolygon) and len(sc.geoms) == 3


@pytest.mark.parametrize(
    "algorithm, tolerance", [("lang", 2), ("lang+", 2), ("rdp", 2), ("vw", 15)]
)
def test_simplify_keep_points_on_matrix(algorithm, tolerance):
    # ref tests/test_simplify.py:275-313 — exact counts + area preservation
    poly_input = g.Polygon([(0, 0), (0, 10), (5, 12), (10, 10), (10, 0), (5, 0), (0, 0)])
    keep_line = g.LineString([(0, 0), (0, 12), (10, 12)])
    plain = simplify(poly_input, tolerance, algorithm=algorithm)
    assert len(plain.shell) == len(poly_input.shell) - 2
    assert plain.area < poly_input.area
    kept = simplify(poly_input, tolerance, algorithm=algorithm, keep_points_on=keep_line)
    assert len(kept.shell) == len(poly_input.shell) - 1
    assert kept.area == poly_input.area
