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
