"""view_angles / extend_line / STRtree / line_merge tests.

view_angles cases transcribed from the reference's quadrant/crossing matrix
(/root/reference/tests/test_view_angles.py:37-101), with the viewpoint at an
offset origin like the reference's (10, 20) parametrization.
"""

import numpy as np
import pytest

from pygeoops_ray.geo import geom as g
from pygeoops_ray.geo import wkt
from pygeoops_ray.geo.extend_line import extend_line_by_distance, extend_line_to_geometry
from pygeoops_ray.geo.linemerge import line_merge
from pygeoops_ray.geo.strtree import STRtree
from pygeoops_ray.geo.view_angles import view_angles

VP = g.Point(10, 20)


def seg(x1, y1, x2, y2):
    # offsets relative to the viewpoint, reference-style
    return g.LineString([(10 + x1, 20 + y1), (10 + x2, 20 + y2)])


@pytest.mark.parametrize(
    "visible, exp",
    [
        (seg(1, 1, 1, 2), (45.0, 63.434948822922)),  # NE quadrant
        (seg(-1, 1, -1, 2), (116.565051177078, 135.0)),  # NW
        (seg(-1, -1, -1, -2), (225.0, 243.434948822922)),  # SW
        (seg(1, -1, 1, -2), (296.565051177078, 315.0)),  # SE
        (seg(2, -1, 2, 1), (333.434948822922, 26.565051177077994)),  # crosses 0° east
        (seg(1, 0, 2, 0), (0.0, 0.0)),  # on the 0° ray
        (seg(-2, -1, -2, 1), (153.434948822922, 206.565051177078)),  # crosses 180°
    ],
)
def test_view_angles_quadrants(visible, exp):
    got = view_angles(VP, visible)
    assert got == pytest.approx(exp, abs=1e-9)


def test_view_angles_empty_nan():
    a = view_angles(VP, g.LineString())
    assert np.isnan(a[0]) and np.isnan(a[1])


def test_view_angles_errors():
    with pytest.raises(ValueError, match="viewpoint should be a point"):
        view_angles(g.LineString([(0, 0), (1, 1)]), seg(1, 1, 1, 2))
    with pytest.raises(ValueError, match="multipart"):
        view_angles(VP, g.MultiLineString([g.LineString([(0, 0), (1, 1)])]))


def test_view_angles_arrays():
    geoms = [seg(1, 1, 1, 2), seg(-1, 1, -1, 2)]
    out = view_angles(VP, geoms)
    assert out.shape == (2, 2)
    assert out[0] == pytest.approx((45.0, 63.434948822922))
    with pytest.raises(ValueError, match="same length"):
        view_angles([VP], geoms)


def test_view_angles_surrounding_polygon():
    # viewpoint strictly inside a polygon ring → visible all around
    ring = g.Polygon([(9, 19), (11, 19), (11, 21), (9, 21)])
    got = view_angles(VP, ring)
    assert got == (0.0, 360.0)


def test_extend_line_by_distance():
    ln = g.LineString([(0, 0), (1, 0)])
    ext = extend_line_by_distance(ln, 1, 2)
    assert ext.equals_exact(g.LineString([(-1, 0), (3, 0)]), 1e-12)
    assert extend_line_by_distance(ln, 0, 0) is ln
    with pytest.raises(ValueError, match="distance must be >= 0"):
        extend_line_by_distance(ln, -1, 0)


def test_extend_line_to_geometry():
    box = g.box(-5, -5, 5, 5)
    ext = extend_line_to_geometry(g.LineString([(-1, 0), (1, 0)]), box)
    assert ext.equals_exact(g.LineString([(-5, 0), (5, 0)]), 1e-9)
    # diagonal
    ext2 = extend_line_to_geometry(g.LineString([(-1, -1), (1, 1)]), box)
    assert ext2.equals_exact(g.LineString([(-5, -5), (5, 5)]), 1e-9)
    with pytest.raises(ValueError, match="must be a"):
        extend_line_to_geometry(g.LineString([(0, 0), (1, 1)]), g.Point(0, 0))


def test_extend_multiline_blockers():
    # Y shape: branch endpoints touching other branches are not extended there
    ml = g.MultiLineString(
        [
            g.LineString([(0, 0), (0, 2)]),
            g.LineString([(0, 2), (2, 4)]),
            g.LineString([(0, 2), (-2, 4)]),
        ]
    )
    ext = extend_line_to_geometry(ml, g.box(-5, -1, 5, 5))
    coords0 = ext.geoms[0].coords
    assert coords0[0][1] == -1  # free end extended down to the box
    assert coords0[-1][1] == 2  # junction end untouched


def test_strtree():
    boxes = np.array([[i, 0, i + 1, 1] for i in range(1000)], dtype=float)
    tree = STRtree(boxes)
    assert sorted(tree.query(10.5, 0.5, 12.5, 0.6)) == [10, 11, 12]
    assert list(tree.query_point(500.5, 0.5)) == [500]
    assert len(tree.query(-10, -10, -5, -5)) == 0
    assert len(STRtree(np.zeros((0, 4))).query(0, 0, 1, 1)) == 0


def test_line_merge():
    mls = g.MultiLineString(
        [
            g.LineString([(0, 0), (1, 0)]),
            g.LineString([(1, 0), (2, 0)]),
            g.LineString([(5, 5), (6, 6)]),
        ]
    )
    out = line_merge(mls)
    assert isinstance(out, g.MultiLineString)
    assert len(out.geoms) == 2
    lens = sorted(ln.num_coordinates for ln in out.geoms)
    assert lens == [2, 3]


def test_line_merge_through_chain():
    mls = g.MultiLineString(
        [g.LineString([(i, 0), (i + 1, 0)]) for i in range(10)]
    )
    out = line_merge(mls)
    assert isinstance(out, g.LineString)
    assert out.num_coordinates == 11


def test_line_merge_junction_breaks():
    mls = g.MultiLineString(
        [
            g.LineString([(0, 0), (1, 1)]),
            g.LineString([(1, 1), (2, 0)]),
            g.LineString([(1, 1), (1, 3)]),
        ]
    )
    out = line_merge(mls)
    assert isinstance(out, g.MultiLineString)
    assert len(out.geoms) == 3  # degree-3 node breaks all chains


@pytest.mark.parametrize(
    "descr, exp_start, exp_end, w",
    [
        ["NE>NW_<360", 45.0, 135.0, "POLYGON((1 1, 1 -1, -1 -1, -1 1, -2 -2, 2 -2, 1 1))"],
        ["NE>SW_<360", 0.0, 270.0, "POLYGON((1 0, 0 1, -1 0, 0 -1, -1 -1, -2 2, 2 2, 1 0))"],
        ["NE>SW_360", 0.0, 360.0,
         "POLYGON((1 0, 1 1, -1 1, -1 -1, 1 -1, 2 0, 2 -2, -2 -2, -2 2, 2 2, 1 0))"],
        ["NE_SE", 315.0, 45.0, "POLYGON((1 1, 1 -1, 2 -1, 2 1, 1 1))"],
        ["NE_y0", 0.0, 45.0, "POLYGON((1 0, 1 1, 2 1, 2 0, 1 0))"],
        ["NW", 135.0, 180.0, "POLYGON((-1 0, -1 1, -2 1, -2 0, -1 0))"],
        ["NW_SE", 135.0, 315.0, "POLYGON((-1 1, -1 0.5, 1 -1, -3 1, -1 1))"],
        ["NW_SW", 135.0, 225.0, "POLYGON((-1 -1, -1 1, -2 1, -2 -1, -1 -1))"],
        ["NWgtSE", 135.0, 360.0, "POLYGON((-1 1, -1 -1, 1 -1, 1 0, 2 -2, -2 -2, -1 1))"],
        ["SE_yne0", 270.0, 315.0, "POLYGON((1 -1, 0 -1, 0 -2, 1 -1))"],
        ["SE_y0", 315.0, 360.0, "POLYGON((1 0, 1 -1, 2 -1, 2 0, 1 0))"],
        ["SWgtNW", 225.0, 135.0, "POLYGON((-1 -1, 2 -1, -1 1, 3 1, 3 -2, -1 -1))"],
    ],
)
def test_view_angles_reference_matrix(descr, exp_start, exp_end, w):
    # exact transcription of /root/reference/tests/test_view_angles.py:38-80
    # (polygon offsets relative to viewpoint (10, 20)); all cases match GEOS
    # outputs exactly.
    geom = wkt.loads(w)
    shifted = g.Polygon(
        geom.shell[:, :2] + np.array([10.0, 20.0]),
        [h[:, :2] + np.array([10.0, 20.0]) for h in geom.holes],
    )
    assert view_angles(VP, shifted) == (exp_start, exp_end)


# --- segment-extension math matrix (ref tests/test_extend_line.py:236-313) ---

import math

from pygeoops_ray.geo.extend_line import (
    _extend_segment_by_distance,
    _extend_segment_by_ratio,
    _extend_segment_to_bbox,
)


@pytest.mark.parametrize(
    "p1, p2, distance, exp",
    [
        ((0, 0), (1, 1), 0, (1, 1)),
        ((0, 0), (1, 1), math.sqrt(2), (2, 2)),
        ((0, 0), (1, 1), 2 * math.sqrt(2), (3, 3)),
        ((0, 0), (1, 0), 1, (2, 0)),
        ((0, 0), (0, 1), 1, (0, 2)),
    ],
)
def test_extend_segment_by_distance_matrix(p1, p2, distance, exp):
    _, ext = _extend_segment_by_distance(p1, p2, distance)
    assert tuple(np.round(ext, 9)) == exp


def test_extend_segment_by_distance_invalid():
    with pytest.raises(ValueError, match="distance must be >= 0"):
        _extend_segment_by_distance((0, 0), (1, 1), -1)
    with pytest.raises(ValueError, match="lenght of input segment cannot be 0"):
        _extend_segment_by_distance((0, 0), (0, 0), 1)


@pytest.mark.parametrize(
    "p1, p2, ratio, exp",
    [
        ((0, 0), (1, 1), 0, (1, 1)),
        ((0, 0), (1, 1), 1, (2, 2)),
        ((0, 0), (1, 1), 0.5, (1.5, 1.5)),
        ((1, 1), (0, 0), 1, (-1, -1)),
        ((1, 1), (0, 0), 0.5, (-0.5, -0.5)),
        ((1, 0), (0, 1), 1, (-1, 2)),
        ((0, 1), (1, 0), 1, (2, -1)),
        ((0, 0), (1, 0), 0.5, (1.5, 0)),
        ((0, 0), (0, 1), 0.5, (0, 1.5)),
    ],
)
def test_extend_segment_by_ratio_matrix(p1, p2, ratio, exp):
    _, ext = _extend_segment_by_ratio(p1, p2, ratio)
    assert tuple(np.round(ext, 9)) == exp
    with pytest.raises(ValueError, match="ratio must be >= 0"):
        _extend_segment_by_ratio((0, 0), (1, 1), -1)


@pytest.mark.parametrize(
    "p1, p2, bbox, exp",
    [
        ((1, 1), (2, 2), (0, 0, 4, 4), ((0, 0), (4, 4))),
        ((2, 2), (4, 4), (0, 0, 4, 4), ((0, 0), (4, 4))),
        ((2, 2), (1, 1), (0, 0, 4, 4), ((4, 4), (0, 0))),
        ((4, 4), (2, 2), (0, 0, 4, 4), ((4, 4), (0, 0))),
        ((5, 5), (2, 2), (0, 0, 4, 4), ((4, 4), (0, 0))),
        ((1, 1), (2, 1), (0, 0, 4, 4), ((0, 1), (4, 1))),
        ((2, 1), (1, 1), (0, 0, 4, 4), ((4, 1), (0, 1))),
        ((1, 1), (1, 2), (0, 0, 4, 4), ((1, 0), (1, 4))),
        ((1, 2), (1, 1), (0, 0, 4, 4), ((1, 4), (1, 0))),
    ],
)
def test_extend_segment_to_bbox_matrix(p1, p2, bbox, exp):
    a, b = _extend_segment_to_bbox(p1, p2, bbox)
    assert (tuple(np.round(a, 9)), tuple(np.round(b, 9))) == exp


def test_extend_line_to_geometry_polygon_island_reference():
    """Transcribed from reference tests/test_extend_line.py:229-233: blockers
    with holes — extensions stop at the island when it is in the path."""
    from pygeoops_ray.geo import geom as g
    from pygeoops_ray.geo.extend_line import extend_line_to_geometry

    def box(x0, y0, x1, y1):
        return [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]

    cases = [
        (
            g.MultiLineString(
                [[(3, 5), (4, 5), (5, 5)], [(5, 5), (6, 6), (7, 7)], [(5, 5), (6, 4), (7, 3)]]
            ),
            g.Polygon(box(0, 0, 10, 10), [box(5, 4, 6, 6)]),
            [[(0, 5), (4, 5), (5, 5)], [(5, 5), (6, 6), (10, 10)], [(5, 5), (6, 4), (10, 0)]],
        ),
        (
            g.MultiLineString([[(3, 5), (5, 5)], [(3, 3), (5, 3)], [(3, 7), (5, 7)]]),
            g.Polygon(box(0, 0, 10, 10), [box(6, 4, 7, 6)]),
            [[(0, 5), (6, 5)], [(0, 3), (10, 3)], [(0, 7), (10, 7)]],
        ),
    ]
    for line, geom, exp in cases:
        r = extend_line_to_geometry(line, geom)
        got = [
            [tuple(c) for c in part.coords]
            for part in (r.geoms if r.geom_type == "MultiLineString" else [r])
        ]
        assert got == [[tuple(map(float, c)) for c in part] for part in exp]
