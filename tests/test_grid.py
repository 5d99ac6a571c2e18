"""Grid + split_tiles + subdivide tests.

Expected tile counts pinned to the reference's own assertions
(/root/reference/tests/test_grid.py:12-120).
"""

import numpy as np
import pytest

from pygeoops_ray.geo import geom as g
from pygeoops_ray.geo import grid
from pygeoops_ray.geo.general import subdivide

BOUNDS = (40000.0, 160000.0, 45000.0, 210000.0)


def test_create_grid():
    tiles = grid.create_grid(BOUNDS, nb_columns=2, nb_rows=2)
    assert len(tiles) == 4
    assert all(isinstance(t, g.Polygon) for t in tiles)
    assert sum(t.area for t in tiles) == pytest.approx(5000.0 * 50000.0)


def test_create_grid2_small_counts():
    for i in range(1, 10):
        tiles = grid.create_grid2(BOUNDS, nb_squarish_tiles=i)
        assert len(tiles) == i


def test_create_grid2_pinned_counts():
    assert len(grid.create_grid2(BOUNDS, nb_squarish_tiles=100)) == 96
    assert len(grid.create_grid2(BOUNDS, 150, nb_squarish_tiles_max=150)) == 148


@pytest.mark.parametrize(
    "exp_error, nb, nb_max",
    [
        ("nb_squarish_tiles_max should be > 0", 1, 0),
        ("nb_squarish_tiles_max should be >= nb_squarich_tiles", 4, 3),
        ("nb_squarish_tiles should be > 0", 0, None),
    ],
)
def test_create_grid2_invalid_params(exp_error, nb, nb_max):
    with pytest.raises(ValueError, match=exp_error):
        grid.create_grid2(BOUNDS, nb_squarish_tiles=nb, nb_squarish_tiles_max=nb_max)


def test_create_grid3():
    tiles = grid.create_grid3(
        BOUNDS, width=(BOUNDS[2] - BOUNDS[0]) / 2, height=(BOUNDS[3] - BOUNDS[1]) / 2
    )
    assert len(tiles) == 4


@pytest.mark.parametrize(
    "bounds, nb_tiles_wanted, exp_tiles",
    [
        ((40, 40, 45, 46), 8, 8),
        ((40, 40, 45, 46), 12, 12),
        ((40, 40, 46, 45), 8, 8),
        ((40, 40, 46, 45), 12, 12),
        ((40, 40, 45, 45), 2, 4),
    ],
)
def test_split_tiles(bounds, nb_tiles_wanted, exp_tiles):
    input_tiles = grid.create_grid2(bounds, nb_squarish_tiles=4)
    assert len(input_tiles) == 4
    names = ["foo", "bar", "spam", "ni"]
    tiles_with_attrs = list(zip(input_tiles, names))
    result = grid.split_tiles(tiles_with_attrs, nb_tiles_wanted)
    assert len(result) == exp_tiles
    # attribute retention and fan-out ratio per input tile
    spam = [t for t, a in result if a == "spam"]
    assert len(spam) == exp_tiles // 4
    # area conservation
    in_area = sum(t.area for t in input_tiles)
    out_area = sum(t.area for t, _ in result)
    assert out_area == pytest.approx(in_area)


def test_subdivide():
    big = g.box(0, 0, 100, 100)
    parts = subdivide(big, num_coords_max=3)
    assert len(parts) >= 2
    assert sum(p.area for p in parts) == pytest.approx(big.area)
    # small geometry is returned as-is
    parts1 = subdivide(big, num_coords_max=1000)
    assert len(parts1) == 1 and parts1[0] is big
    # disabled
    parts0 = subdivide(big, num_coords_max=0)
    assert len(parts0) == 1


def test_subdivide_line():
    line = g.LineString([(float(i), float(i % 7)) for i in range(100)])
    parts = subdivide(line, num_coords_max=20)
    assert len(parts) >= 2
    total = sum(p.length for p in parts)
    assert total == pytest.approx(line.length, rel=1e-9)
    assert all(isinstance(p, (g.LineString, g.MultiLineString)) for p in parts)


def test_subdivide_polygon_with_crossing_hole():
    # a hole crossing cell boundaries needs exact ring surgery (boolean path)
    from pygeoops_ray.geo.validity import is_valid

    poly = g.Polygon(
        [(0, 0), (25, 0), (50, 0), (75, 0), (100, 0), (100, 50), (100, 100),
         (50, 100), (0, 100), (0, 50), (0, 0)],
        [[(30, 30), (70, 30), (70, 70), (30, 70), (30, 30)]],
    )
    parts = subdivide(poly, num_coords_max=4)
    assert len(parts) >= 2
    assert sum(p.area for p in parts) == pytest.approx(poly.area)
    assert all(is_valid(p) for p in parts)
