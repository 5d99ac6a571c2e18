"""Topology-preserving simplify tests.

Transcribed from /root/reference/tests/test_simplify_topo.py:12-116: the
collinear shared-boundary case ((10,0) splitting poly2's (0,0)-(11,0) edge)
must leave both polygons identical after simplification.
"""

import numpy as np
import pytest

from pygeoops_ray.geo import geom as g
from pygeoops_ray.geo.simplify_topo import simplify_topo

POLY1 = g.Polygon([(10, 10), (0, 10), (0, 0), (10, 0), (10, 10)])
POLY2 = g.Polygon([(10, 10), (0, 10), (0, 0), (11, 0), (10, 10)])


@pytest.mark.parametrize(
    "algorithm, tolerance", [("rdp", 1), ("lang", 1), ("lang+", 1), ("vw", 5)]
)
def test_simplify_topo_reference(algorithm, tolerance):
    out = simplify_topo(
        np.array([POLY1, POLY2], dtype=object), tolerance=tolerance, algorithm=algorithm
    )
    assert len(out) == 2
    # poly1 can't be simplified and stays the same; the shared boundary adds
    # (10,0) to poly2 and simplification removes (11,0) → poly2 == poly1
    assert out[0].equals_exact(POLY1, 1e-9)
    assert out[0].equals_exact(out[1], 1e-9)


def test_simplify_topo_adjacent_squares():
    # three squares sharing vertical edges stay themselves (ref :66-93)
    p1 = g.Polygon([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)])
    p2 = g.Polygon([(10, 0), (20, 0), (20, 10), (10, 10), (10, 0)])
    p3 = g.Polygon([(20, 0), (30, 0), (30, 10), (20, 10), (20, 0)])
    out = simplify_topo(np.array([p1, p2, p3], dtype=object), tolerance=1, algorithm="lang")
    for got, want in zip(out, [p1, p2, p3]):
        assert got.area == pytest.approx(want.area)
        # normalize-equal: same vertex set, possibly rotated ring start
        assert sorted(map(tuple, got.shell[:-1])) == sorted(map(tuple, want.shell[:-1]))


def test_simplify_topo_single_falls_back():
    out = simplify_topo(POLY2, tolerance=1, algorithm="lang")
    assert isinstance(out, g.Polygon)


def test_simplify_topo_shared_border_no_gaps():
    from pygeoops_ray.geo import boolean as B
    from pygeoops_ray.geo import wkt

    a = wkt.loads("POLYGON ((0 0, 5 0.01, 10 0, 10 10, 0 10, 0 0))")
    b = wkt.loads("POLYGON ((0 0, 5 0.01, 10 0, 10 -10, 0 -10, 0 0))")
    out = simplify_topo(np.array([a, b], dtype=object), tolerance=0.5, algorithm="lang")
    u = B.union(out[0], out[1])
    assert u.area == pytest.approx(out[0].area + out[1].area)  # no gap, no overlap
