"""Scalar geometry measures as numpy kernels.

Covers the measures the reference computes inline: average width and
Polsby-Popper compactness (/root/reference/pygeoops/_centerline.py:222-245),
orthogonal point-line distance (/root/reference/pygeoops/_simplify_lang.py:188-220),
plus shoelace ring area used throughout.
"""

from __future__ import annotations

import math

import numpy as np

from pygeoops_ray.geo import geom as g

__all__ = [
    "ring_area",
    "average_width",
    "compactness",
    "point_line_distance",
    "point_line_distance_arr",
    "segment_lengths",
]


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area of a ring given as an (N, 2+) coordinate array.

    Positive for counterclockwise rings.
    """
    if len(ring) < 3:
        return 0.0
    x = ring[:, 0]
    y = ring[:, 1]
    return float(0.5 * np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def segment_lengths(coords: np.ndarray) -> np.ndarray:
    d = np.diff(coords[:, :2], axis=0)
    return np.hypot(d[:, 0], d[:, 1])


def average_width(geom: g.Geometry) -> float:
    """Average width of a polygon: perimeter/4 - sqrt((perimeter/4)^2 - area)."""
    quarter = geom.length / 4
    return quarter - math.sqrt(max(quarter**2 - geom.area, 0))


def compactness(geom: g.Geometry) -> float:
    """Polsby-Popper index: 4*pi*area / boundary_length^2."""
    boundary_length = geom.length
    if boundary_length == 0:
        return 0.0
    return (4 * math.pi * geom.area) / (boundary_length**2)


def point_line_distance(px, py, x1, y1, x2, y2) -> float:
    """Orthogonal distance from point to the infinite line through (x1,y1)-(x2,y2).

    Returns +inf when the line is degenerate (both points equal), so degenerate
    windows never pass a tolerance test.
    """
    denom = math.hypot(x2 - x1, y2 - y1)
    if denom == 0:
        return float("inf")
    return abs((x2 - x1) * (y1 - py) - (x1 - px) * (y2 - y1)) / denom


def point_line_distance_arr(points: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized orthogonal distances from (N,2) points to line a-b."""
    dx = b[0] - a[0]
    dy = b[1] - a[1]
    denom = math.hypot(dx, dy)
    if denom == 0:
        return np.full(len(points), np.inf)
    return np.abs(dx * (a[1] - points[:, 1]) - (a[0] - points[:, 0]) * dy) / denom
