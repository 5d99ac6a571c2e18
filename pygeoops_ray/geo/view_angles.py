"""View angles: the angular interval a geometry occupies seen from a viewpoint.

Re-expresses /root/reference/pygeoops/_view_angles.py:88-205 semantics: angles
in degrees 0-360, nan for empty; 0°/180°-crossing disambiguation via ray
intersection tests (here with our own segment-intersection kernel instead of
GEOS). The start angle may exceed the end angle (e.g. SE → NE sweep).
"""

from __future__ import annotations

import math

import numpy as np

from pygeoops_ray.geo import geom as g
from pygeoops_ray.geo import predicates

__all__ = ["view_angles"]

_LINE_LENGTH = 5_000_000.0


def view_angles(viewpoint, visible_geom):
    """Angles for one pair or arrays of pairs: returns tuple or (N,2) array."""
    from pygeoops_ray.geo.general import _extract_0dim

    viewpoint = _extract_0dim(viewpoint)
    visible_geom = _extract_0dim(visible_geom)
    vp_is_arr = _is_arraylike(viewpoint)
    vis_is_arr = _is_arraylike(visible_geom)
    if not vp_is_arr and not vis_is_arr:
        return _view_angles_one(viewpoint, visible_geom)
    if vp_is_arr:
        vps = list(viewpoint)
    else:
        vps = [viewpoint] * len(visible_geom)
    if vis_is_arr:
        viss = list(visible_geom)
    else:
        viss = [visible_geom] * len(viewpoint)
    if len(vps) != len(viss):
        raise ValueError(
            "viewpoint and visible_geom are arrays, so they must be the same length"
        )
    return np.array([_view_angles_one(a, b) for a, b in zip(vps, viss)])


def _is_arraylike(a) -> bool:
    return not isinstance(a, g.Geometry) and hasattr(a, "__len__")


def _intersects_ray(geom: g.Geometry, x0, y0, x1, y1) -> bool:
    seg_a = (np.array([x0, y0]), np.array([x1, y1]))
    for p1, p2 in predicates._segments(geom):
        if predicates.segments_intersect(seg_a[0], seg_a[1], p1, p2):
            return True
    if isinstance(geom, g.Point):
        return predicates._on_segment(geom.x, geom.y, x0, y0, x1, y1)
    if isinstance(geom, g.MultiPoint):
        return any(
            predicates._on_segment(p.x, p.y, x0, y0, x1, y1) for p in geom.geoms
        )
    return False


def _view_angles_one(viewpoint, visible_geom) -> tuple[float, float]:
    if not isinstance(viewpoint, g.Point):
        raise ValueError("viewpoint should be a point")
    if isinstance(visible_geom, g._Multi):
        raise ValueError("visible_geom can't be a multipart geometry")
    if visible_geom is None or visible_geom.is_empty:
        return (np.nan, np.nan)

    vx, vy = viewpoint.x, viewpoint.y
    coords = g.get_coordinates(visible_geom)[:, :2] - np.array([vx, vy])
    shifted = _shift_geom(visible_geom, -vx, -vy)

    angles = np.rad2deg(np.arctan2(coords[:, 1], coords[:, 0]))
    angles = np.where(angles < 0, angles + 360, angles)

    # does the geometry touch the 0° ray east of the origin?
    if np.any(angles == 0):
        intersects_0 = True
    else:
        intersects_0 = _intersects_ray(shifted, 0, 0, _LINE_LENGTH, 0)

    if not intersects_0:
        return (float(angles.min()), float(angles.max()))

    tol = 1e-10
    if not _intersects_ray(shifted, 0, -tol, _LINE_LENGTH, -tol):
        return (float(angles.min()), float(angles.max()))
    angles = np.append(angles, 360)

    if not _intersects_ray(shifted, 0, tol, _LINE_LENGTH, tol):
        nonzero = angles[angles != 0]
        if len(nonzero) > 0:
            return (float(nonzero.min()), float(nonzero.max()))
    else:
        angles = np.append(angles, 0)

    if not _intersects_ray(shifted, 0, 0, -_LINE_LENGTH, 0):
        angle_n_max = float(angles[angles <= 180].max())
        angle_s_min = float(angles[angles >= 180].min())
        return (angle_s_min, angle_n_max)
    angles = np.append(angles, 180)

    # brute-force search for an angle gap where the geom is not visible
    angle_prev = None
    for angle in np.sort(angles):
        if angle_prev is None or angle == angle_prev:
            angle_prev = angle
            continue
        angle_avg = (angle + angle_prev) / 2
        # (reference quirk: the probe uses cos/sin of the angle in DEGREES fed
        # to radians-based cos/sin — reproduced for parity, _view_angles.py:195-197)
        x = _LINE_LENGTH * math.cos(angle_avg)
        y = _LINE_LENGTH * math.sin(angle_avg)
        if not _intersects_ray(shifted, 0, 0, x, y):
            return (float(angle_prev), float(angle))
        angle_prev = angle
    return (0.0, 360.0)


def _shift_geom(geom: g.Geometry, dx: float, dy: float) -> g.Geometry:
    off = np.array([dx, dy])
    if isinstance(geom, g.Point):
        return g.Point(geom.coords[:, :2] + off)
    if isinstance(geom, g.LineString):
        return g.LineString(geom.coords[:, :2] + off)
    if isinstance(geom, g.Polygon):
        return g.Polygon(geom.shell[:, :2] + off, [h[:, :2] + off for h in geom.holes])
    if isinstance(geom, g._Multi):
        return type(geom)([_shift_geom(p, dx, dy) for p in geom.geoms])
    raise ValueError(f"unsupported geometry: {geom}")
