"""Geodesic (ellipsoidal) ring area — from-scratch, no pyproj.

Re-expresses the geographic-CRS branch of the reference's
``remove_inner_rings`` (/root/reference/pygeoops/_general.py:527-537, which
delegates to ``pyproj.Geod.geometry_area_perimeter``): hole areas of
lon/lat-degree rings must be measured in m² on the ellipsoid, not in square
degrees.

Method (public formulas only):

1. WGS84 latitudes are mapped to AUTHALIC latitudes (Snyder, *Map
   Projections — A Working Manual*, USGS PP 1395, eq. 3-11/3-12): the
   authalic sphere of radius ``R_a = a·sqrt(q_p/2)`` preserves areas of
   regions bounded by parallels exactly and of general small regions to
   O(e⁴) ≈ 2e-5 relative.
2. The polygon area on that sphere is the exact great-circle-edge area via
   fan triangulation from the first vertex + l'Huilier's spherical-excess
   theorem (Todhunter, *Spherical Trigonometry* §109), summed signed.

For the hole-sized rings this engine filters (meters-to-kilometers scale)
the result agrees with GeographicLib's geodesic area to well under 1e-4
relative — far tighter than any sensible ``min_area_to_keep`` threshold.
"""

from __future__ import annotations

import numpy as np

__all__ = ["WGS84_A", "WGS84_F", "authalic_radius", "geodesic_ring_area", "zone_band_area"]

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
_E2 = WGS84_F * (2.0 - WGS84_F)
_E = np.sqrt(_E2)


def _q(sinphi: np.ndarray) -> np.ndarray:
    """Snyder's q auxiliary (eq. 3-12): 2·(authalic area integrand primitive)."""
    esin = _E * sinphi
    return (1.0 - _E2) * (
        sinphi / (1.0 - esin * esin)
        + np.log((1.0 + esin) / (1.0 - esin)) / (2.0 * _E)
    )


_QP = float(_q(np.array(1.0)))


def authalic_radius() -> float:
    """Radius of the sphere with the ellipsoid's surface area."""
    return WGS84_A * np.sqrt(_QP / 2.0)


def _authalic_lat(phi: np.ndarray) -> np.ndarray:
    """Geodetic → authalic latitude (exact, via q; Snyder eq. 3-11)."""
    s = np.clip(_q(np.sin(phi)) / _QP, -1.0, 1.0)
    return np.arcsin(s)


def zone_band_area(lat_deg: float) -> float:
    """Exact ellipsoid area between the equator and a parallel (whole zone).

    Closed form of ∫∫ a²(1-e²)cosφ/(1-e²sin²φ)² dφ dλ — used as the
    independent truth in tests for lat/lon boxes.
    """
    return float(np.pi * WGS84_A * WGS84_A * _q(np.sin(np.radians(lat_deg))))


def _tri_excess(a: float, b: float, c: float) -> float:
    """l'Huilier: spherical excess of a triangle from its side arc-lengths."""
    s = 0.5 * (a + b + c)
    t = (
        np.tan(0.5 * s)
        * np.tan(0.5 * (s - a))
        * np.tan(0.5 * (s - b))
        * np.tan(0.5 * (s - c))
    )
    return 4.0 * np.arctan(np.sqrt(max(t, 0.0)))


def geodesic_ring_area(coords: np.ndarray) -> float:
    """Unsigned area (m²) of a lon/lat-degree ring on the WGS84 ellipsoid.

    ``coords`` is an (N, 2+) array of (lon, lat) degrees; the ring may be
    open or closed, either winding. Degenerate rings return 0.
    """
    xy = np.asarray(coords, dtype=np.float64)[:, :2]
    if len(xy) and np.array_equal(xy[0], xy[-1]):
        xy = xy[:-1]
    if len(xy) < 3:
        return 0.0

    lam = np.radians(xy[:, 0])
    xi = _authalic_lat(np.radians(xy[:, 1]))

    # unit vectors on the authalic sphere
    cosxi = np.cos(xi)
    v = np.column_stack([cosxi * np.cos(lam), cosxi * np.sin(lam), np.sin(xi)])

    # fan triangulation from vertex 0; signed excess per triangle via the
    # orientation of (v0, vi, vi+1) (sign of the scalar triple product)
    v0 = v[0]
    total = 0.0
    for i in range(1, len(v) - 1):
        a_, b_, c_ = v0, v[i], v[i + 1]
        # side arc lengths (numerically stable for short arcs)
        sa = 2.0 * np.arcsin(min(1.0, 0.5 * np.linalg.norm(b_ - c_)))
        sb = 2.0 * np.arcsin(min(1.0, 0.5 * np.linalg.norm(a_ - c_)))
        sc = 2.0 * np.arcsin(min(1.0, 0.5 * np.linalg.norm(a_ - b_)))
        if min(sa, sb, sc) == 0.0:
            continue
        e = _tri_excess(sa, sb, sc)
        sign = 1.0 if np.dot(np.cross(b_ - a_, c_ - a_), a_) >= 0 else -1.0
        total += sign * e
    r = authalic_radius()
    return abs(total) * r * r


def crs_is_geographic(crs) -> bool:
    """Best-effort geographic-CRS detection without pyproj.

    Accepts pyproj-like objects (``is_geographic`` attribute honored), EPSG
    ints, and common strings. Unknown projected-looking inputs return False —
    matching the reference's default of planar area when the CRS is
    projected (_general.py:530-533).
    """
    if crs is None:
        return False
    geo = getattr(crs, "is_geographic", None)
    if geo is not None:
        return bool(geo)
    code = None
    if isinstance(crs, int):
        code = crs
    elif isinstance(crs, str):
        s = crs.strip().lower()
        if "4326" in s or "4258" in s or "4269" in s or "4979" in s:
            return True
        if "wgs84" in s.replace(" ", "") or "wgs 84" in s:
            return True
        if s.startswith("epsg:"):
            try:
                code = int(s.split(":", 1)[1])
            except ValueError:
                code = None
    if code in (4326, 4258, 4269, 4267, 4979):
        return True
    return False
