"""Lightweight numpy-backed geometry model (no shapely/GEOS available).

Coordinates are float64 ndarrays of shape (N, D) with D in {2, 3, 4}; the
``has_z`` / ``has_m`` flags say how to interpret columns 2/3 (xy, xyz, xym, xyzm).
This is the in-memory form of every kernel; at rest geometries live in Arrow
``binary`` columns as ISO WKB (see wkb.py) or WKT strings.

API surface mirrors the subset of shapely the reference library leans on
(/root/reference/pygeoops SURVEY.md §2.1 #26,#28): construction, is_empty,
bounds, area, length, geoms, exterior/interiors, get_coordinates, get_parts.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

import numpy as np

from pygeoops_ray.geo.types import GeometryType, PrimitiveType

__all__ = [
    "Geometry",
    "Point",
    "LineString",
    "Polygon",
    "MultiPoint",
    "MultiLineString",
    "MultiPolygon",
    "GeometryCollection",
    "get_coordinates",
    "get_parts",
    "get_num_coordinates",
    "get_type_id",
    "box",
    "points",
]


def _as_coords(coords, min_points: int = 0) -> tuple[np.ndarray, bool, bool]:
    """Normalize input coords to an (N, D) float64 array. Returns (arr, has_z, has_m).

    Plain sequences with 3 values per point are interpreted as XYZ (like shapely).
    """
    arr = np.asarray(coords, dtype=np.float64)
    if arr.size == 0:
        return arr.reshape(0, 2), False, False
    if arr.ndim == 1:
        arr = arr.reshape(1, -1)
    if arr.ndim != 2 or arr.shape[1] < 2 or arr.shape[1] > 4:
        raise ValueError(f"invalid coordinate array shape: {arr.shape}")
    d = arr.shape[1]
    has_z = d >= 3
    has_m = d == 4
    if arr.shape[0] < min_points:
        raise ValueError(f"need at least {min_points} points, got {arr.shape[0]}")
    return arr, has_z, has_m


class Geometry:
    """Base class for all geometry types."""

    __slots__ = ()
    geom_type: str = "Geometry"
    type_id: int = 0

    # -- abstract-ish surface -------------------------------------------------
    @property
    def is_empty(self) -> bool:
        raise NotImplementedError

    @property
    def has_z(self) -> bool:
        return False

    @property
    def has_m(self) -> bool:
        return False

    def _coords_list(self) -> list[np.ndarray]:
        """All coordinate arrays, in order."""
        raise NotImplementedError

    # -- shared surface -------------------------------------------------------
    @property
    def geometrytype(self) -> GeometryType:
        t = GeometryType(self.type_id)
        if self.has_z and self.has_m:
            return GeometryType(self.type_id + 3000)
        if self.has_m:
            return GeometryType(self.type_id + 2000)
        if self.has_z:
            return GeometryType(self.type_id + 1000)
        return t

    @property
    def primitivetype(self) -> PrimitiveType:
        return GeometryType(self.type_id).to_primitivetype

    @property
    def bounds(self) -> tuple[float, float, float, float]:
        cs = [c for c in self._coords_list() if len(c)]
        if not cs:
            return (np.nan, np.nan, np.nan, np.nan)
        allc = np.concatenate([c[:, :2] for c in cs], axis=0)
        minx, miny = allc.min(axis=0)
        maxx, maxy = allc.max(axis=0)
        return (float(minx), float(miny), float(maxx), float(maxy))

    @property
    def num_coordinates(self) -> int:
        return sum(len(c) for c in self._coords_list())

    @property
    def area(self) -> float:
        return 0.0

    @property
    def length(self) -> float:
        return 0.0

    @property
    def wkt(self) -> str:
        from pygeoops_ray.geo import wkt as _wkt

        return _wkt.dumps(self)

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        w = self.wkt
        return w if len(w) <= 120 else w[:117] + "..."

    def __eq__(self, other) -> bool:
        if not isinstance(other, Geometry):
            return NotImplemented
        return self.equals_exact(other, 0.0)

    def __hash__(self):
        return hash(self.wkt)

    def equals_exact(self, other: "Geometry", tolerance: float = 0.0) -> bool:
        """Structural equality: same type, same coordinates within tolerance."""
        if self.type_id != other.type_id:
            return False
        a_list, b_list = self._coords_list(), other._coords_list()
        if len(a_list) != len(b_list):
            return False
        for a, b in zip(a_list, b_list):
            if a.shape[0] != b.shape[0]:
                return False
            if a.shape[0] == 0:
                continue
            da = a[:, :2]
            db = b[:, :2]
            if tolerance == 0.0:
                if not np.array_equal(da, db):
                    return False
            elif not np.allclose(da, db, rtol=0.0, atol=tolerance):
                return False
        return True

    def distance(self, other: "Geometry") -> float:
        from pygeoops_ray.geo import predicates

        return predicates.distance(self, other)

    def intersects(self, other: "Geometry") -> bool:
        from pygeoops_ray.geo import predicates

        return predicates.intersects(self, other)

    def contains(self, other: "Geometry") -> bool:
        from pygeoops_ray.geo import predicates

        return predicates.contains(self, other)


class Point(Geometry):
    __slots__ = ("coords", "_has_z", "_has_m")
    geom_type = "Point"
    type_id = 1

    def __init__(self, *args):
        if len(args) == 0:
            self.coords = np.zeros((0, 2))
            self._has_z = False
            self._has_m = False
            return
        if len(args) == 1:
            arr, hz, hm = _as_coords(args[0])
        else:
            arr, hz, hm = _as_coords([list(args)])
        if len(arr) != 1:
            raise ValueError(f"Point needs exactly 1 coordinate, got {len(arr)}")
        self.coords = arr
        self._has_z = hz
        self._has_m = hm

    @property
    def x(self) -> float:
        return float(self.coords[0, 0])

    @property
    def y(self) -> float:
        return float(self.coords[0, 1])

    @property
    def is_empty(self) -> bool:
        return len(self.coords) == 0

    @property
    def has_z(self) -> bool:
        return self._has_z

    @property
    def has_m(self) -> bool:
        return self._has_m

    def _coords_list(self) -> list[np.ndarray]:
        return [self.coords]


class LineString(Geometry):
    __slots__ = ("coords", "_has_z", "_has_m")
    geom_type = "LineString"
    type_id = 2

    def __init__(self, coords=None):
        if coords is None:
            self.coords = np.zeros((0, 2))
            self._has_z = False
            self._has_m = False
            return
        arr, hz, hm = _as_coords(coords)
        if 0 < len(arr) < 2:
            raise ValueError("LineString needs at least 2 coordinates")
        self.coords = arr
        self._has_z = hz
        self._has_m = hm

    @property
    def is_empty(self) -> bool:
        return len(self.coords) == 0

    @property
    def has_z(self) -> bool:
        return self._has_z

    @property
    def has_m(self) -> bool:
        return self._has_m

    @property
    def length(self) -> float:
        if len(self.coords) < 2:
            return 0.0
        d = np.diff(self.coords[:, :2], axis=0)
        return float(np.hypot(d[:, 0], d[:, 1]).sum())

    @property
    def is_closed(self) -> bool:
        return len(self.coords) >= 3 and np.array_equal(self.coords[0, :2], self.coords[-1, :2])

    def _coords_list(self) -> list[np.ndarray]:
        return [self.coords]


def _close_ring(arr: np.ndarray) -> np.ndarray:
    """Ensure first == last coordinate (a valid linearring), like shapely does."""
    if len(arr) == 0:
        return arr
    if len(arr) < 3:
        raise ValueError("A linearring requires at least 3 coordinates")
    if not np.array_equal(arr[0], arr[-1]):
        arr = np.concatenate([arr, arr[:1]], axis=0)
    return arr


class Polygon(Geometry):
    __slots__ = ("shell", "holes", "_has_z", "_has_m")
    geom_type = "Polygon"
    type_id = 3

    def __init__(self, shell=None, holes: Iterable | None = None):
        if shell is None or (hasattr(shell, "__len__") and len(shell) == 0):
            self.shell = np.zeros((0, 2))
            self.holes = []
            self._has_z = False
            self._has_m = False
            return
        if isinstance(shell, LineString):
            shell = shell.coords
        arr, hz, hm = _as_coords(shell)
        self.shell = _close_ring(arr)
        self.holes = []
        self._has_z = hz
        self._has_m = hm
        for h in holes or []:
            if isinstance(h, LineString):
                h = h.coords
            harr, _, _ = _as_coords(h)
            self.holes.append(_close_ring(harr))

    @property
    def is_empty(self) -> bool:
        return len(self.shell) == 0

    @property
    def has_z(self) -> bool:
        return self._has_z

    @property
    def has_m(self) -> bool:
        return self._has_m

    @property
    def exterior(self) -> LineString:
        return LineString(self.shell) if len(self.shell) else LineString()

    @property
    def interiors(self) -> list[LineString]:
        return [LineString(h) for h in self.holes]

    @property
    def rings(self) -> list[np.ndarray]:
        return ([self.shell] if len(self.shell) else []) + list(self.holes)

    @property
    def area(self) -> float:
        from pygeoops_ray.geo.measures import ring_area

        if self.is_empty:
            return 0.0
        a = abs(ring_area(self.shell))
        for h in self.holes:
            a -= abs(ring_area(h))
        return a

    @property
    def signed_area(self) -> float:
        from pygeoops_ray.geo.measures import ring_area

        return ring_area(self.shell) if not self.is_empty else 0.0

    @property
    def length(self) -> float:
        tot = 0.0
        for r in self.rings:
            d = np.diff(r[:, :2], axis=0)
            tot += float(np.hypot(d[:, 0], d[:, 1]).sum())
        return tot

    def _coords_list(self) -> list[np.ndarray]:
        return self.rings


class _Multi(Geometry):
    __slots__ = ("geoms",)
    part_cls: type = Geometry

    def __init__(self, geoms: Sequence | None = None):
        parts = []
        for p in geoms or []:
            if isinstance(p, self.part_cls):
                parts.append(p)
            else:
                parts.append(self.part_cls(p))
        self.geoms = parts

    @property
    def is_empty(self) -> bool:
        return len(self.geoms) == 0 or all(p.is_empty for p in self.geoms)

    @property
    def has_z(self) -> bool:
        return any(p.has_z for p in self.geoms)

    @property
    def has_m(self) -> bool:
        return any(p.has_m for p in self.geoms)

    @property
    def area(self) -> float:
        return sum(p.area for p in self.geoms)

    @property
    def length(self) -> float:
        return sum(p.length for p in self.geoms)

    def _coords_list(self) -> list[np.ndarray]:
        out = []
        for p in self.geoms:
            out.extend(p._coords_list())
        return out


class MultiPoint(_Multi):
    __slots__ = ()
    geom_type = "MultiPoint"
    type_id = 4
    part_cls = Point


class MultiLineString(_Multi):
    __slots__ = ()
    geom_type = "MultiLineString"
    type_id = 5
    part_cls = LineString


class MultiPolygon(_Multi):
    __slots__ = ()
    geom_type = "MultiPolygon"
    type_id = 6
    part_cls = Polygon

    def __init__(self, geoms: Sequence | None = None):
        parts = []
        for p in geoms or []:
            if isinstance(p, Polygon):
                parts.append(p)
            elif isinstance(p, tuple) and len(p) == 2:
                parts.append(Polygon(p[0], p[1]))
            else:
                parts.append(Polygon(p))
        self.geoms = parts


class GeometryCollection(_Multi):
    __slots__ = ()
    geom_type = "GeometryCollection"
    type_id = 7
    part_cls = Geometry

    def __init__(self, geoms: Sequence | None = None):
        self.geoms = list(geoms or [])


# ---------------------------------------------------------------------------
# free functions (shapely-flavoured helpers the kernels use)
# ---------------------------------------------------------------------------


def get_coordinates(geometry: Geometry | None, include_z=False, include_m=False) -> np.ndarray:
    """All coordinates of a geometry as an (N, k) array (k=2 + z + m columns)."""
    if geometry is None:
        return np.zeros((0, 2))
    cs = [c for c in geometry._coords_list() if len(c)]
    ncol = 2 + (1 if include_z else 0) + (1 if include_m else 0)
    if not cs:
        return np.zeros((0, ncol))
    out = []
    hz = geometry.has_z
    for c in cs:
        cols = [c[:, 0], c[:, 1]]
        if include_z:
            cols.append(c[:, 2] if hz and c.shape[1] > 2 else np.full(len(c), np.nan))
        if include_m:
            # m lives in col 3 for xyzm, col 2 for xym
            if geometry.has_m:
                mcol = 3 if hz else 2
                cols.append(c[:, mcol] if c.shape[1] > mcol else np.full(len(c), np.nan))
            elif hz and c.shape[1] > 2:
                # fall back to z as m (reference buffer_by_m semantics)
                cols.append(c[:, 2])
            else:
                cols.append(np.full(len(c), np.nan))
        out.append(np.column_stack(cols))
    return np.concatenate(out, axis=0)


def get_parts(geometry: Geometry | None) -> np.ndarray:
    """One-level explode of a multipart geometry (object ndarray of parts)."""
    if geometry is None:
        return np.array([], dtype=object)
    if isinstance(geometry, _Multi):
        out = np.empty(len(geometry.geoms), dtype=object)
        for i, g in enumerate(geometry.geoms):
            out[i] = g
        return out
    out = np.empty(1, dtype=object)
    out[0] = geometry
    return out


def get_num_coordinates(geometry: Geometry | None) -> int:
    return 0 if geometry is None else geometry.num_coordinates


def get_type_id(geometry: Geometry | None) -> int:
    return -1 if geometry is None else geometry.type_id


def box(minx: float, miny: float, maxx: float, maxy: float, ccw: bool = True) -> Polygon:
    """Rectangle polygon. ccw=True starts bottom-right, counterclockwise (like shapely)."""
    if ccw:
        ring = [(maxx, miny), (maxx, maxy), (minx, maxy), (minx, miny), (maxx, miny)]
    else:
        ring = [(minx, miny), (minx, maxy), (maxx, maxy), (maxx, miny), (minx, miny)]
    return Polygon(ring)


def set_m_only(geom: Geometry) -> Geometry:
    """Mark a 3-column geometry as XYM instead of XYZ (WKT/WKB 'M' variants)."""
    if isinstance(geom, (Point, LineString)):
        if geom.coords.shape[-1] == 3:
            geom._has_z = False
            geom._has_m = True
    elif isinstance(geom, Polygon):
        if len(geom.shell) and geom.shell.shape[1] == 3:
            geom._has_z = False
            geom._has_m = True
    elif isinstance(geom, _Multi):
        for p in geom.geoms:
            set_m_only(p)
    return geom


def points(coords) -> np.ndarray:
    """Array of Points from an (N,2+) coordinate array."""
    arr = np.asarray(coords, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr.reshape(1, -1)
    out = np.empty(len(arr), dtype=object)
    for i in range(len(arr)):
        out[i] = Point(arr[i : i + 1])
    return out
