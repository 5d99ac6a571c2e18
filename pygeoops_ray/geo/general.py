"""General geometry utilities: collect / extract / explode / type helpers.

Re-expresses /root/reference/pygeoops/_general.py semantics on the numpy
geometry model: ``collect`` (:16-91), ``collection_extract`` (:102-222),
``empty`` (:225-240), ``explode`` (:243-259), ``get_parts_recursive``
(:340-381), ``get_primitivetype_id`` (:384-412), ``format_short`` (:287-337),
``remove_inner_rings`` (:482-564), ``subdivide`` (:567-602).
"""

from __future__ import annotations

import math

import numpy as np

from pygeoops_ray.geo import geom as g
from pygeoops_ray.geo.measures import ring_area
from pygeoops_ray.geo.types import GeometryType, PrimitiveType

__all__ = [
    "collect",
    "collection_extract",
    "empty",
    "explode",
    "get_parts_recursive",
    "get_primitivetype_id",
    "format_short",
    "remove_inner_rings",
    "subdivide",
]


def _is_arraylike(a) -> bool:
    return not isinstance(a, (str, g.Geometry)) and hasattr(a, "__len__")


def _extract_0dim(a):
    """Unwrap a 0-dim ndarray to its scalar item (reference _general.py:94-99).

    A 0-dim object ndarray wrapping a geometry has ``__len__``-free indexing
    semantics but would otherwise be mis-dispatched; every array-or-scalar
    public entry unwraps first, matching ``_extract_0dim_ndarray``.
    """
    if isinstance(a, np.ndarray) and a.ndim == 0:
        return a.item()
    return a


def collect(geometries):
    """Collect geometries into the narrowest valid (multi)geometry.

    None/empty elements are dropped; a mix of types yields a GeometryCollection;
    a MultiPolygon whose parts touch (invalid) falls back to GeometryCollection.
    """
    geometries = _extract_0dim(geometries)
    if geometries is None:
        return None
    if not _is_arraylike(geometries):
        return geometries
    geoms = [p for p in geometries if p is not None and not p.is_empty]
    if len(geoms) == 0:
        return None
    if len(geoms) == 1:
        return geoms[0]

    result_type = None
    for geom in geoms:
        if isinstance(geom, g._Multi):
            result_type = GeometryType.GEOMETRYCOLLECTION
            break
        t = GeometryType(geom.type_id)
        if result_type is None:
            result_type = t.to_multitype
        elif t.to_multitype == result_type:
            continue
        else:
            result_type = GeometryType.GEOMETRYCOLLECTION
            break

    if result_type == GeometryType.MULTIPOINT:
        return g.MultiPoint(geoms)
    if result_type == GeometryType.MULTILINESTRING:
        return g.MultiLineString(geoms)
    if result_type == GeometryType.MULTIPOLYGON:
        mp = g.MultiPolygon(geoms)
        return mp if _multipolygon_is_valid(mp) else g.GeometryCollection(geoms)
    if result_type == GeometryType.GEOMETRYCOLLECTION:
        return g.GeometryCollection(geoms)
    raise ValueError(f"Unsupported geometry type: {result_type}")


def _multipolygon_is_valid(mp: g.MultiPolygon) -> bool:
    """Validity check for collect(): the shared OGC pairwise rule (parts may
    touch at finite points, not overlap in area or share boundary edges)."""
    from pygeoops_ray.geo.validity import multipolygon_parts_valid

    return multipolygon_parts_valid(mp)


def _to_primitivetype_id(pri) -> int:
    if isinstance(pri, PrimitiveType):
        return pri.value
    if isinstance(pri, (int, np.integer)):
        if pri not in (0, 1, 2, 3):
            raise ValueError(f"Invalid value for primitivetype: {pri}")
        return int(pri)
    if pri is None:
        raise ValueError("Invalid value for primitivetype: None")
    raise ValueError(f"Invalid type for primitivetype: {type(pri)}")


def collection_extract(geometry, primitivetype=None):
    """Keep only the parts of the requested primitive type (0=all,1=pt,2=line,3=poly)."""
    geometry = _extract_0dim(geometry)
    if geometry is None:
        return None

    if not _is_arraylike(primitivetype):
        primitivetype_id = _to_primitivetype_id(primitivetype)
        if primitivetype_id == 0:
            return geometry
        if _is_arraylike(geometry):
            primitivetype = [primitivetype_id] * len(geometry)
        else:
            return _collection_extract_one(geometry, primitivetype_id)
    else:
        primitivetype = [_to_primitivetype_id(p) for p in primitivetype]
        if _is_arraylike(geometry):
            if len(primitivetype) != len(geometry):
                raise ValueError(
                    "geometry and primitivetype are arraylike, so len must be equal"
                )
        else:
            raise ValueError("single geometry passed, but primitivetype is arraylike")

    out = np.empty(len(geometry), dtype=object)
    for i, (geom, pri) in enumerate(zip(geometry, primitivetype)):
        out[i] = _collection_extract_one(geom, pri)
    return out


def _collection_extract_one(geometry, primitivetype_id: int):
    if geometry is None:
        return None
    if primitivetype_id == 0:
        return geometry
    if isinstance(geometry, (g.Point, g.MultiPoint)):
        return geometry if primitivetype_id == 1 else None
    if isinstance(geometry, (g.LineString, g.MultiLineString)):
        return geometry if primitivetype_id == 2 else None
    if isinstance(geometry, (g.Polygon, g.MultiPolygon)):
        return geometry if primitivetype_id == 3 else None
    if isinstance(geometry, g.GeometryCollection):
        parts = [_collection_extract_one(p, primitivetype_id) for p in geometry.geoms]
        parts = [p for p in parts if p is not None]
        if parts:
            return collect(parts)
        return None
    raise ValueError(f"Invalid/unsupported geometry(type): {geometry}")


def empty(geometrytype):
    if geometrytype is None:
        return None
    if not isinstance(geometrytype, GeometryType):
        geometrytype = GeometryType(geometrytype)
    return geometrytype.empty


def explode(geometry):
    """One-level explode (deprecated in the reference since 0.6.0)."""
    geometry = _extract_0dim(geometry)
    if geometry is None:
        return None
    return g.get_parts(geometry)


def get_parts_recursive(geometry):
    """Fully flatten nested multi/collection geometries to simple parts."""
    if geometry is None:
        return None
    if not isinstance(geometry, g._Multi):
        out = np.empty(1, dtype=object)
        out[0] = geometry
        return out
    parts: list[g.Geometry] = []
    stack = list(reversed(geometry.geoms))
    while stack:
        p = stack.pop()
        if isinstance(p, g._Multi):
            stack.extend(reversed(p.geoms))
        else:
            parts.append(p)
    out = np.empty(len(parts), dtype=object)
    for i, p in enumerate(parts):
        out[i] = p
    return out


def get_primitivetype_id(geometry):
    """Primitive type id per geometry: 0 for collections, dimensions+1 otherwise."""
    geometry = _extract_0dim(geometry)

    def one(geom) -> int:
        if isinstance(geom, g.GeometryCollection):
            return 0
        return geom.primitivetype.value

    if _is_arraylike(geometry):
        return np.array([one(p) for p in geometry], dtype=np.int64)
    return one(geometry)


def format_short(geometry) -> str:
    """1-point preview of a geometry for error messages."""
    if geometry is None:
        return "None"
    if isinstance(geometry, g.Point):
        return f"POINT({geometry.x} {geometry.y})"
    if isinstance(geometry, g.LineString):
        c = geometry.coords
        return f"LINESTRING({c[0, 0]} {c[0, 1]}, ...)"
    if isinstance(geometry, g.Polygon):
        c = geometry.shell
        return f"POLYGON({c[0, 0]} {c[0, 1]}, ...)"
    if isinstance(geometry, g.MultiPolygon):
        c = geometry.geoms[0].shell
        return f"MULTIPOLYGON(({c[0, 0]} {c[0, 1]}, ...)"
    if isinstance(geometry, g.MultiPoint):
        p = geometry.geoms[0]
        if len(geometry.geoms) > 1:
            return f"MULTIPOINT({p.x} {p.y}, ...)"
        return f"MULTIPOINT({p.x} {p.y})"
    if isinstance(geometry, g.MultiLineString):
        c = geometry.geoms[0].coords
        return f"MULTILINESTRING(({c[0, 0]} {c[0, 1]}, ...)"
    result = ""
    multi = False
    while isinstance(geometry, g.GeometryCollection):
        if len(geometry.geoms) > 1:
            multi = True
        result += "GEOMETRYCOLLECTION("
        geometry = geometry.geoms[0]
    suffix = ", ...)" if multi else ")"
    result += format_short(geometry)
    if not result.endswith(", ...)"):
        result += suffix
    return result


def remove_inner_rings(geometry, min_area_to_keep: float, crs=None):
    """Drop inner rings with area <= min_area_to_keep (0.0 drops all).

    When ``crs`` is geographic (e.g. "epsg:4326"), hole areas are measured in
    m² on the WGS84 ellipsoid via the from-scratch geodesic kernel
    (geo/geodesic.py) — mirroring the reference's pyproj.Geod branch
    (_general.py:527-537). Projected/None crs uses planar ring area.
    """
    geometry = _extract_0dim(geometry)
    if geometry is None:
        return None

    from pygeoops_ray.geo.geodesic import crs_is_geographic, geodesic_ring_area

    geographic = crs_is_geographic(crs)

    def hole_area(hole) -> float:
        if geographic:
            return geodesic_ring_area(hole)
        return abs(ring_area(hole))

    def one_poly(poly: g.Polygon) -> g.Polygon:
        if min_area_to_keep is None or min_area_to_keep == 0.0:
            if not poly.holes:
                return poly
            return g.Polygon(poly.shell)
        keep = []
        small_found = False
        for hole in poly.holes:
            if hole_area(hole) <= min_area_to_keep:
                small_found = True
            else:
                keep.append(hole)
        if not small_found:
            return poly
        return g.Polygon(poly.shell, keep)

    if isinstance(geometry, g.Polygon):
        return one_poly(geometry)
    if isinstance(geometry, g.MultiPolygon):
        return g.MultiPolygon([one_poly(p) for p in geometry.geoms])
    raise ValueError(
        f"remove_inner_rings impossible on {geometry.geom_type}: {geometry}"
    )


def subdivide(geometry: g.Geometry, num_coords_max: int = 1000):
    """Split a big geometry into grid-cell pieces of ~num_coords_max coords each.

    The engine's answer to very wide records before shuffles (the reference
    subdivides before its thread fan-out, _difference.py:71).
    """
    geometry = _extract_0dim(geometry)
    from pygeoops_ray.geo import clip as _clip
    from pygeoops_ray.geo import grid as _grid

    if num_coords_max <= 0:
        return _obj_array([geometry])
    num_coords = geometry.num_coordinates
    if num_coords <= num_coords_max:
        return _obj_array([geometry])
    cells = _grid.create_grid2(
        total_bounds=geometry.bounds,
        nb_squarish_tiles=math.ceil(num_coords / num_coords_max),
    )
    input_primitivetype_id = get_primitivetype_id(geometry)

    # polygons with holes go through the exact boolean intersection (a hole
    # crossing a cell boundary needs real ring surgery); hole-free polygons
    # and lines take the fast Sutherland-Hodgman / Liang-Barsky clip
    def has_holes(geom) -> bool:
        if isinstance(geom, g.Polygon):
            return bool(geom.holes)
        if isinstance(geom, g._Multi):
            return any(has_holes(p) for p in geom.geoms)
        return False

    use_boolean = input_primitivetype_id == 3 and has_holes(geometry)
    if use_boolean:
        from pygeoops_ray.geo import boolean as _boolean

    parts = []
    for cell in cells:
        if use_boolean:
            piece = _boolean.intersection(geometry, cell)
        else:
            piece = _clip.rect_clip(geometry, cell.bounds)
        piece = _collection_extract_one(piece, input_primitivetype_id)
        if piece is not None and not piece.is_empty:
            parts.append(piece)
    return _obj_array(parts if parts else [geometry])


def _obj_array(items) -> np.ndarray:
    out = np.empty(len(items), dtype=object)
    for i, it in enumerate(items):
        out[i] = it
    return out
