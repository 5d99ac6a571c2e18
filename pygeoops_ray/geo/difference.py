"""difference_all / difference_all_tiled / _difference_intersecting.

Re-expresses /root/reference/pygeoops/_difference.py:14-250: prepared-
intersects prefilter, union of subtrahends, one difference, primitive-type
filter; the tiled variant subdivides the (huge) input first and merges with
unary_union — the reference's own mini-MapReduce (its ThreadPoolExecutor(4)
becomes the engine's distributed shape in stages/geo_batch.py; this module is
the single-geometry kernel used inside those stages).
"""

from __future__ import annotations

import numpy as np

from pygeoops_ray.geo import boolean, geom as g, predicates
from pygeoops_ray.geo.general import _collection_extract_one, _is_arraylike, empty, subdivide
from pygeoops_ray.geo.paramvalidation import keep_geom_type2primitivetype_id

__all__ = ["difference_all", "difference_all_tiled", "_difference_intersecting"]


def difference_all_tiled(
    geometry: g.Geometry,
    geometries_to_subtract,
    keep_geom_type: bool | int = False,
    subdivide_coords: int = 1000,
) -> g.Geometry | None:
    if geometry is None:
        return None
    if isinstance(geometry, np.ndarray) and geometry.ndim == 0:
        geometry = geometry.item()  # 0-dim ndarray wrappers (reference parity)
        if geometry is None:
            return None
    if not isinstance(geometry, g.Geometry):
        raise ValueError(f"geometry should be a geometry, not {geometry}")
    if geometry.is_empty or geometries_to_subtract is None:
        return geometry

    output_primitivetype_id = keep_geom_type2primitivetype_id(keep_geom_type, geometry)

    if not _is_arraylike(geometries_to_subtract):
        geometries_to_subtract = [geometries_to_subtract]
    subtract_parts = []
    for sub in geometries_to_subtract:
        subtract_parts.extend(g.get_parts(sub))

    tiles = subdivide(geometry, subdivide_coords)
    results = [
        difference_all(
            tile,
            subtract_parts,
            keep_geom_type=output_primitivetype_id,
            check_intersects=True,
        )
        for tile in tiles
    ]
    results = [r for r in results if r is not None and not r.is_empty]
    if len(results) == 0:
        return empty(g.get_type_id(geometry))
    if len(results) == 1:
        return results[0]
    return boolean.union_all(results)


def difference_all(
    geometry: g.Geometry,
    geometries_to_subtract,
    keep_geom_type: bool | int = False,
    check_intersects: bool = False,
) -> g.Geometry | None:
    if geometry is None:
        return None
    if isinstance(geometry, np.ndarray) and geometry.ndim == 0:
        geometry = geometry.item()  # 0-dim ndarray wrappers (reference parity)
        if geometry is None:
            return None
    if not isinstance(geometry, g.Geometry):
        raise ValueError(f"geometry should be a geometry, not {geometry}")
    if geometry.is_empty:
        return geometry
    if not _is_arraylike(geometries_to_subtract):
        geometries_to_subtract = [geometries_to_subtract]
    subs = list(geometries_to_subtract)

    output_primitivetype_id = keep_geom_type2primitivetype_id(keep_geom_type, geometry)

    if check_intersects:
        subs = [s for s in subs if predicates.intersects(geometry, s)]
        if not subs:
            return geometry

    # one fused two-counter sweep: subject minus union(subs) without the
    # intermediate subtrahend-union geometry or a second sweep
    geom_diff = boolean.difference_all_fused(geometry, subs)
    return _collection_extract_one(geom_diff, output_primitivetype_id)


def _difference_intersecting(
    geometry,
    geometry_to_subtract: g.Geometry,
    primitivetype_id: int = 0,
):
    """Vectorized difference of ONE subtrahend from an array of geometries."""
    if geometry is None:
        return None
    if geometry_to_subtract is None:
        return geometry
    if not isinstance(geometry_to_subtract, g.Geometry):
        raise ValueError(f"geometry_to_subtract should be geometry, not {geometry_to_subtract}")
    return_array = _is_arraylike(geometry)
    geoms = list(geometry) if return_array else [geometry]

    out = np.empty(len(geoms), dtype=object)
    for i, geom in enumerate(geoms):
        if geom is not None and predicates.intersects(geom, geometry_to_subtract):
            d = boolean.difference(geom, geometry_to_subtract)
            out[i] = _collection_extract_one(d, primitivetype_id)
        else:
            out[i] = geom
    return out if return_array else out[0]
