"""Geometry-level simplification (rdp / lang / lang+ / vw, keep_points_on).

Re-expresses /root/reference/pygeoops/_simplify.py:29-369 on the numpy model:
ring-wise vertex-subset simplification, preserve_topology fallbacks to the
original ring/geometry, keep_points_on vertex pinning, final make_valid.
All four algorithms are our own kernels (simplify_kernels.py) — there is no
C fast path to fall back to.
"""

from __future__ import annotations

import numpy as np

from pygeoops_ray.geo import geom as g
from pygeoops_ray.geo import validity
from pygeoops_ray.geo.general import collect, collection_extract
from pygeoops_ray.geo.simplify_kernels import (
    simplify_coords_lang_idx,
    simplify_coords_rdp_idx,
    simplify_coords_vw_idx,
)
from pygeoops_ray.geo.types import PrimitiveType

__all__ = ["simplify", "simplify_coords"]


def simplify(
    geometry,
    tolerance: float,
    algorithm: str = "rdp",
    lookahead: int = 8,
    preserve_topology: bool = True,
    preserve_common_boundaries: bool = False,
    keep_points_on: g.Geometry | None = None,
):
    """Simplify a geometry or object-array of geometries."""
    if geometry is None:
        return None
    from pygeoops_ray.geo.general import _extract_0dim

    geometry = _extract_0dim(geometry)
    algorithm = algorithm.lower()

    if preserve_common_boundaries:
        if not preserve_topology:
            raise ValueError(
                "The combination of preserve_common_boundaries=True and "
                "preserve_topology=False is not supported."
            )
        from pygeoops_ray.geo.simplify_topo import simplify_topo

        return simplify_topo(
            geometry,
            tolerance=tolerance,
            algorithm=algorithm,
            lookahead=lookahead,
            keep_points_on=keep_points_on,
        )

    if isinstance(geometry, np.ndarray) or (
        hasattr(geometry, "__len__") and not isinstance(geometry, g.Geometry)
    ):
        out = np.empty(len(geometry), dtype=object)
        for i, geom in enumerate(geometry):
            out[i] = _simplify(
                geom, tolerance, algorithm, lookahead, preserve_topology, keep_points_on
            )
        return out
    return _simplify(
        geometry, tolerance, algorithm, lookahead, preserve_topology, keep_points_on
    )


def _simplify(
    geometry: g.Geometry | None,
    tolerance: float,
    algorithm: str = "rdp",
    lookahead: int = 8,
    preserve_topology: bool = True,
    keep_points_on: g.Geometry | None = None,
) -> g.Geometry | None:
    if geometry is None:
        return None

    simplify_lookahead_points = False
    if algorithm in ("rdp", "vw", "lang"):
        pass
    elif algorithm == "lang+":
        simplify_lookahead_points = True
    else:
        raise ValueError(f"Unsupported algorithm specified: {algorithm}")

    if isinstance(geometry, (g.Point, g.MultiPoint)):
        return geometry
    if isinstance(geometry, g.LineString):
        result = _simplify_linestring(
            geometry,
            tolerance,
            algorithm,
            lookahead,
            simplify_lookahead_points,
            preserve_topology,
            keep_points_on,
        )
    elif isinstance(geometry, g.Polygon):
        result = _simplify_polygon(
            geometry,
            tolerance,
            algorithm,
            lookahead,
            simplify_lookahead_points,
            preserve_topology,
            keep_points_on,
        )
    elif isinstance(geometry, g._Multi):
        parts = [
            _simplify(p, tolerance, algorithm, lookahead, preserve_topology, keep_points_on)
            for p in geometry.geoms
        ]
        result = collect([p for p in parts if p is not None])
    else:
        raise ValueError(f"Unsupported geometrytype: {geometry}")

    return validity.make_valid(result, keep_collapsed=True, only_if_invalid=True)


def _simplify_polygon(
    polygon: g.Polygon,
    tolerance,
    algorithm,
    lookahead,
    simplify_lookahead_points,
    preserve_topology,
    keep_points_on,
):
    if polygon.is_empty:
        return polygon
    exterior_simpl = simplify_coords(
        polygon.shell,
        tolerance,
        algorithm,
        lookahead,
        simplify_lookahead_points,
        keep_points_on,
    )
    if exterior_simpl is None or len(exterior_simpl) < 3:
        if preserve_topology:
            exterior_simpl = polygon.shell
        else:
            return None

    interiors_simpl = []
    for interior in polygon.holes:
        interior_simpl = simplify_coords(
            interior,
            tolerance,
            algorithm,
            lookahead,
            simplify_lookahead_points,
            keep_points_on,
        )
        if interior_simpl is not None and len(interior_simpl) >= 3:
            interiors_simpl.append(interior_simpl)
        elif preserve_topology:
            interiors_simpl.append(interior)

    try:
        result_poly = g.Polygon(exterior_simpl, interiors_simpl)
    except ValueError:
        return polygon if preserve_topology else None

    result_poly = collection_extract(
        validity.make_valid(result_poly, keep_collapsed=True),
        primitivetype=PrimitiveType.POLYGON,
    )
    if result_poly is not None and result_poly.is_empty:
        result_poly = None
    if preserve_topology and result_poly is None:
        return polygon
    return result_poly


def _simplify_linestring(
    linestring: g.LineString,
    tolerance,
    algorithm,
    lookahead,
    simplify_lookahead_points,
    preserve_topology,
    keep_points_on,
):
    if linestring is None or len(linestring.coords) <= 2:
        return linestring
    coords_simpl = simplify_coords(
        linestring.coords,
        tolerance,
        algorithm,
        lookahead,
        simplify_lookahead_points,
        keep_points_on,
    )
    if coords_simpl is None or len(coords_simpl) < 2:
        if preserve_topology:
            return linestring
        return None
    return g.LineString(coords_simpl)


def simplify_coords(
    coords: np.ndarray,
    tolerance: float,
    algorithm: str,
    lookahead: int = 8,
    simplify_lookahead_points: bool = False,
    keep_points_on: g.Geometry | None = None,
) -> np.ndarray:
    """Ring/line coordinate kernel: algorithm → kept indexes → gather.

    keep_points_on pins vertices that intersect the guard geometry back into
    the output (reference behaviour, _simplify.py:349-367).
    """
    coords = np.asarray(coords, dtype=np.float64)
    if algorithm == "rdp":
        keep_idx = simplify_coords_rdp_idx(coords[:, :2], tolerance)
    elif algorithm == "vw":
        keep_idx = simplify_coords_vw_idx(coords[:, :2], tolerance)
    elif algorithm in ("lang", "lang+"):
        keep_idx = np.asarray(
            simplify_coords_lang_idx(
                coords[:, :2],
                tolerance,
                lookahead=lookahead,
                simplify_lookahead_points=simplify_lookahead_points,
            ),
            dtype=np.int64,
        )
    else:
        raise ValueError(f"Unsupported algorithm specified: {algorithm}")

    if keep_points_on is not None:
        from pygeoops_ray.geo import predicates

        drop_mask = np.ones(len(coords), dtype=bool)
        drop_mask[keep_idx] = False
        drop_idx = np.nonzero(drop_mask)[0]
        onborder = [
            i
            for i in drop_idx
            if predicates.intersects(g.Point(coords[i : i + 1, :2]), keep_points_on)
        ]
        if onborder:
            keep_idx = np.sort(np.concatenate([keep_idx, np.array(onborder, dtype=np.int64)]))

    return coords[keep_idx]
