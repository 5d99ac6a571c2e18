"""Parameter validation helpers (reference: pygeoops/_paramvalidation.py:7-37)."""

from __future__ import annotations

from pygeoops_ray.geo import geom as g
from pygeoops_ray.geo.general import get_primitivetype_id

__all__ = ["keep_geom_type2primitivetype_id"]


def keep_geom_type2primitivetype_id(keep_geom_type, geometry: g.Geometry) -> int:
    """Normalize a keep_geom_type bool/int to a primitivetype id (0..3)."""
    if isinstance(keep_geom_type, bool):
        if keep_geom_type:
            pid = get_primitivetype_id(geometry)
            return int(pid)
        return 0
    import numbers

    # numbers.Integral also admits numpy integer scalars (np.int32(3) is not
    # an int subclass) — reference parity: tests/test_paramvalidation.py:20
    if isinstance(keep_geom_type, numbers.Integral):
        keep_geom_type = int(keep_geom_type)
        if keep_geom_type not in (0, 1, 2, 3):
            raise ValueError(f"Invalid value for keep_geom_type: {keep_geom_type}")
        return keep_geom_type
    raise ValueError(f"Invalid type for keep_geom_type: {type(keep_geom_type)}")
