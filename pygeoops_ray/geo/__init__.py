"""Pure numpy/stdlib geometry kernel library (no Ray, no GEOS).

Everything the reference delegates to shapely/GEOS, rebuilt from scratch so it
can run inside vectorized ``map_batches`` stages. See SURVEY.md §7 step 1.
"""

from pygeoops_ray.geo import geom, wkb, wkt  # noqa: F401
from pygeoops_ray.geo.geom import (  # noqa: F401
    GeometryCollection,
    LineString,
    MultiLineString,
    MultiPoint,
    MultiPolygon,
    Point,
    Polygon,
    box,
)
from pygeoops_ray.geo.types import GeometryType, PrimitiveType  # noqa: F401
