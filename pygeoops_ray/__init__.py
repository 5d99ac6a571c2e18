"""ray-geoops: a from-scratch Ray-Data-native spatial-join + tiling engine.

Public API mirrors the reference's surface (pygeoops 0.6.1-dev, see SURVEY.md
§2.1) re-expressed over the numpy geometry model, plus the engine-level
distributed operators (cell index, tile assignment, PIP join, kNN, clip join,
dedup) as Ray Data pipelines under ``pygeoops_ray.pipelines``.
"""

from pygeoops_ray.geo.general import (  # noqa: F401
    collect,
    collection_extract,
    empty,
    explode,
    format_short,
    get_parts_recursive,
    get_primitivetype_id,
    remove_inner_rings,
    subdivide,
)
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
from pygeoops_ray.geo.simplify import simplify  # noqa: F401
from pygeoops_ray.geo.simplify_kernels import (  # noqa: F401
    simplify_coords_lang,
    simplify_coords_lang_idx,
)
from pygeoops_ray.geo.types import GeometryType, PrimitiveType  # noqa: F401
from pygeoops_ray.geo.validity import is_valid, make_valid  # noqa: F401

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy imports for operators with heavier deps so `import pygeoops_ray`
    # stays light inside Ray workers.
    if name in ("centerline",):
        from pygeoops_ray.geo.centerline import centerline

        return centerline
    if name in ("view_angles",):
        from pygeoops_ray.geo.view_angles import view_angles

        return view_angles
    if name in ("difference_all", "difference_all_tiled"):
        from pygeoops_ray.geo import difference

        return getattr(difference, name)
    if name in ("buffer_by_m",):
        from pygeoops_ray.geo.buffer import buffer_by_m

        return buffer_by_m
    if name in ("create_grid", "create_grid2", "create_grid3", "split_tiles"):
        from pygeoops_ray.geo import grid

        return getattr(grid, name)
    if name in ("extend_line_by_distance", "extend_line_to_geometry"):
        from pygeoops_ray.geo import extend_line

        return getattr(extend_line, name)
    if name in ("Stage", "register", "apply_stages", "list_stages"):
        from pygeoops_ray.stages import registry

        return getattr(registry, name)
    if name in ("write_partitioned", "read_output", "read_pruned", "CheckpointManifest"):
        from pygeoops_ray.state import manifest

        return getattr(manifest, name)
    raise AttributeError(f"module 'pygeoops_ray' has no attribute {name!r}")
