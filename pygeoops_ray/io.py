"""Thin source/sink shim: one seam where a real Lance reader drops in.

The north-rule input is a Lance table of image+caption pairs; this sandbox
has no `lance` package, so the engine reads the SAME schema from parquet.
Every pipeline that goes through `read_table` picks up a real
`ray.data.read_lance` the moment the dependency exists — no call-site
changes. Formats:

- ``parquet`` (default): `ray.data.read_parquet` with column pruning and an
  optional block-count override, plus the schema-metadata strip every
  shuffle needs (see pipelines/queries.py:_strip_schema_metadata).
- ``lance``: dispatches to `ray.data.read_lance` when the `lance` package
  is importable; otherwise raises ImportError naming this seam.
- ``auto``: by path suffix (``.lance`` directory → lance, else parquet).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

__all__ = [
    "read_table",
    "write_table",
    "read_geo_csv",
    "read_jsonl",
    "write_geoparquet",
    "wkt_to_wkb_batch",
]


def _strip_meta(batch: pa.Table) -> pa.Table:
    if batch.schema.metadata is not None:
        return batch.replace_schema_metadata(None)
    return batch


def read_table(
    path: str,
    columns: list[str] | None = None,
    format: str = "auto",
    override_num_blocks: int | None = None,
):
    """Read a table as a Ray Dataset with column pruning at the source."""
    if format == "auto":
        format = "lance" if path.rstrip("/").endswith(".lance") else "parquet"
    if format == "lance":
        try:
            import lance  # noqa: F401
        except ImportError:
            raise ImportError(
                "the `lance` package is not installed in this environment; "
                "pygeoops_ray.io.read_table is the swap seam — install lance "
                "and this call dispatches to ray.data.read_lance unchanged"
            ) from None
        return rd.read_lance(path, columns=columns)
    ds = rd.read_parquet(path, columns=columns, override_num_blocks=override_num_blocks)
    return ds.map_batches(_strip_meta, batch_format="pyarrow", batch_size=None)


def wkt_to_wkb_batch(
    batch: pa.Table, geometry_col: str = "wkt", out_col: str = "geometry", bbox: bool = True
) -> pa.Table:
    """Parse a WKT string column into WKB binary (+ optional bbox columns).

    The bbox columns (minx/miny/maxx/maxy) are the scale lever: downstream
    spatial stages filter/partition on them without re-decoding geometry, and
    a parquet sink carrying them supports row-group pruning on read.
    """
    from pygeoops_ray.geo import wkb as _wkb
    from pygeoops_ray.geo import wkt as _wkt

    texts = batch[geometry_col].to_pylist()
    blobs, boxes = [], []
    for t in texts:
        if t is None:
            blobs.append(None)
            boxes.append((None, None, None, None))
            continue
        geom = _wkt.loads(t)
        blobs.append(_wkb.dumps(geom))
        if bbox:
            bx = geom.bounds
            boxes.append(tuple(float(v) for v in bx))
    out = batch.drop_columns([geometry_col])
    out = out.append_column(out_col, pa.array(blobs, pa.binary()))
    if bbox:
        for k, name in enumerate(("minx", "miny", "maxx", "maxy")):
            out = out.append_column(name, pa.array([b[k] for b in boxes], pa.float64()))
    return out


def read_geo_csv(
    path: str,
    geometry_col: str = "wkt",
    out_col: str = "geometry",
    bbox: bool = True,
    **read_kwargs,
):
    """CSV source with a WKT geometry column → Dataset with WKB + bbox columns.

    The parse is a fused map over the read (streaming, no materialization);
    the reference's benchmark I/O (GPKG via pyogrio) has no Ray-native
    equivalent, so text-WKT CSV is the interchange format the engine owns.
    """
    ds = rd.read_csv(path, **read_kwargs)
    return ds.map_batches(
        lambda b: wkt_to_wkb_batch(b, geometry_col, out_col, bbox),
        batch_format="pyarrow",
        batch_size=None,
    )


def read_jsonl(path: str, **read_kwargs):
    """JSON-lines source (documents/metadata interchange), metadata-stripped."""
    ds = rd.read_json(path, **read_kwargs)
    return ds.map_batches(_strip_meta, batch_format="pyarrow", batch_size=None)


def write_geoparquet(ds, path: str, geometry_col: str = "geometry", **kwargs):
    """Partitioned parquet sink with GeoParquet-style ``geo`` schema metadata.

    Tags the named WKB column per the public GeoParquet 1.0.0 layout
    (primary_column + encoding=WKB) so external readers (gdal/geopandas)
    recognize the output. Metadata is attached only at the write boundary —
    in-pipeline schemas stay metadata-free for Ray's shuffle schema dedup.
    """
    import json

    geo_meta = json.dumps(
        {
            "version": "1.0.0",
            "primary_column": geometry_col,
            "columns": {geometry_col: {"encoding": "WKB", "geometry_types": []}},
        }
    )

    def tag(batch: pa.Table) -> pa.Table:
        return batch.replace_schema_metadata({b"geo": geo_meta.encode()})

    return ds.map_batches(tag, batch_format="pyarrow", batch_size=None).write_parquet(
        path, **kwargs
    )


def write_table(ds, path: str, format: str = "parquet", **kwargs):
    """Write a Dataset; parquet always, lance when the package exists."""
    if format == "lance":
        try:
            import lance  # noqa: F401
        except ImportError:
            raise ImportError(
                "the `lance` package is not installed; write_table(format="
                "'lance') dispatches to Dataset.write_lance once it is"
            ) from None
        return ds.write_lance(path, **kwargs)
    return ds.write_parquet(path, **kwargs)
