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

__all__ = ["read_table", "write_table"]


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
