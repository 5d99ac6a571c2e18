"""Checkpoint manifest: per-partition lineage + resumable partitioned output.

North-rule requirement (SURVEY.md §4): every partition emits a lineage row
(stage, partition_id, row_count, checksum, output path) to a manifest; a
resumed run anti-joins the manifest against the plan and only recomputes the
missing partitions. Output layout is one parquet file per partition written
atomically (tmp + rename), so retried/duplicate tasks overwrite cleanly.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = [
    "CheckpointManifest",
    "write_partitioned",
    "read_output",
    "read_pruned",
    "read_partitions",
]


def _row_checksum(df: pd.DataFrame) -> int:
    """Order-insensitive 64-bit checksum of a partition's rows."""
    df = df.reindex(sorted(df.columns), axis=1)
    try:
        h = pd.util.hash_pandas_object(df, index=False).to_numpy(dtype=np.uint64)
    except TypeError:
        # nested payloads (e.g. list<float> embeddings arrive as object
        # columns of ndarrays) aren't pandas-hashable — hash their bytes
        import hashlib

        h = np.zeros(len(df), dtype=np.uint64)
        for c in df.columns:
            s = df[c]
            try:
                ch = pd.util.hash_pandas_object(s, index=False).to_numpy(np.uint64)
            except TypeError:
                ch = np.fromiter(
                    (
                        int.from_bytes(
                            hashlib.md5(
                                b"" if v is None else np.asarray(v).tobytes()
                            ).digest()[:8],
                            "little",
                        )
                        for v in s
                    ),
                    dtype=np.uint64,
                    count=len(s),
                )
            # rotate before combining so column order matters
            h = ((h << np.uint64(1)) | (h >> np.uint64(63))) ^ ch
    total = np.bitwise_xor.reduce(h) if len(h) else np.uint64(0)
    return int(total & np.uint64(0x7FFFFFFFFFFFFFFF))


class CheckpointManifest:
    """Append-only jsonl manifest of completed partitions."""

    def __init__(self, out_dir: str, stage: str = "main"):
        self.out_dir = out_dir
        self.stage = stage
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, f"_manifest_{stage}.jsonl")

    def completed(self) -> dict[str, dict]:
        done: dict[str, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    done[str(rec["partition_id"])] = rec
        return done

    def mark(
        self,
        partition_id,
        row_count: int,
        checksum: int,
        output_file: str,
        lineage: dict | None = None,
        stats: dict | None = None,
    ):
        rec = {
            "stage": self.stage,
            "partition_id": str(partition_id),
            "row_count": int(row_count),
            "checksum": int(checksum),
            "output_file": output_file,
            "ts": time.time(),
            "lineage": lineage or {},
            "stats": stats or {},
        }
        # single-line append; concurrent appends of whole lines are safe on posix
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return rec


def write_partitioned(
    ds,
    out_dir: str,
    partition_col: str,
    stage: str = "main",
    lineage: dict | None = None,
    stats_cols: list[str] | None = None,
):
    """Write one parquet file per partition_col value, resumably.

    Completed partitions (already in the manifest AND present on disk) are
    skipped — the resume path. Returns the manifest records of this run.

    ``stats_cols`` records each partition's [min, max] of those columns in
    the manifest, making the directory a PRUNABLE source: ``read_pruned``
    skips whole partition files whose range misses a query predicate before
    any Ray read task launches (the spatial/temporal analogue of parquet
    row-group stats, one level up — at 100 TB the manifest is a few MB while
    the data needs no touch at all).
    """
    manifest = CheckpointManifest(out_dir, stage)
    done = manifest.completed()
    done_ids = {
        pid for pid, rec in done.items() if os.path.exists(rec["output_file"])
    }

    out_dir_abs = os.path.abspath(out_dir)
    lineage = dict(lineage or {})
    stats_cols = list(stats_cols or [])

    def write_group(group: pd.DataFrame) -> pd.DataFrame:
        pid = str(group[partition_col].iloc[0])
        if pid in done_ids:
            return pd.DataFrame({"partition_id": [pid], "row_count": [-1], "skipped": [True]})
        fname = os.path.join(out_dir_abs, f"part-{pid}.parquet")
        tmp = fname + f".tmp{os.getpid()}"
        # metadata-FREE schema: pandas metadata in sink files makes every
        # downstream reader's schema unhashable, which drops any shuffle
        # over the read into Ray's slow per-task schema-unify path
        # (measured +2-3 s per exchange on the kNN ring join)
        pq.write_table(
            pa.Table.from_pandas(group, preserve_index=False).replace_schema_metadata(
                None
            ),
            tmp,
        )
        os.replace(tmp, fname)
        stats = {
            c: [float(group[c].min()), float(group[c].max())] for c in stats_cols
        }
        CheckpointManifest(out_dir_abs, stage).mark(
            pid, len(group), _row_checksum(group), fname, lineage, stats=stats
        )
        return pd.DataFrame({"partition_id": [pid], "row_count": [len(group)], "skipped": [False]})

    report = ds.groupby(partition_col).map_groups(write_group, batch_format="pandas")
    return report.to_pandas()


def read_output(out_dir: str):
    """Read back all partition files of a resumable output directory."""
    import glob

    import ray.data as rd

    files = sorted(glob.glob(os.path.join(out_dir, "part-*.parquet")))
    return rd.read_parquet(files)


def read_partitions(out_dir: str, pids, stage: str = "main", filter=None):
    """Read an explicit SET of partitions from a ``write_partitioned`` sink.

    The set-shaped sibling of :func:`read_pruned` for predicates that are
    not intervals — e.g. the Chebyshev ring of a kNN join touches a shell of
    spatial blocks, never a box. Partition ids absent from the manifest are
    simply not read (an empty touched set returns ``None``: the caller skips
    the round). ``filter`` is a pyarrow dataset expression pushed into the
    surviving files' row groups. Returns ``(dataset_or_None, n_files_read,
    n_files_total)`` so callers can assert/report the pruning ratio.
    """
    import ray.data as rd

    done = CheckpointManifest(out_dir, stage).completed()
    files = []
    rows = 0
    for pid in sorted(str(p) for p in pids):
        rec = done.get(pid)
        if rec is not None and os.path.exists(rec["output_file"]):
            files.append(rec["output_file"])
            rows += int(rec.get("row_count") or 0)
    if not files:
        return None, 0, len(done)
    return (
        rd.read_parquet(files, filter=filter, override_num_blocks=_block_target(rows)),
        len(files),
        len(done),
    )


def _block_target(rows: int, rows_per_block: int = 250_000) -> int:
    """Blocks for a pruned read, sized from the manifest's row counts.

    Without this, a many-small-file sink materializes one (or more) blocks
    PER FILE, and every downstream shuffle pays per-block fixed cost: the
    kNN ring join over a 32-file sink measured 0.5-1.0 s per exchange at 64
    blocks vs 0.14 s at 8 — the data volume (100k rows) was never the cost.
    Clamped so huge reads still parallelize (200 blocks ≈ 2 waves on a
    32-core node at 4 CPU-tasks each) and tiny reads keep a few blocks of
    map parallelism.
    """
    return int(min(200, max(4, rows // rows_per_block + 1)))


def read_pruned(out_dir: str, ranges: dict[str, tuple], stage: str = "main"):
    """Range-pruned read of a ``write_partitioned(..., stats_cols=...)`` sink.

    ``ranges`` maps column → half-open interval ``[lo, hi)`` (a 2D bbox is
    two entries: ``{"px": (x0, x1), "py": (y0, y1)}``; a time slice is one).
    Either bound may be ``None`` (unbounded); one-sided ranges on extent
    columns express bbox INTERSECTION over geometries — e.g. rectangles with
    (minx, maxx, miny, maxy) columns intersect a query bbox iff
    ``{"minx": (None, x1), "maxx": (x0, None), "miny": (None, y1),
    "maxy": (y0, None)}`` — the GeoParquet bbox-column idiom.
    Pruning happens at TWO levels:

    1. **Partition files** whose manifest [min, max] misses an interval are
       dropped on the driver before any Ray task launches — the manifest is
       a few KB however large the data.
    2. Surviving files read with a pyarrow filter expression, so parquet
       ROW-GROUP stats prune inside each file and rows outside the predicate
       never reach the pipeline.

    Returns a Dataset of exactly the rows satisfying every interval.
    """
    import ray.data as rd
    from pyarrow.dataset import field as _field

    done = CheckpointManifest(out_dir, stage).completed()
    if not done:
        raise FileNotFoundError(f"no manifest for stage {stage!r} in {out_dir}")
    files = []
    for pid in sorted(done, key=lambda p: done[p]["output_file"]):
        rec = done[pid]
        st = rec.get("stats", {})
        keep = True
        for col, (lo, hi) in ranges.items():
            if col in st:
                mn, mx = st[col]
                if (lo is not None and mx < lo) or (hi is not None and mn >= hi):
                    keep = False
                    break
        if keep and os.path.exists(rec["output_file"]):
            files.append(rec["output_file"])
    expr = None
    for col, (lo, hi) in ranges.items():
        for e in (
            (_field(col) >= lo) if lo is not None else None,
            (_field(col) < hi) if hi is not None else None,
        ):
            if e is not None:
                expr = e if expr is None else expr & e
    if not files:
        # predicate misses every partition: read the smallest file under the
        # (row-excluding) filter so the dataset keeps the sink schema
        smallest = min(
            (r["output_file"] for r in done.values() if os.path.exists(r["output_file"])),
            key=os.path.getsize,
        )
        files = [smallest]
    rows = sum(
        int(r.get("row_count") or 0)
        for r in done.values()
        if r["output_file"] in set(files)
    )
    return rd.read_parquet(files, filter=expr, override_num_blocks=_block_target(rows))
