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

__all__ = ["CheckpointManifest", "write_partitioned", "read_output"]


def _row_checksum(df: pd.DataFrame) -> int:
    """Order-insensitive 64-bit checksum of a partition's rows."""
    h = pd.util.hash_pandas_object(
        df.reindex(sorted(df.columns), axis=1), index=False
    ).to_numpy(dtype=np.uint64)
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

    def mark(self, partition_id, row_count: int, checksum: int, output_file: str, lineage: dict | None = None):
        rec = {
            "stage": self.stage,
            "partition_id": str(partition_id),
            "row_count": int(row_count),
            "checksum": int(checksum),
            "output_file": output_file,
            "ts": time.time(),
            "lineage": lineage or {},
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
):
    """Write one parquet file per partition_col value, resumably.

    Completed partitions (already in the manifest AND present on disk) are
    skipped — the resume path. Returns the manifest records of this run.
    """
    manifest = CheckpointManifest(out_dir, stage)
    done = manifest.completed()
    done_ids = {
        pid for pid, rec in done.items() if os.path.exists(rec["output_file"])
    }

    out_dir_abs = os.path.abspath(out_dir)
    lineage = dict(lineage or {})

    def write_group(group: pd.DataFrame) -> pd.DataFrame:
        pid = str(group[partition_col].iloc[0])
        if pid in done_ids:
            return pd.DataFrame({"partition_id": [pid], "row_count": [-1], "skipped": [True]})
        fname = os.path.join(out_dir_abs, f"part-{pid}.parquet")
        tmp = fname + f".tmp{os.getpid()}"
        pq.write_table(pa.Table.from_pandas(group, preserve_index=False), tmp)
        os.replace(tmp, fname)
        CheckpointManifest(out_dir_abs, stage).mark(
            pid, len(group), _row_checksum(group), fname, lineage
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
