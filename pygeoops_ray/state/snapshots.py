"""Snapshot-versioned tables (time travel) on top of the checkpoint manifest.

The lakehouse shape: every commit writes its partition files resumably via
``write_partitioned`` (state/manifest.py) into a per-commit directory, then
publishes an atomic ``snapshot-v{N}.json`` holding ONLY this commit's file
list plus a parent pointer. A version's view is the file-list union walked
up the parent chain — pure metadata (a few KB per commit), so reading the
table "as of v1" after ten appends touches zero data files outside v1's
list, and a reader pinned to v1 is isolated from every later commit.

Crash safety: ``commit`` is idempotent — if a run dies mid-write, the next
call resumes the unfinished partition files (manifest skip) and republishes
the same snapshot; the json publish is an ``os.replace`` so readers never
observe a half-written snapshot.
"""

from __future__ import annotations

import json
import os

import ray.data as rd

from pygeoops_ray.state.manifest import CheckpointManifest, write_partitioned


class SnapshotStore:
    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)

    # -- metadata ----------------------------------------------------------
    def versions(self) -> list[int]:
        pre, suf = "snapshot-v", ".json"
        return sorted(
            int(f[len(pre) : -len(suf)])
            for f in os.listdir(self.root)
            if f.startswith(pre) and f.endswith(suf)
        )

    def latest_version(self) -> int:
        vs = self.versions()
        return vs[-1] if vs else 0

    def _snap_path(self, version: int) -> str:
        return os.path.join(self.root, f"snapshot-v{version}.json")

    def files_asof(self, version: int) -> list[str]:
        """File list for a version: walk the parent chain (metadata only)."""
        files: list[str] = []
        v: int | None = version
        while v:
            with open(self._snap_path(v)) as f:
                snap = json.load(f)
            files.extend(snap["files"])
            v = snap["parent"]
        return sorted(files)

    # -- write / read ------------------------------------------------------
    def commit(self, ds, partition_col: str, stats_cols=None) -> int:
        """Append ``ds`` as the next version; returns the published version.

        Partition files land under ``commit-{v}/`` through the resumable
        manifest writer; the snapshot json is published last, atomically.
        """
        v = self.latest_version() + 1
        commit_dir = os.path.join(self.root, f"commit-{v}")
        stage = f"snap-v{v}"
        write_partitioned(
            ds, commit_dir, partition_col, stage=stage,
            lineage={"version": v}, stats_cols=stats_cols,
        )
        recs = CheckpointManifest(commit_dir, stage).completed()
        files = sorted(r["output_file"] for r in recs.values())
        snap = {"version": v, "parent": v - 1 if v > 1 else None, "files": files}
        tmp = self._snap_path(v) + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(snap, f)
        os.replace(tmp, self._snap_path(v))
        return v

    def read_asof(self, version: int, columns=None):
        """Stream the table as it existed at ``version`` (no materialization:
        one read task per listed file)."""
        return rd.read_parquet(self.files_asof(version), columns=columns)
