"""Dead-letter quarantine: one-pass split of invariant-failing rows.

The scale shape for "quarantine, not crash" (DecodeValidate's contract —
see pipelines/flagship.py): a validation stage flags rows, and the split
must NOT run the upstream twice (two ``ds.filter`` branches re-execute the
whole pipeline per branch). Instead the map task itself appends its failing
rows to a side parquet sink and passes the good rows on — one pass over the
data, streaming, no driver materialization.

Delivery contract: the side sink is written as task-scoped atomic files
(tmp + rename, unique name per task invocation), so a RETRIED task may land
its rows twice — at-least-once capture. ``read_quarantine`` therefore dedups
by a key column on read, restoring exactly-once semantics: the standard
dead-letter-queue contract.
"""

from __future__ import annotations

import glob
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["quarantine_by_flag", "read_quarantine"]


def quarantine_by_flag(ds, flag_col: str, out_dir: str, keep_flag: bool = False):
    """Split ``ds`` on boolean ``flag_col``: rows where the flag is False are
    appended to the ``out_dir`` side sink; rows where it is True flow on.

    Place this AFTER the validating stage but BEFORE any column drop whose
    payload the quarantine should preserve (at real scale you keep the raw
    bytes for inspection/repair; the caller controls that by where in the
    chain this sits).
    """
    os.makedirs(out_dir, exist_ok=True)
    out_abs = os.path.abspath(out_dir)

    def split(batch: pa.Table) -> pa.Table:
        flags = batch[flag_col].to_numpy(zero_copy_only=False).astype(bool)
        if not flags.all():
            bad = batch.filter(pa.array(~flags))
            fname = os.path.join(out_abs, f"q-{uuid.uuid4().hex}.parquet")
            tmp = fname + ".tmp"
            pq.write_table(bad, tmp)
            os.replace(tmp, fname)
        good = batch if flags.all() else batch.filter(pa.array(flags))
        return good if keep_flag else good.drop_columns([flag_col])

    return ds.map_batches(split, batch_format="pyarrow", batch_size=None)


def read_quarantine(out_dir: str, key_col: str):
    """Read the dead-letter sink back, deduped by ``key_col``.

    Dedup (first row per key, rows are identical across task retries anyway)
    runs distributed via the exact-dedup stage, so a large quarantine set
    never lands on the driver.
    """
    import ray.data as rd

    files = sorted(glob.glob(os.path.join(out_dir, "q-*.parquet")))
    if not files:
        raise FileNotFoundError(f"no quarantine files under {out_dir}")
    ds = rd.read_parquet(files)

    def first_per_key(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        _, idx = np.unique(keys, return_index=True)
        return batch.take(np.sort(idx))

    # per-block pre-dedup, then a key-sorted pass makes blocks key-disjoint
    ds = ds.map_batches(first_per_key, batch_format="pyarrow")
    return ds.sort(key_col).map_batches(first_per_key, batch_format="pyarrow")
