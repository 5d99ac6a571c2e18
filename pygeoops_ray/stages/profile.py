"""Distributed table profiling: per-column stats + EXACT distinct counts.

The first job any pipeline runs against an unknown 100-TB table. Two
streaming sub-shapes, both bounded:

- count / nulls / min / max: one partial row per (block, column) — only
  O(blocks × columns) tiny partials move, reduced by the bucketed grouped
  aggregate (stages/groupagg.py).
- exact n_distinct: per-block ``unique`` first (the combiner — duplicate
  values collapse before the shuffle), then the exact-dedup shape over
  (column, value) pairs and a per-column count. Shuffle volume is the sum of
  per-block distinct values, never the raw rows.

Values are profiled as float64 (exact for int64 magnitudes below 2^53 —
asserted), which keeps one output schema across int/double columns and makes
the result SQL-comparable bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["profile_numeric"]


def profile_numeric(ds, cols: list[str], n_rows_hint: int | None = None):
    """Profile numeric columns: one output row per column with
    (column, n, n_null, min_v, max_v, n_distinct), all exact."""
    from pygeoops_ray.stages.groupagg import grouped_agg, grouped_count

    def stats_partial(batch: pa.Table) -> pd.DataFrame:
        rows = []
        for c in cols:
            v = batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
            nn = int(np.isnan(v).sum())
            ok = v[~np.isnan(v)] if nn else v
            assert not len(ok) or np.abs(ok).max() < 2**53
            rows.append(
                {
                    "column": c,
                    "n": len(ok),
                    "n_null": nn,
                    "min_v": float(ok.min()) if len(ok) else np.inf,
                    "max_v": float(ok.max()) if len(ok) else -np.inf,
                }
            )
        return pd.DataFrame(rows)

    stats = grouped_agg(
        ds.map_batches(stats_partial, batch_format="pyarrow", batch_size=None),
        ["column"],
        [
            ("n", "sum", "n"),
            ("n_null", "sum", "n_null"),
            ("min_v", "min", "min_v"),
            ("max_v", "max", "max_v"),
        ],
        n_buckets=4,
    )

    def distinct_partial(batch: pa.Table) -> pa.Table:
        out_c, out_v = [], []
        for ci, c in enumerate(cols):
            v = batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
            u = np.unique(v[~np.isnan(v)])
            out_c.append(np.full(len(u), ci, dtype=np.int64))
            out_v.append(u)
        return pa.Table.from_pydict(
            {
                "ci": pa.array(np.concatenate(out_c), pa.int64()),
                "v": pa.array(np.concatenate(out_v), pa.float64()),
            }
        )

    pairs = ds.map_batches(distinct_partial, batch_format="pyarrow", batch_size=None)
    # one row per distinct (column, value) — the exact-dedup shape
    distinct = grouped_count(pairs, ["ci", "v"], "cnt", n_rows_hint=n_rows_hint)
    ndist = grouped_count(distinct, ["ci"], "n_distinct", n_buckets=4).to_pandas()

    df = stats.to_pandas()
    ndist["column"] = ndist["ci"].map(dict(enumerate(cols)))
    out = df.merge(ndist[["column", "n_distinct"]], on="column")
    out = out.sort_values("column").reset_index(drop=True)
    return pa.Table.from_pandas(
        out[["column", "n", "n_null", "min_v", "max_v", "n_distinct"]],
        preserve_index=False,
    ).replace_schema_metadata(None)
