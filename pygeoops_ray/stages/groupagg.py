"""Vectorized distributed groupby-aggregates for HIGH-CARDINALITY keys.

Ray Data's native ``groupby(...).aggregate(...)`` pays per-distinct-group
Python overhead inside its sort-based Aggregate operator — measured ~3 ms per
group, i.e. ~20 minutes of CPU for 350k groups on a trivial pair-dedup. For
keys with many distinct values the scalable shape is: hash the key columns
into a bounded number of COARSE buckets (one shuffle, as before), then run a
single vectorized pandas groupby (C speed) inside each bucket. Results are
identical; only the per-group dispatch cost changes.

Algebraic aggregates (sum/min/max/count) additionally PRE-COMBINE inside
``map_batches`` before the shuffle, so only per-(batch, key) partials move
through the object store — the combiner pattern the 100-TB design calls for.
Holistic ops (e.g. mean without decomposition) skip the partial pass.

Bucket hashing uses ``pd.util.hash_pandas_object`` (fixed default hash key —
deterministic across processes and machines), so every row of a key group
lands in the same bucket by construction.

Keep Ray's native aggregate for LOW-cardinality keys (a handful of groups):
it avoids the extra pandas conversion and its per-group cost is negligible
there.
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["grouped_min", "grouped_count", "grouped_agg"]

_N_BUCKETS = 64
_TARGET_ROWS_PER_BUCKET = 500_000


def _bucket_count(n_buckets: int, n_rows_hint: int | None) -> int:
    """Scale the coarse bucket count with a row-count hint when the caller
    has one: a fixed count means per-bucket frames grow linearly with the
    distinct-key population (the round-1 sessionize %64 bug class)."""
    if n_rows_hint:
        return max(n_buckets, n_rows_hint // _TARGET_ROWS_PER_BUCKET)
    return n_buckets


def _bucketed(ds, key_cols: list[str], reducer, n_buckets: int = _N_BUCKETS, pre=None):
    import pandas as pd

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if pre is not None:
            df = pre(df)
        h = pd.util.hash_pandas_object(df[key_cols], index=False).to_numpy()
        df = df.copy()
        df["_gb"] = (h % n_buckets).astype("int64")
        return df

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        # return Arrow WITHOUT pandas schema metadata: metadata-bearing
        # schemas are unhashable, so any downstream shuffle (e.g. a hash
        # join on the aggregate's output) would fall into Ray's slow
        # per-task schema-unify path with a warning per reduce task
        out = pa.Table.from_pandas(reducer(g.drop(columns=["_gb"])), preserve_index=False)
        return out.replace_schema_metadata(None)

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_gb")
        .map_groups(per_bucket, batch_format="pandas")
    )


def grouped_min(
    ds,
    key_cols: list[str],
    val_col: str,
    n_buckets: int = _N_BUCKETS,
    n_rows_hint: int | None = None,
):
    """SELECT key..., min(val) GROUP BY key... — scalable to many groups.

    min is algebraic: the per-batch partial min is combined by a second min,
    so only one row per (batch, key) is shuffled.
    """

    def pre(df):
        return df.groupby(key_cols, as_index=False, sort=False)[val_col].min()

    def reducer(df):
        return df.groupby(key_cols, as_index=False, sort=False)[val_col].min()

    return _bucketed(ds, key_cols, reducer, _bucket_count(n_buckets, n_rows_hint), pre=pre)


def grouped_count(
    ds,
    key_cols: list[str],
    alias: str,
    n_buckets: int = _N_BUCKETS,
    n_rows_hint: int | None = None,
):
    """SELECT key..., count(*) AS alias GROUP BY key... — scalable to many
    groups. Partial per-batch counts are summed after the shuffle."""

    def pre(df):
        return df.groupby(key_cols, sort=False).size().reset_index(name=alias)

    def reducer(df):
        return df.groupby(key_cols, as_index=False, sort=False)[alias].sum()

    return _bucketed(ds, key_cols, reducer, _bucket_count(n_buckets, n_rows_hint), pre=pre)


_COMBINE_OP = {"size": "sum", "sum": "sum", "min": "min", "max": "max"}


def grouped_agg(
    ds,
    key_cols: list[str],
    aggs: list[tuple[str, str, str]],
    n_buckets: int = _N_BUCKETS,
    n_rows_hint: int | None = None,
):
    """Multi-aggregate per key group: ``aggs`` is [(col, op, alias), ...]
    with op in pandas agg vocabulary ('sum', 'min', 'max', 'mean', 'count'
    where count means count of rows via 'size').

    When every op is algebraic (sum/min/max/size) the aggregate pre-combines
    per batch and only (batch, key) partials are shuffled; otherwise raw rows
    shuffle as before (results identical either way)."""
    import pandas as pd

    def _apply(df, specs):
        g = df.groupby(key_cols, sort=False)
        parts = []
        for col, op, alias in specs:
            if op == "size":
                parts.append(g.size().rename(alias))
            else:
                parts.append(getattr(g[col], op)().rename(alias))
        return pd.concat(parts, axis=1).reset_index()

    if all(op in _COMBINE_OP for _, op, _ in aggs):
        combine_specs = [(alias, _COMBINE_OP[op], alias) for _, op, alias in aggs]

        def pre(df):
            return _apply(df, aggs)

        def reducer(df):
            return _apply(df, combine_specs)

        return _bucketed(ds, key_cols, reducer, _bucket_count(n_buckets, n_rows_hint), pre=pre)

    def reducer(df):
        return _apply(df, aggs)

    return _bucketed(ds, key_cols, reducer, _bucket_count(n_buckets, n_rows_hint))
