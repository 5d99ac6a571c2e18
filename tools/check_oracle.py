"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at the given sf_dir and compares against
``oracle_sql()`` via DuckDB: row count, sorted column names, and an
order-insensitive value comparison (sorted frames, exact for ints/strings,
allclose for floats). Queries without an oracle get a rows-only check.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    raise TypeError(type(res))


def compare(name: str, ray_df, sql_df) -> str:
    import numpy as np

    ray_df = ray_df.reindex(sorted(ray_df.columns), axis=1)
    sql_df = sql_df.reindex(sorted(sql_df.columns), axis=1)
    if list(ray_df.columns) != list(sql_df.columns):
        return f"SCHEMA MISMATCH ray={list(ray_df.columns)} sql={list(sql_df.columns)}"
    if len(ray_df) != len(sql_df):
        return f"ROWCOUNT MISMATCH ray={len(ray_df)} sql={len(sql_df)}"
    cols = list(ray_df.columns)
    a = ray_df.sort_values(cols, kind="mergesort").reset_index(drop=True)
    b = sql_df.sort_values(cols, kind="mergesort").reset_index(drop=True)
    # the driver's value hash is dtype-sensitive (round-1 lesson: DuckDB
    # HUGEINT→float64 and nullable Int64 made value-identical queries fail) —
    # mirror that by failing on any dtype divergence
    for c in cols:
        if str(a[c].dtype) != str(b[c].dtype):
            return f"DTYPE MISMATCH col={c} ray={a[c].dtype} sql={b[c].dtype}"
    for c in cols:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            if not np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True):
                # exact first; fall back to tolerance report
                mx = np.max(np.abs(av.astype(float) - bv.astype(float)))
                if mx > 1e-9:
                    return f"VALUE MISMATCH col={c} max_abs_diff={mx}"
                return f"OK (float tol, col={c} maxdiff={mx})"
        else:
            if not (av == bv).all():
                bad = np.nonzero(av != bv)[0][:3]
                return f"VALUE MISMATCH col={c} rows={bad.tolist()} ray={av[bad]} sql={bv[bad]}"
    return "OK"


def main():
    import duckdb

    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=8,
            include_dashboard=False,
            logging_level="ERROR",
            log_to_driver=False,
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    # Known Ray Data artifacts on empty sort partitions (blocks >> groups in
    # map_groups) and dict-typed schemas: harmless, values oracle-verified.
    import logging

    for name in (
        "ray.data._internal.arrow_ops.transform_pyarrow",
        "ray.data._internal.execution.streaming_executor_state",
        "ray.data",
    ):
        logging.getLogger(name).setLevel(logging.ERROR)

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    # suite oracles at sf0.1 (wave_suite's UNION ALL of image-CTE members)
    # out-spill the disk under DuckDB's default morsel parallelism: fewer
    # threads serialize the member pipelines so peak temp stays bounded,
    # and the explicit memory budget keeps intermediates in RAM (measured:
    # default settings ENOSPC'd a 30 GB /tmp; threads=4 + 90GB completes)
    con.sql("PRAGMA threads=4")
    con.sql("PRAGMA memory_limit='90GB'")
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"{name:20s} RAY ERROR: {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name in oracles:
            try:
                sql_df = con.sql(oracles[name]).df()
            except Exception as e:
                print(f"{name:20s} SQL ERROR: {e}")
                failures += 1
                continue
            verdict = compare(name, ray_df, sql_df)
        else:
            verdict = f"rows-only: {len(ray_df)} rows"
        status = "OK" if verdict.startswith(("OK", "rows-only")) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{name:20s} [{dt:5.1f}s] {verdict}")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
