"""stages/groupagg.py: bucketed vectorized aggregates must equal a plain
pandas groupby on the whole data, for int and string keys, and the bucket
hash must be deterministic (same key -> same bucket in every process)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from pygeoops_ray.stages.groupagg import grouped_agg, grouped_count, grouped_min


@pytest.fixture(scope="module")
def frame():
    rng = np.random.default_rng(11)
    n = 20_000
    return pd.DataFrame(
        {
            "ka": rng.integers(0, 3_000, n),                      # int key, many groups
            "kb": [f"s{v}" for v in rng.integers(0, 500, n)],     # string key
            "v": rng.integers(-1000, 1000, n),
        }
    )


def _ds(frame):
    return rd.from_arrow(pa.Table.from_pandas(frame, preserve_index=False)).repartition(9)


def _sorted(df, keys):
    return df.sort_values(keys).reset_index(drop=True)


def test_grouped_min_matches_pandas(ray_session, frame):
    got = grouped_min(_ds(frame), ["ka", "kb"], "v").to_pandas()
    want = frame.groupby(["ka", "kb"], as_index=False)["v"].min()
    pd.testing.assert_frame_equal(
        _sorted(got, ["ka", "kb"]), _sorted(want, ["ka", "kb"]), check_dtype=False
    )


def test_grouped_count_matches_pandas(ray_session, frame):
    got = grouped_count(_ds(frame), ["ka"], "n").to_pandas()
    want = frame.groupby(["ka"]).size().reset_index(name="n")
    pd.testing.assert_frame_equal(
        _sorted(got, ["ka"]), _sorted(want, ["ka"]), check_dtype=False
    )


def test_grouped_agg_matches_pandas(ray_session, frame):
    got = grouped_agg(
        _ds(frame), ["kb"], [("v", "size", "n"), ("v", "sum", "s"), ("v", "min", "m")]
    ).to_pandas()
    g = frame.groupby(["kb"])
    want = pd.concat(
        [g.size().rename("n"), g["v"].sum().rename("s"), g["v"].min().rename("m")],
        axis=1,
    ).reset_index()
    pd.testing.assert_frame_equal(
        _sorted(got, ["kb"]), _sorted(want, ["kb"]), check_dtype=False
    )


def test_bucket_hash_deterministic_across_processes(ray_session):
    """pd.util.hash_pandas_object with the default key must agree between the
    driver and Ray worker processes — every row of a key group must land in
    ONE bucket or grouped_min silently returns duplicate key rows."""
    df = pd.DataFrame({"k": ["a", "b", "a", "c", "b", "a"], "v": [3, 1, 2, 9, 0, 7]})
    out = grouped_min(rd.from_pandas(df).repartition(6), ["k"], "v").to_pandas()
    # one output row per distinct key proves co-bucketing held
    assert sorted(out["k"]) == ["a", "b", "c"]
    assert dict(zip(out["k"], out["v"])) == {"a": 2, "b": 0, "c": 9}


def test_group_median_bruteforce(ray_session):
    """Grouped histogram median == per-user numpy median-cut brute force."""
    import duckdb
    import numpy as np

    from pygeoops_ray.pipelines.queries import ORACLE_SQL, q_group_median

    sf = "/root/testdata/sf0.001"
    got = (
        q_group_median(sf).to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    ev = duckdb.sql(f"SELECT user_id, value FROM '{sf}/events.parquet'").df()
    for uid, grp in ev.groupby("user_id"):
        v = np.sort(np.floor(grp["value"].to_numpy() * 100).astype(np.int64))
        n = len(v)
        thr = (50 * n + 99) // 100
        want = int(v[thr - 1])
        row = got[got.user_id == uid]
        assert int(row.median_c.iloc[0]) == want, uid
        assert int(row.n.iloc[0]) == n
