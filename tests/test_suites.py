"""Suite-query machinery (pipelines/suites.py): registry shape and
member-schema sync with the DuckDB oracles."""

from __future__ import annotations

import duckdb
import pytest

from pygeoops_ray.pipelines.queries import ORACLE_SQL, QUERIES
from pygeoops_ray.pipelines.suites import (
    _MEMBER_COLS,
    FINAL_ORACLE_SQL,
    FINAL_QUERIES,
    HEAD,
    SUITES,
    _normalize_pandas,
)

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def test_head_fits_driver_gate():
    # the driver checks queries()[0:50]; every family representative and
    # every suite must land inside that window
    names = list(FINAL_QUERIES)
    assert len(HEAD) <= 50
    assert names[: len(HEAD)] == list(HEAD)
    for s in SUITES:
        assert names.index(s) < 50


def test_registry_covers_all_base_queries():
    covered = set(n for n in FINAL_QUERIES if n not in SUITES)
    for members in SUITES.values():
        covered.update(members)
    assert covered == set(QUERIES)
    assert set(FINAL_ORACLE_SQL) == set(FINAL_QUERIES)


def test_member_cols_match_duckdb_schemas():
    con = _con()
    for m, cols in _MEMBER_COLS.items():
        actual = [
            r[0]
            for r in con.sql(
                f"DESCRIBE ({ORACLE_SQL[m].strip().rstrip(';')})"
            ).fetchall()
        ]
        assert sorted(actual) == sorted(cols), m


def test_every_suite_member_has_cols():
    for members in SUITES.values():
        for m in members:
            assert m in _MEMBER_COLS, m


@pytest.mark.parametrize("suite", sorted(SUITES))
def test_suite_oracle_runs_and_matches_normalized_members(suite):
    """Suite SQL == concat of per-member normalized oracle frames."""
    import pandas as pd

    con = _con()
    got = con.sql(FINAL_ORACLE_SQL[suite]).df()
    frames = [
        _normalize_pandas(m, con.sql(ORACLE_SQL[m].strip().rstrip(";")).df())
        for m in SUITES[suite]
    ]
    want = pd.concat(frames, ignore_index=True)
    cols = ["op", "k", "num"]
    got = got[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    want = want[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
