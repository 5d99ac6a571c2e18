"""Round-2 final wave: Bloom semi-join, outer-join agg, stratified sampling,
rollup, embedding quantization, image augmentation — brute-force checks
against numpy/pandas/DuckDB ground truth on small corpora."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# BloomFilter kernel
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_low_fp():
    from pygeoops_ray.stages.bloomjoin import BloomFilter

    keys = np.arange(0, 90_000, 3, dtype=np.int64)
    bf = BloomFilter(12 * len(keys), 6)
    bf.add(keys)
    probe = np.arange(180_000, dtype=np.int64)
    got = bf.contains(probe)
    truth = np.zeros(len(probe), dtype=bool)
    truth[keys] = True
    assert got[truth].all(), "Bloom filter produced a false negative"
    assert got[~truth].mean() < 0.02, "false-positive rate above the 12-bit/key bound"


def test_bloom_empty_and_negative_keys():
    from pygeoops_ray.stages.bloomjoin import BloomFilter

    bf = BloomFilter(1 << 14, 6)
    assert bf.contains(np.array([], dtype=np.int64)).shape == (0,)
    neg = np.array([-5, -1, 7, 2**62], dtype=np.int64)
    bf.add(neg)
    assert bf.contains(neg).all()


def test_bloom_semi_join_exact_vs_numpy(ray_session):
    from pygeoops_ray.stages.bloomjoin import bloom_semi_join

    rng = np.random.default_rng(7)
    probe_keys = rng.integers(0, 5000, 20_000).astype(np.int64)
    build_keys = np.unique(rng.integers(0, 5000, 800).astype(np.int64))
    probe = rd.from_arrow(
        pa.table({"k": probe_keys, "v": np.arange(len(probe_keys), dtype=np.int64)})
    ).repartition(7)
    build = rd.from_arrow(pa.table({"bk": build_keys})).repartition(3)

    out = bloom_semi_join(probe, build, "k", "bk", n_build_hint=len(build_keys))
    got = out.to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    keep = np.isin(probe_keys, build_keys)
    want = (
        pd.DataFrame({"k": probe_keys[keep], "v": np.arange(len(probe_keys))[keep]})
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bloom_prefilter_actually_prunes(ray_session):
    """The inexact pass must keep all true matches and prune most non-matches
    (that reduction is the whole point of the operator at scale)."""
    from pygeoops_ray.stages.bloomjoin import bloom_semi_join

    probe_keys = np.arange(50_000, dtype=np.int64)
    build_keys = np.arange(0, 50_000, 100, dtype=np.int64)  # 1% match
    probe = rd.from_arrow(pa.table({"k": probe_keys})).repartition(5)
    build = rd.from_arrow(pa.table({"bk": build_keys}))
    survivors = bloom_semi_join(
        probe, build, "k", "bk", n_build_hint=len(build_keys), exact=False
    ).to_pandas()["k"].to_numpy()
    assert np.isin(build_keys, survivors).all()
    assert len(survivors) < 0.05 * len(probe_keys)


# ---------------------------------------------------------------------------
# driver queries vs DuckDB ground truth (sf0.001)
# ---------------------------------------------------------------------------


def _run(name):
    from pygeoops_ray.pipelines.queries import QUERIES

    out = QUERIES[name](SF)
    return out if isinstance(out, pd.DataFrame) else out.to_pandas()


def _sql(name):
    import duckdb

    from pygeoops_ray.pipelines.queries import ORACLE_SQL

    con = duckdb.connect()
    for t in ["orders", "lineitem", "customer", "embeddings", "part", "events"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.execute(ORACLE_SQL[name]).df()


@pytest.mark.parametrize(
    "name,keys",
    [
        ("cust_order_stats", ["c_mktsegment"]),
        ("stratified_sample", ["o_orderpriority"]),
        ("sales_rollup", ["l_returnflag", "l_linestatus"]),
        ("embed_quantize", ["vec_id"]),
        ("running_total", ["user_id", "seq"]),
        ("funnel", ["user_id"]),
        ("footprint_pairs", ["img_a", "img_b"]),
        ("shipping_priority", ["o_orderkey"]),
    ],
)
def test_query_matches_oracle(ray_session, name, keys):
    got = _run(name).sort_values(keys).reset_index(drop=True)
    want = _sql(name).sort_values(keys).reset_index(drop=True)
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rollup_levels_consistent(ray_session):
    """Grand total must equal the sum of fine groups (internal consistency)."""
    df = _run("sales_rollup")
    fine = df[(df.l_returnflag != "ALL") & (df.l_linestatus != "ALL")]
    total = df[(df.l_returnflag == "ALL") & (df.l_linestatus == "ALL")]
    assert len(total) == 1
    for c in ["n_rows", "sum_qty_c", "sum_base_c"]:
        assert int(fine[c].sum()) == int(total[c].iloc[0])


def test_stratified_sample_rates(ray_session):
    """Observed per-stratum rates must sit near the configured 10%..50%."""
    import duckdb

    got = _run("stratified_sample").set_index("o_orderpriority")
    tot = (
        duckdb.sql(
            f"SELECT o_orderpriority, count(*) n FROM '{SF}/orders.parquet' GROUP BY 1"
        )
        .df()
        .set_index("o_orderpriority")
    )
    for pri, row in got.iterrows():
        rate = int(pri[0]) * 10 / 100
        frac = row["n_sampled"] / tot.loc[pri, "n"]
        assert abs(frac - rate) < 0.15, (pri, frac, rate)


# ---------------------------------------------------------------------------
# image augmentation kernel vs direct pixel transforms
# ---------------------------------------------------------------------------


def test_augment_digests_match_direct_transform():
    from pygeoops_ray.table.images import synth_pixels, _row_dims

    for i in [0, 5, 17, 404]:
        w, h = _row_dims(i, small=True)
        pix = synth_pixels(i, w, h).astype(np.int64)
        flip = pix[:, ::-1, :]
        rot = pix[::-1, ::-1, :]
        wx = np.arange(1, w + 1, dtype=np.int64)
        wy = np.arange(1, h + 1, dtype=np.int64)
        # mirrored-weight identity: digest of the transformed image with
        # post-transform coordinates == original pixels with (w-x)/(h-y)
        direct_flip = int((flip.sum(axis=2) * wx[None, :]).sum())
        direct_rot = int((rot.sum(axis=2) * (wy[:, None] * wx[None, :])).sum())
        xs = np.arange(w, dtype=np.int64)
        ys = np.arange(h, dtype=np.int64)
        mirror_flip = int((pix.sum(axis=2) * (w - xs)[None, :]).sum())
        mirror_rot = int(
            (pix.sum(axis=2) * ((h - ys)[:, None] * (w - xs)[None, :])).sum()
        )
        assert direct_flip == mirror_flip
        assert direct_rot == mirror_rot


def test_bloom_anti_join_exact_complement(ray_session):
    from pygeoops_ray.stages.bloomjoin import bloom_anti_join, bloom_semi_join

    rng = np.random.default_rng(13)
    probe_keys = rng.integers(0, 3000, 10_000).astype(np.int64)
    build_keys = np.unique(rng.integers(0, 3000, 500).astype(np.int64))
    probe = rd.from_arrow(
        pa.table({"k": probe_keys, "v": np.arange(len(probe_keys), dtype=np.int64)})
    ).repartition(6)
    build = rd.from_arrow(pa.table({"bk": build_keys})).repartition(3)

    keep = ~np.isin(probe_keys, build_keys)
    want = (
        pd.DataFrame({"k": probe_keys[keep], "v": np.arange(len(probe_keys))[keep]})
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    # both regimes must produce the exact complement: broadcast (default —
    # the hint is under the threshold) AND the bloom+cogroup path (forced
    # with broadcast_threshold=0)
    anti = bloom_anti_join(probe, build, "k", "bk", n_build_hint=len(build_keys))
    got = anti.to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    anti_bloom = bloom_anti_join(
        probe, build, "k", "bk", n_build_hint=len(build_keys), broadcast_threshold=0
    )
    got_bloom = anti_bloom.to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_bloom, want)
    anti = anti_bloom
    # anti + semi must partition the probe exactly
    semi = bloom_semi_join(probe, build, "k", "bk", n_build_hint=len(build_keys))
    assert semi.count() + anti.count() == len(probe_keys)


def test_bloom_anti_join_no_positives_and_same_name(ray_session):
    """Disjoint key spaces (zero bloom positives → join skipped) and the
    same-named-key rename path."""
    from pygeoops_ray.stages.bloomjoin import bloom_anti_join

    probe = rd.from_arrow(
        pa.table({"k": np.arange(1000, 1100, dtype=np.int64)})
    ).repartition(4)
    build = rd.from_arrow(pa.table({"k": np.arange(0, 50, dtype=np.int64)}))
    out = bloom_anti_join(
        probe, build, "k", "k", n_build_hint=50, broadcast_threshold=0
    )
    assert sorted(out.to_pandas()["k"]) == list(range(1000, 1100))


def test_cdc_merge_precedence(ray_session):
    """DELETE > UPDATE > base per key; inserts land at n+id; a key hit by
    both update and delete rules (id%10==3 and id%17==5, e.g. 73) must be
    deleted."""
    import duckdb

    from pygeoops_ray.pipelines.q_relational import q_cdc_merge

    sf = "/root/testdata/sf0.001"
    out = q_cdc_merge(sf).to_pandas()
    base = duckdb.connect().execute(
        f"SELECT event_id, floor(value*100)::BIGINT AS vc FROM '{sf}/events.parquet'"
    ).df()
    n = len(base)
    ids = set(base["event_id"])
    got = out.set_index("event_id")
    both = [i for i in ids if i % 10 == 3 and i % 17 == 5]
    assert both, "fixture must exercise the precedence collision"
    for i in both:
        assert i not in got.index  # deleted despite matching the update rule
    # deleted keys gone, updated keys carry +100000, inserts shifted by n
    for i in list(ids)[:200]:
        if i % 17 == 5:
            assert i not in got.index
        elif i % 10 == 3:
            assert got.loc[i, "src"] == "upd"
        else:
            assert got.loc[i, "src"] == "base"
    ins = out[out["src"] == "ins"]
    assert (ins["event_id"] >= n).all()
    assert len(ins) == sum(1 for i in ids if i % 97 == 0)


def test_topk_scan_prunes_row_groups(ray_session):
    """The stat-ordered scan must read FEWER row groups than the file holds
    (pruning contract) and match the brute-force top-20."""
    import duckdb

    from pygeoops_ray.pipelines.q_relational import q_topk_scan

    sf = "/root/testdata/sf0.01"
    out = q_topk_scan(sf)
    read, total = q_topk_scan._last_stats
    assert total == 32 and 0 < read < total, (read, total)
    want = duckdb.connect().execute(
        f"""SELECT event_id, floor(value*100)::BIGINT AS value_c,
                   row_number() OVER (ORDER BY value DESC, event_id)::BIGINT AS rnk
            FROM '{sf}/events.parquet' ORDER BY value DESC, event_id LIMIT 20"""
    ).df()
    assert out.reset_index(drop=True).equals(want)
