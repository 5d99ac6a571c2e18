"""Suite queries: pack several member queries into one driver-gate slot.

The driver's correctness gate checks only the first 50 ``queries()`` entries
(CORRECTNESS_r02 covered queries()[0:50], leaving 35 operators without a
driver record — VERDICT round 2, "Next round" #1). A *suite* runs N member
pipelines and normalizes every member's result to one fixed schema::

    op  VARCHAR   member query name
    k   VARCHAR   all non-float columns, sorted by name, joined with chr(31)
    num DOUBLE    one row per float column (k gets the column name appended);
                  a constant 0.0 when the member has no float columns

The suite's oracle is the UNION ALL of the member oracles wrapped in the
identical normalization, so ONE green CORRECTNESS row value-checks every
member end-to-end (row count, keys, and float values all participate in the
driver's hash). Members keep their individual entries in the registry tail
for the judge's full sweep and for bench.

The registry below orders the final ``queries()`` dict so that the first 50
entries cover every operator family: 39 heavyweight individual pipelines +
8 suites (46 members) + round-3 additions, then the tail of individual
suite members.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pygeoops_ray.pipelines import queries as Q

__all__ = ["FINAL_QUERIES", "FINAL_ORACLE_SQL", "SUITES", "HEAD"]

_SEP = "\x1f"  # key-part separator (unit separator — never appears in values)
_NULL = "\x1e"  # NULL sentinel

# Float (DOUBLE) columns per member; every other column is a key column.
# Verified against the member oracles' DuckDB schemas (all other members
# emit only int64 / uint64 / VARCHAR columns).
_FLOAT_COLS: dict[str, tuple[str, ...]] = {
    "text_quality": ("avg_token_len",),
    "top_orders": ("o_totalprice",),
    "geo_pruned_read": ("minx", "miny", "maxx", "maxy"),
}

# Suite name -> member query names. One suite = one driver-gate slot.
SUITES: dict[str, tuple[str, ...]] = {
    "geo_suite": (
        "squarish_grid",
        "split_tiles",
        "subdivide_rect",
        "difference_rects",
        "make_valid_area",
        "extend_line",
        "collect_explode",
        "inner_rings",
        "geom_zoo",
        "dissolve",
        "overlay_nary",
        "topo_global",
        "gpkg_scan",
    ),
    "text_suite": (
        "token_count",
        "bpe_tokens",
        "text_quality",
        "lang_id",
        "winnow_fp",
        "fingerprint",
        "gopher_quality",
        "decontaminate",
        "bigram_lm",
        "bm25_topk",
        "dup_spans",
        "pii_redact",
        "domain_mix",
        "bpe_train",
        "seq_pack",
        "dataset_split",
        "group_hll",
    ),
    "window_suite": (
        "events_window",
        "hopping_window",
        "sessionize",
        "running_total",
        "funnel",
        "late_events",
        "cohort_retention",
    ),
    "rank_suite": (
        "top_orders",
        "topn_per_key",
        "global_rank",
        "group_median",
        "quantiles",
        "user_mode",
    ),
    "agg_suite": (
        "pricing_summary",
        "sales_rollup",
        "sales_cube",
        "cust_order_stats",
        "bloom_semi_join",
    ),
    "join_suite": (
        "asof_join",
        "range_join",
        "shipping_priority",
    ),
    "audio_suite": (
        "audio_features",
        "audio_resample",
    ),
    "variants_suite": (
        "pip_anti_join",
        "pip_join_agg",
        "geo_pruned_read",
        "dedup_docs",
        "simhash",
        "ann_ivf",
        "stratified_sample",
        "embed_quantize",
        "semantic_dedup",
        "caption_search",
        "compact",
        "pq_codes",
        "ann_pq",
        "jsonl_scan",
        "ipc_scan",
        "orc_scan",
        "npy_scan",
        "wds_scan",
        "mixup_pairs",
        "zorder_scan",
        "inverted_index",
        "clip_score",
        "cdc_merge",
        "ann_ivf_append",
        "ann_hnsw_disk",
        "pip_polygon",
        "topk_scan",
    ),
    # round-3 fourth/fifth-wave operators: their own gate slot so neither
    # suite grows past ~20 members (per-row latency at the driver)
    "wave_suite": (
        "aspect_bucket",
        "time_travel",
        "idw_grid",
        "trajectories",
        "tile_pyramid",
        "fuzzy_pairs",
        "skyline",
        "image_histogram",
        "anomaly_mad",
        "nearest_rect",
        "dbscan",
        "kcore",
        "ann_hnsw",
        "group_corr",
        "image_pyramid",
        "cms_sketch",
        "weighted_sample",
        "image_quality",
        "ann_ivf_pq",
        "lsh_disk",
        "dp_counts",
        "bm25_disk",
        "ann_filtered",
        "multimodal_curation",
    ),
}

# First-50 layout: every operator family has a representative here (the
# driver gate records exactly these). Suite members individually follow in
# the tail for the judge's full check_oracle sweep.
HEAD: tuple[str, ...] = (
    # spatial
    "tile_assignment",
    "pip_join",
    "clip_join",
    "knn",
    "knn_join",
    "footprint_pairs",
    "spatial_pruned_read",
    # dedup / similarity
    "dedup_events",
    "near_dup_pairs",
    "jaccard_pairs",
    "simhash_pairs",
    "cosine_pairs",
    "phash_dedup",
    "phash_near_dup",
    "incremental_dedup",
    # text sketches / heavy hitters
    "top_terms",
    "top_tokens",
    "vocab_hll",
    # ANN
    "ann_topk",
    "ann_lsh",
    "ann_ivf_disk",
    # infra
    "quarantine_decode",
    "table_profile",
    "kmeans",
    # graph
    "dup_clusters",
    "dup_triangles",
    # images (image_pyramid rides wave_suite since round 4; the family keeps
    # four other head representatives)
    "image_features",
    "zonal_stats",
    "image_augment",
    "image_curation",
    # multimodal / io / composed
    "video_frames",
    "geo_csv",
    "curation_pipeline",
    # geometry kernels (reference §2.1 flagships)
    "simplify_geo",
    "centerline",
    "buffer_by_m",
    "view_angles",
    "topo_simplify",
    # round-3 operators
    "difference_tiled",
    "pagerank",
    "knn_join_pruned",
    # suites (46 member operators in 8 slots)
    "geo_suite",
    "text_suite",
    "window_suite",
    "rank_suite",
    "agg_suite",
    "join_suite",
    "audio_suite",
    "variants_suite",
    "wave_suite",
    # round-3 additions fill the remaining head slots (kept < 50 total)
)


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            return res.to_pandas()
    except ImportError:  # pragma: no cover
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    raise TypeError(type(res))


def _key_series(df: pd.DataFrame, col: str) -> pd.Series:
    """Stringify a key column exactly like the SQL wrapper does."""
    s = df[col]
    if s.dtype == bool:
        out = s.map({True: "true", False: "false"}).astype(object)
    else:
        out = s.astype(str).astype(object)
    if s.isna().any():
        out = out.where(~s.isna(), _NULL)
    return out


def _normalize_pandas(op: str, df: pd.DataFrame) -> pd.DataFrame:
    float_cols = [c for c in sorted(df.columns) if c in _FLOAT_COLS.get(op, ())]
    key_cols = [c for c in sorted(df.columns) if c not in float_cols]
    if key_cols:
        k = _key_series(df, key_cols[0])
        for c in key_cols[1:]:
            k = k + _SEP + _key_series(df, c)
    else:  # pragma: no cover - every member has at least one key column
        k = pd.Series([""] * len(df), dtype=object)
    frames = []
    if float_cols:
        for f in float_cols:
            frames.append(
                pd.DataFrame(
                    {
                        "op": op,
                        "k": (k + _SEP + f).to_numpy(),
                        "num": df[f].to_numpy(dtype=np.float64),
                    }
                )
            )
    else:
        frames.append(
            pd.DataFrame(
                {"op": op, "k": k.to_numpy(), "num": np.zeros(len(df), dtype=np.float64)}
            )
        )
    return pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]


def _suite_fn(members: tuple[str, ...]):
    def run(sf_dir: str) -> pd.DataFrame:
        frames = [
            _normalize_pandas(name, _to_pandas(Q.QUERIES[name](sf_dir)))
            for name in members
        ]
        return pd.concat(frames, ignore_index=True)

    return run


def _sql_key_expr(cols: list[str]) -> str:
    parts = [f"COALESCE(CAST({c} AS VARCHAR), chr(30))" for c in cols]
    return f" || chr(31) || ".join(parts)


def _suite_sql(members: tuple[str, ...]) -> str:
    """UNION ALL of member oracles, each normalized to (op, k, num).

    Column names come from the member oracles themselves (kept in sync by
    tests/test_suites.py, which diff-checks suite output vs members).
    """
    import re

    selects = []
    for name in members:
        member_sql = Q.ORACLE_SQL[name].strip().rstrip(";")
        cols = _MEMBER_COLS[name]
        float_cols = [c for c in sorted(cols) if c in _FLOAT_COLS.get(name, ())]
        key_cols = [c for c in sorted(cols) if c not in float_cols]
        key_expr = _sql_key_expr(key_cols)
        if float_cols:
            for f in float_cols:
                selects.append(
                    f"SELECT '{name}' AS op, {key_expr} || chr(31) || '{f}' AS k,\n"
                    f"       CAST({f} AS DOUBLE) AS num\n"
                    f"FROM (\n{member_sql}\n) AS m_{re.sub(r'[^a-z0-9]', '_', name)}_{f}"
                )
        else:
            selects.append(
                f"SELECT '{name}' AS op, {key_expr} AS k, CAST(0 AS DOUBLE) AS num\n"
                f"FROM (\n{member_sql}\n) AS m_{re.sub(r'[^a-z0-9]', '_', name)}"
            )
    return "\nUNION ALL\n".join(selects)


# Member oracle output columns (sorted order is applied in the wrappers).
# These mirror the member oracles' SELECT lists; test_suites.py re-derives
# them from DuckDB and fails if this table drifts.
_MEMBER_COLS: dict[str, tuple[str, ...]] = {
    "squarish_grid": ("s_suppkey", "nb_columns", "nb_rows", "n_tiles"),
    "split_tiles": ("s_suppkey", "n_tiles", "area_c"),
    "subdivide_rect": ("s_suppkey", "n_parts", "area_c"),
    "difference_rects": ("s_suppkey", "n_polys", "n_holes", "area_c"),
    "make_valid_area": ("s_suppkey", "n_parts", "valid_in", "valid_out", "area_c"),
    "extend_line": ("s_suppkey", "length_c", "start_x_c", "end_y_c"),
    "collect_explode": ("c_nationkey", "n_parts", "min_x_c", "max_x_c"),
    "inner_rings": ("s_suppkey", "n_holes_kept", "area_c"),
    "geom_zoo": (
        "s_suppkey",
        "n_parts",
        "n_polys",
        "ptype_coll",
        "ptype_poly",
        "poly_area_c",
    ),
    "dissolve": ("n_nationkey", "area_c", "n_slots"),
    "overlay_nary": ("s_suppkey", "union_area_c", "diff_area_c", "isect_area_c"),
    "topo_global": ("s_suppkey", "n_pts_out", "area_c"),
    "gpkg_scan": ("s_suppkey", "area_c", "perim_c"),
    "token_count": ("doc_id", "n_tokens"),
    "bpe_tokens": ("doc_id", "n_bpe_tokens"),
    "text_quality": ("doc_id", "n_chars_calc", "n_spaces", "n_tokens", "avg_token_len"),
    "lang_id": ("doc_id", "lang_pred"),
    "winnow_fp": ("doc_id", "fp_key"),
    "fingerprint": ("doc_id", "fp"),
    "gopher_quality": ("doc_id", "n_tokens", "top_bigram_n", "dup_trigram_n"),
    "decontaminate": ("doc_id", "n_hits"),
    "bigram_lm": ("doc_id", "lm_hits", "n_bigrams"),
    "dup_spans": ("doc_id", "n_windows", "dup_windows", "dup_tokens"),
    "pii_redact": ("doc_id", "n_emails", "n_phones", "red_fp"),
    "domain_mix": ("doc_id", "lang", "rnk"),
    "ipc_scan": ("lang", "source", "sum_doc_id", "sum_chars", "n_docs"),
    "orc_scan": ("event_type", "sum_event_id", "sum_user_id", "sum_value_c", "n_events"),
    "npy_scan": ("vec_id", "checksum"),
    "wds_scan": ("fmt", "n_images", "sum_gray", "sum_caplen"),
    "mixup_pairs": ("i_a", "i_b", "w", "h", "comp_sum", "comp_sq"),
    "jsonl_scan": ("lang", "source", "sum_doc_id", "sum_chars", "n_docs"),
    "clip_score": ("i", "dot", "keep"),
    "cdc_merge": ("event_id", "value_c", "src"),
    "ann_ivf_append": ("n_queries", "k", "recall_ok", "pruned_ok", "append_ok"),
    "ann_hnsw_disk": ("n_queries", "k", "recall_ok", "loaded_eq", "files_ok"),
    "pip_polygon": ("event_id", "s_suppkey"),
    "topk_scan": ("event_id", "value_c", "rnk"),
    "aspect_bucket": ("i", "bucket", "batch_id", "slot"),
    "time_travel": ("version", "event_type", "n_rows", "sum_value_c"),
    "idw_grid": ("tx", "ty", "n_pts", "wsum", "wvsum"),
    "trajectories": ("user_id", "n_steps", "sum_d2", "max_d2"),
    "tile_pyramid": ("level", "cx", "cy", "n_points", "sum_eid"),
    "fuzzy_pairs": ("a", "b"),
    "skyline": ("event_type", "event_id", "vc", "tus"),
    "image_histogram": ("i", "bin", "n_px"),
    "anomaly_mad": ("user_id", "event_id", "vc", "med_c", "mad_c"),
    "nearest_rect": ("event_id", "i", "d2"),
    "dbscan": ("event_id", "cluster_id", "role"),
    "kcore": ("node", "degree", "conv_ok"),
    "image_pyramid": ("i", "level", "w", "h", "sum_rgb", "sum_sq", "pyramid_ok"),
    "cms_sketch": ("r", "j", "cnt"),
    "ann_ivf_pq": ("n_queries", "k", "recall_ok"),
    "lsh_disk": ("q_id", "cand_id", "j_pct", "pruned_ok"),
    "dp_counts": ("lang", "n_docs", "n_dp"),
    "bm25_disk": ("term", "doc_id", "tf", "dl", "score_fp", "rnk", "pruned_ok"),
    "ann_filtered": ("n_queries", "k", "recall_ok"),
    "multimodal_curation": ("split", "n_images", "sum_px", "id_sum", "dot_sum"),
    "weighted_sample": ("event_id", "wgt", "rk"),
    "image_quality": ("i", "w", "h", "sum_g", "sum_sq", "edge_x", "edge_y"),
    "ann_hnsw": ("n_queries", "k", "recall_ok"),
    "group_corr": ("event_type", "n", "sx", "sy", "sxx", "syy", "sxy"),
    "bpe_train": ("rnk", "lft", "rgt", "c"),
    "seq_pack": ("doc_id", "pack_id", "pack_off"),
    "dataset_split": ("split", "lang", "n_docs", "sum_doc_id", "sum_chars"),
    "group_hll": ("lang", "bucket", "r"),
    "bm25_topk": ("term", "doc_id", "tf", "dl", "score_fp", "rnk"),
    "semantic_dedup": ("a", "b"),
    "caption_search": ("i", "score", "rnk", "ihash"),
    "compact": ("file_id", "n_rows", "sum_eid"),
    "pq_codes": ("vec_id", "sub", "code", "dist2"),
    "ann_pq": ("n_queries", "k", "recall_ok"),
    "events_window": ("event_type", "hour_bucket", "n", "sum_value_c"),
    "hopping_window": ("event_type", "wnd_start_us", "n", "sum_value_c"),
    "sessionize": ("user_id", "session_seq", "n_events", "first_event"),
    "running_total": ("event_id", "user_id", "seq", "run_value_c"),
    "cohort_retention": ("cohort", "age", "n_users"),
    "late_events": ("wnd_us", "n_events", "n_late", "ontime_value_c"),
    "zorder_scan": ("user_id", "n_events", "sum_value_c"),
    "inverted_index": ("term", "doc_id", "tf"),
    "funnel": ("user_id", "view_ts", "click_ts", "purchase_ts", "stages"),
    "top_orders": ("o_orderkey", "c_name", "o_totalprice"),
    "topn_per_key": ("user_id", "event_id", "rnk"),
    "global_rank": ("event_id", "rnk"),
    "group_median": ("user_id", "median_c", "n"),
    "quantiles": ("pct", "value_c"),
    "user_mode": ("user_id", "mode_type", "n"),
    "pricing_summary": (
        "l_returnflag",
        "l_linestatus",
        "sum_qty_c",
        "sum_base_c",
        "sum_rev_u",
        "count_order",
    ),
    "sales_rollup": ("l_returnflag", "l_linestatus", "n_rows", "sum_qty_c", "sum_base_c"),
    "sales_cube": ("l_returnflag", "l_linestatus", "n_rows", "sum_qty_c", "sum_base_c"),
    "cust_order_stats": ("c_mktsegment", "n_cust", "n_inactive", "n_orders", "spend_c"),
    "asof_join": ("purchase_id", "click_id"),
    "range_join": ("click_id", "purchase_id"),
    "bloom_semi_join": ("l_returnflag", "n_rows", "sum_qty_c"),
    "shipping_priority": ("o_orderkey", "odate_us", "revenue_c"),
    "audio_features": (
        "clip_id",
        "n_samples",
        "sum_abs",
        "energy",
        "max_abs",
        "zero_crossings",
    ),
    "audio_resample": (
        "clip_id",
        "n_samples",
        "sum_abs",
        "energy",
        "max_abs",
        "zero_crossings",
    ),
    "pip_anti_join": ("event_id",),
    "pip_join_agg": ("image_id", "n_points"),
    "geo_pruned_read": ("image_id", "minx", "miny", "maxx", "maxy"),
    "dedup_docs": ("doc_id",),
    "simhash": ("doc_id", "simhash"),
    "ann_ivf": ("n_queries", "k", "recall_ok"),
    "stratified_sample": ("o_orderpriority", "n_sampled", "sum_okey"),
    "embed_quantize": ("vec_id", "sum_q", "sum_q2", "wsum"),
}


def _build_registry():
    suite_queries = {name: _suite_fn(members) for name, members in SUITES.items()}
    suite_sql = {name: _suite_sql(members) for name, members in SUITES.items()}

    final_q: dict = {}
    final_sql: dict = {}
    for name in HEAD:
        final_q[name] = suite_queries[name] if name in SUITES else Q.QUERIES[name]
        final_sql[name] = suite_sql[name] if name in SUITES else Q.ORACLE_SQL[name]
    # tail: every base query not already in the head, original order
    for name, fn in Q.QUERIES.items():
        if name not in final_q:
            final_q[name] = fn
            final_sql[name] = Q.ORACLE_SQL[name]
    return final_q, final_sql


FINAL_QUERIES, FINAL_ORACLE_SQL = _build_registry()
