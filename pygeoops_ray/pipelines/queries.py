"""Driver-contract queries: each Ray Data pipeline paired with a DuckDB oracle.

Every function takes ``sf_dir`` and returns a Dataset / DataFrame / Table whose
column names match the oracle SQL exactly (the driver sorts columns by name and
hashes values). The world model is pure arithmetic on row ordinals (see
table/images.py georeference rule), which keeps the spatial pipelines —
footprints, Hilbert-cell co-partitioned PIP join, covering-tile expansion,
clip join, kNN — recomputable in ANSI SQL.

Ray is initialised by the driver; nothing here calls ray.init().
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from pygeoops_ray.stages import ann as ann_stages
from pygeoops_ray.stages import dedup as dedup_stages
from pygeoops_ray.stages import spatial as sp
from pygeoops_ray.stages import text as text_stages

__all__ = ["QUERIES", "ORACLE_SQL"]


def _strip_schema_metadata(batch: pa.Table) -> pa.Table:
    """Drop parquet's embedded pandas metadata from the block schema.

    Schemas carrying a metadata dict are unhashable, so Ray's shuffle-reduce
    schema dedup (`unify_schemas` early-exit) fails on every reduce call and
    falls back to the expensive unify path, logging a warning per task.
    `replace_schema_metadata(None)` is zero-copy and the read stage fuses
    with this map, so the strip is free.
    """
    if batch.schema.metadata is not None:
        return batch.replace_schema_metadata(None)
    return batch


def _read_schema(sf_dir: str, table: str, columns=None) -> pa.Schema:
    """Metadata-free output schema for a parquet table (file or directory)."""
    import os

    import pyarrow.parquet as pq

    path = f"{sf_dir}/{table}.parquet"
    if os.path.isdir(path):
        part = next(p for p in sorted(os.listdir(path)) if p.endswith(".parquet"))
        sch = pq.read_schema(os.path.join(path, part))
    else:
        sch = pq.read_schema(path)
    if columns:
        sch = pa.schema([sch.field(c) for c in columns])
    return sch.remove_metadata()


def _read(sf_dir: str, table: str, columns=None, num_blocks: int | None = None):
    # single-file parquet reads default to ONE read task; split to ~2 blocks
    # per CPU (bounded by rows) so downstream stages parallelize immediately —
    # measured 2x on the sf0.1 lineitem scan (0.7s -> 0.33s steady-state).
    # The explicit metadata-free schema stops parquet's embedded pandas dict
    # from defeating Ray's shuffle schema dedup at the READ level (the strip
    # map below only covers blocks it has already seen).
    if num_blocks is None:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        rows = _table_rows(sf_dir, table)
        num_blocks = max(8, min(2 * ncpu, max(1, rows // 4096)))
    return rd.read_parquet(
        f"{sf_dir}/{table}.parquet",
        columns=columns,
        schema=_read_schema(sf_dir, table, columns),
        override_num_blocks=num_blocks,
    ).map_batches(_strip_schema_metadata, batch_format="pyarrow", batch_size=None)


def _table_rows(sf_dir: str, table: str) -> int:
    """Row count from parquet METADATA (no data read) — sizing hints only.
    Handles both a single file and a directory dataset (the shape real-scale
    tables have)."""
    import os

    import pyarrow.parquet as pq

    path = f"{sf_dir}/{table}.parquet"
    if os.path.isdir(path):
        return sum(
            pq.read_metadata(os.path.join(path, f)).num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return pq.read_metadata(path).num_rows


def _read_blocked(sf_dir: str, table: str, columns=None):
    """Read with a modest block-count ceiling for SHUFFLE-heavy pipelines.

    Ray auto-splits small files into ~2×CPU blocks to feed every core; for a
    map-only pipeline that's right, but each groupby/sort downstream pays
    task fan-out proportional to blocks × partitions, which dominates at
    test scale (measured: near_dup_pairs 7.5s → 1.1s from this cap alone).
    At 100-TB scale blocks are naturally ~100-200 MB each and a ceiling of
    CPU/4 blocks per small file is a no-op.
    """
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return rd.read_parquet(
        f"{sf_dir}/{table}.parquet",
        columns=columns,
        override_num_blocks=max(4, ncpu // 4),
    ).map_batches(_strip_schema_metadata, batch_format="pyarrow", batch_size=None)


def _images(sf_dir: str):
    # blocked read: these feed the cell-cogrouped shuffle joins
    return _read_blocked(sf_dir, "part", columns=["p_partkey"]).map_batches(
        sp.image_meta_from_part, batch_format="pyarrow"
    )


def _points(sf_dir: str):
    return _read_blocked(sf_dir, "events", columns=["event_id"]).map_batches(
        sp.points_from_events, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# spatial: tile assignment / PIP join / clip join / kNN
# ---------------------------------------------------------------------------


def q_tile_assignment(sf_dir: str):
    """Footprint → covering 256-unit tiles (1→k flat expansion)."""
    ds = _images(sf_dir).map_batches(sp.expand_covering_tiles, batch_format="pyarrow")
    return ds.select_columns(["image_id", "tile_x", "tile_y"])


def q_pip_join(sf_dir: str):
    """Point-in-polygon join, co-partitioned on the Hilbert cell id."""
    return sp.pip_join_rects_points(_images(sf_dir), _points(sf_dir))


def q_pip_anti_join(sf_dir: str):
    """Spatial ANTI join: event points covered by NO image footprint.

    Same cell-cogrouped shuffle as pip_join with the containment mask
    inverted per group (a point lands in exactly one group and every rect
    overlapping that cell is replicated into it, so per-group "zero hits" is
    globally correct). The SURVEY §2.2 semi/anti family as a first-class
    driver-checked operator; oracle is the NOT EXISTS SQL.
    """
    return sp.pip_join_rects_points(
        _images(sf_dir), _points(sf_dir), join_type="anti"
    )


def q_pip_join_agg(sf_dir: str):
    """Points-per-image counts over the PIP join (bucketed vectorized count:
    one group per matched image — high-cardinality keys take the coarse-bucket
    pandas path, see stages/groupagg.py)."""
    from pygeoops_ray.stages.groupagg import grouped_count

    joined = sp.pip_join_rects_points(_images(sf_dir), _points(sf_dir))
    return grouped_count(
        joined, ["image_id"], "n_points", n_rows_hint=_table_rows(sf_dir, "events")
    )


def q_spatial_pruned_read(sf_dir: str):
    """Cell-partitioned resumable sink + bbox-PRUNED read-back + aggregate.

    The 100-TB read-path feature: event points are written once as a
    grid-cell-partitioned parquet directory whose checkpoint manifest records
    each partition's [min, max] of (px, py) (state/manifest.py
    write_partitioned stats_cols). The read side (read_pruned) then serves a
    bbox query by (1) dropping whole partition files on the driver from the
    few-KB manifest — no Ray task ever touches them — and (2) pushing the
    bbox down as a pyarrow filter so parquet row-group stats prune inside
    the surviving files. The bbox is deliberately NOT cell-aligned on its
    x-high edge, so the result exercises both levels: file pruning AND
    row filtering within a kept partition.

    Oracle: the points are pure arithmetic on event_id (_PTS), so the bbox
    filter + per-cell aggregate re-derives exactly in SQL.
    """
    import hashlib
    import os

    from pygeoops_ray.stages.groupagg import grouped_agg
    from pygeoops_ray.state.manifest import read_pruned, write_partitioned

    cs = 2048  # partition cell: 8x8 world tiles → ≤375 partitions on this world
    events_path = os.path.join(sf_dir, "events.parquet")
    n_rows = _table_rows(sf_dir, "events")
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{os.path.getmtime(events_path)}:{n_rows}".encode()
    ).hexdigest()[:10]
    out_dir = f"/tmp/pygeoops_ray_cache/spatial_sink_{key}"

    def add_gcell(b: pa.Table) -> pa.Table:
        # px/py are integer-valued doubles (pure event_id arithmetic): the
        # int64 cast is exact, so the cell key matches the SQL `// 2048`
        gx = b["px"].to_numpy().astype(np.int64) // cs
        gy = b["py"].to_numpy().astype(np.int64) // cs
        return b.append_column("gcell", pa.array(gx + 1024 * gy, pa.int64()))

    # reuse the sink only when a PRIOR RUN FINISHED it (marker written after
    # write_partitioned returns) — a partial manifest from a crashed run must
    # resume the write, not be served as if complete
    done_marker = os.path.join(out_dir, "_complete")
    if not os.path.exists(done_marker):
        pts = (
            _read_blocked(sf_dir, "events", columns=["event_id"])
            .map_batches(sp.points_from_events, batch_format="pyarrow")
            .map_batches(add_gcell, batch_format="pyarrow")
        )
        write_partitioned(
            pts, out_dir, "gcell", stage="points",
            lineage={"sf_dir": sf_dir}, stats_cols=["px", "py"],
        )
        with open(done_marker, "w") as f:
            f.write("1")

    bbox = (131072.0, 0.0, 197608.0, 4096.0)  # x1 cuts INTO cell 96 (row filter)
    ds = read_pruned(
        out_dir, {"px": (bbox[0], bbox[2]), "py": (bbox[1], bbox[3])}, stage="points"
    )
    return grouped_agg(
        ds,
        ["gcell"],
        [
            ("event_id", "size", "n_points"),
            ("event_id", "min", "min_eid"),
            ("event_id", "sum", "sum_eid"),
        ],
        n_rows_hint=n_rows,
    )


def q_geo_pruned_read(sf_dir: str):
    """Extent-pruned GEOMETRY reads — the GeoParquet bbox-column idiom.

    Footprint rectangles land in a cell-partitioned resumable sink whose
    manifest records per-partition extents of all four bbox columns; a
    bbox-INTERSECTION query (rect ∩ bbox ≠ ∅, touching counts) is served as
    one-sided ranges over those stats: minx < x1 AND maxx >= x0 AND
    miny < y1 AND maxy >= y0. Same two pruning levels as
    spatial_pruned_read (whole files from the manifest, rows via the pushed
    filter), but over extents rather than points — rects OVERHANGING their
    home cell are still found because the stats cover the overhang.
    """
    import hashlib
    import os

    from pygeoops_ray.state.manifest import read_pruned, write_partitioned

    cs = 2048
    part_path = os.path.join(sf_dir, "part.parquet")
    n_rows = _table_rows(sf_dir, "part")
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{os.path.getmtime(part_path)}:{n_rows}".encode()
    ).hexdigest()[:10]
    out_dir = f"/tmp/pygeoops_ray_cache/geo_sink_{key}"

    def add_gcell(b: pa.Table) -> pa.Table:
        gx = b["minx"].to_numpy().astype(np.int64) // cs
        gy = b["miny"].to_numpy().astype(np.int64) // cs
        return b.append_column("gcell", pa.array(gx + 1024 * gy, pa.int64()))

    # completion marker, not manifest emptiness: a partial manifest from a
    # crashed run must resume the write (write_partitioned skips finished
    # partitions), never be served as if complete
    done_marker = os.path.join(out_dir, "_complete")
    if not os.path.exists(done_marker):
        rects = _images(sf_dir).map_batches(add_gcell, batch_format="pyarrow")
        write_partitioned(
            rects, out_dir, "gcell", stage="rects",
            lineage={"sf_dir": sf_dir},
            stats_cols=["minx", "maxx", "miny", "maxy"],
        )
        with open(done_marker, "w") as f:
            f.write("1")

    # slots 100..182 — populated at every scale (part has >=200 rows at
    # sf0.001); x1 cuts INTO a cell so row filtering is exercised too
    x0, y0, x1, y1 = 25600.0, 0.0, 46600.0, 4096.0
    ds = read_pruned(
        out_dir,
        {
            "minx": (None, x1),
            "maxx": (x0, None),
            "miny": (None, y1),
            "maxy": (y0, None),
        },
        stage="rects",
    )
    return ds.select_columns(["image_id", "minx", "miny", "maxx", "maxy"])


def q_clip_join(sf_dir: str):
    """Raster-tile ↔ footprint clip join: per-pair clipped area (S-H kernel)."""
    ds = sp.clip_tiles(_images(sf_dir))
    return ds.select_columns(["image_id", "tile_x", "tile_y", "clip_area"])


def q_knn(sf_dir: str):
    """k=5 nearest event-points for each of the 25 nation query points."""
    nation = _read(sf_dir, "nation", columns=["n_nationkey"]).to_pandas()
    nk = nation["n_nationkey"].to_numpy()
    qx = nk.astype(np.float64) * 256.0 + 128.0
    qy = (nk % 5).astype(np.float64) * 256.0 + 128.0
    out = sp.knn_points(_points(sf_dir), nk.astype(np.int64), qx, qy, k=5)
    return out.select_columns(["q_id", "event_id", "rnk"])


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


def q_dedup_events(sf_dir: str):
    ds = _read_blocked(sf_dir, "events", columns=["user_id", "event_type", "event_id"])
    return dedup_stages.exact_dedup_min(
        ds, ["user_id", "event_type"], "event_id",
        n_rows_hint=_table_rows(sf_dir, "events"),
    )


def q_dedup_docs(sf_dir: str):
    ds = _read_blocked(sf_dir, "documents", columns=["text", "doc_id"])
    return dedup_stages.exact_dedup_min(
        ds, ["text"], "doc_id", n_rows_hint=_table_rows(sf_dir, "documents")
    ).select_columns(["doc_id"])


def q_jaccard_pairs(sf_dir: str):
    """EXACT word-3-gram Jaccard similarity self-join at t=0.5.

    Prefix-filter candidate generation has guaranteed recall (see
    stages/dedup.exact_jaccard_pairs), so the oracle is the literal all-pairs
    SQL over DuckDB string shingle lists. Docs with <3 tokens have no
    3-shingles and are excluded on both sides.
    """
    import pyarrow.compute as pc

    ds = _read_blocked(sf_dir, "documents", columns=["doc_id", "text"])

    def flt(b: pa.Table) -> pa.Table:
        ntok = pc.list_value_length(pc.split_pattern(b["text"], " "))
        return b.filter(pc.greater_equal(ntok, 3))

    ds = ds.map_batches(flt, batch_format="pyarrow")
    n_docs = _table_rows(sf_dir, "documents")
    return dedup_stages.exact_jaccard_pairs(ds, jaccard_threshold=0.5, n_docs_hint=n_docs)


def q_simhash(sf_dir: str):
    """64-bit SimHash per document (oracle: md5_number_lower bit votes in SQL)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(dedup_stages.simhash_batch, batch_format="pyarrow")


def q_simhash_pairs(sf_dir: str):
    """SimHash near-dup pairs at hamming<=3 via 4-band pigeonhole grouping.

    Banding guarantees recall (<=3 differing bits leave >=1 of 4 bands
    intact), so the oracle is the all-pairs bit_count(xor(...)) SQL.
    """
    ds = _read_blocked(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup_stages.simhash_pairs(
        ds, max_hamming=3, n_docs_hint=_table_rows(sf_dir, "documents")
    )


def q_cosine_pairs(sf_dir: str):
    """Exact embedding-cosine near-dup pairs at cos>=0.45 (baseline path:
    broadcast corpus matrix + per-batch matmul strip; IVF/LSH buckets are the
    10^12-scale candidate path, measured against this exact baseline)."""
    ids, m = _corpus_matrix(sf_dir)
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ann_stages.cosine_dup_pairs(emb, ids, m, threshold=0.45)


def q_near_dup_pairs(sf_dir: str):
    """MinHash-LSH near-duplicate pairs (rows-only check: not SQL-expressible).

    Block count pinned modestly: Ray auto-splits the small file into
    64 blocks to feed every core, but the pipeline has three sort shuffles
    whose task fan-out is blocks × partitions — at test scale that's pure
    overhead. At real scale blocks are naturally ~100-200 MB and this
    override is a no-op ceiling.
    """
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        override_num_blocks=max(4, ncpu // 4),
    ).map_batches(_strip_schema_metadata, batch_format="pyarrow", batch_size=None)
    return dedup_stages.near_dup_pairs(
        ds, jaccard_threshold=0.5, n_docs_hint=_table_rows(sf_dir, "documents")
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def q_token_count(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(text_stages.token_count_batch, batch_format="pyarrow")


def q_text_quality(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(text_stages.quality_batch, batch_format="pyarrow")


def q_bpe_tokens(sf_dir: str):
    """BPE-ish pretokenizer counts (regex compiled once per actor); the RE2-
    compatible pattern makes the oracle an exact regexp_extract_all count."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        text_stages.BpeTokenCount, batch_format="pyarrow", concurrency=2
    )


def q_lang_id(sf_dir: str):
    """Heuristic language ID (rows-only: the classifier is not SQL-expressible)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(text_stages.LangId, batch_format="pyarrow", concurrency=2)


def q_curation_pipeline(sf_dir: str):
    """End-to-end LLM training-data curation, composed and oracle-exact.

    The flagship text-side chain: quality filter (token count + average
    token length, the exact text_quality rules) → exact dedup (min doc_id
    per identical text) → near-duplicate removal (prefix-filtered exact
    word-3-gram Jaccard at t=0.5 — guaranteed recall, so the removal rule
    "drop every doc_b of a pair (doc_a < doc_b)" is deterministic) →
    deterministic train/val split (Knuth multiplicative hash of doc_id).
    Every stage is an already-oracle-checked operator; this query binds the
    COMPOSITION to one SQL oracle (per-split doc counts, token sums, id
    checksums).

    Scale notes: the dedup output is materialized once because two
    consumers read it (the pair finder and the final filter) — at real
    scale that's a write_partitioned checkpoint instead. The near-dup
    removal runs as a distributed Bloom ANTI-JOIN against the pair output
    (stages/bloomjoin.py): non-duplicate docs — the vast majority — are
    bloom-negative and flow through with no exchange; only bloom-positives
    enter the exact left_anti join, so nothing about the drop set ever
    lands on the driver even on a duplicate-saturated corpus.
    """
    import pyarrow.compute as pc

    ds = _read_blocked(sf_dir, "documents", columns=["doc_id", "text"])

    def quality_filter(b: pa.Table) -> pa.Table:
        text = b["text"]
        n_chars = pc.utf8_length(text)
        n_spaces = pc.subtract(
            n_chars, pc.utf8_length(pc.replace_substring(text, " ", ""))
        )
        n_tokens = pc.list_value_length(pc.split_pattern(text, " "))
        atl = pc.divide(
            pc.cast(pc.subtract(n_chars, n_spaces), pa.float64()),
            pc.cast(n_tokens, pa.float64()),
        )
        keep = pc.and_(
            pc.greater_equal(n_tokens, 5),
            pc.and_(pc.greater_equal(atl, 3.0), pc.less_equal(atl, 12.0)),
        )
        return b.filter(keep)

    filtered = ds.map_batches(quality_filter, batch_format="pyarrow")
    n_docs = _table_rows(sf_dir, "documents")
    deduped = dedup_stages.exact_dedup_min(
        filtered, ["text"], "doc_id", n_rows_hint=n_docs
    ).materialize()

    from pygeoops_ray.stages.bloomjoin import bloom_anti_join

    pairs = dedup_stages.exact_jaccard_pairs(
        deduped, jaccard_threshold=0.5, n_docs_hint=n_docs
    )
    # drop every doc_b of a near-dup pair, distributively: n_build_hint is an
    # upper bound (pair count <= corpus), which only oversizes the filter
    # the anti-join consumes the build side twice (bloom build + distinct);
    # materialize the one-column pair projection (bounded by dup density) so
    # the jaccard pipeline runs once — in the object store, not the driver
    kept = bloom_anti_join(
        deduped,
        pairs.select_columns(["doc_b"]).materialize(),
        probe_key="doc_id",
        build_key="doc_b",
        n_build_hint=n_docs,
    )

    def split_and_count(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        toks = pc.list_value_length(pc.split_pattern(b["text"], " ")).to_numpy()
        bucket = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)
        split = np.where(bucket % np.uint64(10) == 9, "val", "train")
        return pa.Table.from_pydict(
            {
                "split": pa.array(split),
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(toks.astype(np.int64), pa.int64()),
            }
        )

    from pygeoops_ray.stages.groupagg import grouped_agg

    return grouped_agg(
        kept.map_batches(split_and_count, batch_format="pyarrow"),
        ["split"],
        [
            ("doc_id", "size", "n_docs"),
            ("n_tokens", "sum", "sum_tokens"),
            ("doc_id", "sum", "sum_doc_id"),
        ],
        n_buckets=2,
    )


def q_fingerprint(sf_dir: str):
    """md5 document fingerprints (oracle: DuckDB md5(text))."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(text_stages.fingerprint_batch, batch_format="pyarrow")


def q_winnow_fp(sf_dir: str):
    """Winnowing rolling-hash fingerprints (k=8 grams, window w=4).

    The brief's "document fingerprinting (rolling hash)" operator as a
    first-class query: every selected (hash, rightmost-position) pair is one
    exact BIGINT key, so DuckDB replays the whole pipeline — k-gram
    polynomial hash, window min, rightmost tie-break — in integer SQL (see
    stages/text.py:winnow_batch for the derivation).
    """
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(text_stages.winnow_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


def _matrix_of(tab: pa.Table):
    ids = tab["vec_id"].to_numpy()
    emb = tab["embedding"].combine_chunks()
    flat = np.asarray(emb.values, dtype=np.float64)
    dim = len(flat) // max(len(ids), 1)
    return ids, flat.reshape(len(ids), dim)


def _query_vectors(sf_dir: str, nq: int = 8):
    """The nq smallest-vec_id vectors, via ROW-GROUP-PRUNED reads.

    Row groups are read in ascending order of their vec_id min-statistic and
    reading stops as soon as the collected rows must contain the global nq
    smallest (every unread group's min exceeds our nq-th candidate) — at
    scale this touches one row group, not the table.
    """
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    md = pf.metadata
    vec_col = next(
        i for i in range(md.num_columns) if md.row_group(0).column(i).path_in_schema == "vec_id"
    )
    mins = [md.row_group(g).column(vec_col).statistics.min for g in range(md.num_row_groups)]
    order = sorted(range(len(mins)), key=lambda g: mins[g])
    tabs, best = [], None
    for pos, g in enumerate(order):
        tabs.append(pf.read_row_group(g, columns=["vec_id", "embedding"]))
        got = np.sort(np.concatenate([t["vec_id"].to_numpy() for t in tabs]))
        if len(got) >= nq:
            best = got[nq - 1]
            nxt = mins[order[pos + 1]] if pos + 1 < len(order) else None
            if nxt is None or best < nxt:
                break
    tab = pa.concat_tables(tabs)
    ids, m = _matrix_of(tab)
    sel = np.argsort(ids)[:nq]
    return ids[sel], m[sel]


def _corpus_matrix(sf_dir: str):
    """Full (vec_id, embedding) matrix — broadcast side of the exact
    cosine-pair baseline (column-pruned read; the matrix IS the operator's
    small side, ray.put once by the stage)."""
    import pyarrow.parquet as pq

    tab = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return _matrix_of(tab)


def q_ann_topk(sf_dir: str):
    """Exact cosine top-10 for the first 8 vectors as queries."""
    q_ids, qm = _query_vectors(sf_dir)
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ann_stages.brute_force_topk(emb, q_ids, qm, k=10)


def _ann_recall_summary(sf_dir: str, approx_fn, min_mean_recall_pct: int, k: int = 10):
    """Weak oracle for an approximate-NN family, encoded as rows.

    An approximate index has no value-exact SQL oracle, but its CONTRACT does:
    mean recall@k against the exact top-k (computed from the same table inside
    this query) must clear a floor. The driver-visible output is one summary
    row whose ``recall_ok`` flips to 0 on a recall regression, turning the
    oracle hash red — chance-level recall here is k/N ≈ 0.1%, so the floor is
    a real assertion, not a tautology. Raw neighbor lists stay available via
    ``stages.ann`` and the recall distribution via pytest.
    """
    q_ids, qm = _query_vectors(sf_dir)
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    exact = ann_stages.brute_force_topk(emb, q_ids, qm, k=k).to_pandas()
    approx = approx_fn(emb, q_ids, qm, k=k).to_pandas()
    recalls = []
    for q in q_ids:
        e = set(exact.loc[exact["q_id"] == q, "vec_id"])
        a = set(approx.loc[approx["q_id"] == q, "vec_id"])
        recalls.append(len(e & a) / max(len(e), 1))
    mean_pct = 100.0 * float(np.mean(recalls)) if recalls else 0.0
    return pa.Table.from_pydict(
        {
            "n_queries": pa.array([len(q_ids)], pa.int64()),
            "k": pa.array([k], pa.int64()),
            "recall_ok": pa.array([int(mean_pct >= min_mean_recall_pct)], pa.int64()),
        }
    )


def q_ann_ivf(sf_dir: str):
    """IVF approximate-NN recall gate: mean recall@10 >= 40% vs exact.

    Measured mean recall is 0.55-0.74 across sf0.001/sf0.01 (nprobe=4 of 16
    centroids); the 40% floor leaves margin for corpus drift while staying
    ~400x above chance.
    """
    return _ann_recall_summary(sf_dir, ann_stages.ivf_topk, min_mean_recall_pct=40)


def q_ann_ivf_disk(sf_dir: str):
    """Disk-persisted IVF index: recall contract + I/O-pruning contract.

    Index build (once per table, resumable): vectors written as one parquet
    partition per coarse cell through the checkpoint manifest, centroids as
    a sidecar (stages/ann.build_ivf_disk_index). Query: only the probed
    cells' FILES are read (ivf_disk_topk) — the 100-TB similarity-search
    shape where the index is a data layout and a query's I/O is nprobe/N of
    the corpus. Output adds ``pruned_ok`` (files_read < files_total) to the
    recall contract, so a regression in either the recall OR the pruning
    turns the driver hash red.
    """
    import hashlib
    import os

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{os.path.getmtime(emb_path)}".encode()
    ).hexdigest()[:10]
    out_dir = f"/tmp/pygeoops_ray_cache/ivf_index_{key}"
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    if not os.path.exists(os.path.join(out_dir, "centroids.npy")):
        ann_stages.build_ivf_disk_index(emb, out_dir)

    k = 10
    q_ids, qm = _query_vectors(sf_dir)
    approx_ds, n_read, n_total = ann_stages.ivf_disk_topk(out_dir, q_ids, qm, k=k)
    exact = ann_stages.brute_force_topk(emb, q_ids, qm, k=k).to_pandas()
    approx = approx_ds.to_pandas()
    recalls = []
    for q in q_ids:
        e = set(exact.loc[exact["q_id"] == q, "vec_id"])
        a = set(approx.loc[approx["q_id"] == q, "vec_id"])
        recalls.append(len(e & a) / max(len(e), 1))
    mean_pct = 100.0 * float(np.mean(recalls)) if recalls else 0.0
    return pa.Table.from_pydict(
        {
            "n_queries": pa.array([len(q_ids)], pa.int64()),
            "k": pa.array([k], pa.int64()),
            "recall_ok": pa.array([int(mean_pct >= 40)], pa.int64()),
            "pruned_ok": pa.array([int(0 < n_read < n_total)], pa.int64()),
        }
    )


def q_ann_lsh(sf_dir: str):
    """Hyperplane-LSH approximate-NN recall gate: mean recall@10 >= 30%.

    Measured mean recall is 0.42-0.46 across sf0.001/sf0.01.
    """
    return _ann_recall_summary(sf_dir, ann_stages.lsh_topk, min_mean_recall_pct=30)


# ---------------------------------------------------------------------------
# geometry kernels over a deterministic corpus (rows-only: kernels are not
# SQL-expressible; their correctness gate is the transcribed pytest corpus)
# ---------------------------------------------------------------------------


def _geom_corpus(sf_dir: str):
    from pygeoops_ray.stages import geo_batch as gb

    return _read(sf_dir, "supplier", columns=["s_suppkey"]).map_batches(
        gb.polygons_from_supplier, batch_format="pyarrow"
    )


def q_simplify_geo(sf_dir: str):
    """RDP-simplify a densified-rectangle corpus; counts + area digest.

    Corpus rule: a W x H rectangle (W = 16 + k%5*8, H = 8 + k%3*4, offset
    (k%7, k%13)) densified to unit spacing on every edge. RDP at tol 0.5
    drops exactly the collinear interior vertices: n_pts_in = 2(W+H)+1,
    n_pts_out = 5, area = W*H — all closed-form for the oracle (verified
    exact over the full k-pattern space). The irregular wavy corpus and the
    lang/lang+/vw algorithm matrix stay pytest-gated
    (tests/test_simplify.py)."""
    from pygeoops_ray.geo import geom as g
    from pygeoops_ray.geo import wkb as wkb_codec
    from pygeoops_ray.stages import geo_batch as gb

    def dense_rects(batch: pa.Table) -> pa.Table:
        keys = batch["s_suppkey"].to_numpy()
        wkbs = []
        for k in keys:
            k = int(k)
            W, H = 16 + (k % 5) * 8, 8 + (k % 3) * 4
            ox, oy = float(k % 7), float(k % 13)
            pts = (
                [(ox + float(i), oy) for i in range(W)]
                + [(ox + W, oy + float(j)) for j in range(H)]
                + [(ox + float(i), oy + H) for i in range(W, 0, -1)]
                + [(ox, oy + float(j)) for j in range(H, 0, -1)]
                + [(ox, oy)]
            )
            wkbs.append(wkb_codec.dumps(g.Polygon([list(p) for p in pts])))
        return pa.Table.from_pydict(
            {"s_suppkey": pa.array(keys, pa.int64()), "geom_wkb": pa.array(wkbs, pa.binary())}
        )

    ds = _read(sf_dir, "supplier", columns=["s_suppkey"]).map_batches(
        dense_rects, batch_format="pyarrow"
    )
    ds = ds.map_batches(
        gb.simplify_stage(tolerance=0.5, algorithm="rdp"), batch_format="pyarrow"
    )

    def digest(batch: pa.Table) -> pa.Table:
        areas = [
            int(np.round(wkb_codec.loads(b).area * 100)) if b is not None else 0
            for b in batch["geom_wkb"].to_pylist()
        ]
        return pa.Table.from_pydict(
            {
                "s_suppkey": batch["s_suppkey"],
                "n_pts_in": batch["n_pts_in"],
                "n_pts_out": batch["n_pts_out"],
                "area_c": pa.array(areas, pa.int64()),
            }
        )

    return ds.map_batches(digest, batch_format="pyarrow")


def q_centerline(sf_dir: str):
    """Centerline (Voronoi medial axis) via the actor pool, exact oracle.

    Corpus rule: the reference's golden rectangle (tests/test_centerline.py
    `LINESTRING (1 1, 9 1)` for the 10x2 box) scaled by s = 1 + k%4 and
    translated by (k%9, k%11) — similarity transforms commute with the
    medial axis, so length = 8s exactly (verified over the full pattern
    space). round() not floor(): the kernel's length sits within 1e-9 of
    the true value on either side. Irregular/complex-polygon centerlines
    (ellipse, fancy-L, regression corpus) stay pytest-gated with full golden
    WKTs."""
    from pygeoops_ray.geo import geom as g
    from pygeoops_ray.geo import wkb as wkb_codec
    from pygeoops_ray.stages import geo_batch as gb

    def rects(batch: pa.Table) -> pa.Table:
        keys = batch["s_suppkey"].to_numpy()
        wkbs = []
        for k in keys:
            k = int(k)
            s = 1 + k % 4
            ox, oy = float(k % 9), float(k % 11)
            w, h = 10.0 * s, 2.0 * s
            ring = [[ox, oy], [ox + w, oy], [ox + w, oy + h], [ox, oy + h], [ox, oy]]
            wkbs.append(wkb_codec.dumps(g.Polygon(ring)))
        return pa.Table.from_pydict(
            {"s_suppkey": pa.array(keys, pa.int64()), "geom_wkb": pa.array(wkbs, pa.binary())}
        )

    ds = _read(sf_dir, "supplier", columns=["s_suppkey"]).map_batches(
        rects, batch_format="pyarrow"
    )
    # stateless kernel → plain tasks on prestarted workers (an actor pool
    # here only added pool spin-up, which dominated the query at bench scale)
    ds = ds.map_batches(gb.centerline_batch, batch_format="pyarrow", batch_size=16)
    import pyarrow.compute as pc

    def digest(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "s_suppkey": batch["s_suppkey"],
                "centerline_len_c": pc.cast(
                    pc.round(pc.multiply(batch["centerline_len"], 100.0)), pa.int64()
                ),
            }
        )

    return ds.map_batches(digest, batch_format="pyarrow")


def q_buffer_by_m(sf_dir: str):
    """Variable-width buffer over M-annotated corpus lines.

    Driver corpus: straight horizontal segment (0,0)→(L,0) with constant
    M = m at both ends, so the buffer is exactly the Minkowski sum of the
    segment and the 32-gon point buffer: area = 16·m²·sin(π/16) + 2·m·L —
    a closed form DuckDB recomputes (oracle). The multi-vertex / tapered /
    negative-M richness is covered by the transcribed pytest corpus
    (tests/test_geom_core.py, reference _buffer_by_m.py semantics).
    """
    from pygeoops_ray.geo import geom as g
    from pygeoops_ray.geo import wkb as wkb_codec
    from pygeoops_ray.stages import geo_batch as gb

    def lines_with_m(batch: pa.Table) -> pa.Table:
        keys = batch["s_suppkey"].to_numpy()
        wkbs = []
        for k in keys:
            k = int(k)
            m = 1.0 + k % 4
            L = 10.0 + k % 7
            coords = [[0.0, 0.0, m], [L, 0.0, m]]
            wkbs.append(wkb_codec.dumps(g.LineString(coords)))
        return pa.Table.from_pydict(
            {"s_suppkey": pa.array(keys, pa.int64()), "geom_wkb": pa.array(wkbs, pa.binary())}
        )

    ds = _read(sf_dir, "supplier", columns=["s_suppkey"]).map_batches(
        lines_with_m, batch_format="pyarrow"
    )
    ds = ds.map_batches(gb.buffer_by_m_stage(quad_segs=8), batch_format="pyarrow")
    import pyarrow.compute as pc

    def digest(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "s_suppkey": batch["s_suppkey"],
                "buffer_area_c": pc.cast(
                    pc.floor(pc.multiply(batch["buffer_area"], 100.0)), pa.int64()
                ),
            }
        )

    return ds.map_batches(digest, batch_format="pyarrow")


def q_overlay_nary(sf_dir: str):
    """N-ary boolean overlays (union / difference / intersection) in single
    coverage-depth sweeps, over a closed-form rectangle corpus.

    Driver corpus: per supplier key k, three mutually-overlapping axis-
    aligned integer rectangles A, B, C (coincident edges occur for many k —
    the overlap-fold stress case). The engine runs union_all([A,B,C]),
    difference_all_fused(A, [B,C]) and intersection_all_fused([A], [B,C]) —
    each ONE martinez n-ary sweep — and digests the areas; the oracle
    recomputes them by inclusion-exclusion over the rect bounds (exact
    integer arithmetic in DuckDB). Irregular / holed / degenerate richness is
    covered by the pytest + fuzz corpora (tests/test_boolean_difference.py).
    Re-expresses the reference's shapely difference/union_all usage
    (pygeoops/_difference.py:169-181, _general.py:596) as driver-checked ops.
    """
    from pygeoops_ray.geo import boolean
    from pygeoops_ray.geo.geom import box

    def overlay(batch: pa.Table) -> pa.Table:
        keys = batch["s_suppkey"].to_numpy()
        ua, da, ia = [], [], []
        for k in keys:
            k = int(k)
            A = box(0, 0, 10 + k % 5, 8 + k % 3)
            B = box(4 + k % 3, 2 + k % 2, 13 + k % 3 + k % 4, 9 + 2 * (k % 2))
            C = box(2 + k % 2, 5 + k % 3, 10 + k % 2 + k % 5, 11 + k % 3 + k % 4)
            ua.append(int(round(boolean.union_all([A, B, C]).area * 100)))
            da.append(int(round(boolean.difference_all_fused(A, [B, C]).area * 100)))
            ia.append(
                int(round(boolean.intersection_all_fused([A], [B, C]).area * 100))
            )
        return pa.Table.from_pydict(
            {
                "s_suppkey": pa.array([int(k) for k in keys], pa.int64()),
                "union_area_c": pa.array(ua, pa.int64()),
                "diff_area_c": pa.array(da, pa.int64()),
                "isect_area_c": pa.array(ia, pa.int64()),
            }
        )

    return _read(sf_dir, "supplier", columns=["s_suppkey"]).map_batches(
        overlay, batch_format="pyarrow"
    )


def q_squarish_grid(sf_dir: str):
    """create_grid2's squarish row/col solver + tile materialization.

    Driver corpus: per supplier key k, bounds (0,0, 40+k%7*10, 30+k%5*10) and
    nb_squarish_tiles = 4+k%13. Emits the solved (nb_columns, nb_rows) and the
    ACTUAL tile count from create_grid2 (exercising grid_bounds' ceil loop —
    verified len == cols*rows on this corpus for 200k keys). The oracle
    replays the solver in SQL, emulating Python's round-half-even (DuckDB
    round() is half-away-from-zero; half cases occur, e.g. n/rows = 4.5).
    Re-expresses pygeoops/_grid.py:92-145 (create_grid2) as a driver-checked
    op; the nb_squarish_tiles_max shrink loop is pytest-gated.
    """
    from pygeoops_ray.geo.grid import create_grid2, squarish_grid_dims

    def solve(batch: pa.Table) -> pa.Table:
        keys = batch["s_suppkey"].to_numpy()
        cols_out, rows_out, n_out = [], [], []
        for k in keys:
            k = int(k)
            bounds = (0.0, 0.0, 40.0 + (k % 7) * 10, 30.0 + (k % 5) * 10)
            n = 4 + k % 13
            cols, rows = squarish_grid_dims(bounds, n)
            tiles = create_grid2(bounds, n)
            cols_out.append(cols)
            rows_out.append(rows)
            n_out.append(len(tiles))
        return pa.Table.from_pydict(
            {
                "s_suppkey": pa.array([int(k) for k in keys], pa.int64()),
                "nb_columns": pa.array(cols_out, pa.int64()),
                "nb_rows": pa.array(rows_out, pa.int64()),
                "n_tiles": pa.array(n_out, pa.int64()),
            }
        )

    return _read(sf_dir, "supplier", columns=["s_suppkey"]).map_batches(
        solve, batch_format="pyarrow"
    )


def q_make_valid_area(sf_dir: str):
    """make_valid over a self-crossing bowtie corpus, closed-form oracle.

    Per supplier key k, the hourglass ring (0,0)→(L,H)→(L,0)→(0,H) with
    L = 4+k%9, H = 2+k%5 self-crosses at (L/2, H/2); repair splits it into
    two point-touching triangles (a VALID MultiPolygon per OGC — parts may
    touch at finite points) of total area exactly L·H/2. Emits part count,
    in/out validity bits and the scaled area; the oracle recomputes all four
    from the corpus rule. Re-expresses pygeoops make_valid / shapely
    is_valid semantics (reference _general.py usage) as a driver-checked op.
    """
    from pygeoops_ray.geo import geom as g
    from pygeoops_ray.geo.validity import is_valid, make_valid

    def repair(batch: pa.Table) -> pa.Table:
        keys = batch["s_suppkey"].to_numpy()
        npart, vin, vout, area_c = [], [], [], []
        for k in keys:
            k = int(k)
            L = 4.0 + k % 9
            H = 2.0 + k % 5
            bow = g.Polygon([(0, 0), (L, H), (L, 0), (0, H), (0, 0)])
            v = make_valid(bow)
            parts = v.geoms if v.geom_type == "MultiPolygon" else [v]
            npart.append(len(parts))
            vin.append(int(is_valid(bow)))
            vout.append(int(is_valid(v)))
            area_c.append(int(round(sum(p.area for p in parts) * 100)))
        return pa.Table.from_pydict(
            {
                "s_suppkey": pa.array([int(k) for k in keys], pa.int64()),
                "n_parts": pa.array(npart, pa.int64()),
                "valid_in": pa.array(vin, pa.int64()),
                "valid_out": pa.array(vout, pa.int64()),
                "area_c": pa.array(area_c, pa.int64()),
            }
        )

    return _read(sf_dir, "supplier", columns=["s_suppkey"]).map_batches(
        repair, batch_format="pyarrow"
    )


def q_extend_line(sf_dir: str):
    """extend_line_by_distance over an L-bend corpus, closed-form oracle.

    Per supplier key k, polyline (0,0)→(L,0)→(L,L) with L = 5+k%6, start
    extension s = 1+k%3, end extension e = 1+k%4. The first segment points
    -x from the start and the last +y from the end, so the extended line is
    (-s,0)→(L,0)→(L,L+e): length 2L+s+e, start x = -s, end y = L+e — all
    integer closed forms. Re-expresses pygeoops extend_line_by_distance
    (reference _extend_line.py segment math) as a driver-checked op; the
    multi-segment / to-geometry richness is pytest-gated
    (tests/test_view_extend_tree.py).
    """
    from pygeoops_ray.geo import geom as g
    from pygeoops_ray.geo.extend_line import extend_line_by_distance

    def extend(batch: pa.Table) -> pa.Table:
        keys = batch["s_suppkey"].to_numpy()
        ln, sx, ey = [], [], []
        for k in keys:
            k = int(k)
            L = 5.0 + k % 6
            s = 1.0 + k % 3
            e = 1.0 + k % 4
            line = g.LineString([(0, 0), (L, 0), (L, L)])
            out = extend_line_by_distance(line, s, e)
            ln.append(int(round(out.length * 100)))
            sx.append(int(round(out.coords[0, 0] * 100)))
            ey.append(int(round(out.coords[-1, 1] * 100)))
        return pa.Table.from_pydict(
            {
                "s_suppkey": pa.array([int(k) for k in keys], pa.int64()),
                "length_c": pa.array(ln, pa.int64()),
                "start_x_c": pa.array(sx, pa.int64()),
                "end_y_c": pa.array(ey, pa.int64()),
            }
        )

    return _read(sf_dir, "supplier", columns=["s_suppkey"]).map_batches(
        extend, batch_format="pyarrow"
    )


def q_collect_explode(sf_dir: str):
    """collect → explode roundtrip per nation over customer points.

    Distributed shape: groupby(c_nationkey) → collect() the group's points
    into a MultiPoint → explode() back to parts (reference _general.py
    collect/explode semantics). Emits per-nation part count and the exact
    min/max part x (= custkey) so the oracle (plain SQL aggregates) value-
    checks that no part is lost or duplicated through the roundtrip.
    """
    import pandas as pd

    from pygeoops_ray.geo import geom as g
    from pygeoops_ray.geo.general import collect, explode

    def per_nation(df: pd.DataFrame) -> pd.DataFrame:
        pts = [
            g.Point(float(ck), float(nk))
            for ck, nk in zip(df["c_custkey"], df["c_nationkey"])
        ]
        coll = collect(pts)
        parts = explode(coll)
        parts = [parts] if isinstance(parts, g.Point) else list(parts)
        xs = [p.coords[0, 0] for p in parts]
        return pd.DataFrame(
            {
                "c_nationkey": [int(df["c_nationkey"].iloc[0])],
                "n_parts": [len(parts)],
                "min_x_c": [int(round(min(xs) * 100))],
                "max_x_c": [int(round(max(xs) * 100))],
            }
        )

    ds = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    return ds.groupby("c_nationkey").map_groups(per_nation, batch_format="pandas")


def q_difference_rects(sf_dir: str):
    """difference_all over a disjoint-subtrahend corpus, closed-form oracle.

    Per supplier key k, subject rect (0,0,20,10) minus m = 1+k%4 unit squares
    at (2i+1,1)-(2i+2,2) — strictly interior and pairwise disjoint, so the
    fused subject-minus-union sweep yields ONE polygon with exactly m holes
    and area 200-m. Re-expresses pygeoops difference_all (reference
    _difference.py:61 semantics) as a driver-checked op; overlapping /
    boundary-touching subtrahend richness is pytest-gated
    (tests/test_boolean_difference.py).
    """
    from pygeoops_ray.geo import geom as g
    from pygeoops_ray.geo.difference import difference_all

    def diff(batch: pa.Table) -> pa.Table:
        keys = batch["s_suppkey"].to_numpy()
        npoly, nhole, area_c = [], [], []
        for k in keys:
            k = int(k)
            m = 1 + k % 4
            subject = g.Polygon([(0, 0), (20, 0), (20, 10), (0, 10), (0, 0)])
            subs = [
                g.Polygon(
                    [
                        (2 * i + 1, 1),
                        (2 * i + 2, 1),
                        (2 * i + 2, 2),
                        (2 * i + 1, 2),
                        (2 * i + 1, 1),
                    ]
                )
                for i in range(m)
            ]
            d = difference_all(subject, subs)
            polys = d.geoms if d.geom_type == "MultiPolygon" else [d]
            npoly.append(len(polys))
            nhole.append(sum(len(p.holes) for p in polys))
            area_c.append(int(round(sum(p.area for p in polys) * 100)))
        return pa.Table.from_pydict(
            {
                "s_suppkey": pa.array([int(k) for k in keys], pa.int64()),
                "n_polys": pa.array(npoly, pa.int64()),
                "n_holes": pa.array(nhole, pa.int64()),
                "area_c": pa.array(area_c, pa.int64()),
            }
        )

    return _read(sf_dir, "supplier", columns=["s_suppkey"]).map_batches(
        diff, batch_format="pyarrow"
    )


def q_difference_tiled(sf_dir: str):
    """difference_all_tiled THROUGH the Ray stage (verdict r2 item 3):
    subjects explode via ``subdivide`` into grid parts, an ACTOR-POOL stage
    subtracts the shared broadcast subtrahend set (deserialized once per
    actor), and per-subject parts re-merge via groupby(id).map_groups union
    — no driver-side materialization (stages/geo_batch.py:
    distributed_difference_table; reference _difference.py:74-110).

    Corpus: per supplier k a boundary-densified 20 x (10 + k%4) rect (≈61-67
    coords, subdivide_coords=24 → ≥3 tiles each) minus four unit squares at
    (2i+1,1)-(2i+2,2), strictly interior to every subject → exactly one
    merged polygon, 4 holes, area 20h - 4.
    """
    from pygeoops_ray.geo import geom as g
    from pygeoops_ray.geo import wkb as geo_wkb
    from pygeoops_ray.stages.geo_batch import distributed_difference_table

    def build(batch: pa.Table) -> pa.Table:
        keys = batch["s_suppkey"].to_numpy()
        wkbs = []
        for k in keys:
            h = float(10 + int(k) % 4)
            bot = [(float(x), 0.0) for x in range(0, 20)]
            right = [(20.0, float(y)) for y in range(0, int(h))]
            top = [(float(x), h) for x in range(20, 0, -1)]
            left = [(0.0, float(y)) for y in range(int(h), 0, -1)]
            ring = bot + right + top + left + [(0.0, 0.0)]
            wkbs.append(geo_wkb.dumps(g.Polygon(ring)))
        return pa.Table.from_pydict(
            {
                "s_suppkey": pa.array([int(k) for k in keys], pa.int64()),
                "geom_wkb": pa.array(wkbs, pa.binary()),
            }
        )

    subs = [
        g.Polygon(
            [
                (2 * i + 1, 1),
                (2 * i + 2, 1),
                (2 * i + 2, 2),
                (2 * i + 1, 2),
                (2 * i + 1, 1),
            ]
        )
        for i in range(4)
    ]
    subjects = _read(sf_dir, "supplier", columns=["s_suppkey"]).map_batches(
        build, batch_format="pyarrow"
    )
    merged = distributed_difference_table(
        subjects, subs, subdivide_coords=24, id_col="s_suppkey",
        concurrency=(1, 4),
    )

    def summarize(batch: pa.Table) -> pa.Table:
        keys = batch["s_suppkey"].to_numpy()
        npoly, nhole, area_c = [], [], []
        for b in batch["diff_wkb"].to_pylist():
            d = geo_wkb.loads(b)
            polys = d.geoms if d.geom_type == "MultiPolygon" else [d]
            npoly.append(len(polys))
            nhole.append(sum(len(p.holes) for p in polys))
            area_c.append(int(round(sum(p.area for p in polys) * 100)))
        return pa.Table.from_pydict(
            {
                "s_suppkey": pa.array([int(k) for k in keys], pa.int64()),
                "n_polys": pa.array(npoly, pa.int64()),
                "n_holes": pa.array(nhole, pa.int64()),
                "area_c": pa.array(area_c, pa.int64()),
            }
        )

    return merged.map_batches(summarize, batch_format="pyarrow")


def q_inner_rings(sf_dir: str):
    """remove_inner_rings over a two-hole corpus, closed-form oracle.

    Per supplier key k, a 30x30 square with two 1-wide rectangular holes of
    areas a = 1+k%9 and b = 5+k%13; min_area_to_keep = 8 keeps a hole iff
    its area > 8 (reference drops area <= threshold, _general.py:506-537).
    Emits kept-hole count and the polygon area 900 - kept areas. The
    geodesic-CRS branch is pytest-gated (tests/test_general_ops.py).
    """
    from pygeoops_ray.geo import geom as g
    from pygeoops_ray.geo.general import remove_inner_rings

    def run(batch: pa.Table) -> pa.Table:
        keys = batch["s_suppkey"].to_numpy()
        nkept, area_c = [], []
        for k in keys:
            k = int(k)
            a = 1 + k % 9
            b = 5 + k % 13
            holes = [
                [(2, 2), (3, 2), (3, 2 + a), (2, 2 + a), (2, 2)],
                [(6, 2), (7, 2), (7, 2 + b), (6, 2 + b), (6, 2)],
            ]
            poly = g.Polygon([(0, 0), (30, 0), (30, 30), (0, 30), (0, 0)], holes)
            out = remove_inner_rings(poly, min_area_to_keep=8.0)
            nkept.append(len(out.holes))
            area_c.append(int(round(out.area * 100)))
        return pa.Table.from_pydict(
            {
                "s_suppkey": pa.array([int(k) for k in keys], pa.int64()),
                "n_holes_kept": pa.array(nkept, pa.int64()),
                "area_c": pa.array(area_c, pa.int64()),
            }
        )

    return _read(sf_dir, "supplier", columns=["s_suppkey"]).map_batches(
        run, batch_format="pyarrow"
    )


def q_geom_zoo(sf_dir: str):
    """GeometryCollection roundtrip: collect → extract → type ids → parts.

    Per supplier key k, a GeometryCollection of p = 1+k%3 points, l = k%2
    lines and q = 1+k%2 unit squares. Emits get_parts_recursive count
    (p+l+q), collection_extract(polygon) part count (q), the primitive type
    ids of the collection (0) and the extract (3), and the extracted area
    (q). Re-expresses reference _general.py collection_extract /
    get_primitivetype_id / get_parts semantics as one driver-checked op.
    """
    from pygeoops_ray.geo import geom as g
    from pygeoops_ray.geo.general import (
        collection_extract,
        get_parts_recursive,
        get_primitivetype_id,
    )

    def zoo(batch: pa.Table) -> pa.Table:
        keys = batch["s_suppkey"].to_numpy()
        nparts, npolys, pid_c, pid_e, area_c = [], [], [], [], []
        for k in keys:
            k = int(k)
            p = 1 + k % 3
            l = k % 2
            q = 1 + k % 2
            geoms = [g.Point(float(i), 0.0) for i in range(p)]
            geoms += [g.LineString([(0, i + 1), (1, i + 1)]) for i in range(l)]
            geoms += [
                g.Polygon(
                    [
                        (3 * i, 5),
                        (3 * i + 1, 5),
                        (3 * i + 1, 6),
                        (3 * i, 6),
                        (3 * i, 5),
                    ]
                )
                for i in range(q)
            ]
            coll = g.GeometryCollection(geoms)
            ext = collection_extract(coll, 3)
            npolys.append(len(ext.geoms) if ext.geom_type == "MultiPolygon" else 1)
            nparts.append(len(get_parts_recursive(coll)))
            pid_c.append(int(get_primitivetype_id(coll)))
            pid_e.append(int(get_primitivetype_id(ext)))
            area_c.append(int(round(ext.area * 100)))
        return pa.Table.from_pydict(
            {
                "s_suppkey": pa.array([int(k) for k in keys], pa.int64()),
                "n_parts": pa.array(nparts, pa.int64()),
                "n_polys": pa.array(npolys, pa.int64()),
                "ptype_coll": pa.array(pid_c, pa.int64()),
                "ptype_poly": pa.array(pid_e, pa.int64()),
                "poly_area_c": pa.array(area_c, pa.int64()),
            }
        )

    return _read(sf_dir, "supplier", columns=["s_suppkey"]).map_batches(
        zoo, batch_format="pyarrow"
    )


def q_subdivide_rect(sf_dir: str):
    """subdivide over a densified rectangle, closed-form oracle.

    Per supplier key k, a 12x8 rectangle densified at 0.25 steps (161
    coords) subdivided with num_coords_max = 40+(k%3)*10. The tile count is
    create_grid2's squarish solve of ceil(161/ncm) — 5→4, 4→4, 3→3 tiles,
    all non-empty — and the clip is along exact binary-fraction grid lines,
    so the part-area sum is exactly 96. Re-expresses reference subdivision
    before fan-out (_difference.py:71) as a driver-checked op.
    """
    from pygeoops_ray.geo import geom as g
    from pygeoops_ray.geo.general import subdivide

    step = 0.25
    xs = np.arange(0, 12 + step, step)
    ys = np.arange(0, 8 + step, step)
    coords = (
        [(float(x), 0.0) for x in xs]
        + [(12.0, float(y)) for y in ys[1:]]
        + [(float(x), 8.0) for x in xs[::-1][1:]]
        + [(0.0, float(y)) for y in ys[::-1][1:]]
    )

    def run(batch: pa.Table) -> pa.Table:
        keys = batch["s_suppkey"].to_numpy()
        nparts, area_c = [], []
        for k in keys:
            k = int(k)
            poly = g.Polygon(coords)
            parts = subdivide(poly, num_coords_max=40 + (k % 3) * 10)
            nparts.append(len(parts))
            area_c.append(int(round(sum(p.area for p in parts) * 100)))
        return pa.Table.from_pydict(
            {
                "s_suppkey": pa.array([int(k) for k in keys], pa.int64()),
                "n_parts": pa.array(nparts, pa.int64()),
                "area_c": pa.array(area_c, pa.int64()),
            }
        )

    return _read(sf_dir, "supplier", columns=["s_suppkey"]).map_batches(
        run, batch_format="pyarrow"
    )


def q_split_tiles(sf_dir: str):
    """split_tiles over a single-tile corpus, closed-form oracle.

    Per supplier key k, one (0,0,W,H) tile split toward wanted = 2+k%7
    tiles. The reference's per-tile loop (halve, or third when the remaining
    ratio rounds to 3) makes the part count a pure function of wanted:
    {2:2, 3:3, 4:4, 5:8, 6:6, 7:8, 8:8} — and split bounds telescope, so the
    area sum is exactly W*H. Re-expresses pygeoops split_tiles
    (reference _grid.py per-tile ratio loop) as a driver-checked op; the
    attribute-passthrough richness is pytest-gated (tests/test_grid.py).
    """
    from pygeoops_ray.geo import geom as g
    from pygeoops_ray.geo.grid import split_tiles

    def run(batch: pa.Table) -> pa.Table:
        keys = batch["s_suppkey"].to_numpy()
        nparts, area_c = [], []
        for k in keys:
            k = int(k)
            W = 40.0 + (k % 4) * 10
            H = 30.0 + (k % 3) * 10
            tile = g.Polygon([(0, 0), (W, 0), (W, H), (0, H), (0, 0)])
            parts = split_tiles([tile], 2 + k % 7)
            nparts.append(len(parts))
            area_c.append(int(round(sum(p.area for p in parts) * 100)))
        return pa.Table.from_pydict(
            {
                "s_suppkey": pa.array([int(k) for k in keys], pa.int64()),
                "n_tiles": pa.array(nparts, pa.int64()),
                "area_c": pa.array(area_c, pa.int64()),
            }
        )

    return _read(sf_dir, "supplier", columns=["s_suppkey"]).map_batches(
        run, batch_format="pyarrow"
    )


def q_view_angles(sf_dir: str):
    """View angles of corpus segments seen from the origin.

    Both endpoints are strictly inside quadrant I (x>=1, y>=1), so the angular
    interval is simply (min, max) of the endpoint atan2 angles — which DuckDB
    recomputes exactly with degrees(atan2(...)). Emitted as a floor-scaled
    integer digest (x1e7) so the comparison is integer-exact.
    """
    from pygeoops_ray.geo import geom as g
    from pygeoops_ray.geo import wkb as wkb_codec
    from pygeoops_ray.stages import geo_batch as gb

    def viewrows(batch: pa.Table) -> pa.Table:
        keys = batch["s_suppkey"].to_numpy()
        wkbs, vx, vy = [], [], []
        for k in keys:
            k = int(k)
            x1, y1 = 1.0 + k % 7, 1.0 + k % 5
            wkbs.append(wkb_codec.dumps(g.LineString([[x1, y1], [x1 + 2, y1 + 3]])))
            vx.append(0.0)
            vy.append(0.0)
        return pa.Table.from_pydict(
            {
                "s_suppkey": pa.array(keys, pa.int64()),
                "vx": pa.array(vx),
                "vy": pa.array(vy),
                "geom_wkb": pa.array(wkbs, pa.binary()),
            }
        )

    ds = _read(sf_dir, "supplier", columns=["s_suppkey"]).map_batches(
        viewrows, batch_format="pyarrow"
    )
    ds = ds.map_batches(gb.view_angles_stage, batch_format="pyarrow")

    import pyarrow.compute as pc

    def digest(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "s_suppkey": batch["s_suppkey"],
                "start_c": pc.cast(
                    pc.floor(pc.multiply(batch["start_angle"], 1e7)), pa.int64()
                ),
                "end_c": pc.cast(
                    pc.floor(pc.multiply(batch["end_angle"], 1e7)), pa.int64()
                ),
            }
        )

    return ds.map_batches(digest, batch_format="pyarrow")


def q_topo_simplify(sf_dir: str):
    """Grouped topology-preserving simplify with a closed-form oracle.

    Corpus rule: supplier k is cell c = k%8 of topology group g = k//8 — a
    row of 8 adjacent W x 8 rectangles (W = 16 + g%5*8) densified to unit
    spacing, sharing their vertical borders; groups are spatially disjoint
    (y offset 40g). Shared-arc RDP at tol 0.5 reduces every straight arc to
    its junction endpoints, so each reconstructed ring is exactly the 4
    corners (+ closure) with area preserved: n_pts_in = 2(W+8)+1,
    n_pts_out = 5, area = 8W — pure arithmetic for the oracle. Shared-border
    IDENTITY (the topological property counts can't see) is pytest-gated on
    the irregular corpus."""
    from pygeoops_ray.geo import geom as g
    from pygeoops_ray.geo import wkb as wkb_codec
    from pygeoops_ray.stages import geo_batch as gb

    def tiled_cells(batch: pa.Table) -> pa.Table:
        keys = batch["s_suppkey"].to_numpy()
        wkbs, cells = [], []
        for k in keys:
            k = int(k)
            grp, c = k // 8, k % 8
            W, H = 16 + (grp % 5) * 8, 8
            ox, oy = float(c * W), float(grp * 40)
            pts = (
                [(ox + float(i), oy) for i in range(W)]
                + [(ox + W, oy + float(j)) for j in range(H)]
                + [(ox + float(i), oy + H) for i in range(W, 0, -1)]
                + [(ox, oy + float(j)) for j in range(H, 0, -1)]
                + [(ox, oy)]
            )
            wkbs.append(wkb_codec.dumps(g.Polygon([list(p) for p in pts])))
            cells.append(grp)
        return pa.Table.from_pydict(
            {
                "s_suppkey": pa.array(keys, pa.int64()),
                "geom_wkb": pa.array(wkbs, pa.binary()),
                "cell_id": pa.array(cells, pa.int64()),
            }
        )

    ds = _read(sf_dir, "supplier", columns=["s_suppkey"]).map_batches(
        tiled_cells, batch_format="pyarrow"
    )
    out = gb.topo_simplify_grouped(ds, tolerance=0.5, algorithm="rdp")

    def digest(batch: pa.Table) -> pa.Table:
        n, areas = [], []
        for b in batch["geom_wkb"].to_pylist():
            geom = wkb_codec.loads(b) if b is not None else None
            n.append(geom.num_coordinates if geom is not None else 0)
            areas.append(int(np.round(geom.area * 100)) if geom is not None else 0)
        return pa.Table.from_pydict(
            {
                "s_suppkey": batch["s_suppkey"],
                "n_pts_out": pa.array(n, pa.int64()),
                "area_c": pa.array(areas, pa.int64()),
            }
        )

    return out.map_batches(digest, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# image table ops (synthetic Lance-schema table; rows-only — pixels are not
# visible to SQL; invariants are pytest-gated)
# ---------------------------------------------------------------------------


def _image_ds(sf_dir: str):
    import pyarrow.parquet as pq

    from pygeoops_ray.pipelines.flagship import image_table_ds

    n = pq.read_metadata(f"{sf_dir}/part.parquet").num_rows
    return image_table_ds(max(n, 1000)), max(n, 1000)


def q_phash_dedup(sf_dir: str):
    """Two-tier image dedup: phash candidate key + exact quantized-pixel verify.

    phash alone is a coarse 64-bit candidate key with real collisions on this
    corpus (measured: 51 cross-pattern collisions at n=10k), so the keeper key
    is (phash_q, qdigest): phash_q is the perceptual hash of the DEQUANTIZED
    pixels (codec-invariant — the stored phash is computed over each row's
    own lossy decode and can split a true duplicate across buckets, observed
    2/198 pairs at n=20k) and qdigest is the md5 of the quantized pixels —
    the standard near-dup shape (candidate bucket → exact verify). Oracle:
    the generator's duplicate-injection rule (ordinal i with i%101==0, i>0
    reuses i-1's pixels — table/images.py:189), verified equivalent to the
    content-derived dedup at n=2k and n=20k.
    """
    import pyarrow.compute as pc

    from pygeoops_ray.stages.multimodal import quantized_digest_batch

    ds, n = _image_ds(sf_dir)
    ds = ds.select_columns(["image_id", "bytes", "fmt"])
    ds = ds.map_batches(quantized_digest_batch, batch_format="pyarrow", batch_size=1024)

    def to_ordinal(batch: pa.Table) -> pa.Table:
        i = pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 4, 32), pa.int64())
        return pa.Table.from_pydict(
            {"i": i, "phash": batch["phash_q"], "qdigest": batch["qdigest"]}
        )

    ds = ds.map_batches(to_ordinal, batch_format="pyarrow")
    return dedup_stages.exact_dedup_min(
        ds, ["phash", "qdigest"], "i", n_rows_hint=_table_rows(sf_dir, "part") * 10
    ).select_columns(["i"])


def q_phash_near_dup(sf_dir: str):
    """Near-duplicate IMAGE pairs by perceptual-hash hamming distance ≤ 3.

    The image-payload analogue of simhash_pairs: decode → integer-exact
    block-mean hash (table/images.int_mean_hash — cross-multiplied
    "block mean > image mean", no float ops, so DuckDB re-derives every hash
    from the generator rule) → generic banded ``hamming_pairs`` (K+1 bands;
    pigeonhole gives 100% recall) → exact popcount verify in-bucket. Oracle
    is the full all-pairs bit_count(xor(...)) ≤ K SQL over the SQL-derived
    hashes. At n=2k: 24 hamming-0 pairs (codec-invariant: a raw0 source and
    its qz1 duplicate hash identically) + 111 genuine near-misses.
    """
    import pyarrow.compute as pc

    from pygeoops_ray.stages.multimodal import int_hash_batch

    ds, n = _image_ds(sf_dir)
    ds = ds.select_columns(["image_id", "bytes", "fmt"])
    ds = ds.map_batches(int_hash_batch, batch_format="pyarrow", batch_size=1024)

    def to_ordinal(batch: pa.Table) -> pa.Table:
        i = pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 4, 32), pa.int64())
        return pa.Table.from_pydict({"i": i, "ihash": batch["ihash"]})

    ds = ds.map_batches(to_ordinal, batch_format="pyarrow")
    return dedup_stages.hamming_pairs(
        ds,
        id_col="i",
        hash_col="ihash",
        max_hamming=3,
        n_rows_hint=n,
        out_a="i_a",
        out_b="i_b",
    )


def q_image_pyramid(sf_dir: str):
    """Raster tile pyramid over the image table: 2 levels of iterated 2x2
    integer box-mean downsampling (stages/multimodal.pyramid_batch), one row
    per (image, level) with exact integer pixel digests. The oracle replays
    decode AND both floor-division levels from the generator rule in SQL;
    ``pyramid_ok`` binds the engine-codec re-encode roundtrip in-run.
    """
    import pyarrow.compute as pc

    from pygeoops_ray.stages.multimodal import pyramid_batch

    ds, _ = _image_ds(sf_dir)
    ds = ds.select_columns(["image_id", "bytes", "fmt"])
    ds = ds.map_batches(pyramid_batch, batch_format="pyarrow", batch_size=1024)

    def finish(batch: pa.Table) -> pa.Table:
        i = pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 4, 32), pa.int64())
        return pa.Table.from_pydict(
            {
                "i": i,
                "level": batch["level"],
                "w": batch["w"],
                "h": batch["h"],
                "sum_rgb": batch["sum_rgb"],
                "sum_sq": batch["sum_sq"],
                "pyramid_ok": batch["pyramid_ok"],
            }
        )

    return ds.map_batches(finish, batch_format="pyarrow")


def q_zonal_stats(sf_dir: str):
    """Zonal statistics: per 100-unit world zone, the integer sum of decoded
    pixel gray values and pixel count over ALL images touching the zone —
    the classic raster↔vector aggregate, over real decoded pixels.

    The zone grid is deliberately NOT aligned to the 256-unit image grid, so
    footprints straddle zone boundaries and the per-image reduceat split is
    exercised (stages/multimodal.zonal_partial_batch). Only <=4 partial rows
    per image shuffle; the oracle replays decode + the zone assignment
    arithmetic per pixel in SQL.
    """
    from pygeoops_ray.stages.groupagg import grouped_agg
    from pygeoops_ray.stages.multimodal import zonal_partial_batch
    from pygeoops_ray.table.images import footprint_of_ordinal

    import pyarrow.compute as pc

    ds, n = _image_ds(sf_dir)
    ds = ds.select_columns(["image_id", "bytes", "fmt"])

    def add_origin(batch: pa.Table) -> pa.Table:
        i = pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 4, 32), pa.int64())
        minx, miny, _, _ = footprint_of_ordinal(
            i.to_numpy(), np.zeros(len(batch)), np.zeros(len(batch))
        )
        out = batch.append_column("minx", pa.array(minx))
        return out.append_column("miny", pa.array(miny))

    partials = ds.map_batches(add_origin, batch_format="pyarrow").map_batches(
        zonal_partial_batch, batch_format="pyarrow", batch_size=1024
    )
    return grouped_agg(
        partials,
        ["zone_x", "zone_y"],
        [("sum_gray", "sum", "sum_gray"), ("n_px", "sum", "n_px")],
        n_rows_hint=n * 4,
    )


class _FeatureDigestStage:
    """Actor-pool stage: run the real FeatureStage kernel AND an integer
    pixel digest from one decode, binding the float features to the exact
    integer ground truth.

    The float feature vector (channel means/stds + 4x4 gray grid) has no
    bit-reproducible SQL form (pairwise float summation), but the DECODED
    PIXELS do: every digest below is an exact integer DuckDB can recompute
    from the generator rule, so the oracle value-checks decode + the pixel
    pipeline end-to-end. ``features_ok`` then asserts in-run that the float
    features agree with the integer sums (1e-4, >> float32 rounding), so a
    feature-kernel regression flips the driver hash red — same weak-oracle
    pattern as the ANN recall contract.

      sum_rgb   = sum over pixels/channels of decoded value
      sum_sq    = sum of squared decoded values (binds the stds)
      cell_wsum = sum of (cell_index+1) * (r+g+b) per pixel, where
                  cell_index = iy*4+ix of the 4x4 feature grid — weights make
                  every cell's contribution distinguishable (binds the grid)
    """

    def __init__(self, grid: int = 4):
        from pygeoops_ray.stages.multimodal import FeatureStage

        self.fs = FeatureStage(grid=grid)
        self.grid = grid

    def __call__(self, batch: pa.Table) -> pa.Table:
        from pygeoops_ray.stages.multimodal import decode_any

        g = self.grid
        out = {"image_id": batch["image_id"].to_pylist()}
        srgb, ssq, cws, fok = [], [], [], []
        for data, fmt in zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist()):
            pix = decode_any(data, fmt)
            h, w, _ = pix.shape
            d = pix.astype(np.int64)
            ch_sum = d.sum(axis=(0, 1))  # (3,)
            ch_sq = (d * d).sum(axis=(0, 1))
            rgb = d.sum(axis=2)  # (h, w)
            wy = (4 * np.arange(h) + 3) // h
            wx = (4 * np.arange(w) + 3) // w
            weight = wy[:, None] * g + wx[None, :] + 1
            srgb.append(int(ch_sum.sum()))
            ssq.append(int(ch_sq.sum()))
            cws.append(int((weight * rgb).sum()))
            # bind the float features to the integer truth
            f = self.fs.features(pix).astype(np.float64)
            n_px = h * w
            ok = True
            for c in range(3):
                mean_c = ch_sum[c] / n_px
                ok &= abs(f[c] - mean_c / 255.0) < 1e-4
                var_c = ch_sq[c] / n_px - mean_c * mean_c
                ok &= abs(f[3 + c] - np.sqrt(max(var_c, 0.0)) / 255.0) < 1e-4
            ys = (np.arange(g + 1) * h) // g
            xs = (np.arange(g + 1) * w) // g
            for i in range(g):
                for j in range(g):
                    cell = rgb[ys[i] : ys[i + 1], xs[j] : xs[j + 1]]
                    want = cell.sum() / (3.0 * cell.size * 255.0)
                    ok &= abs(f[6 + i * g + j] - want) < 1e-4
            fok.append(int(ok))
        out["sum_rgb"] = pa.array(srgb, pa.int64())
        out["sum_sq"] = pa.array(ssq, pa.int64())
        out["cell_wsum"] = pa.array(cws, pa.int64())
        out["features_ok"] = pa.array(fok, pa.int64())
        return pa.Table.from_pydict(out)


def q_image_features(sf_dir: str):
    """Feature extraction over the image table (actor-pool multimodal stage).

    Emits exact integer pixel digests (SQL-recomputable from the generator
    rule — the oracle value-checks decode end-to-end) plus a features_ok
    contract bit binding the float feature vector to them; see
    _FeatureDigestStage.
    """
    ds, n = _image_ds(sf_dir)
    return ds.map_batches(
        _FeatureDigestStage, batch_format="pyarrow", concurrency=2, batch_size=1024
    )


def q_quarantine_decode(sf_dir: str):
    """Dead-letter quarantine: corrupted rows split out in ONE pass.

    Every ordinal with ``i % 97 == 0`` gets its byte payload truncated
    (deterministic corruption); DecodeValidate flags them (decode raises →
    decode_ok=False, "quarantine, not crash"); stages/quarantine.py appends
    the failing rows to a side parquet sink from inside the map task while
    good rows flow on — the upstream never executes twice. The summary binds
    BOTH paths to the oracle: n_ok counts the surviving stream, n_quarantined
    and sum_quarantined count the dead-letter sink read back (deduped by
    image_id — task retries make the sink at-least-once).
    """
    import hashlib
    import os
    import shutil

    import pyarrow.compute as pc

    from pygeoops_ray.pipelines.flagship import DecodeValidate
    from pygeoops_ray.stages.quarantine import quarantine_by_flag, read_quarantine

    ds, n = _image_ds(sf_dir)
    key = hashlib.md5(f"{os.path.abspath(sf_dir)}:{n}".encode()).hexdigest()[:10]
    qdir = f"/tmp/pygeoops_ray_cache/quarantine_{key}"
    # the sink accumulates across runs by design (at-least-once + keyed dedup
    # absorbs that for the SAME corpus); a fresh dir keeps the demo tight
    shutil.rmtree(qdir, ignore_errors=True)

    def corrupt(batch: pa.Table) -> pa.Table:
        i = pc.cast(
            pc.utf8_slice_codeunits(batch["image_id"], 4, 32), pa.int64()
        ).to_numpy()
        data = batch["bytes"].to_pylist()
        out = [
            d[: len(d) // 2] if int(o) % 97 == 0 else d for o, d in zip(i, data)
        ]
        return batch.set_column(
            batch.schema.get_field_index("bytes"), "bytes", pa.array(out, pa.binary())
        )

    validated = ds.map_batches(corrupt, batch_format="pyarrow").map_batches(
        DecodeValidate(), batch_format="pyarrow", batch_size=256
    )
    good = quarantine_by_flag(validated, "decode_ok", qdir)
    n_ok = good.count()

    quar = read_quarantine(qdir, "image_id")

    def ords(batch: pa.Table) -> pa.Table:
        i = pc.cast(
            pc.utf8_slice_codeunits(batch["image_id"], 4, 32), pa.int64()
        ).to_numpy()
        return pa.Table.from_pydict({"i": pa.array(i, pa.int64())})

    qi = quar.map_batches(ords, batch_format="pyarrow").to_pandas()["i"].to_numpy()
    return pa.Table.from_pydict(
        {
            "n_total": pa.array([n], pa.int64()),
            "n_ok": pa.array([int(n_ok)], pa.int64()),
            "n_quarantined": pa.array([len(qi)], pa.int64()),
            "sum_quarantined": pa.array([int(qi.sum())], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# relational core (groupby / join / window engine capabilities)
# ---------------------------------------------------------------------------


def q_table_profile(sf_dir: str):
    """Distributed data profiling of lineitem's numeric columns.

    count / nulls / min / max move as one partial row per (block, column);
    EXACT n_distinct runs per-block unique → distinct-(column, value) dedup →
    per-column count, so shuffle volume is the distinct-value count, never
    the raw rows (stages/profile.py). The profile is the first job any
    pipeline runs against an unknown 100-TB table.
    """
    from pygeoops_ray.stages.profile import profile_numeric

    cols = ["l_discount", "l_extendedprice", "l_orderkey", "l_quantity"]
    ds = _read_blocked(sf_dir, "lineitem", columns=cols)
    return profile_numeric(ds, cols, n_rows_hint=_table_rows(sf_dir, "lineitem"))


def q_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped grouped aggregate over lineitem.

    Per-batch pandas combiner (whole-block) then one tiny final reduce: only
    ≤6 partial rows per block move, so the shape is shuffle-free — measured
    ~1.6x faster than Ray's native sort-based aggregate on the same input
    with identical output. Integer-scaled measures: float sums are
    order-dependent across engines; int64 sums are exact and floor(x*scale)
    is bitwise reproducible for identical double inputs.
    """
    import pandas as pd

    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        qty = np.floor(batch["l_quantity"].to_numpy() * 100.0).astype(np.int64)
        base = np.floor(batch["l_extendedprice"].to_numpy() * 100.0).astype(np.int64)
        rev = np.floor(
            batch["l_extendedprice"].to_numpy() * (1.0 - batch["l_discount"].to_numpy()) * 1e6
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_pandas(),
                "l_linestatus": batch["l_linestatus"].to_pandas(),
                "sum_qty_c": qty,
                "sum_base_c": base,
                "sum_rev_u": rev,
            }
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False, as_index=False)
        out = g.agg(
            sum_qty_c=("sum_qty_c", "sum"),
            sum_base_c=("sum_base_c", "sum"),
            sum_rev_u=("sum_rev_u", "sum"),
        )
        out["count_order"] = g.size()["size"].to_numpy()
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False, as_index=False)
        return g.agg(
            sum_qty_c=("sum_qty_c", "sum"),
            sum_base_c=("sum_base_c", "sum"),
            sum_rev_u=("sum_rev_u", "sum"),
            count_order=("count_order", "sum"),
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return parts.repartition(1, shuffle=False).map_batches(
        final, batch_format="pandas", batch_size=None
    )


def q_events_window(sf_dir: str):
    """Tumbling 1-hour windows per event_type: count + sum(value)."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def bucket(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        hour = ts // 3_600_000_000
        value_c = np.floor(batch["value"].to_numpy() * 100.0).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "event_type": batch["event_type"],
                "hour_bucket": pa.array(hour, pa.int64()),
                "value_c": pa.array(value_c, pa.int64()),
            }
        )

    # hour buckets scale with the data's time span → high-cardinality keys
    # take the coarse-bucket vectorized path (stages/groupagg.py)
    from pygeoops_ray.stages.groupagg import grouped_agg

    return grouped_agg(
        ds.map_batches(bucket, batch_format="pyarrow"),
        ["event_type", "hour_bucket"],
        [("value_c", "size", "n"), ("value_c", "sum", "sum_value_c")],
    )


def q_hopping_window(sf_dir: str):
    """Hopping (sliding) window aggregate: 1-hour windows every 30 minutes.

    The streaming-window shape Ray Data lacks natively: each event belongs
    to size/hop = 2 overlapping windows, so a flat-map assigns every row to
    both window starts (vectorized repeat inside map_batches) and the
    aggregate is the same scalable coarse-bucket combiner as the tumbling
    case. Oracle: the window duplication is a UNION ALL of the two hop
    offsets in SQL.
    """
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    hop = 1_800_000_000  # 30 min in us
    size = 3_600_000_000  # 1 h

    def expand(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        value_c = np.floor(batch["value"].to_numpy() * 100.0).astype(np.int64)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        # windows covering t: starts floor(t/hop)*hop and that minus hop
        # (size/hop == 2); all starts are valid windows (t < start+size)
        w1 = (ts // hop) * hop
        w0 = w1 - hop
        starts = np.concatenate([w0, w1])
        return pa.Table.from_pydict(
            {
                "event_type": pa.array(np.concatenate([et, et]), pa.string()),
                "wnd_start_us": pa.array(starts, pa.int64()),
                "value_c": pa.array(np.concatenate([value_c, value_c]), pa.int64()),
            }
        )

    from pygeoops_ray.stages.groupagg import grouped_agg

    return grouped_agg(
        ds.map_batches(expand, batch_format="pyarrow"),
        ["event_type", "wnd_start_us"],
        [("value_c", "size", "n"), ("value_c", "sum", "sum_value_c")],
    )


def _events_bucket_count(sf_dir: str, target_rows: int = 100_000, floor: int = 64) -> int:
    """Shuffle-bucket count sized to the input: ~target_rows rows per group.

    A fixed modulus means group size grows linearly with data (the round-1
    scale bug); deriving it from the parquet row count keeps every
    map_groups frame bounded at any scale. Parquet metadata only — no read.
    """
    n = _table_rows(sf_dir, "events")
    return max(floor, n // target_rows + 1)


def q_sessionize(sf_dir: str):
    """Session windows per user: a >30-minute gap starts a new session.

    Stream-shaped operator (ray_guide pattern): partition by key, sort by ts
    within the group, sessionize with vectorized gap detection. The oracle is
    the classic SQL lag/cumsum sessionization. Buckets partition USERS (a
    user's history must be group-local); the bucket count scales with input
    size so per-group frames stay bounded.
    """
    import pandas as pd

    ds = _read_blocked(sf_dir, "events", columns=["user_id", "ts", "event_id"])
    n_buckets = _events_bucket_count(sf_dir)

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bucket", pa.array(batch["user_id"].to_numpy() % n_buckets, pa.int64())
        )

    def sessionize(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["user_id", "ts", "event_id"])
        ts = group["ts"].astype("int64")  # microseconds
        gap = ts.diff().fillna(10**15)
        user_change = group["user_id"].ne(group["user_id"].shift())
        new_session = ((gap > 1_800_000_000) | user_change).astype("int64")
        # per-user cumulative session counter: global cumsum minus the value
        # at each user's first row
        cum = new_session.cumsum()
        first_of_user = cum.where(user_change).ffill() - 1
        group = group.copy()
        group["session_seq"] = (cum - first_of_user).astype("int64")
        # each user lives wholly in this bucket → the per-session aggregate is
        # final here; a Ray-level groupby over ~1 group/session would pay
        # per-group overhead for nothing
        out = group.groupby(["user_id", "session_seq"], as_index=False).agg(
            n_events=("event_id", "size"), first_event=("event_id", "min")
        )
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sessionize, batch_format="pandas")
    )


def q_asof_join(sf_dir: str):
    """As-of join: each purchase matched to the user's latest strictly-prior
    click (-1 when none — NULL-free so both sides hash as plain int64).
    Bucketed co-partition on user (users are bucket-local, bucket count scales
    with input), single vectorized pass per group: lexsort on
    (user, ts, kind, event_id) + maximum.accumulate of click positions — no
    per-user Python loop. Oracle: DuckDB's native ASOF JOIN.
    """
    import pandas as pd

    ds = _read_blocked(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])
    n_buckets = _events_bucket_count(sf_dir)

    import pyarrow.compute as pc

    def add_bucket(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["event_type"], value_set=pa.array(["purchase", "click"]))
        batch = batch.filter(keep)
        return batch.append_column(
            "bucket", pa.array(batch["user_id"].to_numpy() % n_buckets, pa.int64())
        )

    def asof(group: pd.DataFrame) -> pd.DataFrame:
        user = group["user_id"].to_numpy()
        ts = group["ts"].astype("int64").to_numpy()
        eid = group["event_id"].to_numpy().astype(np.int64)
        is_click = (group["event_type"] == "click").to_numpy()
        # strictly-prior semantics: at equal (user, ts) a purchase sorts
        # BEFORE a click so the same-timestamp click never matches; among
        # equal-ts clicks the larger event_id sorts later and wins the
        # accumulate (same tie-break as ORDER BY ts, event_id rightmost)
        order = np.lexsort((eid, is_click.astype(np.int8), ts, user))
        user, eid, is_click = user[order], eid[order], is_click[order]
        pos = np.arange(len(user))
        last_click = np.maximum.accumulate(np.where(is_click, pos, -1))
        new_user = np.empty(len(user), dtype=bool)
        if len(user):
            new_user[0] = True
            new_user[1:] = user[1:] != user[:-1]
        seg_start = pos[new_user][np.cumsum(new_user) - 1] if len(user) else pos
        valid = last_click >= seg_start  # the click belongs to this user's run
        purch = ~is_click
        cid = np.where(valid, eid[np.clip(last_click, 0, None)], -1)
        return pd.DataFrame(
            {
                "purchase_id": eid[purch],
                "click_id": cid[purch].astype(np.int64),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(asof, batch_format="pandas")
    )


def q_range_join(sf_dir: str):
    """Range (interval) join: every (click, purchase) pair of the same user
    with the purchase in ``(click.ts, click.ts + 6h]`` — the 1:N band-join
    sibling of the 1:1 as-of join.

    Distributed shape: bucketed co-partition on user (bucket count scales
    with input size), then ONE vectorized pass per group — both sides sorted
    by a dense (user, ts) composite key and each click's matching purchase
    run found with two ``np.searchsorted`` calls; pairs expand via
    repeat/arange, never a Python loop. A hot user's output is bounded by
    the window width, so the band join is skew-tolerant by construction.
    Oracle: the literal SQL inequality join.
    """
    import pandas as pd

    window_us = 6 * 3_600_000_000  # 6 hours in microseconds

    ds = _read_blocked(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])
    n_buckets = _events_bucket_count(sf_dir)

    import pyarrow.compute as pc

    def add_bucket(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["event_type"], value_set=pa.array(["purchase", "click"]))
        batch = batch.filter(keep)
        return batch.append_column(
            "bucket", pa.array(batch["user_id"].to_numpy() % n_buckets, pa.int64())
        )

    def band_join(group: pd.DataFrame) -> pd.DataFrame:
        user = group["user_id"].to_numpy()
        ts = group["ts"].astype("int64").to_numpy()
        eid = group["event_id"].to_numpy().astype(np.int64)
        is_click = (group["event_type"] == "click").to_numpy()
        if not len(user):
            return pd.DataFrame({"click_id": np.array([], np.int64), "purchase_id": np.array([], np.int64)})
        # dense user index × span-composite key: SPAN exceeds the group's ts
        # range + window so (u, ts) ordering is preserved and the window
        # offset can never cross a user boundary
        _, uidx = np.unique(user, return_inverse=True)
        t0 = ts.min()
        span = np.int64(ts.max() - t0 + window_us + 2)
        key = uidx.astype(np.int64) * span + (ts - t0)
        ck, pk = key[is_click], key[~is_click]
        c_eid, p_eid = eid[is_click], eid[~is_click]
        order = np.argsort(pk, kind="stable")
        pk, p_eid = pk[order], p_eid[order]
        lo = np.searchsorted(pk, ck, side="right")  # strictly after the click
        hi = np.searchsorted(pk, ck + window_us, side="right")  # inclusive end
        counts = hi - lo
        total = int(counts.sum())
        out_click = np.repeat(c_eid, counts)
        starts = np.repeat(counts.cumsum() - counts, counts)
        p_pos = np.arange(total) - starts + np.repeat(lo, counts)
        return pd.DataFrame(
            {"click_id": out_click, "purchase_id": p_eid[p_pos]}
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(band_join, batch_format="pandas")
    )


def q_top_orders(sf_dir: str):
    """Top 10 orders by totalprice with customer names — top-k pushed BELOW
    the join.

    The naive join-then-sort shape shuffles every order row twice (hash join
    + range sort) to keep 10 of them. Here each block keeps its local top-10
    (map_batches partial, ≤10 rows leave any block), a single tiny sort+limit
    picks the global winners, and only the 10 winning custkeys touch the
    customer table (vectorized isin filter — a column-pruned scan, no
    shuffle). The final 10×10 merge is driver-side pandas, which is the
    legitimate small-result endpoint.
    """
    orders = _read_blocked(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def partial_top(batch: pa.Table) -> pa.Table:
        price = batch["o_totalprice"].to_numpy()
        okey = batch["o_orderkey"].to_numpy()
        # lexicographic (price DESC, orderkey ASC): primary key last in lexsort
        order = np.lexsort((okey, -price))[:10]
        return batch.take(pa.array(order, pa.int64()))

    top = (
        orders.map_batches(partial_top, batch_format="pyarrow")
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(10)
        .to_pandas()
    )
    keys = set(top["o_custkey"].tolist())

    def cust_filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(batch["c_custkey"], value_set=pa.array(sorted(keys), pa.int64()))
        return batch.filter(mask)

    cust = (
        _read_blocked(sf_dir, "customer", columns=["c_custkey", "c_name"])
        .map_batches(cust_filter, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    out = top.merge(cust, left_on="o_custkey", right_on="c_custkey", how="inner")
    out = out.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
    return out[["o_orderkey", "c_name", "o_totalprice"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# audio / video multimodal ops (engine-owned codecs; generator rules are pure
# integer arithmetic so the oracle re-derives every sample/pixel in SQL)
# ---------------------------------------------------------------------------


def _audio_ds(sf_dir: str):
    """Synthetic clip table sized off documents; streams from an ordinal range
    (generation is a pure function of the ordinal — no driver materialization)."""
    from pygeoops_ray.table.audio import generate_audio_for_ordinals

    n = max(_table_rows(sf_dir, "documents"), 500)

    def gen(batch: pa.Table) -> pa.Table:
        return generate_audio_for_ordinals(batch["id"].to_numpy())

    return rd.range(n).map_batches(gen, batch_format="pyarrow", batch_size=256)


def q_audio_features(sf_dir: str):
    """Audio decode + exact integer feature extraction (actor-pool stage).

    Engine pa8/paz1 PCM codecs (table/audio.py); features n_samples/sum_abs/
    energy/max_abs/zero_crossings are exact int64, so the oracle value-checks
    decode + the feature kernel end-to-end by re-deriving every sample from
    the generator rule in SQL.
    """
    from pygeoops_ray.stages.multimodal import AudioFeatureStage

    # stateless kernel → instance form (elastic task pool): passing the CLASS
    # would make a fixed actor pool that the fused generator stage serializes
    # behind (measured 2-actor bottleneck on the video path)
    return _audio_ds(sf_dir).map_batches(
        AudioFeatureStage(), batch_format="pyarrow", batch_size=256
    )


def q_audio_resample(sf_dir: str):
    """Resample every clip to 4 kHz (nearest-sample, integer index math) and
    re-extract features — verifies the resample op's exact output contract."""
    from pygeoops_ray.stages.multimodal import AudioFeatureStage, AudioResampleStage

    ds = _audio_ds(sf_dir).map_batches(
        AudioResampleStage(rate_out=4000), batch_format="pyarrow", batch_size=256
    )
    return ds.map_batches(
        AudioFeatureStage(), batch_format="pyarrow", batch_size=256
    )


def q_video_frames(sf_dir: str):
    """Video frame sampling (every 5th frame) + per-frame integer pixel digest.

    The vz1 container's offset table makes sampling a byte-range slice —
    unsampled frames are never decompressed (the shape that matters at
    100 TB of video). Sampled frames are self-contained qz1 images; the
    digest stage decodes them and emits sum(d0+d1+d2), which the oracle
    recomputes from the frame generator rule in SQL.
    """
    from pygeoops_ray.stages.multimodal import FrameSampleStage
    from pygeoops_ray.table import images as I
    from pygeoops_ray.table.video import generate_videos_for_ordinals

    n = max(2 * _table_rows(sf_dir, "supplier"), 200)

    def gen(batch: pa.Table) -> pa.Table:
        return generate_videos_for_ordinals(batch["id"].to_numpy())

    vids = rd.range(n).map_batches(gen, batch_format="pyarrow", batch_size=64)
    # instance form (task pool): the class form's fixed actor pool fuses with
    # the generator stage and caps the whole chain at `concurrency` workers
    frames = vids.map_batches(
        FrameSampleStage(every_n=5), batch_format="pyarrow", batch_size=64
    )

    def digest(batch: pa.Table) -> pa.Table:
        sums = [
            int(I.decode_image(d).astype(np.int64).sum())
            for d in batch["bytes"].to_pylist()
        ]
        return pa.Table.from_pydict(
            {
                "video_id": batch["video_id"],
                "frame_idx": batch["frame_idx"],
                "sum_rgb": pa.array(sums, pa.int64()),
            }
        )

    return frames.map_batches(digest, batch_format="pyarrow")


def q_topn_per_key(sf_dir: str):
    """Top-3 earliest events per user — bounded-output top-N per key.

    Top-N per key is ALGEBRAIC: the per-batch pre-combine keeps ≤N rows per
    (batch, key), so only bounded partials shuffle (the quota-sampling /
    per-domain-cap op a training-data pipeline uses for balancing). Rank is
    assigned inside the per-bucket reducer, where a key's rows are
    group-local by construction.
    """
    import pandas as pd

    from pygeoops_ray.stages.groupagg import _bucket_count, _bucketed

    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def topn(df: pd.DataFrame) -> pd.DataFrame:
        if "ts" in df.columns:
            df = df.assign(
                ts_us=df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            ).drop(columns=["ts"])
        return (
            df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
            .groupby("user_id", sort=False)
            .head(3)
        )

    def reducer(df: pd.DataFrame) -> pd.DataFrame:
        out = topn(df)
        out = out.assign(rnk=out.groupby("user_id", sort=False).cumcount() + 1)
        return out[["user_id", "event_id", "rnk"]]

    n_buckets = _bucket_count(64, _table_rows(sf_dir, "events"))
    return _bucketed(ds, ["user_id"], reducer, n_buckets, pre=topn)


def q_top_terms(sf_dir: str):
    """Per-document top-3 terms joined with each term's global document
    frequency — the TF-IDF shape with exact integer statistics.

    Three classic distributed pieces over one tokenized pass: (1) per-doc
    term counts (vectorized batch kernel, one row per distinct (doc, term));
    (2) global DF via the algebraic grouped count (only (batch, term)
    partials shuffle); (3) per-doc top-3 by (tf DESC, term ASC) via the
    bounded-partial top-N shape, then a hash join of the SMALL top-k output
    back to DF by term. The term-count table is materialized once for its
    two consumers (at real scale: a write_partitioned checkpoint, same
    pattern as curation_pipeline).
    """
    import pandas as pd

    from pygeoops_ray.stages.groupagg import _bucket_count, _bucketed, grouped_count
    from pygeoops_ray.stages.text import term_counts_batch

    n_docs = _table_rows(sf_dir, "documents")
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    tc = docs.map_batches(term_counts_batch, batch_format="pyarrow").materialize()

    df_ds = grouped_count(tc, ["term"], "df", n_rows_hint=n_docs * 40)

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(
                ["doc_id", "tf", "term"],
                ascending=[True, False, True],
                kind="mergesort",
            )
            .groupby("doc_id", sort=False)
            .head(3)
        )

    def reducer(df: pd.DataFrame) -> pd.DataFrame:
        out = pre(df)
        out = out.assign(rnk=out.groupby("doc_id", sort=False).cumcount() + 1)
        return out[["doc_id", "term", "tf", "rnk"]]

    n_buckets = _bucket_count(64, n_docs * 40)
    top = _bucketed(tc, ["doc_id"], reducer, n_buckets, pre=pre)
    return top.join(df_ds, join_type="inner", num_partitions=4, on=("term",))


def q_global_rank(sf_dir: str):
    """Global row_number over (ts, event_id) — the distributed rank shape.

    Ray's range sort globally orders blocks and sorts within them; a
    metadata-sized second pass collects one (block-min key, count) row per
    block, the driver cumsums those few rows into per-block rank offsets
    (keyed by the block's min key — keys are unique), and a final whole-block
    map adds offset + arange. Two streaming passes over the sorted result
    (materialized once), no row ever leaves its block after the sort.
    """
    import ray

    ds = _read(sf_dir, "events", columns=["event_id", "ts"])

    def to_key(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.Table.from_pydict({"event_id": batch["event_id"], "ts_us": ts_us})

    sorted_ds = ds.map_batches(to_key, batch_format="pyarrow").sort(
        ["ts_us", "event_id"]
    ).materialize()

    def block_summary(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.Table.from_pydict(
                {
                    "min_ts": pa.array([], pa.int64()),
                    "min_eid": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        return pa.Table.from_pydict(
            {
                "min_ts": [batch["ts_us"][0].as_py()],
                "min_eid": [batch["event_id"][0].as_py()],
                "cnt": [len(batch)],
            }
        )

    parts = (
        sorted_ds.map_batches(block_summary, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values(["min_ts", "min_eid"])
    )
    offs = np.concatenate([[0], parts["cnt"].to_numpy().cumsum()[:-1]])
    offsets = {
        (int(t), int(e)): int(o)
        for t, e, o in zip(parts["min_ts"], parts["min_eid"], offs)
    }
    oref = ray.put(offsets)

    def add_rank(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.Table.from_pydict(
                {"event_id": pa.array([], pa.int64()), "rnk": pa.array([], pa.int64())}
            )
        off = ray.get(oref)[
            (batch["ts_us"][0].as_py(), batch["event_id"][0].as_py())
        ]
        rnk = off + 1 + np.arange(len(batch), dtype=np.int64)
        return pa.Table.from_pydict(
            {"event_id": batch["event_id"], "rnk": pa.array(rnk, pa.int64())}
        )

    return sorted_ds.map_batches(add_rank, batch_format="pyarrow", batch_size=None)


def q_quantiles(sf_dir: str):
    """Exact distributed quantiles via value histogram (bounded cardinality).

    The scalable exact-quantile shape for quantized measures: per-block
    value counts → distributed combine (only distinct-value partials move)
    → the driver scans the SMALL histogram cumsum for the p25/50/75/99
    cut points (smallest v with cum ≥ ceil(p·n/100), all integer).
    """
    import pandas as pd

    from pygeoops_ray.stages.groupagg import grouped_agg

    ds = _read(sf_dir, "events", columns=["value"])

    def hist(batch: pa.Table) -> pa.Table:
        v = np.floor(batch["value"].to_numpy() * 100).astype(np.int64)
        vals, cnts = np.unique(v, return_counts=True)
        return pa.Table.from_pydict(
            {"v": pa.array(vals, pa.int64()), "c": pa.array(cnts, pa.int64())}
        )

    h = grouped_agg(
        ds.map_batches(hist, batch_format="pyarrow", batch_size=None),
        ["v"],
        [("c", "sum", "c")],
    )
    df = h.to_pandas().sort_values("v").reset_index(drop=True)
    n = int(df["c"].sum())
    cum = df["c"].cumsum().to_numpy()
    rows = []
    for pct in (25, 50, 75, 99):
        thr = (pct * n + 99) // 100
        idx = int(np.searchsorted(cum, thr))
        rows.append((pct, int(df["v"].iloc[idx])))
    return pd.DataFrame(rows, columns=["pct", "value_c"]).astype("int64")


def q_group_median(sf_dir: str):
    """Exact per-user median of the quantized value column — grouped
    distributed quantiles via the histogram shape.

    Per-block (user, value-bucket) counts are the only thing that shuffles
    (grouped_agg's algebraic pre-combine); the per-user cut-point scan runs
    inside the bucketed reducer where each user's histogram is group-local.
    Same integer cut rule as the global ``quantiles`` query, shared with the
    SQL oracle: smallest v with running count >= ceil(50·n/100).
    """
    import pandas as pd

    from pygeoops_ray.stages.groupagg import _bucket_count, _bucketed, grouped_agg

    n_events = _table_rows(sf_dir, "events")
    ds = _read(sf_dir, "events", columns=["user_id", "value"])

    def hist(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy()
        v = np.floor(batch["value"].to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame({"user_id": u, "v": v})
        g = df.groupby(["user_id", "v"], sort=False).size().reset_index(name="c")
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(
            None
        )

    h = grouped_agg(
        ds.map_batches(hist, batch_format="pyarrow", batch_size=None),
        ["user_id", "v"],
        [("c", "sum", "c")],
        n_rows_hint=n_events,
    )

    def reducer(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "v"], kind="mergesort")
        n = df.groupby("user_id", sort=False)["c"].transform("sum")
        cum = df.groupby("user_id", sort=False)["c"].cumsum()
        thr = (50 * n + 99) // 100
        hit = df[cum >= thr].groupby("user_id", sort=False).first().reset_index()
        nn = df.groupby("user_id", sort=False)["c"].sum().reset_index(name="n")
        out = hit.merge(nn, on="user_id")
        return pd.DataFrame(
            {
                "user_id": out["user_id"].astype("int64"),
                "median_c": out["v"].astype("int64"),
                "n": out["n"].astype("int64"),
            }
        )

    return _bucketed(
        h, ["user_id"], reducer, _bucket_count(64, n_events), pre=None
    )


def q_kmeans(sf_dir: str):
    """Distributed integer-exact k-means over the embeddings table.

    Two Lloyd iterations, k=8: each iteration is one streaming pass with
    per-batch partial (cluster → sum, count) against broadcast centroids
    (ray.put once per iteration), tiny k×d driver reduce. The oracle replays
    the identical integer algorithm (quantize → argmin → S//n centroids) in
    unrolled SQL CTEs — value-exact, not a contract bit.
    """
    from pygeoops_ray.stages.cluster import kmeans_assign

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return kmeans_assign(ds, k=8, iters=2)


def q_geo_csv(sf_dir: str):
    """CSV-with-WKT source → WKB geometry column → integer shape digests.

    Exercises the io source path end-to-end under the correctness gate:
    ray.data.read_csv → WKT parse kernel → WKB encode (+bbox columns) →
    WKB decode → area/perimeter/bounds digests. The CSV is synthesized once
    per size under /tmp (deterministic rect per supplier key: origin
    (k%100, k//100), w=1+k%5, h=1+k%7), so the oracle is plain arithmetic.
    """
    import os

    from pygeoops_ray import io as gio
    from pygeoops_ray.geo import wkb as _wkb

    n = _table_rows(sf_dir, "supplier")
    path = f"/tmp/ray_geoops_cache/geo_csv_n{n}.csv"
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write("s_suppkey,wkt\n")
            for k in range(n):
                x0, y0 = k % 100, k // 100
                x1, y1 = x0 + 1 + k % 5, y0 + 1 + k % 7
                f.write(
                    f'{k},"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, '
                    f'{x0} {y1}, {x0} {y0}))"\n'
                )
        os.replace(tmp, path)

    ds = gio.read_geo_csv(path, geometry_col="wkt")

    def digest(batch: pa.Table) -> pa.Table:
        areas, perims = [], []
        for blob in batch["geometry"].to_pylist():
            geom = _wkb.loads(blob)
            areas.append(int(round(geom.area)))
            perims.append(int(round(geom.length)))
        return pa.Table.from_pydict(
            {
                "s_suppkey": pa.array(batch["s_suppkey"].to_pylist(), pa.int64()),
                "area_i": pa.array(areas, pa.int64()),
                "perim_i": pa.array(perims, pa.int64()),
                "minx_i": pa.array(
                    [int(v) for v in batch["minx"].to_pylist()], pa.int64()
                ),
                "maxy_i": pa.array(
                    [int(v) for v in batch["maxy"].to_pylist()], pa.int64()
                ),
            }
        )

    return ds.map_batches(digest, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# round-2 final wave: bloom semi-join, outer-join agg, stratified sampling,
# rollup, embedding quantization, image augmentation
# ---------------------------------------------------------------------------


def q_bloom_semi_join(sf_dir: str):
    """Lineitem rows of high-value orders via a Bloom-filter broadcast
    semi-join (stages/bloomjoin.py), digested per return flag.

    The 100-TB join-pruning shape: the build side (orders with
    o_totalprice > 250k) compresses to a few-MB bit array broadcast once;
    the probe stream drops non-matches inside map_batches BEFORE any
    exchange, and the exact ``left_semi`` join that removes Bloom false
    positives shuffles only the survivors. Output values are EXACT (the
    filter has no false negatives; FPs die in the semi join), so the oracle
    is the plain semi-join SQL.
    """
    import pyarrow.compute as pc

    from pygeoops_ray.stages.bloomjoin import bloom_semi_join
    from pygeoops_ray.stages.groupagg import grouped_agg

    n_orders = _table_rows(sf_dir, "orders")
    build = _read_blocked(
        sf_dir, "orders", columns=["o_orderkey", "o_totalprice"]
    ).map_batches(
        lambda b: b.filter(pc.greater(b["o_totalprice"], 250000.0)),
        batch_format="pyarrow",
        batch_size=None,
    )
    probe = _read_blocked(
        sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag", "l_quantity"]
    )
    semi = bloom_semi_join(
        probe,
        build.select_columns(["o_orderkey"]),
        probe_key="l_orderkey",
        build_key="o_orderkey",
        n_build_hint=n_orders,
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        qty_c = np.floor(batch["l_quantity"].to_numpy() * 100.0).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "l_returnflag": batch["l_returnflag"],
                "qty_c": pa.array(qty_c, pa.int64()),
            }
        )

    return grouped_agg(
        semi.map_batches(to_cents, batch_format="pyarrow"),
        ["l_returnflag"],
        [("qty_c", "size", "n_rows"), ("qty_c", "sum", "sum_qty_c")],
        n_buckets=2,
    )


def q_cust_order_stats(sf_dir: str):
    """Per-market-segment customer stats via LEFT OUTER join — customers
    with no orders survive with zero-filled measures.

    Shape: orders pre-aggregate per custkey (algebraic — only one partial
    row per (block, key) shuffles), then Ray's ``left_outer`` hash join
    against the customer table, null-fill in a vectorized map, and a tiny
    per-segment aggregate. ``n_inactive`` counts the join's null side, so
    the oracle (LEFT JOIN + FILTER WHERE IS NULL) checks outer-join
    semantics end-to-end, not just inner matches.
    """
    from pygeoops_ray.stages.groupagg import grouped_agg

    n_orders = _table_rows(sf_dir, "orders")
    orders = _read_blocked(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def order_cents(batch: pa.Table) -> pa.Table:
        spend = np.floor(batch["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
        return pa.Table.from_pydict(
            {"o_custkey": batch["o_custkey"], "spend_c": pa.array(spend, pa.int64())}
        )

    per_cust = grouped_agg(
        orders.map_batches(order_cents, batch_format="pyarrow", batch_size=None),
        ["o_custkey"],
        [("spend_c", "sum", "spend_c"), ("spend_c", "size", "n_orders")],
        n_rows_hint=n_orders,
    )
    cust = _read_blocked(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    joined = cust.join(
        per_cust,
        join_type="left_outer",
        num_partitions=4,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def fill(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        n_orders_a = batch["n_orders"].to_numpy(zero_copy_only=False)
        inactive = pa.compute.is_null(batch["n_orders"]).to_numpy(zero_copy_only=False)
        spend = batch["spend_c"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "c_mktsegment": batch["c_mktsegment"],
                "one": pa.array(np.ones(n, np.int64)),
                "inactive": pa.array(inactive.astype(np.int64), pa.int64()),
                "n_orders": pa.array(
                    np.nan_to_num(n_orders_a.astype(np.float64)).astype(np.int64)
                ),
                "spend_c": pa.array(
                    np.nan_to_num(spend.astype(np.float64)).astype(np.int64)
                ),
            }
        )

    return grouped_agg(
        joined.map_batches(fill, batch_format="pyarrow"),
        ["c_mktsegment"],
        [
            ("one", "sum", "n_cust"),
            ("inactive", "sum", "n_inactive"),
            ("n_orders", "sum", "n_orders"),
            ("spend_c", "sum", "spend_c"),
        ],
        n_buckets=2,
    )


def q_stratified_sample(sf_dir: str):
    """Deterministic per-stratum sampling of orders (10%..50% by priority).

    The training-data balancing shape: keep a row iff
    ``(o_orderkey * 2654435761) mod 2^32 mod 100 < rate(stratum)`` — a pure
    map with NO shuffle and NO RNG state, so the sample is identical on
    rerun/resume and across any partitioning (uint64 wraparound preserves
    the mod-2^32 value, so numpy and the HUGEINT-free SQL agree exactly).
    Output digests per stratum prove both the rate selection and the exact
    membership (sum of sampled keys).
    """
    from pygeoops_ray.stages.groupagg import grouped_agg

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    def sample(batch: pa.Table) -> pa.Table:
        keys = batch["o_orderkey"].to_numpy()
        pri = batch["o_orderpriority"].to_pandas()
        digit = pri.str.slice(0, 1).astype(np.int64).to_numpy()
        with np.errstate(over="ignore"):
            bucket = (keys.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(
                2**32
            ) % np.uint64(100)
        keep = bucket.astype(np.int64) < digit * 10
        return pa.Table.from_pydict(
            {
                "o_orderpriority": batch["o_orderpriority"].filter(pa.array(keep)),
                "o_orderkey": pa.array(keys[keep], pa.int64()),
            }
        )

    return grouped_agg(
        ds.map_batches(sample, batch_format="pyarrow", batch_size=None),
        ["o_orderpriority"],
        [("o_orderkey", "size", "n_sampled"), ("o_orderkey", "sum", "sum_okey")],
        n_buckets=2,
    )


def q_sales_rollup(sf_dir: str):
    """GROUP BY ROLLUP (l_returnflag, l_linestatus) in ONE scan.

    Super-aggregate levels are derived from the fine-group partials, not
    from re-scanning: the per-block combiner emits ≤6 rows per block (the
    fine key space), and the single final reduce — whose input is
    group-cardinality-bounded, never data-bounded — folds the fine groups
    upward into the per-flag and grand-total rows ('ALL' sentinel labels).
    """
    import pandas as pd

    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        qty = np.floor(batch["l_quantity"].to_numpy() * 100.0).astype(np.int64)
        base = np.floor(batch["l_extendedprice"].to_numpy() * 100.0).astype(np.int64)
        df = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_pandas(),
                "l_linestatus": batch["l_linestatus"].to_pandas(),
                "sum_qty_c": qty,
                "sum_base_c": base,
            }
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False, as_index=False)
        out = g.agg(sum_qty_c=("sum_qty_c", "sum"), sum_base_c=("sum_base_c", "sum"))
        out["n_rows"] = g.size()["size"].to_numpy()
        return out

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        def agg(frame, keys):
            g = frame.groupby(keys, sort=False, as_index=False)
            return g.agg(
                sum_qty_c=("sum_qty_c", "sum"),
                sum_base_c=("sum_base_c", "sum"),
                n_rows=("n_rows", "sum"),
            )

        fine = agg(df, ["l_returnflag", "l_linestatus"])
        per_flag = agg(fine, ["l_returnflag"]).assign(l_linestatus="ALL")
        total = (
            fine[["sum_qty_c", "sum_base_c", "n_rows"]]
            .sum()
            .to_frame()
            .T.assign(l_returnflag="ALL", l_linestatus="ALL")
        )
        cols = ["l_returnflag", "l_linestatus", "n_rows", "sum_qty_c", "sum_base_c"]
        out = pd.concat([fine, per_flag, total], ignore_index=True)[cols]
        return out.astype({"n_rows": np.int64, "sum_qty_c": np.int64, "sum_base_c": np.int64})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return parts.repartition(1, shuffle=False).map_batches(
        rollup, batch_format="pandas", batch_size=None
    )


def q_embed_quantize(sf_dir: str):
    """Int8-style embedding quantization (the vector-compression step an
    ANN index applies at rest) with per-vector integer digests.

    Rule shared with kmeans: q = floor(x·100) + 128 over the float64-cast
    values, so every digest is exact and the oracle replays the whole
    transform via unnest + generate_subscripts. A pure map — no shuffle.
    """
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def digest(batch: pa.Table) -> pa.Table:
        ids, mat = _matrix_of(batch)
        q = np.floor(mat * 100.0).astype(np.int64) + 128
        w = np.arange(1, q.shape[1] + 1, dtype=np.int64)
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "sum_q": pa.array(q.sum(axis=1), pa.int64()),
                "sum_q2": pa.array((q * q).sum(axis=1), pa.int64()),
                "wsum": pa.array(q @ w, pa.int64()),
            }
        )

    return ds.map_batches(digest, batch_format="pyarrow", batch_size=None)


def q_image_augment(sf_dir: str):
    """Horizontal-flip + 180°-rotate augmentation over REAL decoded pixels,
    verified by position-weighted integer digests.

    The augmentation stage a vision training pipeline runs per epoch: decode
    → orientation transforms → re-use. Digests weight each pixel by its
    POST-transform coordinates (x+1 resp. (x+1)(y+1)), so a wrong flip axis
    or an off-by-one changes the value; the oracle re-derives the same sums
    from the generator rule with mirrored weights. ``aug_ok`` binds the
    involution contract (flip∘flip = id, rot180∘rot180 = id) in-run.
    """
    import pyarrow.compute as pc

    from pygeoops_ray.table.images import decode_image

    ds, _ = _image_ds(sf_dir)
    ds = ds.select_columns(["image_id", "bytes"])

    def augment(batch: pa.Table) -> pa.Table:
        ids = pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 4, 32), pa.int64())
        flip_wx, rot_w, ok = [], [], []
        for blob in batch["bytes"]:
            pix = decode_image(blob.as_py()).astype(np.int64)
            h, w = pix.shape[:2]
            flip = pix[:, ::-1, :]
            rot = pix[::-1, ::-1, :]
            wx = np.arange(1, w + 1, dtype=np.int64)
            wy = np.arange(1, h + 1, dtype=np.int64)
            flip_wx.append(int((flip.sum(axis=2) * wx[None, :]).sum()))
            rot_w.append(int((rot.sum(axis=2) * (wy[:, None] * wx[None, :])).sum()))
            ok.append(
                bool(
                    np.array_equal(flip[:, ::-1, :], pix)
                    and np.array_equal(rot[::-1, ::-1, :], pix)
                )
            )
        return pa.Table.from_pydict(
            {
                "i": ids,
                "flip_wx": pa.array(flip_wx, pa.int64()),
                "rot_w": pa.array(rot_w, pa.int64()),
                "aug_ok": pa.array(np.asarray(ok, np.int64), pa.int64()),
            }
        )

    return ds.map_batches(augment, batch_format="pyarrow", batch_size=1024)


def q_dup_clusters(sf_dir: str):
    """Near-duplicate CLUSTER assignment: connected components over the exact
    Jaccard pair graph (stages/graph.connected_components).

    Pairwise dedup is not enough for curation — similarity is not transitive
    but removal must be (a~b, b~c ⇒ keep ONE of {a,b,c}), so the cluster id
    is the min doc_id of each component of the pair graph. Min-label
    propagation iterates bounded-volume shuffles (|V|+2|E| rows per round,
    rounds = component diameter); documents in no pair come back as
    singletons via a broadcast anti-filter. The oracle replays the closure
    with a recursive CTE over the same all-pairs Jaccard edge set.
    """
    import pyarrow.compute as pc

    from pygeoops_ray.stages.graph import connected_components

    docs = _read_blocked(sf_dir, "documents", columns=["doc_id", "text"])

    def flt(b: pa.Table) -> pa.Table:
        ntok = pc.list_value_length(pc.split_pattern(b["text"], " "))
        return b.filter(pc.greater_equal(ntok, 3))

    n_docs = _table_rows(sf_dir, "documents")
    pairs = dedup_stages.exact_jaccard_pairs(
        docs.map_batches(flt, batch_format="pyarrow"),
        jaccard_threshold=0.5,
        n_docs_hint=n_docs,
    )
    all_nodes = _read(sf_dir, "documents", columns=["doc_id"])
    cc = connected_components(
        pairs,
        "doc_a",
        "doc_b",
        all_nodes_ds=all_nodes,
        node_col="doc_id",
        n_edges_hint=max(64, n_docs // 10),
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"doc_id": batch["node"], "cluster_id": batch["cluster_id"]}
        )

    return cc.map_batches(rename, batch_format="pyarrow", batch_size=None)


def q_vocab_hll(sf_dir: str):
    """Corpus vocabulary-size HyperLogLog sketch (stages/sketch.py): the
    constant-size distinct-count summary — per-batch partials are ≤4096
    register rows no matter how many tokens stream by, vs one row per
    DISTINCT value for the exact path (table_profile).

    Every register is integer-exact and the oracle recomputes the whole
    table from md5_number_lower + bit arithmetic; the float estimator rides
    on top and is property-tested (tests/test_graph_ops.py) against the
    exact distinct count.
    """
    from pygeoops_ray.stages.sketch import hll_registers

    docs = _read(sf_dir, "documents", columns=["text"])
    return hll_registers(docs, "text", p=12, tokenize=True)


def q_footprint_pairs(sf_dir: str):
    """Spatial SELF-join: footprint pairs within L∞ distance 48 of each other
    (stages/spatial.proximity_pairs) — the partition-based spatial merge with
    reference-point dedup, so every pair is emitted exactly once with no
    post-join dedup shuffle.
    """
    n_imgs = _table_rows(sf_dir, "part")
    rects = _read_blocked(sf_dir, "part", columns=["p_partkey"]).map_batches(
        sp.image_meta_from_part, batch_format="pyarrow"
    )
    return sp.proximity_pairs(rects, dist=48.0, n_rows_hint=n_imgs * 2)


def q_running_total(sf_dir: str):
    """Per-user RUNNING total (cumulative window aggregate): for every event,
    its 1-based sequence number and the cumulative cents-scaled value over
    the user's history ordered by (ts, event_id).

    The streaming-window shape sessionize uses, but emitting one row PER
    INPUT ROW with an order-dependent accumulation — buckets partition
    users (a user's history must be group-local), the in-group cumsum is
    one vectorized pandas pass, and bucket count scales with input size.
    """
    import pandas as pd

    ds = _read_blocked(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])
    n_buckets = _events_bucket_count(sf_dir)

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bucket", pa.array(batch["user_id"].to_numpy() % n_buckets, pa.int64())
        )

    def run_total(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["user_id", "ts", "event_id"]).copy()
        group["vc"] = np.floor(group["value"].to_numpy() * 100.0).astype(np.int64)
        g = group.groupby("user_id", sort=False)
        group["seq"] = (g.cumcount() + 1).astype(np.int64)
        group["run_value_c"] = g["vc"].cumsum().astype(np.int64)
        return group[["event_id", "user_id", "seq", "run_value_c"]]

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(run_total, batch_format="pandas")
    )


def q_top_tokens(sf_dir: str):
    """EXACT corpus-wide top-20 tokens via candidate-pruned two-pass heavy
    hitters (stages/sketch.heavy_hitters) — per-block top-C summaries bound
    the mass any unseen term can hold, pass 2 recounts only the provable
    candidates, and a certificate guards exactness (full-count fallback
    otherwise). The oracle is the plain GROUP BY top-k with the same
    (count DESC, term ASC) tie-break.
    """
    from pygeoops_ray.stages.sketch import heavy_hitters

    docs = _read(sf_dir, "documents", columns=["text"])
    return heavy_hitters(docs, "text", k=20, capacity=256, tokenize=True)


def q_funnel(sf_dir: str):
    """Ordered-funnel analysis per user: first 'view', first 'click' strictly
    AFTER it, first 'purchase' strictly after that — the product-analytics
    sequence-match shape. Same user-bucketed partitioning as sessionize; the
    in-group chain resolves with three vectorized filtered-min merges (no
    per-user Python loop). Missing stages encode as -1 so the whole row is
    integer-exact against the SQL chain-of-joins oracle.
    """
    import pandas as pd

    ds = _read_blocked(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    n_buckets = _events_bucket_count(sf_dir)

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bucket", pa.array(batch["user_id"].to_numpy() % n_buckets, pa.int64())
        )

    def funnel(group: pd.DataFrame) -> pd.DataFrame:
        g = group.copy()
        g["tsu"] = g["ts"].astype("int64")
        users = pd.DataFrame({"user_id": np.sort(g["user_id"].unique())})
        t1 = (
            g[g["event_type"] == "view"]
            .groupby("user_id", as_index=False)["tsu"]
            .min()
            .rename(columns={"tsu": "t1"})
        )
        ck = g[g["event_type"] == "click"].merge(t1, on="user_id")
        t2 = (
            ck[ck["tsu"] > ck["t1"]]
            .groupby("user_id", as_index=False)["tsu"]
            .min()
            .rename(columns={"tsu": "t2"})
        )
        pu = g[g["event_type"] == "purchase"].merge(t2, on="user_id")
        t3 = (
            pu[pu["tsu"] > pu["t2"]]
            .groupby("user_id", as_index=False)["tsu"]
            .min()
            .rename(columns={"tsu": "t3"})
        )
        out = users.merge(t1, on="user_id", how="left")
        out = out.merge(t2, on="user_id", how="left")
        out = out.merge(t3, on="user_id", how="left")
        stages = (
            out["t1"].notna().astype(np.int64)
            + out["t2"].notna().astype(np.int64)
            + out["t3"].notna().astype(np.int64)
        )
        return pd.DataFrame(
            {
                "user_id": out["user_id"].astype(np.int64),
                "view_ts": out["t1"].fillna(-1).astype(np.int64),
                "click_ts": out["t2"].fillna(-1).astype(np.int64),
                "purchase_ts": out["t3"].fillna(-1).astype(np.int64),
                "stages": stages,
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(funnel, batch_format="pandas")
    )


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem with selective filters,
    grouped revenue, top-10 — the canonical multi-join analytics chain.

    Scale plan: the BUILDING-segment customer keys are an exact broadcast
    semi-filter (one in-task ``np.isin`` before any exchange — the side is
    ~1/5 of the customer KEY column; swap in ``bloom_semi_join`` when even
    the key set outgrows a broadcast), the orders⋈lineitem leg is the one
    real shuffle with the JOIN AND the revenue aggregate fused into a
    single coarse-bucket exchange, and the top-10 is a per-block partial +
    tiny global merge — no full sort anywhere.
    """
    import pyarrow.compute as pc
    import ray

    cutoff = np.datetime64("1998-06-01T00:00:00", "us")
    cutoff_us = int(cutoff.astype(np.int64))

    @ray.remote(num_cpus=1)
    def _building_keys(path: str) -> np.ndarray:
        import pyarrow.parquet as pq

        t = pq.read_table(path, columns=["c_custkey", "c_mktsegment"])
        keys = t.filter(pc.equal(t["c_mktsegment"], "BUILDING"))["c_custkey"]
        return np.sort(keys.to_numpy())

    keys_ref = _building_keys.remote(f"{sf_dir}/customer.parquet")

    def ord_filter(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less(pc.cast(b["o_orderdate"], pa.int64()), cutoff_us))
        keep = np.isin(b["o_custkey"].to_numpy(), ray.get(keys_ref))
        return b.filter(pa.array(keep))

    orders = _read_blocked(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(ord_filter, batch_format="pyarrow", batch_size=None)

    def ord_cols(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "o_orderkey": b["o_orderkey"],
                "odate_us": pc.cast(b["o_orderdate"], pa.int64()),
            }
        )

    orders = orders.map_batches(ord_cols, batch_format="pyarrow", batch_size=None)

    def li_cols(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"].cast(pa.int64()).to_numpy()
        keep = ship > cutoff_us
        p = b["l_extendedprice"].to_numpy()[keep]
        d = b["l_discount"].to_numpy()[keep]
        rev = np.floor(p * (1 - d) * 100).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "l_orderkey": pa.array(b["l_orderkey"].to_numpy()[keep], pa.int64()),
                "rev_c": pa.array(rev, pa.int64()),
            }
        )

    li = _read_blocked(
        sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"]
    ).map_batches(li_cols, batch_format="pyarrow", batch_size=None)

    # join + aggregate FUSED into one coarse-bucket shuffle: both sides key
    # on orderkey, the bucket reducer pre-sums lineitem revenue per key and
    # inner-merges the (one-per-key) order row — no second exchange, and no
    # Dataset.join hash-shuffle actor pool (its first spin-up costs ~10 s of
    # session fixed cost; the sort-based groupby pool is already warm)
    import pandas as pd

    from pygeoops_ray.stages.groupagg import _bucketed

    def tag_li(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "key": b["l_orderkey"],
                "val": b["rev_c"],
                "kind": pa.array(np.zeros(b.num_rows, np.int8), pa.int8()),
            }
        )

    def tag_ord(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "key": b["o_orderkey"],
                "val": b["odate_us"],
                "kind": pa.array(np.ones(b.num_rows, np.int8), pa.int8()),
            }
        )

    both = li.map_batches(tag_li, batch_format="pyarrow", batch_size=None).union(
        orders.map_batches(tag_ord, batch_format="pyarrow", batch_size=None)
    )

    def join_agg(df: pd.DataFrame) -> pd.DataFrame:
        ords_part = df[df["kind"] == 1][["key", "val"]].rename(columns={"val": "odate_us"})
        li_part = df[df["kind"] == 0]
        sums = li_part.groupby("key", as_index=False)["val"].sum().rename(
            columns={"val": "revenue_c"}
        )
        out = sums.merge(ords_part, on="key", how="inner")
        return out.rename(columns={"key": "l_orderkey"})[
            ["l_orderkey", "odate_us", "revenue_c"]
        ]

    agg = _bucketed(both, ["key"], join_agg, n_buckets=8)

    def partial_top(batch: pa.Table) -> pa.Table:
        rev = batch["revenue_c"].to_numpy()
        okey = batch["l_orderkey"].to_numpy()
        order = np.lexsort((okey, -rev))[:10]
        return batch.take(pa.array(order, pa.int64()))

    top = (
        agg.map_batches(partial_top, batch_format="pyarrow")
        .sort(["revenue_c", "l_orderkey"], descending=[True, False])
        .limit(10)
        .to_pandas()
    )
    top = top.rename(columns={"l_orderkey": "o_orderkey"})
    return top[["o_orderkey", "odate_us", "revenue_c"]]


def q_knn_join(sf_dir: str):
    """Exact kNN JOIN via cell neighbor-RING expansion
    (stages/spatial.knn_join_ring): every 101st event point finds its 3
    nearest OTHER points.

    The pruned complement of the broadcast ``knn`` query: the corpus side is
    never broadcast — points shuffle into home cells, queries replicate only
    to Chebyshev ring-r cells per round, and a query resolves when its k-th
    distance is provably inside the searched radius (any unsearched point is
    at L∞ > r·cell). Squared distances over integer coordinates are
    integer-exact, so the oracle is the plain windowed cross join.
    """
    n_events = _table_rows(sf_dir, "events")
    import pandas as pd

    e = np.arange(0, n_events, 101, dtype=np.int64)
    qdf = pd.DataFrame(
        {
            "q_id": e,
            "qx": (e % 1000).astype(np.float64) * 256.0 + ((e * 7) % 256).astype(np.float64),
            "qy": ((e // 1000) % 20).astype(np.float64) * 256.0
            + ((e * 13) % 256).astype(np.float64),
        }
    )
    pts = _read_blocked(sf_dir, "events", columns=["event_id"]).map_batches(
        sp.points_from_events, batch_format="pyarrow"
    )
    return sp.knn_join_ring(pts, qdf, k=3)


def q_dissolve(sf_dir: str):
    """Distributed DISSOLVE: per nation, the boolean union of each
    supplier's footprint rect, with the union's exact area — the grouped
    GEOMETRY aggregate (GIS dissolve / reference ``collect``+``union_all``),
    running the Martinez n-ary coverage-depth union inside ``map_groups``.

    Each supplier contributes rect [x0, 0, x0+10, 5] with x0 = (s_suppkey %
    7) * 8 — neighbors overlap (10 > 8), so the union is a genuine interval
    merge the oracle replays with a window-lag sum. Areas are exact
    multiples of 5, emitted cents-scaled as integers.
    """
    import pandas as pd

    from pygeoops_ray.geo import boolean
    from pygeoops_ray.geo.geom import box

    ds = _read_blocked(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])

    def rects(batch: pa.Table) -> pa.Table:
        sk = batch["s_suppkey"].to_numpy()
        return pa.Table.from_pydict(
            {
                "n_nationkey": batch["s_nationkey"],
                "x0": pa.array(((sk % 7) * 8).astype(np.int64), pa.int64()),
            }
        )

    def dissolve(group: pd.DataFrame) -> pd.DataFrame:
        out = []
        for nk, g_ in group.groupby("n_nationkey", sort=False):
            slots = np.unique(g_["x0"].to_numpy())
            geoms = [box(float(x), 0.0, float(x) + 10.0, 5.0) for x in slots]
            u = boolean.union_all(geoms)
            out.append(
                (
                    int(nk),
                    int(np.floor(u.area * 100.0)),
                    len(slots),
                )
            )
        return pd.DataFrame(out, columns=["n_nationkey", "area_c", "n_slots"]).astype(
            {"n_nationkey": np.int64, "area_c": np.int64, "n_slots": np.int64}
        )

    # 25 nations: Ray's native groupby is fine at this key cardinality
    return (
        ds.map_batches(rects, batch_format="pyarrow")
        .groupby("n_nationkey")
        .map_groups(dissolve, batch_format="pandas")
    )


def q_image_curation(sf_dir: str):
    """End-to-end IMAGE curation, composed and oracle-exact — the
    image-payload sibling of ``curation_pipeline``: size gate (w·h ≥ 1200)
    → exact dedup on the codec-invariant (phash_q, qdigest) key (argmin
    ordinal keeps the whole row) → near-duplicate removal (banded hamming ≤
    3 over the integer block-mean hash, guaranteed recall ⇒ deterministic
    drop-i_b rule) → multiplicative-hash train/val split → per-split counts
    + pixel sums + id checksums.

    ONE decode per image feeds all stages (multimodal.curate_digest_batch);
    the near-dup removal runs as a distributed Bloom ANTI-JOIN against the
    pair output (stages/bloomjoin.py) — bloom-negative images bypass the
    exchange entirely, bloom-positives decide in an exact left_anti join,
    so the drop set never materializes on the driver. The oracle replays
    the full chain — generator-rule dims, the ordinal duplicate rule, the
    HUGEINT ihash re-derivation, all-pairs hamming, and the split hash —
    in one SQL.
    """
    import pandas as pd
    import pyarrow.compute as pc

    from pygeoops_ray.stages.bloomjoin import bloom_anti_join
    from pygeoops_ray.stages.groupagg import _bucketed, grouped_agg
    from pygeoops_ray.stages.multimodal import curate_digest_batch

    ds, n = _image_ds(sf_dir)
    ds = ds.select_columns(["image_id", "bytes", "fmt"])
    ds = ds.map_batches(curate_digest_batch, batch_format="pyarrow", batch_size=1024)

    def gate(batch: pa.Table) -> pa.Table:
        i = pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 4, 32), pa.int64())
        batch = batch.drop_columns(["image_id"]).append_column("i", i)
        px = pc.multiply(batch["w"], batch["h"])
        return batch.filter(pc.greater_equal(px, 1200))

    gated = ds.map_batches(gate, batch_format="pyarrow")

    # exact dedup keeping the min-ordinal ROW (its own ihash rides along)
    def argmin_rows(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("i").drop_duplicates(["phash_q", "qdigest"], keep="first")

    deduped = _bucketed(
        gated, ["phash_q", "qdigest"], argmin_rows, n_buckets=8, pre=argmin_rows
    ).materialize()

    pairs = dedup_stages.hamming_pairs(
        deduped, id_col="i", hash_col="ihash", max_hamming=3,
        n_rows_hint=n, out_a="i_a", out_b="i_b",
    )
    # one-column pair projection materialized once (build side is read twice)
    kept = bloom_anti_join(
        deduped, pairs.select_columns(["i_b"]).materialize(),
        probe_key="i", build_key="i_b", n_build_hint=n,
    )

    def split_rows(b: pa.Table) -> pa.Table:
        ids = b["i"].to_numpy()
        px = b["w"].to_numpy() * b["h"].to_numpy()
        bucket = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)
        split = np.where(bucket % np.uint64(10) == 9, "val", "train")
        return pa.Table.from_pydict(
            {
                "split": pa.array(split),
                "i": pa.array(ids, pa.int64()),
                "px": pa.array(px.astype(np.int64), pa.int64()),
            }
        )

    return grouped_agg(
        kept.map_batches(split_rows, batch_format="pyarrow"),
        ["split"],
        [("i", "size", "n_images"), ("px", "sum", "sum_px"), ("i", "sum", "id_sum")],
        n_buckets=2,
    )


def q_incremental_dedup(sf_dir: str):
    """APPEND-MODE dedup: dedup a new increment (the upper half of the image
    corpus by ordinal) against already-ingested history (the lower half) —
    the shape a 100-TB corpus actually grows in. History keys compress to a
    broadcast Bloom filter, so bloom-NEGATIVE increment rows (almost
    everything, in the append case) flow through with NO exchange; only
    bloom-positives enter the exact ``left_anti`` join on the content
    digest. A final in-increment argmin dedup catches duplicates that
    arrived within the same increment. Exact: the generator's ordinal
    duplicate rule (i%101==0 duplicates i-1) means cross-boundary dups die
    in the anti join and same-increment dups in the argmin — the oracle is
    pure ordinal arithmetic.
    """
    import pyarrow.compute as pc

    from pygeoops_ray.stages.bloomjoin import bloom_anti_join
    from pygeoops_ray.stages.dedup import hash_str64
    from pygeoops_ray.stages.multimodal import quantized_digest_batch

    ds, n = _image_ds(sf_dir)
    # boundary ON a duplicate ordinal: i = half is a dup of half-1, which
    # lives in history — the cross-boundary case the anti join exists for
    half = (n // 2) // 101 * 101
    ds = ds.select_columns(["image_id", "bytes", "fmt"])
    ds = ds.map_batches(quantized_digest_batch, batch_format="pyarrow", batch_size=1024)

    def keys(batch: pa.Table) -> pa.Table:
        i = pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 4, 32), pa.int64())
        qd = batch["qdigest"].to_pylist()
        hkey = np.fromiter(
            (hash_str64(s) for s in qd), dtype=np.uint64, count=len(qd)
        ).astype(np.int64)
        return pa.Table.from_pydict(
            {"i": i, "qdigest": batch["qdigest"], "hkey": pa.array(hkey, pa.int64())}
        )

    kd = ds.map_batches(keys, batch_format="pyarrow").materialize()
    hist = kd.filter(expr=f"i < {half}")
    inc = kd.filter(expr=f"i >= {half}")
    new = bloom_anti_join(
        inc,
        hist,
        probe_key="qdigest",
        build_key="qdigest",
        n_build_hint=half,
        bloom_probe_key="hkey",
        bloom_build_key="hkey",
    )
    return dedup_stages.exact_dedup_min(
        new, ["qdigest"], "i", n_rows_hint=n
    ).select_columns(["i"])


def q_sales_cube(sf_dir: str):
    """GROUP BY CUBE (l_returnflag, l_linestatus) — all four grouping sets
    from ONE scan: the per-block combiner ships ≤6 fine-group partial rows,
    and the single group-cardinality-bounded reduce folds them into the
    fine, per-flag, per-status, and grand-total levels ('ALL' sentinels).
    Completes the rollup's grouping-sets family.
    """
    import pandas as pd

    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        qty = np.floor(batch["l_quantity"].to_numpy() * 100.0).astype(np.int64)
        base = np.floor(batch["l_extendedprice"].to_numpy() * 100.0).astype(np.int64)
        df = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_pandas(),
                "l_linestatus": batch["l_linestatus"].to_pandas(),
                "sum_qty_c": qty,
                "sum_base_c": base,
            }
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False, as_index=False)
        out = g.agg(sum_qty_c=("sum_qty_c", "sum"), sum_base_c=("sum_base_c", "sum"))
        out["n_rows"] = g.size()["size"].to_numpy()
        return out

    def cube(df: pd.DataFrame) -> pd.DataFrame:
        def agg(d, keys):
            g = d.groupby(keys, as_index=False, sort=False)
            return g.agg(
                sum_qty_c=("sum_qty_c", "sum"),
                sum_base_c=("sum_base_c", "sum"),
                n_rows=("n_rows", "sum"),
            )

        fine = agg(df, ["l_returnflag", "l_linestatus"])
        per_flag = agg(fine, ["l_returnflag"]).assign(l_linestatus="ALL")
        per_status = agg(fine, ["l_linestatus"]).assign(l_returnflag="ALL")
        total = (
            fine[["sum_qty_c", "sum_base_c", "n_rows"]]
            .sum()
            .to_frame()
            .T.assign(l_returnflag="ALL", l_linestatus="ALL")
        )
        cols = ["l_returnflag", "l_linestatus", "n_rows", "sum_qty_c", "sum_base_c"]
        out = pd.concat([fine, per_flag, per_status, total], ignore_index=True)[cols]
        return out.astype({"n_rows": np.int64, "sum_qty_c": np.int64, "sum_base_c": np.int64})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return parts.repartition(1, shuffle=False).map_batches(
        cube, batch_format="pandas", batch_size=None
    )


def q_user_mode(sf_dir: str):
    """MODE per group: each user's most frequent event_type (ties break
    lexicographically) plus its count — the argmax-aggregate shape. The
    per-batch combiner pre-counts (user, type) pairs so only bounded
    partials shuffle; the argmax itself runs group-local in the bucketed
    reducer. Window row_number oracle with the same tie-break.
    """
    import pandas as pd

    from pygeoops_ray.stages.groupagg import _bucketed

    ds = _read_blocked(sf_dir, "events", columns=["user_id", "event_type"])

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(["user_id", "event_type"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return out

    def reducer(df: pd.DataFrame) -> pd.DataFrame:
        full = df.groupby(["user_id", "event_type"], as_index=False, sort=False)["n"].sum()
        full = full.sort_values(
            ["user_id", "n", "event_type"], ascending=[True, False, True]
        )
        top = full.drop_duplicates("user_id", keep="first")
        return pd.DataFrame(
            {
                "user_id": top["user_id"].to_numpy(),
                "mode_type": top["event_type"].to_numpy(),
                "n": top["n"].astype(np.int64).to_numpy(),
            }
        )

    return _bucketed(ds, ["user_id"], reducer, n_buckets=8, pre=pre)


def q_dup_triangles(sf_dir: str):
    """Triangle count of the near-duplicate pair graph
    (stages/graph.triangle_count) — the clustering-density metric of the
    dup graph (how clique-like are the duplicate clumps): degree-oriented
    wedge counting, each triangle counted once at its smallest-(degree, id)
    vertex, wedge⋈edge decided in one tagged coarse-bucket cogroup. Oracle
    is the literal 3-way self-join over the same Jaccard edge set.
    """
    import pandas as pd
    import pyarrow.compute as pc

    from pygeoops_ray.stages.graph import triangle_count

    docs = _read_blocked(sf_dir, "documents", columns=["doc_id", "text"])

    def flt(b: pa.Table) -> pa.Table:
        ntok = pc.list_value_length(pc.split_pattern(b["text"], " "))
        return b.filter(pc.greater_equal(ntok, 3))

    n_docs = _table_rows(sf_dir, "documents")
    pairs = dedup_stages.exact_jaccard_pairs(
        docs.map_batches(flt, batch_format="pyarrow"),
        jaccard_threshold=0.5,
        n_docs_hint=n_docs,
    )
    n = triangle_count(pairs, "doc_a", "doc_b", n_edges_hint=n_docs // 10)
    return pd.DataFrame({"n_triangles": np.array([n], dtype=np.int64)})


QUERIES = {
    "tile_assignment": q_tile_assignment,
    "pip_join": q_pip_join,
    "pip_anti_join": q_pip_anti_join,
    "pip_join_agg": q_pip_join_agg,
    "spatial_pruned_read": q_spatial_pruned_read,
    "geo_pruned_read": q_geo_pruned_read,
    "clip_join": q_clip_join,
    "knn": q_knn,
    "dedup_events": q_dedup_events,
    "dedup_docs": q_dedup_docs,
    "near_dup_pairs": q_near_dup_pairs,
    "jaccard_pairs": q_jaccard_pairs,
    "simhash": q_simhash,
    "simhash_pairs": q_simhash_pairs,
    "cosine_pairs": q_cosine_pairs,
    "token_count": q_token_count,
    "text_quality": q_text_quality,
    "curation_pipeline": q_curation_pipeline,
    "bpe_tokens": q_bpe_tokens,
    "lang_id": q_lang_id,
    "fingerprint": q_fingerprint,
    "winnow_fp": q_winnow_fp,
    "overlay_nary": q_overlay_nary,
    "squarish_grid": q_squarish_grid,
    "make_valid_area": q_make_valid_area,
    "extend_line": q_extend_line,
    "collect_explode": q_collect_explode,
    "difference_rects": q_difference_rects,
    "difference_tiled": q_difference_tiled,
    "split_tiles": q_split_tiles,
    "inner_rings": q_inner_rings,
    "geom_zoo": q_geom_zoo,
    "subdivide_rect": q_subdivide_rect,
    "ann_topk": q_ann_topk,
    "ann_lsh": q_ann_lsh,
    "ann_ivf": q_ann_ivf,
    "ann_ivf_disk": q_ann_ivf_disk,
    "quarantine_decode": q_quarantine_decode,
    "table_profile": q_table_profile,
    "pricing_summary": q_pricing_summary,
    "events_window": q_events_window,
    "hopping_window": q_hopping_window,
    "sessionize": q_sessionize,
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "top_orders": q_top_orders,
    "simplify_geo": q_simplify_geo,
    "centerline": q_centerline,
    "buffer_by_m": q_buffer_by_m,
    "view_angles": q_view_angles,
    "topo_simplify": q_topo_simplify,
    "phash_dedup": q_phash_dedup,
    "phash_near_dup": q_phash_near_dup,
    "image_pyramid": q_image_pyramid,
    "zonal_stats": q_zonal_stats,
    "image_features": q_image_features,
    "audio_features": q_audio_features,
    "audio_resample": q_audio_resample,
    "video_frames": q_video_frames,
    "geo_csv": q_geo_csv,
    "kmeans": q_kmeans,
    "bloom_semi_join": q_bloom_semi_join,
    "cust_order_stats": q_cust_order_stats,
    "stratified_sample": q_stratified_sample,
    "sales_rollup": q_sales_rollup,
    "embed_quantize": q_embed_quantize,
    "image_augment": q_image_augment,
    "dup_clusters": q_dup_clusters,
    "vocab_hll": q_vocab_hll,
    "footprint_pairs": q_footprint_pairs,
    "running_total": q_running_total,
    "top_tokens": q_top_tokens,
    "funnel": q_funnel,
    "shipping_priority": q_shipping_priority,
    "knn_join": q_knn_join,
    "dissolve": q_dissolve,
    "image_curation": q_image_curation,
    "incremental_dedup": q_incremental_dedup,
    "sales_cube": q_sales_cube,
    "user_mode": q_user_mode,
    "dup_triangles": q_dup_triangles,
    "topn_per_key": q_topn_per_key,
    "top_terms": q_top_terms,
    "global_rank": q_global_rank,
    "group_median": q_group_median,
    "quantiles": q_quantiles,
}

# SQL uses only pre-registered views (part, events, nation, ...). Column names
# must match the Ray outputs exactly.
_IMG = """
    SELECT 'img_' || p_partkey AS image_id,
           p_partkey AS i,
           CAST(64 + (p_partkey * 37) % 193 AS DOUBLE) AS w,
           CAST(64 + (p_partkey * 53) % 151 AS DOUBLE) AS h,
           CAST((p_partkey % 1000) * 256 AS DOUBLE) AS minx,
           CAST((p_partkey // 1000) * 256 AS DOUBLE) AS miny,
           CAST((p_partkey % 1000) * 256 + 64 + (p_partkey * 37) % 193 AS DOUBLE) AS maxx,
           CAST((p_partkey // 1000) * 256 + 64 + (p_partkey * 53) % 151 AS DOUBLE) AS maxy
    FROM part
"""

_PTS = """
    SELECT event_id,
           CAST((event_id % 1000) * 256 + (event_id * 7) % 256 AS DOUBLE) AS px,
           CAST(((event_id // 1000) % 20) * 256 + (event_id * 13) % 256 AS DOUBLE) AS py
    FROM events
"""

# CTE chain deriving every image's integer block-mean hash from the
# generator rule (splitmix64 seeds, gradient pixels, raw0/qz1 dequantize,
# HUGEINT hash assembly): shared by phash_near_dup and image_curation
_IMG_IHASH_CTES = r'''n AS (SELECT greatest(count(*), 1000) AS cnt FROM part),
ords AS (
    SELECT unnest(generate_series(0, CAST((SELECT cnt FROM n) AS BIGINT) - 1)) AS i
),
imgs AS (
    SELECT i,
           CAST(CASE WHEN i % 101 = 0 AND i > 0 THEN i - 1 ELSE i END AS HUGEINT) AS src,
           (i % 3 = 0) AS is_qz
    FROM ords
),
s0 AS (
    SELECT *, (src + 11400714819323198485) % 18446744073709551616 AS z0 FROM imgs
),
s0x AS (SELECT *, xor(z0, z0 // 1073741824) AS a0 FROM s0),
s1 AS (
    SELECT *,
           ((a0 % 4294967296) * 13787848793156543929
            + (((a0 // 4294967296) * 13787848793156543929) % 18446744073709551616)
              * 4294967296) % 18446744073709551616 AS z1
    FROM s0x
),
s1x AS (SELECT *, xor(z1, z1 // 134217728) AS a1 FROM s1),
s2 AS (
    SELECT *,
           ((a1 % 4294967296) * 10723151780598845931
            + (((a1 // 4294967296) * 10723151780598845931) % 18446744073709551616)
              * 4294967296) % 18446744073709551616 AS z2
    FROM s1x
),
seeds AS (SELECT *, xor(z2, z2 // 2147483648) AS seed FROM s2),
meta AS (
    SELECT CAST(i AS BIGINT) AS i, is_qz,
           CAST(16 + (src * 37) % 49 AS BIGINT) AS w,
           CAST(16 + (src * 53) % 41 AS BIGINT) AS h,
           CAST(seed % 256 AS BIGINT) AS o0,
           CAST((seed // 256) % 256 AS BIGINT) AS o1,
           CAST((seed // 65536) % 256 AS BIGINT) AS o2
    FROM seeds
),
dec AS (
    SELECT m.i, m.h, m.w, ys.y, xs.x,
           CASE WHEN is_qz THEN p0 - (p0 % 4) + 2 ELSE p0 END AS d0,
           CASE WHEN is_qz THEN p1 - (p1 % 4) + 2 ELSE p1 END AS d1,
           CASE WHEN is_qz THEN p2 - (p2 % 4) + 2 ELSE p2 END AS d2
    FROM meta m,
         LATERAL (SELECT unnest(generate_series(0, m.h - 1)) AS y) ys,
         LATERAL (SELECT unnest(generate_series(0, m.w - 1)) AS x) xs,
         LATERAL (SELECT (ys.y * 3 + xs.x * 5 + m.o0) % 256 AS p0,
                         (ys.y * 7 + xs.x * 2 + m.o1) % 256 AS p1,
                         (ys.y * 1 + xs.x * 11 + m.o2) % 256 AS p2) p
),
-- gray block sums over the floor-start 8x8 partition: pixel y is in block
-- row (8y+7)//h (identity for starts floor(r*h/8)); same for columns
bsum AS (
    SELECT i, h, w,
           (8 * y + 7) // h AS br,
           (8 * x + 7) // w AS bc,
           sum(d0 + d1 + d2) AS s
    FROM dec
    GROUP BY i, h, w, br, bc
),
tot AS (SELECT i, sum(s) AS t FROM bsum GROUP BY i),
hashes AS (
    SELECT b.i,
           sum(CASE WHEN b.s * (b.h * b.w)
                        > tot.t * ((((b.br + 1) * b.h) // 8 - (b.br * b.h) // 8)
                                   * (((b.bc + 1) * b.w) // 8 - (b.bc * b.w) // 8))
                    THEN (CAST(1 AS HUGEINT) << CAST(63 - (b.br * 8 + b.bc) AS INTEGER))
                    ELSE 0 END) AS v
    FROM bsum b JOIN tot ON b.i = tot.i
    GROUP BY b.i
),
signed AS (
    SELECT i,
           CAST(CASE WHEN v >= 9223372036854775808
                     THEN v - 18446744073709551616 ELSE v END AS BIGINT) AS ihash
    FROM hashes
)'''


ORACLE_SQL = {
    "tile_assignment": f"""
        WITH img AS ({_IMG})
        SELECT image_id,
               CAST(floor(minx / 256) + dx.x AS BIGINT) AS tile_x,
               CAST(floor(miny / 256) + dy.y AS BIGINT) AS tile_y
        FROM img
        CROSS JOIN (SELECT unnest([0, 1]) AS x) dx
        CROSS JOIN (SELECT unnest([0, 1]) AS y) dy
        WHERE floor(minx / 256) + dx.x <= floor((maxx - 1e-9) / 256)
          AND floor(miny / 256) + dy.y <= floor((maxy - 1e-9) / 256)
    """,
    "pip_join": f"""
        WITH img AS ({_IMG}), pts AS ({_PTS})
        SELECT img.image_id, img.i, pts.event_id
        FROM img JOIN pts
          ON pts.px >= img.minx AND pts.px < img.maxx
         AND pts.py >= img.miny AND pts.py < img.maxy
    """,
    "pip_anti_join": f"""
        WITH img AS ({_IMG}), pts AS ({_PTS})
        SELECT pts.event_id
        FROM pts
        WHERE NOT EXISTS (
            SELECT 1 FROM img
            WHERE pts.px >= img.minx AND pts.px < img.maxx
              AND pts.py >= img.miny AND pts.py < img.maxy
        )
    """,
    "geo_pruned_read": f"""
        WITH img AS ({_IMG})
        SELECT image_id, minx, miny, maxx, maxy
        FROM img
        WHERE minx < 46600 AND maxx >= 25600 AND miny < 4096 AND maxy >= 0
    """,
    "spatial_pruned_read": f"""
        WITH pts AS ({_PTS})
        SELECT CAST(px AS BIGINT) // 2048 + 1024 * (CAST(py AS BIGINT) // 2048)
                   AS gcell,
               CAST(count(*) AS BIGINT) AS n_points,
               CAST(min(event_id) AS BIGINT) AS min_eid,
               CAST(sum(event_id) AS BIGINT) AS sum_eid
        FROM pts
        WHERE px >= 131072 AND px < 197608 AND py >= 0 AND py < 4096
        GROUP BY 1
    """,
    "pip_join_agg": f"""
        WITH img AS ({_IMG}), pts AS ({_PTS})
        SELECT img.image_id, count(*) AS n_points
        FROM img JOIN pts
          ON pts.px >= img.minx AND pts.px < img.maxx
         AND pts.py >= img.miny AND pts.py < img.maxy
        GROUP BY img.image_id
    """,
    "clip_join": f"""
        WITH img AS ({_IMG}),
        tiles AS (
            SELECT *,
                   CAST(floor(minx / 256) + dx.x AS BIGINT) AS tile_x,
                   CAST(floor(miny / 256) + dy.y AS BIGINT) AS tile_y
            FROM img
            CROSS JOIN (SELECT unnest([0, 1]) AS x) dx
            CROSS JOIN (SELECT unnest([0, 1]) AS y) dy
            WHERE floor(minx / 256) + dx.x <= floor((maxx - 1e-9) / 256)
              AND floor(miny / 256) + dy.y <= floor((maxy - 1e-9) / 256)
        )
        SELECT image_id, tile_x, tile_y,
               greatest(least(maxx, (tile_x + 1) * 256) - greatest(minx, tile_x * 256), 0)
             * greatest(least(maxy, (tile_y + 1) * 256) - greatest(miny, tile_y * 256), 0)
               AS clip_area
        FROM tiles
    """,
    "knn": f"""
        WITH pts AS ({_PTS}),
        q AS (
            SELECT CAST(n_nationkey AS BIGINT) AS q_id,
                   CAST(n_nationkey * 256 + 128 AS DOUBLE) AS qx,
                   CAST((n_nationkey % 5) * 256 + 128 AS DOUBLE) AS qy
            FROM nation
        )
        SELECT q_id, event_id,
               row_number() OVER (
                   PARTITION BY q_id
                   ORDER BY (px - qx) * (px - qx) + (py - qy) * (py - qy), event_id
               ) AS rnk
        FROM q CROSS JOIN pts
        QUALIFY rnk <= 5
    """,
    "dedup_events": """
        SELECT user_id, event_type, min(event_id) AS event_id
        FROM events GROUP BY user_id, event_type
    """,
    "dedup_docs": """
        SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
    """,
    "token_count": """
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    """,
    # same RE2 pattern the Ray stage compiles (stages/text.py
    # BPE_PRETOKEN_PATTERN) — leftmost-first alternation matches Python re
    "bpe_tokens": """
        SELECT doc_id,
               CAST(len(regexp_extract_all(
                   text, '''[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n]+|[ \t\n]+'
               )) AS BIGINT) AS n_bpe_tokens
        FROM documents
    """,
    "text_quality": """
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars_calc,
               CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(length(text) - (length(text) - length(replace(text, ' ', ''))) AS DOUBLE)
                 / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len
        FROM documents
    """,
    # curation_pipeline: quality rules, dedup, the prefix-filter-exact
    # jaccard pair rule and the multiplicative-hash split are ALL pure
    # functions of the text/ids, so the whole composed chain re-derives in
    # one CTE chain
    "curation_pipeline": """
        WITH q AS (
            SELECT doc_id, text,
                   len(string_split(text, ' ')) AS n_tokens,
                   CAST(length(text) - (length(text) - length(replace(text, ' ', '')))
                        AS DOUBLE) / len(string_split(text, ' ')) AS atl
            FROM documents
        ),
        f AS (SELECT doc_id, text FROM q
              WHERE n_tokens >= 5 AND atl >= 3 AND atl <= 12),
        d AS (SELECT min(doc_id) AS doc_id, text FROM f GROUP BY text),
        tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM d),
        sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(tk) - 1),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
            FROM tok WHERE len(tk) >= 3
        ),
        dup AS (
            SELECT DISTINCT b.doc_id AS doc_b
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                  / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
        ),
        keep AS (SELECT d.doc_id, d.text FROM d
                 WHERE d.doc_id NOT IN (SELECT doc_b FROM dup)),
        s AS (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   CASE WHEN (doc_id * 2654435761) % 4294967296 % 10 = 9
                        THEN 'val' ELSE 'train' END AS split
            FROM keep
        )
        SELECT split,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
               CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
        FROM s GROUP BY split
    """,
    "ann_topk": """
        WITH q AS (
            SELECT vec_id AS q_id, embedding AS qe FROM embeddings
            ORDER BY vec_id LIMIT 8
        )
        SELECT q_id, e.vec_id AS vec_id,
               row_number() OVER (
                   PARTITION BY q_id
                   ORDER BY list_cosine_similarity(qe, e.embedding) DESC, e.vec_id
               ) AS rnk
        FROM q CROSS JOIN embeddings e
        QUALIFY rnk <= 10
    """,
    # NOTE: DuckDB sum(BIGINT) returns HUGEINT (int128) which the driver's
    # hash path widens to float64 — CAST every aggregate back to BIGINT so the
    # oracle dtype matches the Ray int64 outputs exactly.
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_c,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)) AS BIGINT) AS sum_rev_u,
               count(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "events_window": """
        SELECT event_type,
               CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hour_bucket,
               count(*) AS n,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
        FROM events GROUP BY 1, 2
    """,
    # hopping window = UNION ALL of the two hop offsets (size/hop = 2)
    "hopping_window": """
        WITH assigned AS (
            SELECT event_type,
                   CAST(floor(epoch_us(ts) / 1800000000) * 1800000000 AS BIGINT)
                       AS wnd_start_us,
                   CAST(floor(value * 100) AS BIGINT) AS value_c
            FROM events
            UNION ALL
            SELECT event_type,
                   CAST(floor(epoch_us(ts) / 1800000000) * 1800000000
                        - 1800000000 AS BIGINT) AS wnd_start_us,
                   CAST(floor(value * 100) AS BIGINT) AS value_c
            FROM events
        )
        SELECT event_type, wnd_start_us,
               count(*) AS n,
               CAST(sum(value_c) AS BIGINT) AS sum_value_c
        FROM assigned GROUP BY 1, 2
    """,
    "top_orders": """
        SELECT o_orderkey, c_name, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    # no-prior-click is encoded as -1 (not NULL) on BOTH sides: a nullable
    # BIGINT degrades to float64-NaN through pandas, which breaks the driver's
    # dtype-sensitive value hash even when values agree.
    "range_join": """
        SELECT c.event_id AS click_id,
               p.event_id AS purchase_id
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id
         AND p.ts > c.ts
         AND p.ts <= c.ts + INTERVAL 6 HOUR
    """,
    "asof_join": """
        SELECT p.event_id AS purchase_id,
               CAST(coalesce(c.event_id, -1) AS BIGINT) AS click_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts > c.ts
    """,
    "sessionize": """
        WITH marked AS (
            SELECT user_id, event_id,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                            OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                        OR lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        sessions AS (
            SELECT user_id, event_id,
                   sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS session_seq
            FROM marked
        )
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
               count(*) AS n_events, min(event_id) AS first_event
        FROM sessions GROUP BY user_id, session_seq
    """,
    "fingerprint": """
        SELECT doc_id, md5(text) AS fp FROM documents
    """,
    # winnowing (Schleimer 2003) replayed in exact integer SQL: k=8-gram
    # polynomial hash over codepoints mod 1021 (base 131, exact in BIGINT),
    # fp key = (h % 2147483647) * 2^21 - pos (min key == min hash with the
    # RIGHTMOST position), one window-min per start, distinct selections.
    # Window starts are rows 1 .. npos-3 (or just row 1 when a doc has fewer
    # than 4 k-gram positions — the frame clips to all of them).
    "winnow_fp": """
        WITH idx AS (
            SELECT doc_id, text, length(text) - 7 AS npos,
                   unnest(range(1, greatest(length(text) - 6, 1))) AS i
            FROM documents
        ),
        pos AS (
            SELECT doc_id, CAST(i AS BIGINT) AS i, npos,
                   CAST(unicode(substr(text, CAST(i AS INT), 1)) % 1021 AS BIGINT) * 662062621900811
                 + CAST(unicode(substr(text, CAST(i AS INT) + 1, 1)) % 1021 AS BIGINT) * 5053913144281
                 + CAST(unicode(substr(text, CAST(i AS INT) + 2, 1)) % 1021 AS BIGINT) * 38579489651
                 + CAST(unicode(substr(text, CAST(i AS INT) + 3, 1)) % 1021 AS BIGINT) * 294499921
                 + CAST(unicode(substr(text, CAST(i AS INT) + 4, 1)) % 1021 AS BIGINT) * 2248091
                 + CAST(unicode(substr(text, CAST(i AS INT) + 5, 1)) % 1021 AS BIGINT) * 17161
                 + CAST(unicode(substr(text, CAST(i AS INT) + 6, 1)) % 1021 AS BIGINT) * 131
                 + (unicode(substr(text, CAST(i AS INT) + 7, 1)) % 1021)
                   AS h
            FROM idx
        ),
        keyed AS (
            SELECT doc_id, i, npos,
                   (h % 2147483647) * 2097152 - i AS key
            FROM pos
        ),
        wins AS (
            SELECT doc_id, i, npos,
                   min(key) OVER (
                       PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING
                   ) AS fp_key
            FROM keyed
        )
        SELECT DISTINCT doc_id, fp_key
        FROM wins
        WHERE i <= greatest(npos - 3, 1)
    """,
    # the LangId heuristic verbatim (stages/text.py): CJK codepoint in the
    # first 200 chars -> zh; else argmax of stopword counts with ties going
    # to the earlier language in (en, de, fr, es) profile order
    "lang_id": """
        WITH c AS (
            SELECT doc_id,
                   regexp_matches(left(text, 200), '[\\x{4e00}-\\x{9fff}]') AS cjk,
                   len(list_filter(string_split(lower(text), ' '),
                       w -> list_contains(['the','and','of','a','to','in','is','it','for'], w))) AS en_c,
                   len(list_filter(string_split(lower(text), ' '),
                       w -> list_contains(['der','die','und','das','ist','nicht','ein','zu'], w))) AS de_c,
                   len(list_filter(string_split(lower(text), ' '),
                       w -> list_contains(['le','la','les','et','est','une','pour','dans'], w))) AS fr_c,
                   len(list_filter(string_split(lower(text), ' '),
                       w -> list_contains(['el','la','los','y','es','una','para','en','que'], w))) AS es_c
            FROM documents
        )
        SELECT doc_id,
               CASE WHEN cjk THEN 'zh'
                    WHEN es_c > greatest(en_c, de_c, fr_c) THEN 'es'
                    WHEN fr_c > greatest(en_c, de_c) THEN 'fr'
                    WHEN de_c > en_c THEN 'de'
                    ELSE 'en' END AS lang_pred
        FROM c
    """,
    # corpus rule (q_buffer_by_m): segment (0,0)->(L,0) with constant M=m,
    # L = 10+k%7, m = 1+k%4; buffer = Minkowski sum of segment and 32-gon:
    # area = 16 m^2 sin(pi/16) + 2 m L (digest: floor(area*100))
    "buffer_by_m": """
        WITH p AS (
            SELECT s_suppkey,
                   CAST(1 + s_suppkey % 4 AS DOUBLE) AS m,
                   CAST(10 + s_suppkey % 7 AS DOUBLE) AS L
            FROM supplier
        )
        SELECT s_suppkey,
               CAST(floor((16 * m * m * sin(pi() / 16) + 2 * m * L) * 100) AS BIGINT)
                   AS buffer_area_c
        FROM p
    """,
    # corpus rule (q_overlay_nary): three overlapping axis-aligned integer
    # rectangles per key; union / difference / intersection areas recomputed
    # by inclusion-exclusion over the bounds — exact integer arithmetic, so
    # the sweep's float areas must round to the same scaled digests
    "overlay_nary": """
        WITH r AS (
            SELECT s_suppkey,
                   0 AS ax1, 0 AS ay1,
                   10 + s_suppkey % 5 AS ax2, 8 + s_suppkey % 3 AS ay2,
                   4 + s_suppkey % 3 AS bx1, 2 + s_suppkey % 2 AS by1,
                   13 + s_suppkey % 3 + s_suppkey % 4 AS bx2,
                   9 + 2 * (s_suppkey % 2) AS by2,
                   2 + s_suppkey % 2 AS cx1, 5 + s_suppkey % 3 AS cy1,
                   10 + s_suppkey % 2 + s_suppkey % 5 AS cx2,
                   11 + s_suppkey % 3 + s_suppkey % 4 AS cy2
            FROM supplier
        ),
        i AS (
            SELECT s_suppkey,
                   (ax2 - ax1) * (ay2 - ay1) AS a_a,
                   (bx2 - bx1) * (by2 - by1) AS a_b,
                   (cx2 - cx1) * (cy2 - cy1) AS a_c,
                   greatest(least(ax2, bx2) - greatest(ax1, bx1), 0)
                 * greatest(least(ay2, by2) - greatest(ay1, by1), 0) AS i_ab,
                   greatest(least(ax2, cx2) - greatest(ax1, cx1), 0)
                 * greatest(least(ay2, cy2) - greatest(ay1, cy1), 0) AS i_ac,
                   greatest(least(bx2, cx2) - greatest(bx1, cx1), 0)
                 * greatest(least(by2, cy2) - greatest(by1, cy1), 0) AS i_bc,
                   greatest(least(ax2, bx2, cx2) - greatest(ax1, bx1, cx1), 0)
                 * greatest(least(ay2, by2, cy2) - greatest(ay1, by1, cy1), 0)
                   AS i_abc
            FROM r
        )
        SELECT s_suppkey,
               CAST((a_a + a_b + a_c - i_ab - i_ac - i_bc + i_abc) * 100
                    AS BIGINT) AS union_area_c,
               CAST((a_a - i_ab - i_ac + i_abc) * 100 AS BIGINT) AS diff_area_c,
               CAST((i_ab + i_ac - i_abc) * 100 AS BIGINT) AS isect_area_c
        FROM i
    """,
    # corpus rule (q_squarish_grid): replay squarish_grid_dims in SQL.
    # Python round() is round-half-even; DuckDB round() is half-away-from-
    # zero, so halves (which occur: n/rows = 4.5) are emulated explicitly:
    # rhe(x) = floor(x)+floor(x)%2 when frac is exactly 0.5, else floor(x+.5).
    # Division order matches the Python solver (n / (W/H)) for IEEE identity.
    "squarish_grid": """
        WITH p AS (
            SELECT s_suppkey,
                   CAST(40 + s_suppkey % 7 * 10 AS DOUBLE) AS W,
                   CAST(30 + s_suppkey % 5 * 10 AS DOUBLE) AS H,
                   CAST(4 + s_suppkey % 13 AS BIGINT) AS n
            FROM supplier
        ),
        r AS (
            SELECT s_suppkey, n, sqrt(n / (W / H)) AS x
            FROM p
        ),
        rows_solved AS (
            SELECT s_suppkey, n,
                   least(greatest(
                       CASE WHEN x - floor(x) = 0.5
                            THEN CAST(floor(x) AS BIGINT)
                               + CAST(floor(x) AS BIGINT) % 2
                            ELSE CAST(floor(x + 0.5) AS BIGINT) END,
                       1), n) AS nb_rows
            FROM r
        ),
        cols_solved AS (
            SELECT s_suppkey, nb_rows,
                   CAST(n AS DOUBLE) / nb_rows AS y
            FROM rows_solved
        )
        SELECT s_suppkey,
               greatest(
                   CASE WHEN y - floor(y) = 0.5
                        THEN CAST(floor(y) AS BIGINT)
                           + CAST(floor(y) AS BIGINT) % 2
                        ELSE CAST(floor(y + 0.5) AS BIGINT) END,
                   1) AS nb_columns,
               nb_rows,
               greatest(
                   CASE WHEN y - floor(y) = 0.5
                        THEN CAST(floor(y) AS BIGINT)
                           + CAST(floor(y) AS BIGINT) % 2
                        ELSE CAST(floor(y + 0.5) AS BIGINT) END,
                   1) * nb_rows AS n_tiles
        FROM cols_solved
    """,
    # corpus rule (q_make_valid_area): bowtie (0,0)->(L,H)->(L,0)->(0,H)
    # self-crosses at the center; repair = two point-touching triangles
    # (valid MultiPolygon), total area exactly L*H/2
    "make_valid_area": """
        SELECT s_suppkey,
               CAST(2 AS BIGINT) AS n_parts,
               CAST(0 AS BIGINT) AS valid_in,
               CAST(1 AS BIGINT) AS valid_out,
               CAST((4 + s_suppkey % 9) * (2 + s_suppkey % 5) * 50 AS BIGINT)
                   AS area_c
        FROM supplier
    """,
    # corpus rule (q_difference_rects): 20x10 subject minus m = 1+k%4
    # strictly-interior disjoint unit squares -> one polygon, m holes,
    # area 200-m
    "difference_rects": """
        SELECT s_suppkey,
               CAST(1 AS BIGINT) AS n_polys,
               CAST(1 + s_suppkey % 4 AS BIGINT) AS n_holes,
               CAST((200 - (1 + s_suppkey % 4)) * 100 AS BIGINT) AS area_c
        FROM supplier
    """,
    # q_difference_tiled: 20 x (10 + k%4) subject minus 4 interior unit
    # squares, tiled through the Ray stage → 1 merged polygon, 4 holes,
    # area 20h - 4
    "difference_tiled": """
        SELECT s_suppkey,
               CAST(1 AS BIGINT) AS n_polys,
               CAST(4 AS BIGINT) AS n_holes,
               CAST((20 * (10 + s_suppkey % 4) - 4) * 100 AS BIGINT) AS area_c
        FROM supplier
    """,
    # corpus rule (q_split_tiles): one (0,0,W,H) tile toward wanted = 2+k%7
    # parts; the halve/third ratio loop gives counts {2:2,3:3,4:4,5:8,6:6,
    # 7:8,8:8}; split bounds telescope so the area sum is exactly W*H
    "split_tiles": """
        SELECT s_suppkey,
               CAST(CASE 2 + s_suppkey % 7
                    WHEN 2 THEN 2 WHEN 3 THEN 3 WHEN 4 THEN 4
                    WHEN 5 THEN 8 WHEN 6 THEN 6 ELSE 8 END AS BIGINT)
                   AS n_tiles,
               CAST((40 + s_suppkey % 4 * 10) * (30 + s_suppkey % 3 * 10)
                    * 100 AS BIGINT) AS area_c
        FROM supplier
    """,
    # corpus rule (q_inner_rings): 30x30 square, holes a = 1+k%9 and
    # b = 5+k%13; keep a hole iff area > 8 (min_area_to_keep = 8)
    "inner_rings": """
        SELECT s_suppkey,
               CAST((CASE WHEN 1 + s_suppkey % 9 > 8 THEN 1 ELSE 0 END)
                  + (CASE WHEN 5 + s_suppkey % 13 > 8 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_holes_kept,
               CAST((900
                  - (CASE WHEN 1 + s_suppkey % 9 > 8
                          THEN 1 + s_suppkey % 9 ELSE 0 END)
                  - (CASE WHEN 5 + s_suppkey % 13 > 8
                          THEN 5 + s_suppkey % 13 ELSE 0 END)) * 100
                  AS BIGINT) AS area_c
        FROM supplier
    """,
    # corpus rule (q_geom_zoo): p = 1+k%3 points, l = k%2 lines, q = 1+k%2
    # unit squares in a GeometryCollection; extract(polygon) keeps the q
    # squares, primitive ids: collection 0, polygon 3
    "geom_zoo": """
        SELECT s_suppkey,
               CAST((1 + s_suppkey % 3) + s_suppkey % 2 + (1 + s_suppkey % 2)
                   AS BIGINT) AS n_parts,
               CAST(1 + s_suppkey % 2 AS BIGINT) AS n_polys,
               CAST(0 AS BIGINT) AS ptype_coll,
               CAST(3 AS BIGINT) AS ptype_poly,
               CAST((1 + s_suppkey % 2) * 100 AS BIGINT) AS poly_area_c
        FROM supplier
    """,
    # corpus rule (q_subdivide_rect): 161-coord densified 12x8 rect with
    # num_coords_max = 40+(k%3)*10 -> ceil(161/ncm) in {5,4,3} squarish
    # tiles -> create_grid2 gives {4,4,3} non-empty parts; grid lines land
    # on exact binary fractions so the area sum is exactly 96
    "subdivide_rect": """
        SELECT s_suppkey,
               CAST(CASE s_suppkey % 3 WHEN 2 THEN 3 ELSE 4 END AS BIGINT)
                   AS n_parts,
               CAST(9600 AS BIGINT) AS area_c
        FROM supplier
    """,
    # corpus rule (q_extend_line): L-bend (0,0)->(L,0)->(L,L), first segment
    # points -x from the start and last +y from the end, so the extension is
    # pure integer arithmetic: length 2L+s+e, start x = -s, end y = L+e
    "extend_line": """
        SELECT s_suppkey,
               CAST((2 * (5 + s_suppkey % 6)
                     + (1 + s_suppkey % 3)
                     + (1 + s_suppkey % 4)) * 100 AS BIGINT) AS length_c,
               CAST(-(1 + s_suppkey % 3) * 100 AS BIGINT) AS start_x_c,
               CAST(((5 + s_suppkey % 6) + (1 + s_suppkey % 4)) * 100
                   AS BIGINT) AS end_y_c
        FROM supplier
    """,
    # corpus rule (q_collect_explode): collect->explode is a lossless
    # roundtrip over distinct points (custkey is unique), so part count and
    # min/max part x reduce to plain per-nation aggregates
    "collect_explode": """
        SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
               CAST(count(*) AS BIGINT) AS n_parts,
               CAST(min(c_custkey) * 100 AS BIGINT) AS min_x_c,
               CAST(max(c_custkey) * 100 AS BIGINT) AS max_x_c
        FROM customer
        GROUP BY c_nationkey
    """,
    # corpus rule (q_view_angles): segment (1+k%7, 1+k%5) -> (+2, +3) seen
    # from the origin; both endpoints strictly in quadrant I so the interval
    # is the endpoint-angle min/max — no 0-deg-ray disambiguation needed
    "view_angles": """
        WITH a AS (
            SELECT s_suppkey,
                   degrees(atan2(CAST(1 + s_suppkey % 5 AS DOUBLE),
                                 CAST(1 + s_suppkey % 7 AS DOUBLE))) AS a1,
                   degrees(atan2(CAST(4 + s_suppkey % 5 AS DOUBLE),
                                 CAST(3 + s_suppkey % 7 AS DOUBLE))) AS a2
            FROM supplier
        )
        SELECT s_suppkey,
               CAST(floor(least(a1, a2) * 10000000) AS BIGINT) AS start_c,
               CAST(floor(greatest(a1, a2) * 10000000) AS BIGINT) AS end_c
        FROM a
    """,
    # the image table has max(count(part), 1000) rows over ordinals 0..n-1;
    # the generator injects exactly one duplicate class per i%101==0 (i>0):
    # that ordinal reuses i-1's pixels (table/images.py:189). The engine
    # derives keepers from the image CONTENT (phash bucket + exact
    # quantized-pixel digest); the oracle re-derives them from the rule.
    "phash_dedup": """
        WITH n AS (SELECT greatest(count(*), 1000) AS cnt FROM part)
        SELECT CAST(u.i AS BIGINT) AS i
        FROM (SELECT unnest(range((SELECT cnt FROM n))) AS i) u
        WHERE NOT (u.i % 101 = 0 AND u.i > 0)
    """,
    # phash_near_dup: re-derive every image's integer block-mean hash from the
    # generator rule (same splitmix64/gradient/quantize replay as
    # image_features), assemble the 64-bit hash in HUGEINT, then the exact
    # all-pairs hamming check — bit-for-bit the kernel's arithmetic.
    "phash_near_dup": f"""
WITH {_IMG_IHASH_CTES}
SELECT CAST(a.i AS BIGINT) AS i_a, CAST(b.i AS BIGINT) AS i_b,
       CAST(bit_count(xor(a.ihash, b.ihash)) AS BIGINT) AS hamming
FROM signed a JOIN signed b ON a.i < b.i
WHERE bit_count(xor(a.ihash, b.ihash)) <= 3
    """,
    # zonal_stats: replay decode, then assign every pixel its 100-unit world
    # zone from the georeference rule and aggregate — pure integer SQL.
    "zonal_stats": """
WITH n AS (SELECT greatest(count(*), 1000) AS cnt FROM part),
ords AS (
    SELECT unnest(generate_series(0, CAST((SELECT cnt FROM n) AS BIGINT) - 1)) AS i
),
imgs AS (
    SELECT i,
           CAST(CASE WHEN i % 101 = 0 AND i > 0 THEN i - 1 ELSE i END AS HUGEINT) AS src,
           (i % 3 = 0) AS is_qz
    FROM ords
),
s0 AS (
    SELECT *, (src + 11400714819323198485) % 18446744073709551616 AS z0 FROM imgs
),
s0x AS (SELECT *, xor(z0, z0 // 1073741824) AS a0 FROM s0),
s1 AS (
    SELECT *,
           ((a0 % 4294967296) * 13787848793156543929
            + (((a0 // 4294967296) * 13787848793156543929) % 18446744073709551616)
              * 4294967296) % 18446744073709551616 AS z1
    FROM s0x
),
s1x AS (SELECT *, xor(z1, z1 // 134217728) AS a1 FROM s1),
s2 AS (
    SELECT *,
           ((a1 % 4294967296) * 10723151780598845931
            + (((a1 // 4294967296) * 10723151780598845931) % 18446744073709551616)
              * 4294967296) % 18446744073709551616 AS z2
    FROM s1x
),
seeds AS (SELECT *, xor(z2, z2 // 2147483648) AS seed FROM s2),
meta AS (
    SELECT CAST(i AS BIGINT) AS i, is_qz,
           CAST(16 + (src * 37) % 49 AS BIGINT) AS w,
           CAST(16 + (src * 53) % 41 AS BIGINT) AS h,
           CAST(seed % 256 AS BIGINT) AS o0,
           CAST((seed // 256) % 256 AS BIGINT) AS o1,
           CAST((seed // 65536) % 256 AS BIGINT) AS o2
    FROM seeds
),
dec AS (
    SELECT m.i, m.h, m.w, ys.y, xs.x,
           CASE WHEN is_qz THEN p0 - (p0 % 4) + 2 ELSE p0 END AS d0,
           CASE WHEN is_qz THEN p1 - (p1 % 4) + 2 ELSE p1 END AS d1,
           CASE WHEN is_qz THEN p2 - (p2 % 4) + 2 ELSE p2 END AS d2
    FROM meta m,
         LATERAL (SELECT unnest(generate_series(0, m.h - 1)) AS y) ys,
         LATERAL (SELECT unnest(generate_series(0, m.w - 1)) AS x) xs,
         LATERAL (SELECT (ys.y * 3 + xs.x * 5 + m.o0) % 256 AS p0,
                         (ys.y * 7 + xs.x * 2 + m.o1) % 256 AS p1,
                         (ys.y * 1 + xs.x * 11 + m.o2) % 256 AS p2) p
)
SELECT ((i % 1000) * 256 + x) // 100 AS zone_x,
       ((i // 1000) * 256 + y) // 100 AS zone_y,
       CAST(sum(d0 + d1 + d2) AS BIGINT) AS sum_gray,
       CAST(count(*) AS BIGINT) AS n_px
FROM dec
GROUP BY 1, 2
    """,
    # image_pyramid: replay decode, then BOTH 2x2 floor-mean levels — floor
    # division at each level, exactly the kernel's arithmetic.
    "image_pyramid": """
WITH n AS (SELECT greatest(count(*), 1000) AS cnt FROM part),
ords AS (
    SELECT unnest(generate_series(0, CAST((SELECT cnt FROM n) AS BIGINT) - 1)) AS i
),
imgs AS (
    SELECT i,
           CAST(CASE WHEN i % 101 = 0 AND i > 0 THEN i - 1 ELSE i END AS HUGEINT) AS src,
           (i % 3 = 0) AS is_qz
    FROM ords
),
s0 AS (
    SELECT *, (src + 11400714819323198485) % 18446744073709551616 AS z0 FROM imgs
),
s0x AS (SELECT *, xor(z0, z0 // 1073741824) AS a0 FROM s0),
s1 AS (
    SELECT *,
           ((a0 % 4294967296) * 13787848793156543929
            + (((a0 // 4294967296) * 13787848793156543929) % 18446744073709551616)
              * 4294967296) % 18446744073709551616 AS z1
    FROM s0x
),
s1x AS (SELECT *, xor(z1, z1 // 134217728) AS a1 FROM s1),
s2 AS (
    SELECT *,
           ((a1 % 4294967296) * 10723151780598845931
            + (((a1 // 4294967296) * 10723151780598845931) % 18446744073709551616)
              * 4294967296) % 18446744073709551616 AS z2
    FROM s1x
),
seeds AS (SELECT *, xor(z2, z2 // 2147483648) AS seed FROM s2),
meta AS (
    SELECT CAST(i AS BIGINT) AS i, is_qz,
           CAST(16 + (src * 37) % 49 AS BIGINT) AS w,
           CAST(16 + (src * 53) % 41 AS BIGINT) AS h,
           CAST(seed % 256 AS BIGINT) AS o0,
           CAST((seed // 256) % 256 AS BIGINT) AS o1,
           CAST((seed // 65536) % 256 AS BIGINT) AS o2
    FROM seeds
),
dec AS (
    SELECT m.i, m.h, m.w, ys.y, xs.x,
           CASE WHEN is_qz THEN p0 - (p0 % 4) + 2 ELSE p0 END AS d0,
           CASE WHEN is_qz THEN p1 - (p1 % 4) + 2 ELSE p1 END AS d1,
           CASE WHEN is_qz THEN p2 - (p2 % 4) + 2 ELSE p2 END AS d2
    FROM meta m,
         LATERAL (SELECT unnest(generate_series(0, m.h - 1)) AS y) ys,
         LATERAL (SELECT unnest(generate_series(0, m.w - 1)) AS x) xs,
         LATERAL (SELECT (ys.y * 3 + xs.x * 5 + m.o0) % 256 AS p0,
                         (ys.y * 7 + xs.x * 2 + m.o1) % 256 AS p1,
                         (ys.y * 1 + xs.x * 11 + m.o2) % 256 AS p2) p
),
lvl1 AS (
    SELECT i, h, w, y // 2 AS yb, x // 2 AS xb,
           sum(d0) // 4 AS e0, sum(d1) // 4 AS e1, sum(d2) // 4 AS e2
    FROM dec
    WHERE y < 2 * (h // 2) AND x < 2 * (w // 2)
    GROUP BY i, h, w, y // 2, x // 2
),
lvl2 AS (
    SELECT i, h, w, yb // 2 AS yb2, xb // 2 AS xb2,
           sum(e0) // 4 AS f0, sum(e1) // 4 AS f1, sum(e2) // 4 AS f2
    FROM lvl1
    WHERE yb < 2 * ((h // 2) // 2) AND xb < 2 * ((w // 2) // 2)
    GROUP BY i, h, w, yb // 2, xb // 2
)
SELECT CAST(i AS BIGINT) AS i, CAST(1 AS BIGINT) AS level,
       CAST(w // 2 AS BIGINT) AS w, CAST(h // 2 AS BIGINT) AS h,
       CAST(sum(e0 + e1 + e2) AS BIGINT) AS sum_rgb,
       CAST(sum(e0 * e0 + e1 * e1 + e2 * e2) AS BIGINT) AS sum_sq,
       CAST(1 AS BIGINT) AS pyramid_ok
FROM lvl1 GROUP BY i, h, w
UNION ALL
SELECT CAST(i AS BIGINT) AS i, CAST(2 AS BIGINT) AS level,
       CAST((w // 2) // 2 AS BIGINT) AS w, CAST((h // 2) // 2 AS BIGINT) AS h,
       CAST(sum(f0 + f1 + f2) AS BIGINT) AS sum_rgb,
       CAST(sum(f0 * f0 + f1 * f1 + f2 * f2) AS BIGINT) AS sum_sq,
       CAST(1 AS BIGINT) AS pyramid_ok
FROM lvl2 GROUP BY i, h, w
    """,
    # corpus rule (q_simplify_geo): W x H rectangle densified to unit spacing
    # (W = 16 + k%5*8, H = 8 + k%3*4); RDP at tol 0.5 keeps exactly the 4
    # corners (+ ring closure) and preserves the area
    "simplify_geo": """
        SELECT s_suppkey,
               CAST(2 * ((16 + s_suppkey % 5 * 8) + (8 + s_suppkey % 3 * 4)) + 1
                    AS BIGINT) AS n_pts_in,
               CAST(5 AS BIGINT) AS n_pts_out,
               CAST((16 + s_suppkey % 5 * 8) * (8 + s_suppkey % 3 * 4) * 100
                    AS BIGINT) AS area_c
        FROM supplier
    """,
    # corpus rule (q_centerline): the reference golden 10x2 rectangle
    # (medial axis LINESTRING (1 1, 9 1), length 8) scaled by s = 1 + k%4
    # and translated — similarity transforms commute with the medial axis,
    # so length = 8s exactly
    "centerline": """
        SELECT s_suppkey,
               CAST(800 * (1 + s_suppkey % 4) AS BIGINT) AS centerline_len_c
        FROM supplier
    """,
    # exact word-3-gram Jaccard all-pairs: the Ray side's prefix filter has
    # guaranteed recall, so the literal O(n^2) recomputation is an exact
    # oracle. DuckDB integer division of the same ints is IEEE-identical to
    # the Ray side's inter/union.
    "jaccard_pairs": """
        WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(tk) - 1),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
            FROM tok WHERE len(tk) >= 3
        ),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   len(list_intersect(a.s, b.s)) AS i,
                   len(a.s) AS na, len(b.s) AS nb
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, CAST(i AS DOUBLE) / (na + nb - i) AS jaccard
        FROM pairs WHERE CAST(i AS DOUBLE) / (na + nb - i) >= 0.5
    """,
    # 64-bit SimHash recomputed bit-by-bit: token hash = md5_number_lower
    # (the Ray side uses the little-endian low 8 bytes of hashlib.md5 — the
    # identical value), votes +1/-1 per token occurrence, bit set iff vote>0
    "simhash": """
        WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        h AS (SELECT doc_id, md5_number_lower(w) AS hw FROM tok),
        votes AS (
            SELECT doc_id, b.bit,
                   sum(CASE WHEN (hw >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
            FROM h CROSS JOIN (SELECT unnest(range(64)) AS bit) b
            GROUP BY doc_id, b.bit
        )
        SELECT doc_id,
               CAST(sum(CASE WHEN v > 0 THEN (1::UBIGINT << bit) ELSE 0::UBIGINT END)
                    AS UBIGINT) AS simhash
        FROM votes GROUP BY doc_id
    """,
    "simhash_pairs": """
        WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        h AS (SELECT doc_id, md5_number_lower(w) AS hw FROM tok),
        votes AS (
            SELECT doc_id, b.bit,
                   sum(CASE WHEN (hw >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
            FROM h CROSS JOIN (SELECT unnest(range(64)) AS bit) b
            GROUP BY doc_id, b.bit
        ),
        sh AS (
            SELECT doc_id,
                   CAST(sum(CASE WHEN v > 0 THEN (1::UBIGINT << bit) ELSE 0::UBIGINT END)
                        AS UBIGINT) AS simhash
            FROM votes GROUP BY doc_id
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    # exact cosine pairs: threshold 0.45 sits >=1e-4 away from every pair's
    # similarity at sf0.001/0.01/0.1 (measured), far above float64-vs-DOUBLE[]
    # rounding (~1e-15), so the numpy and DuckDB pair sets are identical
    "cosine_pairs": """
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.45
    """,
    # corpus rule (q_topo_simplify): rows of 8 adjacent W x 8 rectangles per
    # topology group; shared-arc RDP keeps exactly the ring corners
    "topo_simplify": """
        SELECT s_suppkey,
               CAST(5 AS BIGINT) AS n_pts_out,
               CAST((16 + (s_suppkey // 8) % 5 * 8) * 8 * 100 AS BIGINT) AS area_c
        FROM supplier
    """,
    # MinHash-LSH near-dup: recall is probabilistic in general, but on this
    # corpus every qualifying pair has J >= 0.8 (16 bands x 4 rows -> miss
    # probability ~2e-4/pair) and the seeded pipeline is deterministic; the
    # output was verified EQUAL to this exact all-pairs recomputation at
    # sf0.001 and sf0.01. The guaranteed-recall variant is jaccard_pairs.
    "near_dup_pairs": """
        WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(tk) - 1),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
            FROM tok WHERE len(tk) >= 3
        ),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   len(list_intersect(a.s, b.s)) AS i,
                   len(a.s) AS na, len(b.s) AS nb
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, CAST(i AS DOUBLE) / (na + nb - i) AS jaccard
        FROM pairs WHERE CAST(i AS DOUBLE) / (na + nb - i) >= 0.5
    """,
    # ann_lsh / ann_ivf weak oracle: the query itself measures recall@10 of
    # the approximate index against the exact top-10 (same table, same run)
    # and emits recall_ok — the oracle asserts the contract (1), so a recall
    # regression turns the driver hash red. n_queries mirrors the query's
    # first-8-vec_id selection rule in SQL.
    "ann_lsh": """
        SELECT CAST(least(count(*), 8) AS BIGINT) AS n_queries,
               CAST(10 AS BIGINT) AS k,
               CAST(1 AS BIGINT) AS recall_ok
        FROM embeddings
    """,
    "ann_ivf": """
        SELECT CAST(least(count(*), 8) AS BIGINT) AS n_queries,
               CAST(10 AS BIGINT) AS k,
               CAST(1 AS BIGINT) AS recall_ok
        FROM embeddings
    """,
    "table_profile": """
        SELECT col AS "column", n, n_null, min_v, max_v, n_distinct FROM (
          SELECT 'l_orderkey' AS col,
                 CAST(count(l_orderkey) AS BIGINT) AS n,
                 CAST(count(*) - count(l_orderkey) AS BIGINT) AS n_null,
                 CAST(min(l_orderkey) AS DOUBLE) AS min_v,
                 CAST(max(l_orderkey) AS DOUBLE) AS max_v,
                 CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_distinct
          FROM lineitem
          UNION ALL
          SELECT 'l_quantity', CAST(count(l_quantity) AS BIGINT),
                 CAST(count(*) - count(l_quantity) AS BIGINT),
                 CAST(min(l_quantity) AS DOUBLE), CAST(max(l_quantity) AS DOUBLE),
                 CAST(count(DISTINCT l_quantity) AS BIGINT)
          FROM lineitem
          UNION ALL
          SELECT 'l_extendedprice', CAST(count(l_extendedprice) AS BIGINT),
                 CAST(count(*) - count(l_extendedprice) AS BIGINT),
                 CAST(min(l_extendedprice) AS DOUBLE),
                 CAST(max(l_extendedprice) AS DOUBLE),
                 CAST(count(DISTINCT l_extendedprice) AS BIGINT)
          FROM lineitem
          UNION ALL
          SELECT 'l_discount', CAST(count(l_discount) AS BIGINT),
                 CAST(count(*) - count(l_discount) AS BIGINT),
                 CAST(min(l_discount) AS DOUBLE), CAST(max(l_discount) AS DOUBLE),
                 CAST(count(DISTINCT l_discount) AS BIGINT)
          FROM lineitem
        ) ORDER BY "column"
    """,
    # quarantine_decode: the corruption rule (i % 97 == 0 → truncated bytes)
    # is pure arithmetic, so BOTH paths — surviving-stream count and the
    # dead-letter sink contents — re-derive exactly in SQL
    "quarantine_decode": """
        WITH n AS (SELECT greatest(count(*), 1000) AS cnt FROM part),
        s AS (SELECT unnest(generate_series(0,
                   CAST((SELECT cnt FROM n) AS BIGINT) - 1)) AS i)
        SELECT CAST((SELECT cnt FROM n) AS BIGINT) AS n_total,
               CAST(count(*) FILTER (WHERE i % 97 <> 0) AS BIGINT) AS n_ok,
               CAST(count(*) FILTER (WHERE i % 97 = 0) AS BIGINT) AS n_quarantined,
               CAST(coalesce(sum(i) FILTER (WHERE i % 97 = 0), 0) AS BIGINT)
                   AS sum_quarantined
        FROM s
    """,
    # ann_ivf_disk: recall contract plus the I/O-pruning contract — the query
    # reads only probed partitions of the persisted index; pruned_ok asserts
    # files_read < files_total actually held
    "ann_ivf_disk": """
        SELECT CAST(least(count(*), 8) AS BIGINT) AS n_queries,
               CAST(10 AS BIGINT) AS k,
               CAST(1 AS BIGINT) AS recall_ok,
               CAST(1 AS BIGINT) AS pruned_ok
        FROM embeddings
    """,
    # image_features: the generator (splitmix64 offsets + per-axis gradient
    # mod 256 + raw0/qz1 decode) is re-derived entirely in SQL — integer pixel
    # digests are exact, so the oracle value-checks decode end-to-end;
    # features_ok binds the float feature vector in-run (_FeatureDigestStage).
    "image_features": """
WITH n AS (SELECT greatest(count(*), 1000) AS cnt FROM part),
ords AS (
    SELECT unnest(generate_series(0, CAST((SELECT cnt FROM n) AS BIGINT) - 1)) AS i
),
imgs AS (
    SELECT i,
           CAST(CASE WHEN i % 101 = 0 AND i > 0 THEN i - 1 ELSE i END AS HUGEINT) AS src,
           (i % 3 = 0) AS is_qz
    FROM ords
),
-- splitmix64(src): mod-2^64 arithmetic in HUGEINT (mulmod via 32-bit split)
s0 AS (
    SELECT *, (src + 11400714819323198485) % 18446744073709551616 AS z0 FROM imgs
),
s0x AS (SELECT *, xor(z0, z0 // 1073741824) AS a0 FROM s0),
s1 AS (
    SELECT *,
           ((a0 % 4294967296) * 13787848793156543929
            + (((a0 // 4294967296) * 13787848793156543929) % 18446744073709551616)
              * 4294967296) % 18446744073709551616 AS z1
    FROM s0x
),
s1x AS (SELECT *, xor(z1, z1 // 134217728) AS a1 FROM s1),
s2 AS (
    SELECT *,
           ((a1 % 4294967296) * 10723151780598845931
            + (((a1 // 4294967296) * 10723151780598845931) % 18446744073709551616)
              * 4294967296) % 18446744073709551616 AS z2
    FROM s1x
),
seeds AS (SELECT *, xor(z2, z2 // 2147483648) AS seed FROM s2),
meta AS (
    SELECT CAST(i AS BIGINT) AS i, is_qz,
           CAST(16 + (src * 37) % 49 AS BIGINT) AS w,
           CAST(16 + (src * 53) % 41 AS BIGINT) AS h,
           CAST(seed % 256 AS BIGINT) AS o0,
           CAST((seed // 256) % 256 AS BIGINT) AS o1,
           CAST((seed // 65536) % 256 AS BIGINT) AS o2
    FROM seeds
),
dec AS (
    SELECT m.i, m.h, m.w, ys.y, xs.x,
           CASE WHEN is_qz THEN p0 - (p0 % 4) + 2 ELSE p0 END AS d0,
           CASE WHEN is_qz THEN p1 - (p1 % 4) + 2 ELSE p1 END AS d1,
           CASE WHEN is_qz THEN p2 - (p2 % 4) + 2 ELSE p2 END AS d2
    FROM meta m,
         LATERAL (SELECT unnest(generate_series(0, m.h - 1)) AS y) ys,
         LATERAL (SELECT unnest(generate_series(0, m.w - 1)) AS x) xs,
         LATERAL (SELECT (ys.y * 3 + xs.x * 5 + m.o0) % 256 AS p0,
                         (ys.y * 7 + xs.x * 2 + m.o1) % 256 AS p1,
                         (ys.y * 1 + xs.x * 11 + m.o2) % 256 AS p2) p
)
SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,
       CAST(sum(d0 + d1 + d2) AS BIGINT) AS sum_rgb,
       CAST(sum(d0 * d0 + d1 * d1 + d2 * d2) AS BIGINT) AS sum_sq,
       CAST(sum((((4 * y + 3) // h) * 4 + ((4 * x + 3) // w) + 1) * (d0 + d1 + d2))
            AS BIGINT) AS cell_wsum,
       CAST(1 AS BIGINT) AS features_ok
FROM dec
GROUP BY i
    """,
    # audio_features: every int8 sample re-derived from the generator rule
    # (table/audio.py) — exact integer features check decode + kernel e2e
    "audio_features": """
WITH n AS (SELECT greatest(count(*), 500) AS cnt FROM documents),
clips AS (
    SELECT unnest(generate_series(0, CAST((SELECT cnt FROM n) AS BIGINT) - 1)) AS i
),
meta AS (
    SELECT i, 4000 + (i * 13) % 1000 AS ns,
           1 + (i * 7919) % 17 AS a, (i * 104729) % 256 AS b
    FROM clips
),
smp AS (
    SELECT m.i, t.t, ((m.a * t.t + m.b) % 256) - 128 AS s
    FROM meta m, LATERAL (SELECT unnest(generate_series(0, m.ns - 1)) AS t) t
),
feat AS (
    SELECT i,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(abs(s)) AS BIGINT) AS sum_abs,
           CAST(sum(s * s) AS BIGINT) AS energy,
           CAST(max(abs(s)) AS BIGINT) AS max_abs
    FROM smp GROUP BY i
),
zc AS (
    SELECT i, CAST(count(*) FILTER (WHERE s * s_next < 0) AS BIGINT) AS zero_crossings
    FROM (SELECT i, s, lead(s) OVER (PARTITION BY i ORDER BY t) AS s_next FROM smp)
    GROUP BY i
)
SELECT 'clip_' || lpad(CAST(f.i AS VARCHAR), 10, '0') AS clip_id,
       f.n_samples, f.sum_abs, f.energy, f.max_abs, z.zero_crossings
FROM feat f JOIN zc z USING (i)
    """,
    # audio_resample: nearest-sample resample to 4 kHz — output sample k maps
    # to input index (k*rate)//4000, n_out = ceil(ns*4000/rate), all integer
    "audio_resample": """
WITH n AS (SELECT greatest(count(*), 500) AS cnt FROM documents),
clips AS (
    SELECT unnest(generate_series(0, CAST((SELECT cnt FROM n) AS BIGINT) - 1)) AS i
),
meta AS (
    SELECT i, 4000 + (i * 13) % 1000 AS ns,
           1 + (i * 7919) % 17 AS a, (i * 104729) % 256 AS b,
           8000 + 1000 * (i % 3) AS rate
    FROM clips
),
rs AS (SELECT *, (ns * 4000 + rate - 1) // rate AS n_out FROM meta),
smp AS (
    SELECT m.i, k.k,
           ((m.a * ((k.k * m.rate) // 4000) + m.b) % 256) - 128 AS s
    FROM rs m, LATERAL (SELECT unnest(generate_series(0, m.n_out - 1)) AS k) k
),
feat AS (
    SELECT i,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(abs(s)) AS BIGINT) AS sum_abs,
           CAST(sum(s * s) AS BIGINT) AS energy,
           CAST(max(abs(s)) AS BIGINT) AS max_abs
    FROM smp GROUP BY i
),
zc AS (
    SELECT i, CAST(count(*) FILTER (WHERE s * s_next < 0) AS BIGINT) AS zero_crossings
    FROM (SELECT i, s, lead(s) OVER (PARTITION BY i ORDER BY k) AS s_next FROM smp)
    GROUP BY i
)
SELECT 'clip_' || lpad(CAST(f.i AS VARCHAR), 10, '0') AS clip_id,
       f.n_samples, f.sum_abs, f.energy, f.max_abs, z.zero_crossings
FROM feat f JOIN zc z USING (i)
    """,
    # video_frames: sampled-frame pixel digests re-derived from the vz1 frame
    # generator rule (table/video.py) + qz1 requantization, all integer
    "video_frames": """
WITH n AS (SELECT greatest(2 * count(*), 200) AS cnt FROM supplier),
vids AS (
    SELECT unnest(generate_series(0, CAST((SELECT cnt FROM n) AS BIGINT) - 1)) AS v
),
meta AS (
    SELECT v, 16 + (v * 7) % 17 AS nf,
           16 + (v * 37) % 33 AS w, 16 + (v * 53) % 29 AS h
    FROM vids
),
fr AS (
    SELECT m.v, m.w, m.h, j.j
    FROM meta m, LATERAL (SELECT unnest(generate_series(0, m.nf - 1)) AS j) j
    WHERE j.j % 5 = 0
),
dec AS (
    SELECT f.v, f.j,
           p0 - (p0 % 4) + 2 AS d0,
           p1 - (p1 % 4) + 2 AS d1,
           p2 - (p2 % 4) + 2 AS d2
    FROM fr f,
         LATERAL (SELECT unnest(generate_series(0, f.h - 1)) AS y) ys,
         LATERAL (SELECT unnest(generate_series(0, f.w - 1)) AS x) xs,
         LATERAL (SELECT (ys.y * 3 + xs.x * 5 + (f.v * 11 + f.j * 17) % 256) % 256 AS p0,
                         (ys.y * 7 + xs.x * 2 + (f.v * 23 + f.j * 29) % 256) % 256 AS p1,
                         (ys.y * 1 + xs.x * 11 + (f.v * 31 + f.j * 41) % 256) % 256 AS p2) p
)
SELECT 'vid_' || lpad(CAST(v AS VARCHAR), 10, '0') AS video_id,
       CAST(j AS BIGINT) AS frame_idx,
       CAST(sum(d0 + d1 + d2) AS BIGINT) AS sum_rgb
FROM dec
GROUP BY v, j
    """,
    # geo_csv: the synthesized rect rule is plain arithmetic on the ordinal
    # (CSV keys are 0..n-1 where n = supplier row count)
    "geo_csv": """
WITH n AS (SELECT count(*) AS cnt FROM supplier),
ks AS (
    SELECT unnest(generate_series(0, CAST((SELECT cnt FROM n) AS BIGINT) - 1)) AS k
)
SELECT CAST(k AS BIGINT) AS s_suppkey,
       CAST((1 + k % 5) * (1 + k % 7) AS BIGINT) AS area_i,
       CAST(2 * ((1 + k % 5) + (1 + k % 7)) AS BIGINT) AS perim_i,
       CAST(k % 100 AS BIGINT) AS minx_i,
       CAST(k // 100 + 1 + k % 7 AS BIGINT) AS maxy_i
FROM ks
    """,
    # kmeans: the integer Lloyd's algorithm replayed verbatim — quantize
    # floor(x*100)+128 (shift keeps // floor/trunc-agnostic), centroids S//n,
    # ties to smallest cluster, emptied cluster keeps its previous centroid
    "kmeans": """
WITH qv AS (
    SELECT vec_id,
           CAST(unnest(range(len(embedding))) AS BIGINT) AS idx,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 100) AS BIGINT) + 128 AS q
    FROM embeddings
),
c0ids AS (
    SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS j
    FROM embeddings ORDER BY vec_id LIMIT 8
),
cent0 AS (SELECT i.j, qv.idx, qv.q AS c FROM c0ids i JOIN qv USING (vec_id)),
d1 AS (
    SELECT qv.vec_id, c.j, sum((qv.q - c.c) * (qv.q - c.c)) AS d2
    FROM qv JOIN cent0 c USING (idx) GROUP BY qv.vec_id, c.j
),
a1 AS (
    SELECT vec_id, j FROM (
        SELECT vec_id, j,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, j) AS rn
        FROM d1
    ) WHERE rn = 1
),
s1 AS (
    SELECT a1.j, qv.idx, sum(qv.q) AS sq, count(*) AS n
    FROM a1 JOIN qv USING (vec_id) GROUP BY a1.j, qv.idx
),
cent1 AS (
    SELECT c0.j, c0.idx, COALESCE(CAST(s1.sq // s1.n AS BIGINT), c0.c) AS c
    FROM cent0 c0 LEFT JOIN s1 ON s1.j = c0.j AND s1.idx = c0.idx
),
d2_ AS (
    SELECT qv.vec_id, c.j, sum((qv.q - c.c) * (qv.q - c.c)) AS d2
    FROM qv JOIN cent1 c USING (idx) GROUP BY qv.vec_id, c.j
),
a2 AS (
    SELECT vec_id, j FROM (
        SELECT vec_id, j,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, j) AS rn
        FROM d2_
    ) WHERE rn = 1
),
s2 AS (
    SELECT a2.j, qv.idx, sum(qv.q) AS sq, count(*) AS n
    FROM a2 JOIN qv USING (vec_id) GROUP BY a2.j, qv.idx
),
cent2 AS (
    SELECT c1.j, c1.idx, COALESCE(CAST(s2.sq // s2.n AS BIGINT), c1.c) AS c
    FROM cent1 c1 LEFT JOIN s2 ON s2.j = c1.j AND s2.idx = c1.idx
),
df AS (
    SELECT qv.vec_id, c.j, sum((qv.q - c.c) * (qv.q - c.c)) AS d2
    FROM qv JOIN cent2 c USING (idx) GROUP BY qv.vec_id, c.j
)
SELECT vec_id, CAST(j AS BIGINT) AS cluster, CAST(d2 AS BIGINT) AS dist2
FROM (
    SELECT vec_id, j, d2,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, j) AS rn
    FROM df
) WHERE rn = 1
    """,
    "topn_per_key": """
        SELECT user_id, event_id, CAST(rn AS BIGINT) AS rnk
        FROM (
            SELECT user_id, event_id,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn
            FROM events
        ) WHERE rn <= 3
    """,
    "top_terms": """
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        tf AS (
            SELECT doc_id, term, count(*) AS tf FROM toks
            WHERE term <> '' GROUP BY doc_id, term
        ),
        dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        ranked AS (
            SELECT doc_id, term, tf,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY tf DESC, term
                   ) AS rnk
            FROM tf
        )
        SELECT r.doc_id, r.term, CAST(r.tf AS BIGINT) AS tf,
               CAST(r.rnk AS BIGINT) AS rnk, CAST(d.df AS BIGINT) AS df
        FROM ranked r JOIN dfq d USING (term)
        WHERE r.rnk <= 3
    """,
    "global_rank": """
        SELECT event_id,
               CAST(row_number() OVER (ORDER BY ts, event_id) AS BIGINT) AS rnk
        FROM events
    """,
    "group_median": """
        WITH h AS (
            SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS v, count(*) AS c
            FROM events GROUP BY 1, 2
        ),
        cum AS (
            SELECT user_id, v,
                   sum(c) OVER (PARTITION BY user_id ORDER BY v) AS cum
            FROM h
        ),
        n AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1)
        SELECT n.user_id, CAST(min(cum.v) AS BIGINT) AS median_c,
               CAST(n.n AS BIGINT) AS n
        FROM n JOIN cum ON n.user_id = cum.user_id
        WHERE cum.cum >= (50 * n.n + 99) // 100
        GROUP BY n.user_id, n.n
    """,
    # quantiles: smallest v with cumulative count >= ceil(p*n/100), exact
    "quantiles": """
        WITH h AS (
            SELECT CAST(floor(value * 100) AS BIGINT) AS v, count(*) AS c
            FROM events GROUP BY 1
        ),
        cum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM h),
        n AS (SELECT count(*) AS n FROM events),
        p AS (SELECT unnest([25, 50, 75, 99]) AS pct)
        SELECT CAST(p.pct AS BIGINT) AS pct, CAST(min(cum.v) AS BIGINT) AS value_c
        FROM p, cum, n
        WHERE cum.cum >= (p.pct * n.n + 99) // 100
        GROUP BY p.pct
    """,
    # bloom_semi_join: the Bloom pass is exact end-to-end (no false
    # negatives; FPs removed by the left_semi join), so the oracle is the
    # plain semi-join aggregate
    "bloom_semi_join": """
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
                   AS sum_qty_c
        FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders WHERE o_totalprice > 250000.0
        )
        GROUP BY l_returnflag
    """,
    # cust_order_stats: LEFT OUTER join semantics — inactive customers
    # (no orders) must survive with zero-filled measures
    "cust_order_stats": """
        WITH per AS (
            SELECT o_custkey,
                   count(*) AS n_orders,
                   sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS spend_c
            FROM orders GROUP BY o_custkey
        )
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_cust,
               CAST(count(*) FILTER (WHERE per.o_custkey IS NULL) AS BIGINT)
                   AS n_inactive,
               CAST(coalesce(sum(per.n_orders), 0) AS BIGINT) AS n_orders,
               CAST(coalesce(sum(per.spend_c), 0) AS BIGINT) AS spend_c
        FROM customer LEFT JOIN per ON c_custkey = per.o_custkey
        GROUP BY c_mktsegment
    """,
    # stratified_sample: the multiplicative-hash membership rule replayed
    # verbatim (uint64 wraparound preserves the mod-2^32 value, so BIGINT
    # arithmetic agrees with the engine's numpy uint64 at these key ranges)
    "stratified_sample": """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_sampled,
               CAST(sum(o_orderkey) AS BIGINT) AS sum_okey
        FROM orders
        WHERE (o_orderkey * 2654435761) % 4294967296 % 100
              < CAST(substr(o_orderpriority, 1, 1) AS INTEGER) * 10
        GROUP BY o_orderpriority
    """,
    # sales_rollup: ROLLUP levels with 'ALL' sentinel labels
    "sales_rollup": """
        SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
               coalesce(l_linestatus, 'ALL') AS l_linestatus,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
                   AS sum_qty_c,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   AS sum_base_c
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    # embed_quantize: the quantization transform replayed per element
    # (float32 -> float64 cast is exact on both sides)
    "embed_quantize": """
        SELECT vec_id,
               CAST(sum(qv) AS BIGINT) AS sum_q,
               CAST(sum(qv * qv) AS BIGINT) AS sum_q2,
               CAST(sum(qv * i) AS BIGINT) AS wsum
        FROM (
            SELECT vec_id,
                   CAST(floor(CAST(x AS DOUBLE) * 100) AS BIGINT) + 128 AS qv,
                   i
            FROM (
                SELECT vec_id, unnest(embedding) AS x,
                       generate_subscripts(embedding, 1) AS i
                FROM embeddings
            )
        )
        GROUP BY vec_id
    """,
    # image_augment: decode replayed from the generator rule (same splitmix64
    # CTE chain as image_features); flip/rot180 digests are the SAME pixels
    # with mirrored position weights — a wrong flip axis or off-by-one in the
    # engine's transform changes the sum
    "image_augment": """
WITH n AS (SELECT greatest(count(*), 1000) AS cnt FROM part),
ords AS (
    SELECT unnest(generate_series(0, CAST((SELECT cnt FROM n) AS BIGINT) - 1)) AS i
),
imgs AS (
    SELECT i,
           CAST(CASE WHEN i % 101 = 0 AND i > 0 THEN i - 1 ELSE i END AS HUGEINT) AS src,
           (i % 3 = 0) AS is_qz
    FROM ords
),
s0 AS (
    SELECT *, (src + 11400714819323198485) % 18446744073709551616 AS z0 FROM imgs
),
s0x AS (SELECT *, xor(z0, z0 // 1073741824) AS a0 FROM s0),
s1 AS (
    SELECT *,
           ((a0 % 4294967296) * 13787848793156543929
            + (((a0 // 4294967296) * 13787848793156543929) % 18446744073709551616)
              * 4294967296) % 18446744073709551616 AS z1
    FROM s0x
),
s1x AS (SELECT *, xor(z1, z1 // 134217728) AS a1 FROM s1),
s2 AS (
    SELECT *,
           ((a1 % 4294967296) * 10723151780598845931
            + (((a1 // 4294967296) * 10723151780598845931) % 18446744073709551616)
              * 4294967296) % 18446744073709551616 AS z2
    FROM s1x
),
seeds AS (SELECT *, xor(z2, z2 // 2147483648) AS seed FROM s2),
meta AS (
    SELECT CAST(i AS BIGINT) AS i, is_qz,
           CAST(16 + (src * 37) % 49 AS BIGINT) AS w,
           CAST(16 + (src * 53) % 41 AS BIGINT) AS h,
           CAST(seed % 256 AS BIGINT) AS o0,
           CAST((seed // 256) % 256 AS BIGINT) AS o1,
           CAST((seed // 65536) % 256 AS BIGINT) AS o2
    FROM seeds
),
dec AS (
    SELECT m.i, m.h, m.w, ys.y, xs.x,
           CASE WHEN is_qz THEN p0 - (p0 % 4) + 2 ELSE p0 END AS d0,
           CASE WHEN is_qz THEN p1 - (p1 % 4) + 2 ELSE p1 END AS d1,
           CASE WHEN is_qz THEN p2 - (p2 % 4) + 2 ELSE p2 END AS d2
    FROM meta m,
         LATERAL (SELECT unnest(generate_series(0, m.h - 1)) AS y) ys,
         LATERAL (SELECT unnest(generate_series(0, m.w - 1)) AS x) xs,
         LATERAL (SELECT (ys.y * 3 + xs.x * 5 + m.o0) % 256 AS p0,
                         (ys.y * 7 + xs.x * 2 + m.o1) % 256 AS p1,
                         (ys.y * 1 + xs.x * 11 + m.o2) % 256 AS p2) p
)
SELECT i,
       CAST(sum((d0 + d1 + d2) * (w - x)) AS BIGINT) AS flip_wx,
       CAST(sum((d0 + d1 + d2) * (w - x) * (h - y)) AS BIGINT) AS rot_w,
       CAST(1 AS BIGINT) AS aug_ok
FROM dec
GROUP BY i
    """,
    # dup_clusters: transitive closure of the exact-Jaccard pair graph via a
    # recursive CTE — cluster_id = min reachable doc_id; docs outside every
    # pair are their own singleton cluster
    "dup_clusters": """
        WITH RECURSIVE
        tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        sh AS MATERIALIZED (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(tk) - 1),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
            FROM tok WHERE len(tk) >= 3
        ),
        p0 AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   len(list_intersect(a.s, b.s)) AS i,
                   len(a.s) AS na, len(b.s) AS nb
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        ),
        e1 AS MATERIALIZED (
            SELECT doc_a, doc_b FROM p0
            WHERE CAST(i AS DOUBLE) / (na + nb - i) >= 0.5
        ),
        -- MATERIALIZED: the recursive step scans edges once per iteration;
        -- without the hint DuckDB inlines the CTE chain and replays the
        -- all-pairs Jaccard join EVERY round
        edges AS MATERIALIZED (
            SELECT doc_a AS s, doc_b AS d FROM e1
            UNION ALL
            SELECT doc_b, doc_a FROM e1
        ),
        nodes AS (SELECT DISTINCT s AS node FROM edges),
        reach(node, r) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT reach.node, e.d FROM reach JOIN edges e ON reach.r = e.s
        ),
        cc AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node)
        SELECT d.doc_id,
               CAST(coalesce(cc.cluster_id, d.doc_id) AS BIGINT) AS cluster_id
        FROM documents d LEFT JOIN cc ON d.doc_id = cc.node
    """,
    # vocab_hll: every HLL register recomputed from scratch — hash =
    # md5_number_lower (little-endian bytes 8:16 of md5, the Ray-side value),
    # bucket = top 12 bits, rank = first-1-bit position of the low 52 bits
    # via exact binary-string length (53 - bit_length, 53 when zero)
    "vocab_hll": """
        WITH tok AS (
            SELECT DISTINCT unnest(string_split(text, ' ')) AS wd FROM documents
        ),
        h AS (SELECT md5_number_lower(wd) AS hw FROM tok)
        SELECT CAST(hw >> 52 AS BIGINT) AS bucket,
               CAST(max(CASE WHEN (hw & 4503599627370495) = 0 THEN 53
                        ELSE 53 - length(bin(hw & 4503599627370495)) END)
                    AS BIGINT) AS r
        FROM h GROUP BY bucket
    """,
    # footprint_pairs: L∞ proximity self-join — the band predicates ARE the
    # gap-<=-48 conditions (per axis: gap <= d ⇔ each side starts before the
    # other side's end + d)
    "footprint_pairs": f"""
        WITH img AS ({_IMG})
        SELECT a.i AS img_a, b.i AS img_b,
               CAST(greatest(b.minx - a.maxx, a.minx - b.maxx, 0) AS BIGINT) AS x_gap,
               CAST(greatest(b.miny - a.maxy, a.miny - b.maxy, 0) AS BIGINT) AS y_gap
        FROM img a JOIN img b
          ON a.i < b.i
         AND b.minx <= a.maxx + 48 AND a.minx <= b.maxx + 48
         AND b.miny <= a.maxy + 48 AND a.miny <= b.maxy + 48
    """,
    "running_total": """
        SELECT event_id, user_id,
               CAST(row_number() OVER w AS BIGINT) AS seq,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT)
                   AS run_value_c
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)
    """,
    "top_tokens": """
        WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        c AS (SELECT term, count(*) AS n FROM tok GROUP BY term)
        SELECT term, CAST(n AS BIGINT) AS n,
               CAST(row_number() OVER (ORDER BY n DESC, term) AS BIGINT) AS rank
        FROM c ORDER BY n DESC, term LIMIT 20
    """,
    "funnel": """
        WITH u AS (SELECT DISTINCT user_id FROM events),
        v AS (
            SELECT user_id, min(epoch_us(ts)) AS t1
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, min(epoch_us(e.ts)) AS t2
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, min(epoch_us(e.ts)) AS t3
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2
            GROUP BY e.user_id
        )
        SELECT u.user_id,
               CAST(coalesce(v.t1, -1) AS BIGINT) AS view_ts,
               CAST(coalesce(c.t2, -1) AS BIGINT) AS click_ts,
               CAST(coalesce(p.t3, -1) AS BIGINT) AS purchase_ts,
               CAST(CASE WHEN v.t1 IS NULL THEN 0 ELSE 1 END
                    + CASE WHEN c.t2 IS NULL THEN 0 ELSE 1 END
                    + CASE WHEN p.t3 IS NULL THEN 0 ELSE 1 END AS BIGINT) AS stages
        FROM u
        LEFT JOIN v ON u.user_id = v.user_id
        LEFT JOIN c ON u.user_id = c.user_id
        LEFT JOIN p ON u.user_id = p.user_id
    """,
    "shipping_priority": """
        WITH f AS (
            SELECT l.l_orderkey AS o_orderkey,
                   epoch_us(o.o_orderdate) AS odate_us,
                   CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                        AS BIGINT) AS rev_c
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND epoch_us(o.o_orderdate) < epoch_us(TIMESTAMP '1998-06-01')
              AND epoch_us(l.l_shipdate) > epoch_us(TIMESTAMP '1998-06-01')
        )
        SELECT o_orderkey, CAST(odate_us AS BIGINT) AS odate_us,
               CAST(sum(rev_c) AS BIGINT) AS revenue_c
        FROM f GROUP BY o_orderkey, odate_us
        ORDER BY revenue_c DESC, o_orderkey LIMIT 10
    """,
    "knn_join": f"""
        WITH pts AS ({_PTS}),
        q AS (
            SELECT event_id AS q_id, px AS qx, py AS qy
            FROM pts WHERE event_id % 101 = 0
        ),
        d AS (
            SELECT q.q_id, p.event_id,
                   CAST((p.px - q.qx) * (p.px - q.qx)
                        + (p.py - q.qy) * (p.py - q.qy) AS BIGINT) AS dist2
            FROM q JOIN pts p ON p.event_id <> q.q_id
        ),
        r AS (
            SELECT q_id, event_id, dist2,
                   row_number() OVER (PARTITION BY q_id ORDER BY dist2, event_id)
                       AS rnk
            FROM d
        )
        SELECT q_id, event_id, CAST(rnk AS BIGINT) AS rnk, dist2
        FROM r WHERE rnk <= 3
    """,
    # dissolve: the union of overlapping [x0, x0+10]×[0,5] rects per nation
    # is an interval merge — lead() gives each slot's newly-covered length
    "dissolve": """
        WITH s AS (
            SELECT DISTINCT s_nationkey AS nk, (s_suppkey % 7) * 8 AS x0
            FROM supplier
        ),
        w AS (
            SELECT nk, x0, lead(x0) OVER (PARTITION BY nk ORDER BY x0) AS nxt
            FROM s
        ),
        seg AS (
            SELECT nk,
                   CASE WHEN nxt IS NULL THEN 10
                        WHEN nxt - x0 < 10 THEN nxt - x0
                        ELSE 10 END AS len
            FROM w
        )
        SELECT CAST(nk AS BIGINT) AS n_nationkey,
               CAST(sum(len) * 5 * 100 AS BIGINT) AS area_c,
               CAST(count(*) AS BIGINT) AS n_slots
        FROM seg GROUP BY nk
    """,
    # image_curation: the full composed chain replayed — generator dims, the
    # ordinal duplicate rule, the HUGEINT ihash derivation, all-pairs
    # hamming restricted to the gated+deduped survivors, and the split hash
    "image_curation": f"""
WITH {_IMG_IHASH_CTES},
gate AS (SELECT m.i, m.w, m.h FROM meta m WHERE m.w * m.h >= 1200),
ded AS (SELECT g.i, g.w, g.h FROM gate g WHERE NOT (g.i % 101 = 0 AND g.i > 0)),
prs AS (
    SELECT DISTINCT b.i AS ib
    FROM signed a JOIN signed b ON a.i < b.i
    WHERE bit_count(xor(a.ihash, b.ihash)) <= 3
      AND a.i IN (SELECT i FROM ded) AND b.i IN (SELECT i FROM ded)
),
kept AS (SELECT d.* FROM ded d WHERE d.i NOT IN (SELECT ib FROM prs)),
fin AS (
    SELECT CASE WHEN (i * 2654435761) % 4294967296 % 10 = 9
                THEN 'val' ELSE 'train' END AS split,
           i, w * h AS px
    FROM kept
)
SELECT split, CAST(count(*) AS BIGINT) AS n_images,
       CAST(sum(px) AS BIGINT) AS sum_px, CAST(sum(i) AS BIGINT) AS id_sum
FROM fin GROUP BY split
    """,
    # incremental_dedup: cross-boundary dups (i%101==0 with i-1 in history)
    # die in the anti join; same-increment dups in the argmin — both reduce
    # to dropping every dup ordinal in the increment
    "incremental_dedup": """
        WITH n AS (SELECT greatest(count(*), 1000) AS cnt FROM part)
        SELECT CAST(u.i AS BIGINT) AS i
        FROM (SELECT unnest(range((SELECT cnt FROM n))) AS i) u
        WHERE u.i >= ((SELECT cnt FROM n) // 2) // 101 * 101
          AND u.i % 101 <> 0
    """,
    "sales_cube": """
        SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
               coalesce(l_linestatus, 'ALL') AS l_linestatus,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
                   AS sum_qty_c,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   AS sum_base_c
        FROM lineitem
        GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    "user_mode": """
        WITH c AS (
            SELECT user_id, event_type, count(*) AS n
            FROM events GROUP BY user_id, event_type
        ),
        r AS (
            SELECT user_id, event_type, n,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY n DESC, event_type) AS rk
            FROM c
        )
        SELECT user_id, event_type AS mode_type, CAST(n AS BIGINT) AS n
        FROM r WHERE rk = 1
    """,
    "dup_triangles": """
        WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        sh AS MATERIALIZED (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(tk) - 1),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
            FROM tok WHERE len(tk) >= 3
        ),
        p0 AS (
            SELECT a.doc_id AS da, b.doc_id AS db,
                   len(list_intersect(a.s, b.s)) AS i,
                   len(a.s) AS na, len(b.s) AS nb
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        ),
        e AS MATERIALIZED (
            SELECT da AS a, db AS b FROM p0
            WHERE CAST(i AS DOUBLE) / (na + nb - i) >= 0.5
        )
        SELECT CAST(count(*) AS BIGINT) AS n_triangles
        FROM e e1 JOIN e e2 ON e2.a = e1.b
                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
}
