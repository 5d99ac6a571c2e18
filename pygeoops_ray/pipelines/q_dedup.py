"""Dedup/similarity queries: exact, MinHash-LSH, Jaccard, SimHash, cosine, curation chains, dup graphs.

Split from pipelines/queries.py (round-2 verdict item 7); queries.py
remains the single QUERIES/ORACLE_SQL registry and re-exports these names.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from pygeoops_ray.stages import ann as ann_stages
from pygeoops_ray.stages import dedup as dedup_stages
from pygeoops_ray.pipelines.common import (
    _read,
    _strip_schema_metadata,
    _table_rows,
    _read_blocked,
    _image_ds,
)
from pygeoops_ray.pipelines.q_ann import _corpus_matrix


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


def q_pagerank(sf_dir: str):
    """PageRank centrality of the near-duplicate pair graph
    (stages/graph.pagerank) — "which document is the hub of its duplicate
    cluster", the canonical-representative signal a curation pipeline uses
    instead of min-id when duplicates differ in quality.

    Fixed 5 iterations in int64 FIXED-POINT arithmetic (scale 1e9, damping
    85/100 via integer ops, per-edge contribution rank // degree), so the
    result is bit-identical under any partitioning and the oracle replays
    the same updates as 5 chained integer CTEs over the same all-pairs
    Jaccard edge set. One cogroup exchange per iteration (update + forward
    fused, the connected_components shape).
    """
    import pyarrow.compute as pc

    from pygeoops_ray.stages.graph import pagerank

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
    pr = pagerank(
        pairs, "doc_a", "doc_b", n_iters=5, n_edges_hint=max(64, n_docs // 10)
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"doc_id": batch["node"], "rank": batch["rank"]}
        )

    return pr.map_batches(rename, batch_format="pyarrow", batch_size=None)


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


def q_fuzzy_pairs(sf_dir: str):
    """Edit-distance-1 entity pairs via FastSS deletion neighborhoods
    (Bocek et al. 2007): every name emits itself plus its single-character
    deletions as candidate KEYS; two names at edit distance <= 1 always
    share a key (a substitution shares the deletion at the mismatch
    position, an insert/delete shares the shorter string itself), so the
    candidate join is a bucketed groupby on the key — never all-pairs —
    followed by an exact in-group <=1-edit verify. The fuzzy-match /
    entity-resolution kernel at crawl scale: shuffle volume is
    names × (len+1) short keys, and verification touches only co-keyed
    candidates.

    Oracle: the plain quadratic levenshtein join (guaranteed-recall check).
    """
    import pandas as pd

    from pygeoops_ray.stages.groupagg import _bucketed

    names = _read(sf_dir, "customer", columns=["c_name"])

    def keys(batch: pa.Table) -> pa.Table:
        ns, ks = [], []
        for t in batch["c_name"].to_pylist():
            ns.append(t)
            ks.append(t)
            for i in range(len(t)):
                ns.append(t)
                ks.append(t[:i] + t[i + 1 :])
        return pa.Table.from_pydict(
            {"name": pa.array(ns, pa.string()), "key": pa.array(ks, pa.string())}
        )

    def _ed_le1(a: str, b: str) -> bool:
        if a == b:
            return True
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) <= 1
        if la > lb:
            a, b, la, lb = b, a, lb, la
        i = 0
        while i < la and a[i] == b[i]:
            i += 1
        return a[i:] == b[i + 1 :]

    def cand_pairs(df: pd.DataFrame) -> pd.DataFrame:
        import logging

        out_a, out_b = [], []
        for key, g in df.groupby("key", sort=False):
            u = sorted(set(g["name"]))
            if len(u) < 2:
                continue
            if len(u) > 64:
                # dense id spaces (e.g. zero-padded numeric names) make a
                # deletion key collect every single-position variant — up
                # to ~90 names. The exact ed<=1 verify bounds the work to
                # |u|^2 short-string compares, so process the group anyway
                # and just log the hot key (raising here crashed the query
                # on dense corpora).
                logging.getLogger(__name__).warning(
                    "fuzzy_pairs: hot deletion key %r collects %d names", key, len(u)
                )
            for i in range(len(u)):
                for j in range(i + 1, len(u)):
                    if _ed_le1(u[i], u[j]):
                        out_a.append(u[i])
                        out_b.append(u[j])
        return pd.DataFrame({"a": out_a, "b": out_b})

    pairs = _bucketed(
        names.map_batches(keys, batch_format="pyarrow"), ["key"], cand_pairs, 16
    )

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["a", "b"])

    return _bucketed(pairs, ["a", "b"], dedup, 16)


def q_lsh_disk(sf_dir: str):
    """Disk-persisted MinHash-LSH near-dup index + point-lookup retrieval —
    the text sibling of ``ann_ivf_disk``: the index is a DATA LAYOUT and a
    lookup's I/O is its buckets, not the corpus.

    Build (once per table, resumable through the checkpoint manifest):
      - band sink: every doc's 16 (band_id, band_hash) LSH keys, one parquet
        partition per ``band_id*64 + band_hash%64`` (≤1024 files);
      - sig sink: per-doc sorted-shingle-hash signature blobs, partitioned
        by ``doc_id % 32``.
    Retrieval (8 fixed query ordinals): the queries' band hashes select
    bucket PARTITIONS on the driver from the few-KB manifest (unmatched
    buckets cost zero I/O and zero tasks; an isin filter on band_hash prunes
    row groups inside survivors), candidates resolve by exact (band_id,
    band_hash) equality, and only the candidates' sig partitions are read
    for the exact shingle-Jaccard verify (broadcast query sigs, one
    map_batches pass). Output: (q_id, cand_id, j_pct) for J≥50% — the query
    doc itself always qualifies (J=100), so retrieval is exercised even for
    dup-free queries — plus pruned_ok asserting BOTH sinks actually pruned.

    Oracle: all-pairs shingle-Jaccard restricted to the 8 query docs (the
    corpus' J≥0.5 pairs all share a band — the same guarantee near_dup_pairs
    is gate-green on at every scale).
    """
    import hashlib
    import os

    import pyarrow.dataset as pads
    import ray

    from pygeoops_ray.stages.dedup import _MinHasher, _shingle_hashes
    from pygeoops_ray.state.manifest import read_partitions, write_partitioned

    docs_path = os.path.join(sf_dir, "documents.parquet")
    n_docs = _table_rows(sf_dir, "documents")
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{os.path.getmtime(docs_path)}:lshdisk:v1".encode()
    ).hexdigest()[:10]
    out_dir = f"/tmp/pygeoops_ray_cache/lsh_index_{key}"
    bands_dir = os.path.join(out_dir, "bands")
    sigs_dir = os.path.join(out_dir, "sigs")

    done_marker = os.path.join(out_dir, "_complete")
    if not os.path.exists(done_marker):
        docs = _read_blocked(sf_dir, "documents", columns=["doc_id", "text"])
        bands = docs.map_batches(_MinHasher(), batch_format="pyarrow")

        def add_pkey(b: pa.Table) -> pa.Table:
            pk = (
                b["band_id"].to_numpy() * 64
                + (b["band_hash"].to_numpy().astype(np.uint64) % np.uint64(64)).astype(
                    np.int64
                )
            )
            return b.append_column("pkey", pa.array(pk, pa.int64()))

        write_partitioned(
            bands.map_batches(add_pkey, batch_format="pyarrow"),
            bands_dir, "pkey", stage="bands", lineage={"sf_dir": sf_dir},
        )

        def sig_rows(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy()
            sigs = [
                np.unique(_shingle_hashes(t)).astype(np.int64).tobytes()
                for t in b["text"].to_pylist()
            ]
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "bucket": pa.array(ids % 32, pa.int64()),
                    "sig": pa.array(sigs, pa.binary()),
                }
            )

        write_partitioned(
            docs.map_batches(sig_rows, batch_format="pyarrow"),
            sigs_dir, "bucket", stage="sigs", lineage={"sf_dir": sf_dir},
        )
        with open(done_marker, "w") as f:
            f.write("1")

    # --- retrieval ---------------------------------------------------------
    # dedupe: at n_docs < 8 the stride collapses and the 8 ordinals alias
    # (matches the oracle's SELECT DISTINCT over the same series)
    q_ords = sorted({i * (n_docs // 8) for i in range(8)})
    import pyarrow.parquet as pq

    q_docs = pq.read_table(
        docs_path, columns=["doc_id", "text"],
        filters=[("doc_id", "in", q_ords)],
    ).to_pandas()
    mh = _MinHasher()
    q_bands = mh(
        pa.Table.from_pydict(
            {
                "doc_id": pa.array(q_docs["doc_id"].to_numpy(), pa.int64()),
                "text": pa.array(q_docs["text"].tolist(), pa.string()),
            }
        )
    ).to_pandas()
    q_keyset = set(
        zip(q_bands["band_id"].tolist(), q_bands["band_hash"].tolist())
    )
    pids = sorted(
        {int(bid) * 64 + int(np.uint64(bh) % np.uint64(64)) for bid, bh in q_keyset}
    )
    hash_list = sorted({int(bh) for _, bh in q_keyset})
    cand_ds, bfiles_read, bfiles_total = read_partitions(
        bands_dir, pids, stage="bands",
        filter=pads.field("band_hash").isin(hash_list),
    )
    qk_ref = ray.put(q_keyset)

    def exact_bucket(b: pa.Table) -> pa.Table:
        qk = ray.get(qk_ref)
        bid = b["band_id"].to_numpy()
        bh = b["band_hash"].to_numpy()
        keep = np.fromiter(
            ((int(i), int(h)) in qk for i, h in zip(bid, bh)),
            dtype=bool, count=len(bid),
        )
        return pa.Table.from_pydict(
            {"doc_id": pa.array(b["doc_id"].to_numpy()[keep], pa.int64())}
        )

    # candidate id set is bounded by the queries' bucket sizes — the bounded
    # driver read is the point-lookup contract (same shape as the kNN ring
    # certificate)
    cand_ids = (
        np.unique(
            cand_ds.map_batches(exact_bucket, batch_format="pyarrow")
            .to_pandas()["doc_id"]
            .to_numpy()
        )
        if cand_ds is not None
        else np.array(q_ords, dtype=np.int64)
    )
    all_ids = np.unique(np.concatenate([cand_ids, np.array(q_ords, np.int64)]))
    buckets = sorted({int(x) % 32 for x in all_ids})
    # the driver-side id list is bounded by the queries' bucket sizes; on an
    # adversarial corpus (every doc near-identical => one hot bucket) it
    # could reach corpus size, so past a cap the row-group filter drops to
    # bucket-level pruning only — still exact, just more I/O
    if len(all_ids) <= 2_000_000:
        sig_filter = pads.field("doc_id").isin([int(x) for x in all_ids])
    else:
        import logging

        logging.getLogger(__name__).warning(
            "lsh_disk: %d candidates exceed the id-filter cap; falling back"
            " to bucket-level pruning", len(all_ids)
        )
        sig_filter = None
    sig_ds, sfiles_read, sfiles_total = read_partitions(
        sigs_dir, buckets, stage="sigs", filter=sig_filter,
    )
    # query sigs broadcast for the verify pass
    q_sig = {}
    for _, row in q_docs.iterrows():
        q_sig[int(row["doc_id"])] = np.unique(_shingle_hashes(row["text"])).astype(
            np.int64
        )
    qs_ref = ray.put(q_sig)
    pruned_ok = int(bfiles_read < bfiles_total and sfiles_read < sfiles_total)

    def verify(b: pa.Table) -> pa.Table:
        qs = ray.get(qs_ref)
        out_q, out_c, out_j = [], [], []
        ids = b["doc_id"].to_numpy()
        for i, blob in enumerate(b["sig"].to_pylist()):
            sig = np.frombuffer(blob, dtype=np.int64)
            for qid, qsig in qs.items():
                inter = len(np.intersect1d(sig, qsig, assume_unique=True))
                union = len(sig) + len(qsig) - inter
                j = 100 * inter // max(union, 1)
                if j >= 50:
                    out_q.append(qid)
                    out_c.append(int(ids[i]))
                    out_j.append(j)
        n = len(out_q)
        return pa.Table.from_pydict(
            {
                "q_id": pa.array(out_q, pa.int64()),
                "cand_id": pa.array(out_c, pa.int64()),
                "j_pct": pa.array(out_j, pa.int64()),
                "pruned_ok": pa.array([pruned_ok] * n, pa.int64()),
            }
        )

    return sig_ds.map_batches(verify, batch_format="pyarrow")


def q_kcore(sf_dir: str):
    """k-core (k=2) of the near-duplicate pair graph — the dense kernel of
    the duplication structure (nodes that survive any single deletion):
    completes the graph family (CC / PageRank / triangles / k-core) with the
    iterative-peeling shape. Each round is one bounded exchange over the
    SHRINKING edge set (stages/graph.kcore); rounds cap at 8 with a conv_ok
    bit so the SQL oracle replays the peeling as 8 chained CTEs (the
    bpe_train pattern) — a convergence regression turns the driver hash red
    through the bit, never by divergence."""
    from pygeoops_ray.stages.graph import kcore

    pairs = q_jaccard_pairs(sf_dir)
    return kcore(
        pairs, "doc_a", "doc_b", k=2,
        n_edges_hint=_table_rows(sf_dir, "documents") // 10,
    )
