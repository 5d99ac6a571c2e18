"""Deduplication operators: exact (hash-partitioned), MinHash-LSH near-dup,
exact n-gram-Jaccard similarity join (prefix filter), and SimHash near-dup.

Scale shape (ray_guide patterns): exact dedup pre-aggregates the min-keeper per
key inside each batch before the shuffle, so the groupby only sees one row per
(key, batch) — at 100 TB that's the difference between shuffling every row and
shuffling the distinct-key summary. MinHash: shingle → 64 minhashes → bands →
(band_id, band_hash) groupby → candidate pairs → exact Jaccard verify.
Prefix-filter Jaccard and banded SimHash give GUARANTEED recall (candidate
generation provably covers every qualifying pair), so both are oracle-exact
against an all-pairs SQL recomputation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "exact_dedup_min",
    "minhash_signatures_batch",
    "near_dup_pairs",
    "exact_jaccard_pairs",
    "simhash_batch",
    "simhash_pairs",
]


def _coarse_shift(n_rows_hint: int | None, target_rows: int = 500_000) -> int:
    """Right-shift for the coarse shuffle key: ~target_rows rows per coarse
    group, floor 64 groups. A FIXED group count means group size grows
    linearly with the corpus (each group is one pandas frame in map_groups);
    deriving it from a row-count hint keeps groups bounded at any scale."""
    import math

    groups = 64
    if n_rows_hint:
        groups = max(64, int(n_rows_hint // target_rows))
    bits = max(6, math.ceil(math.log2(groups)))
    return 63 - bits


def _split_for_group_verify(ds, n_rows_hint: int | None, cshift: int):
    """Split (metadata-only) the coarse-sort input so the per-group verify
    stage fans out to every core.

    Ray's range sort makes one reduce partition PER INPUT BLOCK, and the
    verify map runs one task per partition — with the small-file read cap
    (cpu/4 blocks) the expensive pair-verify stage was limited to 8 of 32
    cores. Split to ~1 block per core, but never past half the coarse key
    count (surplus partitions come out empty, see near_dup_pairs). At real
    scale the natural block count already exceeds this and the repartition
    is a cheap rebalance.
    """
    import math

    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    n_keys = 1 << (63 - cshift)
    blocks = max(4, min(ncpu, n_keys // 2))
    if n_rows_hint:
        # keep blocks near the 128 MB object-store sweet spot at scale
        blocks = max(blocks, int(n_rows_hint * 24 // (128 << 20)))
        blocks = min(blocks, max(4, n_keys // 2))
    return ds.repartition(blocks, shuffle=False)


def exact_dedup_min(ds, key_cols: list[str], keep_col: str, n_rows_hint: int | None = None):
    """Keep min(keep_col) per key group: per-batch partial min, then groupby min.

    Equivalent SQL: SELECT key..., min(keep) GROUP BY key...
    """
    from pygeoops_ray.stages.groupagg import grouped_min

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(key_cols + [keep_col]).to_pandas()
        out = df.groupby(key_cols, as_index=False, sort=False)[keep_col].min()
        # strip from_pandas' pandas-metadata: unhashable schemas defeat the
        # shuffle reduce's schema dedup (warning + slow unify per task)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    # coarse-bucketed vectorized min: Ray's native aggregate pays per-group
    # Python overhead — untenable when every distinct key is its own group
    return grouped_min(partials, key_cols, keep_col, n_rows_hint=n_rows_hint)


_MERSENNE = np.uint64((1 << 61) - 1)
_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xBF58476D1CE4E5B9)
_MIX3 = np.uint64(0x94D049BB133111EB)


# per-worker word→crc32 cache: natural-text vocabulary is far smaller than
# the token stream, so most words hash to a dict hit instead of an
# encode+crc32 call. Bounded; long-lived Ray workers keep it warm across
# batches. Purely an evaluation cache — hash values are unchanged.
_WORD_HASH_CACHE: dict[str, int] = {}
_WORD_HASH_CACHE_MAX = 1_000_000


def _shingle_hashes(text: str, shingle: int = 3) -> np.ndarray:
    """Hashes of word shingles (uint64), vectorized.

    Word → crc32 (C-speed, deterministic across processes, unlike Python's
    salted hash()); shingle hash = splitmix-style combination of the window's
    word hashes (numpy-vectorized over all windows at once).
    """
    import zlib

    words = text.split()
    if not words:
        return np.zeros(1, dtype=np.uint64)
    cache = _WORD_HASH_CACHE
    if len(cache) > _WORD_HASH_CACHE_MAX:
        cache.clear()
    crc32 = zlib.crc32
    cache_get = cache.get
    hashes = []
    for w in words:
        h = cache_get(w)
        if h is None:
            h = crc32(w.encode("utf-8"))
            cache[w] = h
        hashes.append(h)
    wh = np.array(hashes, dtype=np.uint64)
    if len(wh) < shingle:
        g = np.zeros(1, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for k in range(len(wh)):
                g = (g * _MIX2) ^ (wh[k] + _MIX1)
        return g
    n = len(wh) - shingle + 1
    with np.errstate(over="ignore"):
        g = np.zeros(n, dtype=np.uint64)
        for k in range(shingle):
            g = (g * _MIX2) ^ (wh[k : k + n] + _MIX1)
        g = (g ^ (g >> np.uint64(31))) * _MIX3
    return g


def hash_str64(s: str) -> int:
    """Deterministic 64-bit FNV-1a of a string (Python's hash() is salted)."""
    h = 14695981039346656037
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


class _MinHasher:
    """num_perm universal-hash minhash signatures; coefficients built per actor."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle: int = 3, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.shingle = shingle

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.shingle)
        with np.errstate(over="ignore"):
            vals = (sh[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Explode each doc to (band_id, band_hash, doc_id) rows (vectorized
        band hashing: one numpy mix over the (ndocs, bands, rows) signature)."""
        ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        sigs = np.stack([self.signature(t) for t in texts])  # (ndocs, num_perm)
        banded = sigs.reshape(len(ids), self.bands, self.rows)
        with np.errstate(over="ignore"):
            bh = np.zeros((len(ids), self.bands), dtype=np.uint64)
            for r in range(self.rows):
                bh = (bh * _MIX2) ^ (banded[:, :, r] + _MIX1)
            bh = (bh ^ (bh >> np.uint64(31))) * _MIX3
        bh = (bh & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(np.repeat(ids, self.bands), pa.int64()),
                "band_id": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int64), len(ids)), pa.int64()
                ),
                "band_hash": pa.array(bh.reshape(-1), pa.int64()),
            }
        )


def minhash_signatures_batch(batch: pa.Table) -> pa.Table:
    return _MinHasher()(batch)


def near_dup_pairs(
    docs_ds,
    jaccard_threshold: float = 0.6,
    concurrency: int = 4,
    num_partitions: int | None = None,
    n_docs_hint: int | None = None,
):
    """MinHash-LSH near-duplicate pairs (doc_a < doc_b) with verified Jaccard.

    band rows → groupby(band_id, band_hash) → in-bucket pairs → dedup pairs →
    exact shingle-Jaccard verify. The verify inputs arrive by CO-PARTITIONED
    hash joins of the candidate pairs against a per-doc shingle-signature
    dataset (sig computed once per doc) — nothing is materialized on the
    driver and no whole-corpus broadcast exists, so the pipeline streams at
    any corpus size (the round-1 version shipped a doc_id→text dict of the
    entire table through the object store).
    """
    # verify-shuffle bucket count scales with the corpus (~50k docs of sig
    # payload per jb group): a fixed modulus would grow each cogroup frame
    # linearly with input — the same scale-bug class as a fixed %64
    if num_partitions is None:
        num_partitions = max(8, (n_docs_hint or 0) // 50_000 + 1)

    def sig_batch(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        # the signature travels as a binary blob (sorted int64 array bytes):
        # Arrow's hash join rejects list<> payload columns, and frombuffer on
        # the verify side is zero-copy anyway
        sigs = [
            np.unique(_shingle_hashes(t)).astype(np.int64).tobytes()
            for t in b["text"].to_pylist()
        ]
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "sig": pa.array(sigs, pa.binary()),
            }
        )

    sigs = docs_ds.map_batches(sig_batch, batch_format="pyarrow")

    # task-based: the minhash coefficients are rebuilt per worker process
    # (cheap, seeded) — a fixed-size actor pool can starve the read stage on
    # small sessions
    bands = docs_ds.map_batches(_MinHasher(), batch_format="pyarrow")

    # coarse-group the (band, hash) buckets: grouping on the raw bucket key
    # means one map_groups dispatch per bucket (≈ docs × bands tiny groups);
    # instead shuffle on a coarse prefix and pair up all buckets of a group
    # in one vectorized pass. Group COUNT scales with the corpus hint
    # (floor 64): map_groups pays ~1ms of pandas dispatch per GROUP so
    # near-empty groups are waste, but each group is one pandas frame so a
    # fixed count would grow group size linearly with the corpus.
    _cshift = _coarse_shift(n_docs_hint * 16 if n_docs_hint else None)

    def add_coarse(b: pa.Table) -> pa.Table:
        bkey = (b["band_hash"].to_numpy().astype(np.uint64) << np.uint64(4)) ^ b[
            "band_id"
        ].to_numpy().astype(np.uint64)
        out = b.append_column("bkey", pa.array(bkey.astype(np.int64), pa.int64()))
        return out.append_column(
            "coarse",
            pa.array((bkey >> np.uint64(_cshift + 1)).astype(np.int64), pa.int64()),
        )

    pairs = (
        _split_for_group_verify(
            bands.map_batches(add_coarse, batch_format="pyarrow"),
            n_docs_hint * 16 if n_docs_hint else None,
            _cshift,
        )
        .groupby("coarse")
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    # NOTE: pairs can repeat across bands/coarse groups; the duplicates ride
    # into the doc-bucket cogroup (2 small rows per repeat) and are dropped
    # there — cheaper than a dedicated global-dedup shuffle.
    return _attach_and_verify(pairs, sigs, jaccard_threshold, num_partitions)


def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """All intra-bucket candidate pairs: vectorized over runs of equal bkey."""
    bk = group["bkey"].to_numpy()
    ids = group["doc_id"].to_numpy()
    order = np.lexsort((ids, bk))
    bk = bk[order]
    ids = ids[order]
    out_a, out_b = [], []
    # runs of equal bucket key → all intra-run pairs
    starts = np.nonzero(np.concatenate([[True], bk[1:] != bk[:-1]]))[0]
    ends = np.concatenate([starts[1:], [len(bk)]])
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        uniq = np.unique(ids[s:e])
        if len(uniq) < 2:
            continue
        # chunked pair enumeration: a degenerate bucket (e.g. many identical
        # or empty docs sharing one signature) must not allocate O(B^2) at once
        nb_ = len(uniq)
        row_step = max(1, 2_000_000 // nb_)
        for x0 in range(0, nb_ - 1, row_step):
            x1 = min(x0 + row_step, nb_ - 1)
            xi, yi = np.meshgrid(np.arange(x0, x1), np.arange(nb_), indexing="ij")
            sel = yi > xi
            out_a.append(uniq[xi[sel]])
            out_b.append(uniq[yi[sel]])
    if not out_a:
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")}
        )
    return pd.DataFrame(
        {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)}
    ).drop_duplicates()


def _attach_and_verify(pairs, sigs, jaccard_threshold: float, num_partitions: int):
    """Exact-Jaccard verify of candidate pairs against per-doc shingle sets.

    Co-partitioned signature re-join WITHOUT Dataset.join: the hash-join
    operator spins up an aggregator actor pool per stage (~1.5s fixed cost
    each at this scale), while groupby's task-based shuffle reuses the same
    machinery as every other stage. Shape: explode each pair into one row
    per side keyed by that side's doc_id, union with the sig rows, cogroup
    on the doc bucket to attach sigs, then regroup on the pair to pair up
    sig_a/sig_b and verify — 2 shuffles, payloads only for candidate docs.
    Nothing materializes on the driver at any corpus size.
    """

    def pair_sides(b: pa.Table) -> pa.Table:
        da = b["doc_a"].to_numpy()
        db = b["doc_b"].to_numpy()
        return pa.Table.from_pydict(
            {
                "jkey": pa.array(np.concatenate([da, db]), pa.int64()),
                "doc_a": pa.array(np.concatenate([da, da]), pa.int64()),
                "doc_b": pa.array(np.concatenate([db, db]), pa.int64()),
                "sig": pa.nulls(2 * len(da), pa.binary()),
            }
        )

    def sig_side(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "jkey": b["doc_id"],
                "doc_a": pa.nulls(len(b), pa.int64()),
                "doc_b": pa.nulls(len(b), pa.int64()),
                "sig": b["sig"],
            }
        )

    # coalesce (no shuffle) so the sort has at most num_partitions/2 output
    # partitions: Ray's range sort makes one partition PER INPUT BLOCK, and
    # partitions beyond the key cardinality come out EMPTY with a schema-less
    # block (streaming executor logs a schema-divergence warning per bundle).
    # At scale num_partitions is corpus-derived, so the ceiling is a no-op.
    n_coalesce = max(2, num_partitions // 2)
    tagged = (
        pairs.map_batches(pair_sides, batch_format="pyarrow")
        .union(sigs.map_batches(sig_side, batch_format="pyarrow"))
        .repartition(n_coalesce, shuffle=False)
    )

    def add_jbucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "jb", pa.array(b["jkey"].to_numpy() % num_partitions, pa.int64())
        )

    def attach_sig(group: pd.DataFrame) -> pa.Table:
        # emit Arrow directly (typed binary sig): a pandas return would be
        # converted by Ray via from_pandas, whose pandas-metadata makes the
        # schema unhashable and defeats the shuffle reduce's schema dedup
        is_sig = group["doc_a"].isna()
        lut = dict(
            zip(group.loc[is_sig, "jkey"].to_numpy(), group.loc[is_sig, "sig"].to_numpy())
        )
        p = group.loc[~is_sig].drop_duplicates(["doc_a", "doc_b", "jkey"])
        return pa.Table.from_pydict(
            {
                "doc_a": pa.array(p["doc_a"].astype("int64").to_numpy(), pa.int64()),
                "doc_b": pa.array(p["doc_b"].astype("int64").to_numpy(), pa.int64()),
                "jkey": pa.array(p["jkey"].astype("int64").to_numpy(), pa.int64()),
                "sig": pa.array(
                    [lut.get(k) for k in p["jkey"].to_numpy()], pa.binary()
                ),
            }
        )

    with_sig = (
        tagged.map_batches(add_jbucket, batch_format="pyarrow")
        .groupby("jb")
        .map_groups(attach_sig, batch_format="pandas")
    )

    def add_pbucket(b: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            ph = (
                b["doc_a"].to_numpy().astype(np.uint64) * _MIX1
                + b["doc_b"].to_numpy().astype(np.uint64)
            ) * _MIX2
        return b.append_column(
            "pb", pa.array((ph % np.uint64(num_partitions)).astype(np.int64), pa.int64())
        )

    def pairup_verify(group: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_j = [], [], []
        for _, rows in group.groupby(["doc_a", "doc_b"], sort=False):
            sigs_by_key = dict(zip(rows["jkey"].to_numpy(), rows["sig"].to_numpy()))
            da = int(rows["doc_a"].iloc[0])
            db = int(rows["doc_b"].iloc[0])
            ba, bb = sigs_by_key.get(da), sigs_by_key.get(db)
            if ba is None or bb is None:
                continue
            sa = np.frombuffer(ba, dtype=np.int64)
            sb = np.frombuffer(bb, dtype=np.int64)
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            j = inter / max(union, 1)
            if j >= jaccard_threshold:
                out_a.append(da)
                out_b.append(db)
                out_j.append(j)
        return pa.Table.from_pydict(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    return (
        with_sig.map_batches(add_pbucket, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(pairup_verify, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard similarity join (prefix filtering — guaranteed recall)
# ---------------------------------------------------------------------------


def _sorted_shingle_sig(text: str, shingle: int = 3) -> np.ndarray:
    """Sorted unique shingle hashes — the doc's set, in the global hash order."""
    return np.unique(_shingle_hashes(text, shingle))


def _common_shingles_topk(
    docs_ds, shingle: int, sample_docs: int = 2048, max_common: int = 65536
) -> np.ndarray:
    """Sorted hashes of shingles common in a bounded driver sample.

    Used only to pick a better global ORDER for prefix filtering — recall is
    100% for any order, so sampling bias cannot cost correctness, only let an
    unsampled hot shingle keep a big bucket. limit() reads the first blocks
    only (deterministic for parquet reads); no full scan, no shuffle.
    """
    from collections import Counter

    texts = [
        r["text"]
        for r in docs_ds.limit(sample_docs).select_columns(["text"]).take_all()
    ]
    if not texts:
        return np.array([], dtype=np.uint64)
    df: Counter = Counter()
    for text in texts:
        df.update(set(_shingle_hashes(text, shingle).tolist()))
    thr = max(16, len(texts) // 50)  # "common" = in >=2% of sampled docs
    hot = [h for h, c in df.items() if c >= thr]
    if len(hot) > max_common:
        hot = [h for h, _ in sorted(df.items(), key=lambda kv: -kv[1])[:max_common]]
    return np.sort(np.array(hot, dtype=np.uint64))


def exact_jaccard_pairs(
    docs_ds,
    jaccard_threshold: float = 0.5,
    shingle: int = 3,
    n_docs_hint: int | None = None,
):
    """EXACT word-n-gram Jaccard similarity self-join: all pairs (a<b) with
    J(S_a, S_b) >= threshold, where S_x is x's set of distinct word 3-shingles.

    Unlike MinHash-LSH (probabilistic recall), candidate generation uses
    PREFIX FILTERING (Chaudhuri et al. 2006 / Bayardo et al. WWW'07 all-pairs):
    order every set by a fixed global order (ascending shingle hash); a set of
    size n keeps a prefix of length n - ceil(t*n) + 1. Any pair with J >= t
    has |S_a ∩ S_b| >= ceil(t*max(|S_a|,|S_b|)), and the intersection cannot
    fit entirely in either suffix (of size ceil(t*n)-1 < |∩|), so the common
    element smallest in the global order lies in BOTH prefixes — recall is
    100% by construction, making the operator oracle-exact against an
    all-pairs SQL recomputation.

    Shape: one shuffle. Each prefix shingle emits (shingle_hash, doc_id, sig)
    with the doc's full sorted-unique signature riding along (bounded: sig
    bytes × prefix length ≈ 8n(1-t) amplification), so the exact-Jaccard
    verify runs IN-BUCKET with no signature re-join; a final tiny groupby
    dedups pairs discovered via several shared shingles. (The re-join shape —
    see _attach_and_verify — wins when signatures are large or candidates
    few, as in MinHash banding; measured here the in-bucket verify is ~6x
    faster end-to-end.)

    Skew guard (rarest-first prefixes): prefix filtering is valid under ANY
    fixed global total order on shingles — recall is 100% regardless. A plain
    hash order puts corpus-common (template) shingles into prefixes, whose
    buckets then grow to O(corpus) and the in-bucket pair step goes quadratic
    (Bayardo et al. WWW'07 order by ascending document frequency for exactly
    this reason). We demote the most frequent shingles of a bounded driver
    SAMPLE to the tail of the order ((in_common_topk, hash) — still one
    global order, computed without any extra shuffle); prefixes then hold the
    rarest shingles and bucket sizes track true near-dup cluster sizes.
    """
    t = float(jaccard_threshold)
    # prefix rows per doc ~ (1-t) * distinct shingles (~half the doc's tokens)
    _cshift = _coarse_shift(n_docs_hint * 32 if n_docs_hint else None)

    common: np.ndarray = _common_shingles_topk(docs_ds, shingle)

    def prefix_rows(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        out_key, out_id, out_sig = [], [], []
        for i, text in zip(ids, b["text"].to_pylist()):
            s = _sorted_shingle_sig(text, shingle)
            n = len(s)
            plen = n - int(np.ceil(t * n)) + 1
            sig = s.astype(np.int64).tobytes()
            if len(common):
                # global order (is_common, hash): common shingles go to the
                # suffix; s is hash-sorted so the stable partition keeps the
                # (is_common, hash) order exact
                is_common = np.isin(s, common)
                s = np.concatenate([s[~is_common], s[is_common]])
            out_key.append(s[:plen].astype(np.int64))
            out_id.append(np.full(plen, i, dtype=np.int64))
            out_sig.extend([sig] * plen)
        if not out_key:
            return pa.Table.from_pydict(
                {
                    "bkey": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "sig": pa.array([], pa.binary()),
                }
            )
        return pa.Table.from_pydict(
            {
                "bkey": pa.array(np.concatenate(out_key), pa.int64()),
                "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
                "sig": pa.array(out_sig, pa.binary()),
            }
        )

    def add_coarse(b: pa.Table) -> pa.Table:
        coarse = (b["bkey"].to_numpy().astype(np.uint64) >> np.uint64(_cshift)).astype(
            np.int64
        )
        return b.append_column("coarse", pa.array(coarse, pa.int64()))

    def pair_verify(group: pd.DataFrame) -> pd.DataFrame:
        bk = group["bkey"].to_numpy()
        ids = group["doc_id"].to_numpy()
        sg = group["sig"].to_numpy()
        order = np.lexsort((ids, bk))
        bk, ids, sg = bk[order], ids[order], sg[order]
        out_a, out_b, out_j = [], [], []
        seen = set()
        starts = np.nonzero(np.concatenate([[True], bk[1:] != bk[:-1]]))[0]
        ends = np.concatenate([starts[1:], [len(bk)]])
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            uid, idx = np.unique(ids[s:e], return_index=True)
            if len(uid) < 2:
                continue
            usig = sg[s:e][idx]
            sets = [np.frombuffer(x, dtype=np.int64) for x in usig]
            lens = np.array([len(x) for x in sets])
            # vectorized length prefilter (J >= t needs t*nb <= na <= nb/t)
            # BEFORE pair enumeration, in bounded row chunks so a hot bucket
            # can't allocate an O(B^2) index matrix at once
            nb = len(uid)
            row_step = max(1, 4_000_000 // nb)
            for x0 in range(0, nb - 1, row_step):
                x1 = min(x0 + row_step, nb - 1)
                xi, yi = np.meshgrid(
                    np.arange(x0, x1), np.arange(nb), indexing="ij"
                )
                upper = yi > xi
                la = lens[xi]
                lb = lens[yi]
                ok = upper & (la >= t * lb) & (lb >= t * la)
                for x, y in zip(xi[ok], yi[ok]):
                    key = (uid[x], uid[y])
                    if key in seen:
                        continue
                    seen.add(key)
                    inter = len(np.intersect1d(sets[x], sets[y], assume_unique=True))
                    union = lens[x] + lens[y] - inter
                    j = inter / max(union, 1)
                    if j >= t:
                        out_a.append(int(uid[x]))
                        out_b.append(int(uid[y]))
                        out_j.append(j)
        return pd.DataFrame(
            {
                "doc_a": pd.Series(out_a, dtype="int64"),
                "doc_b": pd.Series(out_b, dtype="int64"),
                "jaccard": pd.Series(out_j, dtype="float64"),
            }
        )

    from pygeoops_ray.stages.groupagg import grouped_min

    pairs = (
        _split_for_group_verify(
            docs_ds.map_batches(prefix_rows, batch_format="pyarrow").map_batches(
                add_coarse, batch_format="pyarrow"
            ),
            n_docs_hint * 32 if n_docs_hint else None,
            _cshift,
        )
        .groupby("coarse")
        .map_groups(pair_verify, batch_format="pandas")
    )
    # dedup pairs found via several shared shingles across coarse groups
    # (jaccard identical wherever computed); bucketed vectorized min — every
    # pair is its own group, so Ray's native aggregate would pay per-group
    # Python overhead on the whole output
    return grouped_min(
        pairs, ["doc_a", "doc_b"], "jaccard",
        n_rows_hint=n_docs_hint * 8 if n_docs_hint else None,
    )


# ---------------------------------------------------------------------------
# SimHash near-dup (banded candidate generation — guaranteed recall)
# ---------------------------------------------------------------------------


class _SimHasher:
    """64-bit SimHash over whitespace tokens.

    Token hash = lower 64 bits (little-endian bytes 8:16) of md5 — the exact
    value DuckDB's md5_number_lower() returns, so the whole simhash is
    recomputable in SQL. Per-actor token→hash cache (corpus vocabularies are
    tiny relative to token count).
    """

    def __init__(self):
        self._cache: dict[str, int] = {}
        self._shifts = np.arange(64, dtype=np.uint64)

    def _th(self, w: str) -> int:
        h = self._cache.get(w)
        if h is None:
            import hashlib
            import struct

            h = struct.unpack("<Q", hashlib.md5(w.encode("utf-8")).digest()[8:16])[0]
            self._cache[w] = h
        return h

    def simhash(self, text: str) -> int:
        toks = text.split()
        if not toks:
            return 0
        # Counter beats np.unique-on-object ~3x; votes are order-independent
        # sums over the unique-token multiset, so the hash value is unchanged
        from collections import Counter

        counts = Counter(toks)
        cnt = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
        hs = np.array([self._th(w) for w in counts], dtype=np.uint64)
        bits = ((hs[:, None] >> self._shifts[None, :]) & np.uint64(1)).astype(np.int64)
        votes = ((2 * bits - 1) * cnt[:, None]).sum(axis=0)
        return int((((votes > 0).astype(np.uint64)) << self._shifts).sum(dtype=np.uint64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        sh = np.array(
            [self.simhash(t) for t in batch["text"].to_pylist()], dtype=np.uint64
        )
        return pa.Table.from_pydict(
            {"doc_id": batch["doc_id"], "simhash": pa.array(sh, pa.uint64())}
        )


def simhash_batch(batch: pa.Table) -> pa.Table:
    return _SimHasher()(batch)


def simhash_pairs(docs_ds, max_hamming: int = 3, n_docs_hint: int | None = None):
    """SimHash near-duplicate pairs: all (a<b) with hamming(sh_a, sh_b) <= K.

    Thin wrapper: simhash signature stage + the generic banded
    ``hamming_pairs`` join (see there for the recall argument).
    """
    sims = docs_ds.map_batches(_SimHasher(), batch_format="pyarrow")
    return hamming_pairs(
        sims,
        id_col="doc_id",
        hash_col="simhash",
        max_hamming=max_hamming,
        n_rows_hint=n_docs_hint,
        out_a="doc_a",
        out_b="doc_b",
    )


def hamming_pairs(
    ds,
    *,
    id_col: str,
    hash_col: str,
    max_hamming: int = 3,
    n_rows_hint: int | None = None,
    out_a: str = "doc_a",
    out_b: str = "doc_b",
):
    """All (a<b) id pairs whose 64-bit hashes differ in <= K bits.

    Generic over the hash semantics (simhash over text, perceptual hash over
    image pixels, ...). Candidate generation splits the 64-bit hash into K+1
    contiguous bands; two hashes differing in <= K bits leave at least one
    band untouched (pigeonhole), so grouping on (band_id, band_value) has
    100% recall — the operator is oracle-exact vs an all-pairs SQL
    bit_count(xor(...)) check. Verify is exact hamming inside the group
    (hashes ride with the rows; no re-join needed), then a groupby dedups
    pairs found by several bands. Hot buckets are refined HmSearch-style
    (sub-band grouping of the non-band bits) before pair enumeration.
    """
    nb = max_hamming + 1
    # params are shadowed by pair_verify's local accumulators — bind copies
    out_a_name, out_b_name = out_a, out_b
    _cshift = _coarse_shift(n_rows_hint * nb if n_rows_hint else None)
    # band bit-widths: as even as possible over 64 bits
    widths = [64 // nb + (1 if i < 64 % nb else 0) for i in range(nb)]
    offs = np.cumsum([0] + widths[:-1]).astype(np.uint64)
    widths = np.array(widths, dtype=np.uint64)

    def band_rows(b: pa.Table) -> pa.Table:
        sh = b[hash_col].to_numpy().astype(np.uint64)
        ids = b[id_col].to_numpy()
        n = len(sh)
        band_vals = np.empty((n, nb), dtype=np.uint64)
        for i in range(nb):
            mask = (np.uint64(1) << widths[i]) - np.uint64(1)
            band_vals[:, i] = (sh >> offs[i]) & mask
        with np.errstate(over="ignore"):
            # key mixes band id + value into one int64 bucket key
            bkey = (
                band_vals * _MIX2 + (np.arange(nb, dtype=np.uint64) + _MIX1)[None, :]
            ) * _MIX3
        return pa.Table.from_pydict(
            {
                "bkey": pa.array(
                    (bkey.reshape(-1) & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64),
                    pa.int64(),
                ),
                "band_id": pa.array(
                    np.tile(np.arange(nb, dtype=np.int64), n), pa.int64()
                ),
                "doc_id": pa.array(np.repeat(ids, nb), pa.int64()),
                "simhash": pa.array(np.repeat(sh, nb), pa.uint64()),
            }
        )

    def add_coarse(b: pa.Table) -> pa.Table:
        coarse = (b["bkey"].to_numpy().astype(np.uint64) >> np.uint64(_cshift)).astype(
            np.int64
        )
        return b.append_column("coarse", pa.array(coarse, pa.int64()))

    def pair_verify(group: pd.DataFrame) -> pd.DataFrame:
        bk = group["bkey"].to_numpy()
        bands = group["band_id"].to_numpy()
        ids = group["doc_id"].to_numpy()
        sh = group["simhash"].to_numpy().astype(np.uint64)
        order = np.lexsort((ids, bk))
        bk, bands, ids, sh = bk[order], bands[order], ids[order], sh[order]
        out_a, out_b, out_h = [], [], []
        starts = np.nonzero(np.concatenate([[True], bk[1:] != bk[:-1]]))[0]
        ends = np.concatenate([starts[1:], [len(bk)]])
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            uid, idx = np.unique(ids[s:e], return_index=True)
            if len(uid) < 2:
                continue
            ush = sh[s:e][idx]
            nb_ = len(uid)
            # recursive multi-index refinement (HmSearch-style): all rows of
            # this bucket agree on band `bid`; a pair with hamming <= K
            # differs in <= K of the remaining 48 bits, so by pigeonhole at
            # least one of K+1 12-bit sub-bands of those bits is equal —
            # enumerate pairs only within sub-band groups (kills the
            # O(B^2) blowup of vocabulary-correlated hot buckets) and
            # dedupe pair keys before the exact popcount
            bid = int(bands[s])
            o = int(offs[bid])
            w = int(widths[bid])
            low = ush & ((np.uint64(1) << np.uint64(o)) - np.uint64(1))
            other = low | ((ush >> np.uint64(o + w)) << np.uint64(o))
            rem = 64 - w
            nsub = max_hamming + 1
            sw = [rem // nsub + (1 if q < rem % nsub else 0) for q in range(nsub)]
            soff = np.cumsum([0] + sw[:-1])
            pair_keys = []
            for j in range(nsub):
                sub = (other >> np.uint64(soff[j])) & (
                    (np.uint64(1) << np.uint64(sw[j])) - np.uint64(1)
                )
                so = np.argsort(sub, kind="stable")
                ss = sub[so]
                gb = np.nonzero(np.concatenate([[True], ss[1:] != ss[:-1]]))[0]
                ge = np.concatenate([gb[1:], [len(ss)]])
                for a0, a1 in zip(gb, ge):
                    if a1 - a0 < 2:
                        continue
                    grp = np.sort(so[a0:a1])
                    gsz = len(grp)
                    row_step = max(1, 2_000_000 // gsz)
                    for x0 in range(0, gsz - 1, row_step):
                        x1 = min(x0 + row_step, gsz - 1)
                        xi, yi = np.meshgrid(
                            np.arange(x0, x1), np.arange(gsz), indexing="ij"
                        )
                        sel = yi > xi
                        pair_keys.append(
                            grp[xi[sel]].astype(np.int64) * nb_ + grp[yi[sel]]
                        )
            if not pair_keys:
                continue
            pk = np.unique(np.concatenate(pair_keys))
            ia = pk // nb_
            ib = pk % nb_
            x = ush[ia] ^ ush[ib]
            # vectorized popcount via unpackbits on the byte view
            ham = np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)
            keep = ham <= max_hamming
            out_a.append(uid[ia][keep])
            out_b.append(uid[ib][keep])
            out_h.append(ham[keep].astype(np.int64))
        if not out_a:
            return pd.DataFrame(
                {
                    out_a_name: pd.Series([], dtype="int64"),
                    out_b_name: pd.Series([], dtype="int64"),
                    "hamming": pd.Series([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                out_a_name: np.concatenate(out_a),
                out_b_name: np.concatenate(out_b),
                "hamming": np.concatenate(out_h),
            }
        ).drop_duplicates([out_a_name, out_b_name])

    from pygeoops_ray.stages.groupagg import grouped_min

    pairs = (
        _split_for_group_verify(
            ds.map_batches(band_rows, batch_format="pyarrow").map_batches(
                add_coarse, batch_format="pyarrow"
            ),
            n_rows_hint * nb if n_rows_hint else None,
            _cshift,
        )
        .groupby("coarse")
        .map_groups(pair_verify, batch_format="pandas")
    )
    # dedup pairs found by several bands (hamming identical wherever found);
    # bucketed vectorized min — see groupagg.py
    return grouped_min(
        pairs, [out_a_name, out_b_name], "hamming",
        n_rows_hint=n_rows_hint * 8 if n_rows_hint else None,
    )
