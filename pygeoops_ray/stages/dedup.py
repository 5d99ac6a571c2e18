"""Deduplication operators: exact (hash-partitioned) and MinHash-LSH near-dup.

Scale shape (ray_guide patterns): exact dedup pre-aggregates the min-keeper per
key inside each batch before the shuffle, so the groupby only sees one row per
(key, batch) — at 100 TB that's the difference between shuffling every row and
shuffling the distinct-key summary. MinHash: shingle → 64 minhashes → bands →
(band_id, band_hash) groupby → candidate pairs → exact Jaccard verify.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["exact_dedup_min", "minhash_signatures_batch", "near_dup_pairs"]


def exact_dedup_min(ds, key_cols: list[str], keep_col: str):
    """Keep min(keep_col) per key group: per-batch partial min, then groupby min.

    Equivalent SQL: SELECT key..., min(keep) GROUP BY key...
    """
    from ray.data.aggregate import Min

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(key_cols + [keep_col]).to_pandas()
        out = df.groupby(key_cols, as_index=False, sort=False)[keep_col].min()
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby(key_cols).aggregate(Min(keep_col, alias_name=keep_col))
    return agg


_MERSENNE = np.uint64((1 << 61) - 1)
_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xBF58476D1CE4E5B9)
_MIX3 = np.uint64(0x94D049BB133111EB)


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
    wh = np.array([zlib.crc32(w.encode("utf-8")) for w in words], dtype=np.uint64)
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
    docs_ds, jaccard_threshold: float = 0.6, concurrency: int = 4, num_partitions: int = 8
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
    # in one vectorized pass
    def add_coarse(b: pa.Table) -> pa.Table:
        bkey = (b["band_hash"].to_numpy().astype(np.uint64) << np.uint64(4)) ^ b[
            "band_id"
        ].to_numpy().astype(np.uint64)
        out = b.append_column("bkey", pa.array(bkey.astype(np.int64), pa.int64()))
        return out.append_column(
            # 64 coarse groups: map_groups pays ~1ms of pandas dispatch per
            # GROUP, so a 12-bit prefix (4096 near-empty groups) spent seconds
            # on dispatch alone; the in-group pairing is vectorized over
            # bucket runs, so fewer/bigger groups are strictly cheaper until
            # a group outgrows a block (raise the shift when corpus × bands
            # per group approaches block size)
            "coarse", pa.array((bkey >> np.uint64(58)).astype(np.int64), pa.int64())
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
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
            ia, ib = np.triu_indices(len(uniq), k=1)
            out_a.append(uniq[ia])
            out_b.append(uniq[ib])
        if not out_a:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)}
        ).drop_duplicates()

    pairs = (
        bands.map_batches(add_coarse, batch_format="pyarrow")
        .groupby("coarse")
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    # NOTE: pairs can repeat across bands/coarse groups; the duplicates ride
    # into the doc-bucket cogroup (2 small rows per repeat) and are dropped
    # there — cheaper than a dedicated global-dedup shuffle.

    # co-partitioned signature re-join WITHOUT Dataset.join: the hash-join
    # operator spins up an aggregator actor pool per stage (~1.5s fixed cost
    # each at this scale), while groupby's task-based shuffle reuses the same
    # machinery as every other stage. Shape: explode each pair into one row
    # per side keyed by that side's doc_id, union with the sig rows, cogroup
    # on the doc bucket to attach sigs, then regroup on the pair to pair up
    # sig_a/sig_b and verify — 2 shuffles, payloads only for candidate docs.
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

    tagged = pairs.map_batches(pair_sides, batch_format="pyarrow").union(
        sigs.map_batches(sig_side, batch_format="pyarrow")
    )

    def add_jbucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "jb", pa.array(b["jkey"].to_numpy() % num_partitions, pa.int64())
        )

    def attach_sig(group: pd.DataFrame) -> pd.DataFrame:
        is_sig = group["doc_a"].isna()
        lut = dict(
            zip(group.loc[is_sig, "jkey"].to_numpy(), group.loc[is_sig, "sig"].to_numpy())
        )
        p = group.loc[~is_sig].drop_duplicates(["doc_a", "doc_b", "jkey"])
        if not len(p):
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype="int64"),
                    "doc_b": pd.Series([], dtype="int64"),
                    "jkey": pd.Series([], dtype="int64"),
                    "sig": pd.Series([], dtype="object"),
                }
            )
        return pd.DataFrame(
            {
                "doc_a": p["doc_a"].astype("int64").to_numpy(),
                "doc_b": p["doc_b"].astype("int64").to_numpy(),
                "jkey": p["jkey"].to_numpy(),
                "sig": [lut.get(k) for k in p["jkey"].to_numpy()],
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
        return pd.DataFrame(
            {
                "doc_a": pd.Series(out_a, dtype="int64"),
                "doc_b": pd.Series(out_b, dtype="int64"),
                "jaccard": pd.Series(out_j, dtype="float64"),
            }
        )

    return (
        with_sig.map_batches(add_pbucket, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(pairup_verify, batch_format="pandas")
    )
