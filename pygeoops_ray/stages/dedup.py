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


def _shingle_hashes(text: str, shingle: int = 3) -> np.ndarray:
    """Hashes of word shingles (uint64)."""
    words = text.split()
    if len(words) < shingle:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + shingle]) for i in range(len(words) - shingle + 1)]
    if not grams:
        return np.zeros(1, dtype=np.uint64)
    return np.array([hash_str64(t) for t in grams], dtype=np.uint64)


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
        """Explode each doc to (band_id, band_hash, doc_id) rows."""
        ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        out_doc, out_band, out_hash = [], [], []
        for doc_id, text in zip(ids, texts):
            sig = self.signature(text)
            for band in range(self.bands):
                chunk = sig[band * self.rows : (band + 1) * self.rows]
                h = hash_str64(chunk.tobytes().hex()) & 0x7FFFFFFFFFFFFFFF
                out_doc.append(doc_id)
                out_band.append(band)
                out_hash.append(h)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "band_id": pa.array(out_band, pa.int64()),
                "band_hash": pa.array(out_hash, pa.int64()),
            }
        )


def minhash_signatures_batch(batch: pa.Table) -> pa.Table:
    return _MinHasher()(batch)


def near_dup_pairs(docs_ds, jaccard_threshold: float = 0.6, concurrency: int = 4):
    """MinHash-LSH near-duplicate pairs (doc_a < doc_b) with verified Jaccard.

    band rows → groupby(band_id, band_hash) → in-bucket pairs → dedup pairs →
    exact shingle-Jaccard verify against broadcast texts (small corpus here; at
    scale the verify stage would re-join texts by doc_id instead).
    """
    import ray

    texts_df = docs_ds.select_columns(["doc_id", "text"]).to_pandas()
    texts_ref = ray.put(dict(zip(texts_df["doc_id"], texts_df["text"])))

    # task-based: the minhash coefficients are rebuilt per worker process
    # (cheap, seeded) — a fixed-size actor pool can starve the read stage on
    # small sessions
    bands = docs_ds.map_batches(_MinHasher(), batch_format="pyarrow")

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(group["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype(np.int64)
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})

    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )

    def verify(batch: pa.Table) -> pa.Table:
        texts = ray.get(texts_ref)
        a = batch["doc_a"].to_numpy()
        b = batch["doc_b"].to_numpy()
        keep, jac = [], []
        seen = set()
        for x, y in zip(a, b):
            if (x, y) in seen:
                keep.append(False)
                jac.append(0.0)
                continue
            seen.add((x, y))
            sa = set(_shingle_hashes(texts[x]).tolist())
            sb = set(_shingle_hashes(texts[y]).tolist())
            j = len(sa & sb) / max(len(sa | sb), 1)
            keep.append(j >= jaccard_threshold)
            jac.append(j)
        t = batch.append_column("jaccard", pa.array(jac))
        return t.filter(pa.array(keep))

    # dedup candidate pairs globally before verify (pairs can repeat across bands)
    uniq = pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda df: df.head(1), batch_format="pandas"
    )
    return uniq.map_batches(verify, batch_format="pyarrow")
