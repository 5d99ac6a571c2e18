"""Bloom-filter broadcast semi-join.

The 100-TB shape this implements: when a big probe table must be reduced to
the rows whose key appears in a build table, a shuffle semi-join moves EVERY
probe row through the exchange. A Bloom filter built over the build keys is a
few MB regardless of probe size; broadcast once (``ray.put``), it eliminates
the vast majority of non-matching probe rows inside ``map_batches`` BEFORE the
exchange, so the exact semi-join that removes the filter's false positives
shuffles only the survivors. Exactness is preserved end-to-end: the Bloom
pass has no false negatives by construction, and the follow-up ``left_semi``
join removes its false positives distributively.

Hashing is Kirsch-Mitzenmacher double hashing over two splitmix64 streams —
k positions derive from two 64-bit hashes, vectorized in numpy uint64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["BloomFilter", "build_bloom", "bloom_semi_join", "bloom_anti_join"]

_U64 = np.uint64
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 of (x ^ salt) — public constants, vectorized uint64."""
    with np.errstate(over="ignore"):
        z = (x ^ _U64(salt)) + _U64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        return z ^ (z >> _U64(31))


class BloomFilter:
    """m-bit filter packed into uint64 words; k double-hashed probes."""

    def __init__(self, m_bits: int, k: int, words: np.ndarray | None = None):
        self.m = int(m_bits)
        self.k = int(k)
        self.words = (
            words
            if words is not None
            else np.zeros((self.m + 63) // 64, dtype=np.uint64)
        )

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(k, n) bit positions for int64/uint64 keys."""
        x = keys.astype(np.uint64, copy=False)
        h1 = _mix(x, 0x5BF03635)
        h2 = _mix(x, 0xC2B2AE35) | _U64(1)  # odd stride
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return ((h1[None, :] + i * h2[None, :]) & _MASK) % _U64(self.m)

    def add(self, keys: np.ndarray) -> None:
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.words, pos >> _U64(6), _U64(1) << (pos & _U64(63)))

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership test: True for every inserted key (no false
        negatives); false-positive rate ~(1 - e^{-kn/m})^k."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        bits = (self.words[(pos >> _U64(6))] >> (pos & _U64(63))) & _U64(1)
        return bits.all(axis=0)


def build_bloom(
    ds, key_col: str, n_keys_hint: int, bits_per_key: int = 12, k: int = 6
) -> BloomFilter:
    """Distributed Bloom build: each block emits its packed partial bitmap
    (one row, m/8 bytes); the driver ORs the per-block bitmaps. The reduce
    payload is blocks × m/8 bytes — independent of build row count — and the
    m-bit sizing derives from the key-count hint (~12 bits/key → <1% FP)."""
    m_bits = max(1 << 14, int(bits_per_key * max(1, n_keys_hint)))
    # round m up to a whole word count
    m_bits = ((m_bits + 63) // 64) * 64

    def partial(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(m_bits, k)
        bf.add(batch[key_col].to_numpy(zero_copy_only=False))
        return pa.Table.from_pydict({"bitmap": pa.array([bf.words.tobytes()])})

    words = np.zeros(m_bits // 64, dtype=np.uint64)
    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    for b in parts.iter_batches(batch_format="pyarrow"):
        for blob in b["bitmap"]:
            words |= np.frombuffer(blob.as_py(), dtype=np.uint64)
    return BloomFilter(m_bits, k, words)


def bloom_semi_join(
    probe_ds,
    build_ds,
    probe_key: str,
    build_key: str,
    n_build_hint: int,
    num_partitions: int = 8,
    exact: bool = True,
):
    """probe_ds rows whose probe_key appears in build_ds.build_key.

    Bloom pre-filter (broadcast, no false negatives) cuts the probe stream
    inside map_batches; with ``exact=True`` a distributed ``left_semi`` join
    against the distinct build keys then removes the Bloom false positives,
    so the result is EXACT while only Bloom survivors enter the shuffle.
    """
    import ray

    from pygeoops_ray.stages.groupagg import grouped_count

    bf = build_bloom(build_ds, build_key, n_build_hint)
    # broadcast the raw word array (zero-copy shared-memory numpy on every
    # ray.get), not the Python wrapper; m/k ride in the closure
    words_ref = ray.put(bf.words)
    m_bits, k = bf.m, bf.k

    def probe(batch: pa.Table) -> pa.Table:
        flt = BloomFilter(m_bits, k, ray.get(words_ref))
        keys = batch[probe_key].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(flt.contains(keys)))

    survivors = probe_ds.map_batches(probe, batch_format="pyarrow")
    if not exact:
        return survivors
    # distinct build keys (algebraic pre-combine) then exact semi join of the
    # Bloom survivors only — the post-Bloom shuffle volume is matches + FPs.
    distinct = grouped_count(
        build_ds.select_columns([build_key]),
        [build_key],
        "_n",
        n_rows_hint=n_build_hint,
    ).select_columns([build_key])
    return survivors.join(
        distinct,
        join_type="left_semi",
        num_partitions=num_partitions,
        on=(probe_key,),
        right_on=(build_key,),
    )


def bloom_anti_join(
    probe_ds,
    build_ds,
    probe_key: str,
    build_key: str,
    n_build_hint: int,
    num_partitions: int = 8,
    bloom_probe_key: str | None = None,
    bloom_build_key: str | None = None,
    broadcast_threshold: int = 2_000_000,
):
    """probe_ds rows whose probe_key does NOT appear in build_ds.build_key.

    Two regimes, picked by the build-side size BOUND (``n_build_hint``):

    - **Broadcast** (hint ≤ ``broadcast_threshold``): the distinct build
      keys are bounded (≤ ~16 MB at the default threshold), so they ship
      once via ``ray.put`` and every probe block anti-filters with a
      vectorized ``np.isin`` inside ``map_batches`` — ONE probe traversal,
      zero exchanges. This is the brief's broadcast-small-sides idiom; the
      build side is consumed exactly once (same cost the Bloom build pass
      would have paid) and the probe side never lands on the driver.
    - **Bloom + cogroup** (hint above threshold): the Bloom filter's
      one-sided error works FOR the anti-join: a bloom-NEGATIVE row is
      definitely absent from the build side and flows straight through with
      no exchange at all; only bloom-POSITIVE rows (true members + the ~1%
      false positives) enter the exact ``left_anti`` cogroup that decides
      them. When most probe rows are new — the append-mode dedup case —
      almost nothing shuffles. Exact end-to-end.

    ``bloom_probe_key``/``bloom_build_key`` (default: the join keys) name an
    int64 DERIVED key for the filter when the exact join key is not numeric
    (e.g. a digest string): the derived key must be a pure function of the
    join key, which preserves no-false-negatives; the exact join still runs
    on the real key, so derived-key collisions cannot drop rows.

    In the Bloom regime probe_ds is traversed twice (negative and positive
    passes); pass a materialized dataset when upstream recompute is
    expensive.
    """
    import functools

    import ray

    broadcast_threshold_bytes = 64 * 2**20
    if n_build_hint <= broadcast_threshold:
        # The hint is caller-supplied and may under-estimate; before
        # committing to a driver-side pull, measure the ACTUAL projection
        # (row count bounds the distinct count from above; size_bytes
        # guards wide string keys the ~16 MB int64 sizing assumed).  The
        # projection traversal is the same single build-side pass the Bloom
        # build would have paid, so a fallback costs nothing extra.
        proj = build_ds.select_columns([build_key]).materialize()
        if (
            proj.count() <= broadcast_threshold
            and (proj.size_bytes() or 0) <= broadcast_threshold_bytes
        ):
            # build side bounded: exact broadcast anti-filter, one probe pass
            drop_ser = proj.to_pandas()[build_key]
            drop_keys = drop_ser.unique()
            keys_ref = ray.put(drop_keys)
            is_obj = drop_ser.dtype == object

            def anti_filter(batch: pa.Table) -> pa.Table:
                drop = ray.get(keys_ref)
                vals = batch[probe_key].to_numpy(zero_copy_only=False)
                if is_obj:
                    # hashtable membership — object-dtype np.isin is O(n*m)
                    mask = pd.Series(vals).isin(drop).to_numpy()
                else:
                    mask = np.isin(vals, drop)
                return batch.filter(pa.array(~mask))

            return probe_ds.map_batches(anti_filter, batch_format="pyarrow")
        # hint lied (or keys are wide): fall through to bloom + cogroup

    bpk = bloom_probe_key or probe_key
    bbk = bloom_build_key or build_key
    bf = build_bloom(build_ds, bbk, n_build_hint)
    words_ref = ray.put(bf.words)
    m_bits, k = bf.m, bf.k

    def split(batch: pa.Table, keep_members: bool) -> pa.Table:
        flt = BloomFilter(m_bits, k, ray.get(words_ref))
        keys = batch[bpk].to_numpy(zero_copy_only=False)
        mask = flt.contains(keys)
        return batch.filter(pa.array(mask if keep_members else ~mask))

    negatives = probe_ds.map_batches(
        functools.partial(split, keep_members=False), batch_format="pyarrow"
    )
    maybe = probe_ds.map_batches(
        functools.partial(split, keep_members=True), batch_format="pyarrow"
    ).materialize()
    if maybe.count() == 0:
        return negatives

    # second bloom, the other direction: build rows that can't match any
    # bloom-positive probe row are irrelevant to the anti decision, so the
    # exchange below moves ~|maybe| build keys instead of the whole build
    # side (classic two-way bloom join). No false negatives on either pass
    # ⇒ still exact.
    mf = build_bloom(maybe, bpk, max(1, maybe.count()))
    mwords_ref = ray.put(mf.words)
    mm_bits, mk = mf.m, mf.k

    def build_keys(batch: pa.Table) -> pa.Table:
        flt = BloomFilter(mm_bits, mk, ray.get(mwords_ref))
        mask = flt.contains(batch[bbk].to_numpy(zero_copy_only=False))
        return pa.Table.from_pydict({"_bkey": batch[build_key].filter(pa.array(mask))})

    relevant = build_ds.map_batches(build_keys, batch_format="pyarrow")

    # exact anti decision as ONE coarse-bucket cogroup (no Dataset.join —
    # its hash-shuffle actor pool costs ~10 s to spin up per session and
    # breaks on empty partitions): maybe rows (full schema, _isbuild=0) and
    # relevant build keys (_isbuild=1, other columns null) land in the same
    # bucket by join-key hash; the reducer drops maybe rows whose key has a
    # build row.
    from pygeoops_ray.stages.groupagg import _bucket_count

    schema = maybe.schema().base_schema

    def tag_maybe(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_isbuild", pa.array(np.zeros(batch.num_rows, np.int8), pa.int8())
        )

    def tag_build(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {}
        for f in schema:
            if f.name == probe_key:
                cols[f.name] = batch["_bkey"].cast(f.type)
            else:
                cols[f.name] = pa.nulls(n, f.type)
        t = pa.Table.from_pydict(cols)
        return t.append_column("_isbuild", pa.array(np.ones(n, np.int8), pa.int8()))

    tagged = maybe.map_batches(tag_maybe, batch_format="pyarrow").union(
        relevant.map_batches(tag_build, batch_format="pyarrow")
    )

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[probe_key], index=False).to_numpy()
        df = df.copy()
        df["_gb"] = (h % nb).astype("int64")
        return df

    def anti(grp: pd.DataFrame) -> pa.Table:
        present = grp.loc[grp["_isbuild"] == 1, probe_key].unique()
        keep = grp.loc[
            (grp["_isbuild"] == 0) & ~grp[probe_key].isin(present)
        ].drop(columns=["_isbuild", "_gb"])
        out = pa.Table.from_pandas(keep, preserve_index=False, schema=schema)
        return out.replace_schema_metadata(None)

    nb = _bucket_count(num_partitions, maybe.count() * 2)
    decided = (
        tagged.map_batches(add_bucket, batch_format="pandas")
        .groupby("_gb")
        .map_groups(anti, batch_format="pandas")
    )
    return negatives.union(decided)
