"""HyperLogLog distinct-count sketch — the streaming-aggregate shape.

Exact distinct (stages/profile.py) shuffles one row per DISTINCT value; at
100-TB vocabulary scale even that exchange is large. The HLL register table
is a CONSTANT-size summary (2^p small ints) that merges with max() — the
per-batch partial is ≤2^p rows regardless of batch size, so the shuffle
volume is O(blocks · 2^p), independent of the data.

Everything here is integer-exact and SQL-replayable, so the driver oracle
recomputes every register from scratch:

- value hash = little-endian bytes 8:16 of md5 (DuckDB ``md5_number_lower``)
- bucket = top ``p`` bits; remainder = low ``64-p`` bits
- rank = position of the first 1 bit in the remainder (w - bit_length + 1),
  ``w+1`` when the remainder is zero
- register = max rank per bucket

``p=12`` keeps the remainder below 2^52, so ``np.frexp`` on the float64 cast
recovers bit_length EXACTLY (every value < 2^52 is representable) — no
Python loop over bits and no float-log2 rounding hazard.

The float estimator (Flajolet et al. 2007 alpha_m · m²/Σ2^-M_j with the
small-range linear-counting correction) is provided for consumers and
property-tested for accuracy; the driver-facing output is the integer
register table, which is value-exact.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa

from pygeoops_ray.stages.groupagg import grouped_agg

__all__ = [
    "md5_low64",
    "md5_both64",
    "hll_partial",
    "hll_registers",
    "hll_estimate",
    "heavy_hitters",
    "cms_partial",
    "cms_registers",
    "cms_estimate",
]


def md5_low64(s: str) -> int:
    """The exact integer DuckDB's md5_number_lower() returns."""
    return struct.unpack("<Q", hashlib.md5(s.encode("utf-8")).digest()[8:16])[0]


def md5_both64(s: str) -> tuple[int, int]:
    """(md5_number_lower, md5_number_upper) — both DuckDB-exact halves from
    ONE md5 evaluation (bytes 8:16 and 0:8, little-endian)."""
    d = hashlib.md5(s.encode("utf-8")).digest()
    return struct.unpack("<Q", d[8:16])[0], struct.unpack("<Q", d[0:8])[0]


def hll_partial(values: list[str], p: int) -> tuple[np.ndarray, np.ndarray]:
    """(buckets, max-ranks) register partial for one batch of string values.

    Deduplicates first (HLL is insensitive to multiplicity), so md5 runs once
    per distinct value per batch.
    """
    w = 64 - p
    vals = set(values)
    if not vals:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    h = np.fromiter((md5_low64(v) for v in vals), dtype=np.uint64, count=len(vals))
    bucket = (h >> np.uint64(w)).astype(np.int64)
    rem = (h & np.uint64((1 << w) - 1)).astype(np.uint64)
    rank = np.full(len(h), w + 1, dtype=np.int64)
    nz = rem > 0
    # bit_length via frexp: exact because rem < 2^w <= 2^52 for p >= 12
    _, exp = np.frexp(rem[nz].astype(np.float64))
    rank[nz] = w - exp + 1
    df = pd.DataFrame({"bucket": bucket, "r": rank})
    g = df.groupby("bucket", sort=False, as_index=False)["r"].max()
    return g["bucket"].to_numpy(), g["r"].to_numpy()


def hll_registers(ds, col: str, p: int = 12, tokenize: bool = False):
    """Distributed HLL register table for a string column (or its tokens).

    Per-batch partial (≤2^p rows) → grouped max. ``tokenize=True`` counts
    distinct whitespace tokens of the column instead of distinct cell values
    (vocabulary estimation over a document corpus).
    """
    if p < 12:
        raise ValueError("p >= 12 required (frexp exactness bound)")

    def partial(batch: pa.Table) -> pa.Table:
        col_vals = batch[col].to_pylist()
        if tokenize:
            vals: list[str] = []
            for t in col_vals:
                vals.extend(t.split(" "))
        else:
            vals = [str(v) for v in col_vals]
        bucket, rank = hll_partial(vals, p)
        return pa.Table.from_pydict(
            {"bucket": pa.array(bucket, pa.int64()), "r": pa.array(rank, pa.int64())}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_agg(parts, ["bucket"], [("r", "max", "r")], n_buckets=8)


def hll_tokens_batch(batch: pa.Table, p: int = 12) -> pa.Table:
    """Registry-facing batch stage: per-batch HLL register partial over the
    whitespace tokens of a ``text`` column (merge with grouped max)."""
    vals: list[str] = []
    for t in batch["text"].to_pylist():
        vals.extend(t.split(" "))
    bucket, rank = hll_partial(vals, p)
    return pa.Table.from_pydict(
        {"bucket": pa.array(bucket, pa.int64()), "r": pa.array(rank, pa.int64())}
    )


def hll_registers_by_group(ds, group_col: str, text_col: str = "text", p: int = 12):
    """Per-GROUP HLL register table: distinct-token sketch for every value of
    ``group_col`` (e.g. vocabulary size per language/domain).

    The distributed shape is the per-group generalization of
    ``hll_registers``: each batch emits at most ``n_groups_in_batch × 2^p``
    register partials (in practice far fewer — only touched buckets appear),
    merged by a grouped max keyed on (group, bucket). Shuffle volume is
    bounded by groups × 2^p REGARDLESS of corpus size — the canonical
    mergeable-sketch contract that lets a 100-TB per-domain profile run as
    one streaming pass."""
    if p < 12:
        raise ValueError("p >= 12 required (frexp exactness bound)")

    def partial(batch: pa.Table) -> pa.Table:
        groups = batch[group_col].to_pylist()
        texts = batch[text_col].to_pylist()
        by_group: dict[str, list[str]] = {}
        for g, t in zip(groups, texts):
            by_group.setdefault(g, []).extend(t.split(" "))
        gs: list[str] = []
        bs: list[np.ndarray] = []
        rs: list[np.ndarray] = []
        for g, vals in by_group.items():
            bucket, rank = hll_partial(vals, p)
            gs.extend([g] * len(bucket))
            bs.append(bucket)
            rs.append(rank)
        b = np.concatenate(bs) if bs else np.empty(0, np.int64)
        r = np.concatenate(rs) if rs else np.empty(0, np.int64)
        return pa.Table.from_pydict(
            {
                group_col: pa.array(gs, pa.string()),
                "bucket": pa.array(b, pa.int64()),
                "r": pa.array(r, pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_agg(parts, [group_col, "bucket"], [("r", "max", "r")], n_buckets=8)


def cms_partial(counts: dict[str, int], d: int, w: int) -> tuple[np.ndarray, ...]:
    """(row, col, n) Count-Min register partial for one batch's term counts.

    Kirsch-Mitzenmacher double hashing from ONE md5 per term: row r's cell
    is ``(lower + r * (upper | 1)) mod 2^64 mod w`` with lower/upper the two
    64-bit halves DuckDB's ``md5_number_lower``/``md5_number_upper`` return
    — d probes per term for one hash evaluation, and the merged register
    table is still value-checkable from scratch in SQL.
    """
    if not counts:
        z = np.empty(0, np.int64)
        return z, z, z
    terms = list(counts)
    ns = np.fromiter((counts[t] for t in terms), dtype=np.int64, count=len(terms))
    lo = np.empty(len(terms), dtype=np.uint64)
    hi = np.empty(len(terms), dtype=np.uint64)
    for i, t in enumerate(terms):
        lo[i], hi[i] = md5_both64(t)
    hi |= np.uint64(1)  # odd stride
    rows: list[np.ndarray] = []
    cols: list[np.ndarray] = []
    vals: list[np.ndarray] = []
    with np.errstate(over="ignore"):
        for r in range(d):
            j = ((lo + np.uint64(r) * hi) % np.uint64(w)).astype(np.int64)
            df = pd.DataFrame({"j": j, "n": ns})
            g = df.groupby("j", sort=False, as_index=False)["n"].sum()
            rows.append(np.full(len(g), r, dtype=np.int64))
            cols.append(g["j"].to_numpy())
            vals.append(g["n"].to_numpy())
    return np.concatenate(rows), np.concatenate(cols), np.concatenate(vals)


def cms_registers(ds, col: str = "text", d: int = 4, w: int = 1024, tokenize: bool = True):
    """Distributed Count-Min sketch over a string column (or its tokens).

    The mergeable-sketch contract for approximate frequency at 100 TB: each
    block emits at most d×w register partials (merge = grouped SUM — counts
    are additive), so the exchange is bounded by d×w regardless of corpus
    size, and ``est(term) = min_r reg[r][h_r(term)]`` upper-bounds the true
    count with classic (eps, delta) guarantees. Registers are integer-exact
    and deterministic (md5 hashing), so the merged table value-checks
    against a from-scratch SQL re-derivation — the vocab_hll pattern for a
    SUM-merged sketch."""

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for v in batch[col].to_pylist():
            if tokenize:
                c.update(v.split(" "))
            else:
                c[str(v)] += 1
        r, j, n = cms_partial(c, d, w)
        return pa.Table.from_pydict(
            {
                "r": pa.array(r, pa.int64()),
                "j": pa.array(j, pa.int64()),
                "cnt": pa.array(n, pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_agg(parts, ["r", "j"], [("cnt", "sum", "cnt")], n_buckets=4)


def cms_estimate(registers: pd.DataFrame, term: str, d: int = 4, w: int = 1024) -> int:
    """Point frequency estimate from a merged (r, j, cnt) register frame."""
    est = None
    reg = {
        (int(a), int(b)): int(c)
        for a, b, c in zip(registers["r"], registers["j"], registers["cnt"])
    }
    lo, hi = md5_both64(term)
    hi |= 1
    for r in range(d):
        j = int(((lo + r * hi) % (1 << 64)) % w)
        v = reg.get((r, j), 0)
        est = v if est is None else min(est, v)
    return int(est or 0)


def hll_estimate(registers: pd.DataFrame, p: int = 12) -> float:
    """Flajolet 2007 estimator from a (bucket, r) register frame; buckets
    absent from the frame are zero registers."""
    m = 1 << p
    reg = np.zeros(m, dtype=np.int64)
    reg[registers["bucket"].to_numpy()] = registers["r"].to_numpy()
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int((reg == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def heavy_hitters(
    ds,
    col: str,
    k: int = 20,
    capacity: int = 256,
    tokenize: bool = False,
):
    """EXACT global top-k most frequent values via candidate-pruned two-pass
    counting (SpaceSaving/Misra-Gries shape with an exactness certificate).

    Pass 1: every block counts ITS OWN values exactly (vectorized
    value_counts) and keeps only its top-``capacity`` terms plus one
    threshold scalar t_b (the largest count it dropped). Any term absent
    from every block summary has global count <= E = sum_b t_b, so the
    merged candidate set provably contains every term whose global count
    exceeds E. Pass 2 recounts ONLY the candidates exactly (broadcast
    membership filter before the shuffle). Certificate: if the k-th largest
    exact candidate count >= E, no non-candidate can displace the top-k and
    the result is exact; otherwise fall back to a full exact count (correct
    either way — the fallback only costs the full-vocabulary shuffle the
    two-pass design avoids).

    Shuffle volume: pass 1 moves <= blocks x capacity partial rows + one
    scalar per block; pass 2 moves only candidate occurrences — at 100-TB
    corpus scale that is the difference between shipping the whole
    vocabulary and shipping a bounded candidate table.

    Returns a pandas DataFrame (term, n, rank) — top k by (count DESC,
    term ASC), a deterministic total order.
    """
    import ray

    from pygeoops_ray.stages.groupagg import grouped_count

    def to_terms(batch: pa.Table) -> list[str]:
        col_vals = batch[col].to_pylist()
        if tokenize:
            out: list[str] = []
            for t in col_vals:
                out.extend(t.split(" "))
            return out
        return [str(v) for v in col_vals]

    def pass1(batch: pa.Table) -> pa.Table:
        vc = pd.Series(to_terms(batch)).value_counts()
        if len(vc) > capacity:
            # deterministic keep rule: (count DESC, term ASC)
            order = pd.DataFrame({"t": vc.index, "n": vc.to_numpy()}).sort_values(
                ["n", "t"], ascending=[False, True]
            )
            kept = order.iloc[:capacity]
            thr = int(order.iloc[capacity]["n"])
        else:
            kept = pd.DataFrame({"t": vc.index, "n": vc.to_numpy()})
            thr = 0
        return pa.Table.from_pydict(
            {
                "term": pa.array(list(kept["t"]) + [""], pa.string()),
                "n": pa.array(list(kept["n"].astype(np.int64)) + [0], pa.int64()),
                "thr": pa.array([0] * len(kept) + [thr], pa.int64()),
            }
        )

    summaries = ds.map_batches(pass1, batch_format="pyarrow").materialize()
    slack = summaries.sum("thr")
    cand = (
        grouped_count(
            summaries.filter(expr="thr == 0"), ["term"], "n_blocks", n_buckets=8
        )
        .select_columns(["term"])
        .to_pandas()["term"]
        .to_numpy()
    )
    cand_ref = ray.put(np.sort(cand.astype(object)))

    def count_rows(batch: pa.Table, members=None) -> pa.Table:
        terms = np.array(to_terms(batch), dtype=object)
        if members is not None:
            allowed = ray.get(members)
            terms = terms[np.isin(terms, allowed)]
        vc = pd.Series(terms).value_counts() if len(terms) else pd.Series(dtype=np.int64)
        return pa.Table.from_pydict(
            {
                "term": pa.array(vc.index.to_numpy().astype(str), pa.string()),
                "cnt": pa.array(vc.to_numpy().astype(np.int64), pa.int64()),
            }
        )

    from functools import partial as _partial

    exact = grouped_agg(
        ds.map_batches(_partial(count_rows, members=cand_ref), batch_format="pyarrow"),
        ["term"],
        [("cnt", "sum", "n")],
        n_buckets=8,
    ).to_pandas()

    top = exact.sort_values(["n", "term"], ascending=[False, True]).head(k)
    if len(top) and int(top["n"].iloc[-1]) >= int(slack):
        result = top
    else:
        # certificate failed (extremely flat distribution): full exact count
        full = grouped_agg(
            ds.map_batches(count_rows, batch_format="pyarrow"),
            ["term"],
            [("cnt", "sum", "n")],
        ).to_pandas()
        result = full.sort_values(["n", "term"], ascending=[False, True]).head(k)
    result = result.reset_index(drop=True)
    result["rank"] = np.arange(1, len(result) + 1, dtype=np.int64)
    result["n"] = result["n"].astype(np.int64)
    return result[["term", "n", "rank"]]
