"""Text-analysis queries: tokenization, quality, lang-ID, fingerprints, term stats, sketches.

Split from pipelines/queries.py (round-2 verdict item 7); queries.py
remains the single QUERIES/ORACLE_SQL registry and re-exports these names.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa

from pygeoops_ray.stages import text as text_stages
from pygeoops_ray.pipelines.common import (
    _read,
    _read_blocked,
    _table_rows,
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


def q_gopher_quality(sf_dir: str):
    """Gopher-style repetition quality rules (Rae et al. 2021 §A1.1): per-doc
    top-bigram occurrence count and duplicated-trigram token count, exact
    integers (stages/text.py:gopher_quality_batch)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(text_stages.gopher_quality_batch, batch_format="pyarrow")


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: flag documents containing any snippet of a
    broadcast eval set (here: a 24-char substring of each of the 10 smallest
    doc_ids, derived from the corpus itself so the oracle re-derives it).

    Shape: tiny side pulled once (bounded: 10 rows) → shipped in the actor
    constructor (once per actor, never per batch); each batch is scanned
    with one vectorized substring pass per snippet. At real scale the eval
    set is a file read once per actor in ``__init__``.
    """
    bench = (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .filter(expr="doc_id < 10")
        .to_pandas()
        .sort_values("doc_id")
    )
    snips = [t[10:34] for t in bench["text"]]
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        text_stages.Decontaminate,
        batch_format="pyarrow",
        concurrency=2,
        fn_constructor_kwargs={"snips": snips},
    )


def q_bigram_lm(sf_dir: str):
    """Corpus-LM fluency score: each document scored by the corpus-wide
    frequency of its own bigrams (the classic count-based LM quality signal —
    integer-exact stand-in for model perplexity scoring).

    Two consumers of ONE tokenize pass: (1) bigram instances bucket-shuffle
    by gram, the reducer annotates every instance with its global count
    in-shuffle (count + join fused into a single exchange — no second
    all-to-all); (2) a grouped sum by doc_id yields (lm_hits, n_bigrams).
    """
    from pygeoops_ray.stages.groupagg import _bucket_count, _bucketed, grouped_agg

    n_docs = _table_rows(sf_dir, "documents")
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    inst = docs.map_batches(text_stages.bigram_rows_batch, batch_format="pyarrow")

    def annotate(df):
        df = df.assign(c=df.groupby("g", sort=False)["g"].transform("size"))
        return df[["doc_id", "c"]]

    n_buckets = _bucket_count(64, n_docs * 60)
    with_counts = _bucketed(inst, ["g"], annotate, n_buckets)
    return grouped_agg(
        with_counts,
        ["doc_id"],
        [("c", "sum", "lm_hits"), ("c", "size", "n_bigrams")],
        n_rows_hint=n_docs,
    )


def q_dup_spans(sf_dir: str):
    """Exact duplicated-window dedup (Lee et al. 2022 exact-substring shape,
    windowed): every 8-token window shared by >=2 DISTINCT documents is a
    duplicated span; per document report the window total, the duplicated
    window count, and the number of tokens covered by the interval-UNION of
    its duplicated windows (overlapping spans counted once).

    Distributed shape: (doc, pos, gram) instance rows bucket-shuffle ONCE by
    gram — the reducer computes distinct-doc counts and filters dups in the
    same exchange (count + filter fused, nothing re-joined); the surviving
    (doc, pos) rows (bounded by duplicate density) bucket by doc for the
    vectorized interval-union; totals combine with the per-doc window counts
    through a union + grouped sum — no hash join anywhere.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from pygeoops_ray.stages.groupagg import _bucket_count, _bucketed, grouped_agg

    n_docs = _table_rows(sf_dir, "documents")
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    inst = docs.map_batches(
        lambda b: text_stages.ngram_pos_rows_batch(b, 8), batch_format="pyarrow"
    )

    def mark_dups(df: pd.DataFrame) -> pd.DataFrame:
        nd = df.groupby("g", sort=False)["doc_id"].transform("nunique")
        return df.loc[nd >= 2, ["doc_id", "pos"]]

    n_buckets = _bucket_count(64, n_docs * 20)
    dup = _bucketed(inst, ["g"], mark_dups, n_buckets)

    def coverage(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "pos"], kind="mergesort")
        ids = df["doc_id"].to_numpy()
        p = df["pos"].to_numpy()
        nxt_same = np.zeros(len(p), bool)
        nxt_same[:-1] = ids[1:] == ids[:-1]
        gap = np.full(len(p), 8, np.int64)
        gap[:-1] = np.minimum(p[1:] - p[:-1], 8)
        contrib = np.where(nxt_same, gap, 8)
        out = pd.DataFrame({"doc_id": ids, "c": contrib})
        g = out.groupby("doc_id", sort=False)["c"].agg(["sum", "size"]).reset_index()
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"],
                "n_windows": np.zeros(len(g), np.int64),
                "dup_windows": g["size"].to_numpy().astype(np.int64),
                "dup_tokens": g["sum"].to_numpy().astype(np.int64),
            }
        )

    cov = _bucketed(dup, ["doc_id"], coverage, _bucket_count(16, n_docs))

    def window_base(batch: pa.Table) -> pa.Table:
        nt = (
            pc.list_value_length(pc.split_pattern(batch["text"], " "))
            .to_numpy()
            .astype(np.int64)
        )
        nw = np.maximum(nt - 7, 0)
        z = np.zeros(len(nw), np.int64)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "n_windows": pa.array(nw, pa.int64()),
                "dup_windows": pa.array(z, pa.int64()),
                "dup_tokens": pa.array(z, pa.int64()),
            }
        )

    base = docs.map_batches(window_base, batch_format="pyarrow")
    return grouped_agg(
        base.union(cov),
        ["doc_id"],
        [
            ("n_windows", "sum", "n_windows"),
            ("dup_windows", "sum", "dup_windows"),
            ("dup_tokens", "sum", "dup_tokens"),
        ],
        n_rows_hint=n_docs,
    )


def q_pii_redact(sf_dir: str):
    """PII redaction with a byte-exact oracle: deterministic synthetic PII
    (emails for doc_id%7==0, phone numbers for doc_id%11==0 — the corpus has
    none of its own, and the rule lets DuckDB re-derive the enriched text) is
    appended in a vectorized map, then the RedactPii actor pool counts and
    globally replaces both patterns; md5 of the redacted text proves the
    replacement output byte-for-byte.
    """
    import pandas as pd

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def inject(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy()
        txt = df["text"].astype(object)
        email = (
            " mail u"
            + pd.Series(ids.astype(str), index=df.index)
            + "@ex"
            + pd.Series((ids % 5).astype(str), index=df.index)
            + ".com"
        )
        phone = (
            " tel 555-"
            + pd.Series((1000 + ids % 9000).astype(str), index=df.index)
            + "-"
            + pd.Series((10 + ids % 90).astype(str), index=df.index)
        )
        txt = txt.where(ids % 7 != 0, txt + email)
        txt = txt.where(ids % 11 != 0, txt + phone)
        return pd.DataFrame({"doc_id": df["doc_id"], "text": txt})

    return ds.map_batches(inject, batch_format="pandas").map_batches(
        text_stages.RedactPii, batch_format="pyarrow", concurrency=2
    )


def q_domain_mix(sf_dir: str):
    """Domain-mixture rebalancing: subsample every language domain down to
    the size of the SMALLEST domain (uniform target mixture with maximum
    retention), selecting rows deterministically by md5(doc_id) order — the
    training-data mixing step, identical across reruns and partitionings.

    Shape: domain sizes via the algebraic grouped count (rows shuffled = one
    per (batch, domain)); the tiny per-domain table (bounded by |domains|)
    decides n_min on the driver; membership is the bounded-partial top-N
    selection per domain (each batch pre-truncates to n_min rows/domain, so
    at most n_min x buckets tiny rows reach the exchange).
    """
    import hashlib

    import pandas as pd

    from pygeoops_ray.stages.groupagg import _bucketed, grouped_count

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    counts = grouped_count(docs, ["lang"], "n", n_rows_hint=64).to_pandas()
    n_min = int(counts["n"].min())

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["h"] = [hashlib.md5(str(i).encode()).hexdigest() for i in df["doc_id"]]
        return df

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["lang", "h", "doc_id"], kind="mergesort")
            .groupby("lang", sort=False)
            .head(n_min)
        )

    def reducer(df: pd.DataFrame) -> pd.DataFrame:
        out = pre(df)
        out = out.assign(rnk=out.groupby("lang", sort=False).cumcount() + 1)
        return out[["doc_id", "lang", "rnk"]]

    hashed = docs.map_batches(add_hash, batch_format="pandas")
    return _bucketed(hashed, ["lang"], reducer, 8, pre=pre)


def q_jsonl_scan(sf_dir: str):
    """JSONL source-format coverage: the documents table is exported once to
    line-delimited JSON (8 files — the crawl-dump layout every web corpus
    starts from), read back with ``ray.data.read_json``, and aggregated per
    (lang, source). The oracle aggregates the parquet directly, so the row
    counts and integer sums prove the JSON write/read roundtrip lossless.
    """
    import hashlib
    import os

    import ray.data as rd

    from pygeoops_ray.stages.groupagg import grouped_agg

    n = _table_rows(sf_dir, "documents")
    key = hashlib.md5(f"{os.path.abspath(sf_dir)}:{n}:jsonl".encode()).hexdigest()[:10]
    path = f"/tmp/pygeoops_ray_cache/docs_jsonl_{key}"
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.isfile(marker):
        os.makedirs(path, exist_ok=True)
        _read(
            sf_dir, "documents", columns=["doc_id", "lang", "source", "n_chars"]
        ).repartition(8).write_json(path)
        with open(marker, "w"):
            pass
    files = [os.path.join(path, f) for f in os.listdir(path) if f.endswith(".json")]
    ds = rd.read_json(files)
    return grouped_agg(
        ds,
        ["lang", "source"],
        [
            ("doc_id", "sum", "sum_doc_id"),
            ("n_chars", "sum", "sum_chars"),
            ("doc_id", "size", "n_docs"),
        ],
        n_rows_hint=256,
    )


BM25_QUERY_TERMS = ("table", "value", "data", "window", "join")


def q_bm25_topk(sf_dir: str):
    """BM25 ranked retrieval, top-10 per query term, integer-exact.

    Pass 1 (corpus stats): one streaming aggregate → (N docs, TOT tokens) —
    two scalars broadcast into the scoring kernel as closure ints. Pass 2:
    per-batch (term, doc, tf, dl, score_fp) candidate rows for the query
    terms only (stages/text.py:bm25_rows_batch — fixed-point BM25, floor
    division matching DuckDB's `//`). Top-10 per term via the bounded-partial
    top-N shape: per-bucket pre-top-10 by (score_fp DESC, doc_id), global
    reduce ranks the survivors. Only ≤10·buckets tiny rows ever shuffle.
    """
    from pygeoops_ray.stages.groupagg import _bucketed

    n_docs = _table_rows(sf_dir, "documents")
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    tot = int(
        docs.map_batches(text_stages.token_count_batch, batch_format="pyarrow").sum(
            "n_tokens"
        )
    )

    cand = docs.map_batches(
        text_stages.bm25_rows_batch,
        batch_format="pyarrow",
        fn_kwargs={
            "terms": BM25_QUERY_TERMS,
            "n_docs": n_docs,
            "tot_tokens": tot,
        },
    )

    def pre(df):
        return (
            df.sort_values(
                ["term", "score_fp", "doc_id"],
                ascending=[True, False, True],
                kind="mergesort",
            )
            .groupby("term", sort=False)
            .head(10)
        )

    def reducer(df):
        out = pre(df)
        out = out.assign(rnk=out.groupby("term", sort=False).cumcount() + 1)
        return out[["term", "doc_id", "tf", "dl", "score_fp", "rnk"]]

    return _bucketed(cand, ["term"], reducer, 8, pre=pre)


BPE_N_MERGES = 10


def q_bpe_train(sf_dir: str):
    """Distributed BPE tokenizer TRAINING — the canonical LLM-data op: learn
    the corpus's top-10 merges.

    Shape: ONE corpus-sized exchange builds the word-frequency table
    (grouped count); every merge round then runs over the VOCAB table only —
    per-batch weighted pair partials (stages/text.bpe_pair_partials,
    vectorized), a pair-vocab-sized grouped sum, a driver argmax over that
    bounded table (the broadcast-iterate control plane, same as the kmeans
    centroid step), and a vectorized literal replace applied per batch.
    Sentinel-wrapped symbol sequences (stages/text.seq_of_word) make the
    replace EXACTLY BPE's leftmost non-overlapping merge with symbol
    boundaries intact, and DuckDB's replace() shares the semantics — the
    oracle replays all 10 rounds as chained CTEs, bit-exact including the
    (count DESC, pair ASC) tie rule.
    """
    import numpy as np
    import pandas as pd

    from pygeoops_ray.stages.groupagg import grouped_agg, grouped_count
    from pygeoops_ray.stages.text import SEP, bpe_pair_partials, seq_of_word

    n_docs = _table_rows(sf_dir, "documents")
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def word_rows(batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        flat = pc.list_flatten(pc.split_pattern(batch["text"], " "))
        flat = flat.filter(pc.not_equal(flat, ""))
        return pa.Table.from_pydict({"w": flat})

    words = docs.map_batches(word_rows, batch_format="pyarrow")
    wc = grouped_count(words, ["w"], "cnt", n_rows_hint=n_docs * 30)

    def add_seq(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"seq": [seq_of_word(w) for w in df["w"]], "cnt": df["cnt"]}
        )

    wt = wc.map_batches(add_seq, batch_format="pandas").materialize()

    def local_round(df: pd.DataFrame, rnk: int, merges: list) -> pd.DataFrame:
        """One merge round on an in-memory word table (shared by both paths:
        per-bucket in the distributed loop, whole-table in the small-vocab
        single-task path). Returns the updated table; appends to merges."""
        import pyarrow as pa

        pt = bpe_pair_partials(
            pa.Table.from_pandas(df, preserve_index=False)
        ).to_pandas()
        if not len(pt):
            return df
        agg = pt.groupby("pair", as_index=False)["c"].sum()
        best = agg.sort_values(["c", "pair"], ascending=[False, True]).iloc[0]
        lft, rgt = best["pair"].split(SEP)
        merges.append((rnk, lft, rgt, int(best["c"])))
        pat = SEP + lft + SEP + SEP + rgt + SEP
        rep = SEP + lft + rgt + SEP
        return pd.DataFrame(
            {"seq": df["seq"].str.replace(pat, rep, regex=False), "cnt": df["cnt"]}
        )

    # Small-vocab fast path (same rationale as the pagerank/CC local rounds):
    # below ~100k distinct words the 10 per-round exchanges are pure fixed
    # cost — ONE Ray task runs every round through the identical kernels.
    if wt.count() <= 100_000:

        def all_rounds(df: pd.DataFrame) -> pd.DataFrame:
            merges: list = []
            for rnk in range(1, BPE_N_MERGES + 1):
                df = local_round(df, rnk, merges)
            return pd.DataFrame(
                merges, columns=["rnk", "lft", "rgt", "c"]
            ).astype({"rnk": np.int64, "c": np.int64})

        return (
            wt.repartition(1)
            .map_batches(all_rounds, batch_format="pandas", batch_size=None)
            .to_pandas()
        )

    merges = []
    for rnk in range(1, BPE_N_MERGES + 1):
        partials = wt.map_batches(bpe_pair_partials, batch_format="pyarrow")
        pdf = grouped_agg(
            partials, ["pair"], [("c", "sum", "c")], n_rows_hint=4096
        ).to_pandas()  # bounded by the symbol-pair vocabulary
        if not len(pdf):
            break
        best = pdf.sort_values(["c", "pair"], ascending=[False, True]).iloc[0]
        pair = best["pair"]
        lft, rgt = pair.split(SEP)
        merges.append((rnk, lft, rgt, int(best["c"])))
        pat = SEP + lft + SEP + SEP + rgt + SEP
        rep = SEP + lft + rgt + SEP

        def apply(df: pd.DataFrame, pat=pat, rep=rep) -> pd.DataFrame:
            return pd.DataFrame(
                {"seq": df["seq"].str.replace(pat, rep, regex=False), "cnt": df["cnt"]}
            )

        wt = wt.map_batches(apply, batch_format="pandas").materialize()

    return pd.DataFrame(merges, columns=["rnk", "lft", "rgt", "c"]).astype(
        {"rnk": np.int64, "c": np.int64}
    )


def q_seq_pack(sf_dir: str):
    """Greedy sequence packing for LLM training batches: walk documents in
    doc_id order, appending each to the current pack of capacity L=256
    tokens, opening a new pack when it would overflow. Emits every doc's
    (pack_id, pack_off) — the layout step before writing packed token files.

    The assignment is GLOBALLY sequential (each doc's pack depends on every
    doc before it), yet distributes exactly because the scan state is tiny —
    (open-pack fill, pack counter) with fill ∈ [0, L] — so each contiguous
    doc_id range can precompute its full TRANSFER FUNCTION: for all L+1
    possible entry fills, the packs it would open and the exit fill, as one
    vectorized (L+1)-wide simulation. The driver composes the per-range
    functions in order (O(ranges) lookups, never O(docs)), broadcasts each
    range's true entry state, and a second grouped pass replays the exact
    assignment locally. The same shape handles any bounded-state scan
    (run-length file chunking, quota-based sharding) at 100 TB: ranges ~
    blocks, transfer tables ~ KB per block.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    L = 256
    n_docs = _table_rows(sf_dir, "documents")
    rng = max(64, n_docs // 64)  # docs per contiguous range

    def tok(batch: pa.Table) -> pa.Table:
        t = pc.list_value_length(pc.split_pattern(batch["text"], " ")).to_numpy()
        t = np.minimum(t.astype(np.int64), L)
        did = batch["doc_id"].to_numpy()
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(did, pa.int64()),
                "t": pa.array(t, pa.int64()),
                "g": pa.array(did // rng, pa.int64()),
            }
        )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        tok, batch_format="pyarrow"
    )

    def transfer(group: pd.DataFrame) -> pd.DataFrame:
        ts = group.sort_values("doc_id")["t"].to_numpy()
        f = np.arange(L + 1, dtype=np.int64)  # all possible entry fills
        dp = np.zeros(L + 1, dtype=np.int64)
        for t in ts:
            over = f + t > L
            dp += over
            f = np.where(over, t, f + t)
        return pd.DataFrame(
            {"g": group["g"].iloc[0], "f_in": np.arange(L + 1), "dp": dp, "f_out": f}
        )

    # transfer table: (ranges × (L+1)) rows — KBs however large the corpus
    tt = ds.groupby("g").map_groups(transfer, batch_format="pandas").to_pandas()
    entry: dict[int, tuple[int, int]] = {}
    p, f = 0, 0
    for g in sorted(tt["g"].unique()):
        entry[int(g)] = (p, f)
        row = tt[(tt["g"] == g) & (tt["f_in"] == f)]
        p += int(row["dp"].iloc[0])
        f = int(row["f_out"].iloc[0])

    def assign(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values("doc_id")
        ts = group["t"].to_numpy()
        p, f = entry[int(group["g"].iloc[0])]
        packs = np.empty(len(ts), dtype=np.int64)
        offs = np.empty(len(ts), dtype=np.int64)
        for i, t in enumerate(ts):
            if f + t > L:
                p += 1
                f = 0
            packs[i] = p
            offs[i] = f
            f += t
        return pd.DataFrame(
            {"doc_id": group["doc_id"].to_numpy(), "pack_id": packs, "pack_off": offs}
        )

    return ds.groupby("g").map_groups(assign, batch_format="pandas")


def q_inverted_index(sf_dir: str):
    """Distributed inverted index build + pruned term lookup — the
    index-at-rest serving shape: postings land in hash(term)-bucketed
    partition files once, and a term query reads ONLY the queried terms'
    buckets (2 of 64 files here), never rescanning the corpus.

    Build: one vectorized pass computes per-document term frequencies
    (Arrow split → flatten → parent-index repeat → per-batch groupby — tf
    is complete inside a batch because a document never spans batches),
    assigns each term's md5 bucket, and writes a 64-partition resumable
    sink (state/manifest.py). Serve: the driver hashes the query terms,
    read_partitions() opens exactly those buckets with the term IN (...)
    predicate pushed into parquet row groups, and the postings come back
    as (term, doc_id, tf). Absent terms cost one manifest miss, zero I/O.
    """
    import hashlib
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import numpy as np
    from pyarrow.dataset import field as _field

    from pygeoops_ray.state.manifest import read_partitions, write_partitioned

    N_BUCKETS = 64
    TERMS = ("join", "window", "zzzabsent")

    def _bucket_of(terms) -> np.ndarray:
        return np.array(
            [
                int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big") % N_BUCKETS
                for t in terms
            ],
            dtype=np.int64,
        )

    def postings(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"], " ")
        flat = pc.list_flatten(toks).to_pandas()
        parent = pc.list_parent_indices(toks).to_numpy()
        did = batch["doc_id"].to_numpy()[parent]
        df = (
            pd.DataFrame({"term": flat, "doc_id": did})
            .groupby(["term", "doc_id"], sort=False)
            .size()
            .rename("tf")
            .reset_index()
        )
        uniq, inv = np.unique(df["term"].to_numpy(), return_inverse=True)
        df["bucket"] = _bucket_of(uniq)[inv]
        return pa.Table.from_pandas(df, preserve_index=False)

    docs_path = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(
        f"invidx:{os.path.abspath(sf_dir)}:{os.path.getmtime(docs_path)}".encode()
    ).hexdigest()[:10]
    out_dir = f"/tmp/pygeoops_ray_cache/invidx_sink_{key}"
    done_marker = os.path.join(out_dir, "_complete")
    if not os.path.exists(done_marker):
        ds = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
            postings, batch_format="pyarrow"
        )
        write_partitioned(ds, out_dir, "bucket", stage="postings",
                          lineage={"sf_dir": sf_dir})
        with open(done_marker, "w") as f:
            f.write("1")

    pids = sorted(set(_bucket_of(TERMS).tolist()))
    got, n_read, n_total = read_partitions(
        out_dir, pids, stage="postings", filter=_field("term").isin(TERMS)
    )
    q_inverted_index._last_stats = (n_read, n_total)
    if got is None:  # pragma: no cover - query buckets always exist here
        import ray.data as rd

        return rd.from_pandas(
            pd.DataFrame({"term": [], "doc_id": [], "tf": []})
        )
    return got.select_columns(["term", "doc_id", "tf"])


def q_dataset_split(sf_dir: str):
    """Deterministic train/val/test split of the corpus: split =
    md5(doc_id) mod 10 → 0-7 train / 8 val / 9 test, the standard
    hash-assignment that is stable across reruns, partitionings and
    appends (a new doc never moves an old one between splits). The output
    is the per-(split, lang) membership aggregate — count plus sum(doc_id)
    and sum(n_chars) — so any single row landing in the wrong split flips
    the value hash.

    Shape: one streaming pass; the split label is derived per batch and the
    algebraic grouped aggregate ships one partial row per (batch, split,
    lang) — no full-table exchange, no driver materialization.
    """
    import pandas as pd

    from pygeoops_ray.stages.groupagg import grouped_agg
    from pygeoops_ray.stages.sketch import md5_low64

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def label(df: pd.DataFrame) -> pd.DataFrame:
        b = df["doc_id"].map(lambda i: md5_low64(str(i)) % 10)
        df = df.copy()
        df["split"] = b.map(lambda v: "train" if v < 8 else ("val" if v == 8 else "test"))
        return df

    out = grouped_agg(
        docs.map_batches(label, batch_format="pandas"),
        ["split", "lang"],
        [("doc_id", "size", "n_docs"), ("doc_id", "sum", "sum_doc_id"), ("n_chars", "sum", "sum_chars")],
        n_rows_hint=32,
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        for c in ("n_docs", "sum_doc_id", "sum_chars"):
            df[c] = df[c].astype("int64")
        return df

    return out.map_batches(finalize, batch_format="pandas")


def q_group_hll(sf_dir: str):
    """Per-LANGUAGE vocabulary HyperLogLog (stages/sketch.py:
    hll_registers_by_group): one mergeable sketch per domain in a single
    streaming pass — the per-group generalization of ``vocab_hll``. Every
    (lang, bucket, r) register is integer-exact; the oracle recomputes the
    full register table from md5_number_lower + bit arithmetic per lang."""
    from pygeoops_ray.stages.sketch import hll_registers_by_group

    docs = _read(sf_dir, "documents", columns=["lang", "text"])
    return hll_registers_by_group(docs, "lang", "text", p=12)


def q_cms_sketch(sf_dir: str):
    """Count-Min frequency sketch over the corpus vocabulary
    (stages/sketch.py: cms_registers): the SUM-merged sibling of the HLL
    register table. Each block contributes at most d×w register partials, so
    the exchange is bounded by the sketch size regardless of corpus volume —
    the mergeable-sketch contract for approximate term frequency at 100 TB.
    Registers are md5-deterministic integers; the oracle recomputes the full
    (r, j, cnt) table from scratch in SQL (md5_number_lower hashing), so the
    driver value-checks every counter. ``cms_estimate`` (pytest) proves the
    point-estimate upper-bound contract against exact counts."""
    from pygeoops_ray.stages.sketch import cms_registers

    docs = _read(sf_dir, "documents", columns=["text"])
    return cms_registers(docs, "text", d=4, w=1024, tokenize=True)


def q_dp_counts(sf_dir: str):
    """Differentially-private per-language document counts — the
    privacy-preserving release pattern a data-curation report applies before
    publishing corpus statistics.

    Mechanism: discrete Laplace (two-sided geometric) noise at eps=1,
    sensitivity 1: ``noise = floor(ln(u1)/ln(alpha)) - floor(ln(u2)/ln(alpha))``
    with ``alpha = exp(-eps)`` and u1, u2 deterministic md5 uniforms of the
    group key (the inverse-CDF geometric sampler) — a REAL DP release draws
    fresh randomness; the deterministic seed here makes the mechanism's
    arithmetic value-checkable in SQL while keeping the exact noise
    distribution shape. Shape: algebraic per-block count partials (one row
    per (block, lang)) → tiny grouped sum → per-group noise in the final
    map — no full-table exchange at any corpus size.
    """
    from pygeoops_ray.stages.groupagg import grouped_count
    from pygeoops_ray.stages.sketch import md5_low64

    docs = _read_blocked(sf_dir, "documents", columns=["lang"])
    counts = grouped_count(docs, ["lang"], "n_docs", n_buckets=2)

    def add_noise(df):
        import pandas as pd

        if not len(df):
            return pd.DataFrame(
                {
                    "lang": pd.Series([], dtype=object),
                    "n_docs": pd.Series([], dtype="int64"),
                    "n_dp": pd.Series([], dtype="int64"),
                }
            )
        alpha_ln = -1.0  # ln(alpha) with alpha = exp(-eps), eps = 1
        noises = []
        for lang in df["lang"]:
            u1 = (md5_low64(f"{lang}#dp1") + 1) / 18446744073709551616.0
            u2 = (md5_low64(f"{lang}#dp2") + 1) / 18446744073709551616.0
            noises.append(
                int(np.floor(np.log(u1) / alpha_ln))
                - int(np.floor(np.log(u2) / alpha_ln))
            )
        df = df.copy()
        df["n_dp"] = df["n_docs"].to_numpy() + np.array(noises, dtype=np.int64)
        return df[["lang", "n_docs", "n_dp"]]

    return counts.map_batches(add_noise, batch_format="pandas")


def q_bm25_disk(sf_dir: str):
    """Disk-persisted BM25 inverted index + term-pruned retrieval — the
    third disk-index family member (ann_ivf_disk / lsh_disk / bm25_disk):
    the index is a DATA LAYOUT, a query's I/O is its terms' postings files.

    Build (once per table, resumable through the checkpoint manifest): the
    full postings table (term, doc_id, tf, dl) partitioned by
    ``md5(term) % 128`` term buckets, plus a corpus-stats sidecar (N docs,
    TOT tokens — the two scalars BM25 needs). Query: the 5 fixed query
    terms select their bucket PARTITIONS on the driver from the few-KB
    manifest (123+ unrelated buckets cost zero I/O and zero tasks; an isin
    filter on term prunes row groups inside survivors), the fixed-point
    BM25 score (the exact bm25_topk rational, floor division) applies per
    batch, and the bounded-partial top-10 per term reduces ≤10·buckets tiny
    rows. Output = bm25_topk's schema + pruned_ok.
    """
    import hashlib
    import json
    import os

    import pandas as pd
    import pyarrow.dataset as pads

    from pygeoops_ray.stages.groupagg import _bucketed
    from pygeoops_ray.stages.sketch import md5_low64
    from pygeoops_ray.stages.text import _token_arrays
    from pygeoops_ray.state.manifest import read_partitions, write_partitioned

    docs_path = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{os.path.getmtime(docs_path)}:bm25disk:v1".encode()
    ).hexdigest()[:10]
    out_dir = f"/tmp/pygeoops_ray_cache/bm25_index_{key}"
    stats_path = os.path.join(out_dir, "stats.json")
    done_marker = os.path.join(out_dir, "_complete")

    if not os.path.exists(done_marker):
        docs = _read_blocked(sf_dir, "documents", columns=["doc_id", "text"])
        n_docs = _table_rows(sf_dir, "documents")
        tot = int(
            docs.map_batches(
                text_stages.token_count_batch, batch_format="pyarrow"
            ).sum("n_tokens")
        )

        def postings(b: pa.Table) -> pa.Table:
            doc_ids, flat, lens = _token_arrays(b)
            if len(doc_ids) == 0:
                return pa.Table.from_pydict(
                    {
                        "term": pa.array([], pa.string()),
                        "doc_id": pa.array([], pa.int64()),
                        "tf": pa.array([], pa.int64()),
                        "dl": pa.array([], pa.int64()),
                        "bucket": pa.array([], pa.int64()),
                    }
                )
            df = pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "term": flat.to_pandas().to_numpy(),
                    "dl": np.repeat(lens, lens),
                }
            )
            g = (
                df.groupby(["term", "doc_id"], sort=False)
                .agg(tf=("dl", "size"), dl=("dl", "first"))
                .reset_index()
            )
            # one md5 per DISTINCT term in the batch
            uniq = {t: md5_low64(t) % 128 for t in g["term"].unique()}
            g["bucket"] = g["term"].map(uniq).astype("int64")
            return pa.Table.from_pydict(
                {
                    "term": pa.array(g["term"].to_numpy(), pa.string()),
                    "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
                    "tf": pa.array(g["tf"].to_numpy(), pa.int64()),
                    "dl": pa.array(g["dl"].to_numpy(), pa.int64()),
                    "bucket": pa.array(g["bucket"].to_numpy(), pa.int64()),
                }
            )

        write_partitioned(
            docs.map_batches(postings, batch_format="pyarrow"),
            out_dir, "bucket", stage="postings", lineage={"sf_dir": sf_dir},
        )
        with open(stats_path, "w") as f:
            json.dump({"n_docs": n_docs, "tot": tot}, f)
        with open(done_marker, "w") as f:
            f.write("1")

    stats = json.load(open(stats_path))
    n_docs, tot = int(stats["n_docs"]), int(stats["tot"])
    terms = BM25_QUERY_TERMS
    pids = sorted({md5_low64(t) % 128 for t in terms})
    post_ds, files_read, files_total = read_partitions(
        out_dir, pids, stage="postings",
        filter=pads.field("term").isin(list(terms)),
    )
    pruned_ok = int(files_read < files_total)

    def score(b: pa.Table) -> pa.Table:
        tf = b["tf"].to_numpy()
        dl = b["dl"].to_numpy()
        fp = (22 * tf * tot * 1_000_000) // (10 * tf * tot + 3 * tot + 9 * dl * n_docs)
        return b.append_column("score_fp", pa.array(fp.astype(np.int64), pa.int64()))

    cand = post_ds.map_batches(score, batch_format="pyarrow").drop_columns(["bucket"])

    def pre(df):
        return (
            df.sort_values(
                ["term", "score_fp", "doc_id"],
                ascending=[True, False, True],
                kind="mergesort",
            )
            .groupby("term", sort=False)
            .head(10)
        )

    def reducer(df):
        out = pre(df)
        out = out.assign(
            rnk=out.groupby("term", sort=False).cumcount() + 1,
            pruned_ok=np.int64(pruned_ok),
        )
        return out[["term", "doc_id", "tf", "dl", "score_fp", "rnk", "pruned_ok"]]

    return _bucketed(cand, ["term"], reducer, 4, pre=pre)


def q_ipc_scan(sf_dir: str):
    """Arrow IPC (Feather) source-format coverage: the documents table is
    exported once to 8 IPC shard files — written FROM INSIDE map tasks (one
    shard per block, the side-sink pattern), not on the driver — read back
    through ``read_binary_files`` + a zero-copy ``pyarrow.ipc`` decode flat
    map (Ray 2.49 has no native IPC reader; binary-read + Arrow decode IS
    the custom-source recipe), and aggregated per (lang, source). The
    oracle aggregates the parquet directly, proving the IPC write/read
    roundtrip lossless.
    """
    import hashlib
    import os

    import pyarrow.ipc as paipc
    import ray.data as rd

    from pygeoops_ray.stages.groupagg import grouped_agg

    n = _table_rows(sf_dir, "documents")
    key = hashlib.md5(f"{os.path.abspath(sf_dir)}:{n}:ipc".encode()).hexdigest()[:10]
    path = f"/tmp/pygeoops_ray_cache/docs_ipc_{key}"
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.isfile(marker):
        os.makedirs(path, exist_ok=True)
        # crash-resume correctness: shard names are uuid-fresh, so stale
        # files from a crashed partial build would be double-read — clear
        # the un-published directory before rewriting
        for f in os.listdir(path):
            os.remove(os.path.join(path, f))

        def write_shard(b: pa.Table) -> pa.Table:
            import uuid

            fn = os.path.join(path, f"shard-{uuid.uuid4().hex}.arrow")
            tmp = fn + ".tmp"
            with paipc.new_file(tmp, b.schema) as w:
                w.write_table(b)
            os.rename(tmp, fn)  # atomic publish (crash-safe re-run)
            return pa.Table.from_pydict({"rows": pa.array([b.num_rows], pa.int64())})

        total = (
            _read(sf_dir, "documents", columns=["doc_id", "lang", "source", "n_chars"])
            .repartition(8)
            .map_batches(write_shard, batch_format="pyarrow", batch_size=None)
            .sum("rows")
        )
        assert total == n, (total, n)
        # drop shards from crashed partial runs is unnecessary: tmp files are
        # never read (suffix filter below) and a full rerun rewrites fresh
        with open(marker, "w"):
            pass

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".arrow")
    )

    def decode(b: pa.Table) -> pa.Table:
        tables = [
            paipc.open_file(pa.py_buffer(blob)).read_all()
            for blob in b["bytes"].to_pylist()
        ]
        return pa.concat_tables(tables) if tables else pa.Table.from_pydict(
            {
                "doc_id": pa.array([], pa.int64()),
                "lang": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64()),
            }
        )

    ds = rd.read_binary_files(files).map_batches(decode, batch_format="pyarrow")
    return grouped_agg(
        ds,
        ["lang", "source"],
        [
            ("doc_id", "sum", "sum_doc_id"),
            ("n_chars", "sum", "sum_chars"),
            ("doc_id", "size", "n_docs"),
        ],
        n_rows_hint=256,
    )


def q_orc_scan(sf_dir: str):
    """Apache ORC source-format coverage — the other columnar at-rest format
    large warehouses actually hold (Hive/Trino lakes ship ORC next to
    parquet). The events table is exported once to 8 ORC shard files
    written FROM INSIDE map tasks (side-sink pattern, same as ipc_scan),
    read back through ``read_binary_files`` + a ``pyarrow.orc`` decode
    (Ray 2.49 has no native ORC reader; binary-read + Arrow decode is the
    custom-source recipe), and aggregated per event_type. The oracle
    aggregates the parquet directly, proving the ORC write/read roundtrip
    lossless across int64, string and float columns.
    """
    import hashlib
    import os

    import pyarrow.orc as paorc
    import ray.data as rd

    from pygeoops_ray.stages.groupagg import grouped_agg

    n = _table_rows(sf_dir, "events")
    key = hashlib.md5(f"{os.path.abspath(sf_dir)}:{n}:orc".encode()).hexdigest()[:10]
    path = f"/tmp/pygeoops_ray_cache/events_orc_{key}"
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.isfile(marker):
        os.makedirs(path, exist_ok=True)
        # uuid shard names: clear stale files from a crashed partial build
        for f in os.listdir(path):
            os.remove(os.path.join(path, f))

        def write_shard(b: pa.Table) -> pa.Table:
            import uuid

            fn = os.path.join(path, f"shard-{uuid.uuid4().hex}.orc")
            tmp = fn + ".tmp"
            paorc.write_table(b, tmp)
            os.rename(tmp, fn)  # atomic publish (crash-safe re-run)
            return pa.Table.from_pydict({"rows": pa.array([b.num_rows], pa.int64())})

        total = (
            _read(sf_dir, "events", columns=["event_id", "user_id", "event_type", "value"])
            .repartition(8)
            .map_batches(write_shard, batch_format="pyarrow", batch_size=None)
            .sum("rows")
        )
        assert total == n, (total, n)
        with open(marker, "w"):
            pass

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".orc")
    )

    def decode(b: pa.Table) -> pa.Table:
        tables = [
            paorc.ORCFile(pa.BufferReader(blob)).read()
            for blob in b["bytes"].to_pylist()
        ]
        if not tables:
            return pa.Table.from_pydict(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "event_type": pa.array([], pa.string()),
                    "value": pa.array([], pa.float64()),
                }
            )
        out = pa.concat_tables(tables)
        import pyarrow.compute as pc

        return pa.Table.from_pydict(
            {
                "event_type": out["event_type"],
                "event_id": out["event_id"],
                "user_id": out["user_id"],
                "value_c": pc.cast(
                    pc.floor(pc.multiply(out["value"], 100.0)), pa.int64()
                ),
            }
        )

    ds = rd.read_binary_files(files).map_batches(decode, batch_format="pyarrow")
    return grouped_agg(
        ds,
        ["event_type"],
        [
            ("event_id", "sum", "sum_event_id"),
            ("user_id", "sum", "sum_user_id"),
            ("value_c", "sum", "sum_value_c"),
            ("event_id", "size", "n_events"),
        ],
        n_rows_hint=64,
    )
