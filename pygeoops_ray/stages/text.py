"""Text-analysis stages over the documents table (training-data pipeline ops).

Vectorized per-batch kernels: token counting, quality scoring, language ID
(character n-gram heuristic), md5 document fingerprints. The
token/quality kernels use arithmetic that a DuckDB oracle reproduces exactly
(split on single space, length/replace counting).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "token_count_batch",
    "quality_batch",
    "BpeTokenCount",
    "LangId",
    "fingerprint_batch",
    "winnow_batch",
    "term_counts_batch",
    "gopher_quality_batch",
    "bigram_rows_batch",
    "Decontaminate",
    "bm25_rows_batch",
    "ngram_pos_rows_batch",
    "RedactPii",
    "PII_EMAIL_PATTERN",
    "PII_PHONE_PATTERN",
]


def term_counts_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → (doc_id, term, tf): single-space terms, empties
    dropped, one row per distinct (doc, term) — the TF side of the TF/DF
    pipeline (top_terms query). Counter is per-doc exact and the oracle's
    ``string_split(text, ' ')`` produces the same terms."""
    from collections import Counter

    ids_out: list = []
    terms_out: list = []
    tf_out: list = []
    for did, txt in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        for t, n in Counter(tok for tok in txt.split(" ") if tok).items():
            ids_out.append(did)
            terms_out.append(t)
            tf_out.append(n)
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(ids_out, pa.int64()),
            "term": pa.array(terms_out, pa.string()),
            "tf": pa.array(tf_out, pa.int64()),
        }
    )

# GPT-2-style pretokenizer shape, restricted to RE2-compatible syntax (no
# lookaheads) so DuckDB's regexp_extract_all counts the SAME tokens —
# verified 0 mismatches across the corpus (leftmost-first alternation is
# shared by Python re and RE2's default mode)
BPE_PRETOKEN_PATTERN = r"'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n]+|[ \t\n]+"


class BpeTokenCount:
    """Actor-pool stage: BPE-ish pretokenizer token counts.

    The regex is compiled ONCE per actor in ``__init__`` (the stateful-stage
    contract); ``__call__`` counts pretoken matches per document. A real BPE
    would merge within these pretokens — the pretoken count is the standard
    upper-bound proxy and is exactly SQL-reproducible.
    """

    def __init__(self, pattern: str = BPE_PRETOKEN_PATTERN):
        import re

        self.rx = re.compile(pattern)

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = [len(self.rx.findall(t)) for t in batch["text"].to_pylist()]
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "n_bpe_tokens": pa.array(counts, pa.int64()),
            }
        )


def token_count_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens): number of single-space-split tokens (oracle: len(string_split(text,' '')))."""
    toks = pc.split_pattern(batch["text"], " ")
    return pa.Table.from_pydict(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
        }
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality metrics with exact-arithmetic oracle parity.

    n_chars_calc = length(text); n_spaces = count of ' '; n_tokens as above;
    avg_token_len = (n_chars - n_spaces) / n_tokens (float64).
    """
    text = batch["text"]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    no_space = pc.replace_substring(text, " ", "")
    n_spaces = pc.subtract(n_chars, pc.cast(pc.utf8_length(no_space), pa.int64()))
    n_tokens = pc.cast(pc.list_value_length(pc.split_pattern(text, " ")), pa.int64())
    avg_len = pc.divide(
        pc.cast(pc.subtract(n_chars, n_spaces), pa.float64()),
        pc.cast(n_tokens, pa.float64()),
    )
    return pa.Table.from_pydict(
        {
            "doc_id": batch["doc_id"],
            "n_chars_calc": n_chars,
            "n_spaces": n_spaces,
            "n_tokens": n_tokens,
            "avg_token_len": avg_len,
        }
    )


def _token_arrays(batch: pa.Table):
    """Flatten the batch's space-split tokens: (doc_ids_per_token, flat_tokens,
    per-doc lengths). All three come out of Arrow kernels (no Python loop)."""
    toks = pc.split_pattern(batch["text"], " ")
    lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
    flat = pc.list_flatten(toks)
    doc_ids = np.repeat(batch["doc_id"].to_numpy(), lens)
    return doc_ids, flat, lens


def _ngram_frame(batch: pa.Table, n: int):
    """Per-token-position n-grams as a pandas frame (doc_id, g).

    Token stream is flattened once; an n-gram starts at every position whose
    doc has at least ``n - 1`` tokens after it. Joining with chr(31) keeps the
    gram reversible (tokens never contain it), matching the SQL oracle's
    ``tk[i] || chr(31) || tk[i+1] ...``.
    """
    import pandas as pd

    doc_ids, flat, lens = _token_arrays(batch)
    total = len(doc_ids)
    if total == 0:
        return pd.DataFrame({"doc_id": np.zeros(0, np.int64), "g": []})
    # position of each token within its doc
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    keep = pos <= np.repeat(lens, lens) - n  # n-gram fits inside the doc
    idx = np.flatnonzero(keep)
    if len(idx) == 0:
        return pd.DataFrame({"doc_id": np.zeros(0, np.int64), "g": []})
    toks = pd.Series(flat.to_pandas().to_numpy(), copy=False)
    g = toks.iloc[idx].reset_index(drop=True)
    for j in range(1, n):
        g = g + "\x1f" + toks.iloc[idx + j].reset_index(drop=True)
    return pd.DataFrame({"doc_id": doc_ids[idx], "g": g.to_numpy()})


def ngram_pos_rows_batch(batch: pa.Table, n: int = 8) -> pa.Table:
    """One row per n-gram INSTANCE with its 0-based start position:
    ``(doc_id, pos, g)`` — the exact-substring-dedup feed (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better": fixed-length
    token windows duplicated ACROSS documents; the positions let a later
    doc-grouped pass interval-union overlapping duplicated windows into
    covered-token spans).

    Same flattened-token-stream vectorization as ``_ngram_frame`` (one Arrow
    split + numpy position mask, no per-row loop), plus the start position.
    """
    import pandas as pd

    empty = pa.schema(
        [("doc_id", pa.int64()), ("pos", pa.int64()), ("g", pa.string())]
    ).empty_table()
    doc_ids, flat, lens = _token_arrays(batch)
    total = len(doc_ids)
    if total == 0:
        return empty
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    keep = pos <= np.repeat(lens, lens) - n
    idx = np.flatnonzero(keep)
    if len(idx) == 0:
        return empty
    toks = pd.Series(flat.to_pandas().to_numpy(), copy=False)
    g = toks.iloc[idx].reset_index(drop=True)
    for j in range(1, n):
        g = g + "\x1f" + toks.iloc[idx + j].reset_index(drop=True)
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(doc_ids[idx], pa.int64()),
            "pos": pa.array(pos[idx], pa.int64()),
            "g": pa.array(g.to_numpy(), pa.string()),
        }
    )


# RE2-compatible and Python-re-identical (greedy, no lookaround): DuckDB's
# regexp_extract_all / regexp_replace(..., 'g') replay both byte-for-byte.
PII_EMAIL_PATTERN = r"[a-z0-9._]+@[a-z0-9]+\.[a-z]+"
PII_PHONE_PATTERN = r"555-[0-9]{4}-[0-9]{2}"


class RedactPii:
    """PII scrubbing (emails + phone numbers) — the pre-training privacy pass.

    Actor-pool stage: patterns compile ONCE per actor in ``__init__``; each
    batch runs two vectorized pandas regex passes (count + global replace at
    C speed) and one hashlib md5 per row over the redacted text, so the
    oracle checks the exact replacement output, not just the counts.
    """

    def __init__(
        self,
        email_pattern: str = PII_EMAIL_PATTERN,
        phone_pattern: str = PII_PHONE_PATTERN,
    ):
        import re

        self.email_re = re.compile(email_pattern)
        self.phone_re = re.compile(phone_pattern)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib
        import pandas as pd

        s = pd.Series(batch["text"].to_pandas().to_numpy(), copy=False)
        n_emails = s.str.count(self.email_re).to_numpy().astype(np.int64)
        n_phones = s.str.count(self.phone_re).to_numpy().astype(np.int64)
        red = s.str.replace(self.email_re, "<EMAIL>", regex=True).str.replace(
            self.phone_re, "<PHONE>", regex=True
        )
        fps = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in red]
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "n_emails": pa.array(n_emails, pa.int64()),
                "n_phones": pa.array(n_phones, pa.int64()),
                "red_fp": pa.array(fps, pa.string()),
            }
        )


def gopher_quality_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition quality stats (Rae et al. 2021 §A1.1), exact.

    Per document: ``n_tokens``; ``top_bigram_n`` — occurrences of the most
    frequent bigram (the "fraction of tokens in the top n-gram" rule's
    numerator); ``dup_trigram_n`` — number of trigram positions whose trigram
    occurs more than once in the doc (the "fraction of tokens in duplicated
    n-grams" numerator). All integers, so a DuckDB oracle replays them
    verbatim from string_split.
    """
    import pandas as pd

    doc_col = batch["doc_id"].to_numpy()
    n_tokens = pc.list_value_length(pc.split_pattern(batch["text"], " ")).to_numpy()
    bg = _ngram_frame(batch, 2)
    tg = _ngram_frame(batch, 3)
    base = pd.DataFrame({"doc_id": doc_col, "n_tokens": n_tokens.astype(np.int64)})
    if len(bg):
        bc = bg.groupby(["doc_id", "g"], sort=False).size()
        top = bc.groupby(level=0).max().rename("top_bigram_n")
        base = base.merge(top, on="doc_id", how="left")
    else:
        base["top_bigram_n"] = 0
    if len(tg):
        tc = tg.groupby(["doc_id", "g"], sort=False).size()
        dup = tc[tc > 1].groupby(level=0).sum().rename("dup_trigram_n")
        base = base.merge(dup, on="doc_id", how="left")
    else:
        base["dup_trigram_n"] = 0
    for c in ("top_bigram_n", "dup_trigram_n"):
        base[c] = base[c].fillna(0).astype(np.int64)
    return pa.Table.from_pandas(base, preserve_index=False).replace_schema_metadata(None)


def bigram_rows_batch(batch: pa.Table) -> pa.Table:
    """One row per bigram INSTANCE: (doc_id, g) — the corpus-LM scoring feed."""
    df = _ngram_frame(batch, 2)
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def bm25_rows_batch(
    batch: pa.Table, terms: tuple[str, ...], n_docs: int, tot_tokens: int
) -> pa.Table:
    """Fixed-point BM25 candidate rows for single-term queries.

    Emits (term, doc_id, tf, dl, score_fp) for every (query term, doc)
    occurrence, where with k1 = 1.2, b = 0.75 the BM25 tf-part
    ``tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl·N/TOT)`` is the exact rational
    ``22·tf·TOT / (10·tf·TOT + 3·TOT + 9·dl·N)`` (both sides scaled by
    10·TOT), stored as the int64 fixed point

        score_fp = (22·tf·TOT·10⁶) // (10·tf·TOT + 3·TOT + 9·dl·N)

    — floor division both here and in DuckDB, so ranking by
    (score_fp DESC, doc_id) is deterministic and value-exact. idf is
    constant within a term (single-term queries) and does not affect the
    per-term ranking. int64 bound: numerator ≤ 22·tf·TOT·10⁶ — safe for
    corpora up to ~4·10⁶ tokens; past that the kernel's scale path is
    float scoring with an exactness certificate (same pattern as knn).

    Corpus stats (N docs, TOT tokens) are computed once by a prior
    aggregate pass and close over the kernel — plain ints, not per-batch
    state.
    """
    import pandas as pd

    doc_ids, flat, lens = _token_arrays(batch)
    if len(doc_ids) == 0:
        return pa.Table.from_pydict(
            {
                "term": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "tf": pa.array([], pa.int64()),
                "dl": pa.array([], pa.int64()),
                "score_fp": pa.array([], pa.int64()),
            }
        )
    mask = pc.is_in(flat, value_set=pa.array(list(terms), pa.string()))
    idx = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
    df = pd.DataFrame(
        {
            "doc_id": doc_ids[idx],
            "term": flat.to_pandas().to_numpy()[idx],
            "dl": np.repeat(lens, lens)[idx],
        }
    )
    g = (
        df.groupby(["term", "doc_id"], sort=False)
        .agg(tf=("dl", "size"), dl=("dl", "first"))
        .reset_index()
    )
    tf = g["tf"].to_numpy(np.int64)
    dl = g["dl"].to_numpy(np.int64)
    num = 22 * tf * tot_tokens * 1_000_000
    den = 10 * tf * tot_tokens + 3 * tot_tokens + 9 * dl * n_docs
    g["score_fp"] = num // den
    g["tf"] = tf
    g["dl"] = dl
    return pa.Table.from_pandas(
        g[["term", "doc_id", "tf", "dl", "score_fp"]], preserve_index=False
    ).replace_schema_metadata(None)


class Decontaminate:
    """Actor-pool benchmark-decontamination stage.

    ``snips`` (the benchmark snippet list) ships with the actor constructor
    ONCE per actor — at real scale a large eval-set n-gram table would go via
    an object-store ref or a file read here in ``__init__``; ``__call__``
    counts, per document, how many snippets occur as substrings
    (``pc.match_substring`` — one vectorized pass per snippet).
    """

    def __init__(self, snips):
        self.snips = list(snips)

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"]
        hits = np.zeros(len(text), dtype=np.int64)
        for s in self.snips:
            hits += pc.match_substring(text, s).to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"doc_id": batch["doc_id"], "n_hits": pa.array(hits, pa.int64())}
        )


_LANG_PROFILES = {
    # tiny stopword/char-bigram profiles; a real deployment would broadcast a
    # trained model — the Ray plumbing (actor pool, broadcast state) is the point
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "for"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "zu"},
    "fr": {"le", "la", "les", "et", "est", "une", "pour", "dans"},
    "es": {"el", "la", "los", "y", "es", "una", "para", "en", "que"},
    "zh": set(),  # falls back to CJK codepoint ratio
}


class LangId:
    """Actor-pool language-ID stage: profiles built once per actor."""

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    def classify(self, text: str) -> str:
        if any("一" <= ch <= "鿿" for ch in text[:200]):
            return "zh"
        words = text.lower().split()
        best, best_score = "en", -1.0
        for lang, stops in self.profiles.items():
            if not stops:
                continue
            score = sum(1 for w in words if w in stops) / max(len(words), 1)
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.classify(t) for t in batch["text"].to_pylist()]
        return pa.Table.from_pydict(
            {"doc_id": batch["doc_id"], "lang_pred": pa.array(preds, pa.string())}
        )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, fp): md5 hex digest of the utf-8 text.

    hashlib runs the digest at C speed (the round-1 per-byte Python FNV loop
    was O(corpus bytes) interpreted — a scale-killer), and md5 gives the
    driver an exact DuckDB oracle: ``SELECT doc_id, md5(text) AS fp``.
    """
    import hashlib

    fps = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch["text"].to_pylist()]
    return pa.Table.from_pydict(
        {"doc_id": batch["doc_id"], "fp": pa.array(fps, pa.string())}
    )


def winnow_batch(batch: pa.Table, k: int = 8, w: int = 4) -> pa.Table:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03).

    Rolling k-gram hashes over the codepoint stream, then the robust-winnowing
    selection: each window of ``w`` consecutive k-gram positions contributes
    its minimum hash, ties broken to the RIGHTMOST position. Emits the
    DISTINCT selected fingerprints per document as ``fp_key`` — a single
    BIGINT combining (hash, position) so the whole pipeline (including the
    rightmost tie-break) is exact integer arithmetic DuckDB can replay:

        c_i    = unicode(text[i]) % 1021              (bounds the sum in int64)
        h_t    = sum_{j<k} c_{t+j} * 131^(k-1-j)      (exact, < 2^63)
        key_t  = (h_t % 2147483647) * 2^21 - t        (min key = min hash,
                                                       rightmost t; t is
                                                       1-based, < 2^21)
        fp_key = min(key) over each window of w starts (all-of-doc when
                 there are fewer than w k-gram positions)

    Vectorized per document: utf-32 decode -> one integer correlate for the
    k-gram hashes -> one sliding-window min -> unique.
    """
    from numpy.lib.stride_tricks import sliding_window_view

    weights = 131 ** np.arange(k - 1, -1, -1, dtype=np.int64)
    ids, keys = [], []
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        cp = (
            np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
            % 1021
        )
        if len(cp) < k:
            continue
        h = np.correlate(cp, weights, mode="valid")
        key = (h % 2147483647) * 2097152 - np.arange(1, len(h) + 1)
        if len(key) >= w:
            mins = sliding_window_view(key, w).min(axis=1)
        else:
            mins = key.min(keepdims=True)
        sel = np.unique(mins)
        ids.extend([doc_id] * len(sel))
        keys.append(sel)
    out_keys = np.concatenate(keys) if keys else np.zeros(0, np.int64)
    return pa.Table.from_pydict(
        {"doc_id": pa.array(ids, pa.int64()), "fp_key": pa.array(out_keys, pa.int64())}
    )


SEP = "\x1f"


def seq_of_word(w: str) -> str:
    """Sentinel-wrapped symbol sequence of a word: each symbol stored as
    SEP+sym+SEP, concatenated. The wrapping makes a literal string replace
    of SEP+a+SEP+SEP+b+SEP exactly BPE's leftmost non-overlapping merge
    (boundaries intact after every replacement — 'xa'+'b' can never match
    the (a, b) pattern), and DuckDB's replace() shares the semantics."""
    return "".join(SEP + c + SEP for c in w)


def bpe_pair_partials(batch: pa.Table) -> pa.Table:
    """(seq, cnt) word rows → (pair, c) partial counts: every ADJACENT
    symbol pair of each word weighted by the word's corpus frequency
    (overlaps counted, the classic get_stats rule). Vectorized: one split
    pass, position mask, no per-word Python loop."""
    import pandas as pd

    seqs = batch["seq"].to_pandas()
    cnts = batch["cnt"].to_numpy()
    toks = seqs.str.strip(SEP).str.split(SEP + SEP)
    lens = toks.str.len().to_numpy().astype(np.int64)
    flat = pd.Series(np.concatenate(toks.to_numpy()) if len(toks) else [])
    total = int(lens.sum())
    if total == 0:
        return pa.schema([("pair", pa.string()), ("c", pa.int64())]).empty_table()
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    keep = pos <= np.repeat(lens, lens) - 2
    idx = np.flatnonzero(keep)
    if len(idx) == 0:
        return pa.schema([("pair", pa.string()), ("c", pa.int64())]).empty_table()
    pair = flat.iloc[idx].reset_index(drop=True) + SEP + flat.iloc[idx + 1].reset_index(
        drop=True
    )
    w = np.repeat(cnts, lens)[idx]
    out = pd.DataFrame({"pair": pair.to_numpy(), "c": w}).groupby(
        "pair", as_index=False
    )["c"].sum()
    return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)
