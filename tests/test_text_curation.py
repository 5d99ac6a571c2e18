"""Curation-op kernels (stages/text.py): Gopher repetition stats, bigram
instance rows, benchmark decontamination — each vs a brute-force Python
replay on handcrafted corpora."""

from collections import Counter

import numpy as np
import pyarrow as pa

from pygeoops_ray.stages.text import (
    Decontaminate,
    bigram_rows_batch,
    gopher_quality_batch,
)

DOCS = [
    "a b a b a b c",          # top bigram 'a b' ×3; trigram 'a b a' ×2 + 'b a b' ×2
    "x",                      # single token: no bigrams/trigrams
    "one two",                # one bigram, no trigram
    "r r r r r",              # max repetition
    "u v w x y z",            # all distinct
    "",                       # split(' ') of '' is [''] — 1 token
]


def _batch(texts):
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def _ref_ngrams(text, n):
    tk = text.split(" ")
    return ["\x1f".join(tk[i : i + n]) for i in range(len(tk) - n + 1)]


def test_bigram_rows_matches_reference():
    out = bigram_rows_batch(_batch(DOCS)).to_pandas()
    got = Counter(zip(out["doc_id"], out["g"]))
    want = Counter()
    for did, t in enumerate(DOCS):
        for g in _ref_ngrams(t, 2):
            want[(did, g)] += 1
    assert got == want


def test_gopher_quality_matches_reference():
    out = (
        gopher_quality_batch(_batch(DOCS))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    for did, t in enumerate(DOCS):
        tk = t.split(" ")
        bc = Counter(_ref_ngrams(t, 2))
        tc = Counter(_ref_ngrams(t, 3))
        assert out.loc[did, "n_tokens"] == len(tk)
        assert out.loc[did, "top_bigram_n"] == (max(bc.values()) if bc else 0)
        assert out.loc[did, "dup_trigram_n"] == sum(c for c in tc.values() if c > 1)
    # spot-check the handcrafted expectations
    assert out.loc[0, "top_bigram_n"] == 3
    assert out.loc[0, "dup_trigram_n"] == 4
    assert out.loc[3, "top_bigram_n"] == 4
    assert out.loc[1, "top_bigram_n"] == 0


def test_decontaminate_counts():
    snips = ["a b a", "two", "zz"]
    stage = Decontaminate(snips)
    out = stage(_batch(DOCS)).to_pandas().set_index("doc_id")
    for did, t in enumerate(DOCS):
        assert out.loc[did, "n_hits"] == sum(1 for s in snips if s in t)
    assert out.loc[0, "n_hits"] == 1
    assert out.loc[2, "n_hits"] == 1
    assert out["n_hits"].dtype == np.int64


def test_bm25_rows_matches_reference():
    from fractions import Fraction

    from pygeoops_ray.stages.text import bm25_rows_batch

    terms = ("a", "b", "one")
    n_docs, tot = 6, sum(len(t.split(" ")) for t in DOCS)
    out = bm25_rows_batch(_batch(DOCS), terms=terms, n_docs=n_docs, tot_tokens=tot)
    got = {
        (r["term"], r["doc_id"]): (r["tf"], r["dl"], r["score_fp"])
        for r in out.to_pylist()
    }
    want = {}
    for did, t in enumerate(DOCS):
        tk = t.split(" ")
        for term in terms:
            tf = tk.count(term)
            if tf:
                num = 22 * tf * tot * 1_000_000
                den = 10 * tf * tot + 3 * tot + 9 * len(tk) * n_docs
                want[(term, did)] = (tf, len(tk), num // den)
    assert got == want
    # the fixed point tracks the true BM25 tf-part (k1=1.2, b=0.75)
    for (term, did), (tf, dl, fp) in want.items():
        true = Fraction(22 * tf * tot, 10 * tf * tot + 3 * tot + 9 * dl * n_docs)
        assert abs(fp / 1_000_000 - float(true)) < 1e-6


def test_caption_search_scoring_rule():
    """The SQL oracle's modular word rule must equal caption_of's words."""
    from pygeoops_ray.table.images import _CAPTION_WORDS, caption_of

    q = {"river", "tower"}
    qi = {_CAPTION_WORDS.index(w) for w in q}
    for i in list(range(200)) + [1013, 50021]:
        cap_tokens = caption_of(i).split(" ")
        score_str = sum(1 for t in cap_tokens if t in q)
        score_mod = sum(1 for k in range(5) if (i * (k + 3) + k) % 20 in qi)
        assert score_str == score_mod


# --------------------------------------------------------------------------
# property tests (random corpora vs brute force)
# --------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_WORD = st.sampled_from(["aa", "bb", "cc", "dd", "x"])
_DOC = st.lists(_WORD, min_size=1, max_size=12).map(" ".join)


@settings(max_examples=50, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=8))
def test_gopher_quality_property(texts):
    out = (
        gopher_quality_batch(_batch(texts)).to_pandas().set_index("doc_id").sort_index()
    )
    for did, t in enumerate(texts):
        bc = Counter(_ref_ngrams(t, 2))
        tc = Counter(_ref_ngrams(t, 3))
        assert out.loc[did, "n_tokens"] == len(t.split(" "))
        assert out.loc[did, "top_bigram_n"] == (max(bc.values()) if bc else 0)
        assert out.loc[did, "dup_trigram_n"] == sum(c for c in tc.values() if c > 1)


@settings(max_examples=50, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=8), st.integers(1, 3))
def test_bm25_fixed_point_property(texts, tf_dummy):
    from fractions import Fraction

    from pygeoops_ray.stages.text import bm25_rows_batch

    terms = ("aa", "x")
    n_docs = len(texts)
    tot = sum(len(t.split(" ")) for t in texts)
    out = bm25_rows_batch(_batch(texts), terms=terms, n_docs=n_docs, tot_tokens=tot)
    rows = out.to_pylist()
    seen = set()
    for r in rows:
        tk = texts[r["doc_id"]].split(" ")
        tf = tk.count(r["term"])
        assert r["tf"] == tf and r["dl"] == len(tk)
        exact = Fraction(
            22 * tf * tot * 1_000_000,
            10 * tf * tot + 3 * tot + 9 * len(tk) * n_docs,
        )
        assert r["score_fp"] == exact.numerator // exact.denominator
        seen.add((r["term"], r["doc_id"]))
    # completeness: every (term, doc) with tf>0 must appear
    for did, t in enumerate(texts):
        for term in terms:
            if term in t.split(" "):
                assert (term, did) in seen


import pytest


@pytest.mark.usefixtures("ray_session")
def test_compaction_resume_and_content():
    """16 scattered files → 4 compacted files; content preserved; rerun
    skips every completed partition (the resume contract)."""
    import shutil

    import pyarrow.parquet as pq
    import ray.data as rd

    from pygeoops_ray.state.manifest import read_output, write_partitioned

    base = "/tmp/pygeoops_ray_test_compact"
    scat, out = f"{base}/scat", f"{base}/out"
    shutil.rmtree(base, ignore_errors=True)
    import os

    os.makedirs(scat)
    n = 1000
    t = pa.Table.from_pydict({"event_id": pa.array(range(n), pa.int64())})
    step = (n + 15) // 16
    for j in range(16):
        pq.write_table(t.slice(j * step, step), f"{scat}/slice-{j:02d}.parquet")

    k = (n + 3) // 4

    def add_fid(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.append_column(
            "file_id", pc.cast(pc.divide(batch["event_id"], k), pa.int64())
        )

    def ds():
        return rd.read_parquet(scat).map_batches(
            add_fid, batch_format="pyarrow", batch_size=None
        )

    rep1 = write_partitioned(ds(), out, "file_id", stats_cols=["event_id"])
    assert sorted(rep1["partition_id"]) == ["0", "1", "2", "3"]
    assert not rep1["skipped"].any()
    back = read_output(out).to_pandas()
    assert len(back) == n
    assert sorted(back["event_id"]) == list(range(n))
    # resume: everything already written → all four partitions skipped
    rep2 = write_partitioned(ds(), out, "file_id", stats_cols=["event_id"])
    assert rep2["skipped"].all()


def test_ngram_pos_rows_matches_reference():
    from pygeoops_ray.stages.text import ngram_pos_rows_batch

    out = ngram_pos_rows_batch(_batch(DOCS), 3).to_pandas()
    got = set(zip(out["doc_id"], out["pos"], out["g"]))
    want = set()
    for did, t in enumerate(DOCS):
        for p, g in enumerate(_ref_ngrams(t, 3)):
            want.add((did, p, g))
    assert got == want


def test_dup_span_coverage_brute_force():
    """Interval-union coverage of duplicated windows vs a per-position set."""
    rng = np.random.default_rng(7)
    # random corpora over a tiny vocab so 4-gram collisions are common
    for trial in range(20):
        texts = [
            " ".join(rng.choice(list("abc"), size=rng.integers(1, 30)))
            for _ in range(8)
        ]
        n = 4
        from collections import Counter, defaultdict

        from pygeoops_ray.stages.text import ngram_pos_rows_batch

        inst = ngram_pos_rows_batch(_batch(texts), n).to_pandas()
        docs_per_g = inst.groupby("g")["doc_id"].nunique()
        dup_g = set(docs_per_g[docs_per_g >= 2].index)
        # brute-force per-doc covered positions
        want_cov, want_wins = Counter(), Counter()
        for did, t in enumerate(texts):
            covered = set()
            for p, g in enumerate(_ref_ngrams(t, n)):
                if g in dup_g:
                    want_wins[did] += 1
                    covered.update(range(p, p + n))
            want_cov[did] = len(covered)
        # engine-style vectorized coverage (mirrors q_dup_spans.coverage)
        dup = inst[inst["g"].isin(dup_g)].sort_values(["doc_id", "pos"])
        ids = dup["doc_id"].to_numpy()
        p = dup["pos"].to_numpy()
        if len(p):
            nxt_same = np.zeros(len(p), bool)
            nxt_same[:-1] = ids[1:] == ids[:-1]
            gap = np.full(len(p), n, np.int64)
            gap[:-1] = np.minimum(p[1:] - p[:-1], n)
            contrib = np.where(nxt_same, gap, n)
            import pandas as pd

            got = pd.DataFrame({"doc_id": ids, "c": contrib}).groupby("doc_id")["c"]
            got_cov = got.sum().to_dict()
            got_wins = got.size().to_dict()
        else:
            got_cov, got_wins = {}, {}
        assert {k: v for k, v in want_cov.items() if v} == got_cov
        assert {k: v for k, v in want_wins.items() if v} == got_wins


def test_redact_pii_counts_and_output():
    from pygeoops_ray.stages.text import RedactPii

    texts = [
        "plain words only",
        "reach me at bob.smith1@mail.example or x9@a.io now",
        "call 555-1234-56 or 555-0000-99 end",
        "mixed a@b.co 555-9999-11 tail",
        "no match 555-12-3456 a@@b.com",
    ]
    out = RedactPii()(_batch(texts)).to_pandas().set_index("doc_id")
    assert list(out["n_emails"]) == [0, 2, 0, 1, 0]
    assert list(out["n_phones"]) == [0, 0, 2, 1, 0]
    import hashlib
    import re

    er = re.compile(r"[a-z0-9._]+@[a-z0-9]+\.[a-z]+")
    pr = re.compile(r"555-[0-9]{4}-[0-9]{2}")
    for i, t in enumerate(texts):
        red = pr.sub("<PHONE>", er.sub("<EMAIL>", t))
        assert out.loc[i, "red_fp"] == hashlib.md5(red.encode()).hexdigest()


def test_domain_mix_uniform_and_deterministic(ray_session):
    """Every domain ends at exactly n_min rows; membership is the md5-order
    prefix; a rerun returns the identical frame."""
    import hashlib

    from pygeoops_ray.pipelines.q_text import q_domain_mix

    out = q_domain_mix("/root/testdata/sf0.001").to_pandas()
    import duckdb

    docs = duckdb.connect().execute(
        "SELECT doc_id, lang FROM '/root/testdata/sf0.001/documents.parquet'"
    ).df()
    n_min = docs.groupby("lang").size().min()
    sizes = out.groupby("lang").size()
    assert (sizes == n_min).all() and set(sizes.index) == set(docs["lang"])
    # membership = first n_min doc_ids per lang by (md5, doc_id)
    docs["h"] = [hashlib.md5(str(i).encode()).hexdigest() for i in docs["doc_id"]]
    want = (
        docs.sort_values(["lang", "h", "doc_id"]).groupby("lang").head(n_min)
    )
    assert set(zip(out["lang"], out["doc_id"])) == set(
        zip(want["lang"], want["doc_id"])
    )
    again = q_domain_mix("/root/testdata/sf0.001").to_pandas()
    a = out.sort_values(["lang", "rnk"]).reset_index(drop=True)
    b = again.sort_values(["lang", "rnk"]).reset_index(drop=True)
    assert a.equals(b)


def test_bpe_train_matches_reference_bpe(ray_session):
    """q_bpe_train vs the classic get_stats/merge_vocab reference BPE
    (Sennrich et al.) on the real sf0.001 corpus — merges, order, counts."""
    from collections import Counter

    from pygeoops_ray.pipelines.q_text import BPE_N_MERGES, q_bpe_train

    sf = "/root/testdata/sf0.001"
    got = q_bpe_train(sf)
    import duckdb

    words = duckdb.connect().execute(
        f"SELECT text FROM '{sf}/documents.parquet'"
    ).fetchall()
    vocab = Counter()
    for (t,) in words:
        for w in t.split(" "):
            if w:
                vocab[tuple(w)] += 1
    want = []
    for rnk in range(1, BPE_N_MERGES + 1):
        stats = Counter()
        for syms, cnt in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += cnt
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        want.append((rnk, a, b, c))
        new_vocab = Counter()
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += cnt
        vocab = new_vocab
    assert list(map(tuple, got.itertuples(index=False))) == want


def test_dataset_split_brute_force(ray_session):
    """The per-(split, lang) aggregate equals a row-by-row pandas replay of
    the md5 split rule; splits partition the corpus (counts sum to N) and a
    rerun is identical (hash-stability contract)."""
    import duckdb
    import pandas as pd

    from pygeoops_ray.pipelines.q_text import q_dataset_split
    from pygeoops_ray.stages.sketch import md5_low64

    sf = "/root/testdata/sf0.001"
    out = q_dataset_split(sf).to_pandas()
    docs = duckdb.connect().execute(
        f"SELECT doc_id, lang, n_chars FROM '{sf}/documents.parquet'"
    ).df()
    b = docs["doc_id"].map(lambda i: md5_low64(str(i)) % 10)
    docs["split"] = b.map(lambda v: "train" if v < 8 else ("val" if v == 8 else "test"))
    want = (
        docs.groupby(["split", "lang"], as_index=False)
        .agg(n_docs=("doc_id", "size"), sum_doc_id=("doc_id", "sum"), sum_chars=("n_chars", "sum"))
    )
    a = out.sort_values(["split", "lang"]).reset_index(drop=True)
    w = want.sort_values(["split", "lang"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[["split", "lang", "n_docs", "sum_doc_id", "sum_chars"]].astype(
            {"n_docs": "int64", "sum_doc_id": "int64", "sum_chars": "int64"}
        ),
        w.astype({"n_docs": "int64", "sum_doc_id": "int64", "sum_chars": "int64"}),
    )
    assert out["n_docs"].sum() == len(docs)
    again = q_dataset_split(sf).to_pandas().sort_values(["split", "lang"]).reset_index(drop=True)
    assert a.equals(again)


def test_group_hll_registers_brute_force(ray_session):
    """Every (lang, bucket, r) register equals the single-machine HLL over
    that language's distinct tokens; the estimator lands within the usual
    1.04/sqrt(m) band of the exact per-lang vocabulary."""
    import duckdb
    import numpy as np
    import pandas as pd

    from pygeoops_ray.pipelines.q_text import q_group_hll
    from pygeoops_ray.stages.sketch import hll_estimate, hll_partial

    sf = "/root/testdata/sf0.001"
    out = q_group_hll(sf).to_pandas()
    docs = duckdb.connect().execute(
        f"SELECT lang, text FROM '{sf}/documents.parquet'"
    ).df()
    frames = []
    for lang, g in docs.groupby("lang"):
        toks: list[str] = []
        for t in g["text"]:
            toks.extend(t.split(" "))
        bucket, r = hll_partial(toks, 12)
        frames.append(pd.DataFrame({"lang": lang, "bucket": bucket, "r": r}))
        # estimator sanity per group
        est = hll_estimate(pd.DataFrame({"bucket": bucket, "r": r}), 12)
        exact = len(set(toks))
        assert abs(est - exact) / exact < 5 * 1.04 / np.sqrt(4096)
    want = pd.concat(frames, ignore_index=True)
    a = out.sort_values(["lang", "bucket"]).reset_index(drop=True)
    w = want.sort_values(["lang", "bucket"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a.astype({"bucket": "int64", "r": "int64"}),
        w.astype({"bucket": "int64", "r": "int64"}),
    )
