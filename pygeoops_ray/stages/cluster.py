"""Distributed k-means over an embedding column (integer-exact Lloyd's).

The classic training-data-pipeline clustering op, shaped for Ray Data's
broadcast-iterate pattern: each Lloyd iteration is ONE streaming pass —
``map_batches`` computes per-batch partial (cluster → sum vector, count)
against broadcast centroids (``ray.put`` once per iteration, NOT re-shipped
per batch), the driver reduces the tiny k×d partial table and re-broadcasts.
Data never leaves the object store; driver state is k×d integers.

Exactness contract (what makes the driver oracle possible): embeddings are
quantized to ``floor(x*100) + 128`` (the shift keeps every value
non-negative so Python/numpy floor division and DuckDB's truncating ``//``
agree), centroids are ELEMENTWISE INTEGER means (S // n), distances are
exact int64, ties break toward the smallest cluster id, and an emptied
cluster keeps its previous centroid. Every step is integer arithmetic a SQL
oracle replays verbatim — same pattern as the image/audio digest oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "kmeans_assign",
    "fit_centroids",
    "semantic_dedup_pairs",
    "pq_codes",
    "fit_pq_centroids",
    "pq_adc_topk",
    "QUANT_SCALE",
    "QUANT_SHIFT",
]

QUANT_SCALE = 100
QUANT_SHIFT = 128


def _quantize(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch["vec_id"].to_numpy()
    emb = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
    q = np.floor(emb * QUANT_SCALE).astype(np.int64) + QUANT_SHIFT
    return ids, q


def _nearest(q: np.ndarray, cents: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(assignment, dist2) vs k×d integer centroids; ties → smallest id.

    Values are small (≤ ~2*shift) so the int64 matmul is exact with huge
    margin; np.argmin returns the FIRST minimum, which is the tie rule.
    """
    d2 = (
        (q * q).sum(axis=1)[:, None]
        - 2 * (q @ cents.T)
        + (cents * cents).sum(axis=1)[None, :]
    )
    a = d2.argmin(axis=1)
    return a, d2[np.arange(len(q)), a]


def _init_centroids(ds, k: int) -> np.ndarray:
    """Centroids 0..k-1 = quantized vectors of the k SMALLEST vec_ids.

    Per-batch k-smallest partials keep the driver merge at ≤ k·n_blocks tiny
    rows — no sort shuffle, no full materialization.
    """

    def partial(batch: pa.Table) -> pd.DataFrame:
        ids, q = _quantize(batch)
        take = np.argsort(ids, kind="stable")[:k]
        return pd.DataFrame(
            {"vec_id": ids[take], "q": [q[t].tobytes() for t in take]}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).to_pandas()
    parts = parts.sort_values("vec_id").head(k)
    return np.stack([np.frombuffer(b, dtype=np.int64) for b in parts["q"]])


def fit_centroids(ds, k: int = 8, iters: int = 2) -> np.ndarray:
    """`iters` Lloyd iterations over quantized vectors; returns k×d int64
    centroids. Each iteration is one streaming pass emitting per-batch
    (cluster → sum, count) partials against the broadcast centroids."""
    import ray

    cents = _init_centroids(ds, k)

    for _ in range(iters):
        ref = ray.put(cents)

        def partial_sums(batch: pa.Table, _ref=ref, _k=k) -> pd.DataFrame:
            c = ray.get(_ref)
            ids, q = _quantize(batch)
            a, _ = _nearest(q, c)
            rows = []
            for j in range(_k):
                m = a == j
                n = int(m.sum())
                if n:
                    rows.append((j, n, q[m].sum(axis=0).tobytes()))
            return pd.DataFrame(rows, columns=["cluster", "n", "sums"])

        parts = ds.map_batches(
            partial_sums, batch_format="pyarrow", batch_size=None
        ).to_pandas()
        new = cents.copy()  # emptied cluster keeps its previous centroid
        for j in range(k):
            sub = parts[parts["cluster"] == j]
            if len(sub):
                s = np.sum(
                    np.stack([np.frombuffer(b, dtype=np.int64) for b in sub["sums"]]),
                    axis=0,
                )
                new[j] = s // int(sub["n"].sum())
        cents = new
    return cents


def kmeans_assign(ds, k: int = 8, iters: int = 2):
    """Run `iters` Lloyd iterations; return a Dataset (vec_id, cluster, dist2).

    ds must carry (vec_id:int64, embedding:list<float>). Centroids travel by
    ``ray.put`` broadcast; each iteration and the final labeling are
    streaming passes over the Dataset (3 passes total for iters=2).
    """
    import ray

    cents = fit_centroids(ds, k, iters)
    d = cents.shape[1]
    ref = ray.put(cents)

    def label(batch: pa.Table, _ref=ref) -> pa.Table:
        c = ray.get(_ref)
        ids, q = _quantize(batch)
        a, d2 = _nearest(q, c)
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array(a.astype(np.int64), pa.int64()),
                "dist2": pa.array(d2, pa.int64()),
            }
        )

    assert d == cents.shape[1]
    return ds.map_batches(label, batch_format="pyarrow", batch_size=None)


def semantic_dedup_pairs(
    ds, k: int = 8, iters: int = 2, tau_num: int = 1225, tau_den: int = 10000
):
    """SemDeDup-shaped embedding near-dup pairs (Abbas et al. 2023): k-means
    cluster the corpus, then compare pairs ONLY within a cluster — the
    pairwise work drops from O(n²) to O(Σ|cluster|²), and clusters shard the
    shuffle (k scales with corpus size at real scale).

    Clustering uses the shifted quantization (same rule as ``kmeans_assign``,
    so the oracle shares those CTEs); the pair test uses CENTERED integer
    vectors qc = floor(100·x) — the +128 shift would swamp the cosine (every
    shifted pair measures ≥ 0.97). The test is integer-exact, so a SQL
    oracle replays it: emit (a, b) iff cluster(a) == cluster(b), a < b,
    dot(qc_a, qc_b) > 0 and dot² · tau_den ≥ tau_num · |qc_a|² · |qc_b|² —
    i.e. cos ≥ sqrt(tau_num / tau_den) with no float in sight. Defaults give
    cos ≥ 0.35 (the synthetic embeddings are near-orthogonal; real corpora
    would use ~0.95). Bounds: |qc| ≤ ~2·QUANT_SHIFT, d = 64 → dot ≤ 4.2e6,
    dot²·10⁴ ≤ 1.8e17 < 2⁶³ (exact in int64).

    Shape: centroid fit (streaming partials) → per-batch labeling → ONE
    groupby(cluster) cogroup whose reducer runs a vectorized integer Gram
    matrix per cluster. Output: (a, b) vec_id pairs.
    """
    import ray

    cents = fit_centroids(ds, k, iters)
    ref = ray.put(cents)

    def label_q(batch: pa.Table, _ref=ref) -> pd.DataFrame:
        c = ray.get(_ref)
        ids, q = _quantize(batch)
        a, _ = _nearest(q, c)
        qc = q - QUANT_SHIFT  # centered: floor(100·x)
        return pd.DataFrame(
            {
                "cluster": a.astype(np.int64),
                "vec_id": ids,
                "qbytes": [row.tobytes() for row in qc],
            }
        )

    labeled = ds.map_batches(label_q, batch_format="pyarrow", batch_size=None)

    def pairs_in_cluster(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame({"a": np.zeros(0, np.int64), "b": np.zeros(0, np.int64)})
        order = np.argsort(df["vec_id"].to_numpy(), kind="stable")
        ids = df["vec_id"].to_numpy()[order]
        q = np.stack(
            [np.frombuffer(b, dtype=np.int64) for b in df["qbytes"].to_numpy()[order]]
        )
        gram = q @ q.T  # exact: values ≤ 2·shift, d=64 → well inside int64
        n2 = np.diag(gram)
        iu, ju = np.triu_indices(len(ids), k=1)
        dot = gram[iu, ju]
        ok = (dot > 0) & (dot * dot * tau_den >= tau_num * n2[iu] * n2[ju])
        return pd.DataFrame({"a": ids[iu[ok]], "b": ids[ju[ok]]})

    return labeled.groupby("cluster").map_groups(pairs_in_cluster, batch_format="pandas")


def fit_pq_centroids(ds, subspaces: int, k: int, iters: int) -> list[np.ndarray]:
    """Per-subspace integer Lloyd fit; every subspace's partials ride the
    SAME streaming pass. Returns ``subspaces`` arrays of k × (d/subspaces)."""
    import ray

    cents0 = _init_centroids(ds, k)  # k × d, full vectors
    d = cents0.shape[1]
    assert d % subspaces == 0, (d, subspaces)
    w = d // subspaces
    cents = [cents0[:, s * w : (s + 1) * w].copy() for s in range(subspaces)]

    for _ in range(iters):
        ref = ray.put(cents)

        def partial_sums(batch: pa.Table, _ref=ref, _k=k) -> pd.DataFrame:
            c = ray.get(_ref)
            _, q = _quantize(batch)
            rows = []
            for s, cs in enumerate(c):
                qs = q[:, s * w : (s + 1) * w]
                a, _ = _nearest(qs, cs)
                for j in range(_k):
                    m = a == j
                    n = int(m.sum())
                    if n:
                        rows.append((s, j, n, qs[m].sum(axis=0).tobytes()))
            return pd.DataFrame(rows, columns=["sub", "code", "n", "sums"])

        parts = ds.map_batches(
            partial_sums, batch_format="pyarrow", batch_size=None
        ).to_pandas()
        for s in range(subspaces):
            new = cents[s].copy()
            for j in range(k):
                subp = parts[(parts["sub"] == s) & (parts["code"] == j)]
                if len(subp):
                    tot = np.sum(
                        np.stack(
                            [np.frombuffer(b, dtype=np.int64) for b in subp["sums"]]
                        ),
                        axis=0,
                    )
                    new[j] = tot // int(subp["n"].sum())
            cents[s] = new
    return cents


def pq_codes(ds, subspaces: int = 4, k: int = 4, iters: int = 1):
    """Product-quantization code assignment (Jégou et al. 2011), integer-exact.

    The vector-compression step every billion-vector ANN system runs: split
    each quantized embedding into ``subspaces`` contiguous sub-vectors, run an
    independent k-means per subspace, and store each vector as ``subspaces``
    small codes. Memory drops from d floats to ``subspaces`` bytes per vector;
    distance evaluation becomes table lookups.

    Exactness contract mirrors kmeans_assign: shifted quantization, integer
    centroid means (S // n), exact int64 distances, ties to the smallest code,
    emptied centroids keep their previous value, init = sub-vectors of the k
    smallest vec_ids. Every subspace's iteration happens in the SAME streaming
    pass (per-batch partials keyed (sub, code)), so the whole fit is
    ``iters + 2`` passes regardless of ``subspaces``. Output: one row per
    (vec_id, sub) with the assigned ``code`` and exact ``dist2``.
    """
    import ray

    cents = fit_pq_centroids(ds, subspaces, k, iters)
    w = cents[0].shape[1]
    ref = ray.put(cents)

    def label(batch: pa.Table, _ref=ref) -> pa.Table:
        c = ray.get(_ref)
        ids, q = _quantize(batch)
        out_ids, out_sub, out_code, out_d2 = [], [], [], []
        for s, cs in enumerate(c):
            a, d2 = _nearest(q[:, s * w : (s + 1) * w], cs)
            out_ids.append(ids)
            out_sub.append(np.full(len(ids), s, np.int64))
            out_code.append(a.astype(np.int64))
            out_d2.append(d2)
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(np.concatenate(out_ids), pa.int64()),
                "sub": pa.array(np.concatenate(out_sub), pa.int64()),
                "code": pa.array(np.concatenate(out_code), pa.int64()),
                "dist2": pa.array(np.concatenate(out_d2), pa.int64()),
            }
        )

    return ds.map_batches(label, batch_format="pyarrow", batch_size=None)


def pq_adc_topk(
    emb_ds, q_ids, q_matrix, k: int = 10, subspaces: int = 16, kcent: int = 32,
    iters: int = 2,
):
    """PQ asymmetric-distance (ADC) top-k search (Jégou et al. 2011).

    The query side computes, ONCE per query, a per-subspace distance table
    to every codebook centroid (subspaces × kcent ints); the corpus side
    streams by, each batch is coded (argmin per subspace — at rest the codes
    WOULD be precomputed; coding here keeps the query self-contained) and a
    vector's approximate distance is just ``sum_s table[s, code_s]`` — table
    lookups, no d-dimensional math per candidate. Partial top-k per batch,
    exact grouped merge, (dist2 ASC, vec_id) ties. Approximate by nature:
    driver contract is the recall floor (ann_pq query), same weak-oracle
    pattern as ann_lsh / ann_ivf.
    """
    import ray

    cents = fit_pq_centroids(emb_ds, subspaces, kcent, iters)
    w = cents[0].shape[1]
    qq = np.floor(np.asarray(q_matrix, np.float64) * QUANT_SCALE).astype(np.int64) + QUANT_SHIFT
    # dtab[s]: (n_queries, kcent) exact int64 squared distances
    dtab = []
    for s in range(subspaces):
        qs = qq[:, s * w : (s + 1) * w]
        cs = cents[s]
        dtab.append(
            (qs * qs).sum(1)[:, None] - 2 * (qs @ cs.T) + (cs * cs).sum(1)[None, :]
        )
    ref = ray.put((np.asarray(q_ids, np.int64), cents, dtab))

    def partial(batch: pa.Table, _ref=ref) -> pd.DataFrame:
        qids, c, tabs = ray.get(_ref)
        ids, q = _quantize(batch)
        approx = np.zeros((len(qids), len(ids)), dtype=np.int64)
        for s, cs in enumerate(c):
            codes, _ = _nearest(q[:, s * w : (s + 1) * w], cs)
            approx += tabs[s][:, codes]
        kk = min(k, len(ids))
        part = np.argpartition(approx, kk - 1, axis=1)[:, :kk]
        rows_q = np.repeat(qids, kk)
        cols = part.ravel()
        return pd.DataFrame(
            {
                "q_id": rows_q,
                "vec_id": ids[cols],
                "d2": approx[np.repeat(np.arange(len(qids)), kk), cols],
            }
        )

    partials = emb_ds.map_batches(partial, batch_format="pyarrow")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["d2", "vec_id"], ascending=[True, True]).head(k).copy()
        group["rnk"] = np.arange(1, len(group) + 1, dtype=np.int64)
        return group[["q_id", "vec_id", "rnk"]]

    return partials.groupby("q_id").map_groups(merge, batch_format="pandas")


def ivf_pq_topk(
    emb_ds, q_ids, q_matrix, k: int = 10, n_centroids: int = 16, nprobe: int = 6,
    subspaces: int = 16, kcent: int = 32, iters: int = 2, seed: int = 5,
):
    """IVF + PQ composite search — the billion-scale ANN memory layout
    (Jégou et al. 2011 IVFADC, by_residual=False variant: PQ codebooks are
    trained on the raw quantized vectors, the inverted file only restricts
    the candidate set; FAISS exposes the same switch).

    Coarse stage: queries probe their ``nprobe`` nearest of ``n_centroids``
    inverted cells, so only ~nprobe/n_centroids of the corpus is scored at
    all. Fine stage: scoring is PQ asymmetric distance — per-query distance
    TABLES to every sub-codebook centroid (subspaces × kcent ints, computed
    once), a candidate's distance is ``sum_s table[s, code_s]`` (lookups,
    no d-dimensional math). At rest the codes + cell assignment are the
    stored index (see pq_codes / build_ivf_disk_index for the two at-rest
    halves); here both derive in-stream so the query is self-contained.
    One partial top-k per batch, exact grouped merge, (d2 ASC, vec_id) ties.
    Approximate by design: driver contract is the recall floor
    (q_ann_ivf_pq), the weak-oracle pattern of ann_lsh / ann_ivf / ann_pq.
    """
    import ray

    from pygeoops_ray.stages.ann import train_ivf_centroids

    cent = train_ivf_centroids(emb_ds, n_centroids=n_centroids, seed=seed)
    pq_cents = fit_pq_centroids(emb_ds, subspaces, kcent, iters)
    w = pq_cents[0].shape[1]

    qm = np.asarray(q_matrix, np.float64)
    qn = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    probe = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    qq = (
        np.floor(qm * QUANT_SCALE).astype(np.int64) + QUANT_SHIFT
    )
    dtab = []
    for s in range(subspaces):
        qs = qq[:, s * w : (s + 1) * w]
        cs = pq_cents[s]
        dtab.append(
            (qs * qs).sum(1)[:, None] - 2 * (qs @ cs.T) + (cs * cs).sum(1)[None, :]
        )
    ref = ray.put((np.asarray(q_ids, np.int64), cent, pq_cents, dtab, probe))

    def partial(batch: pa.Table, _ref=ref) -> pd.DataFrame:
        qids, cent_, c, tabs, probe_ = ray.get(_ref)
        ids, q = _quantize(batch)
        raw, m = None, None
        # coarse assignment in the normalized float space (same rule the
        # coarse trainer used)
        from pygeoops_ray.stages.ann import _embedding_matrix

        rids, rm = _embedding_matrix(batch)
        rn = rm / np.maximum(np.linalg.norm(rm, axis=1, keepdims=True), 1e-12)
        assign = (rn @ cent_.T).argmax(axis=1)

        codes = np.empty((len(ids), len(c)), dtype=np.int64)
        for s, cs in enumerate(c):
            codes[:, s], _ = _nearest(q[:, s * w : (s + 1) * w], cs)

        frames = []
        for qi, qid in enumerate(qids):
            cand = np.isin(assign, probe_[qi])
            if not cand.any():
                continue
            cids = ids[cand]
            d2 = np.zeros(len(cids), dtype=np.int64)
            sub_codes = codes[cand]
            for s in range(len(c)):
                d2 += tabs[s][qi][sub_codes[:, s]]
            kk = min(k, len(cids))
            idx = (
                np.argpartition(d2, kk - 1)[:kk] if kk < len(cids) else np.arange(len(cids))
            )
            frames.append(
                pd.DataFrame({"q_id": qid, "vec_id": cids[idx], "d2": d2[idx]})
            )
        if not frames:
            return pd.DataFrame(
                {c_: pd.Series([], dtype="int64") for c_ in ("q_id", "vec_id", "d2")}
            )
        return pd.concat(frames, ignore_index=True)

    partials = emb_ds.map_batches(partial, batch_format="pyarrow")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["d2", "vec_id"], ascending=[True, True]).head(k).copy()
        group["rnk"] = np.arange(1, len(group) + 1, dtype=np.int64)
        return group[["q_id", "vec_id", "rnk"]]

    return partials.groupby("q_id").map_groups(merge, batch_format="pandas")
