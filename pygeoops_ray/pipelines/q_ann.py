"""ANN / embedding queries: brute-force, LSH, IVF (in-stream + disk), quantization, k-means.

Split from pipelines/queries.py (round-2 verdict item 7); queries.py
remains the single QUERIES/ORACLE_SQL registry and re-exports these names.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pygeoops_ray.stages import ann as ann_stages
from pygeoops_ray.pipelines.common import (
    _read,
    _table_rows,
)


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


def _matrix_of(tab: pa.Table):
    ids = tab["vec_id"].to_numpy()
    emb = tab["embedding"].combine_chunks()
    flat = np.asarray(emb.values, dtype=np.float64)
    dim = len(flat) // max(len(ids), 1)
    return ids, flat.reshape(len(ids), dim)


def _query_vectors(sf_dir: str, nq: int = 8):
    """The nq smallest-vec_id vectors, via ROW-GROUP-PRUNED reads.

    Row groups are read in ascending order of their vec_id min-statistic and
    reading stops as soon as the collected rows must contain the global nq
    smallest (every unread group's min exceeds our nq-th candidate) — at
    scale this touches one row group, not the table.
    """
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    md = pf.metadata
    vec_col = next(
        i for i in range(md.num_columns) if md.row_group(0).column(i).path_in_schema == "vec_id"
    )
    mins = [md.row_group(g).column(vec_col).statistics.min for g in range(md.num_row_groups)]
    order = sorted(range(len(mins)), key=lambda g: mins[g])
    tabs, best = [], None
    for pos, g in enumerate(order):
        tabs.append(pf.read_row_group(g, columns=["vec_id", "embedding"]))
        got = np.sort(np.concatenate([t["vec_id"].to_numpy() for t in tabs]))
        if len(got) >= nq:
            best = got[nq - 1]
            nxt = mins[order[pos + 1]] if pos + 1 < len(order) else None
            if nxt is None or best < nxt:
                break
    tab = pa.concat_tables(tabs)
    ids, m = _matrix_of(tab)
    sel = np.argsort(ids)[:nq]
    return ids[sel], m[sel]


def _corpus_matrix(sf_dir: str):
    """Full (vec_id, embedding) matrix — broadcast side of the exact
    cosine-pair baseline (column-pruned read; the matrix IS the operator's
    small side, ray.put once by the stage)."""
    import pyarrow.parquet as pq

    tab = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return _matrix_of(tab)


def q_ann_topk(sf_dir: str):
    """Exact cosine top-10 for the first 8 vectors as queries."""
    q_ids, qm = _query_vectors(sf_dir)
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ann_stages.brute_force_topk(emb, q_ids, qm, k=10)


def _ann_recall_summary(sf_dir: str, approx_fn, min_mean_recall_pct: int, k: int = 10):
    """Weak oracle for an approximate-NN family, encoded as rows.

    An approximate index has no value-exact SQL oracle, but its CONTRACT does:
    mean recall@k against the exact top-k (computed from the same table inside
    this query) must clear a floor. The driver-visible output is one summary
    row whose ``recall_ok`` flips to 0 on a recall regression, turning the
    oracle hash red — chance-level recall here is k/N ≈ 0.1%, so the floor is
    a real assertion, not a tautology. Raw neighbor lists stay available via
    ``stages.ann`` and the recall distribution via pytest.
    """
    q_ids, qm = _query_vectors(sf_dir)
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    exact = ann_stages.brute_force_topk(emb, q_ids, qm, k=k).to_pandas()
    approx = approx_fn(emb, q_ids, qm, k=k).to_pandas()
    recalls = []
    for q in q_ids:
        e = set(exact.loc[exact["q_id"] == q, "vec_id"])
        a = set(approx.loc[approx["q_id"] == q, "vec_id"])
        recalls.append(len(e & a) / max(len(e), 1))
    mean_pct = 100.0 * float(np.mean(recalls)) if recalls else 0.0
    return pa.Table.from_pydict(
        {
            "n_queries": pa.array([len(q_ids)], pa.int64()),
            "k": pa.array([k], pa.int64()),
            "recall_ok": pa.array([int(mean_pct >= min_mean_recall_pct)], pa.int64()),
        }
    )


def q_ann_ivf(sf_dir: str):
    """IVF approximate-NN recall gate: mean recall@10 >= 40% vs exact.

    Measured mean recall is 0.55-0.74 across sf0.001/sf0.01 (nprobe=4 of 16
    centroids); the 40% floor leaves margin for corpus drift while staying
    ~400x above chance.
    """
    return _ann_recall_summary(sf_dir, ann_stages.ivf_topk, min_mean_recall_pct=40)


def q_ann_ivf_disk(sf_dir: str):
    """Disk-persisted IVF index: recall contract + I/O-pruning contract.

    Index build (once per table, resumable): vectors written as one parquet
    partition per coarse cell through the checkpoint manifest, centroids as
    a sidecar (stages/ann.build_ivf_disk_index). Query: only the probed
    cells' FILES are read (ivf_disk_topk) — the 100-TB similarity-search
    shape where the index is a data layout and a query's I/O is nprobe/N of
    the corpus. Output adds ``pruned_ok`` (files_read < files_total) to the
    recall contract, so a regression in either the recall OR the pruning
    turns the driver hash red.
    """
    import hashlib
    import os

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{os.path.getmtime(emb_path)}:v2".encode()
    ).hexdigest()[:10]
    out_dir = f"/tmp/pygeoops_ray_cache/ivf_index_{key}"
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    if not os.path.exists(os.path.join(out_dir, "centroids.npy")):
        ann_stages.build_ivf_disk_index(emb, out_dir)

    k = 10
    q_ids, qm = _query_vectors(sf_dir)
    # nprobe=3: nprobe=4's probe UNION reads 16/16 files at sf0.1 with the
    # canonical centroids (nothing left to prune); 3 reads 13-14/16 at every
    # sf with recall 50-65% — both contracts hold at all three scales
    approx_ds, n_read, n_total = ann_stages.ivf_disk_topk(out_dir, q_ids, qm, k=k, nprobe=3)
    exact = ann_stages.brute_force_topk(emb, q_ids, qm, k=k).to_pandas()
    approx = approx_ds.to_pandas()
    recalls = []
    for q in q_ids:
        e = set(exact.loc[exact["q_id"] == q, "vec_id"])
        a = set(approx.loc[approx["q_id"] == q, "vec_id"])
        recalls.append(len(e & a) / max(len(e), 1))
    mean_pct = 100.0 * float(np.mean(recalls)) if recalls else 0.0
    return pa.Table.from_pydict(
        {
            "n_queries": pa.array([len(q_ids)], pa.int64()),
            "k": pa.array([k], pa.int64()),
            "recall_ok": pa.array([int(mean_pct >= 40)], pa.int64()),
            "pruned_ok": pa.array([int(0 < n_read < n_total)], pa.int64()),
        }
    )


def q_ann_lsh(sf_dir: str):
    """Hyperplane-LSH approximate-NN recall gate: mean recall@10 >= 30%.

    Measured mean recall is 0.42-0.46 across sf0.001/sf0.01.
    """
    return _ann_recall_summary(sf_dir, ann_stages.lsh_topk, min_mean_recall_pct=30)


def q_embed_quantize(sf_dir: str):
    """Int8-style embedding quantization (the vector-compression step an
    ANN index applies at rest) with per-vector integer digests.

    Rule shared with kmeans: q = floor(x·100) + 128 over the float64-cast
    values, so every digest is exact and the oracle replays the whole
    transform via unnest + generate_subscripts. A pure map — no shuffle.
    """
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def digest(batch: pa.Table) -> pa.Table:
        ids, mat = _matrix_of(batch)
        q = np.floor(mat * 100.0).astype(np.int64) + 128
        w = np.arange(1, q.shape[1] + 1, dtype=np.int64)
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "sum_q": pa.array(q.sum(axis=1), pa.int64()),
                "sum_q2": pa.array((q * q).sum(axis=1), pa.int64()),
                "wsum": pa.array(q @ w, pa.int64()),
            }
        )

    return ds.map_batches(digest, batch_format="pyarrow", batch_size=None)


def q_kmeans(sf_dir: str):
    """Distributed integer-exact k-means over the embeddings table.

    Two Lloyd iterations, k=8: each iteration is one streaming pass with
    per-batch partial (cluster → sum, count) against broadcast centroids
    (ray.put once per iteration), tiny k×d driver reduce. The oracle replays
    the identical integer algorithm (quantize → argmin → S//n centroids) in
    unrolled SQL CTEs — value-exact, not a contract bit.
    """
    from pygeoops_ray.stages.cluster import kmeans_assign

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return kmeans_assign(ds, k=8, iters=2)


def q_semantic_dedup(sf_dir: str):
    """SemDeDup (cluster-then-compare embedding dedup): k-means shards the
    corpus, near-dup pairs are found ONLY within clusters — see
    stages/cluster.py:semantic_dedup_pairs. Integer-exact (quantized vectors,
    cross-multiplied cosine threshold), so the oracle replays the full chain:
    the kmeans CTEs plus a within-cluster pair join."""
    from pygeoops_ray.stages.cluster import semantic_dedup_pairs

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return semantic_dedup_pairs(ds, k=8, iters=2)


def q_pq_codes(sf_dir: str):
    """Product-quantization codes over the embeddings table (4 subspaces of
    16 dims, 4 centroids each, 1 Lloyd iteration): the vector-compression
    component of a billion-scale ANN system — see stages/cluster.pq_codes.
    Integer-exact throughout, so the oracle replays init + iteration + final
    assignment with subspace-generalized kmeans CTEs."""
    from pygeoops_ray.stages.cluster import pq_codes

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return pq_codes(ds, subspaces=4, k=4, iters=1)


def q_ann_pq(sf_dir: str):
    """PQ asymmetric-distance search (stages/cluster.pq_adc_topk): codebook
    distance tables per query, corpus scored by table lookups — the memory
    shape that fits a billion vectors in RAM. Recall-contract oracle (floor
    35%; measured 47-60% across scales vs exact cosine top-10; chance ≤2%)."""
    from pygeoops_ray.stages.cluster import pq_adc_topk

    return _ann_recall_summary(sf_dir, pq_adc_topk, min_mean_recall_pct=35)


def q_ann_ivf_append(sf_dir: str):
    """Incremental IVF maintenance: base index over 80% of the corpus, the
    remaining 20% APPENDED as a second layer against the frozen centroids
    (no refit — stages/ann.append_ivf_disk_index), search over both layers
    via manifest-pruned reads.

    Contracts in the output row: recall_ok (mean recall@10 vs brute force
    over the FULL corpus >= 40%), pruned_ok (file pruning happened in the
    base AND the delta layer), append_ok (the delta layer's manifest rows
    equal the delta vector count — every appended vector landed in exactly
    one cell file). A rerun of the append writes nothing (manifest resume).
    """
    import hashlib
    import os

    import numpy as np
    import pyarrow as pa

    from pygeoops_ray.state.manifest import CheckpointManifest

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{os.path.getmtime(emb_path)}:append:v2".encode()
    ).hexdigest()[:10]
    out_dir = f"/tmp/pygeoops_ray_cache/ivf_append_{key}"

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def _split(keep_delta: bool):
        def fn(batch: pa.Table) -> pa.Table:
            m = batch["vec_id"].to_numpy() % 5 == 0
            return batch.filter(pa.array(m if keep_delta else ~m))

        return fn

    base = emb.map_batches(_split(False), batch_format="pyarrow")
    delta = emb.map_batches(_split(True), batch_format="pyarrow")
    if not os.path.exists(os.path.join(out_dir, "centroids.npy")):
        ann_stages.build_ivf_disk_index(base, out_dir)
        ann_stages.append_ivf_disk_index(delta, out_dir)

    k = 10
    q_ids, qm = _query_vectors(sf_dir)
    # nprobe=3: with 8 queries over 16 cells, nprobe=4's probe UNION can
    # cover every cell at this corpus size (no I/O left to prune — observed
    # 16/16 at sf0.01 with canonical centroids); 3 keeps the union strictly
    # partial at sf0.001/0.01/0.1 while recall stays well above the contract
    approx_ds, stats = ann_stages.ivf_disk_topk_layers(out_dir, q_ids, qm, k=k, nprobe=3)
    exact = ann_stages.brute_force_topk(emb, q_ids, qm, k=k).to_pandas()
    approx = approx_ds.to_pandas()
    recalls = []
    for q in q_ids:
        e = set(exact.loc[exact["q_id"] == q, "vec_id"])
        a = set(approx.loc[approx["q_id"] == q, "vec_id"])
        recalls.append(len(e & a) / max(len(e), 1))
    mean_pct = 100.0 * float(np.mean(recalls)) if recalls else 0.0

    n_delta = delta.count()
    drec = CheckpointManifest(os.path.join(out_dir, "delta"), "ivf").completed()
    delta_rows = sum(int(r.get("row_count") or 0) for r in drec.values())
    pruned_ok = int(all(0 < r < t for r, t in stats))
    return pa.Table.from_pydict(
        {
            "n_queries": pa.array([len(q_ids)], pa.int64()),
            "k": pa.array([k], pa.int64()),
            "recall_ok": pa.array([int(mean_pct >= 40)], pa.int64()),
            "pruned_ok": pa.array([pruned_ok], pa.int64()),
            "append_ok": pa.array([int(delta_rows == n_delta)], pa.int64()),
        }
    )


def q_ann_hnsw(sf_dir: str):
    """Sharded deterministic HNSW (stages/ann.hnsw_topk) recall gate: mean
    recall@10 >= 60% against exact brute force (measured 96-100% at
    sf0.001/0.01/0.1, M=8 efC=32 efS=48, 4 shards). Levels draw from
    md5(vec_id) — no RNG state — so the graph, the search path and the
    recall are bit-stable across sessions and partitionings."""
    return _ann_recall_summary(
        sf_dir,
        lambda emb, q_ids, qm, k: ann_stages.hnsw_topk(
            emb, q_ids, qm, k=k,
            n_rows_hint=_table_rows(sf_dir, "embeddings"),
        ),
        min_mean_recall_pct=60,
    )


def q_ann_ivf_pq(sf_dir: str):
    """IVF+PQ composite search (stages/cluster.ivf_pq_topk): inverted-file
    candidate restriction (nprobe=6 of 16 cells) + PQ asymmetric-distance
    scoring (16 subspaces x 32 centroids) — the billion-scale memory layout
    (Jégou et al. IVFADC, by_residual=False). Recall-contract oracle (floor
    25%; measured mean 47-54% across scales vs exact cosine top-10, min
    per-query 30%; chance <=1%)."""
    from pygeoops_ray.stages.cluster import ivf_pq_topk

    return _ann_recall_summary(sf_dir, ivf_pq_topk, min_mean_recall_pct=25)


def q_ann_filtered(sf_dir: str):
    """FILTERED (hybrid) vector search — ANN under a metadata predicate
    (label == 3), the production retrieval shape where the index is built
    over the whole corpus but a query sees only rows passing a filter.

    Post-filtering semantics: coarse centroids train on the FULL corpus
    (the index is label-agnostic, as at rest), the scan masks label != 3
    per batch BEFORE scoring, and candidates come from each query's probed
    cells as usual. The contract compares against the exact brute-force
    top-10 over the FILTERED corpus — so both the predicate plumbing and
    the probe recall participate in the gate (floor 30%; chance ≈ k/|filtered|).
    """
    import pyarrow.compute as pc

    from pygeoops_ray.stages.ann import (
        _probed_topk,
        brute_force_topk,
        train_ivf_centroids,
    )

    LABEL = 3
    q_ids, qm = _query_vectors(sf_dir)
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    cent = train_ivf_centroids(emb, n_centroids=16)
    qn = np.asarray(qm, np.float64)
    qn = qn / np.maximum(np.linalg.norm(qn, axis=1, keepdims=True), 1e-12)
    probe = np.argsort(-(qn @ cent.T), axis=1)[:, :6]

    def flt(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["label"], LABEL)).drop_columns(["label"])

    filtered = emb.map_batches(flt, batch_format="pyarrow")
    approx = _probed_topk(
        filtered, np.asarray(q_ids, np.int64), qn, cent, probe, 10
    ).to_pandas()
    exact = brute_force_topk(filtered, q_ids, qm, k=10).to_pandas()
    recalls = []
    for q in q_ids:
        e = set(exact.loc[exact["q_id"] == q, "vec_id"])
        a = set(approx.loc[approx["q_id"] == q, "vec_id"])
        recalls.append(len(e & a) / max(len(e), 1))
    mean_pct = 100.0 * float(np.mean(recalls)) if recalls else 0.0
    return pa.Table.from_pydict(
        {
            "n_queries": pa.array([len(q_ids)], pa.int64()),
            "k": pa.array([10], pa.int64()),
            "recall_ok": pa.array([int(mean_pct >= 30)], pa.int64()),
        }
    )


def q_npy_scan(sf_dir: str):
    """NumPy .npy source coverage (``ray.data.read_numpy``) — the tensor
    interchange format embedding dumps actually arrive in. The embeddings
    table exports once to 4 .npy shards of shape (n_i, d+1) with the vec_id
    in column 0 (ids ≪ 2^24, exact in float32), read back through Ray's
    native numpy datasource, and digested per vector: checksum =
    Σ floor(100·x) over dims. The parquet-side oracle re-derives the same
    integer checksums from the list<float> column, proving the tensor
    roundtrip lossless.
    """
    import hashlib
    import os

    import ray.data as rd

    n = _table_rows(sf_dir, "embeddings")
    key = hashlib.md5(f"{os.path.abspath(sf_dir)}:{n}:npy".encode()).hexdigest()[:10]
    path = f"/tmp/pygeoops_ray_cache/emb_npy_{key}"
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.isfile(marker):
        os.makedirs(path, exist_ok=True)
        # uuid shard names: clear stale files from a crashed partial build
        for f in os.listdir(path):
            os.remove(os.path.join(path, f))

        def write_shard(b: pa.Table) -> pa.Table:
            import uuid

            ids = b["vec_id"].to_numpy().astype(np.float32)
            m = np.stack(
                [np.asarray(v, dtype=np.float32) for v in b["embedding"].to_pylist()]
            )
            arr = np.column_stack([ids, m])
            fn = os.path.join(path, f"shard-{uuid.uuid4().hex}.npy")
            tmp = fn + ".tmp.npy"  # np.save appends .npy unless it ends so
            np.save(tmp, arr)
            os.rename(tmp, fn)
            return pa.Table.from_pydict({"rows": pa.array([len(ids)], pa.int64())})

        total = (
            _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
            .repartition(4)
            .map_batches(write_shard, batch_format="pyarrow", batch_size=None)
            .sum("rows")
        )
        assert total == n, (total, n)
        with open(marker, "w"):
            pass

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".npy")
    )

    def digest(b) -> pa.Table:
        arr = np.stack(list(b["data"]))
        ids = arr[:, 0].astype(np.int64)
        chk = np.floor(100.0 * arr[:, 1:].astype(np.float64)).astype(np.int64).sum(axis=1)
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "checksum": pa.array(chk, pa.int64()),
            }
        )

    return rd.read_numpy(files).map_batches(digest, batch_format="numpy")


def q_ann_hnsw_disk(sf_dir: str):
    """Disk-persisted HNSW index (stages/ann.build_hnsw_disk_index):
    build-once/search-many — per-shard graphs serialize to one parquet file
    per shard through the checkpoint manifest (crashed builds resume by
    skipping completed shards), and searches reconstruct the graph from
    rows instead of paying the O(n log n) insert loop per query batch.
    Contract row: the recall gate (>=60% vs exact, same as ann_hnsw) plus
    ``loaded_eq`` — the disk-loaded search must return EXACTLY the
    in-memory ``hnsw_topk`` neighbor lists (the serialized neighbor order
    is part of the format, so beam search is bit-equal) — and ``files_ok``
    (one manifest file per shard, all present)."""
    import hashlib
    import os

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{os.path.getmtime(emb_path)}:hnsw1".encode()
    ).hexdigest()[:10]
    out_dir = f"/tmp/pygeoops_ray_cache/hnsw_index_{key}"
    n = _table_rows(sf_dir, "embeddings")
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    marker = os.path.join(out_dir, "_BUILT")
    if not os.path.isfile(marker):
        ann_stages.build_hnsw_disk_index(emb, out_dir, n_rows_hint=n)
        with open(marker, "w"):
            pass

    k = 10
    q_ids, qm = _query_vectors(sf_dir)
    disk_ds, n_read, n_total = ann_stages.hnsw_disk_topk(out_dir, q_ids, qm, k=k)
    disk = disk_ds.to_pandas().sort_values(["q_id", "vec_id"]).reset_index(drop=True)
    mem = (
        ann_stages.hnsw_topk(emb, q_ids, qm, k=k, n_rows_hint=n)
        .to_pandas()
        .sort_values(["q_id", "vec_id"])
        .reset_index(drop=True)
    )
    loaded_eq = int(
        len(disk) == len(mem)
        and (disk["q_id"].to_numpy() == mem["q_id"].to_numpy()).all()
        and (disk["vec_id"].to_numpy() == mem["vec_id"].to_numpy()).all()
    )
    exact = ann_stages.brute_force_topk(emb, q_ids, qm, k=k).to_pandas()
    recalls = []
    for q in q_ids:
        e = set(exact.loc[exact["q_id"] == q, "vec_id"])
        a = set(disk.loc[disk["q_id"] == q, "vec_id"])
        recalls.append(len(e & a) / max(len(e), 1))
    mean_pct = 100.0 * float(np.mean(recalls)) if recalls else 0.0
    from pygeoops_ray.stages.ann import hnsw_shard_count

    n_shards = hnsw_shard_count(n, 4)
    return pa.Table.from_pydict(
        {
            "n_queries": pa.array([len(q_ids)], pa.int64()),
            "k": pa.array([k], pa.int64()),
            "recall_ok": pa.array([int(mean_pct >= 60)], pa.int64()),
            "loaded_eq": pa.array([loaded_eq], pa.int64()),
            "files_ok": pa.array(
                [int(n_read == n_total == n_shards)], pa.int64()
            ),
        }
    )
