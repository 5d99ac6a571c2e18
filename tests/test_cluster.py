"""Distributed integer k-means (stages/cluster.py) vs a single-process
reference implementation of the same exact algorithm."""

import numpy as np
import pyarrow as pa
import pytest


def _reference_kmeans(ids, emb, k, iters):
    """Plain-numpy replay of the exact integer algorithm."""
    q = np.floor(emb * 100).astype(np.int64) + 128
    order = np.argsort(ids, kind="stable")
    cents = q[order[:k]].copy()

    def nearest(qm, c):
        d2 = (
            (qm * qm).sum(1)[:, None] - 2 * (qm @ c.T) + (c * c).sum(1)[None, :]
        )
        a = d2.argmin(1)
        return a, d2[np.arange(len(qm)), a]

    for _ in range(iters):
        a, _ = nearest(q, cents)
        new = cents.copy()
        for j in range(k):
            m = a == j
            if m.sum():
                new[j] = q[m].sum(0) // int(m.sum())
        cents = new
    a, d2 = nearest(q, cents)
    return a, d2


@pytest.mark.usefixtures("ray_session")
def test_kmeans_matches_reference():
    import ray.data as rd

    from pygeoops_ray.stages.cluster import kmeans_assign

    rng = np.random.default_rng(7)
    n, d, k = 120, 16, 5
    # three separated blobs + noise so clusters actually move across iters
    emb = np.concatenate(
        [
            rng.normal(-0.3, 0.05, (40, d)),
            rng.normal(0.0, 0.05, (40, d)),
            rng.normal(0.3, 0.05, (40, d)),
        ]
    ).astype(np.float32)
    ids = rng.permutation(n).astype(np.int64)
    tab = pa.Table.from_pydict(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in emb], pa.list_(pa.float32())
            ),
        }
    )
    ds = rd.from_arrow(tab).repartition(6)  # multiple blocks → real partials
    out = (
        kmeans_assign(ds, k=k, iters=3)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )

    want_a, want_d = _reference_kmeans(ids, emb.astype(np.float64), k, 3)
    order = np.argsort(ids, kind="stable")
    got = out.set_index("vec_id")
    for pos in order:
        vid = ids[pos]
        assert got.loc[vid, "cluster"] == want_a[pos]
        assert got.loc[vid, "dist2"] == want_d[pos]
    # sanity: the blobs separate (≥3 distinct clusters survive)
    assert out["cluster"].nunique() >= 3


def _reference_semantic_pairs(ids, emb, k, iters, tau_num=1225, tau_den=10000):
    a, _ = _reference_kmeans(ids, emb, k, iters)
    qc = np.floor(emb * 100).astype(np.int64)
    pairs = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j] and a[i] == a[j]:
                dot = int(qc[i] @ qc[j])
                na2 = int(qc[i] @ qc[i])
                nb2 = int(qc[j] @ qc[j])
                if dot > 0 and dot * dot * tau_den >= tau_num * na2 * nb2:
                    pairs.add((int(ids[i]), int(ids[j])))
    return pairs


@pytest.mark.usefixtures("ray_session")
def test_semantic_dedup_pairs_matches_bruteforce():
    import ray.data as rd

    from pygeoops_ray.stages.cluster import semantic_dedup_pairs

    rng = np.random.default_rng(11)
    n, d, k = 90, 16, 4
    base = rng.normal(0.0, 0.3, (30, d))
    # near-dup trios: each base vector plus two jittered copies → real pairs
    emb = np.concatenate([base, base + rng.normal(0, 0.01, (30, d)),
                          base + rng.normal(0, 0.01, (30, d))]).astype(np.float32)
    ids = rng.permutation(n).astype(np.int64)
    tab = pa.Table.from_pydict(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([r.tolist() for r in emb], pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(tab).repartition(5)
    out = semantic_dedup_pairs(ds, k=k, iters=2, tau_num=9025, tau_den=10000).to_pandas()
    got = set(zip(out["a"].astype(int), out["b"].astype(int)))
    want = _reference_semantic_pairs(
        ids, emb.astype(np.float64), k, 2, tau_num=9025, tau_den=10000
    )
    assert got == want
    assert len(want) > 0  # the jittered copies must actually pair up


def _reference_pq(ids, emb, subspaces, k, iters):
    q = np.floor(emb * 100).astype(np.int64) + 128
    d = q.shape[1]
    w = d // subspaces
    order = np.argsort(ids, kind="stable")
    cents = [q[order[:k], s * w : (s + 1) * w].copy() for s in range(subspaces)]

    def nearest(qm, c):
        d2 = (qm * qm).sum(1)[:, None] - 2 * (qm @ c.T) + (c * c).sum(1)[None, :]
        a = d2.argmin(1)
        return a, d2[np.arange(len(qm)), a]

    for _ in range(iters):
        for s in range(subspaces):
            qs = q[:, s * w : (s + 1) * w]
            a, _ = nearest(qs, cents[s])
            new = cents[s].copy()
            for j in range(k):
                m = a == j
                if m.sum():
                    new[j] = qs[m].sum(0) // int(m.sum())
            cents[s] = new
    out = {}
    for s in range(subspaces):
        a, d2 = nearest(q[:, s * w : (s + 1) * w], cents[s])
        for pos in range(len(ids)):
            out[(int(ids[pos]), s)] = (int(a[pos]), int(d2[pos]))
    return out


@pytest.mark.usefixtures("ray_session")
def test_pq_codes_matches_reference():
    import ray.data as rd

    from pygeoops_ray.stages.cluster import pq_codes

    rng = np.random.default_rng(23)
    n, d, S, k = 100, 32, 4, 3
    emb = rng.normal(0.0, 0.3, (n, d)).astype(np.float32)
    ids = rng.permutation(n).astype(np.int64)
    tab = pa.Table.from_pydict(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([r.tolist() for r in emb], pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(tab).repartition(5)
    out = pq_codes(ds, subspaces=S, k=k, iters=2).to_pandas()
    assert len(out) == n * S
    want = _reference_pq(ids, emb.astype(np.float64), S, k, 2)
    for _, r in out.iterrows():
        assert (int(r["code"]), int(r["dist2"])) == want[(int(r["vec_id"]), int(r["sub"]))]


@pytest.mark.usefixtures("ray_session")
def test_pq_adc_recall_beats_chance():
    import ray.data as rd

    from pygeoops_ray.stages.ann import brute_force_topk
    from pygeoops_ray.stages.cluster import pq_adc_topk

    rng = np.random.default_rng(31)
    n, d = 400, 32
    emb = rng.normal(0.0, 0.3, (n, d)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    tab = pa.Table.from_pydict(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([r.tolist() for r in emb], pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(tab).repartition(4)
    q_ids = ids[:5]
    qm = emb[:5].astype(np.float64)
    exact = brute_force_topk(ds, q_ids, qm, k=10).to_pandas()
    approx = pq_adc_topk(ds, q_ids, qm, k=10, subspaces=8, kcent=16).to_pandas()
    assert set(approx.columns) == {"q_id", "vec_id", "rnk"}
    recs = []
    for q in q_ids:
        e = set(exact.loc[exact["q_id"] == q, "vec_id"])
        a = set(approx.loc[approx["q_id"] == q, "vec_id"])
        assert len(a) == 10
        recs.append(len(e & a) / 10)
    # the query vector itself is in the corpus: PQ must at least find it
    for q in q_ids:
        assert q in set(approx.loc[approx["q_id"] == q, "vec_id"])
    assert float(np.mean(recs)) >= 0.3  # chance is 10/400 = 2.5%


def test_ivf_append_layers_complete_and_resumable(ray_session, tmp_path):
    """Append layer: every delta vector lands in exactly one cell file; a
    rerun writes nothing (manifest resume); searching with nprobe = all
    cells over base+delta equals brute force over the full corpus."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pygeoops_ray.stages import ann
    from pygeoops_ray.state.manifest import CheckpointManifest

    rng = np.random.default_rng(9)
    n, d = 300, 8
    m = rng.normal(size=(n, d))
    ids = np.arange(n, dtype=np.int64)
    t = pa.Table.from_pydict(
        {"vec_id": ids, "embedding": [list(map(float, r)) for r in m]}
    )
    base = rd.from_arrow(t.filter(pa.array(ids % 5 != 0)))
    delta_tbl = t.filter(pa.array(ids % 5 == 0))
    out = str(tmp_path / "ivf")
    ann.build_ivf_disk_index(base, out, n_centroids=4, iters=4)
    ann.append_ivf_disk_index(rd.from_arrow(delta_tbl), out)
    drec = CheckpointManifest(str(tmp_path / "ivf" / "delta"), "ivf").completed()
    rows = sum(int(r["row_count"]) for r in drec.values())
    assert rows == len(delta_tbl)
    import os

    mtimes = {
        r["output_file"]: os.path.getmtime(r["output_file"]) for r in drec.values()
    }
    ann.append_ivf_disk_index(rd.from_arrow(delta_tbl), out)  # resume: no-op
    for f, mt in mtimes.items():
        assert os.path.getmtime(f) == mt
    # exhaustive probe == brute force over the FULL corpus
    q = m[:5]
    topk, stats = ann.ivf_disk_topk_layers(out, ids[:5], q, k=5, nprobe=4)
    exact = ann.brute_force_topk(
        rd.from_arrow(t), ids[:5], q, k=5
    ).to_pandas()
    got = topk.to_pandas()
    for qid in ids[:5]:
        e = set(exact.loc[exact["q_id"] == qid, "vec_id"])
        a = set(got.loc[got["q_id"] == qid, "vec_id"])
        assert e == a
    assert all(r == t_ for r, t_ in stats)  # nprobe=all: every file read


def test_hnsw_recall_and_determinism(ray_session):
    """Sharded HNSW: mean recall@10 well above the 60%% gate floor on the
    real table; identical neighbor lists on a rerun (md5-drawn levels, no
    RNG state); every query returns exactly k rows."""
    import numpy as np

    from pygeoops_ray.pipelines.common import _read
    from pygeoops_ray.pipelines.q_ann import _query_vectors
    from pygeoops_ray.stages import ann as ann_stages

    sf = "/root/testdata/sf0.001"
    q_ids, qm = _query_vectors(sf)
    emb = _read(sf, "embeddings", columns=["vec_id", "embedding"])
    exact = ann_stages.brute_force_topk(emb, q_ids, qm, k=10).to_pandas()
    ap = ann_stages.hnsw_topk(emb, q_ids, qm, k=10).to_pandas()
    assert (ap.groupby("q_id").size() == 10).all()
    recs = [
        len(set(exact[exact.q_id == q].vec_id) & set(ap[ap.q_id == q].vec_id)) / 10
        for q in q_ids
    ]
    assert np.mean(recs) >= 0.8
    ap2 = ann_stages.hnsw_topk(emb, q_ids, qm, k=10).to_pandas()
    a = ap.sort_values(["q_id", "vec_id"]).reset_index(drop=True)
    b = ap2.sort_values(["q_id", "vec_id"]).reset_index(drop=True)
    assert a[["q_id", "vec_id"]].equals(b[["q_id", "vec_id"]])


def test_hnsw_shard_ceiling_autoreshards(ray_session):
    """Round-5: the one-task-per-shard build has a SIZE ceiling
    (max_shard_rows) enforced by auto-resharding — an over-threshold corpus
    raises the shard count so no build task exceeds the ceiling, and the
    recall contract stays green across the finer sharding."""
    import numpy as np

    from pygeoops_ray.pipelines.common import _read, _table_rows
    from pygeoops_ray.pipelines.q_ann import _query_vectors
    from pygeoops_ray.stages import ann as ann_stages
    from pygeoops_ray.stages.ann import hnsw_shard_count

    # the rule itself
    assert hnsw_shard_count(100, 4, max_shard_rows=64_000) == 4
    assert hnsw_shard_count(1_000_000, 4, max_shard_rows=64_000) == 16
    assert hnsw_shard_count(0, 4) == 4
    try:
        hnsw_shard_count(10, 4, max_shard_rows=0)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass

    # integration: cap far below the corpus -> >4 shards actually build,
    # each build task holds <= max_shard_rows rows, recall stays green
    sf = "/root/testdata/sf0.001"
    n = _table_rows(sf, "embeddings")
    cap = max(8, n // 10)  # forces >= 10 shards on any corpus size
    q_ids, qm = _query_vectors(sf)
    emb = _read(sf, "embeddings", columns=["vec_id", "embedding"])
    exact = ann_stages.brute_force_topk(emb, q_ids, qm, k=10).to_pandas()
    ap = ann_stages.hnsw_topk(
        emb, q_ids, qm, k=10, max_shard_rows=cap, n_rows_hint=n
    ).to_pandas()
    n_shards = hnsw_shard_count(n, 4, max_shard_rows=cap)
    assert n_shards > 4
    # shard membership is vec_id % n_shards: verify no shard exceeds cap
    import pandas as pd

    all_ids = pd.Series(np.arange(n, dtype=np.int64))
    counts = (all_ids % n_shards).value_counts()
    # every populated shard respects the ceiling
    assert counts.max() <= cap, (counts.max(), cap)
    assert (ap.groupby("q_id").size() == 10).all()
    recs = [
        len(set(exact[exact.q_id == q].vec_id) & set(ap[ap.q_id == q].vec_id)) / 10
        for q in q_ids
    ]
    assert np.mean(recs) >= 0.6, np.mean(recs)


def test_hnsw_disk_index_equals_memory_and_resumes(ray_session):
    """Round-5 HNSW at rest: the disk-loaded search returns EXACTLY the
    in-memory hnsw_topk neighbor lists (serialized neighbor order is part
    of the format), and a crashed build (one shard file deleted) resumes
    by rebuilding ONLY the missing shard, leaving completed files
    untouched and results identical."""
    import glob
    import os
    import shutil

    from pygeoops_ray.pipelines.common import _read, _table_rows
    from pygeoops_ray.pipelines.q_ann import _query_vectors
    from pygeoops_ray.stages import ann as ann_stages

    sf = "/root/testdata/sf0.001"
    n = _table_rows(sf, "embeddings")
    q_ids, qm = _query_vectors(sf)
    emb = _read(sf, "embeddings", columns=["vec_id", "embedding"])
    d = "/tmp/pygeoops_ray_test/hnsw_disk_idx"
    shutil.rmtree(d, ignore_errors=True)
    n_shards = ann_stages.build_hnsw_disk_index(emb, d, n_rows_hint=n)
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))
    assert len(files) == n_shards

    disk, n_read, n_total = ann_stages.hnsw_disk_topk(d, q_ids, qm, k=10)
    disk = disk.to_pandas().sort_values(["q_id", "vec_id"]).reset_index(drop=True)
    mem = (
        ann_stages.hnsw_topk(emb, q_ids, qm, k=10, n_rows_hint=n)
        .to_pandas()
        .sort_values(["q_id", "vec_id"])
        .reset_index(drop=True)
    )
    assert n_read == n_total == n_shards
    assert (disk["q_id"].to_numpy() == mem["q_id"].to_numpy()).all()
    assert (disk["vec_id"].to_numpy() == mem["vec_id"].to_numpy()).all()
    assert np.allclose(disk["sim"].to_numpy(), mem["sim"].to_numpy())

    # crash-resume: delete one shard file; rebuild must rewrite ONLY it
    victim = files[1]
    keep_mtimes = {f: os.path.getmtime(f) for f in files if f != victim}
    os.remove(victim)
    ann_stages.build_hnsw_disk_index(emb, d, n_rows_hint=n)
    for f, mt in keep_mtimes.items():
        assert os.path.getmtime(f) == mt, f
    assert os.path.exists(victim)
    disk2, _, _ = ann_stages.hnsw_disk_topk(d, q_ids, qm, k=10)
    disk2 = disk2.to_pandas().sort_values(["q_id", "vec_id"]).reset_index(drop=True)
    assert (disk2["vec_id"].to_numpy() == disk["vec_id"].to_numpy()).all()
