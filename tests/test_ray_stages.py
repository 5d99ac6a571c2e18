"""Ray Data stage tests: spatial join, kNN, dedup, manifest resume.

Uses the session-scoped ray fixture (conftest.py) — one Ray session per run.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return rd


SF = "/root/testdata/sf0.001"


def test_pip_join_strategies_agree(rd):
    from pygeoops_ray.stages import spatial as sp

    imgs = rd.read_parquet(f"{SF}/part.parquet", columns=["p_partkey"]).map_batches(
        sp.image_meta_from_part, batch_format="pyarrow"
    )
    pts = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id"]).map_batches(
        sp.points_from_events, batch_format="pyarrow"
    )

    def result_set(strategy):
        # num_partitions=2: the hashjoin's aggregator actors must fit the
        # 4-cpu test session alongside the map tasks (else they deadlock)
        out = sp.pip_join_rects_points(
            imgs, pts, strategy=strategy, num_partitions=2
        ).to_pandas()
        return set(zip(out["i"], out["event_id"]))

    a = result_set("groupby")
    b = result_set("broadcast")
    c = result_set("hashjoin")
    assert a == b == c
    assert len(a) > 0


def test_covering_expansion_vectorized():
    from pygeoops_ray.stages.spatial import _covering_expansion

    minx = np.array([0.0, 100.0, 250.0])
    miny = np.array([0.0, 0.0, 250.0])
    maxx = np.array([50.0, 300.0, 520.0])  # 1 tile, 2 tiles, 3x2 tiles
    maxy = np.array([50.0, 50.0, 300.0])
    ri, tx, ty = _covering_expansion(minx, miny, maxx, maxy, 256.0)
    assert list(ri) == [0, 1, 1, 2, 2, 2, 2, 2, 2]
    assert list(zip(tx[3:], ty[3:])) == [(0, 0), (0, 1), (1, 0), (1, 1), (2, 0), (2, 1)]
    # exactly-aligned max edge does not spill
    ri2, tx2, ty2 = _covering_expansion(
        np.array([0.0]), np.array([0.0]), np.array([256.0]), np.array([256.0]), 256.0
    )
    assert len(ri2) == 1 and tx2[0] == 0 and ty2[0] == 0


def test_knn_matches_bruteforce(rd):
    from pygeoops_ray.stages import spatial as sp

    pts_df = (
        rd.read_parquet(f"{SF}/events.parquet", columns=["event_id"])
        .map_batches(sp.points_from_events, batch_format="pyarrow")
        .to_pandas()
    )
    q_ids = np.array([0, 1, 2], dtype=np.int64)
    qx = np.array([100.0, 5000.0, 100000.0])
    qy = np.array([100.0, 200.0, 100.0])
    pts = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id"]).map_batches(
        sp.points_from_events, batch_format="pyarrow"
    )
    got = sp.knn_points(pts, q_ids, qx, qy, k=3).to_pandas()
    # brute force oracle in pandas
    for qi in range(3):
        d2 = (pts_df.px - qx[qi]) ** 2 + (pts_df.py - qy[qi]) ** 2
        want = (
            pts_df.assign(d2=d2)
            .sort_values(["d2", "event_id"])
            .head(3)["event_id"]
            .tolist()
        )
        sub = got[got.q_id == q_ids[qi]].sort_values("rnk")
        assert sub["event_id"].tolist() == want


def test_exact_dedup(rd):
    from pygeoops_ray.stages.dedup import exact_dedup_min

    ds = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "event_type", "event_id"])
    out = exact_dedup_min(ds, ["user_id", "event_type"], "event_id").to_pandas()
    df = pd.read_parquet(f"{SF}/events.parquet")
    want = df.groupby(["user_id", "event_type"], as_index=False)["event_id"].min()
    got = out.sort_values(["user_id", "event_type"]).reset_index(drop=True)
    want = want.sort_values(["user_id", "event_type"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["user_id", "event_type", "event_id"]], want, check_dtype=False
    )


def test_ivf_disk_index(rd, tmp_path):
    """Persisted IVF: probed-partition reads return the same neighbors as
    the in-stream IVF on identical centroids, and the query provably reads
    a strict subset of the index files."""
    from pygeoops_ray.pipelines.queries import _query_vectors
    from pygeoops_ray.stages import ann

    out_dir = str(tmp_path / "ivf")
    emb = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    cent = ann.build_ivf_disk_index(emb, out_dir)
    assert os.path.exists(os.path.join(out_dir, "centroids.npy"))

    q_ids, qm = _query_vectors(SF)
    disk, n_read, n_total = ann.ivf_disk_topk(out_dir, q_ids, qm, k=10)
    assert 0 < n_read < n_total  # I/O pruning actually happened

    # same probe set + same centroids → same neighbor ids as the in-stream
    # scorer over the full table
    qn = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    probe = np.argsort(-(qn @ cent.T), axis=1)[:, :4]
    stream = ann._probed_topk(emb, q_ids.astype(np.int64), qn, cent, probe, 10).to_pandas()
    d = disk.to_pandas().sort_values(["q_id", "rnk"]).reset_index(drop=True)
    s = stream.sort_values(["q_id", "rnk"]).reset_index(drop=True)
    assert d["vec_id"].tolist() == s["vec_id"].tolist()

    # rebuild on the same directory is a no-op resume (manifest skip)
    from pygeoops_ray.state.manifest import CheckpointManifest

    before = CheckpointManifest(out_dir, "ivf").completed()
    ann.build_ivf_disk_index(emb, out_dir)
    after = CheckpointManifest(out_dir, "ivf").completed()
    assert set(after) == set(before)


def test_lsh_topk_recall(rd):
    from pygeoops_ray.pipelines.queries import _query_vectors, q_ann_lsh, q_ann_topk
    from pygeoops_ray.stages import ann

    q_ids, qm = _query_vectors(SF)
    exact = q_ann_topk(SF).to_pandas()
    emb = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    approx = ann.lsh_topk(emb, q_ids, qm, k=10).to_pandas()
    # recall of LSH vs exact top-10 should be non-trivial (> 0.2)
    recall = []
    for q in exact.q_id.unique():
        e = set(exact[exact.q_id == q].vec_id)
        a = set(approx[approx.q_id == q].vec_id)
        recall.append(len(e & a) / max(len(e), 1))
    assert np.mean(recall) > 0.2
    # the driver-facing summary asserts the 30% mean-recall contract
    summary = q_ann_lsh(SF).to_pandas()
    assert summary.to_dict("records") == [{"n_queries": 8, "k": 10, "recall_ok": 1}]


def test_profile_numeric_nulls(rd):
    """Profiler stats are exact on a null-bearing column (the driver tables
    are null-free, so the null path needs its own corpus)."""
    from pygeoops_ray.stages.profile import profile_numeric

    n = 10_000
    a = np.arange(n, dtype=np.float64)
    a[a % 13 == 0] = np.nan
    b = (np.arange(n) % 250).astype(np.float64)
    tab = pa.Table.from_pydict({"a": pa.array(a), "b": pa.array(b)})
    out = (
        profile_numeric(rd.from_arrow(tab).repartition(6), ["a", "b"])
        .to_pandas()
        .set_index("column")
    )
    n_nan = int(np.isnan(a).sum())
    assert out.loc["a", "n"] == n - n_nan and out.loc["a", "n_null"] == n_nan
    assert out.loc["a", "min_v"] == 1.0 and out.loc["a", "max_v"] == n - 1
    assert out.loc["a", "n_distinct"] == n - n_nan
    assert out.loc["b", "n_distinct"] == 250 and out.loc["b", "n_null"] == 0


def test_read_pruned_randomized_ranges(rd, tmp_path):
    """Seeded-random range predicates (two-sided, one-sided, empty, full)
    all return exactly the brute-force filter result."""
    from pygeoops_ray.state.manifest import read_pruned, write_partitioned

    out_dir = str(tmp_path / "sink")
    n = 3000
    rng = np.random.default_rng(7)
    x = rng.uniform(0, 1000, n).round(3)
    y = rng.uniform(0, 100, n).round(3)
    rid = np.arange(n, dtype=np.int64)
    cell = (x.astype(np.int64) // 100) + 16 * (y.astype(np.int64) // 25)
    tab = pa.Table.from_pydict(
        {"rid": pa.array(rid), "x": pa.array(x), "y": pa.array(y), "cell": pa.array(cell)}
    )
    write_partitioned(rd.from_arrow(tab), out_dir, "cell", stage="p", stats_cols=["x", "y"])

    for _ in range(12):
        lo_x = float(rng.uniform(-100, 1100)) if rng.random() < 0.8 else None
        hi_x = float(rng.uniform(-100, 1100)) if rng.random() < 0.8 else None
        lo_y = float(rng.uniform(-10, 110)) if rng.random() < 0.5 else None
        ranges = {"x": (lo_x, hi_x), "y": (lo_y, None)}
        got = read_pruned(out_dir, ranges, stage="p")
        mask = np.ones(n, dtype=bool)
        if lo_x is not None:
            mask &= x >= lo_x
        if hi_x is not None:
            mask &= x < hi_x
        if lo_y is not None:
            mask &= y >= lo_y
        want = sorted(rid[mask])
        if not want:
            assert got.count() == 0
        else:
            assert sorted(got.to_pandas().rid) == want


def test_quarantine_split(rd, tmp_path):
    """One-pass dead-letter split: flagged-False rows land in the side sink,
    good rows flow on, and read_quarantine dedups task-retry duplicates."""
    import glob
    import shutil

    from pygeoops_ray.stages.quarantine import quarantine_by_flag, read_quarantine

    qdir = str(tmp_path / "dlq")
    n = 5000
    tab = pa.Table.from_pydict(
        {
            "rid": pa.array(np.arange(n, dtype=np.int64)),
            "ok": pa.array(np.arange(n) % 7 != 0),
            "payload": pa.array([f"p{i}" for i in range(n)]),
        }
    )
    good = quarantine_by_flag(
        rd.from_arrow(tab).repartition(8), "ok", qdir
    ).to_pandas()
    assert sorted(good.rid) == sorted(np.arange(n)[np.arange(n) % 7 != 0])
    assert "ok" not in good.columns  # flag consumed by default

    # simulate a retried task: duplicate one sink file under a new name
    f = sorted(glob.glob(f"{qdir}/q-*.parquet"))[0]
    shutil.copy(f, f.replace("q-", "q-retry"))
    quar = read_quarantine(qdir, "rid").to_pandas()
    assert sorted(quar.rid) == sorted(np.arange(n)[np.arange(n) % 7 == 0])
    assert quar.rid.is_unique  # retry duplicates deduped on read
    assert list(quar.columns) == ["rid", "ok", "payload"]  # full row preserved


def test_read_quarantine_worstcase_duplication(rd, tmp_path):
    """Every key duplicated in EVERY file (40x): keyed dedup must still emit
    each key exactly once — pins Ray's range-sort tie semantics (equal keys
    land in one output block) that the final per-block dedup relies on."""
    import pyarrow.parquet as pq2

    from pygeoops_ray.stages.quarantine import read_quarantine

    d = str(tmp_path / "dlq")
    os.makedirs(d)
    keys = np.arange(500, dtype=np.int64)
    for f in range(40):
        t = pa.Table.from_pydict(
            {"rid": pa.array(keys), "src": pa.array(np.full(500, f, np.int64))}
        )
        pq2.write_table(t, os.path.join(d, f"q-{f:03d}.parquet"))
    out = read_quarantine(d, "rid").to_pandas()
    assert len(out) == 500 and out.rid.is_unique
    assert sorted(out.rid) == list(range(500))


def test_map_worker_death_retried(rd, tmp_path):
    """Streaming execution survives a worker death mid-pipeline.

    One map task hard-kills its worker process (os._exit — the same signal
    Ray sees on an OOM-killed or lost node); Ray retries the task on a fresh
    worker and the dataset completes with every row intact. Together with
    test_manifest_resume (file-level resume across DRIVER restarts) this
    covers both fault domains of the north rule's resumability requirement.
    """
    flag = tmp_path / "died_once"

    def maybe_die(batch: pa.Table) -> pa.Table:
        # exactly one task dies, once (flag lands on shared /tmp before exit)
        if not flag.exists():
            flag.write_text("x")
            os._exit(1)
        return batch

    ds = rd.range(100_000, override_num_blocks=8).map_batches(
        maybe_die, batch_format="pyarrow"
    )
    tot = ds.sum("id")
    assert flag.exists()  # the kill really happened
    assert tot == 99_999 * 100_000 // 2  # and no rows were lost or duplicated


def test_manifest_resume(rd, tmp_path):
    from pygeoops_ray.state.manifest import CheckpointManifest, read_output, write_partitioned

    out_dir = str(tmp_path / "out")
    ds = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "user_id"])

    def bucketize(batch: pa.Table) -> pa.Table:
        b = batch.append_column(
            "bucket", pa.array(batch["user_id"].to_numpy() % 4, pa.int64())
        )
        return b

    ds = ds.map_batches(bucketize, batch_format="pyarrow")
    rep1 = write_partitioned(ds, out_dir, "bucket", stage="test")
    assert (~rep1.skipped).sum() == 4
    full = read_output(out_dir).to_pandas()

    # simulate a partial failure: delete one partition file + its manifest row
    os.remove(os.path.join(out_dir, "part-1.parquet"))
    man = CheckpointManifest(out_dir, "test")
    recs = [r for r in open(man.path)]
    with open(man.path, "w") as f:
        for r in recs:
            if '"partition_id": "1"' not in r:
                f.write(r)

    rep2 = write_partitioned(ds, out_dir, "bucket", stage="test")
    assert (~rep2.skipped).sum() == 1  # only the missing partition recomputed
    assert rep2[~rep2.skipped].partition_id.tolist() == ["1"]
    resumed = read_output(out_dir).to_pandas()
    # identical output row-set after resume (FIXTURES.md §6 invariant)
    a = full.sort_values(["event_id"]).reset_index(drop=True)
    b = resumed.sort_values(["event_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # lineage rows carry counts + checksums
    done = CheckpointManifest(out_dir, "test").completed()
    assert set(done) == {"0", "1", "2", "3"}
    assert all(rec["row_count"] > 0 and rec["checksum"] >= 0 for rec in done.values())


def test_read_pruned_bbox(rd, tmp_path):
    """Manifest range stats prune whole partition files; the pushed-down
    filter prunes rows inside kept files; result == brute-force filter."""
    from pygeoops_ray.state.manifest import CheckpointManifest, read_pruned, write_partitioned

    out_dir = str(tmp_path / "sink")
    n = 4000
    eid = np.arange(n, dtype=np.int64)
    px = (eid % 40).astype(np.float64) * 100.0 + (eid * 7 % 100).astype(np.float64)
    py = (eid // 40 % 5).astype(np.float64) * 100.0 + (eid * 13 % 100).astype(np.float64)
    gcell = (px.astype(np.int64) // 400) + 1024 * (py.astype(np.int64) // 400)
    tab = pa.Table.from_pydict(
        {"event_id": pa.array(eid), "px": pa.array(px), "py": pa.array(py),
         "gcell": pa.array(gcell)}
    )
    write_partitioned(rd.from_arrow(tab), out_dir, "gcell", stage="pts", stats_cols=["px", "py"])
    done = CheckpointManifest(out_dir, "pts").completed()
    n_parts = len(done)
    assert n_parts == len(np.unique(gcell))
    assert all("px" in rec["stats"] and "py" in rec["stats"] for rec in done.values())

    # bbox: x in [800, 2050) — cuts INTO the x-cell starting at 2000 —, y in [0, 400)
    ranges = {"px": (800.0, 2050.0), "py": (0.0, 400.0)}
    got = read_pruned(out_dir, ranges, stage="pts").to_pandas()
    mask = (px >= 800) & (px < 2050) & (py >= 0) & (py < 400)
    assert sorted(got.event_id) == sorted(eid[mask])

    # file-level pruning really happened: only partitions intersecting the bbox
    kept = [
        rec for rec in done.values()
        if rec["stats"]["px"][1] >= 800 and rec["stats"]["px"][0] < 2050
        and rec["stats"]["py"][1] >= 0 and rec["stats"]["py"][0] < 400
    ]
    assert len(kept) < n_parts / 3  # the bbox covers well under a third of cells
    # and the row filter worked inside the partially-covered x-cell at 2000
    assert ((got.px >= 2000) & (got.px < 2050)).any()
    assert not (got.px >= 2050).any()

    # empty-intersection bbox: zero rows, dataset-level schema preserved
    empty_ds = read_pruned(out_dir, {"px": (1e9, 2e9)}, stage="pts")
    assert empty_ds.count() == 0
    assert "event_id" in empty_ds.schema().names

    # one-sided ranges (the extent-intersection building block): px >= 3000
    hi_only = read_pruned(out_dir, {"px": (3000.0, None)}, stage="pts").to_pandas()
    assert sorted(hi_only.event_id) == sorted(eid[px >= 3000])
    lo_only = read_pruned(out_dir, {"px": (None, 500.0)}, stage="pts").to_pandas()
    assert sorted(lo_only.event_id) == sorted(eid[px < 500])


def test_decode_validate_invariants(rd):
    from pygeoops_ray.pipelines.flagship import DecodeValidate
    from pygeoops_ray.table import images as I

    tab = I.generate_images_table(300, small=True)
    out = DecodeValidate()(tab)
    assert out["decode_ok"].to_numpy().all()
    # real per-row PSNR vs the regenerated source pattern: lossless raw0 is
    # exact (inf), lossy qz1 must satisfy the >=40 dB invariant (is >=46)
    psnr = out["psnr_db"].to_numpy()
    fmts = np.array(out["fmt"].to_pylist())
    assert np.isinf(psnr[fmts == "raw0"]).all()
    assert (psnr[fmts == "qz1"] >= 40.0).all()
    assert (psnr[fmts == "qz1"] < np.inf).all()
    # corrupt one payload → flagged, not crashed
    bad = tab.set_column(1, "bytes", pa.array([b"junk"] + tab["bytes"].to_pylist()[1:], pa.binary()))
    out_bad = DecodeValidate()(bad)
    ok = out_bad["decode_ok"].to_numpy()
    assert not ok[0] and ok[1:].all()


def test_image_table_determinism():
    from pygeoops_ray.table import images as I

    a = I.generate_images_for_ordinals([5, 6, 7], small=True)
    b = I.generate_images_for_ordinals(np.array([5, 6, 7]), small=True)
    assert a.equals(b)
    # order-free: generating 0..9 at once == concatenating two halves
    whole = I.generate_images_for_ordinals(range(10), small=True)
    parts = pa.concat_tables(
        [I.generate_images_for_ordinals(range(5), small=True),
         I.generate_images_for_ordinals(range(5, 10), small=True)]
    )
    assert whole.equals(parts)
    # dup fixture: ordinal 101 duplicates pixels of 100
    t = I.generate_images_for_ordinals([100, 101], small=True)
    assert t["phash"][0].as_py() == t["phash"][1].as_py()


def test_pip_join_salted_identical(rd):
    from pygeoops_ray.stages import spatial as sp

    imgs = rd.read_parquet(f"{SF}/part.parquet", columns=["p_partkey"]).map_batches(
        sp.image_meta_from_part, batch_format="pyarrow"
    )
    pts = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id"]).map_batches(
        sp.points_from_events, batch_format="pyarrow"
    )
    base = sp.pip_join_rects_points(imgs, pts).to_pandas()
    # force every bucket hot so the salting path fully engages
    salted = sp.pip_join_rects_points(
        imgs, pts, salt_hot=True, hot_threshold=1, salt_factor=4
    ).to_pandas()
    assert set(zip(base.i, base.event_id)) == set(zip(salted.i, salted.event_id))
    assert len(base) > 0


def test_multimodal_resize_features(rd):
    from pygeoops_ray.stages.multimodal import FeatureStage, FrameSampleStage, ResizeStage
    from pygeoops_ray.table import images as I

    tab = I.generate_images_table(50, small=True)
    resized = ResizeStage(16, 16)(tab)
    assert resized["w"].to_numpy().tolist() == [16] * 50
    # resized payloads still decode with the engine codec
    pix = I.decode_image(resized["bytes"][0].as_py())
    assert pix.shape == (16, 16, 3)

    feats = FeatureStage(grid=4)(tab)
    col = feats["features"]
    assert len(col[0].as_py()) == 6 + 16
    vals = np.array(col[0].as_py())
    assert np.all((vals >= 0) & (vals <= 1))

    # actor-pool plumbing through Ray Data
    ds = rd.from_arrow(tab).map_batches(
        ResizeStage, fn_constructor_args=(8, 8), batch_format="pyarrow", concurrency=2
    )
    out = ds.to_pandas()
    assert (out["w"] == 8).all()

    # stubbed video stage raises the documented contract error
    vid = tab.set_column(4, "fmt", pa.array(["video/x"] * 50, pa.string()))
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        FrameSampleStage()(vid)


def test_distributed_difference(rd):
    from pygeoops_ray.geo import geom as g
    from pygeoops_ray.geo.difference import difference_all_tiled
    from pygeoops_ray.stages.geo_batch import distributed_difference

    big = g.box(0, 0, 100, 100)
    # force real subdivision: the box has 5 coords, so lower the threshold via
    # a denser ring
    import numpy as np

    ring = []
    for i in range(101):
        ring.append((i, 0.0))
    for i in range(101):
        ring.append((100.0, i))
    ring += [(0.0, 100.0)]
    dense = g.Polygon(np.array(ring))
    subs = [g.box(i, i, i + 8, i + 8) for i in range(0, 90, 10)]
    local = difference_all_tiled(dense, subs, subdivide_coords=60)
    dist = distributed_difference(dense, subs, subdivide_coords=60)
    assert dist.area == pytest.approx(local.area, rel=1e-9)
    assert dist.area == pytest.approx(dense.area - sum(s.area for s in subs), rel=1e-9)


def test_distributed_difference_table_multi_source(rd):
    """Table form: many subjects, shared subtrahends, grouped union merge —
    one output row per subject, each equal to the local difference_all."""
    import numpy as np
    import pyarrow as pa

    from pygeoops_ray.geo import geom as g
    from pygeoops_ray.geo import wkb
    from pygeoops_ray.geo.difference import difference_all
    from pygeoops_ray.stages.geo_batch import distributed_difference_table

    def dense_rect(w, h):
        ring = [(float(x), 0.0) for x in range(w)]
        ring += [(float(w), float(y)) for y in range(h)]
        ring += [(float(x), float(h)) for x in range(w, 0, -1)]
        ring += [(0.0, float(y)) for y in range(h, 0, -1)]
        ring.append((0.0, 0.0))
        return g.Polygon(np.array(ring))

    subjects = {k: dense_rect(30, 10 + k) for k in range(6)}
    subs = [g.box(3 * i + 1, 1, 3 * i + 2, 3) for i in range(5)]
    tab = pa.Table.from_pydict(
        {
            "source_id": pa.array(list(subjects), pa.int64()),
            "geom_wkb": pa.array([wkb.dumps(p) for p in subjects.values()], pa.binary()),
        }
    )
    out = (
        distributed_difference_table(
            rd.from_arrow(tab), subs, subdivide_coords=30, concurrency=(1, 2)
        )
        .to_pandas()
        .set_index("source_id")
    )
    assert len(out) == len(subjects)
    for k, subj in subjects.items():
        got = wkb.loads(out.loc[k, "diff_wkb"])
        want = difference_all(subj, subs)
        assert got.area == pytest.approx(want.area, rel=1e-9)
        polys = got.geoms if got.geom_type == "MultiPolygon" else [got]
        want_polys = want.geoms if want.geom_type == "MultiPolygon" else [want]
        assert sum(len(p.holes) for p in polys) == sum(
            len(p.holes) for p in want_polys
        )


def test_lang_id_classifier():
    import pyarrow as pa2

    from pygeoops_ray.stages.text import LangId

    samples = {
        "en": "the cat and the dog sat in a house for it is warm",
        "de": "der hund und die katze sind nicht in das haus zu gehen",
        "fr": "le chien et la maison est dans les champs pour une heure",
        "es": "el perro y la casa es una cosa para los que quieren",
        "zh": "这是一个测试 房子 和 猫",
    }
    batch = pa2.Table.from_pydict(
        {"doc_id": list(range(len(samples))), "text": list(samples.values())}
    )
    preds = LangId()(batch)["lang_pred"].to_pylist()
    assert preds == list(samples.keys())


def test_ivf_topk_recall(rd):
    from pygeoops_ray.pipelines.queries import _query_vectors, q_ann_ivf, q_ann_topk
    from pygeoops_ray.stages import ann

    q_ids, qm = _query_vectors(SF)
    exact = q_ann_topk(SF).to_pandas()
    emb = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    approx = ann.ivf_topk(emb, q_ids, qm, k=10).to_pandas()
    recall = []
    for q in exact.q_id.unique():
        e = set(exact[exact.q_id == q].vec_id)
        a = set(approx[approx.q_id == q].vec_id)
        recall.append(len(e & a) / max(len(e), 1))
    # IVF with nprobe=4/16 centroids should recover most of the exact top-10
    assert np.mean(recall) > 0.5
    summary = q_ann_ivf(SF).to_pandas()
    assert summary.to_dict("records") == [{"n_queries": 8, "k": 10, "recall_ok": 1}]


def test_flagship_write_resumable(rd, tmp_path):
    from pygeoops_ray.pipelines.flagship import flagship_write
    from pygeoops_ray.state.manifest import read_output

    out = str(tmp_path / "flagship_out")
    rep1 = flagship_write(SF, out, n_images=1000, ordinals_per_bucket=250)
    assert (~rep1.skipped).sum() >= 1
    first = read_output(out).to_pandas().sort_values("image_id").reset_index(drop=True)
    # rerun: everything already in the manifest → all skipped, identical output
    rep2 = flagship_write(SF, out, n_images=1000, ordinals_per_bucket=250)
    assert rep2.skipped.all()
    again = read_output(out).to_pandas().sort_values("image_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(first, again)


def _brute_jaccard_pairs(texts_by_id, t):
    """All-pairs exact word-3-shingle Jaccard (string sets, no hashing)."""
    def sset(text):
        w = text.split()
        return set(tuple(w[i : i + 3]) for i in range(len(w) - 2))

    S = {i: sset(x) for i, x in texts_by_id.items() if len(x.split()) >= 3}
    out = set()
    ids = sorted(S)
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            inter = len(S[ids[a]] & S[ids[b]])
            union = len(S[ids[a]]) + len(S[ids[b]]) - inter
            if union and inter / union >= t:
                out.add((ids[a], ids[b]))
    return out


def test_exact_jaccard_pairs_matches_bruteforce(rd):
    """Prefix-filter join == brute force: guaranteed recall, exact verify."""
    from pygeoops_ray.stages.dedup import exact_jaccard_pairs

    rng = np.random.RandomState(3)
    vocab = np.array("alpha beta gamma delta eps zeta eta theta iota kappa".split())
    texts = {}
    base = {}
    for i in range(60):
        words = list(rng.choice(vocab, size=rng.randint(8, 30)))
        texts[i] = " ".join(words)
        base[i] = words
    # inject near-dups: copy with one word changed
    for j, src in [(60, 5), (61, 17), (62, 30)]:
        w = list(base[src])
        w[2] = "changed"
        texts[j] = " ".join(w)
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": list(texts), "text": [texts[i] for i in texts]})
    ).repartition(4)
    got = exact_jaccard_pairs(ds, jaccard_threshold=0.5).to_pandas()
    got_pairs = set(zip(got["doc_a"], got["doc_b"]))
    want = _brute_jaccard_pairs(texts, 0.5)
    assert got_pairs == want
    assert len(want) >= 3  # the injected near-dups are found


def test_simhash_matches_reference_and_pairs_bruteforce(rd):
    """SimHash value = md5-lower-64 bit votes; banded pairs == all-pairs."""
    import hashlib
    import struct

    from pygeoops_ray.stages.dedup import simhash_batch, simhash_pairs

    texts = {
        0: "the quick brown fox jumps over the lazy dog",
        1: "the quick brown fox jumps over the lazy cat",  # 1 word off
        2: "completely different words entirely here now",
        3: "the quick brown fox jumps over the lazy dog",  # identical to 0
    }

    def ref_simhash(text):
        votes = [0] * 64
        for w in text.split():
            h = struct.unpack("<Q", hashlib.md5(w.encode()).digest()[8:16])[0]
            for b in range(64):
                votes[b] += 1 if (h >> b) & 1 else -1
        return sum(1 << b for b in range(64) if votes[b] > 0)

    tab = pa.Table.from_pydict(
        {"doc_id": list(texts), "text": [texts[i] for i in texts]}
    )
    got = simhash_batch(tab).to_pandas().set_index("doc_id")["simhash"]
    for i, t in texts.items():
        assert int(got[i]) == ref_simhash(t), i

    # banded pair generation: identical docs (hamming 0) always found
    ds = rd.from_arrow(tab).repartition(2)
    pairs = simhash_pairs(ds, max_hamming=3).to_pandas()
    found = set(zip(pairs["doc_a"], pairs["doc_b"]))
    vals = {i: ref_simhash(t) for i, t in texts.items()}
    want = set()
    for a in sorted(texts):
        for b in sorted(texts):
            if a < b and bin(vals[a] ^ vals[b]).count("1") <= 3:
                want.add((a, b))
    assert found == want
    assert (0, 3) in found


def test_cosine_dup_pairs_exact(rd):
    """Broadcast-matmul pair scan == numpy all-pairs at the same threshold."""
    from pygeoops_ray.stages.ann import cosine_dup_pairs

    rng = np.random.RandomState(11)
    m = rng.randn(80, 16)
    m[40] = m[7] + 0.01 * rng.randn(16)  # near-dup pair
    m[55] = m[7] * 2.0  # same direction → cos 1
    ids = np.arange(80, dtype=np.int64)
    tab = pa.Table.from_pydict(
        {"vec_id": ids, "embedding": pa.array([r.tolist() for r in m.astype(np.float32)], pa.list_(pa.float32()))}
    )
    ds = rd.from_arrow(tab).repartition(3)
    got = cosine_dup_pairs(ds, ids, np.array([np.asarray(r, np.float64) for r in tab["embedding"].to_pylist()]), threshold=0.95).to_pandas()
    got_pairs = set(zip(got["vec_a"], got["vec_b"]))
    mf = np.array(tab["embedding"].to_pylist(), dtype=np.float64)
    mn = mf / np.linalg.norm(mf, axis=1, keepdims=True)
    sims = mn @ mn.T
    iu, ju = np.triu_indices(len(ids), k=1)
    want = set(zip(ids[iu[sims[iu, ju] >= 0.95]], ids[ju[sims[iu, ju] >= 0.95]]))
    assert got_pairs == want
    assert (7, 40) in want and (7, 55) in want


def test_range_join_matches_bruteforce(rd):
    """Bucketed searchsorted band join == O(n²) brute force on sf0.001 events."""
    import pandas as pd

    from pygeoops_ray.pipelines.queries import q_range_join

    got = q_range_join(SF).to_pandas().sort_values(["click_id", "purchase_id"]).reset_index(drop=True)

    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"])
    clicks = ev[ev.event_type == "click"]
    purch = ev[ev.event_type == "purchase"]
    window = pd.Timedelta(hours=6)
    rows = []
    for _, c in clicks.iterrows():
        m = purch[
            (purch.user_id == c.user_id) & (purch.ts > c.ts) & (purch.ts <= c.ts + window)
        ]
        rows.extend((c.event_id, p) for p in m.event_id)
    want = (
        pd.DataFrame(rows, columns=["click_id", "purchase_id"])
        .astype("int64")
        .sort_values(["click_id", "purchase_id"])
        .reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got[["click_id", "purchase_id"]], want)


def test_codec_packed_qz1_and_legacy_decode():
    """qz1 v2 bit-packing: roundtrip, legacy-Q1 parity, error bound, size."""
    import struct
    import zlib

    from pygeoops_ray.table import images as I

    rng = np.random.default_rng(11)
    for w, h in [(16, 16), (17, 19), (40, 36), (180, 140)]:
        pix = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        enc = I.encode_image(pix, "qz1")
        assert enc[:2] == b"Q2"
        dec = I.decode_image(enc)
        # decoded pixels are identical to the legacy byte-per-value layout
        legacy = (
            b"Q1"
            + struct.pack("<HH", w, h)
            + zlib.compress((pix >> 2).astype(np.uint8).tobytes(), 1)
        )
        assert np.array_equal(dec, I.decode_image(legacy))
        # 6-bit quantizer error bound -> PSNR >= 40 dB invariant
        assert np.abs(dec.astype(int) - pix.astype(int)).max() <= 2
        # raw0 roundtrip stays exact
        assert np.array_equal(I.decode_image(I.encode_image(pix, "raw0")), pix)
        # packed payload is smaller than the legacy stream
        assert len(enc) < len(legacy)


def test_batch_kernels_bit_identical():
    """mean_phash_batch / synth_pixels_batch == the scalar kernels, incl. the
    i%101 duplicate-ordinal rule's source indirection."""
    from pygeoops_ray.table import images as I

    for small in (True, False):
        by_dims = {}
        for i in range(260):
            src = i - 1 if (i % 101 == 0 and i > 0) else i
            w, h = I._row_dims(src, small)
            by_dims.setdefault((h, w), []).append(src)
        checked = 0
        for (h, w), srcs in by_dims.items():
            if len(srcs) < 2:
                continue
            batch = I.synth_pixels_batch(np.array(srcs), w, h)
            for j, s in enumerate(srcs):
                assert np.array_equal(batch[j], I.synth_pixels(s, w, h))
            ph = I.mean_phash_batch(batch)
            for j in range(len(srcs)):
                assert int(ph[j]) == I.mean_phash(batch[j])
            checked += len(srcs)
        assert checked >= 4  # the small profile cycles dims fast enough


def test_psnr_float32_guard_exact():
    """psnr's float32 fast path falls back to float64 exactly when the
    sum-of-squares could round (>= 2^24)."""
    from pygeoops_ray.table import images as I

    a = np.zeros((64, 64, 3), np.uint8)
    b = np.full((64, 64, 3), 255, np.uint8)  # total = 64*64*3*255^2 >> 2^24
    total = 64 * 64 * 3 * 255**2
    want = 10.0 * np.log10(255.0**2 / (total / (64 * 64 * 3)))
    assert I.psnr(a, b) == want
    assert I.psnr(a, a) == float("inf")
    # small-diff case stays on the float32 path and is exact too
    c = a.copy()
    c[0, 0, 0] = 2
    assert I.psnr(a, c) == 10.0 * np.log10(255.0**2 / (4 / (64 * 64 * 3)))


def test_winnow_fingerprints_match_textbook_reference():
    """winnow_batch == per-window textbook winnowing (min hash, rightmost
    tie-break, distinct selections), on synthetic docs with forced hash ties
    (repeated k-grams) and short-doc edge cases."""
    import pyarrow as pa

    from pygeoops_ray.stages.text import winnow_batch

    k, w = 8, 4
    docs = [
        "the quick brown fox jumps over the lazy dog",
        "aaaaaaaaaaaaaaaaaaa",          # all k-grams identical (max ties)
        "abcabcabcabcabcabcabc",        # period-3 repeats
        "short",                        # < k chars -> no fingerprints
        "exactly8!",                    # 9 chars -> 2 k-grams (< w window)
        "这是一个中文文档的测试文本内容重复重复重复",  # non-ASCII codepoints
        "x" * 7,                        # exactly k-1 -> none
    ]
    tab = pa.Table.from_pydict(
        {"doc_id": pa.array(range(len(docs)), pa.int64()), "text": docs}
    )
    got = winnow_batch(tab).to_pandas()

    def brute(doc_id, text):
        cps = [ord(c) % 1021 for c in text]
        n = len(cps) - k + 1
        if n < 1:
            return set()
        hs = [sum(cps[i + j] * 131 ** (k - 1 - j) for j in range(k)) for i in range(n)]
        keys = [(h % 2147483647) * 2097152 - (i + 1) for i, h in enumerate(hs)]
        sel = set()
        if n < w:
            sel.add(min(keys))
        else:
            for t in range(n - w + 1):
                sel.add(min(keys[t : t + w]))
        return {(doc_id, s) for s in sel}

    want = set()
    for d, t in enumerate(docs):
        want |= brute(d, t)
    have = set(zip(got["doc_id"], got["fp_key"]))
    assert have == want
    assert not any(got["doc_id"] == 3) and not any(got["doc_id"] == 6)


def test_hopping_window_matches_bruteforce(ray_session):
    """q_hopping_window (1h windows every 30min) vs per-row brute force."""
    import numpy as np
    import pandas as pd

    from pygeoops_ray.pipelines.queries import QUERIES

    got = (
        QUERIES["hopping_window"]("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values(["event_type", "wnd_start_us"])
        .reset_index(drop=True)
    )

    ev = pd.read_parquet(
        "/root/testdata/sf0.001/events.parquet", columns=["ts", "event_type", "value"]
    )
    ts = ev["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    val = np.floor(ev["value"].to_numpy() * 100.0).astype(np.int64)
    hop, size = 1_800_000_000, 3_600_000_000
    rows = []
    for off in range(size // hop):
        w = (ts // hop) * hop - off * hop
        rows.append(
            pd.DataFrame({"event_type": ev["event_type"], "wnd_start_us": w, "v": val})
        )
    exp = (
        pd.concat(rows)
        .groupby(["event_type", "wnd_start_us"], as_index=False)
        .agg(n=("v", "size"), sum_value_c=("v", "sum"))
        .sort_values(["event_type", "wnd_start_us"])
        .reset_index(drop=True)
    )
    # every event must land in exactly size/hop windows
    assert int(got["n"].sum()) == 2 * len(ev)
    pd.testing.assert_frame_equal(
        got[["event_type", "wnd_start_us", "n", "sum_value_c"]].astype(
            {"n": "int64", "sum_value_c": "int64"}
        ),
        exp.astype({"n": "int64", "sum_value_c": "int64"}),
    )


def test_quantized_digest_codec_invariant_phash():
    """Regression: ordinals 14846/14847 are an injected duplicate pair whose
    STORED phash differs (raw0 source vs qz1 duplicate — quantization flips
    a mean-threshold bit). phash_q (hash of the dequantized plane) and
    qdigest must both be identical across the codecs."""
    import numpy as np
    import pyarrow as pa

    from pygeoops_ray.stages.multimodal import quantized_digest_batch
    from pygeoops_ray.table import images as I

    t = I.generate_images_for_ordinals(np.array([14846, 14847]), small=True)
    assert t["fmt"][0].as_py() != t["fmt"][1].as_py()  # cross-codec pair
    assert t["phash"][0].as_py() != t["phash"][1].as_py()  # the trap
    out = quantized_digest_batch(t)
    assert out["qdigest"][0].as_py() == out["qdigest"][1].as_py()
    assert out["phash_q"][0].as_py() == out["phash_q"][1].as_py()


def test_stage_registry_builder(rd):
    """apply_stages: built-in composition equals the direct call, custom
    stages register and chain, and a missing input column fails at plan time
    (before any execution)."""
    import pyarrow as pa
    import pytest

    from pygeoops_ray.pipelines.queries import _read
    from pygeoops_ray.stages.registry import (
        Stage,
        apply_stages,
        get_stage,
        list_stages,
        register,
    )
    from pygeoops_ray.stages.text import token_count_batch

    assert "token_count" in list_stages()
    ds = _read(SF, "documents", columns=["doc_id", "text"])
    via_registry = apply_stages(ds, "token_count").to_pandas()
    direct = (
        _read(SF, "documents", columns=["doc_id", "text"])
        .map_batches(token_count_batch, batch_format="pyarrow")
        .to_pandas()
    )
    assert via_registry.sort_values("doc_id").reset_index(drop=True).equals(
        direct.sort_values("doc_id").reset_index(drop=True)
    )

    # custom stage chained AFTER a built-in, consuming its output column
    def double_tokens(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "n2": pc.multiply(batch["n_tokens"], pa.scalar(2, pa.int64())),
            }
        )

    register(Stage("double_tokens", double_tokens, ("n_tokens",), ("doc_id", "n2")), replace=True)
    out = apply_stages(
        _read(SF, "documents", columns=["doc_id", "text"]), "token_count", "double_tokens"
    ).to_pandas()
    assert (
        out.sort_values("doc_id")["n2"].to_numpy()
        == 2 * direct.sort_values("doc_id")["n_tokens"].to_numpy()
    ).all()

    # plan-time column validation: no execution happens for a bad pipeline
    with pytest.raises(ValueError, match="needs column"):
        apply_stages(_read(SF, "documents", columns=["doc_id", "text"]), "quantized_digest")
    with pytest.raises(KeyError, match="unknown stage"):
        get_stage("nope")

    # actor-pool stage through the same surface
    lang = apply_stages(
        _read(SF, "documents", columns=["doc_id", "text"]), "lang_id", concurrency=2
    ).to_pandas()
    assert set(lang.columns) == {"doc_id", "lang_pred"}
    assert len(lang) == len(direct)


def test_io_shim(rd, tmp_path):
    """read_table prunes columns, strips schema metadata, and round-trips
    through write_table; the lance seam raises a clear ImportError here."""
    import pytest

    from pygeoops_ray import io as pio

    ds = pio.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    tab = ds.take_batch(batch_format="pyarrow")
    assert tab.schema.names == ["doc_id"]
    assert tab.schema.metadata is None

    out = str(tmp_path / "roundtrip")
    pio.write_table(ds, out)
    back = pio.read_table(out)
    assert back.count() == ds.count()

    with pytest.raises(ImportError, match="lance"):
        pio.read_table("/tmp/whatever.lance")


def test_int_mean_hash_matches_naive_and_hamming_pairs_bruteforce(rd):
    """int_mean_hash == per-pixel integer reference (both codec decode paths);
    generic banded hamming_pairs == all-pairs brute force on image hashes."""
    from pygeoops_ray.stages.dedup import hamming_pairs
    from pygeoops_ray.table.images import int_mean_hash, synth_pixels_batch

    def naive(pix):
        h, w, _ = pix.shape
        p = pix.astype(int)
        tot = int(p.sum())
        v = 0
        for br in range(8):
            for bc in range(8):
                ys = [y for y in range(h) if (8 * y + 7) // h == br]
                xs = [x for x in range(w) if (8 * x + 7) // w == bc]
                s = sum(int(p[y, x, c]) for y in ys for x in xs for c in range(3))
                if s * (h * w) > tot * len(ys) * len(xs):
                    v |= 1 << (63 - (br * 8 + bc))
        return v - (1 << 64) if v >= (1 << 63) else v

    n = 300
    hashes = np.empty(n, dtype=np.int64)
    for i in range(n):
        src = i - 1 if (i % 101 == 0 and i > 0) else i
        w = 16 + (src * 37) % 49
        h = 16 + (src * 53) % 41
        pix = synth_pixels_batch(np.array([src]), w, h)[0]
        if i % 3 == 0:  # qz1 decode rule
            pix = ((pix >> 2) << 2) + 2
        hashes[i] = int_mean_hash(pix)
        if i < 12 or i in (101, 202):  # naive check incl. an injected dup
            assert hashes[i] == naive(pix), i

    tab = pa.table({"i": np.arange(n, dtype=np.int64), "ihash": hashes})
    got = hamming_pairs(
        rd.from_arrow(tab).repartition(3),
        id_col="i",
        hash_col="ihash",
        max_hamming=3,
        n_rows_hint=n,
        out_a="i_a",
        out_b="i_b",
    ).to_pandas()
    found = set(zip(got["i_a"], got["i_b"]))
    u = hashes.astype(np.uint64)
    x = u[:, None] ^ u[None, :]
    ham = np.unpackbits(x.view(np.uint8).reshape(n, n, 8), axis=2).sum(axis=2)
    want = {
        (a, b) for a in range(n) for b in range(a + 1, n) if ham[a, b] <= 3
    }
    assert found == want and len(want) > 0
    # hamming column is the exact popcount
    for _, r in got.iterrows():
        assert r["hamming"] == ham[int(r["i_a"]), int(r["i_b"])]
    assert (100, 101) in found  # injected duplicate pair, hamming 0


def test_pip_anti_join_complement_and_salted(rd):
    """anti == all points minus inner-join points; salted anti identical;
    anti with an empty rect side returns every point."""
    from pygeoops_ray.stages import spatial as sp

    imgs = rd.read_parquet(f"{SF}/part.parquet", columns=["p_partkey"]).map_batches(
        sp.image_meta_from_part, batch_format="pyarrow"
    )
    pts = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id"]).map_batches(
        sp.points_from_events, batch_format="pyarrow"
    )
    inner = sp.pip_join_rects_points(imgs, pts).to_pandas()
    anti = sp.pip_join_rects_points(imgs, pts, join_type="anti").to_pandas()
    all_pts = set(
        rd.read_parquet(f"{SF}/events.parquet", columns=["event_id"])
        .to_pandas()["event_id"]
    )
    assert set(anti.event_id) == all_pts - set(inner.event_id)
    assert len(anti) > 0 and set(anti.columns) == {"event_id"}
    salted = sp.pip_join_rects_points(
        imgs, pts, join_type="anti", salt_hot=True, hot_threshold=1, salt_factor=4
    ).to_pandas()
    assert set(salted.event_id) == set(anti.event_id)
    empty_rects = imgs.filter(lambda row: False)
    anti_all = sp.pip_join_rects_points(
        empty_rects, pts, join_type="anti"
    ).to_pandas()
    assert set(anti_all.event_id) == all_pts
    import pytest

    with pytest.raises(ValueError, match="anti"):
        sp.pip_join_rects_points(imgs, pts, join_type="anti", strategy="broadcast")


def test_top_terms_bruteforce(rd):
    """term_counts_batch + bucketed top-3 + DF join == per-doc brute force,
    incl. tf ties broken by term and duplicate terms across docs."""
    from collections import Counter

    from pygeoops_ray.stages.groupagg import _bucketed, grouped_count
    from pygeoops_ray.stages.text import term_counts_batch

    texts = {
        0: "b a a b c",          # tie a/b at tf=2 → a first
        1: "x x x y  z z",       # double space → empty dropped
        2: "a",                  # single term
        3: "c c b b a a d",      # 3-way tie
    }
    tab = pa.table({"doc_id": list(texts), "text": [texts[i] for i in texts]})
    tc = rd.from_arrow(tab).repartition(2).map_batches(
        term_counts_batch, batch_format="pyarrow"
    ).materialize()
    df_ds = grouped_count(tc, ["term"], "df")

    import pandas as pd

    def pre(df):
        return (
            df.sort_values(["doc_id", "tf", "term"], ascending=[True, False, True],
                           kind="mergesort")
            .groupby("doc_id", sort=False).head(3)
        )

    def reducer(df):
        out = pre(df)
        out = out.assign(rnk=out.groupby("doc_id", sort=False).cumcount() + 1)
        return out[["doc_id", "term", "tf", "rnk"]]

    top = _bucketed(tc, ["doc_id"], reducer, 2, pre=pre)
    got = top.join(df_ds, join_type="inner", num_partitions=2, on=("term",)).to_pandas()

    # brute force
    alldf = Counter()
    for t in texts.values():
        alldf.update(set(tok for tok in t.split(" ") if tok))
    want = set()
    for did, t in texts.items():
        c = Counter(tok for tok in t.split(" ") if tok)
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        for r, (term, tf) in enumerate(ranked, 1):
            want.add((did, term, tf, r, alldf[term]))
    assert set(zip(got.doc_id, got.term, got.tf, got.rnk, got.df)) == want
    assert (0, "a", 2, 1, 3) in want  # tie broken toward 'a'; df('a')=3


def test_global_rank_oracle_shape(rd):
    """Distributed row_number == argsort rank, with duplicate ts values
    forcing the (ts, event_id) tie-break across block boundaries."""
    from pygeoops_ray.pipelines.queries import q_global_rank

    out = q_global_rank(SF).to_pandas()
    import duckdb

    want = duckdb.sql(
        f"""SELECT event_id,
                   CAST(row_number() OVER (ORDER BY ts, event_id) AS BIGINT) AS rnk
            FROM '{SF}/events.parquet'"""
    ).df()
    got = out.sort_values("event_id").reset_index(drop=True)
    want = want.sort_values("event_id").reset_index(drop=True)
    assert (got["rnk"].to_numpy() == want["rnk"].to_numpy()).all()
    assert got["rnk"].min() == 1 and got["rnk"].max() == len(got)


def test_pip_polygon_join_matches_brute_force(ray_session):
    """pip_polygon_join vs O(n*m) brute force on random triangles — the
    STRtree candidates + exact predicate must find exactly the inside pairs
    (boundary-free corpus: random floats never land on an edge)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from pygeoops_ray.geo import geom as g
    from pygeoops_ray.geo import wkb as geo_wkb
    from pygeoops_ray.geo.predicates import points_in_polygon
    from pygeoops_ray.stages.spatial import pip_polygon_join

    rng = np.random.default_rng(11)
    polys, rows = [], []
    for pid in range(40):
        cx, cy = rng.uniform(320, 2000, 2)  # keep polys in the non-negative world (CellGrid contract)
        verts = np.column_stack(
            [cx + rng.uniform(-300, 300, 3), cy + rng.uniform(-300, 300, 3)]
        )
        # CCW orientation
        if np.cross(verts[1] - verts[0], verts[2] - verts[0]) < 0:
            verts = verts[::-1]
        poly = g.Polygon([tuple(v) for v in verts] + [tuple(verts[0])])
        polys.append(poly)
        xs, ys = verts[:, 0], verts[:, 1]
        rows.append(
            (pid, geo_wkb.dumps(poly), xs.min(), ys.min(), xs.max(), ys.max())
        )
    pdf = pd.DataFrame(
        rows, columns=["poly_id", "geom_wkb", "minx", "miny", "maxx", "maxy"]
    )
    pts = np.column_stack(
        [rng.uniform(0, 2400, 500), rng.uniform(0, 2400, 500)]
    )
    ptdf = pd.DataFrame(
        {"event_id": np.arange(500, dtype=np.int64), "px": pts[:, 0], "py": pts[:, 1]}
    )
    got = pip_polygon_join(
        rd.from_pandas(pdf), rd.from_pandas(ptdf), n_rows_hint=600
    ).to_pandas()
    want = set()
    for pid, poly in enumerate(polys):
        inside = points_in_polygon(poly, pts) == 1
        for eid in np.nonzero(inside)[0]:
            want.add((int(eid), pid))
    assert set(zip(got["event_id"], got["poly_id"])) == want
    assert len(got) == len(want)  # exactly-once (no replica dupes)
