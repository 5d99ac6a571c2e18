"""Round-4 operators: Count-Min sketch, weighted sampling, image quality."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_cms_merge_algebra_and_upper_bound(ray_session):
    """The merged register table must equal the single-block sketch (SUM
    merge is exact), and every point estimate must upper-bound the true
    count (the Count-Min one-sided error contract)."""
    import ray.data as rd

    from pygeoops_ray.stages.sketch import cms_estimate, cms_partial, cms_registers

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(300)]
    docs = [
        " ".join(rng.choice(vocab, size=rng.integers(5, 40)))
        for _ in range(400)
    ]
    from collections import Counter

    exact = Counter()
    for d in docs:
        exact.update(d.split(" "))

    ds = rd.from_items([{"text": t} for t in docs]).repartition(7)
    reg = cms_registers(ds, "text", d=4, w=256).to_pandas()

    # single-shot sketch over the whole corpus == distributed merge
    r1, j1, n1 = cms_partial(dict(exact), 4, 256)
    one = (
        pd.DataFrame({"r": r1, "j": j1, "cnt": n1})
        .sort_values(["r", "j"])
        .reset_index(drop=True)
    )
    got = reg.sort_values(["r", "j"]).reset_index(drop=True).astype("int64")
    pd.testing.assert_frame_equal(got, one.astype("int64"))

    # upper-bound contract for every term; equality for most (w >> vocab/row)
    over = 0
    for t, n in exact.items():
        est = cms_estimate(reg, t, d=4, w=256)
        assert est >= n, (t, est, n)
        over += est > n
    assert over < len(exact) * 0.5


def test_weighted_sample_brute_force(ray_session):
    """The distributed bounded-partial selection must equal the driver-side
    exponential-clocks race computed in one numpy pass."""
    import pyarrow.parquet as pq

    from pygeoops_ray.pipelines.q_relational import q_weighted_sample
    from pygeoops_ray.stages.sketch import md5_low64

    t = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "value"])
    e = t["event_id"].to_numpy()
    wgt = np.floor(t["value"].to_numpy() * 100).astype(np.int64) + 1
    h = np.fromiter((md5_low64(str(int(x))) for x in e), dtype=np.uint64, count=len(e))
    u = (h.astype(np.float64) + 1.0) / 18446744073709551616.0
    s = -np.log(u) / wgt
    order = np.lexsort((e, s))[:50]
    want = pd.DataFrame(
        {
            "event_id": e[order],
            "wgt": wgt[order],
            "rk": np.arange(1, len(order) + 1, dtype=np.int64),
        }
    )
    got = q_weighted_sample(SF).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # a sample without replacement: ids unique
    assert got["event_id"].is_unique
    # weighting sanity: the sample over-represents heavy rows vs uniform
    assert got["wgt"].mean() > wgt.mean()


def test_image_quality_edge_sums_naive(ray_session):
    """Edge-energy columns equal a naive per-pixel double loop on the first
    few decoded images."""
    from pygeoops_ray.pipelines.q_media import q_image_quality

    out = q_image_quality(SF).to_pandas().set_index("i").sort_index()

    from pygeoops_ray.pipelines.common import _image_ds
    from pygeoops_ray.stages.multimodal import decode_any

    ds, _ = _image_ds(SF)
    rows = ds.select_columns(["image_id", "bytes", "fmt"]).limit(5).to_pandas()
    for _, row in rows.iterrows():
        i = int(row["image_id"][4:])
        pix = decode_any(row["bytes"], row["fmt"])
        gray = pix.astype(np.int64).sum(axis=2)
        ex = sum(
            abs(int(gray[y, x + 1]) - int(gray[y, x]))
            for y in range(gray.shape[0])
            for x in range(gray.shape[1] - 1)
        )
        ey = sum(
            abs(int(gray[y + 1, x]) - int(gray[y, x]))
            for y in range(gray.shape[0] - 1)
            for x in range(gray.shape[1])
        )
        r = out.loc[i]
        assert int(r["edge_x"]) == ex
        assert int(r["edge_y"]) == ey
        assert int(r["sum_g"]) == int(gray.sum())
        assert int(r["sum_sq"]) == int((gray * gray).sum())


def test_ivf_pq_recall_and_determinism(ray_session):
    """IVF+PQ composite: recall well above chance vs exact top-10, and two
    runs over differently-partitioned input agree exactly (deterministic
    training: canonical sample order + integer PQ fit)."""
    from pygeoops_ray.pipelines.common import _read
    from pygeoops_ray.pipelines.q_ann import _query_vectors
    from pygeoops_ray.stages import ann as ann_stages
    from pygeoops_ray.stages.cluster import ivf_pq_topk

    q_ids, qm = _query_vectors(SF)
    emb = _read(SF, "embeddings", columns=["vec_id", "embedding"])
    exact = ann_stages.brute_force_topk(emb, q_ids, qm, k=10).to_pandas()
    a1 = (
        ivf_pq_topk(emb, q_ids, qm, k=10)
        .to_pandas()
        .sort_values(["q_id", "rnk"])
        .reset_index(drop=True)
    )
    a2 = (
        ivf_pq_topk(emb.repartition(5), q_ids, qm, k=10)
        .to_pandas()
        .sort_values(["q_id", "rnk"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a1, a2)
    recalls = []
    for q in q_ids:
        e = set(exact.loc[exact["q_id"] == q, "vec_id"])
        a = set(a1.loc[a1["q_id"] == q, "vec_id"])
        recalls.append(len(e & a) / max(len(e), 1))
    assert float(np.mean(recalls)) >= 0.25


def test_lsh_disk_resume_pruning_and_self_matches(ray_session):
    """Second run must be a byte-level no-op on the index (manifest resume),
    pruning must hold, every query doc must retrieve itself at J=100, and
    retrieved non-self candidates must be real near-dups per the exact
    in-stream jaccard machinery."""
    import glob
    import os

    from pygeoops_ray.pipelines.q_dedup import q_lsh_disk

    out1 = q_lsh_disk(SF).to_pandas().sort_values(["q_id", "cand_id"]).reset_index(drop=True)
    dirs = glob.glob("/tmp/pygeoops_ray_cache/lsh_index_*")
    assert dirs
    idx = max(dirs, key=os.path.getmtime)
    mtimes = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(idx, "**", "*.parquet"), recursive=True)
    }
    assert mtimes
    out2 = q_lsh_disk(SF).to_pandas().sort_values(["q_id", "cand_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out1, out2)
    for p, m in mtimes.items():
        assert os.path.getmtime(p) == m, f"index file rewritten: {p}"
    assert (out1["pruned_ok"] == 1).all()
    # 8 self-rows at J=100
    selfs = out1[out1["q_id"] == out1["cand_id"]]
    assert len(selfs) == 8 and (selfs["j_pct"] == 100).all()
    # non-self retrievals are genuine near-dups (exact verify >= 50)
    others = out1[out1["q_id"] != out1["cand_id"]]
    assert (others["j_pct"] >= 50).all()


def test_dp_counts_mechanism(ray_session):
    """DP release: noisy counts differ from exact per the deterministic
    discrete-Laplace draw, and the mechanism matches a direct numpy replay."""
    import pyarrow.parquet as pq

    from pygeoops_ray.pipelines.q_text import q_dp_counts
    from pygeoops_ray.stages.sketch import md5_low64

    got = q_dp_counts(SF).to_pandas().sort_values("lang").reset_index(drop=True)
    t = pq.read_table(f"{SF}/documents.parquet", columns=["lang"]).to_pandas()
    exact = t.groupby("lang").size()
    assert (got.set_index("lang")["n_docs"] == exact).all()
    for _, row in got.iterrows():
        u1 = (md5_low64(f"{row['lang']}#dp1") + 1) / 2**64
        u2 = (md5_low64(f"{row['lang']}#dp2") + 1) / 2**64
        noise = int(np.floor(np.log(u1) / -1.0)) - int(np.floor(np.log(u2) / -1.0))
        assert row["n_dp"] == row["n_docs"] + noise


def test_bm25_disk_matches_instream_and_resumes(ray_session):
    """The disk index must rank exactly like the in-stream bm25_topk (the
    layout changes I/O, not values), resume as a byte-level no-op, and
    actually prune postings buckets."""
    import glob
    import os

    from pygeoops_ray.pipelines.q_text import q_bm25_disk, q_bm25_topk

    disk = (
        q_bm25_disk(SF).to_pandas().sort_values(["term", "rnk"]).reset_index(drop=True)
    )
    stream = (
        q_bm25_topk(SF).to_pandas().sort_values(["term", "rnk"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        disk.drop(columns=["pruned_ok"]).astype("object"),
        stream.astype("object"),
        check_dtype=False,
    )
    assert (disk["pruned_ok"] == 1).all()
    dirs = glob.glob("/tmp/pygeoops_ray_cache/bm25_index_*")
    assert dirs
    idx = max(dirs, key=os.path.getmtime)
    mtimes = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(idx, "**", "*.parquet"), recursive=True)
    }
    assert mtimes
    again = (
        q_bm25_disk(SF).to_pandas().sort_values(["term", "rnk"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(disk, again)
    for p, m in mtimes.items():
        assert os.path.getmtime(p) == m


def test_ann_filtered_predicate_and_recall(ray_session):
    """Filtered ANN: every returned vector satisfies the predicate, and the
    contract row passes with margin (measured mean 60% vs the 30% floor)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from pygeoops_ray.pipelines.common import _read
    from pygeoops_ray.pipelines.q_ann import _query_vectors, q_ann_filtered
    from pygeoops_ray.stages.ann import _probed_topk, train_ivf_centroids

    row = q_ann_filtered(SF).to_pydict()
    assert row["recall_ok"] == [1]
    # predicate check on the raw candidate lists
    q_ids, qm = _query_vectors(SF)
    emb = _read(SF, "embeddings", columns=["vec_id", "embedding", "label"])
    cent = train_ivf_centroids(emb, n_centroids=16)
    qn = np.asarray(qm, np.float64)
    qn = qn / np.maximum(np.linalg.norm(qn, axis=1, keepdims=True), 1e-12)
    probe = np.argsort(-(qn @ cent.T), axis=1)[:, :6]
    filtered = emb.map_batches(
        lambda b: b.filter(pc.equal(b["label"], 3)).drop_columns(["label"]),
        batch_format="pyarrow",
    )
    approx = _probed_topk(
        filtered, np.asarray(q_ids, np.int64), qn, cent, probe, 10
    ).to_pandas()
    lab = pq.read_table(
        f"{SF}/embeddings.parquet", columns=["vec_id", "label"]
    ).to_pandas()
    merged = approx.merge(lab, on="vec_id")
    assert (merged["label"] == 3).all()


def _wavy_strip_corpus():
    from pygeoops_ray.geo import geom as g

    W, H = 20, 10
    geoms = []
    for k in range(6):
        ox = k * W

        def border(x):
            ys = np.linspace(0, H, 11)
            xs = x + np.sin(ys * 1.7 + x * 0.13) * 1.3
            return np.column_stack([xs, ys])

        left = border(ox)
        right = border(ox + W)
        bottom = np.column_stack(
            [np.linspace(ox, ox + W, 9)[1:-1], np.full(7, 0.0)]
        )
        top = np.column_stack(
            [np.linspace(ox + W, ox, 9)[1:-1], np.full(7, H)]
        )
        ring = np.concatenate([left[:1], bottom, right, top, left[::-1]])
        geoms.append(g.Polygon(ring))
    # collinear-overlap pair: pA's bottom vertices lie ON pB's long top edge
    pA = g.Polygon(np.array([[500, 0], [510, 0], [510, 5], [500, 5], [500, 0]], float))
    pB = g.Polygon(
        np.array([[490, 0], [520, 0], [520, -8], [490, -8], [490, 0]], float)
    )
    return geoms + [pA, pB]


def test_topo_global_matches_local_kernel(ray_session):
    """The distributed global topology must match the single-process
    simplify_topo EXACTLY (WKT equality) on a corpus with wavy shared
    borders + a collinear-overlap pair, and be partition-invariant."""
    import ray.data as rd

    from pygeoops_ray.geo import wkb as wkb_codec
    from pygeoops_ray.geo.simplify_topo import simplify_topo
    from pygeoops_ray.stages.topo_global import topo_simplify_distributed

    geoms = _wavy_strip_corpus()
    local = simplify_topo(geoms, tolerance=0.8, algorithm="rdp")
    tab = pa.table(
        {
            "s_suppkey": pa.array(list(range(len(geoms))), pa.int64()),
            "geom_wkb": pa.array([wkb_codec.dumps(x) for x in geoms], pa.binary()),
        }
    )
    outs = []
    for nparts in (2, 7):
        ds = rd.from_arrow(tab).repartition(nparts)
        out = (
            topo_simplify_distributed(ds, tolerance=0.8, algorithm="rdp", local_threshold=0)
            .to_pandas()
            .sort_values("s_suppkey")
            .reset_index(drop=True)
        )
        outs.append(out)
        for i in range(len(geoms)):
            lg = local[i]
            dg = (
                wkb_codec.loads(out.loc[i, "geom_wkb"])
                if out.loc[i, "geom_wkb"] is not None
                else None
            )
            assert (lg.wkt if lg is not None else None) == (
                dg.wkt if dg is not None else None
            ), i
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_topo_global_shared_borders_cross_partition(ray_session):
    """Neighbors in DIFFERENT partitions keep byte-identical shared borders
    — the property the per-cell grouped variant only approximates."""
    import ray.data as rd

    from pygeoops_ray.geo import geom as g
    from pygeoops_ray.geo import wkb as wkb_codec
    from pygeoops_ray.stages.topo_global import topo_simplify_distributed

    geoms = _wavy_strip_corpus()[:6]
    tab = pa.table(
        {
            "s_suppkey": pa.array(list(range(len(geoms))), pa.int64()),
            "geom_wkb": pa.array([wkb_codec.dumps(x) for x in geoms], pa.binary()),
        }
    )
    out = (
        topo_simplify_distributed(
            rd.from_arrow(tab).repartition(6), tolerance=0.8, algorithm="rdp",
            local_threshold=0,
        )
        .to_pandas()
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )
    W = 20
    for k in range(5):
        a = wkb_codec.loads(out.loc[k, "geom_wkb"])
        b = wkb_codec.loads(out.loc[k + 1, "geom_wkb"])
        border_x = (k + 1) * W
        ba = {
            tuple(p)
            for p in g.get_coordinates(a)[:, :2]
            if abs(p[0] - border_x) < 2
        }
        bb = {
            tuple(p)
            for p in g.get_coordinates(b)[:, :2]
            if abs(p[0] - border_x) < 2
        }
        assert ba and ba == bb, k


def test_mm_curate_fusion_consistency(ray_session):
    """The fused multimodal kernel must reproduce curate_digest_batch's dedup
    keys AND ClipScoreStage's (dot, keep) bit-for-bit (one decode vs three)."""
    from pygeoops_ray.pipelines.common import _image_ds
    from pygeoops_ray.stages.multimodal import (
        ClipScoreStage,
        curate_digest_batch,
        mm_curate_batch,
    )

    ds, _ = _image_ds(SF)
    batch = (
        ds.select_columns(["image_id", "bytes", "fmt", "caption"])
        .limit(64)
        .to_pandas()
    )
    tab = pa.Table.from_pandas(batch, preserve_index=False)
    fused = mm_curate_batch(tab).to_pandas().sort_values("i").reset_index(drop=True)
    dig = (
        curate_digest_batch(tab.select(["image_id", "bytes", "fmt"]))
        .to_pandas()
        .reset_index(drop=True)
    )
    clip = ClipScoreStage(tau_centi=5)(tab).to_pandas().sort_values("i").reset_index(drop=True)
    dig["i"] = dig["image_id"].str[4:].astype("int64")
    dig = dig.sort_values("i").reset_index(drop=True)
    assert (fused["qdigest"] == dig["qdigest"]).all()
    assert (fused["phash_q"] == dig["phash_q"]).all()
    assert (fused["w"] == dig["w"]).all() and (fused["h"] == dig["h"]).all()
    assert (fused["dot"] == clip["dot"]).all()
    assert (fused["keep"] == clip["keep"]).all()


def test_topo_global_random_grid_matches_local(ray_session):
    """Randomized rectilinear grids with shared edges (seeded): the
    distributed topology must equal the local kernel exactly for several
    grid shapes, tolerances, and partition counts."""
    import ray.data as rd

    from pygeoops_ray.geo import geom as g
    from pygeoops_ray.geo import wkb as wkb_codec
    from pygeoops_ray.geo.simplify_topo import simplify_topo
    from pygeoops_ray.stages.topo_global import topo_simplify_distributed

    rng = np.random.default_rng(17)
    for gw, gh, tol, nparts in ((4, 3, 0.6, 3), (6, 2, 1.1, 5)):
        # grid of cells with jittered-but-shared internal borders: border
        # x-line between column c and c+1 is a wavy polyline shared by both
        xs = np.arange(gw + 1) * 15.0
        ys = np.arange(gh + 1) * 12.0
        dense = 7

        def vline(ci, rj):
            t = np.linspace(ys[rj], ys[rj + 1], dense)
            off = np.sin(t * (1.1 + 0.13 * ci)) * 1.4 if 0 < ci < gw else 0 * t
            return np.column_stack([xs[ci] + off, t])

        def hline(ci, rj):
            t = np.linspace(xs[ci], xs[ci + 1], dense)
            off = np.cos(t * (0.9 + 0.07 * rj)) * 1.2 if 0 < rj < gh else 0 * t
            return np.column_stack([t, ys[rj] + off])

        geoms = []
        for rj in range(gh):
            for ci in range(gw):
                bottom = hline(ci, rj)
                right = vline(ci + 1, rj)
                top = hline(ci, rj + 1)[::-1]
                left = vline(ci, rj)[::-1]
                ring = np.concatenate(
                    [bottom, right[1:], top[1:], left[1:]]
                )
                geoms.append(g.Polygon(ring))
        local = simplify_topo(geoms, tolerance=tol, algorithm="rdp")
        tab = pa.table(
            {
                "s_suppkey": pa.array(list(range(len(geoms))), pa.int64()),
                "geom_wkb": pa.array(
                    [wkb_codec.dumps(x) for x in geoms], pa.binary()
                ),
            }
        )
        out = (
            topo_simplify_distributed(
                rd.from_arrow(tab).repartition(nparts), tolerance=tol,
                algorithm="rdp", local_threshold=0,
            )
            .to_pandas()
            .sort_values("s_suppkey")
            .reset_index(drop=True)
        )
        for i in range(len(geoms)):
            lg = local[i]
            dg = (
                wkb_codec.loads(out.loc[i, "geom_wkb"])
                if out.loc[i, "geom_wkb"] is not None
                else None
            )
            assert (lg.wkt if lg is not None else None) == (
                dg.wkt if dg is not None else None
            ), (gw, gh, tol, i)


def test_gpkg_scan_header_and_roundtrip(ray_session):
    """The written .gpkg must carry conformant GP blobs (magic, version,
    flags) and the sharded read must reproduce every supplier exactly."""
    import sqlite3
    import struct

    from pygeoops_ray.pipelines.common import _table_rows
    from pygeoops_ray.pipelines.q_geometry import q_gpkg_scan

    out = q_gpkg_scan(SF).to_pandas().sort_values("s_suppkey").reset_index(drop=True)
    n = _table_rows(SF, "supplier")
    assert len(out) == n
    k = out["s_suppkey"].to_numpy()
    assert (out["area_c"].to_numpy() == (5 + k % 3) * (3 + k % 5) * 100).all()
    con = sqlite3.connect(f"/tmp/ray_geoops_cache/geo_{n}.gpkg")
    (blob,) = con.execute("SELECT geom FROM footprints WHERE fid = 1").fetchone()
    assert blob[:2] == b"GP" and blob[2] == 0 and blob[3] == 0x01
    assert struct.unpack("<i", blob[4:8])[0] == -1
    (gt,) = con.execute(
        "SELECT geometry_type_name FROM gpkg_geometry_columns"
    ).fetchone()
    assert gt == "POLYGON"
    con.close()


def test_source_exports_crash_resume_no_double_read(ray_session):
    """A crashed partial export (stale shard, no _SUCCESS marker) must NOT
    leak into the rebuilt dataset — the rewriters clear unpublished
    directories, so counts stay exact."""
    import glob
    import os

    import pyarrow.parquet as pq

    from pygeoops_ray.pipelines.q_text import q_ipc_scan

    baseline = (
        q_ipc_scan(SF).to_pandas().sort_values(["lang", "source"]).reset_index(drop=True)
    )
    n = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert int(baseline["n_docs"].sum()) == n
    # simulate the crash: drop the marker, plant a stale shard copy
    # (derive THIS sf's cache dir — an mtime glob can pick another scale's)
    import hashlib

    key = hashlib.md5(f"{os.path.abspath(SF)}:{n}:ipc".encode()).hexdigest()[:10]
    d = f"/tmp/pygeoops_ray_cache/docs_ipc_{key}"
    os.remove(os.path.join(d, "_SUCCESS"))
    shard = glob.glob(os.path.join(d, "*.arrow"))[0]
    with open(shard, "rb") as f:
        blob = f.read()
    with open(os.path.join(d, "shard-stale00.arrow"), "wb") as f:
        f.write(blob)
    rebuilt = (
        q_ipc_scan(SF).to_pandas().sort_values(["lang", "source"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(rebuilt, baseline)


def test_kcore_peeling_brute_force(ray_session):
    """Distributed peeling equals a driver-side fixpoint peel on random
    graphs, including a graph whose peel cascades (chain into a clique)."""
    import ray.data as rd

    from pygeoops_ray.stages.graph import kcore

    rng = np.random.default_rng(23)
    cases = []
    e = rng.integers(0, 60, size=(120, 2))
    cases.append(e[e[:, 0] != e[:, 1]])
    # chain 0-1-2-...-9 hanging off a 4-clique (10,11,12,13)
    chain = np.array([[i, i + 1] for i in range(9)] + [[9, 10]])
    clique = np.array(
        [[a, b] for a in range(10, 14) for b in range(a + 1, 14)]
    )
    cases.append(np.concatenate([chain, clique]))
    for edges in cases:
        ds = rd.from_arrow(
            pa.table(
                {"a": pa.array(edges[:, 0], pa.int64()),
                 "b": pa.array(edges[:, 1], pa.int64())}
            )
        ).repartition(3)
        got = (
            kcore(ds, "a", "b", k=2, max_rounds=16)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        # brute-force fixpoint peel
        es = {tuple(sorted(t)) for t in map(tuple, edges) if t[0] != t[1]}
        while True:
            deg = {}
            for a, b in es:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            drop = {n for n, d in deg.items() if d < 2}
            if not drop:
                break
            es = {e_ for e_ in es if e_[0] not in drop and e_[1] not in drop}
        want_deg = {}
        for a, b in es:
            want_deg[a] = want_deg.get(a, 0) + 1
            want_deg[b] = want_deg.get(b, 0) + 1
        assert dict(zip(got["node"], got["degree"])) == want_deg
        assert (got["conv_ok"] == 1).all() or not len(got)


def test_mixup_pairs_invariants(ray_session):
    """Pairing is a perfect matching per bucket (each image in ≤1 pair, odd
    leftover dropped), partners share a bucket, and composites match a
    direct two-image replay."""
    from pygeoops_ray.pipelines.common import _image_ds
    from pygeoops_ray.pipelines.q_media import q_mixup_pairs
    from pygeoops_ray.stages.multimodal import decode_any
    from pygeoops_ray.table.images import generate_images_for_ordinals

    out = q_mixup_pairs(SF).to_pandas()
    ids = np.concatenate([out["i_a"].to_numpy(), out["i_b"].to_numpy()])
    assert len(np.unique(ids)) == len(ids)  # perfect matching
    _, n = _image_ds(SF)
    assert len(out) <= n // 2
    # replay 5 pairs directly
    for _, row in out.head(5).iterrows():
        rows = generate_images_for_ordinals(
            [int(row["i_a"]), int(row["i_b"])], small=True
        )
        pa_img = decode_any(rows["bytes"][0].as_py(), rows["fmt"][0].as_py()).astype(
            np.int64
        )
        pb_img = decode_any(rows["bytes"][1].as_py(), rows["fmt"][1].as_py()).astype(
            np.int64
        )
        h = min(pa_img.shape[0], pb_img.shape[0])
        w = min(pa_img.shape[1], pb_img.shape[1])
        comp = (pa_img[:h, :w] + pb_img[:h, :w]) // 2
        assert int(row["comp_sum"]) == int(comp.sum())
        assert int(row["comp_sq"]) == int((comp * comp).sum())
        assert int(row["w"]) == w and int(row["h"]) == h


def test_topo_global_degenerate_neighborhoods_and_negzero(ray_session):
    """Round-5 regressions from ADVICE: (1) a vertex whose two neighbors are
    the SAME point (2-point closed ring) must still be distinguishable by
    neighborhood — plain XOR hashed (a,a) and (b,b) both to 0 and missed the
    junction; (2) -0.0 and 0.0 coordinates must be one vertex key, matching
    the local kernel's float-equality dict."""
    import ray.data as rd

    from pygeoops_ray.geo import geom as g
    from pygeoops_ray.geo import wkb as wkb_codec
    from pygeoops_ray.geo.simplify_topo import simplify_topo
    from pygeoops_ray.stages.topo_global import topo_simplify_distributed

    v = (5.0, 4.0)
    # two degenerate 2-point closed rings sharing v: neighborhoods of v are
    # (a,a) and (b,b) — distinct, so v IS a junction
    spikes = [
        g.LineString(np.array([[0.0, 0.0], list(v), [0.0, 0.0]])),
        g.LineString(np.array([[9.0, 9.0], list(v), [9.0, 9.0]])),
        # a longer line through v so junction-vs-not changes RDP output
        g.LineString(
            np.array([[0.0, 8.0], [2.5, 5.9], list(v), [7.5, 2.1], [10.0, 0.5]])
        ),
    ]
    # -0.0 corpus: same border vertex written as 0.0 in one line, -0.0 in
    # the other — one vertex key on both sides
    negz = [
        g.LineString(np.array([[-3.0, 0.0], [0.0, 1.0], [3.0, 0.2], [6.0, 1.5]])),
        g.LineString(np.array([[-0.0, 1.0], [-2.0, 4.0], [1.0, 6.0]])),
    ]
    for geoms, tol in ((spikes, 1.5), (negz, 0.8)):
        local = simplify_topo(geoms, tolerance=tol, algorithm="rdp")
        tab = pa.table(
            {
                "s_suppkey": pa.array(list(range(len(geoms))), pa.int64()),
                "geom_wkb": pa.array(
                    [wkb_codec.dumps(x) for x in geoms], pa.binary()
                ),
            }
        )
        out = (
            topo_simplify_distributed(
                rd.from_arrow(tab).repartition(len(geoms)),
                tolerance=tol,
                algorithm="rdp",
                local_threshold=0,
            )
            .to_pandas()
            .sort_values("s_suppkey")
            .reset_index(drop=True)
        )
        for i in range(len(geoms)):
            lg = local[i]
            dg = (
                wkb_codec.loads(out.loc[i, "geom_wkb"])
                if out.loc[i, "geom_wkb"] is not None
                else None
            )
            assert (lg.wkt if lg is not None else None) == (
                dg.wkt if dg is not None else None
            ), (tol, i)


def test_topo_global_local_fastpath_equals_distributed(ray_session):
    """Round-5: below local_threshold the whole topology runs in one task
    through the LOCAL kernel; output must equal the forced-distributed path
    exact-WKT on the wavy shared-border corpus."""
    import ray.data as rd

    from pygeoops_ray.geo import wkb as wkb_codec
    from pygeoops_ray.stages.topo_global import topo_simplify_distributed

    geoms = _wavy_strip_corpus()
    tab = pa.table(
        {
            "s_suppkey": pa.array(list(range(len(geoms))), pa.int64()),
            "geom_wkb": pa.array([wkb_codec.dumps(x) for x in geoms], pa.binary()),
        }
    )
    outs = []
    for thr in (0, 100_000):
        out = (
            topo_simplify_distributed(
                rd.from_arrow(tab).repartition(4),
                tolerance=0.8,
                algorithm="rdp",
                local_threshold=thr,
            )
            .to_pandas()
            .sort_values("s_suppkey")
            .reset_index(drop=True)
        )
        outs.append(out)
    a, b = outs
    assert len(a) == len(b) == len(geoms)
    for i in range(len(geoms)):
        ga = wkb_codec.loads(a.loc[i, "geom_wkb"]) if a.loc[i, "geom_wkb"] is not None else None
        gb = wkb_codec.loads(b.loc[i, "geom_wkb"]) if b.loc[i, "geom_wkb"] is not None else None
        assert (ga.wkt if ga is not None else None) == (
            gb.wkt if gb is not None else None
        ), i


def test_orc_export_crash_resume_no_double_read(ray_session):
    """Round-5: the ORC side-sink honors the same crash-resume contract as
    the IPC/wds exports — a stale unpublished shard (marker dropped) is
    cleared on rebuild, so the per-type aggregate stays exact."""
    import glob
    import hashlib
    import os

    import pyarrow.parquet as pq

    from pygeoops_ray.pipelines.q_text import q_orc_scan

    baseline = (
        q_orc_scan(SF).to_pandas().sort_values("event_type").reset_index(drop=True)
    )
    n = pq.read_metadata(f"{SF}/events.parquet").num_rows
    assert int(baseline["n_events"].sum()) == n
    key = hashlib.md5(f"{os.path.abspath(SF)}:{n}:orc".encode()).hexdigest()[:10]
    d = f"/tmp/pygeoops_ray_cache/events_orc_{key}"
    os.remove(os.path.join(d, "_SUCCESS"))
    shard = glob.glob(os.path.join(d, "*.orc"))[0]
    with open(shard, "rb") as f:
        blob = f.read()
    with open(os.path.join(d, "shard-stale00.orc"), "wb") as f:
        f.write(blob)
    rebuilt = (
        q_orc_scan(SF).to_pandas().sort_values("event_type").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(rebuilt, baseline)
