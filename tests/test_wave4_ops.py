"""Round-3 fourth wave: watermark/late-data windows, sequence packing,
space-filling-curve layout scans, inverted index — brute-force checks
against pandas/numpy ground truth on the sf0.001 corpus."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"

US_H = 3_600_000_000


def _late_events_brute(events: pd.DataFrame) -> pd.DataFrame:
    """Row-at-a-time watermark replay — the semantics q_late_events must match."""
    eid = events["event_id"].to_numpy()
    tus = events["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    vc = np.floor(events["value"].to_numpy() * 100.0).astype(np.int64)
    arr = tus + (eid * 2654435761) % (2 * US_H) - US_H
    order = np.lexsort((eid, arr))
    run = -(1 << 62)
    late = np.zeros(len(eid), dtype=bool)
    for i in order:
        late[i] = tus[i] < run - US_H
        run = max(run, tus[i])
    wnd = tus // US_H * US_H
    df = pd.DataFrame(
        {"wnd_us": wnd, "late": late.astype(np.int64), "vc": np.where(late, 0, vc)}
    )
    g = df.groupby("wnd_us")
    return (
        pd.concat(
            [
                g.size().rename("n_events"),
                g["late"].sum().rename("n_late"),
                g["vc"].sum().rename("ontime_value_c"),
            ],
            axis=1,
        )
        .reset_index()
        .sort_values("wnd_us")
        .reset_index(drop=True)
    )


def test_late_events_matches_brute_force(ray_session):
    from pygeoops_ray.pipelines.q_relational import q_late_events

    got = (
        q_late_events(SF)
        .to_pandas()
        .sort_values("wnd_us")
        .reset_index(drop=True)[["wnd_us", "n_events", "n_late", "ontime_value_c"]]
    )
    want = _late_events_brute(pd.read_parquet(f"{SF}/events.parquet"))
    pd.testing.assert_frame_equal(
        got.astype(np.int64), want.astype(np.int64), check_dtype=False
    )
    # the stream must actually contain late data for the op to be meaningful
    assert want["n_late"].sum() > 0


def test_late_events_first_arrival_never_late(ray_session):
    """The globally-first arrival has no watermark: the -inf sentinel must not
    wrap under the - DELAY subtraction (the int64.min overflow class)."""
    from pygeoops_ray.pipelines.q_relational import q_late_events

    got = q_late_events(SF).to_pandas()
    events = pd.read_parquet(f"{SF}/events.parquet")
    eid = events["event_id"].to_numpy()
    tus = events["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    arr = tus + (eid * 2654435761) % (2 * US_H) - US_H
    first = np.lexsort((eid, arr))[0]
    wnd_first = int(tus[first] // US_H * US_H)
    row = got[got["wnd_us"] == wnd_first]
    # that window exists and did not count every event late
    assert len(row) == 1 and int(row["n_events"].iloc[0]) > int(row["n_late"].iloc[0])


def _seq_pack_brute(docs: pd.DataFrame, L: int = 256) -> pd.DataFrame:
    docs = docs.sort_values("doc_id")
    t = np.minimum(
        docs["text"].str.split(" ").str.len().to_numpy(np.int64), L
    )
    p, f = 0, 0
    packs, offs = [], []
    for ti in t:
        if f + ti > L:
            p += 1
            f = 0
        packs.append(p)
        offs.append(f)
        f += ti
    return pd.DataFrame(
        {"doc_id": docs["doc_id"].to_numpy(), "pack_id": packs, "pack_off": offs}
    )


def test_seq_pack_matches_sequential_greedy(ray_session):
    """The transfer-function-composed distributed scan must equal the plain
    sequential greedy replay doc by doc (sf0.001 spans 8 ranges, so the
    driver-side composition and per-range carry are genuinely exercised)."""
    from pygeoops_ray.pipelines.q_text import q_seq_pack

    got = (
        q_seq_pack(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = _seq_pack_brute(pd.read_parquet(f"{SF}/documents.parquet"))
    pd.testing.assert_frame_equal(
        got.astype(np.int64), want.astype(np.int64), check_dtype=False
    )
    # structural invariants: pack ids contiguous from 0; offsets within capacity
    assert got["pack_id"].min() == 0
    assert set(np.diff(np.unique(got["pack_id"]))) <= {1}
    assert (got["pack_off"] >= 0).all() and (got["pack_off"] < 256).all()
    assert got["pack_id"].max() > 0  # corpus genuinely spans many packs


def _kept_files(out_dir, stage, ranges):
    from pygeoops_ray.state.manifest import CheckpointManifest

    done = CheckpointManifest(out_dir, stage).completed()
    n = 0
    for rec in done.values():
        st = rec.get("stats", {})
        keep = True
        for col, (lo, hi) in ranges.items():
            if col in st:
                mn, mx = st[col]
                if mx < lo or mn >= hi:
                    keep = False
                    break
        if keep:
            n += 1
    return n, len(done)


def test_zorder_scan_prunes_better_than_time_layout(ray_session, tmp_path):
    """Same 2-D box, same data, two layouts: the z-clustered sink must read
    strictly fewer files than an hour-range layout, and both reads must
    produce identical aggregates (layout never changes answers)."""
    import hashlib
    import os

    import ray.data as rd

    from pygeoops_ray.pipelines.q_relational import q_zorder_scan
    from pygeoops_ray.state.manifest import read_pruned, write_partitioned

    got = q_zorder_scan(SF).to_pandas().sort_values("user_id").reset_index(drop=True)

    ep = os.path.join(SF, "events.parquet")
    ev = pd.read_parquet(ep)
    n_rows = len(ev)
    key = hashlib.md5(
        f"zorder:{os.path.abspath(SF)}:{os.path.getmtime(ep)}:{n_rows}".encode()
    ).hexdigest()[:10]
    z_dir = f"/tmp/pygeoops_ray_cache/zorder_sink_{key}"

    tus = ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    hh = tus // US_H
    h0 = int(hh.min())
    ranges = {"user_id": (3, 7), "hh": (h0 + 200, h0 + 500)}
    z_kept, z_total = _kept_files(z_dir, "zorder", ranges)

    # comparison layout: 32 hour-range files, identical stats machinery
    span = int(hh.max()) - h0 + 1
    w = span // 32 + 1
    ev2 = ev.assign(
        hh=hh,
        vc=np.floor(ev["value"].to_numpy() * 100).astype(np.int64),
        tpid=(hh - h0) // w,
    )
    t_dir = str(tmp_path / "time_layout")
    write_partitioned(
        rd.from_pandas(ev2[["event_id", "user_id", "hh", "vc", "tpid"]]),
        t_dir, "tpid", stage="time", stats_cols=["user_id", "hh"],
    )
    t_kept, t_total = _kept_files(t_dir, "time", ranges)

    assert z_kept < t_kept, (z_kept, t_kept)
    assert z_kept < z_total and t_total >= 16

    # identical answers through the pruned read path
    t_df = read_pruned(t_dir, ranges, stage="time").to_pandas()
    t_agg = (
        t_df.groupby("user_id")
        .agg(n_events=("event_id", "size"), sum_value_c=("vc", "sum"))
        .reset_index()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype(np.int64), t_agg.astype(np.int64), check_dtype=False
    )


def test_inverted_index_postings_and_pruning(ray_session):
    """Postings equal a pandas ground truth; the lookup reads only the query
    terms' hash buckets (pruning contract), and absent terms produce no rows."""
    from pygeoops_ray.pipelines.q_text import q_inverted_index

    got = (
        q_inverted_index(SF)
        .to_pandas()
        .sort_values(["term", "doc_id"])
        .reset_index(drop=True)
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    rows = []
    for did, text in zip(docs["doc_id"], docs["text"]):
        for t in text.split(" "):
            if t in ("join", "window", "zzzabsent"):
                rows.append((t, did))
    want = (
        pd.DataFrame(rows, columns=["term", "doc_id"])
        .groupby(["term", "doc_id"])
        .size()
        .rename("tf")
        .reset_index()
        .sort_values(["term", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert "zzzabsent" not in set(got["term"])
    # at most one bucket per query term is opened (the absent term's bucket
    # may exist — other terms hash into it), and far fewer than the sink total
    n_read, n_total = q_inverted_index._last_stats
    assert n_read <= 3 < n_total, (n_read, n_total)


def test_aspect_bucket_invariants(ray_session):
    """Every training batch is exactly 32 images of ONE bucket with slots
    0..31; per-bucket drop-last discards < 32 rows; membership and packing
    match the md5-order brute force; a rerun is identical."""
    import hashlib

    from pygeoops_ray.pipelines.q_media import q_aspect_bucket

    out = q_aspect_bucket(SF).to_pandas()
    # batch shape invariants
    for (b, bid), g in out.groupby(["bucket", "batch_id"]):
        assert len(g) == 32
        assert sorted(g["slot"]) == list(range(32))
    # brute force from the image-meta rule
    part = pq.read_table(f"{SF}/part.parquet", columns=["p_partkey"]).to_pandas()
    i = part["p_partkey"].to_numpy()
    w = (64 + (i * 37) % 193).astype(np.int64)
    h = (64 + (i * 53) % 151).astype(np.int64)
    ratio = w * 1000 // h
    bucket = np.where(ratio < 800, "tall", np.where(ratio <= 1250, "square", "wide"))
    df = pd.DataFrame(
        {
            "i": i,
            "bucket": bucket,
            "hh": [hashlib.md5(str(v).encode()).hexdigest() for v in i],
        }
    ).sort_values(["bucket", "hh", "i"])
    df["rk"] = df.groupby("bucket").cumcount()
    keep = (df.groupby("bucket")["rk"].transform("size") // 32) * 32
    want = df[df["rk"] < keep]
    got = out.sort_values(["bucket", "batch_id", "slot"]).reset_index(drop=True)
    exp = pd.DataFrame(
        {
            "i": want["i"].to_numpy(),
            "bucket": want["bucket"].to_numpy(),
            "batch_id": (want["rk"] // 32).to_numpy(),
            "slot": (want["rk"] % 32).to_numpy(),
        }
    ).sort_values(["bucket", "batch_id", "slot"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype({"batch_id": "int64", "slot": "int64"}), exp)
    again = (
        q_aspect_bucket(SF)
        .to_pandas()
        .sort_values(["bucket", "batch_id", "slot"])
        .reset_index(drop=True)
    )
    assert got.equals(again.astype({"batch_id": "int64", "slot": "int64"}))


def test_snapshot_store_isolation_resume_pruning(ray_session, tmp_path):
    """Time travel semantics: (1) a v1 reader is byte-identical before and
    after the v2 append; (2) a commit that died mid-write resumes without
    rewriting finished partition files; (3) as-of file listing is the
    version's chain only (metadata-level pruning)."""
    import os

    import ray.data as rd

    from pygeoops_ray.state.snapshots import SnapshotStore

    root = str(tmp_path / "snap")
    store = SnapshotStore(root)
    df1 = pd.DataFrame({"k": np.arange(40) % 4, "x": np.arange(40, dtype=np.int64)})
    v1 = store.commit(rd.from_pandas(df1), "k")
    assert v1 == 1 and store.versions() == [1]
    before = store.read_asof(1).to_pandas().sort_values("x").reset_index(drop=True)

    df2 = pd.DataFrame({"k": np.arange(20) % 4, "x": np.arange(100, 120, dtype=np.int64)})
    v2 = store.commit(rd.from_pandas(df2), "k")
    assert v2 == 2
    after = store.read_asof(1).to_pandas().sort_values("x").reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)  # reader isolation

    both = store.read_asof(2).to_pandas()
    assert len(both) == 60 and set(both["x"]) == set(df1["x"]) | set(df2["x"])

    # as-of listing = chain only
    f1 = store.files_asof(1)
    f2 = store.files_asof(2)
    assert len(f1) == 4 and len(f2) == 8 and set(f1) < set(f2)

    # crash resume: delete the snapshot json (simulates dying before publish)
    # but keep data files; recommit must skip finished partitions
    os.remove(os.path.join(root, "snapshot-v2.json"))
    mtimes = {f: os.path.getmtime(f) for f in f2 if "commit-2" in f}
    v2b = store.commit(rd.from_pandas(df2), "k")
    assert v2b == 2 and store.files_asof(2) == f2
    for f, m in mtimes.items():
        assert os.path.getmtime(f) == m  # untouched: manifest resume skipped it
    pd.testing.assert_frame_equal(
        store.read_asof(2).to_pandas().sort_values("x").reset_index(drop=True),
        both.sort_values("x").reset_index(drop=True),
    )


def test_idw_grid_brute_force(ray_session):
    """The distributed IDW surface equals a row-at-a-time numpy replay of the
    fixed-point rule; spot invariants: tiles only where contributors exist,
    weights bounded by 2^24, and the estimate wvsum/wsum stays inside the
    contributors' value range (IDW is a convex combination)."""
    from pygeoops_ray.pipelines.q_spatial import q_idw_grid

    got = (
        q_idw_grid(SF).to_pandas().sort_values(["tx", "ty"]).reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{SF}/events.parquet")
    e = ev["event_id"].to_numpy()
    px = (e % 1000) * 256 + (e * 7) % 256
    py = ((e // 1000) % 20) * 256 + (e * 13) % 256
    vc = np.floor(ev["value"].to_numpy() * 100).astype(np.int64)
    rows = {}
    vals_per_tile = {}
    for x, y, v in zip(px, py, vc):
        for ox in (-1, 0, 1):
            for oy in (-1, 0, 1):
                tx, ty = x // 256 + ox, y // 256 + oy
                dx, dy = x - (tx * 256 + 128), y - (ty * 256 + 128)
                d2 = dx * dx + dy * dy
                if d2 <= 192 * 192:
                    w = (1 << 24) // max(d2, 1)
                    n, ws, wv = rows.get((tx, ty), (0, 0, 0))
                    rows[(tx, ty)] = (n + 1, ws + w, wv + w * v)
                    vals_per_tile.setdefault((tx, ty), []).append(v)
    want = pd.DataFrame(
        [(tx, ty, n, ws, wv) for (tx, ty), (n, ws, wv) in sorted(rows.items())],
        columns=["tx", "ty", "n_pts", "wsum", "wvsum"],
    )
    pd.testing.assert_frame_equal(got.astype(np.int64), want.astype(np.int64))
    assert (got["n_pts"] > 0).all()
    est = got["wvsum"] / got["wsum"]
    lo = [min(vals_per_tile[(tx, ty)]) for tx, ty in zip(got["tx"], got["ty"])]
    hi = [max(vals_per_tile[(tx, ty)]) for tx, ty in zip(got["tx"], got["ty"])]
    assert (est >= np.array(lo) - 1e-9).all() and (est <= np.array(hi) + 1e-9).all()


def test_trajectories_brute_force(ray_session):
    """Per-user step stats equal a sequential replay; every user with >=2
    events appears; squared steps are nonnegative and max <= sum."""
    from pygeoops_ray.pipelines.q_spatial import q_trajectories

    got = (
        q_trajectories(SF).to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(["user_id", "ts", "event_id"])
    e = ev["event_id"].to_numpy()
    ev = ev.assign(
        px=(e % 1000) * 256 + (e * 7) % 256,
        py=((e // 1000) % 20) * 256 + (e * 13) % 256,
    )
    rows = []
    for uid, g in ev.groupby("user_id"):
        if len(g) < 2:
            continue
        dx = np.diff(g["px"].to_numpy())
        dy = np.diff(g["py"].to_numpy())
        d2 = dx * dx + dy * dy
        rows.append((uid, len(d2), int(d2.sum()), int(d2.max())))
    want = pd.DataFrame(rows, columns=["user_id", "n_steps", "sum_d2", "max_d2"])
    pd.testing.assert_frame_equal(got.astype(np.int64), want.astype(np.int64))
    assert (got["max_d2"] <= got["sum_d2"]).all() and (got["n_steps"] >= 1).all()


def test_tile_pyramid_rollup_consistency(ray_session):
    """Children sum exactly to parents at every level; level 0 equals the
    direct per-tile aggregate; total count is constant across levels."""
    from pygeoops_ray.pipelines.q_spatial import q_tile_pyramid

    got = q_tile_pyramid(SF).to_pandas()
    n_total = len(pd.read_parquet(f"{SF}/events.parquet"))
    for lv in range(4):
        g = got[got["level"] == lv]
        assert g["n_points"].sum() == n_total
        assert g.duplicated(["cx", "cy"]).sum() == 0
    for lv in range(1, 4):
        child = got[got["level"] == lv - 1].copy()
        child["cx"] //= 2
        child["cy"] //= 2
        rolled = (
            child.groupby(["cx", "cy"], as_index=False)[["n_points", "sum_eid"]]
            .sum()
            .sort_values(["cx", "cy"])
            .reset_index(drop=True)
        )
        parent = (
            got[got["level"] == lv][["cx", "cy", "n_points", "sum_eid"]]
            .sort_values(["cx", "cy"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(rolled.astype(np.int64), parent.astype(np.int64))


def test_fuzzy_pairs_recall_and_precision(ray_session):
    """FastSS output == the quadratic levenshtein ground truth (recall AND
    precision), on customers plus an adversarial ed=2 trap that shares a
    deletion key ('ab'/'ba' share key 'a' but are 2 edits apart)."""
    from pygeoops_ray.pipelines.q_dedup import q_fuzzy_pairs

    got = q_fuzzy_pairs(SF).to_pandas()
    names = pd.read_parquet(f"{SF}/customer.parquet")["c_name"].drop_duplicates().tolist()

    def ed_le1(a, b):
        if len(a) == len(b):
            return sum(x != y for x, y in zip(a, b)) <= 1
        if abs(len(a) - len(b)) != 1:
            return a == b
        if len(a) > len(b):
            a, b = b, a
        i = 0
        while i < len(a) and a[i] == b[i]:
            i += 1
        return a[i:] == b[i + 1 :]

    want = {
        (a, b)
        for i, a in enumerate(names)
        for b in names[i + 1 :]
        if ed_le1(*sorted((a, b)))
    }
    want = {tuple(sorted(p)) for p in want}
    assert set(zip(got["a"], got["b"])) == want
    # the trap the in-group verify guards: 'ab'/'ba' share deletion key 'a'
    # (candidate) yet are 2 edits apart (must not be a pair)
    assert not ed_le1("ab", "ba")


def test_skyline_brute_force_and_partial_algebra(ray_session):
    """Skyline equals the quadratic NOT-EXISTS dominance replay (the
    definition, independent of the engine's analytic sweep); the local
    skyline is idempotent and union-algebraic: skyline(skyline(A) ∪
    skyline(B)) == skyline(A ∪ B) on random splits."""
    from pygeoops_ray.pipelines.q_relational import q_skyline

    got = (
        q_skyline(SF)
        .to_pandas()
        .sort_values(["event_type", "event_id"])
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev.assign(
        vc=np.floor(ev["value"].to_numpy() * 100).astype(np.int64),
        tus=ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
    )
    keep_rows = []
    for et, g in ev.groupby("event_type"):
        vc = g["vc"].to_numpy()
        tus = g["tus"].to_numpy()
        for i in range(len(g)):
            dominated = (
                (vc >= vc[i]) & (tus <= tus[i]) & ((vc > vc[i]) | (tus < tus[i]))
            ).any()
            if not dominated:
                keep_rows.append((et, g["event_id"].iloc[i], vc[i], tus[i]))
    want = (
        pd.DataFrame(keep_rows, columns=["event_type", "event_id", "vc", "tus"])
        .sort_values(["event_type", "event_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"event_id": "int64", "vc": "int64", "tus": "int64"}), want
    )
    # union-algebra: local skylines of a random split merge to the global one
    rng = np.random.default_rng(7)
    mask = rng.random(len(ev)) < 0.5

    def brute(g):
        vc, tus = g["vc"].to_numpy(), g["tus"].to_numpy()
        keep = [
            not ((vc >= vc[i]) & (tus <= tus[i]) & ((vc > vc[i]) | (tus < tus[i]))).any()
            for i in range(len(g))
        ]
        return g[np.array(keep, dtype=bool)]

    merged = []
    for et, g in ev.groupby("event_type"):
        m = mask[g.index.to_numpy()]
        part = pd.concat([brute(g[m]), brute(g[~m])])
        merged.append(brute(part))
    merged = pd.concat(merged).sort_values(["event_type", "event_id"])
    assert (
        merged[["event_type", "event_id"]].values.tolist()
        == want[["event_type", "event_id"]].values.tolist()
    )


def test_anomaly_mad_brute_force(ray_session):
    """Flagged outliers equal a per-user sequential replay with nearest-rank
    median/MAD; flags are invariant to event order; no user with mad>0 and
    all-inlier values is flagged."""
    from pygeoops_ray.pipelines.q_relational import q_anomaly_mad

    got = (
        q_anomaly_mad(SF)
        .to_pandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev.assign(vc=np.floor(ev["value"].to_numpy() * 100).astype(np.int64))
    rows = []
    for uid, g in ev.groupby("user_id"):
        vc = np.sort(g["vc"].to_numpy())
        med = vc[(len(vc) - 1) // 2]
        ad = np.sort(np.abs(g["vc"].to_numpy() - med))
        mad = ad[(len(ad) - 1) // 2]
        for _, r in g.iterrows():
            if abs(r["vc"] - med) > 3 * mad:
                rows.append((uid, r["event_id"], r["vc"], med, mad))
    want = (
        pd.DataFrame(rows, columns=["user_id", "event_id", "vc", "med_c", "mad_c"])
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    assert len(want) > 0  # the corpus genuinely contains outliers
    pd.testing.assert_frame_equal(got.astype(np.int64), want.astype(np.int64))


def test_nearest_rect_brute_force(ray_session):
    """The ring-bounded nearest equals a sequential replay: for every point,
    the (d2, i)-lexicographic minimum over rects whose dilated covering
    tiles include the point's home tile; inside-a-rect points get d2=0."""
    from pygeoops_ray.pipelines.q_spatial import q_nearest_rect

    got = (
        q_nearest_rect(SF)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    part = pq.read_table(f"{SF}/part.parquet", columns=["p_partkey"]).to_pandas()
    i = part["p_partkey"].to_numpy()
    w = 64 + (i * 37) % 193
    h = 64 + (i * 53) % 151
    minx = (i % 1000) * 256
    miny = (i // 1000) * 256
    maxx, maxy = minx + w, miny + h
    ev = pd.read_parquet(f"{SF}/events.parquet")
    e = ev["event_id"].to_numpy()
    px = (e % 1000) * 256 + (e * 7) % 256
    py = ((e // 1000) % 20) * 256 + (e * 13) % 256
    rows = []
    for k in range(len(e)):
        tx, ty = px[k] // 256, py[k] // 256
        cand = (
            (minx // 256 - 1 <= tx) & (tx <= (maxx - 1) // 256 + 1)
            & (miny // 256 - 1 <= ty) & (ty <= (maxy - 1) // 256 + 1)
        )
        if not cand.any():
            continue
        dx = np.maximum(np.maximum(minx[cand] - px[k], px[k] - maxx[cand]), 0)
        dy = np.maximum(np.maximum(miny[cand] - py[k], py[k] - maxy[cand]), 0)
        d2 = dx * dx + dy * dy
        ii = i[cand]
        best = np.lexsort((ii, d2))[0]
        rows.append((e[k], ii[best], d2[best]))
    want = (
        pd.DataFrame(rows, columns=["event_id", "i", "d2"])
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype(np.int64), want.astype(np.int64))
    # containment sanity: any point inside a footprint must report d2 = 0
    inside = got[got["d2"] == 0]
    assert len(inside) > 0


def _dbscan_brute(SF_dir, eps=128, minpts=6):
    ev = pd.read_parquet(f"{SF_dir}/events.parquet")
    e = ev["event_id"].to_numpy()
    n = len(e)
    T = max(1, n // 8000)
    c = e % 97
    far = e % 11 == 0
    dx = np.where(far, 96 + (e * 7) % 32, (e * 7) % 64)
    dy = np.where(far, 96 + (e * 13) % 32, (e * 13) % 64)
    noise = (e % 13 == 0) | ((e // 97) % T != 0)
    px = np.where(noise, (e * 9973) % 1_000_000, (c % 40) * 512 + 128 + dx)
    py = np.where(noise, 30_000 + (e * 31) % 5_000, (c // 40) * 512 + 128 + dy)
    # quadratic neighbor counts (ground truth, no grid)
    d2 = (px[:, None] - px[None, :]) ** 2 + (py[:, None] - py[None, :]) ** 2
    nb = d2 <= eps * eps
    counts = nb.sum(axis=1)
    core = counts >= minpts
    # union-find over core-core eps edges
    parent = np.arange(n)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    ii, jj = np.nonzero(nb & core[:, None] & core[None, :])
    for a, b in zip(ii, jj):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = []
    for k in range(n):
        if core[k]:
            comp = find(k)
            members = [e[m] for m in range(n) if core[m] and find(m) == comp]
            rows.append((e[k], min(members), "core"))
    core_label = {r[0]: r[1] for r in rows}
    for k in range(n):
        if core[k]:
            continue
        labs = [core_label[e[m]] for m in np.nonzero(nb[k] & core)[0] if e[m] in core_label]
        if labs:
            rows.append((e[k], min(labs), "border"))
    return pd.DataFrame(rows, columns=["event_id", "cluster_id", "role"])


def test_dbscan_brute_force(ray_session):
    """Grid DBSCAN equals the quadratic no-grid union-find replay at
    sf0.001; the corpus yields real clusters AND at least one border or
    omitted-noise point, so all three roles are exercised."""
    from pygeoops_ray.pipelines.q_spatial import q_dbscan

    SF_dir = SF
    got = (
        q_dbscan(SF_dir)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
        .astype({"event_id": "int64", "cluster_id": "int64"})
    )
    want = (
        _dbscan_brute(SF_dir)
        .sort_values("event_id")
        .reset_index(drop=True)
        .astype({"event_id": "int64", "cluster_id": "int64"})
    )
    pd.testing.assert_frame_equal(got, want)
    n_events = len(pd.read_parquet(f"{SF_dir}/events.parquet"))
    assert got["cluster_id"].nunique() > 10  # real clusters
    assert len(got) < n_events  # noise exists and is omitted


def test_group_corr_moments_brute_force(ray_session):
    """Moments equal a pandas replay; the derived Pearson r from the integer
    moments matches numpy.corrcoef on the raw columns."""
    from pygeoops_ray.pipelines.q_relational import q_group_corr

    got = (
        q_group_corr(SF).to_pandas().sort_values("event_type").reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev.assign(
        x=np.floor(ev["value"].to_numpy() * 100).astype(np.int64),
        y=ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        // 3_600_000_000
        % 24,
    )
    want = (
        ev.groupby("event_type")
        .apply(
            lambda g: pd.Series(
                {
                    "n": len(g),
                    "sx": g["x"].sum(),
                    "sy": g["y"].sum(),
                    "sxx": (g["x"] ** 2).sum(),
                    "syy": (g["y"] ** 2).sum(),
                    "sxy": (g["x"] * g["y"]).sum(),
                }
            ),
            include_groups=False,
        )
        .reset_index()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    cols = ["n", "sx", "sy", "sxx", "syy", "sxy"]
    pd.testing.assert_frame_equal(
        got[["event_type", *cols]].astype({c: "int64" for c in cols}),
        want.astype({c: "int64" for c in cols}),
    )
    for _, r in got.iterrows():
        g = ev[ev["event_type"] == r["event_type"]]
        num = r["n"] * r["sxy"] - r["sx"] * r["sy"]
        den = np.sqrt(float(r["n"] * r["sxx"] - r["sx"] ** 2)) * np.sqrt(
            float(r["n"] * r["syy"] - r["sy"] ** 2)
        )
        if den > 0:
            r_true = np.corrcoef(g["x"], g["y"])[0, 1]
            assert abs(num / den - r_true) < 1e-9
