"""Connected components (stages/graph.py) vs a brute-force union-find."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

SF = "/root/testdata/sf0.001"


def _union_find(n_nodes: np.ndarray, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = {int(v): int(v) for v in n_nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # resolve to component min (roots are mins because we always parent the max)
    return {v: find(v) for v in parent}


def _run_cc(edges, all_nodes=None, **kw):
    from pygeoops_ray.stages.graph import connected_components

    e = pa.table(
        {
            "src": np.array([a for a, _ in edges], np.int64),
            "dst": np.array([b for _, b in edges], np.int64),
        }
    )
    eds = rd.from_arrow(e).repartition(4)
    nds = None
    if all_nodes is not None:
        nds = rd.from_arrow(pa.table({"node_id": np.asarray(all_nodes, np.int64)})).repartition(3)
    out = connected_components(eds, "src", "dst", all_nodes_ds=nds, node_col="node_id", **kw)
    return out.to_pandas().sort_values("node").reset_index(drop=True)


def test_cc_matches_union_find_on_random_graph(ray_session):
    rng = np.random.default_rng(11)
    nodes = np.arange(200, dtype=np.int64)
    # random clumps + an explicit 12-node chain (forces >10 propagation rounds)
    edges = [tuple(sorted(p)) for p in rng.integers(0, 120, (60, 2)) if p[0] != p[1]]
    chain = [(i, i + 1) for i in range(130, 142)]
    edges += chain
    got = _run_cc(edges, all_nodes=nodes)
    want = _union_find(nodes, edges)
    assert len(got) == len(nodes)
    for _, row in got.iterrows():
        assert want[int(row["node"])] == int(row["cluster_id"])


def test_cc_empty_edges_all_singletons(ray_session):
    nodes = np.array([3, 7, 9], np.int64)
    got = _run_cc([], all_nodes=nodes)
    assert got["node"].tolist() == [3, 7, 9]
    assert (got["node"] == got["cluster_id"]).all()


def test_cc_clique_one_round(ray_session):
    # a clique collapses to its min in a single propagation round
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    got = _run_cc(edges)
    assert (got["cluster_id"] == 0).all()
    assert sorted(got["node"].tolist()) == [0, 1, 2, 3, 4]


def test_dup_clusters_query_invariants(ray_session):
    """Every jaccard pair shares a cluster; cluster_id is the cluster min."""
    from pygeoops_ray.pipelines.queries import QUERIES

    cc = QUERIES["dup_clusters"](SF).to_pandas()
    pairs = QUERIES["jaccard_pairs"](SF).to_pandas()
    lab = dict(zip(cc["doc_id"], cc["cluster_id"]))
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        assert lab[a] == lab[b]
    grp = cc.groupby("cluster_id")["doc_id"].min()
    assert (grp.index.to_numpy() == grp.to_numpy()).all()


# ---------------------------------------------------------------------------
# HyperLogLog sketch (stages/sketch.py)
# ---------------------------------------------------------------------------


def test_hll_estimate_accuracy():
    from pygeoops_ray.stages.sketch import hll_estimate, hll_partial

    vals = [f"tok_{i}" for i in range(50_000)]
    b, r = hll_partial(vals, p=12)
    est = hll_estimate(pd.DataFrame({"bucket": b, "r": r}), p=12)
    # sigma = 1.04/sqrt(4096) ~ 1.6%; 4 sigma bound
    assert abs(est - 50_000) / 50_000 < 0.065


def test_hll_merge_associative():
    from pygeoops_ray.stages.sketch import hll_partial

    vals = [f"v{i}" for i in range(5000)] + [f"v{i}" for i in range(2500)]  # dups
    bw, rw = hll_partial(vals, p=12)
    whole = dict(zip(bw, rw))
    merged: dict[int, int] = {}
    for chunk in (vals[:1700], vals[1700:4200], vals[4200:]):
        b, r = hll_partial(chunk, p=12)
        for bb, rr in zip(b, r):
            merged[bb] = max(merged.get(bb, 0), rr)
    assert merged == whole


def test_hll_query_registers_match_duckdb(ray_session):
    import duckdb

    from pygeoops_ray.pipelines.queries import ORACLE_SQL, QUERIES

    got = (
        QUERIES["vocab_hll"](SF).to_pandas().sort_values("bucket").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = con.execute(ORACLE_SQL["vocab_hll"]).df().sort_values("bucket").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ---------------------------------------------------------------------------
# proximity_pairs (stages/spatial.py) — PBSM reference-point dedup
# ---------------------------------------------------------------------------


def _brute_pairs(rects: pd.DataFrame, dist: float) -> set[tuple[int, int]]:
    out = set()
    r = rects.to_dict("records")
    for a in r:
        for b in r:
            if a["i"] >= b["i"]:
                continue
            xg = max(b["minx"] - a["maxx"], a["minx"] - b["maxx"], 0.0)
            yg = max(b["miny"] - a["maxy"], a["miny"] - b["maxy"], 0.0)
            if xg <= dist and yg <= dist:
                out.add((a["i"], b["i"]))
    return out


def test_proximity_pairs_vs_brute_force(ray_session):
    from pygeoops_ray.stages.spatial import proximity_pairs

    rng = np.random.default_rng(5)
    n = 300
    minx = rng.uniform(0, 4000, n)
    miny = rng.uniform(0, 4000, n)
    rects = pd.DataFrame(
        {
            "i": np.arange(n, dtype=np.int64),
            "minx": minx,
            "miny": miny,
            "maxx": minx + rng.uniform(10, 300, n),
            "maxy": miny + rng.uniform(10, 300, n),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(rects, preserve_index=False)).repartition(5)
    got = proximity_pairs(ds, dist=48.0).to_pandas()
    got_pairs = set(zip(got["img_a"], got["img_b"]))
    assert got_pairs == _brute_pairs(rects, 48.0)
    assert len(got) == len(got_pairs), "reference-point dedup emitted a pair twice"


def test_proximity_pairs_boundary_exact_gap_on_cell_edge(ray_session):
    """gap == dist with the touch point exactly on a 256-cell boundary —
    the closed-max-edge replication case."""
    from pygeoops_ray.stages.spatial import proximity_pairs

    rects = pd.DataFrame(
        {
            "i": np.array([0, 1, 2, 3], np.int64),
            # pair (0,1): a ends at 232, b starts at 280 -> gap 48, touch of
            # expanded rects at x=256 (cell boundary). pair (2,3): gap 49.
            "minx": [100.0, 280.0, 1000.0, 1305.0],
            "miny": [0.0, 0.0, 0.0, 0.0],
            "maxx": [232.0, 400.0, 1256.0, 1400.0],
            "maxy": [50.0, 50.0, 50.0, 50.0],
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(rects, preserve_index=False))
    got = proximity_pairs(ds, dist=48.0).to_pandas()
    pairs = set(zip(got["img_a"], got["img_b"]))
    assert (0, 1) in pairs
    assert (2, 3) not in pairs


# ---------------------------------------------------------------------------
# heavy_hitters (stages/sketch.py)
# ---------------------------------------------------------------------------


def _brute_topk(terms, k):
    from collections import Counter

    c = Counter(terms)
    order = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(t, n, i + 1) for i, (t, n) in enumerate(order)]


def _hh(terms, k, capacity):
    from pygeoops_ray.stages.sketch import heavy_hitters

    tbl = pa.table({"v": pa.array(terms, pa.string())})
    ds = rd.from_arrow(tbl).repartition(6)
    got = heavy_hitters(ds, "v", k=k, capacity=capacity)
    return list(zip(got["term"], got["n"], got["rank"]))


def test_heavy_hitters_skewed_exact(ray_session):
    rng = np.random.default_rng(3)
    # zipf-ish: term_j appears ~ 4000/(j+1) times
    terms = []
    for j in range(400):
        terms += [f"t{j:03d}"] * (4000 // (j + 1))
    rng.shuffle(terms)
    assert _hh(terms, 10, 64) == _brute_topk(terms, 10)


def test_heavy_hitters_flat_falls_back_exact(ray_session):
    # perfectly flat counts force the certificate to fail; the fallback
    # full count must still return the exact (tie-broken) top-k
    terms = [f"u{j:04d}" for j in range(3000)] * 2
    assert _hh(terms, 5, 8) == _brute_topk(terms, 5)


# ---------------------------------------------------------------------------
# knn_join_ring (stages/spatial.py) — neighbor-ring expansion
# ---------------------------------------------------------------------------


def _brute_knn(qdf, pts, k):
    out = []
    for _, qr in qdf.iterrows():
        d2 = ((pts["px"] - qr["qx"]) ** 2 + (pts["py"] - qr["qy"]) ** 2).astype(np.int64)
        cand = pd.DataFrame(
            {"event_id": pts["event_id"], "dist2": d2}
        )
        cand = cand[cand["event_id"] != qr["q_id"]]
        cand = cand.sort_values(["dist2", "event_id"]).head(k)
        for rnk, (_, row) in enumerate(cand.iterrows(), 1):
            out.append((int(qr["q_id"]), int(row["event_id"]), rnk, int(row["dist2"])))
    return out


def test_knn_join_ring_sparse_needs_multiple_rings(ray_session):
    """Points far apart: a query's 3rd neighbor lives 3+ cells away, so the
    resolution certificate must keep expanding rings before committing."""
    from pygeoops_ray.stages.spatial import knn_join_ring

    rng = np.random.default_rng(9)
    n = 40
    pts = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "px": np.floor(rng.uniform(0, 6000, n)),
            "py": np.floor(rng.uniform(0, 6000, n)),
        }
    )
    qdf = pd.DataFrame(
        {"q_id": pts["event_id"][:8], "qx": pts["px"][:8], "qy": pts["py"][:8]}
    )
    ds = rd.from_arrow(pa.Table.from_pandas(pts, preserve_index=False)).repartition(4)
    got = knn_join_ring(ds, qdf, k=3)
    got_t = list(zip(got["q_id"], got["event_id"], got["rnk"], got["dist2"]))
    assert [tuple(map(int, t)) for t in got_t] == _brute_knn(qdf, pts, 3)


def test_knn_join_ring_prunes_sink_files(ray_session, tmp_path):
    """The point side of each ring is a manifest-pruned read: with points
    spread over many spatial blocks and queries clustered in one corner,
    every ring must open only a small fraction of the sink's partition
    files — and a reused sink must not be rewritten."""
    import os

    from pygeoops_ray.stages.spatial import knn_join_ring

    rng = np.random.default_rng(4)
    n = 4000
    # points spread over a 40x40-cell area (cell=256) → many 8x8 blocks
    pts = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "px": np.floor(rng.uniform(0, 40 * 256, n)),
            "py": np.floor(rng.uniform(0, 40 * 256, n)),
        }
    )
    # queries clustered in the low corner
    qdf = pd.DataFrame(
        {
            "q_id": np.arange(5, dtype=np.int64) + 100000,
            "qx": np.array([10.0, 80.0, 300.0, 150.0, 40.0]),
            "qy": np.array([25.0, 60.0, 200.0, 90.0, 10.0]),
        }
    )
    sink = str(tmp_path / "pts_sink")
    ds = rd.from_arrow(pa.Table.from_pandas(pts, preserve_index=False)).repartition(4)
    stats: list = []
    got = knn_join_ring(ds, qdf, k=3, sink_dir=sink, ring_stats=stats)
    got_t = list(zip(got["q_id"], got["event_id"], got["rnk"], got["dist2"]))
    assert [tuple(map(int, t)) for t in got_t] == _brute_knn(qdf, pts, 3)
    # pruning really happened: each ring read a strict subset of the files
    assert stats, "no ring stats recorded"
    assert all(s["files_total"] >= 4 for s in stats)
    assert all(s["files_read"] < s["files_total"] for s in stats)
    assert min(s["files_read"] for s in stats) <= 2  # corner queries → 1-2 blocks
    # the sink persists and a second call REUSES it (no rewrite): mtimes fixed
    manifest = os.path.join(sink, "_manifest_main.jsonl")
    mtime = os.path.getmtime(manifest)
    got2 = knn_join_ring(ds, qdf, k=3, sink_dir=sink)
    assert os.path.getmtime(manifest) == mtime
    assert got2.equals(got)


def test_knn_join_ring_exact_ties(ray_session):
    """Four equidistant neighbors: rank order must follow (dist2, event_id)."""
    from pygeoops_ray.stages.spatial import knn_join_ring

    pts = pd.DataFrame(
        {
            "event_id": np.array([0, 1, 2, 3, 4], np.int64),
            "px": np.array([500.0, 400.0, 600.0, 500.0, 500.0]),
            "py": np.array([500.0, 500.0, 500.0, 400.0, 600.0]),
        }
    )
    qdf = pd.DataFrame({"q_id": [0], "qx": [500.0], "qy": [500.0]})
    ds = rd.from_arrow(pa.Table.from_pandas(pts, preserve_index=False))
    got = knn_join_ring(ds, qdf, k=3)
    assert got["event_id"].tolist() == [1, 2, 3]
    assert got["dist2"].tolist() == [10000, 10000, 10000]


# ---------------------------------------------------------------------------
# triangle_count (stages/graph.py)
# ---------------------------------------------------------------------------


def _brute_triangles(edges: list[tuple[int, int]]) -> int:
    es = {tuple(sorted(e)) for e in edges}
    nodes = sorted({v for e in es for v in e})
    cnt = 0
    for i, x in enumerate(nodes):
        for y in nodes[i + 1:]:
            if (x, y) not in es:
                continue
            for z in nodes:
                if z > y and (x, z) in es and (y, z) in es:
                    cnt += 1
    return cnt


def test_triangle_count_vs_brute_force(ray_session):
    from pygeoops_ray.stages.graph import triangle_count

    rng = np.random.default_rng(21)
    edges = list({tuple(sorted(p)) for p in rng.integers(0, 40, (160, 2)) if p[0] != p[1]})
    e = pa.table(
        {
            "a": np.array([x for x, _ in edges], np.int64),
            "b": np.array([y for _, y in edges], np.int64),
        }
    )
    ds = rd.from_arrow(e).repartition(5)
    assert triangle_count(ds, "a", "b") == _brute_triangles(edges)


def test_triangle_count_join_path_high_v(ray_session):
    """broadcast_threshold=0 forces the degree shuffle-join path (the
    general-graph shape where |V| ~ corpus and the degree map must never
    land on the driver); counts must match the broadcast path and brute
    force, including on a skew graph with one hub."""
    from pygeoops_ray.stages.graph import triangle_count

    rng = np.random.default_rng(33)
    edges = list({tuple(sorted(p)) for p in rng.integers(0, 60, (240, 2)) if p[0] != p[1]})
    # skew: a hub node connected to everyone (degree orientation must still
    # bound its out-degree)
    edges += [(100, i) for i in range(0, 60, 2)]
    edges = list(set(edges))
    e = pa.table(
        {
            "a": np.array([x for x, _ in edges], np.int64),
            "b": np.array([y for _, y in edges], np.int64),
        }
    )
    ds = rd.from_arrow(e).repartition(5)
    want = _brute_triangles(edges)
    assert triangle_count(ds, "a", "b", broadcast_threshold=0, local_threshold=0) == want
    assert triangle_count(ds, "a", "b") == want


def test_cc_singletons_anti_cogroup_path(ray_session):
    """broadcast_threshold=0 forces the distributed anti-cogroup singleton
    pass; the full label set must match union-find + lone nodes."""
    rng = np.random.default_rng(7)
    nodes = np.arange(150, dtype=np.int64)
    edges = [tuple(sorted(p)) for p in rng.integers(0, 90, (50, 2)) if p[0] != p[1]]
    got = _run_cc(edges, all_nodes=nodes, broadcast_threshold=0)
    want = _union_find(nodes, edges)
    assert len(got) == len(nodes)
    assert not got["node"].duplicated().any()
    for _, row in got.iterrows():
        assert want[int(row["node"])] == int(row["cluster_id"])


def _brute_pagerank_int(edges, n_iters=5, scale=10**9):
    """Reference fixed-point PageRank: same integer update rule."""
    import collections

    adj = collections.defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    rank = {v: scale for v in adj}
    base = (15 * scale) // 100
    for _ in range(n_iters):
        msg = collections.defaultdict(int)
        for v, nbrs in adj.items():
            c = rank[v] // len(nbrs)
            for u in nbrs:
                msg[u] += c
        rank = {v: base + (85 * msg[v]) // 100 for v in adj}
    return rank


def test_pagerank_matches_integer_reference(ray_session):
    from pygeoops_ray.stages.graph import pagerank

    rng = np.random.default_rng(17)
    edges = list({tuple(sorted(p)) for p in rng.integers(0, 50, (120, 2)) if p[0] != p[1]})
    # hub + chain for structure variety
    edges += [(200, i) for i in range(0, 20, 2)]
    edges += [(300 + i, 301 + i) for i in range(6)]
    edges = list(set(edges))
    e = pa.table(
        {
            "a": np.array([x for x, _ in edges], np.int64),
            "b": np.array([y for _, y in edges], np.int64),
        }
    )
    got = (
        pagerank(rd.from_arrow(e).repartition(4), "a", "b", n_iters=5)
        .to_pandas()
        .set_index("node")["rank"]
    )
    want = _brute_pagerank_int(edges, n_iters=5)
    assert len(got) == len(want)
    for v, r in want.items():
        assert int(got.loc[v]) == r, (v, int(got.loc[v]), r)


def test_pagerank_empty_edges(ray_session):
    from pygeoops_ray.stages.graph import pagerank

    e = pa.table({"a": np.array([], np.int64), "b": np.array([], np.int64)})
    assert len(pagerank(rd.from_arrow(e), "a", "b").to_pandas()) == 0


def test_triangle_count_degenerate(ray_session):
    from pygeoops_ray.stages.graph import triangle_count

    # single triangle + a pendant edge + a disconnected edge
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (10, 11)]
    e = pa.table(
        {
            "a": np.array([x for x, _ in edges], np.int64),
            "b": np.array([y for _, y in edges], np.int64),
        }
    )
    assert triangle_count(rd.from_arrow(e), "a", "b") == 1


def test_pagerank_local_fast_path_matches_distributed(ray_session):
    """The small-graph single-task path must be bit-identical to the
    distributed per-round loop (integer fixed-point makes this exact)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pygeoops_ray.stages.graph import pagerank

    rng = np.random.default_rng(3)
    e = pd.DataFrame({"a": rng.integers(0, 300, 900), "b": rng.integers(0, 300, 900)})
    e = e[e.a != e.b].drop_duplicates()
    ds = rd.from_pandas(e)
    loc = pagerank(ds, "a", "b", n_edges_hint=len(e)).to_pandas()
    dist = pagerank(ds, "a", "b", n_edges_hint=len(e), local_threshold=0).to_pandas()
    loc = loc.sort_values("node").reset_index(drop=True)
    dist = dist.sort_values("node").reset_index(drop=True)
    assert loc.equals(dist)


def test_cc_local_fast_path_matches_distributed(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pygeoops_ray.stages.graph import connected_components

    rng = np.random.default_rng(5)
    e = pd.DataFrame({"a": rng.integers(0, 500, 700), "b": rng.integers(0, 500, 700)})
    e = e[e.a != e.b].drop_duplicates()
    ds = rd.from_pandas(e)
    loc = connected_components(ds, "a", "b", n_edges_hint=len(e)).to_pandas()
    dist = connected_components(
        ds, "a", "b", n_edges_hint=len(e), local_threshold=0
    ).to_pandas()
    loc = loc.sort_values("node").reset_index(drop=True)
    dist = dist.sort_values("node").reset_index(drop=True)
    assert loc.equals(dist)
