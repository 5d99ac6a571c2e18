"""Distributed connected components — duplicate-CLUSTER formation.

Pair-producing dedup operators (MinHash-LSH, exact Jaccard, SimHash,
phash-hamming) emit edges; curation needs the transitive closure: "keep one
document per near-duplicate CLUSTER", and clusters are the connected
components of the pair graph (a~b, b~c => {a,b,c} even if a and c were never
compared).

Algorithm: iterative MIN-LABEL PROPAGATION. Every node starts labeled with
its own id; each round every node's label becomes the min of its own and its
neighbors' labels; at fixpoint label(v) = min node id of v's component.

Execution shape: ONE coarse-bucket shuffle per round. Rows are keyed by node
id; a round's input is the previous round's output UNION the static edge
rows (same key space — a node's self row, its incoming messages, and its
outgoing edges all land in the same bucket). The bucket reducer applies the
min, emits the node's updated self row, AND immediately emits next-round
messages along the node's outgoing edges — min-combine and forward are
pipelined into the same exchange instead of alternating two shuffles.

Why this variant at 100-TB scale: each round moves a BOUNDED volume —
|V| self rows + |E| messages + |E| edge rows — with no intermediate growth
(hash-to-min style set-carrying variants converge in fewer rounds but their
per-round state can blow up to the component size). Round count equals the
graph diameter + 1, and near-duplicate graphs are dense clumps with tiny
diameters (a clique converges in 2 rounds). The state is materialized once
per round so lineage stays flat and the executor can free the previous
round's blocks; the fixpoint test is a metadata-cheap sum over the
``changed`` column.

Determinism: min is order-independent; coarse buckets use the fixed
``pd.util.hash_pandas_object`` key, so results are exact and reproducible —
the driver oracle replays the closure with a recursive SQL CTE.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pygeoops_ray.stages.groupagg import _bucket_count

__all__ = ["connected_components", "triangle_count", "pagerank"]

# is_self row tags: 0 = message, 1 = node self row, 2 = static edge row
_MSG, _SELF, _EDGE = 0, 1, 2


def _empty_labels() -> pa.Table:
    return pa.Table.from_pydict(
        {
            "node": pa.array([], pa.int64()),
            "cluster_id": pa.array([], pa.int64()),
        }
    )


def _step(df: pd.DataFrame) -> pd.DataFrame:
    """One pipelined round inside a bucket: min-combine + forward.

    A node's label can only DECREASE and never drops below any id, so an
    implied (key, key) candidate is always safe to add — it bootstraps the
    first round (no self rows yet) and is a no-op afterwards.
    """
    is_edge = df["is_self"].to_numpy() == _EDGE
    ed = df[is_edge]
    ca = df[~is_edge]
    keys_all = np.union1d(ed["key"].unique(), ca["key"].unique()).astype(np.int64)

    aug = pd.DataFrame(
        {
            "key": np.concatenate([ca["key"].to_numpy(), keys_all]),
            "cand": np.concatenate([ca["cand"].to_numpy(), keys_all]),
        }
    )
    new = aug.groupby("key", sort=False)["cand"].min()
    old = ca[ca["is_self"] == _SELF].set_index("key")["cand"]
    old = old.reindex(new.index)
    # nodes without a self row yet (bootstrap) had label == their own id
    old = old.fillna(pd.Series(new.index.to_numpy(), index=new.index))
    changed = (new < old).astype(np.int8)

    lab = pd.DataFrame({"key": new.index.to_numpy(), "lab": new.to_numpy()})
    m = ed[["key", "cand"]].merge(lab, on="key", how="inner")

    return pd.DataFrame(
        {
            "key": np.concatenate([lab["key"].to_numpy(), m["cand"].to_numpy()]),
            "cand": np.concatenate([lab["lab"].to_numpy(), m["lab"].to_numpy()]),
            "is_self": np.concatenate(
                [
                    np.full(len(lab), _SELF, dtype=np.int8),
                    np.full(len(m), _MSG, dtype=np.int8),
                ]
            ),
            "changed": np.concatenate(
                [changed.to_numpy(), np.zeros(len(m), dtype=np.int8)]
            ),
        }
    )


def connected_components(
    edges_ds,
    src_col: str,
    dst_col: str,
    all_nodes_ds=None,
    node_col: str | None = None,
    n_edges_hint: int | None = None,
    max_iters: int = 64,
    broadcast_threshold: int = 1_000_000,
    local_threshold: int = 1_000_000,
):
    """Connected components of the undirected graph given by ``edges_ds``.

    Returns a Dataset with columns ``(node: int64, cluster_id: int64)`` where
    ``cluster_id`` is the smallest node id in the node's component.

    ``all_nodes_ds`` (optional, with ``node_col``) adds nodes that touch no
    edge as singleton components (cluster_id = node). While the edge-ENDPOINT
    set is small (duplicate density is low in practice) it broadcasts as a
    sorted id array and anti-filters the node stream inside ``map_batches``;
    past ``broadcast_threshold`` endpoints the pass switches to a
    distributed anti-COGROUP (labels ∪ nodes keyed by id, one coarse-bucket
    exchange) so no O(|V|) array ever lands on the driver.
    """
    import ray
    import ray.data as rd

    nb = _bucket_count(16, (n_edges_hint or 0) * 2 or None)

    # -- symmetrize: one row per directed edge (s -> d), both directions ----
    def sym(batch: pa.Table) -> pa.Table:
        s = batch[src_col].to_numpy().astype(np.int64)
        d = batch[dst_col].to_numpy().astype(np.int64)
        n2 = 2 * len(s)
        return pa.Table.from_pydict(
            {
                "key": pa.array(np.concatenate([s, d]), pa.int64()),
                "cand": pa.array(np.concatenate([d, s]), pa.int64()),
                "is_self": pa.array(np.full(n2, _EDGE, dtype=np.int8), pa.int8()),
                "changed": pa.array(np.zeros(n2, dtype=np.int8), pa.int8()),
            }
        )

    # coalesced once: the static edge table re-enters every round's exchange
    # (same measured win as pagerank — many tiny upstream blocks pay
    # per-block sort overhead once per round otherwise)
    edges = (
        edges_ds.map_batches(sym, batch_format="pyarrow").repartition(nb).materialize()
    )
    n_dir_edges = edges.count()

    if n_dir_edges == 0:
        labels = rd.from_arrow(_empty_labels())
    else:
        if n_dir_edges <= local_threshold:
            # Small-graph fast path (same as pagerank): below ~1M symmetric
            # edge rows, per-round exchange fixed cost dominates — one Ray
            # task iterates the SAME _step reducer to the fixpoint locally
            # (min-label propagation is order-independent, so the labels
            # are identical to the distributed loop's).
            def all_rounds(df: pd.DataFrame) -> pd.DataFrame:
                st = _step(df)
                for _ in range(max_iters):
                    st = _step(pd.concat([st, df], ignore_index=True))
                    if int(st["changed"].sum()) == 0:
                        break
                return st

            state = edges.repartition(1).map_batches(
                all_rounds, batch_format="pandas", batch_size=None
            ).materialize()
        else:
            state = _bucketed_pd(edges, ["key"], _step, nb).materialize()
            for _ in range(max_iters):
                # round 1's changed is always 0 (messages only in flight), so
                # the bootstrap runs above and the check leads every later
                # round
                state = _bucketed_pd(
                    state.union(edges), ["key"], _step, nb
                ).materialize()
                if state.sum("changed") == 0:
                    break

        def finalize(batch: pa.Table) -> pa.Table:
            keep = pa.compute.equal(batch["is_self"], _SELF)
            out = batch.filter(keep)
            return pa.Table.from_pydict(
                {"node": out["key"], "cluster_id": out["cand"]}
            )

        labels = state.map_batches(finalize, batch_format="pyarrow", batch_size=None)

    if all_nodes_ds is None:
        return labels

    # -- append singleton components (nodes with no edges) ------------------
    if n_dir_edges == 0:
        def all_single(batch: pa.Table) -> pa.Table:
            nodes = batch[node_col].to_numpy().astype(np.int64)
            return pa.Table.from_pydict(
                {
                    "node": pa.array(nodes, pa.int64()),
                    "cluster_id": pa.array(nodes, pa.int64()),
                }
            )

        return all_nodes_ds.map_batches(all_single, batch_format="pyarrow")

    labels = labels.materialize()
    n_endpoints = labels.count()
    if n_endpoints <= broadcast_threshold:
        endpoints = labels.select_columns(["node"]).to_pandas()["node"].to_numpy()
        ep_ref = ray.put(np.sort(endpoints))

        def singletons(batch: pa.Table) -> pa.Table:
            nodes = batch[node_col].to_numpy().astype(np.int64)
            ep = ray.get(ep_ref)
            keep = nodes[~np.isin(nodes, ep)]
            return pa.Table.from_pydict(
                {
                    "node": pa.array(keep, pa.int64()),
                    "cluster_id": pa.array(keep, pa.int64()),
                }
            )

        lone = all_nodes_ds.map_batches(singletons, batch_format="pyarrow")
        return labels.union(lone)

    # endpoint set too big to broadcast: distributed anti-cogroup — labeled
    # rows and candidate nodes land in the same bucket; a node with no label
    # row is a singleton. One exchange, no driver array.
    def node_rows(batch: pa.Table) -> pa.Table:
        nodes = batch[node_col].to_numpy().astype(np.int64)
        return pa.Table.from_pydict(
            {
                "node": pa.array(nodes, pa.int64()),
                "cluster_id": pa.array(np.full(len(nodes), -1, np.int64), pa.int64()),
            }
        )

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        labeled = df.loc[df["cluster_id"] >= 0]
        cand = df.loc[df["cluster_id"] < 0, "node"].to_numpy()
        lone_ids = cand[~np.isin(cand, labeled["node"].to_numpy())]
        return pd.DataFrame(
            {
                "node": np.concatenate([labeled["node"].to_numpy(), lone_ids]),
                "cluster_id": np.concatenate(
                    [labeled["cluster_id"].to_numpy(), lone_ids]
                ),
            }
        )

    cand = all_nodes_ds.map_batches(node_rows, batch_format="pyarrow")
    nb2 = _bucket_count(16, n_endpoints * 2)
    return _bucketed_pd(labels.union(cand), ["node"], anti, nb2)


def pagerank(
    edges_ds,
    src_col: str,
    dst_col: str,
    n_iters: int = 5,
    scale: int = 10**9,
    n_edges_hint: int | None = None,
    local_threshold: int = 1_000_000,
):
    """Fixed-iteration PageRank over the UNDIRECTED graph, integer-exact.

    All arithmetic is int64 fixed-point (ranks scaled by ``scale``, damping
    0.85 as ``(85 * x) // 100``, per-edge contribution ``rank // degree``),
    so the result is bit-identical regardless of message order or
    partitioning — a SQL oracle replays the same ``n_iters`` updates as
    chained integer CTEs. Undirected dup graphs have no dangling nodes
    (every node lies on an edge), so no sink redistribution term exists.

    Execution shape (same as connected_components): ONE coarse-bucket
    cogroup per iteration — a node's self row (its current rank), its
    incoming messages, and its static out-edge rows land in the same
    bucket; the reducer folds messages into the new rank and immediately
    emits the next round's outgoing messages, so update and forward share
    the exchange. Per-round volume is |V| + 2|E| + messages, bounded.

    Returns a Dataset (node: int64, rank: int64) with
    rank ≈ scale * pagerank(v); sum(rank) ≈ scale * N.
    """
    import ray.data as rd

    nb = _bucket_count(16, (n_edges_hint or 0) * 2 or None)

    def sym(batch: pa.Table) -> pa.Table:
        s = batch[src_col].to_numpy().astype(np.int64)
        d = batch[dst_col].to_numpy().astype(np.int64)
        n2 = 2 * len(s)
        return pa.Table.from_pydict(
            {
                "key": pa.array(np.concatenate([s, d]), pa.int64()),
                "cand": pa.array(np.concatenate([d, s]), pa.int64()),
                "val": pa.array(np.zeros(n2, np.int64), pa.int64()),
                "is_self": pa.array(np.full(n2, _EDGE, dtype=np.int8), pa.int8()),
            }
        )

    # Coalesce the static edge table once: it re-enters the exchange every
    # round, and a union of many tiny upstream blocks pays per-block sort
    # overhead n_iters times. nb blocks ≈ one per bucket.
    edges = (
        edges_ds.map_batches(sym, batch_format="pyarrow").repartition(nb).materialize()
    )
    if edges.count() == 0:
        return rd.from_arrow(
            pa.Table.from_pydict(
                {"node": pa.array([], pa.int64()), "rank": pa.array([], pa.int64())}
            )
        )
    base = (15 * scale) // 100  # (1 - d) * scale, d = 0.85

    def step(first: bool):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            is_edge = df["is_self"].to_numpy() == _EDGE
            ed = df[is_edge]
            deg = ed.groupby("key", sort=False)["cand"].count()
            if first:
                # bootstrap: every node starts at rank = scale (uniform up
                # to the common N factor, which the fixpoint re-weights)
                rank = pd.Series(np.int64(scale), index=deg.index)
            else:
                msgs = df[df["is_self"].to_numpy() == _MSG]
                msum = msgs.groupby("key", sort=False)["val"].sum()
                msum = msum.reindex(deg.index, fill_value=0)
                rank = base + (85 * msum) // 100
            # forward: each out-edge carries rank // degree to its target
            contrib = (rank // deg).reindex(ed["key"].to_numpy()).to_numpy()
            return pd.DataFrame(
                {
                    "key": np.concatenate([deg.index.to_numpy(), ed["cand"].to_numpy()]),
                    "cand": np.zeros(len(deg) + len(ed), np.int64),
                    "val": np.concatenate([rank.to_numpy(), contrib]),
                    "is_self": np.concatenate(
                        [
                            np.full(len(deg), _SELF, np.int8),
                            np.full(len(ed), _MSG, np.int8),
                        ]
                    ),
                }
            )

        return fn

    # Small-graph fast path: below ~1M symmetric edge rows the per-round
    # exchange FIXED cost dominates (a 477-node dup graph spent ~1.3 s per
    # round on shuffle machinery moving a few KB). One Ray task then runs
    # every iteration locally through the SAME step() reducers — integer
    # fixed-point makes the result bit-identical to the distributed loop,
    # which remains the path for graphs that don't fit one task.
    if edges.count() <= local_threshold:

        def all_rounds(df: pd.DataFrame) -> pd.DataFrame:
            st = step(first=True)(df)
            for _ in range(n_iters):
                st = step(first=False)(
                    pd.concat([st, df], ignore_index=True)
                )
            return st

        state = edges.repartition(1).map_batches(
            all_rounds, batch_format="pandas", batch_size=None
        )
    else:
        # Per-round materialize is deliberate (measured): chaining all
        # rounds lazily into one plan (no materialize) ran 16-21 s vs 10 s
        # at sf0.1 — the deep chained-Sort lineage costs more than n_iters
        # separate executions on this Ray version. Keep rounds materialized
        # (also gives flat lineage, same as connected_components).
        state = _bucketed_pd(edges, ["key"], step(first=True), nb).materialize()
        for _ in range(n_iters):
            state = _bucketed_pd(
                state.union(edges), ["key"], step(first=False), nb
            ).materialize()

    def finalize(batch: pa.Table) -> pa.Table:
        keep = pa.compute.equal(batch["is_self"], _SELF)
        out = batch.filter(keep)
        return pa.Table.from_pydict({"node": out["key"], "rank": out["val"]})

    return state.map_batches(finalize, batch_format="pyarrow", batch_size=None)


def _orient_by_join(edges, deg_ds, src_col: str, dst_col: str, n_nodes: int):
    """Degree-orient edges WITHOUT a driver broadcast: attach each
    endpoint's degree through a coarse-bucket cogroup (edge rows and degree
    rows keyed by the same node id land in the same bucket), one exchange
    per endpoint, then orient locally. Volume per exchange = |E| + |V|."""
    nb = _bucket_count(16, n_nodes * 2)

    def deg_rows(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "node": batch["node"],
                "other": pa.array(np.full(batch.num_rows, -1, np.int64), pa.int64()),
                "val": pa.array(
                    batch["deg"].to_numpy().astype(np.int64), pa.int64()
                ),
                "kind": pa.array(np.ones(batch.num_rows, np.int8), pa.int8()),
            }
        )

    def edge_rows1(batch: pa.Table) -> pa.Table:
        a = batch[src_col].to_numpy().astype(np.int64)
        b = batch[dst_col].to_numpy().astype(np.int64)
        return pa.Table.from_pydict(
            {
                "node": pa.array(a, pa.int64()),
                "other": pa.array(b, pa.int64()),
                "val": pa.array(np.full(len(a), -1, np.int64), pa.int64()),
                "kind": pa.array(np.zeros(len(a), np.int8), pa.int8()),
            }
        )

    def attach_first(df: pd.DataFrame) -> pd.DataFrame:
        dmap = df.loc[df["kind"] == 1].set_index("node")["val"]
        e = df.loc[df["kind"] == 0]
        # re-key by the SECOND endpoint for pass 2; carry deg(first) in val
        return pd.DataFrame(
            {
                "node": e["other"].to_numpy(),
                "other": e["node"].to_numpy(),
                "val": dmap.reindex(e["node"]).to_numpy(dtype=np.int64),
                "kind": np.zeros(len(e), np.int8),
            }
        )

    def attach_second(df: pd.DataFrame) -> pd.DataFrame:
        dmap = df.loc[df["kind"] == 1].set_index("node")["val"]
        e = df.loc[df["kind"] == 0]
        b = e["node"].to_numpy()
        a = e["other"].to_numpy()
        da = e["val"].to_numpy()
        db = dmap.reindex(e["node"]).to_numpy(dtype=np.int64)
        a_first = (da < db) | ((da == db) & (a < b))
        return pd.DataFrame(
            {"src": np.where(a_first, a, b), "dst": np.where(a_first, b, a)}
        )

    degs = deg_ds.map_batches(deg_rows, batch_format="pyarrow")
    pass1 = _bucketed_pd(
        edges.map_batches(edge_rows1, batch_format="pyarrow").union(degs),
        ["node"],
        attach_first,
        nb,
    )
    return _bucketed_pd(pass1.union(degs), ["node"], attach_second, nb)


def _bucketed_pd(ds, key_cols, reducer, n_buckets: int):
    """groupagg._bucketed with the metadata-free Arrow contract, kept local so
    the reducer may change the schema freely."""

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[key_cols], index=False).to_numpy()
        df = df.copy()
        df["_gb"] = (h % n_buckets).astype("int64")
        return df

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        out = pa.Table.from_pandas(reducer(g.drop(columns=["_gb"])), preserve_index=False)
        return out.replace_schema_metadata(None)

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_gb")
        .map_groups(per_bucket, batch_format="pandas")
    )


def triangle_count(
    edges_ds,
    src_col: str,
    dst_col: str,
    n_edges_hint: int | None = None,
    broadcast_threshold: int = 1_000_000,
    local_threshold: int = 200_000,
):
    """EXACT triangle count of the undirected graph (node-iterator / wedge
    counting with DEGREE orientation).

    Every edge is oriented from its (degree, id)-smaller endpoint to the
    larger; each triangle then has exactly one PIVOT (its smallest vertex
    in that order) and is counted once: the pivot emits the wedge {x, y}
    over its out-neighbors, and the wedge is a triangle iff the oriented
    edge (x, y) exists. Degree orientation bounds every node's out-degree
    by O(sqrt(|E|)) — the wedge volume is O(|E|^1.5) worst case instead of
    the star-explosion an id-only orientation allows.

    Shapes: degrees are one grouped count. While the node set is small
    (≤ ``broadcast_threshold`` — the dup-graph case, endpoints bounded by
    duplicate density) the degree map broadcasts via ``ray.put``; past it,
    degrees attach to edges through TWO coarse-bucket cogroups (one per
    endpoint), so a general corpus-scale graph never lands a node array on
    the driver. Wedge generation groups by pivot; the wedge⋈edge
    semi-count is one tagged coarse-bucket cogroup keyed by the wedge
    pair. Returns the integer count.
    """
    import ray

    from pygeoops_ray.stages.groupagg import grouped_count

    edges = edges_ds.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return 0

    # Small-graph fast path (pagerank/kcore design): under ~200k edges the
    # whole count runs in ONE task with the identical degree-orientation +
    # wedge-membership algorithm — exchanges at this size are pure fixed
    # cost. Exactness is trivial (it is a count of the same triangle set).
    if n_edges <= local_threshold:

        def local_tri(df: pd.DataFrame) -> pd.DataFrame:
            a = df[src_col].to_numpy().astype(np.int64)
            b = df[dst_col].to_numpy().astype(np.int64)
            nodes, deg = np.unique(np.concatenate([a, b]), return_counts=True)
            da = deg[np.searchsorted(nodes, a)]
            db = deg[np.searchsorted(nodes, b)]
            a_first = (da < db) | ((da == db) & (a < b))
            src = np.where(a_first, a, b)
            dst = np.where(a_first, b, a)
            sorder = np.lexsort((dst, src))
            s_s, d_s = src[sorder], dst[sorder]
            starts = np.flatnonzero(
                np.concatenate([[True], s_s[1:] != s_s[:-1]])
            )
            ends = np.concatenate([starts[1:], [len(s_s)]])
            wx, wy = [], []
            for st, en in zip(starts, ends):
                k = en - st
                if k < 2:
                    continue
                d = d_s[st:en]
                iu = np.triu_indices(k, 1)
                wx.append(d[iu[0]])
                wy.append(d[iu[1]])
            if not wx:
                return pd.DataFrame({"partial": [0]})
            x = np.concatenate(wx)
            y = np.concatenate(wy)
            wpairs = pd.DataFrame(
                {"x": np.minimum(x, y), "y": np.maximum(x, y)}
            )
            epairs = pd.DataFrame(
                {"x": np.minimum(src, dst), "y": np.maximum(src, dst)}
            ).drop_duplicates()
            n = len(wpairs.merge(epairs, on=["x", "y"], how="inner"))
            return pd.DataFrame({"partial": [int(n)]})

        parts = edges.repartition(1).map_batches(
            local_tri, batch_format="pandas", batch_size=None
        )
        return int(parts.sum("partial") or 0)

    def sym(batch: pa.Table) -> pa.Table:
        s = batch[src_col].to_numpy().astype(np.int64)
        d = batch[dst_col].to_numpy().astype(np.int64)
        return pa.Table.from_pydict(
            {"node": pa.array(np.concatenate([s, d]), pa.int64())}
        )

    deg_ds = grouped_count(
        edges.map_batches(sym, batch_format="pyarrow"), ["node"], "deg", n_buckets=8
    ).materialize()
    n_nodes = deg_ds.count()

    if n_nodes <= broadcast_threshold:
        deg = deg_ds.to_pandas()
        ids = deg["node"].to_numpy()
        order = np.argsort(ids)
        deg_ref = ray.put((ids[order], deg["deg"].to_numpy()[order]))

        def orient(batch: pa.Table) -> pa.Table:
            ids_s, degs = ray.get(deg_ref)
            a = batch[src_col].to_numpy().astype(np.int64)
            b = batch[dst_col].to_numpy().astype(np.int64)
            da = degs[np.searchsorted(ids_s, a)]
            db = degs[np.searchsorted(ids_s, b)]
            # a before b in the (degree, id) total order?
            a_first = (da < db) | ((da == db) & (a < b))
            src = np.where(a_first, a, b)
            dst = np.where(a_first, b, a)
            return pa.Table.from_pydict(
                {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
            )

        oriented = edges.map_batches(orient, batch_format="pyarrow")
    else:
        oriented = _orient_by_join(edges, deg_ds, src_col, dst_col, n_nodes)

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g_ in df.groupby("src", sort=False):
            d = np.sort(g_["dst"].to_numpy())
            k = len(d)
            if k < 2:
                continue
            iu = np.triu_indices(k, 1)
            outs.append(np.stack([d[iu[0]], d[iu[1]]], axis=1))
        if not outs:
            return pd.DataFrame({"x": pd.Series([], dtype=np.int64),
                                 "y": pd.Series([], dtype=np.int64),
                                 "kind": pd.Series([], dtype=np.int8)})
        w = np.concatenate(outs)
        # canonical pair key by id (the edge side uses the same key rule)
        x = np.minimum(w[:, 0], w[:, 1])
        y = np.maximum(w[:, 0], w[:, 1])
        return pd.DataFrame({"x": x, "y": y, "kind": np.int8(0)})

    wedge_ds = _bucketed_pd(oriented, ["src"], wedges, 16)

    def edge_rows(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy()
        d = batch["dst"].to_numpy()
        return pa.Table.from_pydict(
            {
                "x": pa.array(np.minimum(s, d), pa.int64()),
                "y": pa.array(np.maximum(s, d), pa.int64()),
                "kind": pa.array(np.ones(len(s), np.int8), pa.int8()),
            }
        )

    tagged = wedge_ds.union(oriented.map_batches(edge_rows, batch_format="pyarrow"))

    def count_matches(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["x", "y"], sort=False)["kind"]
        # per pair: wedge occurrences x edge presence (edges are unique pairs)
        stats = g.agg([("n_wedge", lambda s: int((s == 0).sum())),
                       ("has_edge", lambda s: int((s == 1).any()))])
        n = int((stats["n_wedge"] * stats["has_edge"]).sum())
        return pd.DataFrame({"partial": [n]})

    parts = _bucketed_pd(tagged, ["x", "y"], count_matches, 16)
    return int(parts.sum("partial") or 0)


def kcore(
    edges_ds,
    src_col: str,
    dst_col: str,
    k: int = 2,
    max_rounds: int = 8,
    n_edges_hint: int | None = None,
):
    """k-core decomposition by iterative peeling: repeatedly remove nodes of
    degree < k (with their edges) until a fixpoint; the survivors are the
    k-core — the dense kernel of a duplicate/citation graph that survives
    any k-1 deletions.

    Distributed shape: each round is ONE bounded exchange over the SHRINKING
    edge set — per-block partial degree counts → grouped sum → sub-k node
    set → edge filter (the sub-k set is bounded by the nodes removed this
    round and broadcasts via ``ray.put``; rounds stop early when it is
    empty). ``max_rounds`` caps the rounds for a deterministic SQL replay
    (``conv_ok`` reports whether the fixpoint was reached — a non-converged
    run turns the driver hash red only through that bit, never by looping
    forever). Output: (node, degree, conv_ok) for the surviving core.
    """
    import ray

    from pygeoops_ray.stages.groupagg import grouped_agg

    nb = _bucket_count(8, (n_edges_hint or 0) * 2 or None)

    def sym(batch: pa.Table) -> pa.Table:
        s = batch[src_col].to_numpy().astype(np.int64)
        d = batch[dst_col].to_numpy().astype(np.int64)
        return pa.Table.from_pydict(
            {
                "a": pa.array(np.concatenate([s, d]), pa.int64()),
                "b": pa.array(np.concatenate([d, s]), pa.int64()),
            }
        )

    # set semantics: duplicate input edges must not inflate degrees — one
    # grouped distinct over the symmetrized rows
    sym_rows = edges_ds.map_batches(sym, batch_format="pyarrow")
    cur = (
        grouped_agg(sym_rows, ["a", "b"], [("a", "size", "_n")], n_buckets=nb)
        .select_columns(["a", "b"])
        .materialize()
    )
    # Small-graph fast path (the pagerank local_threshold design): below ~1M
    # symmetric rows the per-round exchange FIXED cost dominates a graph
    # whose whole edge set fits one task. One task runs the identical peel
    # loop — integer set semantics make the result bit-identical to the
    # distributed loop, which remains the path for larger graphs.
    if cur.count() <= 1_000_000:
        import pandas as pd

        def all_peels(df: pd.DataFrame) -> pd.DataFrame:
            a = df["a"].to_numpy()
            b = df["b"].to_numpy()
            conv_l = 0
            for _ in range(max_rounds):
                nodes, deg_l = np.unique(a, return_counts=True)
                sub = nodes[deg_l < k]
                if len(sub) == 0:
                    conv_l = 1
                    break
                keep = ~(np.isin(a, sub) | np.isin(b, sub))
                a, b = a[keep], b[keep]
            nodes, deg_l = np.unique(a, return_counts=True)
            if conv_l == 0 and (len(nodes) == 0 or (deg_l >= k).all()):
                # same post-loop convergence-by-final-state check as below
                conv_l = 1
            return pd.DataFrame(
                {
                    "node": nodes.astype(np.int64),
                    "degree": deg_l.astype(np.int64),
                    "conv_ok": np.full(len(nodes), conv_l, np.int64),
                }
            )

        return cur.repartition(1).map_batches(
            all_peels, batch_format="pandas", batch_size=None
        )

    conv = 0
    for _ in range(max_rounds):
        deg = grouped_agg(cur, ["a"], [("b", "size", "deg")], n_buckets=nb)
        sub_df = deg.filter(expr=f"deg < {k}").select_columns(["a"]).to_pandas()
        if "a" not in sub_df.columns or not len(sub_df):
            conv = 1
            break
        sub = sub_df["a"]
        drop_ref = ray.put(np.sort(sub.to_numpy()))

        def peel(batch: pa.Table, _ref=drop_ref) -> pa.Table:
            drop = ray.get(_ref)
            a = batch["a"].to_numpy()
            b = batch["b"].to_numpy()
            keep = ~(np.isin(a, drop) | np.isin(b, drop))
            return batch.filter(pa.array(keep))

        cur = cur.map_batches(peel, batch_format="pyarrow").materialize()

    deg = grouped_agg(cur, ["a"], [("b", "size", "deg")], n_buckets=nb)

    if conv == 0:
        # A graph can converge in exactly max_rounds peels (the last round
        # drops nodes but the loop exits before observing the now-empty
        # sub-k set).  One extra degree check on the final edge set decides
        # convergence by the surviving state, matching the SQL oracle's
        # "post-round edge set has no degree<k node" definition.
        deg = deg.materialize()
        if deg.filter(expr=f"deg < {k}").count() == 0:
            conv = 1

    def final(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "node": batch["a"],
                "degree": batch["deg"],
                "conv_ok": pa.array(
                    np.full(batch.num_rows, conv, np.int64), pa.int64()
                ),
            }
        )

    return deg.map_batches(final, batch_format="pyarrow")
