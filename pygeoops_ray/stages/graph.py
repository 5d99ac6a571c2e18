"""Distributed connected components — duplicate-CLUSTER formation.

Pair-producing dedup operators (MinHash-LSH, exact Jaccard, SimHash,
phash-hamming) emit edges; curation needs the transitive closure: "keep one
document per near-duplicate CLUSTER", and clusters are the connected
components of the pair graph (a~b, b~c => {a,b,c} even if a and c were never
compared).

Algorithm: iterative MIN-LABEL PROPAGATION. Every node starts labeled with
its own id; each round every node's label becomes the min of its own and its
neighbors' labels; at fixpoint label(v) = min node id of v's component.

Why this variant at 100-TB scale: each round moves a BOUNDED volume —
|V| label rows + 2|E| edge rows through one coarse-bucket shuffle, then
|V| + |E| candidate rows through a second — with no intermediate growth
(hash-to-min style set-carrying variants converge in fewer rounds but their
per-round state can blow up to the component size). Round count equals the
graph diameter, and near-duplicate graphs are dense clumps with tiny
diameters (a clique converges in 1 round). The label table is materialized
once per round so lineage stays flat and the executor can free the previous
round's blocks.

Determinism: min is order-independent; coarse buckets use the fixed
``pd.util.hash_pandas_object`` key, so results are exact and reproducible —
the driver oracle replays the closure with a recursive SQL CTE.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pygeoops_ray.stages.groupagg import _bucket_count

__all__ = ["connected_components"]


def _empty_labels() -> pa.Table:
    return pa.Table.from_pydict(
        {
            "node": pa.array([], pa.int64()),
            "cluster_id": pa.array([], pa.int64()),
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
):
    """Connected components of the undirected graph given by ``edges_ds``.

    Returns a Dataset with columns ``(node: int64, cluster_id: int64)`` where
    ``cluster_id`` is the smallest node id in the node's component.

    ``all_nodes_ds`` (optional, with ``node_col``) adds nodes that touch no
    edge as singleton components (cluster_id = node). The singleton pass
    broadcasts the edge-endpoint id set and anti-filters the node stream
    inside ``map_batches`` — valid while the ENDPOINT set is small relative
    to the corpus (duplicate density is low in practice); if the dup graph
    ever approaches corpus scale, swap this for the hash anti-join shape
    (see stages/spatial.pip_join_rects_points join_type="anti").
    """
    import ray
    import ray.data as rd

    nb = _bucket_count(16, (n_edges_hint or 0) * 2 or None)

    # -- symmetrize: one row per directed edge (s -> d), both directions ----
    def sym(batch: pa.Table) -> pa.Table:
        s = batch[src_col].to_numpy().astype(np.int64)
        d = batch[dst_col].to_numpy().astype(np.int64)
        return pa.Table.from_pydict(
            {
                "key": pa.array(np.concatenate([s, d]), pa.int64()),
                "val": pa.array(np.concatenate([d, s]), pa.int64()),
                "kind": pa.array(np.ones(2 * len(s), dtype=np.int8), pa.int8()),
            }
        )

    edges = edges_ds.map_batches(sym, batch_format="pyarrow").materialize()
    n_dir_edges = edges.count()

    if n_dir_edges == 0:
        labels = rd.from_arrow(_empty_labels())
    else:
        # -- init labels: every endpoint labeled with itself ----------------
        def init_labels(df: pd.DataFrame) -> pd.DataFrame:
            u = np.unique(df["key"].to_numpy())
            return pd.DataFrame({"node": u, "label": u, "changed": np.int8(0)})

        labels = _bucketed_pd(edges, ["key"], init_labels, nb).materialize()

        for _ in range(max_iters):
            labels = _cc_round(labels, edges, nb).materialize()
            if labels.sum("changed") == 0:
                break

        def finalize(batch: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {"node": batch["node"], "cluster_id": batch["label"]}
            )

        labels = labels.map_batches(finalize, batch_format="pyarrow", batch_size=None)

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


def _cc_round(labels, edges, n_buckets: int):
    """One propagation round: two coarse-bucket shuffles.

    Shuffle 1 (by source node): co-locate each node's label row with its
    outgoing edges; every edge forwards the source's label to its target.
    Shuffle 2 (by target node): min over incoming candidates + own label;
    ``changed`` records whether the min improved, so the driver can stop at
    the fixpoint with a metadata-cheap sum instead of a diff join.
    """

    def as_kind0(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "key": batch["node"],
                "val": batch["label"],
                "kind": pa.array(np.zeros(batch.num_rows, dtype=np.int8), pa.int8()),
            }
        )

    lab_rows = labels.map_batches(as_kind0, batch_format="pyarrow", batch_size=None)

    def forward(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[df["kind"] == 0][["key", "val"]].rename(columns={"val": "label"})
        edg = df[df["kind"] == 1][["key", "val"]]
        msgs = edg.merge(lab, on="key", how="inner")
        return pd.DataFrame(
            {
                "node": np.concatenate(
                    [lab["key"].to_numpy(), msgs["val"].to_numpy()]
                ).astype(np.int64),
                "cand": np.concatenate(
                    [lab["label"].to_numpy(), msgs["label"].to_numpy()]
                ).astype(np.int64),
                "is_self": np.concatenate(
                    [
                        np.ones(len(lab), dtype=np.int8),
                        np.zeros(len(msgs), dtype=np.int8),
                    ]
                ),
            }
        )

    cands = _bucketed_pd(lab_rows.union(edges), ["key"], forward, n_buckets)

    def take_min(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", sort=False)
        new = g["cand"].min()
        old = df[df["is_self"] == 1].set_index("node")["cand"]
        old = old.reindex(new.index)
        changed = (new < old).astype(np.int8)
        return pd.DataFrame(
            {"node": new.index.to_numpy(), "label": new.to_numpy(), "changed": changed.to_numpy()}
        )

    return _bucketed_pd(cands, ["node"], take_min, n_buckets)
