"""Similarity search over the embeddings table.

Brute-force cosine top-k: the query matrix is broadcast (ray.put once, fetched
per actor), each batch does one float64 matmul, partial top-k rows flow into a
tiny grouped exact merge. The LSH-bucketed variant hashes vectors into
hyperplane sign buckets and only scores candidates sharing a bucket with the
query — the scale path when brute force is too wide.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["brute_force_topk", "lsh_topk", "ivf_topk", "train_ivf_centroids", "cosine_dup_pairs"]


def _embedding_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch["vec_id"].to_numpy()
    emb = batch["embedding"]
    if emb.num_chunks > 0:
        arrs = [np.asarray(chunk.values, dtype=np.float64) for chunk in emb.chunks]
        flat = np.concatenate(arrs)
    else:
        flat = np.asarray(emb.combine_chunks().values, dtype=np.float64)
    dim = len(flat) // max(len(ids), 1)
    return ids, flat.reshape(len(ids), dim)


class _PartialCosine:
    """Stateless-task scorer: broadcast refs fetched lazily per worker."""

    def __init__(self, queries_ref, k: int):
        self.queries_ref = queries_ref
        self.k = k
        self.qn = None

    def _ensure(self):
        if self.qn is None:
            import ray

            self.q_ids, q = ray.get(self.queries_ref)
            self.qn = q / np.linalg.norm(q, axis=1, keepdims=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._ensure()
        ids, m = _embedding_matrix(batch)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = self.qn @ (m / norms).T  # (nq, nbatch)
        k = min(self.k, sims.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi in range(len(self.q_ids)):
            idx = (
                np.argpartition(-sims[qi], k - 1)[:k] if k < sims.shape[1] else np.arange(sims.shape[1])
            )
            out_q.append(np.full(len(idx), self.q_ids[qi], dtype=np.int64))
            out_v.append(ids[idx])
            out_s.append(sims[qi][idx])
        return pa.Table.from_pydict(
            {
                "q_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )


def brute_force_topk(emb_ds, q_ids, q_matrix, k: int = 10, concurrency: int = 4):
    """Exact cosine top-k per query; ties break on vec_id asc."""
    import ray

    ref = ray.put((np.asarray(q_ids, np.int64), np.asarray(q_matrix, np.float64)))
    partials = emb_ds.map_batches(_PartialCosine(ref, k), batch_format="pyarrow")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k).copy()
        group["rnk"] = np.arange(1, len(group) + 1, dtype=np.int64)
        return group[["q_id", "vec_id", "rnk"]]

    return partials.groupby("q_id").map_groups(merge, batch_format="pandas")


class _LshPartial(_PartialCosine):
    """Scores only vectors whose hyperplane sign bucket matches a query bucket."""

    def __init__(self, queries_ref, k: int, planes_ref):
        super().__init__(queries_ref, k)
        self.planes_ref = planes_ref
        self.planes = None

    def _ensure(self):
        if self.qn is None:
            super()._ensure()
            import ray

            self.planes = ray.get(self.planes_ref)  # (tables, nbits, dim)
            qb = self._bucket(self.qn)
            # sorted-unique arrays for the vectorized np.isin membership test
            self.q_bucket_arrs = [np.unique(qb[:, t]) for t in range(qb.shape[1])]

    def _bucket(self, m: np.ndarray) -> np.ndarray:
        """(N, tables) bucket codes: one hyperplane sign code per hash table."""
        ntab, nbits, dim = self.planes.shape
        out = np.empty((len(m), ntab), dtype=np.int64)
        for t in range(ntab):
            bits = (m @ self.planes[t].T) > 0
            out[:, t] = np.packbits(bits, axis=1, bitorder="little")[:, 0].astype(np.int64)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._ensure()
        ids, m = _embedding_matrix(batch)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mn = m / norms
        mb = self._bucket(mn)
        # candidate if it shares a bucket with any query in ANY hash table
        mask = np.zeros(len(mn), dtype=bool)
        for t in range(mb.shape[1]):
            mask |= np.isin(mb[:, t], self.q_bucket_arrs[t])
        if not mask.any():
            return pa.Table.from_pydict(
                {"q_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
            )
        sub = pa.Table.from_pydict(
            {"vec_id": pa.array(ids[mask], pa.int64())}
        )
        # reuse the dense scorer on the candidate subset
        sims = self.qn @ mn[mask].T
        k = min(self.k, sims.shape[1])
        out_q, out_v, out_s = [], [], []
        sub_ids = ids[mask]
        for qi in range(len(self.q_ids)):
            idx = (
                np.argpartition(-sims[qi], k - 1)[:k] if k < sims.shape[1] else np.arange(sims.shape[1])
            )
            out_q.append(np.full(len(idx), self.q_ids[qi], dtype=np.int64))
            out_v.append(sub_ids[idx])
            out_s.append(sims[qi][idx])
        return pa.Table.from_pydict(
            {
                "q_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )


def train_ivf_centroids(emb_ds, n_centroids: int = 16, iters: int = 8, sample: int = 4096, seed: int = 5):
    """Coarse quantizer: numpy k-means (Lloyd) on a driver-side sample.

    At 100 TB the sample is a `random_sample` pushdown; the trained centroids
    are tiny and broadcast via ray.put.
    """
    # canonical sample order: limit() returns blocks in completion order,
    # which varies run-to-run — k-means init picks by POSITION, so without
    # the sort the trained centroids (and every downstream probed-cell
    # pruning contract) would differ across sessions on identical input
    tab = emb_ds.limit(sample).to_pandas().sort_values("vec_id").reset_index(drop=True)
    ids = tab["vec_id"].to_numpy()
    m = np.stack([np.asarray(v, dtype=np.float64) for v in tab["embedding"]])
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cent = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)]
    for _ in range(iters):
        sims = m @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            mask = assign == c
            if mask.any():
                v = m[mask].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def ivf_topk(emb_ds, q_ids, q_matrix, k: int = 10, n_centroids: int = 16, nprobe: int = 4, seed: int = 5):
    """IVF-style approximate top-k: score only vectors whose coarse cell is
    among each query's nprobe nearest centroids (the classic inverted-file
    scale path; brute force within probed cells)."""
    cent = train_ivf_centroids(emb_ds, n_centroids=n_centroids, seed=seed)
    qm = np.asarray(q_matrix, np.float64)
    qn = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    q_sims = qn @ cent.T
    probe = np.argsort(-q_sims, axis=1)[:, :nprobe]  # (nq, nprobe)
    return _probed_topk(emb_ds, np.asarray(q_ids, np.int64), qn, cent, probe, k)


def _probed_topk(emb_ds, ids_q, qn, cent, probe, k):
    """Score a vector stream against queries restricted to each query's
    probed cells; per-batch partial top-k, tiny grouped merge. Shared by the
    in-stream IVF (ivf_topk) and the disk-persisted index (ivf_disk_topk)."""
    import ray

    probed_cells = set(probe.reshape(-1).tolist())
    ref = ray.put((ids_q, qn, cent, probed_cells))

    class _IvfPartial:
        def __init__(self):
            self.state = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.state is None:
                self.state = ray.get(ref)
            ids_q, qn_, cent_, cells = self.state
            ids, m = _embedding_matrix(batch)
            norms = np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            mn = m / norms
            assign = (mn @ cent_.T).argmax(axis=1)
            mask = np.isin(assign, list(cells))
            if not mask.any():
                return pa.Table.from_pydict(
                    {"q_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
                )
            sub = mn[mask]
            sub_ids = ids[mask]
            sub_assign = assign[mask]
            sims = qn_ @ sub.T
            out_q, out_v, out_s = [], [], []
            for qi in range(len(ids_q)):
                # only candidates in this query's probed cells
                cand = np.isin(sub_assign, probe[qi])
                if not cand.any():
                    continue
                srow = sims[qi][cand]
                cids = sub_ids[cand]
                kk = min(k, len(srow))
                idx = np.argpartition(-srow, kk - 1)[:kk] if kk < len(srow) else np.arange(len(srow))
                out_q.append(np.full(len(idx), ids_q[qi], dtype=np.int64))
                out_v.append(cids[idx])
                out_s.append(srow[idx])
            if not out_q:
                return pa.Table.from_pydict(
                    {"q_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
                )
            return pa.Table.from_pydict(
                {
                    "q_id": pa.array(np.concatenate(out_q), pa.int64()),
                    "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                    "sim": pa.array(np.concatenate(out_s)),
                }
            )

    partials = emb_ds.map_batches(_IvfPartial(), batch_format="pyarrow")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k).copy()
        group["rnk"] = np.arange(1, len(group) + 1, dtype=np.int64)
        return group[["q_id", "vec_id", "rnk"]]

    return partials.groupby("q_id").map_groups(merge, batch_format="pandas")


def build_ivf_disk_index(
    emb_ds, out_dir: str, n_centroids: int = 16, iters: int = 8,
    sample: int = 4096, seed: int = 5,
):
    """Persist an IVF index as a centroid-partitioned parquet directory.

    The vector-DB layout at rest: one parquet file per coarse cell (the
    inverted file), written resumably through the checkpoint manifest
    (state/manifest.py), plus a tiny centroids sidecar. Queries then touch
    only their probed cells' FILES (I/O-level pruning — the in-stream
    ivf_topk prunes compute but still reads every vector), which is the
    shape that matters when the corpus is 100 TB and a query probes <20%
    of it.
    """
    import os

    import ray

    from pygeoops_ray.state.manifest import write_partitioned

    cent = train_ivf_centroids(
        emb_ds, n_centroids=n_centroids, iters=iters, sample=sample, seed=seed
    )
    ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        ids, m = _embedding_matrix(batch)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        cell = (mn @ ray.get(ref).T).argmax(axis=1).astype(np.int64)
        return batch.append_column("ivf_cell", pa.array(cell, pa.int64()))

    ds = emb_ds.map_batches(assign, batch_format="pyarrow")
    write_partitioned(ds, out_dir, "ivf_cell", stage="ivf")
    np.save(os.path.join(out_dir, "centroids.npy"), cent)
    return cent


def ivf_disk_topk(out_dir: str, q_ids, q_matrix, k: int = 10, nprobe: int = 4):
    """Approximate top-k against a ``build_ivf_disk_index`` directory.

    Reads ONLY the partitions of the union of the queries' probed cells —
    partition selection happens on the driver from the few-KB manifest, so
    unprobed cells cost zero I/O and zero tasks. Returns
    ``(topk_dataset, n_files_read, n_files_total)`` so callers can assert
    the pruning actually happened.
    """
    import os

    import ray.data as rd

    from pygeoops_ray.state.manifest import CheckpointManifest

    cent = np.load(os.path.join(out_dir, "centroids.npy"))
    qm = np.asarray(q_matrix, np.float64)
    qn = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    probe = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]
    cells = {int(c) for c in probe.reshape(-1)}
    done = CheckpointManifest(out_dir, "ivf").completed()
    files = [
        rec["output_file"]
        for pid, rec in sorted(done.items())
        if int(pid) in cells and os.path.exists(rec["output_file"])
    ]
    emb_ds = rd.read_parquet(files, columns=["vec_id", "embedding"])
    topk = _probed_topk(emb_ds, np.asarray(q_ids, np.int64), qn, cent, probe, k)
    return topk, len(files), len(done)


def lsh_topk(
    emb_ds, q_ids, q_matrix, k: int = 10, nbits: int = 6, tables: int = 3,
    concurrency: int = 4, seed: int = 11,
):
    """Approximate top-k via multi-table hyperplane LSH candidate pruning.

    tables × nbits trade recall vs pruning: more tables → higher recall,
    fewer bits → bigger buckets. Scale path when brute force is too wide.
    """
    import ray

    dim = np.asarray(q_matrix).shape[1]
    planes = np.random.RandomState(seed).normal(size=(tables, nbits, dim))
    qref = ray.put((np.asarray(q_ids, np.int64), np.asarray(q_matrix, np.float64)))
    pref = ray.put(planes)
    partials = emb_ds.map_batches(_LshPartial(qref, k, pref), batch_format="pyarrow")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k).copy()
        group["rnk"] = np.arange(1, len(group) + 1, dtype=np.int64)
        return group[["q_id", "vec_id", "rnk"]]

    return partials.groupby("q_id").map_groups(merge, batch_format="pandas")


class _PairScan:
    """Per-batch exact cosine pair scan against the broadcast corpus matrix."""

    def __init__(self, corpus_ref, threshold: float):
        self.corpus_ref = corpus_ref
        self.threshold = threshold
        self.ids = None
        self.mn = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.ids is None:
            import ray

            self.ids, m = ray.get(self.corpus_ref)
            self.mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        ids, m = _embedding_matrix(batch)
        bn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        # corpus-axis chunks keep each (batch, chunk) sims strip ~16MB: one
        # full-corpus strip is batch x corpus floats (800MB at 100k corpus
        # rows), and large fresh temporaries run far below cache-resident
        # matmul throughput
        cstep = max(256, 2_000_000 // max(len(bn), 1))
        out_a, out_b = [], []
        for c0 in range(0, len(self.mn), cstep):
            sims = bn @ self.mn[c0 : c0 + cstep].T
            bi, cj = np.nonzero(sims >= self.threshold)
            a = ids[bi]
            b = self.ids[c0 + cj]
            keep = a < b  # each unordered pair once, self-pairs dropped
            out_a.append(a[keep])
            out_b.append(b[keep])
        return pa.Table.from_pydict(
            {
                "vec_a": pa.array(np.concatenate(out_a), pa.int64()),
                "vec_b": pa.array(np.concatenate(out_b), pa.int64()),
            }
        )


def cosine_dup_pairs(emb_ds, corpus_ids, corpus_matrix, threshold: float = 0.9):
    """EXACT embedding-cosine near-dup pairs: all (a<b) with cos >= threshold.

    Baseline path of the similarity family: the normalized corpus matrix is
    broadcast once (ray.put; ids+float64 matrix), every batch does one matmul
    strip of the full n×n similarity — embarrassingly parallel over row
    blocks, exact by construction (oracle: all-pairs SQL
    list_cosine_similarity). This is the correctness baseline the bucketed
    variants (lsh_topk / ivf_topk candidate generation + this verify) are
    measured against; at 10^12 scale the broadcast side is replaced by the
    IVF inverted file and only same/neighbor-centroid blocks are scanned.
    """
    import ray

    ref = ray.put(
        (
            np.asarray(corpus_ids, np.int64),
            np.asarray(corpus_matrix, np.float64),
        )
    )
    return emb_ds.map_batches(_PairScan(ref, threshold), batch_format="pyarrow")


def append_ivf_disk_index(emb_ds, out_dir: str, layer: str = "delta"):
    """Incremental ADD to a persisted IVF index — no refit.

    The production vector-DB maintenance shape: new vectors are assigned to
    the EXISTING centroids (one broadcast pass, no k-means) and written as
    a second centroid-partitioned layer next to the base
    (``out_dir/<layer>``, own manifest → append reruns skip completed
    partitions). Queries read probed cells from every layer; recall
    degrades only as the data drifts from the frozen centroids, which is
    the documented trade every IVF deployment makes between refits.
    """
    import os

    import ray

    from pygeoops_ray.state.manifest import write_partitioned

    cent = np.load(os.path.join(out_dir, "centroids.npy"))
    ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        ids, m = _embedding_matrix(batch)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        cell = (mn @ ray.get(ref).T).argmax(axis=1).astype(np.int64)
        return batch.append_column("ivf_cell", pa.array(cell, pa.int64()))

    layer_dir = os.path.join(out_dir, layer)
    ds = emb_ds.map_batches(assign, batch_format="pyarrow")
    write_partitioned(ds, layer_dir, "ivf_cell", stage="ivf")
    return layer_dir


def ivf_disk_topk_layers(
    out_dir: str, q_ids, q_matrix, k: int = 10, nprobe: int = 4,
    layers: tuple = ("delta",),
):
    """``ivf_disk_topk`` over the base index PLUS appended layers.

    Probed-cell files are gathered from every layer's manifest (base +
    appends share the frozen centroids, so a cell's vectors may live in
    several layer files); returns per-layer (read, total) counts so callers
    can assert pruning happened in each layer independently.
    """
    import os

    import ray.data as rd

    from pygeoops_ray.state.manifest import CheckpointManifest

    cent = np.load(os.path.join(out_dir, "centroids.npy"))
    qm = np.asarray(q_matrix, np.float64)
    qn = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    probe = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]
    cells = {int(c) for c in probe.reshape(-1)}
    files, stats = [], []
    for d in (out_dir, *[os.path.join(out_dir, la) for la in layers]):
        done = CheckpointManifest(d, "ivf").completed()
        sel = [
            rec["output_file"]
            for pid, rec in sorted(done.items())
            if int(pid) in cells and os.path.exists(rec["output_file"])
        ]
        files.extend(sel)
        stats.append((len(sel), len(done)))
    emb_ds = rd.read_parquet(files, columns=["vec_id", "embedding"])
    topk = _probed_topk(emb_ds, np.asarray(q_ids, np.int64), qn, cent, probe, k)
    return topk, stats


# ---------------------------------------------------------------------------
# sharded deterministic HNSW (Malkov & Yashunin 2016)
# ---------------------------------------------------------------------------


def _hnsw_level(vid: int, mL: float) -> int:
    """Deterministic level draw: U from md5 of the id (no RNG state, so the
    index is bit-stable across sessions and partitionings)."""
    import hashlib
    import math
    import struct

    u64 = struct.unpack("<Q", hashlib.md5(str(vid).encode()).digest()[:8])[0]
    u = (u64 + 1) / 2.0**64
    return int(-math.log(u) * mL)


def _hnsw_build(ids, mat, M=8, ef_c=32):
    """Build one shard's HNSW graph (insert in ascending id order).

    Pure numpy/heapq; cosine similarity on normalized vectors. Neighbor
    lists prune to M per level (2M at level 0) by similarity. Returns
    (ids_sorted, mat_sorted, graphs, entry, max_lvl) — the serializable
    index state (``hnsw_disk`` persists exactly this).
    """
    import heapq
    import math

    n = len(ids)
    order = np.argsort(ids)
    ids = ids[order]
    mat = mat[order]
    mL = 1.0 / math.log(M)
    levels = np.array([_hnsw_level(int(v), mL) for v in ids])
    max_lvl = -1
    entry = -1
    # adjacency: per level, dict[node] -> list[node]
    graphs: list[dict[int, list[int]]] = []

    def sim_to(vec, nodes):
        return mat[nodes] @ vec

    def beam(vec, start, lvl, ef):
        g = graphs[lvl]
        visited = {start}
        s0 = float(mat[start] @ vec)
        cand = [(-s0, start)]
        best = [(s0, start)]
        while cand:
            negs, u = heapq.heappop(cand)
            if -negs < best[0][0] and len(best) >= ef:
                break
            nbrs = [v for v in g.get(u, ()) if v not in visited]
            if not nbrs:
                continue
            visited.update(nbrs)
            sims = sim_to(vec, nbrs)
            for v, sv in zip(nbrs, sims):
                sv = float(sv)
                if len(best) < ef or sv > best[0][0]:
                    heapq.heappush(best, (sv, v))
                    if len(best) > ef:
                        heapq.heappop(best)
                    heapq.heappush(cand, (-sv, v))
        return sorted(best, key=lambda t: (-t[0], ids[t[1]]))

    for i in range(n):
        l = int(levels[i])
        while len(graphs) <= l:
            graphs.append({})
        if entry < 0:
            entry, max_lvl = i, l
            for lv in range(l + 1):
                graphs[lv][i] = []
            continue
        vec = mat[i]
        ep = entry
        for lv in range(max_lvl, l, -1):
            ep = beam(vec, ep, lv, 1)[0][1]
        for lv in range(min(l, max_lvl), -1, -1):
            found = beam(vec, ep, lv, ef_c)
            cap = 2 * M if lv == 0 else M
            nbrs = [v for _, v in found[:M]]
            graphs[lv][i] = nbrs
            for v in nbrs:
                lst = graphs[lv].setdefault(v, [])
                lst.append(i)
                if len(lst) > cap:
                    sims = sim_to(mat[v], lst)
                    keep = np.argsort(-sims)[:cap]
                    graphs[lv][v] = [lst[j] for j in keep]
            ep = found[0][1]
        if l > max_lvl:
            # promoted entry point: initialize its adjacency at the newly
            # created levels (mirroring the first-node path) — otherwise
            # upper-level descent degenerates to the bare entry point and
            # silently degrades graph quality
            for lv in range(max_lvl + 1, l + 1):
                graphs[lv].setdefault(i, [])
            entry, max_lvl = i, l

    return ids, mat, graphs, entry, max_lvl


def _hnsw_search(ids, mat, graphs, entry, max_lvl, q_ids, qn, k, ef_s=48):
    """Search every query against a built (or disk-loaded) HNSW graph;
    returns (q_id, vec_id, sim) rows of the per-shard top-k. Identical beam
    to the build phase, so in-memory and disk-loaded searches are
    bit-equal."""
    import heapq

    def beam(vec, start, lvl, ef):
        g = graphs[lvl]
        visited = {start}
        s0 = float(mat[start] @ vec)
        cand = [(-s0, start)]
        best = [(s0, start)]
        while cand:
            negs, u = heapq.heappop(cand)
            if -negs < best[0][0] and len(best) >= ef:
                break
            nbrs = [v for v in g.get(u, ()) if v not in visited]
            if not nbrs:
                continue
            visited.update(nbrs)
            sims = mat[nbrs] @ vec
            for v, sv in zip(nbrs, sims):
                sv = float(sv)
                if len(best) < ef or sv > best[0][0]:
                    heapq.heappush(best, (sv, v))
                    if len(best) > ef:
                        heapq.heappop(best)
                    heapq.heappush(cand, (-sv, v))
        return sorted(best, key=lambda t: (-t[0], ids[t[1]]))

    rows_q, rows_v, rows_s = [], [], []
    for qi, q in enumerate(q_ids):
        vec = qn[qi]
        ep = entry
        for lv in range(max_lvl, 0, -1):
            ep = beam(vec, ep, lv, 1)[0][1]
        found = beam(vec, ep, 0, max(ef_s, k))[:k]
        for s, v in found:
            rows_q.append(int(q))
            rows_v.append(int(ids[v]))
            rows_s.append(float(s))
    return rows_q, rows_v, rows_s


def _hnsw_build_search(ids, mat, q_ids, qn, k, M=8, ef_c=32, ef_s=48):
    """Build one shard's HNSW graph and search every query (the in-memory
    path; see _hnsw_build / _hnsw_search)."""
    ids, mat, graphs, entry, max_lvl = _hnsw_build(ids, mat, M=M, ef_c=ef_c)
    return _hnsw_search(ids, mat, graphs, entry, max_lvl, q_ids, qn, k, ef_s=ef_s)


def hnsw_shard_count(
    n_rows: int, n_shards: int, max_shard_rows: int = 64_000
) -> int:
    """Auto-resharding rule: a shard's graph builds in ONE task, so the
    task-size ceiling IS the shard-size ceiling. Measured on this box the
    insert loop sustains ~2.3-3.2k rows/s (mildly sublinear: 3.2k @ 2k
    rows, 2.3k @ 16k rows), so the 64k default caps a build task at ~30 s
    and bounded heap regardless of corpus size; shard count grows with the
    corpus instead of shard size."""
    if max_shard_rows <= 0:
        raise ValueError("max_shard_rows must be positive")
    need = -(-max(0, int(n_rows)) // int(max_shard_rows))  # ceil div
    return max(int(n_shards), need, 1)


def hnsw_topk(emb_ds, q_ids, q_matrix, k: int = 10, n_shards: int = 4,
              M: int = 8, ef_c: int = 32, ef_s: int = 48,
              max_shard_rows: int = 64_000, n_rows_hint: int | None = None):
    """Sharded HNSW approximate top-k: the corpus hash-partitions into
    ``n_shards`` shards, each shard builds its own deterministic HNSW graph
    in ONE task (graph build is inherently sequential-per-shard — the
    distributed axis is shards, the standard production layout), every
    query searches all shards, and a final tiny per-query merge keeps the
    global top-k. At 100 TB: shards = hundreds, each worker builds/holds
    one graph; queries fan out and the merge stays queries × shards × k.

    ``max_shard_rows`` enforces the shard-size ceiling (see
    ``hnsw_shard_count``): when the corpus outgrows ``n_shards`` ×
    ``max_shard_rows``, the shard count raises itself so no build task
    exceeds the measured per-task budget. ``n_rows_hint`` supplies the
    corpus size without a count() pass (parquet-metadata counts are free;
    pass it when known).
    """
    import pandas as pd

    from pygeoops_ray.stages.groupagg import _bucketed

    n_rows = n_rows_hint if n_rows_hint is not None else emb_ds.count()
    n_shards = hnsw_shard_count(n_rows, n_shards, max_shard_rows)

    qm = np.asarray(q_matrix, np.float64)
    qn = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    q_arr = np.asarray(q_ids, np.int64)

    def add_shard(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "shard", pa.array(batch["vec_id"].to_numpy() % n_shards, pa.int64())
        )

    def build_and_search(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy()
        m = np.stack([np.asarray(v, np.float64) for v in g["embedding"]])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        rq, rv, rs = _hnsw_build_search(ids, m, q_arr, qn, k, M, ef_c, ef_s)
        return pd.DataFrame({"q_id": rq, "vec_id": rv, "sim": rs})

    per_shard = (
        emb_ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(build_and_search, batch_format="pandas")
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.sort_values(["q_id", "sim", "vec_id"], ascending=[True, False, True])
            .groupby("q_id", sort=False)
            .head(k)
        )
        return out[["q_id", "vec_id", "sim"]]

    return _bucketed(per_shard, ["q_id"], merge, 4)


def build_hnsw_disk_index(
    emb_ds, out_dir: str, n_shards: int = 4, M: int = 8, ef_c: int = 32,
    max_shard_rows: int = 64_000, n_rows_hint: int | None = None,
):
    """Persist the sharded HNSW index as a parquet directory (one file per
    shard through the checkpoint manifest, so a crashed build resumes by
    skipping completed shards).

    The at-rest win vs ``hnsw_topk`` is build-once/search-many: every
    search of the in-stream path pays the O(n log n) per-shard graph
    BUILD; the disk index pays it once and searches reconstruct the graph
    from rows. (HNSW fans every query out to all shards, so unlike
    IVF-disk there is no file-pruning claim — the claim is the build
    amortization plus manifest resume.) Shard count obeys the
    ``hnsw_shard_count`` ceiling. Serialized rows per shard:

    - kind=0 node rows: (pos, vec_id, emb float64 blob) in insertion order
    - kind=1 edge rows: (lvl, pos, nbr, ord) — ord preserves the neighbor
      LIST order so the reconstructed beam search is bit-equal to the
      in-memory one
    - kind=2 meta row: (lvl=max_lvl, pos=entry)

    Returns the shard count.
    """
    import pandas as pd

    from pygeoops_ray.state.manifest import write_partitioned

    n_rows = n_rows_hint if n_rows_hint is not None else emb_ds.count()
    n_shards = hnsw_shard_count(n_rows, n_shards, max_shard_rows)

    def add_shard(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "shard", pa.array(batch["vec_id"].to_numpy() % n_shards, pa.int64())
        )

    def build_rows(g: pd.DataFrame) -> pd.DataFrame:
        shard = int(g["shard"].iloc[0])
        ids = g["vec_id"].to_numpy()
        m = np.stack([np.asarray(v, np.float64) for v in g["embedding"]])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        ids_s, mat, graphs, entry, max_lvl = _hnsw_build(ids, m, M=M, ef_c=ef_c)
        kind = [2]
        lvl = [max_lvl]
        pos = [int(entry)]
        nbr = [-1]
        ordv = [0]
        vid = [-1]
        emb = [b""]
        for i in range(len(ids_s)):
            kind.append(0)
            lvl.append(-1)
            pos.append(i)
            nbr.append(-1)
            ordv.append(0)
            vid.append(int(ids_s[i]))
            emb.append(np.ascontiguousarray(mat[i]).tobytes())
        for lv, gmap in enumerate(graphs):
            for u, lst in gmap.items():
                for j, v in enumerate(lst):
                    kind.append(1)
                    lvl.append(lv)
                    pos.append(int(u))
                    nbr.append(int(v))
                    ordv.append(j)
                    vid.append(-1)
                    emb.append(b"")
        return pd.DataFrame(
            {
                "shard": np.full(len(kind), shard, np.int64),
                "kind": np.array(kind, np.int64),
                "lvl": np.array(lvl, np.int64),
                "pos": np.array(pos, np.int64),
                "nbr": np.array(nbr, np.int64),
                "ord": np.array(ordv, np.int64),
                "vec_id": np.array(vid, np.int64),
                "emb": emb,
            }
        )

    rows = (
        emb_ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(build_rows, batch_format="pandas")
    )
    write_partitioned(rows, out_dir, "shard", stage="hnsw")
    return n_shards


def hnsw_disk_topk(out_dir: str, q_ids, q_matrix, k: int = 10, ef_s: int = 48):
    """Approximate top-k against a ``build_hnsw_disk_index`` directory.

    Each shard file reconstructs its graph inside its own Ray task (no
    rebuild — the O(n log n) insert loop is skipped) and searches every
    query; a final tiny per-query merge keeps the global top-k, identical
    to the in-memory ``hnsw_topk`` merge. Returns
    ``(topk_dataset, n_files_read, n_files_total)``.
    """
    import os

    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from pygeoops_ray.stages.groupagg import _bucketed
    from pygeoops_ray.state.manifest import CheckpointManifest

    qm = np.asarray(q_matrix, np.float64)
    qn = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    q_arr = np.asarray(q_ids, np.int64)

    done = CheckpointManifest(out_dir, "hnsw").completed()
    files = [
        rec["output_file"]
        for _pid, rec in sorted(done.items())
        if os.path.exists(rec["output_file"])
    ]

    def search_file(batch: pa.Table) -> pa.Table:
        rows_q, rows_v, rows_s = [], [], []
        for path in batch["path"].to_pylist():
            t = pq.read_table(path)
            kind = t["kind"].to_numpy()
            node_sel = kind == 0
            pos_all = t["pos"].to_numpy()
            npos = pos_all[node_sel]
            order = np.argsort(npos)
            ids = t["vec_id"].to_numpy()[node_sel][order]
            blobs = t["emb"].to_pylist()
            nblobs = [b for b, s in zip(blobs, node_sel) if s]
            mat = np.stack(
                [np.frombuffer(nblobs[i], np.float64) for i in order]
            )
            meta_i = int(np.flatnonzero(kind == 2)[0])
            entry = int(pos_all[meta_i])
            max_lvl = int(t["lvl"].to_numpy()[meta_i])
            graphs: list[dict[int, list[int]]] = [
                {} for _ in range(max_lvl + 1)
            ]
            e_sel = kind == 1
            elvl = t["lvl"].to_numpy()[e_sel]
            epos = pos_all[e_sel]
            enbr = t["nbr"].to_numpy()[e_sel]
            eord = t["ord"].to_numpy()[e_sel]
            eo = np.lexsort((eord, epos, elvl))
            for lv, u, v in zip(elvl[eo], epos[eo], enbr[eo]):
                graphs[int(lv)].setdefault(int(u), []).append(int(v))
            rq, rv, rs = _hnsw_search(
                ids, mat, graphs, entry, max_lvl, q_arr, qn, k, ef_s=ef_s
            )
            rows_q += rq
            rows_v += rv
            rows_s += rs
        return pa.Table.from_pydict(
            {
                "q_id": pa.array(rows_q, pa.int64()),
                "vec_id": pa.array(rows_v, pa.int64()),
                "sim": pa.array(rows_s, pa.float64()),
            }
        )

    per_shard = rd.from_items([{"path": f} for f in files]).map_batches(
        search_file, batch_format="pyarrow", batch_size=1
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.sort_values(["q_id", "sim", "vec_id"], ascending=[True, False, True])
            .groupby("q_id", sort=False)
            .head(k)
        )
        return out[["q_id", "vec_id", "sim"]]

    return _bucketed(per_shard, ["q_id"], merge, 4), len(files), len(done)
