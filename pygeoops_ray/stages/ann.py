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

__all__ = ["brute_force_topk", "lsh_topk"]


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
    def __init__(self, queries_ref, k: int):
        import ray

        self.q_ids, q = ray.get(queries_ref)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        self.qn = qn
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
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
    partials = emb_ds.map_batches(
        _PartialCosine,
        batch_format="pyarrow",
        fn_constructor_args=(ref, k),
        concurrency=concurrency,
    )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k).copy()
        group["rnk"] = np.arange(1, len(group) + 1, dtype=np.int64)
        return group[["q_id", "vec_id", "rnk"]]

    return partials.groupby("q_id").map_groups(merge, batch_format="pandas")


class _LshPartial(_PartialCosine):
    """Scores only vectors whose hyperplane sign bucket matches a query bucket."""

    def __init__(self, queries_ref, k: int, planes_ref):
        import ray

        super().__init__(queries_ref, k)
        self.planes = ray.get(planes_ref)  # (nbits, dim)
        self.q_buckets = set(self._bucket(self.qn))

    def _bucket(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes.T) > 0
        return np.packbits(bits, axis=1, bitorder="little")[:, 0].astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, m = _embedding_matrix(batch)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mn = m / norms
        mask = np.array([b in self.q_buckets for b in self._bucket(mn)])
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


def lsh_topk(emb_ds, q_ids, q_matrix, k: int = 10, nbits: int = 8, concurrency: int = 4, seed: int = 11):
    """Approximate top-k via hyperplane LSH candidate pruning (scale path)."""
    import ray

    dim = np.asarray(q_matrix).shape[1]
    planes = np.random.RandomState(seed).normal(size=(nbits, dim))
    qref = ray.put((np.asarray(q_ids, np.int64), np.asarray(q_matrix, np.float64)))
    pref = ray.put(planes)
    partials = emb_ds.map_batches(
        _LshPartial,
        batch_format="pyarrow",
        fn_constructor_args=(qref, k, pref),
        concurrency=concurrency,
    )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k).copy()
        group["rnk"] = np.arange(1, len(group) + 1, dtype=np.int64)
        return group[["q_id", "vec_id", "rnk"]]

    return partials.groupby("q_id").map_groups(merge, batch_format="pandas")
