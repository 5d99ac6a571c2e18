"""STR-packed static R-tree over bounding boxes (bulk-load only).

The per-cell spatial index for join/clip stages and the centerline branch
pruning (the reference uses shapely.STRtree, _centerline.py:327). Built once
per actor/partition; queries are vectorized bbox tests down the packed levels.

Public-knowledge basis: Leutenegger et al., "STR: A Simple and Efficient
Algorithm for R-Tree Packing" (1997).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["STRtree"]


class STRtree:
    def __init__(self, bboxes: np.ndarray, node_capacity: int = 10):
        """bboxes: (N, 4) [minx, miny, maxx, maxy] of the indexed items."""
        self.bboxes = np.asarray(bboxes, dtype=np.float64).reshape(-1, 4)
        n = len(self.bboxes)
        self.n = n
        self.cap = node_capacity
        if n == 0:
            self.levels = []
            return
        # STR packing: sort by center-x into vertical slices, each slice by center-y
        cx = (self.bboxes[:, 0] + self.bboxes[:, 2]) / 2
        cy = (self.bboxes[:, 1] + self.bboxes[:, 3]) / 2
        nleaf = math.ceil(n / node_capacity)
        nslices = math.ceil(math.sqrt(nleaf))
        order = np.argsort(cx, kind="stable")
        slice_size = nslices * node_capacity
        perm = np.empty(n, dtype=np.int64)
        pos = 0
        for s in range(0, n, slice_size):
            chunk = order[s : s + slice_size]
            chunk = chunk[np.argsort(cy[chunk], kind="stable")]
            perm[pos : pos + len(chunk)] = chunk
            pos += len(chunk)
        self.perm = perm  # leaf order → original index

        # build packed levels bottom-up: each level is (M, 4) of node bboxes
        self.levels: list[np.ndarray] = []
        cur = self.bboxes[perm]
        while len(cur) > 1:
            m = math.ceil(len(cur) / node_capacity)
            nxt = np.empty((m, 4))
            for i in range(m):
                grp = cur[i * node_capacity : (i + 1) * node_capacity]
                nxt[i] = [grp[:, 0].min(), grp[:, 1].min(), grp[:, 2].max(), grp[:, 3].max()]
            self.levels.append(cur)
            cur = nxt
        self.levels.append(cur)
        self.levels.reverse()  # [root, ..., leaves]

    def query(self, minx: float, miny: float, maxx: float, maxy: float) -> np.ndarray:
        """Original indexes of items whose bbox intersects the query bbox."""
        if self.n == 0:
            return np.array([], dtype=np.int64)
        node_idx = np.array([0], dtype=np.int64)
        for level in range(len(self.levels) - 1):
            boxes = self.levels[level]
            hit = node_idx[
                (boxes[node_idx, 0] <= maxx)
                & (boxes[node_idx, 2] >= minx)
                & (boxes[node_idx, 1] <= maxy)
                & (boxes[node_idx, 3] >= miny)
            ]
            if len(hit) == 0:
                return np.array([], dtype=np.int64)
            # children of node i live at [i*cap, (i+1)*cap) in the next level
            nxt_len = len(self.levels[level + 1])
            children = (hit[:, None] * self.cap + np.arange(self.cap)[None, :]).ravel()
            node_idx = children[children < nxt_len]
        boxes = self.levels[-1]
        hit = node_idx[
            (boxes[node_idx, 0] <= maxx)
            & (boxes[node_idx, 2] >= minx)
            & (boxes[node_idx, 1] <= maxy)
            & (boxes[node_idx, 3] >= miny)
        ]
        return self.perm[hit]

    def query_point(self, x: float, y: float) -> np.ndarray:
        return self.query(x, y, x, y)

    def query_bulk(self, bboxes: np.ndarray) -> list[np.ndarray]:
        return [self.query(*b) for b in np.asarray(bboxes).reshape(-1, 4)]
