"""Hierarchical spatial cell index: Hilbert-ordered quad cells (H3/S2-analog).

This is the engine's partitioning and shuffle key (SURVEY.md §2.3): world
coordinates are bucketed into a 2^order x 2^order grid of square cells of
``cell_size`` world units, and the (col, row) cell is mapped to a Hilbert-curve
index so spatially adjacent cells get adjacent cell_ids — neighbouring blocks
co-locate under range partitioning, and neighbor-ring kNN expansion touches a
small id range. All kernels are vectorized numpy over int64/uint64.

Public knowledge basis: the classic Hilbert curve d2xy/xy2d iterative mapping
(Wikipedia "Hilbert curve", Hamilton's compact Hilbert indices paper).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "hilbert_xy2d",
    "hilbert_d2xy",
    "cell_of_points",
    "cell_id_of_points",
    "cells_covering_rect",
    "neighbor_ring",
    "CellGrid",
]

DEFAULT_ORDER = 16  # 65536 x 65536 cells — plenty for a 10^12-image world plane


def hilbert_xy2d(order: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized Hilbert index of integer cell coords (col=x, row=y)."""
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros_like(x, dtype=np.int64)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = x[flip]
        x[flip] = s - 1 - x_f
        y_f = y[flip]
        y[flip] = s - 1 - y_f
        xs = x[swap]
        x[swap] = y[swap]
        y[swap] = xs
        s >>= 1
    return d


def hilbert_d2xy(order: int, d: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of hilbert_xy2d (vectorized)."""
    d = np.asarray(d, dtype=np.int64)
    t = d.copy()
    x = np.zeros_like(d)
    y = np.zeros_like(d)
    s = np.int64(1)
    n = np.int64(1) << order
    while s < n:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        # rotate
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = x[flip]
        x[flip] = s - 1 - x_f
        y_f = y[flip]
        y[flip] = s - 1 - y_f
        xs = x[swap]
        x[swap] = y[swap]
        y[swap] = xs
        x = x + s * rx
        y = y + s * ry
        t = t // 4
        s <<= 1
    return x, y


class CellGrid:
    """Fixed world cell grid: square cells of ``cell_size`` units, Hilbert ids."""

    def __init__(self, cell_size: float = 256.0, order: int = DEFAULT_ORDER):
        self.cell_size = float(cell_size)
        self.order = order
        self.n = np.int64(1) << order

    def colrow(self, x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        col = np.clip(np.floor(np.asarray(x) / self.cell_size), 0, self.n - 1).astype(np.int64)
        row = np.clip(np.floor(np.asarray(y) / self.cell_size), 0, self.n - 1).astype(np.int64)
        return col, row

    def cell_id(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        col, row = self.colrow(x, y)
        return hilbert_xy2d(self.order, col, row)

    def cell_id_of_colrow(self, col: np.ndarray, row: np.ndarray) -> np.ndarray:
        return hilbert_xy2d(self.order, np.asarray(col), np.asarray(row))

    def cell_bounds(self, col: int, row: int) -> tuple[float, float, float, float]:
        cs = self.cell_size
        return (col * cs, row * cs, (col + 1) * cs, (row + 1) * cs)

    def covering(self, minx, miny, maxx, maxy) -> list[tuple[int, int]]:
        """(col,row) cells covered by a rect; half-open [min, max) semantics."""
        c0, r0 = self.colrow(np.array([minx]), np.array([miny]))
        # subtract a hair so an exactly-aligned max edge doesn't spill into the next cell
        c1 = np.clip(np.floor((np.float64(maxx) - 1e-9) / self.cell_size), 0, self.n - 1).astype(np.int64)
        r1 = np.clip(np.floor((np.float64(maxy) - 1e-9) / self.cell_size), 0, self.n - 1).astype(np.int64)
        return [
            (int(c), int(r))
            for c in range(int(c0[0]), int(c1) + 1)
            for r in range(int(r0[0]), int(r1) + 1)
        ]


def cell_of_points(x, y, cell_size: float = 256.0, order: int = DEFAULT_ORDER):
    return CellGrid(cell_size, order).colrow(x, y)


def cell_id_of_points(x, y, cell_size: float = 256.0, order: int = DEFAULT_ORDER):
    return CellGrid(cell_size, order).cell_id(x, y)


def cells_covering_rect(bounds, cell_size: float = 256.0, order: int = DEFAULT_ORDER):
    return CellGrid(cell_size, order).covering(*bounds)


def neighbor_ring(col: int, row: int, ring: int) -> list[tuple[int, int]]:
    """(col,row) cells at exactly Chebyshev distance ``ring`` (ring 0 = self).

    The kNN expansion order: search ring 0, then 1, ... until k candidates
    found and the next ring cannot improve the worst current distance.
    """
    if ring == 0:
        return [(col, row)]
    out = []
    for dc in range(-ring, ring + 1):
        for dr in range(-ring, ring + 1):
            if max(abs(dc), abs(dr)) == ring:
                c, r = col + dc, row + dr
                if c >= 0 and r >= 0:
                    out.append((c, r))
    return out


# ---------------------------------------------------------------------------
# Morton (z-order) interleave — the multi-dimension clustering key for
# RELATIONAL layout optimization (lakehouse OPTIMIZE ZORDER BY (a, b)): rows
# sorted by z cluster into axis-aligned "cubes" of (a, b) space, so a 2-D
# range predicate prunes whole files via per-file min/max stats on BOTH
# columns. Classic bit-spreading (public: "Interleave bits by Binary Magic
# Numbers", Stanford bit-twiddling hacks).
# ---------------------------------------------------------------------------


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each value into the even bit positions."""
    v = v.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def morton_xy2z(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized Morton code: interleave x (even bits) and y (odd bits)."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    return (_part1by1(x) | (_part1by1(y) << np.uint64(1))).astype(np.int64)
