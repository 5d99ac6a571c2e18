"""Vertex-subset simplification kernels on (N,2) coordinate arrays.

Implements the index-returning kernels the reference gets from its own Lang
implementation (/root/reference/pygeoops/_simplify_lang.py:69-185) and from the
optional Rust `simplification` wheel (RDP + Visvalingam-Whyatt,
/root/reference/pygeoops/_simplify.py:332-337) — all from scratch in numpy.

Every kernel returns a sorted int64 array of the indexes of coordinates to KEEP.
"""

from __future__ import annotations

import math

import numpy as np

from pygeoops_ray.geo.measures import point_line_distance, point_line_distance_arr

__all__ = [
    "simplify_coords_lang_idx",
    "simplify_coords_lang",
    "simplify_coords_rdp_idx",
    "simplify_coords_vw_idx",
]


def simplify_coords_lang_idx(
    coords,
    tolerance: float,
    lookahead: int = 8,
    simplify_lookahead_points: bool = False,
):
    """Lang sliding-window simplification; returns indexes of coords to keep.

    The standard algorithm walks a window of ``lookahead`` points: if every
    intermediate point is within ``tolerance`` of the chord, the intermediates
    are dropped and the window restarts at its end point; otherwise the window
    shrinks by one. With ``simplify_lookahead_points=True`` (the reference's
    "lang+") the window start is pinned while intermediates were dropped, so
    chord end points themselves become candidates for removal — lifting the
    >= n/lookahead floor on output size.

    Returns np.ndarray for array input, list for list input (reference contract).
    """
    input_is_arr = isinstance(coords, np.ndarray)
    arr = np.asarray(coords, dtype=np.float64)
    n = len(arr)
    if n <= 2:
        idx = np.arange(n, dtype=np.int64)
        return idx if input_is_arr else idx.tolist()

    window_size = n - 1 if lookahead == -1 else min(lookahead, n - 1)
    keep = np.ones(n, dtype=bool)
    ws = 0
    we = window_size
    # plain python floats: windows are tiny (≤ lookahead points), scalar math
    # beats both numpy slicing and per-point function calls here
    xs = arr[:, 0].tolist()
    ys = arr[:, 1].tolist()
    tol2 = tolerance * tolerance

    while True:
        # Are all intermediate points within tolerance of chord (ws, we)?
        # squared-distance compare: num² > tol²·|chord|² (degenerate chord →
        # infinite distance, matching point_line_distance semantics)
        ax = xs[ws]
        ay = ys[ws]
        dx = xs[we] - ax
        dy = ys[we] - ay
        denom2 = dx * dx + dy * dy
        outside = False
        if denom2 == 0.0:
            outside = we - ws > 1
        else:
            lim = tol2 * denom2
            for i in range(ws + 1, we):
                num = dx * (ay - ys[i]) - (ax - xs[i]) * dy
                if num * num > lim:
                    outside = True
                    break

        if outside:
            we -= 1
            continue

        if not simplify_lookahead_points:
            keep[ws + 1 : we] = False
            ws = we
        elif not keep[ws + 1 : we].any():
            # nothing left to drop in this window → advance
            ws = we
        else:
            keep[ws + 1 : we] = False
            # window start stays pinned: the chord end point itself may be
            # dropped by a later, longer chord from the same start

        if ws >= n - 1 or we >= n - 1:
            break
        we += window_size
        if we >= n:
            we = n - 1

    idx = np.nonzero(keep)[0].astype(np.int64)
    return idx if input_is_arr else idx.tolist()


def simplify_coords_lang(
    coords,
    tolerance: float,
    lookahead: int = 8,
    simplify_lookahead_points: bool = False,
):
    """Lang simplification returning the kept coordinates themselves."""
    input_is_arr = isinstance(coords, np.ndarray)
    arr = np.asarray(coords, dtype=np.float64)
    idx = simplify_coords_lang_idx(
        arr,
        tolerance,
        lookahead=lookahead,
        simplify_lookahead_points=simplify_lookahead_points,
    )
    out = arr[np.asarray(idx, dtype=np.int64)]
    return out if input_is_arr else out.tolist()


def simplify_coords_rdp_idx(coords, tolerance: float) -> np.ndarray:
    """Ramer-Douglas-Peucker; returns indexes of coords to keep (iterative)."""
    arr = np.asarray(coords, dtype=np.float64)
    n = len(arr)
    if n <= 2:
        return np.arange(n, dtype=np.int64)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        s, e = stack.pop()
        if e - s < 2:
            continue
        seg = arr[s + 1 : e, :2]
        d = point_line_distance_arr(seg, arr[s, :2], arr[e, :2])
        if np.all(np.isinf(d)):
            # degenerate chord (s == e coordinates): fall back to distance from point
            d = np.hypot(seg[:, 0] - arr[s, 0], seg[:, 1] - arr[s, 1])
        i = int(np.argmax(d))
        if d[i] > tolerance:
            mid = s + 1 + i
            keep[mid] = True
            stack.append((s, mid))
            stack.append((mid, e))
    return np.nonzero(keep)[0].astype(np.int64)


def simplify_coords_vw_idx(coords, tolerance: float) -> np.ndarray:
    """Visvalingam-Whyatt; tolerance is an AREA. Returns indexes to keep.

    Repeatedly removes the point whose triangle (with its current neighbours)
    has the smallest effective area, until every remaining point's area exceeds
    the tolerance. End points are always kept.
    """
    arr = np.asarray(coords, dtype=np.float64)
    n = len(arr)
    if n <= 2:
        return np.arange(n, dtype=np.int64)

    import heapq

    prev = np.arange(n) - 1
    nxt = np.arange(n) + 1
    alive = np.ones(n, dtype=bool)

    def tri_area(i: int) -> float:
        p, q = prev[i], nxt[i]
        if p < 0 or q >= n:
            return math.inf
        ax, ay = arr[p, 0], arr[p, 1]
        bx, by = arr[i, 0], arr[i, 1]
        cx, cy = arr[q, 0], arr[q, 1]
        return abs((bx - ax) * (cy - ay) - (cx - ax) * (by - ay)) / 2.0

    heap = [(tri_area(i), i) for i in range(1, n - 1)]
    heapq.heapify(heap)
    areas = {i: a for a, i in heap}

    while heap:
        area, i = heapq.heappop(heap)
        if not alive[i] or areas.get(i) != area:
            continue  # stale entry
        if area > tolerance:
            break
        alive[i] = False
        p, q = prev[i], nxt[i]
        if p >= 0:
            nxt[p] = q
        if q < n:
            prev[q] = p
        for j in (p, q):
            if 0 < j < n - 1 and alive[j]:
                a = tri_area(j)
                areas[j] = a
                heapq.heappush(heap, (a, j))

    return np.nonzero(alive)[0].astype(np.int64)
