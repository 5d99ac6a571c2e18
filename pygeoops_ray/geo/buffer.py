"""buffer_by_m: variable-width buffers driven by per-vertex M (or Z) values.

Re-expresses /root/reference/pygeoops/_buffer_by_m.py:23-175 from scratch:
buffer each vertex point by its M value (regular 4*quad_segs-gon), convex-hull
consecutive buffer pairs (Andrew monotone chain), union everything. Zero M
tapers to the original point; negative/NaN M drops the point entirely (→
disjoint parts).
"""

from __future__ import annotations

import numpy as np

from pygeoops_ray.geo import boolean, geom as g
from pygeoops_ray.geo.general import _extract_0dim, _is_arraylike, get_parts_recursive

__all__ = ["buffer_by_m", "point_buffer", "convex_hull"]


_UNIT_CIRCLE: dict[int, np.ndarray] = {}


def point_buffer(x: float, y: float, radius: float, quad_segs: int = 8) -> np.ndarray:
    """Regular polygon approximating a circle: 4*quad_segs vertices (CCW)."""
    n = max(4 * quad_segs, 4)
    unit = _UNIT_CIRCLE.get(n)
    if unit is None:
        ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
        unit = np.column_stack([np.cos(ang), np.sin(ang)])
        _UNIT_CIRCLE[n] = unit
    return unit * radius + (x, y)


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone chain; returns CCW closed hull ring (scalar-math hot
    loop — a vectorized iterated concave-elimination variant measured 2x
    SLOWER on the two-circle buffer inputs: their x-interleaved arcs force
    ~25 elimination passes)."""
    pts = np.unique(points[:, :2], axis=0)
    if len(pts) <= 2:
        return pts
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    seq = pts[order].tolist()

    def half(s):
        out = []
        for px, py in s:
            while len(out) >= 2:
                ox, oy = out[-1]
                qx, qy = out[-2]
                if (ox - qx) * (py - qy) - (oy - qy) * (px - qx) <= 0:
                    out.pop()
                else:
                    break
            out.append((px, py))
        return out

    lower = half(seq)
    upper = half(seq[::-1])
    hull = np.array(lower[:-1] + upper[:-1])
    return np.concatenate([hull, hull[:1]], axis=0)


def buffer_by_m(geometry, quad_segs: int = 8):
    """Variable-width buffer; M (or Z fallback) is the per-vertex radius."""
    if geometry is None:
        return None
    geometry = _extract_0dim(geometry)
    if _is_arraylike(geometry):
        out = np.empty(len(geometry), dtype=object)
        for i, geom in enumerate(geometry):
            out[i] = _buffer_by_m(geom, quad_segs)
        return out
    return _buffer_by_m(geometry, quad_segs)


def _buffer_by_m(geometry: g.Geometry, quad_segs: int) -> g.Geometry:
    if not (geometry.has_m or geometry.has_z):
        raise ValueError(
            "input geometry must have M or Z values for buffer distances"
            f": got {geometry.wkt}"
        )

    partial_buffers: list[g.Geometry] = []
    for part in get_parts_recursive(geometry):
        coords = g.get_coordinates(part, include_m=True)
        xy = coords[:, :2]
        distances = coords[:, 2]

        # per-vertex buffer rings (None for taper/omit cases)
        buffers: list[np.ndarray | None] = []
        for k in range(len(xy)):
            d = distances[k]
            if np.isnan(d) or d < 0:
                buffers.append(None)  # omitted point
            elif d == 0:
                buffers.append(xy[k : k + 1])  # tapers to the bare point
            else:
                buffers.append(point_buffer(xy[k, 0], xy[k, 1], d, quad_segs))

        if len(buffers) == 1:
            b = buffers[0]
            if b is not None and len(b) > 2:
                partial_buffers.append(g.Polygon(b))
            continue

        for b1, b2 in zip(buffers[:-1], buffers[1:]):
            # negative/NaN M contributes no coords: the pair hull degrades to
            # the other vertex's buffer alone → disjoint parts (ref :151-162)
            pair = [b for b in (b1, b2) if b is not None]
            if not pair:
                continue
            hull = convex_hull(np.concatenate(pair, axis=0))
            if len(hull) > 3:
                partial_buffers.append(g.Polygon(hull))

        if isinstance(part, g.Polygon):
            # polygon input: preserve the original area as well
            partial_buffers.append(g.Polygon(part.shell[:, :2], [h[:, :2] for h in part.holes]))

    if not partial_buffers:
        return g.Polygon()
    result = boolean.union_all(partial_buffers)
    if result.is_empty:
        return g.Polygon()
    return result
