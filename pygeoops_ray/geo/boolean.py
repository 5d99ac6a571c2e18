"""Geometry-level boolean ops on the numpy model, backed by martinez.py.

Supplies shapely's difference / union_all / unary_union / intersection that
the reference calls (/root/reference/pygeoops/_difference.py:169-181,
_general.py:596, _buffer_by_m.py:171) for polygonal inputs; line/point inputs
take dedicated paths (rect-clip, predicate filters) where the engine needs
them.
"""

from __future__ import annotations

import numpy as np

from pygeoops_ray.geo import geom as g
from pygeoops_ray.geo import martinez
from pygeoops_ray.geo.measures import ring_area

__all__ = [
    "difference",
    "difference_all_fused",
    "intersection",
    "intersection_all_fused",
    "union",
    "union_all",
]


def _to_marty(geom: g.Geometry | None) -> list:
    """Geometry → martinez input: list of polygons (list of rings).

    Rings stay numpy (N, 2) arrays — martinez consumes them via asarray and
    the list→array conversion was ~40% of small-union fill time."""
    if geom is None or geom.is_empty:
        return []
    if isinstance(geom, g.Polygon):
        return [[r[:, :2] for r in geom.rings]]
    if isinstance(geom, g.MultiPolygon):
        return [[r[:, :2] for r in p.rings] for p in geom.geoms if not p.is_empty]
    if isinstance(geom, g.GeometryCollection):
        out = []
        for p in geom.geoms:
            out.extend(_to_marty(p))
        return out
    raise ValueError(f"boolean ops support polygons, got {geom.geom_type}")


def _split_pinched(ring: np.ndarray) -> list[np.ndarray]:
    """Split a ring that revisits a vertex (pinch point) into simple loops.

    GEOS keeps polygons that touch at a single point as separate MultiPolygon
    parts; the sweep's contour walk can emit them as one pinched ring instead.
    """
    body = ring[:-1]
    seen: dict[tuple[float, float], int] = {}
    dup = False
    for p in body:
        k = (p[0], p[1])
        if k in seen:
            dup = True
            break
        seen[k] = 1
    if not dup:
        return [ring]
    from pygeoops_ray.geo.validity import split_ring_loops

    loops = split_ring_loops(ring)
    out = []
    for lp in loops:
        if abs(ring_area(lp)) > 1e-12:
            closed = lp if np.array_equal(lp[0], lp[-1]) else np.concatenate([lp, lp[:1]])
            out.append(closed)
    return out if out else [ring]


def _from_marty(polys: list) -> g.Geometry:
    """martinez output → Polygon / MultiPolygon / empty Polygon."""
    cleaned = []
    for rings in polys:
        shells = []
        holes = []
        for ri, ring in enumerate(rings):
            arr = np.asarray(ring, dtype=np.float64)
            if len(arr) >= 4 and abs(ring_area(arr)) > 1e-12:
                if ri == 0:
                    shells.extend(_split_pinched(arr))
                else:
                    holes.append(arr)
        if len(shells) == 1:
            cleaned.append(g.Polygon(shells[0], holes))
        elif len(shells) > 1:
            # pinched shell split into parts: attach each hole to the shell
            # containing it
            from pygeoops_ray.geo.predicates import point_in_ring

            part_holes: list[list] = [[] for _ in shells]
            for h in holes:
                for si, sh in enumerate(shells):
                    if point_in_ring(h[0, 0], h[0, 1], sh) >= 0:
                        part_holes[si].append(h)
                        break
            for sh, hs in zip(shells, part_holes):
                cleaned.append(g.Polygon(sh, hs))
    if not cleaned:
        return g.Polygon()
    if len(cleaned) == 1:
        return cleaned[0]
    return g.MultiPolygon(cleaned)


def difference(a: g.Geometry | None, b: g.Geometry | None) -> g.Geometry | None:
    """a minus b (polygonal)."""
    if a is None:
        return None
    if b is None or b.is_empty:
        return a
    return _from_marty(martinez.boolean_op(_to_marty(a), _to_marty(b), martinez.DIFFERENCE))


def intersection(a: g.Geometry | None, b: g.Geometry | None) -> g.Geometry | None:
    if a is None or b is None:
        return None
    return _from_marty(martinez.boolean_op(_to_marty(a), _to_marty(b), martinez.INTERSECTION))


def union(a: g.Geometry | None, b: g.Geometry | None) -> g.Geometry | None:
    if a is None or a.is_empty:
        return b
    if b is None or b.is_empty:
        return a
    return _from_marty(martinez.boolean_op(_to_marty(a), _to_marty(b), martinez.UNION))


def difference_all_fused(a: g.Geometry, subs) -> g.Geometry:
    """a minus union(subs) as ONE two-counter overlay sweep
    (martinez.difference_nary) — replaces union_all(subs) + difference(a, u):
    no intermediate union geometry, no second sweep."""
    clip: list = []
    for sub in subs:
        if sub is not None and not sub.is_empty:
            clip.extend(_to_marty(sub))
    return _from_marty(martinez.difference_nary(_to_marty(a), clip))


def union_all(geoms) -> g.Geometry:
    """Union of many polygonal geometries.

    3+ inputs run as ONE n-ary coverage-depth sweep (martinez.union_nary) —
    a single O(E log E) pass instead of a pairwise merge tree that re-sweeps
    intermediate results at every level (~2-3x on buffer_by_m's many-convex-
    piece unions, validated output-equivalent on overlapping/coincident/holed
    corpora)."""
    items = [p for p in geoms if p is not None and not p.is_empty]
    if not items:
        return g.Polygon()
    if len(items) == 1:
        return items[0]
    if len(items) == 2:
        return union(items[0], items[1])
    polys: list = []
    for p in items:
        polys.extend(_to_marty(p))
    return _from_marty(martinez.union_nary(polys))


def intersection_all_fused(subjects, clips) -> g.Geometry:
    """union(subjects) INTERSECT union(clips) as ONE two-counter overlay
    sweep (martinez.intersection_nary) — no intermediate union geometries."""
    subj: list = []
    for s in subjects:
        if s is not None and not s.is_empty:
            subj.extend(_to_marty(s))
    clip: list = []
    for c in clips:
        if c is not None and not c.is_empty:
            clip.extend(_to_marty(c))
    if not subj or not clip:
        return g.Polygon()
    return _from_marty(martinez.intersection_nary(subj, clip))
