"""Geometry operators as Ray Data batch stages over WKB binary columns.

Each stage reads a WKB ``binary`` geometry column, runs the numpy kernels, and
writes WKB back — zero-copy Arrow in/out, geometry decode amortized inside the
batch. Heavy per-row kernels (centerline) are actor-pool classes; cross-row
operators (topo-simplify) group by the Hilbert cell id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pygeoops_ray.geo import geom as g
from pygeoops_ray.geo import wkb

__all__ = [
    "make_wavy_polygon",
    "polygons_from_supplier",
    "simplify_stage",
    "CenterlineStage",
    "buffer_by_m_stage",
    "view_angles_stage",
    "topo_simplify_grouped",
    "distributed_difference",
]


def make_wavy_polygon(k: int, n_pts: int = 40) -> g.Polygon:
    """Deterministic elongated wavy polygon for ordinal k (pure arithmetic)."""
    length = 100.0 + (k * 7) % 60
    width = 6.0 + (k * 3) % 5
    n = n_pts
    xs = np.linspace(0, length, n)
    amp = 1.0 + (k % 4)
    top = np.column_stack([xs, width + amp * np.sin(xs / 7.0 + k)])
    bot = np.column_stack([xs[::-1], amp * np.sin(xs[::-1] / 9.0 + k) - 0.0])
    ring = np.concatenate([top, bot], axis=0)
    return g.Polygon(ring)


def polygons_from_supplier(batch: pa.Table) -> pa.Table:
    """supplier rows → deterministic polygon corpus (WKB column)."""
    keys = batch["s_suppkey"].to_numpy()
    wkbs = [wkb.dumps(make_wavy_polygon(int(k))) for k in keys]
    return pa.Table.from_pydict(
        {"s_suppkey": pa.array(keys, pa.int64()), "geom_wkb": pa.array(wkbs, pa.binary())}
    )


def simplify_stage(tolerance: float, algorithm: str = "lang", lookahead: int = 8):
    """Stateless map_batches fn: simplify the geom_wkb column."""
    from pygeoops_ray.geo.simplify import simplify

    def fn(batch: pa.Table) -> pa.Table:
        geoms = [wkb.loads(b) for b in batch["geom_wkb"].to_pylist()]
        out, n_in, n_out = [], [], []
        for geom in geoms:
            s = simplify(geom, tolerance, algorithm=algorithm, lookahead=lookahead)
            out.append(wkb.dumps(s) if s is not None else None)
            n_in.append(geom.num_coordinates if geom else 0)
            n_out.append(s.num_coordinates if s is not None else 0)
        t = batch.drop_columns(["geom_wkb"])
        t = t.append_column("geom_wkb", pa.array(out, pa.binary()))
        t = t.append_column("n_pts_in", pa.array(n_in, pa.int64()))
        t = t.append_column("n_pts_out", pa.array(n_out, pa.int64()))
        return t

    return fn


def centerline_batch(
    batch: pa.Table,
    densify_distance=-1,
    min_branch_length=-1,
    simplifytolerance=-0.25,
    extend=False,
) -> pa.Table:
    """Stateless centerline of each geom_wkb — runs as plain Ray tasks on
    prestarted workers (the kernel holds no per-actor state, so an actor
    pool would only add pool spin-up latency)."""
    from pygeoops_ray.geo.centerline import centerline

    out, lengths = [], []
    for b in batch["geom_wkb"].to_pylist():
        geom = wkb.loads(b)
        cl = centerline(
            geom,
            densify_distance=densify_distance,
            min_branch_length=min_branch_length,
            simplifytolerance=simplifytolerance,
            extend=extend,
        )
        out.append(wkb.dumps(cl) if cl is not None else None)
        lengths.append(cl.length if cl is not None else 0.0)
    t = batch.drop_columns(["geom_wkb"])
    t = t.append_column("centerline_wkb", pa.array(out, pa.binary()))
    t = t.append_column("centerline_len", pa.array(lengths, pa.float64()))
    return t


class CenterlineStage:
    """Actor-pool form of :func:`centerline_batch` (kept for pipelines that
    pair the centerline with genuinely stateful per-actor setup)."""

    def __init__(self, densify_distance=-1, min_branch_length=-1, simplifytolerance=-0.25, extend=False):
        self.params = dict(
            densify_distance=densify_distance,
            min_branch_length=min_branch_length,
            simplifytolerance=simplifytolerance,
            extend=extend,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        return centerline_batch(batch, **self.params)


def buffer_by_m_stage(quad_segs: int = 8):
    from pygeoops_ray.geo.buffer import buffer_by_m

    def fn(batch: pa.Table) -> pa.Table:
        out, areas = [], []
        for b in batch["geom_wkb"].to_pylist():
            geom = wkb.loads(b)
            buf = buffer_by_m(geom, quad_segs=quad_segs)
            out.append(wkb.dumps(buf))
            areas.append(buf.area)
        t = batch.drop_columns(["geom_wkb"])
        t = t.append_column("buffer_wkb", pa.array(out, pa.binary()))
        t = t.append_column("buffer_area", pa.array(areas, pa.float64()))
        return t

    return fn


def view_angles_stage(batch: pa.Table) -> pa.Table:
    """(vx, vy, geom_wkb) → (start_angle, end_angle)."""
    from pygeoops_ray.geo.view_angles import view_angles

    vx = batch["vx"].to_numpy()
    vy = batch["vy"].to_numpy()
    starts, ends = [], []
    for k, b in enumerate(batch["geom_wkb"].to_pylist()):
        s, e = view_angles(g.Point(vx[k], vy[k]), wkb.loads(b))
        starts.append(s)
        ends.append(e)
    t = batch.drop_columns(["geom_wkb"])
    t = t.append_column("start_angle", pa.array(starts, pa.float64()))
    t = t.append_column("end_angle", pa.array(ends, pa.float64()))
    return t


def topo_simplify_grouped(ds, tolerance: float, algorithm: str = "lang", group_col: str = "cell_id"):
    """Cross-row topo-simplify per spatial cell: groupby(cell).map_groups.

    Shared boundaries WITHIN a cell are preserved exactly; cross-cell
    boundaries rely on arc-endpoint pinning (documented approximation —
    SURVEY.md §2.1 #4).
    """
    import pandas as pd

    from pygeoops_ray.geo.simplify_topo import simplify_topo

    def per_cell(group: pd.DataFrame) -> pd.DataFrame:
        geoms = np.array([wkb.loads(b) for b in group["geom_wkb"]], dtype=object)
        simplified = simplify_topo(geoms, tolerance, algorithm=algorithm)
        group = group.copy()
        group["geom_wkb"] = [wkb.dumps(s) if s is not None else None for s in simplified]
        return group

    return ds.groupby(group_col).map_groups(per_cell, batch_format="pandas")


def distributed_difference(geometry: g.Geometry, subtrahends: list, subdivide_coords: int = 1000):
    """difference_all_tiled as a Ray pipeline: flat(subdivide) → broadcast
    subtrahends → per-part difference tasks → union merge.

    The reference's ThreadPoolExecutor(4) mini-MapReduce (_difference.py:74-91)
    in its distributed shape. Returns the final geometry (small result).
    """
    import ray
    import ray.data as rd

    from pygeoops_ray.geo.difference import difference_all
    from pygeoops_ray.geo.general import subdivide
    from pygeoops_ray.geo import boolean

    parts = subdivide(geometry, subdivide_coords)
    if len(parts) == 1:
        return difference_all(parts[0], subtrahends, check_intersects=True)
    sub_ref = ray.put([wkb.dumps(s) for s in subtrahends])

    def diff_batch(batch: pa.Table) -> pa.Table:
        subs = [wkb.loads(b) for b in ray.get(sub_ref)]
        out = []
        for b in batch["part_wkb"].to_pylist():
            part = wkb.loads(b)
            d = difference_all(part, subs, check_intersects=True)
            out.append(wkb.dumps(d) if d is not None else None)
        return pa.Table.from_pydict({"diff_wkb": pa.array(out, pa.binary())})

    ds = rd.from_arrow(
        pa.Table.from_pydict({"part_wkb": pa.array([wkb.dumps(p) for p in parts], pa.binary())})
    )
    results = ds.map_batches(diff_batch, batch_format="pyarrow", batch_size=4).take_all()
    pieces = [wkb.loads(r["diff_wkb"]) for r in results if r["diff_wkb"] is not None]
    pieces = [p for p in pieces if not p.is_empty]
    if not pieces:
        from pygeoops_ray.geo.general import empty

        return empty(g.get_type_id(geometry))
    return boolean.union_all(pieces)
