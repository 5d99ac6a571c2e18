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
    "distributed_difference_table",
    "DifferenceStage",
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


class DifferenceStage:
    """Actor-pool per-part difference: the broadcast subtrahend list is
    WKB-deserialized ONCE per actor (``__init__``), not per batch — the
    stateful-stage pattern from stages/text.py. Each batch row is one
    subject part; the subtrahend set is shared across all rows (the
    "subtract these lakes from every parcel" shape)."""

    def __init__(self, sub_ref):
        import ray

        self.subs = [wkb.loads(b) for b in ray.get(sub_ref)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from pygeoops_ray.geo.difference import difference_all

        out = []
        for b in batch["part_wkb"].to_pylist():
            part = wkb.loads(b)
            d = difference_all(part, self.subs, check_intersects=True)
            out.append(wkb.dumps(d) if d is not None else None)
        t = batch.drop_columns(["part_wkb"])
        return t.append_column("diff_wkb", pa.array(out, pa.binary()))


def distributed_difference_table(
    ds,
    subtrahends: list,
    subdivide_coords: int = 1000,
    id_col: str = "source_id",
    geom_col: str = "geom_wkb",
    concurrency=(1, 8),
):
    """difference_all_tiled over a TABLE of subjects, fully in-stream:
    flat(subdivide) → actor-pool per-part difference (shared subtrahends
    broadcast once, deserialized once per actor) → groupby(id).map_groups
    union merge. One output row (id, diff_wkb) per subject; no driver-side
    materialization anywhere (SURVEY §3.3 / reference _difference.py:74-110
    re-expressed Ray-Data-first).
    """
    import pandas as pd
    import ray

    from pygeoops_ray.geo import boolean
    from pygeoops_ray.geo.general import subdivide

    sub_ref = ray.put([wkb.dumps(s) for s in subtrahends])

    def explode_parts(batch: pa.Table) -> pa.Table:
        ids, parts = [], []
        src_ids = batch[id_col].to_numpy(zero_copy_only=False)
        for k, b in enumerate(batch[geom_col].to_pylist()):
            for p in subdivide(wkb.loads(b), subdivide_coords):
                ids.append(src_ids[k])
                parts.append(wkb.dumps(p))
        return pa.Table.from_pydict(
            {
                id_col: pa.array(ids, batch.schema.field(id_col).type),
                "part_wkb": pa.array(parts, pa.binary()),
            }
        )

    def merge_source(group: pd.DataFrame) -> pd.DataFrame:
        pieces = [
            wkb.loads(b) for b in group["diff_wkb"] if b is not None
        ]
        pieces = [p for p in pieces if not p.is_empty]
        if len(pieces) == 0:
            merged_wkb = None
        elif len(pieces) == 1:
            merged_wkb = wkb.dumps(pieces[0])
        else:
            merged_wkb = wkb.dumps(boolean.union_all(pieces))
        return pd.DataFrame(
            {id_col: group[id_col].iloc[:1], "diff_wkb": [merged_wkb]}
        )

    parts = ds.map_batches(explode_parts, batch_format="pyarrow")
    diffed = parts.map_batches(
        DifferenceStage,
        fn_constructor_args=(sub_ref,),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )
    return diffed.groupby(id_col).map_groups(merge_source, batch_format="pandas")


def distributed_difference(geometry: g.Geometry, subtrahends: list, subdivide_coords: int = 1000):
    """Single-subject difference_all_tiled through the Ray stage: thin
    wrapper over :func:`distributed_difference_table` (one input row); the
    only materialization is the single merged output geometry."""
    import ray.data as rd

    from pygeoops_ray.geo.difference import difference_all
    from pygeoops_ray.geo.general import subdivide

    if len(subdivide(geometry, subdivide_coords)) == 1:
        return difference_all(geometry, subtrahends, check_intersects=True)
    ds = rd.from_arrow(
        pa.Table.from_pydict(
            {
                "source_id": pa.array([0], pa.int64()),
                "geom_wkb": pa.array([wkb.dumps(geometry)], pa.binary()),
            }
        )
    )
    out = distributed_difference_table(
        ds, subtrahends, subdivide_coords, concurrency=(1, 4)
    ).take_all()
    blob = out[0]["diff_wkb"]
    if blob is None:
        from pygeoops_ray.geo.general import empty

        return empty(g.get_type_id(geometry))
    return wkb.loads(blob)
