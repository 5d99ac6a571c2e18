"""Spatial queries: tiling, PIP joins, kNN, clip, pruned reads, proximity pairs.

Split from pipelines/queries.py (round-2 verdict item 7); queries.py
remains the single QUERIES/ORACLE_SQL registry and re-exports these names.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pygeoops_ray.stages import spatial as sp
from pygeoops_ray.pipelines.common import (
    _read,
    _table_rows,
    _read_blocked,
    _images,
    _points,
)


# ---------------------------------------------------------------------------
# spatial: tile assignment / PIP join / clip join / kNN
# ---------------------------------------------------------------------------


def q_tile_assignment(sf_dir: str):
    """Footprint → covering 256-unit tiles (1→k flat expansion)."""
    ds = _images(sf_dir).map_batches(sp.expand_covering_tiles, batch_format="pyarrow")
    return ds.select_columns(["image_id", "tile_x", "tile_y"])


def q_pip_join(sf_dir: str):
    """Point-in-polygon join, co-partitioned on the Hilbert cell id.

    coalesce_blocks=0: the _images/_points readers already size their
    blocks (override_num_blocks ~ ncpu//4), so the operator's pre-sort
    coalesce pass would only add a data copy."""
    return sp.pip_join_rects_points(_images(sf_dir), _points(sf_dir), coalesce_blocks=0)


def q_pip_anti_join(sf_dir: str):
    """Spatial ANTI join: event points covered by NO image footprint.

    Same cell-cogrouped shuffle as pip_join with the containment mask
    inverted per group (a point lands in exactly one group and every rect
    overlapping that cell is replicated into it, so per-group "zero hits" is
    globally correct). The SURVEY §2.2 semi/anti family as a first-class
    driver-checked operator; oracle is the NOT EXISTS SQL.
    """
    return sp.pip_join_rects_points(
        _images(sf_dir), _points(sf_dir), join_type="anti", coalesce_blocks=0
    )


def q_pip_join_agg(sf_dir: str):
    """Points-per-image counts over the PIP join (bucketed vectorized count:
    one group per matched image — high-cardinality keys take the coarse-bucket
    pandas path, see stages/groupagg.py)."""
    from pygeoops_ray.stages.groupagg import grouped_count

    joined = sp.pip_join_rects_points(
        _images(sf_dir), _points(sf_dir), coalesce_blocks=0
    )
    return grouped_count(
        joined, ["image_id"], "n_points", n_rows_hint=_table_rows(sf_dir, "events")
    )


def q_spatial_pruned_read(sf_dir: str):
    """Cell-partitioned resumable sink + bbox-PRUNED read-back + aggregate.

    The 100-TB read-path feature: event points are written once as a
    grid-cell-partitioned parquet directory whose checkpoint manifest records
    each partition's [min, max] of (px, py) (state/manifest.py
    write_partitioned stats_cols). The read side (read_pruned) then serves a
    bbox query by (1) dropping whole partition files on the driver from the
    few-KB manifest — no Ray task ever touches them — and (2) pushing the
    bbox down as a pyarrow filter so parquet row-group stats prune inside
    the surviving files. The bbox is deliberately NOT cell-aligned on its
    x-high edge, so the result exercises both levels: file pruning AND
    row filtering within a kept partition.

    Oracle: the points are pure arithmetic on event_id (_PTS), so the bbox
    filter + per-cell aggregate re-derives exactly in SQL.
    """
    import hashlib
    import os

    from pygeoops_ray.stages.groupagg import grouped_agg
    from pygeoops_ray.state.manifest import read_pruned, write_partitioned

    cs = 2048  # partition cell: 8x8 world tiles → ≤375 partitions on this world
    events_path = os.path.join(sf_dir, "events.parquet")
    n_rows = _table_rows(sf_dir, "events")
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{os.path.getmtime(events_path)}:{n_rows}".encode()
    ).hexdigest()[:10]
    out_dir = f"/tmp/pygeoops_ray_cache/spatial_sink_{key}"

    def add_gcell(b: pa.Table) -> pa.Table:
        # px/py are integer-valued doubles (pure event_id arithmetic): the
        # int64 cast is exact, so the cell key matches the SQL `// 2048`
        gx = b["px"].to_numpy().astype(np.int64) // cs
        gy = b["py"].to_numpy().astype(np.int64) // cs
        return b.append_column("gcell", pa.array(gx + 1024 * gy, pa.int64()))

    # reuse the sink only when a PRIOR RUN FINISHED it (marker written after
    # write_partitioned returns) — a partial manifest from a crashed run must
    # resume the write, not be served as if complete
    done_marker = os.path.join(out_dir, "_complete")
    if not os.path.exists(done_marker):
        pts = (
            _read_blocked(sf_dir, "events", columns=["event_id"])
            .map_batches(sp.points_from_events, batch_format="pyarrow")
            .map_batches(add_gcell, batch_format="pyarrow")
        )
        write_partitioned(
            pts, out_dir, "gcell", stage="points",
            lineage={"sf_dir": sf_dir}, stats_cols=["px", "py"],
        )
        with open(done_marker, "w") as f:
            f.write("1")

    bbox = (131072.0, 0.0, 197608.0, 4096.0)  # x1 cuts INTO cell 96 (row filter)
    ds = read_pruned(
        out_dir, {"px": (bbox[0], bbox[2]), "py": (bbox[1], bbox[3])}, stage="points"
    )
    return grouped_agg(
        ds,
        ["gcell"],
        [
            ("event_id", "size", "n_points"),
            ("event_id", "min", "min_eid"),
            ("event_id", "sum", "sum_eid"),
        ],
        n_rows_hint=n_rows,
    )


def q_geo_pruned_read(sf_dir: str):
    """Extent-pruned GEOMETRY reads — the GeoParquet bbox-column idiom.

    Footprint rectangles land in a cell-partitioned resumable sink whose
    manifest records per-partition extents of all four bbox columns; a
    bbox-INTERSECTION query (rect ∩ bbox ≠ ∅, touching counts) is served as
    one-sided ranges over those stats: minx < x1 AND maxx >= x0 AND
    miny < y1 AND maxy >= y0. Same two pruning levels as
    spatial_pruned_read (whole files from the manifest, rows via the pushed
    filter), but over extents rather than points — rects OVERHANGING their
    home cell are still found because the stats cover the overhang.
    """
    import hashlib
    import os

    from pygeoops_ray.state.manifest import read_pruned, write_partitioned

    cs = 2048
    part_path = os.path.join(sf_dir, "part.parquet")
    n_rows = _table_rows(sf_dir, "part")
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{os.path.getmtime(part_path)}:{n_rows}".encode()
    ).hexdigest()[:10]
    out_dir = f"/tmp/pygeoops_ray_cache/geo_sink_{key}"

    def add_gcell(b: pa.Table) -> pa.Table:
        gx = b["minx"].to_numpy().astype(np.int64) // cs
        gy = b["miny"].to_numpy().astype(np.int64) // cs
        return b.append_column("gcell", pa.array(gx + 1024 * gy, pa.int64()))

    # completion marker, not manifest emptiness: a partial manifest from a
    # crashed run must resume the write (write_partitioned skips finished
    # partitions), never be served as if complete
    done_marker = os.path.join(out_dir, "_complete")
    if not os.path.exists(done_marker):
        rects = _images(sf_dir).map_batches(add_gcell, batch_format="pyarrow")
        write_partitioned(
            rects, out_dir, "gcell", stage="rects",
            lineage={"sf_dir": sf_dir},
            stats_cols=["minx", "maxx", "miny", "maxy"],
        )
        with open(done_marker, "w") as f:
            f.write("1")

    # slots 100..182 — populated at every scale (part has >=200 rows at
    # sf0.001); x1 cuts INTO a cell so row filtering is exercised too
    x0, y0, x1, y1 = 25600.0, 0.0, 46600.0, 4096.0
    ds = read_pruned(
        out_dir,
        {
            "minx": (None, x1),
            "maxx": (x0, None),
            "miny": (None, y1),
            "maxy": (y0, None),
        },
        stage="rects",
    )
    return ds.select_columns(["image_id", "minx", "miny", "maxx", "maxy"])


def q_clip_join(sf_dir: str):
    """Raster-tile ↔ footprint clip join: per-pair clipped area (S-H kernel)."""
    ds = sp.clip_tiles(_images(sf_dir))
    return ds.select_columns(["image_id", "tile_x", "tile_y", "clip_area"])


def q_knn(sf_dir: str):
    """k=5 nearest event-points for each of the 25 nation query points."""
    nation = _read(sf_dir, "nation", columns=["n_nationkey"]).to_pandas()
    nk = nation["n_nationkey"].to_numpy()
    qx = nk.astype(np.float64) * 256.0 + 128.0
    qy = (nk % 5).astype(np.float64) * 256.0 + 128.0
    out = sp.knn_points(_points(sf_dir), nk.astype(np.int64), qx, qy, k=5)
    return out.select_columns(["q_id", "event_id", "rnk"])


def q_knn_join(sf_dir: str):
    """Exact kNN JOIN via cell neighbor-RING expansion
    (stages/spatial.knn_join_ring): every 101st event point finds its 3
    nearest OTHER points.

    The pruned complement of the broadcast ``knn`` query: the corpus side is
    never broadcast — points shuffle into home cells, queries replicate only
    to Chebyshev ring-r cells per round, and a query resolves when its k-th
    distance is provably inside the searched radius (any unsearched point is
    at L∞ > r·cell). Squared distances over integer coordinates are
    integer-exact, so the oracle is the plain windowed cross join.
    """
    n_events = _table_rows(sf_dir, "events")
    import pandas as pd

    e = np.arange(0, n_events, 101, dtype=np.int64)
    qdf = pd.DataFrame(
        {
            "q_id": e,
            "qx": (e % 1000).astype(np.float64) * 256.0 + ((e * 7) % 256).astype(np.float64),
            "qy": ((e // 1000) % 20).astype(np.float64) * 256.0
            + ((e * 13) % 256).astype(np.float64),
        }
    )
    pts = _read_blocked(sf_dir, "events", columns=["event_id"]).map_batches(
        sp.points_from_events, batch_format="pyarrow"
    )
    return sp.knn_join_ring(pts, qdf, k=3)


def q_knn_join_pruned(sf_dir: str):
    """Same exact kNN join, SINK mode: the point corpus is written once to a
    manifest-partitioned parquet sink keyed by spatial block and each ring
    round OPENS ONLY the touched blocks' files (manifest.read_partitions,
    cell set pushed into row groups) — the points-at-rest layout a 100-TB
    corpus queries from. The sink is keyed by corpus size and REUSED across
    calls (second run writes nothing), and the result is identical to the
    in-stream variant, so the oracle is shared with ``knn_join``.
    """
    import pandas as pd

    n_events = _table_rows(sf_dir, "events")
    e = np.arange(0, n_events, 101, dtype=np.int64)
    qdf = pd.DataFrame(
        {
            "q_id": e,
            "qx": (e % 1000).astype(np.float64) * 256.0 + ((e * 7) % 256).astype(np.float64),
            "qy": ((e // 1000) % 20).astype(np.float64) * 256.0
            + ((e * 13) % 256).astype(np.float64),
        }
    )
    pts = _read_blocked(sf_dir, "events", columns=["event_id"]).map_batches(
        sp.points_from_events, batch_format="pyarrow"
    )
    # Size the sink's spatial blocks so partition files carry thousands of
    # rows, not hundreds: with part_side=8 this corpus wrote 375 files of
    # ~270 rows and ring 1 paid per-file read_parquet metadata overhead on
    # 318 of them (~5 s of pure file-open cost at sf0.1). part_side=32
    # (32x32 cells per file) yields ~30 files of ~3k rows — the same exact
    # result (exactness lives in the cell filter, the block is only the
    # file-pruning granularity). At 100-TB scale pick part_side so files
    # land in the 64-512 MB range. Sink key includes the layout.
    sink = f"/tmp/graft_knn_sink_{n_events}_s32"
    return sp.knn_join_ring(pts, qdf, k=3, sink_dir=sink, part_side=32)


def q_footprint_pairs(sf_dir: str):
    """Spatial SELF-join: footprint pairs within L∞ distance 48 of each other
    (stages/spatial.proximity_pairs) — the partition-based spatial merge with
    reference-point dedup, so every pair is emitted exactly once with no
    post-join dedup shuffle.
    """
    n_imgs = _table_rows(sf_dir, "part")
    rects = _read_blocked(sf_dir, "part", columns=["p_partkey"]).map_batches(
        sp.image_meta_from_part, batch_format="pyarrow"
    )
    return sp.proximity_pairs(rects, dist=48.0, n_rows_hint=n_imgs * 2)


def q_pip_polygon(sf_dir: str):
    """Point-in-POLYGON join over true (non-rectangular) vector geometry:
    per-supplier L-shaped polygons vs the event points, through
    ``stages/spatial.pip_polygon_join`` — cell cogroup, PER-PARTITION
    STRtree over polygon bboxes, exact vectorized polygon predicate.

    The L for supplier k sits in k's slot with all six edges on
    HALF-INTEGER lines (±0.5 and the floor(w/2)+0.5 cuts), and event points
    have integer coordinates — no point ever lies on a boundary, so the
    engine's exact predicate and the oracle's strict inequalities agree by
    construction. Membership decomposes as two open boxes (bottom strip ∪
    left column), which is what the SQL replays.
    """
    from pygeoops_ray.geo import geom as g
    from pygeoops_ray.geo import wkb as geo_wkb

    n_events = _table_rows(sf_dir, "events")
    n_supp = _table_rows(sf_dir, "supplier")

    def build_polys(batch: pa.Table) -> pa.Table:
        keys = batch["s_suppkey"].to_numpy()
        w = (64 + (keys * 37) % 193).astype(np.float64)
        h = (64 + (keys * 53) % 151).astype(np.float64)
        minx = (keys % 1000).astype(np.float64) * 256.0
        miny = (keys // 1000).astype(np.float64) * 256.0
        xcut = minx + np.floor(w / 2) + 0.5
        ycut = miny + np.floor(h / 2) + 0.5
        wkbs = []
        for j in range(len(keys)):
            x0, y0 = minx[j] + 0.5, miny[j] + 0.5
            x1, y1 = minx[j] + w[j] - 0.5, miny[j] + h[j] - 0.5
            ring = [
                (x0, y0),
                (x1, y0),
                (x1, ycut[j]),
                (xcut[j], ycut[j]),
                (xcut[j], y1),
                (x0, y1),
                (x0, y0),
            ]
            wkbs.append(geo_wkb.dumps(g.Polygon(ring)))
        return pa.Table.from_pydict(
            {
                "poly_id": pa.array(keys.astype(np.int64), pa.int64()),
                "geom_wkb": pa.array(wkbs, pa.binary()),
                "minx": pa.array(minx + 0.5),
                "miny": pa.array(miny + 0.5),
                "maxx": pa.array(minx + w - 0.5),
                "maxy": pa.array(miny + h - 0.5),
            }
        )

    polys = _read_blocked(sf_dir, "supplier", columns=["s_suppkey"]).map_batches(
        build_polys, batch_format="pyarrow"
    )
    pts = _read_blocked(sf_dir, "events", columns=["event_id"]).map_batches(
        sp.points_from_events, batch_format="pyarrow"
    )
    out = sp.pip_polygon_join(
        polys, pts, n_rows_hint=n_events + n_supp * 2, out_poly="s_suppkey"
    )
    return out


def q_idw_grid(sf_dir: str):
    """Inverse-distance-weighted interpolation of event values onto the tile
    grid (the raster-from-points geostatistics op): every tile center
    collects the points within radius 192 of it, weighted w = 2^24 // d²
    (integer fixed point, so the surface is bit-reproducible and the oracle
    replays it in SQL). Output per touched tile: contributor count, weight
    sum and weighted-value sum — the numerator/denominator pair of the IDW
    estimate, kept separate to stay in exact integers.

    Shape: each point expands to at most its 3×3 neighboring tile centers
    (bounded fan-out, no all-pairs), the d² <= R² filter runs vectorized in
    the same map, and the algebraic grouped aggregate ships one partial row
    per (batch, tile) — the same bounded-replication + cogroup pattern as
    the PIP join, with zero driver-side work.
    """
    import numpy as np
    import pyarrow as pa

    from pygeoops_ray.stages.groupagg import grouped_agg
    from pygeoops_ray.pipelines.common import _read_blocked

    R2 = 192 * 192
    SCALE = 1 << 24

    def expand(batch: pa.Table) -> pa.Table:
        pts = sp.points_from_events(batch)
        px = pts["px"].to_numpy().astype(np.int64)
        py = pts["py"].to_numpy().astype(np.int64)
        vc = np.floor(batch["value"].to_numpy() * 100.0).astype(np.int64)
        tx0 = px // 256
        ty0 = py // 256
        n = len(px)
        off = np.array([-1, 0, 1], dtype=np.int64)
        # 9 candidate tiles per point, then the exact-radius filter
        tx = np.broadcast_to(
            (tx0[:, None] + off[None, :])[:, :, None], (n, 3, 3)
        ).reshape(n, 9)
        ty = np.broadcast_to(
            (ty0[:, None] + off[None, :])[:, None, :], (n, 3, 3)
        ).reshape(n, 9)
        dx = px[:, None] - (tx * 256 + 128)
        dy = py[:, None] - (ty * 256 + 128)
        d2 = dx * dx + dy * dy
        keep = d2 <= R2
        w = SCALE // np.maximum(d2, 1)
        vcol = np.broadcast_to(vc[:, None], (n, 9))
        return pa.Table.from_pydict(
            {
                "tx": pa.array(tx[keep], pa.int64()),
                "ty": pa.array(ty[keep], pa.int64()),
                "w": pa.array(w[keep], pa.int64()),
                "wv": pa.array((w * vcol)[keep], pa.int64()),
            }
        )

    pairs = _read_blocked(sf_dir, "events", columns=["event_id", "value"]).map_batches(
        expand, batch_format="pyarrow"
    )
    out = grouped_agg(
        pairs,
        ["tx", "ty"],
        [("w", "size", "n_pts"), ("w", "sum", "wsum"), ("wv", "sum", "wvsum")],
    )

    def fin(df):
        for c in ("n_pts", "wsum", "wvsum"):
            df[c] = df[c].astype("int64")
        return df

    return out.map_batches(fin, batch_format="pandas")


def q_trajectories(sf_dir: str):
    """Per-user trajectory statistics over the point stream: order each
    user's events by time, difference consecutive positions, and aggregate
    step count, total SQUARED step length and longest squared step — the
    movement-analytics kernel (distance profiles, teleport detection) kept
    in exact integers (d² of integer coordinates) so the SQL lag-window
    replay matches bit for bit.

    Shape: users hash into buckets (a user's history is bucket-local, the
    sessionize co-partition), one vectorized in-group lexsort + diff — no
    per-user Python loop, no driver work; bucket count scales with input.
    """
    import pandas as pd

    from pygeoops_ray.pipelines.q_relational import _events_bucket_count

    ds = _read_blocked(sf_dir, "events", columns=["user_id", "ts", "event_id"])
    n_buckets = _events_bucket_count(sf_dir)

    def add_bucket(batch: pa.Table) -> pa.Table:
        pts = sp.points_from_events(batch)
        return pa.Table.from_pydict(
            {
                "user_id": batch["user_id"],
                "ts": batch["ts"],
                "event_id": batch["event_id"],
                "px": pa.array(pts["px"].to_numpy().astype(np.int64), pa.int64()),
                "py": pa.array(pts["py"].to_numpy().astype(np.int64), pa.int64()),
                "bucket": pa.array(
                    batch["user_id"].to_numpy() % n_buckets, pa.int64()
                ),
            }
        )

    def steps(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["user_id", "ts", "event_id"])
        # integer-exact deltas: pandas .diff() promotes int64 to float64,
        # and a float sum_d2 cast back to int64 can differ from the exact
        # BIGINT sum past 2^53 (~70k steps/user). np.diff on the int64
        # arrays + a same-user mask keeps the whole kernel in int64.
        uid = group["user_id"].to_numpy()
        if len(uid) == 0:
            return pd.DataFrame(
                {
                    c: pd.Series([], dtype="int64")
                    for c in ("user_id", "n_steps", "sum_d2", "max_d2")
                }
            )
        px = group["px"].to_numpy()
        py = group["py"].to_numpy()
        same_user = np.empty(len(uid), dtype=bool)
        same_user[0] = False
        same_user[1:] = uid[1:] == uid[:-1]
        dx = np.empty(len(px), dtype=np.int64)
        dy = np.empty(len(py), dtype=np.int64)
        dx[0] = dy[0] = 0
        dx[1:] = np.diff(px)
        dy[1:] = np.diff(py)
        d2 = dx * dx + dy * dy
        sub = pd.DataFrame({"user_id": uid[same_user], "d2": d2[same_user]})
        out = sub.groupby("user_id", as_index=False).agg(
            n_steps=("d2", "size"), sum_d2=("d2", "sum"), max_d2=("d2", "max")
        )
        for c in ("n_steps", "sum_d2", "max_d2"):
            out[c] = out[c].astype("int64")
        return out

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(steps, batch_format="pandas")
    )


def q_tile_pyramid(sf_dir: str):
    """Map-tile pyramid build: per-tile point counts at zoom levels 0..3
    (level L cell = 2^L × 2^L base tiles), the multi-resolution aggregate a
    tile server pre-computes. The base level is aggregated from the points
    ONCE; every coarser level rolls up from the level below it — each rollup
    re-aggregates the already-tiny previous level, so the full pyramid costs
    one data shuffle plus metadata-sized exchanges (the OLAP rollup shape;
    at 100 TB the input is read exactly once no matter how many levels).

    Output carries count AND sum(event_id) per cell so a single misplaced
    point at any level flips the value hash.
    """
    import pandas as pd

    from pygeoops_ray.stages.groupagg import grouped_agg

    def base_cells(batch: pa.Table) -> pa.Table:
        pts = sp.points_from_events(batch)
        px = pts["px"].to_numpy().astype(np.int64)
        py = pts["py"].to_numpy().astype(np.int64)
        return pa.Table.from_pydict(
            {
                "cx": pa.array(px // 256, pa.int64()),
                "cy": pa.array(py // 256, pa.int64()),
                "eid": batch["event_id"],
            }
        )

    # each level feeds TWO consumers (its tagged output branch and the next
    # rollup); Ray re-executes a shared lazy subplan once per consumer, so
    # without the materialize the base data aggregation would run 4x. The
    # materialized object is the POST-aggregate level (bounded by the tile
    # count, ~20k rows), never the input — the one-data-pass contract holds.
    level = grouped_agg(
        _read_blocked(sf_dir, "events", columns=["event_id"]).map_batches(
            base_cells, batch_format="pyarrow"
        ),
        ["cx", "cy"],
        [("eid", "size", "n_points"), ("eid", "sum", "sum_eid")],
        n_rows_hint=_table_rows(sf_dir, "events"),
    ).materialize()

    def tag(lv: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            out.insert(0, "level", np.int64(lv))
            for c in ("level", "cx", "cy", "n_points", "sum_eid"):
                out[c] = out[c].astype("int64")
            return out[["level", "cx", "cy", "n_points", "sum_eid"]]

        return fn

    levels = [level.map_batches(tag(0), batch_format="pandas")]
    for lv in range(1, 4):
        def halve(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            out["cx"] = out["cx"] // 2
            out["cy"] = out["cy"] // 2
            return out

        level = grouped_agg(
            level.map_batches(halve, batch_format="pandas"),
            ["cx", "cy"],
            [("n_points", "sum", "n_points"), ("sum_eid", "sum", "sum_eid")],
            n_rows_hint=4096,
        ).materialize()
        levels.append(level.map_batches(tag(lv), batch_format="pandas"))

    out = levels[0]
    for ds in levels[1:]:
        out = out.union(ds)
    return out


def q_nearest_rect(sf_dir: str):
    """Ring-bounded nearest-footprint join: every event point finds its
    nearest image rectangle among those overlapping the 3×3 tile ring
    around the point's home tile (squared point-to-rect distance, exact
    integers, ties to the smallest ordinal; points with an empty ring are
    omitted). The proximity-enrichment complement of the PIP join — "which
    image is this observation closest to" — with the search bounded by the
    ring so candidate volume per point stays constant at any corpus size.

    Shape: rects replicate to their covering tiles DILATED by one ring
    (bounded fan-out, (w/256+3)×(h/256+3) tiles per rect); points land in
    their home tile; one cogrouped shuffle, and the per-group distance
    matrix + argmin is a single numpy broadcast.
    """
    import pandas as pd

    from pygeoops_ray.stages.groupagg import _bucketed

    def rect_side(batch: pa.Table) -> pa.Table:
        minx = batch["minx"].to_numpy().astype(np.int64)
        miny = batch["miny"].to_numpy().astype(np.int64)
        maxx = batch["maxx"].to_numpy().astype(np.int64)
        maxy = batch["maxy"].to_numpy().astype(np.int64)
        i = batch["i"].to_numpy()
        tx_lo, tx_hi = minx // 256 - 1, (maxx - 1) // 256 + 1
        ty_lo, ty_hi = miny // 256 - 1, (maxy - 1) // 256 + 1
        nx = (tx_hi - tx_lo + 1).astype(np.int64)
        ny = (ty_hi - ty_lo + 1).astype(np.int64)
        reps = nx * ny
        idx = np.repeat(np.arange(len(i)), reps)
        # per-rect local tile offsets, flattened
        off = np.concatenate([np.arange(r) for r in reps]) if len(reps) else np.empty(0, np.int64)
        loc_ny = ny[idx]
        tx = tx_lo[idx] + off // loc_ny
        ty = ty_lo[idx] + off % loc_ny
        return pa.Table.from_pydict(
            {
                "tkey": pa.array((tx + 8) * 4096 + (ty + 8), pa.int64()),
                "i": pa.array(i[idx], pa.int64()),
                "minx": pa.array(minx[idx], pa.int64()),
                "miny": pa.array(miny[idx], pa.int64()),
                "maxx": pa.array(maxx[idx], pa.int64()),
                "maxy": pa.array(maxy[idx], pa.int64()),
                "event_id": pa.array(np.full(len(idx), -1), pa.int64()),
                "px": pa.array(np.zeros(len(idx), np.int64), pa.int64()),
                "py": pa.array(np.zeros(len(idx), np.int64), pa.int64()),
                "side": pa.array(np.zeros(len(idx), np.int64), pa.int64()),
            }
        )

    def point_side(batch: pa.Table) -> pa.Table:
        pts = sp.points_from_events(batch)
        px = pts["px"].to_numpy().astype(np.int64)
        py = pts["py"].to_numpy().astype(np.int64)
        e = pts["event_id"].to_numpy()
        n = len(e)
        return pa.Table.from_pydict(
            {
                "tkey": pa.array((px // 256 + 8) * 4096 + (py // 256 + 8), pa.int64()),
                "i": pa.array(np.full(n, -1), pa.int64()),
                "minx": pa.array(np.zeros(n, np.int64), pa.int64()),
                "miny": pa.array(np.zeros(n, np.int64), pa.int64()),
                "maxx": pa.array(np.zeros(n, np.int64), pa.int64()),
                "maxy": pa.array(np.zeros(n, np.int64), pa.int64()),
                "event_id": pa.array(e, pa.int64()),
                "px": pa.array(px, pa.int64()),
                "py": pa.array(py, pa.int64()),
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
            }
        )

    def nearest(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("tkey", sort=False):
            rects = g[g["side"] == 0]
            pts = g[g["side"] == 1]
            if not len(rects) or not len(pts):
                continue
            px = pts["px"].to_numpy()[:, None]
            py = pts["py"].to_numpy()[:, None]
            dx = np.maximum(
                np.maximum(rects["minx"].to_numpy()[None, :] - px,
                           px - rects["maxx"].to_numpy()[None, :]), 0
            )
            dy = np.maximum(
                np.maximum(rects["miny"].to_numpy()[None, :] - py,
                           py - rects["maxy"].to_numpy()[None, :]), 0
            )
            d2 = dx * dx + dy * dy
            # lexicographic (d2, i) argmin WITHOUT packing both into one
            # int64 (a d2*(1<<21)+i key breaks once i >= 2^21 — the part
            # table passes 2M rows around sf10 and large ordinals would
            # bleed into the d2 bits): min d2 per row, then min i among
            # the d2-minimal columns.
            ri = rects["i"].to_numpy()
            dmin = d2.min(axis=1, keepdims=True)
            best = np.where(d2 == dmin, ri[None, :], np.iinfo(np.int64).max).argmin(
                axis=1
            )
            outs.append(
                pd.DataFrame(
                    {
                        "event_id": pts["event_id"].to_numpy(),
                        "i": rects["i"].to_numpy()[best],
                        "d2": d2[np.arange(len(pts)), best],
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64") for c in ("event_id", "i", "d2")}
            )
        return pd.concat(outs, ignore_index=True)

    rects = _images(sf_dir).map_batches(rect_side, batch_format="pyarrow")
    pts = _read_blocked(sf_dir, "events", columns=["event_id"]).map_batches(
        point_side, batch_format="pyarrow"
    )
    return _bucketed(rects.union(pts), ["tkey"], nearest, 16)


def q_dbscan(sf_dir: str):
    """Grid-accelerated DBSCAN (eps=128, minPts=6) over a deterministic
    blob+noise point derivation — density-based spatial clustering, the
    geo-ML operator, exact end to end.

    Point rule (pure event_id arithmetic, replayed verbatim in SQL): events
    scatter into 97 tight blob boxes on a 512-spaced grid (64-px jitter;
    every 11th member lands in a far corner at offset 96..127 so
    neighbor counts genuinely vary inside a blob), every 13th event — and,
    past 15k events, all but every T-th (T = n//15000) — goes to a sparse
    noise strip instead, so blob sizes stay bounded at every scale.

    Distributed shape (the textbook two-pass grid DBSCAN):
      A. points replicate to their 3×3 eps-cell ring (bounded fan-out), one
         cogroup counts eps-neighbors per home point → core = n >= minPts;
      B. core flags rejoin the points (bucketed cogroup on event_id), a
         second cell cogroup emits core–core edges (home-side a<b, so each
         edge exactly once);
      C. connected components over the core graph (stages/graph.py, the
         bounded per-round min-label propagation) label clusters by their
         smallest member;
      D. labels rejoin the cores, a final cell cogroup assigns every
         non-core point with a core neighbor to the MIN core-neighbor label
         (border); everything else is noise and is omitted.
    Output: (event_id, cluster_id, role) with role core|border.
    """
    import pandas as pd

    from pygeoops_ray.stages.graph import connected_components
    from pygeoops_ray.stages.groupagg import _bucketed

    EPS, EPS2, MINPTS = 128, 128 * 128, 6
    n_events = _table_rows(sf_dir, "events")
    T = max(1, n_events // 8000)

    def derive(batch: pa.Table) -> pa.Table:
        e = batch["event_id"].to_numpy()
        c = e % 97
        far = e % 11 == 0
        dx = np.where(far, 96 + (e * 7) % 32, (e * 7) % 64)
        dy = np.where(far, 96 + (e * 13) % 32, (e * 13) % 64)
        noise = (e % 13 == 0) | ((e // 97) % T != 0)
        px = np.where(noise, (e * 9973) % 1_000_000, (c % 40) * 512 + 128 + dx)
        py = np.where(noise, 30_000 + (e * 31) % 5_000, (c // 40) * 512 + 128 + dy)
        return pa.Table.from_pydict(
            {
                "event_id": pa.array(e, pa.int64()),
                "px": pa.array(px.astype(np.int64), pa.int64()),
                "py": pa.array(py.astype(np.int64), pa.int64()),
            }
        )

    def rep9(extra: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            px = batch["px"].to_numpy()
            py = batch["py"].to_numpy()
            n = len(px)
            off = np.array([-1, 0, 1], dtype=np.int64)
            cx = np.broadcast_to(
                (px // EPS)[:, None, None] + off[None, :, None], (n, 3, 3)
            ).reshape(n, 9)
            cy = np.broadcast_to(
                (py // EPS)[:, None, None] + off[None, None, :], (n, 3, 3)
            ).reshape(n, 9)
            home = np.zeros((n, 9), dtype=np.int64)
            home[:, 4] = 1  # offset (0, 0)
            idx = np.repeat(np.arange(n), 9)
            cols = {
                "ckey": pa.array(((cx + 8) * 4096 + cy + 8).ravel(), pa.int64()),
                "home": pa.array(home.ravel(), pa.int64()),
                "px": pa.array(px[idx], pa.int64()),
                "py": pa.array(py[idx], pa.int64()),
            }
            for col in ["event_id", *extra]:
                cols[col] = pa.array(batch[col].to_numpy()[idx], pa.int64())
            return pa.Table.from_pydict(cols)

        return fn

    pts = _read_blocked(sf_dir, "events", columns=["event_id"]).map_batches(
        derive, batch_format="pyarrow"
    )

    # -- pass A: eps-neighbor counts -> core flags --------------------------
    def count_group(df: pd.DataFrame) -> pd.DataFrame:
        # one vectorized cell self-MERGE instead of a python loop per cell:
        # the noise strip alone makes ~1e5 near-singleton cells per 0.1 sf,
        # and iterating them dominated the first version 30x
        homes = df.loc[df["home"] == 1, ["ckey", "event_id", "px", "py"]]
        m = homes.merge(df[["ckey", "px", "py"]], on="ckey", suffixes=("", "_b"))
        dx = m["px"].to_numpy() - m["px_b"].to_numpy()
        dy = m["py"].to_numpy() - m["py_b"].to_numpy()
        hit = (dx * dx + dy * dy) <= EPS2
        out = (
            m.loc[hit]
            .groupby("event_id", sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        out["n"] = out["n"].astype("int64")
        return out

    counts = _bucketed(pts.map_batches(rep9([]), batch_format="pyarrow"),
                       ["ckey"], count_group, 16)

    # -- join core flags back onto points (bucketed cogroup on event_id) ----
    def attach(cols_from: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            p = df[df["side"] == 0]
            f = df[df["side"] == 1]
            out = p.merge(f[["event_id", cols_from]], on="event_id", how="inner")
            return out.drop(columns=["side"])

        return fn

    def tag(ds, side: int, keep: list[str]):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df[keep].copy()
            out["side"] = np.int64(side)
            for c in ("px", "py", "n", "core", "cluster_id"):
                if c not in out.columns:
                    out[c] = np.int64(0)
            return out[["event_id", "px", "py", "n", "core", "cluster_id", "side"]]

        return fn

    def core_flag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["core"] = (df["n"] >= MINPTS).astype(np.int64)
        return df

    flagged = _bucketed(
        pts.map_batches(tag(None, 0, ["event_id", "px", "py"]), batch_format="pandas").union(
            counts.map_batches(core_flag, batch_format="pandas").map_batches(
                tag(None, 1, ["event_id", "n", "core"]), batch_format="pandas"
            )
        ),
        ["event_id"],
        lambda df: df[df["side"] == 0][["event_id", "px", "py"]].merge(
            df[df["side"] == 1][["event_id", "core"]], on="event_id"
        ),
        16,
        # flagged feeds BOTH the edge pass and the label rejoin — without a
        # materialize each consumer re-executes the whole pass-A chain
        # (derive -> rep9 -> cell sort -> count cogroup), measured as 2x
        # duplicate plans in ds.stats()
    ).materialize()

    # -- pass B: core-core edges --------------------------------------------
    def edge_group(df: pd.DataFrame) -> pd.DataFrame:
        cores = df[df["core"] == 1]
        homes = cores.loc[cores["home"] == 1, ["ckey", "event_id", "px", "py"]]
        m = homes.merge(
            cores[["ckey", "event_id", "px", "py"]], on="ckey", suffixes=("", "_b")
        )
        dx = m["px"].to_numpy() - m["px_b"].to_numpy()
        dy = m["py"].to_numpy() - m["py_b"].to_numpy()
        hit = ((dx * dx + dy * dy) <= EPS2) & (
            m["event_id"].to_numpy() < m["event_id_b"].to_numpy()
        )
        out = m.loc[hit, ["event_id", "event_id_b"]].rename(
            columns={"event_id": "a", "event_id_b": "b"}
        )
        return out.astype({"a": "int64", "b": "int64"})

    edges = _bucketed(
        flagged.map_batches(rep9(["core"]), batch_format="pyarrow"),
        ["ckey"], edge_group, 16,
    )
    labels = connected_components(edges, "a", "b", n_edges_hint=n_events * 8)

    # -- pass D: borders ------------------------------------------------------
    def relabel(df: pd.DataFrame) -> pd.DataFrame:
        p = df[df["side"] == 0][["event_id", "px", "py", "core"]]
        l = df[df["side"] == 1][["event_id", "cluster_id"]]
        out = p.merge(l, on="event_id", how="left")
        # a core with no core NEIGHBOR is a singleton cluster of itself;
        # an unlabeled non-core is border/noise material (-1 until pass D)
        own = np.where(out["core"].to_numpy() == 1, out["event_id"].to_numpy(), -1)
        out["cluster_id"] = out["cluster_id"].fillna(pd.Series(own, index=out.index))
        return out.astype({"cluster_id": "int64"})

    labeled = _bucketed(
        flagged.map_batches(
            tag(None, 0, ["event_id", "px", "py", "core"]), batch_format="pandas"
        ).union(
            labels.map_batches(
                lambda df: df.rename(columns={"node": "event_id"}),
                batch_format="pandas",
            ).map_batches(tag(None, 1, ["event_id", "cluster_id"]), batch_format="pandas")
        ),
        ["event_id"],
        relabel,
        16,
        # labeled feeds both the border pass and the core-row output
    ).materialize()

    def border_group(df: pd.DataFrame) -> pd.DataFrame:
        homes = df.loc[
            (df["home"] == 1) & (df["core"] == 0), ["ckey", "event_id", "px", "py"]
        ]
        cores = df.loc[df["core"] == 1, ["ckey", "px", "py", "cluster_id"]]
        m = homes.merge(cores, on="ckey", suffixes=("", "_b"))
        dx = m["px"].to_numpy() - m["px_b"].to_numpy()
        dy = m["py"].to_numpy() - m["py_b"].to_numpy()
        hit = (dx * dx + dy * dy) <= EPS2
        out = (
            m.loc[hit]
            .groupby("event_id", sort=False)["cluster_id"]
            .min()
            .reset_index()
        )
        return out.astype({"event_id": "int64", "cluster_id": "int64"})

    borders = _bucketed(
        labeled.map_batches(rep9(["core", "cluster_id"]), batch_format="pyarrow"),
        ["ckey"], border_group, 16,
    )

    def as_role(role: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df[["event_id", "cluster_id"]].copy()
            out["role"] = role
            return out

        return fn

    core_rows = labeled.map_batches(
        lambda df: df[df["core"] == 1][["event_id", "cluster_id"]],
        batch_format="pandas",
    ).map_batches(as_role("core"), batch_format="pandas")
    border_rows = borders.map_batches(as_role("border"), batch_format="pandas")
    return core_rows.union(border_rows)
