"""Spatial map_batches stages + distributed join pipelines (Ray Data native).

The north-rule operators (SURVEY.md §2.3) over the georeferenced image table:
footprint derivation, Hilbert cell index, tile assignment (1→k flat expansion),
cell-cogrouped point-in-polygon join, kNN, raster-tile↔vector clip join.

All per-batch kernels are vectorized numpy over zero-copy Arrow batches; the
wide steps use hash-partitioned ``Dataset.join`` on ``cell_id`` so both sides
co-locate per cell. Polygons are replicated to each covering cell (bounded
fan-out: a footprint spans ≤ 4 cells of the 256-unit grid) and points are
assigned to exactly one cell, so every matching pair is found exactly once —
no post-dedup pass needed.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pygeoops_ray.cellindex import CellGrid
from pygeoops_ray.table.images import GRID_COLS, H0, W0

__all__ = [
    "image_meta_from_part",
    "points_from_events",
    "add_cell_id",
    "expand_covering_tiles",
    "pip_join_rects_points",
    "clip_tiles",
    "knn_points",
]

TILE = 256.0  # world tile size == cell size: one shuffle key reused across stages


def image_meta_from_part(batch: pa.Table) -> pa.Table:
    """Derive image metadata + footprint rect from part rows (ordinal = p_partkey).

    Mirrors the synthetic generator's georeference rule so the DuckDB oracle
    can recompute every downstream join with plain arithmetic.
    """
    i = batch["p_partkey"].to_numpy()
    w = (64 + (i * 37) % 193).astype(np.float64)
    h = (64 + (i * 53) % 151).astype(np.float64)
    col = i % GRID_COLS
    row = i // GRID_COLS
    minx = col.astype(np.float64) * W0
    miny = row.astype(np.float64) * H0
    return pa.Table.from_pydict(
        {
            "image_id": pc.binary_join_element_wise(
                pa.array(["img"] * len(i)), pc.cast(pa.array(i), pa.string()), "_"
            ),
            "i": pa.array(i, pa.int64()),
            "w": pa.array(w),
            "h": pa.array(h),
            "minx": pa.array(minx),
            "miny": pa.array(miny),
            "maxx": pa.array(minx + w),
            "maxy": pa.array(miny + h),
        }
    )


def points_from_events(batch: pa.Table) -> pa.Table:
    """Derive world points from event rows (pure arithmetic on event_id).

    Points land in the same world strip as the image footprints: slot column
    = event_id % 1000, slot row = (event_id // 1000) % 20, with an in-slot
    offset that hits a footprint of size (w, h) with probability ~(w*h)/256².
    """
    e = batch["event_id"].to_numpy()
    px = (e % 1000).astype(np.float64) * W0 + ((e * 7) % 256).astype(np.float64)
    py = ((e // 1000) % 20).astype(np.float64) * H0 + ((e * 13) % 256).astype(np.float64)
    return pa.Table.from_pydict(
        {"event_id": pa.array(e, pa.int64()), "px": pa.array(px), "py": pa.array(py)}
    )


def add_cell_id(
    batch: pa.Table, x_col: str = "px", y_col: str = "py", cell_size: float = TILE
) -> pa.Table:
    """Hilbert cell id of each point — the shuffle key."""
    grid = CellGrid(cell_size)
    cid = grid.cell_id(batch[x_col].to_numpy(), batch[y_col].to_numpy())
    return batch.append_column("cell_id", pa.array(cid, pa.int64()))


def _covering_expansion(minx, miny, maxx, maxy, tile: float):
    """Vectorized 1→k expansion of rects to covering (tile_x, tile_y) pairs.

    Returns (row_idx, tile_x, tile_y) arrays; half-open [min, max) semantics so
    an exactly tile-aligned max edge doesn't spill over.
    """
    c0 = np.floor(minx / tile).astype(np.int64)
    c1 = np.floor((maxx - 1e-9) / tile).astype(np.int64)
    r0 = np.floor(miny / tile).astype(np.int64)
    r1 = np.floor((maxy - 1e-9) / tile).astype(np.int64)
    ncols = c1 - c0 + 1
    nrows = r1 - r0 + 1
    counts = ncols * nrows
    row_idx = np.repeat(np.arange(len(minx)), counts)
    # per-output local ordinal within its rect: 0..counts[i]-1
    offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
    local = np.arange(int(counts.sum())) - np.repeat(offs, counts)
    nrows_rep = np.repeat(nrows, counts)
    tile_x = np.repeat(c0, counts) + local // nrows_rep
    tile_y = np.repeat(r0, counts) + local % nrows_rep
    return row_idx, tile_x, tile_y


def expand_covering_tiles(batch: pa.Table, tile: float = TILE) -> pa.Table:
    """Flat-expand each footprint row to one row per covering tile."""
    minx = batch["minx"].to_numpy()
    miny = batch["miny"].to_numpy()
    maxx = batch["maxx"].to_numpy()
    maxy = batch["maxy"].to_numpy()
    row_idx, tile_x, tile_y = _covering_expansion(minx, miny, maxx, maxy, tile)
    out = batch.take(pa.array(row_idx))
    out = out.append_column("tile_x", pa.array(tile_x, pa.int64()))
    out = out.append_column("tile_y", pa.array(tile_y, pa.int64()))
    return out


def add_tile_cell_id(batch: pa.Table, cell_size: float = TILE) -> pa.Table:
    """cell_id of a (tile_x, tile_y) pair (tile grid == cell grid)."""
    grid = CellGrid(cell_size)
    cid = grid.cell_id_of_colrow(batch["tile_x"].to_numpy(), batch["tile_y"].to_numpy())
    return batch.append_column("cell_id", pa.array(cid, pa.int64()))


def prep_points_broadcast(events_path: str, point_cols: tuple = ("event_id",)):
    """Build the broadcast points dict in a Ray task instead of on the driver.

    ``strategy="broadcast"`` normally executes the whole points-side plan
    driver-blocking BEFORE the big side's plan is even built (~1-1.5 s of Ray
    fixed cost at bench scale). The small side here is a pure function of one
    parquet file, so a single remote task can read + derive + cell-sort it
    WHILE the big side streams; the returned ObjectRef is handed to
    ``pip_join_rects_points(points_broadcast=...)`` and the first join task's
    ``ray.get`` blocks only if prep hasn't finished yet (it has — image decode
    dominates)."""
    import ray

    @ray.remote(num_cpus=1)
    def _prep(path: str, cols: tuple) -> dict:
        import pyarrow.parquet as pq

        t = points_from_events(pq.read_table(path, columns=["event_id"]))
        t = add_cell_id(t)
        cid = t["cell_id"].to_numpy()
        order = np.argsort(cid, kind="stable")
        out = {
            "cell_id": cid[order],
            "px": t["px"].to_numpy()[order],
            "py": t["py"].to_numpy()[order],
        }
        for c in cols:
            out[c] = t[c].to_numpy()[order]
        return out

    return _prep.remote(events_path, tuple(point_cols))


def pip_join_rects_points(
    rects_ds,
    points_ds,
    num_partitions: int = 8,
    rect_cols: tuple = ("image_id", "i"),
    point_cols: tuple = ("event_id",),
    strategy: str = "groupby",
    rect_col_types: dict | None = None,
    coarse_bits: int = 10,
    salt_hot: bool = False,
    hot_threshold: int | None = None,
    salt_factor: int = 8,
    points_broadcast=None,
    join_type: str = "inner",
    coalesce_blocks: int | None = None,
):
    """Distributed point-in-polygon join, co-partitioned on the Hilbert cell id.

    rects_ds needs (minx,miny,maxx,maxy) + rect_cols; points_ds needs (px,py)
    + point_cols. Rects are replicated per covering cell (<=4 on this grid),
    points keyed by their single cell, so every matching pair appears exactly
    once; the in-cell test is a vectorized [min,max) half-open containment.

    strategy="groupby" (default): side-tagged union -> shuffle on the SUPER
    cell (cell_id >> coarse_bits: 2^coarse_bits Hilbert-adjacent cells per
    group, so groups are few and spatially coherent; default 1024 cells/group
    keeps Ray's per-group dispatch overhead negligible while groups stay far
    under block size) -> per-group join fully vectorized via searchsorted on
    cell_id (no per-cell Python dispatch). At larger scale, raise coarse_bits
    so a group stays ~10^5-10^6 rows; salt hot buckets (skew) by splitting on
    (bucket, point-hash) and replicating the rect side per salt.
    "hashjoin" switches to ``Dataset.join(on=cell_id)`` + refine, which
    amortizes better when partitions are large and long-lived.

    rect_col_types: arrow types of rect_cols (default image_id:string, rest
    int64) - passed explicitly so no schema probe has to pre-execute the plan.
    """
    if join_type not in ("inner", "anti"):
        raise ValueError(f"join_type must be 'inner' or 'anti', got {join_type!r}")
    if join_type == "anti" and strategy != "groupby":
        # anti needs every point to flow through its (single) group even when
        # no rect shares it — only the co-grouped shape guarantees that
        raise ValueError("join_type='anti' requires strategy='groupby'")
    rcells = rects_ds.map_batches(expand_covering_tiles, batch_format="pyarrow").map_batches(
        add_tile_cell_id, batch_format="pyarrow"
    )
    rcells = rcells.select_columns(list(rect_cols) + ["minx", "miny", "maxx", "maxy", "cell_id"])
    if points_broadcast is None:
        pcells = points_ds.map_batches(add_cell_id, batch_format="pyarrow")
        pcells = pcells.select_columns(list(point_cols) + ["px", "py", "cell_id"])
    elif strategy != "broadcast":
        raise ValueError("points_broadcast requires strategy='broadcast'")

    if strategy == "hashjoin":
        joined = rcells.join(
            pcells, join_type="inner", num_partitions=num_partitions, on=("cell_id",)
        )

        def refine(batch: pa.Table) -> pa.Table:
            px = batch["px"].to_numpy()
            py = batch["py"].to_numpy()
            keep = (
                (px >= batch["minx"].to_numpy())
                & (px < batch["maxx"].to_numpy())
                & (py >= batch["miny"].to_numpy())
                & (py < batch["maxy"].to_numpy())
            )
            return batch.filter(pa.array(keep)).select(list(rect_cols) + list(point_cols))

        return joined.map_batches(refine, batch_format="pyarrow")

    rnames = list(rect_cols)
    pnames = list(point_cols)
    rect_id_types = dict(rect_col_types or {})
    for c in rnames:
        rect_id_types.setdefault(c, pa.string() if c == "image_id" else pa.int64())

    if strategy == "broadcast":
        # small points side: ship it to the object store once, join inside
        # map_batches over the streaming rect side — no shuffle at all.
        # The scale rule: broadcast when one side fits comfortably in a
        # worker's heap (guide: "broadcast small sides"), else co-partition.
        import ray

        if points_broadcast is not None:
            # prepped concurrently by prep_points_broadcast — no driver block
            bref = points_broadcast
        else:
            # iter_batches: ONE plan execution (to_arrow_refs additionally runs
            # a limit-1 schema probe pipeline — ~1s of avoidable Ray fixed cost)
            pt = pa.concat_tables(
                pcells.iter_batches(batch_format="pyarrow", batch_size=None)
            ).combine_chunks()
            pc_ = pt["cell_id"].to_numpy()
            order = np.argsort(pc_, kind="stable")
            broadcast = {
                "cell_id": pc_[order],
                "px": pt["px"].to_numpy()[order],
                "py": pt["py"].to_numpy()[order],
            }
            for c in pnames:
                broadcast[c] = pt[c].to_numpy()[order]
            bref = ray.put(broadcast)

        def broadcast_join(batch: pa.Table) -> pa.Table:
                # plasma get is a local zero-copy map lookup after first fetch
                p = ray.get(bref)
                rc = batch["cell_id"].to_numpy()
                starts = np.searchsorted(p["cell_id"], rc, side="left")
                ends = np.searchsorted(p["cell_id"], rc, side="right")
                counts = ends - starts
                total = int(counts.sum())
                if total == 0:
                    return pa.Table.from_pydict(
                        {
                            **{c: pa.array([], rect_id_types[c]) for c in rnames},
                            **{c: pa.array([], pa.int64()) for c in pnames},
                        }
                    )
                ri = np.repeat(np.arange(len(rc)), counts)
                offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
                local = np.arange(total) - np.repeat(offs, counts)
                pi = np.repeat(starts, counts) + local
                px = p["px"][pi]
                py = p["py"][pi]
                hit = (
                    (px >= batch["minx"].to_numpy()[ri])
                    & (px < batch["maxx"].to_numpy()[ri])
                    & (py >= batch["miny"].to_numpy()[ri])
                    & (py < batch["maxy"].to_numpy()[ri])
                )
                ri = ri[hit]
                pi = pi[hit]
                cols = {c: batch[c].take(pa.array(ri)) for c in rnames}
                for c in pnames:
                    cols[c] = pa.array(p[c][pi], pa.int64())
                return pa.Table.from_pydict(cols)

        return rcells.map_batches(broadcast_join, batch_format="pyarrow")

    # --- skew handling: salt hot buckets -------------------------------------
    # A hot bucket (too many points for one group) is split into salt_factor
    # sub-keys: each point goes to exactly one salt (hash of its id), the rect
    # side is REPLICATED to every salt of that bucket — every pair still meets
    # exactly once, but no single group exceeds ~hot_threshold points.
    grid = CellGrid(TILE)
    hot: dict[int, int] = {}
    if salt_hot:
        # per-block PARTIAL bucket counts before the groupby: the exchange
        # moves blocks x distinct-buckets-per-block rows, not one row per
        # point (the full-column shuffle here was itself a scaling cost)
        def bucket_partial(b: pa.Table) -> pa.Table:
            cell = grid.cell_id(b["px"].to_numpy(), b["py"].to_numpy())
            u, c = np.unique(cell >> coarse_bits, return_counts=True)
            return pa.Table.from_pydict(
                {"bucket": pa.array(u, pa.int64()), "n": pa.array(c, pa.int64())}
            )

        counts_df = (
            points_ds.map_batches(bucket_partial, batch_format="pyarrow")
            .groupby("bucket")
            .sum("n")
            .to_pandas()
        )
        ncol = [c for c in counts_df.columns if c != "bucket"][0]
        thr = hot_threshold
        if thr is None:
            thr = max(int(4 * counts_df[ncol].mean()), 10_000)
        for _, row in counts_df[counts_df[ncol] > thr].iterrows():
            hot[int(row["bucket"])] = salt_factor
    MAXSALT = 64

    def _mix(ids: np.ndarray) -> np.ndarray:
        z = ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return ((z >> np.uint64(33)) ^ z).astype(np.int64)

    # --- narrow exchange schema ----------------------------------------------
    # Bytes per exchanged row are the scaling currency of this all-to-all:
    # instead of unioning both sides' full-width schemas (null columns in
    # Arrow still ship their value buffers), the two sides SHARE column
    # slots — f0/f1 carry (px,py) or (minx,miny), f2/f3 carry (maxx,maxy)
    # (null on the big point side), int64 id columns pair up in k{j} slots —
    # and cell_id never ships at all: the reducer recomputes point cells
    # from (px,py) and rect covering cells from the bbox, so the rect side
    # also dedupes to one row per (rect, BUCKET, salt) instead of one per
    # covering cell. skey is int32 (bucket < 2^(2*order-coarse_bits) and
    # MAXSALT=64 keep it under 2^31 for any order <= 17). Measured on the
    # bench shuffle workload: 85 -> ~45 B/point-row.
    n_k = max(len(pnames), sum(1 for c in rnames if rect_id_types[c] == pa.int64()))
    r_int64 = [c for c in rnames if rect_id_types[c] == pa.int64()]
    r_other = [c for c in rnames if rect_id_types[c] != pa.int64()]
    skey_t = pa.int32() if (2 * grid.order - coarse_bits + 6) < 31 else pa.int64()
    skey_np = np.int32 if skey_t == pa.int32() else np.int64

    def rside(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:  # _covering_expansion can't repeat over 0 rects
            cols = {
                "skey": pa.array([], skey_t),
                "side": pa.array([], pa.int8()),
                **{f: pa.array([], pa.float64()) for f in ("f0", "f1", "f2", "f3")},
                **{f"k{j}": pa.array([], pa.int64()) for j in range(n_k)},
                **{c: pa.array([], rect_id_types[c]) for c in r_other},
            }
            return pa.Table.from_pydict(cols)
        minx = b["minx"].to_numpy()
        miny = b["miny"].to_numpy()
        maxx = b["maxx"].to_numpy()
        maxy = b["maxy"].to_numpy()
        row_idx, tx, ty = _covering_expansion(minx, miny, maxx, maxy, TILE)
        bucket = grid.cell_id_of_colrow(tx, ty) >> coarse_bits
        # dedupe to one row per (rect, bucket)
        order = np.lexsort((bucket, row_idx))
        row_idx, bucket = row_idx[order], bucket[order]
        first = np.empty(len(row_idx), dtype=bool)
        if len(first):
            first[0] = True
            first[1:] = (row_idx[1:] != row_idx[:-1]) | (bucket[1:] != bucket[:-1])
        row_idx, bucket = row_idx[first], bucket[first]
        if hot:
            reps = np.array([hot.get(int(x), 1) for x in bucket], dtype=np.int64)
            idx = np.repeat(np.arange(len(bucket)), reps)
            offs = np.concatenate([[0], np.cumsum(reps)[:-1]])
            salt = np.arange(int(reps.sum())) - np.repeat(offs, reps)
            row_idx = row_idx[idx]
            bucket = bucket[idx]
        else:
            salt = np.zeros(len(bucket), dtype=np.int64)
        b = b.take(pa.array(row_idx))
        n = len(bucket)
        cols = {
            "skey": pa.array((bucket * MAXSALT + salt).astype(skey_np), skey_t),
            "side": pa.array(np.zeros(n, np.int8)),
            "f0": b["minx"],
            "f1": b["miny"],
            "f2": b["maxx"],
            "f3": b["maxy"],
        }
        for j in range(n_k):
            cols[f"k{j}"] = (
                b[r_int64[j]] if j < len(r_int64) else pa.nulls(n, pa.int64())
            )
        for c in r_other:
            cols[c] = b[c]
        return pa.Table.from_pydict(cols)

    def pside(b: pa.Table) -> pa.Table:
        px = b["px"].to_numpy()
        py = b["py"].to_numpy()
        bucket = grid.cell_id(px, py) >> coarse_bits
        if hot:
            factors = np.array([hot.get(int(x), 1) for x in bucket], dtype=np.int64)
            salt = np.where(
                factors > 1, np.abs(_mix(b[pnames[0]].to_numpy())) % factors, 0
            )
        else:
            salt = np.zeros(len(bucket), dtype=np.int64)
        n = len(bucket)
        cols = {
            "skey": pa.array((bucket * MAXSALT + salt).astype(skey_np), skey_t),
            "side": pa.array(np.ones(n, np.int8)),
            "f0": b["px"],
            "f1": b["py"],
            "f2": pa.nulls(n, pa.float64()),
            "f3": pa.nulls(n, pa.float64()),
        }
        for j in range(n_k):
            cols[f"k{j}"] = b[pnames[j]] if j < len(pnames) else pa.nulls(n, pa.int64())
        for c in r_other:
            cols[c] = pa.nulls(n, rect_id_types[c])
        return pa.Table.from_pydict(cols)

    import pandas as pd

    rcells_g = rects_ds.map_batches(
        lambda b: b.select(list(rect_cols) + ["minx", "miny", "maxx", "maxy"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    pcells_g = points_ds.map_batches(
        lambda b: b.select(list(point_cols) + ["px", "py"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    both = rcells_g.map_batches(rside, batch_format="pyarrow").union(
        pcells_g.map_batches(pside, batch_format="pyarrow")
    )
    # Coalesce before the all-to-all: sort partition count follows input
    # block count, so B input blocks cost B^2 shuffle objects. Upstream
    # reads routinely arrive at 60-80 blocks -> ~6000 tiny objects whose
    # per-object fixed cost dominated the exchange wall (measured 5.7 s of
    # a 6.9 s join at 8 cpus with ~1.2 s of actual compute). ~1 block per
    # core keeps objects MB-sized; no-shuffle repartition is a local
    # split/merge, not an exchange. coalesce_blocks=0 disables (callers
    # that already size their upstream blocks skip the extra pass).
    if coalesce_blocks != 0:
        if coalesce_blocks is None:
            import ray as _ray

            ncpu = (
                int(_ray.cluster_resources().get("CPU", 8))
                if _ray.is_initialized()
                else 8
            )
            coalesce_blocks = max(8, ncpu)
        both = both.repartition(coalesce_blocks)

    anti = join_type == "anti"
    # Emit TYPED ARROW from the group reducer (not pandas): zero-row pandas
    # blocks break Ray's size estimator (np.vectorize on size-0 → one error
    # log per empty group) and every block pays a pandas→Arrow hop later;
    # Arrow out keeps empty groups schema-stable for downstream shuffles.
    out_fields = (
        [] if anti else [(c, rect_id_types[c]) for c in rnames]
    ) + [(c, pa.int64()) for c in pnames]
    out_schema = pa.schema(out_fields)
    empty_out = out_schema.empty_table()

    def _emit(d: dict) -> pa.Table:
        return pa.Table.from_arrays(
            [pa.array(np.asarray(d[n]), type=t) for n, t in out_fields],
            schema=out_schema,
        )

    # name of the k-slot (or unshared column) carrying each output id column
    p_slot = {c: f"k{j}" for j, c in enumerate(pnames)}
    r_slot = {c: f"k{r_int64.index(c)}" if c in r_int64 else c for c in rnames}

    def join_group(grp: pa.Table) -> pa.Table:
        # pyarrow-native group reducer (round-5): the group slice stays an
        # Arrow table — float/int buffers view into the shuffled block
        # zero-copy via numpy, no per-group DataFrame construction. Only
        # the columns a side actually reads are converted.
        def col(name: str) -> np.ndarray:
            c = grp[name]
            if c.num_chunks == 1:
                a = c.chunk(0)
            else:  # group slices are single-chunk in practice
                a = c.combine_chunks()
            return a.to_numpy(zero_copy_only=False)

        side = col("side")
        idx_r = np.flatnonzero(side == 0)
        idx_p = np.flatnonzero(side == 1)
        if len(idx_p) == 0:
            return empty_out

        def pcol(name: str, sel: np.ndarray | None = None) -> np.ndarray:
            v = col(name)[idx_p]
            return v if sel is None else v[sel]

        if len(idx_r) == 0:
            # a point lands in exactly one group, so "no rects here" means
            # globally uncovered — the anti output is the whole point side
            if anti:
                return _emit({c: pcol(p_slot[c]) for c in pnames})
            return empty_out
        bucket = int(grp["skey"][0].as_py()) // MAXSALT
        # rebuild the (rect, covering-cell) pairs the exchange elided: same
        # _covering_expansion + hilbert id as the classic pipeline, filtered
        # to this group's bucket
        f0 = col("f0")
        f1 = col("f1")
        rminx = f0[idx_r]
        rminy = f1[idx_r]
        rmaxx = col("f2")[idx_r]
        rmaxy = col("f3")[idx_r]
        rrow, tx, ty = _covering_expansion(rminx, rminy, rmaxx, rmaxy, TILE)
        cell = grid.cell_id_of_colrow(tx, ty)
        keep = (cell >> coarse_bits) == bucket
        rrow, rc = rrow[keep], cell[keep]
        order = np.argsort(rc, kind="stable")
        rc = rc[order]
        rrow = rrow[order]
        px = f0[idx_p]
        py = f1[idx_p]
        pc_ = grid.cell_id(px, py)
        starts = np.searchsorted(rc, pc_, side="left")
        ends = np.searchsorted(rc, pc_, side="right")
        counts = ends - starts
        if counts.sum() == 0:
            if anti:
                return _emit({c: pcol(p_slot[c]) for c in pnames})
            return empty_out
        pi = np.repeat(np.arange(len(pc_)), counts)
        offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
        local = np.arange(int(counts.sum())) - np.repeat(offs, counts)
        ci = np.repeat(starts, counts) + local
        ri = rrow[ci]
        hit = (
            (px[pi] >= rminx[ri])
            & (px[pi] < rmaxx[ri])
            & (py[pi] >= rminy[ri])
            & (py[pi] < rmaxy[ri])
        )
        ri = ri[hit]
        pi = pi[hit]
        if anti:
            covered = np.zeros(len(pc_), dtype=bool)
            covered[pi] = True
            return _emit({c: pcol(p_slot[c])[~covered] for c in pnames})
        if len(ri) == 0:
            return empty_out
        out = {c: col(r_slot[c])[idx_r[ri]] for c in rnames}
        out.update({c: pcol(p_slot[c], pi) for c in pnames})
        return _emit(out)

    joined = both.groupby("skey").map_groups(join_group, batch_format="pyarrow")

    def fix_types(batch: pa.Table) -> pa.Table:
        cols = {}
        if not anti:
            for c in rnames:
                cols[c] = batch[c].cast(rect_id_types[c]) if batch[c].type != rect_id_types[c] else batch[c]
        for c in pnames:
            cols[c] = batch[c].cast(pa.int64()) if batch[c].type != pa.int64() else batch[c]
        return pa.Table.from_pydict(cols)

    return joined.map_batches(fix_types, batch_format="pyarrow")


def clip_tiles(rects_ds, tile: float = TILE, use_kernel: bool = False):
    """Raster-tile ↔ vector-polygon clip join: per (footprint, covering tile),
    the clipped area.

    Default is the vectorized rect fast path — footprints here ARE rects, and
    the per-pair Sutherland-Hodgman kernel is output-identical but ~100×
    slower (a Python loop per pair). ``use_kernel=True`` keeps the general
    polygon-clipping path for true polygon columns (exercised in pytest,
    where the two paths are asserted equal).
    """
    from pygeoops_ray.geo import geom as g
    from pygeoops_ray.geo.clip import rect_clip_area

    def clip_batch(batch: pa.Table) -> pa.Table:
        batch = expand_covering_tiles(batch, tile)
        minx = batch["minx"].to_numpy()
        miny = batch["miny"].to_numpy()
        maxx = batch["maxx"].to_numpy()
        maxy = batch["maxy"].to_numpy()
        tx = batch["tile_x"].to_numpy()
        ty = batch["tile_y"].to_numpy()
        if use_kernel:
            areas = np.empty(len(tx))
            for k in range(len(tx)):
                poly = g.box(minx[k], miny[k], maxx[k], maxy[k])
                areas[k] = rect_clip_area(
                    poly, (tx[k] * tile, ty[k] * tile, (tx[k] + 1) * tile, (ty[k] + 1) * tile)
                )
        else:
            areas = np.maximum(
                np.minimum(maxx, (tx + 1) * tile) - np.maximum(minx, tx * tile), 0
            ) * np.maximum(np.minimum(maxy, (ty + 1) * tile) - np.maximum(miny, ty * tile), 0)
        return batch.append_column("clip_area", pa.array(areas))

    return rects_ds.map_batches(clip_batch, batch_format="pyarrow")


class _PartialKnn:
    """Per-batch partial top-k of candidate points against a broadcast query set.

    Runs as stateless TASKS: the query matrix lives in the object store
    (ray.put once on the driver); ray.get per batch is a local zero-copy
    lookup after the first fetch on each worker. (An actor pool sized near
    the session's CPUs can starve the upstream read and deadlock.)
    """

    def __init__(self, queries_ref, k: int):
        self.queries_ref = queries_ref
        self.q = None
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.q is None:
            import ray

            self.q = ray.get(self.queries_ref)
        self.q_ids, self.qx, self.qy = self.q
        px = batch["px"].to_numpy()
        py = batch["py"].to_numpy()
        ids = batch["event_id"].to_numpy()
        out_q, out_id, out_d = [], [], []
        # distance matrix: queries are few (broadcast side), candidates a batch
        d2 = (px[None, :] - self.qx[:, None]) ** 2 + (py[None, :] - self.qy[:, None]) ** 2
        k = min(self.k, d2.shape[1])
        for qi in range(len(self.q_ids)):
            # partial selection must respect the GLOBAL tie-break (dist2,
            # event_id): argpartition on distance alone can drop the
            # smaller-id candidate of a tie at the k-th boundary. lexsort on
            # the composite key keeps partials consistent with the merge.
            idx = np.lexsort((ids, d2[qi]))[:k]
            out_q.append(np.full(len(idx), self.q_ids[qi], dtype=np.int64))
            out_id.append(ids[idx])
            out_d.append(d2[qi][idx])
        return pa.Table.from_pydict(
            {
                "q_id": pa.array(np.concatenate(out_q), pa.int64()),
                "event_id": pa.array(np.concatenate(out_id), pa.int64()),
                "dist2": pa.array(np.concatenate(out_d)),
            }
        )


def knn_points(points_ds, q_ids, qx, qy, k: int = 5, concurrency: int = 4):
    """Exact kNN of each broadcast query point against the points dataset.

    Two-phase: per-batch vectorized partial top-k (actor pool, query matrix in
    object store), then a tiny grouped exact merge. Ties break on event_id.
    """
    import pandas as pd
    import ray

    ref = ray.put((np.asarray(q_ids, np.int64), np.asarray(qx, float), np.asarray(qy, float)))
    partials = points_ds.map_batches(
        _PartialKnn(ref, k), batch_format="pyarrow"
    )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["dist2", "event_id"]).head(k).copy()
        group["rnk"] = np.arange(1, len(group) + 1, dtype=np.int64)
        return group[["q_id", "event_id", "rnk"]]

    return partials.groupby("q_id").map_groups(merge, batch_format="pandas")


def proximity_pairs(rects_ds, dist: float, cell: float = TILE, n_rows_hint: int | None = None):
    """Spatial SELF-join: all rect pairs (i_a < i_b) whose x-gap AND y-gap are
    both <= ``dist`` (L∞ distance between axis-aligned footprints).

    Partition-based spatial merge with REFERENCE-POINT dedup: each rect,
    expanded by dist/2 per side (clamped at the world origin), replicates to
    its covering cells (bounded fan-out — the expansion is small relative to
    the cell size); candidate pairs enumerate per cell via a vectorized
    same-cell merge; a pair is REPORTED only in the one cell containing the
    min corner of its expanded-overlap region, which both expanded rects
    cover by definition — exactly-once globally with no second dedup
    shuffle. Shuffle key is the same Hilbert ``cell_id`` every other spatial
    stage uses.
    """
    import pandas as pd

    from pygeoops_ray.stages.groupagg import _bucket_count, _bucketed

    half = dist / 2.0
    grid = CellGrid(cell)

    def expand_to_cells(batch: pa.Table) -> pa.Table:
        minx = batch["minx"].to_numpy()
        miny = batch["miny"].to_numpy()
        maxx = batch["maxx"].to_numpy()
        maxy = batch["maxy"].to_numpy()
        eminx = np.maximum(minx - half, 0.0)
        eminy = np.maximum(miny - half, 0.0)
        # CLOSED max edge (+1e-6 beats _covering_expansion's half-open -1e-9):
        # a pair at gap == dist has touching expanded rects; if the touch
        # point sits exactly on a cell boundary the reference point lands in
        # the NEXT cell, so the max-side rect must replicate there too.
        row_idx, tx, ty = _covering_expansion(
            eminx, eminy, maxx + half + 1e-6, maxy + half + 1e-6, cell
        )
        cid = grid.cell_id_of_colrow(tx, ty)
        return pa.Table.from_pydict(
            {
                "i": pa.array(batch["i"].to_numpy()[row_idx], pa.int64()),
                "minx": pa.array(minx[row_idx]),
                "miny": pa.array(miny[row_idx]),
                "maxx": pa.array(maxx[row_idx]),
                "maxy": pa.array(maxy[row_idx]),
                "cell_id": pa.array(cid, pa.int64()),
            }
        )

    cand = rects_ds.map_batches(expand_to_cells, batch_format="pyarrow")

    def pair_reduce(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="cell_id", suffixes=("_a", "_b"))
        m = m[m["i_a"] < m["i_b"]]
        if not len(m):
            return pd.DataFrame(
                {
                    "img_a": pd.Series([], dtype=np.int64),
                    "img_b": pd.Series([], dtype=np.int64),
                    "x_gap": pd.Series([], dtype=np.int64),
                    "y_gap": pd.Series([], dtype=np.int64),
                }
            )
        x_gap = np.maximum(
            np.maximum(m["minx_b"] - m["maxx_a"], m["minx_a"] - m["maxx_b"]), 0.0
        ).to_numpy()
        y_gap = np.maximum(
            np.maximum(m["miny_b"] - m["maxy_a"], m["miny_a"] - m["maxy_b"]), 0.0
        ).to_numpy()
        # reference point: min corner of the expanded-overlap region
        rx = np.maximum(
            np.maximum(m["minx_a"], m["minx_b"]).to_numpy() - half, 0.0
        )
        ry = np.maximum(
            np.maximum(m["miny_a"], m["miny_b"]).to_numpy() - half, 0.0
        )
        home = grid.cell_id(rx, ry)
        keep = (x_gap <= dist) & (y_gap <= dist) & (home == m["cell_id"].to_numpy())
        out = m.loc[keep]
        return pd.DataFrame(
            {
                "img_a": out["i_a"].to_numpy(),
                "img_b": out["i_b"].to_numpy(),
                "x_gap": x_gap[keep].astype(np.int64),
                "y_gap": y_gap[keep].astype(np.int64),
            }
        )

    nb = _bucket_count(16, n_rows_hint)
    return _bucketed(cand, ["cell_id"], pair_reduce, nb)


def knn_join_ring(
    points_ds,
    queries_df,
    k: int = 3,
    cell: float = TILE,
    max_rings: int = 64,
    sink_dir: str | None = None,
    part_side: int = 8,
    ring_stats: list | None = None,
):
    """Exact kNN JOIN via cell neighbor-RING expansion (north-rule shape).

    ``knn_points`` broadcasts the query matrix and scans EVERY corpus point
    against every query — right when queries are few and the corpus must be
    streamed once anyway. This is the pruned variant for when the corpus is
    huge: the points shuffle ONCE into a manifest-partitioned parquet sink
    keyed by spatial block (``part_side`` × ``part_side`` cells per file;
    ``state/manifest.write_partitioned``). Each round r the still-unresolved
    queries replicate only to the cells of Chebyshev ring r, and the point
    side of that round is a PRUNED READ: only the partition files whose
    block the ring touches are opened (``manifest.read_partitions``), with
    the exact touched-cell set pushed into their row groups as a pyarrow
    ``isin`` filter. A query RESOLVES when its k-th best distance is
    provably inside the searched radius — any point in an unsearched cell
    is at L∞ > r·cell from the query, so dist² > (r·cell)² certifies
    exactness.

    ``queries_df`` is a pandas frame (q_id, qx, qy) — the query side is the
    SMALL side by contract (its per-round ring bookkeeping is driver-side
    control plane, like the CC fixpoint sum). The running top-k accumulator
    stays a DATASET: each round unions the new co-grouped partials and
    reduces grouped-by-q_id top-k in the shuffle; the driver pulls only the
    per-query resolution certificate (count + k-th distance, ≤ one row per
    query). Each point lives in exactly one cell and each (query, cell) is
    searched exactly once, so candidates never duplicate across rounds.
    Ties break on (dist², event_id); dist² over integer-valued coordinates
    is integer-exact.

    ``sink_dir`` selects the point-side strategy. ``None`` (default): the
    points materialize once in the OBJECT STORE and each ring filters them
    in-stream with a broadcast touched-cell ``isin`` — no I/O, right when
    the join is a one-shot over an in-flight stream. A path: the points live
    in / are written to a manifest-partitioned sink there and each ring is a
    pruned FILE read — right when the corpus is at rest (a prior ingest
    wrote it) or too big for the object store; an existing sink (manifest
    present) is reused without rewriting. ``ring_stats``, if given, receives
    one dict per ring: {"ring": r, "files_read": n, "files_total": m}
    (sink mode only).

    Returns (q_id, event_id, rnk, dist2) with rnk 1..k; the query's own
    point (same event_id) is excluded.
    """
    import pandas as pd

    import ray
    import ray.data as rd

    from pygeoops_ray.state import manifest as mf

    grid = CellGrid(cell)
    part_mult = np.int64(1) << np.int64(21)

    def block_of(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
        return (cx // part_side) * part_mult + (cy // part_side)

    def add_cells_and_block(batch: pa.Table) -> pa.Table:
        batch = add_cell_id(batch)
        cx = np.floor(batch["px"].to_numpy() / cell).astype(np.int64)
        cy = np.floor(batch["py"].to_numpy() / cell).astype(np.int64)
        return batch.append_column(
            "part_id", pa.array(block_of(cx, cy), pa.int64())
        )

    if sink_dir is None:
        pts = points_ds.map_batches(
            lambda b: add_cell_id(b), batch_format="pyarrow"
        ).materialize()

        def pts_for_ring(touched_cells, touched_parts, r):
            touched_ref = ray.put(touched_cells)

            def cell_filter(batch: pa.Table) -> pa.Table:
                keep = np.isin(batch["cell_id"].to_numpy(), ray.get(touched_ref))
                return batch.filter(pa.array(keep))

            return pts.map_batches(
                cell_filter, batch_format="pyarrow", batch_size=None
            )

    else:
        if not os.path.exists(os.path.join(sink_dir, "_manifest_main.jsonl")):
            mf.write_partitioned(
                points_ds.map_batches(add_cells_and_block, batch_format="pyarrow"),
                sink_dir,
                partition_col="part_id",
                stage="main",
            )

        def pts_for_ring(touched_cells, touched_parts, r):
            # File-level pruning comes from the manifest (the real I/O win);
            # exact cell membership is a vectorized np.isin map AFTER the
            # read — pushing a ring's 10k+-cell isin expression into the
            # parquet scan cost ~2 s per round in driver-side expression
            # setup and per-row-group evaluation, vs milliseconds here
            # (touched cells are scattered, so row-group stats can't prune
            # on them anyway).
            ds, n_read, n_total = mf.read_partitions(sink_dir, touched_parts)
            if ring_stats is not None:
                ring_stats.append(
                    {"ring": r, "files_read": n_read, "files_total": n_total}
                )
            if ds is None:
                return None
            touched_ref = ray.put(touched_cells)

            def cell_filter(batch: pa.Table) -> pa.Table:
                keep = np.isin(batch["cell_id"].to_numpy(), ray.get(touched_ref))
                # strip any file-borne schema metadata (pre-fix sinks carry
                # pandas metadata → unhashable schemas → slow shuffle path)
                return batch.filter(pa.array(keep)).replace_schema_metadata(None)

            return ds.map_batches(
                cell_filter, batch_format="pyarrow", batch_size=None
            )

    return _knn_ring_rounds(
        pts_for_ring, queries_df, k, cell, max_rings, grid, block_of
    )


def _knn_ring_rounds(pts_for_ring, queries_df, k, cell, max_rings, grid, block_of):
    import pandas as pd

    import ray.data as rd

    from pygeoops_ray.stages.groupagg import _bucketed

    q = queries_df.reset_index(drop=True).copy()
    q["cx"] = np.floor(q["qx"].to_numpy() / cell).astype(np.int64)
    q["cy"] = np.floor(q["qy"].to_numpy() / cell).astype(np.int64)

    def _shell_offsets(r: int) -> np.ndarray:
        if r == 0:
            return np.array([[0, 0]], dtype=np.int64)
        side = np.arange(-r, r + 1, dtype=np.int64)
        top = np.stack([side, np.full_like(side, -r)], axis=1)
        bot = np.stack([side, np.full_like(side, r)], axis=1)
        mid = np.arange(-r + 1, r, dtype=np.int64)
        lef = np.stack([np.full_like(mid, -r), mid], axis=1)
        rig = np.stack([np.full_like(mid, r), mid], axis=1)
        return np.concatenate([top, bot, lef, rig])

    def ring_rows(qd: pd.DataFrame, rings: list) -> pd.DataFrame:
        """Replicate each query to the cells of the given Chebyshev shells
        (a ROUND may search several consecutive rings in one exchange —
        fewer fixed-cost rounds; the certificate bound uses the round's
        max ring, and shells are disjoint so no (query, cell) repeats)."""
        offs = np.concatenate([_shell_offsets(r) for r in rings])
        nq, no = len(qd), len(offs)
        cx = np.repeat(qd["cx"].to_numpy(), no) + np.tile(offs[:, 0], nq)
        cy = np.repeat(qd["cy"].to_numpy(), no) + np.tile(offs[:, 1], nq)
        keep = (cx >= 0) & (cy >= 0)
        cx, cy = cx[keep], cy[keep]
        out = pd.DataFrame(
            {
                "cell_id": grid.cell_id_of_colrow(cx, cy),
                "part_id": block_of(cx, cy),
                "q_id": np.repeat(qd["q_id"].to_numpy(), no)[keep],
                "qx": np.repeat(qd["qx"].to_numpy(), no)[keep],
                "qy": np.repeat(qd["qy"].to_numpy(), no)[keep],
            }
        )
        return out

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        qd = df[df["kind"] == 1]
        pdf = df[df["kind"] == 0]
        if not len(qd) or not len(pdf):
            return pd.DataFrame(
                {
                    "q_id": pd.Series([], dtype=np.int64),
                    "event_id": pd.Series([], dtype=np.int64),
                    "dist2": pd.Series([], dtype=np.int64),
                }
            )
        m = qd[["cell_id", "q_id", "x", "y"]].merge(
            pdf[["cell_id", "event_id", "x", "y"]].rename(
                columns={"x": "px", "y": "py"}
            ),
            on="cell_id",
        )
        m = m[m["event_id"] != m["q_id"]]
        dx = m["px"].to_numpy() - m["x"].to_numpy()
        dy = m["py"].to_numpy() - m["y"].to_numpy()
        d2 = (dx * dx + dy * dy).astype(np.int64)
        out = pd.DataFrame(
            {"q_id": m["q_id"].to_numpy(), "event_id": m["event_id"].to_numpy(), "dist2": d2}
        )
        # per-(bucket, query) partial top-k before anything moves again
        out = out.sort_values(["q_id", "dist2", "event_id"]).groupby("q_id").head(k)
        return out

    def pts_tagged(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "cell_id": batch["cell_id"],
                "q_id": pa.array(np.full(batch.num_rows, -1, np.int64), pa.int64()),
                "event_id": batch["event_id"],
                "x": batch["px"],
                "y": batch["py"],
                "kind": pa.array(np.zeros(batch.num_rows, np.int8), pa.int8()),
            }
        )

    def topk_reduce(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["q_id", "dist2", "event_id"])
            .groupby("q_id")
            .head(k)
            .reset_index(drop=True)
        )

    acc_ds = None  # running top-k accumulator, ≤ k rows per query, STAYS a Dataset
    acc_df = None  # driver-side view of the SAME bounded accumulator (certs)
    unresolved = q
    # ring schedule: rings 0+1 together (ring 0 alone certifies nothing —
    # bound 0), singles through 3, then geometric batches; fewer rounds =
    # fewer fixed-cost exchanges, same exactness (bound = round's max ring)
    schedule: list[list[int]] = [[0, 1], [2], [3]]
    nxt = 4
    while nxt < max_rings:
        width = max(1, nxt // 4)
        schedule.append(list(range(nxt, min(nxt + width, max_rings))))
        nxt += width
    import time as _time

    _dbg = bool(os.environ.get("GRAFT_KNN_DEBUG"))
    for rings in schedule:
        if not len(unresolved):
            break
        _t0 = _time.time()
        r = rings[-1]  # certificate ring: everything ≤ r is searched
        rr = ring_rows(unresolved, rings)
        if len(rr):
            touched_cells = np.unique(rr["cell_id"].to_numpy())
            touched_parts = np.unique(rr["part_id"].to_numpy())
            # point side for this ring: in-stream cell filter or pruned
            # partition-file read, per the sink strategy
            pts_r = pts_for_ring(touched_cells, touched_parts, r)
            if _dbg:
                print(f"[knn ring {r}] prep {_time.time() - _t0:.2f}s "
                      f"rr={len(rr)} cells={len(touched_cells)}")
                _t0 = _time.time()
            if pts_r is not None:
                qt = pa.Table.from_pydict(
                    {
                        "cell_id": pa.array(rr["cell_id"].to_numpy(), pa.int64()),
                        "q_id": pa.array(rr["q_id"].to_numpy(), pa.int64()),
                        "event_id": pa.array(np.full(len(rr), -1, np.int64), pa.int64()),
                        "x": pa.array(rr["qx"].to_numpy()),
                        "y": pa.array(rr["qy"].to_numpy()),
                        "kind": pa.array(np.ones(len(rr), np.int8), pa.int8()),
                    }
                )
                part = _bucketed(
                    pts_r.map_batches(
                        pts_tagged, batch_format="pyarrow", batch_size=None
                    ).union(rd.from_arrow(qt)),
                    ["cell_id"],
                    pair_partial,
                    16,
                )
                # fold the round's partials into the running top-k IN the
                # shuffle (grouped by q_id) — one chained execution per
                # round (cell cogroup → q_id top-k reduce), never a driver
                # concat of raw partials; materialize keeps lineage flat
                merged = part if acc_ds is None else part.union(acc_ds)
                acc_ds = _bucketed(merged, ["q_id"], topk_reduce, 8).materialize()
                # the certificate view IS the accumulator — already reduced
                # to ≤ k rows per query (control-plane sized) in the shuffle
                acc_df = acc_ds.to_pandas()
                if _dbg:
                    print(f"[knn ring {r}] exec {_time.time() - _t0:.2f}s "
                          f"acc={len(acc_df)}")
        # resolution: k-th best within the certified radius (r*cell)
        bound = float(r * cell) ** 2
        if acc_df is not None and len(acc_df):
            nth = acc_df.groupby("q_id")["dist2"].agg(["count", "max"])
            done_ids = nth[(nth["count"] >= k) & (nth["max"] <= bound)].index
            unresolved = unresolved[~unresolved["q_id"].isin(done_ids)]
        # else: nothing found yet, every query continues
    if len(unresolved):
        raise RuntimeError(f"knn_join_ring: {len(unresolved)} queries unresolved after {max_rings} rings")

    acc = acc_df  # ≤ k rows per query by construction
    acc = acc.sort_values(["q_id", "dist2", "event_id"]).reset_index(drop=True)
    acc["rnk"] = acc.groupby("q_id").cumcount() + 1
    out = acc[acc["rnk"] <= k][["q_id", "event_id", "rnk", "dist2"]]
    return out.reset_index(drop=True)


def pip_polygon_join(
    polys_ds,
    points_ds,
    n_rows_hint: int | None = None,
    out_poly: str = "poly_id",
    out_point: str = "event_id",
):
    """True point-in-POLYGON join with a PER-PARTITION STRtree — the north
    rule's stated shape for arbitrary (non-rectangular) vector geometry.

    ``polys_ds``: (poly_id, geom_wkb, minx, miny, maxx, maxy); ``points_ds``:
    (event_id, px, py). Polygons replicate to their covering cells
    (bounded fan-out), points key to their single cell, both sides cogroup
    on the coarse cell bucket. Each reduce partition then:

      1. dedupes polygon replicas (a poly may cover several cells of the
         same bucket),
      2. builds ONE STRtree over the partition's polygon bboxes
         (geo/strtree.py — per-partition state, built where the data is),
      3. bulk-queries its points for bbox candidates,
      4. verifies candidates with the exact vectorized polygon predicate
         (geo/predicates.points_in_polygon) — candidates from the tree,
         exactness from geometry.

    Exactly-once: a point lives in one bucket; point ∈ poly ⊆ bbox means the
    point's cell is a covering cell, so the poly is present in that bucket;
    replicas are deduped before the tree is built. World coordinates must be
    non-negative (the CellGrid contract shared by every spatial stage).
    """
    import pandas as pd

    from pygeoops_ray.geo import wkb as geo_wkb
    from pygeoops_ray.geo.predicates import points_in_polygon
    from pygeoops_ray.geo.strtree import STRtree
    from pygeoops_ray.stages.groupagg import _bucket_count, _bucketed

    def poly_rows(batch: pa.Table) -> pa.Table:
        b = expand_covering_tiles(batch)
        b = add_tile_cell_id(b)
        n = b.num_rows
        return pa.Table.from_pydict(
            {
                "cell_id": b["cell_id"],
                "id": b["poly_id"],
                "x": pa.array(np.zeros(n), pa.float64()),
                "y": pa.array(np.zeros(n), pa.float64()),
                "minx": b["minx"],
                "miny": b["miny"],
                "maxx": b["maxx"],
                "maxy": b["maxy"],
                "wkb": b["geom_wkb"],
                "kind": pa.array(np.ones(n, np.int8), pa.int8()),
            }
        )

    def point_rows(batch: pa.Table) -> pa.Table:
        b = add_cell_id(batch)
        n = b.num_rows
        z = pa.array(np.zeros(n), pa.float64())
        return pa.Table.from_pydict(
            {
                "cell_id": b["cell_id"],
                "id": b["event_id"],
                "x": b["px"],
                "y": b["py"],
                "minx": z,
                "miny": z,
                "maxx": z,
                "maxy": z,
                "wkb": pa.array([None] * n, pa.binary()),
                "kind": pa.array(np.zeros(n, np.int8), pa.int8()),
            }
        )

    tagged = polys_ds.map_batches(poly_rows, batch_format="pyarrow").union(
        points_ds.map_batches(point_rows, batch_format="pyarrow")
    )

    empty = pd.DataFrame(
        {
            out_point: pd.Series([], dtype=np.int64),
            out_poly: pd.Series([], dtype=np.int64),
        }
    )

    def reducer(df: pd.DataFrame) -> pd.DataFrame:
        kind = df["kind"].to_numpy()
        pol = df[kind == 1].drop_duplicates(subset=["id"])
        pts = df[kind == 0]
        if not len(pol) or not len(pts):
            return empty
        tree = STRtree(pol[["minx", "miny", "maxx", "maxy"]].to_numpy())
        px = pts["x"].to_numpy()
        py = pts["y"].to_numpy()
        cands = tree.query_bulk(np.column_stack([px, py, px, py]))
        n_per = np.fromiter((len(c) for c in cands), np.int64, len(cands))
        if n_per.sum() == 0:
            return empty
        pt_idx = np.repeat(np.arange(len(pts)), n_per)
        pol_idx = np.concatenate([c for c in cands if len(c)])
        order = np.argsort(pol_idx, kind="stable")
        pt_idx, pol_idx = pt_idx[order], pol_idx[order]
        starts = np.concatenate(
            ([0], np.nonzero(np.diff(pol_idx))[0] + 1, [len(pol_idx)])
        )
        out_pt, out_pl = [], []
        wkbs = pol["wkb"].to_numpy()
        ids_pol = pol["id"].to_numpy()
        ids_pt = pts["id"].to_numpy()
        for s, e in zip(starts[:-1], starts[1:]):
            pid = pol_idx[s]
            poly = geo_wkb.loads(wkbs[pid])
            sel = pt_idx[s:e]
            inside = points_in_polygon(poly, np.column_stack([px[sel], py[sel]])) == 1
            if inside.any():
                out_pt.append(ids_pt[sel[inside]])
                out_pl.append(np.full(int(inside.sum()), ids_pol[pid], np.int64))
        if not out_pt:
            return empty
        return pd.DataFrame(
            {
                out_point: np.concatenate(out_pt),
                out_poly: np.concatenate(out_pl),
            }
        )

    nb = _bucket_count(32, n_rows_hint)
    return _bucketed(tagged, ["cell_id"], reducer, nb)
