"""GLOBAL distributed topology-preserving simplify.

`geo/simplify_topo.py` re-expresses the reference's shared-arc semantics
(/root/reference/pygeoops/_simplify_topo.py:21-162) for ONE in-memory
collection; `geo_batch.topo_simplify_grouped` distributes it per spatial
cell, which approximates shared boundaries that CROSS cells (SURVEY §8.3.4).
This module removes that approximation: the topology is built over the WHOLE
dataset as a sequence of bounded exchanges, so a border shared by two
geometries is ONE arc simplified ONCE no matter where its owners live.

Pipeline (every exchange is O(total coordinates) rows or less):

1. decompose      geometry rows → ring rows (gid, part, ring, kind, coords)
2. extent pass    tiny aggregate → global eps + cell size
3. collinear      vertices × eps-dilated segment bboxes co-grouped by world
   insertion      cell (the topojson shared-path reduction: an on-edge vertex
                  of another ring splits the edge) → per-ring insert rows →
                  ring-keyed cogroup applies them
4. junctions      every vertex occurrence ships (vkey, neighborhood-hash,
                  ring_uid, pos); a vkey-keyed cogroup applies the topojson
                  join rule (two distinct neighborhoods ⇒ junction; open-line
                  endpoints forced) and returns junction POSITIONS per ring
5. arcs           ring-keyed cogroup cuts rings at junction positions
                  (rotation-to-first-junction, exactly the local kernel's
                  rule); arcs keyed by md5 of the canonical (min(fwd, rev))
                  coordinate bytes — a shared border hashes identically from
                  both owners — and a groupby(arc_key) simplifies each
                  distinct arc ONCE
6. stitch         arc-keyed cogroup attaches simplified coords to the
                  per-geometry arc references; groupby(gid) rebuilds rings in
                  traversal order/orientation, make_valid, and the global
                  uniform-primitive-type filter (type set from a tiny
                  aggregate) — the local kernel's decode, distributed.

Arc orientation: the local kernel stores arcs in FIRST-SEEN orientation
(input-order dependent); here storage is canonical (lexicographically
smaller of forward/reverse byte strings) so the result is independent of
partitioning and input order. Stitching re-orients each arc to its
traversal direction, so ring vertex ORDER is preserved either way; for
direction-sensitive simplifiers (lang) an arc's kept-vertex set is computed
on the canonical orientation.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from pygeoops_ray.geo import geom as g
from pygeoops_ray.geo import validity
from pygeoops_ray.geo import wkb as wkb_codec
from pygeoops_ray.geo.general import _collection_extract_one, collect
from pygeoops_ray.geo.simplify import simplify_coords
from pygeoops_ray.geo.types import GeometryType

__all__ = ["topo_simplify_distributed"]

_UID_PART = 1_000
_UID_RING = 1_000


def _ring_uid(gid: int, part: int, ring: int) -> int:
    return (gid * _UID_PART + part) * _UID_RING + ring


def _blob(pts: np.ndarray) -> bytes:
    return np.ascontiguousarray(pts[:, :2], dtype=np.float64).tobytes()


def _unblob(b: bytes) -> np.ndarray:
    return np.frombuffer(b, dtype=np.float64).reshape(-1, 2)


def _canon(pts: np.ndarray) -> tuple[bytes, bool]:
    """(md5 of canonical bytes, traversal==canonical) for an arc."""
    fwd = _blob(pts)
    rev = _blob(pts[::-1])
    if fwd <= rev:
        return hashlib.md5(fwd).digest(), True
    return hashlib.md5(rev).digest(), False


def topo_simplify_distributed(
    ds,
    tolerance: float,
    algorithm: str = "rdp",
    lookahead: int = 8,
    id_col: str = "s_suppkey",
    wkb_col: str = "geom_wkb",
    n_cells: int = 64,
    local_threshold: int = 10_000,
):
    """Distributed shared-arc simplify of a (id, wkb) dataset.

    Returns a Dataset with the same two columns. Geometry ids must be
    distinct; parts/rings per geometry must stay under 1000 each (uid
    packing — asserted).

    ``local_threshold``: below this many TOTAL 2D points the whole topology
    fits one task, where the six bounded exchanges are pure fixed cost —
    the single-task path runs the LOCAL shared-arc kernel, which the
    partition-invariance pytests prove exact-WKT identical to the
    distributed path (the pagerank/kcore local-fast-path design). The
    default is conservative: the local kernel's collinear-insert pass is
    a per-segment tree query whose candidate sets blow up on long shared
    straight borders (measured 4.4 s at 48k points on the strip corpus vs
    3.0 s distributed; 0.3 s at ~5k points vs 2.5+ s distributed). Pass 0
    to force the distributed path (the parity tests do).
    """
    algorithm = algorithm.lower()

    # ---- pass 0: decompose into ring rows + passthrough rows ---------------
    def decompose(b: pa.Table) -> pa.Table:
        gids, parts, rings, kinds, blobs = [], [], [], [], []
        for gid, wk in zip(b[id_col].to_pylist(), b[wkb_col].to_pylist()):
            geom = wkb_codec.loads(wk) if wk is not None else None

            def emit(part_idx, ring_idx, kind, pts_or_wkb):
                gids.append(int(gid))
                parts.append(part_idx)
                rings.append(ring_idx)
                kinds.append(kind)
                blobs.append(pts_or_wkb)

            def rings_of(geom_, part_base):
                # kind: 0 = polygon ring, 1 = line, 2 = passthrough wkb
                if geom_ is None or geom_.is_empty:
                    emit(part_base, 0, 2, wk if wk is not None else b"")
                    return part_base + 1
                if isinstance(geom_, g.Polygon):
                    for ri, r in enumerate(geom_.rings):
                        if ri >= _UID_RING:
                            raise ValueError(
                                f"topo_global: geometry gid={gid} has >= "
                                f"{_UID_RING} rings in one part; ring-uid "
                                "packing would alias distinct rings"
                            )
                        emit(part_base, ri, 0, _blob(np.asarray(r)))
                    return part_base + 1
                if isinstance(geom_, g.LineString):
                    emit(part_base, 0, 1, _blob(np.asarray(geom_.coords)))
                    return part_base + 1
                if isinstance(geom_, g._Multi):
                    pb = part_base
                    for p in geom_.geoms:
                        pb = rings_of(p, pb)
                    return pb
                emit(part_base, 0, 2, wkb_codec.dumps(geom_))
                return part_base + 1

            nparts = rings_of(geom, 0)
            if nparts >= _UID_PART:
                raise ValueError(
                    f"topo_global: geometry gid={gid} has {nparts} parts; "
                    f"ring-uid packing supports < {_UID_PART} parts per "
                    "geometry"
                )

        return pa.Table.from_pydict(
            {
                "gid": pa.array(gids, pa.int64()),
                "part": pa.array(parts, pa.int64()),
                "ring": pa.array(rings, pa.int64()),
                "kind": pa.array(kinds, pa.int64()),
                "coords": pa.array(blobs, pa.binary()),
            }
        )

    rows = ds.map_batches(decompose, batch_format="pyarrow").materialize()

    def _npts(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lens = pc.binary_length(b["coords"])
        return pa.Table.from_pydict(
            {"npts": pa.array([int(pc.sum(lens).as_py() or 0) // 16], pa.int64())}
        )

    total_pts = (
        rows.map_batches(_npts, batch_format="pyarrow", batch_size=None).sum("npts")
        if local_threshold
        else None
    )
    if local_threshold and total_pts is not None and total_pts <= local_threshold:

        def all_local(b: pa.Table) -> pa.Table:
            from pygeoops_ray.geo.simplify_topo import simplify_topo

            gids = b[id_col].to_pylist()
            geoms = [
                wkb_codec.loads(w) if w is not None else None
                for w in b[wkb_col].to_pylist()
            ]
            out = simplify_topo(
                geoms, tolerance=tolerance, algorithm=algorithm,
                lookahead=lookahead,
            )
            return pa.Table.from_pydict(
                {
                    id_col: pa.array(gids, pa.int64()),
                    wkb_col: pa.array(
                        [
                            wkb_codec.dumps(g_) if g_ is not None else None
                            for g_ in out
                        ],
                        pa.binary(),
                    ),
                }
            )

        return ds.repartition(1).map_batches(
            all_local, batch_format="pyarrow", batch_size=None
        )

    # global type set (uniform-primitive filter) + extent/eps, tiny aggregates
    def type_partial(b: pa.Table) -> pa.Table:
        tids = set()
        for wk in b[wkb_col].to_pylist():
            geom = wkb_codec.loads(wk) if wk is not None else None
            if geom is not None:
                tids.add(int(geom.type_id))
        return pa.Table.from_pydict({"tid": pa.array(sorted(tids), pa.int64())})

    tids = set(
        ds.map_batches(type_partial, batch_format="pyarrow").to_pandas()["tid"]
    )
    primitive_ids = {
        GeometryType(t).to_primitivetype.value for t in tids if t not in (0, 7)
    }
    uniform = len(primitive_ids) == 1 and not any(t in (0, 7) for t in tids)
    pid = primitive_ids.pop() if uniform else 0

    def extent_partial(b: pa.Table) -> pa.Table:
        m = 0.0
        lo = np.array([np.inf, np.inf])
        hi = np.array([-np.inf, -np.inf])
        for kind, blob in zip(b["kind"].to_pylist(), b["coords"].to_pylist()):
            if kind == 2 or len(blob) == 0:
                continue
            pts = _unblob(blob)
            m = max(m, float(np.abs(pts).max()))
            lo = np.minimum(lo, pts.min(axis=0))
            hi = np.maximum(hi, pts.max(axis=0))
        return pa.Table.from_pydict(
            {
                "m": pa.array([m]),
                "minx": pa.array([lo[0]]),
                "miny": pa.array([lo[1]]),
                "maxx": pa.array([hi[0]]),
                "maxy": pa.array([hi[1]]),
            }
        )

    ext = rows.map_batches(extent_partial, batch_format="pyarrow").to_pandas()
    if not len(ext) or not np.isfinite(ext["minx"].min()):
        return ds  # nothing decomposable
    eps = 1e-9 * (1.0 + float(ext["m"].max()))
    span = max(
        float(ext["maxx"].max() - ext["minx"].min()),
        float(ext["maxy"].max() - ext["miny"].min()),
        1e-9,
    )
    ox, oy = float(ext["minx"].min()), float(ext["miny"].min())
    tile = span / n_cells

    def cell_of(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        cx = np.clip((x - ox) // tile, 0, n_cells - 1).astype(np.int64)
        cy = np.clip((y - oy) // tile, 0, n_cells - 1).astype(np.int64)
        return cx * n_cells + cy

    # ---- pass 1: collinear-vertex insertion (topojson shared-path) ---------
    def vert_rows(b: pa.Table) -> pa.Table:
        xs, ys = [], []
        for kind, blob in zip(b["kind"].to_pylist(), b["coords"].to_pylist()):
            if kind == 2 or len(blob) == 0:
                continue
            pts = _unblob(blob)
            xs.append(pts[:, 0])
            ys.append(pts[:, 1])
        if not xs:
            return pa.Table.from_pydict(
                {
                    "cell": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                    "ruid": pa.array([], pa.int64()),
                    "seg": pa.array([], pa.int64()),
                    "ax": pa.array([], pa.float64()),
                    "ay": pa.array([], pa.float64()),
                    "bx": pa.array([], pa.float64()),
                    "by": pa.array([], pa.float64()),
                }
            )
        x = np.concatenate(xs)
        y = np.concatenate(ys)
        uv = np.unique(np.column_stack([x, y]), axis=0)
        n = len(uv)
        return pa.Table.from_pydict(
            {
                "cell": pa.array(cell_of(uv[:, 0], uv[:, 1]), pa.int64()),
                "side": pa.array(np.ones(n, np.int8)),
                "ruid": pa.array(np.zeros(n, np.int64)),
                "seg": pa.array(np.zeros(n, np.int64)),
                "ax": pa.array(uv[:, 0]),
                "ay": pa.array(uv[:, 1]),
                "bx": pa.array(np.zeros(n)),
                "by": pa.array(np.zeros(n)),
            }
        )

    def seg_rows(b: pa.Table) -> pa.Table:
        # vectorized: concatenate all segments, then one covering-cell
        # expansion over the eps-dilated bboxes (no Python loop per segment)
        ax_, ay_, bx_, by_, ruids, segs = [], [], [], [], [], []
        for gid, part, ring, kind, blob in zip(
            b["gid"].to_pylist(), b["part"].to_pylist(), b["ring"].to_pylist(),
            b["kind"].to_pylist(), b["coords"].to_pylist(),
        ):
            if kind == 2 or len(blob) == 0:
                continue
            pts = _unblob(blob)
            if len(pts) < 2:
                continue
            ruid = _ring_uid(gid, part, ring)
            ax_.append(pts[:-1, 0])
            ay_.append(pts[:-1, 1])
            bx_.append(pts[1:, 0])
            by_.append(pts[1:, 1])
            ruids.append(np.full(len(pts) - 1, ruid, np.int64))
            segs.append(np.arange(len(pts) - 1, dtype=np.int64))
        if not ax_:
            return pa.Table.from_pydict(
                {
                    "cell": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                    "ruid": pa.array([], pa.int64()),
                    "seg": pa.array([], pa.int64()),
                    "ax": pa.array([], pa.float64()),
                    "ay": pa.array([], pa.float64()),
                    "bx": pa.array([], pa.float64()),
                    "by": pa.array([], pa.float64()),
                }
            )
        ax = np.concatenate(ax_)
        ay = np.concatenate(ay_)
        bx = np.concatenate(bx_)
        by = np.concatenate(by_)
        ruid_a = np.concatenate(ruids)
        seg_a = np.concatenate(segs)
        c0 = np.clip((np.minimum(ax, bx) - eps - ox) // tile, 0, n_cells - 1).astype(np.int64)
        c1 = np.clip((np.maximum(ax, bx) + eps - ox) // tile, 0, n_cells - 1).astype(np.int64)
        r0 = np.clip((np.minimum(ay, by) - eps - oy) // tile, 0, n_cells - 1).astype(np.int64)
        r1 = np.clip((np.maximum(ay, by) + eps - oy) // tile, 0, n_cells - 1).astype(np.int64)
        ncol = c1 - c0 + 1
        nrow = r1 - r0 + 1
        counts = ncol * nrow
        idx = np.repeat(np.arange(len(ax)), counts)
        offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
        local = np.arange(int(counts.sum())) - np.repeat(offs, counts)
        nrow_rep = np.repeat(nrow, counts)
        cx = np.repeat(c0, counts) + local // nrow_rep
        cy = np.repeat(r0, counts) + local % nrow_rep
        n = len(idx)
        return pa.Table.from_pydict(
            {
                "cell": pa.array(cx * n_cells + cy, pa.int64()),
                "side": pa.array(np.zeros(n, np.int8)),
                "ruid": pa.array(ruid_a[idx], pa.int64()),
                "seg": pa.array(seg_a[idx], pa.int64()),
                "ax": pa.array(ax[idx], pa.float64()),
                "ay": pa.array(ay[idx], pa.float64()),
                "bx": pa.array(bx[idx], pa.float64()),
                "by": pa.array(by[idx], pa.float64()),
            }
        )

    tagged = rows.map_batches(seg_rows, batch_format="pyarrow").union(
        rows.map_batches(vert_rows, batch_format="pyarrow")
    )

    def find_inserts(grp: pd.DataFrame) -> pd.DataFrame:
        segs = grp[grp["side"] == 0]
        verts = grp[grp["side"] == 1]
        out = {k: [] for k in ("ruid", "seg", "t", "vx", "vy")}
        if len(segs) and len(verts):
            # x-sorted vertices + searchsorted window per segment: the naive
            # all-vertices scan per segment is quadratic when a cell holds
            # the whole corpus (degenerate concentration)
            vx_all = verts["ax"].to_numpy()
            vy_all = verts["ay"].to_numpy()
            xorder = np.argsort(vx_all, kind="stable")
            vx_sorted = vx_all[xorder]
            vy_sorted = vy_all[xorder]
            for ruid, si, ax_, ay_, bx_, by_ in zip(
                segs["ruid"].to_numpy(), segs["seg"].to_numpy(),
                segs["ax"].to_numpy(), segs["ay"].to_numpy(),
                segs["bx"].to_numpy(), segs["by"].to_numpy(),
            ):
                dx, dy = bx_ - ax_, by_ - ay_
                seg_len2 = dx * dx + dy * dy
                if seg_len2 == 0:
                    continue
                # endpoint exclusion + bbox + collinearity + interior t,
                # exactly the local kernel's tests
                lo = np.searchsorted(vx_sorted, min(ax_, bx_) - eps, side="left")
                hi = np.searchsorted(vx_sorted, max(ax_, bx_) + eps, side="right")
                if lo >= hi:
                    continue
                wvx = vx_sorted[lo:hi]
                wvy = vy_sorted[lo:hi]
                near = (wvy >= min(ay_, by_) - eps) & (wvy <= max(ay_, by_) + eps)
                if not near.any():
                    continue
                cvx, cvy = wvx[near], wvy[near]
                is_end = (
                    ((np.abs(cvx - ax_) <= eps) & (np.abs(cvy - ay_) <= eps))
                    | ((np.abs(cvx - bx_) <= eps) & (np.abs(cvy - by_) <= eps))
                )
                cross = dx * (cvy - ay_) - dy * (cvx - ax_)
                on_line = np.abs(cross) <= eps * (1.0 + seg_len2 ** 0.5)
                t = ((cvx - ax_) * dx + (cvy - ay_) * dy) / seg_len2
                interior = (t > eps) & (t < 1 - eps)
                keep = ~is_end & on_line & interior
                for tt, xx, yy in zip(t[keep], cvx[keep], cvy[keep]):
                    out["ruid"].append(int(ruid))
                    out["seg"].append(int(si))
                    out["t"].append(float(tt))
                    out["vx"].append(float(xx))
                    out["vy"].append(float(yy))
        return pd.DataFrame(
            {
                "ruid": pd.Series(out["ruid"], dtype="int64"),
                "seg": pd.Series(out["seg"], dtype="int64"),
                "t": pd.Series(out["t"], dtype="float64"),
                "vx": pd.Series(out["vx"], dtype="float64"),
                "vy": pd.Series(out["vy"], dtype="float64"),
            }
        )

    inserts = tagged.groupby("cell").map_groups(find_inserts, batch_format="pandas")

    # cogroup rings + inserts on ruid → augmented rings
    def ring_tag(b: pa.Table) -> pa.Table:
        ruids = [
            _ring_uid(gid, part, ring)
            for gid, part, ring in zip(
                b["gid"].to_pylist(), b["part"].to_pylist(), b["ring"].to_pylist()
            )
        ]
        n = b.num_rows
        return pa.Table.from_pydict(
            {
                "ruid": pa.array(ruids, pa.int64()),
                "rside": pa.array(np.zeros(n, np.int8)),
                "gid": b["gid"],
                "part": b["part"],
                "ring": b["ring"],
                "kind": b["kind"],
                "coords": b["coords"],
                "seg": pa.array(np.zeros(n, np.int64)),
                "t": pa.array(np.zeros(n)),
                "vx": pa.array(np.zeros(n)),
                "vy": pa.array(np.zeros(n)),
            }
        )

    def ins_tag(df: pd.DataFrame) -> pa.Table:
        n = len(df)
        return pa.Table.from_pydict(
            {
                "ruid": pa.array(df["ruid"].to_numpy(np.int64), pa.int64()),
                "rside": pa.array(np.ones(n, np.int8)),
                "gid": pa.array(np.zeros(n, np.int64)),
                "part": pa.array(np.zeros(n, np.int64)),
                "ring": pa.array(np.zeros(n, np.int64)),
                "kind": pa.array(np.zeros(n, np.int64)),
                "coords": pa.array([b""] * n, pa.binary()),
                "seg": pa.array(df["seg"].to_numpy(np.int64), pa.int64()),
                "t": pa.array(df["t"].to_numpy(np.float64), pa.float64()),
                "vx": pa.array(df["vx"].to_numpy(np.float64), pa.float64()),
                "vy": pa.array(df["vy"].to_numpy(np.float64), pa.float64()),
            }
        )

    aug_in = rows.map_batches(ring_tag, batch_format="pyarrow").union(
        inserts.map_batches(ins_tag, batch_format="pandas")
    )

    def apply_inserts(grp: pd.DataFrame) -> pd.DataFrame:
        ring_rows = grp[grp["rside"] == 0]
        ins = grp[grp["rside"] == 1]
        out = {k: [] for k in ("gid", "part", "ring", "kind", "coords")}
        for _, rr in ring_rows.iterrows():
            blob = rr["coords"]
            if rr["kind"] == 2 or len(ins) == 0:
                new_blob = blob
            else:
                pts = _unblob(blob)
                by_seg: dict[int, set] = {}
                for _, ir in ins.iterrows():
                    by_seg.setdefault(int(ir["seg"]), set()).add(
                        (float(ir["t"]), float(ir["vx"]), float(ir["vy"]))
                    )
                new_pts = []
                for i in range(len(pts) - 1):
                    new_pts.append(pts[i])
                    for _, vx_, vy_ in sorted(by_seg.get(i, ())):
                        new_pts.append(np.array([vx_, vy_]))
                new_pts.append(pts[-1])
                new_blob = _blob(np.array(new_pts))
            out["gid"].append(int(rr["gid"]))
            out["part"].append(int(rr["part"]))
            out["ring"].append(int(rr["ring"]))
            out["kind"].append(int(rr["kind"]))
            out["coords"].append(new_blob)
        return pd.DataFrame(
            {
                "gid": pd.Series(out["gid"], dtype="int64"),
                "part": pd.Series(out["part"], dtype="int64"),
                "ring": pd.Series(out["ring"], dtype="int64"),
                "kind": pd.Series(out["kind"], dtype="int64"),
                "coords": pd.Series(out["coords"], dtype=object),
            }
        )

    from pygeoops_ray.stages.groupagg import _bucketed

    def apply_inserts_bucket(df: pd.DataFrame) -> pd.DataFrame:
        outs = [
            apply_inserts(grp) for _, grp in df.groupby("ruid", sort=False)
        ]
        return (
            pd.concat(outs, ignore_index=True)
            if outs
            else apply_inserts(df)
        )

    # cap block growth between exchanges: every bucketed cogroup emits one
    # block per (bucket x upstream block) and sort cost follows block count
    aug = (
        _bucketed(aug_in, ["ruid"], apply_inserts_bucket, 16)
        .repartition(16)
        .materialize()
    )

    # ---- pass 2: junction detection ----------------------------------------
    def _mix64(x: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            z = x + np.uint64(0x9E3779B97F4A7C15)
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            return z ^ (z >> np.uint64(31))

    def _pt_hash(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        # x + 0.0 normalizes -0.0 to +0.0 so bit-views match the local
        # kernel's float-equality dict keys
        with np.errstate(over="ignore"):
            return _mix64((x + 0.0).view(np.uint64)) * np.uint64(3) + _mix64(
                ~(y + 0.0).view(np.uint64)
            )

    def _nbhood(prev: np.ndarray, nxt: np.ndarray) -> np.ndarray:
        # order-insensitive neighborhood id mirroring the local kernel's
        # frozenset: mix(min)*P ^ mix(max).  Unlike plain XOR this keeps
        # (a,a) vs (b,b) distinct (XOR collapses both to 0).
        lo = np.minimum(prev, nxt)
        hi = np.maximum(prev, nxt)
        with np.errstate(over="ignore"):
            return _mix64(lo) * np.uint64(0x100000001B3) ^ _mix64(~hi)

    def vertex_occ(b: pa.Table) -> pa.Table:
        # neighborhood identity = order-insensitive combine of the two
        # neighbor-point hashes (see _nbhood; collision ~2^-64 per vertex)
        vxs, vys, nbs, fos, rus, poss = [], [], [], [], [], []
        for gid, part, ring, kind, blob in zip(
            b["gid"].to_pylist(), b["part"].to_pylist(), b["ring"].to_pylist(),
            b["kind"].to_pylist(), b["coords"].to_pylist(),
        ):
            if kind == 2 or len(blob) == 0:
                continue
            pts = _unblob(blob)
            ruid = _ring_uid(gid, part, ring)
            closed = len(pts) > 2 and np.array_equal(pts[0], pts[-1])
            n = len(pts) - 1 if closed else len(pts)
            if n == 0:
                continue
            core = np.ascontiguousarray(pts[:n])
            h = _pt_hash(core[:, 0].copy(), core[:, 1].copy())
            if closed:
                nb = _nbhood(np.roll(h, 1), np.roll(h, -1))
                forced = np.zeros(n, np.int64)
            else:
                prev = np.concatenate([[np.uint64(0)], h[:-1]])
                nxt = np.concatenate([h[1:], [np.uint64(0)]])
                nb = _nbhood(prev, nxt)
                forced = np.zeros(n, np.int64)
                forced[0] = 1
                forced[-1] = 1
            vxs.append(core[:, 0])
            vys.append(core[:, 1])
            nbs.append(nb.astype(np.int64))
            fos.append(forced)
            rus.append(np.full(n, ruid, np.int64))
            poss.append(np.arange(n, dtype=np.int64))
        if not vxs:
            return pa.Table.from_pydict(
                {
                    "vxb": pa.array([], pa.int64()),
                    "vyb": pa.array([], pa.int64()),
                    "nb": pa.array([], pa.int64()),
                    "forced": pa.array([], pa.int64()),
                    "ruid": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                }
            )
        vx = np.concatenate(vxs)
        vy = np.concatenate(vys)
        return pa.Table.from_pydict(
            {
                "vxb": pa.array((vx + 0.0).view(np.int64), pa.int64()),
                "vyb": pa.array((vy + 0.0).view(np.int64), pa.int64()),
                "nb": pa.array(np.concatenate(nbs), pa.int64()),
                "forced": pa.array(np.concatenate(fos), pa.int64()),
                "ruid": pa.array(np.concatenate(rus), pa.int64()),
                "pos": pa.array(np.concatenate(poss), pa.int64()),
            }
        )

    def junction_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized verdict per exact vertex key (the float64 bit views):
        # junction iff >1 distinct neighborhood or any forced endpoint
        stats = df.groupby(["vxb", "vyb"], sort=False).agg(
            nun=("nb", "nunique"), forc=("forced", "max")
        )
        jdf = stats[(stats["nun"] > 1) | (stats["forc"] > 0)].reset_index()[
            ["vxb", "vyb"]
        ]
        if not len(jdf):
            return pd.DataFrame(
                {"ruid": pd.Series([], dtype="int64"), "pos": pd.Series([], dtype="int64")}
            )
        sub = df.merge(jdf, on=["vxb", "vyb"], how="inner")
        return pd.DataFrame(
            {"ruid": sub["ruid"].astype("int64"), "pos": sub["pos"].astype("int64")}
        )

    junction_pos = _bucketed(
        aug.map_batches(vertex_occ, batch_format="pyarrow"),
        ["vxb", "vyb"],
        junction_bucket,
        16,
    ).repartition(8)

    # ---- pass 3: cut arcs ---------------------------------------------------
    def jp_tag(df: pd.DataFrame) -> pa.Table:
        n = len(df)
        return pa.Table.from_pydict(
            {
                "ruid": pa.array(df["ruid"].to_numpy(np.int64), pa.int64()),
                "rside": pa.array(np.ones(n, np.int8)),
                "gid": pa.array(np.zeros(n, np.int64)),
                "part": pa.array(np.zeros(n, np.int64)),
                "ring": pa.array(np.zeros(n, np.int64)),
                "kind": pa.array(np.zeros(n, np.int64)),
                "coords": pa.array([b""] * n, pa.binary()),
                "pos": pa.array(df["pos"].to_numpy(np.int64), pa.int64()),
            }
        )

    def ring_tag2(b: pa.Table) -> pa.Table:
        ruids = [
            _ring_uid(gid, part, ring)
            for gid, part, ring in zip(
                b["gid"].to_pylist(), b["part"].to_pylist(), b["ring"].to_pylist()
            )
        ]
        n = b.num_rows
        return pa.Table.from_pydict(
            {
                "ruid": pa.array(ruids, pa.int64()),
                "rside": pa.array(np.zeros(n, np.int8)),
                "gid": b["gid"],
                "part": b["part"],
                "ring": b["ring"],
                "kind": b["kind"],
                "coords": b["coords"],
                "pos": pa.array(np.zeros(n, np.int64)),
            }
        )

    cut_in = aug.map_batches(ring_tag2, batch_format="pyarrow").union(
        junction_pos.map_batches(jp_tag, batch_format="pandas")
    )

    def cut_arcs(grp: pd.DataFrame) -> pd.DataFrame:
        ring_rows = grp[grp["rside"] == 0]
        jpos = set(grp.loc[grp["rside"] == 1, "pos"].astype(int))
        out = {
            k: []
            for k in ("gid", "part", "ring", "kind", "arc_pos", "akey", "fwd", "coords")
        }

        def emit(gid, part, ring, kind, arc_pos, pts):
            akey, fwd = _canon(pts)
            canon_pts = pts if fwd else pts[::-1]
            out["gid"].append(gid)
            out["part"].append(part)
            out["ring"].append(ring)
            out["kind"].append(kind)
            out["arc_pos"].append(arc_pos)
            out["akey"].append(akey)
            out["fwd"].append(int(fwd))
            out["coords"].append(_blob(canon_pts))

        for _, rr in ring_rows.iterrows():
            gid, part, ring, kind = (
                int(rr["gid"]), int(rr["part"]), int(rr["ring"]), int(rr["kind"]),
            )
            if kind == 2:
                out["gid"].append(gid)
                out["part"].append(part)
                out["ring"].append(ring)
                out["kind"].append(kind)
                out["arc_pos"].append(0)
                out["akey"].append(b"")
                out["fwd"].append(1)
                out["coords"].append(rr["coords"])
                continue
            pts = _unblob(rr["coords"])
            closed = len(pts) > 2 and np.array_equal(pts[0], pts[-1])
            # rotation-to-first-junction applies to POLYGON rings only: the
            # local kernel routes closed LineStrings through add_line (cut
            # in place, no rotation), so kind==1 must take the line path
            # below even when geometrically closed
            if closed and kind == 0:
                n = len(pts) - 1
                cut_idx = [i for i in range(n) if i in jpos]
                if not cut_idx:
                    emit(gid, part, ring, kind, 0, pts[:, :2])
                    continue
                rot = np.concatenate(
                    [pts[cut_idx[0]: n], pts[: cut_idx[0] + 1]], axis=0
                )[:, :2]
                # junction KEYS of the rotated ring: positions shift by
                # cut_idx[0]; a position j in rot corresponds to original
                # (j + cut_idx[0]) % n
                jset = set(cut_idx)
                start = 0
                arc_pos = 0
                for i in range(1, len(rot)):
                    orig = (i + cut_idx[0]) % n
                    if orig in jset or i == len(rot) - 1:
                        emit(gid, part, ring, kind, arc_pos, rot[start: i + 1])
                        arc_pos += 1
                        start = i
            else:
                start = 0
                arc_pos = 0
                p2 = pts[:, :2]
                for i in range(1, len(p2)):
                    if (i == len(p2) - 1) or (i in jpos):
                        emit(gid, part, ring, kind, arc_pos, p2[start: i + 1])
                        arc_pos += 1
                        start = i
        return pd.DataFrame(
            {
                "gid": pd.Series(out["gid"], dtype="int64"),
                "part": pd.Series(out["part"], dtype="int64"),
                "ring": pd.Series(out["ring"], dtype="int64"),
                "kind": pd.Series(out["kind"], dtype="int64"),
                "arc_pos": pd.Series(out["arc_pos"], dtype="int64"),
                "akey": pd.Series(out["akey"], dtype=object),
                "fwd": pd.Series(out["fwd"], dtype="int64"),
                "coords": pd.Series(out["coords"], dtype=object),
            }
        )

    def cut_arcs_bucket(df: pd.DataFrame) -> pd.DataFrame:
        outs = [cut_arcs(grp) for _, grp in df.groupby("ruid", sort=False)]
        return pd.concat(outs, ignore_index=True) if outs else cut_arcs(df)

    refs = (
        _bucketed(cut_in, ["ruid"], cut_arcs_bucket, 16).repartition(16).materialize()
    )

    # ---- pass 4: simplify each distinct arc once ---------------------------
    def simp_group(grp: pd.DataFrame) -> pd.DataFrame:
        grp = grp[grp["kind"] != 2]
        if not len(grp):
            return pd.DataFrame(
                {
                    "akey": pd.Series([], dtype=object),
                    "scoords": pd.Series([], dtype=object),
                }
            )
        first = grp.iloc[0]
        pts = _unblob(first["coords"])
        simp = simplify_coords(
            pts,
            tolerance,
            algorithm=algorithm,
            lookahead=lookahead,
            simplify_lookahead_points=(algorithm == "lang+"),
            keep_points_on=None,
        )
        return pd.DataFrame(
            {"akey": [first["akey"]], "scoords": [_blob(np.asarray(simp))]}
        )

    def simp_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["kind"] != 2]
        if not len(df):
            return pd.DataFrame(
                {"akey": pd.Series([], dtype=object), "scoords": pd.Series([], dtype=object)}
            )
        firsts = df.drop_duplicates("akey")
        keys, blobs = [], []
        for _, row in firsts.iterrows():
            pts = _unblob(row["coords"])
            simp = simplify_coords(
                pts,
                tolerance,
                algorithm=algorithm,
                lookahead=lookahead,
                simplify_lookahead_points=(algorithm == "lang+"),
                keep_points_on=None,
            )
            keys.append(row["akey"])
            blobs.append(_blob(np.asarray(simp)))
        return pd.DataFrame(
            {
                "akey": pd.Series(keys, dtype=object),
                "scoords": pd.Series(blobs, dtype=object),
            }
        )

    simped = _bucketed(refs, ["akey"], simp_bucket, 16).repartition(8)

    # ---- pass 5: attach + stitch -------------------------------------------
    def refs_tag(df: pd.DataFrame) -> pa.Table:
        n = len(df)
        return pa.Table.from_pydict(
            {
                "akey": pa.array(list(df["akey"]), pa.binary()),
                "aside": pa.array(np.zeros(n, np.int8)),
                "gid": pa.array(df["gid"].to_numpy(np.int64), pa.int64()),
                "part": pa.array(df["part"].to_numpy(np.int64), pa.int64()),
                "ring": pa.array(df["ring"].to_numpy(np.int64), pa.int64()),
                "kind": pa.array(df["kind"].to_numpy(np.int64), pa.int64()),
                "arc_pos": pa.array(df["arc_pos"].to_numpy(np.int64), pa.int64()),
                "fwd": pa.array(df["fwd"].to_numpy(np.int64), pa.int64()),
                "coords": pa.array(list(df["coords"]), pa.binary()),
                "scoords": pa.array([b""] * n, pa.binary()),
            }
        )

    def simp_tag(df: pd.DataFrame) -> pa.Table:
        n = len(df)
        return pa.Table.from_pydict(
            {
                "akey": pa.array(list(df["akey"]), pa.binary()),
                "aside": pa.array(np.ones(n, np.int8)),
                "gid": pa.array(np.zeros(n, np.int64)),
                "part": pa.array(np.zeros(n, np.int64)),
                "ring": pa.array(np.zeros(n, np.int64)),
                "kind": pa.array(np.zeros(n, np.int64)),
                "arc_pos": pa.array(np.zeros(n, np.int64)),
                "fwd": pa.array(np.ones(n, np.int64)),
                "coords": pa.array([b""] * n, pa.binary()),
                "scoords": pa.array(list(df["scoords"]), pa.binary()),
            }
        )

    attach_in = refs.map_batches(refs_tag, batch_format="pandas").union(
        simped.map_batches(simp_tag, batch_format="pandas")
    )

    def attach(grp: pd.DataFrame) -> pd.DataFrame:
        srows = grp[grp["aside"] == 1]
        sblob = srows.iloc[0]["scoords"] if len(srows) else b""
        rr = grp[grp["aside"] == 0].copy()
        if not len(rr):
            return pd.DataFrame(
                {
                    c: pd.Series([], dtype="int64")
                    for c in ("gid", "part", "ring", "kind", "arc_pos", "fwd")
                }
                | {
                    "coords": pd.Series([], dtype=object),
                    "scoords": pd.Series([], dtype=object),
                }
            )
        rr["scoords"] = [
            sblob if k != 2 else c for k, c in zip(rr["kind"], rr["coords"])
        ]
        return rr[
            ["gid", "part", "ring", "kind", "arc_pos", "fwd", "coords", "scoords"]
        ]

    def attach_bucket(df: pd.DataFrame) -> pd.DataFrame:
        srows = df.loc[df["aside"] == 1, ["akey", "scoords"]].drop_duplicates("akey")
        rr = df[df["aside"] == 0].drop(columns=["scoords"])
        if not len(rr):
            return pd.DataFrame(
                {
                    **{c: pd.Series([], dtype="int64")
                       for c in ("gid", "part", "ring", "kind", "arc_pos", "fwd")},
                    "coords": pd.Series([], dtype=object),
                    "scoords": pd.Series([], dtype=object),
                }
            )
        m = rr.merge(srows, on="akey", how="left")
        m["scoords"] = [
            c if k == 2 else s_
            for k, c, s_ in zip(m["kind"], m["coords"], m["scoords"])
        ]
        return m[
            ["gid", "part", "ring", "kind", "arc_pos", "fwd", "coords", "scoords"]
        ]

    attached = _bucketed(attach_in, ["akey"], attach_bucket, 16).repartition(16)

    def rebuild(grp: pd.DataFrame) -> pd.DataFrame:
        gid = int(grp.iloc[0]["gid"])
        parts_out = []
        for part, pg in sorted(grp.groupby("part"), key=lambda kv: kv[0]):
            if int(pg.iloc[0]["kind"]) == 2:
                blob = pg.iloc[0]["scoords"]
                geom = wkb_codec.loads(blob) if len(blob) else None
                parts_out.append(geom)
                continue
            kind = int(pg.iloc[0]["kind"])
            rings_built = []
            for ring, rg in sorted(pg.groupby("ring"), key=lambda kv: kv[0]):
                rg = rg.sort_values("arc_pos")
                arcs = []
                for _, ar in rg.iterrows():
                    a = _unblob(ar["scoords"])
                    if not int(ar["fwd"]):
                        a = a[::-1]
                    arcs.append(a if not arcs else a[1:])
                rings_built.append((ring, np.concatenate(arcs, axis=0)))
            if kind == 1:
                coords = rings_built[0][1]
                parts_out.append(g.LineString(coords) if len(coords) >= 2 else None)
            else:
                rings2 = [r for _, r in rings_built if len(r) >= 3]
                closed = []
                for r in rings2:
                    if not np.array_equal(r[0], r[-1]):
                        r = np.concatenate([r, r[:1]], axis=0)
                    if len(r) >= 4:
                        closed.append(r)
                if not closed:
                    parts_out.append(None)
                else:
                    poly = g.Polygon(closed[0], closed[1:])
                    parts_out.append(validity.make_valid(poly, keep_collapsed=True))
        parts_out = [p for p in parts_out if p is not None and not p.is_empty]
        geom = collect(parts_out) if len(parts_out) != 1 else parts_out[0]
        if uniform and geom is not None:
            geom = _collection_extract_one(geom, pid)
        wk = wkb_codec.dumps(geom) if geom is not None else None
        return pd.DataFrame({id_col: [gid], wkb_col: [wk]})

    def rebuild_bucket(df: pd.DataFrame) -> pd.DataFrame:
        outs = [rebuild(grp) for _, grp in df.groupby("gid", sort=False)]
        if not outs:
            return pd.DataFrame(
                {id_col: pd.Series([], dtype="int64"),
                 wkb_col: pd.Series([], dtype=object)}
            )
        return pd.concat(outs, ignore_index=True)

    return _bucketed(attached, ["gid"], rebuild_bucket, 16)
