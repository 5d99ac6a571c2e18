"""Flagship pipeline: the full image-table spatial-join + tiling run.

read images table → decode+validate (actor pool; PSNR + caption invariants) →
footprint from georeference rule → Hilbert cell id → covering-tile expansion →
cell-cogrouped PIP join with event points → per-image point counts.

This is the headline workload of BASELINE.md: rows/sec through the whole chain.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray.data as rd

from pygeoops_ray.stages import spatial as sp
from pygeoops_ray.table import images as I

__all__ = ["images_parquet_path", "image_table_ds", "DecodeValidate", "flagship", "add_footprint"]


def images_parquet_path(n: int, small: bool = True, cache_dir: str = "/tmp/ray_geoops_cache") -> str:
    """Generate (once) and cache the synthetic images table for n rows.

    Large tables are generated Ray-parallel (the generator is a pure function
    of the ordinal) into a directory of part files; small ones single-process
    into one file. Returns the path to read_parquet.
    """
    os.makedirs(cache_dir, exist_ok=True)
    # v2: qz1 payloads are bit-packed (table/images.py) — old caches hold the
    # legacy Q1 layout (still decodable, but 5x slower to inflate)
    suffix = ("small" if small else "big") + "_v2"
    if n <= 20_000:
        path = f"{cache_dir}/images_n{n}_{suffix}.parquet"
        if not os.path.exists(path):
            tmp = path + ".tmp"
            I.write_images_parquet(tmp, n, small=small)
            os.replace(tmp, path)
        return path
    path = f"{cache_dir}/images_n{n}_{suffix}"
    done_marker = f"{path}/_DONE"
    if not os.path.exists(done_marker):
        import shutil

        shutil.rmtree(path, ignore_errors=True)

        def gen(batch: pa.Table) -> pa.Table:
            return I.generate_images_for_ordinals(batch["id"].to_numpy(), small=small)

        rd.range(n).map_batches(gen, batch_format="pyarrow", batch_size=4096).write_parquet(path)
        with open(done_marker, "w") as f:
            f.write("ok")
    return path


def image_table_ds(n: int, small: bool = True, columns=None, num_blocks: int | None = None):
    """Read the cached synthetic table; block count sized to the session CPUs
    (many tiny blocks make every downstream shuffle pay per-block overhead)."""
    import ray

    if num_blocks is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        num_blocks = max(8, min(2 * ncpu, max(1, n // 4096)))
    ds = rd.read_parquet(
        images_parquet_path(n, small), columns=columns, override_num_blocks=num_blocks
    )

    def strip_meta(batch: pa.Table) -> pa.Table:
        # parquet pandas-metadata makes schemas unhashable → Ray's shuffle
        # schema-dedup fails per reduce task (warning + the slow unify path)
        if batch.schema.metadata is not None:
            return batch.replace_schema_metadata(None)
        return batch

    return ds.map_batches(strip_meta, batch_format="pyarrow", batch_size=None)


class DecodeValidate:
    """Actor-pool stage: decode bytes, verify phash + PSNR + caption invariants.

    Emits decode_ok and psnr_db columns. psnr_db is the REAL PSNR of the
    decoded pixels against the regenerated source pattern (the generator is a
    pure function of the ordinal — table/images.py synth_pixels — so the
    ground truth is recomputable per row): inf for the lossless raw0 codec,
    >=46 dB for qz1's 6-bit quantizer, satisfying the >=40 dB per-row
    invariant (BASELINE.json input_hint). Raises on a broken invariant when
    strict=True (default off: at scale you quarantine, not crash).
    """

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        datas = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        phashes = batch["phash"].to_numpy()
        caps = batch["caption"].to_pylist()
        ords = pc.cast(
            pc.utf8_slice_codeunits(batch["image_id"], 4, 32), pa.int64()
        ).to_numpy()
        n = len(datas)
        ok = np.zeros(n, dtype=bool)
        psnr_db = np.full(n, 0.0)

        # Deliberately a per-row loop over small cache-resident arrays. A
        # fully batched variant (group rows by (dims, codec), joined-buffer
        # frombuffer decode, stacked phash/synth/PSNR — see
        # images.mean_phash_batch / synth_pixels_batch) measured 2x FASTER
        # single-process but 2x SLOWER under 32 concurrent Ray workers on
        # this memory-bandwidth-throttled box: its per-group stacks and
        # int16/float32 PSNR temporaries push every worker's working set out
        # of cache and the workers contend for DRAM; the scalar loop's ~12 KB
        # working set stays in L1/L2 per worker. Batch kernels remain
        # exported for uncontended (single-process) use.
        for k, data in enumerate(datas):
            try:
                pix = I.decode_image(data)
                ok[k] = I.mean_phash(pix) == phashes[k] and bool(caps[k])
                # source pattern of this row (the i%101 duplicate rule reuses
                # the previous ordinal's pixels)
                i = int(ords[k])
                src = i - 1 if (i % 101 == 0 and i > 0) else i
                h, w, _ = pix.shape
                synth = I.synth_pixels(src, w, h)
                if fmts[k] == "raw0" and np.array_equal(pix, synth):
                    # lossless rows decode bit-equal in the expected case:
                    # equality (a memcmp) IS psnr == inf, ~8x cheaper than
                    # the subtract+dot; corrupted rows fall through to the
                    # real computation
                    psnr_db[k] = float("inf")
                else:
                    psnr_db[k] = I.psnr(pix, synth)
                if self.strict and fmts[k] != "raw0" and psnr_db[k] < 40.0:
                    raise ValueError(
                        f"PSNR invariant broken: {psnr_db[k]:.1f} dB for {i}"
                    )
            except Exception:
                ok[k] = False
                if self.strict:
                    raise

        out = batch.drop_columns(["bytes"])
        out = out.append_column("decode_ok", pa.array(ok))
        out = out.append_column("psnr_db", pa.array(psnr_db, pa.float64()))
        return out


_DECODER = DecodeValidate()


def decode_validate_batch(batch: pa.Table) -> pa.Table:
    return _DECODER(batch)


def add_footprint(batch: pa.Table) -> pa.Table:
    """Footprint rect from the georeference rule (ordinal parsed from image_id)."""
    import pyarrow.compute as pc

    i = pc.cast(
        pc.utf8_slice_codeunits(batch["image_id"], 4, 32), pa.int64()
    ).to_numpy()
    minx, miny, maxx, maxy = I.footprint_of_ordinal(
        i, batch["w"].to_numpy(), batch["h"].to_numpy()
    )
    out = batch.append_column("i", pa.array(i, pa.int64()))
    out = out.append_column("minx", pa.array(minx))
    out = out.append_column("miny", pa.array(miny))
    out = out.append_column("maxx", pa.array(maxx))
    out = out.append_column("maxy", pa.array(maxy))
    return out


def flagship(sf_dir: str, n_images: int | None = None, decode: bool = True, concurrency: int = 4):
    """Run the flagship chain; returns the per-image join-count Dataset.

    ``concurrency`` is accepted for API compatibility but unused: the decode
    stage runs as an elastic TASK pool (see comment below), which the
    streaming executor sizes itself.
    """

    if n_images is None:
        import pyarrow.parquet as pq

        n_part = pq.read_metadata(f"{sf_dir}/part.parquet").num_rows
        n_images = n_part * 5

    # launch the small-side broadcast prep FIRST: it runs as a Ray task
    # concurrently with the image pipeline below instead of blocking the
    # driver for its own plan execution (~1-1.5 s at bench scale)
    points_ref = sp.prep_points_broadcast(f"{sf_dir}/events.parquet")

    if decode:
        # decode as stateless TASKS, not an actor pool: the stage holds no
        # per-actor state (codec tables are module-level), and a task pool is
        # elastic — an actor pool sized to the session's CPUs starves the read
        # stage at low cpu counts (observed deadlock at num_cpus=2)
        imgs = image_table_ds(n_images).map_batches(
            decode_validate_batch, batch_format="pyarrow", batch_size=4096
        )
    else:
        # prune the payload at the read: metadata-only columns leave storage
        imgs = image_table_ds(
            n_images, columns=["image_id", "w", "h", "fmt", "caption", "phash"]
        )
    imgs = imgs.map_batches(add_footprint, batch_format="pyarrow")

    # points side is small at every test scale → broadcast join (no shuffle);
    # the cell-cogrouped shuffle join (strategy="groupby") is the large×large
    # path and stays oracle-verified via queries.pip_join
    joined = sp.pip_join_rects_points(
        imgs, None, rect_cols=("image_id",), point_cols=("event_id",),
        strategy="broadcast", points_broadcast=points_ref,
    )
    # bucketed vectorized count: one group per matched image, so Ray's
    # native aggregate would pay per-group Python overhead at scale
    from pygeoops_ray.stages.groupagg import grouped_count

    # hint scales the coarse bucket count with the image population
    return grouped_count(joined, ["image_id"], "n_points", n_rows_hint=n_images)


def flagship_write(
    sf_dir: str,
    out_dir: str,
    n_images: int | None = None,
    ordinals_per_bucket: int = 62_500,
):
    """Flagship chain with a RESUMABLE partitioned sink.

    The per-image join counts land as one parquet file per image-ordinal
    bucket with a lineage manifest (state/manifest.py); a rerun after a
    partial failure recomputes only the missing buckets. Buckets are
    FIXED-SIZE ordinal ranges (not a fixed bucket count): partition count
    grows with the input while file size and resume granularity stay
    bounded — never one giant file at any scale.
    """
    from pygeoops_ray.state.manifest import write_partitioned

    res = flagship(sf_dir, n_images=n_images)

    def bucketize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        i = pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 4, 32), pa.int64())
        bucket = pc.divide(i, pa.scalar(ordinals_per_bucket))
        return batch.append_column("bucket", pc.cast(bucket, pa.int64()))

    ds = res.map_batches(bucketize, batch_format="pyarrow")
    report = write_partitioned(
        ds, out_dir, "bucket", stage="flagship",
        lineage={"sf_dir": sf_dir, "n_images": n_images},
    )
    return report
