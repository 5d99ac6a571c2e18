"""Multimodal queries: image decode/phash/pyramid/zonal/features/augment/curation, audio, video.

Split from pipelines/queries.py (round-2 verdict item 7); queries.py
remains the single QUERIES/ORACLE_SQL registry and re-exports these names.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from pygeoops_ray.stages import dedup as dedup_stages
from pygeoops_ray.stages import spatial as sp
from pygeoops_ray.pipelines.common import (
    _table_rows,
    _image_ds,
    _audio_ds,
)


def q_phash_dedup(sf_dir: str):
    """Two-tier image dedup: phash candidate key + exact quantized-pixel verify.

    phash alone is a coarse 64-bit candidate key with real collisions on this
    corpus (measured: 51 cross-pattern collisions at n=10k), so the keeper key
    is (phash_q, qdigest): phash_q is the perceptual hash of the DEQUANTIZED
    pixels (codec-invariant — the stored phash is computed over each row's
    own lossy decode and can split a true duplicate across buckets, observed
    2/198 pairs at n=20k) and qdigest is the md5 of the quantized pixels —
    the standard near-dup shape (candidate bucket → exact verify). Oracle:
    the generator's duplicate-injection rule (ordinal i with i%101==0, i>0
    reuses i-1's pixels — table/images.py:189), verified equivalent to the
    content-derived dedup at n=2k and n=20k.
    """
    import pyarrow.compute as pc

    from pygeoops_ray.stages.multimodal import quantized_digest_batch

    ds, n = _image_ds(sf_dir)
    ds = ds.select_columns(["image_id", "bytes", "fmt"])
    ds = ds.map_batches(quantized_digest_batch, batch_format="pyarrow", batch_size=1024)

    def to_ordinal(batch: pa.Table) -> pa.Table:
        i = pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 4, 32), pa.int64())
        return pa.Table.from_pydict(
            {"i": i, "phash": batch["phash_q"], "qdigest": batch["qdigest"]}
        )

    ds = ds.map_batches(to_ordinal, batch_format="pyarrow")
    return dedup_stages.exact_dedup_min(
        ds, ["phash", "qdigest"], "i", n_rows_hint=_table_rows(sf_dir, "part") * 10
    ).select_columns(["i"])


def q_phash_near_dup(sf_dir: str):
    """Near-duplicate IMAGE pairs by perceptual-hash hamming distance ≤ 3.

    The image-payload analogue of simhash_pairs: decode → integer-exact
    block-mean hash (table/images.int_mean_hash — cross-multiplied
    "block mean > image mean", no float ops, so DuckDB re-derives every hash
    from the generator rule) → generic banded ``hamming_pairs`` (K+1 bands;
    pigeonhole gives 100% recall) → exact popcount verify in-bucket. Oracle
    is the full all-pairs bit_count(xor(...)) ≤ K SQL over the SQL-derived
    hashes. At n=2k: 24 hamming-0 pairs (codec-invariant: a raw0 source and
    its qz1 duplicate hash identically) + 111 genuine near-misses.
    """
    import pyarrow.compute as pc

    from pygeoops_ray.stages.multimodal import int_hash_batch

    ds, n = _image_ds(sf_dir)
    ds = ds.select_columns(["image_id", "bytes", "fmt"])
    ds = ds.map_batches(int_hash_batch, batch_format="pyarrow", batch_size=1024)

    def to_ordinal(batch: pa.Table) -> pa.Table:
        i = pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 4, 32), pa.int64())
        return pa.Table.from_pydict({"i": i, "ihash": batch["ihash"]})

    ds = ds.map_batches(to_ordinal, batch_format="pyarrow")
    return dedup_stages.hamming_pairs(
        ds,
        id_col="i",
        hash_col="ihash",
        max_hamming=3,
        n_rows_hint=n,
        out_a="i_a",
        out_b="i_b",
    )


def q_image_pyramid(sf_dir: str):
    """Raster tile pyramid over the image table: 2 levels of iterated 2x2
    integer box-mean downsampling (stages/multimodal.pyramid_batch), one row
    per (image, level) with exact integer pixel digests. The oracle replays
    decode AND both floor-division levels from the generator rule in SQL;
    ``pyramid_ok`` binds the engine-codec re-encode roundtrip in-run.
    """
    import pyarrow.compute as pc

    from pygeoops_ray.stages.multimodal import pyramid_batch

    ds, _ = _image_ds(sf_dir)
    ds = ds.select_columns(["image_id", "bytes", "fmt"])
    ds = ds.map_batches(pyramid_batch, batch_format="pyarrow", batch_size=1024)

    def finish(batch: pa.Table) -> pa.Table:
        i = pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 4, 32), pa.int64())
        return pa.Table.from_pydict(
            {
                "i": i,
                "level": batch["level"],
                "w": batch["w"],
                "h": batch["h"],
                "sum_rgb": batch["sum_rgb"],
                "sum_sq": batch["sum_sq"],
                "pyramid_ok": batch["pyramid_ok"],
            }
        )

    return ds.map_batches(finish, batch_format="pyarrow")


def q_zonal_stats(sf_dir: str):
    """Zonal statistics: per 100-unit world zone, the integer sum of decoded
    pixel gray values and pixel count over ALL images touching the zone —
    the classic raster↔vector aggregate, over real decoded pixels.

    The zone grid is deliberately NOT aligned to the 256-unit image grid, so
    footprints straddle zone boundaries and the per-image reduceat split is
    exercised (stages/multimodal.zonal_partial_batch). Only <=4 partial rows
    per image shuffle; the oracle replays decode + the zone assignment
    arithmetic per pixel in SQL.
    """
    from pygeoops_ray.stages.groupagg import grouped_agg
    from pygeoops_ray.stages.multimodal import zonal_partial_batch
    from pygeoops_ray.table.images import footprint_of_ordinal

    import pyarrow.compute as pc

    ds, n = _image_ds(sf_dir)
    ds = ds.select_columns(["image_id", "bytes", "fmt"])

    def add_origin(batch: pa.Table) -> pa.Table:
        i = pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 4, 32), pa.int64())
        minx, miny, _, _ = footprint_of_ordinal(
            i.to_numpy(), np.zeros(len(batch)), np.zeros(len(batch))
        )
        out = batch.append_column("minx", pa.array(minx))
        return out.append_column("miny", pa.array(miny))

    partials = ds.map_batches(add_origin, batch_format="pyarrow").map_batches(
        zonal_partial_batch, batch_format="pyarrow", batch_size=1024
    )
    return grouped_agg(
        partials,
        ["zone_x", "zone_y"],
        [("sum_gray", "sum", "sum_gray"), ("n_px", "sum", "n_px")],
        n_rows_hint=n * 4,
    )


class _FeatureDigestStage:
    """Actor-pool stage: run the real FeatureStage kernel AND an integer
    pixel digest from one decode, binding the float features to the exact
    integer ground truth.

    The float feature vector (channel means/stds + 4x4 gray grid) has no
    bit-reproducible SQL form (pairwise float summation), but the DECODED
    PIXELS do: every digest below is an exact integer DuckDB can recompute
    from the generator rule, so the oracle value-checks decode + the pixel
    pipeline end-to-end. ``features_ok`` then asserts in-run that the float
    features agree with the integer sums (1e-4, >> float32 rounding), so a
    feature-kernel regression flips the driver hash red — same weak-oracle
    pattern as the ANN recall contract.

      sum_rgb   = sum over pixels/channels of decoded value
      sum_sq    = sum of squared decoded values (binds the stds)
      cell_wsum = sum of (cell_index+1) * (r+g+b) per pixel, where
                  cell_index = iy*4+ix of the 4x4 feature grid — weights make
                  every cell's contribution distinguishable (binds the grid)
    """

    def __init__(self, grid: int = 4):
        from pygeoops_ray.stages.multimodal import FeatureStage

        self.fs = FeatureStage(grid=grid)
        self.grid = grid

    def __call__(self, batch: pa.Table) -> pa.Table:
        from pygeoops_ray.stages.multimodal import decode_any

        g = self.grid
        out = {"image_id": batch["image_id"].to_pylist()}
        srgb, ssq, cws, fok = [], [], [], []
        for data, fmt in zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist()):
            pix = decode_any(data, fmt)
            h, w, _ = pix.shape
            d = pix.astype(np.int64)
            ch_sum = d.sum(axis=(0, 1))  # (3,)
            ch_sq = (d * d).sum(axis=(0, 1))
            rgb = d.sum(axis=2)  # (h, w)
            wy = (4 * np.arange(h) + 3) // h
            wx = (4 * np.arange(w) + 3) // w
            weight = wy[:, None] * g + wx[None, :] + 1
            srgb.append(int(ch_sum.sum()))
            ssq.append(int(ch_sq.sum()))
            cws.append(int((weight * rgb).sum()))
            # bind the float features to the integer truth
            f = self.fs.features(pix).astype(np.float64)
            n_px = h * w
            ok = True
            for c in range(3):
                mean_c = ch_sum[c] / n_px
                ok &= abs(f[c] - mean_c / 255.0) < 1e-4
                var_c = ch_sq[c] / n_px - mean_c * mean_c
                ok &= abs(f[3 + c] - np.sqrt(max(var_c, 0.0)) / 255.0) < 1e-4
            ys = (np.arange(g + 1) * h) // g
            xs = (np.arange(g + 1) * w) // g
            for i in range(g):
                for j in range(g):
                    cell = rgb[ys[i] : ys[i + 1], xs[j] : xs[j + 1]]
                    want = cell.sum() / (3.0 * cell.size * 255.0)
                    ok &= abs(f[6 + i * g + j] - want) < 1e-4
            fok.append(int(ok))
        out["sum_rgb"] = pa.array(srgb, pa.int64())
        out["sum_sq"] = pa.array(ssq, pa.int64())
        out["cell_wsum"] = pa.array(cws, pa.int64())
        out["features_ok"] = pa.array(fok, pa.int64())
        return pa.Table.from_pydict(out)


def q_image_features(sf_dir: str):
    """Feature extraction over the image table (actor-pool multimodal stage).

    Emits exact integer pixel digests (SQL-recomputable from the generator
    rule — the oracle value-checks decode end-to-end) plus a features_ok
    contract bit binding the float feature vector to them; see
    _FeatureDigestStage.
    """
    ds, n = _image_ds(sf_dir)
    return ds.map_batches(
        _FeatureDigestStage, batch_format="pyarrow", concurrency=2, batch_size=1024
    )


def q_image_augment(sf_dir: str):
    """Horizontal-flip + 180°-rotate augmentation over REAL decoded pixels,
    verified by position-weighted integer digests.

    The augmentation stage a vision training pipeline runs per epoch: decode
    → orientation transforms → re-use. Digests weight each pixel by its
    POST-transform coordinates (x+1 resp. (x+1)(y+1)), so a wrong flip axis
    or an off-by-one changes the value; the oracle re-derives the same sums
    from the generator rule with mirrored weights. ``aug_ok`` binds the
    involution contract (flip∘flip = id, rot180∘rot180 = id) in-run.
    """
    import pyarrow.compute as pc

    from pygeoops_ray.table.images import decode_image

    ds, _ = _image_ds(sf_dir)
    ds = ds.select_columns(["image_id", "bytes"])

    def augment(batch: pa.Table) -> pa.Table:
        ids = pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 4, 32), pa.int64())
        flip_wx, rot_w, ok = [], [], []
        for blob in batch["bytes"]:
            pix = decode_image(blob.as_py()).astype(np.int64)
            h, w = pix.shape[:2]
            flip = pix[:, ::-1, :]
            rot = pix[::-1, ::-1, :]
            wx = np.arange(1, w + 1, dtype=np.int64)
            wy = np.arange(1, h + 1, dtype=np.int64)
            flip_wx.append(int((flip.sum(axis=2) * wx[None, :]).sum()))
            rot_w.append(int((rot.sum(axis=2) * (wy[:, None] * wx[None, :])).sum()))
            ok.append(
                bool(
                    np.array_equal(flip[:, ::-1, :], pix)
                    and np.array_equal(rot[::-1, ::-1, :], pix)
                )
            )
        return pa.Table.from_pydict(
            {
                "i": ids,
                "flip_wx": pa.array(flip_wx, pa.int64()),
                "rot_w": pa.array(rot_w, pa.int64()),
                "aug_ok": pa.array(np.asarray(ok, np.int64), pa.int64()),
            }
        )

    return ds.map_batches(augment, batch_format="pyarrow", batch_size=1024)


def q_image_curation(sf_dir: str):
    """End-to-end IMAGE curation, composed and oracle-exact — the
    image-payload sibling of ``curation_pipeline``: size gate (w·h ≥ 1200)
    → exact dedup on the codec-invariant (phash_q, qdigest) key (argmin
    ordinal keeps the whole row) → near-duplicate removal (banded hamming ≤
    3 over the integer block-mean hash, guaranteed recall ⇒ deterministic
    drop-i_b rule) → multiplicative-hash train/val split → per-split counts
    + pixel sums + id checksums.

    ONE decode per image feeds all stages (multimodal.curate_digest_batch);
    the near-dup removal runs as a distributed Bloom ANTI-JOIN against the
    pair output (stages/bloomjoin.py) — bloom-negative images bypass the
    exchange entirely, bloom-positives decide in an exact left_anti join,
    so the drop set never materializes on the driver. The oracle replays
    the full chain — generator-rule dims, the ordinal duplicate rule, the
    HUGEINT ihash re-derivation, all-pairs hamming, and the split hash —
    in one SQL.
    """
    import pandas as pd
    import pyarrow.compute as pc

    from pygeoops_ray.stages.bloomjoin import bloom_anti_join
    from pygeoops_ray.stages.groupagg import _bucketed, grouped_agg
    from pygeoops_ray.stages.multimodal import curate_digest_batch

    ds, n = _image_ds(sf_dir)
    ds = ds.select_columns(["image_id", "bytes", "fmt"])
    ds = ds.map_batches(curate_digest_batch, batch_format="pyarrow", batch_size=1024)

    def gate(batch: pa.Table) -> pa.Table:
        i = pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 4, 32), pa.int64())
        batch = batch.drop_columns(["image_id"]).append_column("i", i)
        px = pc.multiply(batch["w"], batch["h"])
        return batch.filter(pc.greater_equal(px, 1200))

    gated = ds.map_batches(gate, batch_format="pyarrow")

    # exact dedup keeping the min-ordinal ROW (its own ihash rides along)
    def argmin_rows(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("i").drop_duplicates(["phash_q", "qdigest"], keep="first")

    deduped = _bucketed(
        gated, ["phash_q", "qdigest"], argmin_rows, n_buckets=8, pre=argmin_rows
    ).materialize()

    pairs = dedup_stages.hamming_pairs(
        deduped, id_col="i", hash_col="ihash", max_hamming=3,
        n_rows_hint=n, out_a="i_a", out_b="i_b",
    )
    # one-column pair projection materialized once (build side is read twice)
    kept = bloom_anti_join(
        deduped, pairs.select_columns(["i_b"]).materialize(),
        probe_key="i", build_key="i_b", n_build_hint=n,
    )

    def split_rows(b: pa.Table) -> pa.Table:
        ids = b["i"].to_numpy()
        px = b["w"].to_numpy() * b["h"].to_numpy()
        bucket = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)
        split = np.where(bucket % np.uint64(10) == 9, "val", "train")
        return pa.Table.from_pydict(
            {
                "split": pa.array(split),
                "i": pa.array(ids, pa.int64()),
                "px": pa.array(px.astype(np.int64), pa.int64()),
            }
        )

    return grouped_agg(
        kept.map_batches(split_rows, batch_format="pyarrow"),
        ["split"],
        [("i", "size", "n_images"), ("px", "sum", "sum_px"), ("i", "sum", "id_sum")],
        n_buckets=2,
    )


def q_quarantine_decode(sf_dir: str):
    """Dead-letter quarantine: corrupted rows split out in ONE pass.

    Every ordinal with ``i % 97 == 0`` gets its byte payload truncated
    (deterministic corruption); DecodeValidate flags them (decode raises →
    decode_ok=False, "quarantine, not crash"); stages/quarantine.py appends
    the failing rows to a side parquet sink from inside the map task while
    good rows flow on — the upstream never executes twice. The summary binds
    BOTH paths to the oracle: n_ok counts the surviving stream, n_quarantined
    and sum_quarantined count the dead-letter sink read back (deduped by
    image_id — task retries make the sink at-least-once).
    """
    import hashlib
    import os
    import shutil

    import pyarrow.compute as pc

    from pygeoops_ray.pipelines.flagship import DecodeValidate
    from pygeoops_ray.stages.quarantine import quarantine_by_flag, read_quarantine

    ds, n = _image_ds(sf_dir)
    key = hashlib.md5(f"{os.path.abspath(sf_dir)}:{n}".encode()).hexdigest()[:10]
    qdir = f"/tmp/pygeoops_ray_cache/quarantine_{key}"
    # the sink accumulates across runs by design (at-least-once + keyed dedup
    # absorbs that for the SAME corpus); a fresh dir keeps the demo tight
    shutil.rmtree(qdir, ignore_errors=True)

    def corrupt(batch: pa.Table) -> pa.Table:
        i = pc.cast(
            pc.utf8_slice_codeunits(batch["image_id"], 4, 32), pa.int64()
        ).to_numpy()
        data = batch["bytes"].to_pylist()
        out = [
            d[: len(d) // 2] if int(o) % 97 == 0 else d for o, d in zip(i, data)
        ]
        return batch.set_column(
            batch.schema.get_field_index("bytes"), "bytes", pa.array(out, pa.binary())
        )

    validated = ds.map_batches(corrupt, batch_format="pyarrow").map_batches(
        DecodeValidate(), batch_format="pyarrow", batch_size=256
    )
    good = quarantine_by_flag(validated, "decode_ok", qdir)
    n_ok = good.count()

    quar = read_quarantine(qdir, "image_id")

    def ords(batch: pa.Table) -> pa.Table:
        i = pc.cast(
            pc.utf8_slice_codeunits(batch["image_id"], 4, 32), pa.int64()
        ).to_numpy()
        return pa.Table.from_pydict({"i": pa.array(i, pa.int64())})

    qi = quar.map_batches(ords, batch_format="pyarrow").to_pandas()["i"].to_numpy()
    return pa.Table.from_pydict(
        {
            "n_total": pa.array([n], pa.int64()),
            "n_ok": pa.array([int(n_ok)], pa.int64()),
            "n_quarantined": pa.array([len(qi)], pa.int64()),
            "sum_quarantined": pa.array([int(qi.sum())], pa.int64()),
        }
    )


def q_audio_features(sf_dir: str):
    """Audio decode + exact integer feature extraction (actor-pool stage).

    Engine pa8/paz1 PCM codecs (table/audio.py); features n_samples/sum_abs/
    energy/max_abs/zero_crossings are exact int64, so the oracle value-checks
    decode + the feature kernel end-to-end by re-deriving every sample from
    the generator rule in SQL.
    """
    from pygeoops_ray.stages.multimodal import AudioFeatureStage

    # stateless kernel → instance form (elastic task pool): passing the CLASS
    # would make a fixed actor pool that the fused generator stage serializes
    # behind (measured 2-actor bottleneck on the video path)
    return _audio_ds(sf_dir).map_batches(
        AudioFeatureStage(), batch_format="pyarrow", batch_size=256
    )


def q_audio_resample(sf_dir: str):
    """Resample every clip to 4 kHz (nearest-sample, integer index math) and
    re-extract features — verifies the resample op's exact output contract."""
    from pygeoops_ray.stages.multimodal import AudioFeatureStage, AudioResampleStage

    ds = _audio_ds(sf_dir).map_batches(
        AudioResampleStage(rate_out=4000), batch_format="pyarrow", batch_size=256
    )
    return ds.map_batches(
        AudioFeatureStage(), batch_format="pyarrow", batch_size=256
    )


def q_video_frames(sf_dir: str):
    """Video frame sampling (every 5th frame) + per-frame integer pixel digest.

    The vz1 container's offset table makes sampling a byte-range slice —
    unsampled frames are never decompressed (the shape that matters at
    100 TB of video). Sampled frames are self-contained qz1 images; the
    digest stage decodes them and emits sum(d0+d1+d2), which the oracle
    recomputes from the frame generator rule in SQL.
    """
    from pygeoops_ray.stages.multimodal import FrameSampleStage
    from pygeoops_ray.table import images as I
    from pygeoops_ray.table.video import generate_videos_for_ordinals

    n = max(2 * _table_rows(sf_dir, "supplier"), 200)

    def gen(batch: pa.Table) -> pa.Table:
        return generate_videos_for_ordinals(batch["id"].to_numpy())

    vids = rd.range(n).map_batches(gen, batch_format="pyarrow", batch_size=64)
    # instance form (task pool): the class form's fixed actor pool fuses with
    # the generator stage and caps the whole chain at `concurrency` workers
    frames = vids.map_batches(
        FrameSampleStage(every_n=5), batch_format="pyarrow", batch_size=64
    )

    def digest(batch: pa.Table) -> pa.Table:
        sums = [
            int(I.decode_image(d).astype(np.int64).sum())
            for d in batch["bytes"].to_pylist()
        ]
        return pa.Table.from_pydict(
            {
                "video_id": batch["video_id"],
                "frame_idx": batch["frame_idx"],
                "sum_rgb": pa.array(sums, pa.int64()),
            }
        )

    return frames.map_batches(digest, batch_format="pyarrow")


CAPTION_QUERY_WORDS = ("river", "tower")


def q_caption_search(sf_dir: str):
    """Multimodal retrieval: keyword search over the CAPTION column → top-20
    images → decode ONLY the hits.

    The composed text→image chain a training-data pipeline runs constantly
    ("find me the images whose caption mentions X"): (1) a caption-only
    streaming pass scores every row (vectorized token match, score = total
    occurrences of the query words) and drops non-matches immediately;
    (2) top-20 by (score DESC, ordinal) via bounded per-block partials —
    only ≤20 rows per block ever move; (3) the DECODE runs as a point
    lookup: the ≤20 hit ordinals are re-generated/decoded directly
    (at rest: a manifest point-read of exactly those rows), so pixel cost
    scales with k, not the corpus. Output binds both modalities: the score
    from the caption side, the integer block-mean hash from the pixel side.
    The oracle re-derives caption words from the ordinal rule
    (table/images.py:caption_of) and the hashes from the generator CTEs.
    """
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data as rd

    from pygeoops_ray.stages.multimodal import int_hash_batch
    from pygeoops_ray.table.images import generate_images_for_ordinals

    ds, n = _image_ds(sf_dir)
    meta = ds.select_columns(["image_id", "caption"])

    def score_batch(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["caption"], " ")
        lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
        flat = pc.list_flatten(toks)
        hit = (
            pc.is_in(flat, value_set=pa.array(list(CAPTION_QUERY_WORDS)))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        score = np.add.reduceat(hit, starts) if len(hit) else np.zeros(0, np.int64)
        i = pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 4, 32), pa.int64())
        out = pa.Table.from_pydict(
            {"i": i, "score": pa.array(score, pa.int64())}
        )
        return out.filter(pc.greater(out["score"], 0))

    def pre_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["score", "i"], ascending=[False, True], kind="mergesort"
        )
        return pa.Table.from_pandas(df.head(20), preserve_index=False)

    scored = meta.map_batches(score_batch, batch_format="pyarrow", batch_size=None)
    partials = scored.map_batches(pre_topk, batch_format="pyarrow", batch_size=None)
    top = (
        partials.repartition(1)
        .map_batches(pre_topk, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values(["score", "i"], ascending=[False, True], kind="mergesort")
        .head(20)
        .reset_index(drop=True)
    )  # bounded: ≤20 rows land on the driver (the certificate set)
    top["rnk"] = np.arange(1, len(top) + 1, dtype=np.int64)

    # point-lookup decode: generate/decode exactly the hit ordinals
    hits = rd.from_arrow(
        pa.Table.from_pydict({"i": pa.array(top["i"].to_numpy(), pa.int64())})
    )

    def fetch(batch: pa.Table) -> pa.Table:
        rows = generate_images_for_ordinals(batch["i"].to_numpy(), small=True)
        hashed = int_hash_batch(rows)
        i = pc.cast(pc.utf8_slice_codeunits(hashed["image_id"], 4, 32), pa.int64())
        return pa.Table.from_pydict({"i": i, "ihash": hashed["ihash"]})

    fetched = hits.map_batches(fetch, batch_format="pyarrow").to_pandas()
    out = top.merge(fetched, on="i")
    return out[["i", "score", "rnk", "ihash"]]


def q_clip_score(sf_dir: str):
    """CLIP-style cross-modal alignment gate over the image+caption table:
    decode → image-tower + text-tower integer embeddings → exact cosine
    threshold keep/drop (stages/multimodal.ClipScoreStage). The keep bit for
    EVERY row is value-checked: the oracle re-derives the image tower from
    the pixel-generator CTEs and the text tower from the ordinal caption
    rule + md5_number_lower, then replays the cross-multiplied cosine
    compare in HUGEINT."""
    from pygeoops_ray.stages.multimodal import ClipScoreStage

    ds, _ = _image_ds(sf_dir)
    return ds.map_batches(
        ClipScoreStage,
        batch_format="pyarrow",
        concurrency=2,
        fn_constructor_kwargs={"tau_centi": 5},
    )


def q_aspect_bucket(sf_dir: str):
    """Aspect-ratio bucketed batch packing for image training: every image is
    assigned to an aspect bucket (tall / square / wide by the integer ratio
    ``w*1000 // h``), shuffled deterministically inside its bucket by
    md5(ordinal), and packed into fixed-size training batches of 32 with the
    trailing incomplete batch DROPPED per bucket — the standard
    aspect-bucketing step of diffusion-model data loaders, made
    rerun/partitioning-stable.

    Shape: bucket labels are a per-batch map; the per-bucket rank reuses the
    global_rank two-pass design — one range sort on (bucket, md5, i), a
    metadata-sized per-(block, bucket) count summary cumsum'd on the driver
    (rows = blocks × buckets, a few dozen), and a final whole-block map that
    adds offsets and emits (batch_id, slot). No row leaves its block after
    the sort; works unchanged when a bucket outspans many blocks.
    """
    import hashlib

    import pandas as pd

    from pygeoops_ray.pipelines.common import _images

    B = 32

    def label(batch: pa.Table) -> pa.Table:
        i = batch["i"].to_numpy()
        w = batch["w"].to_numpy().astype(np.int64)
        h = batch["h"].to_numpy().astype(np.int64)
        ratio_fp = w * 1000 // h
        bucket = np.where(ratio_fp < 800, "tall", np.where(ratio_fp <= 1250, "square", "wide"))
        hh = [hashlib.md5(str(v).encode()).hexdigest() for v in i]
        return pa.Table.from_pydict(
            {
                "i": pa.array(i, pa.int64()),
                "bucket": pa.array(bucket.tolist(), pa.string()),
                "hh": pa.array(hh, pa.string()),
            }
        )

    sorted_ds = (
        _images(sf_dir)
        .map_batches(label, batch_format="pyarrow")
        .sort(["bucket", "hh", "i"])
        .materialize()
    )

    def block_summary(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.Table.from_pydict(
                {
                    "bucket": pa.array([], pa.string()),
                    "min_hh": pa.array([], pa.string()),
                    "min_i": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        df = batch.select(["bucket", "hh", "i"]).to_pandas()
        g = df.groupby("bucket", sort=True, as_index=False).agg(
            min_hh=("hh", "first"), min_i=("i", "first"), cnt=("i", "size")
        )
        return pa.Table.from_pydict(
            {
                "bucket": pa.array(g["bucket"].tolist(), pa.string()),
                "min_hh": pa.array(g["min_hh"].tolist(), pa.string()),
                "min_i": pa.array(g["min_i"].astype(int).tolist(), pa.int64()),
                "cnt": pa.array(g["cnt"].astype(int).tolist(), pa.int64()),
            }
        )

    parts = (
        sorted_ds.map_batches(block_summary, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values(["bucket", "min_hh", "min_i"])
    )
    # per-bucket rank offset for each (block, bucket) run + per-bucket totals
    parts["off"] = parts.groupby("bucket")["cnt"].cumsum() - parts["cnt"]
    totals = parts.groupby("bucket")["cnt"].sum().to_dict()
    keep = {b: (int(n) // B) * B for b, n in totals.items()}
    offsets = {
        (r.bucket, r.min_hh, int(r.min_i)): int(r.off) for r in parts.itertuples()
    }

    def finalize(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.Table.from_pydict(
                {
                    "i": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.string()),
                    "batch_id": pa.array([], pa.int64()),
                    "slot": pa.array([], pa.int64()),
                }
            )
        df = batch.to_pandas()
        ranks = np.empty(len(df), dtype=np.int64)
        for b, g in df.groupby("bucket", sort=False):
            first = g.index[0]
            key = (b, df.loc[first, "hh"], int(df.loc[first, "i"]))
            ranks[g.index.to_numpy()] = offsets[key] + np.arange(len(g))
        df["rk"] = ranks
        df = df[df["rk"] < df["bucket"].map(keep)]
        out = pd.DataFrame(
            {
                "i": df["i"].to_numpy(),
                "bucket": df["bucket"].to_numpy(),
                "batch_id": (df["rk"] // B).to_numpy(),
                "slot": (df["rk"] % B).to_numpy(),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return sorted_ds.map_batches(finalize, batch_format="pyarrow", batch_size=None)


def q_image_histogram(sf_dir: str):
    """Per-image 8-bin luminance histogram over REAL decoded pixels
    (stages/multimodal.histogram_batch): the image-QA profiling pass that
    screens exposure/contrast before training. Pure flat map — one decode +
    one bincount per image, no shuffle; the oracle replays decode per pixel
    in SQL and aggregates the same bins."""
    from pygeoops_ray.stages.multimodal import histogram_batch

    ds, _ = _image_ds(sf_dir)
    return ds.select_columns(["image_id", "bytes", "fmt"]).map_batches(
        histogram_batch, batch_format="pyarrow", batch_size=1024
    )


def q_image_quality(sf_dir: str):
    """Per-image quality statistics over REAL decoded pixels: gray sum /
    sum-of-squares (contrast = variance, derivable) and total-variation
    edge energy along both axes (sharpness proxy) — the image-QA screening
    pass a diffusion-training pipeline runs before filtering. One decode
    per image, integer-exact outputs, no shuffle (image-local flat map);
    the oracle re-derives every pixel from the generator rule in SQL and
    replays the |∇| sums with positional self-joins."""
    ds, _ = _image_ds(sf_dir)

    def quality(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from pygeoops_ray.stages.multimodal import decode_any

        ids = pc.cast(
            pc.utf8_slice_codeunits(batch["image_id"], 4, 32), pa.int64()
        ).to_numpy()
        out = {k: [] for k in ("i", "w", "h", "sum_g", "sum_sq", "edge_x", "edge_y")}
        for k, (data, fmt) in enumerate(
            zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist())
        ):
            pix = decode_any(data, fmt)
            gray = pix.astype(np.int64).sum(axis=2)
            out["i"].append(int(ids[k]))
            out["h"].append(gray.shape[0])
            out["w"].append(gray.shape[1])
            out["sum_g"].append(int(gray.sum()))
            out["sum_sq"].append(int((gray * gray).sum()))
            out["edge_x"].append(int(np.abs(np.diff(gray, axis=1)).sum()))
            out["edge_y"].append(int(np.abs(np.diff(gray, axis=0)).sum()))
        return pa.Table.from_pydict(
            {c: pa.array(v, pa.int64()) for c, v in out.items()}
        )

    return ds.select_columns(["image_id", "bytes", "fmt"]).map_batches(
        quality, batch_format="pyarrow", batch_size=1024
    )


def q_multimodal_curation(sf_dir: str):
    """End-to-end MULTIMODAL curation — the cross-modal flagship chain that
    composes the image, text, and alignment gates a LAION-style corpus runs
    before training, with ONE decode per image feeding everything
    (stages/multimodal.mm_curate_batch): size gate (w·h ≥ 1200) AND
    CLIP-alignment gate (integer two-tower cosine ≥ 0.05 with dot>0) →
    exact dedup on the codec-invariant (phash_q, qdigest) key (argmin
    ordinal keeps the row — NOTE the dup ordinal's caption differs from its
    original's, so a dup survives when its original failed a gate; the
    oracle replays exactly that) → multiplicative-hash train/val split →
    per-split counts + pixel sums + id and dot checksums. Every stage is an
    already-oracle-checked operator; this query binds the cross-modal
    COMPOSITION to one SQL oracle.
    """
    import pandas as pd
    import pyarrow.compute as pc

    from pygeoops_ray.stages.groupagg import _bucketed, grouped_agg
    from pygeoops_ray.stages.multimodal import mm_curate_batch

    ds, n = _image_ds(sf_dir)
    ds = ds.select_columns(["image_id", "bytes", "fmt", "caption"])
    feats = ds.map_batches(mm_curate_batch, batch_format="pyarrow", batch_size=1024)

    def gate(b: pa.Table) -> pa.Table:
        px = pc.multiply(b["w"], b["h"])
        keep = pc.and_(pc.greater_equal(px, 1200), pc.equal(b["keep"], 1))
        return b.filter(keep)

    gated = feats.map_batches(gate, batch_format="pyarrow")

    def argmin_rows(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("i").drop_duplicates(["phash_q", "qdigest"], keep="first")

    deduped = _bucketed(gated, ["phash_q", "qdigest"], argmin_rows, n_buckets=8,
                        pre=argmin_rows)

    def split_rows(b: pa.Table) -> pa.Table:
        ids = b["i"].to_numpy()
        px = b["w"].to_numpy() * b["h"].to_numpy()
        bucket = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)
        split = np.where(bucket % np.uint64(10) == 9, "val", "train")
        return pa.Table.from_pydict(
            {
                "split": pa.array(split),
                "i": pa.array(ids, pa.int64()),
                "px": pa.array(px.astype(np.int64), pa.int64()),
                "dot": b["dot"],
            }
        )

    return grouped_agg(
        deduped.map_batches(split_rows, batch_format="pyarrow"),
        ["split"],
        [
            ("i", "size", "n_images"),
            ("px", "sum", "sum_px"),
            ("i", "sum", "id_sum"),
            ("dot", "sum", "dot_sum"),
        ],
        n_buckets=2,
    )


def q_wds_scan(sf_dir: str):
    """WebDataset source coverage — the tar-shard layout LAION-scale
    image+caption corpora actually ship in (``ray.data.read_webdataset``).
    The image table exports once to 4 ``.tar`` shards written from inside
    map tasks (members ``{image_id}.{fmt}`` + ``{image_id}.json`` carrying
    the caption — the standard WebDataset key-grouping convention), reads
    back through Ray's native WebDataset datasource (codec bytes arrive
    under their extension key, .json auto-decodes), decodes every image and
    aggregates per CODEC: image count, decoded-gray sum, caption character
    sum. The oracle re-derives all three from the generator CTEs, proving
    the tar roundtrip lossless for both modalities.
    """
    import hashlib
    import os

    import ray.data as rd

    from pygeoops_ray.stages.multimodal import decode_any

    ds, n = _image_ds(sf_dir)
    key = hashlib.md5(f"{os.path.abspath(sf_dir)}:{n}:wds2".encode()).hexdigest()[:10]
    path = f"/tmp/pygeoops_ray_cache/wds_{key}"
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.isfile(marker):
        os.makedirs(path, exist_ok=True)
        # uuid shard names: clear stale files from a crashed partial build
        for f in os.listdir(path):
            os.remove(os.path.join(path, f))

        def write_shard(b: pa.Table) -> pa.Table:
            import io
            import json
            import tarfile
            import uuid

            fn = os.path.join(path, f"shard-{uuid.uuid4().hex}.tar")
            tmp = fn + ".tmp"
            with tarfile.open(tmp, "w") as tf:
                for iid, data, fmt, cap in zip(
                    b["image_id"].to_pylist(), b["bytes"].to_pylist(),
                    b["fmt"].to_pylist(), b["caption"].to_pylist(),
                ):
                    ti = tarfile.TarInfo(f"{iid}.{fmt}")
                    ti.size = len(data)
                    tf.addfile(ti, io.BytesIO(data))
                    meta = json.dumps({"caption": cap}).encode()
                    tj = tarfile.TarInfo(f"{iid}.json")
                    tj.size = len(meta)
                    tf.addfile(tj, io.BytesIO(meta))
            os.rename(tmp, fn)
            return pa.Table.from_pydict({"rows": pa.array([b.num_rows], pa.int64())})

        total = (
            ds.select_columns(["image_id", "bytes", "fmt", "caption"])
            .repartition(32)  # reader parallelism follows shard count
            .map_batches(write_shard, batch_format="pyarrow", batch_size=None)
            .sum("rows")
        )
        assert total == n, (total, n)
        with open(marker, "w"):
            pass

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".tar")
    )

    def digest(rows: dict) -> pa.Table:
        # columnar dispatch: a mixed tar batch materializes absent
        # extensions as nan floats — ONE mask over the batch, then each
        # codec's rows decode in their own slice (per-row decode is the
        # measured tradeoff; the per-row isinstance/branch dispatch and
        # caption-length extraction are not, so they are vectorized here)
        n_ = len(rows["__key__"])
        r0 = rows.get("raw0")
        q1 = rows.get("qz1")
        if r0 is None:
            is_raw = np.zeros(n_, dtype=bool)
        else:
            is_raw = np.fromiter(
                (isinstance(v, (bytes, bytearray)) for v in r0),
                dtype=bool,
                count=n_,
            )
        grays = np.empty(n_, dtype=np.int64)
        for j in np.flatnonzero(is_raw):
            grays[j] = decode_any(bytes(r0[j]), "raw0").astype(np.int64).sum()
        for j in np.flatnonzero(~is_raw):
            grays[j] = decode_any(bytes(q1[j]), "qz1").astype(np.int64).sum()
        import json as _json

        # decoder=None skips Ray's per-sample auto-decode (measured ~40% of
        # reader CPU); the .json member arrives as raw bytes and parses here
        caps = np.fromiter(
            (len(_json.loads(bytes(d))["caption"]) for d in rows["json"]),
            dtype=np.int64,
            count=n_,
        )
        # algebraic partial per batch (≤2 rows out): the final exchange
        # moves per-block partials, not per-image rows
        out = {"fmt": [], "n_images": [], "sum_gray": [], "sum_caplen": []}
        for fmt, mask in (("raw0", is_raw), ("qz1", ~is_raw)):
            if mask.any():
                out["fmt"].append(fmt)
                out["n_images"].append(int(mask.sum()))
                out["sum_gray"].append(int(grays[mask].sum()))
                out["sum_caplen"].append(int(caps[mask].sum()))
        return pa.Table.from_pydict(
            {
                "fmt": pa.array(out["fmt"], pa.string()),
                "n_images": pa.array(out["n_images"], pa.int64()),
                "sum_gray": pa.array(out["sum_gray"], pa.int64()),
                "sum_caplen": pa.array(out["sum_caplen"], pa.int64()),
            }
        )

    from pygeoops_ray.stages.groupagg import grouped_agg

    wds = rd.read_webdataset(
        files, decoder=None, override_num_blocks=len(files)
    ).map_batches(digest, batch_format="numpy", batch_size=None)
    return grouped_agg(
        wds,
        ["fmt"],
        [
            ("n_images", "sum", "n_images"),
            ("sum_gray", "sum", "sum_gray"),
            ("sum_caplen", "sum", "sum_caplen"),
        ],
        n_buckets=1,
    )


def q_mixup_pairs(sf_dir: str):
    """Mixup paired augmentation — the standard training-time composite:
    images pair DETERMINISTICALLY within their aspect bucket (md5-rank
    consecutive partners, odd leftover dropped — rerun/partition-stable, the
    aspect_bucket rule), each pair decodes BOTH partners and composites
    pixelwise ``(a+b)//2`` over the overlapping top-left ``min(w)×min(h)``
    region, and emits integer composite digests. Distributed shape: the
    global md5-rank reuses the two-pass global_rank design (one range sort +
    metadata-sized offsets), pairs co-group by (bucket, rank//2) through a
    coarse-bucket exchange carrying ONLY ordinals, and the paired decode is
    a point-lookup (pixels regenerate from the ordinal inside the task —
    the caption_search fetch shape; at rest this is a bytes join against
    the image table). Oracle: pairing replayed with row_number over
    (bucket, md5), composites from the pixel-generator CTEs self-joined on
    (x, y)."""
    import hashlib

    import pandas as pd

    from pygeoops_ray.pipelines.common import _images
    from pygeoops_ray.stages.groupagg import _bucketed
    from pygeoops_ray.stages.multimodal import decode_any
    from pygeoops_ray.table.images import generate_images_for_ordinals

    def label(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        i = pc.cast(
            pc.utf8_slice_codeunits(batch["image_id"], 4, 32), pa.int64()
        ).to_numpy()
        w = batch["w"].to_numpy().astype(np.int64)
        h = batch["h"].to_numpy().astype(np.int64)
        ratio_fp = w * 1000 // h
        bucket = np.where(
            ratio_fp < 800, "tall", np.where(ratio_fp <= 1250, "square", "wide")
        )
        hh = [hashlib.md5(str(v).encode()).hexdigest() for v in i]
        return pa.Table.from_pydict(
            {
                "i": pa.array(i, pa.int64()),
                "bucket": pa.array(bucket.tolist(), pa.string()),
                "hh": pa.array(hh, pa.string()),
            }
        )

    ds_img, _n_img = _image_ds(sf_dir)
    sorted_ds = (
        ds_img.select_columns(["image_id", "w", "h"])
        .map_batches(label, batch_format="pyarrow")
        .sort(["bucket", "hh", "i"])
        .materialize()
    )

    # two-pass global rank (the global_rank/aspect_bucket design): per-block
    # run summaries keyed by the run's FIRST (bucket, hh, i) → driver cumsum
    # of a metadata-sized frame → whole-block offset map; no row ever leaves
    # its block after the sort
    def block_summary(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.Table.from_pydict(
                {
                    "bucket": pa.array([], pa.string()),
                    "min_hh": pa.array([], pa.string()),
                    "min_i": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        df = batch.select(["bucket", "hh", "i"]).to_pandas()
        g = df.groupby("bucket", sort=True, as_index=False).agg(
            min_hh=("hh", "first"), min_i=("i", "first"), cnt=("i", "size")
        )
        return pa.Table.from_pydict(
            {
                "bucket": pa.array(g["bucket"].tolist(), pa.string()),
                "min_hh": pa.array(g["min_hh"].tolist(), pa.string()),
                "min_i": pa.array(g["min_i"].astype(int).tolist(), pa.int64()),
                "cnt": pa.array(g["cnt"].astype(int).tolist(), pa.int64()),
            }
        )

    parts = (
        sorted_ds.map_batches(block_summary, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values(["bucket", "min_hh", "min_i"])
    )
    parts["off"] = parts.groupby("bucket")["cnt"].cumsum() - parts["cnt"]
    offsets = {
        (r.bucket, r.min_hh, int(r.min_i)): int(r.off) for r in parts.itertuples()
    }

    def add_pair(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.Table.from_pydict(
                {
                    "i": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.string()),
                    "pair": pa.array([], pa.int64()),
                    "rk": pa.array([], pa.int64()),
                }
            )
        df = batch.to_pandas()
        rk = np.empty(len(df), dtype=np.int64)
        for b, g in df.groupby("bucket", sort=False):
            first = g.iloc[0]
            off = offsets[(b, first["hh"], int(first["i"]))]
            rk[g.index.to_numpy()] = off + np.arange(len(g))
        return pa.Table.from_pydict(
            {
                "i": pa.array(df["i"].to_numpy(), pa.int64()),
                "bucket": pa.array(df["bucket"].tolist(), pa.string()),
                "pair": pa.array(rk // 2, pa.int64()),
                "rk": pa.array(rk, pa.int64()),
            }
        )

    pairs_in = sorted_ds.map_batches(add_pair, batch_format="pyarrow", batch_size=None)

    def make_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized pair-former: the global (hh, i) rank rode through
        # the exchange, so within a pair the partner order is (even rank,
        # odd rank) by construction — one sort + one size filter, no
        # per-pair loop and no md5 recompute
        df = df.sort_values("rk")
        cnt = df.groupby(["bucket", "pair"], sort=False)["i"].transform("size")
        df = df[cnt.to_numpy() == 2]
        rk = df["rk"].to_numpy()
        ii = df["i"].to_numpy()
        # after the rank sort, pair rows are adjacent: even rank first
        return pd.DataFrame(
            {"i_a": ii[rk % 2 == 0], "i_b": ii[rk % 2 == 1]}
        ).astype("int64")

    pairs = _bucketed(pairs_in, ["bucket", "pair"], make_pairs, 8)

    def composite(batch: pa.Table) -> pa.Table:
        ia = batch["i_a"].to_numpy()
        ib = batch["i_b"].to_numpy()
        rows_a = generate_images_for_ordinals(ia, small=True)
        rows_b = generate_images_for_ordinals(ib, small=True)
        sums, sqs, ws_, hs_ = [], [], [], []
        for j in range(len(ia)):
            pa_img = decode_any(
                rows_a["bytes"][j].as_py(), rows_a["fmt"][j].as_py()
            ).astype(np.int64)
            pb_img = decode_any(
                rows_b["bytes"][j].as_py(), rows_b["fmt"][j].as_py()
            ).astype(np.int64)
            h = min(pa_img.shape[0], pb_img.shape[0])
            w = min(pa_img.shape[1], pb_img.shape[1])
            comp = (pa_img[:h, :w] + pb_img[:h, :w]) // 2
            sums.append(int(comp.sum()))
            sqs.append(int((comp * comp).sum()))
            ws_.append(w)
            hs_.append(h)
        return pa.Table.from_pydict(
            {
                "i_a": pa.array(ia, pa.int64()),
                "i_b": pa.array(ib, pa.int64()),
                "w": pa.array(ws_, pa.int64()),
                "h": pa.array(hs_, pa.int64()),
                "comp_sum": pa.array(sums, pa.int64()),
                "comp_sq": pa.array(sqs, pa.int64()),
            }
        )

    return pairs.map_batches(composite, batch_format="pyarrow", batch_size=256)
