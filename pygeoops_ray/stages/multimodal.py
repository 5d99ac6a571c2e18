"""Multimodal column stages: decode / resize / feature-extract / frame-sample.

Images/audio/video are opaque ``binary`` columns with typed metadata; each op
is an actor-pool ``map_batches`` stage. The engine-owned codecs (raw0/qz1) are
real; operations that would need external media libraries (JPEG, ffmpeg) are
STUBBED behind ``NotImplementedError`` with the Ray-side plumbing — schema,
batch shape, actor signature, output layout — real and tested, so swapping in
a real decoder is a one-function change.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from pygeoops_ray.table import images as I

__all__ = [
    "ResizeStage",
    "FeatureStage",
    "FrameSampleStage",
    "AudioFeatureStage",
    "AudioResampleStage",
    "decode_any",
    "quantized_digest_batch",
]


def decode_any(data: bytes, fmt: str) -> np.ndarray:
    """Decode a payload by codec tag. Engine codecs are real; foreign codecs
    (jpeg/png/...) are stubs — the container has no image libraries."""
    if fmt in ("raw0", "qz1"):
        return I.decode_image(data)
    raise NotImplementedError(
        f"codec {fmt!r} needs an external decoder (PIL/libjpeg) not present in "
        "this environment; plug it in here"
    )


def quantized_digest_batch(batch: pa.Table) -> pa.Table:
    """Append ``qdigest`` (md5 of the 6-bit-quantized decoded pixels + dims)
    and ``phash_q`` (perceptual hash of the DEQUANTIZED pixels).

    ``pix >> 2`` is the exact fixed point of the raw0/qz1 codec pair (qz1
    stores the quantized plane; its decode q*4+2 re-quantizes to q), so two
    encodings of the same source pattern — even across codecs — get the SAME
    digest, while any genuinely different pattern gets a different one.

    ``phash_q`` exists because the STORED phash is computed over each row's
    OWN decode: a raw0 source and a qz1 duplicate of the same pixels can
    disagree in a phash bit when values sit on the quantizer's mean
    threshold (measured: 2 of 198 injected duplicate pairs at n=20k).
    Hashing the dequantized plane (q*4+2) makes the candidate key
    codec-invariant, so the candidate bucket never splits a true duplicate.
    """
    import hashlib

    from pygeoops_ray.table.images import mean_phash

    digs, phq = [], []
    for data, fmt in zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist()):
        pix = decode_any(data, fmt)
        h, w, _ = pix.shape
        q = (pix >> 2).astype(np.uint8)
        digs.append(hashlib.md5(q.tobytes() + struct.pack("<HH", w, h)).hexdigest())
        phq.append(mean_phash((q << np.uint8(2)) + np.uint8(2)))
    out = batch.append_column("qdigest", pa.array(digs, pa.string()))
    return out.append_column("phash_q", pa.array(np.array(phq, dtype=np.uint64)))


def int_hash_batch(batch: pa.Table) -> pa.Table:
    """(image_id, bytes, fmt) → (image_id, ihash): integer-exact block-mean
    perceptual hash of each row's decoded pixels (table/images.int_mean_hash).

    The hash has no float ops, so the phash_near_dup oracle re-derives every
    value from the generator rule in integer SQL.
    """
    from pygeoops_ray.table.images import int_mean_hash

    hs = np.empty(len(batch), dtype=np.int64)
    for j, (data, fmt) in enumerate(
        zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist())
    ):
        hs[j] = int_mean_hash(decode_any(data, fmt))
    return pa.Table.from_pydict(
        {"image_id": batch["image_id"], "ihash": pa.array(hs, pa.int64())}
    )


def curate_digest_batch(batch: pa.Table) -> pa.Table:
    """(image_id, bytes, fmt) → (image_id, w, h, qdigest, phash_q, ihash):
    ONE decode per image feeding the whole image-curation chain — the exact
    dedup key (quantized digest + codec-invariant perceptual hash), the
    integer block-mean hash for hamming near-dup, and the dims for the size
    gate. Composing quantized_digest_batch + int_hash_batch would decode
    every image twice; at 100-TB the decode IS the cost.
    """
    import hashlib

    from pygeoops_ray.table.images import int_mean_hash, mean_phash

    n = len(batch)
    ws = np.empty(n, dtype=np.int64)
    hs = np.empty(n, dtype=np.int64)
    ih = np.empty(n, dtype=np.int64)
    digs, phq = [], []
    for j, (data, fmt) in enumerate(
        zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist())
    ):
        pix = decode_any(data, fmt)
        h, w, _ = pix.shape
        ws[j], hs[j] = w, h
        q = (pix >> 2).astype(np.uint8)
        digs.append(hashlib.md5(q.tobytes() + struct.pack("<HH", w, h)).hexdigest())
        phq.append(mean_phash((q << np.uint8(2)) + np.uint8(2)))
        ih[j] = int_mean_hash(pix)
    return pa.Table.from_pydict(
        {
            "image_id": batch["image_id"],
            "w": pa.array(ws, pa.int64()),
            "h": pa.array(hs, pa.int64()),
            "qdigest": pa.array(digs, pa.string()),
            "phash_q": pa.array(np.array(phq, dtype=np.uint64)),
            "ihash": pa.array(ih, pa.int64()),
        }
    )


def pyramid_batch(batch: pa.Table, levels: int = 2) -> pa.Table:
    """Raster tile pyramid: iterated 2x2 integer box-mean downsampling.

    One output row per (image, level 1..levels): level L halves the previous
    level's dims (odd trailing row/col dropped) and each output pixel is
    ``(a+b+c+d)//4`` of its 2x2 block — floor division at EVERY level, so
    the whole pyramid is exact integer arithmetic the image_pyramid oracle
    replays in SQL. Emits the re-encoded level bytes (raw0) plus integer
    pixel digests binding the values, and a ``pyramid_ok`` codec-roundtrip
    bit.
    """
    from pygeoops_ray.table.images import decode_image, encode_image

    ids, lvls, ws, hs, datas, srgb, ssq, ok = [], [], [], [], [], [], [], []
    for iid, data, fmt in zip(
        batch["image_id"].to_pylist(),
        batch["bytes"].to_pylist(),
        batch["fmt"].to_pylist(),
    ):
        pix = decode_any(data, fmt)
        for lvl in range(1, levels + 1):
            h2, w2 = pix.shape[0] // 2, pix.shape[1] // 2
            if h2 < 1 or w2 < 1:
                break
            p = pix[: 2 * h2, : 2 * w2].astype(np.int64)
            pix = (
                (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) // 4
            ).astype(np.uint8)
            enc = encode_image(pix, "raw0")
            ids.append(iid)
            lvls.append(lvl)
            ws.append(w2)
            hs.append(h2)
            datas.append(enc)
            srgb.append(int(pix.sum(dtype=np.int64)))
            ssq.append(int((pix.astype(np.int64) ** 2).sum()))
            ok.append(1 if np.array_equal(decode_image(enc), pix) else 0)
    return pa.Table.from_pydict(
        {
            "image_id": pa.array(ids, pa.string()),
            "level": pa.array(lvls, pa.int64()),
            "w": pa.array(ws, pa.int64()),
            "h": pa.array(hs, pa.int64()),
            "bytes": pa.array(datas, pa.binary()),
            "sum_rgb": pa.array(srgb, pa.int64()),
            "sum_sq": pa.array(ssq, pa.int64()),
            "pyramid_ok": pa.array(ok, pa.int64()),
        }
    )


def zonal_partial_batch(batch: pa.Table, zone: int = 100) -> pa.Table:
    """Zonal-statistics partials: per (image, world zone), the integer sum of
    decoded gray values (r+g+b) and pixel count inside that zone.

    Pixel (y, x) of image i covers the unit world square
    [minx+x, minx+x+1) x [miny+y, miny+y+1); with integer zone size and
    integer pixel corners every pixel lies in exactly ONE zone, so the
    per-image split is two reduceats at the zone boundaries (each footprint
    here touches <= 4 zones). Only these tiny partials shuffle; the global
    zonal aggregate is a sum per zone key (stages/groupagg.grouped_agg).
    Expects minx/miny footprint columns (integer-valued) alongside bytes/fmt.
    """
    minxs = batch["minx"].to_numpy()
    minys = batch["miny"].to_numpy()
    zx_out, zy_out, sg_out, np_out = [], [], [], []
    for k, (data, fmt) in enumerate(
        zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist())
    ):
        pix = decode_any(data, fmt)
        h, w, _ = pix.shape
        x0, y0 = int(minxs[k]), int(minys[k])
        gray = pix.reshape(h, w * 3)
        xb = [0] + [x for x in range(1, w) if (x0 + x) % zone == 0]
        yb = [0] + [y for y in range(1, h) if (y0 + y) % zone == 0]
        colsum = np.add.reduceat(gray, [3 * x for x in xb], axis=1, dtype=np.int64)
        blocks = np.add.reduceat(colsum, yb, axis=0)  # (ny, nx) gray sums
        nx_px = np.diff(xb + [w])
        ny_px = np.diff(yb + [h])
        for iy in range(len(yb)):
            for ix in range(len(xb)):
                zx_out.append((x0 + xb[ix]) // zone)
                zy_out.append((y0 + yb[iy]) // zone)
                sg_out.append(int(blocks[iy, ix]))
                np_out.append(int(ny_px[iy] * nx_px[ix]))
    return pa.Table.from_pydict(
        {
            "zone_x": pa.array(zx_out, pa.int64()),
            "zone_y": pa.array(zy_out, pa.int64()),
            "sum_gray": pa.array(sg_out, pa.int64()),
            "n_px": pa.array(np_out, pa.int64()),
        }
    )


def _resize_nearest(pix: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbour resize (pure numpy; deterministic)."""
    h, w, _ = pix.shape
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return pix[ys][:, xs]


class ResizeStage:
    """Actor-pool stage: decode → resize → re-encode with the engine codec.

    Output schema mirrors the input with (bytes, w, h) replaced; fmt is kept.
    """

    def __init__(self, out_w: int = 32, out_h: int = 32):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_bytes, ws, hs = [], [], []
        fmts = batch["fmt"].to_pylist()
        for data, fmt in zip(batch["bytes"].to_pylist(), fmts):
            pix = decode_any(data, fmt)
            small = _resize_nearest(pix, self.out_w, self.out_h)
            out_bytes.append(I.encode_image(np.ascontiguousarray(small), fmt))
            ws.append(self.out_w)
            hs.append(self.out_h)
        t = batch.drop_columns(["bytes", "w", "h"])
        t = t.append_column("bytes", pa.array(out_bytes, pa.binary()))
        t = t.append_column("w", pa.array(ws, pa.int32()))
        t = t.append_column("h", pa.array(hs, pa.int32()))
        return t


class FeatureStage:
    """Actor-pool stage: per-image feature vector (list<float> column).

    Features: channel means/stds + 4x4 grayscale grid (deterministic numpy
    "fake embedding" — a model swap-in point; the Ray plumbing is the deliverable).
    """

    def __init__(self, grid: int = 4):
        self.grid = grid

    def features(self, pix: np.ndarray) -> np.ndarray:
        h, w, _ = pix.shape
        f = [pix[..., c].mean() / 255.0 for c in range(3)]
        f += [pix[..., c].std() / 255.0 for c in range(3)]
        gray = pix.mean(axis=2)
        g = self.grid
        ys = (np.arange(g + 1) * h) // g
        xs = (np.arange(g + 1) * w) // g
        for i in range(g):
            for j in range(g):
                f.append(gray[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean() / 255.0)
        return np.array(f, dtype=np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self.features(decode_any(d, f))
            for d, f in zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist())
        ]
        t = batch.drop_columns(["bytes"])
        return t.append_column(
            "features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        )


class FrameSampleStage:
    """Actor-pool stage: video frame sampling, 1→k rows per video.

    For the engine-owned ``vz1`` container (table/video.py) sampling is REAL
    and zero-decode: the container's offset table turns "take every n-th
    frame" into byte-range slices — unsampled frames are never decompressed,
    which is the shape that survives 100 TB of video (decode cost scales with
    SAMPLED frames only). Output rows are self-contained qz1 images, so every
    downstream image stage (FeatureStage, ResizeStage, phash dedup) composes
    unchanged.

    Foreign codecs (mp4/webm/...) stay stubbed: decoding them needs ffmpeg,
    absent from this container. The contract a real decoder must produce is
    exactly what the vz1 path emits: (video_id, frame_idx:int64,
    bytes:binary, w:int32, h:int32, fmt:string).
    """

    def __init__(self, every_n: int = 30):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        from pygeoops_ray.table import video as V

        foreign = set(batch["fmt"].to_pylist()) - {"vz1"}
        if foreign:
            raise NotImplementedError(
                f"video codec(s) {sorted(foreign)} need ffmpeg, which this "
                "container does not ship; plug a real decoder in here"
            )
        vids, fidx, blobs, ws, hs, fmts = [], [], [], [], [], []
        for vid, data in zip(
            batch["video_id"].to_pylist(), batch["bytes"].to_pylist()
        ):
            n, w, h, _fps, offs, start = V.parse_header(data)
            for j in range(0, n, self.every_n):
                vids.append(vid)
                fidx.append(j)
                blobs.append(data[start + int(offs[j]) : start + int(offs[j + 1])])
                ws.append(w)
                hs.append(h)
                fmts.append("qz1")
        return pa.Table.from_pydict(
            {
                "video_id": pa.array(vids, pa.string()),
                "frame_idx": pa.array(fidx, pa.int64()),
                "bytes": pa.array(blobs, pa.binary()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "fmt": pa.array(fmts, pa.string()),
            }
        )


class AudioFeatureStage:
    """Actor-pool stage: exact integer features per audio clip.

    Decode (engine pa8/paz1 codecs, table/audio.py) → vectorized int64
    reductions: n_samples, sum_abs, energy (Σ s²), max_abs, zero_crossings
    (count of t with s[t]·s[t+1] < 0). Every output is an exact integer the
    driver oracle recomputes in SQL from the generator rule, so decode and
    the feature kernel are value-checked end-to-end — the same
    integer-digest pattern as the image feature oracle.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        from pygeoops_ray.table.audio import decode_audio

        ids = batch["clip_id"].to_pylist()
        n_s, s_abs, energy, m_abs, zc = [], [], [], [], []
        for data in batch["bytes"].to_pylist():
            s, _rate = decode_audio(data)
            d = s.astype(np.int64)
            n_s.append(len(d))
            s_abs.append(int(np.abs(d).sum()))
            energy.append(int((d * d).sum()))
            m_abs.append(int(np.abs(d).max()) if len(d) else 0)
            zc.append(int((d[:-1] * d[1:] < 0).sum()))
        return pa.Table.from_pydict(
            {
                "clip_id": pa.array(ids, pa.string()),
                "n_samples": pa.array(n_s, pa.int64()),
                "sum_abs": pa.array(s_abs, pa.int64()),
                "energy": pa.array(energy, pa.int64()),
                "max_abs": pa.array(m_abs, pa.int64()),
                "zero_crossings": pa.array(zc, pa.int64()),
            }
        )


class AudioResampleStage:
    """Actor-pool stage: decode → nearest-sample resample → re-encode.

    Pure integer index math (table/audio.py:resample_nearest), so the output
    is deterministic and oracle-checkable; output schema mirrors the input
    with (bytes, n, rate) replaced.
    """

    def __init__(self, rate_out: int = 4000):
        self.rate_out = rate_out

    def __call__(self, batch: pa.Table) -> pa.Table:
        from pygeoops_ray.table.audio import decode_audio, encode_audio, resample_nearest

        blobs, ns = [], []
        fmts = batch["fmt"].to_pylist()
        for data, fmt in zip(batch["bytes"].to_pylist(), fmts):
            s, rate = decode_audio(data)
            out = resample_nearest(s, rate, self.rate_out)
            blobs.append(encode_audio(out, self.rate_out, fmt))
            ns.append(len(out))
        t = batch.drop_columns(["bytes", "n", "rate"])
        t = t.append_column("bytes", pa.array(blobs, pa.binary()))
        t = t.append_column("n", pa.array(ns, pa.int32()))
        t = t.append_column(
            "rate", pa.array([self.rate_out] * len(blobs), pa.int32())
        )
        return t


def clip_towers(px: np.ndarray, caption: str, tok_cache: dict) -> tuple[int, int, int]:
    """(dot, |a|^2, |b|^2) of the integer two-tower CLIP stand-in over DECODED
    pixels + caption tokens (see ClipScoreStage docstring for the rules)."""
    import hashlib

    h, w, _ = px.shape
    ys = (np.arange(8) * h) // 8
    rows = np.add.reduceat(px.reshape(h, w * 3), ys, axis=0, dtype=np.int64).sum(axis=1)
    a = 8 * rows - int(rows.sum())
    b = np.zeros(8, dtype=np.int64)
    dim = np.arange(8, dtype=np.uint64) * np.uint64(8)
    for tok in caption.split(" "):
        tv = tok_cache.get(tok)
        if tv is None:
            h64 = np.uint64(
                struct.unpack("<Q", hashlib.md5(tok.encode("utf-8")).digest()[8:16])[0]
            )
            tv = ((h64 >> dim) & np.uint64(255)).astype(np.int64) - 128
            tok_cache[tok] = tv
        b += tv
    return int(a @ b), int(a @ a), int(b @ b)


def mm_curate_batch(batch: pa.Table, tau_centi: int = 5) -> pa.Table:
    """(image_id, bytes, fmt, caption) → per-image curation features from ONE
    decode: dims (size gate), codec-invariant dedup key (qdigest, phash_q),
    and the cross-modal CLIP gate (dot, keep) — the fused multimodal
    curation kernel (decoding per gate would triple the 100-TB cost)."""
    import hashlib

    import pyarrow.compute as pc

    from pygeoops_ray.table.images import mean_phash

    n = len(batch)
    ws = np.empty(n, dtype=np.int64)
    hs = np.empty(n, dtype=np.int64)
    dots = np.empty(n, dtype=np.int64)
    keeps = np.empty(n, dtype=np.int64)
    digs, phq = [], []
    tau2 = tau_centi * tau_centi
    tok_cache: dict[str, np.ndarray] = {}
    for j, (data, fmt, cap) in enumerate(
        zip(
            batch["bytes"].to_pylist(),
            batch["fmt"].to_pylist(),
            batch["caption"].to_pylist(),
        )
    ):
        px = decode_any(data, fmt)
        h, w, _ = px.shape
        ws[j], hs[j] = w, h
        q = (px >> 2).astype(np.uint8)
        digs.append(hashlib.md5(q.tobytes() + struct.pack("<HH", w, h)).hexdigest())
        phq.append(mean_phash((q << np.uint8(2)) + np.uint8(2)))
        dot, na2, nb2 = clip_towers(px, cap, tok_cache)
        dots[j] = dot
        keeps[j] = int(dot > 0 and 10000 * dot * dot >= tau2 * na2 * nb2)
    i = pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 4, 32), pa.int64())
    return pa.Table.from_pydict(
        {
            "i": i,
            "w": pa.array(ws, pa.int64()),
            "h": pa.array(hs, pa.int64()),
            "qdigest": pa.array(digs, pa.string()),
            "phash_q": pa.array(np.array(phq, dtype=np.uint64)),
            "dot": pa.array(dots, pa.int64()),
            "keep": pa.array(keeps, pa.int64()),
        }
    )


class ClipScoreStage:
    """Cross-modal alignment gate (the CLIP-score curation filter every
    image+caption corpus runs before training — LAION's keep/drop rule).

    The env has no ML runtime, so the two towers are deterministic integer
    stand-ins carrying the REAL pipeline shape: actor-pool batched decode,
    per-row embedding of both modalities, exact threshold filter.
    Image tower: centered block-row gray sums of the DECODED pixels —
    a_d = 8 * rowsum_d - total over the same floor-start 8-row partition as
    the block-mean hash (integer-exact, SQL-replayable from the generator
    CTEs). Text tower: per caption token, the 8 bytes of the token's
    md5_number_lower (DuckDB-compatible lower-64 md5), each centered by
    -128, summed over tokens. Keep iff cos(a, b) >= tau/100 with dot > 0,
    decided by the cross-multiplied square in PYTHON ints (dot^2 ~ 1e22
    exceeds int64; na2/nb2/dot themselves fit int64), so the oracle replays
    every keep bit in HUGEINT SQL.
    """

    def __init__(self, tau_centi: int = 5):
        self.tau2 = tau_centi * tau_centi

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = len(batch)
        dots = np.empty(n, dtype=np.int64)
        keeps = np.empty(n, dtype=np.int64)
        tok_cache: dict[str, np.ndarray] = {}
        for j, (data, fmt, cap) in enumerate(
            zip(
                batch["bytes"].to_pylist(),
                batch["fmt"].to_pylist(),
                batch["caption"].to_pylist(),
            )
        ):
            px = decode_any(data, fmt)
            dot, na2, nb2 = clip_towers(px, cap, tok_cache)
            dots[j] = dot
            keeps[j] = int(
                dot > 0 and 10000 * dot * dot >= self.tau2 * na2 * nb2
            )
        i = pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 4, 32), pa.int64())
        return pa.Table.from_pydict(
            {
                "i": i,
                "dot": pa.array(dots, pa.int64()),
                "keep": pa.array(keeps, pa.int64()),
            }
        )


def histogram_batch(batch: pa.Table, n_bins: int = 8) -> pa.Table:
    """Per-image luminance histogram: gray = r+g+b (0..765), bin = gray//96.

    The image-QA profiling kernel (exposure/contrast screening before
    training): one decode per row, one vectorized bincount — no shuffle at
    all, the histogram is image-local. Zero bins are omitted so the output
    matches the SQL GROUP BY exactly. Expects image_id/bytes/fmt columns.
    """
    import pyarrow.compute as pc

    ids = pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 4, 32), pa.int64()).to_numpy()
    i_out, b_out, n_out = [], [], []
    for k, (data, fmt) in enumerate(
        zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist())
    ):
        pix = decode_any(data, fmt)
        gray = pix.astype(np.int64).sum(axis=2)
        counts = np.bincount((gray // 96).ravel(), minlength=n_bins)
        nz = np.nonzero(counts)[0]
        i_out.extend([int(ids[k])] * len(nz))
        b_out.extend(nz.tolist())
        n_out.extend(counts[nz].tolist())
    return pa.Table.from_pydict(
        {
            "i": pa.array(i_out, pa.int64()),
            "bin": pa.array(b_out, pa.int64()),
            "n_px": pa.array(n_out, pa.int64()),
        }
    )
