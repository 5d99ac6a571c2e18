"""The Lance-style image+caption table: codecs, phash, synthetic generator.

Authoritative schema (BASELINE.json input_hint):
    image_id:string  bytes:binary  w:int32  h:int32  fmt:string
    caption:string   phash:int64

Codecs are engine-owned (no PIL in the environment):
  - ``raw0``: lossless — zlib-compressed raw RGB (h, w, 3) uint8.
  - ``qz1``:  lossy — 6-bit uniform quantization per channel, four values
    bit-packed into three bytes, + zlib. Decode maps bin q to q*4+2, so
    |error| <= 2 → MSE <= 1.5 → PSNR >= 46 dB, satisfying the >= 40 dB
    per-row invariant. (The original unpacked layout, magic ``Q1``, kept
    byte-per-value quantized planes whose broken LZ matches made zlib
    inflate ~13x slower than raw0's effectively-stored stream; the packed
    layout is both 25% smaller and stored-mode fast. ``Q1`` payloads still
    decode — the quantized PIXELS and every digest over them are unchanged.)

Georeference rule (FIXTURES.md §1): image ordinal i sits at grid
col = i % 1000, row = i // 1000 on a world plane with W0 = H0 = 256 world
units per slot; its footprint rect is [col*W0, row*H0, col*W0 + w, row*H0 + h].
Footprints, tile assignment and joins are pure functions of (i, w, h) — which
keeps the DuckDB oracle exact.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

__all__ = [
    "encode_image",
    "decode_image",
    "mean_phash",
    "mean_phash_batch",
    "psnr",
    "synth_pixels",
    "synth_pixels_batch",
    "generate_images_table",
    "write_images_parquet",
    "IMAGES_SCHEMA",
    "W0",
    "H0",
    "GRID_COLS",
    "footprint_of_ordinal",
]

W0 = 256.0  # world units per grid slot (x)
H0 = 256.0  # world units per grid slot (y)
GRID_COLS = 1000  # images per world row

IMAGES_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

_MAGIC_RAW0 = b"R0"
_MAGIC_QZ1 = b"Q1"  # legacy unpacked 6-bit layout (decode-only)
_MAGIC_QZ2 = b"Q2"  # packed 6-bit layout (current encoder output)


def _pack6(q: np.ndarray) -> bytes:
    """Bit-pack 6-bit values (flat uint8 array, each <= 63): 4 values -> 3 bytes."""
    n = q.size
    pad = (-n) % 4
    if pad:
        q = np.concatenate([q.ravel(), np.zeros(pad, np.uint8)])
    g = q.reshape(-1, 4)
    out = np.empty((len(g), 3), np.uint8)
    out[:, 0] = (g[:, 0] << 2) | (g[:, 1] >> 4)
    out[:, 1] = (g[:, 1] << 4) | (g[:, 2] >> 2)
    out[:, 2] = (g[:, 2] << 6) | g[:, 3]
    return out.tobytes()


def _unpack6(raw: bytes, n: int) -> np.ndarray:
    """Inverse of _pack6: first n 6-bit values as a flat uint8 array."""
    return _unpack6_nd(np.frombuffer(raw, dtype=np.uint8).reshape(1, -1), n)[0]


def _unpack6_nd(packed: np.ndarray, n: int) -> np.ndarray:
    """Vectorized _pack6 inverse over a (k, nbytes) stack -> (k, n) uint8."""
    b = packed.reshape(len(packed), -1, 3)
    g = np.empty((len(packed), b.shape[1], 4), np.uint8)
    g[..., 0] = b[..., 0] >> 2
    g[..., 1] = ((b[..., 0] & 3) << 4) | (b[..., 1] >> 4)
    g[..., 2] = ((b[..., 1] & 15) << 2) | (b[..., 2] >> 6)
    g[..., 3] = b[..., 2] & 63
    return g.reshape(len(packed), -1)[:, :n]


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w, 3) uint8 array with the named codec."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    header = struct.pack("<HH", w, h)
    if fmt == "raw0":
        return _MAGIC_RAW0 + header + zlib.compress(pixels.tobytes(), 1)
    if fmt == "qz1":
        q = (pixels >> 2).astype(np.uint8)
        return _MAGIC_QZ2 + header + zlib.compress(_pack6(q), 1)
    raise ValueError(f"unknown image fmt: {fmt}")


def decode_image(data: bytes) -> np.ndarray:
    """Decode to an (h, w, 3) uint8 array."""
    magic, (w, h) = data[:2], struct.unpack("<HH", data[2:6])
    raw = zlib.decompress(data[6:])
    if magic == _MAGIC_RAW0:
        return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    if magic == _MAGIC_QZ2:
        q = _unpack6(raw, h * w * 3).reshape(h, w, 3)
        # values are 6-bit (<=63): v*4+2 <= 254 never wraps — pure uint8
        q <<= 2
        q += np.uint8(2)
        return q
    if magic == _MAGIC_QZ1:
        arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
        return arr * np.uint8(4) + np.uint8(2)
    raise ValueError(f"unknown image magic: {magic!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    # exact sum-of-squares via a float32 dot: all summands are non-negative
    # integers, so while the true total stays < 2^24 every pairwise partial
    # sum is an exact integer; and once any partial exceeds 2^24 the rounded
    # running sum can never drop back below it (nonneg adds, round-to-
    # nearest), so `total >= 2^24` reliably detects the maybe-inexact case
    # and falls back to the (always exact, <2^53) float64 dot. The float32
    # path halves the bytes touched on this bandwidth-throttled box.
    d = np.subtract(a, b, dtype=np.int16).ravel().astype(np.float32)
    total = float(d.dot(d))
    if total >= 2**24:
        d64 = d.astype(np.float64)
        total = d64.dot(d64)
    if total == 0:
        return float("inf")
    mse = total / d.size
    return 10.0 * np.log10(255.0**2 / mse)


def int_mean_hash(pixels: np.ndarray) -> int:
    """64-bit integer-exact block-mean hash (the SQL-replayable phash).

    Bit (r, c) is set iff the 8x8 block's gray SUM times the image pixel
    count exceeds the image gray sum times the block pixel count — the
    cross-multiplied form of "block mean > image mean" with no float
    division, so every comparison is exact int64 arithmetic and the hash is
    bit-reproducible in integer SQL (the phash_near_dup oracle re-derives it
    from the generator rule). Gray = r+g+b; blocks partition rows/columns by
    the same floor starts as ``_phash_geom`` (pixel y is in block
    (8y+7)//h). Differs from ``mean_phash`` only in the threshold (image
    mean, not mean-of-block-means) — chosen precisely because it has an
    exact integer form.
    """
    h, w, _ = pixels.shape
    ys, xs, _ = _phash_geom(h, w)
    rows = np.add.reduceat(
        pixels.reshape(h, w * 3), ys, axis=0, dtype=np.int64
    )  # (8, w*3)
    blocks = np.add.reduceat(rows, 3 * xs, axis=1)  # (8, 8) gray block sums
    ye = np.append(ys[1:], h)
    xe = np.append(xs[1:], w)
    areas = np.outer(ye - ys, xe - xs).astype(np.int64)
    bits = (blocks * (h * w) > blocks.sum() * areas).flatten()
    v = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return int(np.uint64(v).astype(np.int64))


_PHASH_GEOM: dict[tuple[int, int], tuple] = {}


def _phash_geom(h: int, w: int):
    geom = _PHASH_GEOM.get((h, w))
    if geom is None:
        ys = (np.arange(8) * h) // 8
        xs = (np.arange(8) * w) // 8
        ye = np.append(ys[1:], h)
        xe = np.append(xs[1:], w)
        areas = np.maximum(np.outer(ye - ys, xe - xs), 1).astype(np.float64)
        geom = (ys, xs, areas)
        _PHASH_GEOM[(h, w)] = geom
    return geom


def mean_phash(pixels: np.ndarray) -> int:
    """64-bit mean hash: 8x8 block-mean grayscale thresholded at its mean.

    Channel sum happens LAST (on the 8x8x3 block sums, not per pixel): the
    row reduceat reads the uint8 array directly, skipping the full-size
    uint32 grayscale materialization (~3x on the whole hash). A float32
    one-hot-matmul variant measured 1.7x faster cache-hot but 2x SLOWER in
    the realistic cache-cold stream (its astype triples the bytes touched on
    this bandwidth-throttled box) — reduceat reads each byte exactly once.
    """
    h, w, _ = pixels.shape
    ys, xs, areas = _phash_geom(h, w)
    rows = np.add.reduceat(
        pixels.reshape(h, w * 3), ys, axis=0, dtype=np.uint32
    )  # (8, w*3)
    # channel sum fused into the column reduceat (see mean_phash_batch)
    blocks = np.add.reduceat(rows, 3 * xs, axis=1) / areas
    bits = (blocks > blocks.mean()).flatten()
    v = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return int(np.int64(np.uint64(v)))  # reinterpret as signed for Arrow int64


def mean_phash_batch(stack: np.ndarray) -> np.ndarray:
    """``mean_phash`` over a (g, h, w, 3) same-size stack; returns (g,) int64.

    Bit-identical to the scalar loop: both reduceats run on 2D views (the 4D
    reduceat goes through numpy's buffered iterator, ~4x slower), and the
    per-image mean reduces the same contiguous 64 float64 values with the
    same pairwise order (verified element-wise in tests). Amortizes the ~10
    numpy-call overheads across the stack — the scalar path is
    per-call-bound at small image sizes.
    """
    g, h, w, _ = stack.shape
    ys, xs, areas = _phash_geom(h, w)
    # row blocks: one 2D reduceat over (g*h, w*3) with per-image offsets
    off = (np.arange(g, dtype=np.intp)[:, None] * h + ys[None, :]).ravel()
    rows = np.add.reduceat(
        stack.reshape(g * h, w * 3), off, axis=0, dtype=np.uint32
    )  # (g*8, w*3)
    # column blocks WITH the channel sum fused in: segment [3*xs[b], 3*xs[b+1])
    # of the channel-interleaved row covers every channel of the block's
    # columns, so one reduceat yields the channel-summed block directly
    blocks = np.add.reduceat(rows, 3 * xs, axis=1).reshape(g, 8, 8) / areas
    flat = blocks.reshape(g, 64)
    bits = flat > flat.mean(axis=1)[:, None]
    pb = np.packbits(bits, axis=1)  # (g, 8) big-endian bytes
    return pb.view(">u8")[:, 0].astype(np.uint64).view(np.int64)


def synth_pixels_batch(ordinals: np.ndarray, w: int, h: int) -> np.ndarray:
    """``synth_pixels`` for many ordinals of one size; returns (g, h, w, 3).

    Bit-identical: same cached per-axis gradients, same uint8 wrap-around
    (mod-256) combine, with the per-ordinal hash offsets broadcast over one
    extra axis.
    """
    seeds = _splitmix64(np.asarray(ordinals, dtype=np.uint64))
    offs = np.stack(
        [
            seeds & np.uint64(0xFF),
            (seeds >> np.uint64(8)) & np.uint64(0xFF),
            (seeds >> np.uint64(16)) & np.uint64(0xFF),
        ],
        axis=1,
    ).astype(np.uint8)  # (g, 3)
    base = _grad_base(w, h)  # (h, w, 3) offset-free gradient plane
    out = base[None, :, :, :] + offs[:, None, None, :]
    return out


def _splitmix64(x: np.ndarray | int) -> np.ndarray | int:
    """Deterministic 64-bit mix (public splitmix64 constants)."""
    with np.errstate(over="ignore"):
        z = (np.uint64(x) + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


_ROW_GRAD: dict[int, np.ndarray] = {}
_COL_GRAD: dict[int, np.ndarray] = {}


def synth_pixels(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) test pattern for image ordinal i: gradient + hash offsets.

    Bit-identical to the original definition ((rows*[3,7,1] + cols*[5,2,11]
    + offs) % 256 per channel): the per-axis gradients are pre-reduced mod
    256 and cached by h / w (only ~151 / ~193 distinct values each), and the
    final (h, w, 3) combine is a single uint8 broadcast add — wrap-around
    uint8 addition IS mod-256.
    """
    with np.errstate(over="ignore"):
        seed = _splitmix64(np.uint64(i))
    offs = np.array(
        [
            int(seed & np.uint64(0xFF)),
            int((seed >> np.uint64(8)) & np.uint64(0xFF)),
            int((seed >> np.uint64(16)) & np.uint64(0xFF)),
        ],
        dtype=np.uint8,
    )
    base = _grad_base(w, h)
    if base.flags.writeable:  # fresh (uncached) plane: add in place
        base += offs
        return base
    return base + offs  # cached read-only plane stays pristine


_BASE_CACHE: dict[tuple[int, int], np.ndarray] = {}


def _grad_base(w: int, h: int) -> np.ndarray:
    """Offset-free (h, w, 3) gradient plane (rows*[3,7,1] + cols*[5,2,11],
    all mod 256). Small planes are cached READ-ONLY (the small-profile dim
    cycle is 2009 combos x ~5 KB ~ 10 MB per worker); large planes are
    rebuilt per call (the big-profile cycle would hold ~2 GB)."""
    key = (h, w)
    cached = _BASE_CACHE.get(key)
    if cached is not None:
        return cached
    rg = _ROW_GRAD.get(h)
    if rg is None:
        rg = np.ascontiguousarray(
            (np.arange(h, dtype=np.int64)[:, None] * np.array([3, 7, 1]) % 256)
            .astype(np.uint8)
            .T
        )  # (3, h)
        _ROW_GRAD[h] = rg
    cg = _COL_GRAD.get(w)
    if cg is None:
        cg = np.ascontiguousarray(
            (np.arange(w, dtype=np.int64)[:, None] * np.array([5, 2, 11]) % 256)
            .astype(np.uint8)
            .T
        )  # (3, w)
        _COL_GRAD[w] = cg
    # one contiguous (h, w, 3) broadcast add over TRANSPOSED VIEWS of the
    # channel-first caches: measured 15 us vs 220 (per-channel stride-3
    # writes) vs 340 (same broadcast from channel-last contiguous inputs) —
    # the (1, h)/(1, w)-strided views are the layout numpy's iterator turns
    # into a single fast contiguous-output pass on this box
    base = rg.T[:, None, :] + cg.T[None, :, :]
    if base.nbytes <= 16384 and len(_BASE_CACHE) < 8192:
        base.setflags(write=False)
        _BASE_CACHE[key] = base
    return base


_CAPTION_WORDS = (
    "tile grid cell river field road house tree cloud shadow rock water "
    "bridge tower farm forest lake coast dune track"
).split()


def _row_dims(i: int, small: bool) -> tuple[int, int]:
    if small:
        return 16 + (i * 37) % 49, 16 + (i * 53) % 41
    return 64 + (i * 37) % 193, 64 + (i * 53) % 151


def _row_fmt(i: int) -> str:
    return "raw0" if i % 3 else "qz1"


def caption_of(i: int) -> str:
    ws = [_CAPTION_WORDS[(i * (k + 3) + k) % len(_CAPTION_WORDS)] for k in range(5)]
    return f"caption {i} " + " ".join(ws)


def footprint_of_ordinal(i, w, h):
    """Vectorized footprint rect(s) of image ordinal(s): (minx, miny, maxx, maxy)."""
    i = np.asarray(i, dtype=np.int64)
    col = i % GRID_COLS
    row = i // GRID_COLS
    minx = col.astype(np.float64) * W0
    miny = row.astype(np.float64) * H0
    return minx, miny, minx + np.asarray(w, dtype=np.float64), miny + np.asarray(h, dtype=np.float64)


def generate_images_for_ordinals(ordinals, small: bool = False) -> pa.Table:
    """Deterministic image rows for arbitrary ordinals (order-free → Ray-parallel).

    Ordinal i with i%101==0 (i>0) reuses the pixels of i-1 — the injected
    exact-duplicate fixture for phash dedup. Pixels are a pure function of the
    ordinal, so any partition of the ordinal space generates identical rows.
    """
    ids, datas, ws, hs, fmts, caps, hashes = [], [], [], [], [], [], []
    for i in ordinals:
        i = int(i)
        fmt = _row_fmt(i)
        if i % 101 == 0 and i > 0:
            src = i - 1  # duplicate of the previous ordinal's pixels
            w, h = _row_dims(src, small)
            pix = synth_pixels(src, w, h)
        else:
            w, h = _row_dims(i, small)
            pix = synth_pixels(i, w, h)
        ids.append(f"img_{i:012d}")
        datas.append(encode_image(pix, fmt))
        ws.append(w)
        hs.append(h)
        fmts.append(fmt)
        caps.append(caption_of(i))
        # phash of the DECODED pixels without paying a decompress round-trip:
        # raw0 decodes to pix itself; qz1 decode is a pure function of pix.
        decoded = pix if fmt == "raw0" else ((pix >> 2).astype(np.uint16) * 4 + 2).astype(np.uint8)
        hashes.append(mean_phash(decoded))
    return pa.Table.from_pydict(
        {
            "image_id": ids,
            "bytes": datas,
            "w": np.array(ws, dtype=np.int32),
            "h": np.array(hs, dtype=np.int32),
            "fmt": fmts,
            "caption": caps,
            "phash": np.array(hashes, dtype=np.int64),
        },
        schema=IMAGES_SCHEMA,
    )


def generate_images_batch(start: int, count: int, small: bool = False) -> pa.Table:
    return generate_images_for_ordinals(range(start, start + count), small=small)


def generate_images_table(n: int, small: bool = False) -> pa.Table:
    return generate_images_batch(0, n, small=small)


def write_images_parquet(path: str, n: int, small: bool = False, chunk: int = 10_000) -> str:
    """Write the synthetic table to one parquet file in chunks; returns path."""
    import pyarrow.parquet as pq

    writer = pq.ParquetWriter(path, IMAGES_SCHEMA)
    try:
        for start in range(0, n, chunk):
            writer.write_table(generate_images_batch(start, min(chunk, n - start), small=small))
    finally:
        writer.close()
    return path
