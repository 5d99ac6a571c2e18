"""The Lance-style image+caption table: codecs, phash, synthetic generator.

Authoritative schema (BASELINE.json input_hint):
    image_id:string  bytes:binary  w:int32  h:int32  fmt:string
    caption:string   phash:int64

Codecs are engine-owned (no PIL in the environment):
  - ``raw0``: lossless — zlib-compressed raw RGB (h, w, 3) uint8.
  - ``qz1``:  lossy — 6-bit uniform quantization per channel + zlib. Decode
    maps bin q to q*4+2, so |error| <= 2 → MSE <= 1.5 → PSNR >= 46 dB,
    satisfying the >= 40 dB per-row invariant.

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
    "psnr",
    "synth_pixels",
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
_MAGIC_QZ1 = b"Q1"


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w, 3) uint8 array with the named codec."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    header = struct.pack("<HH", w, h)
    if fmt == "raw0":
        return _MAGIC_RAW0 + header + zlib.compress(pixels.tobytes(), 1)
    if fmt == "qz1":
        q = (pixels >> 2).astype(np.uint8)
        return _MAGIC_QZ1 + header + zlib.compress(q.tobytes(), 1)
    raise ValueError(f"unknown image fmt: {fmt}")


def decode_image(data: bytes) -> np.ndarray:
    """Decode to an (h, w, 3) uint8 array."""
    magic, (w, h) = data[:2], struct.unpack("<HH", data[2:6])
    raw = zlib.decompress(data[6:])
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    if magic == _MAGIC_RAW0:
        return arr
    if magic == _MAGIC_QZ1:
        # stored values are 6-bit (<=63): v*4+2 <= 254 never wraps, so pure
        # uint8 arithmetic — no widen/clip/narrow passes
        return arr * np.uint8(4) + np.uint8(2)
    raise ValueError(f"unknown image magic: {magic!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    # exact sum-of-squares via a float64 dot: every |diff| <= 255 so each
    # partial sum is an integer < 2^53 — bit-exact regardless of summation
    # order, and ~5x cheaper than the float64 mean-of-squares path
    d = np.subtract(a, b, dtype=np.int16).ravel().astype(np.float64)
    total = d.dot(d)
    if total == 0:
        return float("inf")
    mse = total / d.size
    return 10.0 * np.log10(255.0**2 / mse)


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
    uint32 grayscale materialization (~3x on the whole hash).
    """
    h, w, _ = pixels.shape
    ys, xs, areas = _phash_geom(h, w)
    rows = np.add.reduceat(pixels, ys, axis=0, dtype=np.uint32)  # (8, w, 3)
    blocks = np.add.reduceat(rows, xs, axis=1).sum(axis=2) / areas
    bits = (blocks > blocks.mean()).flatten()
    v = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return int(np.int64(np.uint64(v)))  # reinterpret as signed for Arrow int64


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
    out = np.empty((h, w, 3), np.uint8)
    # per-channel 2D broadcast beats one 3D broadcast with innermost dim 3
    for c in range(3):
        np.add(rg[c][:, None], cg[c][None, :], out=out[:, :, c])
    out += offs
    return out


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
