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
    """Actor-pool stage shape for video frame sampling — STUB.

    The schema contract is real: input (bytes, fmt='video/...', meta), output
    one row per sampled frame with (frame_idx, bytes, w, h, fmt). Decoding
    needs ffmpeg, absent here.
    """

    def __init__(self, every_n: int = 30):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts = set(batch["fmt"].to_pylist())
        raise NotImplementedError(
            f"video frame sampling for {sorted(fmts)} needs ffmpeg, which this "
            "container does not ship; the stage contract (1→k rows of "
            "(frame_idx:int64, bytes:binary, w:int32, h:int32, fmt:string)) is "
            "what a real decoder must produce"
        )
