"""Engine-owned video container + deterministic synthetic video table.

Video is an opaque ``binary`` column with typed metadata. No ffmpeg ships in
the container, so foreign codecs stay stubbed (``stages/multimodal.py``), but
the engine owns a real container format — ``vz1`` — so the frame-sampling
stage's Ray plumbing runs end-to-end against real bytes:

  ``b"VZ1\\0"`` + ``<HHHH`` (n_frames, w, h, fps)
  + ``<I`` * (n_frames+1) frame byte offsets (relative to payload start)
  + concatenated self-contained qz1-encoded frames (table/images.py codec)

The offset table is the scale-critical part: sampling frame ``j`` is a pure
byte-range slice — unsampled frames are never decompressed, so a 10-minute
clip costs only the sampled frames' decode. On a real format the same shape
holds (keyframe/atom index instead of our offset table).

Synthetic generator rule (pure integer arithmetic, SQL-reproducible):
  video ordinal ``v``:
    n_frames = 16 + (v * 7)  % 17
    w        = 16 + (v * 37) % 33
    h        = 16 + (v * 53) % 29
    frame j pixel (y, x):                     # before qz1 quantization
      p0 = (y*3 + x*5  + (v*11 + j*17) % 256) % 256
      p1 = (y*7 + x*2  + (v*23 + j*29) % 256) % 256
      p2 = (y*1 + x*11 + (v*31 + j*41) % 256) % 256
    qz1 decode re-quantizes: d = p - p%4 + 2  (exact in SQL)
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from pygeoops_ray.table import images as I

VIDEO_SCHEMA = pa.schema(
    [
        ("video_id", pa.string()),
        ("bytes", pa.binary()),
        ("n_frames", pa.int32()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fps", pa.int32()),
        ("fmt", pa.string()),
    ]
)

_MAGIC = b"VZ1\x00"


def video_meta(v: int) -> tuple[int, int, int]:
    """(n_frames, w, h) for video ordinal v."""
    return 16 + (v * 7) % 17, 16 + (v * 37) % 33, 16 + (v * 53) % 29


def synth_frame(v: int, j: int, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 frame j of video v (see module doc)."""
    y = np.arange(h, dtype=np.int64)[:, None]
    x = np.arange(w, dtype=np.int64)[None, :]
    pix = np.empty((h, w, 3), np.uint8)
    pix[..., 0] = (y * 3 + x * 5 + (v * 11 + j * 17) % 256) % 256
    pix[..., 1] = (y * 7 + x * 2 + (v * 23 + j * 29) % 256) % 256
    pix[..., 2] = (y * 1 + x * 11 + (v * 31 + j * 41) % 256) % 256
    return pix


def encode_video(frames: list[bytes], w: int, h: int, fps: int) -> bytes:
    """Assemble self-contained encoded frames into a vz1 container."""
    n = len(frames)
    offs = np.zeros(n + 1, np.uint32)
    np.cumsum([len(f) for f in frames], out=offs[1:])
    head = _MAGIC + struct.pack("<HHHH", n, w, h, fps)
    return head + offs.tobytes() + b"".join(frames)


def parse_header(data: bytes) -> tuple[int, int, int, int, np.ndarray, int]:
    """(n_frames, w, h, fps, offsets, payload_start) without touching frames."""
    if data[:4] != _MAGIC:
        raise ValueError(f"unknown video magic: {data[:4]!r}")
    n, w, h, fps = struct.unpack("<HHHH", data[4:12])
    off_end = 12 + 4 * (n + 1)
    offs = np.frombuffer(data[12:off_end], dtype=np.uint32)
    return n, w, h, fps, offs, off_end


def frame_bytes(data: bytes, j: int) -> bytes:
    """Zero-decode slice of frame j's self-contained encoded payload."""
    n, _, _, _, offs, start = parse_header(data)
    if not 0 <= j < n:
        raise IndexError(f"frame {j} of {n}")
    return data[start + int(offs[j]) : start + int(offs[j + 1])]


def synth_video(v: int, fps: int = 8) -> bytes:
    nf, w, h = video_meta(v)
    frames = [I.encode_image(synth_frame(v, j, w, h), "qz1") for j in range(nf)]
    return encode_video(frames, w, h, fps)


def generate_videos_for_ordinals(ordinals: np.ndarray) -> pa.Table:
    ids, blobs, nfs, ws, hs = [], [], [], [], []
    for v in map(int, ordinals):
        nf, w, h = video_meta(v)
        ids.append(f"vid_{v:010d}")
        blobs.append(synth_video(v))
        nfs.append(nf)
        ws.append(w)
        hs.append(h)
    return pa.Table.from_pydict(
        {
            "video_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "n_frames": pa.array(nfs, pa.int32()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fps": pa.array([8] * len(ids), pa.int32()),
            "fmt": pa.array(["vz1"] * len(ids), pa.string()),
        },
        schema=VIDEO_SCHEMA,
    )
