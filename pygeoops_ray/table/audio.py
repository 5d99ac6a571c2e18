"""Engine-owned audio codec + deterministic synthetic clip table.

Audio is an opaque ``binary`` column with typed metadata (the multimodal
contract from the brief / reference data model mapping in SURVEY §1.2). The
container ships no audio libraries, so the engine owns two toy-but-real PCM
codecs — ``pa8`` (raw int8 mono PCM) and ``paz1`` (zlib of the same) — the
way ``raw0``/``qz1`` own the image column: decode is real, deterministic, and
exact, so correctness invariants are integer-checkable end-to-end (the driver
oracle re-derives every sample in SQL).

Synthetic generator rule (pure integer arithmetic, SQL-reproducible):
  clip ordinal ``i``:
    n_samples = 4000 + (i * 13)  % 1000
    a         = 1    + (i * 7919) % 17        # sawtooth slope (odd-ish)
    b         = (i * 104729) % 256            # phase offset
    s[t]      = ((a * t + b) % 256) - 128     # int8 sample, t in [0, n)
    rate      = 8000 + 1000 * (i % 3)
    fmt       = "paz1" if i % 3 == 0 else "pa8"
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

AUDIO_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("bytes", pa.binary()),
        ("n", pa.int32()),
        ("rate", pa.int32()),
        ("fmt", pa.string()),
    ]
)

_MAGIC_PA8 = b"A8"
_MAGIC_PAZ1 = b"AZ"


def encode_audio(samples: np.ndarray, rate: int, fmt: str) -> bytes:
    """Encode mono int8 PCM with the named codec."""
    assert samples.dtype == np.int8 and samples.ndim == 1
    header = struct.pack("<II", len(samples), rate)
    if fmt == "pa8":
        return _MAGIC_PA8 + header + samples.tobytes()
    if fmt == "paz1":
        return _MAGIC_PAZ1 + header + zlib.compress(samples.tobytes(), 1)
    raise ValueError(f"unknown audio fmt: {fmt}")


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """Decode to (int8 sample array, sample rate)."""
    magic = data[:2]
    n, rate = struct.unpack("<II", data[2:10])
    if magic == _MAGIC_PA8:
        return np.frombuffer(data[10:], dtype=np.int8, count=n), rate
    if magic == _MAGIC_PAZ1:
        return np.frombuffer(zlib.decompress(data[10:]), dtype=np.int8, count=n), rate
    raise ValueError(f"unknown audio magic: {magic!r}")


def synth_samples(i: int) -> np.ndarray:
    """Deterministic int8 sample array for clip ordinal ``i`` (see module doc)."""
    n = 4000 + (i * 13) % 1000
    a = 1 + (i * 7919) % 17
    b = (i * 104729) % 256
    t = np.arange(n, dtype=np.int64)
    return (((a * t + b) % 256) - 128).astype(np.int8)


def clip_meta(i: int) -> tuple[int, str]:
    rate = 8000 + 1000 * (i % 3)
    fmt = "paz1" if i % 3 == 0 else "pa8"
    return rate, fmt


def generate_audio_for_ordinals(ordinals: np.ndarray) -> pa.Table:
    """Build AUDIO_SCHEMA rows for the given clip ordinals (vectorized where
    the math allows; encode is per-clip — variable length)."""
    ids, blobs, ns, rates, fmts = [], [], [], [], []
    for i in map(int, ordinals):
        s = synth_samples(i)
        rate, fmt = clip_meta(i)
        ids.append(f"clip_{i:010d}")
        blobs.append(encode_audio(s, rate, fmt))
        ns.append(len(s))
        rates.append(rate)
        fmts.append(fmt)
    return pa.Table.from_pydict(
        {
            "clip_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "n": pa.array(ns, pa.int32()),
            "rate": pa.array(rates, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
        },
        schema=AUDIO_SCHEMA,
    )


def resample_nearest(samples: np.ndarray, rate_in: int, rate_out: int) -> np.ndarray:
    """Nearest-sample resample (pure integer index math; deterministic).

    Output length n_out = ceil(n_in * rate_out / rate_in); output sample k
    maps to input index floor(k * rate_in / rate_out) — exact in int64, so
    the oracle can reproduce it with integer division.
    """
    n_in = len(samples)
    n_out = -((-n_in * rate_out) // rate_in)  # ceil div
    idx = (np.arange(n_out, dtype=np.int64) * rate_in) // rate_out
    return samples[idx]
