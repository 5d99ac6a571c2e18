"""ISO WKB reader/writer (little-endian) for Arrow binary geometry columns.

Geometry columns at rest are ``binary`` WKB (SURVEY.md §1.2); this codec is the
bridge between Arrow batches and the numpy geometry model. Z/M/ZM use the ISO
type-id offsets (+1000/+2000/+3000), matching the reference's id space
(/root/reference/pygeoops/_types.py:7-52).
"""

from __future__ import annotations

import struct

import numpy as np

from pygeoops_ray.geo import geom as g

__all__ = ["loads", "dumps"]

_HDR = struct.Struct("<BI")


def _dim_count(has_z: bool, has_m: bool) -> int:
    return 2 + (1 if has_z else 0) + (1 if has_m else 0)


def dumps(geom: g.Geometry | None) -> bytes | None:
    if geom is None:
        return None
    out = bytearray()
    _write(geom, out)
    return bytes(out)


def _type_code(geom: g.Geometry) -> int:
    code = geom.type_id
    if geom.has_z:
        code += 1000
    if geom.has_m:
        code += 2000
    return code


def _write(geom: g.Geometry, out: bytearray) -> None:
    out += _HDR.pack(1, _type_code(geom))
    hz, hm = geom.has_z, geom.has_m
    nd = _dim_count(hz, hm)
    if isinstance(geom, g.Point):
        if geom.is_empty:
            out += struct.pack(f"<{nd}d", *([float("nan")] * nd))
        else:
            out += geom.coords[0, :nd].astype("<f8").tobytes()
    elif isinstance(geom, g.LineString):
        _write_seq(geom.coords, nd, out)
    elif isinstance(geom, g.Polygon):
        rings = geom.rings
        out += struct.pack("<I", len(rings))
        for r in rings:
            _write_seq(r, nd, out)
    elif isinstance(geom, (g.MultiPoint, g.MultiLineString, g.MultiPolygon, g.GeometryCollection)):
        out += struct.pack("<I", len(geom.geoms))
        for p in geom.geoms:
            _write(p, out)
    else:
        raise ValueError(f"cannot WKB-serialize {type(geom)}")


def _write_seq(arr: np.ndarray, nd: int, out: bytearray) -> None:
    out += struct.pack("<I", len(arr))
    if len(arr):
        a = arr[:, :nd]
        if a.shape[1] < nd:
            pad = np.full((len(a), nd - a.shape[1]), np.nan)
            a = np.concatenate([a, pad], axis=1)
        out += np.ascontiguousarray(a, dtype="<f8").tobytes()


def loads(data: bytes | None) -> g.Geometry | None:
    if data is None:
        return None
    geom, _ = _read(memoryview(data), 0)
    code = struct.unpack_from("<I" if data[0] == 1 else ">I", data, 1)[0]
    if code // 1000 == 2:  # M-only variant: reinterpret the 3rd column
        g.set_m_only(geom)
    return geom


def _read(buf: memoryview, off: int) -> tuple[g.Geometry, int]:
    endian = buf[off]
    fmt = "<" if endian == 1 else ">"
    (code,) = struct.unpack_from(f"{fmt}I", buf, off + 1)
    off += 5
    base = code % 1000
    flags = code // 1000
    hz = flags in (1, 3)
    hm = flags in (2, 3)
    nd = _dim_count(hz, hm)

    if base == 1:
        vals = struct.unpack_from(f"{fmt}{nd}d", buf, off)
        off += 8 * nd
        if any(v != v for v in vals[:2]):  # NaN → empty point
            return g.Point(), off
        return g.Point(np.array([vals], dtype=np.float64)), off
    if base == 2:
        arr, off = _read_seq(buf, off, fmt, nd)
        return g.LineString(arr), off
    if base == 3:
        (nrings,) = struct.unpack_from(f"{fmt}I", buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            arr, off = _read_seq(buf, off, fmt, nd)
            rings.append(arr)
        if not rings:
            return g.Polygon(), off
        return g.Polygon(rings[0], rings[1:]), off
    if base in (4, 5, 6, 7):
        (nparts,) = struct.unpack_from(f"{fmt}I", buf, off)
        off += 4
        parts = []
        for _ in range(nparts):
            p, off = _read(buf, off)
            parts.append(p)
        cls = {4: g.MultiPoint, 5: g.MultiLineString, 6: g.MultiPolygon, 7: g.GeometryCollection}[base]
        return cls(parts), off
    raise ValueError(f"unsupported WKB type code {code}")


def _read_seq(buf: memoryview, off: int, fmt: str, nd: int) -> tuple[np.ndarray, int]:
    (n,) = struct.unpack_from(f"{fmt}I", buf, off)
    off += 4
    nbytes = 8 * nd * n
    arr = np.frombuffer(buf[off : off + nbytes], dtype=f"{fmt}f8").reshape(n, nd).astype(np.float64)
    return arr, off + nbytes
