"""WKT reader/writer for the numpy-backed geometry model.

Supports POINT/LINESTRING/POLYGON/MULTI*/GEOMETRYCOLLECTION with Z/M/ZM
dimension markers and EMPTY, matching the WKT corpus the reference test suite
uses (e.g. /root/reference/tests/test_centerline.py, test_simplify.py).
"""

from __future__ import annotations

import re

import numpy as np

from pygeoops_ray.geo import geom as g

__all__ = ["loads", "dumps"]

_TOKEN = re.compile(r"\s*([A-Za-z]+|\(|\)|,|[-+0-9.eE]+)")


class _Tokens:
    def __init__(self, text: str):
        self.toks = _TOKEN.findall(text)
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of WKT")
        self.i += 1
        return t

    def expect(self, tok: str):
        t = self.next()
        if t != tok:
            raise ValueError(f"expected {tok!r}, got {t!r}")


def loads(text: str) -> g.Geometry:
    """Parse a WKT string into a Geometry."""
    t = _Tokens(text)
    geom = _parse_geometry(t)
    return geom


def _parse_dims(t: _Tokens) -> tuple[bool, bool]:
    nxt = t.peek()
    if nxt is not None and nxt.upper() in ("Z", "M", "ZM"):
        t.next()
        u = nxt.upper()
        return ("Z" in u, "M" in u)
    return (False, False)


def _parse_coord_seq(t: _Tokens, ncols: int) -> np.ndarray:
    """Parse "( x y [z [m]], x y ..., ... )" into an (N, ncols) array."""
    t.expect("(")
    rows = []
    while True:
        row = []
        while True:
            nxt = t.peek()
            if nxt in (",", ")"):
                break
            row.append(float(t.next()))
        rows.append(row)
        nxt = t.next()
        if nxt == ")":
            break
        if nxt != ",":
            raise ValueError(f"unexpected token {nxt!r} in coordinate sequence")
    arr = np.array(rows, dtype=np.float64)
    if arr.ndim != 2:
        raise ValueError("inconsistent coordinate dimensions in WKT")
    return arr


def _parse_geometry(t: _Tokens) -> g.Geometry:
    geom, has_z, has_m = _parse_geometry_dims(t)
    if has_m and not has_z:
        g.set_m_only(geom)
    return geom


def _parse_geometry_dims(t: _Tokens) -> tuple[g.Geometry, bool, bool]:
    tag = t.next().upper()
    has_z, has_m = _parse_dims(t)
    return _parse_body(t, tag), has_z, has_m


def _parse_body(t: _Tokens, tag: str) -> g.Geometry:
    if t.peek() is not None and t.peek().upper() == "EMPTY":
        t.next()
        return {
            "POINT": g.Point,
            "LINESTRING": g.LineString,
            "POLYGON": g.Polygon,
            "MULTIPOINT": g.MultiPoint,
            "MULTILINESTRING": g.MultiLineString,
            "MULTIPOLYGON": g.MultiPolygon,
            "GEOMETRYCOLLECTION": g.GeometryCollection,
        }[tag]()

    if tag == "POINT":
        arr = _parse_coord_seq(t, 2)
        return g.Point(arr)
    if tag == "LINESTRING":
        return g.LineString(_parse_coord_seq(t, 2))
    if tag == "POLYGON":
        return g.Polygon(*_parse_rings(t))
    if tag == "MULTIPOINT":
        return _parse_multipoint(t)
    if tag == "MULTILINESTRING":
        t.expect("(")
        lines = []
        while True:
            lines.append(g.LineString(_parse_coord_seq(t, 2)))
            nxt = t.next()
            if nxt == ")":
                break
        return g.MultiLineString(lines)
    if tag == "MULTIPOLYGON":
        t.expect("(")
        polys = []
        while True:
            shell, holes = _parse_rings(t)
            polys.append(g.Polygon(shell, holes))
            nxt = t.next()
            if nxt == ")":
                break
        return g.MultiPolygon(polys)
    if tag == "GEOMETRYCOLLECTION":
        t.expect("(")
        geoms = []
        if t.peek() == ")":
            t.next()
            return g.GeometryCollection()
        while True:
            geoms.append(_parse_geometry(t))
            nxt = t.next()
            if nxt == ")":
                break
        return g.GeometryCollection(geoms)
    raise ValueError(f"unsupported WKT type: {tag}")


def _parse_rings(t: _Tokens) -> tuple[np.ndarray, list[np.ndarray]]:
    t.expect("(")
    rings = []
    while True:
        rings.append(_parse_coord_seq(t, 2))
        nxt = t.next()
        if nxt == ")":
            break
    return rings[0], rings[1:]


def _parse_multipoint(t: _Tokens) -> g.MultiPoint:
    t.expect("(")
    pts = []
    # Two syntaxes: MULTIPOINT((1 2), (3 4)) and MULTIPOINT(1 2, 3 4)
    if t.peek() == "(":
        while True:
            arr = _parse_coord_seq(t, 2)
            pts.append(g.Point(arr))
            nxt = t.next()
            if nxt == ")":
                break
    else:
        row = []
        while True:
            nxt = t.next()
            if nxt in (",", ")"):
                pts.append(g.Point(np.array([row], dtype=np.float64)))
                row = []
                if nxt == ")":
                    break
            else:
                row.append(float(nxt))
    return g.MultiPoint(pts)


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _fmt_num(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def _fmt_coords(arr: np.ndarray) -> str:
    return ", ".join(" ".join(_fmt_num(v) for v in row) for row in arr)


def _dims_tag(geom: g.Geometry) -> str:
    if geom.has_z and geom.has_m:
        return " ZM"
    if geom.has_m:
        return " M"
    if geom.has_z:
        return " Z"
    return ""


def dumps(geom: g.Geometry) -> str:
    tag_dims = _dims_tag(geom)
    name = geom.geom_type.upper()
    if geom.is_empty and not isinstance(geom, (g.GeometryCollection,)):
        return f"{name}{tag_dims} EMPTY"
    if isinstance(geom, g.Point):
        return f"POINT{tag_dims} ({_fmt_coords(geom.coords)})"
    if isinstance(geom, g.LineString):
        return f"LINESTRING{tag_dims} ({_fmt_coords(geom.coords)})"
    if isinstance(geom, g.Polygon):
        rings = ", ".join(f"({_fmt_coords(r)})" for r in geom.rings)
        return f"POLYGON{tag_dims} ({rings})"
    if isinstance(geom, g.MultiPoint):
        inner = ", ".join(f"({_fmt_coords(p.coords)})" for p in geom.geoms)
        return f"MULTIPOINT{tag_dims} ({inner})"
    if isinstance(geom, g.MultiLineString):
        inner = ", ".join(f"({_fmt_coords(ln.coords)})" for ln in geom.geoms)
        return f"MULTILINESTRING{tag_dims} ({inner})"
    if isinstance(geom, g.MultiPolygon):
        polys = []
        for p in geom.geoms:
            rings = ", ".join(f"({_fmt_coords(r)})" for r in p.rings)
            polys.append(f"({rings})")
        return f"MULTIPOLYGON{tag_dims} ({', '.join(polys)})"
    if isinstance(geom, g.GeometryCollection):
        if not geom.geoms:
            return "GEOMETRYCOLLECTION EMPTY"
        inner = ", ".join(dumps(p) for p in geom.geoms)
        return f"GEOMETRYCOLLECTION{tag_dims} ({inner})"
    raise ValueError(f"cannot serialize {type(geom)}")
