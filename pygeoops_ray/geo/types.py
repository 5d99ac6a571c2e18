"""Geometry type system: ISO WKB ids incl. Z/M/ZM variants.

Re-expresses the reference's type enums (see /root/reference/pygeoops/_types.py:7-239)
with the same id space and conversion properties, as pure Python (no shapely).
"""

from __future__ import annotations

import enum
import math


class PrimitiveType(enum.Enum):
    """Primitive (dimension) type of a geometry: 0=any, 1=point, 2=line, 3=polygon."""

    GEOMETRY = 0
    POINT = 1
    LINESTRING = 2
    POLYGON = 3

    @classmethod
    def _missing_(cls, value):
        if isinstance(value, str):
            return cls(PrimitiveType[value.upper()])
        return super()._missing_(value)

    @property
    def dimensions(self) -> int:
        if self is PrimitiveType.POINT:
            return 0
        if self is PrimitiveType.LINESTRING:
            return 1
        if self is PrimitiveType.POLYGON:
            return 2
        raise ValueError(f"no dimensions implemented for {self}")

    @property
    def to_multitype(self) -> "GeometryType":
        return {
            PrimitiveType.POINT: GeometryType.MULTIPOINT,
            PrimitiveType.LINESTRING: GeometryType.MULTILINESTRING,
            PrimitiveType.POLYGON: GeometryType.MULTIPOLYGON,
            PrimitiveType.GEOMETRY: GeometryType.GEOMETRYCOLLECTION,
        }[self]

    @property
    def to_singletype(self) -> "GeometryType":
        return {
            PrimitiveType.POINT: GeometryType.POINT,
            PrimitiveType.LINESTRING: GeometryType.LINESTRING,
            PrimitiveType.POLYGON: GeometryType.POLYGON,
            PrimitiveType.GEOMETRY: GeometryType.GEOMETRY,
        }[self]


class GeometryType(enum.Enum):
    """ISO WKB geometry type ids, incl. Z (1000), M (2000) and ZM (3000) offsets."""

    MISSING = -1
    GEOMETRY = 0
    POINT = 1
    LINESTRING = 2
    POLYGON = 3
    MULTIPOINT = 4
    MULTILINESTRING = 5
    MULTIPOLYGON = 6
    GEOMETRYCOLLECTION = 7
    POLYHEDRALSURFACE = 15
    TIN = 16
    TRIANGLE = 17
    POINTZ = 1001
    LINESTRINGZ = 1002
    POLYGONZ = 1003
    MULTIPOINTZ = 1004
    MULTILINESTRINGZ = 1005
    MULTIPOLYGONZ = 1006
    GEOMETRYCOLLECTIONZ = 1007
    POLYHEDRALSURFACEZ = 1015
    TINZ = 1016
    TRIANGLEZ = 1017
    POINTM = 2001
    LINESTRINGM = 2002
    POLYGONM = 2003
    MULTIPOINTM = 2004
    MULTILINESTRINGM = 2005
    MULTIPOLYGONM = 2006
    GEOMETRYCOLLECTIONM = 2007
    POLYHEDRALSURFACEM = 2015
    TINM = 2016
    TRIANGLEM = 2017
    POINTZM = 3001
    LINESTRINGZM = 3002
    POLYGONZM = 3003
    MULTIPOINTZM = 3004
    MULTILINESTRINGZM = 3005
    MULTIPOLYGONZM = 3006
    GEOMETRYCOLLECTIONZM = 3007
    POLYHEDRALSURFACEZM = 3015
    TINZM = 3016
    TRIANGLEZM = 3017

    @classmethod
    def _missing_(cls, value):
        if isinstance(value, str):
            return cls(GeometryType[value.upper()])
        return super()._missing_(value)

    @property
    def base_id(self) -> int:
        return self.value % 1000

    @property
    def flatten(self) -> "GeometryType":
        if math.floor(self.value / 1000) <= 0:
            return self
        return GeometryType(self.value % 1000)

    @property
    def has_z(self) -> bool:
        return math.floor(self.value / 1000) in (1, 3)

    @property
    def has_m(self) -> bool:
        return math.floor(self.value / 1000) in (2, 3)

    @property
    def name_camelcase(self) -> str:
        name = self.name
        for frm, to in (
            ("MISSING", "Missing"),
            ("MULTI", "Multi"),
            ("POINT", "Point"),
            ("POLYGON", "Polygon"),
            ("LINESTRING", "LineString"),
            ("GEOMETRY", "Geometry"),
            ("COLLECTION", "Collection"),
            ("TRIANGLE", "Triangle"),
            ("POLYHEDRALSURFACE", "PolyhedralSurface"),
        ):
            name = name.replace(frm, to)
        return name

    @property
    def is_multitype(self) -> bool | None:
        if self.value % 1000 in (4, 5, 6, 7):
            return True
        return None  # reference returns None (falsy) for single types

    @property
    def to_multitype(self) -> "GeometryType":
        if self.is_multitype:
            return self
        if self.value % 1000 in (1, 2, 3):
            return GeometryType(self.value + 3)
        if self == GeometryType.MISSING:
            raise ValueError(f"No multitype implemented for {self}")
        return GeometryType(self.value - self.value % 1000 + 7)

    @property
    def to_singletype(self) -> "GeometryType":
        base = self.value % 1000
        if base in (0, 1, 2, 3):
            return self
        if base in (4, 5, 6):
            return GeometryType(self.value - 3)
        if base == 7:
            return GeometryType.GEOMETRY
        raise ValueError(f"No singletype implemented for {self}")

    @property
    def to_primitivetype(self) -> PrimitiveType:
        base = self.value % 1000
        if base in (1, 4):
            return PrimitiveType.POINT
        if base in (2, 5):
            return PrimitiveType.LINESTRING
        if base in (3, 6):
            return PrimitiveType.POLYGON
        if base in (0, 7):
            return PrimitiveType.GEOMETRY
        raise ValueError(f"No primitivetype implemented for {self}")

    @property
    def empty(self):
        """An empty geometry instance of this (flattened) type."""
        from pygeoops_ray.geo import geom as g

        base = self.value % 1000
        if base == 1:
            return g.Point()
        if base == 2:
            return g.LineString()
        if base == 3:
            return g.Polygon()
        if base == 4:
            return g.MultiPoint()
        if base == 5:
            return g.MultiLineString()
        if base == 6:
            return g.MultiPolygon()
        if base in (0, 7):
            return g.GeometryCollection()
        raise ValueError(f"No empty implemented for {self}")
