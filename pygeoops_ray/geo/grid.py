"""Grid creation and tile splitting.

Mirrors /root/reference/pygeoops/_grid.py semantics (create_grid :17-37,
create_grid3 :40-89, create_grid2 :92-145, split_tiles :148-232): identical
tile layout, column-major emit order, and the same row/col solver, so the
pinned tile counts of the reference's test_grid.py hold. split_tiles operates
on (bounds, attributes) rows — the engine's tiles are rectangles, which is also
the engine's skew-splitting primitive (hot cell → split tile).
"""

from __future__ import annotations

import math

import numpy as np

from pygeoops_ray.geo import geom as g

__all__ = ["create_grid", "create_grid2", "create_grid3", "split_tiles", "grid_bounds"]


def grid_bounds(
    total_bounds: tuple[float, float, float, float], width: float, height: float
) -> list[tuple[float, float, float, float]]:
    """Tile bounds of a fixed-size grid, column-major like the reference."""
    xmin, ymin, xmax, ymax = total_bounds
    rows = math.ceil((ymax - ymin) / height)
    cols = math.ceil((xmax - xmin) / width)
    out = []
    cell_left = xmin
    for _ in range(cols):
        if cell_left > xmax:
            break
        cell_bottom = ymin
        for _ in range(rows):
            if cell_bottom > ymax:
                break
            out.append((cell_left, cell_bottom, cell_left + width, cell_bottom + height))
            cell_bottom += height
        cell_left += width
    return out


def _tiles_from_bounds(bounds_list) -> np.ndarray:
    out = np.empty(len(bounds_list), dtype=object)
    for i, (minx, miny, maxx, maxy) in enumerate(bounds_list):
        # ring order matches the reference: TL, TR, BR, BL
        out[i] = g.Polygon(
            [(minx, maxy), (maxx, maxy), (maxx, miny), (minx, miny), (minx, maxy)]
        )
    return out


def create_grid(total_bounds, nb_columns: int, nb_rows: int) -> np.ndarray:
    xmin, ymin, xmax, ymax = total_bounds
    width = (xmax - xmin) / nb_columns
    height = (ymax - ymin) / nb_rows
    return create_grid3(total_bounds, width=width, height=height)


def create_grid3(total_bounds, width: float, height: float) -> np.ndarray:
    return _tiles_from_bounds(grid_bounds(total_bounds, width, height))


def squarish_grid_dims(
    total_bounds, nb_squarish_tiles: int, nb_squarish_tiles_max: int | None = None
) -> tuple[int, int]:
    """(nb_columns, nb_rows) solver for ~square tiles with optional max count."""
    if nb_squarish_tiles <= 0:
        raise ValueError("nb_squarish_tiles should be > 0")
    if nb_squarish_tiles_max is not None:
        if not nb_squarish_tiles_max > 0:
            raise ValueError("nb_squarish_tiles_max should be > 0")
        if not nb_squarish_tiles_max >= nb_squarish_tiles:
            raise ValueError("nb_squarish_tiles_max should be >= nb_squarich_tiles")

    xmin, ymin, xmax, ymax = total_bounds
    total_width = xmax - xmin
    total_height = ymax - ymin
    columns_vs_rows = total_width / total_height
    nb_rows = max(round(math.sqrt(nb_squarish_tiles / columns_vs_rows)), 1)
    nb_rows = min(nb_rows, nb_squarish_tiles)
    nb_columns = max(round(nb_squarish_tiles / nb_rows), 1)
    if nb_squarish_tiles_max is not None:
        while (nb_rows * nb_columns) > nb_squarish_tiles_max:
            if nb_columns > 1 and (
                nb_rows == 1 or total_width / nb_columns > total_height / nb_rows
            ):
                nb_columns -= 1
            else:
                nb_rows -= 1
    return nb_columns, nb_rows


def create_grid2(
    total_bounds, nb_squarish_tiles: int, nb_squarish_tiles_max: int | None = None
) -> np.ndarray:
    nb_columns, nb_rows = squarish_grid_dims(
        total_bounds, nb_squarish_tiles, nb_squarish_tiles_max
    )
    return create_grid(total_bounds, nb_columns=nb_columns, nb_rows=nb_rows)


def split_tile_bounds(
    bounds: tuple[float, float, float, float], ratio: float
) -> list[tuple[float, float, float, float]]:
    """Split one rectangular tile until the per-tile split ratio is reached.

    Follows the reference's per-tile loop (halves, or thirds when the remaining
    ratio rounds to 3, splitting the longer side).
    """
    parts = [bounds]
    ratio_todo = ratio
    while ratio_todo > 1:
        divisor = 3 if round(ratio_todo) == 3 else 2
        ratio_todo /= divisor
        new_parts = []
        for minx, miny, maxx, maxy in parts:
            width = abs(maxx - minx)
            height = abs(maxy - miny)
            if divisor == 3:
                if width > height:
                    xs = [minx, minx + width / 3, minx + 2 * width / 3, maxx]
                    new_parts.extend(
                        (xs[i], miny, xs[i + 1], maxy) for i in range(3)
                    )
                else:
                    ys = [miny, miny + height / 3, miny + 2 * height / 3, maxy]
                    new_parts.extend(
                        (minx, ys[i], maxx, ys[i + 1]) for i in range(3)
                    )
            elif width > height:
                xm = minx + width / 2
                new_parts.extend([(minx, miny, xm, maxy), (xm, miny, maxx, maxy)])
            else:
                ym = miny + height / 2
                new_parts.extend([(minx, miny, maxx, ym), (minx, ym, maxx, maxy)])
        parts = new_parts
    return parts


def split_tiles(input_tiles, nb_tiles_wanted: int):
    """Split tiles until their number approaches nb_tiles_wanted.

    ``input_tiles``: ndarray/list of tile Polygons, or list of (Polygon, attrs)
    tuples; attributes are retained on all split parts. Returns the same shape
    (list of Polygons, or list of (Polygon, attrs)).
    """
    has_attrs = (
        len(input_tiles) > 0
        and isinstance(input_tiles[0], tuple)
        and len(input_tiles[0]) == 2
    )
    tiles = [(t if has_attrs else (t, None)) for t in input_tiles]
    nb_tiles = len(tiles)
    if nb_tiles >= nb_tiles_wanted:
        return list(input_tiles)

    ratio = nb_tiles_wanted / nb_tiles
    result = []
    for tile, attrs in tiles:
        for b in split_tile_bounds(tile.bounds, ratio):
            part = g.box(*b, ccw=False)
            result.append((part, attrs) if has_attrs else part)
    return result
