"""Tile grid semantics vs a literal transcription oracle.

The oracle below re-derives the reference's get_tiles behavior
(`aerial_conversion/tiles.py:16-83`) as plain Python (windows as
tuples) and the grid generator must match it exactly, including the
offset/edge quirks and column-major order.
"""

import itertools

import numpy as np

from aerial_conversion_ray.config import RasterSpec, TileGridSpec
from aerial_conversion_ray.geo.tiles import grid_windows, point_tile_assign


def oracle_windows(ncols, nrows, tile_width, tile_height, offset):
    """Reference-faithful window enumeration (column-major)."""
    corners = itertools.product(
        range(0, ncols, tile_width), range(0, nrows, tile_height)
    )
    offset_w = int(tile_width * offset / 100)
    offset_h = int(tile_height * offset / 100)
    TILE_WIDTH = min(tile_width + (offset_w * 2), ncols)
    TILE_HEIGHT = min(tile_height + (offset_h * 2), nrows)
    out = []
    for col_corner, row_corner in corners:
        w = min(TILE_WIDTH + offset_w, ncols) if col_corner == 0 else min(
            TILE_WIDTH + (offset_w * 2), ncols
        )
        h = min(TILE_HEIGHT + offset_h, nrows) if row_corner == 0 else min(
            TILE_HEIGHT + (offset_h * 2), nrows
        )
        col_off = max(0, col_corner - offset_w)
        row_off = max(0, row_corner - offset_h)
        # Window.intersection with (0, 0, ncols, nrows)
        w = min(col_off + w, ncols) - col_off
        h = min(row_off + h, nrows) - row_off
        out.append((col_off, row_off, w, h))
    return out


def test_grid_matches_reference_no_offset():
    r = RasterSpec(ncols=1030, nrows=520, cell=0.1, x0=-50.0, y_max=26.0)
    g = TileGridSpec(tile_width=256, tile_height=128, offset=0.0)
    got = grid_windows(r, g)
    want = oracle_windows(1030, 520, 256, 128, 0.0)
    assert len(got["tile_id"]) == len(want)
    for i, (c, ro, w, h) in enumerate(want):
        assert got["col_off"][i] == c
        assert got["row_off"][i] == ro
        assert got["width"][i] == w
        assert got["height"][i] == h
        assert got["tile_id"][i] == f"tile_{c}-{ro}"


def test_grid_matches_reference_with_offset():
    for off in (5.0, 12.5, 25.0):
        r = RasterSpec(ncols=777, nrows=333, cell=1.0, x0=0.0, y_max=333.0)
        g = TileGridSpec(tile_width=100, tile_height=90, offset=off)
        got = grid_windows(r, g)
        want = oracle_windows(777, 333, 100, 90, off)
        assert list(zip(got["col_off"], got["row_off"], got["width"], got["height"])) == want


def test_grid_map_units_rounding():
    # map units: pixels = int(w / cell_x + 0.5), cell_x used for BOTH axes
    r = RasterSpec(ncols=1000, nrows=800, cell=0.3, x0=0.0, y_max=240.0)
    g = TileGridSpec(tile_width=50, tile_height=70, map_units=True, offset=0.0)
    got = grid_windows(r, g)
    tw = int(50 / 0.3 + 0.5)  # 167
    th = int(70 / 0.3 + 0.5)  # 233
    want = oracle_windows(1000, 800, tw, th, 0.0)
    assert list(zip(got["col_off"], got["row_off"], got["width"], got["height"])) == want


def test_grid_transform_origin():
    r = RasterSpec(ncols=100, nrows=100, cell=0.5, x0=10.0, y_max=60.0)
    g = TileGridSpec(tile_width=40, tile_height=40)
    got = grid_windows(r, g)
    i = list(got["tile_id"]).index("tile_40-40")
    t = got["transform"][i]
    assert t[2] == 10.0 + 0.5 * 40  # x origin
    assert t[5] == 60.0 - 0.5 * 40  # y origin
    assert got["minx"][i] == 30.0 and got["maxy"][i] == 40.0


def test_point_tile_assign_floor_semantics():
    r = RasterSpec(ncols=200, nrows=100, cell=1.0, x0=0.0, y_max=100.0)
    g = TileGridSpec(tile_width=50, tile_height=50)
    lon = np.array([0.0, 49.999, 50.0, 199.9, 0.5])
    lat = np.array([99.9, 99.9, 99.9, 0.1, 49.9])  # row = floor((lat-100)/-1)
    coff, roff, col, row = point_tile_assign(r, g, lon, lat)
    assert coff.tolist() == [0, 0, 50, 150, 0]
    assert col.tolist() == [0, 49, 50, 199, 0]
    assert row.tolist() == [0, 0, 0, 99, 50]
    assert roff.tolist() == [0, 0, 0, 50, 50]
