"""Tile grid generation + point/rect -> tile assignment.

Reproduces the EXACT window semantics of the reference's
``get_tiles`` (``aerial_conversion/tiles.py:16-83``), including its
quirks, so tile IDs and assignments match byte-for-byte:

- corner stride uses the ORIGINAL tile size; corners iterate
  column-major (``itertools.product(cols, rows)``, ``tiles.py:52-54``);
- map-units conversion rounds ``int(w / cell_x + 0.5)`` and uses
  ``cell_x`` for BOTH axes (``tiles.py:43-45``);
- overlap pads: ``offset_w = int(tile_width * offset / 100)``;
  padded size ``TILE_W = min(tile_width + 2*offset_w, ncols)``; the
  col==0 / row==0 edge windows get ``TILE_W + offset_w`` (reference
  behavior at ``tiles.py:66-74``), all windows clipped to the raster
  (``.intersection(big_window)``, ``tiles.py:76-81``);
- tile id = ``tile_{col_off}-{row_off}`` (``tiles.py:123``).

All outputs are numpy arrays — the grid generator is a deterministic
flat_map source; assignment is pure arithmetic (no spatial search).
"""

from __future__ import annotations

import numpy as np

from ..config import RasterSpec, TileGridSpec


def grid_windows(raster: RasterSpec, grid: TileGridSpec) -> dict[str, np.ndarray]:
    """All tile windows, column-major order.  Returns dict of arrays:
    tile_id, col_off, row_off, width, height, transform (N,6),
    plus spatial bounds minx/miny/maxx/maxy."""
    tw, th = grid.tile_width, grid.tile_height
    if grid.map_units:
        if raster.transform[1] != 0 or raster.transform[3] != 0:
            raise ValueError("Coefficient a from raster.transform.a is not width.")
        cell_x = raster.transform[0]
        tw = int(tw / cell_x + 0.5)
        th = int(th / cell_x + 0.5)
    ncols, nrows = raster.ncols, raster.nrows

    off_w = int(tw * grid.offset / 100)
    off_h = int(th * grid.offset / 100)
    TILE_W = min(tw + off_w * 2, ncols)
    TILE_H = min(th + off_h * 2, nrows)

    col_corners = np.arange(0, ncols, tw, dtype=np.int64)
    row_corners = np.arange(0, nrows, th, dtype=np.int64)
    # column-major: col outer, row inner (itertools.product order)
    cc = np.repeat(col_corners, len(row_corners))
    rc = np.tile(row_corners, len(col_corners))

    w = np.where(cc == 0, min(TILE_W + off_w, ncols), min(TILE_W + off_w * 2, ncols))
    h = np.where(rc == 0, min(TILE_H + off_h, nrows), min(TILE_H + off_h * 2, nrows))
    col_off = np.maximum(0, cc - off_w)
    row_off = np.maximum(0, rc - off_h)
    # clip to raster extent (Window.intersection semantics)
    w = np.minimum(col_off + w, ncols) - col_off
    h = np.minimum(row_off + h, nrows) - row_off

    a, _, c, _, e, f = raster.transform
    tx = c + a * col_off.astype(np.float64)
    ty = f + e * row_off.astype(np.float64)
    transforms = np.empty((len(cc), 6), dtype=np.float64)
    transforms[:, 0] = a
    transforms[:, 1] = 0.0
    transforms[:, 2] = tx
    transforms[:, 3] = 0.0
    transforms[:, 4] = e
    transforms[:, 5] = ty

    tile_id = np.char.add(
        np.char.add(np.char.add("tile_", col_off.astype("U10")), "-"),
        row_off.astype("U10"),
    )
    minx = c + a * col_off.astype(np.float64)
    maxx = c + a * (col_off + w).astype(np.float64)
    maxy = f + e * row_off.astype(np.float64)
    miny = f + e * (row_off + h).astype(np.float64)
    return {
        "tile_id": tile_id,
        "col_off": col_off,
        "row_off": row_off,
        "width": w,
        "height": h,
        "transform": transforms,
        "minx": minx,
        "miny": miny,
        "maxx": maxx,
        "maxy": maxy,
    }


def point_tile_assign(
    raster: RasterSpec, grid: TileGridSpec, lon: np.ndarray, lat: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Assign points to their containing base tile (offset==0 grid):
    pixel via floor inverse-affine (rasterio ``index`` semantics), then
    key arithmetic.  Returns (tile_col_off, tile_row_off, pix_col,
    pix_row); out-of-extent points are clamped to the edge pixel.

    SQL mirror: :func:`point_tile_sql`.
    """
    if grid.offset != 0:
        raise ValueError("point_tile_assign requires offset==0 (use candidate join)")
    # CRS dispatch: the raster's affine lives in raster.crs coordinates
    # (the reference accepts any raster CRS and reprojects the vector
    # layer into it, scripts/geojson2coco.py:183-188); lon/lat degrees
    # project through the closed-form family first.
    if raster.crs not in ("EPSG:4326", "CRS:84", "WGS84"):
        from .project import project_to_crs

        x, y = project_to_crs(raster.crs, lon, lat)
    else:
        x, y = np.asarray(lon, np.float64), np.asarray(lat, np.float64)
    a, _, c, _, e, f = raster.transform
    col = np.floor((x - c) / a).astype(np.int64)
    row = np.floor((y - f) / e).astype(np.int64)
    np.clip(col, 0, raster.ncols - 1, out=col)
    np.clip(row, 0, raster.nrows - 1, out=row)
    tw, th = grid.tile_width, grid.tile_height
    return (col // tw) * tw, (row // th) * th, col, row


def point_tile_sql(
    raster: RasterSpec, grid: TileGridSpec, lon_sql: str, lat_sql: str
) -> dict[str, str]:
    """DuckDB expressions equal to :func:`point_tile_assign`."""
    a, _, c, _, e, f = raster.transform
    col = (
        f"least(greatest(cast(floor(({lon_sql} - {c!r}) / {a!r}) as bigint), 0), "
        f"{raster.ncols - 1})"
    )
    row = (
        f"least(greatest(cast(floor(({lat_sql} - {f!r}) / {e!r}) as bigint), 0), "
        f"{raster.nrows - 1})"
    )
    tw, th = grid.tile_width, grid.tile_height
    return {
        "pix_col": col,
        "pix_row": row,
        "tile_col_off": f"(({col} // {tw}) * {tw})",
        "tile_row_off": f"(({row} // {th}) * {th})",
        "tile_id": (
            f"('tile_' || cast(({col} // {tw}) * {tw} as varchar) || '-' || "
            f"cast(({row} // {th}) * {th} as varchar))"
        ),
    }
