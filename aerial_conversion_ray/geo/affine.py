"""Vectorized affine pixel<->spatial transforms.

Semantics match the reference exactly:

- forward (pixel -> spatial): ``geotiff.xy(row, col)`` analog
  (``aerial_conversion/coordinates.py:74-88``) — rasterio's ``xy``
  returns the CENTER of the pixel by default, i.e. offset +0.5.
- inverse (spatial -> pixel): ``geotiff.index(x, y)`` analog
  (``aerial_conversion/coordinates.py:135-148``) — rasterio's
  ``index`` FLOORS to the containing pixel (int row/col).
- the (y, x) conventions of ``pixel_segmentation_to_spatial_rio``
  (pairs read as (y, x), ``coordinates.py:102-104``) and
  ``spatial_polygon_to_pixel_rio`` (emits (x, y) after ``index``,
  ``coordinates.py:164-166``) are preserved by the callers in
  ``pipelines/spatial.py``.

An affine transform is the 6-tuple (a, b, c, d, e, f):
``x = a*col + b*row + c``;  ``y = d*col + e*row + f``.
Axis-aligned rasters (b == d == 0) are required by the reference's
tiling (``aerial_conversion/tiles.py:40-48``) and asserted here.
"""

from __future__ import annotations

import numpy as np


def pixel_to_xy(
    transform: tuple[float, float, float, float, float, float],
    cols: np.ndarray,
    rows: np.ndarray,
    offset: float = 0.5,
) -> tuple[np.ndarray, np.ndarray]:
    """Pixel (col, row) -> spatial (x, y) at pixel center (rasterio xy)."""
    a, b, c, d, e, f = transform
    cols = np.asarray(cols, dtype=np.float64) + offset
    rows = np.asarray(rows, dtype=np.float64) + offset
    return a * cols + b * rows + c, d * cols + e * rows + f


def xy_to_pixel(
    transform: tuple[float, float, float, float, float, float],
    xs: np.ndarray,
    ys: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Spatial (x, y) -> integer pixel (col, row), rasterio ``index``
    floor semantics.  Requires axis-aligned transform (b == d == 0),
    mirroring ``aerial_conversion/tiles.py:46-48``.
    """
    a, b, c, d, e, f = transform
    if b != 0 or d != 0:
        raise ValueError("transform must be axis-aligned (b == d == 0)")
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    cols = np.floor((xs - c) / a).astype(np.int64)
    rows = np.floor((ys - f) / e).astype(np.int64)
    return cols, rows


def xy_to_pixel_float(
    transform: tuple[float, float, float, float, float, float],
    xs: np.ndarray,
    ys: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Spatial -> fractional pixel coords (no floor) for sub-pixel
    segmentation geometry."""
    a, b, c, d, e, f = transform
    if b != 0 or d != 0:
        raise ValueError("transform must be axis-aligned (b == d == 0)")
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    return (xs - c) / a, (ys - f) / e
