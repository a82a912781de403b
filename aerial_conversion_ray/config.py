"""Typed pipeline configuration (replaces the reference's CLI flags,
SURVEY.md §2j)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class RasterSpec:
    """A virtual north-up raster: extent + pixel size.  Replaces the
    reference's opened GeoTIFF (``rio.open``); only the affine
    transform and dimensions matter for join semantics (SURVEY.md §1c).

    transform = (a=cell, b=0, c=x0, d=0, e=-cell, f=y_max):
    ``x = x0 + cell*col``, ``y = y_max - cell*row``.
    """

    x0: float = -180.0
    y_max: float = 90.0
    cell: float = 0.05          # degrees per pixel
    ncols: int = 7200
    nrows: int = 3600
    crs: str = "EPSG:4326"

    @property
    def transform(self) -> tuple[float, float, float, float, float, float]:
        return (self.cell, 0.0, self.x0, 0.0, -self.cell, self.y_max)


@dataclass(frozen=True)
class TileGridSpec:
    """Tile grid parameters with the reference's semantics
    (``aerial_conversion/tiles.py:16-83``): sizes in pixels (or map
    units), overlap ``offset`` in percent, column-major corner order,
    ``tile_{col_off}-{row_off}`` naming."""

    tile_width: int = 500       # pixels (pre map_units conversion)
    tile_height: int = 500
    map_units: bool = False
    offset: float = 0.0         # percent overlap each side


@dataclass(frozen=True)
class EngineConfig:
    """Per-run knobs for the flagship pipelines."""

    raster: RasterSpec = field(default_factory=RasterSpec)
    grid: TileGridSpec = field(default_factory=TileGridSpec)
    cell_res: int = 9           # primary index resolution
    pages_rep: int = 1          # pages per document (deterministic amplification)
    # None = one batch per block: the sources size blocks for the
    # cluster (pages generator fan-out / parquet row groups), and an
    # explicit batch_size here makes Ray BUNDLE the fanned-out blocks
    # back together until it reaches that many rows (measured: 64
    # generator blocks -> 13 tasks at batch_size=65536, 19 of 32 cores
    # idle).  The per-batch kernels are vectorized and size-agnostic.
    batch_size: int | None = None
    knn_k: int = 5
    salt_buckets: int = 8       # sub-buckets for hot-cell salting
