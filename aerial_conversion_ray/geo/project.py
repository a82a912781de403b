"""Coordinate reprojection: EPSG:4326 <-> EPSG:3857 (web mercator).

The reference reprojects via fiona/pyproj (`reproject_coords`,
``aerial_conversion/coordinates.py:56-71``; the orthogonalise rotate
round-trips through 3857, ``orthogonalise/orthogonalise.py:152-178``).
No CRS library exists in this container; the spherical-mercator
formulas are closed-form, so the engine implements them directly in
numpy with a DuckDB-mirrorable op order.

Fixed-point parity: numpy and DuckDB libm (tan/log) differ by ~1 ulp,
so checked outputs go through ``floor(x * 1e6 + 0.5)`` micrometer keys
(x <= 2e7 m -> x * 1e6 < 2^53, exact in double).
"""

from __future__ import annotations

import numpy as np

R_MERC = 6378137.0
LAT_MAX = 85.051128779806604  # atan(sinh(pi)) in degrees: mercator validity


def to_mercator(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 degrees -> EPSG:3857 meters (spherical mercator)."""
    lat = np.clip(np.asarray(lat, dtype=np.float64), -LAT_MAX, LAT_MAX)
    x = R_MERC * np.radians(np.asarray(lon, dtype=np.float64))
    y = R_MERC * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def from_mercator(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:3857 meters -> EPSG:4326 degrees."""
    lon = np.degrees(np.asarray(x, dtype=np.float64) / R_MERC)
    lat = np.degrees(
        2.0 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / R_MERC)) - np.pi / 2.0
    )
    return lon, lat


def mercator_sql(lon_sql: str, lat_sql: str) -> dict[str, str]:
    """DuckDB expressions mirroring :func:`to_mercator` op-for-op
    (before fixed-point snapping)."""
    lat_c = f"least(greatest({lat_sql}, {-LAT_MAX!r}), {LAT_MAX!r})"
    return {
        "merc_x": f"({R_MERC!r} * radians({lon_sql}))",
        "merc_y": f"({R_MERC!r} * ln(tan(pi() / 4.0 + radians({lat_c}) / 2.0)))",
    }
