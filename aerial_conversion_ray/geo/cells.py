"""Multi-resolution grid cell index (H3/S2 analog) + Hilbert keys.

The reference identifies tiles by their grid key ``tile_{col}-{row}``
(``aerial_conversion/tiles.py:86-128``) and derives neighbourhoods by
key arithmetic (``aerial_conversion/tiles.py:180-256``).  This module
generalizes that into a multi-resolution lat/lon grid:

- resolution ``r`` has ``2**r`` columns spanning lon [-180, 180) and
  ``2**(r-1)`` rows spanning lat [-90, 90); a cell is ~(360/2**r) deg
  wide.  Res 7 ≈ 2.8 deg, res 9 ≈ 0.70 deg, res 11 ≈ 0.18 deg.
- ``cell_id = iy * 2**r + ix`` — plain int64 arithmetic so the
  DuckDB correctness oracle can reproduce it with ``floor()``.
- k-ring (H3 ``grid_disk`` analog, reference neighbourhood semantics
  from ``tiles.py:180-256``) is key arithmetic, no search.
- Hilbert keys order cells space-fillingly for partitioning so that
  spatially-near cells land in the same Ray block / shuffle partition.

All functions are numpy-vectorized; none touch Ray.
"""

from __future__ import annotations

import numpy as np

RESOLUTIONS = (7, 8, 9, 10, 11)


def cell_size(res: int) -> float:
    """Cell width in degrees at ``res`` (exact: power-of-two divide)."""
    return 360.0 / (1 << res)


def encode(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Vectorized lon/lat -> int64 cell id at resolution ``res``.

    ``ix = floor((lon+180)/w)`` clamped to [0, 2**res);
    ``iy = floor((lat+90)/w)`` clamped to [0, 2**(res-1));
    ``cell = iy * 2**res + ix``.

    SQL mirror: see :func:`sql_expr`.
    """
    n = 1 << res
    w = 360.0 / n
    ix = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / w).astype(np.int64)
    iy = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / w).astype(np.int64)
    np.clip(ix, 0, n - 1, out=ix)
    np.clip(iy, 0, n // 2 - 1, out=iy)
    return iy * n + ix


def sql_expr(lon_sql: str, lat_sql: str, res: int) -> str:
    """DuckDB SQL expression equal to :func:`encode` bit-for-bit."""
    n = 1 << res
    w = repr(360.0 / n)
    return (
        f"(least(greatest(cast(floor(({lat_sql} + 90.0) / {w}) as bigint), 0), {n // 2 - 1})"
        f" * {n}"
        f" + least(greatest(cast(floor(({lon_sql} + 180.0) / {w}) as bigint), 0), {n - 1}))"
    )


def decode(cell: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """cell id -> (lon_min, lat_min, lon_max, lat_max) of the cell box."""
    n = 1 << res
    w = 360.0 / n
    cell = np.asarray(cell, dtype=np.int64)
    iy, ix = cell // n, cell % n
    lon0 = ix * w - 180.0
    lat0 = iy * w - 90.0
    return lon0, lat0, lon0 + w, lat0 + w


def cell_center(cell: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    lon0, lat0, lon1, lat1 = decode(cell, res)
    return (lon0 + lon1) * 0.5, (lat0 + lat1) * 0.5


def parent(cell: np.ndarray, res: int, parent_res: int) -> np.ndarray:
    """Coarsen a cell id from ``res`` to ``parent_res`` (res >= parent_res)."""
    if parent_res > res:
        raise ValueError("parent_res must be <= res")
    shift = res - parent_res
    n, np_ = 1 << res, 1 << parent_res
    cell = np.asarray(cell, dtype=np.int64)
    iy, ix = cell // n, cell % n
    return (iy >> shift) * np_ + (ix >> shift)


def kring(cell: np.ndarray, res: int, k: int = 1) -> np.ndarray:
    """All cells within Chebyshev distance ``k`` (the reference's
    8-neighbourhood at k=1, ``tiles.py:180-256``), shape (len, (2k+1)^2).

    Longitude wraps; latitude clamps (rows beyond the poles are dropped
    by emitting the original cell, which dedups downstream).
    """
    n = 1 << res
    ny = n // 2
    cell = np.asarray(cell, dtype=np.int64)
    iy, ix = cell // n, cell % n
    offs = np.arange(-k, k + 1, dtype=np.int64)
    dy, dx = np.meshgrid(offs, offs, indexing="ij")
    dy, dx = dy.ravel(), dx.ravel()
    niy = iy[:, None] + dy[None, :]
    nix = (ix[:, None] + dx[None, :]) % n
    out = niy * n + nix
    bad = (niy < 0) | (niy >= ny)
    out[bad] = np.broadcast_to(cell[:, None], out.shape)[bad]
    return out


def hilbert_key(ix: np.ndarray, iy: np.ndarray, order: int = 16) -> np.ndarray:
    """Vectorized Hilbert curve d-index for (ix, iy) on a 2**order grid.

    Classic x2d->d bit-twiddling (Wikipedia "Hilbert curve" public
    algorithm), vectorized over numpy int64 arrays.  Used as the
    space-filling partition key so spatially-adjacent cells co-locate
    in shuffle partitions (SURVEY.md §7 step 7).
    """
    x = np.asarray(ix, dtype=np.int64).copy()
    y = np.asarray(iy, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = x[flip]
        x[flip] = s - 1 - x_f
        y_flip = y[flip]
        y[flip] = s - 1 - y_flip
        x_s, y_s = x[swap].copy(), y[swap].copy()
        x[swap], y[swap] = y_s, x_s
        s >>= 1
    return d


def hilbert_of_cell(cell: np.ndarray, res: int) -> np.ndarray:
    """Hilbert key of a cell id (for range-partitioning by locality)."""
    n = 1 << res
    cell = np.asarray(cell, dtype=np.int64)
    return hilbert_key(cell % n, cell // n, order=res)


# --- geohash -------------------------------------------------------------
#
# Standard public geohash: lon/lat quantized to (ceil(5P/2), floor(5P/2))
# bits, bit-interleaved msb-first starting with longitude, base32-coded
# 5 bits per character with the canonical alphabet.  Even precision only
# (each character boundary then splits bits 3/2 or 2/3 consistently with
# the closed-form below; the tests pin known geohashes).

GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lon: np.ndarray, lat: np.ndarray, precision: int = 6) -> np.ndarray:
    """Vectorized geohash strings (numpy unicode array).

    ``lon_i = floor((lon+180)/w_lon)`` with ``w_lon = 360/2**(5P/2)``
    (clamped), same for lat over 180 deg — then Morton-interleave and
    emit 5-bit base32 groups.  SQL mirror: :func:`geohash_sql_expr`
    (identical quantization expression, per-character bit extraction).
    """
    if precision % 2:
        raise ValueError("even precision only (odd splits a character's bits)")
    half = (5 * precision) // 2
    n = np.int64(1) << half
    w_lon = 360.0 / float(n)
    w_lat = 180.0 / float(n)
    lon_i = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / w_lon).astype(
        np.int64
    )
    lat_i = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / w_lat).astype(
        np.int64
    )
    np.clip(lon_i, 0, int(n) - 1, out=lon_i)
    np.clip(lat_i, 0, int(n) - 1, out=lat_i)

    # spread bits (bit k -> bit 2k), 32-bit inputs suffice (half <= 30)
    def spread(v: np.ndarray) -> np.ndarray:
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << 8)) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << 4)) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << 2)) & np.uint64(0x3333333333333333)
        v = (v | (v << 1)) & np.uint64(0x5555555555555555)
        return v

    combined = (spread(lon_i) << np.uint64(1)) | spread(lat_i)
    chars = np.frombuffer(GEOHASH_BASE32.encode(), dtype=np.uint8)
    out = np.empty((precision, len(lon_i)), dtype=np.uint8)
    for c in range(precision):
        shift = np.uint64(5 * (precision - 1 - c))
        out[c] = chars[((combined >> shift) & np.uint64(31)).astype(np.int64)]
    return out.T.copy().view(f"S{precision}").reshape(-1).astype(f"U{precision}")


def geohash_sql_expr(lon_sql: str, lat_sql: str, precision: int = 6) -> str:
    """DuckDB expression equal to :func:`geohash_encode` bit-for-bit:
    same quantization doubles, per-character 5-bit extraction from the
    two integer coordinates, base32 via substr."""
    half = (5 * precision) // 2
    n = 1 << half
    w_lon = repr(360.0 / n)
    w_lat = repr(180.0 / n)
    lon_i = (
        f"least(greatest(cast(floor(({lon_sql} + 180.0) / {w_lon}) as bigint), 0), {n - 1})"
    )
    lat_i = (
        f"least(greatest(cast(floor(({lat_sql} + 90.0) / {w_lat}) as bigint), 0), {n - 1})"
    )
    chars = []
    for c in range(precision):
        bits = []
        for t in range(5):
            p = 5 * c + t  # stream position, 0 = msb
            src, k = ("LON", half - 1 - p // 2) if p % 2 == 0 else ("LAT", half - 1 - (p - 1) // 2)
            coord = lon_i if src == "LON" else lat_i
            bits.append(f"((({coord}) >> {k}) & 1) * {1 << (4 - t)}")
        idx = " + ".join(bits)
        chars.append(f"substr('{GEOHASH_BASE32}', cast({idx} as integer) + 1, 1)")
    return "(" + " || ".join(chars) + ")"


def cell_parent(cell: np.ndarray, res: int) -> np.ndarray:
    """Parent cell id one resolution up (quadtree: halve ix and iy).

    Exact w.r.t. :func:`encode`: the res-1 grid has double the cell
    width, so ``floor(x/2w) == floor(floor(x/w)/2)`` — the parent of
    the encoded cell is the encoding at the parent resolution.
    """
    n = np.int64(1) << res
    cell = np.asarray(cell, dtype=np.int64)
    ix = cell % n
    iy = cell // n
    return (iy >> 1) * (n >> 1) + (ix >> 1)
