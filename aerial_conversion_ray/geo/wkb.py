"""Minimal WKB (well-known binary) encode/decode for Point and Polygon.

Geometry travels between stages as a ``binary`` Arrow column (the
GeoParquet convention); decode to numpy per batch inside map_batches.
Little-endian WKB, geometry types 1 (Point) and 3 (Polygon), exterior
ring only — sufficient for the engine's footprints/tiles, and
standard enough that DuckDB spatial or GeoPandas could read the
output.
"""

from __future__ import annotations

import struct

import numpy as np

_HDR_POINT = b"\x01\x01\x00\x00\x00"
_HDR_POLY = b"\x01\x03\x00\x00\x00\x01\x00\x00\x00"


def encode_points(lon: np.ndarray, lat: np.ndarray) -> list[bytes]:
    lon = np.asarray(lon, dtype="<f8")
    lat = np.asarray(lat, dtype="<f8")
    coords = np.empty((len(lon), 2), dtype="<f8")
    coords[:, 0] = lon
    coords[:, 1] = lat
    raw = coords.tobytes()
    return [_HDR_POINT + raw[i * 16 : (i + 1) * 16] for i in range(len(lon))]


def encode_polygon(coords: np.ndarray) -> bytes:
    """(N, 2) open ring -> WKB polygon (ring closed on encode)."""
    c = np.asarray(coords, dtype="<f8")
    if len(c) and not np.array_equal(c[0], c[-1]):
        c = np.vstack([c, c[:1]])
    return _HDR_POLY + struct.pack("<I", len(c)) + c.astype("<f8").tobytes()


def encode_rects(
    minx: np.ndarray, miny: np.ndarray, maxx: np.ndarray, maxy: np.ndarray
) -> list[bytes]:
    """Vectorized WKB for axis-aligned rectangle polygons (CCW, closed,
    5 points) — the synthetic footprint fast path."""
    n = len(minx)
    ring = np.empty((n, 5, 2), dtype="<f8")
    ring[:, 0, 0] = minx; ring[:, 0, 1] = miny
    ring[:, 1, 0] = maxx; ring[:, 1, 1] = miny
    ring[:, 2, 0] = maxx; ring[:, 2, 1] = maxy
    ring[:, 3, 0] = minx; ring[:, 3, 1] = maxy
    ring[:, 4, 0] = minx; ring[:, 4, 1] = miny
    hdr = _HDR_POLY + struct.pack("<I", 5)
    raw = ring.tobytes()
    step = 5 * 16
    return [hdr + raw[i * step : (i + 1) * step] for i in range(n)]


def decode_point(buf: bytes) -> tuple[float, float]:
    x, y = struct.unpack_from("<dd", buf, 5)
    return x, y


def decode_points(bufs) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized decode of equal-length WKB point buffers."""
    raw = b"".join(bufs)
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(len(bufs), 21)
    coords = arr[:, 5:21].copy().view("<f8").reshape(len(bufs), 2)
    return coords[:, 0], coords[:, 1]


def decode_polygon(buf: bytes) -> np.ndarray:
    """WKB polygon -> (N, 2) coords of the exterior ring (closed)."""
    geom_type = struct.unpack_from("<I", buf, 1)[0]
    if geom_type != 3:
        raise ValueError(f"not a WKB polygon: type={geom_type}")
    npts = struct.unpack_from("<I", buf, 9)[0]
    return np.frombuffer(buf, dtype="<f8", count=npts * 2, offset=13).reshape(npts, 2)


def decode_rects(bufs) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized decode of 5-point rectangle WKB polygons ->
    (minx, miny, maxx, maxy)."""
    raw = b"".join(bufs)
    n = len(bufs)
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(n, 13 + 5 * 16)
    coords = arr[:, 13:].copy().view("<f8").reshape(n, 5, 2)
    return (
        coords[:, :, 0].min(axis=1),
        coords[:, :, 1].min(axis=1),
        coords[:, :, 0].max(axis=1),
        coords[:, :, 1].max(axis=1),
    )
