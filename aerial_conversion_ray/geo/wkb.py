"""WKB (well-known binary) encode/decode: Point, Polygon (with
interior rings) and MultiPolygon.

Geometry travels between stages as a ``binary`` Arrow column (the
GeoParquet convention); decode to numpy per batch inside map_batches.
Little-endian WKB, geometry types 1 (Point), 3 (Polygon) and 6
(MultiPolygon) — the general reader covers the reference's arbitrary
``gpd.read_file`` geometries (``scripts/geojson2coco.py:180``) with
multipolygon EXPLODE semantics
(``aerial_conversion/coordinates.py:191``), and the output is standard
enough that DuckDB spatial or GeoPandas could read it.

:func:`decode_geometries` returns the engine's flat-rings layout
(coords + offsets + per-ring geometry/part/hole labels) that feeds
``geo/polygon.clip_rings_to_rects`` directly.  It has a fully
vectorized fast path for structurally homogeneous batches (one
np.frombuffer + strided slicing — the common case for synthetic or
per-partition-uniform corpora) and a per-GEOMETRY (never per-vertex)
parse fallback for mixed batches.
"""

from __future__ import annotations

import struct

import numpy as np

_HDR_POINT = b"\x01\x01\x00\x00\x00"
_HDR_POLY = b"\x01\x03\x00\x00\x00\x01\x00\x00\x00"
_HDR_POLY_N = b"\x01\x03\x00\x00\x00"  # polygon, ring count follows
_HDR_MULTI = b"\x01\x06\x00\x00\x00"   # multipolygon, part count follows


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


def _close(ring: np.ndarray) -> np.ndarray:
    c = np.asarray(ring, dtype="<f8")
    if len(c) and not np.array_equal(c[0], c[-1]):
        c = np.vstack([c, c[:1]])
    return c


def encode_polygon_rings(rings: list[np.ndarray]) -> bytes:
    """Polygon WKB with interior rings: rings[0] = exterior, rest =
    holes.  Each ring (N, 2), open or closed (closed on encode)."""
    parts = [_HDR_POLY_N, struct.pack("<I", len(rings))]
    for r in rings:
        c = _close(r)
        parts.append(struct.pack("<I", len(c)))
        parts.append(c.astype("<f8").tobytes())
    return b"".join(parts)


def encode_multipolygon(polys: list[list[np.ndarray]]) -> bytes:
    """MultiPolygon WKB: ``polys`` is a list of polygons, each a list
    of rings (exterior first)."""
    parts = [_HDR_MULTI, struct.pack("<I", len(polys))]
    for rings in polys:
        parts.append(encode_polygon_rings(rings))
    return b"".join(parts)


def _parse_geometry(buf: bytes, pos: int = 0) -> tuple[list[tuple[int, np.ndarray]], int]:
    """Parse ONE WKB geometry at ``pos``.  Returns ([(part_idx, ring
    coords closed)], end_pos); rings are in (part, ring) order, the
    first ring of each part is its exterior."""
    if buf[pos] != 1:
        raise ValueError("big-endian WKB not supported")
    gtype = struct.unpack_from("<I", buf, pos + 1)[0]
    pos += 5
    if gtype == 1:  # point -> one 1-vertex "ring"
        xy = np.frombuffer(buf, dtype="<f8", count=2, offset=pos)
        return [(0, xy.reshape(1, 2))], pos + 16
    if gtype == 3:  # polygon
        (nrings,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        rings = []
        for _ in range(nrings):
            (npts,) = struct.unpack_from("<I", buf, pos)
            pos += 4
            rings.append(
                (0, np.frombuffer(buf, dtype="<f8", count=npts * 2, offset=pos).reshape(npts, 2))
            )
            pos += npts * 16
        return rings, pos
    if gtype == 6:  # multipolygon: parts are full polygon WKBs
        (nparts,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        rings = []
        for p in range(nparts):
            sub, pos = _parse_geometry(buf, pos)
            rings.extend((p, r) for _, r in sub)
        return rings, pos
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def _as_buffer_list(col) -> list[bytes]:
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.Array):
        return col.to_pylist()
    return list(col)


def decode_geometries(
    col,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Batch WKB decode into the engine's flat-rings layout.

    Returns ``(flat, offsets, ring_geom, ring_part, ring_is_hole)``:
    ``flat`` (M, 2) float64 coords of all rings concatenated, rings
    OPEN (closing vertex dropped); ``offsets`` (R+1) int64;
    ``ring_geom[r]`` = input row index; ``ring_part[r]`` = polygon
    part within the geometry (multipolygons explode,
    ``coordinates.py:191``); ``ring_is_hole[r]`` = interior ring.

    Fast path: when every buffer has the same length AND the same
    structural bytes (headers/counts — everything outside coordinate
    payloads), the whole batch decodes as ONE (n, L) uint8 matrix with
    strided slicing: no per-geometry Python.  Mixed batches fall back
    to a per-geometry parse (per-vertex work stays numpy).
    """
    bufs = _as_buffer_list(col)
    n = len(bufs)
    empty = (
        np.empty((0, 2), np.float64),
        np.zeros(1, np.int64),
        np.empty(0, np.int64),
        np.empty(0, np.int64),
        np.empty(0, bool),
    )
    if n == 0:
        return empty
    lens = np.fromiter((len(b) for b in bufs), np.int64, n)
    if (lens == lens[0]).all():
        out = _decode_homogeneous(bufs, int(lens[0]))
        if out is not None:
            return out
    return _decode_general(bufs)


def _ring_template(buf: bytes) -> tuple[list[tuple[int, int, int, bool]], np.ndarray]:
    """Structure of one geometry: [(part, byte_off, npts, is_hole)]
    per ring + a bool mask of the STRUCTURAL bytes (non-coordinate)."""
    slots = []
    coord_mask = np.zeros(len(buf), dtype=bool)
    pos_rings, end = _ring_offsets(buf, 0)
    if end != len(buf):
        raise ValueError("trailing bytes after WKB geometry")
    seen_part: dict[int, int] = {}
    for part, off, npts in pos_rings:
        is_hole = seen_part.get(part, 0) > 0
        seen_part[part] = seen_part.get(part, 0) + 1
        slots.append((part, off, npts, is_hole))
        coord_mask[off : off + npts * 16] = True
    return slots, ~coord_mask


def _ring_offsets(buf: bytes, pos: int) -> tuple[list[tuple[int, int, int]], int]:
    """[(part, coord_byte_off, npts)] for one geometry at ``pos``."""
    gtype = struct.unpack_from("<I", buf, pos + 1)[0]
    pos += 5
    if gtype == 1:
        return [(0, pos, 1)], pos + 16
    if gtype == 3:
        (nrings,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        out = []
        for _ in range(nrings):
            (npts,) = struct.unpack_from("<I", buf, pos)
            pos += 4
            out.append((0, pos, npts))
            pos += npts * 16
        return out, pos
    if gtype == 6:
        (nparts,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        out = []
        for p in range(nparts):
            sub, pos = _ring_offsets(buf, pos)
            out.extend((p, off, npts) for _, off, npts in sub)
        return out, pos
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def _decode_homogeneous(bufs: list[bytes], L: int):
    """Vectorized decode when all buffers share row 0's structure.
    Returns None (caller falls back) when structural bytes differ."""
    slots, struct_mask = _ring_template(bufs[0])
    arr = np.frombuffer(b"".join(bufs), dtype=np.uint8).reshape(len(bufs), L)
    tmpl = arr[0, struct_mask]
    if not (arr[:, struct_mask] == tmpl).all():
        return None
    n = len(bufs)
    k = len(slots)
    # open ring lengths (drop the closing vertex when present; a ring
    # is closed iff first==last, checked per slot on row 0 — structure
    # is shared, but closedness is a COORD property, so verify per row)
    parts_flat, holes_flat, counts = [], [], []
    coords_per_slot = []
    for part, off, npts, is_hole in slots:
        c = arr[:, off : off + npts * 16].copy().view("<f8").reshape(n, npts, 2)
        closed = npts > 1 and bool(
            (c[:, 0, :] == c[:, -1, :]).all()
        )  # all rows closed -> drop last vertex batch-wide
        if npts > 1 and not closed:
            # mixed closedness inside one slot: bail to general path
            if (c[:, 0, :] == c[:, -1, :]).all(axis=1).any():
                return None
        m = npts - 1 if closed else npts
        coords_per_slot.append(c[:, :m, :])
        counts.append(m)
        parts_flat.append(part)
        holes_flat.append(is_hole)
    P = int(np.sum(counts))
    big = np.empty((n, P, 2), dtype=np.float64)
    at = 0
    for c, m in zip(coords_per_slot, counts):
        big[:, at : at + m, :] = c
        at += m
    flat = big.reshape(n * P, 2)
    per_geom_counts = np.tile(np.asarray(counts, np.int64), n)
    offsets = np.concatenate([[0], np.cumsum(per_geom_counts)])
    ring_geom = np.repeat(np.arange(n, dtype=np.int64), k)
    ring_part = np.tile(np.asarray(parts_flat, np.int64), n)
    ring_hole = np.tile(np.asarray(holes_flat, bool), n)
    return flat, offsets.astype(np.int64), ring_geom, ring_part, ring_hole


def _decode_general(bufs: list[bytes]):
    """Per-geometry parse fallback (mixed structures).  The Python
    loop is per GEOMETRY; coordinate payloads stay numpy."""
    chunks, counts, geoms, parts, holes = [], [], [], [], []
    for gi, buf in enumerate(bufs):
        rings, end = _parse_geometry(bytes(buf))
        if end != len(buf):
            raise ValueError("trailing bytes after WKB geometry")
        seen: dict[int, int] = {}
        for part, c in rings:
            if len(c) > 1 and np.array_equal(c[0], c[-1]):
                c = c[:-1]
            chunks.append(np.asarray(c, dtype=np.float64))
            counts.append(len(c))
            geoms.append(gi)
            parts.append(part)
            holes.append(seen.get(part, 0) > 0)
            seen[part] = seen.get(part, 0) + 1
    if not chunks:
        return (
            np.empty((0, 2), np.float64),
            np.zeros(1, np.int64),
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            np.empty(0, bool),
        )
    flat = np.concatenate(chunks, axis=0)
    offsets = np.concatenate([[0], np.cumsum(np.asarray(counts, np.int64))])
    return (
        flat,
        offsets.astype(np.int64),
        np.asarray(geoms, np.int64),
        np.asarray(parts, np.int64),
        np.asarray(holes, bool),
    )


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
