"""Real raster window Datasource: a minimal GeoTIFF writer/parser and
a Ray Data ``Datasource`` that streams TILE WINDOWS out of raster
files by byte-range reads — the reference's windowed GeoTIFF ingest
(``aerial_conversion/tiles.py:85-130`` reads ``rasterio`` windows per
grid tile) re-expressed as a Ray read stage.

Scope (honest): little-endian classic TIFF, single band, uint8,
uncompressed, strip-organized — the standard baseline layout every
GeoTIFF tool can produce.  Georeferencing via the two standard GeoTIFF
tags (ModelPixelScale 33550 + ModelTiepoint 33922), which carry the
north-up affine this engine's ``RasterSpec`` models.  No rasterio/GDAL
exists in this environment, so the parser is first-party; the format
on disk is real TIFF, verified structurally in tests.

Scale design: one read task per WINDOW GROUP (not per file), windows
from ``geo/tiles.grid_windows`` so tile ids match the virtual-raster
pipelines byte-for-byte; each task seeks only its windows' strip byte
ranges — a 100 GB raster never materializes whole.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from ..config import RasterSpec, TileGridSpec
from ..geo.tiles import grid_windows

# TIFF tag ids
_IMAGE_WIDTH = 256
_IMAGE_LENGTH = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_STRIP_OFFSETS = 273
_SAMPLES_PER_PIXEL = 277
_ROWS_PER_STRIP = 278
_STRIP_BYTE_COUNTS = 279
_MODEL_PIXEL_SCALE = 33550
_MODEL_TIEPOINT = 33922

_TYPE_SHORT = 3   # uint16
_TYPE_LONG = 4    # uint32
_TYPE_DOUBLE = 12


def write_geotiff(
    path: str,
    array: np.ndarray,
    raster: RasterSpec,
    rows_per_strip: int = 64,
) -> None:
    """Write ``array`` (H, W) uint8 as an uncompressed striped GeoTIFF
    whose affine matches ``raster.transform`` (north-up)."""
    arr = np.ascontiguousarray(array, dtype=np.uint8)
    h, w = arr.shape
    n_strips = -(-h // rows_per_strip)
    strip_counts = [
        (min((s + 1) * rows_per_strip, h) - s * rows_per_strip) * w
        for s in range(n_strips)
    ]
    a, _, c, _, e, f = raster.transform

    entries: list[tuple[int, int, int, bytes | int]] = []  # tag, type, count, value

    def _add(tag: int, typ: int, count: int, value) -> None:
        entries.append((tag, typ, count, value))

    # layout: header (8) + IFD + out-of-line values + strip data
    n_entries = 11
    ifd_size = 2 + n_entries * 12 + 4
    val_off = 8 + ifd_size
    out_of_line: list[bytes] = []

    def _extern(data: bytes) -> int:
        nonlocal val_off
        off = val_off
        out_of_line.append(data)
        val_off += len(data)
        return off

    strip_off_bytes = len(strip_counts) * 4

    _add(_IMAGE_WIDTH, _TYPE_LONG, 1, w)
    _add(_IMAGE_LENGTH, _TYPE_LONG, 1, h)
    _add(_BITS_PER_SAMPLE, _TYPE_SHORT, 1, 8)
    _add(_COMPRESSION, _TYPE_SHORT, 1, 1)       # none
    _add(_PHOTOMETRIC, _TYPE_SHORT, 1, 1)       # min-is-black
    _add(_SAMPLES_PER_PIXEL, _TYPE_SHORT, 1, 1)
    _add(_ROWS_PER_STRIP, _TYPE_LONG, 1, rows_per_strip)
    # out-of-line arrays: strip offsets, strip counts, scale, tiepoint
    scale = struct.pack("<3d", a, -e, 0.0)
    tiepoint = struct.pack("<6d", 0.0, 0.0, 0.0, c, f, 0.0)
    counts_b = struct.pack(f"<{n_strips}I", *strip_counts)
    # strip offsets depend on total header size: reserve their block
    offsets_pos = _extern(b"\x00" * strip_off_bytes)
    counts_pos = _extern(counts_b)
    scale_pos = _extern(scale)
    tp_pos = _extern(tiepoint)
    _add(_STRIP_OFFSETS, _TYPE_LONG, n_strips, offsets_pos)
    _add(_STRIP_BYTE_COUNTS, _TYPE_LONG, n_strips, counts_pos)
    _add(_MODEL_PIXEL_SCALE, _TYPE_DOUBLE, 3, scale_pos)
    _add(_MODEL_TIEPOINT, _TYPE_DOUBLE, 6, tp_pos)
    entries.sort(key=lambda t: t[0])  # TIFF requires ascending tags

    data_start = val_off
    strip_offsets = []
    pos = data_start
    for cnt in strip_counts:
        strip_offsets.append(pos)
        pos += cnt
    out_of_line[0] = struct.pack(f"<{n_strips}I", *strip_offsets)

    buf = bytearray()
    buf += b"II*\x00" + struct.pack("<I", 8)
    buf += struct.pack("<H", n_entries)
    for tag, typ, count, value in entries:
        if isinstance(value, int) and typ == _TYPE_SHORT and count == 1:
            val = struct.pack("<HH", value, 0)
        elif isinstance(value, int):
            val = struct.pack("<I", value)
        else:  # pragma: no cover
            raise AssertionError("inline non-int value")
        buf += struct.pack("<HHI", tag, typ, count) + val
    buf += struct.pack("<I", 0)  # next IFD
    for b in out_of_line:
        buf += b
    assert len(buf) == data_start
    buf += arr.tobytes()
    with open(path, "wb") as fh:
        fh.write(bytes(buf))


@dataclass(frozen=True)
class GeoTiffInfo:
    width: int
    height: int
    rows_per_strip: int
    strip_offsets: tuple[int, ...]
    strip_counts: tuple[int, ...]
    raster: RasterSpec


def read_info(path: str) -> GeoTiffInfo:
    """Parse the IFD of a (baseline, little-endian, uint8 striped)
    GeoTIFF and derive the ``RasterSpec`` from its GeoTIFF tags."""
    with open(path, "rb") as fh:
        head = fh.read(8)
        if head[:4] != b"II*\x00":
            raise ValueError("not a little-endian classic TIFF")
        (ifd_off,) = struct.unpack("<I", head[4:])
        fh.seek(ifd_off)
        (n,) = struct.unpack("<H", fh.read(2))
        raw = fh.read(n * 12)
        tags: dict[int, tuple[int, int, bytes]] = {}
        for i in range(n):
            tag, typ, count = struct.unpack_from("<HHI", raw, i * 12)
            tags[tag] = (typ, count, raw[i * 12 + 8 : i * 12 + 12])

        def scalar(tag: int, default=None) -> int:
            if tag not in tags:
                if default is None:
                    raise ValueError(f"missing TIFF tag {tag}")
                return default
            typ, count, val = tags[tag]
            if typ == _TYPE_SHORT:
                return struct.unpack("<H", val[:2])[0]
            return struct.unpack("<I", val)[0]

        def array(tag: int, fmt_char: str, item_size: int) -> tuple:
            typ, count, val = tags[tag]
            total = count * item_size
            if total <= 4:
                return struct.unpack(f"<{count}{fmt_char}", val[:total])
            (off,) = struct.unpack("<I", val)
            fh.seek(off)
            return struct.unpack(f"<{count}{fmt_char}", fh.read(total))

        if scalar(_COMPRESSION, 1) != 1:
            raise ValueError("compressed TIFF not supported")
        if scalar(_BITS_PER_SAMPLE, 8) != 8 or scalar(_SAMPLES_PER_PIXEL, 1) != 1:
            raise ValueError("only single-band uint8 supported")
        w = scalar(_IMAGE_WIDTH)
        h = scalar(_IMAGE_LENGTH)
        rps = scalar(_ROWS_PER_STRIP, h)
        offs = array(_STRIP_OFFSETS, "I", 4)
        cnts = array(_STRIP_BYTE_COUNTS, "I", 4)
        sx, sy, _ = array(_MODEL_PIXEL_SCALE, "d", 8)
        _, _, _, ox, oy, _ = array(_MODEL_TIEPOINT, "d", 8)
    raster = RasterSpec(x0=ox, y_max=oy, cell=sx, ncols=w, nrows=h)
    if abs(sy - sx) > 0:
        raise ValueError("non-square pixels unsupported by RasterSpec")
    return GeoTiffInfo(w, h, rps, tuple(offs), tuple(cnts), raster)


def read_window(
    path: str, info: GeoTiffInfo, col_off: int, row_off: int, w: int, h: int
) -> np.ndarray:
    """Read ONE (h, w) uint8 window by strip byte ranges: only the
    strips the window's rows touch leave the file, one seek per
    strip."""
    out = np.empty((h, w), dtype=np.uint8)
    rps = info.rows_per_strip
    with open(path, "rb") as fh:
        s0 = row_off // rps
        s1 = (row_off + h - 1) // rps
        for s in range(s0, s1 + 1):
            strip_row0 = s * rps
            nrows = info.strip_counts[s] // info.width
            fh.seek(info.strip_offsets[s])
            strip = np.frombuffer(
                fh.read(info.strip_counts[s]), dtype=np.uint8
            ).reshape(nrows, info.width)
            lo = max(row_off, strip_row0)
            hi = min(row_off + h, strip_row0 + nrows)
            out[lo - row_off : hi - row_off, :] = strip[
                lo - strip_row0 : hi - strip_row0, col_off : col_off + w
            ]
    return out


class RasterWindowDatasource:
    """Ray Data ``Datasource`` yielding one row per grid tile WINDOW of
    a GeoTIFF: (tile_id, col_off, row_off, width, height, pixels
    binary, px_sum).  Windows come from ``grid_windows`` on the file's
    OWN georeferencing, so tile ids are byte-identical to the virtual
    ``RasterSpec`` pipelines (asserted in tests).  Each read task
    fetches only its windows' strips — streaming, never the whole
    raster."""

    def __new__(cls, path: str, grid: TileGridSpec):
        # subclass lazily so module import never requires ray
        from ray.data.block import BlockMetadata
        from ray.data.datasource import Datasource, ReadTask

        info = read_info(path)
        win = grid_windows(info.raster, grid)
        n = len(win["tile_id"])

        class _Impl(Datasource):
            def estimate_inmemory_data_size(self):
                return int(np.sum(win["width"] * win["height"]) + n * 64)

            def get_read_tasks(self, parallelism: int):
                import pyarrow as pa

                parallelism = max(1, min(parallelism, n))
                bounds = np.linspace(0, n, parallelism + 1).astype(int)
                tasks = []
                for lo, hi in zip(bounds[:-1], bounds[1:]):
                    if hi <= lo:
                        continue
                    ids = win["tile_id"][lo:hi]
                    cos = win["col_off"][lo:hi]
                    ros = win["row_off"][lo:hi]
                    ws = win["width"][lo:hi]
                    hs = win["height"][lo:hi]

                    def read_fn(ids=ids, cos=cos, ros=ros, ws=ws, hs=hs):
                        pix, sums = [], []
                        for co, ro, w_, h_ in zip(cos, ros, ws, hs):
                            block = read_window(
                                path, info, int(co), int(ro), int(w_), int(h_)
                            )
                            pix.append(block.tobytes())
                            sums.append(int(block.sum(dtype=np.int64)))
                        yield pa.table(
                            {
                                "tile_id": pa.array([str(s) for s in ids]),
                                "col_off": pa.array(cos),
                                "row_off": pa.array(ros),
                                "width": pa.array(ws),
                                "height": pa.array(hs),
                                "pixels": pa.array(pix, pa.binary()),
                                "px_sum": pa.array(sums, pa.int64()),
                            }
                        )

                    meta = BlockMetadata(
                        num_rows=int(hi - lo),
                        size_bytes=int(np.sum(ws * hs)),
                        exec_stats=None,
                        input_files=[path],
                    )
                    tasks.append(ReadTask(read_fn, meta))
                return tasks

        return _Impl()


def read_raster_windows(
    path: str, grid: TileGridSpec, parallelism: int = -1
):
    """Tile windows of a GeoTIFF as a streaming Dataset (S2: the real
    raster read path; ``tiles.py:85-130`` semantics)."""
    import ray.data

    return ray.data.read_datasource(
        RasterWindowDatasource(path, grid), override_num_blocks=None
        if parallelism == -1
        else parallelism,
    )


# --- driver-checkable demo: deterministic raster, per-tile pixel sums ---

DEMO_H, DEMO_W = 1000, 1250
DEMO_TILE = 256
_DEMO_PATH = "/tmp/aerial_conversion_demo_raster.tif"


def _demo_array() -> np.ndarray:
    return (
        (np.arange(DEMO_H, dtype=np.int64)[:, None] * 31
         + np.arange(DEMO_W, dtype=np.int64)[None, :] * 17) % 251
    ).astype(np.uint8)


def raster_windows(sf_dir: str | None = None):
    """Per-tile (tile_id, offsets, size, px_sum) of a REAL on-disk
    GeoTIFF holding the deterministic pixel fn ``(row*31+col*17)%251``
    — written once to /tmp (no external data), then read back through
    the windowed Datasource.  ``sf_dir`` is unused (the raster, not
    the corpus, is the input); mirrored exactly by
    :data:`RASTER_WINDOWS_SQL`."""
    import os

    spec = RasterSpec(x0=0.0, y_max=0.0, cell=0.5, ncols=DEMO_W, nrows=DEMO_H)
    if not os.path.exists(_DEMO_PATH):
        tmp = f"{_DEMO_PATH}.{os.getpid()}"
        write_geotiff(tmp, _demo_array(), spec, rows_per_strip=64)
        os.replace(tmp, _DEMO_PATH)  # atomic: concurrent callers safe
    grid = TileGridSpec(tile_width=DEMO_TILE, tile_height=DEMO_TILE)
    ds = read_raster_windows(_DEMO_PATH, grid)
    return ds.select_columns(
        ["tile_id", "col_off", "row_off", "width", "height", "px_sum"]
    )


RASTER_WINDOWS_SQL = f"""
with rows as (select unnest(range({DEMO_H})) as row),
cols as (select unnest(range({DEMO_W})) as col),
px as (select ((row * 31 + col * 17) % 251) as v,
              (col // {DEMO_TILE}) * {DEMO_TILE} as col_off,
              (row // {DEMO_TILE}) * {DEMO_TILE} as row_off
       from rows, cols)
select ('tile_' || cast(col_off as varchar) || '-' || cast(row_off as varchar)) as tile_id,
       col_off, row_off,
       (least(col_off + {DEMO_TILE}, {DEMO_W}) - col_off) as width,
       (least(row_off + {DEMO_TILE}, {DEMO_H}) - row_off) as height,
       cast(sum(v) as bigint) as px_sum
from px group by col_off, row_off
"""


# --- zonal statistics (raster x vector) -----------------------------------
#
# The classic GIS aggregate the reference's raster<->vector interchange
# implies but never ships (its tiles.py crops rasters per polygon one
# file at a time, single-process): per-zone pixel count/sum/min/max/mean
# over every zone polygon, computed WINDOW-WISE so the raster streams
# through the object store and no task ever holds more than one tile.
#
# Plan (large raster x small zone table):
#   1. zone rectangles (world coords) -> pixel bounds via the inverse
#      affine (floor semantics, geo/tiles.py M4/M5) on the DRIVER —
#      the zone table is the small side and broadcasts via ray.put;
#   2. windowed raster scan (RasterWindowDatasource — byte-range strip
#      reads, never the whole file);
#   3. per batch: for each (window x intersecting zone), slice the
#      pixel block and fold count/sum/min/max — numpy on the slice,
#      zones outer loop is O(n_zones) per window;
#   4. coarse-bucket fold of the (zone, window) partials -> one row
#      per zone.  min/max/sum/count are all associative, so the fold
#      is exact regardless of window boundaries.

N_DEMO_ZONES = 40


def _demo_zones() -> dict[str, np.ndarray]:
    """Deterministic pixel-aligned zone rectangles over the demo
    raster (no external data; shared by the engine and the SQL
    oracle).  Zones overlap each other and straddle tile boundaries —
    the cases that make window-wise zonal stats non-trivial."""
    k = np.arange(N_DEMO_ZONES, dtype=np.int64)
    c0 = (k * 97) % (DEMO_W - 200)
    r0 = (k * 71) % (DEMO_H - 200)
    c1 = np.minimum(c0 + 64 + (k * 53) % 192, DEMO_W)
    r1 = np.minimum(r0 + 64 + (k * 37) % 192, DEMO_H)
    return {"zone_id": k, "c0": c0, "c1": c1, "r0": r0, "r1": r1}


def zonal_stats(sf_dir: str | None = None):
    """Per-zone pixel stats over the demo GeoTIFF: (zone_id, n_px,
    px_sum, px_min, px_max, px_mean).  ``sf_dir`` unused (raster +
    synthesized zones are the inputs).  Mirrored by
    :data:`ZONAL_STATS_SQL`."""
    import os

    import pandas as pd
    import ray

    spec = RasterSpec(x0=0.0, y_max=0.0, cell=0.5, ncols=DEMO_W, nrows=DEMO_H)
    if not os.path.exists(_DEMO_PATH):
        tmp = f"{_DEMO_PATH}.{os.getpid()}"
        write_geotiff(tmp, _demo_array(), spec, rows_per_strip=64)
        os.replace(tmp, _DEMO_PATH)

    z = _demo_zones()
    # world-coord zone rects -> pixel bounds via the inverse affine
    # (x = x0 + cell*col, y = y_max - cell*row; floor semantics).
    # Zones are pixel-aligned so the floats are exact halves and the
    # round-trip is lossless.
    minx = spec.x0 + z["c0"] * spec.cell
    maxx = spec.x0 + z["c1"] * spec.cell
    maxy = spec.y_max - z["r0"] * spec.cell
    miny = spec.y_max - z["r1"] * spec.cell
    pc0 = np.floor((minx - spec.x0) / spec.cell + 0.5).astype(np.int64)
    pc1 = np.floor((maxx - spec.x0) / spec.cell + 0.5).astype(np.int64)
    pr0 = np.floor((spec.y_max - maxy) / spec.cell + 0.5).astype(np.int64)
    pr1 = np.floor((spec.y_max - miny) / spec.cell + 0.5).astype(np.int64)
    zones_ref = ray.put((z["zone_id"], pc0, pc1, pr0, pr1))

    class ZonalPartial:
        def __init__(self):
            self.zones = ray.get(zones_ref)

        def __call__(self, t):
            import pyarrow as pa
            zid, c0, c1, r0, r1 = self.zones
            out = {k: [] for k in ("zone_id", "n_px", "px_sum", "px_min", "px_max")}
            for i in range(t.num_rows):
                co = t["col_off"][i].as_py()
                ro = t["row_off"][i].as_py()
                w = t["width"][i].as_py()
                h = t["height"][i].as_py()
                px = np.frombuffer(t["pixels"][i].as_py(), np.uint8).reshape(h, w)
                # zones intersecting this window
                lo_c = np.maximum(c0, co) - co
                hi_c = np.minimum(c1, co + w) - co
                lo_r = np.maximum(r0, ro) - ro
                hi_r = np.minimum(r1, ro + h) - ro
                sel = np.nonzero((lo_c < hi_c) & (lo_r < hi_r))[0]
                for j in sel:
                    blk = px[lo_r[j]:hi_r[j], lo_c[j]:hi_c[j]]
                    out["zone_id"].append(int(zid[j]))
                    out["n_px"].append(blk.size)
                    out["px_sum"].append(int(blk.sum(dtype=np.int64)))
                    out["px_min"].append(int(blk.min()))
                    out["px_max"].append(int(blk.max()))
            tbl = {k: pa.array(v, pa.int64()) for k, v in out.items()}
            tbl["bucket"] = pa.array(
                [v % 8 for v in out["zone_id"]], pa.int64()
            )
            return pa.table(tbl)

    def fold(df: "pd.DataFrame") -> "pd.DataFrame":
        g = df.groupby("zone_id", as_index=False).agg(
            n_px=("n_px", "sum"),
            px_sum=("px_sum", "sum"),
            px_min=("px_min", "min"),
            px_max=("px_max", "max"),
        )
        g["px_mean"] = g["px_sum"].to_numpy(np.float64) / g["n_px"].to_numpy(
            np.float64
        )
        return g

    grid = TileGridSpec(tile_width=DEMO_TILE, tile_height=DEMO_TILE)
    return (
        read_raster_windows(_DEMO_PATH, grid)
        .map_batches(ZonalPartial, batch_format="pyarrow", concurrency=2)
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
    )


def _zones_values_sql() -> str:
    z = _demo_zones()
    return ", ".join(
        f"({a}, {b}, {c}, {d}, {e})"
        for a, b, c, d, e in zip(z["zone_id"], z["c0"], z["c1"], z["r0"], z["r1"])
    )


ZONAL_STATS_SQL = f"""
with rows as (select unnest(range({DEMO_H})) as row),
cols as (select unnest(range({DEMO_W})) as col),
px as (select row, col, ((row * 31 + col * 17) % 251) as v from rows, cols),
zones(zone_id, c0, c1, r0, r1) as (values {{zones}}),
j as (select z.zone_id, px.v
      from px join zones z
        on px.col >= z.c0 and px.col < z.c1
       and px.row >= z.r0 and px.row < z.r1)
select cast(zone_id as bigint) as zone_id,
       cast(count(*) as bigint) as n_px,
       cast(sum(v) as bigint) as px_sum,
       cast(min(v) as bigint) as px_min,
       cast(max(v) as bigint) as px_max,
       cast(sum(v) as double) / cast(count(*) as double) as px_mean
from j group by zone_id
""".replace("{zones}", _zones_values_sql())


# --- two-raster map algebra (aligned windowed reads) -----------------------

_DEMO_PATH_B = "/tmp/aerial_conversion_demo_raster_b.tif"
ALG_MOD_B = 241


def _demo_array_b() -> np.ndarray:
    return (
        (np.arange(DEMO_H, dtype=np.int64)[:, None] * 13
         + np.arange(DEMO_W, dtype=np.int64)[None, :] * 29) % ALG_MOD_B
    ).astype(np.uint8)


def raster_algebra(sf_dir: str | None = None):
    """Map algebra over TWO real on-disk GeoTIFFs (the NDVI-shape
    band-math primitive): rasters A and B share one georeferencing,
    each streams through its own windowed Datasource, windows align
    by construction on the same grid and zip by tile key, and each
    aligned pair folds the integer ratio
    ``sum((a - b) * 1e6 // (a + b + 1))`` plus the ``a > b`` pixel
    count — everything int64, mirrored pixel-for-pixel by
    :data:`RASTER_ALGEBRA_SQL`.

    Scale shape: the window key IS the partition key — a groupby on
    ``tile_id`` over the tagged union of the two window streams
    co-locates exactly the two blocks of each tile (bounded group
    size = 2 rows x one tile's pixels), so no task ever holds more
    than one tile pair and the rasters never materialize whole.
    ``sf_dir`` unused (the rasters are the inputs)."""
    import os

    import pandas as pd
    import ray.data  # noqa: F401

    spec = RasterSpec(x0=0.0, y_max=0.0, cell=0.5, ncols=DEMO_W, nrows=DEMO_H)
    for path, arr_fn in ((_DEMO_PATH, _demo_array), (_DEMO_PATH_B, _demo_array_b)):
        if not os.path.exists(path):
            tmp = f"{path}.{os.getpid()}"
            write_geotiff(tmp, arr_fn(), spec, rows_per_strip=64)
            os.replace(tmp, path)
    grid = TileGridSpec(tile_width=DEMO_TILE, tile_height=DEMO_TILE)

    def tag(which: int):
        def fn(t):
            import pyarrow as pa

            return t.append_column(
                "band", pa.array(np.full(len(t), which, dtype=np.int64))
            )

        return fn

    a = read_raster_windows(_DEMO_PATH, grid).map_batches(
        tag(0), batch_format="pyarrow"
    )
    b = read_raster_windows(_DEMO_PATH_B, grid).map_batches(
        tag(1), batch_format="pyarrow"
    )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        assert len(df) == 2, "raster_algebra: window grids must align"
        df = df.sort_values("band")
        pa_ = np.frombuffer(df["pixels"].iloc[0], dtype=np.uint8).astype(np.int64)
        pb_ = np.frombuffer(df["pixels"].iloc[1], dtype=np.uint8).astype(np.int64)
        d = pa_ - pb_
        ratio = int(
            (np.sign(d) * (np.abs(d) * 1_000_000 // (pa_ + pb_ + 1))).sum()
        )
        return pd.DataFrame(
            {
                "tile_id": [df["tile_id"].iloc[0]],
                "n_px": [len(pa_)],
                "ratio_sum_e6": [ratio],
                "n_a_gt_b": [int((pa_ > pb_).sum())],
            }
        )

    return a.union(b).groupby("tile_id").map_groups(combine, batch_format="pandas")


RASTER_ALGEBRA_SQL = f"""
with rows as (select unnest(range({DEMO_H})) as row),
cols as (select unnest(range({DEMO_W})) as col),
px as (select ((row * 31 + col * 17) % 251) as a,
              ((row * 13 + col * 29) % {ALG_MOD_B}) as b,
              (col // {DEMO_TILE}) * {DEMO_TILE} as col_off,
              (row // {DEMO_TILE}) * {DEMO_TILE} as row_off
       from rows, cols)
select ('tile_' || cast(col_off as varchar) || '-' || cast(row_off as varchar)) as tile_id,
       cast(count(*) as bigint) as n_px,
       cast(sum(case when a >= b then (a - b) * 1000000 // (a + b + 1)
                else -((b - a) * 1000000 // (a + b + 1)) end) as bigint)
         as ratio_sum_e6,
       cast(count(*) filter (a > b) as bigint) as n_a_gt_b
from px group by col_off, row_off
"""
