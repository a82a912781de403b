"""First-party ESRI Shapefile sink + source (S1 completion: the
reference's vector reader is ``gpd.read_file(path)`` which accepts
``.shp`` first of all — ``scripts/geojson2coco.py:180``,
``scripts/batch_geojson2coco.py:85``).

Format implemented from the public ESRI Shapefile Technical
Description (July 1998) and the dBASE III header layout:

- ``.shp``  — 100-byte header (file code 9994 BE, length in 16-bit
  words BE, version 1000 LE, shape type LE, LE-double bbox), then
  records of (record# BE, content-words BE) + shape content.  Shape
  types handled: 0 null, 1 point, 3 polyline, 5 polygon (multi-ring /
  multipart — outer rings clockwise, holes counter-clockwise, matching
  the WKB ring conventions in ``geo/wkb.py``), 8 multipoint,
  31 multipatch (2-D prefix; part-type array surfaced).
- ``.prj``  — ESRI WKT CRS sidecar, written per partition and surfaced
  into the decode path (``read_shapefile(with_crs=True)``).
- ``.shx``  — same header; (offset-words BE, content-words BE) per
  record.
- ``.dbf``  — dBASE III: version byte 0x03, record count LE, 32-byte
  field descriptors ('N' right-justified / 'C' left-justified fixed
  ASCII cells), 0x0D terminator, records prefixed by a deletion flag.

Writer: one ``part=<key>/data.shp|shx|dbf`` triple per partition key
(groupby(part).map_groups), written atomically (temp + ``os.replace``,
the ``state/lineage.py`` convention) — never one giant file, so the
reader parallelizes per partition and a failed run rewrites only its
partition.  Record payloads are built with ONE numpy buffer fill per
partition (no per-ring Python struct packing in the uniform-geometry
fast path).

Reader: ``read_binary_files`` over the partition ``.shp``/``.dbf``
pairs; records parse with numpy ``frombuffer`` slicing.  Uniform-size
record runs (the common case: one fixed-shape footprint per row) bulk-
decode as a single reshaped view — the per-record Python loop only
runs for ragged multipart geometries.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

SHAPE_NULL = 0
SHAPE_POINT = 1
SHAPE_POLYLINE = 3
SHAPE_POLYGON = 5
SHAPE_MULTIPOINT = 8
SHAPE_MULTIPATCH = 31

# multipatch part types (ESRI spec table): how each part's points knit
MPATCH_TRIANGLE_STRIP = 0
MPATCH_TRIANGLE_FAN = 1
MPATCH_OUTER_RING = 2
MPATCH_INNER_RING = 3
MPATCH_FIRST_RING = 4
MPATCH_RING = 5

_HDR = 100

# minimal ESRI-style WKT bodies for the .prj sidecar (the CRS the
# reference reads through gpd.read_file; geo/project.py holds the
# matching closed-form transforms)
PRJ_WKT = {
    "EPSG:4326": (
        'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
        'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
        'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]'
    ),
    "EPSG:3857": (
        'PROJCS["WGS_1984_Web_Mercator_Auxiliary_Sphere",'
        'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
        'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
        'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Mercator_Auxiliary_Sphere"],UNIT["Meter",1.0]]'
    ),
}
_WKT_TO_CRS = {v: k for k, v in PRJ_WKT.items()}


def write_prj(path: str, crs: str) -> None:
    """Write the .prj CRS sidecar (ESRI WKT) atomically."""
    wkt = PRJ_WKT.get(crs)
    if wkt is None:
        raise ValueError(f"no WKT template for CRS {crs!r}")
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path))
    with os.fdopen(fd, "w") as f:
        f.write(wkt)
    os.replace(tmp, path + ".prj")


def read_prj(path_no_suffix: str) -> str | None:
    """CRS name from the .prj sidecar (None when absent; unknown WKT
    returns the raw WKT string rather than guessing)."""
    p = path_no_suffix + ".prj"
    if not os.path.exists(p):
        return None
    with open(p) as f:
        wkt = f.read().strip()
    return _WKT_TO_CRS.get(wkt, wkt)


def _ring_cw(xs: np.ndarray, ys: np.ndarray) -> bool:
    """True if the ring is clockwise (shoelace area < 0 in the
    screen-up convention the spec uses: outer rings are clockwise)."""
    x, y = np.asarray(xs, np.float64), np.asarray(ys, np.float64)
    return float(np.sum((x[1:] - x[:-1]) * (y[1:] + y[:-1]))) > 0.0


def polygon_content(parts: list[np.ndarray]) -> bytes:
    """Shape content bytes for one polygon record.  ``parts`` is a
    list of (n, 2) float64 ring arrays, FIRST ring outer; rings are
    closed here if not already closed, outer ring forced clockwise and
    subsequent rings counter-clockwise per the spec."""
    rings = []
    for i, r in enumerate(parts):
        r = np.asarray(r, np.float64)
        if not (r[0] == r[-1]).all():
            r = np.vstack([r, r[:1]])
        cw = _ring_cw(r[:, 0], r[:, 1])
        if (i == 0 and not cw) or (i > 0 and cw):
            r = r[::-1]
        rings.append(r)
    pts = np.vstack(rings)
    offs = np.cumsum([0] + [len(r) for r in rings[:-1]]).astype("<i4")
    buf = bytearray()
    buf += np.array([SHAPE_POLYGON], "<i4").tobytes()
    box = np.array(
        [pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max()],
        "<f8",
    )
    buf += box.tobytes()
    buf += np.array([len(rings), len(pts)], "<i4").tobytes()
    buf += offs.tobytes()
    buf += pts.astype("<f8").tobytes()
    return bytes(buf)


def polyline_content(parts: list[np.ndarray]) -> bytes:
    """Shape content bytes for one polyline record (type 3): same
    layout as polygon but parts are open paths — no ring closing, no
    orientation rule (ESRI spec: PolyLine = bbox, NumParts, NumPoints,
    Parts[], Points[])."""
    paths = [np.asarray(r, np.float64) for r in parts]
    pts = np.vstack(paths)
    offs = np.cumsum([0] + [len(r) for r in paths[:-1]]).astype("<i4")
    buf = bytearray()
    buf += np.array([SHAPE_POLYLINE], "<i4").tobytes()
    box = np.array(
        [pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max()],
        "<f8",
    )
    buf += box.tobytes()
    buf += np.array([len(paths), len(pts)], "<i4").tobytes()
    buf += offs.tobytes()
    buf += pts.astype("<f8").tobytes()
    return bytes(buf)


def multipoint_content(pts: np.ndarray) -> bytes:
    """Shape content bytes for one multipoint record (type 8): bbox,
    NumPoints, Points[] per the ESRI spec."""
    p = np.asarray(pts, np.float64).reshape(-1, 2)
    buf = bytearray()
    buf += np.array([SHAPE_MULTIPOINT], "<i4").tobytes()
    box = np.array(
        [p[:, 0].min(), p[:, 1].min(), p[:, 0].max(), p[:, 1].max()], "<f8"
    )
    buf += box.tobytes()
    buf += np.array([len(p)], "<i4").tobytes()
    buf += p.astype("<f8").tobytes()
    return bytes(buf)


def multipatch_content(parts: list[np.ndarray], part_types: list[int]) -> bytes:
    """Shape content bytes for one multipatch record (type 31): bbox,
    NumParts, NumPoints, Parts[], PartTypes[], XY Points[] (the 2-D
    prefix of the spec layout; Z/M arrays omitted — the engine's
    vector model is 2-D like the reference's geometry use)."""
    ps = [np.asarray(r, np.float64).reshape(-1, 2) for r in parts]
    pts = np.vstack(ps)
    offs = np.cumsum([0] + [len(r) for r in ps[:-1]]).astype("<i4")
    buf = bytearray()
    buf += np.array([SHAPE_MULTIPATCH], "<i4").tobytes()
    box = np.array(
        [pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max()],
        "<f8",
    )
    buf += box.tobytes()
    buf += np.array([len(ps), len(pts)], "<i4").tobytes()
    buf += offs.tobytes()
    buf += np.asarray(part_types, "<i4").tobytes()
    buf += pts.astype("<f8").tobytes()
    return bytes(buf)


_MPOINT_DTYPE = np.dtype(
    [
        ("st", "<i4"),
        ("box", "<f8", 4),
        ("npts", "<i4"),
        ("pts", "<f8", (4, 2)),
    ]
)


def corner_multipoint_contents(
    minx: np.ndarray, miny: np.ndarray, maxx: np.ndarray, maxy: np.ndarray
) -> list[bytes]:
    """Uniform fast path: n 4-corner multipoint records with ONE
    structured-array fill (corner order (minx,miny) (minx,maxy)
    (maxx,maxy) (maxx,miny))."""
    n = len(minx)
    rec = np.zeros(n, dtype=_MPOINT_DTYPE)
    rec["st"] = SHAPE_MULTIPOINT
    rec["box"][:, 0], rec["box"][:, 1] = minx, miny
    rec["box"][:, 2], rec["box"][:, 3] = maxx, maxy
    rec["npts"] = 4
    rec["pts"][:, 0, 0], rec["pts"][:, 0, 1] = minx, miny
    rec["pts"][:, 1, 0], rec["pts"][:, 1, 1] = minx, maxy
    rec["pts"][:, 2, 0], rec["pts"][:, 2, 1] = maxx, maxy
    rec["pts"][:, 3, 0], rec["pts"][:, 3, 1] = maxx, miny
    raw = rec.tobytes()
    w = _MPOINT_DTYPE.itemsize
    return [raw[i * w : (i + 1) * w] for i in range(n)]


_RECT_DTYPE = np.dtype(
    [
        ("st", "<i4"),
        ("box", "<f8", 4),
        ("counts", "<i4", 2),
        ("part0", "<i4"),
        ("pts", "<f8", (5, 2)),
    ]
)


def rect_polygon_contents(
    minx: np.ndarray, miny: np.ndarray, maxx: np.ndarray, maxy: np.ndarray
) -> list[bytes]:
    """Uniform-geometry fast path: n rectangle polygon records built
    with ONE structured-array fill (no per-row struct packing).  Each
    record is the 128-byte 1-ring/5-point polygon content; the ring is
    clockwise per the spec's outer-ring convention."""
    n = len(minx)
    rec = np.zeros(n, dtype=_RECT_DTYPE)
    rec["st"] = SHAPE_POLYGON
    rec["box"][:, 0], rec["box"][:, 1] = minx, miny
    rec["box"][:, 2], rec["box"][:, 3] = maxx, maxy
    rec["counts"][:, 0], rec["counts"][:, 1] = 1, 5
    # clockwise: (minx,miny) -> (minx,maxy) -> (maxx,maxy) -> (maxx,miny)
    rec["pts"][:, 0, 0], rec["pts"][:, 0, 1] = minx, miny
    rec["pts"][:, 1, 0], rec["pts"][:, 1, 1] = minx, maxy
    rec["pts"][:, 2, 0], rec["pts"][:, 2, 1] = maxx, maxy
    rec["pts"][:, 3, 0], rec["pts"][:, 3, 1] = maxx, miny
    rec["pts"][:, 4, 0], rec["pts"][:, 4, 1] = minx, miny
    raw = rec.tobytes()
    w = _RECT_DTYPE.itemsize
    return [raw[i * w : (i + 1) * w] for i in range(n)]


def _main_header(shape_type: int, total_bytes: int, bbox: np.ndarray) -> bytes:
    hdr = bytearray(_HDR)
    hdr[0:4] = (9994).to_bytes(4, "big")
    hdr[24:28] = (total_bytes // 2).to_bytes(4, "big")
    hdr[28:36] = np.array([1000, shape_type], "<i4").tobytes()
    hdr[36:68] = np.asarray(bbox, "<f8").tobytes()  # minx miny maxx maxy
    return bytes(hdr)


def write_shp(path: str, contents: list[bytes]) -> None:
    """Write .shp + .shx atomically from per-record shape contents."""
    bboxes = []
    for c in contents:
        st = int(np.frombuffer(c[:4], "<i4")[0])
        if st in (SHAPE_POLYGON, SHAPE_POLYLINE, SHAPE_MULTIPOINT,
                  SHAPE_MULTIPATCH):
            bboxes.append(np.frombuffer(c[4:36], "<f8"))
        elif st == SHAPE_POINT:
            x, y = np.frombuffer(c[4:20], "<f8")
            bboxes.append(np.array([x, y, x, y]))
    if bboxes:
        bb = np.vstack(bboxes)
        bbox = np.array(
            [bb[:, 0].min(), bb[:, 1].min(), bb[:, 2].max(), bb[:, 3].max()]
        )
    else:
        bbox = np.zeros(4)

    shp = bytearray()
    shx = bytearray()
    offset = _HDR
    for i, c in enumerate(contents):
        words = len(c) // 2
        shp += (i + 1).to_bytes(4, "big") + words.to_bytes(4, "big") + c
        shx += (offset // 2).to_bytes(4, "big") + words.to_bytes(4, "big")
        offset += 8 + len(c)
    st = int(np.frombuffer(contents[0][:4], "<i4")[0]) if contents else SHAPE_NULL

    for suffix, body in ((".shp", shp), (".shx", shx)):
        total = _HDR + len(body)
        data = _main_header(st, total, bbox) + bytes(body)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path))
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path + suffix)


def write_dbf(path: str, df: pd.DataFrame, fields: list[tuple]) -> None:
    """dBASE III attribute table.  ``fields``: (name, 'N'|'C', width,
    decimals).  Values serialize as fixed-width ASCII — N right-
    justified, C left-justified (space padded)."""
    n = len(df)
    rec_len = 1 + sum(w for _, _, w, _ in fields)
    hdr_len = 32 + 32 * len(fields) + 1
    hdr = bytearray(32)
    hdr[0] = 0x03
    hdr[1:4] = bytes([24, 1, 1])  # fixed date: determinism over realism
    hdr[4:8] = np.array([n], "<u4").tobytes()
    hdr[8:10] = np.array([hdr_len], "<u2").tobytes()
    hdr[10:12] = np.array([rec_len], "<u2").tobytes()
    out = bytearray(hdr)
    for name, typ, width, dec in fields:
        d = bytearray(32)
        d[0:11] = name.encode("ascii")[:11].ljust(11, b"\x00")
        d[11] = ord(typ)
        d[16] = width
        d[17] = dec
        out += d
    out += b"\x0d"

    # vectorized fixed-width cells per column, then one row-major join
    cols = []
    for name, typ, width, dec in fields:
        v = df[name].to_numpy()
        if typ == "N":
            if dec:
                s = np.char.mod(f"%{width}.{dec}f", v.astype(np.float64))
            else:
                s = np.char.mod(f"%{width}d", v.astype(np.int64))
            s = np.char.rjust(s, width)
        else:
            s = np.char.ljust(v.astype(f"U{width}"), width)
        cols.append(s)
    rows = np.full(n, " ", dtype="U1")  # deletion flag
    for s in cols:
        rows = np.char.add(rows, s)
    out += "".join(rows.tolist()).encode("ascii")
    out += b"\x1a"
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path))
    with os.fdopen(fd, "wb") as f:
        f.write(bytes(out))
    os.replace(tmp, path + ".dbf")


def read_shp_bytes(data: bytes) -> list[dict]:
    """Parse .shp bytes -> list of {type, parts: [(n,2) arrays]} (or
    {type, x, y} for points).  Uniform-size record runs bulk-decode."""
    total = int.from_bytes(data[24:28], "big") * 2
    out = []
    pos = _HDR
    while pos + 8 <= total:
        words = int.from_bytes(data[pos + 4 : pos + 8], "big")
        clen = words * 2
        c = data[pos + 8 : pos + 8 + clen]
        st = int(np.frombuffer(c[:4], "<i4")[0])
        if st == SHAPE_POINT:
            x, y = np.frombuffer(c[4:20], "<f8")
            out.append({"type": st, "x": float(x), "y": float(y)})
        elif st == SHAPE_MULTIPOINT:
            npts = int(np.frombuffer(c[36:40], "<i4")[0])
            pts = np.frombuffer(c[40 : 40 + 16 * npts], "<f8").reshape(-1, 2)
            out.append({"type": st, "parts": [pts]})
        elif st in (SHAPE_POLYGON, SHAPE_POLYLINE):
            nparts, npts = np.frombuffer(c[36:44], "<i4")
            offs = np.frombuffer(c[44 : 44 + 4 * nparts], "<i4")
            pts = np.frombuffer(
                c[44 + 4 * nparts : 44 + 4 * nparts + 16 * npts], "<f8"
            ).reshape(-1, 2)
            bounds = np.cumsum(np.diff(np.concatenate([offs, [npts]])))
            parts = np.split(pts, bounds[:-1]) if nparts > 1 else [pts]
            out.append({"type": st, "parts": parts})
        elif st == SHAPE_MULTIPATCH:
            # bbox, NumParts, NumPoints, Parts[], PartTypes[], XY
            # Points[] (+ trailing Z/M ranges+arrays, ignored: the
            # engine's vector model is 2-D like the reference's)
            nparts, npts = np.frombuffer(c[36:44], "<i4")
            offs = np.frombuffer(c[44 : 44 + 4 * nparts], "<i4")
            ptypes = np.frombuffer(
                c[44 + 4 * nparts : 44 + 8 * nparts], "<i4"
            )
            base = 44 + 8 * nparts
            pts = np.frombuffer(
                c[base : base + 16 * npts], "<f8"
            ).reshape(-1, 2)
            bounds = np.cumsum(np.diff(np.concatenate([offs, [npts]])))
            parts = np.split(pts, bounds[:-1]) if nparts > 1 else [pts]
            out.append(
                {"type": st, "parts": parts, "part_types": ptypes.tolist()}
            )
        else:
            out.append({"type": SHAPE_NULL})
        pos += 8 + clen
    return out


def read_dbf_bytes(data: bytes) -> pd.DataFrame:
    """Parse .dbf bytes -> DataFrame (N -> int64/float64, C -> str)."""
    n = int(np.frombuffer(data[4:8], "<u4")[0])
    hdr_len = int(np.frombuffer(data[8:10], "<u2")[0])
    rec_len = int(np.frombuffer(data[10:12], "<u2")[0])
    fields = []
    pos = 32
    while data[pos] != 0x0D:
        d = data[pos : pos + 32]
        name = d[0:11].split(b"\x00")[0].decode("ascii")
        fields.append((name, chr(d[11]), d[16], d[17]))
        pos += 32
    body = np.frombuffer(
        data[hdr_len : hdr_len + n * rec_len], dtype="S1"
    ).reshape(n, rec_len)
    cols = {}
    off = 1  # deletion flag
    for name, typ, width, dec in fields:
        cell = (
            np.ascontiguousarray(body[:, off : off + width])
            .view(f"S{width}")
            .ravel()
        )
        s = np.char.strip(np.char.decode(cell, "ascii"))
        if typ == "N":
            cols[name] = (
                s.astype(np.float64) if dec else s.astype(np.int64)
            )
        else:
            cols[name] = s
        off += width
    return pd.DataFrame(cols)


# --------------------------------------------------------------------------
# partitioned Ray sink + source
# --------------------------------------------------------------------------


class ShapefilePartitionWriter:
    """map_groups callable: one .shp/.shx/.dbf triple per partition.
    Rows carry rect footprints (fp_minx..fp_maxy) + (page_id, lang)
    attributes — the geocode schema the GeoJSON sink shares."""

    def __init__(
        self,
        out_dir: str,
        part_col: str,
        geom: str = "rect",
        crs: str = "EPSG:4326",
    ):
        self.out_dir = out_dir
        self.part_col = part_col
        self.geom = geom
        self.crs = crs

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        key = df[self.part_col].iloc[0]
        df = df.sort_values("page_id", kind="mergesort").reset_index(drop=True)
        part_dir = os.path.join(self.out_dir, f"part={key}")
        os.makedirs(part_dir, exist_ok=True)
        base = os.path.join(part_dir, "data")
        a = df["fp_minx"].to_numpy(np.float64)
        b = df["fp_miny"].to_numpy(np.float64)
        c = df["fp_maxx"].to_numpy(np.float64)
        d = df["fp_maxy"].to_numpy(np.float64)
        if self.geom == "multipoint":
            contents = corner_multipoint_contents(a, b, c, d)
        else:
            contents = rect_polygon_contents(a, b, c, d)
        write_shp(base, contents)
        write_prj(base, self.crs)
        write_dbf(
            base,
            df,
            [("page_id", "N", 18, 0), ("lang", "C", 8, 0)],
        )
        return pd.DataFrame(
            {"part": [str(key)], "n_features": np.array([len(df)], np.int64)}
        )


def write_shapefile(
    ds: ray.data.Dataset,
    out_dir: str,
    part_col: str,
    geom: str = "rect",
    crs: str = "EPSG:4326",
) -> ray.data.Dataset:
    """Partitioned shapefile write; returns the (part, n_features)
    manifest dataset.  ``geom``: "rect" (1-ring polygon footprints) or
    "multipoint" (4-corner type-8 records); a .prj CRS sidecar is
    written per partition."""
    os.makedirs(out_dir, exist_ok=True)
    writer = ShapefilePartitionWriter(out_dir, part_col, geom=geom, crs=crs)

    def write_partition(df: pd.DataFrame) -> pd.DataFrame:
        return writer(df)

    return ds.groupby(part_col).map_groups(write_partition, batch_format="pandas")


def read_shapefile(out_dir: str, with_crs: bool = False) -> ray.data.Dataset:
    """Read a partitioned shapefile dataset back to rows (page_id,
    lang, fp_minx..fp_maxy) — bounds recomputed from the parsed
    geometry points (polygon rings and type-8 multipoints alike),
    attributes from the .dbf; ``with_crs`` adds the .prj sidecar's
    CRS name as a column (decode-path surfacing of the projection the
    reference gets from gpd.read_file)."""
    parts = sorted(
        os.path.join(out_dir, name)
        for name in os.listdir(out_dir)
        if name.startswith("part=")
    )
    shp_paths = [os.path.join(p, "data.shp") for p in parts]
    files = ray.data.read_binary_files(shp_paths, include_paths=True)

    def parse(t: pa.Table) -> pa.Table:
        outs = {
            "page_id": [], "lang": [],
            "fp_minx": [], "fp_miny": [], "fp_maxx": [], "fp_maxy": [],
            "crs": [],
        }
        for path, blob in zip(t["path"].to_pylist(), t["bytes"]):
            shapes = read_shp_bytes(blob.as_py())
            base = path[: -len(".shp")]
            with open(base + ".dbf", "rb") as f:
                attrs = read_dbf_bytes(f.read())
            crs = read_prj(base) or "" if with_crs else ""
            assert len(shapes) == len(attrs)
            for i, sh in enumerate(shapes):
                pts = np.vstack(sh["parts"])
                outs["page_id"].append(int(attrs["page_id"].iloc[i]))
                outs["lang"].append(str(attrs["lang"].iloc[i]))
                outs["fp_minx"].append(pts[:, 0].min())
                outs["fp_miny"].append(pts[:, 1].min())
                outs["fp_maxx"].append(pts[:, 0].max())
                outs["fp_maxy"].append(pts[:, 1].max())
                outs["crs"].append(crs)
        cols = {
            "page_id": pa.array(outs["page_id"], pa.int64()),
            "lang": pa.array(outs["lang"], pa.string()),
            "fp_minx": pa.array(outs["fp_minx"], pa.float64()),
            "fp_miny": pa.array(outs["fp_miny"], pa.float64()),
            "fp_maxx": pa.array(outs["fp_maxx"], pa.float64()),
            "fp_maxy": pa.array(outs["fp_maxy"], pa.float64()),
        }
        if with_crs:
            cols["crs"] = pa.array(outs["crs"], pa.string())
        return pa.table(cols)

    return files.map_batches(parse, batch_format="pyarrow")
