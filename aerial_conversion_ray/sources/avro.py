"""Apache Avro Object Container File sink + source — first-party
codec, no avro/fastavro import (neither exists in this container).
Avro is the row-wise schema-evolving interchange format Kafka /
warehouse ingestion pipelines emit; this is the same "external format
in, columns out" step as the reference's COCO reader
(``aerial_conversion/coco.py:283``), next to the jsonl / csv / warc /
orc / ipc / tfrecord members.

Wire format (public Avro 1.11 spec, "Object Container Files"):

- header: magic ``Obj\\x01`` + file-metadata map (``avro.schema`` =
  JSON schema, ``avro.codec``) + a 16-byte sync marker,
- each data block: long row-count, long byte-size, the (optionally
  deflate-compressed) concatenated record encodings, sync marker,
- primitives: ``long`` = zigzag varint, ``string`` = long byte-length
  + UTF-8 bytes; record fields concatenate in schema order.

Writer: ``groupby(shard).map_groups`` — one ``shard=<k>/data.avro``
per shard key, written atomically (temp + ``os.replace``, the
``state/lineage.py`` convention).  The two hot primitives are
vectorized ACROSS rows: zigzag-varint encoding of every long column
is a (n, 10) byte-plane construction + prefix-mask flatten (no
per-row loop for the integer columns), and the interleave of the
per-row field segments into the block buffer is one scatter via the
repeat/cumsum gather trick — the only Python-level loop is over the
5 schema FIELDS, not over rows.  ``avro.codec=deflate`` (raw zlib,
``wbits=-15``) keeps the shards honest Avro that any stock reader
mounts.  The sync marker is a pure function of the shard key (md5),
so bytes are deterministic end to end.

Reader: ``read_binary_files`` over shards; header magic + schema +
codec verified against the pinned schema (drift fails loudly), every
block's trailing sync marker checked, then records are decoded by a
sequential varint walker.  Like the JPEG Huffman stage
(``functions/jpeg.py``), the decode is inherently serial WITHIN a
blob (each varint's start depends on the previous field's length) —
parallelism comes from shards decoding in independent Ray tasks, the
same shape every Avro reader without a C extension has.

Scale shape: both directions are per-shard streaming tasks; shard
count is the parallelism knob and no shard ever transits the driver.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

MAGIC = b"Obj\x01"


def zigzag_encode(v: np.ndarray) -> np.ndarray:
    """int64 -> zigzag uint64 (Avro spec: (n << 1) ^ (n >> 63))."""
    v = v.astype(np.int64)
    return ((v << np.int64(1)) ^ (v >> np.int64(63))).view(np.uint64)


def varint_planes(z: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized varint encoding of a uint64 array.

    Returns ``(planes, lens)`` where ``planes`` is an (n, 10) uint8
    matrix whose first ``lens[i]`` bytes of row i are the minimal
    varint of ``z[i]`` (continuation bits set), built with one numpy
    op per byte PLANE, never per row.
    """
    z = z.astype(np.uint64)
    shifts = (np.arange(10, dtype=np.uint64) * np.uint64(7))[None, :]
    planes = ((z[:, None] >> shifts) & np.uint64(0x7F)).astype(np.uint8)
    valid = (z[:, None] >> shifts) != 0
    valid[:, 0] = True
    lens = valid.sum(axis=1).astype(np.int64)
    cont = np.zeros_like(valid)
    cont[:, :-1] = valid[:, 1:]
    planes |= cont.astype(np.uint8) << np.uint8(7)
    planes[~valid] = 0
    return planes, lens


def _varint1(n: int) -> bytes:
    """Scalar minimal varint (header/block framing only)."""
    out = bytearray()
    n &= 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag1(v: int) -> int:
    return ((v << 1) ^ (v >> 63)) & 0xFFFFFFFFFFFFFFFF


def _long1(v: int) -> bytes:
    return _varint1(_zigzag1(v))


def _scatter(
    dst: np.ndarray, dst_starts: np.ndarray, src: np.ndarray, src_starts: np.ndarray, lens: np.ndarray
) -> None:
    """Copy n variable-length segments src[starts:starts+lens] into
    dst at dst_starts — one gather/scatter, no per-segment loop."""
    total = int(lens.sum())
    if total == 0:
        return
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(lens) - lens, lens
    )
    dst[np.repeat(dst_starts, lens) + within] = src[
        np.repeat(src_starts, lens) + within
    ]


def schema_json(int_cols: list[str], str_cols: list[str], order: list[str]) -> str:
    """Pinned Avro record schema for the given columns (spec JSON)."""
    fields = [
        {"name": c, "type": "long" if c in int_cols else "string"} for c in order
    ]
    return json.dumps(
        {"type": "record", "name": "Row", "fields": fields}, separators=(",", ":")
    )


def encode_block(
    df: pd.DataFrame, int_cols: list[str], str_cols: list[str], order: list[str]
) -> bytes:
    """All rows of ``df`` -> one concatenated Avro record buffer,
    vectorized across rows (loops run over the schema FIELDS only)."""
    n = len(df)
    segs: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []  # (buf, starts, lens)
    for c in order:
        if c in int_cols:
            planes, lens = varint_planes(
                zigzag_encode(df[c].to_numpy(np.int64))
            )
            flat = planes.reshape(-1)
            starts = np.arange(n, dtype=np.int64) * 10
            segs.append((flat, starts, lens))
        else:
            arr = pa.array(df[c].astype(str), pa.string())
            if arr.null_count:  # pragma: no cover - corpus is non-null
                raise ValueError(f"null string in Avro column {c}")
            offs = np.frombuffer(arr.buffers()[1], np.int32, len(arr) + 1).astype(
                np.int64
            )
            data = np.frombuffer(arr.buffers()[2], np.uint8) if arr.buffers()[2] else np.empty(0, np.uint8)
            blens = offs[1:] - offs[:-1]
            planes, plens = varint_planes(zigzag_encode(blens))
            segs.append((planes.reshape(-1), np.arange(n, dtype=np.int64) * 10, plens))
            segs.append((data, offs[:-1], blens))
    # row-major interleave: each row's segments are contiguous in field order
    seg_lens = np.stack([s[2] for s in segs], axis=1)  # (n, nseg)
    row_lens = seg_lens.sum(axis=1)
    row_starts = np.cumsum(row_lens) - row_lens
    # destination start of segment j within row i
    seg_starts = np.cumsum(seg_lens, axis=1) - seg_lens + row_starts[:, None]
    out = np.zeros(int(row_lens.sum()), np.uint8)
    for j, (buf, starts, lens) in enumerate(segs):
        _scatter(out, seg_starts[:, j], np.ascontiguousarray(buf), starts, lens)
    return out.tobytes()


def decode_block(
    buf: bytes, n: int, int_cols: list[str], str_cols: list[str], order: list[str]
) -> dict[str, list]:
    """Sequential record walker (see module docstring re: serial
    entropy decode); minimal-allocation memoryview loop."""
    cols: dict[str, list] = {c: [] for c in order}
    pos = 0
    mv = buf
    for _ in range(n):
        for c in order:
            # varint
            shift = 0
            acc = 0
            while True:
                b = mv[pos]
                pos += 1
                acc |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            val = (acc >> 1) ^ -(acc & 1)  # zigzag decode
            if c in int_cols:
                cols[c].append(val)
            else:
                cols[c].append(mv[pos : pos + val].decode("utf-8"))
                pos += val
    if pos != len(buf):
        raise ValueError(f"Avro block trailing bytes: {len(buf) - pos}")
    return cols


def _sync_marker(key) -> bytes:
    return hashlib.md5(f"aerial-avro-{key}".encode()).digest()


def write_avro_shard(
    df: pd.DataFrame,
    out_dir: str,
    key,
    int_cols: list[str],
    str_cols: list[str],
    order: list[str],
) -> None:
    sync = _sync_marker(key)
    meta = {
        b"avro.schema": schema_json(int_cols, str_cols, order).encode(),
        b"avro.codec": b"deflate",
    }
    head = bytearray(MAGIC)
    head += _long1(len(meta))
    for k, v in sorted(meta.items()):
        head += _long1(len(k)) + k + _long1(len(v)) + v
    head += _long1(0)  # end of metadata map
    head += sync
    raw = encode_block(df, int_cols, str_cols, order)
    comp = zlib.compressobj(9, zlib.DEFLATED, -15)
    data = comp.compress(raw) + comp.flush()
    blob = bytes(head) + _long1(len(df)) + _long1(len(data)) + data + sync
    shard_dir = os.path.join(out_dir, f"shard={key}")
    os.makedirs(shard_dir, exist_ok=True)
    path = os.path.join(shard_dir, "data.avro")
    fd, tmp = tempfile.mkstemp(dir=shard_dir, suffix=".tmp")
    with os.fdopen(fd, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def write_avro(
    ds: ray.data.Dataset,
    out_dir: str,
    shard_col: str,
    int_cols: list[str],
    str_cols: list[str],
    order: list[str],
) -> ray.data.Dataset:
    os.makedirs(out_dir, exist_ok=True)

    def write_shard(df: pd.DataFrame) -> pd.DataFrame:
        key = df[shard_col].iloc[0]
        write_avro_shard(df, out_dir, key, int_cols, str_cols, order)
        return pd.DataFrame(
            {"shard": [str(key)], "n_rows": np.array([len(df)], np.int64)}
        )

    return ds.groupby(shard_col).map_groups(write_shard, batch_format="pandas")


def parse_avro(
    blob: bytes, int_cols: list[str], str_cols: list[str], order: list[str]
) -> pa.Table:
    """One OCF blob -> Arrow table; magic/schema/codec/sync verified."""
    if blob[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4

    def rd_long() -> int:
        nonlocal pos
        shift = acc = 0
        while True:
            b = blob[pos]
            pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                return (acc >> 1) ^ -(acc & 1)
            shift += 7

    meta: dict[bytes, bytes] = {}
    while True:
        cnt = rd_long()
        if cnt == 0:
            break
        if cnt < 0:  # spec: negative count prefixes a byte size
            rd_long()
            cnt = -cnt
        for _ in range(cnt):
            klen = rd_long()
            k = bytes(blob[pos : pos + klen])
            pos += klen
            vlen = rd_long()
            meta[k] = bytes(blob[pos : pos + vlen])
            pos += vlen
    want = schema_json(int_cols, str_cols, order)
    got = json.loads(meta[b"avro.schema"].decode())
    if got != json.loads(want):  # pragma: no cover - corrupt shard
        raise ValueError(f"Avro schema drift: {got}")
    codec = meta.get(b"avro.codec", b"null")
    sync = bytes(blob[pos : pos + 16])
    pos += 16
    cols: dict[str, list] = {c: [] for c in order}
    while pos < len(blob):
        n = rd_long()
        size = rd_long()
        data = bytes(blob[pos : pos + size])
        pos += size
        if codec == b"deflate":
            data = zlib.decompress(data, -15)
        elif codec != b"null":  # pragma: no cover
            raise ValueError(f"unsupported Avro codec: {codec!r}")
        block = decode_block(data, n, int_cols, str_cols, order)
        for c in order:
            cols[c].extend(block[c])
        if bytes(blob[pos : pos + 16]) != sync:
            raise ValueError("Avro block sync marker mismatch")
        pos += 16
    return pa.table(
        {
            c: pa.array(cols[c], pa.int64() if c in int_cols else pa.string())
            for c in order
        }
    )


def read_avro(
    out_dir: str, int_cols: list[str], str_cols: list[str], order: list[str]
) -> ray.data.Dataset:
    def parse(t: pa.Table) -> pa.Table:
        col = t["bytes"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        out = [parse_avro(b.as_py(), int_cols, str_cols, order) for b in col]
        if not out:  # pragma: no cover - empty shard dir
            return pa.table(
                {c: pa.array([], pa.int64() if c in int_cols else pa.string()) for c in order}
            )
        return pa.concat_tables(out)

    files = ray.data.read_binary_files(out_dir, file_extensions=["avro"])
    return files.map_batches(parse, batch_format="pyarrow")
