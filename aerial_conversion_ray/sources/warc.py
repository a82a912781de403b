"""WARC (Web ARChive, ISO 28500) sink + source — the format web-scale
text corpora arrive in (Common Crawl ships WARC; every crawl-derived
training-data pipeline starts by parsing it).  Reference analog: the
external-format readers at ``aerial_conversion/coco.py:283`` — an
interchange format in, engine columns out.

Writer: ``groupby(shard).map_groups`` — one ``shard=<key>/data.warc``
per shard key, written atomically (temp + ``os.replace``, the
``state/lineage.py`` convention).  Record headers are built with
vectorized np.char concatenation; the record stream is assembled with
one C-level ``b"".join`` per shard — no per-row Python string
building.

Reader: ``ray.data.read_binary_files`` over the shard files; each
file parses its records sequentially by Content-Length (the loop is
SHARD-granular — the same unit ``read_geojson`` parses per file — and
each iteration is O(1) header splits + one payload slice, so the cost
is one pass over the shard's bytes).

Record layout (version-minimal, response-type):

    WARC/1.0\r\n
    WARC-Type: response\r\n
    WARC-Record-ID: <urn:page:N>\r\n
    WARC-Date: YYYY-MM-DDTHH:MM:SS.ffffffZ\r\n
    WARC-Target-URI: <url>\r\n
    Content-Length: <len(payload)>\r\n
    \r\n
    <payload>\r\n\r\n
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_HDR_END = b"\r\n\r\n"
_REC_SEP = b"\r\n\r\n"


class WarcShardWriter:
    """map_groups callable: one .warc / .warc.gz file per shard,
    atomic.  ``compress=True`` writes ONE GZIP MEMBER PER RECORD —
    Common Crawl's actual layout (members are independently seekable,
    so a reader can fan out mid-file).  zlib's gzip wrapper emits a
    fixed default header (mtime=0, os=255), so compressed shards are
    byte-deterministic."""

    def __init__(self, out_dir: str, shard_col: str, compress: bool = False):
        self.out_dir = out_dir
        self.shard_col = shard_col
        self.compress = compress

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        key = df[self.shard_col].iloc[0]
        pid = df["page_id"].to_numpy(np.int64)
        url = df["url"].to_numpy(dtype=str)
        date = (
            pd.to_datetime(df["warc_ts"])
            .dt.strftime("%Y-%m-%dT%H:%M:%S.%fZ")
            .to_numpy(dtype=str)
        )
        payloads = df["html"].tolist()
        clen = np.char.mod("%d", np.fromiter((len(p) for p in payloads), np.int64))

        def cat(*parts):
            out = parts[0]
            for p in parts[1:]:
                out = np.char.add(out, p)
            return out

        headers = cat(
            "WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:page:",
            np.char.mod("%d", pid),
            ">\r\nWARC-Date: ",
            date,
            "\r\nWARC-Target-URI: ",
            url,
            "\r\nContent-Length: ",
            clen,
            "\r\n\r\n",
        )
        hdr_bytes = np.char.encode(headers, "utf-8")
        if self.compress:
            import zlib

            members: list[bytes] = []
            for h, p in zip(hdr_bytes, payloads):
                c = zlib.compressobj(6, zlib.DEFLATED, 31)  # gzip wrapper
                members.append(
                    c.compress(h) + c.compress(bytes(p)) + c.compress(_REC_SEP)
                    + c.flush()
                )
            blob = b"".join(members)
        else:
            chunks: list[bytes] = []
            for h, p in zip(hdr_bytes, payloads):
                chunks.append(h)
                chunks.append(bytes(p))
                chunks.append(_REC_SEP)
            blob = b"".join(chunks)
        shard_dir = os.path.join(self.out_dir, f"shard={key}")
        os.makedirs(shard_dir, exist_ok=True)
        path = os.path.join(
            shard_dir, "data.warc.gz" if self.compress else "data.warc"
        )
        fd, tmp = tempfile.mkstemp(dir=shard_dir, suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        return pd.DataFrame(
            {"shard": [str(key)], "n_records": np.array([len(df)], np.int64)}
        )


def write_warc(
    ds: ray.data.Dataset, out_dir: str, shard_col: str, compress: bool = False
) -> ray.data.Dataset:
    """Sharded WARC write; returns the (shard, n_records) manifest."""
    os.makedirs(out_dir, exist_ok=True)
    writer = WarcShardWriter(out_dir, shard_col, compress)

    def write_shard(df: pd.DataFrame) -> pd.DataFrame:
        return writer(df)

    return ds.groupby(shard_col).map_groups(write_shard, batch_format="pandas")


def read_warc(out_dir: str) -> ray.data.Dataset:
    """Read a sharded WARC dataset back to rows (page_id, url,
    warc_ts, html)."""
    paths = sorted(
        os.path.join(out_dir, name, fname)
        for name in os.listdir(out_dir)
        if name.startswith("shard=")
        for fname in os.listdir(os.path.join(out_dir, name))
        if fname in ("data.warc", "data.warc.gz")
    )
    files = ray.data.read_binary_files(paths)

    def parse(t: pa.Table) -> pa.Table:
        import zlib

        pids: list[int] = []
        urls: list[str] = []
        dates: list[str] = []
        payloads: list[bytes] = []
        for cell in t["bytes"]:
            data = cell.as_py()
            if data[:2] == b"\x1f\x8b":  # gzip members -> plaintext
                parts = []
                rest = data
                while rest:
                    d = zlib.decompressobj(47)
                    parts.append(d.decompress(rest))
                    rest = d.unused_data
                data = b"".join(parts)
            pos = 0
            n = len(data)
            while pos < n:
                hdr_end = data.index(_HDR_END, pos)
                fields = {}
                for line in data[pos:hdr_end].decode("utf-8").split("\r\n")[1:]:
                    k, _, v = line.partition(": ")
                    fields[k] = v
                clen = int(fields["Content-Length"])
                body_start = hdr_end + len(_HDR_END)
                payloads.append(data[body_start : body_start + clen])
                rid = fields["WARC-Record-ID"]
                pids.append(int(rid[len("<urn:page:") : -1]))
                urls.append(fields["WARC-Target-URI"])
                dates.append(fields["WARC-Date"])
                pos = body_start + clen + len(_REC_SEP)
        ts = (
            pd.to_datetime(pd.Series(dates), format="%Y-%m-%dT%H:%M:%S.%fZ")
            .to_numpy()
            .astype("datetime64[us]")
            if dates
            else np.empty(0, "datetime64[us]")
        )
        return pa.table(
            {
                "page_id": pa.array(pids, pa.int64()),
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(ts, pa.timestamp("us")),
                "html": pa.array(payloads, pa.binary()),
            }
        )

    return files.map_batches(parse, batch_format="pyarrow")
