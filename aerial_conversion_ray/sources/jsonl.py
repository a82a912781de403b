"""JSONL (newline-delimited JSON) sink + source — the lingua franca
of LLM training-data interchange (every public corpus release ships
as sharded .jsonl; the reference's analogous "external columnar text
format in, columns out" step is the COCO JSON reader at
``aerial_conversion/coco.py:283``).

Writer: ``groupby(shard).map_groups`` — each shard key owns one
``shard=<key>/data.jsonl`` file written atomically (temp file +
``os.replace``, the ``state/lineage.py`` convention); never one giant
file, so a reader parallelizes per shard and a failed run rewrites
only its shard.  Row serialization is pandas' C JSON writer
(``to_json(orient="records", lines=True)``) — vectorized, correct
string escaping, no per-row Python.

Reader: ``ray.data.read_binary_files`` over the shard files, each
blob parsed by ``pyarrow.json.read_json`` — Arrow's C++ block parser,
one vectorized call per file, straight to columnar.  Schema is pinned
by ``explicit_schema`` so empty shards and integer-looking strings
cannot drift the types.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.json as pa_json
import ray.data


class JsonlShardWriter:
    """map_groups callable: one .jsonl file per shard, atomic."""

    def __init__(self, out_dir: str, shard_col: str, columns: list[str]):
        self.out_dir = out_dir
        self.shard_col = shard_col
        self.columns = columns

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        key = df[self.shard_col].iloc[0]
        body = df[self.columns].to_json(
            orient="records", lines=True, force_ascii=True
        )
        shard_dir = os.path.join(self.out_dir, f"shard={key}")
        os.makedirs(shard_dir, exist_ok=True)
        path = os.path.join(shard_dir, "data.jsonl")
        fd, tmp = tempfile.mkstemp(dir=shard_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            f.write(body)
        os.replace(tmp, path)
        return pd.DataFrame(
            {"shard": [str(key)], "n_rows": np.array([len(df)], np.int64)}
        )


def write_jsonl(
    ds: ray.data.Dataset, out_dir: str, shard_col: str, columns: list[str]
) -> ray.data.Dataset:
    """Sharded JSONL write; returns the (shard, n_rows) manifest."""
    os.makedirs(out_dir, exist_ok=True)
    writer = JsonlShardWriter(out_dir, shard_col, columns)

    def write_shard(df: pd.DataFrame) -> pd.DataFrame:
        return writer(df)

    return ds.groupby(shard_col).map_groups(write_shard, batch_format="pandas")


def read_jsonl(out_dir: str, schema: pa.Schema) -> ray.data.Dataset:
    """Read a sharded JSONL dataset back to Arrow rows (one C++ parse
    per shard file; schema pinned)."""
    paths = sorted(
        os.path.join(out_dir, name, "data.jsonl")
        for name in os.listdir(out_dir)
        if name.startswith("shard=")
    )
    files = ray.data.read_binary_files(paths)
    opts = pa_json.ParseOptions(explicit_schema=schema)

    def parse(t: pa.Table) -> pa.Table:
        parts = [
            pa_json.read_json(pa.BufferReader(blob.as_py()), parse_options=opts)
            for blob in t["bytes"]
        ]
        return pa.concat_tables(parts) if parts else schema.empty_table()

    return files.map_batches(parse, batch_format="pyarrow")
