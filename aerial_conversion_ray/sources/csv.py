"""CSV sink + source — the third interchange format beside JSONL
(``sources/jsonl.py``) and WARC (``sources/warc.py``); the reference's
annotation exports are CSV-adjacent tabular files
(``aerial_conversion/coco.py:283`` reads external tabular formats into
engine columns).

Writer: ``groupby(shard).map_groups`` — one ``shard=<key>/data.csv``
per shard key, atomic (temp + ``os.replace``).  Serialization is
pandas' C CSV writer (RFC 4180 quoting: embedded commas, quotes and
newlines survive).

Reader: ``ray.data.read_binary_files`` over the shard files, each
parsed by ``pyarrow.csv.read_csv`` — Arrow's multithreaded C++ parser,
one call per shard, schema pinned via ``convert_options`` so types
cannot drift (an integer-looking string column stays a string).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.csv as pa_csv
import ray.data


class CsvShardWriter:
    """map_groups callable: one .csv file per shard, atomic."""

    def __init__(self, out_dir: str, shard_col: str, columns: list[str]):
        self.out_dir = out_dir
        self.shard_col = shard_col
        self.columns = columns

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        key = df[self.shard_col].iloc[0]
        body = df[self.columns].to_csv(index=False)
        shard_dir = os.path.join(self.out_dir, f"shard={key}")
        os.makedirs(shard_dir, exist_ok=True)
        path = os.path.join(shard_dir, "data.csv")
        fd, tmp = tempfile.mkstemp(dir=shard_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            f.write(body)
        os.replace(tmp, path)
        return pd.DataFrame(
            {"shard": [str(key)], "n_rows": np.array([len(df)], np.int64)}
        )


def write_csv(
    ds: ray.data.Dataset, out_dir: str, shard_col: str, columns: list[str]
) -> ray.data.Dataset:
    """Sharded CSV write; returns the (shard, n_rows) manifest."""
    os.makedirs(out_dir, exist_ok=True)
    writer = CsvShardWriter(out_dir, shard_col, columns)

    def write_shard(df: pd.DataFrame) -> pd.DataFrame:
        return writer(df)

    return ds.groupby(shard_col).map_groups(write_shard, batch_format="pandas")


def read_csv(out_dir: str, schema: pa.Schema) -> ray.data.Dataset:
    """Read a sharded CSV dataset back to Arrow rows (one C++ parse per
    shard file; column types pinned)."""
    paths = sorted(
        os.path.join(out_dir, name, "data.csv")
        for name in os.listdir(out_dir)
        if name.startswith("shard=")
    )
    files = ray.data.read_binary_files(paths)
    convert = pa_csv.ConvertOptions(
        column_types={f.name: f.type for f in schema}
    )

    def parse(t: pa.Table) -> pa.Table:
        parts = [
            pa_csv.read_csv(pa.BufferReader(blob.as_py()), convert_options=convert)
            for blob in t["bytes"]
        ]
        out = pa.concat_tables(parts) if parts else schema.empty_table()
        return out.select([f.name for f in schema])

    return files.map_batches(parse, batch_format="pyarrow")
