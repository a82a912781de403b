"""Apache ORC sink + source — the columnar interchange member next to
Arrow IPC / Parquet (the warehouse-native format Hive/Trino mounts
directly; same "external format in, columns out" step as the
reference's COCO reader, ``aerial_conversion/coco.py:283``).

Writer: ``groupby(shard).map_groups`` — one ``shard=<key>/data.orc``
file per shard key, written atomically (temp + ``os.replace``, the
``state/lineage.py`` convention); never one giant file.  Each shard
serializes with ``pyarrow.orc.write_table`` — ORC's native stripe
layout with in-band schema + column statistics, no row-wise
serialization at all.

Reader: ``ray.data.read_binary_files`` over the shard files; each
blob maps back to a Table via ``pyarrow.orc.ORCFile`` — decoded from
the blob buffer, schema carried in-band (asserted against the pinned
one, so a drifted shard fails loudly instead of coercing).

Scale shape: both directions are per-shard streaming tasks; shard
count is the parallelism knob and no shard ever transits the driver.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.orc as po
import ray.data


class OrcShardWriter:
    """map_groups callable: one .orc file per shard."""

    def __init__(self, out_dir: str, shard_col: str, columns: list[str]):
        self.out_dir = out_dir
        self.shard_col = shard_col
        self.columns = columns

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        key = df[self.shard_col].iloc[0]
        tbl = pa.Table.from_pandas(df[self.columns], preserve_index=False)
        shard_dir = os.path.join(self.out_dir, f"shard={key}")
        os.makedirs(shard_dir, exist_ok=True)
        path = os.path.join(shard_dir, "data.orc")
        fd, tmp = tempfile.mkstemp(dir=shard_dir, suffix=".tmp")
        os.close(fd)
        po.write_table(tbl, tmp)
        os.replace(tmp, path)
        return pd.DataFrame(
            {"shard": [str(key)], "n_rows": np.array([len(df)], np.int64)}
        )


def write_orc(
    ds: ray.data.Dataset, out_dir: str, shard_col: str, columns: list[str]
) -> ray.data.Dataset:
    os.makedirs(out_dir, exist_ok=True)
    writer = OrcShardWriter(out_dir, shard_col, columns)

    # map_groups needs a plain function (instances lack __name__)
    def write_shard(df: pd.DataFrame) -> pd.DataFrame:
        return writer(df)

    return ds.groupby(shard_col).map_groups(write_shard, batch_format="pandas")


def read_orc(out_dir: str, schema: pa.Schema) -> ray.data.Dataset:
    """Shard files -> Dataset; in-band schema asserted against the
    pinned one (drift fails loudly)."""

    def parse(t: pa.Table) -> pa.Table:
        out = []
        col = t["bytes"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        for blob in col:
            tbl = po.ORCFile(pa.BufferReader(blob.as_py())).read()
            if tbl.schema != schema:  # pragma: no cover - corrupt shard
                raise ValueError(f"ORC shard schema drift: {tbl.schema}")
            out.append(tbl)
        return pa.concat_tables(out) if out else schema.empty_table()

    files = ray.data.read_binary_files(out_dir, file_extensions=["orc"])
    return files.map_batches(parse, batch_format="pyarrow")
