"""Per-partition lineage manifests + checkpoint-resume writes.

Replaces the reference's filesystem resume marker (`coco_from_gis.json`
directory probe, ``scripts/batch_geojson2coco.py:40-64,138-156``) with
the engine's exactly-once partitioned write (SURVEY.md §4):

- output is partitioned Parquet: ``part=<key>/data.parquet`` — one
  directory per partition key (resumable unit; never one giant file);
- each partition writes ATOMICALLY: temp file + ``os.replace``, then a
  ``_MANIFEST.json`` sidecar (key, rows in/out, input fingerprint,
  output checksum) — the manifest is the commit record;
- on resume, a partition whose manifest exists with a MATCHING input
  fingerprint is skipped (exactly-once tile assignment even if the
  input changed: a fingerprint mismatch forces a rewrite);
- fingerprints are order-insensitive (XOR of per-row key hashes), so
  they are stable under Ray's nondeterministic block order.

The writer is a ``groupby(part_col).map_groups`` stage: the shuffle
co-locates each partition once, the group task owns its directory, and
the returned manifest rows ARE the lineage/metrics table (aggregated
by the caller instead of a side-channel metrics actor).
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

FP_MULT = np.int64(1000003)
FP_ADD = np.int64(7)


def row_fingerprint(keys: np.ndarray) -> int:
    """Order-insensitive partition fingerprint: XOR of per-row integer
    hashes (associative + commutative -> stable under block order).
    SQL mirror: ``bit_xor(key * 1000003 + 7)``."""
    k = keys.astype(np.int64)
    return int(np.bitwise_xor.reduce(k * FP_MULT + FP_ADD)) if len(k) else 0


def _manifest_path(out_dir: str, key) -> str:
    return os.path.join(out_dir, f"part={key}", "_MANIFEST.json")


def load_manifests(out_dir: str) -> pd.DataFrame:
    """All committed partition manifests under ``out_dir``."""
    rows = []
    if os.path.isdir(out_dir):
        for name in sorted(os.listdir(out_dir)):
            mp = os.path.join(out_dir, name, "_MANIFEST.json")
            if name.startswith("part=") and os.path.exists(mp):
                with open(mp) as f:
                    rows.append(json.load(f))
    return pd.DataFrame(
        rows, columns=["part", "n_rows", "fingerprint", "data_file"]
    )


class PartitionWriter:
    """map_groups callable: write one partition's rows atomically and
    emit its manifest row.  Skips (exactly-once) when a committed
    manifest with the same input fingerprint already exists."""

    def __init__(self, out_dir: str, part_col: str, key_col: str):
        self.out_dir = out_dir
        self.part_col = part_col
        self.key_col = key_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        key = df[self.part_col].iloc[0]
        df = df.sort_values(self.key_col, kind="mergesort").reset_index(drop=True)
        fp = row_fingerprint(df[self.key_col].to_numpy())
        part_dir = os.path.join(self.out_dir, f"part={key}")
        man_path = os.path.join(part_dir, "_MANIFEST.json")
        data_path = os.path.join(part_dir, "data.parquet")
        if os.path.exists(man_path):
            with open(man_path) as f:
                man = json.load(f)
            if man.get("fingerprint") == fp and os.path.exists(data_path):
                return pd.DataFrame(
                    {
                        "part": [str(key)],
                        "n_rows": np.array([man["n_rows"]], dtype=np.int64),
                        "fingerprint": np.array([fp], dtype=np.int64),
                        "status": ["skipped"],
                    }
                )
        os.makedirs(part_dir, exist_ok=True)
        # atomic: write temp in the SAME directory, then rename over
        fd, tmp = tempfile.mkstemp(dir=part_dir, suffix=".tmp")
        os.close(fd)
        try:
            pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp)
            os.replace(tmp, data_path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        man = {
            "part": str(key),
            "n_rows": int(len(df)),
            "fingerprint": fp,
            "data_file": "data.parquet",
        }
        fd, tmp = tempfile.mkstemp(dir=part_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(man, f)
        os.replace(tmp, man_path)
        return pd.DataFrame(
            {
                "part": [str(key)],
                "n_rows": np.array([len(df)], dtype=np.int64),
                "fingerprint": np.array([fp], dtype=np.int64),
                "status": ["written"],
            }
        )


def resumable_write(
    ds: ray.data.Dataset,
    out_dir: str,
    part_col: str,
    key_col: str,
) -> ray.data.Dataset:
    """Partition ``ds`` by ``part_col`` and write each partition
    exactly once; returns the lineage manifest dataset (part, n_rows,
    fingerprint, status)."""
    os.makedirs(out_dir, exist_ok=True)
    writer = PartitionWriter(out_dir, part_col, key_col)

    # map_groups requires a plain function (it reads fn.__name__)
    def write_partition(df: pd.DataFrame) -> pd.DataFrame:
        return writer(df)

    return ds.groupby(part_col).map_groups(write_partition, batch_format="pandas")
