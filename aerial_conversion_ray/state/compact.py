"""Small-file compaction for lineage-partitioned output.

A 100 TB run's ``resumable_write`` output is one directory per
partition key — correct for resume, but high-key-cardinality outputs
leave thousands of small parquet files (the classic small-files
problem; metadata-bound reads downstream).  ``compact_partitions``
coalesces committed partitions into ~``target_bytes`` bins, keeping
every guarantee the lineage layer established:

- bin assignment is DETERMINISTIC (parts sorted by key, greedy
  first-fit on on-disk bytes), so re-running plans the same bins;
- each bin writes atomically (temp + ``os.replace``) and commits a
  ``_MANIFEST.json`` naming its member parts and their fingerprints;
- the bin fingerprint is the XOR of member fingerprints — XOR of
  per-row hashes is associative/commutative, so the compacted file's
  identity is verifiable against the source manifests WITHOUT
  re-reading the sources (each bin task still recomputes it from the
  rows it writes and asserts the match);
- resume: a bin whose manifest matches its planned members +
  combined fingerprint is skipped (exactly-once compaction).

Each bin is one Ray group task (``groupby('bin').map_groups``): the
plan table (a few rows per part — key, bytes, fingerprint) shuffles,
the heavy parquet bytes move exactly once, source -> compacted file.
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

from .lineage import load_manifests, row_fingerprint


def plan_bins(out_dir: str, target_bytes: int) -> pd.DataFrame:
    """(part, data_path, bytes, fingerprint, n_rows, bin) — committed
    partitions greedily packed, in sorted-key order, into bins of
    ~``target_bytes`` (a part larger than the target gets its own
    bin).  Pure function of the manifests + file sizes."""
    man = load_manifests(out_dir)
    rows = []
    for _, r in man.sort_values("part", kind="mergesort").iterrows():
        p = os.path.join(out_dir, f"part={r['part']}", r["data_file"])
        rows.append(
            {
                "part": r["part"],
                "data_path": p,
                "bytes": os.path.getsize(p),
                "fingerprint": int(r["fingerprint"]),
                "n_rows": int(r["n_rows"]),
            }
        )
    df = pd.DataFrame(rows, columns=["part", "data_path", "bytes", "fingerprint", "n_rows"])
    bins, cur, acc = [], 0, 0
    for b in df["bytes"]:
        if acc > 0 and acc + b > target_bytes:
            cur += 1
            acc = 0
        bins.append(cur)
        acc += b
    df["bin"] = np.array(bins, dtype=np.int64) if len(df) else np.array([], np.int64)
    return df


def compact_partitions(
    out_dir: str,
    compact_dir: str,
    key_col: str,
    target_bytes: int = 64 * 1024 * 1024,
) -> ray.data.Dataset:
    """Compact ``out_dir``'s lineage partitions into ``compact_dir``
    bins; returns the bin manifest dataset (bin, n_parts, n_rows,
    fingerprint, status)."""
    os.makedirs(compact_dir, exist_ok=True)
    plan = plan_bins(out_dir, target_bytes)

    def compact_bin(df: pd.DataFrame) -> pd.DataFrame:
        bin_id = int(df["bin"].iloc[0])
        df = df.sort_values("part", kind="mergesort")
        members = list(df["part"])
        want_fp = 0
        for f in df["fingerprint"]:
            want_fp ^= int(f)
        bin_dir = os.path.join(compact_dir, f"bin={bin_id}")
        man_path = os.path.join(bin_dir, "_MANIFEST.json")
        data_path = os.path.join(bin_dir, "data.parquet")
        if os.path.exists(man_path):
            with open(man_path) as f:
                man = json.load(f)
            if (
                man.get("members") == members
                and man.get("fingerprint") == want_fp
                and os.path.exists(data_path)
            ):
                return pd.DataFrame(
                    {
                        "bin": np.array([bin_id], np.int64),
                        "n_parts": np.array([len(members)], np.int64),
                        "n_rows": np.array([man["n_rows"]], np.int64),
                        "fingerprint": np.array([want_fp], np.int64),
                        "status": ["skipped"],
                    }
                )
        tables = [pq.read_table(p) for p in df["data_path"]]
        merged = pa.concat_tables(tables)
        got_fp = row_fingerprint(
            merged[key_col].to_numpy(zero_copy_only=False)
        )
        assert got_fp == want_fp, (
            f"bin {bin_id}: fingerprint mismatch vs source manifests "
            f"({got_fp} != {want_fp}) — source partition changed underfoot"
        )
        os.makedirs(bin_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=bin_dir, suffix=".tmp")
        os.close(fd)
        try:
            pq.write_table(merged, tmp)
            os.replace(tmp, data_path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        man = {
            "bin": bin_id,
            "members": members,
            "n_rows": int(merged.num_rows),
            "fingerprint": want_fp,
            "data_file": "data.parquet",
        }
        fd, tmp = tempfile.mkstemp(dir=bin_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(man, f)
        os.replace(tmp, man_path)
        return pd.DataFrame(
            {
                "bin": np.array([bin_id], np.int64),
                "n_parts": np.array([len(members)], np.int64),
                "n_rows": np.array([merged.num_rows], np.int64),
                "fingerprint": np.array([want_fp], np.int64),
                "status": ["written"],
            }
        )

    if len(plan) == 0:
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "bin": pd.Series([], dtype=np.int64),
                    "n_parts": pd.Series([], dtype=np.int64),
                    "n_rows": pd.Series([], dtype=np.int64),
                    "fingerprint": pd.Series([], dtype=np.int64),
                    "status": pd.Series([], dtype=object),
                }
            )
        )
    return (
        ray.data.from_pandas(plan)
        .groupby("bin")
        .map_groups(compact_bin, batch_format="pandas")
    )
