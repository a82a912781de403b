"""Local stand-in for the driver's correctness gate.

Runs each ``queries()[name](sf_dir)`` and the matching
``oracle_sql()[name]`` in DuckDB, compares row count, column-name set,
and an order-insensitive value hash (columns sorted by name, rows
sorted by all columns).  Usage:

    python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(obj, ray.data.Dataset):
            return obj.to_pandas(limit=None)
    except ImportError:
        pass
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], bytes):
            df[c] = df[c].map(lambda b: b.hex())
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> int:
    return int(pd.util.hash_pandas_object(df, index=False).sum())


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a]

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as mod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")

    qs = mod.queries()
    oracles = mod.oracle_sql()
    names = names or list(qs)
    failures = 0
    for name in names:
        try:
            res = canon(to_pandas(qs[name](sf_dir)))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: engine raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"okROWS {name}: rows={len(res)} (no oracle; rows-only)")
            continue
        try:
            ora = canon(con.sql(oracles[name]).df())
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        problems = []
        if len(res) != len(ora):
            problems.append(f"rows {len(res)} != {len(ora)}")
        if list(res.columns) != list(ora.columns):
            problems.append(f"cols {list(res.columns)} != {list(ora.columns)}")
        if not problems:
            eq = res.equals(ora)
            if not eq:
                # locate first differing cell for debugging
                diffcols = [
                    c for c in res.columns
                    if not res[c].equals(ora[c])
                ]
                problems.append(f"values differ in {diffcols[:5]}")
                for c in diffcols[:2]:
                    a, b = res[c].to_numpy(), ora[c].to_numpy()
                    if a.dtype.kind == "f":
                        bad = np.nonzero(~((a == b) | (np.isnan(a) & np.isnan(b))))[0]
                    else:
                        bad = np.nonzero(a != b)[0]
                    if len(bad):
                        i = bad[0]
                        problems.append(f"  {c}[{i}]: {a[i]!r} vs {b[i]!r} ({len(bad)} diffs)")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"OK   {name}: rows={len(res)} hash={value_hash(res) & 0xFFFFFFFF:x}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
