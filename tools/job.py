"""Cluster job entrypoint — the ``ray job submit`` surface.

On a real cluster:

    ray job submit --working-dir /root/repo -- \
        python tools/job.py tile_point_join \
            --sf-dir /data/corpus --out /data/out/tile_join --part-col tile_id

Locally (single node) the same command works as a plain script; the
session is created with ``address="auto"`` under a job driver (Ray
injects the cluster address) and falls back to a local session
otherwise.  This is the ONLY module besides bench.py and the test
fixture that owns a Ray session — the library never calls ray.init.

- ``<query>`` is any ``queries()`` entry from ``__ray_entry__``
  (``--list`` prints them all);
- with ``--out`` the result is written as partitioned parquet through
  the per-partition LINEAGE manifests (state/lineage.py): a re-submit
  of the same job after a failure skips finished partitions —
  exactly-once output, the checkpoint-resume path of the north rule;
- one JSON metrics line goes to stdout (rows, seconds, partitions
  written/skipped) for the job log.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("query", nargs="?", help="queries() entry to run")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=None, help="partitioned parquet output dir")
    ap.add_argument("--part-col", default=None, help="partition column for --out")
    ap.add_argument("--key-col", default=None, help="lineage fingerprint key column")
    ap.add_argument("--num-cpus", type=int, default=None, help="local-mode CPU cap")
    ap.add_argument("--list", action="store_true", help="list available queries")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        addr = os.environ.get("RAY_ADDRESS")
        if addr and addr not in ("", "local"):
            ray.init(address="auto", logging_level="ERROR")
        else:
            ray.init(
                address="local",
                num_cpus=args.num_cpus,
                include_dashboard=False,
                logging_level="ERROR",
            )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    if args.list or not args.query:
        for name in sorted(qs):
            print(name)
        return 0
    if args.query not in qs:
        print(f"unknown query {args.query!r}; use --list", file=sys.stderr)
        return 2

    t0 = time.perf_counter()
    res = qs[args.query](args.sf_dir)
    metrics: dict = {"query": args.query, "sf_dir": args.sf_dir}

    if args.out:
        import ray.data

        if not isinstance(res, ray.data.Dataset):
            import pyarrow as pa

            res = ray.data.from_arrow(
                res if isinstance(res, pa.Table) else pa.Table.from_pandas(res)
            )
        part_col = args.part_col or res.schema().names[0]
        key_col = args.key_col or res.schema().names[0]
        from aerial_conversion_ray.state.lineage import resumable_write

        stats = resumable_write(res, args.out, part_col=part_col, key_col=key_col)
        metrics["out"] = args.out
        df = stats.to_pandas()  # manifest: (part, n_rows, fingerprint, status)
        metrics["partitions"] = int(len(df))
        metrics["rows_total"] = int(df["n_rows"].sum())
        metrics["written"] = int((df["status"] == "written").sum())
        metrics["skipped"] = int((df["status"] == "skipped").sum())
    else:
        import ray.data

        rows = int(res.count()) if isinstance(res, ray.data.Dataset) else len(res)
        metrics["rows"] = rows

    metrics["sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(metrics))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
