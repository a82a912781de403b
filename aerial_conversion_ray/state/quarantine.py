"""Per-row error quarantine: continue-on-error semantics.

The reference captures each failed raster/vector pair's stderr into
``error.csv`` / ``error.pkl`` and keeps going
(``scripts/batch_geojson2coco.py:215-231``).  The engine equivalent is
a reusable guarded ``map_batches`` stage: a batch whose transform
raises is BISECTED to isolate the poison row(s); poison rows are
written to a quarantine Parquet sidecar (original columns + ``_error``
string, one atomically-renamed file per task call) and the remaining
rows flow on.  Cost on the happy path is zero — bisection only runs
after a raised batch.
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def _bisect(fn, t: pa.Table, bad: list):
    """Apply ``fn`` to ``t``; on error, split and recurse until the
    poison rows are isolated (log2(batch) extra calls per poison row).
    Returns the list of successful output tables."""
    try:
        return [fn(t)]
    except Exception as exc:  # noqa: BLE001 — quarantine ANY row error
        if t.num_rows <= 1:
            bad.append((t, repr(exc)))
            return []
        mid = t.num_rows // 2
        return _bisect(fn, t.slice(0, mid), bad) + _bisect(
            fn, t.slice(mid), bad
        )


def guarded_batch_fn(fn, quarantine_dir: str):
    """Wrap a pyarrow batch transform with per-row quarantine."""
    os.makedirs(quarantine_dir, exist_ok=True)

    def guarded(t: pa.Table) -> pa.Table:
        bad: list[tuple[pa.Table, str]] = []
        good = _bisect(fn, t, bad)
        if bad:
            rows = pa.concat_tables([b for b, _ in bad])
            errs = pa.array(
                [e for b, e in bad for _ in range(b.num_rows)], pa.string()
            )
            rows = rows.append_column("_error", errs)
            fd, tmp = tempfile.mkstemp(dir=quarantine_dir, suffix=".tmp")
            os.close(fd)
            try:
                pq.write_table(rows, tmp)
                os.replace(
                    tmp, os.path.join(quarantine_dir, f"bad-{uuid.uuid4().hex}.parquet")
                )
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
        if not good:
            return fn(t.slice(0, 0))  # empty output with the right schema
        return pa.concat_tables(good)

    return guarded


def guarded_map_batches(
    ds: ray.data.Dataset, fn, quarantine_dir: str, **map_kwargs
) -> ray.data.Dataset:
    """``ds.map_batches(fn)`` with per-row error routing into
    ``quarantine_dir`` (reference continue-on-error semantics)."""
    map_kwargs.setdefault("batch_format", "pyarrow")
    return ds.map_batches(guarded_batch_fn(fn, quarantine_dir), **map_kwargs)


def load_quarantine(quarantine_dir: str) -> pa.Table:
    """All quarantined rows (original columns + ``_error``)."""
    parts = [
        pq.read_table(os.path.join(quarantine_dir, f))
        for f in sorted(os.listdir(quarantine_dir))
        if f.endswith(".parquet")
    ] if os.path.isdir(quarantine_dir) else []
    if not parts:
        return pa.table({"_error": pa.array([], pa.string())})
    return pa.concat_tables(parts)
