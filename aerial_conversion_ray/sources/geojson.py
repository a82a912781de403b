"""GeoJSON FeatureCollection sink + source (S5 ``GeoJSON writer`` /
the ``coco2geojson.py:363`` ``to_file`` analog, and the S1 reader's
inverse).

Writer: ``groupby(part_col).map_groups`` — each partition key owns one
``part=<key>/data.geojson`` FeatureCollection written atomically (temp
file + ``os.replace``, same convention as ``state/lineage.py``); never
one giant file, so a reader can parallelize per partition and a failed
run rewrites only its partition.  Feature strings are built with
vectorized np.char concatenation over %.17g floats (bit round-trip for
float64) — no per-row Python string building.

Reader: ``ray.data.read_binary_files`` over the partition files — one
``json.loads`` per FILE (partition-granular, the same unit the
reference parses per GeoJSON input), then columnar extraction.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def feature_lines(
    page_id: np.ndarray,
    lang: np.ndarray,
    minx: np.ndarray,
    miny: np.ndarray,
    maxx: np.ndarray,
    maxy: np.ndarray,
) -> np.ndarray:
    """One GeoJSON Feature (rect Polygon + properties) string per row,
    vectorized."""
    a = np.char.mod("%.17g", np.asarray(minx, np.float64))
    b = np.char.mod("%.17g", np.asarray(miny, np.float64))
    c = np.char.mod("%.17g", np.asarray(maxx, np.float64))
    d = np.char.mod("%.17g", np.asarray(maxy, np.float64))
    pid = np.char.mod("%d", np.asarray(page_id, np.int64))
    lg = np.asarray(lang, dtype=str)

    def cat(*parts):
        out = parts[0]
        for p in parts[1:]:
            out = np.char.add(out, p)
        return out

    pt = lambda x, y: cat("[", x, ",", y, "]")  # noqa: E731
    ring = cat(
        "[[", pt(a, b), ",", pt(c, b), ",", pt(c, d), ",", pt(a, d), ",",
        pt(a, b), "]]",
    )
    return cat(
        '{"type":"Feature","properties":{"page_id":', pid,
        ',"lang":"', lg, '"},',
        '"geometry":{"type":"Polygon","coordinates":', ring, "}}",
    )


class GeoJsonPartitionWriter:
    """map_groups callable: one FeatureCollection file per partition,
    written atomically."""

    def __init__(self, out_dir: str, part_col: str):
        self.out_dir = out_dir
        self.part_col = part_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        key = df[self.part_col].iloc[0]
        df = df.sort_values("page_id", kind="mergesort").reset_index(drop=True)
        feats = feature_lines(
            df["page_id"].to_numpy(),
            df["lang"].to_numpy(),
            df["fp_minx"].to_numpy(),
            df["fp_miny"].to_numpy(),
            df["fp_maxx"].to_numpy(),
            df["fp_maxy"].to_numpy(),
        )
        doc = '{"type":"FeatureCollection","features":[' + ",".join(feats) + "]}"
        part_dir = os.path.join(self.out_dir, f"part={key}")
        os.makedirs(part_dir, exist_ok=True)
        path = os.path.join(part_dir, "data.geojson")
        fd, tmp = tempfile.mkstemp(dir=part_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            f.write(doc)
        os.replace(tmp, path)
        return pd.DataFrame(
            {"part": [str(key)], "n_features": np.array([len(df)], np.int64)}
        )


def write_geojson(
    ds: ray.data.Dataset, out_dir: str, part_col: str
) -> ray.data.Dataset:
    """Partitioned GeoJSON write; returns the per-partition manifest
    dataset (part, n_features)."""
    os.makedirs(out_dir, exist_ok=True)
    writer = GeoJsonPartitionWriter(out_dir, part_col)

    def write_partition(df: pd.DataFrame) -> pd.DataFrame:
        return writer(df)

    return ds.groupby(part_col).map_groups(write_partition, batch_format="pandas")


def read_geojson(out_dir: str) -> ray.data.Dataset:
    """Read a partitioned GeoJSON dataset back to rows (page_id, lang,
    fp_minx, fp_miny, fp_maxx, fp_maxy)."""
    paths = sorted(
        os.path.join(out_dir, name, "data.geojson")
        for name in os.listdir(out_dir)
        if name.startswith("part=")
    )
    files = ray.data.read_binary_files(paths)

    def parse(t: pa.Table) -> pa.Table:
        out = {
            "page_id": [], "lang": [],
            "fp_minx": [], "fp_miny": [], "fp_maxx": [], "fp_maxy": [],
        }
        for blob in t["bytes"]:
            fc = json.loads(blob.as_py())
            for ft in fc["features"]:
                ring = ft["geometry"]["coordinates"][0]
                xs = [p[0] for p in ring]
                ys = [p[1] for p in ring]
                out["page_id"].append(ft["properties"]["page_id"])
                out["lang"].append(ft["properties"]["lang"])
                out["fp_minx"].append(min(xs))
                out["fp_miny"].append(min(ys))
                out["fp_maxx"].append(max(xs))
                out["fp_maxy"].append(max(ys))
        return pa.table(
            {
                "page_id": pa.array(out["page_id"], pa.int64()),
                "lang": pa.array(out["lang"], pa.string()),
                "fp_minx": pa.array(out["fp_minx"], pa.float64()),
                "fp_miny": pa.array(out["fp_miny"], pa.float64()),
                "fp_maxx": pa.array(out["fp_maxx"], pa.float64()),
                "fp_maxy": pa.array(out["fp_maxy"], pa.float64()),
            }
        )

    return files.map_batches(parse, batch_format="pyarrow")
