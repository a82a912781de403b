"""Checkpoint-resume: exactly-once partitioned writes + manifests."""

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from aerial_conversion_ray.config import EngineConfig
from aerial_conversion_ray.pipelines import spatial
from aerial_conversion_ray.state.lineage import (
    load_manifests,
    resumable_write,
    row_fingerprint,
)

CFG = EngineConfig(pages_rep=4)


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "out")


def _write(sf_dir, out_dir):
    ds = spatial.tile_point_join(sf_dir, CFG)
    return (
        resumable_write(ds, out_dir, part_col="tile_id", key_col="page_id")
        .to_pandas()
        .sort_values("part")
        .reset_index(drop=True)
    )


def test_write_then_resume_skips(sf_dir, out_dir):
    first = _write(sf_dir, out_dir)
    assert (first["status"] == "written").all()
    again = _write(sf_dir, out_dir)
    assert (again["status"] == "skipped").all()
    # identical manifests both times
    pd.testing.assert_frame_equal(
        first[["part", "n_rows", "fingerprint"]],
        again[["part", "n_rows", "fingerprint"]],
    )


def test_partial_failure_rewrites_only_missing(sf_dir, out_dir):
    first = _write(sf_dir, out_dir)
    victims = sorted(first["part"])[:2]
    for v in victims:
        shutil.rmtree(os.path.join(out_dir, f"part={v}"))
    second = _write(sf_dir, out_dir)
    by_part = dict(zip(second["part"], second["status"]))
    for p, st in by_part.items():
        assert st == ("written" if p in victims else "skipped")


def test_fingerprint_mismatch_forces_rewrite(sf_dir, out_dir):
    first = _write(sf_dir, out_dir)
    victim = sorted(first["part"])[0]
    man_path = os.path.join(out_dir, f"part={victim}", "_MANIFEST.json")
    with open(man_path) as f:
        man = json.load(f)
    man["fingerprint"] = man["fingerprint"] ^ 1
    with open(man_path, "w") as f:
        json.dump(man, f)
    second = _write(sf_dir, out_dir)
    assert dict(zip(second["part"], second["status"]))[victim] == "written"


def test_roundtrip_rows_complete(sf_dir, out_dir):
    manifest = _write(sf_dir, out_dir)
    want = (
        spatial.tile_point_join(sf_dir, CFG)
        .select_columns(["page_id"])
        .to_pandas()["page_id"]
        .to_numpy()
    )
    got = []
    for name in os.listdir(out_dir):
        if name.startswith("part="):
            got.append(
                pq.read_table(os.path.join(out_dir, name, "data.parquet"))[
                    "page_id"
                ].to_numpy()
            )
    got = np.sort(np.concatenate(got))
    np.testing.assert_array_equal(got, np.sort(want))
    assert manifest["n_rows"].sum() == len(want)
    # manifest fingerprints recomputable from the data files
    mans = load_manifests(out_dir)
    for _, row in mans.iterrows():
        keys = pq.read_table(
            os.path.join(out_dir, f"part={row['part']}", row["data_file"])
        )["page_id"].to_numpy()
        assert row_fingerprint(keys) == row["fingerprint"]
