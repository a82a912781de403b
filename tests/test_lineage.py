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


def test_compact_partitions_roundtrip_and_resume(sf_dir, tmp_path):
    """Compaction preserves every row, bin fingerprints equal the XOR
    of member-part fingerprints, re-running skips every bin, and a
    stale bin manifest forces a rewrite."""
    import json
    import os

    import pyarrow.parquet as pq

    from aerial_conversion_ray.config import EngineConfig
    from aerial_conversion_ray.pipelines import spatial
    from aerial_conversion_ray.state.compact import compact_partitions, plan_bins
    from aerial_conversion_ray.state.lineage import resumable_write

    out = str(tmp_path / "parts")
    comp = str(tmp_path / "bins")
    ds = spatial.tile_point_join(sf_dir, EngineConfig(pages_rep=20))
    man = resumable_write(ds, out, part_col="tile_id", key_col="page_id").to_pandas()
    n_parts = len(man)
    assert n_parts > 3

    # tiny target -> several bins
    plan = plan_bins(out, target_bytes=200_000)
    assert plan["bin"].nunique() > 1
    res = compact_partitions(out, comp, key_col="page_id", target_bytes=200_000)
    r = res.to_pandas()
    assert (r["status"] == "written").all()
    assert r["n_parts"].sum() == n_parts
    assert r["n_rows"].sum() == man["n_rows"].sum()
    # bin fingerprint == xor of members (recomputed independently)
    fp = dict(zip(man["part"], man["fingerprint"]))
    for bin_id, g in plan.groupby("bin"):
        want = 0
        for p in g["part"]:
            want ^= int(fp[p])
        got = json.load(open(os.path.join(comp, f"bin={bin_id}", "_MANIFEST.json")))
        assert got["fingerprint"] == want
    # every row survives into the compacted files
    total = sum(
        pq.read_table(os.path.join(comp, d, "data.parquet")).num_rows
        for d in os.listdir(comp)
        if d.startswith("bin=")
    )
    assert total == man["n_rows"].sum()

    # resume: everything skips
    r2 = compact_partitions(out, comp, key_col="page_id", target_bytes=200_000).to_pandas()
    assert (r2["status"] == "skipped").all()

    # stale manifest -> that bin rewrites
    victim = os.path.join(comp, "bin=0", "_MANIFEST.json")
    m = json.load(open(victim))
    m["fingerprint"] = m["fingerprint"] ^ 1
    json.dump(m, open(victim, "w"))
    r3 = compact_partitions(out, comp, key_col="page_id", target_bytes=200_000).to_pandas()
    st = dict(zip(r3["bin"], r3["status"]))
    assert st[0] == "written"
    assert all(v == "skipped" for k, v in st.items() if k != 0)
