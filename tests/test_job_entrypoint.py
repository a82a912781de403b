"""tools/job.py — the `ray job submit` surface: metrics JSON shape +
exactly-once lineage resume on re-submit."""

import json
import subprocess
import sys
import tempfile


def _run(args):
    out = subprocess.run(
        [sys.executable, "tools/job.py", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def test_job_list_and_count(sf_dir):
    names = subprocess.run(
        [sys.executable, "tools/job.py", "--list"],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    ).stdout.split()
    assert "tile_point_join" in names and len(names) > 100
    m = _run(["host_degree", "--sf-dir", sf_dir, "--num-cpus", "4"])
    assert m["rows"] == 64 and m["sec"] > 0


def test_job_resume_skips_finished_partitions(sf_dir):
    out_dir = tempfile.mkdtemp(prefix="job_resume_")
    a = _run(["tile_point_join", "--sf-dir", sf_dir, "--out", out_dir,
              "--part-col", "tile_id", "--key-col", "page_id", "--num-cpus", "4"])
    assert a["written"] > 0 and a["skipped"] == 0
    b = _run(["tile_point_join", "--sf-dir", sf_dir, "--out", out_dir,
              "--part-col", "tile_id", "--key-col", "page_id", "--num-cpus", "4"])
    assert b["written"] == 0 and b["skipped"] == a["written"]
    assert b["rows_total"] == a["rows_total"]
