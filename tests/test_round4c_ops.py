"""Round-4 third block: SCD type-2 intervals, CDC upsert apply,
nearest-facility assignment, grouped dense_rank, ordered string_agg —
engine-vs-pandas/numpy brute oracles (the exact SQL oracles run in
tools/check.py and the driver gate)."""

import numpy as np
import pandas as pd

from aerial_conversion_ray.pipelines import relational, spatial, text


def _brute_scd(sf_dir):
    ev = pd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    ).sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    rows = []
    for uid, g in ev.groupby("user_id", sort=False):
        prev = None
        runs = []
        for _, r in g.iterrows():
            if prev is None or r["event_type"] != prev:
                runs.append((r["event_type"], r["ts"]))
            prev = r["event_type"]
        for i, (et, vf) in enumerate(runs):
            vt = (
                runs[i + 1][1]
                if i + 1 < len(runs)
                else pd.Timestamp("9999-01-01")
            )
            rows.append((uid, et, vf, vt, int(i + 1 == len(runs))))
    return pd.DataFrame(
        rows, columns=["user_id", "event_type", "valid_from", "valid_to", "is_current"]
    )


def test_scd_intervals_matches_brute(sf_dir):
    got = (
        relational.scd_intervals(sf_dir)
        .to_pandas()
        .sort_values(["user_id", "valid_from", "event_type"])
        .reset_index(drop=True)
    )
    want = (
        _brute_scd(sf_dir)
        .sort_values(["user_id", "valid_from", "event_type"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ["user_id", "event_type", "is_current"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    assert (got["valid_from"].to_numpy() == want["valid_from"].to_numpy()).all()
    assert (got["valid_to"].to_numpy() == want["valid_to"].to_numpy()).all()
    # structural invariants: per user, intervals tile the run sequence
    assert (got.groupby("user_id")["is_current"].sum() == 1).all()


def test_upsert_apply_matches_brute(sf_dir):
    base = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    d = base["doc_id"].to_numpy(np.int64)
    upd = (d % 11 == 4) & (d % 13 != 6)
    dele = d % 13 == 6
    ins = d % 17 == 9
    keep = base[(~upd) & (~dele)].copy()
    keep["ver"] = 1
    edited = base[upd].copy()
    edited["n_chars"] += 1
    edited["ver"] = 2
    inserted = base[ins].copy()
    inserted["doc_id"] += 2_000_000
    inserted["ver"] = 2
    want = pd.concat([keep, edited, inserted]).sort_values("doc_id").reset_index(drop=True)
    got = (
        relational.upsert_apply(sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ["doc_id", "lang", "n_chars", "ver"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # tombstoned keys are gone, inserts are present
    assert not np.isin(d[dele], got["doc_id"].to_numpy()).any()
    assert np.isin(d[ins] + 2_000_000, got["doc_id"].to_numpy()).all()


def test_nearest_facility_matches_brute(sf_dir):
    from aerial_conversion_ray.geocode import geocode_arrays
    from aerial_conversion_ray.pipelines.spatial import FACILITIES, _hav_np

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    g = geocode_arrays(docs["doc_id"].to_numpy(np.int64))
    flon = np.array([f[1] for f in FACILITIES])
    flat = np.array([f[2] for f in FACILITIES])
    dmat = np.stack(
        [_hav_np(g["lon"], g["lat"], flon[j], flat[j]) for j in range(len(FACILITIES))],
        axis=1,
    )
    best = np.argmin(dmat, axis=1)
    mm = np.floor(dmat[np.arange(len(best)), best] * 1000.0 + 0.5).astype(np.int64)
    want = (
        pd.DataFrame({"facility_id": best.astype(np.int64), "mm": mm})
        .groupby("facility_id")
        .agg(n_pts=("mm", "size"), dist_mm_sum=("mm", "sum"), dist_mm_max=("mm", "max"))
        .reset_index()
    )
    got = (
        spatial.nearest_facility(sf_dir)
        .to_pandas()
        .sort_values("facility_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in want.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # the hot cluster must route to the adjacent facility (id 10)
    assert got.set_index("facility_id")["n_pts"].idxmax() == 10


def test_lang_rank_matches_pandas(sf_dir):
    docs = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    want_r = (
        docs.groupby("lang")["n_chars"].rank(method="dense", ascending=False).astype(np.int64)
    )
    want = docs.assign(rnk=want_r).sort_values("doc_id").reset_index(drop=True)
    got = text.lang_rank(sf_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(want)
    for c in ["doc_id", "lang", "n_chars", "rnk"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # every language's best doc has rank 1
    assert (got.groupby("lang")["rnk"].min() == 1).all()


def test_lang_sources_agg_matches_pandas(sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "source"])
    pairs = docs.drop_duplicates().sort_values(["lang", "source"])
    want = (
        pairs.groupby("lang")["source"]
        .agg(lambda s: ",".join(s))
        .reset_index(name="sources")
    )
    want["n_sources"] = pairs.groupby("lang")["source"].size().to_numpy(np.int64)
    got = (
        text.lang_sources_agg(sf_dir)
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ["lang", "sources", "n_sources"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
