"""Round-4 fifth block: time-RANGE window aggregate — engine vs a
brute pandas oracle (the exact DuckDB RANGE-frame oracle runs in
tools/check.py and the driver gate)."""

import numpy as np
import pandas as pd

from aerial_conversion_ray.pipelines import relational


def _brute_time_window(sf_dir, w_s):
    ev = pd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )
    ts_us = ev["ts"].to_numpy("datetime64[us]").astype(np.int64)
    ev = ev.assign(
        ts_us=ts_us,
        value_u=np.floor(ev["value"].to_numpy() * 1_000_000.0 + 0.5).astype(np.int64),
    )
    rows = []
    for _, g in ev.groupby("user_id"):
        t = g["ts_us"].to_numpy()
        v = g["value_u"].to_numpy()
        for i in range(len(g)):
            m = (t >= t[i] - w_s * 1_000_000) & (t <= t[i])
            rows.append(
                (
                    int(g["event_id"].iloc[i]),
                    int(g["user_id"].iloc[i]),
                    int(m.sum()),
                    int(v[m].sum()),
                )
            )
    return pd.DataFrame(rows, columns=["event_id", "user_id", "n_w", "sum_w_u"])


def test_events_time_window_matches_brute(sf_dir):
    w_s = relational.TIME_WINDOW_S
    want = (
        _brute_time_window(sf_dir, w_s).sort_values("event_id").reset_index(drop=True)
    )
    got = (
        relational.events_time_window(sf_dir, w_s)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ["event_id", "user_id", "n_w", "sum_w_u"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # windows must be non-trivial somewhere: at least one multi-event frame
    assert got["n_w"].max() > 1


def test_events_time_window_tie_peers():
    # equal-ts rows are peers: every tie sees the full peer group,
    # and a probe can never cross a user boundary (gap logic).
    import pyarrow as pa
    import ray.data

    ts = np.array(
        ["2020-01-01T00:00:00", "2020-01-01T00:30:00",
         "2020-01-01T01:10:00", "2020-01-01T01:10:00",
         "2020-01-01T00:59:59"],
        dtype="datetime64[us]",
    )
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "ts": pa.array(ts),
            "user_id": pa.array([7, 7, 7, 7, 8], pa.int64()),
            "value": pa.array([10.0, 20.0, 30.0, 40.0, 5.0]),
        }
    )
    import tempfile, pyarrow.parquet as pq, os

    d = tempfile.mkdtemp(prefix="tw_")
    pq.write_table(t, os.path.join(d, "events.parquet"))
    got = (
        relational.events_time_window(d, 3600)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # user 7 @01:10 frame = [00:10, 01:10]: rows 2,3,4 -> n=3 sum=90e6
    assert list(got["n_w"]) == [1, 2, 3, 3, 1]
    assert list(got["sum_w_u"]) == [
        10_000_000, 30_000_000, 90_000_000, 90_000_000, 5_000_000
    ]


def _brute_lang_hh(sf_dir, k):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
    from collections import Counter, defaultdict

    per = defaultdict(Counter)
    for lang, text in zip(docs["lang"], docs["text"]):
        per[lang].update(text.split(" "))
    rows = []
    for lang, ctr in per.items():
        best = sorted(ctr.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        for r, (tok, n) in enumerate(best, 1):
            rows.append((lang, tok, n, r))
    return (
        pd.DataFrame(rows, columns=["lang", "token", "n", "rank"])
        .sort_values(["lang", "rank"])
        .reset_index(drop=True)
    )


def test_lang_heavy_hitters_matches_brute(sf_dir):
    from aerial_conversion_ray.pipelines import text as T

    k = T.LANG_HH_K
    want = _brute_lang_hh(sf_dir, k)
    got = (
        T.lang_heavy_hitters(sf_dir, k)
        .to_pandas()
        .sort_values(["lang", "rank"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ["lang", "token", "n", "rank"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    assert got.groupby("lang")["rank"].max().eq(k).all()
