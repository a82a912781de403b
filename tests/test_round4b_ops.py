"""Round-4 second block: inverted index, bloom semi-join, full outer
join, crawl path — engine-vs-direct-computation checks (the SQL
oracles run in tools/check.py)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from aerial_conversion_ray.pipelines import relational, spatial, text


def test_inverted_index_matches_pandas(sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    rows = []
    for did, txt in zip(docs["doc_id"], docs["text"]):
        for tok in txt.split(" "):
            rows.append((tok, did))
    df = pd.DataFrame(rows, columns=["token", "doc_id"])
    tf = df.groupby(["token", "doc_id"]).size().reset_index(name="tf")
    want = tf.groupby("token").agg(
        df_=("doc_id", "size"),
        total_tf=("tf", "sum"),
        postings=("tf", "count"),  # placeholder, rebuilt below
    )
    got = text.inverted_index(sf_dir).to_pandas().set_index("token").sort_index()
    assert len(got) == len(want)
    assert (got["df"].sort_index() == want["df_"].sort_index()).all()
    assert (got["total_tf"].sort_index() == want["total_tf"].sort_index()).all()
    # spot-check one hot and one rare token's posting string
    for tok in [got["df"].idxmax(), got["df"].idxmin()]:
        sub = tf[tf["token"] == tok].sort_values("doc_id")
        expect = ",".join(f"{d}:{t}" for d, t in zip(sub["doc_id"], sub["tf"]))
        assert got.loc[tok, "postings"] == expect


def test_bloom_semi_join_matches_plain_filter(sf_dir):
    """Bloom prefilter + exact verify == the plain predicate result
    (the bloom stage must be output-invisible)."""
    out = (
        relational.bloom_semi_join(sf_dir)
        .to_pandas()
        .sort_values(["l_orderkey", "l_partkey", "l_quantity"])
        .reset_index(drop=True)
    )
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_quantity"],
    )
    part = pd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size"])
    keys = set(part[part["p_size"] >= relational.BLOOM_SIZE_CUT]["p_partkey"])
    want = (
        li[li["l_partkey"].isin(keys)]
        .sort_values(["l_orderkey", "l_partkey", "l_quantity"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[sorted(out.columns)], want[sorted(want.columns)])


def test_full_outer_join_has_both_unmatched_sides(sf_dir):
    out = relational.full_outer_join(sf_dir).to_pandas()
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    assert set(out["key"]) == set(cust["c_custkey"]) | set(ev["user_id"])
    only_cust = set(cust["c_custkey"]) - set(ev["user_id"])
    only_ev = set(ev["user_id"]) - set(cust["c_custkey"])
    if only_cust:
        sub = out[out["key"].isin(list(only_cust))]
        assert (sub["n_events"] == 0).all() and (sub["is_customer"] == 1).all()
    if only_ev:
        sub = out[out["key"].isin(list(only_ev))]
        assert (sub["is_customer"] == 0).all() and (sub["n_events"] > 0).all()


def test_crawl_path_one_source_direct(sf_dir):
    out = spatial.crawl_path(sf_dir).to_pandas().set_index("source")
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    ).to_pandas()
    src = docs["source"].iloc[0]
    doc_ids = np.sort(docs[docs["source"] == src]["doc_id"].to_numpy())
    rep = spatial._CP_REP
    page_ids = np.sort(
        (doc_ids[:, None] * rep + np.arange(rep)[None, :]).ravel()
    )
    from aerial_conversion_ray.geocode import geocode_arrays

    g = geocode_arrays(page_ids)
    d = spatial._hav_np(g["lon"][:-1], g["lat"][:-1], g["lon"][1:], g["lat"][1:])
    mm = np.floor(d * 1000.0 + 0.5).astype(np.int64)
    assert out.loc[src, "n_legs"] == len(mm)
    assert out.loc[src, "dist_mm_total"] == mm.sum()
    assert out.loc[src, "dist_mm_max"] == mm.max()


def test_skyline_matches_brute_dominance(sf_dir):
    out = relational.skyline(sf_dir).to_pandas()
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
    ).to_pandas()
    q = li["l_quantity"].to_numpy()
    p = li["l_extendedprice"].to_numpy()
    # O(n^2) dominance in chunks (maximize q, minimize p)
    keep = np.ones(len(q), bool)
    for lo in range(0, len(q), 2000):
        hi = min(lo + 2000, len(q))
        dom = (
            (q[None, :] > q[lo:hi, None]) & (p[None, :] <= p[lo:hi, None])
        ) | ((q[None, :] == q[lo:hi, None]) & (p[None, :] < p[lo:hi, None]))
        keep[lo:hi] = ~dom.any(axis=1)
    exp = (
        li[keep]
        .sort_values(["l_orderkey", "l_linenumber"])
        .reset_index(drop=True)
    )
    got = out.sort_values(["l_orderkey", "l_linenumber"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_grouped_ols_matches_lstsq(sf_dir):
    """Closed-form distributed coefficients == numpy lstsq per group."""
    out = text.grouped_ols(sf_dir).to_pandas().set_index(["lang", "source"])
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["lang", "source", "text", "n_chars"],
    ).to_pandas()
    docs["x"] = docs["text"].str.split(" ").str.len()
    for (lang, src), g in list(docs.groupby(["lang", "source"]))[:10]:
        if g["x"].nunique() < 2:
            assert (lang, src) not in out.index  # degenerate fit dropped
            continue
        A = np.stack([g["x"].to_numpy(float), np.ones(len(g))], axis=1)
        coef, *_ = np.linalg.lstsq(A, g["n_chars"].to_numpy(float), rcond=None)
        row = out.loc[(lang, src)]
        assert row["n"] == len(g)
        assert abs(row["slope"] - coef[0]) < 1e-6 * max(1, abs(coef[0]))
        assert abs(row["intercept"] - coef[1]) < 1e-4 * max(1, abs(coef[1]))


def test_attribution_last_touch_brute(sf_dir):
    """Engine attribution == per-purchase linear scan on the driver."""
    out = (
        relational.attribution_last_touch(sf_dir)
        .to_pandas()
        .set_index("purchase_event_id")
        .sort_index()
    )
    ev = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    ).to_pandas()
    ev = ev[ev["event_type"].isin(["click", "purchase"])]
    exp = {}
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        last_click = None
        for row in g.itertuples():
            if row.event_type == "click":
                last_click = row
            elif last_click is not None:
                exp[row.event_id] = (last_click.event_id, last_click.ts)
    assert set(out.index) == set(exp)
    for pid, (cid, cts) in exp.items():
        assert out.loc[pid, "click_event_id"] == cid
        assert out.loc[pid, "click_ts"] == cts


def test_table_diff_statuses(sf_dir):
    out = relational.table_diff(sf_dir).to_pandas()
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]).to_pandas()
    d = docs["doc_id"].to_numpy(np.int64)
    removed = set(d[d % 97 == 3])
    changed = set(d[(d % 101 == 7) & (d % 97 != 3)])
    added = set((d[(d % 97 != 3) & (d % 103 == 5)] + 1_000_000))
    got = out.groupby("status")["doc_id"].apply(set).to_dict()
    assert got.get("removed", set()) == removed
    assert got.get("changed", set()) == changed
    assert got.get("added", set()) == added
