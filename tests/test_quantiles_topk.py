"""Exact distributed quantiles (histogram refinement) + grouped top-k:
numpy-rank parity, forced-refinement path, and DuckDB parity."""

import duckdb
import numpy as np
import pandas as pd

from aerial_conversion_ray.pipelines import relational


def test_quantiles_match_numpy_rank(sf_dir):
    got = relational.quantiles(sf_dir).to_pandas()
    vals = np.sort(
        pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"])[
            "l_extendedprice"
        ].to_numpy()
    )
    n = len(vals)
    for _, r in got.iterrows():
        assert r["value"] == vals[max(0, int(np.ceil(r["p"] * n)) - 1)]


def test_quantiles_refinement_path(sf_dir, monkeypatch):
    """Force the recursive re-histogram branch (bin count > limit) and
    assert the result is unchanged."""
    monkeypatch.setattr(relational, "QUANTILE_CAND_LIMIT", 10)
    got = relational.quantiles(sf_dir, ps=(0.5,)).to_pandas()
    vals = np.sort(
        pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"])[
            "l_extendedprice"
        ].to_numpy()
    )
    assert got["value"].iloc[0] == vals[max(0, int(np.ceil(0.5 * len(vals))) - 1)]


def test_top_docs_per_lang_matches_oracle(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    got = (
        relational.top_docs_per_lang(sf_dir)
        .to_pandas()
        .sort_values(["lang", "rank"])
        .reset_index(drop=True)
    )
    want = (
        con.execute(relational.top_docs_per_lang_sql())
        .df()
        .sort_values(["lang", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )
    assert (got.groupby("lang")["rank"].max() <= relational.TOPK_PER_GROUP_K).all()


def test_grouped_quantiles_match_oracle(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    got = (
        relational.grouped_quantiles(sf_dir)
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    want = (
        con.sql(relational.GROUPED_QUANTILES_SQL)
        .df()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )
    assert (got["p50"] <= got["p90"]).all() and (got["p90"] <= got["p99"]).all()


def test_mad_matches_numpy(sf_dir):
    import numpy as np
    import pandas as pd

    from aerial_conversion_ray.pipelines import relational

    got = relational.mad(sf_dir).to_pandas()
    v = np.sort(
        pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"])[
            "l_extendedprice"
        ].to_numpy(np.float64)
    )
    n = len(v)
    r = max(0, int(np.ceil(0.5 * n)) - 1)
    med = v[r]
    dev = np.sort(np.abs(v - med))
    exp_mad = dev[r]
    assert got["median"].iloc[0] == med
    assert got["mad"].iloc[0] == exp_mad


def test_grouped_mad_matches_oracle(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = (
        con.execute(relational.GROUPED_MAD_SQL)
        .df()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    got = (
        relational.grouped_mad(sf_dir)
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["lang", "median", "mad"]].astype({"median": np.int64, "mad": np.int64}),
        want[["lang", "median", "mad"]].astype({"median": np.int64, "mad": np.int64}),
    )


def test_sketch_quantiles_error_bound(sf_dir):
    """DDSketch guarantee: each estimate within relative error alpha of
    the exact discrete quantile."""
    alpha = relational.SKETCH_ALPHA
    got = relational.sketch_quantiles(sf_dir)
    vals = np.sort(
        pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"])[
            "l_extendedprice"
        ].to_numpy()
    )
    n = len(vals)
    for _, r in got.iterrows():
        exact = vals[max(0, int(np.ceil(r["p"] * n)) - 1)]
        assert abs(r["value"] - exact) <= alpha * exact + 1e-9


def test_sketch_merge_associativity(sf_dir):
    """The sketch is a pure bucket-count table: shard-and-add in any
    split must reproduce the whole-data sketch exactly."""
    alpha = relational.SKETCH_ALPHA
    gamma = (1.0 + alpha) / (1.0 - alpha)
    v = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"])[
        "l_extendedprice"
    ].to_numpy(np.float64)

    def sketch(x):
        idx = np.ceil(np.log(x) / np.log(gamma)).astype(np.int64)
        u, c = np.unique(idx, return_counts=True)
        return pd.DataFrame({"bucket_idx": u, "cnt": c.astype(np.int64)})

    whole = sketch(v)
    # three shards of different sizes, merged by addition
    parts = [sketch(s) for s in (v[: len(v) // 3], v[len(v) // 3 : 2 * len(v) // 3], v[2 * len(v) // 3 :]) if len(s)]
    merged = (
        pd.concat(parts)
        .groupby("bucket_idx", as_index=False)["cnt"]
        .sum()
        .sort_values("bucket_idx")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(merged, whole.sort_values("bucket_idx").reset_index(drop=True))
    a = relational.sketch_table_quantiles(merged, gamma, relational.SKETCH_PS)
    b = relational.sketch_table_quantiles(whole, gamma, relational.SKETCH_PS)
    pd.testing.assert_frame_equal(a, b)
    # and the distributed pipeline agrees with the single-process sketch
    got = relational.sketch_quantiles(sf_dir)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), b.reset_index(drop=True))
