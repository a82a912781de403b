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
