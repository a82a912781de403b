"""Round-4 fourth block: exact duplicated-5-gram mass (suffix dedup),
NTILE(4) within language, k=3 broadcast kNN join, robots.txt-style
prefix filtering — engine-vs-pandas/numpy brute oracles (the exact
SQL oracles run in tools/check.py and the driver gate)."""

import numpy as np
import pandas as pd

from aerial_conversion_ray.pipelines import linkgraph, spatial, text


def _brute_suffix(sf_dir, w=5):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    from collections import Counter

    tot = Counter()
    per_doc = []
    for _, r in docs.iterrows():
        toks = r["text"].split(" ")
        grams = [" ".join(toks[i : i + w]) for i in range(max(len(toks) - w + 1, 0))]
        per_doc.append((int(r["doc_id"]), len(toks), grams))
        tot.update(grams)
    rows = []
    for doc_id, nt, grams in per_doc:
        dup = sum(1 for g in grams if tot[g] > 1)
        rows.append((doc_id, max(nt - w + 1, 0), dup))
    return pd.DataFrame(rows, columns=["doc_id", "n_grams", "dup_grams"])


def test_suffix_dedup_matches_brute(sf_dir):
    want = _brute_suffix(sf_dir).sort_values("doc_id").reset_index(drop=True)
    got = (
        text.suffix_dedup(sf_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ["doc_id", "n_grams", "dup_grams"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # the synthetic corpus repeats template spans: some dup mass must exist
    assert got["dup_grams"].sum() > 0
    assert (got["dup_grams"] <= got["n_grams"]).all()


def test_ntile_lang_matches_duckdb_semantics(sf_dir):
    import duckdb

    want = duckdb.sql(
        f"""select doc_id, cast(ntile(4) over (partition by lang
                order by n_chars, doc_id) as bigint) as tile4
            from read_parquet('{sf_dir}/documents.parquet')
            order by doc_id"""
    ).df()
    got = text.ntile_lang(sf_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (got["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()
    assert (got["tile4"].to_numpy() == want["tile4"].to_numpy()).all()
    # quartiles are balanced: per lang, bucket sizes differ by <= 1
    sizes = got.groupby(["lang", "tile4"]).size().groupby("lang")
    assert ((sizes.max() - sizes.min()) <= 1).all()


def test_knn_join_matches_brute(sf_dir):
    from aerial_conversion_ray.geocode import geocode_arrays
    from aerial_conversion_ray.pipelines.spatial import FACILITIES, _hav_np

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = docs["doc_id"].to_numpy(np.int64)
    g = geocode_arrays(ids)
    flon = np.array([f[1] for f in FACILITIES])
    flat = np.array([f[2] for f in FACILITIES])
    dmat = np.stack(
        [_hav_np(g["lon"], g["lat"], flon[j], flat[j]) for j in range(len(FACILITIES))],
        axis=1,
    )
    order = np.argsort(dmat, axis=1, kind="stable")[:, :3]
    got = (
        spatial.knn_join(sf_dir)
        .to_pandas()
        .sort_values(["doc_id", "rnk"])
        .reset_index(drop=True)
    )
    assert len(got) == 3 * len(ids)
    srt = np.argsort(ids, kind="stable")
    want_fac = np.array([f[0] for f in FACILITIES])[order][srt].ravel()
    assert (got["facility_id"].to_numpy() == want_fac).all()
    # rank 1 must agree with nearest_facility's argmin
    r1 = got[got["rnk"] == 1].set_index("doc_id")["facility_id"]
    best = np.argmin(dmat, axis=1)
    assert (r1.loc[ids].to_numpy() == np.array([f[0] for f in FACILITIES])[best]).all()
    # distances are non-decreasing in rank
    by_doc = got.sort_values(["doc_id", "rnk"])["dist_mm"].to_numpy().reshape(-1, 3)
    assert (np.diff(by_doc, axis=1) >= 0).all()


def test_robots_filter_blocks_prefixes(sf_dir):
    got = linkgraph.robots_filter(sf_dir).to_pandas()
    # no surviving url starts with any rule prefix
    for pre in linkgraph.ROBOTS_RULES:
        assert not got["url"].str.startswith(pre).any(), pre
    # it actually filters something, and only rule-matched pages are gone
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    urls = (
        "https://"
        + docs["source"]
        + ".example/doc/"
        + docs["doc_id"].astype(str)
        + "/p/0"
    )
    blocked = np.zeros(len(urls), dtype=bool)
    for pre in linkgraph.ROBOTS_RULES:
        blocked |= urls.str.startswith(pre).to_numpy()
    assert len(got) == (~blocked).sum()
    assert blocked.sum() > 0
