"""Round-4 seventh block: ops added in the round-4h continuation —
engine vs brute numpy oracles (the exact DuckDB oracles run in
tools/check.py and the driver gate)."""

import numpy as np
import pyarrow.parquet as pq


def test_hits_hosts_matches_brute(sf_dir):
    from aerial_conversion_ray.pipelines import linkgraph

    got = linkgraph.hits_hosts(sf_dir).to_pandas()
    edges = linkgraph.host_edges(sf_dir).to_pandas()
    hosts = np.unique(
        np.concatenate([edges["src_id"].values, edges["dst_id"].values])
    )
    s = np.searchsorted(hosts, edges["src_id"].values)
    d = np.searchsorted(hosts, edges["dst_id"].values)
    c = edges["cnt"].values.astype(np.int64)
    h = np.ones(len(hosts), dtype=np.int64)
    for _ in range(linkgraph.HITS_ITERS):
        a = np.zeros(len(hosts), dtype=np.int64)
        np.add.at(a, d, c * h[s])
        h = np.zeros(len(hosts), dtype=np.int64)
        np.add.at(h, s, c * a[d])
    got = got.sort_values("host").reset_index(drop=True)
    order = np.argsort([f"h{int(x)}.example" for x in hosts], kind="stable")
    assert (got["auth_num"].values == a[order]).all()
    assert (got["hub_num"].values == h[order]).all()
    # hot host 0 must dominate authorities (40% in-link skew)
    assert got.loc[got["host"] == "h0.example", "auth_num"].iloc[0] == got["auth_num"].max()


def test_hits_overflow_guard(sf_dir):
    import pytest

    from aerial_conversion_ray.pipelines import linkgraph

    with pytest.raises(ValueError, match="headroom"):
        linkgraph.hits_hosts(sf_dir, iters=16)


def test_orc_roundtrip_bit_exact(sf_dir):
    from aerial_conversion_ray.pipelines import extract

    got = (
        extract.orc_roundtrip(sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        pq.read_table(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "lang", "source", "n_chars", "text"],
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert got.equals(want)


def test_topic_tag_matches_brute(sf_dir):
    from aerial_conversion_ray.pipelines import text

    got = (
        text.topic_tag(sf_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    topics = [t for t, _ in text.TOPIC_TAXONOMY]
    kw = {w: i for i, (_, ws) in enumerate(text.TOPIC_TAXONOMY) for w in ws}
    for i, row in docs.iterrows():
        counts = [0] * len(topics)
        for tok in row["text"].split(" "):
            j = kw.get(tok)
            if j is not None:
                counts[j] += 1
        best = max(range(len(topics)), key=lambda j: (counts[j], -j))
        want_topic = topics[best] if counts[best] else "none"
        assert got.loc[i, "topic"] == want_topic, row["doc_id"]
        assert got.loc[i, "hits"] == counts[best]


def test_compression_ratio_matches_zlib(sf_dir):
    import zlib

    from aerial_conversion_ray.pipelines import text

    got = (
        text.compression_ratio(sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    raw = docs["text"].str.encode("utf-8")
    want_comp = raw.map(lambda b: len(zlib.compress(b, text.ZLIB_LEVEL)))
    assert (got["raw_len"].values == raw.map(len).values).all()
    assert (got["comp_len"].values == want_comp.values).all()
    assert (
        got["ratio_e6"].values
        == want_comp.values * 1_000_000 // np.maximum(raw.map(len).values, 1)
    ).all()
    # repetitious synthetic text over a ~30-word vocabulary compresses
    assert got["ratio_e6"].median() < 1_000_000
