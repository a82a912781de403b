"""Link-graph suite: general href extraction + integer-exact
PageRank invariants."""

import numpy as np
import pyarrow as pa

from aerial_conversion_ray.pipelines import linkgraph as lg


def test_extract_links_general_html():
    """The extractor is a general href scanner, not shaped to the
    synthetic variant: arbitrary counts (incl. zero), single quotes
    ignored, document order preserved."""
    htmls = [
        '<p>no links at all</p>',
        '<a href="https://a.example/x">one</a>',
        'pre <a href="https://b.example/1">x</a> mid '
        '<img src="i.png"/><a href="https://c.example/2?q=1">y</a> post',
        "<a href='https://notdouble.example/'>single-quoted: skipped</a>",
    ]
    t = pa.table(
        {
            "page_id": pa.array(range(len(htmls)), pa.int64()),
            "html": pa.array(htmls),
        }
    )
    out = lg.extract_links_batch(t).to_pandas()
    assert list(out["page_id"]) == [1, 2, 2]
    assert list(out["link_pos"]) == [0, 0, 1]
    assert list(out["href"]) == [
        "https://a.example/x",
        "https://b.example/1",
        "https://c.example/2?q=1",
    ]
    assert list(out["dst_host"]) == ["a.example", "b.example", "c.example"]


def test_pagerank_mass_and_hot_host(sf_dir):
    """Fixed-point PageRank: total mass bounded by the scale (mass
    only leaks via dangling hosts / floor division), every rank >=
    the damping floor, and the constructed hot host (40% of links)
    ranks first."""
    t = lg.pagerank_hosts(sf_dir).to_pandas()
    assert len(t) == lg.NH
    total = int(t["pr_num"].sum())
    assert total <= lg.PR_SCALE
    assert total > lg.PR_SCALE * 0.9  # floors lose only tiny mass
    n = len(t)
    base = (15 * lg.PR_SCALE) // (100 * n)
    assert (t["pr_num"] >= base).all()
    hot = t.loc[t["pr_num"].idxmax(), "host"]
    assert hot == f"h{lg._HOT_DST}.example"
    # hot host holds a plurality comparable to its 40% in-link share
    assert t["pr_num"].max() > 5 * np.median(t["pr_num"])


def test_host_degree_conservation(sf_dir):
    """Sum of out_links == sum of in_links == total extracted link
    rows (every edge counted exactly once per side)."""
    deg = lg.host_degree(sf_dir).to_pandas()
    n_links = lg.link_extract(sf_dir).count()
    assert int(deg["out_links"].sum()) == n_links
    assert int(deg["in_links"].sum()) == n_links


def test_host_cocitation_matches_brute(sf_dir):
    """Engine pairs == pandas brute force over the weighted edges."""
    import itertools

    import pandas as pd

    e = lg.host_edges(sf_dir).to_pandas()
    want = {}
    for _, g in e.groupby("dst_id"):
        g = g.sort_values("src_id")
        for (sa, ca), (sb, cb) in itertools.combinations(
            zip(g["src_id"], g["cnt"]), 2
        ):
            k = (sa, sb)
            n, w = want.get(k, (0, 0))
            want[k] = (n + 1, w + min(ca, cb))
    out = lg.host_cocitation(sf_dir).to_pandas()
    got = {
        (a, b): (n, w)
        for a, b, n, w in zip(
            out["a_id"], out["b_id"], out["n_shared"], out["w_min"]
        )
    }
    assert got == want


def test_lpa_communities_python_oracle(sf_dir):
    """Independent python LPA (dict tallies, same sync/tie/hub rules)
    must match the engine exactly, and the result must be non-trivial
    (more than one community)."""
    import numpy as np

    from aerial_conversion_ray.pipelines import linkgraph

    edges = linkgraph.host_edges(sf_dir).to_pandas()
    hosts = sorted(
        set(edges["src_id"].tolist()) | set(edges["dst_id"].tolist())
    )
    lbl = {h: h for h in hosts}
    e = edges[
        (edges["src_id"] != linkgraph._HOT_DST)
        & (edges["dst_id"] != linkgraph._HOT_DST)
    ]
    for _ in range(linkgraph.LPA_ITERS):
        tally = {}
        for s, d, c in zip(e["src_id"], e["dst_id"], e["cnt"]):
            tally.setdefault(d, {}).setdefault(lbl[s], 0)
            tally[d][lbl[s]] += c
            tally.setdefault(s, {}).setdefault(lbl[d], 0)
            tally[s][lbl[d]] += c
        lbl = {
            h: (
                min(
                    tally[h],
                    key=lambda l_: (-tally[h][l_], l_),
                )
                if h in tally
                else lbl[h]
            )
            for h in hosts
        }
    res = linkgraph.lpa_communities(sf_dir).to_pandas()
    got = dict(zip(res["host"], res["community"]))
    for h in hosts:
        assert got[f"h{h}.example"] == lbl[h], h
    assert len(set(lbl.values())) > 1


def test_pagerank_personalized_seed_locality(sf_dir):
    """Teleport mass only enters at the seeds: every host with
    positive personalized rank must be reachable from the seed set,
    seeds carry at least the teleport base, and the hub (excluded
    from the seeds) still accumulates link mass."""
    import numpy as np

    from aerial_conversion_ray.pipelines import linkgraph

    res = linkgraph.pagerank_personalized(sf_dir).to_pandas()
    ppr = dict(zip(res["host"], res["ppr_num"]))
    base = (15 * linkgraph.PR_SCALE) // (100 * len(linkgraph.PPR_SEEDS))
    for s in linkgraph.PPR_SEEDS:
        assert ppr[f"h{s}.example"] >= base
    # reachability from seeds over the directed edge set
    edges = linkgraph.host_edges(sf_dir).to_pandas()
    adj = {}
    for a, b in zip(edges["src_id"], edges["dst_id"]):
        adj.setdefault(int(a), set()).add(int(b))
    seen = set(linkgraph.PPR_SEEDS)
    frontier = set(linkgraph.PPR_SEEDS)
    while frontier:
        nxt = set()
        for u in frontier:
            nxt |= adj.get(u, set()) - seen
        seen |= nxt
        frontier = nxt
    for host, v in ppr.items():
        hid = int(host[1:].split(".")[0])
        if v > 0:
            assert hid in seen, host
    assert ppr["h0.example"] > 0  # hub receives propagated mass
