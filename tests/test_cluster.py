"""Connected-components dup clustering: random-graph parity against an
independent numpy union-find, plus DuckDB parity for the gated queries."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from aerial_conversion_ray.pipelines import cluster


def _union_find(n_nodes, edges):
    parent = np.arange(n_nodes)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return np.array([find(i) for i in range(n_nodes)])


def test_connected_components_random_graph():
    import ray.data

    rng = np.random.default_rng(42)
    n = 300
    m = 220
    a = rng.integers(0, n, m).astype(np.int64)
    b = rng.integers(0, n, m).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    edges = ray.data.from_arrow(pa.table({"a": pa.array(a), "b": pa.array(b)}))
    nodes = ray.data.from_arrow(
        pa.table({"node": pa.array(np.arange(n, dtype=np.int64))})
    )
    got = (
        cluster.connected_components(edges, nodes)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # oracle: min-root union-find, then relabel every root to the
    # component's true min node id
    root = _union_find(n, zip(a, b))
    mins = pd.Series(np.arange(n)).groupby(root).transform("min").to_numpy()
    assert (got["doc_id"].to_numpy() == np.arange(n)).all()
    assert (got["cluster_id"].to_numpy() == mins).all()


def test_dup_clusters_matches_oracle(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    got = (
        cluster.dup_clusters(sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        con.execute(cluster.dup_clusters_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # at least one non-trivial cluster in the synthetic corpus
    assert (got["cluster_id"] != got["doc_id"]).any()


def test_near_dedup_partitions_corpus(sf_dir):
    got = cluster.near_dedup(sf_dir).to_pandas()
    clusters = cluster.dup_clusters(sf_dir).to_pandas()
    # representatives are exactly the cluster ids; sizes partition docs
    assert set(got["doc_id"]) == set(clusters["cluster_id"])
    assert got["cluster_size"].sum() == len(clusters)
    assert (got["cluster_size"] >= 1).all()


def test_distributed_loop_matches_fast_path(monkeypatch):
    """Force the distributed min-label loop (SMALL_EDGE_ROWS=0) on the
    same random graph and assert it equals the driver fast path."""
    import ray.data

    rng = np.random.default_rng(7)
    n = 120
    a = rng.integers(0, n, 90).astype(np.int64)
    b = rng.integers(0, n, 90).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]

    def run():
        edges = ray.data.from_arrow(pa.table({"a": pa.array(a), "b": pa.array(b)}))
        nodes = ray.data.from_arrow(
            pa.table({"node": pa.array(np.arange(n, dtype=np.int64))})
        )
        return (
            cluster.connected_components(edges, nodes)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    fast = run()
    monkeypatch.setattr(cluster, "SMALL_EDGE_ROWS", 0)
    dist = run()
    assert (fast["doc_id"].to_numpy() == dist["doc_id"].to_numpy()).all()
    assert (fast["cluster_id"].to_numpy() == dist["cluster_id"].to_numpy()).all()


def test_triangle_count_matches_bruteforce(sf_dir):
    """Exact parity with a driver-side numpy triangle enumeration
    over the same mined edge set."""
    import numpy as np
    import pandas as pd

    from aerial_conversion_ray.pipelines import cluster, text

    got = (
        cluster.triangle_count(sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    edges = (
        text.jaccard_pairs(sf_dir, cluster.TRI_THRESHOLD, cluster.DEFAULT_MAX_DF)
        .to_pandas()[["a", "b"]]
        .drop_duplicates()
    )
    eset = set(map(tuple, edges.to_numpy()))
    adj: dict = {}
    for a, b in eset:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts: dict = {}
    nodes = list(adj)
    for x in nodes:
        for y in adj[x]:
            if y <= x:
                continue
            for z in adj[x] & adj[y]:
                if z <= y:
                    continue
                for n in (x, y, z):
                    counts[n] = counts.get(n, 0) + 1
    exp = (
        pd.DataFrame(
            sorted(counts.items()), columns=["doc_id", "n_triangles"]
        ).astype(np.int64)
        if counts
        else pd.DataFrame({"doc_id": [], "n_triangles": []}).astype(np.int64)
    )
    pd.testing.assert_frame_equal(got.astype(np.int64), exp)


def test_triangle_count_distributed_path_matches_fast(sf_dir, monkeypatch):
    """The fully-distributed chain (used past the broadcast gate) and
    the _tri_small fast path must agree exactly."""
    import pandas as pd

    from aerial_conversion_ray.pipelines import cluster

    fast = (
        cluster.triangle_count(sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    monkeypatch.setattr(cluster, "SMALL_EDGE_ROWS", 0)
    slow = (
        cluster.triangle_count(sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast, slow)
