"""Similarity-search tests: brute-vs-LSH recall, determinism, dup
symmetry, centroid math."""

import numpy as np
import pytest

from aerial_conversion_ray.pipelines import embeddings


@pytest.fixture(scope="module")
def brute(sf_dir):
    return embeddings.ann_brute(sf_dir).to_pandas()


@pytest.fixture(scope="module")
def lsh(sf_dir):
    return embeddings.ann_lsh(sf_dir).to_pandas()


def test_brute_shape(brute):
    # every query gets exactly K neighbors, ranks 1..K
    per_q = brute.groupby("query_id")["rank"].agg(["min", "max", "size"])
    assert (per_q["min"] == 1).all()
    assert (per_q["max"] == embeddings.K).all()
    assert (per_q["size"] == embeddings.K).all()
    # no self matches
    assert (brute["query_id"] != brute["neighbor_id"]).all()


def test_lsh_recall(brute, lsh):
    """LSH top-k recall vs exact must clear 0.6 on the synthetic
    corpus (random unit-ish vectors are the LSH worst case; the gate
    guards against regressions, not state-of-the-art recall)."""
    bk = {(q, n) for q, n in zip(brute["query_id"], brute["neighbor_id"])}
    lk = {(q, n) for q, n in zip(lsh["query_id"], lsh["neighbor_id"])}
    recall = len(bk & lk) / len(bk)
    assert recall >= 0.6, f"recall {recall:.3f}"


def test_ivf_recall_and_shape(brute, sf_dir):
    """Shuffle-partitioned ANN (no broadcast index): recall vs exact
    must clear 0.6; output shape is per-query ranked top-k."""
    ivf = embeddings.ann_ivf(sf_dir).to_pandas()
    bk = {(q, n) for q, n in zip(brute["query_id"], brute["neighbor_id"])}
    ik = {(q, n) for q, n in zip(ivf["query_id"], ivf["neighbor_id"])}
    recall = len(bk & ik) / len(bk)
    assert recall >= 0.6, f"recall {recall:.3f}"
    per_q = ivf.groupby("query_id")["rank"].agg(["min", "size"])
    assert (per_q["min"] == 1).all()
    assert (per_q["size"] <= embeddings.K).all()
    assert (ivf["query_id"] != ivf["neighbor_id"]).all()


def test_pq_recall_shape_determinism(brute, sf_dir):
    """PQ (64x-compressed index, ADC shortlist + exact re-rank):
    recall vs exact must clear 0.7 (0.93 measured on the synthetic
    random-gaussian corpus — PQ's worst case); codebook training is
    seeded so two runs are byte-identical."""
    pq1 = embeddings.ann_pq(sf_dir).to_pandas()
    bk = {(q, n) for q, n in zip(brute["query_id"], brute["neighbor_id"])}
    pk = {(q, n) for q, n in zip(pq1["query_id"], pq1["neighbor_id"])}
    recall = len(bk & pk) / len(bk)
    assert recall >= 0.7, f"recall {recall:.3f}"
    per_q = pq1.groupby("query_id")["rank"].agg(["min", "max", "size"])
    assert (per_q["min"] == 1).all()
    assert (per_q["max"] == embeddings.K).all()
    assert (pq1["query_id"] != pq1["neighbor_id"]).all()
    pq2 = embeddings.ann_pq(sf_dir).to_pandas()
    a = pq1.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = pq2.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a.equals(b)


def test_lsh_deterministic(sf_dir, lsh):
    again = embeddings.ann_lsh(sf_dir).to_pandas()
    a = lsh.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = again.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a.equals(b)


def test_embed_dup_ordering(sf_dir):
    dup = embeddings.embed_dup(sf_dir).to_pandas()
    assert (dup["a"] < dup["b"]).all()
    assert (dup["sim_e9"] >= embeddings.DUP_THRESHOLD_E9).all()


def test_label_centroids_match_numpy(sf_dir):
    import pyarrow.parquet as pq

    got = embeddings.label_centroids(sf_dir).to_pandas()
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids, mat = embeddings._matrix(tbl)  # normalized — recompute raw
    col = tbl["embedding"].combine_chunks()
    raw = (
        col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    ).reshape(len(ids), -1)
    labels = tbl["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    fp = np.floor(raw * 1_000_000.0 + 0.5).astype(np.int64)
    for lab in np.unique(labels):
        sel = labels == lab
        want = fp[sel].sum(axis=0) / 1_000_000.0 / sel.sum()
        row = got[got["label"] == lab]
        have = row[[f"c{d}" for d in range(embeddings.DIM)]].to_numpy()[0]
        np.testing.assert_allclose(have, want, rtol=0, atol=1e-12)


def test_kmeans_matches_reference(sf_dir):
    import numpy as np

    from aerial_conversion_ray.pipelines import embeddings as emb

    got = emb.kmeans(sf_dir).to_pandas().sort_values("vec_id").reset_index(drop=True)
    ids, ref_assign, _cent = emb.kmeans_reference(sf_dir)
    order = np.argsort(ids)
    assert (got["vec_id"].to_numpy() == ids[order]).all()
    assert (got["cluster"].to_numpy() == ref_assign[order]).all()
    # clusters are non-degenerate: more than one in use
    assert got["cluster"].nunique() > 1


def test_semdedup_numpy_parity(sf_dir):
    """semdedup vs an independent numpy brute recompute of the whole
    rule (assign -> pair sims -> pairwise keep test): exact match on
    (cluster, cent_e9, kept) for every vec_id."""
    import pyarrow.parquet as pq

    res = (
        embeddings.semdedup(sf_dir)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids, nmat = embeddings._matrix(t)
    order = np.argsort(ids)
    ids, nmat = ids[order], nmat[order]
    lut = embeddings._centroid_lut(sf_dir)
    cl, cent = embeddings._assign_clusters(nmat, lut)
    sims = embeddings._sim_e9(nmat @ nmat.T)
    kept = np.ones(len(ids), dtype=bool)
    for i in range(len(ids)):
        for j in range(len(ids)):
            if i == j or cl[i] != cl[j]:
                continue
            if sims[i, j] >= embeddings.SEMDEDUP_EPS_E9 and (
                (cent[j], ids[j]) < (cent[i], ids[i])
            ):
                kept[i] = False
                break
    assert (res["vec_id"].to_numpy() == ids).all()
    assert (res["cluster"].to_numpy() == cl).all()
    assert (res["cent_e9"].to_numpy() == cent).all()
    assert (res["kept"].to_numpy().astype(bool) == kept).all()
    # non-trivial on the synthetic corpus: both classes present
    assert kept.any() and (~kept).any()


def test_semdedup_cluster_minimum_always_kept(sf_dir):
    """Keep-worthiness is a total order within a cluster, so the
    cluster's minimum-(cent_e9, vec_id) element has no outranking dup
    and MUST be kept — every cluster retains a representative."""
    res = embeddings.semdedup(sf_dir).to_pandas()
    top = (
        res.sort_values(["cent_e9", "vec_id"], kind="mergesort")
        .groupby("cluster", as_index=False)
        .first()
    )
    assert (top["kept"] == 1).all()
    # and drops happen on the synthetic corpus (rule is non-vacuous)
    assert (res["kept"] == 0).any()


def test_kmeans_resumable_crash_equals_uninterrupted(sf_dir, tmp_path):
    """Run 2 rounds ('crash'), resume to 5: final assignments equal
    the uninterrupted 5-round run AND the plain kmeans; a changed
    fingerprint (different k) ignores the stale checkpoints."""
    ck = str(tmp_path / "ck")
    interrupted = embeddings.kmeans_resumable(sf_dir, ck, iters=2).to_pandas()
    assert interrupted is not None  # 2 rounds committed
    import os

    assert len([f for f in os.listdir(ck) if f.startswith("iter=")]) == 2
    resumed = (
        embeddings.kmeans_resumable(sf_dir, ck, iters=5)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len([f for f in os.listdir(ck) if f.startswith("iter=")]) == 5
    plain = (
        embeddings.kmeans(sf_dir, iters=5)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert resumed.equals(plain)
    # different hyperparameters -> stale rounds ignored, fresh run
    other = embeddings.kmeans_resumable(sf_dir, ck, k=4, iters=1).to_pandas()
    assert other["cluster"].max() <= 3


def _canon(df, cols):
    return df.sort_values(cols, kind="mergesort").reset_index(drop=True)


def test_semdedup_sharded_parity(sf_dir):
    """The cluster-sharded plan (groupby shuffle, no broadcast index)
    returns row-for-row the same keep/drop decisions as the broadcast
    variant — on the cold-only fast path AND with every cluster
    forced hot (block-pair decomposition + partial-flag fold),
    including a block count that does not divide the corpus."""
    broad = _canon(embeddings.semdedup(sf_dir).to_pandas(), ["vec_id"])
    shard = _canon(embeddings.semdedup_sharded(sf_dir).to_pandas(), ["vec_id"])
    assert broad.equals(shard[broad.columns.tolist()])
    for blocks in (3, 8):
        hot = _canon(
            embeddings.semdedup_sharded(
                sf_dir, hot_cluster_rows=0, blocks=blocks
            ).to_pandas(),
            ["vec_id"],
        )
        assert broad.equals(hot[broad.columns.tolist()]), blocks


def test_embed_dup_sharded_parity(sf_dir):
    """The block-nested-loop plan (no broadcast index) finds exactly
    the broadcast variant's pair set, including with a block count
    that does not divide the corpus evenly."""
    cols = ["a", "b"]
    broad = _canon(embeddings.embed_dup(sf_dir).to_pandas(), cols)
    for blocks in (3, 8):
        shard = _canon(
            embeddings.embed_dup_sharded(sf_dir, blocks=blocks).to_pandas(), cols
        )
        assert broad.equals(shard[broad.columns.tolist()]), blocks
