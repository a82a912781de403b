"""Round-4 sixth block: ops added in the round-4f continuation —
engine vs brute numpy oracles (the exact DuckDB oracles run in
tools/check.py and the driver gate)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq


def _brute_moran(sf_dir, rep, res):
    """Brute-force queen-contiguity moments over per-cell page counts."""
    from aerial_conversion_ray.geo import cells
    from aerial_conversion_ray.geocode import geocode_arrays

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    doc_id = np.sort(docs["doc_id"].to_numpy())
    page_id = (doc_id[:, None] * rep + np.arange(rep)[None, :]).ravel()
    g = geocode_arrays(page_id)
    cell = cells.encode(g["lon"], g["lat"], res)
    u, cnt = np.unique(cell, return_counts=True)
    x = dict(zip(u.tolist(), cnt.tolist()))
    n = 1 << res
    w_pairs = 0
    sum_xy = 0
    for c, xi in x.items():
        iy, ix = divmod(c, n)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                jx, jy = ix + dx, iy + dy
                if not (0 <= jx < n and 0 <= jy < n // 2):
                    continue
                xj = x.get(jy * n + jx)
                if xj is not None:
                    w_pairs += 1
                    sum_xy += xi * xj
    return {
        "n_cells": len(u),
        "sum_x": int(cnt.sum()),
        "sum_x2": int((cnt.astype(np.int64) ** 2).sum()),
        "w_pairs": w_pairs,
        "sum_xy": sum_xy,
    }


def test_moran_i_matches_brute(sf_dir):
    from aerial_conversion_ray.pipelines import spatial

    got = spatial.moran_i(sf_dir).to_pandas()
    assert len(got) == 1
    want = _brute_moran(sf_dir, spatial._MORAN_REP, spatial._MORAN_RES)
    row = got.iloc[0]
    for k, v in want.items():
        assert int(row[k]) == v, k
    assert row["w_pairs"] > 0 and row["sum_x2"] >= row["sum_x"]


def test_segment_crossings_matches_brute(sf_dir):
    from aerial_conversion_ray.geocode import geocode_arrays
    from aerial_conversion_ray.pipelines import spatial

    rep = spatial._SC_REP
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    pages = docs.loc[docs.index.repeat(rep)].reset_index(drop=True)
    pages["page_id"] = (
        docs["doc_id"].to_numpy()[:, None] * rep + np.arange(rep)[None, :]
    ).ravel()
    g = geocode_arrays(pages["page_id"].to_numpy())
    pages["lon"], pages["lat"] = g["lon"], g["lat"]
    pages = pages.sort_values(["source", "page_id"], kind="mergesort")
    want = set()
    for _, grp in pages.groupby("source"):
        x, y = grp["lon"].to_numpy(), grp["lat"].to_numpy()
        pid = grp["page_id"].to_numpy()
        for i in range(1, len(grp)):
            ax, ay, bx, by = x[i - 1], y[i - 1], x[i], y[i]
            for rid, cx0, cy0, cx1, cy1 in spatial.ROUTES:
                d1 = (bx - ax) * (cy0 - ay) - (by - ay) * (cx0 - ax)
                d2 = (bx - ax) * (cy1 - ay) - (by - ay) * (cx1 - ax)
                d3 = (cx1 - cx0) * (ay - cy0) - (cy1 - cy0) * (ax - cx0)
                d4 = (cx1 - cx0) * (by - cy0) - (cy1 - cy0) * (bx - cx0)
                if d1 * d2 < 0.0 and d3 * d4 < 0.0:
                    want.add((grp["source"].iloc[0], int(pid[i - 1]), int(pid[i]), rid))
    got = spatial.segment_crossings(sf_dir).to_pandas()
    got_set = set(
        zip(got["source"], got["page_a"].astype(int), got["page_b"].astype(int), got["route_id"].astype(int))
    )
    assert got_set == want and len(got) == len(want)


def test_crc32c_public_vectors():
    """CRC32C pinned by the public Castagnoli test vectors (RFC 3720
    B.4 / kernel crypto testmgr)."""
    from aerial_conversion_ray.sources.tfrecord import crc32c_many, masked_crc

    vecs = {
        b"123456789": 0xE3069283,
        b"": 0x00000000,
        b"\x00" * 32: 0x8A9136AA,
        b"\xff" * 32: 0x62A8AB43,
    }
    got = crc32c_many(list(vecs))
    assert [int(x) for x in got] == list(vecs.values())
    # TFRecord mask law: ((crc >> 15) | (crc << 17)) + 0xa282ead8
    m = masked_crc(np.array([0xE3069283], np.uint32))
    assert int(m[0]) == ((0xE3069283 >> 15 | (0xE3069283 << 17 & 0xFFFFFFFF)) + 0xA282EAD8) % (1 << 32)


def test_tfrecord_example_codec_roundtrip():
    from aerial_conversion_ray.sources.tfrecord import decode_example, encode_examples

    df = pd.DataFrame(
        {
            "doc_id": [0, -1, 2**62],
            "n_chars": [0, 300, 7],
            "text": ["", "é" * 200, "plain"],
            "lang": ["en", "zh", ""],
        }
    )
    recs = encode_examples(df, ["doc_id", "n_chars"], ["text", "lang"])
    for i, r in enumerate(recs):
        d = decode_example(r)
        assert d["doc_id"] == df["doc_id"].iloc[i]
        assert d["n_chars"] == df["n_chars"].iloc[i]
        assert d["text"].decode() == df["text"].iloc[i]
        assert d["lang"].decode() == df["lang"].iloc[i]


def test_tfrecord_roundtrip_corrupt_detected(tmp_path, sf_dir):
    """Flipping one payload byte must fail the masked-CRC check."""
    import pytest
    import ray.data

    from aerial_conversion_ray.sources.tfrecord import read_tfrecord, write_tfrecord

    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [1, 2], "text": ["a", "b"], "shard_key": [0, 0]})
    )
    write_tfrecord(ds, str(tmp_path), "shard_key", ["doc_id"], ["text"]).materialize()
    path = tmp_path / "shard=0" / "data.tfrecord"
    raw = bytearray(path.read_bytes())
    raw[14] ^= 0x01  # inside the first Example payload
    path.write_bytes(bytes(raw))
    with pytest.raises(Exception, match="CRC"):
        read_tfrecord(str(tmp_path), ["doc_id"], ["text"]).materialize()


def test_dsir_weights_matches_brute(sf_dir):
    """Engine vs a brute pandas reimplementation of the integer DSIR
    scoring law, plus the selection property: target-lang docs must
    rank above the corpus median on average."""
    from collections import Counter

    from aerial_conversion_ray.pipelines import text as T

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])
    cnt_r: Counter = Counter()
    cnt_t: Counter = Counter()
    per_doc = {}
    for _, r in docs.iterrows():
        c = Counter(r["text"].split(" "))
        per_doc[int(r["doc_id"])] = c
        cnt_r.update(c)
        if r["lang"] == T.DSIR_TARGET_LANG:
            cnt_t.update(c)
    want = {
        d: sum(
            c * (((cnt_t.get(tok, 0) + 1) * T.DSIR_SCALE) // (cnt_r[tok] + 1))
            for tok, c in cd.items()
        )
        for d, cd in per_doc.items()
    }
    got = T.dsir_weights(sf_dir).to_pandas()
    got_map = dict(zip(got["doc_id"].astype(int), got["score"].astype(int)))
    assert got_map == want
    # selection property (normalize by token count: score is a sum)
    n_tok = {d: sum(c.values()) for d, c in per_doc.items()}
    tgt = docs["lang"] == T.DSIR_TARGET_LANG
    mean_t = np.mean([want[d] / n_tok[d] for d in docs["doc_id"][tgt]])
    mean_o = np.mean([want[d] / n_tok[d] for d in docs["doc_id"][~tgt]])
    assert mean_t > mean_o


def test_raster_downsample_box_law(sf_dir):
    """The overview GeoTIFF's pixels must equal the exact 2x2 box
    floor-mean of the base heatmap raster, window streaming and all."""
    from aerial_conversion_ray.config import EngineConfig, TileGridSpec
    from aerial_conversion_ray.pipelines import multimodal as M
    from aerial_conversion_ray.sources.geotiff import read_raster_windows

    cfg = EngineConfig()
    M.raster_downsample(sf_dir, cfg).materialize()
    n = 1 << M.HEATMAP_RES
    base = f"{M.HEATMAP_DIR}/heatmap_r{M.HEATMAP_RES}_{cfg.pages_rep}.tif"
    ov = f"{M.HEATMAP_DIR}/heatmap_r{M.HEATMAP_RES}_{cfg.pages_rep}_ov2.tif"

    def full(path, w, h):
        t = read_raster_windows(path, TileGridSpec(tile_width=w, tile_height=h)).to_pandas()
        assert len(t) == 1
        return np.frombuffer(t["pixels"].iloc[0], np.uint8).reshape(h, w)

    img = full(base, n, n // 2).astype(np.int64)
    got = full(ov, n // 2, n // 4)
    want = img.reshape(n // 4, 2, n // 2, 2).sum(axis=(1, 3)) // 4
    assert np.array_equal(got, want.astype(np.uint8))
    assert got.sum() > 0


def test_idw_fill_matches_brute(sf_dir):
    from aerial_conversion_ray.geo import cells
    from aerial_conversion_ray.geocode import geocode_arrays
    from aerial_conversion_ray.pipelines import spatial

    rep, res = spatial._MORAN_REP, spatial._MORAN_RES
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    doc_id = np.sort(docs["doc_id"].to_numpy())
    page_id = (doc_id[:, None] * rep + np.arange(rep)[None, :]).ravel()
    g = geocode_arrays(page_id)
    cell = cells.encode(g["lon"], g["lat"], res)
    u, cnt = np.unique(cell, return_counts=True)
    x = dict(zip(u.tolist(), cnt.tolist()))
    n = 1 << res
    want = {}
    for c, xi in x.items():
        iy, ix = divmod(c, n)
        for dx in range(-2, 3):
            for dy in range(-2, 3):
                if (dx, dy) == (0, 0):
                    continue
                jx, jy = ix + dx, iy + dy
                if not (0 <= jx < n and 0 <= jy < n // 2):
                    continue
                tgt = jy * n + jx
                if tgt in x:
                    continue
                w = spatial._IDW_SCALE // (dx * dx + dy * dy)
                nm, dn = want.get(tgt, (0, 0))
                want[tgt] = (nm + xi * w, dn + w)
    got = spatial.idw_fill(sf_dir).to_pandas()
    got_map = {
        int(r["cell"]): (int(r["iw_num"]), int(r["iw_den"]))
        for _, r in got.iterrows()
    }
    assert got_map == want


def _brute_bpe(texts, n_merges):
    """Single-process reference BPE trainer (same deterministic rule)."""
    from collections import Counter

    wc = Counter()
    for t in texts:
        wc.update(t.split(" "))
    state = {w: tuple(w) for w in wc}
    merges = []
    for _ in range(n_merges):
        pc_ = Counter()
        for w, syms in state.items():
            c = wc[w]
            for i in range(len(syms) - 1):
                pc_[(syms[i], syms[i + 1])] += c
        if not pc_:
            break
        best = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        if n < 2:
            break
        merges.append((a, b, n))
        for w, syms in list(state.items()):
            r, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    r.append(a + b)
                    i += 2
                else:
                    r.append(syms[i])
                    i += 1
            state[w] = tuple(r)
    return merges


def test_bpe_train_matches_brute(sf_dir):
    from aerial_conversion_ray.pipelines import text as T

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    want = _brute_bpe(docs["text"].tolist(), T.BPE_TRAIN_MERGES)
    got = T.bpe_train(sf_dir).to_pandas()
    got_list = list(zip(got["left"], got["right"], got["pair_count"].astype(int)))
    assert got_list == want
    assert list(got["rank"]) == list(range(len(want)))
    assert len(want) > 4  # the corpus genuinely trains several merges


def test_bpe_train_distributed_matches_driver(sf_dir):
    from aerial_conversion_ray.pipelines import text as T

    drv = T.bpe_train(sf_dir).to_pandas()
    dist = T.bpe_train(sf_dir, small_gate=0).to_pandas()
    assert drv.equals(dist)


def test_host_bfs_matches_brute(sf_dir):
    from collections import deque

    from aerial_conversion_ray.pipelines import linkgraph as L

    edges = L.host_edges(sf_dir).to_pandas()
    adj: dict[int, set] = {}
    for s, d in zip(edges["src_id"].astype(int), edges["dst_id"].astype(int)):
        adj.setdefault(s, set()).add(d)
    want = {L.BFS_SEED: 0}
    q = deque([L.BFS_SEED])
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):
            if v not in want:
                want[v] = want[u] + 1
                q.append(v)
    got = L.host_bfs(sf_dir).to_pandas()
    got_map = {
        int(h[1:].split(".")[0]): int(d) for h, d in zip(got["host"], got["dist"])
    }
    assert got_map == want


def test_hard_negatives_matches_numpy(sf_dir):
    from aerial_conversion_ray.pipelines import embeddings as E

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids, mat = E._matrix(tbl)
    lab = tbl["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    sims = mat @ mat.T
    sims[lab[:, None] == lab[None, :]] = -np.inf
    se9 = np.floor(sims * 1e9 + 0.5)
    want = {}
    for i in range(len(ids)):
        best = se9[i].max()
        cand = np.flatnonzero(se9[i] == best)
        j = cand[np.argmin(ids[cand])]
        want[int(ids[i])] = (int(lab[i]), int(ids[j]), int(se9[i, j]))
    got = E.hard_negatives(sf_dir).to_pandas()
    got_map = {
        int(r["vec_id"]): (int(r["label"]), int(r["neg_id"]), int(r["neg_sim_e9"]))
        for _, r in got.iterrows()
    }
    assert got_map == want
    # every negative really has a different label
    lab_of = dict(zip(ids.tolist(), lab.tolist()))
    assert all(lab_of[n] != l for l, n, _ in got_map.values())


def test_table_profile_matches_pandas(sf_dir):
    from aerial_conversion_ray.pipelines import text as T

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    got = T.table_profile(sf_dir).to_pandas().set_index("col")
    for c in T._PROFILE_COLS:
        r = got.loc[c]
        assert int(r["n_rows"]) == len(docs)
        assert int(r["n_null"]) == int(docs[c].isna().sum())
        assert int(r["ndv"]) == docs[c].nunique()
        assert r["min_v"] == str(docs[c].min())
        assert r["max_v"] == str(docs[c].max())


def test_table_profile_ndv_exact_under_nulls():
    """Nulls are excluded from ndv and counted in n_null (engine law
    == SQL count(distinct) law), checked on a synthetic batch."""
    import pyarrow as pa

    from aerial_conversion_ray.pipelines import text as T

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 2, 3], pa.int64()),
            "lang": pa.array(["en", None, "en", "zh"]),
            "source": pa.array(["a", "a", "a", "a"]),
            "n_chars": pa.array([5, 5, 7, None], pa.int64()),
            "text": pa.array(["x", "y", "x", ""]),
        }
    )
    import tempfile

    import pyarrow.parquet as pq_

    d = tempfile.mkdtemp()
    pq_.write_table(t, f"{d}/documents.parquet")
    got = T.table_profile(d).to_pandas().set_index("col")
    assert int(got.loc["lang", "n_null"]) == 1
    assert int(got.loc["lang", "ndv"]) == 2
    assert int(got.loc["n_chars", "n_null"]) == 1
    assert int(got.loc["n_chars", "ndv"]) == 2
    assert got.loc["doc_id", "min_v"] == "1" and got.loc["doc_id", "max_v"] == "3"


def test_footprint_area_sphere_law(sf_dir):
    """Spherical rect area: positive, monotone with footprint size,
    and equal to the closed-form numpy evaluation."""
    from aerial_conversion_ray.config import EngineConfig
    from aerial_conversion_ray.pipelines import spatial

    got = spatial.footprint_area_sphere(sf_dir, EngineConfig()).to_pandas()
    geo = spatial.geocode_pipeline(sf_dir, EngineConfig()).to_pandas()
    m = geo.set_index("page_id")
    R2 = spatial._SPHERE_R ** 2
    area = (
        R2
        * (np.radians(m["fp_maxx"]) - np.radians(m["fp_minx"]))
        * (np.sin(np.radians(m["fp_maxy"])) - np.sin(np.radians(m["fp_miny"])))
    )
    want = np.floor(area * 1e3 + 0.5).astype(np.int64)
    gm = got.set_index("page_id")["area_e3"]
    assert (gm.reindex(want.index) == want).all()
    assert (gm > 0).all()


def test_tile_mode_lang_matches_brute(sf_dir):
    from aerial_conversion_ray.geo import cells
    from aerial_conversion_ray.geocode import geocode_arrays
    from aerial_conversion_ray.pipelines import spatial

    rep, res = spatial._MODE_REP, spatial._MODE_RES
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    pid = (docs["doc_id"].to_numpy()[:, None] * rep + np.arange(rep)[None, :]).ravel()
    lang = docs["lang"].to_numpy().repeat(rep)
    g = geocode_arrays(pid)
    cell = cells.encode(g["lon"], g["lat"], res)
    df = pd.DataFrame({"cell": cell, "lang": lang})
    cnt = df.groupby(["cell", "lang"], as_index=False).size()
    cnt = cnt.sort_values(["cell", "size", "lang"], ascending=[True, False, True])
    want = cnt.groupby("cell").head(1).set_index("cell")
    got = spatial.tile_mode_lang(sf_dir).to_pandas().set_index("cell")
    assert len(got) == len(want)
    assert (got["mode_lang"].sort_index() == want["lang"].sort_index()).all()
    assert (got["n_pages"].sort_index() == want["size"].sort_index()).all()


def test_spatial_split_block_coherent(sf_dir):
    """Every page in one block cell gets one split; fractions are
    sane; the law matches the arithmetic."""
    from aerial_conversion_ray.config import EngineConfig
    from aerial_conversion_ray.pipelines import spatial

    got = spatial.spatial_split(sf_dir, EngineConfig()).to_pandas()
    per_block = got.groupby("block_cell")["split"].nunique()
    assert (per_block == 1).all()
    lim = 1 << 32
    h = (got["block_cell"].to_numpy(np.int64) * spatial._SPLIT_MULT) % lim
    want = np.where(h < int(0.8 * lim), "train", np.where(h < int(0.9 * lim), "val", "test"))
    assert (got["split"].to_numpy() == want).all()
    fr = got["split"].value_counts(normalize=True)
    assert fr.get("train", 0) > 0.5


def test_l_diversity_vs_pandas(sf_dir):
    """Independent pandas recompute of the violation list."""
    import numpy as np
    import pyarrow.parquet as pq

    from aerial_conversion_ray.pipelines.text import (
        KANON_CHARS_BIN,
        LDIV_L,
        l_diversity,
    )

    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    docs["chars_bin"] = (docs["n_chars"] // KANON_CHARS_BIN).astype(np.int64)
    g = docs.groupby(["lang", "chars_bin"]).agg(
        n=("doc_id", "size"), n_sources=("source", "nunique")
    )
    expect = g[g["n_sources"] < LDIV_L].reset_index()
    got = (
        l_diversity(sf_dir)
        .to_pandas()
        .sort_values(["lang", "chars_bin"])
        .reset_index(drop=True)
    )
    expect = expect.sort_values(["lang", "chars_bin"]).reset_index(drop=True)
    assert got[["lang", "chars_bin", "n", "n_sources"]].equals(
        expect[["lang", "chars_bin", "n", "n_sources"]].astype(
            {"chars_bin": np.int64, "n": np.int64, "n_sources": np.int64}
        )
    )


def test_events_new_users_totals(sf_dir):
    """Running total ends at the table's distinct-user count and
    new_users partitions it (each user counted exactly once, in its
    first-seen window)."""
    import duckdb

    from aerial_conversion_ray.pipelines.relational import events_new_users

    res = events_new_users(sf_dir).to_pandas().sort_values("window_start_s")
    ndv = duckdb.sql(
        f"select count(distinct user_id) from '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    assert res["new_users"].sum() == ndv
    assert res["cum_users"].iloc[-1] == ndv
    assert (res["new_users"] > 0).all()
    assert (res["cum_users"].to_numpy() == res["new_users"].cumsum().to_numpy()).all()


def test_lang_cube_contains_rollup_and_source_level(sf_dir):
    """CUBE = ROLLUP + the per-source grouping set; totals agree."""
    from aerial_conversion_ray.pipelines.text import lang_cube, lang_rollup

    cube = lang_cube(sf_dir).to_pandas()
    roll = lang_rollup(sf_dir).to_pandas()
    key = ["lang", "source", "n_docs", "sum_chars"]
    cset = set(map(tuple, cube[key].to_numpy()))
    rset = set(map(tuple, roll[key].to_numpy()))
    assert rset < cset
    extra = cube[(cube["lang"] == "*") & (cube["source"] != "*")]
    assert len(cset - rset) == len(extra) > 0
    grand = cube[(cube["lang"] == "*") & (cube["source"] == "*")]
    assert extra["n_docs"].sum() == grand["n_docs"].iloc[0]


def test_langid_confusion_parity_and_diagonal(sf_dir):
    """Confusion matrix equals the pandas recompute from langid's own
    output, totals the corpus, and is diagonal-dominant (the n-gram
    classifier beats chance on the synthetic corpus)."""
    import duckdb

    from aerial_conversion_ray.pipelines.text import langid_confusion, langid_scores

    scored = langid_scores(sf_dir).to_pandas()
    expect = (
        scored.groupby(["lang", "lang_pred"], as_index=False)
        .size()
        .rename(columns={"lang": "lang_true", "size": "n"})
    )
    got = langid_confusion(sf_dir).to_pandas()
    key = lambda df: sorted(map(tuple, df[["lang_true", "lang_pred", "n"]].to_numpy()))
    assert key(got) == key(expect)
    ndocs = duckdb.sql(f"select count(*) from '{sf_dir}/documents.parquet'").fetchone()[0]
    assert got["n"].sum() == ndocs
    # beats chance (5 langs -> 0.2) with headroom; the synthetic
    # token soup caps absolute accuracy (~0.39 observed)
    diag = got[got["lang_true"] == got["lang_pred"]]["n"].sum()
    assert diag / got["n"].sum() > 0.3


def test_ann_recall_report_consistent_with_gates(sf_dir):
    """Report recalls match the per-method pair-set recomputation and
    clear the same floors the dedicated recall tests assert."""
    from aerial_conversion_ray.pipelines.embeddings import ann_recall_report

    rep = ann_recall_report(sf_dir).to_pandas().set_index("method")
    assert set(rep.index) == {"lsh", "ivf", "pq"}
    for m in rep.index:
        r = rep.loc[m]
        assert r["recall_e6"] == r["hits"] * 1_000_000 // r["n_pairs"]
    assert rep.loc["lsh", "recall_e6"] >= 600_000
    assert rep.loc["ivf", "recall_e6"] >= 600_000
    assert rep.loc["pq", "recall_e6"] >= 300_000
