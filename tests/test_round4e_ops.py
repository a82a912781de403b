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


def test_dbscan_cells_matches_brute(sf_dir):
    from aerial_conversion_ray.pipelines import spatial
    from aerial_conversion_ray.geo import cells as C
    from aerial_conversion_ray.geocode import geocode_arrays
    from aerial_conversion_ray.sources.pages import pages_cte
    import duckdb

    cfg = spatial.DEFAULT_CFG
    res, minpts = spatial.DBSCAN_RES, spatial.DBSCAN_MINPTS
    pages = duckdb.sql(
        f"with documents as (select * from read_parquet('{sf_dir}/documents.parquet')), "
        f"p as ({pages_cte(cfg.pages_rep)}) select page_id from p"
    ).df()
    g = geocode_arrays(pages["page_id"].to_numpy(np.int64))
    cell = C.encode(g["lon"], g["lat"], res)
    u, cnt = np.unique(cell, return_counts=True)
    core = u[cnt >= minpts]
    n_core = dict(zip(core.tolist(), cnt[cnt >= minpts].tolist()))
    # brute union-find over Chebyshev-1 adjacency
    n_side = 1 << res
    parent = {c: c for c in core.tolist()}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    core_set = set(core.tolist())
    for c in core.tolist():
        iy, ix = divmod(c, n_side)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == dy == 0:
                    continue
                nx, ny = ix + dx, iy + dy
                if 0 <= nx < n_side and 0 <= ny < n_side // 2:
                    nb = ny * n_side + nx
                    if nb in core_set:
                        ra, rb = find(c), find(nb)
                        if ra != rb:
                            parent[max(ra, rb)] = min(ra, rb)
    want = (
        pd.DataFrame(
            {
                "cell": list(core_set),
                "n": [n_core[c] for c in core_set],
                "cluster_id": [find(c) for c in core_set],
            }
        )
        .sort_values("cell")
        .reset_index(drop=True)
    )
    got = (
        spatial.dbscan_cells(sf_dir, cfg)
        .to_pandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ["cell", "n", "cluster_id"]:
        assert (got[c].to_numpy(np.int64) == want[c].to_numpy(np.int64)).all(), c
    # the synthetic hot spot must produce one dominant multi-cell cluster
    sizes = got.groupby("cluster_id").size()
    assert sizes.max() >= 4


def _bpe_word_py(word, triples):
    toks = [ord(c) for c in word]
    for a, b, new in triples:
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(new)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def test_bpe_encode_matches_pure_python(sf_dir):
    from aerial_conversion_ray.pipelines import text as T

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    want = []
    for doc_id, txt in zip(docs["doc_id"], docs["text"]):
        words = txt.split(" ")
        n_bpe = sum(len(_bpe_word_py(w, T._BPE_TRIPLES)) for w in words)
        want.append((int(doc_id), len(words), n_bpe))
    want = (
        pd.DataFrame(want, columns=["doc_id", "n_words", "n_bpe"])
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = (
        T.bpe_encode(sf_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ["doc_id", "n_words", "n_bpe"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # merges must actually fire: pieces < raw chars, and for docs
    # containing 'table' the 4-rank chain collapses it to one piece
    raw = docs["text"].str.replace(" ", "", regex=False).str.len().to_numpy()
    assert (got["n_bpe"].to_numpy() < raw).all()


def test_bpe_greedy_leftmost_overlap():
    from aerial_conversion_ray.pipelines import text as T

    # crafted overlap: pair ('a','a') on 'aaaa' -> two merges; on
    # 'aaa' -> one merge + lone 'a'
    tok = np.array([ord("a")] * 7, np.int32)
    doc = np.array([0, 0, 0, 0, 1, 1, 1], np.int64)
    triples = [(ord("a"), ord("a"), 300)]
    out_tok, out_doc = T._bpe_apply_flat(tok, doc, triples)
    assert list(out_tok) == [300, 300, 300, ord("a")]
    assert list(out_doc) == [0, 0, 1, 1]


def test_line_cells_supercover_properties(sf_dir):
    from aerial_conversion_ray.pipelines import spatial
    from aerial_conversion_ray.geo import cells as C
    from aerial_conversion_ray.geocode import geocode_arrays

    cfg = spatial.DEFAULT_CFG
    res = spatial.LINE_CELLS_RES
    got = spatial.line_cells(sf_dir, cfg).to_pandas()
    # both segment endpoints' cells must be covered for every page
    pages = got["page_id"].unique()
    g = geocode_arrays(pages.astype(np.int64))
    r = (g["lon"] + g["r"]) - g["lon"]
    sx = np.where(g["lon"] >= 0.0, 1.0, -1.0)
    sy = np.where(g["lat"] >= 0.0, 1.0, -1.0)
    x1 = g["lon"] - sx * (100.0 * r)
    y1 = g["lat"] - sy * (50.0 * r)
    c0 = C.encode(g["lon"], g["lat"], res)
    c1 = C.encode(x1, y1, res)
    have = set(zip(got["page_id"].to_numpy(), got["cell"].to_numpy()))
    for pid, a, b in zip(pages, c0, c1):
        assert (pid, a) in have and (pid, b) in have
    # coverage is a contiguous-ish explode: every page covers >= 1 cell
    # and the mean is small (bbox candidates pruned by the line test)
    per = got.groupby("page_id").size()
    assert per.min() >= 1 and per.mean() < 12


def test_token_diversity_matches_brute(sf_dir):
    from collections import Counter

    from aerial_conversion_ray.pipelines import text as T

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    want = []
    for doc_id, txt in zip(docs["doc_id"], docs["text"]):
        c = Counter(txt.split(" "))
        want.append(
            (
                int(doc_id),
                sum(c.values()),
                len(c),
                sum(v * (v - 1) for v in c.values()),
            )
        )
    want = (
        pd.DataFrame(want, columns=["doc_id", "n_tokens", "n_distinct", "rep2"])
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = (
        T.token_diversity(sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in want.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # template-soup corpus repeats tokens: rep2 must be nonzero somewhere
    assert got["rep2"].sum() > 0


def test_corridor_join_matches_numpy(sf_dir):
    from aerial_conversion_ray.pipelines import spatial
    from aerial_conversion_ray.geocode import geocode_arrays
    from aerial_conversion_ray.sources.pages import pages_cte
    import duckdb

    cfg = spatial.DEFAULT_CFG
    pages = duckdb.sql(
        f"with documents as (select * from read_parquet('{sf_dir}/documents.parquet')), "
        f"p as ({pages_cte(cfg.pages_rep)}) select page_id from p"
    ).df()
    pid = pages["page_id"].to_numpy(np.int64)
    g = geocode_arrays(pid)
    rows = []
    for rid, x0, y0, x1, y1 in spatial.ROUTES:
        dx, dy = x1 - x0, y1 - y0
        tnum = (g["lon"] - x0) * dx + (g["lat"] - y0) * dy
        tt = np.clip(tnum / (dx * dx + dy * dy), 0.0, 1.0)
        cx, cy = x0 + tt * dx, y0 + tt * dy
        d2 = (g["lon"] - cx) ** 2 + (g["lat"] - cy) ** 2
        ok = d2 <= spatial.CORRIDOR_D2
        for p, d in zip(pid[ok], d2[ok]):
            rows.append((int(p), rid, int(np.floor(d * 1e12 + 0.5))))
    want = (
        pd.DataFrame(rows, columns=["page_id", "route_id", "dist2_e12"])
        .sort_values(["route_id", "page_id"])
        .reset_index(drop=True)
    )
    got = (
        spatial.corridor_join(sf_dir, cfg)
        .to_pandas()
        .sort_values(["route_id", "page_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in want.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # hot-spot routes must dominate the matches
    per_route = got.groupby("route_id").size()
    assert per_route.loc[0] > per_route.loc[1]


def test_embed_quantize_matches_numpy(sf_dir):
    from aerial_conversion_ray.pipelines import embeddings as E

    df = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    mn, mx = mat.min(axis=0), mat.max(axis=0)
    q = np.floor((mat - mn) / (mx - mn) * 254.0 + 0.5) - 127.0
    q = np.clip(q, -127.0, 127.0).astype(np.int64)
    pos = np.arange(1, q.shape[1] + 1, dtype=np.int64)
    want = pd.DataFrame(
        {
            "vec_id": df["vec_id"].to_numpy(np.int64),
            "q_sum": q.sum(axis=1),
            "q_sq": (q * q).sum(axis=1),
            "q_pos": (q * pos).sum(axis=1),
        }
    ).sort_values("vec_id").reset_index(drop=True)
    got = (
        E.embed_quantize(sf_dir).to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in want.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # quantization must exercise the full int8 range at the extremes
    assert got["q_sq"].max() > 0


def test_winsorized_mean_matches_numpy(sf_dir):
    from aerial_conversion_ray.pipelines import relational as R

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"])
    rows = []
    for lang, g in docs.groupby("lang"):
        v = np.sort(g["n_chars"].to_numpy(np.int64))
        n = len(v)
        lo = int(v[max(0, int(np.ceil(R.WINSOR_LO * n)) - 1)])
        hi = int(v[max(0, int(np.ceil(R.WINSOR_HI * n)) - 1)])
        rows.append((lang, lo, hi, n, int(np.clip(v, lo, hi).sum())))
    want = (
        pd.DataFrame(rows, columns=["lang", "lo", "hi", "n", "wsum"])
        .sort_values("lang")
        .reset_index(drop=True)
    )
    got = (
        R.winsorized_mean(sf_dir).to_pandas().sort_values("lang").reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in want.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # clamping must bite: winsorized sum differs from the raw sum
    raw = docs.groupby("lang")["n_chars"].sum().sort_index().to_numpy(np.int64)
    assert (got["wsum"].to_numpy() != raw).any()


def test_source_overlap_matches_brute(sf_dir):
    from collections import defaultdict
    from itertools import combinations

    from aerial_conversion_ray.pipelines import text as T

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    by_pfx = defaultdict(set)
    for src, txt in zip(docs["source"], docs["text"]):
        by_pfx[" ".join(txt.split(" ")[: T.OVERLAP_PFX_TOKENS])].add(src)
    cnt = defaultdict(int)
    for srcs in by_pfx.values():
        for a, b in combinations(sorted(srcs), 2):
            cnt[(a, b)] += 1
    want = (
        pd.DataFrame(
            [(a, b, n) for (a, b), n in cnt.items()],
            columns=["src_a", "src_b", "n_shared"],
        )
        .sort_values(["src_a", "src_b"])
        .reset_index(drop=True)
    )
    got = (
        T.source_overlap(sf_dir)
        .to_pandas()
        .sort_values(["src_a", "src_b"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in want.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    assert got["n_shared"].sum() > 0


def test_trending_tokens_matches_brute(sf_dir):
    from collections import Counter, defaultdict

    import duckdb

    from aerial_conversion_ray.pipelines import text as T
    from aerial_conversion_ray.pipelines.spatial import DEFAULT_CFG
    from aerial_conversion_ray.sources.pages import pages_cte

    cfg = DEFAULT_CFG
    pages = duckdb.sql(
        f"with documents as (select * from read_parquet('{sf_dir}/documents.parquet')), "
        f"p as ({pages_cte(cfg.pages_rep)}) select warc_ts, text from p"
    ).df()
    w_us = T.TREND_WINDOW_S * 1_000_000
    wins = pages["warc_ts"].to_numpy("datetime64[us]").astype(np.int64) // w_us
    per = defaultdict(Counter)
    for w, txt in zip(wins, pages["text"]):
        per[int(w)].update(txt.split(" "))
    rows = []
    for w, ctr in per.items():
        best = sorted(ctr.items(), key=lambda kv: (-kv[1], kv[0]))[: T.TREND_K]
        for r, (tok, n) in enumerate(best, 1):
            rows.append((w, tok, n, r))
    want = (
        pd.DataFrame(rows, columns=["win", "token", "n", "rank"])
        .sort_values(["win", "rank"])
        .reset_index(drop=True)
    )
    got = (
        T.trending_tokens(sf_dir, cfg)
        .to_pandas()
        .sort_values(["win", "rank"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in want.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    assert got["win"].nunique() == len(per)


def test_heatmap_geotiff_real_file_roundtrip(sf_dir):
    import os

    from aerial_conversion_ray.pipelines import multimodal as M
    from aerial_conversion_ray.pipelines.spatial import DEFAULT_CFG
    from aerial_conversion_ray.sources.geotiff import read_info, read_window

    got = (
        M.heatmap_geotiff(sf_dir, DEFAULT_CFG)
        .to_pandas()
        .sort_values(["col_off", "row_off"])
        .reset_index(drop=True)
    )
    n = 1 << M.HEATMAP_RES
    assert len(got) == (n // M.HEATMAP_TILE) * (n // 2 // M.HEATMAP_TILE)
    assert (got["width"] == M.HEATMAP_TILE).all()
    # a real file landed and its FULL pixel sum equals the tile sums
    path = f"{M.HEATMAP_DIR}/heatmap_r{M.HEATMAP_RES}_{DEFAULT_CFG.pages_rep}.tif"
    assert os.path.exists(path)
    info = read_info(path)
    full = read_window(path, info, 0, 0, info.width, info.height)
    assert int(full.sum(dtype=np.int64)) == int(got["px_sum"].sum())
    assert got["px_sum"].sum() > 0  # the hot spot burned in


def test_token_drift_matches_brute(sf_dir):
    from collections import Counter

    from aerial_conversion_ray.pipelines import text as T

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    c0, c1 = Counter(), Counter()
    for did, txt in zip(docs["doc_id"], docs["text"]):
        (c0 if did % 2 == 0 else c1).update(txt.split(" "))
    t0, t1 = sum(c0.values()), sum(c1.values())
    toks = set(c0) | set(c1)
    d = sorted(
        ((abs(c0[t] * t1 - c1[t] * t0), t) for t in toks),
        key=lambda x: (-x[0], x[1]),
    )[: T.DRIFT_K]
    want = pd.DataFrame(
        [(t, c0[t], c1[t], dr, r + 1) for r, (dr, t) in enumerate(d)],
        columns=["token", "n0", "n1", "drift", "rank"],
    )
    got = (
        T.token_drift(sf_dir).to_pandas().sort_values("rank").reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in want.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    assert got["drift"].iloc[0] > 0


def test_embed_top_components_matches_numpy(sf_dir):
    from aerial_conversion_ray.pipelines import embeddings as E

    df = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    rows = []
    for vid, v in zip(df["vec_id"].to_numpy(np.int64), mat):
        order = sorted(range(len(v)), key=lambda i: (-abs(v[i]), i))[: E.TOPCOMP_M]
        for r, comp in enumerate(order, 1):
            rows.append((int(vid), r, comp, int(np.floor(v[comp] * 1e6 + 0.5))))
    want = (
        pd.DataFrame(rows, columns=["vec_id", "rank", "component", "val_e6"])
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    got = (
        E.embed_top_components(sf_dir)
        .to_pandas()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in want.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_tile_occupancy_hist_consistent(sf_dir):
    from aerial_conversion_ray.pipelines import spatial

    got = spatial.tile_occupancy_hist(sf_dir, spatial.DEFAULT_CFG).to_pandas()
    # total pages across bins == pages count; bins are bit lengths
    from aerial_conversion_ray.sources.pages import pages_cte
    import duckdb

    n_pages = duckdb.sql(
        f"with documents as (select * from read_parquet('{sf_dir}/documents.parquet')), "
        f"p as ({pages_cte(spatial.DEFAULT_CFG.pages_rep)}) select count(*) n from p"
    ).df()["n"].iloc[0]
    assert got["n_pages"].sum() == n_pages
    assert (got["bin"] >= 1).all()
    # hot cell must land in a high bin (count >= 2^5 at rep 20)
    assert got["bin"].max() >= 6


def test_host_reciprocity_matches_brute(sf_dir):
    from aerial_conversion_ray.pipelines import linkgraph as L

    e = L.host_edges(sf_dir).to_pandas()
    e = e[e["src_id"] != e["dst_id"]]
    pairs = set(zip(e["src_id"], e["dst_id"]))
    rows = []
    for h, g in e.groupby("src_id"):
        rec = sum((d, s) in pairs for s, d in zip(g["src_id"], g["dst_id"]))
        rows.append((int(h), len(g), rec))
    want = (
        pd.DataFrame(rows, columns=["host_id", "n_out", "n_rec"])
        .sort_values("host_id")
        .reset_index(drop=True)
    )
    got = (
        L.host_reciprocity(sf_dir)
        .to_pandas()
        .sort_values("host_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in want.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    assert got["n_rec"].sum() > 0


def test_curation_pipeline_composition(sf_dir):
    from aerial_conversion_ray.pipelines import text as T

    got = (
        T.curation_pipeline(sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    q = T.quality_filter(sf_dir).to_pandas()
    d = T.dedup_exact(sf_dir).to_pandas()
    c = T.decontaminate(sf_dir).to_pandas()
    want_ids = (
        set(q[q["keep"] == 1]["doc_id"])
        & set(d["doc_id"])
        & set(c[c["contaminated"] == 0]["doc_id"])
    )
    assert set(got["doc_id"]) == want_ids
    # survival must be a strict subset at every stage (stages bite)
    assert 0 < len(got) < len(q)
    cg = c.set_index("doc_id")["n_grams"]
    assert (got.set_index("doc_id")["n_grams"] == cg.loc[got["doc_id"]]).all()


def test_audio_resample_matches_codec_brute(sf_dir):
    from aerial_conversion_ray.pipelines import multimodal as M
    from aerial_conversion_ray.functions.wav import decode_wav, encode_wav
    from aerial_conversion_ray.pipelines.spatial import DEFAULT_CFG
    import duckdb
    from aerial_conversion_ray.sources.pages import pages_cte

    pages = duckdb.sql(
        f"with documents as (select * from read_parquet('{sf_dir}/documents.parquet')), "
        f"p as ({pages_cte(DEFAULT_CFG.pages_rep)}) select page_id from p limit 200"
    ).df()
    # brute: synth law -> pairwise floor-mean -> stats (no codec)
    rows = []
    for pid in pages["page_id"].to_numpy(np.int64):
        n = M.WAV_BASE + pid % 64
        t = np.arange(n, dtype=np.int64)
        s = ((pid * 5 + t * 11) % M.WAV_MOD) - M.WAV_MOD // 2
        half = n // 2
        pair = s[: half * 2].reshape(half, 2)
        r = np.floor((pair[:, 0] + pair[:, 1]) / 2.0).astype(np.int64)
        rows.append((int(pid), half, int(r.sum()), int(np.abs(r).max())))
    want = (
        pd.DataFrame(rows, columns=["page_id", "n_out", "sum_r", "peak_r"])
        .sort_values("page_id")
        .reset_index(drop=True)
    )
    got = (
        M.audio_resample(sf_dir, DEFAULT_CFG)
        .to_pandas()
        .merge(want[["page_id"]], on="page_id")
        .sort_values("page_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in want.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # the re-encode leg is honest: codec roundtrip of a known stream
    buf = encode_wav(np.array([-3, 5, 7], np.int16), 8000)
    arr, rate = decode_wav(buf)
    assert rate == 8000 and list(arr[:, 0]) == [-3, 5, 7]


def test_video_scene_cuts_law(sf_dir):
    from aerial_conversion_ray.pipelines import multimodal as M
    from aerial_conversion_ray.pipelines.spatial import DEFAULT_CFG

    got = M.video_scene_cuts(sf_dir, DEFAULT_CFG).to_pandas()
    # brute on a few pages: decode-free law replication
    sub = got[got["page_id"] < 50]
    for _, row in sub.iterrows():
        p, f = int(row["page_id"]), int(row["frame_idx"])
        w, h = 16 + p % 8, 12 + p % 5
        i = np.arange(h)[:, None]
        j = np.arange(w)[None, :]
        a = (p * 3 + f * 17 + i * 7 + j * 13) % 251
        b = (p * 3 + (f + 1) * 17 + i * 7 + j * 13) % 251
        d = int(np.abs(b - a).sum())
        assert d == row["diff_sum"]
        assert int(d * 251 > M.CUT_NUM * w * h) == row["is_cut"]
    # both flag values occur (the predicate bites)
    assert got["is_cut"].nunique() == 2


def test_polyline_shapefile_roundtrip():
    import tempfile

    from aerial_conversion_ray.sources import shapefile as S

    d = tempfile.mkdtemp()
    paths = [
        [np.array([[0.25, -1.5], [3.75, 2.5]])],
        [np.array([[5.0, 5.0], [6.0, 7.0], [8.0, 7.5]]),
         np.array([[9.0, 9.0], [10.0, 11.0]])],  # multipart
    ]
    S.write_shp(d + "/r", [S.polyline_content(p) for p in paths])
    recs = S.read_shp_bytes(open(d + "/r.shp", "rb").read())
    assert [r["type"] for r in recs] == [3, 3]
    assert len(recs[1]["parts"]) == 2
    for want, got in zip(paths[0] + paths[1], recs[0]["parts"] + recs[1]["parts"]):
        assert (np.asarray(want) == got).all()


def test_corridor_join_shp_matches_constant_variant(sf_dir):
    from aerial_conversion_ray.pipelines import spatial

    a = (
        spatial.corridor_join(sf_dir, spatial.DEFAULT_CFG)
        .to_pandas()
        .sort_values(["route_id", "page_id"])
        .reset_index(drop=True)
    )
    b = (
        spatial.corridor_join_shp(sf_dir, spatial.DEFAULT_CFG)
        .to_pandas()
        .sort_values(["route_id", "page_id"])
        .reset_index(drop=True)
    )
    assert a.equals(b)  # file round-trip is value-exact (float64 LE)


def test_raster_equalize_stretches_contrast(sf_dir):
    from aerial_conversion_ray.pipelines import multimodal as M
    from aerial_conversion_ray.pipelines.spatial import DEFAULT_CFG

    got = M.raster_equalize(sf_dir, DEFAULT_CFG).to_pandas()
    n = 1 << M.HEATMAP_RES
    assert len(got) == (n // M.HEATMAP_TILE) * (n // 2 // M.HEATMAP_TILE)
    # equalization maps the max-population value to a high code and
    # keeps every output in [0, 255]
    assert got["eq_max"].max() == 255
    assert (got["eq_sum"] >= 0).all()


def test_k_anonymity_matches_brute(sf_dir):
    from aerial_conversion_ray.pipelines import text as T

    docs = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "source", "n_chars"]
    )
    docs["chars_bin"] = docs["n_chars"] // T.KANON_CHARS_BIN
    g = docs.groupby(["lang", "source", "chars_bin"], as_index=False).size()
    want = (
        g[g["size"] < T.KANON_K]
        .rename(columns={"size": "n"})
        .sort_values(["lang", "source", "chars_bin"])
        .reset_index(drop=True)
    )
    got = (
        T.k_anonymity(sf_dir)
        .to_pandas()
        .sort_values(["lang", "source", "chars_bin"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ["lang", "source", "chars_bin", "n"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    assert (got["n"] < T.KANON_K).all() and len(got) > 0


def test_ip_range_join_matches_brute(sf_dir):
    from aerial_conversion_ray.pipelines import relational as R

    got = R.ip_range_join(sf_dir).to_pandas()
    width = R.IP_SPAN // R.IP_N_RANGES
    ip = got["ip"].to_numpy(np.int64)
    k = ip // width
    assert (got["range_id"].to_numpy(np.int64) == (k * 7) % R.IP_N_RANGES).all()
    assert (ip >= 0).all() and (ip < R.IP_SPAN).all()
    # addresses spread across many ranges (the probe isn't degenerate)
    assert got["range_id"].nunique() > R.IP_N_RANGES // 2


def test_bootstrap_mean_matches_brute(sf_dir):
    from aerial_conversion_ray.pipelines import relational as R

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    d = docs["doc_id"].to_numpy(np.int64)
    x = docs["n_chars"].to_numpy(np.int64)
    got = R.bootstrap_mean(sf_dir).to_pandas().sort_values("b").reset_index(drop=True)
    assert len(got) == R.BOOT_B
    for b in range(R.BOOT_B):
        w = ((d * R.BOOT_P1 + b * R.BOOT_P2) % (1 << 32)) % 4
        assert got["n_w"].iloc[b] == w.sum()
        assert got["sum_w"].iloc[b] == (w * x).sum()
    # replicate means vary (the resample isn't degenerate) and bracket
    # the plain mean
    means = got["sum_w"] / got["n_w"]
    assert means.std() > 0
    assert means.min() <= x.mean() <= means.max()


def _brute_kcore(edges_df, k):
    import collections

    adj = collections.defaultdict(set)
    for a, b in zip(edges_df["a"], edges_df["b"]):
        adj[int(a)].add(int(b))
        adj[int(b)].add(int(a))
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {n: len(v) for n, v in adj.items()}


def test_kcore_matches_brute_peel(sf_dir):
    from aerial_conversion_ray.pipelines import cluster as C
    from aerial_conversion_ray.pipelines import text as T

    edges = T.jaccard_pairs(sf_dir, C.KCORE_THRESHOLD, C.DEFAULT_MAX_DF).to_pandas()
    want = _brute_kcore(edges, C.KCORE_K)
    got = C.kcore(sf_dir).to_pandas()
    assert dict(zip(got["doc_id"], got["deg_core"])) == want
    assert len(got) > 0 and (got["deg_core"] >= C.KCORE_K).all()


def test_kcore_distributed_path_matches_driver(sf_dir):
    from aerial_conversion_ray.pipelines import cluster as C

    drv = C.kcore(sf_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    dist = (
        C.kcore(sf_dir, small_gate=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert drv.equals(dist)


def test_embed_truncate_audit_matches_numpy(sf_dir):
    from aerial_conversion_ray.pipelines import embeddings as E

    df = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    q = np.floor(mat * 1e6 + 0.5).astype(np.int64)
    want = pd.DataFrame(
        {
            "vec_id": df["vec_id"].to_numpy(np.int64),
            "dot_trunc_q": (q[:, : E.TRUNC_D] ** 2).sum(axis=1),
            "dot_full_q": (q**2).sum(axis=1),
        }
    ).sort_values("vec_id").reset_index(drop=True)
    got = (
        E.embed_truncate_audit(sf_dir)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    for c in want.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # truncation keeps a strict, nonzero fraction of the energy
    frac = got["dot_trunc_q"] / got["dot_full_q"]
    assert (frac > 0).all() and (frac < 1).all()


def test_ipc_roundtrip_bit_exact(sf_dir):
    from aerial_conversion_ray.pipelines import extract as X

    want = (
        pd.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "lang", "source", "n_chars", "text"],
        )
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = (
        X.ipc_roundtrip(sf_dir)
        .to_pandas()[["doc_id", "lang", "source", "n_chars", "text"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(want)


def test_funnel_latency_matches_brute(sf_dir):
    from aerial_conversion_ray.pipelines import relational as R

    ev = pd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    ev["ts_us"] = ev["ts"].to_numpy("datetime64[us]").astype(np.int64)
    lats = []
    for _, g in ev.groupby("user_id"):
        vs = g[g["event_type"] == "view"]["ts_us"]
        if not len(vs):
            continue
        vts = vs.min()
        ps = g[(g["event_type"] == "purchase") & (g["ts_us"] > vts)]["ts_us"]
        if len(ps):
            lats.append((ps.min() - vts) // 1_000_000)
    lats = np.sort(np.array(lats, np.int64))
    n = len(lats)

    def disc(p):
        return int(lats[max(0, int(np.ceil(p * n)) - 1)])

    got = R.funnel_latency(sf_dir)
    assert got["n_users"].iloc[0] == n and n > 0
    assert got["p50_s"].iloc[0] == disc(0.5)
    assert got["p90_s"].iloc[0] == disc(0.9)


def test_degree_assortativity_matches_brute(sf_dir):
    from collections import Counter

    from aerial_conversion_ray.pipelines import cluster as C
    from aerial_conversion_ray.pipelines import text as T

    edges = T.jaccard_pairs(sf_dir, C.KCORE_THRESHOLD, C.DEFAULT_MAX_DF).to_pandas()
    deg = Counter()
    for a, b in zip(edges["a"], edges["b"]):
        deg[int(a)] += 1
        deg[int(b)] += 1
    xs, ys = [], []
    for a, b in zip(edges["a"], edges["b"]):
        xs += [deg[int(a)], deg[int(b)]]
        ys += [deg[int(b)], deg[int(a)]]
    x, y = np.array(xs, np.int64), np.array(ys, np.int64)
    got = C.degree_assortativity(sf_dir).to_pandas().iloc[0]
    assert got["n"] == len(x)
    assert got["sum_x"] == x.sum() and got["sum_y"] == y.sum()
    assert got["sum_xx"] == (x * x).sum() and got["sum_yy"] == (y * y).sum()
    assert got["sum_xy"] == (x * y).sum()
    # symmetric orientation: x and y moments must agree
    assert got["sum_x"] == got["sum_y"] and got["sum_xx"] == got["sum_yy"]


def test_degree_assortativity_distributed_matches_driver(sf_dir):
    from aerial_conversion_ray.pipelines import cluster as C

    drv = C.degree_assortativity(sf_dir).to_pandas()
    dist = C.degree_assortativity(sf_dir, small_gate=0).to_pandas()
    assert drv.iloc[0].equals(dist.iloc[0])
