"""Round-4 seventh block: ops added in the round-4h continuation —
engine vs brute numpy oracles (the exact DuckDB oracles run in
tools/check.py and the driver gate)."""

import numpy as np
import pandas as pd
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


# --------------------------------------------------------------------------
# Avro OCF codec (sources/avro.py)
# --------------------------------------------------------------------------


def test_avro_zigzag_varint_spec_vectors():
    """Public Avro 1.11 spec test vectors for long encoding."""
    from aerial_conversion_ray.sources.avro import (
        varint_planes,
        zigzag_encode,
    )

    vals = np.array([0, -1, 1, -2, 2, -64, 64], np.int64)
    planes, lens = varint_planes(zigzag_encode(vals))
    got = [bytes(planes[i, : lens[i]]) for i in range(len(vals))]
    want = [
        b"\x00",
        b"\x01",
        b"\x02",
        b"\x03",
        b"\x04",
        b"\x7f",
        b"\x80\x01",
    ]
    assert got == want
    # int64 extremes survive the round trip
    ext = np.array([2**63 - 1, -(2**63), 12345678901234], np.int64)
    p2, l2 = varint_planes(zigzag_encode(ext))
    assert int(l2.max()) == 10  # full 10-byte varint for the extremes


def test_avro_block_codec_roundtrip():
    from aerial_conversion_ray.sources.avro import decode_block, encode_block

    df = pd.DataFrame(
        {
            "doc_id": np.array([0, -1, 2**62, -(2**62), 7], np.int64),
            "lang": ["en", "", "zh", "déjà", "x" * 300],
            "n_chars": np.array([5, 0, -3, 127, 128], np.int64),
            "text": ["hello", "", "世界", "a\nb", "y" * 1000],
        }
    )
    order = ["doc_id", "lang", "n_chars", "text"]
    buf = encode_block(df, ["doc_id", "n_chars"], ["lang", "text"], order)
    cols = decode_block(buf, len(df), ["doc_id", "n_chars"], ["lang", "text"], order)
    assert cols["doc_id"] == df["doc_id"].tolist()
    assert cols["n_chars"] == df["n_chars"].tolist()
    assert cols["lang"] == df["lang"].tolist()
    assert cols["text"] == df["text"].tolist()


def test_avro_roundtrip_identity(sf_dir):
    from aerial_conversion_ray.pipelines import extract

    got = (
        extract.avro_roundtrip(sf_dir)
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
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_avro_corrupt_sync_detected(tmp_path):
    import pytest
    import ray

    from aerial_conversion_ray.sources.avro import read_avro, write_avro

    df = pd.DataFrame(
        {
            "doc_id": np.arange(10, dtype=np.int64),
            "text": [f"doc {i}" for i in range(10)],
            "shard_key": np.zeros(10, np.int64),
        }
    )
    ds = ray.data.from_pandas(df)
    write_avro(
        ds, str(tmp_path), "shard_key", ["doc_id"], ["text"], ["doc_id", "text"]
    ).materialize()
    path = tmp_path / "shard=0" / "data.avro"
    blob = bytearray(path.read_bytes())
    blob[-1] ^= 0xFF  # flip a byte of the trailing sync marker
    path.write_bytes(bytes(blob))
    with pytest.raises(Exception):
        read_avro(str(tmp_path), ["doc_id"], ["text"], ["doc_id", "text"]).materialize()


def test_image_edges_matches_brute(sf_dir):
    from aerial_conversion_ray.pipelines import multimodal

    got = (
        multimodal.image_edges(sf_dir)
        .to_pandas()
        .sort_values("page_id")
        .reset_index(drop=True)
    )
    assert len(got) > 0
    for _, row in got.head(40).iterrows():
        p = int(row["page_id"])
        w, h = 16 + p % 8, 12 + p % 5
        i, j = np.mgrid[0:h, 0:w]
        a = ((p * 3 + i * 7 + j * 13) % multimodal.PNG_MOD).astype(np.int64)
        gx = (
            a[:-2, 2:] + 2 * a[1:-1, 2:] + a[2:, 2:]
            - a[:-2, :-2] - 2 * a[1:-1, :-2] - a[2:, :-2]
        )
        gy = (
            a[2:, :-2] + 2 * a[2:, 1:-1] + a[2:, 2:]
            - a[:-2, :-2] - 2 * a[:-2, 1:-1] - a[:-2, 2:]
        )
        mag = np.abs(gx) + np.abs(gy)
        assert int(row["edge_sum"]) == int(mag.sum())
        assert int(row["edge_max"]) == int(mag.max())
        assert int(row["edge_count"]) == int((mag >= multimodal.EDGE_T).sum())


def test_audio_spectrogram_matches_brute(sf_dir):
    from numpy.lib.stride_tricks import sliding_window_view

    from aerial_conversion_ray.pipelines import multimodal as mm

    got = (
        mm.audio_spectrogram(sf_dir)
        .to_pandas()
        .sort_values("page_id")
        .reset_index(drop=True)
    )
    assert len(got) > 0
    k = np.arange(mm.SPEC_NFFT)
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * k / mm.SPEC_NFFT)
    for _, row in got.head(40).iterrows():
        p_id = int(row["page_id"])
        n = mm.WAV_BASE + p_id % 64
        tpos = np.arange(n)
        s = (((p_id * 5 + tpos * 11) % mm.WAV_MOD) - mm.WAV_MOD // 2).astype(
            np.float64
        )
        frames = sliding_window_view(s, mm.SPEC_NFFT)[:: mm.SPEC_HOP]
        x = np.fft.rfft(frames * win[None, :], axis=1)
        p = (x.real**2 + x.imag**2).sum(axis=0)
        # Parseval: sum over ALL bins of |X|^2 == N * sum(windowed^2)
        full = np.fft.fft(frames * win[None, :], axis=1)
        assert np.allclose(
            (np.abs(full) ** 2).sum(), mm.SPEC_NFFT * ((frames * win) ** 2).sum()
        )
        assert int(row["n_frames"]) == frames.shape[0]
        b = p[1 : 1 + 8 * mm.SPEC_BANDS].reshape(mm.SPEC_BANDS, 8).sum(axis=1)
        for i in range(mm.SPEC_BANDS):
            assert int(row[f"band{i}"]) == int(np.floor(b[i])), (p_id, i)
        assert int(row["dom_bin"]) == int(np.argmax(p[1:])) + 1


def test_cell_blobs_matches_brute_union_find(sf_dir):
    from aerial_conversion_ray.geo import cells
    from aerial_conversion_ray.geocode import geocode_arrays
    from aerial_conversion_ray.pipelines import spatial

    got = (
        spatial.cell_blobs(sf_dir)
        .to_pandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    rep, res = spatial._BLOB_REP, spatial._BLOB_RES
    n = 1 << res
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    doc_id = docs["doc_id"].to_numpy()
    page_id = (doc_id[:, None] * rep + np.arange(rep)[None, :]).ravel()
    g = geocode_arrays(page_id)
    occ = np.unique(cells.encode(g["lon"], g["lat"], res))
    assert (got["cell"].values == occ).all()
    parent = {int(c): int(c) for c in occ}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    occ_set = set(parent)
    for c in occ:
        iy, ix = divmod(int(c), n)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == dy == 0:
                    continue
                jx, jy = ix + dx, iy + dy
                if 0 <= jx < n and 0 <= jy < n // 2 and jy * n + jx in occ_set:
                    ra, rb = find(int(c)), find(jy * n + jx)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    want = np.array([find(int(c)) for c in occ])
    assert (got["blob"].values == want).all()
    # the synthetic layout produces real multi-cell blobs AND isolates
    sizes = got.groupby("blob").size()
    assert sizes.max() > 1 and (sizes == 1).any()


def test_phrase_query_matches_brute(sf_dir):
    from aerial_conversion_ray.pipelines import text

    w1, w2 = text.PHRASE
    got = (
        text.phrase_query(sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    want = {}
    for _, row in docs.iterrows():
        toks = row["text"].split(" ")
        hits = [i + 1 for i in range(len(toks) - 1) if toks[i] == w1 and toks[i + 1] == w2]
        if hits:
            want[int(row["doc_id"])] = (len(hits), hits[0])
    assert set(got["doc_id"]) == set(want)
    for _, r in got.iterrows():
        n, fp = want[int(r["doc_id"])]
        assert int(r["n_matches"]) == n and int(r["first_pos"]) == fp


def test_host_jaccard_matches_brute(sf_dir):
    from aerial_conversion_ray.pipelines import linkgraph

    got = (
        linkgraph.host_jaccard(sf_dir)
        .to_pandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    edges = linkgraph.host_edges(sf_dir).to_pandas()
    nbrs = {}
    for _, r in edges.iterrows():
        nbrs.setdefault(int(r["src_id"]), set()).add(int(r["dst_id"]))
    rows = []
    hosts = sorted(nbrs)
    for i, a in enumerate(hosts):
        for b in hosts[i + 1 :]:
            inter = len(nbrs[a] & nbrs[b])
            if inter:
                uni = len(nbrs[a] | nbrs[b])
                rows.append((a, b, inter, uni, inter * 1_000_000 // uni))
    want = pd.DataFrame(rows, columns=["a_id", "b_id", "inter", "uni", "jaccard_e6"])
    assert len(got) == len(want)
    for c in want.columns:
        assert (got[c].to_numpy(np.int64) == want[c].to_numpy(np.int64)).all(), c


def test_host_shortest_path_matches_dijkstra(sf_dir):
    import heapq

    from aerial_conversion_ray.pipelines import linkgraph

    got = linkgraph.host_shortest_path(sf_dir).to_pandas()
    edges = linkgraph.host_edges(sf_dir).to_pandas()
    adj = {}
    for _, r in edges.iterrows():
        w = 1_000_000 // int(r["cnt"]) + 1
        adj.setdefault(int(r["src_id"]), []).append((int(r["dst_id"]), w))
    dist = {linkgraph.SP_SRC: 0}
    pq_heap = [(0, linkgraph.SP_SRC)]
    hops = {linkgraph.SP_SRC: 0}
    while pq_heap:
        c, u = heapq.heappop(pq_heap)
        if c > dist.get(u, 1 << 62):
            continue
        for v, w in adj.get(u, []):
            if c + w < dist.get(v, 1 << 62):
                dist[v] = c + w
                hops[v] = hops[u] + 1
                heapq.heappush(pq_heap, (c + w, v))
    # bounded Bellman-Ford == Dijkstra when the unbounded shortest
    # paths all fit in SP_HOPS edges (true on the dense host graph)
    assert max(hops.values()) <= linkgraph.SP_HOPS
    want = {f"h{k}.example": v for k, v in dist.items()}
    assert dict(zip(got["host"], got["cost"])) == want


def test_host_closeness_matches_brute_bfs(sf_dir):
    import collections

    from aerial_conversion_ray.pipelines import linkgraph

    edges = linkgraph.host_edges(sf_dir).to_pandas()
    adj = collections.defaultdict(set)
    for _, r in edges.iterrows():
        adj[int(r["src_id"])].add(int(r["dst_id"]))
    hosts = sorted(set(edges["src_id"]) | set(edges["dst_id"]))

    def bfs(s):
        d = {s: 0}
        q = [s]
        while q:
            nq = []
            for u in q:
                for v in adj.get(u, ()):
                    if v not in d:
                        d[v] = d[u] + 1
                        nq.append(v)
            q = nq
        return d

    want = {}
    for s in hosts:
        d = bfs(s)
        d.pop(s, None)
        if d:
            want[f"h{s}.example"] = (
                len(d),
                sum(d.values()),
                sum(1_000_000 // x for x in d.values()),
                max(d.values()),
            )
    got = linkgraph.host_closeness(sf_dir).to_pandas()
    gm = {
        r.host: (r.n_reach, r.closeness, r.harmonic_e6, r.ecc)
        for r in got.itertuples()
    }
    assert gm == want


def test_host_scc_matches_tarjan(sf_dir):
    import collections

    from aerial_conversion_ray.pipelines import linkgraph

    edges = linkgraph.host_edges(sf_dir).to_pandas()
    thr = int(edges["cnt"].sum()) * linkgraph.SCC_THR_PCT // (len(edges) * 100)
    edges = edges[edges["cnt"] >= thr]
    adj = collections.defaultdict(list)
    radj = collections.defaultdict(list)
    hosts = sorted(set(edges["src_id"]) | set(edges["dst_id"]))
    for _, r in edges.iterrows():
        adj[int(r["src_id"])].append(int(r["dst_id"]))
        radj[int(r["dst_id"])].append(int(r["src_id"]))

    # Kosaraju (iterative)
    seen, order = set(), []
    for h in hosts:
        if h in seen:
            continue
        seen.add(h)
        st = [(h, iter(adj[h]))]
        while st:
            node, it = st[-1]
            adv = False
            for v in it:
                if v not in seen:
                    seen.add(v)
                    st.append((v, iter(adj[v])))
                    adv = True
                    break
            if not adv:
                st.pop()
                order.append(node)
    seen2, comp = set(), {}
    for h in reversed(order):
        if h in seen2:
            continue
        stk, members = [h], []
        seen2.add(h)
        while stk:
            u = stk.pop()
            members.append(u)
            for v in radj[u]:
                if v not in seen2:
                    seen2.add(v)
                    stk.append(v)
        m = min(members)
        for u in members:
            comp[u] = m
    sizes = collections.Counter(comp.values())
    want = {f"h{h}.example": (comp[h], sizes[comp[h]]) for h in hosts}
    got = linkgraph.host_scc(sf_dir).to_pandas()
    gm = {r.host: (r.scc_id, r.scc_size) for r in got.itertuples()}
    assert gm == want
    assert len(sizes) > 1, "strong-edge sparsification must split the graph"


def test_random_walks_matches_brute(sf_dir):
    from aerial_conversion_ray.pipelines import linkgraph

    ed = (
        linkgraph.host_edges(sf_dir)
        .to_pandas()[["src_id", "dst_id"]]
        .drop_duplicates()
        .sort_values(["src_id", "dst_id"])
    )
    adj = {}
    for _, r in ed.iterrows():
        adj.setdefault(int(r["src_id"]), []).append(int(r["dst_id"]))

    got = linkgraph.random_walks(sf_dir).to_pandas()
    walks = {
        pid: dict(zip(g["step"], g["host"]))
        for pid, g in got.groupby("page_id")
    }
    import random

    pids = sorted(walks)
    sample = random.Random(7).sample(pids, min(200, len(pids)))
    for pid in sample:
        h = pid % linkgraph.NH
        want = {0: f"h{h}.example"}
        for t in range(linkgraph.WALK_LEN):
            nbrs = adj.get(h)
            if not nbrs:
                break
            r = (
                (pid % linkgraph._WALK_PMOD) * 31
                + (h + 1) * linkgraph._WALK_A
                + t * linkgraph._WALK_B
            ) % len(nbrs)
            h = nbrs[r]
            want[t + 1] = f"h{h}.example"
        assert walks[pid] == want, pid


def test_readability_matches_regex_reference(sf_dir):
    import re

    from aerial_conversion_ray.pipelines import text as text_mod
    from aerial_conversion_ray.sources.pages import read_table

    got = text_mod.readability(sf_dir).to_pandas().set_index("doc_id")
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"]).to_pandas()
    vr = re.compile(r"[aeiou]+")
    for _, r in docs.sample(n=min(60, len(docs)), random_state=3).iterrows():
        ws = r["text"].split(" ")
        syll = sum(len(vr.findall(w)) for w in ws)
        hard = sum(1 for w in ws if len(vr.findall(w)) >= 3)
        row = got.loc[r["doc_id"]]
        assert row["words"] == len(ws)
        assert row["syll"] == syll
        assert row["hard"] == hard
        assert row["syll_per_100w_e3"] == syll * 100_000 // len(ws)
        assert row["pct_hard_e6"] == hard * 1_000_000 // len(ws)


def test_textrank_matches_brute(sf_dir):
    import collections

    from aerial_conversion_ray.pipelines import text as text_mod
    from aerial_conversion_ray.sources.pages import read_table

    docs = read_table(sf_dir, "documents", columns=["text"]).to_pandas()
    cnt = collections.Counter()
    for txt in docs["text"]:
        ws = txt.split(" ")
        for a, b in zip(ws, ws[1:]):
            if a != b:
                cnt[(a, b)] += 1
                cnt[(b, a)] += 1
    wdeg = collections.Counter()
    for (u, _v), c in cnt.items():
        wdeg[u] += c
    r = {u: text_mod.TR_SCALE for u in wdeg}
    base = (15 * text_mod.TR_SCALE) // 100
    for _ in range(text_mod.TR_ITERS):
        acc = collections.Counter()
        for (u, v), c in cnt.items():
            acc[v] += r[u] * c // wdeg[u]
        r = {v: base + 85 * s // 100 for v, s in acc.items()}
    got = text_mod.textrank(sf_dir).to_pandas()
    gm = dict(zip(got["token"], got["rank_e9"]))
    assert gm == r


def test_host_mis_is_maximal_independent(sf_dir):
    import collections

    from aerial_conversion_ray.pipelines import linkgraph

    edges = linkgraph.host_edges(sf_dir).to_pandas()
    thr = int(edges["cnt"].sum()) * linkgraph.SCC_THR_PCT // (len(edges) * 100)
    e = edges[
        (edges["cnt"] >= thr)
        & (edges["src_id"] != linkgraph._HOT_DST)
        & (edges["dst_id"] != linkgraph._HOT_DST)
    ]
    adj = collections.defaultdict(set)
    nodes = set()
    for _, r in e.iterrows():
        u, v = int(r["src_id"]), int(r["dst_id"])
        nodes.update((u, v))
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    got = linkgraph.host_mis(sf_dir).to_pandas()
    mis = {int(h[1:].split(".")[0]) for h in got["host"]}
    # independent
    for u in mis:
        assert not (adj[u] & mis), u
    # maximal: every non-member has a member neighbour
    for v in nodes - mis:
        assert adj[v] & mis, v
    # round parity with a brute Luby replay
    pri = {v: (v * linkgraph.MIS_C) % linkgraph.MIS_M for v in nodes}
    alive, rounds, rnd = set(nodes), {}, 0
    while alive:
        cand = {
            v for v in alive if all(pri[v] < pri[u] for u in adj[v] if u in alive)
        }
        for v in cand:
            rounds[v] = rnd
        rem = set(cand)
        for v in cand:
            rem |= adj[v] & alive
        alive -= rem
        rnd += 1
    want = {f"h{v}.example": r for v, r in rounds.items()}
    assert dict(zip(got["host"], got["mis_round"])) == want


def test_host_widest_path_matches_brute(sf_dir):
    import heapq

    from aerial_conversion_ray.pipelines import linkgraph

    edges = linkgraph.host_edges(sf_dir).to_pandas()
    adj = {}
    for _, r in edges.iterrows():
        adj.setdefault(int(r["src_id"]), []).append(
            (int(r["dst_id"]), int(r["cnt"]))
        )
    INF = 1 << 40
    width = {linkgraph.SP_SRC: INF}
    pq = [(-INF, linkgraph.SP_SRC)]
    while pq:
        w, u = heapq.heappop(pq)
        w = -w
        if w < width.get(u, 0):
            continue
        for v, c in adj.get(u, []):
            nw = min(w, c)
            if nw > width.get(v, 0):
                width[v] = nw
                heapq.heappush(pq, (-nw, v))
    want = {
        f"h{v}.example": w for v, w in width.items() if v != linkgraph.SP_SRC
    }
    got = linkgraph.host_widest_path(sf_dir).to_pandas()
    assert dict(zip(got["host"], got["width"])) == want


def test_host_backbone_matches_kruskal(sf_dir):
    from aerial_conversion_ray.pipelines import linkgraph

    e = linkgraph.host_edges(sf_dir).to_pandas()
    e = e[e["src_id"] != e["dst_id"]]
    a = e[["src_id", "dst_id"]].min(axis=1)
    b = e[["src_id", "dst_id"]].max(axis=1)
    und = (
        e.assign(a=a, b=b)
        .groupby(["a", "b"], as_index=False)["cnt"]
        .sum()
    )
    keys = sorted(
        (
            int(r["cnt"]) * 4096 + int(r["a"]) * 64 + int(r["b"])
            for _, r in und.iterrows()
        ),
        reverse=True,
    )
    parent = list(range(64))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    mst = set()
    for k in keys:
        u, v = (k % 4096) // 64, k % 64
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
            mst.add(k)
    got = linkgraph.host_backbone(sf_dir).to_pandas()
    gk = {
        int(r["w"]) * 4096
        + int(r["host_a"][1:].split(".")[0]) * 64
        + int(r["host_b"][1:].split(".")[0])
        for _, r in got.iterrows()
    }
    assert gk == mst
    assert len(gk) == 63


def test_hapax_matches_counter(sf_dir):
    import collections

    from aerial_conversion_ray.pipelines import text as text_mod
    from aerial_conversion_ray.sources.pages import read_table

    docs = read_table(sf_dir, "documents", columns=["source", "text"]).to_pandas()
    cnt = collections.defaultdict(collections.Counter)
    for _, r in docs.iterrows():
        cnt[r["source"]].update(r["text"].split(" "))
    got = text_mod.hapax(sf_dir).to_pandas().set_index("source")
    assert len(got) == len(cnt)
    for src, c in cnt.items():
        vocab = len(c)
        hx = sum(1 for v in c.values() if v == 1)
        row = got.loc[src]
        assert (row["vocab"], row["hapax"]) == (vocab, hx), src
        assert row["hapax_rate_e6"] == hx * 1_000_000 // vocab


def test_chi2_lang_source_matches_numpy(sf_dir):
    import numpy as np

    from aerial_conversion_ray.pipelines import text as text_mod
    from aerial_conversion_ray.sources.pages import read_table

    docs = read_table(sf_dir, "documents", columns=["lang", "source"]).to_pandas()
    piv = docs.groupby(["lang", "source"]).size().unstack(fill_value=0)
    obs = piv.to_numpy(np.int64)
    n = int(obs.sum())
    rs = obs.sum(axis=1, keepdims=True)
    cs = obs.sum(axis=0, keepdims=True)
    d = n * obs - rs * cs
    want = int((d * d * 100 // (n * rs * cs)).sum())
    got = text_mod.chi2_lang_source(sf_dir).to_pandas()
    assert got["chi2_e2"].iloc[0] == want
    assert got["dof"].iloc[0] == (obs.shape[0] - 1) * (obs.shape[1] - 1)
    assert got["n"].iloc[0] == n


def test_length_gini_matches_numpy(sf_dir):
    import numpy as np

    from aerial_conversion_ray.pipelines import text as text_mod
    from aerial_conversion_ray.sources.pages import read_table

    docs = read_table(sf_dir, "documents", columns=["source", "n_chars"]).to_pandas()
    got = text_mod.length_gini(sf_dir).to_pandas().set_index("source")
    for src, g in docs.groupby("source"):
        x = np.sort(g["n_chars"].to_numpy(np.int64))
        n, s = len(x), int(x.sum())
        i = np.arange(1, n + 1, dtype=np.int64)
        want = (2 * int((i * x).sum()) - (n + 1) * s) * 1_000_000 // (n * s)
        assert got.loc[src, "gini_e6"] == want, src


def test_raster_algebra_matches_numpy(sf_dir):
    import numpy as np

    from aerial_conversion_ray.sources import geotiff as gt

    got = gt.raster_algebra().to_pandas().set_index("tile_id")
    A = gt._demo_array().astype(np.int64)
    B = gt._demo_array_b().astype(np.int64)
    T = gt.DEMO_TILE
    n = 0
    for r0 in range(0, gt.DEMO_H, T):
        for c0 in range(0, gt.DEMO_W, T):
            a = A[r0 : r0 + T, c0 : c0 + T].ravel()
            b = B[r0 : r0 + T, c0 : c0 + T].ravel()
            d = a - b
            ratio = int((np.sign(d) * (np.abs(d) * 1_000_000 // (a + b + 1))).sum())
            row = got.loc[f"tile_{c0}-{r0}"]
            assert row["n_px"] == a.size
            assert row["ratio_sum_e6"] == ratio
            assert row["n_a_gt_b"] == int((a > b).sum())
            n += 1
    assert n == len(got)


def test_trajectory_hausdorff_matches_brute(sf_dir):
    import numpy as np

    from aerial_conversion_ray.config import EngineConfig
    from aerial_conversion_ray.geocode import geocode_arrays
    from aerial_conversion_ray.pipelines import spatial

    cfg = EngineConfig(pages_rep=4)
    got = spatial.trajectory_hausdorff(sf_dir, cfg).to_pandas()
    from aerial_conversion_ray.sources.pages import pages_dataset

    pid = (
        pages_dataset(sf_dir, rep=cfg.pages_rep, columns=["page_id"])
        .to_pandas()["page_id"]
        .to_numpy(np.int64)
    )
    pid = pid[(pid // spatial.HAUS_NH) % spatial.HAUS_SAMPLE == 0]
    g = geocode_arrays(pid)
    h = pid % spatial.HAUS_NH
    pts = {
        int(hv): (g["lon"][h == hv], g["lat"][h == hv]) for hv in np.unique(h)
    }

    def directed(A, B):
        d = np.abs(A[0][:, None] - B[0][None, :]) + np.abs(
            A[1][:, None] - B[1][None, :]
        )
        return d.min(axis=1).max()

    want = {}
    for hv in sorted(pts):
        if hv + 1 in pts:
            want[(f"h{hv}.example", f"h{hv + 1}.example")] = max(
                directed(pts[hv], pts[hv + 1]), directed(pts[hv + 1], pts[hv])
            )
    gm = {
        (r["host_a"], r["host_b"]): r["hausdorff"] for _, r in got.iterrows()
    }
    assert gm == want


def test_host_graph_distributed_branch_parity(sf_dir):
    """small_gate=0 forces the distributed broadcast-round branches;
    results must equal the driver fast paths bit-for-bit."""
    from aerial_conversion_ray.pipelines import linkgraph, text as text_mod

    fast = linkgraph.host_shortest_path(sf_dir)
    slow = linkgraph.host_shortest_path(sf_dir, small_gate=0)
    assert fast.equals(slow)

    fast = linkgraph.host_widest_path(sf_dir)
    slow = linkgraph.host_widest_path(sf_dir, small_gate=0)
    assert fast.equals(slow)

    fast = linkgraph.host_mis(sf_dir)
    slow = linkgraph.host_mis(sf_dir, small_gate=0)
    assert fast.equals(slow)

    fast = linkgraph.host_backbone(sf_dir)
    slow = linkgraph.host_backbone(sf_dir, small_gate=0)
    assert fast.equals(slow)

    h1, d1, m1 = linkgraph._host_closure(sf_dir)
    h2, d2, m2 = linkgraph._host_closure(sf_dir, small_gate=0)
    assert (h1 == h2).all() and (d1 == d2).all() and (m1 == m2).all()

    fast = linkgraph.host_coreness(sf_dir)
    slow = linkgraph.host_coreness(sf_dir, small_gate=0)
    assert (
        fast.to_pandas().sort_values("host").reset_index(drop=True).equals(
            slow.to_pandas().sort_values("host").reset_index(drop=True)
        )
    )

    fast = linkgraph.host_katz(sf_dir)
    slow = linkgraph.host_katz(sf_dir, small_gate=0)
    assert fast.equals(slow)

    ft = text_mod.textrank(sf_dir).to_pandas()
    st = text_mod.textrank(sf_dir, small_gate=0).to_pandas()
    assert dict(zip(ft["token"], ft["rank_e9"])) == dict(
        zip(st["token"], st["rank_e9"])
    )


def test_host_stress_matches_brute(sf_dir):
    import collections
    import itertools

    from aerial_conversion_ray.pipelines import linkgraph

    edges = linkgraph.host_edges(sf_dir).to_pandas()
    adj = collections.defaultdict(set)
    for _, r in edges.iterrows():
        adj[int(r["src_id"])].add(int(r["dst_id"]))
    hosts = sorted(set(edges["src_id"]) | set(edges["dst_id"]))

    # brute: BFS from every s, enumerate path counts via DP
    def bfs_sigma(s):
        dist = {s: 0}
        sig = {s: 1}
        q = [s]
        while q:
            nq = []
            for u_ in q:
                for v_ in adj.get(u_, ()):
                    if v_ not in dist:
                        dist[v_] = dist[u_] + 1
                        sig[v_] = 0
                        nq.append(v_)
                    if dist[v_] == dist[u_] + 1:
                        sig[v_] += sig[u_]
            q = nq
        return dist, sig

    D, S = {}, {}
    for s in hosts:
        D[s], S[s] = bfs_sigma(s)
    want = collections.Counter()
    for s, w in itertools.permutations(hosts, 2):
        if w not in D[s]:
            continue
        for t in hosts:
            if t in (s, w) or t not in D[w] or t not in D[s]:
                continue
            if D[s][w] + D[w][t] == D[s][t]:
                want[w] += S[s][w] * S[w][t]
    got = linkgraph.host_stress(sf_dir).to_pandas()
    gm = dict(zip(got["host"], got["stress"]))
    assert gm == {f"h{w}.example": c for w, c in want.items() if c > 0}


def test_host_temporal_reach_matches_brute(sf_dir):
    from aerial_conversion_ray.pipelines import linkgraph

    links = linkgraph.link_extract(sf_dir).to_pandas()
    ts = links["page_id"].to_numpy("int64")
    src = ts % linkgraph.NH
    dst = (
        links["dst_host"].str.extract(r"^h(\d+)\.")[0].astype("int64").to_numpy()
    )
    BIG = 1 << 62
    arr = {linkgraph.TR_SEED: 0}
    for _ in range(linkgraph.TR_ROUNDS):
        new = dict(arr)
        for t, s, d in zip(ts, src, dst):
            if s in arr and t >= arr[s] and t < new.get(d, BIG):
                new[d] = int(t)
        # inner pass must iterate to this round's fixpoint? No: one
        # relaxation sweep per round, same as the engine/oracle
        if new == arr:
            break
        arr = new
    got = linkgraph.host_temporal_reach(sf_dir).to_pandas()
    assert dict(zip(got["host"], got["arrival"])) == {
        f"h{k}.example": v for k, v in arr.items()
    }


def test_host_coreness_matches_brute(sf_dir):
    import collections

    from aerial_conversion_ray.pipelines import linkgraph

    edges = linkgraph.host_edges(sf_dir).to_pandas()
    thr = int(edges["cnt"].sum()) * linkgraph.SCC_THR_PCT // (len(edges) * 100)
    e = edges[
        (edges["cnt"] >= thr)
        & (edges["src_id"] != linkgraph._HOT_DST)
        & (edges["dst_id"] != linkgraph._HOT_DST)
        & (edges["src_id"] != edges["dst_id"])
    ]
    adj = collections.defaultdict(set)
    for _, r in e.iterrows():
        adj[int(r["src_id"])].add(int(r["dst_id"]))
        adj[int(r["dst_id"])].add(int(r["src_id"]))
    # brute: the textbook sequential min-degree peel (order-independent
    # core numbers; different deletion order from the engine's batch
    # peel — a genuine cross-check)
    deg = {v: len(ns) for v, ns in adj.items()}
    live = {v: set(ns) for v, ns in adj.items()}
    core = {}
    kmax = 0
    while live:
        v = min(live, key=lambda x: (deg[x], x))
        kmax = max(kmax, deg[v])
        core[v] = kmax
        for u in live[v]:
            live[u].discard(v)
            deg[u] -= 1
        del live[v], deg[v]
    got = linkgraph.host_coreness(sf_dir).to_pandas()
    assert dict(zip(got["host"], got["coreness"])) == {
        f"h{v}.example": c for v, c in core.items()
    }


def test_host_neighborhood_agg_matches_brute(sf_dir):
    import numpy as np

    from aerial_conversion_ray.pipelines import linkgraph
    from aerial_conversion_ray.sources.pages import pages_dataset

    pg = pages_dataset(
        sf_dir, rep=linkgraph.LG_REP, columns=["page_id", "n_chars"]
    ).to_pandas()
    h = pg["page_id"].to_numpy(np.int64) % linkgraph.NH
    sum_chars = np.bincount(
        h, weights=pg["n_chars"].to_numpy(np.int64), minlength=linkgraph.NH
    ).astype(np.int64)
    n_pages = np.bincount(h, minlength=linkgraph.NH).astype(np.int64)
    e = linkgraph.host_edges(sf_dir).to_pandas()
    s = e["src_id"].to_numpy(np.int64)
    d = e["dst_id"].to_numpy(np.int64)
    c = e["cnt"].to_numpy(np.int64)
    w1c = np.zeros(linkgraph.NH, np.int64)
    w1x = np.zeros(linkgraph.NH, np.int64)
    np.add.at(w1c, d, c)
    np.add.at(w1x, d, c * sum_chars[s])
    w2x = np.zeros(linkgraph.NH, np.int64)
    np.add.at(w2x, d, c * w1x[s])
    got = linkgraph.host_neighborhood_agg(sf_dir).to_pandas()
    for i in range(linkgraph.NH):
        r = got.iloc[i]
        assert r["host"] == f"h{i}.example"
        assert (
            r["n_pages"],
            r["sum_chars"],
            r["w1_cnt"],
            r["w1_chars"],
            r["w2_chars"],
        ) == (n_pages[i], sum_chars[i], w1c[i], w1x[i], w2x[i])


def test_host_katz_matches_brute(sf_dir):
    import numpy as np

    from aerial_conversion_ray.pipelines import linkgraph

    e = (
        linkgraph.host_edges(sf_dir)
        .to_pandas()[["src_id", "dst_id"]]
        .drop_duplicates()
    )
    u = e["src_id"].to_numpy(np.int64)
    v = e["dst_id"].to_numpy(np.int64)
    w = np.ones(linkgraph.NH, dtype=np.int64)
    katz = np.zeros(linkgraph.NH, dtype=np.int64)
    for k in range(1, linkgraph.KATZ_DEPTH + 1):
        nxt = np.zeros(linkgraph.NH, dtype=np.int64)
        np.add.at(nxt, v, w[u])
        w = nxt
        katz += w * linkgraph.KATZ_SCALE // (linkgraph.KATZ_ATT**k)
    got = linkgraph.host_katz(sf_dir).to_pandas()
    want = {
        f"h{i}.example": int(katz[i])
        for i in range(linkgraph.NH)
        if katz[i] > 0
    }
    assert dict(zip(got["host"], got["katz_e6"])) == want


def test_host_hopplot_matches_bfs(sf_dir):
    import collections

    from aerial_conversion_ray.pipelines import linkgraph

    edges = linkgraph.host_edges(sf_dir).to_pandas()
    adj = collections.defaultdict(set)
    for _, r in edges.iterrows():
        adj[int(r["src_id"])].add(int(r["dst_id"]))
    hosts = sorted(set(edges["src_id"]) | set(edges["dst_id"]))
    cnt = collections.Counter()
    for s in hosts:
        d = {s: 0}
        q = [s]
        while q:
            nq = []
            for u in q:
                for v in adj.get(u, ()):
                    if v not in d:
                        d[v] = d[u] + 1
                        nq.append(v)
            q = nq
        for v, dv in d.items():
            if v != s:
                cnt[dv] += 1
    got = linkgraph.host_hopplot(sf_dir).to_pandas()
    assert dict(zip(got["d"], got["n_pairs"])) == dict(cnt)
    assert (got["cum_pairs"].to_numpy() == got["n_pairs"].cumsum().to_numpy()).all()


def test_host_simrank_matches_brute(sf_dir):
    import collections

    from aerial_conversion_ray.pipelines import linkgraph

    e = (
        linkgraph.host_edges(sf_dir)
        .to_pandas()[["src_id", "dst_id"]]
        .drop_duplicates()
    )
    inn = collections.defaultdict(list)
    hosts = sorted(set(e["src_id"]) | set(e["dst_id"]))
    for _, r in e.iterrows():
        inn[int(r["dst_id"])].append(int(r["src_id"]))
    S = {(h, h): linkgraph.SIMRANK_SCALE for h in hosts}
    for _ in range(linkgraph.SIMRANK_ITERS):
        new = {}
        for a in hosts:
            for b in hosts:
                if a == b:
                    new[(a, b)] = linkgraph.SIMRANK_SCALE
                    continue
                ia, ib = inn.get(a, []), inn.get(b, [])
                if not ia or not ib:
                    continue
                tot = sum(S.get((x, y), 0) for x in ia for y in ib)
                val = 4 * tot // (5 * len(ia) * len(ib))
                if val or True:
                    new[(a, b)] = val
        S = new
    want = {
        (f"h{a}.example", f"h{b}.example"): v
        for (a, b), v in S.items()
        if a < b and v > 0
    }
    got = linkgraph.host_simrank(sf_dir).to_pandas()
    gm = {
        (r["host_a"], r["host_b"]): r["simrank_e6"] for _, r in got.iterrows()
    }
    assert gm == want


def test_lpa_modularity_matches_brute(sf_dir):
    import collections

    from aerial_conversion_ray.pipelines import linkgraph

    lab = linkgraph.lpa_communities(sf_dir).to_pandas()
    lbl = {
        int(h[1:].split(".")[0]): int(c)
        for h, c in zip(lab["host"], lab["community"])
    }
    e = linkgraph.host_edges(sf_dir).to_pandas()
    e = e[
        (e["src_id"] != linkgraph._HOT_DST)
        & (e["dst_id"] != linkgraph._HOT_DST)
    ]
    w_in = collections.Counter()
    tot = collections.Counter()
    two_m = 0
    for _, r in e.iterrows():
        a, b, c = int(r["src_id"]), int(r["dst_id"]), int(r["cnt"])
        for x, y in ((a, b), (b, a)):
            tot[lbl[x]] += c
            two_m += c
            if lbl[x] == lbl[y]:
                w_in[lbl[x]] += c
    got = linkgraph.lpa_modularity(sf_dir).to_pandas()
    q_sum = 0
    for _, r in got.iterrows():
        cm = int(r["community"])
        assert r["w_in"] == w_in.get(cm, 0)
        assert r["tot_w"] == tot.get(cm, 0)
        t = w_in.get(cm, 0) * two_m - tot.get(cm, 0) ** 2
        sign = 1 if t >= 0 else -1
        assert r["q_e6"] == sign * (abs(t) * 1_000_000 // (two_m * two_m))
        q_sum += r["q_e6"]
    assert set(got["community"]) == set(lbl.values())
    # modularity is bounded: Q in (-1, 1)
    assert -1_000_000 < q_sum < 1_000_000


def test_host_triads_matches_brute(sf_dir):
    from aerial_conversion_ray.pipelines import linkgraph

    e = (
        linkgraph.host_edges(sf_dir)
        .to_pandas()[["src_id", "dst_id"]]
        .drop_duplicates()
    )
    e = e[e["src_id"] != e["dst_id"]]
    E = set(zip(e["src_id"].astype(int), e["dst_id"].astype(int)))
    out = {}
    for a, b in E:
        out.setdefault(a, set()).add(b)
    ffl = cyc = 0
    for u, w in E:
        for v in out.get(w, ()):
            if (u, v) in E:
                ffl += 1
            if (v, u) in E:
                cyc += 1
    got = linkgraph.host_triads(sf_dir).to_pandas()
    assert got["n_ffl"].iloc[0] == ffl
    assert got["n_cyc_tuples"].iloc[0] == cyc
    assert cyc % 3 == 0


def test_random_walks_weighted_matches_brute(sf_dir):
    import bisect
    import random

    from aerial_conversion_ray.pipelines import linkgraph

    ew = (
        linkgraph.host_edges(sf_dir)
        .to_pandas()
        .groupby(["src_id", "dst_id"], as_index=False)["cnt"]
        .sum()
        .sort_values(["src_id", "dst_id"])
    )
    adj = {}
    for _, r in ew.iterrows():
        adj.setdefault(int(r["src_id"]), []).append(
            (int(r["dst_id"]), int(r["cnt"]))
        )
    got = linkgraph.random_walks_weighted(sf_dir).to_pandas()
    walks = {
        pid: dict(zip(g["step"], g["host"])) for pid, g in got.groupby("page_id")
    }
    pids = sorted(walks)
    for pid in random.Random(11).sample(pids, min(200, len(pids))):
        h = pid % linkgraph.NH
        want = {0: f"h{h}.example"}
        for t in range(linkgraph.WALK_LEN):
            nbrs = adj.get(h)
            if not nbrs:
                break
            wdeg = sum(c for _, c in nbrs)
            r = (
                (pid % linkgraph._WALK_PMOD) * 31
                + (h + 1) * linkgraph._WALK_A
                + t * linkgraph._WALK_B
            ) % wdeg
            cum = []
            s = 0
            for _, c in nbrs:
                s += c
                cum.append(s)
            h = nbrs[bisect.bisect_right(cum, r)][0]
            want[t + 1] = f"h{h}.example"
        assert walks[pid] == want, pid


def test_walk_skipgrams_matches_brute(sf_dir):
    import collections

    from aerial_conversion_ray.pipelines import linkgraph

    walks = linkgraph.random_walks(sf_dir).to_pandas()
    want = collections.Counter()
    for _, g in walks.groupby("page_id"):
        seq = g.sort_values("step")["host"].tolist()
        for i, c in enumerate(seq):
            for j in range(
                max(0, i - linkgraph.SG_WINDOW),
                min(len(seq), i + linkgraph.SG_WINDOW + 1),
            ):
                if j != i:
                    want[(c, seq[j])] += 1
    got = linkgraph.walk_skipgrams(sf_dir).to_pandas()
    gm = {
        (r["center"], r["context"]): r["n"] for _, r in got.iterrows()
    }
    assert gm == dict(want)


def test_host_percolation_matches_brute(sf_dir):
    import collections

    from aerial_conversion_ray.pipelines import linkgraph

    e0 = linkgraph.host_edges(sf_dir).to_pandas()
    total, nedges = int(e0["cnt"].sum()), len(e0)
    got = linkgraph.host_percolation(sf_dir).to_pandas().set_index("thr_pct")
    for pct in linkgraph.PERC_PCTS:
        thr = total * pct // (nedges * 100)
        e = e0[(e0["cnt"] >= thr) & (e0["src_id"] != e0["dst_id"])]
        adj = collections.defaultdict(set)
        for _, r in e.iterrows():
            adj[int(r["src_id"])].add(int(r["dst_id"]))
            adj[int(r["dst_id"])].add(int(r["src_id"]))
        hosts = sorted(adj)
        seen, comps = set(), []
        for h in hosts:
            if h in seen:
                continue
            stk, c = [h], 0
            seen.add(h)
            while stk:
                u = stk.pop()
                c += 1
                for v in adj[u]:
                    if v not in seen:
                        seen.add(v)
                        stk.append(v)
            comps.append(c)
        row = got.loc[pct]
        assert row["thr"] == thr
        assert row["n_hosts"] == len(hosts)
        assert row["n_components"] == len(comps)
        assert row["giant_size"] == (max(comps) if comps else 0)


def test_node2vec_walks_matches_brute(sf_dir):
    import random

    from aerial_conversion_ray.pipelines import linkgraph

    ed = (
        linkgraph.host_edges(sf_dir)
        .to_pandas()[["src_id", "dst_id"]]
        .drop_duplicates()
        .sort_values(["src_id", "dst_id"])
    )
    adj = {}
    E = set()
    for _, r in ed.iterrows():
        a, b = int(r["src_id"]), int(r["dst_id"])
        adj.setdefault(a, []).append(b)
        E.add((a, b))
    got = linkgraph.node2vec_walks(sf_dir).to_pandas()
    walks = {
        pid: dict(zip(g["step"], g["host"])) for pid, g in got.groupby("page_id")
    }
    pids = sorted(walks)
    for pid in random.Random(13).sample(pids, min(150, len(pids))):
        h = pid % linkgraph.NH
        prev = -1
        want = {0: f"h{h}.example"}
        for t in range(linkgraph.WALK_LEN):
            nbrs = adj.get(h)
            if not nbrs:
                break
            if t == 0:
                r = (
                    (pid % linkgraph._WALK_PMOD) * 31
                    + (h + 1) * linkgraph._WALK_A
                ) % len(nbrs)
                nxt = nbrs[r]
            else:
                ws = [
                    linkgraph.N2V_W_RETURN
                    if c == prev
                    else (
                        linkgraph.N2V_W_NEAR
                        if (prev, c) in E
                        else linkgraph.N2V_W_FAR
                    )
                    for c in nbrs
                ]
                tot = sum(ws)
                r = (
                    (pid % linkgraph._WALK_PMOD) * 31
                    + (h + 1) * linkgraph._WALK_A
                    + (prev + 2) * 97
                    + t * linkgraph._WALK_B
                ) % tot
                acc = 0
                for c, w in zip(nbrs, ws):
                    acc += w
                    if r < acc:
                        nxt = c
                        break
            prev, h = h, nxt
            want[t + 1] = f"h{h}.example"
        assert walks[pid] == want, pid


def test_events_sliding_distinct_matches_pandas(sf_dir):
    from aerial_conversion_ray.pipelines import relational
    from aerial_conversion_ray.sources.pages import read_table

    ev = read_table(sf_dir, "events", columns=["ts", "user_id"]).to_pandas()
    ts_s = ev["ts"].astype("int64") // 1_000_000
    base = (ts_s // 900) * 900
    rows = []
    for j in range(4):
        rows.append(
            __import__("pandas").DataFrame(
                {"w": base - j * 900, "u": ev["user_id"]}
            )
        )
    import pandas as pd

    ex = pd.concat(rows, ignore_index=True).drop_duplicates()
    want = ex.groupby("w").size().to_dict()
    # distinct per window, pandas nunique as the oracle
    want = ex.groupby("w")["u"].nunique().to_dict()
    got = relational.events_sliding_distinct(sf_dir).to_pandas()
    assert dict(zip(got["win_start"], got["n_users"])) == want


def test_kmv_distinct_matches_bottom_k(sf_dir):
    import numpy as np

    from aerial_conversion_ray.pipelines import text as text_mod
    from aerial_conversion_ray.sources.pages import read_table

    docs = read_table(sf_dir, "documents", columns=["text"]).to_pandas()
    toks = set()
    for t in docs["text"]:
        toks.update(t.split(" "))
    import pyarrow as pa

    h = np.sort(
        np.unique(text_mod._hash_arrow_strings(pa.array(sorted(toks))))
    )
    k = text_mod.KMV_K
    kth = h[k - 1]
    est = int((k - 1) * float(2**64) / float(kth))
    got = text_mod.kmv_distinct_tokens(sf_dir).to_pandas()
    assert got["k"].iloc[0] == k
    assert np.uint64(got["kth_hash"].iloc[0]) == kth
    assert got["est_distinct"].iloc[0] == est
    # the estimate is within the KMV error regime for tiny vocab
    true = len(toks)
    assert 0 < est < true * 6


def test_host_rank_fusion_matches_brute(sf_dir):
    from aerial_conversion_ray.pipelines import linkgraph

    pr = linkgraph.pagerank_hosts(sf_dir).to_pandas()
    kz = linkgraph.host_katz(sf_dir).to_pandas()

    def ranks(df, col):
        hid = df["host"].str.extract(r"^h(\d+)\.")[0].astype(int)
        order = sorted(
            zip(-df[col].to_numpy(), hid, df["host"]), key=lambda x: (x[0], x[1])
        )
        return {h: i + 1 for i, (_, _, h) in enumerate(order)}

    rp = ranks(pr, "pr_num")
    rk = ranks(kz, "katz_e6")
    got = linkgraph.host_rank_fusion(sf_dir).to_pandas()
    for _, r in got.iterrows():
        h = r["host"]
        assert r["pr_rank"] == rp[h]
        assert r["katz_rank"] == rk[h]
        assert r["rrf_e6"] == 1_000_000 // (linkgraph.RRF_K + rp[h]) + (
            1_000_000 // (linkgraph.RRF_K + rk[h])
        )
    assert len(got) == len(set(rp) & set(rk))


def test_tile_skew_matches_brute(sf_dir):
    import numpy as np

    from aerial_conversion_ray.config import EngineConfig
    from aerial_conversion_ray.pipelines import spatial

    cfg = EngineConfig(pages_rep=4)
    joined = spatial.tile_point_join(sf_dir, cfg, columns=["page_id"]).to_pandas()
    counts = joined.groupby("tile_id").size().to_numpy(np.int64)
    x = np.sort(counts)
    nt, s = len(x), int(x.sum())
    i = np.arange(1, nt + 1, dtype=np.int64)
    gini = (2 * int((i * x).sum()) - (nt + 1) * s) * 1_000_000 // (nt * s)
    got = spatial.tile_skew(sf_dir, cfg).to_pandas()
    assert got["n_tiles"].iloc[0] == nt
    assert got["n_rows"].iloc[0] == s
    assert got["max_tile"].iloc[0] == int(x[-1])
    assert got["gini_e6"].iloc[0] == gini


def test_jl_projection_audit_matches_numpy(sf_dir):
    import numpy as np

    from aerial_conversion_ray.pipelines import embeddings as em
    from aerial_conversion_ray.sources.pages import read_table

    df = read_table(
        sf_dir, "embeddings", columns=["vec_id", "embedding"]
    ).to_pandas()
    df = df.set_index("vec_id")
    got = em.jl_projection_audit(sf_dir).to_pandas().set_index("vec_id")
    d = len(df["embedding"].iloc[0])
    j = np.arange(d, dtype=np.int64)[:, None]
    k = np.arange(em.JL_DIM, dtype=np.int64)[None, :]
    sgn = 1 - 2 * (((j * 2654435761 + k * 40503) >> 16) & 1)
    checked = 0
    for vid in got.index:
        qa = np.floor(np.array(df.loc[vid, "embedding"], dtype=np.float64) * em.JL_Q).astype(np.int64)
        qb = np.floor(np.array(df.loc[vid + 1, "embedding"], dtype=np.float64) * em.JL_Q).astype(np.int64)
        orig = int(((qa - qb) ** 2).sum())
        proj = int((((qa - qb) @ sgn) ** 2).sum())
        row = got.loc[vid]
        assert row["orig_d2"] == orig
        assert row["proj_d2"] == proj
        assert row["ratio_e6"] == proj * 1_000_000 // (orig * em.JL_DIM)
        checked += 1
    assert checked > 0
    # JL sanity (population-level — d'=16 has a wide per-pair tail):
    # the MEDIAN distortion sits near 1.0
    med = got["ratio_e6"].median()
    assert 300_000 < med < 3_000_000


def test_rank_correlation_matches_brute(sf_dir):
    from aerial_conversion_ray.pipelines import linkgraph

    fused = linkgraph.host_rank_fusion(sf_dir).to_pandas()
    n = len(fused)
    sd2 = int(((fused["pr_rank"] - fused["katz_rank"]) ** 2).sum())
    got = linkgraph.rank_correlation(sf_dir).to_pandas()
    assert got["n"].iloc[0] == n
    assert got["sum_d2"].iloc[0] == sd2
    assert got["spearman_e6"].iloc[0] == 1_000_000 - (6_000_000 * sd2) // (
        n * (n * n - 1)
    )
    # the two centralities broadly agree on this graph
    assert got["spearman_e6"].iloc[0] > 0


def test_host_attack_curve_matches_brute(sf_dir):
    import collections

    from aerial_conversion_ray.pipelines import linkgraph

    e0 = linkgraph.host_edges(sf_dir).to_pandas()
    deg = collections.Counter()
    for _, r in e0.iterrows():
        deg[int(r["src_id"])] += int(r["cnt"])
        deg[int(r["dst_id"])] += int(r["cnt"])
    order = sorted(deg, key=lambda h: (-deg[h], h))
    got = linkgraph.host_attack_curve(sf_dir).to_pandas().set_index("k_removed")
    for k in linkgraph.ATTACK_KS:
        gone = set(order[:k])
        adj = collections.defaultdict(set)
        for _, r in e0.iterrows():
            a, b = int(r["src_id"]), int(r["dst_id"])
            if a != b and a not in gone and b not in gone:
                adj[a].add(b)
                adj[b].add(a)
        seen, comps = set(), []
        for h in sorted(adj):
            if h in seen:
                continue
            stk, c = [h], 0
            seen.add(h)
            while stk:
                u = stk.pop()
                c += 1
                for v in adj[u]:
                    if v not in seen:
                        seen.add(v)
                        stk.append(v)
            comps.append(c)
        row = got.loc[k]
        assert row["n_hosts"] == len(adj)
        assert row["n_components"] == len(comps)
        assert row["giant_size"] == (max(comps) if comps else 0)
    # hub attack must shatter faster than it trims: giant shrinks
    assert got["giant_size"].iloc[-1] < got["giant_size"].iloc[0]


def test_kendall_tau_matches_brute(sf_dir):
    import itertools

    from aerial_conversion_ray.pipelines import linkgraph

    fused = linkgraph.host_rank_fusion(sf_dir).to_pandas()
    pairs = list(zip(fused["pr_rank"], fused["katz_rank"]))
    conc = disc = 0
    for (a1, b1), (a2, b2) in itertools.combinations(pairs, 2):
        s = (a1 - a2) * (b1 - b2)
        conc += s > 0
        disc += s < 0
    n = len(pairs)
    t = conc - disc
    tau = (1 if t >= 0 else -1) * (abs(t) * 1_000_000 // (n * (n - 1) // 2))
    got = linkgraph.kendall_tau(sf_dir).to_pandas()
    assert (
        got["n"].iloc[0],
        got["concordant"].iloc[0],
        got["discordant"].iloc[0],
        got["tau_e6"].iloc[0],
    ) == (n, conc, disc, tau)


def test_rich_club_matches_brute(sf_dir):
    import collections

    from aerial_conversion_ray.pipelines import linkgraph

    e = (
        linkgraph.host_edges(sf_dir)
        .to_pandas()[["src_id", "dst_id"]]
        .drop_duplicates()
    )
    e = e[e["src_id"] != e["dst_id"]]
    und = set()
    for _, r in e.iterrows():
        a, b = sorted((int(r["src_id"]), int(r["dst_id"])))
        und.add((a, b))
    deg = collections.Counter()
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    got = linkgraph.rich_club(sf_dir).to_pandas().set_index("k")
    for k in linkgraph.RICH_KS:
        club = {h for h, d in deg.items() if d > k}
        if len(club) < 2:
            assert k not in got.index
            continue
        ek = sum(1 for a, b in und if a in club and b in club)
        row = got.loc[k]
        assert row["n_club"] == len(club)
        assert row["e_club"] == ek
        assert row["phi_e6"] == 2 * ek * 1_000_000 // (
            len(club) * (len(club) - 1)
        )


def test_embed_drift_matches_brute(sf_dir):
    import numpy as np

    from aerial_conversion_ray.pipelines import embeddings as em
    from aerial_conversion_ray.sources.pages import read_table

    df = read_table(
        sf_dir, "embeddings", columns=["vec_id", "embedding", "label"]
    ).to_pandas()
    got = em.embed_drift(sf_dir).to_pandas().set_index("label")
    for lab, g in df.groupby("label"):
        sums = {0: None, 1: None}
        ns = {0: 0, 1: 0}
        for _, r in g.iterrows():
            q = [int(np.floor(float(x) * em.JL_Q)) for x in r["embedding"]]
            h = int(r["vec_id"]) % 2
            ns[h] += 1
            sums[h] = q if sums[h] is None else [a + b for a, b in zip(sums[h], q)]
        if sums[0] is None or sums[1] is None:
            assert lab not in got.index
            continue
        dot = sum(a * b for a, b in zip(sums[0], sums[1]))
        na2 = sum(a * a for a in sums[0])
        nb2 = sum(b * b for b in sums[1])
        row = got.loc[lab]
        assert row["n_a"] == ns[0] and row["n_b"] == ns[1]
        assert row["dot_sign"] == (1 if dot >= 0 else -1)
        assert row["cos2_e6"] == dot * dot * 1_000_000 // (na2 * nb2)


def test_kwic_matches_brute(sf_dir):
    from aerial_conversion_ray.pipelines import text as text_mod
    from aerial_conversion_ray.sources.pages import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"]).to_pandas()
    want = []
    for _, r in docs.iterrows():
        ws = r["text"].split(" ")
        for i, w in enumerate(ws):
            if w == text_mod.KWIC_TOKEN:
                want.append(
                    (
                        int(r["doc_id"]),
                        i,
                        ws[i - 1] if i > 0 else "",
                        ws[i + 1] if i + 1 < len(ws) else "",
                    )
                )
    got = text_mod.kwic(sf_dir).to_pandas()
    gm = sorted(
        zip(got["doc_id"], got["pos"], got["left1"], got["right1"])
    )
    assert gm == sorted(want)
