"""Text/dedup operator properties: determinism, recall vs exact
Jaccard, SimHash similarity behavior, winnowing shift behavior."""

import numpy as np
import pandas as pd
import pytest

from aerial_conversion_ray.pipelines import text


@pytest.fixture(scope="module")
def jaccard(sf_dir):
    df = text.jaccard_pairs(sf_dir, threshold=0.5).to_pandas()
    if len(df) == 0:  # empty Ray datasets lose their columns in to_pandas
        return set()
    return {(int(a), int(b)) for a, b in zip(df["a"], df["b"])}


def test_jaccard_max_df_matches_sql(sf_dir):
    """The df-capped path (hot-token broadcast filter + kept-universe
    sizes) must equal the mirrored SQL exactly."""
    import duckdb

    got = text.jaccard_pairs(sf_dir, threshold=0.5, max_df=400).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = con.execute(text.jaccard_pairs_sql(threshold=0.5, max_df=400)).df()
    ga = sorted(zip(got["a"], got["b"], got["inter"])) if len(got) else []
    ea = sorted(zip(exp["a"], exp["b"], exp["inter"]))
    assert ga == ea
    # and the cap actually bites at this sf (hot tokens exist)
    uncapped = text.jaccard_pairs(sf_dir, threshold=0.5).to_pandas()
    assert len(got) < len(uncapped)


def test_minhash_deterministic(sf_dir):
    a = text.minhash_lsh_pairs(sf_dir).to_pandas()
    b = text.minhash_lsh_pairs(sf_dir).to_pandas()
    ka = sorted(zip(a["a"], a["b"]))
    kb = sorted(zip(b["a"], b["b"]))
    assert ka == kb


def test_minhash_pairs_verified(sf_dir):
    """Every emitted LSH pair passed the exact shingle-Jaccard verify,
    so each pair's true Jaccard must clear the threshold."""
    pairs = text.minhash_lsh_pairs(sf_dir, threshold=0.5).to_pandas()
    assert (pairs["a"] < pairs["b"]).all()
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
    grams = {
        d: set(text._token_hashes(np.array([t]), 3)[0].tolist())
        for d, t in texts.items()
    }
    for a, b in zip(pairs["a"], pairs["b"]):
        ga, gb = grams[int(a)], grams[int(b)]
        jac = len(ga & gb) / len(ga | gb)
        assert jac >= 0.5


def test_simhash_close_for_near_duplicates(sf_dir, jaccard):
    """Hamming distance of SimHash fingerprints for high-Jaccard pairs
    is below the corpus median (the classic SimHash property)."""
    sim = text.simhash_fingerprints(sf_dir).to_pandas()
    fp = dict(zip(sim["doc_id"], sim["simhash"].astype(np.uint64)))
    if not jaccard:
        pytest.skip("no high-jaccard pairs at this sf")

    def ham(x, y):
        return bin(int(x) ^ int(y)).count("1")

    dup_d = np.mean([ham(fp[a], fp[b]) for a, b in list(jaccard)[:200]])
    rng = np.random.default_rng(0)
    ids = sim["doc_id"].to_numpy()
    rand_pairs = rng.choice(ids, size=(200, 2))
    rand_d = np.mean([ham(fp[a], fp[b]) for a, b in rand_pairs if a != b])
    assert dup_d < rand_d


def test_rolling_fingerprint_content_defined(sf_dir):
    """Winnowing fingerprints are content-defined: the same document
    yields identical (fingerprint, pos) sets across runs, and distinct
    docs overlap only via genuinely shared byte windows."""
    a = text.rolling_fingerprint(sf_dir).to_pandas()
    b = text.rolling_fingerprint(sf_dir).to_pandas()
    ka = sorted(zip(a["doc_id"], a["pos"], a["fingerprint"]))
    kb = sorted(zip(b["doc_id"], b["pos"], b["fingerprint"]))
    assert ka == kb
    # every doc with >= window bytes emits at least one fingerprint
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    long_docs = {
        d for d, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
        if len(t.encode()) >= 16 * 8  # window x keep_mod: expected hit
    }
    covered = set(a["doc_id"])
    assert len(long_docs - covered) / max(1, len(long_docs)) < 0.05


def test_langid_beats_chance(sf_dir):
    df = text.langid_scores(sf_dir).to_pandas()
    n_langs = df["lang"].nunique()
    acc = df["agree"].mean()
    assert acc > 1.0 / n_langs + 0.1, f"accuracy {acc:.3f} vs {n_langs} classes"


def test_dedup_exact_collision_safe(sf_dir):
    """Representatives partition the corpus: n_copies sums to the doc
    count and each representative id appears once."""
    import pyarrow.parquet as pq

    rep = text.dedup_exact(sf_dir).to_pandas()
    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    assert rep["n_copies"].sum() == n_docs
    assert rep["doc_id"].is_unique


def test_dedup_exact_collision_resolution(sf_dir):
    """Force 128-bit collisions (constant hash pair) and assert the
    audit detects them via n_chars disagreement and the text-fetch
    resolution path reproduces the exact group-by-text answer."""
    import numpy as np

    import duckdb

    def degenerate(col):
        n = len(col)
        return np.zeros(n, np.uint64), np.zeros(n, np.uint64)

    got = (
        text.dedup_exact(sf_dir, hash_pair_fn=degenerate)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = (
        con.execute(text.DEDUP_EXACT_SQL)
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["n_copies"].tolist() == exp["n_copies"].tolist()


def test_simhash_and_rolling_match_sql(sf_dir):
    """The simhash / rolling-fingerprint oracles restate the numpy
    kernels as DuckDB hugeint Horner folds — must match bit-for-bit.
    Depends on the corpus being ASCII (codepoint == byte), asserted."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    assert con.execute(
        "select count(*) from documents where strlen(text) <> length(text)"
    ).fetchone()[0] == 0

    got = (
        text.simhash_fingerprints(sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = con.execute(text.SIMHASH_SQL + " order by doc_id").df()
    assert list(got["simhash"]) == list(exp["simhash"])

    got = (
        text.rolling_fingerprint(sf_dir)
        .to_pandas()
        .sort_values(["doc_id", "pos"])
        .reset_index(drop=True)
    )
    exp = con.execute(
        text.rolling_fingerprint_sql() + " order by doc_id, pos"
    ).df()
    assert list(got["fingerprint"]) == list(exp["fingerprint"])
    assert list(got["pos"]) == list(exp["pos"])


def test_quality_filter_matches_oracle(sf_dir):
    import duckdb

    from aerial_conversion_ray.pipelines import text as tp

    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    got = tp.quality_filter(sf_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = con.sql(tp.QUALITY_FILTER_SQL).df().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )
    # the rule set must actually split the corpus (not all-pass/all-fail)
    assert 0 < got["keep"].mean() < 1


def test_host_stats_matches_oracle(sf_dir):
    import duckdb

    import __ray_entry__ as entrymod
    from aerial_conversion_ray.pipelines import text as tp

    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    got = (
        tp.host_stats(sf_dir, entrymod.CFG)
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    want = (
        con.sql(tp.host_stats_sql(entrymod.CFG))
        .df()
        .sort_values("host")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )
    assert got["host"].str.endswith(".example").all()


def test_regex_tokens_matches_oracle(sf_dir):
    import duckdb

    from aerial_conversion_ray.pipelines import text as tp

    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    got = tp.regex_tokens(sf_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = con.sql(tp.REGEX_TOKENS_SQL).df().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )
    assert (got["n_pieces"] > 0).all()


def test_sample_hash_matches_oracle(sf_dir):
    import duckdb

    from aerial_conversion_ray.pipelines import text as tp

    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    got = tp.sample_hash(sf_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = con.sql(tp.sample_hash_sql()).df().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )
    # the rate actually bites (neither empty nor full)
    n_docs = con.sql("select count(*) from documents").fetchone()[0]
    assert 0 < len(got) < n_docs


def test_hll_distinct_within_error(sf_dir):
    import duckdb

    from aerial_conversion_ray.pipelines import text as tp

    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    got = tp.approx_distinct_tokens(sf_dir).to_pandas().set_index("lang")
    exact = con.sql(
        "select lang, count(distinct token) as n from ("
        "select lang, unnest(string_split(text, ' ')) as token from documents"
        ") group by lang"
    ).df().set_index("lang")
    assert set(got.index) == set(exact.index)
    for lang in exact.index:
        e, g = exact.loc[lang, "n"], got.loc[lang, "est_distinct"]
        assert abs(g - e) / e < 0.15, (lang, e, g)


def test_hll_registers_merge_associative(sf_dir):
    """Splitting the corpus into halves and max-merging registers must
    equal the single-pass registers (the sketch's shuffle-safety)."""
    import pyarrow.parquet as pq

    from aerial_conversion_ray.pipelines import text as tp

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
    toks = __import__("pyarrow").compute.split_pattern(t["text"], " ")
    n = __import__("pyarrow").compute.list_value_length(toks).to_numpy().astype(np.int64)
    flat = toks.combine_chunks().flatten()
    h = tp._hash_arrow_strings(flat)
    grp = np.zeros(len(h), dtype=np.int64)
    whole = tp._hll_registers(h, grp, 1)
    mid = len(h) // 2
    a = tp._hll_registers(h[:mid], grp[:mid], 1)
    b = tp._hll_registers(h[mid:], grp[mid:], 1)
    assert (np.maximum(a, b) == whole).all()


def test_tfidf_matches_oracle(sf_dir):
    import duckdb

    from aerial_conversion_ray.pipelines import text as tp

    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    got = tp.tfidf_scores(sf_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = con.sql(tp.TFIDF_SQL).df().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )
    # rarer vocabulary -> strictly higher score than an all-stopword doc would get
    assert got["score"].nunique() > 1


def test_decontaminate_matches_sql(sf_dir):
    """Hash-gram membership probe must equal the exact string-gram SQL
    (collision-free at test scale by construction)."""
    import duckdb

    got = text.decontaminate(sf_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = con.execute(text.decontaminate_sql()).df().sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(exp) > 0
    for c in ["doc_id", "n_grams", "n_shared", "contaminated"]:
        assert (got[c].to_numpy(np.int64) == exp[c].to_numpy(np.int64)).all(), c
    # eval docs are excluded from the output
    assert (got["doc_id"].to_numpy(np.int64) % text.EVAL_MOD != 0).all()


def test_pack_sequences_contiguous(sf_dir):
    """Packing is an exact prefix sum: offsets are contiguous in doc_id
    order, pack ids are consistent with seq_len, and the distributed
    two-level computation equals the window-function SQL."""
    import duckdb

    got = text.pack_sequences(sf_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    off = got["tok_offset"].to_numpy(np.int64)
    n = got["n_tokens"].to_numpy(np.int64)
    assert off[0] == 0
    assert (off[1:] == off[:-1] + n[:-1]).all()
    assert (got["pack_first"].to_numpy(np.int64) == off // text.PACK_SEQ_LEN).all()
    assert (
        got["pack_last"].to_numpy(np.int64) == (off + n - 1) // text.PACK_SEQ_LEN
    ).all()
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = con.execute(text.pack_sequences_sql()).df().sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(exp)
    for c in got.columns:
        assert (got[c].to_numpy(np.int64) == exp[c].to_numpy(np.int64)).all(), c


def test_chunk_windows_overlap_and_coverage(sf_dir):
    """Window algebra: ceil(n_tok/s) chunks per doc, chunk i holds
    tokens [i*s, min(i*s+w, n)), adjacent chunks overlap by w-s
    tokens, and chunk 0 is a prefix of the document."""
    import pyarrow.parquet as pq

    from aerial_conversion_ray.pipelines.text import CHUNK_S, CHUNK_W, chunk_windows

    res = chunk_windows(sf_dir).to_pandas()
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    text = dict(zip(docs["doc_id"], docs["text"]))
    per_doc = res.groupby("doc_id")
    for doc_id, g in list(per_doc)[:50]:
        toks = text[doc_id].split(" ")
        n = len(toks)
        g = g.sort_values("chunk_idx")
        assert len(g) == -(-n // CHUNK_S)
        for i, row in zip(g["chunk_idx"], g.itertuples()):
            lo, hi = i * CHUNK_S, min(i * CHUNK_S + CHUNK_W, n)
            assert row.content == " ".join(toks[lo:hi])
            assert row.n_tokens == hi - lo


def test_dedup_clean_text_python_oracle(sf_dir):
    """Full independent oracle: python dict first-wins over 16-token
    segments, rebuild every doc's cleaned text, compare byte-for-byte."""
    import pyarrow.parquet as pq

    from aerial_conversion_ray.pipelines.text import SEG_TOKENS, dedup_clean_text

    docs = (
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .to_pandas()
        .sort_values("doc_id")
    )
    seen = set()
    expect = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = text.split(" ")
        kept = []
        for s in range(0, len(toks), SEG_TOKENS):
            seg = " ".join(toks[s : s + SEG_TOKENS])
            if seg not in seen:
                seen.add(seg)
                kept.append(seg)
        expect[doc_id] = (" ".join(kept), len(kept))
    res = dedup_clean_text(sf_dir).to_pandas()
    assert len(res) == len(docs)
    for doc_id, clean, n_kept in zip(res["doc_id"], res["clean_text"], res["n_kept"]):
        assert (clean, n_kept) == expect[doc_id], doc_id
    # the rule is non-vacuous and non-destructive on the corpus
    assert (res["n_kept"] > 0).any()
    assert sum(v[1] for v in expect.values()) == len(seen)


def test_collocations_python_oracle(sf_dir):
    """Independent Counter-based recompute of the lift-filtered
    collocation set."""
    from collections import Counter

    import pyarrow.parquet as pq

    from aerial_conversion_ray.pipelines.text import (
        COLLOC_MIN_C,
        COLLOC_TAU,
        collocations,
    )

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"]).to_pandas()
    uni, big = Counter(), Counter()
    for text in docs["text"]:
        toks = text.split(" ")
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    n = sum(uni.values())
    expect = {
        (a, b): (c, uni[a], uni[b], c * n * 1_000_000 // (uni[a] * uni[b]))
        for (a, b), c in big.items()
        if c >= COLLOC_MIN_C and c * n > COLLOC_TAU * uni[a] * uni[b]
    }
    got = collocations(sf_dir).to_pandas()
    assert len(got) == len(expect) > 0
    for r in got.itertuples():
        assert expect[(r.tok_a, r.tok_b)] == (r.c_xy, r.c_a, r.c_b, r.lift_e6)
