"""Text analysis + deduplication over the documents corpus.

Engine-new operators a 100 TB training-data pipeline needs (per the
build brief), expressed Ray-Data-first:

- token stats / quality scoring (vectorized pyarrow/pandas string ops)
- exact dedup (content hash -> hash-partitioned groupby -> min-id rep)
- MinHash + LSH near-dup (shingle -> minhash -> band explode ->
  band-bucket groupby -> verified Jaccard pairs)
- SimHash fingerprints, word-set Jaccard pair mining
- rolling-hash document fingerprinting
- n-gram language-ID heuristic

Everything deterministic: hash functions are explicit polynomial /
FNV-style integer arithmetic (no process-seeded ``hash()``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..sources.pages import read_table

STOPWORDS = ("the", "a", "and", "of", "to")

FNV_OFFSET = np.uint64(14695981039346656037)
FNV_PRIME = np.uint64(1099511628211)


# --------------------------------------------------------------------------
# token / quality stats (SQL-mirrored)
# --------------------------------------------------------------------------

def token_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-document token statistics, single-space tokenization.

    Columns: doc_id, n_tokens, n_distinct_tokens, n_stopwords,
    avg_token_chars (= (len - (n-1)) / n given single-space text)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        n = pc.list_value_length(toks).to_numpy().astype(np.int64)
        flat = toks.combine_chunks().flatten() if isinstance(toks, pa.ChunkedArray) else toks.flatten()
        offs = np.concatenate([[0], np.cumsum(n)])
        is_stop = pc.is_in(flat, value_set=pa.array(STOPWORDS)).to_numpy(
            zero_copy_only=False
        )
        csum = np.concatenate([[0], np.cumsum(is_stop)])
        n_stop = csum[offs[1:]] - csum[offs[:-1]]
        # distinct per doc: sort (doc, token) pairs and count boundaries
        doc_idx = np.repeat(np.arange(len(n)), n)
        tok_np = flat.to_numpy(zero_copy_only=False)
        order = np.lexsort((tok_np, doc_idx))
        d_s, t_s = doc_idx[order], tok_np[order]
        new = np.ones(len(d_s), dtype=np.int64)
        if len(d_s) > 1:
            new[1:] = (d_s[1:] != d_s[:-1]) | (t_s[1:] != t_s[:-1])
        ndist = np.bincount(d_s, weights=new, minlength=len(n)).astype(np.int64)
        length = pc.utf8_length(t["text"]).to_numpy().astype(np.float64)
        avg_chars = (length - (n - 1)) / n
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n),
                "n_distinct_tokens": pa.array(ndist),
                "n_stopwords": pa.array(n_stop.astype(np.int64)),
                "avg_token_chars": pa.array(avg_chars),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


TOKEN_STATS_SQL = f"""
select doc_id,
       len(string_split(text, ' ')) as n_tokens,
       len(list_distinct(string_split(text, ' '))) as n_distinct_tokens,
       len(list_filter(string_split(text, ' '),
           x -> x in ({", ".join(repr(s) for s in STOPWORDS)}))) as n_stopwords,
       (cast(length(text) as double) - (len(string_split(text, ' ')) - 1))
         / len(string_split(text, ' ')) as avg_token_chars
from documents
"""


def lang_stats(sf_dir: str) -> ray.data.Dataset:
    """Grouped corpus stats per (lang, source): docs, chars (A3
    analog: the reference's per-category counts)."""
    from ray.data.aggregate import Count, Sum

    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "source", "n_chars"])
    return (
        ds.groupby(["lang", "source"])
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars"))
        .sort(["lang", "source"])
    )


LANG_STATS_SQL = """
select lang, source, count(*) as n_docs, cast(sum(n_chars) as bigint) as sum_chars
from documents group by lang, source order by lang, source
"""


# --------------------------------------------------------------------------
# exact dedup (SE2 pattern: hash-partition + per-group first)
# --------------------------------------------------------------------------

def _fnv1a_bytes_vec(texts: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit FNV-1a over utf-8 bytes, vectorized over
    the flattened byte buffer (no per-row Python hashing)."""
    enc = np.char.encode(texts.astype("U"), "utf-8")
    lens = np.char.str_len(enc.astype("S")).astype(np.int64)  # byte lengths
    # fall back: lens via vectorized len of bytes objects
    lens = np.frompyfunc(len, 1, 1)(enc).astype(np.int64)
    buf = np.frombuffer(b"".join(enc.tolist()), dtype=np.uint8)
    offs = np.concatenate([[0], np.cumsum(lens)])
    out = np.empty(len(texts), dtype=np.uint64)
    # chunked loop over rows but vectorized inner via reduce on uint64 —
    # FNV is inherently sequential per row; keep rows short path in C by
    # using np.frompyfunc over memoryviews is still Python.  Instead use
    # a polynomial hash which vectorizes:  h = sum(b_i * P^(L-i)) mod 2^64
    P = np.uint64(1099511628211)
    # compute per-byte powers via segmented cumprod trick:
    # pos within row:
    pos = np.arange(len(buf), dtype=np.int64) - np.repeat(offs[:-1], lens)
    with np.errstate(over="ignore"):
        # P^pos mod 2^64 via exponentiation by squaring on the exponent bits
        powers = np.ones(len(buf), dtype=np.uint64)
        base = P
        e = pos.astype(np.uint64)
        bit = np.uint64(1)
        maxbits = int(pos.max()).bit_length() if len(pos) else 0
        for _ in range(maxbits):
            mask = (e & bit) != 0
            powers[mask] *= base
            base = base * base
            bit <<= np.uint64(1)
        terms = (buf.astype(np.uint64) + np.uint64(31)) * powers
        csum = np.concatenate([[np.uint64(0)], np.cumsum(terms, dtype=np.uint64)])
        out = csum[offs[1:]] - csum[offs[:-1]]
        out += lens.astype(np.uint64) * FNV_OFFSET
    return out


def content_hash_batch(t: pa.Table, col: str = "text") -> pa.Table:
    h = _fnv1a_bytes_vec(t[col].to_numpy(zero_copy_only=False))
    return t.append_column("content_hash", pa.array(h.astype(np.int64)))


def dedup_exact(sf_dir: str) -> ray.data.Dataset:
    """Exact dedup: content-hash column -> hash groupby -> per distinct
    text keep min doc_id + count.  Collision-safe: groups by the TEXT
    within each hash group."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    ds = ds.map_batches(content_hash_batch, batch_format="pyarrow")

    def rep(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("text", as_index=False).agg(
            doc_id=("doc_id", "min"), n_copies=("doc_id", "size")
        )
        return g[["doc_id", "n_copies"]]

    return ds.groupby("content_hash").map_groups(rep, batch_format="pandas")


DEDUP_EXACT_SQL = """
select min(doc_id) as doc_id, count(*) as n_copies
from documents group by text
"""


# --------------------------------------------------------------------------
# word-set Jaccard similar pairs (SQL-mirrored)
# --------------------------------------------------------------------------

N_PAIR_BUCKETS = 64


def jaccard_pairs(sf_dir: str, threshold: float = 0.5) -> ray.data.Dataset:
    """All document pairs (a < b) with word-SET Jaccard >= threshold.

    Engine: per-batch token explode (each doc is one input row, so
    per-doc distinct-token sizes are exact per batch) -> inverted list
    per token via one groupby -> pair expansion per token group,
    hash-bucketed on (a, b) -> ONE coarse bucket shuffle -> vectorized
    pandas sum + score inside each bucket.

    The (a, b) aggregation deliberately avoids a fine-grained Ray
    groupby (250k groups is pathological for the sort-based aggregate);
    a 64-bucket ``groupby(bucket).map_groups`` keeps the shuffle
    all-to-all but the per-group combine is one vectorized pandas
    groupby — the engine's general many-small-groups pattern."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        n = pc.list_value_length(toks).to_numpy().astype(np.int64)
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        doc = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), n)
        order = np.lexsort((flat, doc))
        d_s, t_s = doc[order], flat[order]
        keep = np.ones(len(d_s), dtype=bool)
        if len(d_s) > 1:
            keep[1:] = (d_s[1:] != d_s[:-1]) | (t_s[1:] != t_s[:-1])
        return pa.table({"doc_id": pa.array(d_s[keep]), "token": pa.array(t_s[keep])})

    pairs_src = ds.map_batches(explode, batch_format="pyarrow")

    # per-doc distinct token counts: docs never split across batches
    # (one row in, all its tokens out in the same batch) -> exact
    # per-batch partials; tiny table -> broadcast
    def doc_sizes(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        u, c = np.unique(d, return_counts=True)
        return pa.table({"doc_id": pa.array(u), "n": pa.array(c.astype(np.int64))})

    sizes = pa.concat_tables(
        list(
            pairs_src.map_batches(doc_sizes, batch_format="pyarrow").iter_batches(
                batch_size=1 << 20, batch_format="pyarrow"
            )
        )
    )
    size_map = dict(
        zip(
            sizes["doc_id"].to_numpy(zero_copy_only=False).tolist(),
            sizes["n"].to_numpy(zero_copy_only=False).tolist(),
        )
    )

    def pair_count(df: pd.DataFrame) -> pd.DataFrame:
        docs = np.sort(df["doc_id"].to_numpy())
        if len(docs) < 2:
            return pd.DataFrame(
                {
                    "a": pd.Series(dtype=np.int64),
                    "b": pd.Series(dtype=np.int64),
                    "bucket": pd.Series(dtype=np.int64),
                }
            )
        ai, bi = np.triu_indices(len(docs), k=1)
        a, b = docs[ai], docs[bi]
        bucket = (a * np.int64(1000003) + b) % N_PAIR_BUCKETS
        return pd.DataFrame({"a": a, "b": b, "bucket": bucket})

    def bucket_sum_score(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["a", "b"], as_index=False).size()
        na = g["a"].map(size_map).to_numpy(dtype=np.float64)
        nb = g["b"].map(size_map).to_numpy(dtype=np.float64)
        inter = g["size"].to_numpy(dtype=np.int64)
        jac = inter / (na + nb - inter)
        out = g[jac >= threshold]
        return pd.DataFrame(
            {
                "a": out["a"].to_numpy(),
                "b": out["b"].to_numpy(),
                "inter": out["size"].to_numpy(dtype=np.int64),
            }
        )

    return (
        pairs_src.groupby("token")
        .map_groups(pair_count, batch_format="pandas")
        .groupby("bucket")
        .map_groups(bucket_sum_score, batch_format="pandas")
    )


def jaccard_pairs_sql(threshold: float = 0.5) -> str:
    return f"""
with toks as (
  select distinct doc_id, unnest(string_split(text, ' ')) as token from documents
), sizes as (
  select doc_id, count(*) as n from toks group by doc_id
), inter as (
  select a.doc_id as a, b.doc_id as b, count(*) as inter
  from toks a join toks b on a.token = b.token and a.doc_id < b.doc_id
  group by a.doc_id, b.doc_id
)
select a, b, inter from inter
join sizes sa on sa.doc_id = a
join sizes sb on sb.doc_id = b
where cast(inter as double) / (sa.n + sb.n - inter) >= {threshold!r}
"""


# --------------------------------------------------------------------------
# MinHash + LSH near-dup (scale path; rows-only + pytest oracle)
# --------------------------------------------------------------------------

N_HASHES = 64
N_BANDS = 16
ROWS_PER_BAND = N_HASHES // N_BANDS
MERSENNE = np.uint64((1 << 61) - 1)


def _token_hashes(texts: np.ndarray, shingle: int) -> list[np.ndarray]:
    """Per doc: uint64 hashes of word ``shingle``-grams (deterministic
    polynomial hash over token FNV codes)."""
    out = []
    for s in texts:
        toks = s.split(" ")
        codes = np.array(
            [_poly_hash_str(t) for t in toks], dtype=np.uint64
        )
        if len(codes) < shingle:
            out.append(codes if len(codes) else np.zeros(1, dtype=np.uint64))
            continue
        h = np.zeros(len(codes) - shingle + 1, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(shingle):
                h = h * np.uint64(1000003) + codes[j : len(codes) - shingle + 1 + j]
        out.append(np.unique(h))
    return out


def _poly_hash_str(s: str) -> int:
    h = 1469598103934665603
    for ch in s.encode("utf-8"):
        h = ((h ^ ch) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


class MinHasher:
    """Actor stage: minhash signatures.  Hash family parameters are
    built ONCE in __init__ (a_i, b_i for h_i(x) = (a x + b) mod p)."""

    def __init__(self, shingle: int = 3):
        rng = np.random.default_rng(12345)  # fixed seed: deterministic family
        self.a = rng.integers(1, (1 << 61) - 1, N_HASHES, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, N_HASHES, dtype=np.uint64)
        self.shingle = shingle

    def signature(self, grams: np.ndarray) -> np.ndarray:
        x = grams % MERSENNE
        with np.errstate(over="ignore"):
            hx = (x[None, :] * self.a[:, None] + self.b[:, None]) % MERSENNE
        return hx.min(axis=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_numpy(zero_copy_only=False)
        grams = _token_hashes(texts, self.shingle)
        sigs = np.stack([self.signature(g) for g in grams])  # (n, N_HASHES)
        # band hashes: fold ROWS_PER_BAND rows per band
        band_vals = sigs.reshape(len(texts), N_BANDS, ROWS_PER_BAND)
        with np.errstate(over="ignore"):
            bh = np.zeros((len(texts), N_BANDS), dtype=np.uint64)
            for j in range(ROWS_PER_BAND):
                bh = bh * np.uint64(1000003) + band_vals[:, :, j]
        doc = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), N_BANDS)
        band_id = np.tile(np.arange(N_BANDS, dtype=np.int64), len(texts))
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "band_id": pa.array(band_id),
                "band_hash": pa.array(bh.reshape(-1).astype(np.int64)),
            }
        )


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.5, shingle: int = 3) -> ray.data.Dataset:
    """Near-dup candidate pairs via MinHash-LSH, verified by true
    shingle-set Jaccard >= threshold.  Output (a, b) with a < b.

    Pipeline: minhash signatures (actor pool) -> explode to
    (band_id, band_hash, doc_id) -> groupby band bucket -> pairs ->
    distinct -> verify with a broadcast shingle-set lookup."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    bands = ds.map_batches(MinHasher, batch_format="pyarrow", concurrency=2,
                           fn_constructor_kwargs={"shingle": shingle})

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        docs = np.unique(df["doc_id"].to_numpy())
        if len(docs) < 2:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64)})
        ai, bi = np.triu_indices(len(docs), k=1)
        return pd.DataFrame({"a": docs[ai], "b": docs[bi]})

    cand = (
        bands.groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["a", "b"])
        .count()
        .drop_columns(["count()"])
    )

    # broadcast shingle sets for verification (small side at test scale;
    # at 100 TB this becomes a shuffle join on doc_id — documented)
    import pyarrow.parquet as pq
    import ray

    docs_tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    texts = docs_tbl["text"].to_numpy(zero_copy_only=False)
    ids = docs_tbl["doc_id"].to_numpy(zero_copy_only=False)
    grams = _token_hashes(texts, shingle)
    gram_map = {int(i): g for i, g in zip(ids, grams)}
    gram_ref = ray.put(gram_map)

    class Verify:
        def __init__(self):
            self.grams = ray.get(gram_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            keep = []
            for a, b in zip(df["a"], df["b"]):
                ga, gb = self.grams[int(a)], self.grams[int(b)]
                inter = len(np.intersect1d(ga, gb, assume_unique=True))
                jac = inter / (len(ga) + len(gb) - inter)
                keep.append(jac >= threshold)
            return df[np.array(keep, dtype=bool)] if len(df) else df

    return cand.map_batches(Verify, batch_format="pandas", concurrency=2)


# --------------------------------------------------------------------------
# SimHash + rolling fingerprint (rows-only + unit tests)
# --------------------------------------------------------------------------

def simhash_batch(t: pa.Table) -> pa.Table:
    """64-bit SimHash over word tokens (token FNV codes, +/- votes)."""
    texts = t["text"].to_numpy(zero_copy_only=False)
    out = np.empty(len(texts), dtype=np.uint64)
    bits = np.arange(64, dtype=np.uint64)
    for i, s in enumerate(texts):
        codes = np.array([_poly_hash_str(tok) for tok in s.split(" ")], dtype=np.uint64)
        votes = (((codes[:, None] >> bits[None, :]) & np.uint64(1)) * 2 - 1).sum(axis=0)
        out[i] = np.uint64(0) if len(codes) == 0 else np.sum(
            (votes > 0).astype(np.uint64) << bits
        )
    return pa.table(
        {"doc_id": t["doc_id"], "simhash": pa.array(out.astype(np.int64))}
    )


def simhash_fingerprints(sf_dir: str) -> ray.data.Dataset:
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(simhash_batch, batch_format="pyarrow")


def rolling_fingerprint(sf_dir: str, window: int = 16, keep_mod: int = 8) -> ray.data.Dataset:
    """Winnowing-style document fingerprints: rolling polynomial hash
    over bytes, keep hashes == 0 mod keep_mod (content-defined)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        texts = t["text"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out_id, out_h, out_pos = [], [], []
        B = np.uint64(257)
        with np.errstate(over="ignore"):
            Bw = B ** np.uint64(window - 1)
            for i, s in enumerate(texts):
                b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
                if len(b) < window:
                    continue
                # vectorized rolling hash via cumulative polynomial trick
                n = len(b) - window + 1
                powers = B ** np.arange(window - 1, -1, -1, dtype=np.uint64)
                h = np.convolve(b, powers[::-1], mode="valid") if False else None
                # convolve over uint64 loses mod semantics; do the O(n)
                # sliding update in numpy via cumsum of differences:
                hs = np.empty(n, dtype=np.uint64)
                cur = np.uint64(0)
                for j in range(window):
                    cur = cur * B + b[j]
                hs[0] = cur
                for j in range(1, n):
                    cur = (cur - b[j - 1] * Bw) * B + b[j + window - 1]
                    hs[j] = cur
                sel = (hs % np.uint64(keep_mod)) == 0
                pos = np.nonzero(sel)[0]
                out_id.append(np.full(len(pos), ids[i], dtype=np.int64))
                out_h.append(hs[sel].astype(np.int64))
                out_pos.append(pos.astype(np.int64))
        if not out_id:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "fingerprint": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_id)),
                "fingerprint": pa.array(np.concatenate(out_h)),
                "pos": pa.array(np.concatenate(out_pos)),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")


def langid_scores(sf_dir: str) -> ray.data.Dataset:
    """Heuristic n-gram language ID: score each doc against per-lang
    character-trigram profiles learned from the corpus itself (first
    pass: profile per labeled lang; second: score).  Returns doc_id,
    lang (label), lang_pred, agree flag."""
    import pyarrow.parquet as pq
    import ray

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text", "lang"])
    texts = tbl["text"].to_numpy(zero_copy_only=False)
    langs = tbl["lang"].to_numpy(zero_copy_only=False)
    profiles: dict[str, dict] = {}
    for lang in np.unique(langs):
        sub = texts[langs == lang][:200]
        counts: dict[str, int] = {}
        for s in sub:
            for j in range(len(s) - 2):
                tri = s[j : j + 3]
                counts[tri] = counts.get(tri, 0) + 1
        top = dict(sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:300])
        profiles[str(lang)] = top
    prof_ref = ray.put(profiles)

    class Score:
        def __init__(self):
            self.profiles = ray.get(prof_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            texts = t["text"].to_numpy(zero_copy_only=False)
            preds = []
            for s in texts:
                tris = [s[j : j + 3] for j in range(len(s) - 2)]
                best, best_score = "", -1.0
                for lang, prof in sorted(self.profiles.items()):
                    sc = sum(prof.get(tr, 0) for tr in tris) / max(1, len(tris))
                    if sc > best_score:
                        best, best_score = lang, sc
                preds.append(best)
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "lang": t["lang"],
                    "lang_pred": pa.array(preds),
                    "agree": pa.array(
                        [p == l for p, l in zip(preds, t["lang"].to_pylist())]
                    ),
                }
            )

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    return ds.map_batches(Score, batch_format="pyarrow", concurrency=2)
