"""Webtext extraction operators: HTML -> text and PII redaction.

``html_extract`` is the north-rule invariant made executable: the
pages corpus carries ``html:binary`` alongside ``text:string``
(BASELINE.json ``input_hint``), and the rule demands *byte-identical
extracted text per url* through every stage.  This operator parses
ONLY the html bytes — a general RE2 extractor (title capture, body
capture, script/style drop, tag strip, entity decode), not an inverse
of the synthesizer — and the DuckDB oracle asserts the extraction
equals the source ``text`` column byte-for-byte on every url.
Reference analog: the GDAL/pandas readers at
``aerial_conversion/coco.py:283`` parse an external format into
columns the rest of the pipeline must preserve exactly; here the
external format is HTML (the webtext graft axis).

``pii_redact`` is the curation-pipeline staple (emails / phone
numbers / IPv4 redaction before training).  The synthetic corpus text
is PII-free, so both engine and oracle first append a deterministic
contact block derived from ``doc_id`` (same expression both sides —
presence gated on doc_id residues so counts genuinely vary), then
count and redact with the SAME RE2 patterns (DuckDB's regex engine is
also RE2, so the semantics cannot drift).

Scale notes (100 TB): both are embarrassingly parallel single-pass
``map_batches`` over zero-copy Arrow — no shuffle, no state, no
driver materialization.  Every kernel is a pyarrow.compute RE2 call
over the whole batch; no Python row loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..config import EngineConfig
from ..sources.pages import pages_cte, pages_dataset, read_table

# --- html_extract ----------------------------------------------------------

_TITLE_RE = r"(?s)<title[^>]*>(?P<g>.*?)</title>"
_BODY_RE = r"(?s)<body[^>]*>(?P<g>.*)</body>"
_SCRIPT_RE = r"(?s)<script[^>]*>.*?</script>"
_STYLE_RE = r"(?s)<style[^>]*>.*?</style>"
_TAG_RE = r"(?s)<[^>]*>"

# entity decode order: named/numeric first, &amp; strictly LAST so
# double-escaped input ("&amp;lt;") decodes one level per pass like a
# real parser's single decode
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def _capture(s: pa.ChunkedArray | pa.Array, pattern: str) -> pa.Array:
    """First capture group of ``pattern`` per row ('' when no match)."""
    st = pc.extract_regex(s, pattern)
    if isinstance(st, pa.ChunkedArray):
        st = st.combine_chunks()
    return pc.fill_null(pc.struct_field(st, "g"), "")


def extract_html_batch(t: pa.Table) -> pa.Table:
    """html bytes -> (page_id, url, title, extracted): RE2 kernels
    only, whole-batch vectorized."""
    s = pc.cast(t["html"], pa.string())
    title = _capture(s, _TITLE_RE)
    body = _capture(s, _BODY_RE)
    # documents without an explicit <body> fall back to the whole
    # page minus its <head> block
    no_body = pc.equal(body, "")
    if pc.any(no_body).as_py():
        headless = pc.replace_substring_regex(
            s, r"(?s)<head[^>]*>.*?</head>", "", max_replacements=1
        )
        body = pc.if_else(no_body, headless, body)
    for pat in (_SCRIPT_RE, _STYLE_RE, _TAG_RE):
        body = pc.replace_substring_regex(body, pat, "")
    for ent, ch in _ENTITIES:
        body = pc.replace_substring(body, ent, ch)
        title = pc.replace_substring(title, ent, ch)
    return pa.table(
        {
            "page_id": t["page_id"],
            "url": t["url"],
            "title": title,
            "extracted": body,
        }
    )


def html_extract(sf_dir: str, cfg: EngineConfig | None = None) -> ray.data.Dataset:
    """Parse the html column of every page into (title, extracted
    text).  The oracle pins ``extracted`` to the source ``text``
    column — the north rule's byte-identical-text invariant, gated."""
    cfg = cfg or EngineConfig()
    ds = pages_dataset(
        sf_dir, rep=cfg.pages_rep, with_html=True, columns=["page_id", "url", "html"]
    )
    return ds.map_batches(extract_html_batch, batch_format="pyarrow")


def html_extract_sql(cfg: EngineConfig | None = None) -> str:
    cfg = cfg or EngineConfig()
    return (
        f"with pages as ({pages_cte(cfg.pages_rep)}) "
        "select page_id, url, cast(doc_id as varchar) as title, "
        "text as extracted from pages"
    )


# --- pii_redact ------------------------------------------------------------

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+[0-9]{1,2} [0-9]{3}-[0-9]{3}-[0-9]{4}"
_IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def _aug_batch(t: pa.Table) -> pa.Array:
    """text + deterministic contact block (presence gated on doc_id
    residues).  MUST stay expression-identical to the SQL in
    :func:`pii_redact_sql`."""
    import numpy as np

    did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    s = pa.string()

    def istr(v: np.ndarray) -> pa.Array:
        return pc.cast(pa.array(v), s)

    email = pc.binary_join_element_wise(
        " reach user", istr(did), "@mail", istr(did % 7), ".example", ""
    )
    phone = pc.binary_join_element_wise(
        " call +1 202-555-", pc.utf8_lpad(istr(did % 10000), 4, "0"), ""
    )
    ip = pc.binary_join_element_wise(
        " from 10.", istr(did % 200), ".", istr((did // 7) % 200),
        ".", istr(did % 250), "",
    )
    empty = pa.nulls(t.num_rows, s).fill_null("")
    email = pc.if_else(pa.array(did % 3 != 0), email, empty)
    phone = pc.if_else(pa.array(did % 4 != 0), phone, empty)
    ip = pc.if_else(pa.array(did % 5 != 0), ip, empty)
    return pc.binary_join_element_wise(t["text"], email, phone, ip, "")


def pii_redact_batch(t: pa.Table) -> pa.Table:
    aug = _aug_batch(t)
    out = {"doc_id": t["doc_id"]}
    red = aug
    for name, pat, tok in (
        ("n_email", _EMAIL_RE, "<EMAIL>"),
        ("n_phone", _PHONE_RE, "<PHONE>"),
        ("n_ip", _IP_RE, "<IP>"),
    ):
        out[name] = pc.cast(pc.count_substring_regex(red, pat), pa.int64())
        red = pc.replace_substring_regex(red, pat, tok)
    out["redacted"] = red
    return pa.table(out)


def pii_redact(sf_dir: str) -> ray.data.Dataset:
    """Count + redact emails / phone numbers / IPv4 literals per
    document (redaction applied in a fixed order: email, phone, ip —
    each count taken on the text as the previous pass left it)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(pii_redact_batch, batch_format="pyarrow")


def pii_redact_sql() -> str:
    aug = (
        "text || "
        "case when doc_id % 3 <> 0 then ' reach user' || cast(doc_id as varchar)"
        " || '@mail' || cast(doc_id % 7 as varchar) || '.example' else '' end || "
        "case when doc_id % 4 <> 0 then ' call +1 202-555-'"
        " || lpad(cast(doc_id % 10000 as varchar), 4, '0') else '' end || "
        "case when doc_id % 5 <> 0 then ' from 10.' || cast(doc_id % 200 as varchar)"
        " || '.' || cast((doc_id // 7) % 200 as varchar)"
        " || '.' || cast(doc_id % 250 as varchar) else '' end"
    )
    return f"""
with aug as (select doc_id, {aug} as aug from documents),
e as (select doc_id, aug,
        cast(len(regexp_extract_all(aug, '{_EMAIL_RE}')) as bigint) as n_email,
        regexp_replace(aug, '{_EMAIL_RE}', '<EMAIL>', 'g') as r1 from aug),
p as (select doc_id, n_email,
        cast(len(regexp_extract_all(r1, '{_PHONE_RE}')) as bigint) as n_phone,
        regexp_replace(r1, '{_PHONE_RE}', '<PHONE>', 'g') as r2 from e)
select doc_id, n_email, n_phone,
       cast(len(regexp_extract_all(r2, '{_IP_RE}')) as bigint) as n_ip,
       regexp_replace(r2, '{_IP_RE}', '<IP>', 'g') as redacted
from p
"""


# --- url_canonical / url_dedup ----------------------------------------------
#
# Crawl-dedup staple: canonicalize URLs (lowercase scheme+host, strip
# fragment, strip default port, strip tracking params, strip trailing
# slashes) and collapse pages that differ only in those cosmetics.
# Reference analog: the reference keys tiles/images by normalized file
# stem before joining annotations (aerial_conversion/coco.py:336-352);
# the web-corpus equivalent key is the canonical URL.
#
# The synthetic corpus's urls are already canonical, so both sides
# first derive a deterministic RAW variant per page (same expression
# both sides, gated on page_id % 5 — the pii_redact augmentation
# pattern): host-case noise, utm/ref tracking params, fragments,
# trailing slashes, an explicit :443 default port.  The canonicalizer
# itself is GENERAL (anchored RE2 rewrites, no knowledge of the
# variant shapes); DuckDB's regex engine is also RE2 so the semantics
# cannot drift.
#
# Scale (100 TB): url_canonical is a stateless single-pass
# map_batches (pc.* RE2 kernels, zero-copy Arrow, no shuffle);
# url_dedup adds ONE narrow shuffle over (canon_url) carrying three
# int64/string columns — the corpus text never moves.

_SCHEME_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
_PORT_RE = r"^(https://[^/?#:]+):443"
_TRACK_RE = r"&(utm_[a-z]+|ref)=[^&#]*"


def _raw_url_batch(t: pa.Table) -> pa.Array:
    """Deterministic raw-URL variant per page.  MUST stay
    expression-identical to the SQL in :func:`_raw_url_sql`."""
    import numpy as np

    pid = t["page_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    src = t["source"]
    s = pa.string()

    def istr(v) -> pa.Array:
        return pc.cast(pa.array(v), s)

    base_path = pc.binary_join_element_wise("/doc/", istr(did), "")
    m = pid % 5
    up = pc.utf8_upper(src)
    v0 = pc.binary_join_element_wise("HTTPS://", up, ".EXAMPLE", base_path, "")
    v1 = pc.binary_join_element_wise(
        "https://", src, ".example", base_path, "/p/", istr(pid % 4),
        "?utm_source=feed&utm_medium=rss&ref=", istr(pid % 9), "",
    )
    v2 = pc.binary_join_element_wise(
        "https://", src, ".example", base_path, "/p/", istr(pid % 4),
        "#section-", istr(pid % 7), "",
    )
    v3 = pc.binary_join_element_wise("https://", src, ".example", base_path, "/", "")
    v4 = pc.binary_join_element_wise("https://", src, ".example:443", base_path, "")
    out = v4
    for mv, arr in ((0, v0), (1, v1), (2, v2), (3, v3)):
        out = pc.if_else(pa.array(m == mv), arr, out)
    return out


def _raw_url_sql() -> str:
    base = "'/doc/' || cast(doc_id as varchar)"
    return (
        "case page_id % 5 "
        f"when 0 then 'HTTPS://' || upper(source) || '.EXAMPLE' || {base} "
        f"when 1 then 'https://' || source || '.example' || {base} || '/p/' "
        "|| cast(page_id % 4 as varchar) "
        "|| '?utm_source=feed&utm_medium=rss&ref=' || cast(page_id % 9 as varchar) "
        f"when 2 then 'https://' || source || '.example' || {base} || '/p/' "
        "|| cast(page_id % 4 as varchar) || '#section-' || cast(page_id % 7 as varchar) "
        f"when 3 then 'https://' || source || '.example' || {base} || '/' "
        f"else 'https://' || source || '.example:443' || {base} end"
    )


def canonicalize_urls(u: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """General URL canonicalizer, whole-batch RE2 rewrites:
    1. strip fragment; 2. lowercase scheme+host; 3. strip :443 default
    port; 4. split the QUERY off (tracking params exist only there —
    a literal ``&``/``utm_x=`` in the PATH must survive untouched;
    the round-3-advice-class bug of swapping ``?``/``&`` globally
    corrupted query-less URLs containing ``&``), strip utm_*/ref
    params inside it (mid/leading/only positions), rejoin; 5. strip a
    trailing path slash before the query and trailing slashes."""
    u = pc.replace_substring_regex(u, r"#.*$", "")
    prefix = _capture(u, f"(?P<g>{_SCHEME_HOST_RE})")
    rest = pc.replace_substring_regex(u, _SCHEME_HOST_RE, "", max_replacements=1)
    u = pc.binary_join_element_wise(pc.utf8_lower(prefix), rest, "")
    u = pc.replace_substring_regex(u, _PORT_RE, r"\1", max_replacements=1)
    q = _capture(u, r"(?P<g>\?.*)$")  # '' when no query
    path = pc.replace_substring_regex(u, r"\?.*$", "")
    q = pc.replace_substring_regex(q, _TRACK_RE, "")
    q = pc.replace_substring_regex(
        q, r"^\?(utm_[a-z]+|ref)=[^&#]*&", "?", max_replacements=1
    )
    q = pc.replace_substring_regex(q, r"^\?(utm_[a-z]+|ref)=[^&#]*$", "")
    q = pc.replace_substring_regex(q, r"^\?$", "")
    path = pc.replace_substring_regex(path, r"/+$", "")
    return pc.binary_join_element_wise(path, q, "")


def _canon_sql(u: str) -> str:
    """DuckDB expression mirroring :func:`canonicalize_urls`
    rewrite-for-rewrite (same RE2 patterns, same order; DuckDB's
    ``regexp_replace`` without ``'g'`` = first occurrence only, the
    analog of ``max_replacements=1``)."""
    u = f"regexp_replace({u}, '#.*$', '')"
    u = (
        f"(lower(coalesce(regexp_extract({u}, '{_SCHEME_HOST_RE}'), ''))"
        f" || regexp_replace({u}, '{_SCHEME_HOST_RE}', ''))"
    )
    u = f"regexp_replace({u}, '{_PORT_RE}', '\\1')"
    q = f"coalesce(regexp_extract({u}, '(\\?.*)$'), '')"
    path = f"regexp_replace({u}, '\\?.*$', '')"
    q = f"regexp_replace({q}, '{_TRACK_RE}', '', 'g')"
    q = f"regexp_replace({q}, '^\\?(utm_[a-z]+|ref)=[^&#]*&', '?')"
    q = f"regexp_replace({q}, '^\\?(utm_[a-z]+|ref)=[^&#]*$', '')"
    q = f"regexp_replace({q}, '^\\?$', '')"
    path = f"regexp_replace({path}, '/+$', '')"
    return f"({path} || {q})"


_URL_REP = 5  # one page per variant residue


def url_canonical_batch(t: pa.Table) -> pa.Table:
    raw = _raw_url_batch(t)
    return pa.table(
        {
            "page_id": t["page_id"],
            "raw_url": raw,
            "canon_url": canonicalize_urls(raw),
        }
    )


def url_canonical(sf_dir: str) -> ray.data.Dataset:
    """(page_id, raw_url, canon_url): the canonical-URL mapping for
    every page — stateless map-only pass."""
    ds = pages_dataset(sf_dir, rep=_URL_REP, columns=["page_id", "doc_id", "source"])
    return ds.map_batches(url_canonical_batch, batch_format="pyarrow")


def url_dedup(sf_dir: str) -> ray.data.Dataset:
    """(canon_url, n_pages, rep_page_id): crawl dedup by canonical
    URL — first-wins representative = min page_id.  One narrow
    COARSE-BUCKET shuffle (hash(canon_url) % 64 — the canonical-url
    domain is corpus-sized, so a per-url groupby would be Ray's
    per-group-overhead trap); three small columns move, the page
    payload never."""

    def bucketed(t: pa.Table) -> pa.Table:
        from .text import _hash_arrow_strings

        h = _hash_arrow_strings(t["canon_url"])
        return t.append_column(
            "bucket", pa.array((h % np.uint64(64)).astype(np.int64))
        )

    def fold(df):
        g = df.groupby("canon_url", as_index=False).agg(
            n_pages=("page_id", "size"), rep_page_id=("page_id", "min")
        )
        g["n_pages"] = g["n_pages"].astype("int64")
        return g

    return (
        url_canonical(sf_dir)
        .map_batches(bucketed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
    )


def url_canonical_sql() -> str:
    raw = _raw_url_sql()
    return (
        f"with pages as ({pages_cte(_URL_REP)}), "
        f"r as (select page_id, {raw} as raw_url from pages) "
        f"select page_id, raw_url, {_canon_sql('raw_url')} as canon_url from r"
    )


def url_dedup_sql() -> str:
    return (
        f"with c as ({url_canonical_sql()}) "
        "select canon_url, cast(count(*) as bigint) as n_pages, "
        "min(page_id) as rep_page_id from c group by canon_url order by canon_url"
    )


# --------------------------------------------------------------------------
# JSONL interchange round trip (sources/jsonl.py)
# --------------------------------------------------------------------------

JSONL_SHARDS = 16
_JSONL_COLS = ["doc_id", "lang", "source", "n_chars", "text"]


def jsonl_roundtrip(sf_dir: str) -> ray.data.Dataset:
    """Sharded-JSONL sink + source round trip over the documents
    table: write ``shard=<doc_id % 16>/data.jsonl`` atomically (pandas
    C JSON writer — vectorized escaping), read back with pyarrow's C++
    JSON block parser under a pinned schema, and return the exact
    original columns.  Integer/string-only payload makes the trip
    bit-exact; the oracle is the identity select.  This is the
    training-data interchange format every public corpus ships in —
    the engine's S3/S4-analog for webtext."""
    import tempfile

    from ..sources.jsonl import read_jsonl, write_jsonl

    out_dir = tempfile.mkdtemp(prefix="aerial_jsonl_")
    ds = read_table(sf_dir, "documents", columns=_JSONL_COLS)

    def shard(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy(zero_copy_only=False) % JSONL_SHARDS
        return t.append_column("shard_key", pa.array(k.astype(np.int64)))

    manifest = write_jsonl(
        ds.map_batches(shard, batch_format="pyarrow"),
        out_dir,
        "shard_key",
        _JSONL_COLS,
    )
    manifest.materialize()  # barrier: every shard committed
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
            ("text", pa.string()),
        ]
    )
    return read_jsonl(out_dir, schema)


JSONL_ROUNDTRIP_SQL = """
select doc_id, lang, source, n_chars, text from documents
"""


# --------------------------------------------------------------------------
# WARC (ISO 28500) round trip (sources/warc.py)
# --------------------------------------------------------------------------

WARC_SHARDS = 16


def warc_roundtrip(
    sf_dir: str, cfg: EngineConfig | None = None, compress: bool = False
) -> ray.data.Dataset:
    """Sharded-WARC sink + source round trip over the pages corpus
    (page_id, url, warc_ts, html): the crawl-archive format web-scale
    corpora actually arrive in.  Records are built with vectorized
    header concatenation and parsed back by Content-Length (one pass
    per shard file); bytes, URL, record id and the microsecond
    WARC-Date all round-trip exactly, so the oracle is the pages CTE
    with the html synthesis expression inlined."""
    import tempfile

    from ..sources.warc import read_warc, write_warc

    cfg = cfg or EngineConfig()
    out_dir = tempfile.mkdtemp(prefix="aerial_warc_")
    ds = pages_dataset(
        sf_dir,
        rep=cfg.pages_rep,
        with_html=True,
        columns=["page_id", "url", "warc_ts", "html"],
    )

    def shard(t: pa.Table) -> pa.Table:
        k = t["page_id"].to_numpy(zero_copy_only=False) % WARC_SHARDS
        return t.append_column("shard_key", pa.array(k.astype(np.int64)))

    manifest = write_warc(
        ds.map_batches(shard, batch_format="pyarrow"),
        out_dir,
        "shard_key",
        compress=compress,
    )
    manifest.materialize()  # barrier: every shard committed

    def as_text(t: pa.Table) -> pa.Table:
        # compare payload bytes as UTF-8 text (injective, so equality
        # of the decoded column proves byte fidelity; DuckDB's blob ->
        # pandas bytearray would defeat the driver's value hash)
        return t.set_column(
            t.schema.get_field_index("html"),
            "html",
            pc.cast(t["html"], pa.string()),
        )

    return read_warc(out_dir).map_batches(as_text, batch_format="pyarrow")


def warc_roundtrip_sql(cfg: EngineConfig | None = None) -> str:
    cfg = cfg or EngineConfig()
    return (
        f"with pages as ({pages_cte(cfg.pages_rep)}) "
        "select page_id, url, warc_ts, "
        "('<html><head><title>' || cast(doc_id as varchar) || "
        "'</title></head><body>' || text || '</body></html>') as html "
        "from pages"
    )


# --------------------------------------------------------------------------
# CSV round trip (sources/csv.py)
# --------------------------------------------------------------------------


def csv_roundtrip(sf_dir: str) -> ray.data.Dataset:
    """Sharded-CSV sink + source round trip over the documents table
    (RFC 4180 quoting out, pyarrow C++ parse back under a pinned
    schema).  Integer/string payload -> bit-exact; identity oracle."""
    import tempfile

    from ..sources.csv import read_csv, write_csv

    out_dir = tempfile.mkdtemp(prefix="aerial_csv_")
    ds = read_table(sf_dir, "documents", columns=_JSONL_COLS)

    def shard(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy(zero_copy_only=False) % JSONL_SHARDS
        return t.append_column("shard_key", pa.array(k.astype(np.int64)))

    manifest = write_csv(
        ds.map_batches(shard, batch_format="pyarrow"),
        out_dir,
        "shard_key",
        _JSONL_COLS,
    )
    manifest.materialize()  # barrier: every shard committed
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
            ("text", pa.string()),
        ]
    )
    return read_csv(out_dir, schema)


CSV_ROUNDTRIP_SQL = JSONL_ROUNDTRIP_SQL


def warc_gz_roundtrip(sf_dir: str, cfg: EngineConfig | None = None) -> ray.data.Dataset:
    """The compressed variant of :func:`warc_roundtrip` — one gzip
    member per record (Common Crawl's wire layout), member-wise
    inflate on read.  Same identity oracle."""
    return warc_roundtrip(sf_dir, cfg, compress=True)


def ipc_roundtrip(sf_dir: str) -> ray.data.Dataset:
    """Sharded Arrow-IPC (Feather v2) sink + source round trip over
    the documents table — the zero-parse columnar interchange member
    next to jsonl/warc/csv.  Write ``shard=<doc_id % 16>/data.arrow``
    atomically, read back via ``read_binary_files`` + the in-band
    schema (asserted against the pinned one), return the original
    columns bit-exactly; oracle is the identity select."""
    import tempfile

    from ..sources.ipc import read_ipc, write_ipc

    out_dir = tempfile.mkdtemp(prefix="aerial_ipc_")
    ds = read_table(sf_dir, "documents", columns=_JSONL_COLS)

    def shard(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy(zero_copy_only=False) % JSONL_SHARDS
        return t.append_column("shard_key", pa.array(k.astype(np.int64)))

    manifest = write_ipc(
        ds.map_batches(shard, batch_format="pyarrow"),
        out_dir,
        "shard_key",
        _JSONL_COLS,
    )
    manifest.materialize()  # barrier: every shard committed
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
            ("text", pa.string()),
        ]
    )
    return read_ipc(out_dir, schema)


def orc_roundtrip(sf_dir: str) -> ray.data.Dataset:
    """Sharded Apache-ORC sink + source round trip over the documents
    table — the warehouse-native columnar interchange member next to
    jsonl/warc/csv/ipc (Hive/Trino mount the shards directly).  Write
    ``shard=<doc_id % 16>/data.orc`` atomically, read back via
    ``read_binary_files`` + the in-band schema (asserted against the
    pinned one), return the original columns bit-exactly; oracle is
    the identity select."""
    import tempfile

    from ..sources.orc import read_orc, write_orc

    out_dir = tempfile.mkdtemp(prefix="aerial_orc_")
    ds = read_table(sf_dir, "documents", columns=_JSONL_COLS)

    def shard(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy(zero_copy_only=False) % JSONL_SHARDS
        return t.append_column("shard_key", pa.array(k.astype(np.int64)))

    manifest = write_orc(
        ds.map_batches(shard, batch_format="pyarrow"),
        out_dir,
        "shard_key",
        _JSONL_COLS,
    )
    manifest.materialize()  # barrier: every shard committed
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
            ("text", pa.string()),
        ]
    )
    return read_orc(out_dir, schema)


ORC_ROUNDTRIP_SQL = JSONL_ROUNDTRIP_SQL


# --------------------------------------------------------------------------
# TFRecord round trip (sources/tfrecord.py)
# --------------------------------------------------------------------------


def tfrecord_roundtrip(sf_dir: str) -> ray.data.Dataset:
    """Sharded-TFRecord sink + source round trip over the documents
    table — the training-export leg: engine columns out to the record
    format a TF/torch data loader mounts, parsed back by the
    first-party framing walker with BOTH masked CRC32Cs verified per
    record.  Identity oracle (same as the JSONL/CSV round trips); the
    codec itself is pinned by public test vectors in
    ``tests/test_round4f_ops.py``."""
    import tempfile

    from ..sources.tfrecord import read_tfrecord, write_tfrecord

    out_dir = tempfile.mkdtemp(prefix="aerial_tfrecord_")
    ds = read_table(sf_dir, "documents", columns=_JSONL_COLS)

    def shard(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy(zero_copy_only=False) % JSONL_SHARDS
        return t.append_column("shard_key", pa.array(k.astype(np.int64)))

    int_cols = ["doc_id", "n_chars"]
    str_cols = ["lang", "source", "text"]
    manifest = write_tfrecord(
        ds.map_batches(shard, batch_format="pyarrow"),
        out_dir,
        "shard_key",
        int_cols,
        str_cols,
    )
    manifest.materialize()  # barrier: every shard committed
    out = read_tfrecord(out_dir, int_cols, str_cols)
    return out.select_columns(_JSONL_COLS)


TFRECORD_ROUNDTRIP_SQL = JSONL_ROUNDTRIP_SQL


# --------------------------------------------------------------------------
# Avro Object Container File round trip (sources/avro.py)
# --------------------------------------------------------------------------


def avro_roundtrip(sf_dir: str) -> ray.data.Dataset:
    """Sharded Apache-Avro OCF sink + source round trip over the
    documents table — the row-wise schema-carrying interchange member
    next to jsonl/csv/warc/orc/ipc/tfrecord (the format Kafka /
    warehouse ingestion emits).  First-party codec (``sources/avro.py``,
    no avro lib in this container): deflate-compressed blocks,
    vectorized zigzag-varint planes on the write side, sequential
    spec walker with sync-marker verification on the read side.
    Write ``shard=<doc_id % 16>/data.avro`` atomically, read back,
    return the original columns bit-exactly; oracle is the identity
    select.  Codec pinned by the Avro spec's public zigzag test
    vectors in ``tests/test_round4h_ops.py``."""
    import tempfile

    from ..sources.avro import read_avro, write_avro

    out_dir = tempfile.mkdtemp(prefix="aerial_avro_")
    ds = read_table(sf_dir, "documents", columns=_JSONL_COLS)

    def shard(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy(zero_copy_only=False) % JSONL_SHARDS
        return t.append_column("shard_key", pa.array(k.astype(np.int64)))

    int_cols = ["doc_id", "n_chars"]
    str_cols = ["lang", "source", "text"]
    manifest = write_avro(
        ds.map_batches(shard, batch_format="pyarrow"),
        out_dir,
        "shard_key",
        int_cols,
        str_cols,
        _JSONL_COLS,
    )
    manifest.materialize()  # barrier: every shard committed
    return read_avro(out_dir, int_cols, str_cols, _JSONL_COLS)


AVRO_ROUNDTRIP_SQL = JSONL_ROUNDTRIP_SQL
