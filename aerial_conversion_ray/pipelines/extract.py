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
