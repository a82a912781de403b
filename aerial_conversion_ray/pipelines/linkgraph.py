"""Web link graph: anchor extraction -> host graph -> PageRank.

The crawl-pipeline staple the reference's join machinery analogizes
to: the reference joins annotations to tiles by parsed grid keys
(aerial_conversion/tiles.py:180-256); the web-corpus equivalent joins
pages to hosts by parsed anchor targets.

The synthetic pages' html wrapper carries no anchors, so both sides
first derive a deterministic ANCHOR-BEARING html variant per page
(same expression both sides — the pii_redact / url_canonical
augmentation pattern): 1-3 ``<a href>`` links whose targets are a
pure integer function of page_id, with a built-in hot host (40% of
links point at host 0) so the skew path is exercised by
construction.  The extractor itself is GENERAL: it finds every
``href="..."`` occurrence in document order, however many there are
(split-scan on the engine side, ``regexp_extract_all`` in the DuckDB
oracle — same semantics on well-formed attributes).

Scale (100 TB):
- ``link_extract`` is a stateless single-pass ``map_batches`` explode
  (1->N rows); no shuffle, the page text never moves past the parse.
- ``host_degree`` pre-aggregates (src,dst) edge weights per batch
  before ONE narrow groupby over the host-pair key; the final
  per-host fold runs over the weighted edge table (|hosts|^2 upper
  bound, orders of magnitude below the page count).
- ``pagerank_hosts`` keeps the edge table distributed and folds each
  power iteration as kmeans-style per-batch partial vectors
  (``np.add.at`` into a |hosts|-length int64 vector, one row per
  batch) summed by a tiny groupby — no per-key shuffle, so the hot
  host costs nothing extra.  Assumption (documented, same as kmeans
  centroids): the HOST rank vector fits in the object store
  (|hosts| ~ 1e8 at web scale -> ~1 GB); past that, each iteration
  becomes a groupby(dst) shuffle over the weighted edges instead.

All PageRank arithmetic is fixed-point int64 (scale 1e12) so the
engine and the oracle agree bit-for-bit: contributions use integer
floor division ``r//outdeg``, damping is ``(85*x)//100``, and the
DuckDB mirror uses the same ``//`` integer division.  Max magnitude
85 * total_mass ~ 8.5e13 << 2^63.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..sources.pages import pages_cte, pages_dataset

# Synthetic host count.  Env-overridable AT IMPORT so a fresh Ray
# session (driver + workers import consistently) can exercise the
# distributed branches at NH >> 64 — tests/test_nh_scale.py runs the
# iterative battery at NH=10^4 in a subprocess this way.  Do NOT
# monkeypatch at runtime: module-level helpers serialize by reference
# and workers would re-import the default.
NH = int(os.environ.get("AERIAL_LG_NH", "64"))
LG_REP = 5              # pages per document for link-graph entries
PR_SCALE = 10**12       # fixed-point PageRank scale
PR_ITERS = 4
_HOT_DST = 0            # 40% of links target this host (skew by design)


# --- sparse partial-vector wire format for iterative host rounds ---------


def _vec_partial(acc: np.ndarray, skip: int | None = 0) -> pa.Table:
    """A |hosts|-length int64 partial vector as sparse (i, val) rows —
    the per-block wire format for every iterative host-graph fold.
    ``skip`` drops entries equal to it (0 for additive folds, the
    INF/BIG sentinel for min-folds, -1 for max-folds); None keeps
    every entry.  Sparse rows keep the partial O(touched hosts), so
    the same rounds run unchanged at NH=64 and NH=10^4+."""
    if skip is None:
        nz = np.arange(len(acc), dtype=np.int64)
    else:
        nz = np.flatnonzero(acc != skip).astype(np.int64)
    return pa.table(
        {"i": pa.array(nz), "val": pa.array(acc[nz].astype(np.int64))}
    )


def _vec_fold(parts, n: int, op: str = "add", init: int = 0) -> np.ndarray:
    """Fold sparse (i, val) partial rows into ONE |hosts| vector on
    the driver (the pagerank_hosts law: #blocks small partials, the
    corpus never folds here)."""
    ufunc = {
        "add": np.add,
        "min": np.minimum,
        "max": np.maximum,
        "or": np.bitwise_or,
    }[op]
    out = np.full(n, init, dtype=np.int64)
    for bt in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        if bt.num_rows and "i" in bt.schema.names:
            ufunc.at(
                out,
                bt["i"].to_numpy(zero_copy_only=False).astype(np.int64),
                bt["val"].to_numpy(zero_copy_only=False).astype(np.int64),
            )
    return out


# --- deterministic anchor-bearing html variant ---------------------------


def _dst_ids(page_id: np.ndarray, j: int) -> np.ndarray:
    """Link j's target host id: hot host for 40% of (page, j) pairs,
    else spread over the host space.  Pure int64 function; MUST stay
    expression-identical to :func:`_dst_sql`."""
    hot = (page_id + j) % 5 < 2
    return np.where(hot, _HOT_DST, ((page_id + 1) * (j + 3)) % NH)


def _dst_sql(j: int) -> str:
    return (
        f"(case when (page_id + {j}) % 5 < 2 then {_HOT_DST} "
        f"else ((page_id + 1) * ({j} + 3)) % {NH} end)"
    )


def _anchor_arrays(t: pa.Table) -> list[pa.Array]:
    pid = t["page_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    out = []
    for j in range(3):
        dst = _dst_ids(pid, j)
        a = pc.binary_join_element_wise(
            '<a href="https://h',
            pc.cast(pa.array(dst), pa.string()),
            ".example/doc/",
            pc.cast(pa.array(pid * 31 + j), pa.string()),
            f'">link {j}</a>',
            "",
        )
        if j > 0:
            # links beyond the first exist only when page_id % 3 >= j
            a = pc.if_else(pa.array(pid % 3 >= j), a, "")
        out.append(a)
    return out


def linked_html_batch(t: pa.Table) -> pa.Table:
    """(page_id, text) -> + html: the anchor-bearing page variant."""
    a0, a1, a2 = _anchor_arrays(t)
    html = pc.binary_join_element_wise(
        "<html><head><title>",
        pc.cast(t["page_id"], pa.string()),
        "</title></head><body><p>",
        t["text"],
        "</p>",
        a0,
        a1,
        a2,
        "</body></html>",
        "",
    )
    return pa.table({"page_id": t["page_id"], "html": html})


def _anchor_sql(j: int) -> str:
    a = (
        "('<a href=\"https://h' || cast("
        + _dst_sql(j)
        + " as varchar) || '.example/doc/' || cast(page_id * 31 + "
        + str(j)
        + ' as varchar) || \'">link '
        + str(j)
        + "</a>')"
    )
    if j > 0:
        a = f"(case when page_id % 3 >= {j} then {a} else '' end)"
    return a


def _html_sql() -> str:
    return (
        "('<html><head><title>' || cast(page_id as varchar) || "
        "'</title></head><body><p>' || text || '</p>' || "
        f"{_anchor_sql(0)} || {_anchor_sql(1)} || {_anchor_sql(2)} || "
        "'</body></html>')"
    )


# --- link extraction (general split-scan) --------------------------------

_HOST_OF_URL_RE = r"^[a-z]+://(?P<g>[^/]*)"


def extract_links_batch(t: pa.Table) -> pa.Table:
    """html -> one row per ``href="..."`` occurrence, in document
    order: (page_id, link_pos, href, src_host, dst_host).

    General whole-batch scan: split each page on ``href="`` (every
    piece after the first starts with an attribute value), cut each
    piece at its closing quote.  No per-row Python loop."""
    html = t["html"]
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    parts = pc.split_pattern(html, 'href="')
    lengths = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(parts)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
    starts = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=starts[1:])
    pos = np.arange(len(parent), dtype=np.int64) - starts[parent]
    keep = pos > 0  # piece 0 precedes the first href
    kept = flat.filter(pa.array(keep))
    href = pc.list_element(pc.split_pattern(kept, '"', max_splits=1), 0)
    page_id = t["page_id"].take(pa.array(parent[keep]))
    pid = (
        page_id.combine_chunks() if isinstance(page_id, pa.ChunkedArray) else page_id
    ).to_numpy(zero_copy_only=False)
    from .extract import _capture

    dst_host = _capture(href, _HOST_OF_URL_RE)
    src_host = pc.binary_join_element_wise(
        "h", pc.cast(pa.array(pid % NH), pa.string()), ".example", ""
    )
    return pa.table(
        {
            "page_id": page_id,
            "link_pos": pa.array(pos[keep] - 1),
            "href": href,
            "src_host": src_host,
            "dst_host": dst_host,
        }
    )


def link_extract(sf_dir: str, rep: int = LG_REP) -> ray.data.Dataset:
    """(page_id, link_pos, href, src_host, dst_host): every anchor of
    every page — map-only explode, no shuffle."""
    ds = pages_dataset(sf_dir, rep=rep, columns=["page_id", "text"])
    return ds.map_batches(linked_html_batch, batch_format="pyarrow").map_batches(
        extract_links_batch, batch_format="pyarrow"
    )


def link_extract_sql(rep: int = LG_REP) -> str:
    return f"""
with pages as ({pages_cte(rep)}),
hh as (select page_id, {_html_sql()} as html from pages),
hl as (select page_id, regexp_extract_all(html, 'href="([^"]*)"', 1) as hs
       from hh),
lx as (select page_id, unnest(hs) as href,
              unnest(range(len(hs))) as link_pos
       from hl)
select page_id, cast(link_pos as bigint) as link_pos, href,
       ('h' || cast(page_id % {NH} as varchar) || '.example') as src_host,
       regexp_extract(href, '^[a-z]+://([^/]*)', 1) as dst_host
from lx
"""


# --- weighted host edges --------------------------------------------------


def _edge_partial(t: pa.Table) -> pa.Table:
    """Per-batch (src_id, dst_id) -> cnt pre-aggregation (combiner
    before the narrow host-pair groupby)."""
    from .extract import _capture

    src = _capture(t["src_host"], r"^h(?P<g>\d+)\.")
    dst = _capture(t["dst_host"], r"^h(?P<g>\d+)\.")
    s = pc.cast(src, pa.int64()).to_numpy(zero_copy_only=False)
    d = pc.cast(dst, pa.int64()).to_numpy(zero_copy_only=False)
    key = s * NH + d
    u, cnt = np.unique(key, return_counts=True)
    return pa.table(
        {
            "src_id": pa.array(u // NH),
            "dst_id": pa.array(u % NH),
            "cnt": pa.array(cnt.astype(np.int64)),
        }
    )


def host_edges(sf_dir: str, rep: int = LG_REP) -> ray.data.Dataset:
    """Weighted host-level edge table (src_id, dst_id, cnt): batch
    combiner then ONE coarse-bucket fold over the |hosts|^2-bounded
    pair key — the only shuffle in the suite, three int64 columns.
    (Bucketed, not a per-pair groupby: Ray's aggregate pays per-GROUP
    Python overhead, so the NH^2 key space folds inside 32 buckets
    with one vectorized pandas groupby each.)"""

    def fold(df):
        return df.groupby(["src_id", "dst_id"], as_index=False)["cnt"].sum()

    edges = link_extract(sf_dir, rep).map_batches(
        _edge_partial, batch_format="pyarrow"
    )

    def bucketed(t: pa.Table) -> pa.Table:
        key = t["src_id"].to_numpy(zero_copy_only=False) * NH + t[
            "dst_id"
        ].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array(key % 32))

    return (
        edges.map_batches(bucketed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
    )


_EDGES_SQL_BODY = (
    "select page_id % {nh} as src_id, "
    "cast(regexp_extract(dst_host, '^h(\\d+)\\.', 1) as bigint) as dst_id, "
    "count(*) as cnt from ({links}) group by 1, 2"
)


def _edges_sql(rep: int) -> str:
    return _EDGES_SQL_BODY.format(nh=NH, links=link_extract_sql(rep))


# --- host degrees ---------------------------------------------------------


def host_degree(sf_dir: str, rep: int = LG_REP) -> "ray.data.Dataset":
    """Per host: out_links / in_links (link multiplicity) and
    out_hosts / in_hosts (distinct neighbours).  Folds the SMALL
    weighted edge table (post-shuffle) — the page-scale data was
    already reduced by :func:`host_edges`."""

    def fold(t: pa.Table) -> pa.Table:
        s = t["src_id"].to_numpy(zero_copy_only=False)
        d = t["dst_id"].to_numpy(zero_copy_only=False)
        c = t["cnt"].to_numpy(zero_copy_only=False)
        hosts = np.unique(np.concatenate([s, d]))
        idx = {int(h): i for i, h in enumerate(hosts)}
        n = len(hosts)
        out_links = np.zeros(n, dtype=np.int64)
        in_links = np.zeros(n, dtype=np.int64)
        out_hosts = np.zeros(n, dtype=np.int64)
        in_hosts = np.zeros(n, dtype=np.int64)
        si = np.fromiter((idx[int(x)] for x in s), dtype=np.int64, count=len(s))
        di = np.fromiter((idx[int(x)] for x in d), dtype=np.int64, count=len(d))
        np.add.at(out_links, si, c)
        np.add.at(in_links, di, c)
        np.add.at(out_hosts, si, 1)
        np.add.at(in_hosts, di, 1)
        host = pc.binary_join_element_wise(
            "h", pc.cast(pa.array(hosts), pa.string()), ".example", ""
        )
        return pa.table(
            {
                "host": host,
                "out_links": pa.array(out_links),
                "out_hosts": pa.array(out_hosts),
                "in_links": pa.array(in_links),
                "in_hosts": pa.array(in_hosts),
            }
        )

    # the weighted edge table is <= |hosts|^2 rows: one fold task
    return (
        host_edges(sf_dir, rep)
        .repartition(1)
        .map_batches(fold, batch_format="pyarrow", batch_size=None)
        .sort("host")
    )


def host_degree_sql(rep: int = LG_REP) -> str:
    return f"""
with e as ({_edges_sql(rep)}),
o as (select src_id as hid, sum(cnt) as out_links, count(*) as out_hosts
      from e group by 1),
i as (select dst_id as hid, sum(cnt) as in_links, count(*) as in_hosts
      from e group by 1)
select ('h' || cast(coalesce(o.hid, i.hid) as varchar) || '.example') as host,
       cast(coalesce(o.out_links, 0) as bigint) as out_links,
       cast(coalesce(o.out_hosts, 0) as bigint) as out_hosts,
       cast(coalesce(i.in_links, 0) as bigint) as in_links,
       cast(coalesce(i.in_hosts, 0) as bigint) as in_hosts
from o full outer join i on o.hid = i.hid
order by host
"""


# --- PageRank (fixed-point int64, kmeans-style broadcast folds) ----------


def pagerank_hosts(
    sf_dir: str, rep: int = LG_REP, iters: int = PR_ITERS
) -> "pa.Table":
    """Damped PageRank over the host graph, ``iters`` power
    iterations, all arithmetic int64 fixed-point (scale 1e12) so the
    result is bit-identical to the SQL oracle.

    The weighted edge Dataset stays distributed; each iteration is a
    single pass of per-batch partial contribution vectors (one
    |hosts|-length int64 row per batch) summed on the driver — the
    rank vector is broadcast, never shuffled, so the built-in hot
    host (40% in-degree) costs nothing.  Dangling hosts leak mass
    (simplified PR) identically on both sides."""
    import ray

    edges = host_edges(sf_dir, rep).materialize()
    small = edges.to_pandas()  # |hosts|^2-bounded; hosts universe + outdeg
    hosts = np.unique(np.concatenate([small["src_id"].values, small["dst_id"].values]))
    n = len(hosts)
    outdeg = np.zeros(n, dtype=np.int64)
    si = np.searchsorted(hosts, small["src_id"].values)
    np.add.at(outdeg, si, small["cnt"].values)
    base = (15 * PR_SCALE) // (100 * n)
    r = np.full(n, PR_SCALE // n, dtype=np.int64)

    hosts_ref = ray.put(hosts)
    outdeg_ref = ray.put(outdeg)

    def contrib(t: pa.Table, r_ref) -> pa.Table:
        hs = ray.get(hosts_ref)
        od = ray.get(outdeg_ref)
        rv = ray.get(r_ref)
        s = np.searchsorted(hs, t["src_id"].to_numpy(zero_copy_only=False))
        d = np.searchsorted(hs, t["dst_id"].to_numpy(zero_copy_only=False))
        c = t["cnt"].to_numpy(zero_copy_only=False)
        per_edge = (rv[s] // od[s]) * c
        acc = np.zeros(len(hs), dtype=np.int64)
        np.add.at(acc, d, per_edge)
        return _vec_partial(acc)

    for _ in range(iters):
        r_ref = ray.put(r)
        parts = edges.map_batches(
            lambda t, rr=r_ref: contrib(t, rr), batch_format="pyarrow"
        )
        # one partial VECTOR row per edge block; summing the few rows
        # on the driver is one dataset pass instead of an Aggregate op
        # per iteration.  Bound: #blocks x |hosts| ints — fine while
        # the rank vector broadcasts at all; past that (|hosts| >~1e7)
        # the iteration becomes a bucketed fold of the partials.
        cvec = _vec_fold(parts, n)
        r = base + (85 * cvec) // 100

    host = pc.binary_join_element_wise(
        "h", pc.cast(pa.array(hosts), pa.string()), ".example", ""
    )
    return pa.table(
        {
            "host": host,
            "pr_num": pa.array(r),
            "pr": pa.array(r / float(PR_SCALE)),
        }
    )


def pagerank_hosts_sql(rep: int = LG_REP, iters: int = PR_ITERS) -> str:
    """K-iteration fixed-point PageRank unrolled as chained CTEs;
    DuckDB ``//`` = integer floor division = numpy ``//`` on the
    non-negative fixed-point values."""
    ctes = [
        f"e as ({_edges_sql(rep)})",
        "hosts as (select distinct hid from "
        "(select src_id as hid from e union select dst_id from e))",
        "outd as (select src_id, sum(cnt) as od from e group by 1)",
        "nh as (select count(*) as n from hosts)",
        f"r0 as (select hid, {PR_SCALE} // (select n from nh) as r from hosts)",
    ]
    for k in range(iters):
        ctes.append(
            f"r{k + 1} as (select h.hid, "
            f"(15 * {PR_SCALE}) // (100 * (select n from nh)) "
            f"+ (85 * coalesce(s.c, 0)) // 100 as r "
            "from hosts h left join ("
            f"select e.dst_id as hid, sum(e.cnt * (r{k}.r // o.od)) as c "
            f"from e join r{k} on e.src_id = r{k}.hid "
            "join outd o on o.src_id = e.src_id group by 1) s using (hid))"
        )
    return (
        "with " + ",\n".join(ctes) + "\n"
        f"select ('h' || cast(hid as varchar) || '.example') as host, "
        f"cast(r as bigint) as pr_num, "
        f"cast(r as bigint) / {float(PR_SCALE)!r} as pr from r{iters} order by host"
    )


# --- co-citation (bibliographic coupling) --------------------------------


def host_cocitation(sf_dir: str, rep: int = LG_REP) -> ray.data.Dataset:
    """Bibliographic coupling over the host graph: for every pair of
    source hosts that link to at least one COMMON destination, the
    number of shared destinations and the min-product link weight —
    the similarity signal link-spam and mirror detection key on
    (co-citation is PageRank's pairwise sibling).

    Scale shape: runs on the WEIGHTED edge table (|hosts|^2-bounded,
    already reduced from the page corpus), grouped per DESTINATION —
    a destination's in-neighbor list is hosts-bounded, so the
    per-group pair explosion is |in-neighbors|^2 with a documented
    skew note: the constructed hot destination (40% of links) yields
    the densest pair block, folded vectorized inside ONE bucket task.
    Pair counts then fold by the (a, b) key inside 32 coarse buckets.
    """

    edges = host_edges(sf_dir, rep)

    def pairs_per_dst(df):
        import pandas as pd

        out_a, out_b, out_w = [], [], []
        for _, g in df.groupby("dst_id", sort=False):
            s = g.sort_values("src_id")
            src = s["src_id"].to_numpy()
            cnt = s["cnt"].to_numpy()
            n = len(src)
            if n < 2:
                continue
            iu, ju = np.triu_indices(n, k=1)
            out_a.append(src[iu])
            out_b.append(src[ju])
            out_w.append(np.minimum(cnt[iu], cnt[ju]))
        if not out_a:
            return pd.DataFrame(
                {"a_id": pd.Series(dtype="int64"), "b_id": pd.Series(dtype="int64"),
                 "n_shared": pd.Series(dtype="int64"), "w_min": pd.Series(dtype="int64")}
            )
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        w = np.concatenate(out_w)
        return pd.DataFrame(
            {"a_id": a, "b_id": b, "n_shared": np.ones(len(a), np.int64), "w_min": w}
        )

    def tag_dst(t: pa.Table) -> pa.Table:
        d = t["dst_id"].to_numpy(zero_copy_only=False)
        return t.append_column("dbucket", pa.array(d % np.int64(32)))

    def fold(df):
        return df.groupby(["a_id", "b_id"], as_index=False)[["n_shared", "w_min"]].sum()

    def tag_pair(t: pa.Table) -> pa.Table:
        a = t["a_id"].to_numpy(zero_copy_only=False)
        b = t["b_id"].to_numpy(zero_copy_only=False)
        return t.append_column("pbucket", pa.array((a * NH + b) % np.int64(32)))

    return (
        edges.map_batches(tag_dst, batch_format="pyarrow")
        .groupby("dbucket")
        .map_groups(pairs_per_dst, batch_format="pandas")
        .map_batches(tag_pair, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(fold, batch_format="pandas")
    )


def host_cocitation_sql(rep: int = LG_REP) -> str:
    return f"""
with e as ({_edges_sql(rep)})
select a.src_id as a_id, b.src_id as b_id,
       cast(count(*) as bigint) as n_shared,
       cast(sum(least(a.cnt, b.cnt)) as bigint) as w_min
from e a join e b on a.dst_id = b.dst_id and a.src_id < b.src_id
group by a.src_id, b.src_id
"""


# --- robots.txt-style prefix filtering ------------------------------------

# Deterministic per-host disallow rules (module constant = the tiny
# parsed-robots table; at real scale: parse the fetched robots.txt
# corpus once, ``ray.put`` the compiled rule table).  TRUE string
# prefixes — '/doc/2' blocks doc 2, 20-29, 200-299 ... — so the match
# must be a real starts_with, not key arithmetic.
ROBOTS_RULES: tuple = tuple(
    f"https://src{k}.example/doc/{d}"
    for k in range(20)
    for d in ([(k * 7 + 1) % 10] + ([(k + 3) % 10] if k % 6 == 0 else []))
    if k % 3 == 0
)


def robots_filter(sf_dir: str) -> ray.data.Dataset:
    """Filter the page corpus by robots.txt-style path-prefix
    disallow rules — the crawl-compliance gate every web pipeline
    runs before processing (reference analog: the extension/path
    filters of scripts/batch_geojson2coco.py:85).

    Scale shape: the rule table is broadcast (tiny by nature — one
    row per host x rule); each batch runs |rules| vectorized
    ``starts_with`` kernels and keeps the rows no rule matches.  A
    pure streaming filter: no shuffle, the text never moves, output
    goes straight to the sink.  With millions of hosts the per-batch
    loop becomes a per-host grouped probe (sort rules, binary-search
    the url's host slice) — same broadcast shape."""
    ds = pages_dataset(sf_dir, rep=1, columns=["page_id", "url"])

    def keep(t: pa.Table) -> pa.Table:
        url = t["url"]
        bad = np.zeros(len(t), dtype=bool)
        for pre in ROBOTS_RULES:
            bad |= pc.starts_with(url, pre).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(~bad))

    return ds.map_batches(keep, batch_format="pyarrow")


def robots_filter_sql() -> str:
    vals = ", ".join(f"({p!r})" for p in ROBOTS_RULES)
    return f"""
with p as ({pages_cte(rep=1)}),
r(pre) as (values {vals})
select p.page_id, p.url
from p
where not exists (select 1 from r where starts_with(p.url, r.pre))
"""


# --- reciprocity (mutual-link structure) ----------------------------------


def host_reciprocity(sf_dir: str, rep: int = LG_REP) -> ray.data.Dataset:
    """Per-host link reciprocity: of each host's distinct out-
    neighbours (self-loops excluded), how many link BACK — the
    mutual-citation structure metric next to degree/PageRank/
    co-citation.  Output (host_id, n_out, n_reciprocal).

    Scale shape: rides the weighted edge table (already a bounded
    host-pair aggregate, never the page stream); one fold keyed by
    the UNORDERED pair bucket co-locates both directions of every
    pair, decides mutuality vectorized, and emits per-host partials;
    a final host fold sums them.  All shuffles carry int64 triples."""
    edges = host_edges(sf_dir, rep)

    def tag(t: pa.Table) -> pa.Table:
        s = t["src_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        return pa.table(
            {
                "src": pa.array(s),
                "dst": pa.array(d),
                "bucket": pa.array(((lo * NH + hi) % 64).astype(np.int64)),
            }
        )

    def mutual(df: pd.DataFrame) -> pd.DataFrame:
        # edge table is already distinct per (src, dst); mutuality =
        # the reversed pair exists in the same bucket by construction
        key = df["src"].to_numpy(np.int64) * NH + df["dst"].to_numpy(np.int64)
        rkey = df["dst"].to_numpy(np.int64) * NH + df["src"].to_numpy(np.int64)
        ks = np.sort(key)
        pos = np.searchsorted(ks, rkey)
        pos_c = np.minimum(pos, len(ks) - 1)
        rec = (ks[pos_c] == rkey).astype(np.int64)
        out = pd.DataFrame(
            {"host_id": df["src"].to_numpy(np.int64), "n_out": 1, "n_rec": rec}
        )
        g = out.groupby("host_id", as_index=False)[["n_out", "n_rec"]].sum()
        return g.astype(np.int64)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("host_id", as_index=False)[["n_out", "n_rec"]].sum()
        return g.astype(np.int64)

    return (
        edges.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(mutual, batch_format="pandas")
        .groupby("host_id")
        .map_groups(final, batch_format="pandas")
    )


def host_reciprocity_sql(rep: int = LG_REP) -> str:
    return (
        "with edges as (" + _edges_sql(rep) + ")"
        + """
, ed as (select src_id, dst_id from edges where src_id <> dst_id)
select e.src_id as host_id,
       cast(count(*) as bigint) as n_out,
       cast(sum(case when r.src_id is null then 0 else 1 end) as bigint)
           as n_rec
from ed e left join ed r
  on r.src_id = e.dst_id and r.dst_id = e.src_id
group by e.src_id
"""
    )


# --- BFS hop distances from a seed host ------------------------------------

BFS_SEED = 0


def host_bfs(sf_dir: str, rep: int = LG_REP, seed: int = BFS_SEED) -> "pa.Table":
    """Unweighted BFS hop distance from the seed host over the host
    link graph — the reachability/radius primitive (crawl frontier
    depth, link-spam blast radius) next to PageRank's centrality.

    Same execution law as :func:`pagerank_hosts`: the weighted edge
    Dataset stays distributed; each round broadcasts the |hosts|-
    length int64 distance vector (``ray.put``, read once per task)
    and every edge block emits one partial candidate vector
    ``min(dist[src] + 1)`` per destination; the driver folds the few
    block vectors and stops at the fixpoint (<= diameter rounds, <=
    |hosts| worst case).  Distances never shuffle; the hot host (40%
    in-degree by construction) costs nothing extra.

    Output: (host, dist) for hosts reachable from the seed.  Oracle:
    a recursive CTE over the distinct edge list (min hop per host).
    """
    import ray

    edges = host_edges(sf_dir, rep).materialize()
    small = edges.to_pandas()  # |hosts|^2-bounded
    hosts = np.unique(np.concatenate([small["src_id"].values, small["dst_id"].values]))
    n = len(hosts)
    BIG = np.int64(1) << np.int64(40)
    dist = np.full(n, BIG, dtype=np.int64)
    sidx = int(np.searchsorted(hosts, seed))
    if sidx < n and hosts[sidx] == seed:
        dist[sidx] = 0
    hosts_ref = ray.put(hosts)

    def relax(t: pa.Table, d_ref) -> pa.Table:
        hs = ray.get(hosts_ref)
        dv = ray.get(d_ref)
        s = np.searchsorted(hs, t["src_id"].to_numpy(zero_copy_only=False))
        d = np.searchsorted(hs, t["dst_id"].to_numpy(zero_copy_only=False))
        cand = np.full(len(hs), BIG, dtype=np.int64)
        np.minimum.at(cand, d, np.minimum(dv[s] + 1, BIG))
        return _vec_partial(cand, skip=BIG)

    for _ in range(n):
        d_ref = ray.put(dist)
        parts = edges.map_batches(
            lambda t, dr=d_ref: relax(t, dr), batch_format="pyarrow"
        )
        new = np.minimum(dist, _vec_fold(parts, n, "min", int(BIG)))
        if np.array_equal(new, dist):
            break
        dist = new

    keep = dist < BIG
    host = pc.binary_join_element_wise(
        "h", pc.cast(pa.array(hosts[keep]), pa.string()), ".example", ""
    )
    return pa.table({"host": host, "dist": pa.array(dist[keep])})


def host_bfs_sql(rep: int = LG_REP, seed: int = BFS_SEED) -> str:
    return (
        f"with recursive e as ({_edges_sql(rep)}), "
        "ed as (select distinct src_id, dst_id from e), "
        "bfs(hid, d) as ("
        f"select cast({seed} as bigint), cast(0 as bigint) "
        "union "
        "select ed.dst_id, bfs.d + 1 from bfs join ed on ed.src_id = bfs.hid "
        f"where bfs.d < {NH}) "
        "select ('h' || cast(hid as varchar) || '.example') as host, "
        "cast(min(d) as bigint) as dist from bfs group by hid"
    )


# --- label-propagation communities ----------------------------------------

LPA_ITERS = 3


def lpa_communities(
    sf_dir: str, rep: int = LG_REP, iters: int = LPA_ITERS
) -> "pa.Table":
    """Community detection by synchronous label propagation over the
    undirected weighted host graph (Raghavan et al. 2007), made fully
    deterministic: every host starts as its own label; each round a
    host adopts the label with the greatest incident edge weight
    among its neighbours' CURRENT labels, ties to the smallest label;
    fixed ``iters`` rounds (synchronous + tie rule + fixed rounds =
    the run is a pure function of the graph, so the unrolled-CTE SQL
    oracle reproduces it exactly — same determinism discipline as
    ``pagerank_hosts``).

    Hub removal first: edges incident to the built-in 40%-in-degree
    hot host are dropped before propagation (the standard hub
    preprocessing — a super-hub absorbs the whole graph into one
    community in round 1, verified degenerate on this corpus); the
    hub stays in the output as its own singleton community.

    Ray shape: the weighted edge Dataset stays distributed; each
    round is one pass of per-batch (host, label, weight) tally
    partials against the BROADCAST label vector, folded on the driver
    (|hosts|-bounded, like the PageRank contribution vector).  At
    real scale (labels no longer broadcastable) each round becomes
    the standard two-shuffle fold: edges join labels by src bucket,
    tallies fold by dst bucket — noted here, not needed for a
    host-cardinality graph."""
    import ray

    edges = host_edges(sf_dir, rep).materialize()
    small = edges.to_pandas()
    hosts = np.unique(np.concatenate([small["src_id"].values, small["dst_id"].values]))
    n = len(hosts)
    lbl = hosts.astype(np.int64).copy()
    hosts_ref = ray.put(hosts)

    def tally(t: pa.Table, l_ref) -> pa.Table:
        hs = ray.get(hosts_ref)
        lv = ray.get(l_ref)
        sid = t["src_id"].to_numpy(zero_copy_only=False)
        did = t["dst_id"].to_numpy(zero_copy_only=False)
        keep = (sid != _HOT_DST) & (did != _HOT_DST)  # hub removal
        s = np.searchsorted(hs, sid[keep])
        d = np.searchsorted(hs, did[keep])
        c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        # undirected: each edge votes its weight both ways
        hid = np.concatenate([d, s])
        nb_lbl = np.concatenate([lv[s], lv[d]])
        w = np.concatenate([c, c])
        df = pd.DataFrame({"hid": hid, "lbl": nb_lbl, "w": w})
        g = df.groupby(["hid", "lbl"], as_index=False)["w"].sum()
        return pa.table(
            {
                "hid": pa.array(g["hid"].to_numpy(np.int64)),
                "lbl": pa.array(g["lbl"].to_numpy(np.int64)),
                "w": pa.array(g["w"].to_numpy(np.int64)),
            }
        )

    for _ in range(iters):
        l_ref = ray.put(lbl)
        parts = edges.map_batches(
            lambda t, lr=l_ref: tally(t, lr), batch_format="pyarrow"
        ).to_pandas()
        g = parts.groupby(["hid", "lbl"], as_index=False)["w"].sum()
        # argmax by (w desc, lbl asc) per host; isolated hosts keep theirs
        g = g.sort_values(["hid", "w", "lbl"], ascending=[True, False, True])
        win = g.drop_duplicates("hid", keep="first")
        new = lbl.copy()
        new[win["hid"].to_numpy(np.int64)] = win["lbl"].to_numpy(np.int64)
        lbl = new

    host = pc.binary_join_element_wise(
        "h", pc.cast(pa.array(hosts), pa.string()), ".example", ""
    )
    return pa.table({"host": host, "community": pa.array(lbl)})


def _lpa_ctes(rep: int, iters: int) -> list:
    """Shared CTE chain for the LPA label fixpoint (consumed by the
    communities oracle and the modularity oracle)."""
    ctes = [
        f"e as ({_edges_sql(rep)})",
        f"e2 as (select src_id as a, dst_id as b, cnt from e "
        f"where src_id <> {_HOT_DST} and dst_id <> {_HOT_DST} "
        f"union all select dst_id, src_id, cnt from e "
        f"where src_id <> {_HOT_DST} and dst_id <> {_HOT_DST})",
        "hosts as (select distinct hid from "
        "(select src_id as hid from e union select dst_id from e))",
        "l0 as (select hid, hid as lbl from hosts)",
    ]
    for k in range(iters):
        ctes.append(
            f"t{k + 1} as (select e2.a as hid, l{k}.lbl as lbl, "
            f"sum(e2.cnt) as w from e2 join l{k} on l{k}.hid = e2.b "
            "group by 1, 2)"
        )
        ctes.append(
            f"l{k + 1} as (select h.hid, coalesce(x.lbl, p.lbl) as lbl "
            "from hosts h "
            "left join (select hid, lbl from ("
            f"  select hid, lbl, row_number() over (partition by hid "
            f"  order by w desc, lbl asc) as rn from t{k + 1}) where rn = 1) x "
            "using (hid) "
            f"join l{k} p using (hid))"
        )
    return ctes


def lpa_communities_sql(rep: int = LG_REP, iters: int = LPA_ITERS) -> str:
    ctes = _lpa_ctes(rep, iters)
    return (
        "with " + ",\n".join(ctes) + "\n"
        "select ('h' || cast(hid as varchar) || '.example') as host, "
        f"cast(lbl as bigint) as community from l{iters} order by host"
    )


# --- personalized PageRank -------------------------------------------------

PPR_SEEDS = (1, 2, 3)  # trusted seed hosts (hub 0 excluded on purpose)


def pagerank_personalized(
    sf_dir: str, rep: int = LG_REP, iters: int = PR_ITERS,
    seeds: tuple = PPR_SEEDS,
) -> "pa.Table":
    """Personalized PageRank: the damping teleport returns to a SEED
    set instead of the uniform vector — TrustRank-style host-quality
    propagation from a trusted whitelist (Gyongyi et al. 2004), the
    crawl-frontier prioritizer.  Same int64 fixed-point discipline
    and broadcast-contribution-vector rounds as :func:`pagerank_hosts`
    (the rank vector broadcasts, edges stay distributed, nothing
    shuffles); only the base term changes: ``15% * SCALE / |seeds|``
    on seed hosts, 0 elsewhere."""
    import ray

    edges = host_edges(sf_dir, rep).materialize()
    small = edges.to_pandas()
    hosts = np.unique(np.concatenate([small["src_id"].values, small["dst_id"].values]))
    n = len(hosts)
    outdeg = np.zeros(n, dtype=np.int64)
    si = np.searchsorted(hosts, small["src_id"].values)
    np.add.at(outdeg, si, small["cnt"].values)
    seed_idx = np.searchsorted(hosts, np.array(sorted(seeds), dtype=np.int64))
    base = np.zeros(n, dtype=np.int64)
    base[seed_idx] = (15 * PR_SCALE) // (100 * len(seeds))
    r = base.copy()  # start at the teleport distribution

    hosts_ref = ray.put(hosts)
    outdeg_ref = ray.put(outdeg)

    def contrib(t: pa.Table, r_ref) -> pa.Table:
        hs = ray.get(hosts_ref)
        od = ray.get(outdeg_ref)
        rv = ray.get(r_ref)
        s = np.searchsorted(hs, t["src_id"].to_numpy(zero_copy_only=False))
        d = np.searchsorted(hs, t["dst_id"].to_numpy(zero_copy_only=False))
        c = t["cnt"].to_numpy(zero_copy_only=False)
        per_edge = (rv[s] // od[s]) * c
        acc = np.zeros(len(hs), dtype=np.int64)
        np.add.at(acc, d, per_edge)
        return _vec_partial(acc)

    for _ in range(iters):
        r_ref = ray.put(r)
        parts = edges.map_batches(
            lambda t, rr=r_ref: contrib(t, rr), batch_format="pyarrow"
        )
        cvec = _vec_fold(parts, n)
        r = base + (85 * cvec) // 100

    host = pc.binary_join_element_wise(
        "h", pc.cast(pa.array(hosts), pa.string()), ".example", ""
    )
    return pa.table({"host": host, "ppr_num": pa.array(r)})


def pagerank_personalized_sql(
    rep: int = LG_REP, iters: int = PR_ITERS, seeds: tuple = PPR_SEEDS
) -> str:
    seed_list = ", ".join(str(s) for s in sorted(seeds))
    base = f"(case when hid in ({seed_list}) then (15 * {PR_SCALE}) // (100 * {len(seeds)}) else 0 end)"
    ctes = [
        f"e as ({_edges_sql(rep)})",
        "hosts as (select distinct hid from "
        "(select src_id as hid from e union select dst_id from e))",
        "outd as (select src_id, sum(cnt) as od from e group by 1)",
        f"r0 as (select hid, {base} as r from hosts)",
    ]
    for k in range(iters):
        ctes.append(
            f"r{k + 1} as (select h.hid, {base} "
            f"+ (85 * coalesce(s.c, 0)) // 100 as r "
            "from hosts h left join ("
            f"select e.dst_id as hid, sum(e.cnt * (r{k}.r // o.od)) as c "
            f"from e join r{k} on e.src_id = r{k}.hid "
            "join outd o on o.src_id = e.src_id group by 1) s using (hid))"
        )
    return (
        "with " + ",\n".join(ctes) + "\n"
        "select ('h' || cast(hid as varchar) || '.example') as host, "
        f"cast(r as bigint) as ppr_num from r{iters} order by host"
    )


# --- HITS (hubs & authorities), fixed iterations, integer-exact ----------

HITS_ITERS = 2


def hits_hosts(sf_dir: str, rep: int = LG_REP, iters: int = HITS_ITERS) -> "pa.Table":
    """HITS hubs/authorities over the weighted host graph
    (Kleinberg 1999), ``iters`` mutual-reinforcement rounds with NO
    normalization so every score stays an exact int64 and the DuckDB
    oracle (unrolled join/group-by per half-step) matches
    bit-for-bit: ``a_{k}[d] = sum_e cnt * h_{k-1}[src]``,
    ``h_{k}[s] = sum_e cnt * a_{k}[dst]``, ``h_0 = 1``.

    Scale shape (identical to :func:`pagerank_hosts`): the weighted
    edge Dataset stays distributed; each half-step is ONE pass of
    per-batch partial |hosts|-length int64 vectors summed on the
    driver — score vectors broadcast via ``ray.put``, never shuffled,
    so the built-in hot host (40% in-degree) costs nothing.
    Unnormalized scores grow like (sum cnt)^(2*iters); a loud int64
    headroom guard fails before silent wraparound (the bm25_query
    convention) — at real web scale the caller normalizes per round
    (divide by max, documented deviation from the oracle) or keeps
    iters small.

    Reference analog: the reference ranks tile/category frequency to
    pick dominant classes (aerial-conversion coco_balance dominant
    sampling); HITS is the link-graph-native ranking of the same
    "which nodes dominate" question."""
    import ray

    edges = host_edges(sf_dir, rep).materialize()
    small = edges.to_pandas()  # |hosts|^2-bounded universe read
    hosts = np.unique(
        np.concatenate([small["src_id"].values, small["dst_id"].values])
    )
    n = len(hosts)
    hosts_ref = ray.put(hosts)

    total_cnt = int(small["cnt"].sum())

    def half_step(vec: np.ndarray, src_to_dst: bool) -> np.ndarray:
        """One distributed half-iteration: fold cnt * vec[from] into
        the other endpoint, one partial vector row per edge block.
        Guarded on the ACTUAL incoming vector maximum (every output
        value is <= sum(cnt) * max(vec), and so is every per-batch
        partial), not the (sum cnt)^(2*iters) worst case — the loud
        pre-wrap failure survives, but real graphs whose scores grow
        far slower than the bound keep running."""
        if total_cnt and int(vec.max()) > (1 << 62) // total_cnt:
            raise ValueError(
                f"hits_hosts: unnormalized int64 headroom exceeded "
                f"(sum cnt={total_cnt}, max score={int(vec.max())}); "
                "reduce iters or normalize per round"
            )
        vec_ref = ray.put(vec)

        def contrib(t: pa.Table) -> pa.Table:
            hs = ray.get(hosts_ref)
            v = ray.get(vec_ref)
            s = np.searchsorted(hs, t["src_id"].to_numpy(zero_copy_only=False))
            d = np.searchsorted(hs, t["dst_id"].to_numpy(zero_copy_only=False))
            c = t["cnt"].to_numpy(zero_copy_only=False)
            frm, to = (s, d) if src_to_dst else (d, s)
            acc = np.zeros(len(hs), dtype=np.int64)
            np.add.at(acc, to, c * v[frm])
            return _vec_partial(acc)

        parts = edges.map_batches(contrib, batch_format="pyarrow")
        return _vec_fold(parts, n)

    h = np.ones(n, dtype=np.int64)
    a = np.zeros(n, dtype=np.int64)
    for _ in range(iters):
        a = half_step(h, src_to_dst=True)   # authorities gather hubs
        h = half_step(a, src_to_dst=False)  # hubs gather authorities
    host = pc.binary_join_element_wise(
        "h", pc.cast(pa.array(hosts), pa.string()), ".example", ""
    )
    return pa.table(
        {"host": host, "auth_num": pa.array(a), "hub_num": pa.array(h)}
    )


def hits_hosts_sql(rep: int = LG_REP, iters: int = HITS_ITERS) -> str:
    """HITS unrolled per half-step; DuckDB sums promote to HUGEINT so
    the engine's loud guard is the only overflow authority."""
    ctes = [
        f"e as ({_edges_sql(rep)})",
        "hosts as (select distinct hid from "
        "(select src_id as hid from e union select dst_id from e))",
        "h0 as (select hid, cast(1 as bigint) as h from hosts)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"a{k} as (select h.hid, cast(coalesce(s.a, 0) as bigint) as a "
            "from hosts h left join ("
            f"select e.dst_id as hid, sum(e.cnt * h{k - 1}.h) as a "
            f"from e join h{k - 1} on e.src_id = h{k - 1}.hid group by 1"
            ") s using (hid))"
        )
        ctes.append(
            f"h{k} as (select h.hid, cast(coalesce(s.h, 0) as bigint) as h "
            "from hosts h left join ("
            f"select e.src_id as hid, sum(e.cnt * a{k}.a) as h "
            f"from e join a{k} on e.dst_id = a{k}.hid group by 1"
            ") s using (hid))"
        )
    return (
        "with " + ",\n".join(ctes) + "\n"
        "select ('h' || cast(hid as varchar) || '.example') as host, "
        f"a{iters}.a as auth_num, h{iters}.h as hub_num "
        f"from hosts join a{iters} using (hid) join h{iters} using (hid) "
        "order by host"
    )


# --------------------------------------------------------------------------
# Link prediction: integer-exact Jaccard over out-neighbour sets
# --------------------------------------------------------------------------


def host_jaccard(sf_dir: str, rep: int = LG_REP) -> ray.data.Dataset:
    """Link-prediction scores for host pairs: exact Jaccard similarity
    of their distinct out-neighbour sets, kept integral as
    ``(inter, uni, jaccard_e6 = inter*1e6 // uni)`` — the
    common-neighbours family (Liben-Nowell & Kleinberg) next to
    ``host_cocitation``'s shared-count signal; mirror/link-farm
    detection thresholds on exactly this ratio.

    Plan: the per-destination pair miner (same dbucket fold shape as
    ``host_cocitation``) yields ``|N(a) ∩ N(b)|``; distinct
    out-degrees fold per-source from the weighted edge table (one
    int64 pass, hosts-bounded) and broadcast via ``ray.put`` — the
    degree side is |hosts| rows, the textbook broadcast-small-side
    join, so the pair table never shuffles again.
    """
    edges = host_edges(sf_dir, rep).materialize()  # consumed twice

    def deg_partial(t: pa.Table) -> pa.Table:
        s = t["src_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(s, return_counts=True)
        return pa.table(
            {
                "src_id": pa.array(u),
                "deg": pa.array(c.astype(np.int64)),
                "bucket": pa.array(u % np.int64(32)),
            }
        )

    def deg_fold(df):
        return df.groupby("src_id", as_index=False)["deg"].sum()

    deg_tbl = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(deg_fold, batch_format="pandas")
        .to_pandas()  # |hosts| rows — the broadcast small side
    )
    deg = np.zeros(NH, np.int64)
    deg[deg_tbl["src_id"].to_numpy(np.int64)] = deg_tbl["deg"].to_numpy(np.int64)
    deg_ref = ray.put(deg)

    def pairs_per_dst(df):
        import pandas as pd

        out_a, out_b = [], []
        for _, g in df.groupby("dst_id", sort=False):
            src = np.sort(g["src_id"].to_numpy(np.int64))
            n = len(src)
            if n < 2:
                continue
            iu, ju = np.triu_indices(n, k=1)
            out_a.append(src[iu])
            out_b.append(src[ju])
        if not out_a:
            return pd.DataFrame(
                {"a_id": pd.Series(dtype="int64"), "b_id": pd.Series(dtype="int64"),
                 "inter": pd.Series(dtype="int64")}
            )
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        return pd.DataFrame({"a_id": a, "b_id": b, "inter": np.ones(len(a), np.int64)})

    def tag_dst(t: pa.Table) -> pa.Table:
        d = t["dst_id"].to_numpy(zero_copy_only=False)
        return t.append_column("dbucket", pa.array(d % np.int64(32)))

    def tag_pair(t: pa.Table) -> pa.Table:
        a = t["a_id"].to_numpy(zero_copy_only=False)
        b = t["b_id"].to_numpy(zero_copy_only=False)
        return t.append_column("pbucket", pa.array((a * NH + b) % np.int64(32)))

    def fold(df):
        g = df.groupby(["a_id", "b_id"], as_index=False)["inter"].sum()
        dv = ray.get(deg_ref)  # local object-store read, shipped once
        da = dv[g["a_id"].to_numpy(np.int64)]
        db = dv[g["b_id"].to_numpy(np.int64)]
        uni = da + db - g["inter"].to_numpy(np.int64)
        g["uni"] = uni
        g["jaccard_e6"] = g["inter"].to_numpy(np.int64) * 1_000_000 // uni
        return g

    return (
        edges.map_batches(tag_dst, batch_format="pyarrow")
        .groupby("dbucket")
        .map_groups(pairs_per_dst, batch_format="pandas")
        .map_batches(tag_pair, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(fold, batch_format="pandas")
    )


def host_jaccard_sql(rep: int = LG_REP) -> str:
    return f"""
with e as ({_edges_sql(rep)}),
d as (select src_id, cast(count(*) as bigint) as deg from e group by 1),
i as (select a.src_id as a_id, b.src_id as b_id,
             cast(count(*) as bigint) as inter
      from e a join e b on a.dst_id = b.dst_id and a.src_id < b.src_id
      group by 1, 2)
select i.a_id, i.b_id, i.inter,
       da.deg + db.deg - i.inter as uni,
       i.inter * 1000000 // (da.deg + db.deg - i.inter) as jaccard_e6
from i join d da on da.src_id = i.a_id join d db on db.src_id = i.b_id
"""


# --------------------------------------------------------------------------
# Weighted shortest paths (bounded Bellman-Ford) from a source host
# --------------------------------------------------------------------------

SP_SRC = 0
SP_HOPS = 8
_SP_INF = np.int64(1) << np.int64(62)

# Driver fast-path gate for iterative host-graph rounds (the
# _tri_small / assortativity precedent): the FOLDED weighted edge
# table is |hosts|^2-bounded, so when it is collectable the per-round
# work is a few numpy ops and paying one Ray pass + take_all PER
# ROUND (~1 s each, measured at sf0.1) is pure overhead.  Every op
# keeps its distributed-rounds branch for edge tables past the gate,
# and tests exercise that branch by passing small_gate=0.
LG_SMALL_EDGES = 2_000_000


def _edge_arrays_if_small(edges, gate: int = LG_SMALL_EDGES):
    """(src, dst, cnt) int64 arrays when the folded edge Dataset is
    within the driver gate, else None (callers then run the
    broadcast-round distributed branch)."""
    if edges.count() > gate:
        return None
    df = edges.to_pandas()
    return (
        df["src_id"].to_numpy(np.int64),
        df["dst_id"].to_numpy(np.int64),
        df["cnt"].to_numpy(np.int64),
    )


def host_shortest_path(
    sf_dir: str,
    rep: int = LG_REP,
    src: int = SP_SRC,
    hops: int = SP_HOPS,
    small_gate: int = LG_SMALL_EDGES,
) -> "pa.Table":
    """Cheapest-path cost from host ``src`` to every reachable host
    under integer edge weights ``w = 1e6 // cnt + 1`` (heavily-linked
    edges are cheap) — the weighted generalization of ``host_bfs``:
    crawl-frontier prioritization / hop-cost modeling over the link
    graph.  Exactly ``hops`` Bellman-Ford relaxation rounds (with
    early exit at the fixpoint), so the result is BY CONSTRUCTION the
    min cost over paths of <= ``hops`` edges — the identical quantity
    the unrolled-CTE oracle computes; all arithmetic int64.

    Scale shape: same as ``pagerank_hosts`` — the distance vector
    broadcasts (``ray.put`` per round), the edge table streams, each
    batch returns ONE |hosts|-length partial-min vector and the
    driver folds an elementwise min over the few block rows.  Bound:
    #blocks x |hosts| ints; past |hosts| ~1e7 the round becomes a
    bucketed fold keyed by dst."""
    import ray

    edges = host_edges(sf_dir, rep).materialize()
    dist = np.full(NH, _SP_INF, dtype=np.int64)
    dist[src] = 0

    arrs = _edge_arrays_if_small(edges, small_gate)
    if arrs is not None:
        s, d, c = arrs
        w = 1_000_000 // c + 1
        for _ in range(hops):
            ok = dist[s] < _SP_INF
            cand = np.full(NH, _SP_INF, dtype=np.int64)
            np.minimum.at(cand, d[ok], dist[s[ok]] + w[ok])
            new = np.minimum(dist, cand)
            if (new == dist).all():
                break
            dist = new
        return _sp_table(dist)

    def relax(t: pa.Table, d_ref) -> pa.Table:
        dv = ray.get(d_ref)
        s = t["src_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = 1_000_000 // c + 1
        ok = dv[s] < _SP_INF
        acc = np.full(NH, _SP_INF, dtype=np.int64)
        np.minimum.at(acc, d[ok], dv[s[ok]] + w[ok])
        return _vec_partial(acc, skip=int(_SP_INF))

    for _ in range(hops):
        d_ref = ray.put(dist)
        parts = edges.map_batches(
            lambda t, dr=d_ref: relax(t, dr), batch_format="pyarrow"
        )
        cand = _vec_fold(parts, NH, "min", int(_SP_INF))
        new = np.minimum(dist, cand)
        if (new == dist).all():
            break
        dist = new

    return _sp_table(dist)


def _sp_table(dist: np.ndarray) -> "pa.Table":
    reach = np.nonzero(dist < _SP_INF)[0]
    host = pc.binary_join_element_wise(
        "h", pc.cast(pa.array(reach.astype(np.int64)), pa.string()), ".example", ""
    )
    return pa.table({"host": host, "cost": pa.array(dist[reach])})


def host_shortest_path_sql(
    rep: int = LG_REP, src: int = SP_SRC, hops: int = SP_HOPS
) -> str:
    """Bellman-Ford unrolled as chained CTEs: d_{k+1}(v) =
    min(d_k(v), min over edges (u,v) of d_k(u) + w)."""
    ctes = [
        f"e0 as ({_edges_sql(rep)})",
        "e as (select src_id, dst_id, 1000000 // cnt + 1 as w from e0)",
        f"d0(hid, c) as (values ({src}, 0))",
    ]
    for k in range(hops):
        ctes.append(
            f"d{k + 1} as (select hid, min(c) as c from ("
            f"select hid, c from d{k} "
            f"union all "
            f"select e.dst_id as hid, d{k}.c + e.w as c "
            f"from d{k} join e on e.src_id = d{k}.hid) group by hid)"
        )
    return (
        "with " + ",\n".join(ctes) + "\n"
        "select ('h' || cast(hid as varchar) || '.example') as host, "
        f"cast(c as bigint) as cost from d{hops}"
    )


# --------------------------------------------------------------------------
# Bit-parallel all-pairs BFS: closeness / harmonic / eccentricity per host,
# and strongly connected components from the same transitive closure
# --------------------------------------------------------------------------


def _host_closure(
    sf_dir: str,
    rep: int = LG_REP,
    rel_thr_pct: int | None = None,
    small_gate: int = LG_SMALL_EDGES,
    sources: np.ndarray | None = None,
):
    """All-pairs directed hop distances + transitive closure over the
    host graph by BIT-PARALLEL multi-source BFS: each host carries
    ``W = ceil(n/64)`` machine words whose bit ``s`` (word ``s>>6``,
    bit ``s&63``) means "source ``s`` reaches me"; one relaxation
    round ORs every edge's src words into its dst words, so 64 BFS
    frontiers advance per word per pass for the cost of one.

    Ray shape (the ``pagerank_hosts`` law): the weighted edge Dataset
    stays distributed; each round broadcasts the (|hosts|, W) mask
    matrix (``ray.put``) and every edge block returns ONE sparse
    partial — only its nonzero (host, word, value) triples; the
    driver folds bitwise-OR over the few block partials and stops at
    the closure fixpoint (<= diameter rounds).  The per-round cost is
    edges x words; the |hosts|^2 object this function does
    materialize is ``dmat`` itself, which is the all-pairs ANSWER —
    callers that only need per-source aggregates at very large n
    should run the same rounds over a landmark sample of source
    blocks.

    ``rel_thr_pct`` sparsifies first: keep only edges with
    ``cnt >= sum(cnt) * pct // (n_edges * 100)`` (a SCALE-INVARIANT
    relative-to-mean weight floor — absolute counts grow with the
    corpus, the mean grows with them), computed from the already-folded
    |hosts|^2-bounded edge table.

    Returns (hosts, dmat, reach) where ``dmat[s, v]`` is the min hop
    count s->v (INF when unreachable; diagonal 0 by seeding) and
    ``reach`` is the (n, W) uint64 closure matrix (row v = who
    reaches v)."""
    import ray

    edges = host_edges(sf_dir, rep).materialize()
    small = edges.to_pandas()  # |hosts|^2-bounded
    if rel_thr_pct is not None:
        thr = int(small["cnt"].sum()) * rel_thr_pct // (len(small) * 100)
        edges = edges.map_batches(
            lambda t, v=thr: t.filter(pc.greater_equal(t["cnt"], v)),
            batch_format="pyarrow",
        ).materialize()
        small = small[small["cnt"] >= thr]
    hosts = np.unique(np.concatenate([small["src_id"].values, small["dst_id"].values]))
    n = len(hosts)
    hosts_ref = ray.put(hosts)

    if sources is None:
        # all-pairs: source j IS host j
        src_idx = np.arange(n)
    else:
        # landmark mode: only the given source hosts carry bits, so
        # the mask is (n, ceil(L/64)) and dmat is (L, n) — the memory
        # that scales is landmarks x hosts, never hosts^2
        sources = np.asarray(sources, np.int64)
        src_idx = np.searchsorted(hosts, sources)
        ok = (src_idx < n) & (hosts[np.minimum(src_idx, n - 1)] == sources)
        src_idx = src_idx[ok]
    L = len(src_idx)
    W = (L + 63) >> 6
    j = np.arange(L)
    mask = np.zeros((n, W), dtype=np.uint64)
    mask[src_idx, j >> 6] = np.uint64(1) << (j & 63).astype(np.uint64)
    INF = np.int64(1) << np.int64(40)
    dmat = np.full((L, n), INF, dtype=np.int64)
    dmat[j, src_idx] = 0

    def _record_fresh(fresh: np.ndarray, k: int) -> None:
        # bits newly reaching v this round are at distance k:
        # fresh[v, w] bit b set  ->  dmat[w*64 + b, v] = k
        v_i, w_i = np.nonzero(fresh)
        if not len(v_i):
            return
        bits = (
            fresh[v_i, w_i][:, None] >> np.arange(64, dtype=np.uint64)[None, :]
        ) & np.uint64(1)
        r, b = np.nonzero(bits)
        dmat[w_i[r] * 64 + b, v_i[r]] = k

    if len(small) <= small_gate:
        # driver fast path (LG_SMALL_EDGES): identical round arithmetic
        # on the already-collected fold, no per-round Ray pass
        s = np.searchsorted(hosts, small["src_id"].values)
        d = np.searchsorted(hosts, small["dst_id"].values)
        for k in range(1, n + 1):
            acc = np.zeros((n, W), dtype=np.uint64)
            np.bitwise_or.at(acc, d, mask[s])
            new = mask | acc
            fresh = new & ~mask
            if not fresh.any():
                break
            _record_fresh(fresh, k)
            mask = new
        return hosts, dmat, mask

    def orfold(t: pa.Table, m_ref) -> pa.Table:
        hs = ray.get(hosts_ref)
        mv = ray.get(m_ref)
        s = np.searchsorted(hs, t["src_id"].to_numpy(zero_copy_only=False))
        d = np.searchsorted(hs, t["dst_id"].to_numpy(zero_copy_only=False))
        acc = np.zeros((len(hs), mv.shape[1]), dtype=np.uint64)
        np.bitwise_or.at(acc, d, mv[s])
        # sparse partial: only the nonzero (host, word) cells move
        v_i, w_i = np.nonzero(acc)
        return pa.table(
            {
                "v": pa.array(v_i.astype(np.int64)),
                "w": pa.array(w_i.astype(np.int64)),
                "bits": pa.array(acc[v_i, w_i].view(np.int64)),
            }
        )

    for k in range(1, n + 1):
        m_ref = ray.put(mask)
        parts = edges.map_batches(
            lambda t, mr=m_ref: orfold(t, mr), batch_format="pyarrow"
        )
        acc = np.zeros((n, W), dtype=np.uint64)
        for bt in parts.iter_batches(batch_format="pyarrow", batch_size=None):
            if bt.num_rows == 0:
                continue
            v_i = bt["v"].to_numpy(zero_copy_only=False)
            w_i = bt["w"].to_numpy(zero_copy_only=False)
            bits = bt["bits"].to_numpy(zero_copy_only=False).view(np.uint64)
            np.bitwise_or.at(acc, (v_i, w_i), bits)
        new = mask | acc
        fresh = new & ~mask
        if not fresh.any():
            break
        _record_fresh(fresh, k)
        mask = new

    return hosts, dmat, mask


def host_closeness(sf_dir: str, rep: int = LG_REP) -> "pa.Table":
    """Per-host closeness / harmonic centrality / eccentricity over
    directed hop distances (the crawl-reach profile of every host at
    once): n_reach = reachable hosts (self excluded), closeness =
    sum of hop distances, harmonic_e6 = sum(1e6 // d) integer
    fixed-point, ecc = max distance.  Hosts reaching nothing but
    themselves are dropped (mirrors the SQL group-by).  All int64;
    the recursive-CTE oracle computes the identical min-hop matrix."""
    hosts, dmat, _ = _host_closure(sf_dir, rep)
    n = len(hosts)
    INF = np.int64(1) << np.int64(40)
    off = dmat.copy()
    np.fill_diagonal(off, INF)            # exclude self-pairs
    ok = off < INF
    n_reach = ok.sum(axis=1).astype(np.int64)
    d0 = np.where(ok, off, 0)
    keep = n_reach > 0
    host = pc.binary_join_element_wise(
        "h", pc.cast(pa.array(hosts[keep]), pa.string()), ".example", ""
    )
    return pa.table(
        {
            "host": host,
            "n_reach": pa.array(n_reach[keep]),
            "closeness": pa.array(d0.sum(axis=1)[keep]),
            "harmonic_e6": pa.array(
                np.where(ok, 1_000_000 // np.maximum(off, 1), 0).sum(axis=1)[keep]
            ),
            "ecc": pa.array(d0.max(axis=1)[keep]),
        }
    )


def host_closeness_sql(rep: int = LG_REP) -> str:
    return (
        f"with recursive e as ({_edges_sql(rep)}), "
        "ed as (select distinct src_id, dst_id from e), "
        "hosts as (select distinct hid from "
        "(select src_id as hid from ed union all select dst_id from ed)), "
        "ap(s, v, d) as ("
        "select hid, hid, cast(0 as bigint) from hosts "
        "union "
        f"select ap.s, ed.dst_id, ap.d + 1 from ap join ed on ed.src_id = ap.v "
        f"where ap.d < {NH}), "
        "md as (select s, v, min(d) as d from ap group by s, v) "
        "select ('h' || cast(s as varchar) || '.example') as host, "
        "cast(count(*) as bigint) as n_reach, "
        "cast(sum(d) as bigint) as closeness, "
        "cast(sum(1000000 // d) as bigint) as harmonic_e6, "
        "cast(max(d) as bigint) as ecc "
        "from md where s <> v group by s"
    )


LM_MOD = 4   # landmark sample: every 4th host id (deterministic)


def host_closeness_landmarks(
    sf_dir: str, rep: int = LG_REP, lm_mod: int = LM_MOD
) -> "pa.Table":
    """Landmark closeness — the 10^8-host plan for
    :func:`host_closeness`: BFS words carry only a DETERMINISTIC
    landmark subset (``hid % lm_mod == 0``), so the mask is
    (|hosts|, ceil(L/64)) and the distance matrix is L x |hosts| —
    the memory that scales is landmarks x hosts, never hosts^2 (the
    standard landmark/pivot estimator for closeness at graph scale;
    here the *restricted* quantity is computed exactly and
    SQL-checked, no estimation error is hidden).

    Output per host reached by >= 1 landmark: (host, n_lm,
    closeness_in = sum of landmark->host hop distances,
    nearest_lm = min distance).  Self pairs excluded."""
    cand = np.arange(0, NH, lm_mod, dtype=np.int64)
    hosts, dmat, _ = _host_closure(sf_dir, rep, sources=cand)
    INF = np.int64(1) << np.int64(40)
    off = dmat.copy()
    off[off == 0] = INF           # only a landmark's own column is 0
    ok = off < INF
    n_lm = ok.sum(axis=0).astype(np.int64)
    keep = n_lm > 0
    sum_d = np.where(ok, off, 0).sum(axis=0)
    min_d = np.where(ok, off, INF).min(axis=0)
    host = pc.binary_join_element_wise(
        "h", pc.cast(pa.array(hosts[keep]), pa.string()), ".example", ""
    )
    return pa.table(
        {
            "host": host,
            "n_lm": pa.array(n_lm[keep]),
            "closeness_in": pa.array(sum_d[keep]),
            "nearest_lm": pa.array(min_d[keep]),
        }
    )


def host_closeness_landmarks_sql(rep: int = LG_REP, lm_mod: int = LM_MOD) -> str:
    return (
        f"with recursive e as ({_edges_sql(rep)}), "
        "ed as (select distinct src_id, dst_id from e), "
        "hosts as (select distinct hid from "
        "(select src_id as hid from ed union all select dst_id from ed)), "
        f"lm as (select hid from hosts where hid % {lm_mod} = 0), "
        "ap(s, v, d) as ("
        "select hid, hid, cast(0 as bigint) from lm "
        "union "
        f"select ap.s, ed.dst_id, ap.d + 1 from ap join ed on ed.src_id = ap.v "
        f"where ap.d < {NH}), "
        "md as (select s, v, min(d) as d from ap group by s, v) "
        "select ('h' || cast(v as varchar) || '.example') as host, "
        "cast(count(*) as bigint) as n_lm, "
        "cast(sum(d) as bigint) as closeness_in, "
        "cast(min(d) as bigint) as nearest_lm "
        "from md where s <> v group by v"
    )


SCC_THR_PCT = 60      # strong-edge floor: 0.60 x mean edge weight


def host_scc(sf_dir: str, rep: int = LG_REP) -> "pa.Table":
    """Strongly connected components of the STRONG-EDGE host graph
    (edges below 0.6x the mean link weight dropped first — the
    scale-invariant sparsification that leaves non-trivial mutual-
    reachability structure; the raw graph is one giant SCC by the
    hot-host construction) from the bit-parallel transitive closure:
    u and v share a component iff each reaches the other, and the
    component id is the smallest member — derived directly from the
    closure words (``reach[v]`` bit u AND ``reach[u]`` bit v), no
    Tarjan recursion, so the whole computation stays BSP rounds over
    the streamed edge table.  Output: (host, scc_id, scc_size)."""
    hosts, _, reach = _host_closure(sf_dir, rep, rel_thr_pct=SCC_THR_PCT)
    n = len(hosts)
    # M[u, v] = source u reaches v (diagonal true by seeding):
    # reach[v, u>>6] bit u&63, unpacked from the (n, W) word matrix
    u = np.arange(n)
    M = (
        (reach[:, u >> 6] >> (u & 63).astype(np.uint64)[None, :]) & np.uint64(1)
    ).astype(bool).T
    mut = M & M.T
    scc_idx = np.argmax(mut, axis=0)      # first (=min) mutual source index
    scc_id = hosts[scc_idx]
    sizes = np.bincount(scc_idx, minlength=n)[scc_idx].astype(np.int64)
    host = pc.binary_join_element_wise(
        "h", pc.cast(pa.array(hosts), pa.string()), ".example", ""
    )
    return pa.table(
        {"host": host, "scc_id": pa.array(scc_id), "scc_size": pa.array(sizes)}
    )


def host_scc_sql(rep: int = LG_REP) -> str:
    return (
        f"with recursive e as ({_edges_sql(rep)}), "
        f"thr as (select cast(sum(cnt) as bigint) * {SCC_THR_PCT} "
        "// (count(*) * 100) as t from e), "
        "ed as (select distinct src_id, dst_id from e "
        "where cnt >= (select t from thr)), "
        "hosts as (select distinct hid from "
        "(select src_id as hid from ed union all select dst_id from ed)), "
        "r(a, b) as ("
        "select src_id, dst_id from ed "
        "union "
        "select r.a, ed.dst_id from r join ed on ed.src_id = r.b), "
        "pairs as (select a, b from r union select hid, hid from hosts), "
        "scc as (select p.b as hid, min(p.a) as scc_id from pairs p "
        "join pairs q on q.a = p.b and q.b = p.a group by p.b), "
        "sz as (select scc_id, count(*) as n from scc group by scc_id) "
        "select ('h' || cast(scc.hid as varchar) || '.example') as host, "
        "cast(scc.scc_id as bigint) as scc_id, cast(sz.n as bigint) as scc_size "
        "from scc join sz on sz.scc_id = scc.scc_id"
    )


# --------------------------------------------------------------------------
# Deterministic random walks (DeepWalk corpus generation)
# --------------------------------------------------------------------------

WALK_LEN = 3            # steps beyond the start node
_WALK_A = 2654435761    # Knuth multiplicative constant
_WALK_B = 40503
_WALK_PMOD = 1000003


def random_walks(sf_dir: str, rep: int = LG_REP, steps: int = WALK_LEN) -> ray.data.Dataset:
    """DeepWalk-style corpus generation: one walk per PAGE over the
    host graph (start host = page_id % NH), ``steps`` deterministic
    transitions — at node h on step t the walk takes out-edge index
    ``((page_id % 1000003)*31 + (h+1)*2654435761 + t*40503) % outdeg(h)``
    over the dst-sorted adjacency.  Hash-indexed instead of RNG so the
    walk corpus is a pure function of the graph (resumable, and the
    unrolled-SQL oracle replays it edge-for-edge via the identical
    expression on ``row_number``-indexed adjacency).  Dead-end nodes
    terminate the walk (rows simply stop, like the SQL inner join).

    Ray shape: the page stream never shuffles — the dst-sorted CSR
    adjacency (|edges| ints) broadcasts once via ``ray.put`` and every
    batch advances all its walks with ``steps`` vectorized gathers.
    At web scale the CSR is the same object the kNN index already
    broadcasts; past broadcastable (|edges| ~ 1e9+) each step becomes
    a bucketed join keyed by current host, same oracle.

    Output: (page_id, step, host) — the token stream a skip-gram
    embedding trainer consumes."""
    import ray

    csr_ref = _walk_csr(sf_dir, rep)

    def walk(t: pa.Table) -> pa.Table:
        o, dg, fl = ray.get(csr_ref)
        pid = t["page_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hist = _walk_hist(pid, o, dg, fl, steps)
        out_pid, out_step, out_h = [], [], []
        for st in range(steps + 1):
            m = hist[st] >= 0
            if not m.any():
                break
            out_pid.append(pid[m])
            out_step.append(np.full(int(m.sum()), st, dtype=np.int64))
            out_h.append(hist[st][m])
        hid = np.concatenate(out_h)
        return pa.table(
            {
                "page_id": pa.array(np.concatenate(out_pid)),
                "step": pa.array(np.concatenate(out_step)),
                "host": pc.binary_join_element_wise(
                    "h", pc.cast(pa.array(hid), pa.string()), ".example", ""
                ),
            }
        )

    ds = pages_dataset(sf_dir, rep=rep, columns=["page_id"])
    return ds.map_batches(walk, batch_format="pyarrow")


def _walk_csr(sf_dir: str, rep: int):
    """dst-sorted CSR adjacency of the distinct host graph, broadcast
    once via ``ray.put`` (|edges| ints — the same object the kNN index
    already broadcasts)."""
    import ray

    small = host_edges(sf_dir, rep).to_pandas()  # |hosts|^2-bounded
    ed = small[["src_id", "dst_id"]].drop_duplicates().sort_values(
        ["src_id", "dst_id"]
    )
    src = ed["src_id"].to_numpy(np.int64)
    dst = ed["dst_id"].to_numpy(np.int64)
    deg = np.bincount(src, minlength=NH).astype(np.int64)
    off = np.zeros(NH, dtype=np.int64)
    off[1:] = np.cumsum(deg)[:-1]
    return ray.put((off, deg, dst))


def _walk_hist(pid: np.ndarray, o, dg, fl, steps: int) -> np.ndarray:
    """Full walk history for one batch of pages: ``hist[s][i]`` is the
    host page i's walk visits at step s, or -1 once the walk hit a
    dead end (matching the SQL oracle's inner join simply stopping).
    Each page's ENTIRE walk lives in this one (steps+1, n) array, so
    consumers that pair steps (skip-grams) never depend on Ray block
    boundaries."""
    n = len(pid)
    hist = np.full((steps + 1, n), -1, dtype=np.int64)
    cur = (pid % NH).astype(np.int64)
    hist[0] = cur
    alive = np.ones(n, dtype=bool)
    for st in range(steps):
        alive = alive & (dg[cur] > 0)
        if not alive.any():
            break
        pa_, ha = pid[alive], cur[alive]
        r = ((pa_ % _WALK_PMOD) * 31 + (ha + 1) * _WALK_A + st * _WALK_B) % dg[ha]
        nxt = fl[o[ha] + r]
        cur = cur.copy()
        cur[alive] = nxt
        hist[st + 1][alive] = nxt
    return hist


def random_walks_sql(rep: int = LG_REP, steps: int = WALK_LEN) -> str:
    ctes = [
        f"e as ({_edges_sql(rep)})",
        "ed as (select distinct src_id, dst_id from e)",
        "adj as (select src_id, dst_id, "
        "row_number() over (partition by src_id order by dst_id) - 1 as idx, "
        "count(*) over (partition by src_id) as deg from ed)",
        f"pg as (select distinct page_id from ({pages_cte(rep)}))",
        f"w0 as (select page_id, cast(page_id % {NH} as bigint) as h from pg)",
    ]
    for t in range(steps):
        ctes.append(
            f"w{t + 1} as (select w.page_id, a.dst_id as h "
            f"from w{t} w join adj a on a.src_id = w.h and a.idx = "
            f"((w.page_id % {_WALK_PMOD}) * 31 + (w.h + 1) * {_WALK_A} "
            f"+ {t} * {_WALK_B}) % a.deg)"
        )
    sel = " union all ".join(
        f"select page_id, cast({t} as bigint) as step, h from w{t}"
        for t in range(steps + 1)
    )
    return (
        "with " + ", ".join(ctes) + " "
        f"select page_id, step, ('h' || cast(h as varchar) || '.example') as host "
        f"from ({sel})"
    )


# --------------------------------------------------------------------------
# Luby's maximal independent set (deterministic hash priorities)
# --------------------------------------------------------------------------

MIS_C = 2654435761
MIS_M = 999983
MIS_MAX_ROUNDS = 8


def host_mis(
    sf_dir: str, rep: int = LG_REP, small_gate: int = LG_SMALL_EDGES
) -> "pa.Table":
    """Maximal independent set over the undirected host graph by
    Luby's algorithm with DETERMINISTIC priorities
    ``p(v) = (v * 2654435761) % 999983`` instead of RNG (asserted
    collision-free on the node set, so the tie rule never fires and
    the unrolled-CTE oracle replays the exact same rounds): each
    round selects every alive node whose priority beats all alive
    neighbours, adds it to the MIS, and removes it plus its
    neighbours.  O(log n) rounds w.h.p.; hard-capped at
    {MIS_MAX_ROUNDS} (loud failure past the cap, matching the
    oracle's unroll depth).

    The conflict-free-selection primitive behind parallel greedy
    scheduling (e.g. picking a non-overlapping tile-work set).  Ray
    shape: rounds over the broadcast alive/priority vector exactly
    like ``host_bfs`` — per-batch partial min-neighbour-priority
    folds; node count beyond broadcast turns each round into one
    bucketed min-fold keyed by the edge's low endpoint.

    Runs on the STRONG-EDGE subgraph (the :func:`host_scc` 0.6x-mean
    weight floor) with the hot host removed first (the
    ``lpa_communities`` hub preprocessing): the hub is adjacent to
    every host and holds the minimum priority, so on the raw graph it
    wins round 0 and the MIS degenerates to a single node.

    Output: (host, mis_round) for MIS members."""
    import ray

    edges = host_edges(sf_dir, rep).materialize()
    small = edges.to_pandas()
    thr = int(small["cnt"].sum()) * SCC_THR_PCT // (len(small) * 100)

    def prune(t: pa.Table, v: int = thr) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(t["cnt"], v),
                pc.not_equal(t["src_id"], _HOT_DST),
            ),
            pc.not_equal(t["dst_id"], _HOT_DST),
        )
        return t.filter(keep)

    edges = edges.map_batches(prune, batch_format="pyarrow").materialize()
    small = small[
        (small["cnt"] >= thr)
        & (small["src_id"] != _HOT_DST)
        & (small["dst_id"] != _HOT_DST)
    ]
    hosts = np.unique(np.concatenate([small["src_id"].values, small["dst_id"].values]))
    n = len(hosts)
    pri = (hosts.astype(np.int64) * MIS_C) % MIS_M
    if len(np.unique(pri)) != n:
        raise ValueError("host_mis: priority collision")
    hosts_ref = ray.put(hosts)

    alive = np.ones(n, dtype=bool)
    mis_round = np.full(n, -1, dtype=np.int64)
    BIG = np.int64(1) << np.int64(40)
    small_s = np.searchsorted(hosts, small["src_id"].values)
    small_d = np.searchsorted(hosts, small["dst_id"].values)

    if len(small) <= small_gate:
        # driver fast path (LG_SMALL_EDGES): same round arithmetic on
        # the collected fold
        for rnd in range(MIS_MAX_ROUNDS + 1):
            if not alive.any():
                break
            if rnd == MIS_MAX_ROUNDS:
                raise RuntimeError("host_mis: exceeded unroll depth")
            mn = np.full(n, BIG, dtype=np.int64)
            for x, y in ((small_s, small_d), (small_d, small_s)):
                ok = alive[x] & alive[y] & (x != y)
                np.minimum.at(mn, x[ok], pri[y[ok]])
            cand = alive & (pri < mn)
            mis_round[cand] = rnd
            kill = cand.copy()
            for x, y in ((small_s, small_d), (small_d, small_s)):
                sel = cand[x] & (x != y)
                kill[y[sel]] = True
            alive &= ~kill
        return _mis_table(hosts, mis_round)

    def min_nbr_pri(t: pa.Table, a_ref) -> pa.Table:
        hs = ray.get(hosts_ref)
        av = ray.get(a_ref)
        p = (hs.astype(np.int64) * MIS_C) % MIS_M
        s = np.searchsorted(hs, t["src_id"].to_numpy(zero_copy_only=False))
        d = np.searchsorted(hs, t["dst_id"].to_numpy(zero_copy_only=False))
        # undirected: fold each direction; self-loops never constrain
        acc = np.full(len(hs), BIG, dtype=np.int64)
        for x, y in ((s, d), (d, s)):
            ok = av[x] & av[y] & (x != y)
            np.minimum.at(acc, x[ok], p[y[ok]])
        return _vec_partial(acc, skip=int(BIG))

    for rnd in range(MIS_MAX_ROUNDS + 1):
        if not alive.any():
            break
        if rnd == MIS_MAX_ROUNDS:
            raise RuntimeError("host_mis: exceeded unroll depth")
        a_ref = ray.put(alive)
        parts = edges.map_batches(
            lambda t, ar=a_ref: min_nbr_pri(t, ar), batch_format="pyarrow"
        )
        mn = _vec_fold(parts, n, "min", int(BIG))
        cand = alive & (pri < mn)
        mis_round[cand] = rnd
        # drop candidates and their alive neighbours
        kill = cand.copy()
        for x, y in ((small_s, small_d), (small_d, small_s)):
            sel = cand[x] & (x != y)
            kill[y[sel]] = True
        alive &= ~kill

    return _mis_table(hosts, mis_round)


def _mis_table(hosts: np.ndarray, mis_round: np.ndarray) -> "pa.Table":
    keep = mis_round >= 0
    host = pc.binary_join_element_wise(
        "h", pc.cast(pa.array(hosts[keep]), pa.string()), ".example", ""
    )
    return pa.table({"host": host, "mis_round": pa.array(mis_round[keep])})


def host_mis_sql(rep: int = LG_REP, rounds: int = MIS_MAX_ROUNDS) -> str:
    ctes = [
        f"e0 as materialized ({_edges_sql(rep)})",
        f"thr as (select cast(sum(cnt) as bigint) * {SCC_THR_PCT} "
        "// (count(*) * 100) as t from e0)",
        "e as materialized (select * from e0 "
        "where cnt >= (select t from thr) "
        f"and src_id <> {_HOT_DST} and dst_id <> {_HOT_DST})",
        "edu as materialized (select src_id as v1, dst_id as v2 from e "
        "where src_id <> dst_id "
        "union select dst_id, src_id from e where src_id <> dst_id)",
        "alive0 as (select distinct hid as v from "
        "(select src_id as hid from e union all select dst_id from e))",
    ]
    sels = []
    for k in range(rounds):
        ctes.append(
            f"cand{k} as materialized (select a.v from alive{k} a "
            "where not exists ("
            f"select 1 from edu join alive{k} b on b.v = edu.v2 "
            f"where edu.v1 = a.v and (b.v * {MIS_C}) % {MIS_M} < "
            f"(a.v * {MIS_C}) % {MIS_M}))"
        )
        ctes.append(
            f"alive{k + 1} as materialized (select v from alive{k} where "
            f"v not in (select v from cand{k}) and v not in "
            f"(select edu.v2 from edu join cand{k} c on c.v = edu.v1))"
        )
        sels.append(
            f"select v, cast({k} as bigint) as mis_round from cand{k}"
        )
    return (
        "with " + ", ".join(ctes) + " "
        "select ('h' || cast(v as varchar) || '.example') as host, mis_round "
        "from (" + " union all ".join(sels) + ")"
    )


# --------------------------------------------------------------------------
# Widest (max-bottleneck) paths from the seed host
# --------------------------------------------------------------------------

WP_HOPS = NH          # diameter bound: relaxation is exact at n rounds
_WP_INF = np.int64(1) << np.int64(40)


def host_widest_path(
    sf_dir: str,
    rep: int = LG_REP,
    src: int = SP_SRC,
    hops: int = WP_HOPS,
    small_gate: int = LG_SMALL_EDGES,
) -> "pa.Table":
    """Max-bottleneck path width from the seed host: maximize over
    paths the MINIMUM edge weight (link count) along the path — the
    bandwidth/trust-propagation dual of :func:`host_shortest_path`.
    Unlike hop-weighted costs, the optimum may ride LONG
    high-capacity chains (measured 31 edges on this corpus), so the
    relaxation runs to the true fixpoint: ``hops`` defaults to the
    node count, which provably covers every simple path, and the
    loop exits early at convergence (same broadcast-vector Ray
    shape).  All int64; the oracle unrolls n materialized
    greatest/least CTE rounds.  Seed excluded from the output (its
    width is the INF sentinel)."""
    import ray

    edges = host_edges(sf_dir, rep).materialize()
    width = np.zeros(NH, dtype=np.int64)
    width[src] = _WP_INF

    arrs = _edge_arrays_if_small(edges, small_gate)
    if arrs is not None:
        s, d, c = arrs
        for _ in range(hops):
            cand = np.zeros(NH, dtype=np.int64)
            np.maximum.at(cand, d, np.minimum(width[s], c))
            new = np.maximum(width, cand)
            if (new == width).all():
                break
            width = new
        return _wp_table(width, src)

    def relax(t: pa.Table, w_ref) -> pa.Table:
        wv = ray.get(w_ref)
        s = t["src_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        acc = np.zeros(NH, dtype=np.int64)
        np.maximum.at(acc, d, np.minimum(wv[s], c))
        return _vec_partial(acc)

    for _ in range(hops):
        w_ref = ray.put(width)
        parts = edges.map_batches(
            lambda t, wr=w_ref: relax(t, wr), batch_format="pyarrow"
        )
        cand = _vec_fold(parts, NH, "max", 0)
        new = np.maximum(width, cand)
        if (new == width).all():
            break
        width = new

    return _wp_table(width, src)


def _wp_table(width: np.ndarray, src: int) -> "pa.Table":
    keep = (width > 0) & (np.arange(NH) != src)
    ids = np.nonzero(keep)[0].astype(np.int64)
    host = pc.binary_join_element_wise(
        "h", pc.cast(pa.array(ids), pa.string()), ".example", ""
    )
    return pa.table({"host": host, "width": pa.array(width[keep])})


def host_widest_path_sql(
    rep: int = LG_REP, src: int = SP_SRC, hops: int = WP_HOPS
) -> str:
    ctes = [
        f"e as materialized ({_edges_sql(rep)})",
        f"d0(hid, c) as (values ({src}, cast({1 << 40} as bigint)))",
    ]
    for k in range(hops):
        ctes.append(
            f"d{k + 1} as materialized (select hid, max(c) as c from ("
            f"select hid, c from d{k} "
            "union all "
            f"select e.dst_id as hid, least(d{k}.c, e.cnt) as c "
            f"from d{k} join e on e.src_id = d{k}.hid) group by hid)"
        )
    return (
        "with " + ",\n".join(ctes) + "\n"
        "select ('h' || cast(hid as varchar) || '.example') as host, "
        f"cast(c as bigint) as width from d{hops} where hid <> {src}"
    )


# --------------------------------------------------------------------------
# Maximum spanning backbone (Boruvka over the undirected host graph)
# --------------------------------------------------------------------------

MST_ROUNDS = 6          # ceil(log2 NH): Boruvka halves components per round


def host_backbone(
    sf_dir: str, rep: int = LG_REP, small_gate: int = LG_SMALL_EDGES
) -> "pa.Table":
    """MAXIMUM spanning tree of the undirected weighted host graph —
    the strongest-link crawl backbone (the n-1 edges that connect
    every host with the greatest total link weight; unique because
    the comparison key totally orders edges).  Boruvka: each round
    every component selects its best incident boundary edge (max
    ``key = w * 4096 + min_id * 64 + max_id`` — weight first, then
    the unordered pair as the deterministic tie-break, identical in
    the oracle), selected edges merge components, components at least
    halve, so {MST_ROUNDS} rounds suffice for <= 64 hosts.

    Ray shape (the broadcast-fold law of ``host_bfs``): the
    undirected edge Dataset streams; each round broadcasts the
    component-label vector and every batch returns ONE per-component
    argmax-key partial vector (argmax is a plain ``max`` because the
    key ENCODES the edge); the driver max-folds the few block rows
    and relabels via union-find over the |hosts| array.  Loud int64
    guard: the key packing requires w < 2^40.

    Output: (host_a, host_b, w) — the backbone edges, a < b."""
    import ray

    edges = host_edges(sf_dir, rep).materialize()

    def und_partial(t: pa.Table) -> pa.Table:
        s = t["src_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        a = np.minimum(s[keep], d[keep])
        b = np.maximum(s[keep], d[keep])
        df = pd.DataFrame({"a": a, "b": b, "w": c[keep]})
        g = df.groupby(["a", "b"], as_index=False)["w"].sum()
        return pa.table(
            {
                "a": pa.array(g["a"].to_numpy(np.int64)),
                "b": pa.array(g["b"].to_numpy(np.int64)),
                "w": pa.array(g["w"].to_numpy(np.int64)),
                "bucket": pa.array(
                    (g["a"].to_numpy(np.int64) * NH + g["b"].to_numpy(np.int64)) % 32
                ),
            }
        )

    def und_fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["a", "b"], as_index=False)["w"].sum()

    und = (
        edges.map_batches(und_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(und_fold, batch_format="pandas")
        .materialize()
    )

    small = und.to_pandas()
    hosts = np.unique(np.concatenate([small["a"].values, small["b"].values]))
    n = len(hosts)
    if small["w"].max() >= (1 << 40):
        raise OverflowError("host_backbone: widen the key packing")
    comp = hosts.astype(np.int64).copy()        # label = min member id
    hosts_ref = ray.put(hosts)
    chosen: set[int] = set()

    if len(small) <= small_gate:
        # driver fast path (LG_SMALL_EDGES): Boruvka rounds over the
        # collected undirected fold, same selection arithmetic
        ai = np.searchsorted(hosts, small["a"].values)
        bi = np.searchsorted(hosts, small["b"].values)
        av = small["a"].to_numpy(np.int64)
        bv = small["b"].to_numpy(np.int64)
        key = small["w"].to_numpy(np.int64) * 4096 + av * 64 + bv
        for _ in range(MST_ROUNDS):
            acc = np.full(n, -1, dtype=np.int64)
            bnd = comp[ai] != comp[bi]
            for x in (ai, bi):
                np.maximum.at(acc, x[bnd], key[bnd])
            best: dict[int, int] = {}
            for i in range(n):
                if acc[i] < 0:
                    continue
                lbl = int(comp[i])
                if acc[i] > best.get(lbl, -1):
                    best[lbl] = int(acc[i])
            if not best:
                break
            chosen.update(best.values())
            comp = _mst_relabel(hosts, comp, chosen)
        return _mst_table(chosen)

    def best_boundary(t: pa.Table, c_ref) -> pa.Table:
        hs = ray.get(hosts_ref)
        cv = ray.get(c_ref)
        a = np.searchsorted(hs, t["a"].to_numpy(zero_copy_only=False))
        b = np.searchsorted(hs, t["b"].to_numpy(zero_copy_only=False))
        av = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        bv = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = w * 4096 + av * 64 + bv
        acc = np.full(len(hs), -1, dtype=np.int64)
        bnd = cv[a] != cv[b]
        for x in (a, b):
            sel = bnd
            np.maximum.at(acc, x[sel], key[sel])
        return _vec_partial(acc, skip=-1)

    for _ in range(MST_ROUNDS):
        c_ref = ray.put(comp)
        parts = und.map_batches(
            lambda t, cr=c_ref: best_boundary(t, cr), batch_format="pyarrow"
        )
        acc = _vec_fold(parts, n, "max", -1)
        # per-COMPONENT best = max over its members' per-node partials
        best: dict[int, int] = {}
        for i in range(n):
            if acc[i] < 0:
                continue
            lbl = int(comp[i])
            if acc[i] > best.get(lbl, -1):
                best[lbl] = int(acc[i])
        if not best:
            break
        chosen.update(best.values())
        comp = _mst_relabel(hosts, comp, chosen)

    return _mst_table(chosen)


def _mst_relabel(hosts: np.ndarray, comp: np.ndarray, chosen: set) -> np.ndarray:
    """Union-find relabel: component label = min member id after
    merging along the chosen edges."""
    parent = {int(h): int(c) for h, c in zip(hosts, comp)}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for k in chosen:
        u, v = (k % 4096) // 64, k % 64
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            lo, hi = min(ru, rv), max(ru, rv)
            parent[hi] = lo
    return np.array([find(int(h)) for h in hosts], dtype=np.int64)


def _mst_table(chosen: set) -> "pa.Table":
    keys = np.array(sorted(chosen), dtype=np.int64)
    a = (keys % 4096) // 64
    b = keys % 64
    return pa.table(
        {
            "host_a": pc.binary_join_element_wise(
                "h", pc.cast(pa.array(a), pa.string()), ".example", ""
            ),
            "host_b": pc.binary_join_element_wise(
                "h", pc.cast(pa.array(b), pa.string()), ".example", ""
            ),
            "w": pa.array(keys // 4096),
        }
    )


def host_backbone_sql(rep: int = LG_REP, rounds: int = MST_ROUNDS) -> str:
    ctes = [
        f"e as materialized ({_edges_sql(rep)})",
        "und as materialized (select least(src_id, dst_id) as a, "
        "greatest(src_id, dst_id) as b, cast(sum(cnt) as bigint) as w "
        "from e where src_id <> dst_id group by 1, 2)",
        "ed2 as materialized (select a as x, b as y, w * 4096 + a * 64 + b as key "
        "from und union all select b, a, w * 4096 + a * 64 + b from und)",
        "nodes as materialized (select distinct x as v from ed2)",
        "comp0 as materialized (select v, v as l from nodes)",
        "accm1(key) as (select cast(null as bigint) where false)",
    ]
    for k in range(rounds):
        prev_acc = f"acc{k - 1}" if k > 0 else "accm1"
        ctes.append(
            f"bnd{k} as materialized (select c1.l as ca, ed2.key from ed2 "
            f"join comp{k} c1 on c1.v = ed2.x "
            f"join comp{k} c2 on c2.v = ed2.y where c1.l <> c2.l)"
        )
        # explicit distinct: a bare UNION inside a materialized CTE
        # under WITH RECURSIVE skips dedup in DuckDB (observed), so
        # spell the dedup out
        ctes.append(
            f"acc{k} as materialized (select distinct key from ("
            f"select key from {prev_acc} union all "
            f"select max(key) as key from bnd{k} group by ca))"
        )
        ctes.append(
            f"sed{k} as materialized (select (key % 4096) // 64 as v1, "
            f"key % 64 as v2 from acc{k} "
            f"union all select key % 64, (key % 4096) // 64 from acc{k})"
        )
        ctes.append(
            f"r{k}(v, l) as (select v, v from nodes union "
            f"select s.v2, r.l from r{k} r join sed{k} s on s.v1 = r.v)"
        )
        ctes.append(
            f"comp{k + 1} as materialized (select v, min(l) as l "
            f"from r{k} group by v)"
        )
    return (
        "with recursive " + ", ".join(ctes) + " "
        "select ('h' || cast((key % 4096) // 64 as varchar) || '.example') as host_a, "
        "('h' || cast(key % 64 as varchar) || '.example') as host_b, "
        f"cast(key // 4096 as bigint) as w from acc{rounds - 1}"
    )


# --------------------------------------------------------------------------
# Stress centrality: integer shortest-path counts through each host
# --------------------------------------------------------------------------

STRESS_MAX_DEPTH = 8


def host_stress(sf_dir: str, rep: int = LG_REP) -> "pa.Table":
    """Stress centrality (Shimbel 1953): for every host v, the NUMBER
    of shortest s->t paths passing through v as an interior node —
    the all-integer sibling of betweenness (betweenness divides by
    sigma_st and leaves rationals; stress keeps the raw path counts,
    so engine and oracle match bit-for-bit).  Built from the
    Brandes-style level decomposition: path counts
    ``sigma[s][v] = sum over frontier edges of sigma[s][u]`` advance
    one BFS level per round over the all-pairs distance matrix of
    :func:`_host_closure`, then
    ``stress(v) = sum_{s != v != t, s != t} sigma_s(v) * sigma_v(t)``
    over triples with ``d(s,v) + d(v,t) = d(s,t)``.

    Rounds are bounded by the graph diameter and asserted <=
    {STRESS_MAX_DEPTH} (the oracle's unroll depth); overflow is
    guarded loudly (counts multiply along levels).  Ray shape: the
    distance matrix comes from the bit-parallel closure (broadcast
    OR-folds); the sigma rounds ride the same collected |hosts|^2
    fold (LG_SMALL_EDGES gate) — past the gate each level is one
    bucketed join of the sigma table against the edge list keyed by
    the frontier node, the exact shape of the `textrank` iteration.

    Output: (host, stress) for hosts on >= 1 interior shortest path."""
    hosts, dmat, _ = _host_closure(sf_dir, rep)
    n = len(hosts)
    small = (
        host_edges(sf_dir, rep)
        .to_pandas()[["src_id", "dst_id"]]
        .drop_duplicates()
    )
    u = np.searchsorted(hosts, small["src_id"].values)
    v = np.searchsorted(hosts, small["dst_id"].values)

    INF = np.int64(1) << np.int64(40)
    finite = dmat[dmat < INF]
    K = int(finite.max()) if len(finite) else 0
    if K > STRESS_MAX_DEPTH:
        raise RuntimeError("host_stress: diameter exceeds the oracle unroll")

    sig = np.zeros((n, n), dtype=np.int64)
    np.fill_diagonal(sig, 1)
    for k in range(1, K + 1):
        contrib = np.zeros((n, n), dtype=np.int64)
        for e in range(len(u)):
            sel = (dmat[:, u[e]] == k - 1) & (dmat[:, v[e]] == k)
            contrib[sel, v[e]] += sig[sel, u[e]]
        sig += contrib

    ms = int(sig.max())
    if ms and ms * ms > (1 << 62) // (n * n):
        raise OverflowError("host_stress: sigma product exceeds int64")

    stress = np.zeros(n, dtype=np.int64)
    for w in range(n):
        cond = (dmat[:, w][:, None] + dmat[w, :][None, :]) == dmat
        cond[w, :] = False
        cond[:, w] = False
        np.fill_diagonal(cond, False)
        stress[w] = int(
            (cond * (sig[:, w][:, None] * sig[w, :][None, :])).sum()
        )

    keep = stress > 0
    host = pc.binary_join_element_wise(
        "h", pc.cast(pa.array(hosts[keep]), pa.string()), ".example", ""
    )
    return pa.table({"host": host, "stress": pa.array(stress[keep])})


def host_stress_sql(rep: int = LG_REP, depth: int = STRESS_MAX_DEPTH) -> str:
    ctes = [
        f"e as materialized ({_edges_sql(rep)})",
        "ed as materialized (select distinct src_id, dst_id from e)",
        "hosts as (select distinct hid from "
        "(select src_id as hid from ed union all select dst_id from ed))",
        "ap(s, v, d) as ("
        "select hid, hid, cast(0 as bigint) from hosts "
        "union "
        f"select ap.s, ed.dst_id, ap.d + 1 from ap join ed on ed.src_id = ap.v "
        f"where ap.d < {NH})",
        "md as materialized (select s, v, min(d) as d from ap group by s, v)",
        "sig0 as (select hid as s, hid as v, cast(0 as bigint) as d, "
        "cast(1 as bigint) as c from hosts)",
    ]
    for k in range(1, depth + 1):
        ctes.append(
            f"sig{k} as materialized (select g.s, ed.dst_id as v, "
            f"cast({k} as bigint) as d, cast(sum(g.c) as bigint) as c "
            f"from sig{k - 1} g join ed on ed.src_id = g.v "
            f"join md on md.s = g.s and md.v = ed.dst_id and md.d = {k} "
            "group by g.s, ed.dst_id)"
        )
    sig_union = " union all ".join(f"select * from sig{k}" for k in range(depth + 1))
    ctes.append(f"sig as materialized ({sig_union})")
    return (
        "with recursive " + ", ".join(ctes) + " "
        "select ('h' || cast(sv.v as varchar) || '.example') as host, "
        "cast(sum(sv.c * vt.c) as bigint) as stress "
        "from sig sv join sig vt on vt.s = sv.v "
        "join md on md.s = sv.s and md.v = vt.v "
        "where sv.s <> sv.v and vt.v <> sv.v and sv.s <> vt.v "
        "and sv.d + vt.d = md.d "
        "group by sv.v"
    )


# --------------------------------------------------------------------------
# Temporal reachability: earliest arrival over time-respecting paths
# --------------------------------------------------------------------------

TR_SEED = 0
TR_ROUNDS = 8


def host_temporal_reach(
    sf_dir: str, rep: int = LG_REP, seed: int = TR_SEED, rounds: int = TR_ROUNDS
) -> "pa.Table":
    """Earliest-arrival TEMPORAL reachability from the seed host: a
    link is an instantaneous contact (src -> dst at the page's crawl
    second, ``ts = page_id``), and a host is reached at time t if
    some time-RESPECTING path (nondecreasing timestamps) arrives by t
    — the information-diffusion question static reachability gets
    wrong (an early link cannot carry influence that arrives later).
    Exactly ``rounds`` relaxation passes (early exit at fixpoint):
    the result is BY CONSTRUCTION earliest arrival over <= ``rounds``
    -edge temporal paths, the identical bounded quantity the
    unrolled-CTE oracle computes (the ``host_shortest_path``
    discipline).

    Unlike the folded-edge ops, each round streams the PAGE-SCALE
    link table (the contact stream cannot pre-aggregate: which
    contacts are usable depends on the current arrival vector), so
    the rounds are honest distributed passes: broadcast |hosts|
    arrival vector, per-batch vectorized ``ts >= arr[src]`` masked
    min-fold, one |hosts| partial row per block.

    Output: (host, arrival) for temporally reached hosts; the seed
    arrives at 0."""
    import ray

    links = link_extract(sf_dir, rep).materialize()
    BIG = np.int64(1) << np.int64(62)
    arr = np.full(NH, BIG, dtype=np.int64)
    arr[seed] = 0

    def relax(t: pa.Table, a_ref) -> pa.Table:
        av = ray.get(a_ref)
        pid = t["page_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = pid % NH
        ex = pc.extract_regex(t["dst_host"], r"^h(?P<g>\d+)\.")
        if isinstance(ex, pa.ChunkedArray):
            ex = ex.combine_chunks()
        dst = pc.cast(ex.field("g"), pa.int64()).to_numpy(zero_copy_only=False)
        ts = pid
        ok = ts >= av[src]
        acc = np.full(NH, BIG, dtype=np.int64)
        np.minimum.at(acc, dst[ok], ts[ok])
        return _vec_partial(acc, skip=int(BIG))

    for _ in range(rounds):
        a_ref = ray.put(arr)
        parts = links.map_batches(
            lambda t, ar=a_ref: relax(t, ar), batch_format="pyarrow"
        )
        cand = _vec_fold(parts, NH, "min", int(BIG))
        new = np.minimum(arr, cand)
        if (new == arr).all():
            break
        arr = new

    keep = arr < BIG
    ids = np.nonzero(keep)[0].astype(np.int64)
    host = pc.binary_join_element_wise(
        "h", pc.cast(pa.array(ids), pa.string()), ".example", ""
    )
    return pa.table({"host": host, "arrival": pa.array(arr[keep])})


def host_temporal_reach_sql(
    rep: int = LG_REP, seed: int = TR_SEED, rounds: int = TR_ROUNDS
) -> str:
    ctes = [
        f"lx as materialized (select page_id as ts, page_id % {NH} as src, "
        "cast(regexp_extract(dst_host, '^h(\\d+)\\.', 1) as bigint) as dst "
        f"from ({link_extract_sql(rep)}))",
        f"a0(hid, t) as (values ({seed}, cast(0 as bigint)))",
    ]
    for k in range(rounds):
        ctes.append(
            f"a{k + 1} as materialized (select hid, min(t) as t from ("
            f"select hid, t from a{k} "
            "union all "
            f"select lx.dst as hid, lx.ts as t from a{k} "
            f"join lx on lx.src = a{k}.hid and lx.ts >= a{k}.t) group by hid)"
        )
    return (
        "with " + ",\n".join(ctes) + "\n"
        "select ('h' || cast(hid as varchar) || '.example') as host, "
        f"cast(t as bigint) as arrival from a{rounds}"
    )


# --------------------------------------------------------------------------
# Coreness decomposition (full core number per host)
# --------------------------------------------------------------------------


def host_coreness(
    sf_dir: str, rep: int = LG_REP, small_gate: int = LG_SMALL_EDGES
) -> "pa.Table":
    """FULL k-core decomposition of the undirected strong-edge host
    graph (hub removed, the `host_mis` preprocessing): every host's
    core number = the largest k such that it survives iterated
    deletion of degree-<k nodes — the density stratification in one
    number per node (`kcore` gives membership at one fixed k; this is
    the whole profile).  Peeling is deterministic (simultaneous
    deletion per round), so the result is a pure function of the
    graph.

    Batch peeling: rounds at level k delete ALL current degree-<k
    nodes at once (matula-beck order-independence: core numbers do
    not depend on deletion order), so the round count is bounded by
    the degeneracy, not the node count.  Driver fast path under the
    LG_SMALL_EDGES gate (the collected |hosts|^2 fold); past the
    gate each round is one degree bucket-fold + alive semi-join, the
    `kcore` distributed shape, run per level.

    Rows-only driver entry (coreness has no bounded-unroll SQL form
    — the peel depth per level is data-dependent); exactness is
    pytest-gated against an independent brute peeling."""
    import ray

    edges = host_edges(sf_dir, rep).materialize()
    n_edges = edges.count()

    if n_edges <= small_gate:
        small = edges.to_pandas()
        thr = int(small["cnt"].sum()) * SCC_THR_PCT // (n_edges * 100)
        small = small[
            (small["cnt"] >= thr)
            & (small["src_id"] != _HOT_DST)
            & (small["dst_id"] != _HOT_DST)
            & (small["src_id"] != small["dst_id"])
        ]
        a = small[["src_id", "dst_id"]].min(axis=1).to_numpy(np.int64)
        b = small[["src_id", "dst_id"]].max(axis=1).to_numpy(np.int64)
        und = np.unique(a * NH + b)
        ua, ub = und // NH, und % NH
        hosts = np.unique(np.concatenate([ua, ub]))
        idx = {int(h): i for i, h in enumerate(hosts)}
        n = len(hosts)
        ai = np.array([idx[int(x)] for x in ua], dtype=np.int64)
        bi = np.array([idx[int(x)] for x in ub], dtype=np.int64)

        alive_e = np.ones(len(ai), dtype=bool)
        alive_n = np.ones(n, dtype=bool)
        core = np.zeros(n, dtype=np.int64)
        k = 1
        while alive_n.any():
            deg = np.bincount(ai[alive_e], minlength=n) + np.bincount(
                bi[alive_e], minlength=n
            )
            peel = alive_n & (deg < k)
            if not peel.any():
                core[alive_n] = np.maximum(core[alive_n], k)
                k += 1
                continue
            alive_n &= ~peel
            alive_e &= alive_n[ai] & alive_n[bi]
        return _coreness_table(hosts, core)

    # distributed peel per level: the edge table never collects.  One
    # bucketed fold dedupes the undirected strong edges; each peel
    # round broadcasts the alive mask and folds sparse per-block
    # degree partials (the pagerank_hosts law) — round count bounded
    # by degeneracy + peel waves, per-round cost one streamed pass.
    tot = _vec_fold(
        edges.map_batches(
            lambda t: pa.table(
                {
                    "i": pa.array([0], pa.int64()),
                    "val": pa.array(
                        [
                            int(
                                np.sum(
                                    t["cnt"].to_numpy(zero_copy_only=False),
                                    dtype=np.int64,
                                )
                            )
                        ]
                    ),
                }
            ),
            batch_format="pyarrow",
        ),
        1,
    )[0]
    thr = int(tot) * SCC_THR_PCT // (n_edges * 100)

    def und_tag(t: pa.Table, v=thr) -> pa.Table:
        s = t["src_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (c >= v) & (s != _HOT_DST) & (d != _HOT_DST) & (s != d)
        a = np.minimum(s[keep], d[keep])
        b = np.maximum(s[keep], d[keep])
        return pa.table(
            {
                "a": pa.array(a),
                "b": pa.array(b),
                "bucket": pa.array((a * 31 + b) % 64),
            }
        )

    def und_dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df[["a", "b"]].drop_duplicates()

    und = (
        edges.map_batches(und_tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(und_dedup, batch_format="pandas")
        .materialize()
    )

    def node_partial(t: pa.Table) -> pa.Table:
        nodes = np.unique(
            np.concatenate(
                [
                    t["a"].to_numpy(zero_copy_only=False),
                    t["b"].to_numpy(zero_copy_only=False),
                ]
            )
        ).astype(np.int64)
        return pa.table(
            {"i": pa.array(nodes), "val": pa.array(np.ones(len(nodes), np.int64))}
        )

    seen = _vec_fold(und.map_batches(node_partial, batch_format="pyarrow"), NH)
    hosts = np.flatnonzero(seen > 0).astype(np.int64)
    n = len(hosts)
    hosts_ref = ray.put(hosts)

    alive_n = np.ones(n, dtype=bool)
    core = np.zeros(n, dtype=np.int64)
    k = 1
    while alive_n.any():
        a_ref = ray.put(alive_n)

        def deg_partial(t: pa.Table, ar=a_ref) -> pa.Table:
            hs = ray.get(hosts_ref)
            av = ray.get(ar)
            ai = np.searchsorted(hs, t["a"].to_numpy(zero_copy_only=False))
            bi = np.searchsorted(hs, t["b"].to_numpy(zero_copy_only=False))
            ok = av[ai] & av[bi]
            acc = np.zeros(len(hs), dtype=np.int64)
            np.add.at(acc, ai[ok], 1)
            np.add.at(acc, bi[ok], 1)
            return _vec_partial(acc)

        deg = _vec_fold(und.map_batches(deg_partial, batch_format="pyarrow"), n)
        peel = alive_n & (deg < k)
        if not peel.any():
            core[alive_n] = np.maximum(core[alive_n], k)
            k += 1
            continue
        alive_n &= ~peel
    return _coreness_table(hosts, core)


def _coreness_table(hosts: np.ndarray, core: np.ndarray) -> "pa.Table":
    host = pc.binary_join_element_wise(
        "h", pc.cast(pa.array(hosts), pa.string()), ".example", ""
    )
    return pa.table({"host": host, "coreness": pa.array(core)})


# --------------------------------------------------------------------------
# Neighborhood feature aggregation (GNN feature-prep primitive)
# --------------------------------------------------------------------------


def host_neighborhood_agg(sf_dir: str, rep: int = LG_REP) -> "pa.Table":
    """GraphSAGE-style neighbourhood feature aggregation: for every
    host, its own page features (n_pages, sum n_chars) plus the
    link-weighted 1-hop and 2-hop IN-neighbourhood aggregates
    ``w1_chars(h) = sum_u cnt(u,h) * sum_chars(u)`` and
    ``w2_chars(h) = sum_u cnt(u,h) * w1_chars(u)`` — the message-
    passing feature table a graph model trains on, all int64 (loud
    overflow guard: the 2-hop product grows with corpus chars; past
    the guard rescale the feature, do not let numpy wrap).

    Ray shape: page features fold per batch into |hosts|-length
    partial vectors (one row per block, the kmeans-partial law — the
    page stream never shuffles); the two hop aggregations run on the
    |hosts|^2-bounded weighted edge fold."""
    import ray

    ds = pages_dataset(sf_dir, rep=rep, columns=["page_id", "n_chars"])

    def feat_partial(t: pa.Table) -> pa.Table:
        pid = t["page_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = pid % NH
        npg = np.bincount(h, minlength=NH).astype(np.int64)
        sc = np.bincount(h, weights=nc, minlength=NH).astype(np.int64)
        return pa.table(
            {
                "h": pa.array(np.arange(NH, dtype=np.int64)),
                "n_pages": pa.array(npg),
                "sum_chars": pa.array(sc),
            }
        )

    parts = ds.map_batches(feat_partial, batch_format="pyarrow")
    n_pages = np.zeros(NH, dtype=np.int64)
    sum_chars = np.zeros(NH, dtype=np.int64)
    for bt in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        if bt.num_rows:
            hh = bt["h"].to_numpy(zero_copy_only=False)
            np.add.at(n_pages, hh, bt["n_pages"].to_numpy(zero_copy_only=False))
            np.add.at(
                sum_chars, hh, bt["sum_chars"].to_numpy(zero_copy_only=False)
            )

    small = host_edges(sf_dir, rep).to_pandas()
    s = small["src_id"].to_numpy(np.int64)
    d = small["dst_id"].to_numpy(np.int64)
    c = small["cnt"].to_numpy(np.int64)

    if int(c.max()) * int(sum_chars.max()) * NH > (1 << 61):
        raise OverflowError("host_neighborhood_agg: rescale the 2-hop feature")

    w1_cnt = np.zeros(NH, dtype=np.int64)
    w1_chars = np.zeros(NH, dtype=np.int64)
    np.add.at(w1_cnt, d, c)
    np.add.at(w1_chars, d, c * sum_chars[s])
    if int(c.max()) * int(w1_chars.max()) * NH > (1 << 61):
        raise OverflowError("host_neighborhood_agg: rescale the 2-hop feature")
    w2_chars = np.zeros(NH, dtype=np.int64)
    np.add.at(w2_chars, d, c * w1_chars[s])

    ids = np.arange(NH, dtype=np.int64)
    host = pc.binary_join_element_wise(
        "h", pc.cast(pa.array(ids), pa.string()), ".example", ""
    )
    return pa.table(
        {
            "host": host,
            "n_pages": pa.array(n_pages),
            "sum_chars": pa.array(sum_chars),
            "w1_cnt": pa.array(w1_cnt),
            "w1_chars": pa.array(w1_chars),
            "w2_chars": pa.array(w2_chars),
        }
    )


def host_neighborhood_agg_sql(rep: int = LG_REP) -> str:
    return (
        f"with e as materialized ({_edges_sql(rep)}), "
        f"p as (select page_id % {NH} as h, n_chars from ({pages_cte(rep)})), "
        f"ids as (select unnest(range({NH})) as h), "
        "f as (select ids.h, cast(coalesce(count(p.h), 0) as bigint) as n_pages, "
        "cast(coalesce(sum(p.n_chars), 0) as bigint) as sum_chars "
        "from ids left join p on p.h = ids.h group by ids.h), "
        "w1 as (select ids.h, "
        "cast(coalesce(sum(e.cnt), 0) as bigint) as w1_cnt, "
        "cast(coalesce(sum(e.cnt * fs.sum_chars), 0) as bigint) as w1_chars "
        "from ids left join e on e.dst_id = ids.h "
        "left join f fs on fs.h = e.src_id group by ids.h), "
        "w2 as (select ids.h, "
        "cast(coalesce(sum(e.cnt * ws.w1_chars), 0) as bigint) as w2_chars "
        "from ids left join e on e.dst_id = ids.h "
        "left join w1 ws on ws.h = e.src_id group by ids.h) "
        "select ('h' || cast(f.h as varchar) || '.example') as host, "
        "f.n_pages, f.sum_chars, w1.w1_cnt, w1.w1_chars, w2.w2_chars "
        "from f join w1 on w1.h = f.h join w2 on w2.h = f.h"
    )


# --------------------------------------------------------------------------
# Katz centrality: attenuated bounded-length walk counts
# --------------------------------------------------------------------------

KATZ_DEPTH = 6
KATZ_SCALE = 10**6
KATZ_ATT = 4            # attenuation 1/4 per hop (spectral-radius-safe)


def host_katz(
    sf_dir: str,
    rep: int = LG_REP,
    depth: int = KATZ_DEPTH,
    small_gate: int = LG_SMALL_EDGES,
) -> "pa.Table":
    """Katz centrality over the distinct directed host graph,
    truncated at walk length ``depth`` and kept integer-exact:
    ``katz_e6(v) = sum_{k=1..depth} W_k(v) * 1e6 // 4^k`` where
    ``W_k(v)`` counts length-k walks ENDING at v (``W_k(v) = sum over
    edges (u,v) of W_{k-1}(u)``, ``W_0 = 1``).  The 1/4 attenuation
    dominates the graph's branching well enough that the truncated
    sum is the standard Katz ranking; per-term integer floor division
    is applied IDENTICALLY in the unrolled-CTE oracle, so the result
    is hash-exact.  Loud int64 guard on the walk-count growth (counts
    multiply by in-degree per level; numpy would wrap silently).

    Same execution law as the other host-graph rounds: driver fast
    path on the collected |hosts|^2-bounded distinct edge fold under
    ``LG_SMALL_EDGES``; past the gate each level is one bucketed fold
    keyed by dst (the `textrank` iteration shape).

    Output: (host, katz_e6)."""
    import ray

    edges = host_edges(sf_dir, rep).materialize()
    arrs = _edge_arrays_if_small(edges, max(small_gate, 1))

    w = np.ones(NH, dtype=np.int64)          # W_0
    katz = np.zeros(NH, dtype=np.int64)
    if arrs is not None:
        s, d, _ = arrs
        pairs = np.unique(s * NH + d)
        u, v = pairs // NH, pairs % NH
        for k in range(1, depth + 1):
            if int(w.max()) > (1 << 62) // max(NH, 1):
                raise OverflowError("host_katz: walk counts exceed int64")
            nxt = np.zeros(NH, dtype=np.int64)
            np.add.at(nxt, v, w[u])
            w = nxt
            katz += w * KATZ_SCALE // (KATZ_ATT**k)
    else:
        # distributed level folds (the pagerank_hosts law): the edge
        # Dataset never collects; each level broadcasts the |hosts|
        # walk-count vector and folds sparse per-block partials.
        # host_edges emits ONE row per (src, dst), so per-batch adds
        # never double-count a pair.
        def level(t: pa.Table, wr) -> pa.Table:
            wv = ray.get(wr)
            s = t["src_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t["dst_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            acc = np.zeros(NH, dtype=np.int64)
            np.add.at(acc, d, wv[s])
            return _vec_partial(acc)

        for k in range(1, depth + 1):
            if int(w.max()) > (1 << 62) // max(NH, 1):
                raise OverflowError("host_katz: walk counts exceed int64")
            w_ref = ray.put(w)
            parts = edges.map_batches(
                lambda t, wr=w_ref: level(t, wr), batch_format="pyarrow"
            )
            w = _vec_fold(parts, NH)
            katz += w * KATZ_SCALE // (KATZ_ATT**k)

    keep = katz > 0
    ids = np.nonzero(keep)[0].astype(np.int64)
    host = pc.binary_join_element_wise(
        "h", pc.cast(pa.array(ids), pa.string()), ".example", ""
    )
    return pa.table({"host": host, "katz_e6": pa.array(katz[keep])})


def host_katz_sql(rep: int = LG_REP, depth: int = KATZ_DEPTH) -> str:
    ctes = [
        f"e as materialized ({_edges_sql(rep)})",
        "ed as materialized (select distinct src_id, dst_id from e)",
        "hosts as (select distinct hid from "
        "(select src_id as hid from ed union all select dst_id from ed))",
        "w0 as (select hid as v, cast(1 as bigint) as c from hosts)",
    ]
    terms = []
    for k in range(1, depth + 1):
        ctes.append(
            f"w{k} as materialized (select ed.dst_id as v, "
            f"cast(sum(w{k - 1}.c) as bigint) as c "
            f"from w{k - 1} join ed on ed.src_id = w{k - 1}.v group by ed.dst_id)"
        )
        terms.append(
            f"select v, c * {KATZ_SCALE} // {KATZ_ATT**k} as t from w{k}"
        )
    return (
        "with " + ", ".join(ctes) + " "
        "select ('h' || cast(v as varchar) || '.example') as host, "
        "cast(sum(t) as bigint) as katz_e6 from ("
        + " union all ".join(terms)
        + ") group by v having sum(t) > 0"
    )


# --------------------------------------------------------------------------
# Hop plot: distribution of pairwise hop distances
# --------------------------------------------------------------------------


def host_hopplot(sf_dir: str, rep: int = LG_REP) -> "pa.Table":
    """The hop plot (Faloutsos et al. 1999): for each hop count d,
    how many ordered host pairs (s, v), s != v, are at shortest
    distance exactly d — the connectivity fingerprint whose knee is
    the effective diameter.  Derived from the same bit-parallel
    all-pairs closure as :func:`host_closeness` (one bincount over
    the distance matrix); the oracle groups the recursive min-hop
    CTE.  Also emits each level's cumulative pair count so the
    effective-diameter read-off (smallest d covering >= 90% of
    reachable pairs) is a one-row filter for the caller.

    Output: (d, n_pairs, cum_pairs)."""
    hosts, dmat, _ = _host_closure(sf_dir, rep)
    n = len(hosts)
    INF = np.int64(1) << np.int64(40)
    off = dmat.copy()
    np.fill_diagonal(off, INF)
    dvals = off[off < INF]
    counts = np.bincount(dvals.astype(np.int64))
    ds_ = np.nonzero(counts)[0].astype(np.int64)
    np_ = counts[ds_].astype(np.int64)
    return pa.table(
        {
            "d": pa.array(ds_),
            "n_pairs": pa.array(np_),
            "cum_pairs": pa.array(np.cumsum(np_)),
        }
    )


def host_hopplot_sql(rep: int = LG_REP) -> str:
    return (
        f"with recursive e as ({_edges_sql(rep)}), "
        "ed as (select distinct src_id, dst_id from e), "
        "hosts as (select distinct hid from "
        "(select src_id as hid from ed union all select dst_id from ed)), "
        "ap(s, v, d) as ("
        "select hid, hid, cast(0 as bigint) from hosts "
        "union "
        f"select ap.s, ed.dst_id, ap.d + 1 from ap join ed on ed.src_id = ap.v "
        f"where ap.d < {NH}), "
        "md as (select s, v, min(d) as d from ap group by s, v), "
        "hp as (select d, cast(count(*) as bigint) as n_pairs from md "
        "where s <> v group by d) "
        "select d, n_pairs, "
        "cast(sum(n_pairs) over (order by d) as bigint) as cum_pairs "
        "from hp"
    )


# --------------------------------------------------------------------------
# SimRank: link-based pair similarity (integer fixed point)
# --------------------------------------------------------------------------

SIMRANK_ITERS = 3
SIMRANK_SCALE = 10**6   # C = 0.8 applied as *4 // 5


def host_simrank(sf_dir: str, rep: int = LG_REP) -> "pa.Table":
    """SimRank (Jeh & Widom 2002) over the distinct directed host
    graph: two hosts are similar when their IN-neighbourhoods are
    similar — ``s'(a,b) = 0.8 * mean over (u in I(a), v in I(b)) of
    s(u,v)``, seeded by the identity.  Integer fixed point:
    ``s' = (4 * SUM) // (5 * |I(a)| * |I(b)|)`` at scale 1e6 with the
    division floor applied IDENTICALLY in the unrolled-CTE oracle, so
    every iterate matches bit-for-bit.  {SIMRANK_ITERS} iterations
    (SimRank converges geometrically; 3 ranks the test graph).

    Execution: each iterate is ``P^T S P`` over the |hosts|^2-bounded
    matrices (two int64 matmuls on the driver — the LG_SMALL_EDGES
    regime; at |hosts| past the gate each iterate is the bucketed
    edge-pair join the oracle spells out, quadratic in in-degree by
    SimRank's definition).  Output: (host_a, host_b, simrank_e6) for
    a < b with a nonzero score."""
    edges = host_edges(sf_dir, rep).materialize()
    small = edges.to_pandas()[["src_id", "dst_id"]].drop_duplicates()
    hosts = np.unique(
        np.concatenate([small["src_id"].values, small["dst_id"].values])
    )
    n = len(hosts)
    u = np.searchsorted(hosts, small["src_id"].values)
    v = np.searchsorted(hosts, small["dst_id"].values)
    P = np.zeros((n, n), dtype=np.int64)   # P[u, a] = 1 iff u -> a
    P[u, v] = 1
    indeg = P.sum(axis=0)

    if int(indeg.max()) ** 2 > (1 << 61) // max(SIMRANK_SCALE * n, 1):
        raise OverflowError("host_simrank: rescale the pair sum")

    S = np.zeros((n, n), dtype=np.int64)
    np.fill_diagonal(S, SIMRANK_SCALE)
    denom = 5 * np.outer(indeg, indeg)
    ok = denom > 0
    for _ in range(SIMRANK_ITERS):
        SUM = P.T @ S @ P
        new = np.zeros_like(S)
        new[ok] = 4 * SUM[ok] // denom[ok]
        np.fill_diagonal(new, SIMRANK_SCALE)
        S = new

    a_i, b_i = np.nonzero(np.triu(S, k=1) > 0)
    return pa.table(
        {
            "host_a": pc.binary_join_element_wise(
                "h", pc.cast(pa.array(hosts[a_i]), pa.string()), ".example", ""
            ),
            "host_b": pc.binary_join_element_wise(
                "h", pc.cast(pa.array(hosts[b_i]), pa.string()), ".example", ""
            ),
            "simrank_e6": pa.array(S[a_i, b_i]),
        }
    )


def host_simrank_sql(rep: int = LG_REP, iters: int = SIMRANK_ITERS) -> str:
    ctes = [
        f"e as materialized ({_edges_sql(rep)})",
        "ed as materialized (select distinct src_id, dst_id from e)",
        "hosts as (select distinct hid from "
        "(select src_id as hid from ed union all select dst_id from ed))",
        "indeg as materialized (select dst_id as hid, "
        "cast(count(*) as bigint) as deg from ed group by dst_id)",
        f"s0 as (select hid as a, hid as b, cast({SIMRANK_SCALE} as bigint) "
        "as val from hosts)",
    ]
    for k in range(iters):
        ctes.append(
            f"t{k + 1} as materialized (select e1.dst_id as a, e2.dst_id as b, "
            "cast(4 * sum(s.val) // (5 * d1.deg * d2.deg) as bigint) as val "
            f"from s{k} s "
            "join ed e1 on e1.src_id = s.a "
            "join ed e2 on e2.src_id = s.b "
            "join indeg d1 on d1.hid = e1.dst_id "
            "join indeg d2 on d2.hid = e2.dst_id "
            "where e1.dst_id <> e2.dst_id "
            "group by e1.dst_id, e2.dst_id, d1.deg, d2.deg)"
        )
        ctes.append(
            f"s{k + 1} as materialized (select a, b, val from t{k + 1} "
            f"union all select hid, hid, cast({SIMRANK_SCALE} as bigint) "
            "from hosts)"
        )
    return (
        "with " + ", ".join(ctes) + " "
        "select ('h' || cast(a as varchar) || '.example') as host_a, "
        "('h' || cast(b as varchar) || '.example') as host_b, "
        f"val as simrank_e6 from s{iters} where a < b and val > 0"
    )


# --------------------------------------------------------------------------
# Modularity of the LPA communities
# --------------------------------------------------------------------------


def lpa_modularity(
    sf_dir: str, rep: int = LG_REP, iters: int = LPA_ITERS
) -> "pa.Table":
    """Newman modularity terms of the :func:`lpa_communities`
    partition — the quality audit for the community detector: per
    community c, the intra weight ``w_in = sum A_ij (i,j in c, both
    orientations)``, the degree mass ``tot = sum_i-in-c k_i``, and
    the integer e6 modularity term ``q_e6 = sign(t) * (|t| * 1e6 //
    (2m)^2)`` with ``t = w_in * 2m - tot^2`` (sign extracted BEFORE
    the floor division — numpy floors, DuckDB truncates, the
    events_retention lesson); ``Q = sum(q_e6) / 1e6``.

    Labels come from the same deterministic synchronous propagation
    the communities oracle unrolls, so the whole computation is a
    pure function of the graph.  The aggregation runs on the
    |hosts|^2-bounded undirected fold (hub removed, as in LPA).

    Output: (community, w_in, tot_w, q_e6)."""
    lab = lpa_communities(sf_dir, rep, iters).to_pandas()
    hid = lab["host"].str.extract(r"^h(\d+)\.")[0].astype("int64").to_numpy()
    com = lab["community"].to_numpy(np.int64)
    lbl_of = dict(zip(hid.tolist(), com.tolist()))

    small = host_edges(sf_dir, rep).to_pandas()
    small = small[
        (small["src_id"] != _HOT_DST) & (small["dst_id"] != _HOT_DST)
    ]
    a = np.concatenate([small["src_id"].values, small["dst_id"].values]).astype(
        np.int64
    )
    b = np.concatenate([small["dst_id"].values, small["src_id"].values]).astype(
        np.int64
    )
    c = np.concatenate([small["cnt"].values, small["cnt"].values]).astype(
        np.int64
    )
    ca = np.array([lbl_of[int(x)] for x in a], dtype=np.int64)
    cb = np.array([lbl_of[int(x)] for x in b], dtype=np.int64)
    two_m = int(c.sum())

    comms = np.unique(com)
    idx = {int(x): i for i, x in enumerate(comms)}
    ai = np.array([idx[int(x)] for x in ca], dtype=np.int64)
    w_in = np.zeros(len(comms), dtype=np.int64)
    sel = ca == cb
    np.add.at(w_in, ai[sel], c[sel])
    tot = np.zeros(len(comms), dtype=np.int64)
    np.add.at(tot, ai, c)

    # t = w_in*2m - tot^2 is dominated by tot^2 (tot can approach 2m), so
    # an int64 guard on w_in*2m alone is insufficient; the fold is
    # |communities|-bounded, so compute t/q in Python big ints (exact,
    # matching DuckDB's HUGEINT promotion) like embed_drift does.
    q = np.zeros(len(comms), dtype=np.int64)
    m2sq = two_m * two_m
    for i in range(len(comms) if m2sq else 0):
        t = int(w_in[i]) * two_m - int(tot[i]) ** 2
        q[i] = (abs(t) * 1_000_000 // m2sq) * (1 if t >= 0 else -1) if t else 0
    return pa.table(
        {
            "community": pa.array(comms),
            "w_in": pa.array(w_in),
            "tot_w": pa.array(tot),
            "q_e6": pa.array(q),
        }
    )


def lpa_modularity_sql(rep: int = LG_REP, iters: int = LPA_ITERS) -> str:
    ctes = _lpa_ctes(rep, iters)
    ctes.append(f"lab as (select hid, lbl from l{iters})")
    ctes.append("tm as (select sum(cnt) as m2 from e2)")
    ctes.append(
        "agg as (select la.lbl as community, "
        "cast(sum(case when la.lbl = lb.lbl then e2.cnt else 0 end) as bigint) "
        "as w_in, cast(sum(e2.cnt) as bigint) as tot_w "
        "from e2 join lab la on la.hid = e2.a join lab lb on lb.hid = e2.b "
        "group by la.lbl)"
    )
    return (
        "with " + ",\n".join(ctes) + "\n"
        "select c.community, "
        "coalesce(a.w_in, 0) as w_in, coalesce(a.tot_w, 0) as tot_w, "
        "cast(case when coalesce(a.w_in, 0) * tm.m2 >= "
        "coalesce(a.tot_w, 0) * coalesce(a.tot_w, 0) then "
        "(coalesce(a.w_in, 0) * tm.m2 - coalesce(a.tot_w, 0) * "
        "coalesce(a.tot_w, 0)) * 1000000 // (tm.m2 * tm.m2) else "
        "-((coalesce(a.tot_w, 0) * coalesce(a.tot_w, 0) - "
        "coalesce(a.w_in, 0) * tm.m2) * 1000000 // (tm.m2 * tm.m2)) end "
        "as bigint) as q_e6 "
        f"from (select distinct lbl as community from l{iters}) c "
        "left join agg a on a.community = c.community cross join tm"
    )


# --------------------------------------------------------------------------
# Directed triad census: feed-forward vs cyclic motifs
# --------------------------------------------------------------------------


def host_triads(sf_dir: str, rep: int = LG_REP) -> "pa.Table":
    """Directed triad (motif) census over the distinct host graph
    (self-loops dropped): ordered feed-forward tuples
    ``u -> w -> v with u -> v`` (the FFL motif = hierarchy signal)
    and ordered 3-cycle tuples ``u -> w -> v -> u`` (feedback) — the
    transitivity-vs-feedback fingerprint of the link structure.
    Engine computes both as int64 matrix products on the
    |hosts|-bounded adjacency (``sum((A @ A) * A)`` and
    ``trace(A @ A @ A)``); the oracle counts the identical ordered
    tuples with two 3-way self-joins.  Output: one row
    (n_ffl, n_cyc_tuples) — cycle TUPLES, i.e. 3x the cycle count,
    kept raw so both sides avoid a division convention."""
    edges = host_edges(sf_dir, rep).materialize()
    small = edges.to_pandas()[["src_id", "dst_id"]].drop_duplicates()
    small = small[small["src_id"] != small["dst_id"]]
    hosts = np.unique(
        np.concatenate([small["src_id"].values, small["dst_id"].values])
    )
    n = len(hosts)
    u = np.searchsorted(hosts, small["src_id"].values)
    v = np.searchsorted(hosts, small["dst_id"].values)
    A = np.zeros((n, n), dtype=np.int64)
    A[u, v] = 1
    A2 = A @ A
    ffl = int((A2 * A).sum())
    cyc = int(np.trace(A2 @ A))
    return pa.table(
        {
            "n_ffl": pa.array([ffl], pa.int64()),
            "n_cyc_tuples": pa.array([cyc], pa.int64()),
        }
    )


def host_triads_sql(rep: int = LG_REP) -> str:
    return (
        f"with e as materialized ({_edges_sql(rep)}), "
        "ed as materialized (select distinct src_id as a, dst_id as b from e "
        "where src_id <> dst_id) "
        "select "
        "cast((select count(*) from ed e1 "
        "join ed e2 on e2.a = e1.b "
        "join ed e3 on e3.a = e1.a and e3.b = e2.b) as bigint) as n_ffl, "
        "cast((select count(*) from ed e1 "
        "join ed e2 on e2.a = e1.b "
        "join ed e3 on e3.a = e2.b and e3.b = e1.a) as bigint) as n_cyc_tuples"
    )


# --------------------------------------------------------------------------
# Weighted deterministic walks (transition probability ∝ link count)
# --------------------------------------------------------------------------


def random_walks_weighted(
    sf_dir: str, rep: int = LG_REP, steps: int = WALK_LEN
) -> ray.data.Dataset:
    """:func:`random_walks` with WEIGHTED transitions: at host h the
    walk picks the out-edge covering offset
    ``r = H(page_id, h, t) % wdeg(h)`` inside the dst-sorted
    cumulative link-count array — edge (h, v) is chosen with
    probability cnt(h,v)/wdeg(h), so heavily-linked hosts attract
    proportionally more of the walk corpus (the node2vec/DeepWalk
    weighted regime).  Deterministic by the same hash discipline; the
    oracle replays it with a running-sum window
    (``r < rs and r >= rs - cnt``).  Same broadcast-CSR Ray shape as
    the unweighted walks.  Output: (page_id, step, host)."""
    import ray

    small = host_edges(sf_dir, rep).to_pandas()
    small = small.groupby(["src_id", "dst_id"], as_index=False)["cnt"].sum()
    small = small.sort_values(["src_id", "dst_id"])
    src = small["src_id"].to_numpy(np.int64)
    dst = small["dst_id"].to_numpy(np.int64)
    cnt = small["cnt"].to_numpy(np.int64)
    deg = np.bincount(src, weights=cnt, minlength=NH).astype(np.int64)
    off = np.zeros(NH + 1, dtype=np.int64)
    np.add.at(off, src + 1, 1)
    off = np.cumsum(off)
    # per-src cumulative weight (running sum within the sorted group)
    cum = np.zeros(len(cnt), dtype=np.int64)
    for h in range(NH):
        lo, hi_ = off[h], off[h + 1]
        if hi_ > lo:
            cum[lo:hi_] = np.cumsum(cnt[lo:hi_])
    csr_ref = ray.put((off, deg, dst, cum))

    def walk(t: pa.Table) -> pa.Table:
        o, dg, fl, cm = ray.get(csr_ref)
        pid = t["page_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = pid % NH
        out_pid = [pid]
        out_step = [np.zeros(len(pid), dtype=np.int64)]
        out_h = [h]
        alive = np.ones(len(pid), dtype=bool)
        cur = h.copy()
        for st in range(steps):
            alive = alive & (dg[cur] > 0)
            if not alive.any():
                break
            pa_, ha = pid[alive], cur[alive]
            r = ((pa_ % _WALK_PMOD) * 31 + (ha + 1) * _WALK_A + st * _WALK_B) % dg[ha]
            # searchsorted within each src segment: global position of
            # the first cum value strictly greater than r
            nxt = np.empty(len(ha), dtype=np.int64)
            for i in range(len(ha)):  # small per batch; vectorize via
                hh = ha[i]            # segment offsets at larger NH
                lo, hi_ = o[hh], o[hh + 1]
                j = lo + np.searchsorted(cm[lo:hi_], r[i], side="right")
                nxt[i] = fl[j]
            cur = cur.copy()
            cur[alive] = nxt
            out_pid.append(pa_)
            out_step.append(np.full(len(pa_), st + 1, dtype=np.int64))
            out_h.append(nxt)
        hid = np.concatenate(out_h)
        return pa.table(
            {
                "page_id": pa.array(np.concatenate(out_pid)),
                "step": pa.array(np.concatenate(out_step)),
                "host": pc.binary_join_element_wise(
                    "h", pc.cast(pa.array(hid), pa.string()), ".example", ""
                ),
            }
        )

    ds = pages_dataset(sf_dir, rep=rep, columns=["page_id"])
    return ds.map_batches(walk, batch_format="pyarrow")


def random_walks_weighted_sql(rep: int = LG_REP, steps: int = WALK_LEN) -> str:
    ctes = [
        f"e as materialized ({_edges_sql(rep)})",
        "ew as materialized (select src_id, dst_id, "
        "cast(sum(cnt) as bigint) as cnt from e group by src_id, dst_id)",
        "adj as materialized (select src_id, dst_id, cnt, "
        "sum(cnt) over (partition by src_id order by dst_id "
        "rows unbounded preceding) as rs, "
        "sum(cnt) over (partition by src_id) as wdeg from ew)",
        f"pg as (select distinct page_id from ({pages_cte(rep)}))",
        f"w0 as (select page_id, cast(page_id % {NH} as bigint) as h from pg)",
    ]
    for t in range(steps):
        ctes.append(
            f"w{t + 1} as materialized (select w.page_id, a.dst_id as h "
            f"from w{t} w join adj a on a.src_id = w.h and "
            f"((w.page_id % {_WALK_PMOD}) * 31 + (w.h + 1) * {_WALK_A} "
            f"+ {t} * {_WALK_B}) % a.wdeg < a.rs and "
            f"((w.page_id % {_WALK_PMOD}) * 31 + (w.h + 1) * {_WALK_A} "
            f"+ {t} * {_WALK_B}) % a.wdeg >= a.rs - a.cnt)"
        )
    sel = " union all ".join(
        f"select page_id, cast({t} as bigint) as step, h from w{t}"
        for t in range(steps + 1)
    )
    return (
        "with " + ", ".join(ctes) + " "
        f"select page_id, step, ('h' || cast(h as varchar) || '.example') as host "
        f"from ({sel})"
    )


# --------------------------------------------------------------------------
# Skip-gram pair counts from the walk corpus (word2vec prep)
# --------------------------------------------------------------------------

SG_WINDOW = 2


def walk_skipgrams(
    sf_dir: str, rep: int = LG_REP, window: int = SG_WINDOW
) -> ray.data.Dataset:
    """Skip-gram training-pair counts from the :func:`random_walks`
    corpus: every (center, context) host pair within ``window`` steps
    on the same walk, direction-sensitive, aggregated to
    (center, context, n) — the input table a word2vec/node2vec
    trainer consumes.  The pair explode happens INSIDE the walk
    kernel on the (steps+1, n) history matrix — each page's whole
    walk is in local arrays, so no (center, context) pair can be
    dropped by a Ray block split of the walk table (the r4 advisor
    finding); the |hosts|^2-bounded counts fold once.  The oracle
    replays it as a step self-join over the unrolled walk CTEs."""
    import ray

    csr_ref = _walk_csr(sf_dir, rep)
    steps = WALK_LEN

    def pairs(t: pa.Table) -> pa.Table:
        o, dg, fl = ray.get(csr_ref)
        pid = t["page_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hist = _walk_hist(pid, o, dg, fl, steps)
        keys = []
        for d in range(1, window + 1):
            for s in range(steps + 1 - d):
                m = (hist[s] >= 0) & (hist[s + d] >= 0)
                if not m.any():
                    continue
                a, b = hist[s][m], hist[s + d][m]
                keys.append(a * NH + b)   # center -> forward context
                keys.append(b * NH + a)   # and the reverse direction
        if keys:
            uk, cnt = np.unique(np.concatenate(keys), return_counts=True)
        else:
            uk = cnt = np.array([], dtype=np.int64)
        return pa.table(
            {
                "center": pc.binary_join_element_wise(
                    "h", pc.cast(pa.array(uk // NH), pa.string()), ".example", ""
                ),
                "context": pc.binary_join_element_wise(
                    "h", pc.cast(pa.array(uk % NH), pa.string()), ".example", ""
                ),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["center", "context"], as_index=False)["n"].sum()

    ds = pages_dataset(sf_dir, rep=rep, columns=["page_id"])
    # per-batch partials are already |hosts|^2-bounded: ONE single-
    # partition vectorized fold finishes the job (no per-key groupby)
    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .repartition(1)
        .map_batches(fold, batch_format="pandas", batch_size=None)
    )


def walk_skipgrams_sql(rep: int = LG_REP, window: int = SG_WINDOW) -> str:
    base = random_walks_sql(rep)
    return (
        f"with walks as ({base}) "
        "select w1.host as center, w2.host as context, "
        "cast(count(*) as bigint) as n "
        "from walks w1 join walks w2 on w2.page_id = w1.page_id "
        f"and w2.step <> w1.step and abs(w2.step - w1.step) <= {window} "
        "group by w1.host, w2.host"
    )


# --------------------------------------------------------------------------
# Percolation sweep: component structure vs edge-weight threshold
# --------------------------------------------------------------------------

PERC_PCTS = (30, 60, 90, 120, 150)   # thresholds as % of mean edge weight


def host_percolation(
    sf_dir: str, rep: int = LG_REP, pcts: tuple = PERC_PCTS
) -> "pa.Table":
    """Bond-percolation profile of the undirected host graph: for
    each weight floor (a % of the mean edge weight — the
    scale-invariant knob of :func:`host_scc`), the number of weakly
    connected components among hosts that keep at least one
    surviving edge, and the giant component's size — the robustness
    curve (how fast does the link graph shatter as weak edges
    drop?).  Union-find per threshold on the |hosts|^2-bounded fold;
    the oracle runs one recursive min-label CC per threshold.

    Output: (thr_pct, thr, n_hosts, n_components, giant_size)."""
    small = host_edges(sf_dir, rep).to_pandas()
    total = int(small["cnt"].sum())
    nedges = len(small)
    rows = {"thr_pct": [], "thr": [], "n_hosts": [], "n_components": [],
            "giant_size": []}
    for pct in pcts:
        thr = total * pct // (nedges * 100)
        e = small[(small["cnt"] >= thr) & (small["src_id"] != small["dst_id"])]
        hosts = np.unique(
            np.concatenate([e["src_id"].values, e["dst_id"].values])
        ).astype(np.int64)
        idx = {int(h): i for i, h in enumerate(hosts)}
        parent = list(range(len(hosts)))

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(e["src_id"].values, e["dst_id"].values):
            ra, rb = find(idx[int(a)]), find(idx[int(b)])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        lbl = np.array([find(i) for i in range(len(hosts))], dtype=np.int64)
        sizes = np.bincount(lbl, minlength=len(hosts))
        rows["thr_pct"].append(pct)
        rows["thr"].append(thr)
        rows["n_hosts"].append(len(hosts))
        rows["n_components"].append(int((sizes > 0).sum()))
        rows["giant_size"].append(int(sizes.max()) if len(hosts) else 0)
    return pa.table(
        {k: pa.array(np.array(v, dtype=np.int64)) for k, v in rows.items()}
    )


def host_percolation_sql(rep: int = LG_REP, pcts: tuple = PERC_PCTS) -> str:
    ctes = [
        f"e as materialized ({_edges_sql(rep)})",
        "thr0 as (select cast(sum(cnt) as bigint) as s, "
        "cast(count(*) as bigint) as n from e)",
    ]
    sels = []
    for pct in pcts:
        ctes.append(
            f"f{pct} as materialized (select src_id, dst_id from e, thr0 "
            f"where cnt >= s * {pct} // (n * 100) and src_id <> dst_id)"
        )
        ctes.append(
            f"u{pct} as materialized (select src_id as a, dst_id as b from f{pct} "
            f"union select dst_id, src_id from f{pct})"
        )
        ctes.append(
            f"h{pct} as materialized (select distinct a as hid from u{pct})"
        )
        ctes.append(
            f"r{pct}(v, l) as (select hid, hid from h{pct} "
            f"union select u.b, r.l from r{pct} r join u{pct} u on u.a = r.v)"
        )
        ctes.append(
            f"c{pct} as materialized (select v, min(l) as l from r{pct} "
            "group by v)"
        )
        sels.append(
            f"select cast({pct} as bigint) as thr_pct, "
            f"(select s * {pct} // (n * 100) from thr0) as thr, "
            f"(select cast(count(*) as bigint) from h{pct}) as n_hosts, "
            f"(select cast(count(distinct l) as bigint) from c{pct}) "
            "as n_components, "
            f"(select cast(max(cnt) as bigint) from (select count(*) as cnt "
            f"from c{pct} group by l)) as giant_size"
        )
    return "with recursive " + ", ".join(ctes) + " " + " union all ".join(sels)


# --------------------------------------------------------------------------
# node2vec biased walks (second-order transitions, integer bias)
# --------------------------------------------------------------------------

N2V_W_RETURN = 1      # alpha = 1/p with p = 4, scaled x4
N2V_W_NEAR = 4        # alpha = 1 (next is a direct successor of prev)
N2V_W_FAR = 1         # alpha = 1/q with q = 4


def node2vec_walks(
    sf_dir: str, rep: int = LG_REP, steps: int = WALK_LEN
) -> ray.data.Dataset:
    """node2vec walks (Grover & Leskovec 2016) over the distinct host
    graph with the second-order bias made integer and deterministic:
    from state (prev, cur), candidate next gets weight 1 if
    ``next = prev`` (return, 1/p), 4 if the DIRECTED edge
    ``prev -> next`` exists (stay near, alpha = 1), else 1 (explore,
    1/q) — p = q = 4 scaled by 4.  Step 0 is the uniform hash pick of
    :func:`random_walks`; later steps pick the edge covering
    ``r = H(page_id, cur, prev, t) % total_weight`` inside the
    dst-sorted biased cumulative.  A pure function of the graph; the
    oracle replays every step with a windowed running sum over the
    joined adjacency.

    Engine vectorization: each batch expands its walk rows by the
    out-degree of ``cur`` (segment repeat), evaluates the three-way
    bias with one packed-key ``searchsorted`` membership test for
    prev -> next, and segment-scans the cumulative — no per-row
    Python in the transition.  Output: (page_id, step, host)."""
    import ray

    small = host_edges(sf_dir, rep).to_pandas()[["src_id", "dst_id"]]
    small = small.drop_duplicates().sort_values(["src_id", "dst_id"])
    src = small["src_id"].to_numpy(np.int64)
    dst = small["dst_id"].to_numpy(np.int64)
    deg = np.bincount(src, minlength=NH).astype(np.int64)
    off = np.zeros(NH + 1, dtype=np.int64)
    np.add.at(off, src + 1, 1)
    off = np.cumsum(off)
    pair_keys = np.sort(src * NH + dst)      # directed-edge membership
    csr_ref = ray.put((off, deg, dst, pair_keys))

    def walk(t: pa.Table) -> pa.Table:
        o, dg, fl, pk = ray.get(csr_ref)
        pid = t["page_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h0 = pid % NH
        out_pid = [pid]
        out_step = [np.zeros(len(pid), dtype=np.int64)]
        out_h = [h0]
        alive = np.ones(len(pid), dtype=bool)
        cur = h0.copy()
        prev = np.full(len(pid), -1, dtype=np.int64)
        for st in range(steps):
            alive = alive & (dg[cur] > 0)
            if not alive.any():
                break
            pa_, ca, pv = pid[alive], cur[alive], prev[alive]
            if st == 0:
                r = ((pa_ % _WALK_PMOD) * 31 + (ca + 1) * _WALK_A) % dg[ca]
                nxt = fl[o[ca] + r]
            else:
                # expand each row by out-degree of cur
                reps = dg[ca]
                row = np.repeat(np.arange(len(ca)), reps)
                # candidate positions: o[cur] .. o[cur]+deg-1
                base = np.repeat(o[ca], reps)
                css = np.concatenate([np.arange(k) for k in reps])
                cand = fl[base + css]
                pvx = pv[row]
                w = np.full(len(cand), N2V_W_FAR, dtype=np.int64)
                near = np.searchsorted(pk, pvx * NH + cand)
                near_ok = (near < len(pk)) & (
                    pk[np.minimum(near, len(pk) - 1)] == pvx * NH + cand
                )
                w[near_ok] = N2V_W_NEAR
                w[cand == pvx] = N2V_W_RETURN
                # segment cumulative + totals
                cw = np.cumsum(w)
                seg_end = np.cumsum(reps)
                seg_start = seg_end - reps
                seg_base = np.concatenate([[0], cw[seg_end - 1]])[:-1]
                cum = cw - np.repeat(seg_base, reps)
                tot = cw[seg_end - 1] - seg_base
                r = (
                    (pa_ % _WALK_PMOD) * 31
                    + (ca + 1) * _WALK_A
                    + (pv + 2) * 97
                    + st * _WALK_B
                ) % tot
                # first candidate whose cumulative exceeds r
                hit = np.searchsorted(
                    cum + np.repeat(np.arange(len(ca)) * (1 << 32), reps),
                    np.repeat(r, 1) + np.arange(len(ca)) * (1 << 32),
                    side="right",
                )
                nxt = cand[hit]
            prev = prev.copy()
            cur2 = cur.copy()
            prev[alive] = ca
            cur2[alive] = nxt
            cur = cur2
            out_pid.append(pa_)
            out_step.append(np.full(len(pa_), st + 1, dtype=np.int64))
            out_h.append(nxt)
        hid = np.concatenate(out_h)
        return pa.table(
            {
                "page_id": pa.array(np.concatenate(out_pid)),
                "step": pa.array(np.concatenate(out_step)),
                "host": pc.binary_join_element_wise(
                    "h", pc.cast(pa.array(hid), pa.string()), ".example", ""
                ),
            }
        )

    ds = pages_dataset(sf_dir, rep=rep, columns=["page_id"])
    return ds.map_batches(walk, batch_format="pyarrow")


def node2vec_walks_sql(rep: int = LG_REP, steps: int = WALK_LEN) -> str:
    ctes = [
        f"e as materialized ({_edges_sql(rep)})",
        "ed as materialized (select distinct src_id, dst_id from e)",
        "adj as materialized (select src_id, dst_id, "
        "row_number() over (partition by src_id order by dst_id) - 1 as idx, "
        "count(*) over (partition by src_id) as deg from ed)",
        f"pg as (select distinct page_id from ({pages_cte(rep)}))",
        f"w0 as (select page_id, cast(page_id % {NH} as bigint) as h, "
        "cast(-1 as bigint) as prev from pg)",
        # step 1: uniform (no prev state yet)
        "w1 as materialized (select w.page_id, a.dst_id as h, w.h as prev "
        "from w0 w join adj a on a.src_id = w.h and a.idx = "
        f"((w.page_id % {_WALK_PMOD}) * 31 + (w.h + 1) * {_WALK_A}) % a.deg)",
    ]
    for t in range(1, steps):
        ctes.append(
            f"b{t + 1} as materialized (select w.page_id, w.h, w.prev, "
            "a.dst_id as cand, "
            f"case when a.dst_id = w.prev then {N2V_W_RETURN} "
            f"when ep.src_id is not null then {N2V_W_NEAR} "
            f"else {N2V_W_FAR} end as wgt "
            f"from w{t} w join adj a on a.src_id = w.h "
            "left join ed ep on ep.src_id = w.prev and ep.dst_id = a.dst_id)"
        )
        ctes.append(
            f"c{t + 1} as materialized (select *, "
            "sum(wgt) over (partition by page_id order by cand "
            "rows unbounded preceding) as rs, "
            "sum(wgt) over (partition by page_id) as tot "
            f"from b{t + 1})"
        )
        ctes.append(
            f"w{t + 1} as materialized (select page_id, cand as h, h as prev "
            f"from c{t + 1} where "
            f"((page_id % {_WALK_PMOD}) * 31 + (h + 1) * {_WALK_A} "
            f"+ (prev + 2) * 97 + {t} * {_WALK_B}) % tot < rs and "
            f"((page_id % {_WALK_PMOD}) * 31 + (h + 1) * {_WALK_A} "
            f"+ (prev + 2) * 97 + {t} * {_WALK_B}) % tot >= rs - wgt)"
        )
    sel = " union all ".join(
        f"select page_id, cast({t} as bigint) as step, h from w{t}"
        for t in range(steps + 1)
    )
    return (
        "with " + ", ".join(ctes) + " "
        f"select page_id, step, ('h' || cast(h as varchar) || '.example') as host "
        f"from ({sel})"
    )


# --------------------------------------------------------------------------
# Reciprocal-rank fusion of the PageRank and Katz rankings
# --------------------------------------------------------------------------

RRF_K = 60


def host_rank_fusion(sf_dir: str, rep: int = LG_REP) -> "pa.Table":
    """Reciprocal-rank fusion (Cormack et al. 2009) of two
    independent host rankers — fixed-point PageRank and truncated
    Katz: ``rrf_e6 = sum over rankers of 1e6 // (60 + rank)`` with
    rank = dense position by (score desc, host id asc) — the
    deterministic tie rule both sides share, so the fused table is
    hash-exact.  The canonical ensemble step of a ranking pipeline
    (fusing centrality signals for crawl prioritization).

    Output: (host, pr_rank, katz_rank, rrf_e6)."""
    pr = pagerank_hosts(sf_dir, rep).to_pandas()
    kz = host_katz(sf_dir, rep).to_pandas()
    pr["hid"] = pr["host"].str.extract(r"^h(\d+)\.")[0].astype("int64")
    kz["hid"] = kz["host"].str.extract(r"^h(\d+)\.")[0].astype("int64")
    pr = pr.sort_values(["pr_num", "hid"], ascending=[False, True]).reset_index(
        drop=True
    )
    pr["pr_rank"] = np.arange(1, len(pr) + 1, dtype=np.int64)
    kz = kz.sort_values(
        ["katz_e6", "hid"], ascending=[False, True]
    ).reset_index(drop=True)
    kz["katz_rank"] = np.arange(1, len(kz) + 1, dtype=np.int64)
    m = pr[["hid", "host", "pr_rank"]].merge(
        kz[["hid", "katz_rank"]], on="hid", how="inner"
    )
    rrf = 1_000_000 // (RRF_K + m["pr_rank"].to_numpy(np.int64)) + (
        1_000_000 // (RRF_K + m["katz_rank"].to_numpy(np.int64))
    )
    m = m.sort_values("hid")
    return pa.table(
        {
            "host": pa.array(m["host"], pa.string()),
            "pr_rank": pa.array(m["pr_rank"].to_numpy(np.int64)),
            "katz_rank": pa.array(m["katz_rank"].to_numpy(np.int64)),
            "rrf_e6": pa.array(
                (
                    1_000_000 // (RRF_K + m["pr_rank"].to_numpy(np.int64))
                    + 1_000_000 // (RRF_K + m["katz_rank"].to_numpy(np.int64))
                )
            ),
        }
    )


def host_rank_fusion_sql(rep: int = LG_REP) -> str:
    pr = pagerank_hosts_sql(rep)
    kz = host_katz_sql(rep)
    return (
        f"with prt as ({pr}), kzt as ({kz}), "
        "pra as (select host, cast(regexp_extract(host, '^h(\\d+)\\.', 1) "
        "as bigint) as hid, "
        "row_number() over (order by pr_num desc, "
        "cast(regexp_extract(host, '^h(\\d+)\\.', 1) as bigint) asc) "
        "as pr_rank from prt), "
        "kza as (select cast(regexp_extract(host, '^h(\\d+)\\.', 1) "
        "as bigint) as hid, "
        "row_number() over (order by katz_e6 desc, "
        "cast(regexp_extract(host, '^h(\\d+)\\.', 1) as bigint) asc) "
        "as katz_rank from kzt) "
        "select pra.host, cast(pra.pr_rank as bigint) as pr_rank, "
        "cast(kza.katz_rank as bigint) as katz_rank, "
        f"cast(1000000 // ({RRF_K} + pra.pr_rank) + "
        f"1000000 // ({RRF_K} + kza.katz_rank) as bigint) as rrf_e6 "
        "from pra join kza on kza.hid = pra.hid"
    )


# --------------------------------------------------------------------------
# Spearman rank correlation between the two centrality rankers
# --------------------------------------------------------------------------


def rank_correlation(sf_dir: str, rep: int = LG_REP) -> "pa.Table":
    """Integer-exact Spearman rank correlation between the PageRank
    and Katz orderings (ranker-agreement audit — is the cheap
    truncated Katz a usable stand-in for the power iteration?):
    both rankers use the (score desc, host asc) dense positions of
    :func:`host_rank_fusion`, and
    ``spearman_e6 = 1e6 - (6e6 * sum d^2) // (n (n^2 - 1))`` — one
    floor on a nonnegative numerator, identical in the oracle.
    Output: (n, sum_d2, spearman_e6)."""
    fused = host_rank_fusion(sf_dir, rep).to_pandas()
    d = fused["pr_rank"].to_numpy(np.int64) - fused["katz_rank"].to_numpy(
        np.int64
    )
    n = len(fused)
    sd2 = int((d * d).sum())
    rho = 1_000_000 - (6_000_000 * sd2) // (n * (n * n - 1))
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "sum_d2": pa.array([sd2], pa.int64()),
            "spearman_e6": pa.array([rho], pa.int64()),
        }
    )


def rank_correlation_sql(rep: int = LG_REP) -> str:
    return (
        f"with f as ({host_rank_fusion_sql(rep)}) "
        "select cast(count(*) as bigint) as n, "
        "cast(sum((pr_rank - katz_rank) * (pr_rank - katz_rank)) as bigint) "
        "as sum_d2, "
        "cast(1000000 - (6000000 * "
        "sum((pr_rank - katz_rank) * (pr_rank - katz_rank))) "
        "// (count(*) * (count(*) * count(*) - 1)) as bigint) as spearman_e6 "
        "from f"
    )


# --------------------------------------------------------------------------
# Targeted-attack robustness: giant component vs removed top hubs
# --------------------------------------------------------------------------

ATTACK_KS = (0, 1, 2, 4, 8)


def host_attack_curve(
    sf_dir: str, rep: int = LG_REP, ks: tuple = ATTACK_KS
) -> "pa.Table":
    """Targeted-attack robustness curve (Albert/Jeong/Barabasi 2000):
    remove the top-k hosts by total degree (in+out link weight, ties
    to the smaller id) and measure what remains — the scale-free
    fragility diagnostic next to :func:`host_percolation`'s random/
    weight-floor bond percolation (hub attacks shatter power-law
    graphs far faster).  Per k: surviving hosts, weakly connected
    components, giant size.  Union-find per k on the |hosts|^2-
    bounded fold; the oracle ranks hubs with one window and runs one
    recursive min-label CC per k.

    Output: (k_removed, n_hosts, n_components, giant_size)."""
    small = host_edges(sf_dir, rep).to_pandas()
    deg = {}
    for col in ("src_id", "dst_id"):
        for h, c in zip(small[col].values, small["cnt"].values):
            deg[int(h)] = deg.get(int(h), 0) + int(c)
    order = sorted(deg, key=lambda h: (-deg[h], h))
    rows = {"k_removed": [], "n_hosts": [], "n_components": [], "giant_size": []}
    for k in ks:
        gone = set(order[:k])
        e = small[
            (~small["src_id"].isin(gone))
            & (~small["dst_id"].isin(gone))
            & (small["src_id"] != small["dst_id"])
        ]
        hosts = np.unique(
            np.concatenate([e["src_id"].values, e["dst_id"].values])
        ).astype(np.int64)
        idx = {int(h): i for i, h in enumerate(hosts)}
        parent = list(range(len(hosts)))

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(e["src_id"].values, e["dst_id"].values):
            ra, rb = find(idx[int(a)]), find(idx[int(b)])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        lbl = np.array([find(i) for i in range(len(hosts))], dtype=np.int64)
        sizes = np.bincount(lbl, minlength=len(hosts)) if len(hosts) else np.array([0])
        rows["k_removed"].append(k)
        rows["n_hosts"].append(len(hosts))
        rows["n_components"].append(int((sizes > 0).sum()))
        rows["giant_size"].append(int(sizes.max()) if len(hosts) else 0)
    return pa.table(
        {k: pa.array(np.array(v, dtype=np.int64)) for k, v in rows.items()}
    )


def host_attack_curve_sql(rep: int = LG_REP, ks: tuple = ATTACK_KS) -> str:
    ctes = [
        f"e as materialized ({_edges_sql(rep)})",
        "dg as materialized (select hid, sum(c) as d from ("
        "select src_id as hid, cnt as c from e "
        "union all select dst_id, cnt from e) group by hid)",
        "rk as materialized (select hid, "
        "row_number() over (order by d desc, hid asc) as r from dg)",
    ]
    sels = []
    for k in ks:
        ctes.append(
            f"f{k} as materialized (select src_id, dst_id from e "
            f"where src_id <> dst_id "
            f"and src_id not in (select hid from rk where r <= {k}) "
            f"and dst_id not in (select hid from rk where r <= {k}))"
        )
        ctes.append(
            f"u{k} as materialized (select src_id as a, dst_id as b from f{k} "
            f"union select dst_id, src_id from f{k})"
        )
        ctes.append(
            f"h{k} as materialized (select distinct a as hid from u{k})"
        )
        ctes.append(
            f"r{k}(v, l) as (select hid, hid from h{k} "
            f"union select u.b, r.l from r{k} r join u{k} u on u.a = r.v)"
        )
        ctes.append(
            f"c{k} as materialized (select v, min(l) as l from r{k} group by v)"
        )
        sels.append(
            f"select cast({k} as bigint) as k_removed, "
            f"(select cast(count(*) as bigint) from h{k}) as n_hosts, "
            f"(select cast(count(distinct l) as bigint) from c{k}) "
            "as n_components, "
            f"(select coalesce(cast(max(cnt) as bigint), 0) from "
            f"(select count(*) as cnt from c{k} group by l)) as giant_size"
        )
    return "with recursive " + ", ".join(ctes) + " " + " union all ".join(sels)


def kendall_tau(sf_dir: str, rep: int = LG_REP) -> "pa.Table":
    """Kendall tau-a between the PageRank and Katz orderings — the
    pairwise sibling of :func:`rank_correlation` (Spearman weights
    big displacements quadratically; Kendall counts inversions):
    ``tau_e6 = (concordant - discordant) * 1e6 // (n(n-1)/2)`` with
    the sign extracted before the floor (numpy floors, DuckDB
    truncates).  Ranks are dense and tie-free by construction, so
    tau-a == tau-b.  O(n^2) pair comparison on the |hosts|-bounded
    rank table, mirrored by a pair self-join.
    Output: (n, concordant, discordant, tau_e6)."""
    fused = host_rank_fusion(sf_dir, rep).to_pandas()
    a = fused["pr_rank"].to_numpy(np.int64)
    b = fused["katz_rank"].to_numpy(np.int64)
    n = len(fused)
    da = a[:, None] - a[None, :]
    db = b[:, None] - b[None, :]
    upper = np.triu(np.ones((n, n), dtype=bool), k=1)
    conc = int(((da * db > 0) & upper).sum())
    disc = int(((da * db < 0) & upper).sum())
    denom = n * (n - 1) // 2
    t = conc - disc
    tau = (1 if t >= 0 else -1) * (abs(t) * 1_000_000 // denom)
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "concordant": pa.array([conc], pa.int64()),
            "discordant": pa.array([disc], pa.int64()),
            "tau_e6": pa.array([tau], pa.int64()),
        }
    )


def kendall_tau_sql(rep: int = LG_REP) -> str:
    return (
        f"with f as ({host_rank_fusion_sql(rep)}), "
        "p as (select a.pr_rank as a1, a.katz_rank as b1, "
        "b.pr_rank as a2, b.katz_rank as b2 "
        "from f a join f b on a.host < b.host), "
        "c as (select count(*) filter ((a1 - a2) * (b1 - b2) > 0) as conc, "
        "count(*) filter ((a1 - a2) * (b1 - b2) < 0) as disc from p), "
        "nn as (select count(*) as n from f) "
        "select cast(nn.n as bigint) as n, cast(c.conc as bigint) as concordant, "
        "cast(c.disc as bigint) as discordant, "
        "cast(case when c.conc >= c.disc then "
        "(c.conc - c.disc) * 1000000 // (nn.n * (nn.n - 1) // 2) "
        "else -((c.disc - c.conc) * 1000000 // (nn.n * (nn.n - 1) // 2)) end "
        "as bigint) as tau_e6 "
        "from c, nn"
    )


RICH_KS = (1, 2, 4, 8, 16)


def rich_club(sf_dir: str, rep: int = LG_REP, ks: tuple = RICH_KS) -> "pa.Table":
    """Rich-club coefficient profile (Zhou & Mondragon 2004) of the
    undirected distinct host graph: for each degree floor k, the
    density among hosts of degree > k —
    ``phi_e6 = 2 * E_k * 1e6 // (N_k (N_k - 1))`` — do the
    best-connected hosts preferentially interlink?  Degrees and the
    club subgraph come from the |hosts|^2-bounded fold; the oracle
    recomputes per k with two grouped counts.
    Output: (k, n_club, e_club, phi_e6) for ks with >= 2 members."""
    small = (
        host_edges(sf_dir, rep)
        .to_pandas()[["src_id", "dst_id"]]
        .drop_duplicates()
    )
    small = small[small["src_id"] != small["dst_id"]]
    a = small[["src_id", "dst_id"]].min(axis=1).to_numpy(np.int64)
    b = small[["src_id", "dst_id"]].max(axis=1).to_numpy(np.int64)
    und = np.unique(a * NH + b)
    ua, ub = und // NH, und % NH
    deg = np.bincount(
        np.concatenate([ua, ub]), minlength=NH
    ).astype(np.int64)
    rows = {"k": [], "n_club": [], "e_club": [], "phi_e6": []}
    for k in ks:
        club = deg > k
        nk = int(club.sum())
        if nk < 2:
            continue
        ek = int((club[ua] & club[ub]).sum())
        rows["k"].append(k)
        rows["n_club"].append(nk)
        rows["e_club"].append(ek)
        rows["phi_e6"].append(2 * ek * 1_000_000 // (nk * (nk - 1)))
    return pa.table(
        {c: pa.array(np.array(v, dtype=np.int64)) for c, v in rows.items()}
    )


def rich_club_sql(rep: int = LG_REP, ks: tuple = RICH_KS) -> str:
    ctes = [
        f"e as materialized ({_edges_sql(rep)})",
        "und as materialized (select distinct least(src_id, dst_id) as a, "
        "greatest(src_id, dst_id) as b from e where src_id <> dst_id)",
        "dg as materialized (select hid, count(*) as d from ("
        "select a as hid from und union all select b from und) group by hid)",
    ]
    sels = []
    for k in ks:
        ctes.append(
            f"rc{k} as materialized (select "
            f"(select count(*) from dg where d > {k}) as nk, "
            f"(select count(*) from und "
            f"join dg da on da.hid = und.a join dg db on db.hid = und.b "
            f"where da.d > {k} and db.d > {k}) as ek)"
        )
        sels.append(
            f"select cast({k} as bigint) as k, cast(nk as bigint) as n_club, "
            f"cast(ek as bigint) as e_club, "
            f"cast(2 * ek * 1000000 // (nk * (nk - 1)) as bigint) as phi_e6 "
            f"from rc{k} where nk >= 2"
        )
    return "with " + ", ".join(ctes) + " " + " union all ".join(sels)
