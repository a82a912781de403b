"""Sources: column-pruned parquet readers + the deterministic pages
corpus (Common-Crawl-style, per BASELINE.json ``input_hint``).

``pages_dataset`` derives the pages table from the ``documents``
parquet deterministically (pure function of doc_id — no external
data):

- ``page_id = doc_id * rep + k`` for k in [0, rep) — ``rep``
  amplifies the corpus for join/bench scale; at rep=1 page_id==doc_id;
- ``url = 'https://{source}.example/doc/{doc_id}/p/{k}'``;
- ``warc_ts = 2024-01-01 + page_id seconds`` (timestamp[us]);
- ``text``/``lang`` inherited from the parent document — ``text``
  must stay byte-identical per url through every stage (the
  north-rule invariant);
- ``html`` (optional): deterministic wrapper bytes around text.

SQL mirror for the oracle: :func:`pages_cte`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..geocode import WARC_EPOCH


def read_table(
    sf_dir: str,
    name: str,
    columns: list[str] | None = None,
    filter=None,
) -> ray.data.Dataset:
    """Column-pruned parquet read (prune at the read, SURVEY.md §4).

    ``filter`` (a pyarrow.dataset expression) pushes the predicate to
    the scan: row groups whose statistics exclude it never leave
    storage.  Callers still apply the exact in-batch mask — pushdown
    prunes coarsely by row-group stats, it does not replace it."""
    return ray.data.read_parquet(
        f"{sf_dir}/{name}.parquet", columns=columns, filter=filter
    )


def _build_pages(
    t: pa.Table, docs: pa.Table, rep: int, with_html: bool,
    columns: list[str] | None = None,
) -> pa.Table:
    """Range batch (column ``id`` = page_id) -> page rows.

    ``page_id = doc_id * rep + k`` with doc_ids dense 0..n-1, so the
    range value decodes as ``doc_idx = id // rep, k = id % rep`` — one
    ``take`` against the broadcast documents table, then vectorized
    url/ts synthesis (Arrow concat kernels, no Python per-row loop).

    ``columns`` prunes INSIDE the scan (the generator is this corpus's
    scan, so ``columns=`` belongs here exactly as it does on
    read_parquet): unrequested columns are never synthesized and their
    doc columns never taken — a page_id-only projection is pure int64
    arithmetic with zero string traffic.
    """
    page_id = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    doc_idx = page_id // rep
    k = page_id % rep
    want = None if columns is None else set(columns)

    def need(c: str) -> bool:
        return want is None or c in want

    # html synthesis reads doc columns, so with_html forces the take
    # even under a page_id-only projection (ADVICE r2: base was None
    # and the html branch dereferenced it)
    base = (
        docs.take(pa.array(doc_idx))
        if want is None or want - {"page_id", "warc_ts"} or with_html
        else None
    )
    cols = {}
    if need("page_id"):
        cols["page_id"] = pa.array(page_id)
    if need("doc_id"):
        cols["doc_id"] = base["doc_id"]
    if need("url"):
        cols["url"] = pc.binary_join_element_wise(
            "https://",
            base["source"],
            ".example/doc/",
            pc.cast(base["doc_id"], pa.string()),
            "/p/",
            pc.cast(pa.array(k), pa.string()),
            "",
        )
    if need("warc_ts"):
        ts = WARC_EPOCH + page_id.astype("timedelta64[s]").astype("timedelta64[us]")
        cols["warc_ts"] = pa.array(ts, type=pa.timestamp("us"))
    if need("text"):
        cols["text"] = base["text"]
    if need("lang"):
        cols["lang"] = base["lang"]
    if need("source"):
        cols["source"] = base["source"]
    if need("n_chars"):
        cols["n_chars"] = base["n_chars"]
    if with_html:
        cols["html"] = pc.cast(
            pc.binary_join_element_wise(
                "<html><head><title>",
                pc.cast(base["doc_id"], pa.string()),
                "</title></head><body>",
                base["text"],
                "</body></html>",
                "",
            ),
            pa.binary(),
        )
    return pa.table(cols)


TARGET_ROWS_PER_BLOCK = 150_000  # ~50 MB of pages at ~350 B/row


def _fanout_blocks(n_docs: int, rep: int, narrow: bool = False) -> int:
    """Page-generator block count: ~150k pages/block (≈50 MB — small
    enough that a block's strings stay far under Arrow's 2 GiB int32
    offset limit), floored at 2 blocks/CPU so every core has work,
    capped at 4096.

    ``narrow`` (payload-free projection, no string columns): rows are
    ~8 B, so the same byte budget is ~2M rows/block — fewer, fatter
    tasks.  Sizing by row count alone made a 200M-row pruned scan
    1334 tasks of ~12 ms, which is scheduler-dispatch-bound at 32
    CPUs (measured: 8->32 CPUs gained only 1.7x)."""
    ncpu = 8
    try:
        import ray

        if ray.is_initialized():
            ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001
        pass
    total = max(1, n_docs * rep)
    per_block = 2_000_000 if narrow else TARGET_ROWS_PER_BLOCK
    by_size = -(-total // per_block)
    blocks = max(by_size, ncpu * 2)
    # round up to a multiple of the CPU count: ragged final waves on a
    # uniform-cost stage idle (blocks % ncpu) cores for a full task
    blocks = -(-blocks // ncpu) * ncpu
    return int(min(4096, blocks))


def pages_dataset(
    sf_dir: str,
    rep: int = 1,
    with_html: bool = False,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """The pages corpus as a streaming Dataset (zero-copy Arrow).

    Driven by ``ray.data.range(n_docs * rep)`` with the (small)
    documents table broadcast via ``ray.put``: range blocks are sized
    by PAGE count, so parallelism survives amplification.  (Reading
    the one small parquet file and amplifying in-place does not: Ray
    bundles map tasks by INPUT bytes, so 64 fanned-out 26 KB blocks
    re-coalesce into one task that then inflates to gigabytes —
    measured as a single-task 54 s stage.  At real corpus scale the
    input is thousands of row groups and this generator is replaced
    by a plain ``read_parquet``.)
    """
    import pyarrow.parquet as pq
    import ray

    docs = pq.read_table(f"{sf_dir}/documents.parquet")
    docs = docs.sort_by("doc_id")  # take-by-index == take-by-doc_id
    n_docs = docs.num_rows
    docs_ref = ray.put(docs)
    total = n_docs * rep
    string_cols = {"url", "text", "lang", "source", "html"}
    narrow = columns is not None and not (set(columns) & string_cols)
    blocks = _fanout_blocks(n_docs, rep, narrow=narrow)

    def build(t: pa.Table) -> pa.Table:
        return _build_pages(t, ray.get(docs_ref), rep, with_html, columns)

    # Ray bundles map inputs up to target_min_block_size by INPUT
    # bytes; range blocks are 8 B/row while build's OUTPUT is ~300 B/
    # row, so the default 1 MiB floor re-coalesces the fan-out ~5x
    # (measured: 64 blocks -> 13 tasks, 19 of 32 cores idle).  Shrink
    # the floor (never grow it) so one range block stays one task.
    # The override is PER-DATASET: the plan snapshots DataContext at
    # read creation, so we set the global only around construction and
    # restore it (ADVICE r2: the old permanent shrink degraded block
    # bundling for every later pipeline in the same session).
    from ray.data import DataContext

    ctx = DataContext.get_current()
    per_block_bytes = max(1, (total // blocks) * 8)
    prior_floor = ctx.target_min_block_size
    try:
        if prior_floor and prior_floor > per_block_bytes:
            ctx.target_min_block_size = per_block_bytes
        ds = ray.data.range(total, override_num_blocks=blocks)
        # the map op's input bundling is configured when map_batches
        # is CALLED (not when the range is created), so the build op
        # must also be wired inside the override window — restoring
        # first re-coalesced the 8 B/row range blocks under the 1 MiB
        # default and serialized the fan-out again (round-3 regression:
        # host_stats 1.4 s -> 3.8 s)
        ds = ds.map_batches(build, batch_format="pyarrow", batch_size=None)
    finally:
        ctx.target_min_block_size = prior_floor
    if columns:
        ds = ds.select_columns(columns)
    return ds


def pages_cte(rep: int = 1) -> str:
    """DuckDB CTE body producing EXACTLY the rows of
    :func:`pages_dataset` (column-for-column)."""
    if rep == 1:
        return (
            "select doc_id as page_id, doc_id, "
            "('https://' || source || '.example/doc/' || cast(doc_id as varchar) || '/p/0') as url, "
            "(TIMESTAMP '2024-01-01 00:00:00' + to_microseconds(doc_id * 1000000)) as warc_ts, "
            "text, lang, source, n_chars from documents"
        )
    return (
        f"select d.doc_id * {rep} + s.k as page_id, d.doc_id, "
        "('https://' || d.source || '.example/doc/' || cast(d.doc_id as varchar) "
        "|| '/p/' || cast(s.k as varchar)) as url, "
        f"(TIMESTAMP '2024-01-01 00:00:00' + to_microseconds((d.doc_id * {rep} + s.k) * 1000000)) as warc_ts, "
        "d.text, d.lang, d.source, d.n_chars "
        f"from documents d cross join (select unnest(range({rep})) as k) s"
    )
