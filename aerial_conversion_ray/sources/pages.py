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


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Column-pruned parquet read (prune at the read, SURVEY.md §4)."""
    return ray.data.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


class _Amplify:
    """Stateless batch fn: one document row -> ``rep`` page rows.

    Vectorized: np.repeat on an index array + arithmetic; string url
    built with pyarrow concat kernels (no Python per-row loop).
    """

    def __init__(self, rep: int, with_html: bool):
        self.rep = rep
        self.with_html = with_html

    def __call__(self, t: pa.Table) -> pa.Table:
        rep = self.rep
        n = t.num_rows
        doc_id = t["doc_id"].to_numpy(zero_copy_only=False)
        if rep == 1:
            page_id = doc_id
            k = np.zeros(n, dtype=np.int64)
            base = t
        else:
            idx = np.repeat(np.arange(n, dtype=np.int64), rep)
            k = np.tile(np.arange(rep, dtype=np.int64), n)
            page_id = doc_id[idx] * rep + k
            base = t.take(pa.array(idx))
        url = pc.binary_join_element_wise(
            "https://",
            base["source"],
            ".example/doc/",
            pc.cast(base["doc_id"], pa.string()),
            "/p/",
            pa.array(k.astype("U20")),
            "",
        )
        ts = WARC_EPOCH + page_id.astype("timedelta64[s]").astype("timedelta64[us]")
        cols = {
            "page_id": pa.array(page_id),
            "doc_id": base["doc_id"],
            "url": url,
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "text": base["text"],
            "lang": base["lang"],
            "source": base["source"],
            "n_chars": base["n_chars"],
        }
        if self.with_html:
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


def _fanout_blocks() -> int:
    """Input block target: the documents table is ONE small parquet
    file (= one Ray block); without a fan-out the whole amplified
    pipeline would execute as a single serial task chain.  4 blocks
    per CPU keeps every core busy with small scheduling overhead.  At
    real 100 TB scale the input is thousands of row-groups and Ray's
    default block sizing applies — this knob only matters for the
    single-file test corpus."""
    try:
        import ray

        if ray.is_initialized():
            return max(8, min(256, int(ray.cluster_resources().get("CPU", 8)) * 4))
    except Exception:  # noqa: BLE001
        pass
    return 32


def pages_dataset(
    sf_dir: str,
    rep: int = 1,
    with_html: bool = False,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """The pages corpus as a streaming Dataset (zero-copy Arrow)."""
    ds = read_table(sf_dir, "documents")
    ds = ds.repartition(_fanout_blocks())
    ds = ds.map_batches(
        _Amplify(rep, with_html), batch_format="pyarrow", batch_size=8192
    )
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
