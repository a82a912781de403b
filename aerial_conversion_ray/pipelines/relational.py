"""Relational operator coverage: joins, aggregates, semi/anti joins,
dense-ID assignment, concat+remap, windowed event aggregates.

These re-express the reference's table-side operators over the
TPC-H-ish testdata (SURVEY.md §2d/§2e/§2g):

- J3/J4 equi-joins (annotations⋈images analog)   -> orders⋈customer⋈...
- J7/J8 semi-joins (filter_annotations/images)   -> semi_join
- J9 anti-join (balance removal)                 -> anti_join
- A1/A5 dense-ID dictionary + concat remap       -> dense_ids / concat_remap
- A3 grouped stats                               -> lang_stats, q1 etc.
- SO1 sorts/top-k                                -> top_orders
- events tumbling window (streaming-shaped)      -> events_window

Design: broadcast the SMALL side of every join (region/nation/
customer/supplier are tiny); pre-aggregate inside map_batches before
every groupby so the shuffle moves partial rows only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..functions.fixedpoint import to_fixed
from ..sources.pages import read_table
from ..util import pool_size


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

def _broadcast_df(sf_dir: str, name: str, columns: list[str] | None = None):
    """Load a small dimension table once on the driver -> ray.put ref.
    Stages resolve it once per actor/task, not per batch."""
    import pyarrow.parquet as pq
    import ray

    t = pq.read_table(f"{sf_dir}/{name}.parquet", columns=columns)
    return ray.put(t.to_pandas())


class _BroadcastMerge:
    """Actor-pool stage: pandas hash-join each batch against one or
    more broadcast dimension tables (the reference's pd.merge join J4,
    ``scripts/coco2geojson.py:315-318``, minus the driver loop)."""

    def __init__(self, refs_and_keys):
        import ray

        self.dims = [
            (ray.get(ref) if not isinstance(ref, pd.DataFrame) else ref, on, how)
            for ref, on, how in refs_and_keys
        ]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        for dim, on, how in self.dims:
            batch = batch.merge(dim, on=on, how=how)
        return batch


# --------------------------------------------------------------------------
# aggregates
# --------------------------------------------------------------------------

def q1_pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1-style grouped aggregate over lineitem: the engine's
    canonical groupby (A3 analog).  Pre-aggregation happens inside
    Ray's hash aggregate; input is column-pruned at the read.

    Aggregate semantics are FIXED-POINT (cents / 1e-4): sums are exact
    int64, so the result is bit-identical regardless of partitioning —
    see functions/fixedpoint.py."""
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.less(t["l_shipdate"], pa.scalar(np.datetime64("1998-09-01", "us")))
        )
        price = t["l_extendedprice"].to_numpy()
        disc = t["l_discount"].to_numpy()
        qty = t["l_quantity"].to_numpy()
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_c": pa.array(to_fixed(qty, 100.0)),
                "price_c": pa.array(to_fixed(price, 100.0)),
                "disc_price_c": pa.array(to_fixed(price * (1.0 - disc), 10000.0)),
                "disc_c": pa.array(to_fixed(disc, 10000.0)),
            }
        )

    def partial(t: pa.Table) -> pa.Table:
        df = prep(t).to_pandas()
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty_c=("qty_c", "sum"),
            sum_price_c=("price_c", "sum"),
            sum_disc_price_c=("disc_price_c", "sum"),
            sum_disc_c=("disc_c", "sum"),
            count_order=("qty_c", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    # per-batch partial combine -> LOW-CARDINALITY driver fold: the key
    # space is 6 (flag, status) pairs, so each block reduces to <= 6
    # int64 rows and the final sum runs driver-side — fixed-point sums
    # are associative, so the result is bit-identical to the shuffled
    # plan without paying the all-to-all fixed cost for 6 groups.
    pdf = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    fin = pdf.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()
    out = ray.data.from_arrow(pa.Table.from_pandas(fin, preserve_index=False))

    def finish(t: pa.Table) -> pa.Table:
        n = t["count_order"].to_numpy().astype(np.float64)
        sq = t["sum_qty_c"].to_numpy() / 100.0
        sp = t["sum_price_c"].to_numpy() / 100.0
        sdp = t["sum_disc_price_c"].to_numpy() / 10000.0
        sd = t["sum_disc_c"].to_numpy() / 10000.0
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": pa.array(sq),
                "sum_base_price": pa.array(sp),
                "sum_disc_price": pa.array(sdp),
                "avg_qty": pa.array(sq / n),
                "avg_price": pa.array(sp / n),
                "avg_disc": pa.array(sd / n),
                "count_order": t["count_order"],
            }
        )

    return out.map_batches(finish, batch_format="pyarrow").sort(
        ["l_returnflag", "l_linestatus"]
    )


Q1_SQL = """
select l_returnflag, l_linestatus,
       sum(cast(floor(l_quantity * 100.0 + 0.5) as bigint)) / 100.0 as sum_qty,
       sum(cast(floor(l_extendedprice * 100.0 + 0.5) as bigint)) / 100.0 as sum_base_price,
       sum(cast(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) as bigint)) / 10000.0 as sum_disc_price,
       (sum(cast(floor(l_quantity * 100.0 + 0.5) as bigint)) / 100.0) / cast(count(*) as double) as avg_qty,
       (sum(cast(floor(l_extendedprice * 100.0 + 0.5) as bigint)) / 100.0) / cast(count(*) as double) as avg_price,
       (sum(cast(floor(l_discount * 10000.0 + 0.5) as bigint)) / 10000.0) / cast(count(*) as double) as avg_disc,
       count(*) as count_order
from lineitem
where l_shipdate < TIMESTAMP '1998-09-01'
group by l_returnflag, l_linestatus
order by l_returnflag, l_linestatus
"""


def region_revenue(sf_dir: str) -> ray.data.Dataset:
    """Multi-way broadcast join (Q5-flavoured): lineitem ⋈ supplier ⋈
    nation ⋈ region, grouped revenue per region.  Every dimension is
    broadcast — the fact table never shuffles for the join; only the
    4-row final aggregate shuffles."""
    sup = _broadcast_df(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nat = _broadcast_df(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    reg = _broadcast_df(sf_dir, "region", ["r_regionkey", "r_name"])

    ds = read_table(
        sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice", "l_discount"]
    )

    class JoinDims:
        """The 3 dims collapse (once per actor) into one dense int8
        LUT indexed by suppkey — the join is a numpy take, the partial
        aggregate a bincount; no per-batch pandas merge."""

        def __init__(self):
            import ray

            s = ray.get(sup)
            n = ray.get(nat)
            r = ray.get(reg)
            dim = (
                s.merge(n, left_on="s_nationkey", right_on="n_nationkey")
                .merge(r, left_on="n_regionkey", right_on="r_regionkey")
            )
            self.names = np.sort(r["r_name"].unique())
            code = {v: i for i, v in enumerate(self.names)}
            keys = dim["s_suppkey"].to_numpy(np.int64)
            self.lut = np.full(int(keys.max()) + 1, -1, dtype=np.int8)
            self.lut[keys] = dim["r_name"].map(code).to_numpy(np.int8)

        def __call__(self, t: pa.Table) -> pa.Table:
            sk = t["l_suppkey"].to_numpy()
            code = self.lut[sk]
            rev_c = to_fixed(
                (
                    t["l_extendedprice"].to_numpy()
                    * (1.0 - t["l_discount"].to_numpy())
                ),
                10000.0,
            )
            # per-batch partial: bincount per region code (exact: batch
            # sums stay far below 2^53 so the float64 accumulator is int)
            keep = code >= 0
            sums = np.bincount(
                code[keep], weights=rev_c[keep].astype(np.float64),
                minlength=len(self.names),
            ).astype(np.int64)
            return pa.table(
                {
                    "r_name": pa.array(self.names),
                    "revenue_c": pa.array(sums),
                }
            )

    partials = ds.map_batches(JoinDims, batch_format="pyarrow", concurrency=pool_size())
    # LOW-CARDINALITY final combine: the key space is 5 regions, so the
    # partial stream is ngroups x nblocks narrow rows — a driver-side
    # combine is O(small) and skips Ray's all-to-all fixed cost twice
    # (aggregate + sort), which dominates wall time for tiny keysets.
    # q1_pricing_summary keeps the distributed groupby path; use that
    # pattern when the key cardinality can grow with the data.
    df = partials.to_pandas().groupby("r_name", as_index=False)["revenue_c"].sum()
    df = df.sort_values("r_name").reset_index(drop=True)
    return pa.table(
        {
            "r_name": pa.array(df["r_name"], pa.string()),
            "revenue": pa.array(df["revenue_c"].to_numpy() / 10000.0),
        }
    )


REGION_REVENUE_SQL = """
select r_name,
       sum(cast(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) as bigint)) / 10000.0 as revenue
from lineitem
join supplier on l_suppkey = s_suppkey
join nation on s_nationkey = n_nationkey
join region on n_regionkey = r_regionkey
group by r_name
order by r_name
"""


def top_orders(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    """Join + grouped revenue + global top-k (SO1 sort analog).
    lineitem revenue per order, orders broadcast-joined for metadata,
    top-k by (revenue desc, orderkey).

    NO global sort: the grouped per-order revenues (unique keys per
    block after the aggregate) reduce to <= k rows PER BLOCK with a
    vectorized partial top-k, then one single-partition merge re-ranks
    the O(k * blocks) survivors — the ``top_docs_per_lang`` plan.  An
    all-to-all range sort of one row per order just to keep 20 would
    move the whole key space at 10^12 rows."""
    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )

    def partial(t: pa.Table) -> pa.Table:
        rev_c = to_fixed(
            t["l_extendedprice"].to_numpy() * (1.0 - t["l_discount"].to_numpy()),
            10000.0,
        )
        tb = pa.table({"l_orderkey": t["l_orderkey"], "revenue_c": pa.array(rev_c)})
        df = tb.to_pandas().groupby("l_orderkey", as_index=False)["revenue_c"].sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    # per-order totals fold inside 64 key buckets (a per-order-key
    # Ray aggregate paid ~3.5 ms/group on the order-key domain)
    def bucketed(t: pa.Table) -> pa.Table:
        k_ = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(k_ % np.int64(64)))

    def bucket_fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("l_orderkey", as_index=False)["revenue_c"].sum()

    per_order = (
        li.map_batches(partial, batch_format="pyarrow")
        .map_batches(bucketed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_fold, batch_format="pandas")
    )
    def block_topk(t: pa.Table) -> pa.Table:
        rev = t["revenue_c"].to_numpy(zero_copy_only=False)
        key = t["l_orderkey"].to_numpy(zero_copy_only=False)
        o = np.lexsort((key, -rev))[:k]
        return pa.table(
            {"l_orderkey": pa.array(key[o]), "revenue_c": pa.array(rev[o])}
        )

    topk = (
        per_order.map_batches(block_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(block_topk, batch_format="pyarrow", batch_size=None)
        .map_batches(
            lambda t: pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "revenue": pa.array(t["revenue_c"].to_numpy() / 10000.0),
                }
            ),
            batch_format="pyarrow",
        )
    )

    ords = _broadcast_df(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    )

    class AttachOrder(_BroadcastMerge):
        def __init__(self):
            import ray

            o = ray.get(ords).rename(columns={"o_orderkey": "l_orderkey"})
            super().__init__([(o, "l_orderkey", "inner")])

    return topk.map_batches(AttachOrder, batch_format="pandas", concurrency=1)


def top_orders_sql(k: int = 20) -> str:
    return f"""
with rev as (
  select l_orderkey,
         sum(cast(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) as bigint)) as revenue_c
  from lineitem group by l_orderkey
  order by revenue_c desc, l_orderkey limit {k}
)
select l_orderkey, revenue_c / 10000.0 as revenue, o_custkey, o_orderdate
from rev join orders on l_orderkey = o_orderkey
"""


# --------------------------------------------------------------------------
# semi / anti joins (J7/J8/J9 analogs)
# --------------------------------------------------------------------------

def semi_join_orders_with_lineitems(sf_dir: str) -> ray.data.Dataset:
    """orders that have >=1 lineitem (semi-join with broadcast key set
    — ``filter_images``, ``scripts/coco_split.py:37-40`` analog)."""
    import pyarrow.parquet as pq
    import ray

    keys = pq.read_table(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"])
    keyset = ray.put(np.unique(keys["l_orderkey"].to_numpy()))

    class Semi:
        def __init__(self):
            self.keys = ray.get(keyset)

        def __call__(self, t: pa.Table) -> pa.Table:
            ok = np.isin(t["o_orderkey"].to_numpy(zero_copy_only=False), self.keys)
            return t.filter(pa.array(ok))

    return read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    ).map_batches(Semi, batch_format="pyarrow", concurrency=pool_size())


SEMI_JOIN_SQL = """
select o_orderkey, o_custkey, o_totalprice from orders
where o_orderkey in (select l_orderkey from lineitem)
"""


ANTI_PRICE = 150000.0


def anti_join_customers_without_orders(sf_dir: str) -> ray.data.Dataset:
    """customers with NO high-value order (anti-join with broadcast
    removal set — balance removal, ``scripts/coco_balance.py:180-194``
    analog).  The price predicate keeps the removal set sparse so the
    anti-join is non-degenerate on the dense synthetic keys."""
    import pyarrow.parquet as pq
    import ray

    keys = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    keys = keys.filter(pc.greater(keys["o_totalprice"], ANTI_PRICE))
    keyset = ray.put(np.unique(keys["o_custkey"].to_numpy()))

    class Anti:
        def __init__(self):
            self.keys = ray.get(keyset)

        def __call__(self, t: pa.Table) -> pa.Table:
            bad = np.isin(t["c_custkey"].to_numpy(zero_copy_only=False), self.keys)
            return t.filter(pa.array(~bad))

    return read_table(
        sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment"]
    ).map_batches(Anti, batch_format="pyarrow", concurrency=pool_size())


ANTI_JOIN_SQL = f"""
select c_custkey, c_name, c_mktsegment from customer
where c_custkey not in (select o_custkey from orders where o_totalprice > {ANTI_PRICE!r})
"""


# --------------------------------------------------------------------------
# dense IDs + concat remap (A1/A5 analogs)
# --------------------------------------------------------------------------

def dense_category_ids(sf_dir: str, table: str = "part", col: str = "p_brand") -> ray.data.Dataset:
    """Distinct values of a class column -> dense ids in
    first-appearance order of the table's key order — factorize
    semantics (``scripts/geojson2coco.py:216``), made deterministic by
    ordering on min(rowkey) instead of scan order.

    Two-phase: per-batch partial (value, min_key) -> small groupby ->
    driver-side rank (category count is tiny by construction)."""
    key = {"part": "p_partkey", "documents": "doc_id"}[table]
    ds = read_table(sf_dir, table, columns=[key, col])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby(col, as_index=False)[key].min()
        return pa.Table.from_pandas(df, preserve_index=False)

    firsts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(col)
        .aggregate(Min(key, alias_name="first_key"))
    )
    df = firsts.to_pandas().sort_values("first_key").reset_index(drop=True)
    df["category_id"] = np.arange(len(df), dtype=np.int64)
    return df[[col, "first_key", "category_id"]]


def dense_category_ids_sql(table: str = "part", col: str = "p_brand") -> str:
    key = {"part": "p_partkey", "documents": "doc_id"}[table]
    return f"""
select {col}, first_key, row_number() over (order by first_key) - 1 as category_id
from (select {col}, min({key}) as first_key from {table} group by {col})
"""


def concat_remap(sf_dir: str) -> ray.data.Dataset:
    """Concat-with-ID-remap (A5, ``batch_geojson2coco.py:366-476``
    analog): treat each `source` shard of documents as a COCO file;
    re-assign globally dense row ids by (shard order, doc order) via
    per-shard counts -> prefix-sum offsets; categories (=lang) deduped
    by name keeping first id."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "source", "lang"])
    counts = ds.groupby("source").aggregate(Count(alias_name="n")).to_pandas()
    counts = counts.sort_values("source").reset_index(drop=True)
    counts["offset"] = counts["n"].cumsum().shift(1, fill_value=0)
    offsets = dict(zip(counts["source"], counts["offset"]))

    # offsets table is tiny (one row per shard): capture it in the
    # map_groups closure directly — Ray ships it once per task.
    def remap(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        df["shard_rank"] = np.arange(len(df), dtype=np.int64)
        df["new_id"] = df["shard_rank"] + int(offsets[df["source"].iloc[0]])
        return df

    return ds.groupby("source").map_groups(remap, batch_format="pandas")


CONCAT_REMAP_SQL = """
with ranked as (
  select doc_id, source, lang,
         row_number() over (partition by source order by doc_id) - 1 as shard_rank
  from documents
), offs as (
  select source, count(*) as n from documents group by source
), cum as (
  select source,
         sum(n) over (order by source rows between unbounded preceding and 1 preceding) as offset
  from offs
)
select r.doc_id, r.source, r.lang, cast(r.shard_rank as bigint) as shard_rank,
       cast(r.shard_rank + coalesce(c.offset, 0) as bigint) as new_id
from ranked r join cum c on r.source = c.source
"""


def roboflow_concat(sf_dir: str) -> ray.data.Dataset:
    """Roboflow-compatible concat rewrite
    (``batch_geojson2coco.py:492-519``): the reference flattens the
    concatenated dataset's nested per-shard image paths into one
    directory by rewriting ``/tile_`` -> ``_tile_`` in every
    ``file_name``.  Here: the A5 concat/remap output gets its nested
    path (``tiles/<source>/tile_<new_id>.png``) and the flattened
    Roboflow path, both built with vectorized Arrow string kernels —
    no per-row Python, no driver materialization (the reference does a
    whole-file ``str.replace`` on the JSON document; the engine keeps
    it a streaming column rewrite)."""
    import pyarrow.compute as pc

    ds = concat_remap(sf_dir)

    def rewrite(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["new_id"], pa.string())
        # last arg of binary_join_element_wise is the SEPARATOR
        path = pc.binary_join_element_wise(
            pa.scalar("tiles/"), t["source"], pa.scalar("/tile_"), ids,
            pa.scalar(".png"), pa.scalar(""),
        )
        flat = pc.replace_substring(path, pattern="/tile_", replacement="_tile_")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "source": t["source"],
                "new_id": t["new_id"],
                "file_name": path,
                "rf_file_name": flat,
            }
        )

    return ds.map_batches(rewrite, batch_format="pyarrow")


ROBOFLOW_CONCAT_SQL = f"""
with base as ({CONCAT_REMAP_SQL.strip()}),
named as (
  select doc_id, source, new_id,
         'tiles/' || source || '/tile_' || cast(new_id as varchar) || '.png'
           as file_name
  from base
)
select doc_id, source, new_id, file_name,
       replace(file_name, '/tile_', '_tile_') as rf_file_name
from named
"""


# --------------------------------------------------------------------------
# events: tumbling window aggregate (streaming-shaped)
# --------------------------------------------------------------------------

def _fold_window_partials(partials: ray.data.Dataset) -> ray.data.Dataset:
    """BOUNDED-CARDINALITY driver fold shared by the window aggregates:
    partial rows per block are capped by event_types x windows-in-range
    (time-bounded, not corpus-bounded) and fixed-point sums are
    associative, so the final combine folds driver-side instead of
    paying the all-to-all fixed cost twice (aggregate + sort) for a
    few thousand groups.  High-cardinality keys belong on the
    distributed groupby path (events_sessionize keeps it)."""
    pdf = partials.to_pandas()
    g = (
        pdf.groupby(["event_type", "window_start_s"], as_index=False)
        .agg(n=("n", "sum"), sum_value_u=("sum_value_u", "sum"))
        .sort_values(["event_type", "window_start_s"])
        .reset_index(drop=True)
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array(g["event_type"], pa.string()),
                "window_start_s": pa.array(g["window_start_s"].to_numpy(np.int64)),
                "n": pa.array(g["n"].to_numpy(np.int64)),
                "sum_value": pa.array(
                    g["sum_value_u"].to_numpy(np.int64) / 1_000_000.0
                ),
            }
        )
    )


def events_window(sf_dir: str, window_s: int = 3600) -> ray.data.Dataset:
    """Tumbling-window aggregate over the events log: per (event_type,
    hour window) count + sum(value).  Window key computed vectorized
    in-batch (epoch floor-div), then partial-aggregated before the
    groupby shuffle."""
    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        epoch_us = t["ts"].cast(pa.int64()).to_numpy()
        win = (epoch_us // (window_s * 1_000_000)) * window_s
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pandas(),
                "window_start_s": win,
                "value_u": to_fixed(t["value"].to_numpy(), 1_000_000.0),
            }
        )
        out = df.groupby(["event_type", "window_start_s"], as_index=False).agg(
            n=("value_u", "size"), sum_value_u=("value_u", "sum")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return _fold_window_partials(ds.map_batches(partial, batch_format="pyarrow"))


EVENTS_WINDOW_SQL = """
select event_type,
       cast(floor(epoch_us(ts) / 3600000000.0) as bigint) * 3600 as window_start_s,
       count(*) as n,
       sum(cast(floor(value * 1000000.0 + 0.5) as bigint)) / 1000000.0 as sum_value
from events
group by event_type, window_start_s
order by event_type, window_start_s
"""


def q6_filter_aggregate(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q6-flavoured pure filter + global aggregate: the
    no-shuffle degenerate case (per-batch partial -> one-row final).
    Shows the predicate/column pruning path at its fastest."""
    import pyarrow.dataset as pads

    ds = read_table(
        sf_dir,
        "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        # predicate PUSHDOWN: row groups outside the shipdate year (or
        # the discount band) are pruned by parquet statistics at the
        # scan; the exact in-batch mask below still applies
        filter=(
            (pads.field("l_shipdate") >= pa.scalar(np.datetime64("1996-01-01", "us")))
            & (pads.field("l_shipdate") < pa.scalar(np.datetime64("1997-01-01", "us")))
            & (pads.field("l_discount") >= 0.05)
            & (pads.field("l_discount") <= 0.07)
        ),
    )

    def partial(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].to_numpy()
        disc = t["l_discount"].to_numpy()
        qty = t["l_quantity"].to_numpy()
        price = t["l_extendedprice"].to_numpy()
        m = (
            (ship >= np.datetime64("1996-01-01", "us"))
            & (ship < np.datetime64("1997-01-01", "us"))
            & (disc >= 0.05)
            & (disc <= 0.07)
            & (qty < 24.0)
        )
        rev_c = to_fixed(price[m] * disc[m], 10000.0)
        return pa.table(
            {
                "revenue_c": pa.array([int(rev_c.sum())], type=pa.int64()),
                "n": pa.array([int(m.sum())], type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("revenue_c", alias_name="revenue_c"), Sum("n", alias_name="n")
    )
    import pandas as _pd

    return _pd.DataFrame(
        {
            "revenue": [agg["revenue_c"] / 10000.0],
            "n_rows": [int(agg["n"])],
        }
    )


Q6_SQL = """
select sum(cast(floor(l_extendedprice * l_discount * 10000.0 + 0.5) as bigint)) / 10000.0 as revenue,
       cast(count(*) as bigint) as n_rows
from lineitem
where l_shipdate >= TIMESTAMP '1996-01-01' and l_shipdate < TIMESTAMP '1997-01-01'
  and l_discount between 0.05 and 0.07 and l_quantity < 24
"""


def events_hopping_window(
    sf_dir: str, window_s: int = 3600, hop_s: int = 900
) -> ray.data.Dataset:
    """Hopping (sliding) window aggregate: each event lands in
    window_s/hop_s overlapping windows — 1->N window-key expansion
    inside the batch, then partial-aggregate before the shuffle
    (engine-new streaming-shaped operator; the tumbling case is
    :func:`events_window`)."""
    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])
    k = window_s // hop_s

    def partial(t: pa.Table) -> pa.Table:
        epoch_us = t["ts"].cast(pa.int64()).to_numpy()
        ts_s = epoch_us // 1_000_000
        base = (ts_s // hop_s) * hop_s  # latest window start containing event
        n = len(ts_s)
        starts = np.repeat(base, k) - np.tile(
            np.arange(k, dtype=np.int64) * hop_s, n
        )
        keep = np.repeat(ts_s, k) < starts + window_s
        etype = np.repeat(t["event_type"].to_numpy(zero_copy_only=False), k)
        val_u = np.repeat(to_fixed(t["value"].to_numpy(), 1_000_000.0), k)
        df = pd.DataFrame(
            {
                "event_type": etype[keep],
                "window_start_s": starts[keep],
                "value_u": val_u[keep],
            }
        )
        out = df.groupby(["event_type", "window_start_s"], as_index=False).agg(
            n=("value_u", "size"), sum_value_u=("value_u", "sum")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return _fold_window_partials(ds.map_batches(partial, batch_format="pyarrow"))


EVENTS_HOPPING_SQL = """
with hops as (select unnest(range(4)) as h),
sec as (
  select event_type, value,
         cast(floor(epoch_us(ts) / 1000000.0) as bigint) as ts_s
  from events
)
select event_type,
       cast(floor(ts_s / 900.0) as bigint) * 900 - h.h * 900 as window_start_s,
       count(*) as n,
       sum(cast(floor(value * 1000000.0 + 0.5) as bigint)) / 1000000.0 as sum_value
from sec cross join hops h
where ts_s < cast(floor(ts_s / 900.0) as bigint) * 900 - h.h * 900 + 3600
group by event_type, window_start_s
order by event_type, window_start_s
"""


def distinct_sources(sf_dir: str) -> ray.data.Dataset:
    """Distinct operator (``ds.unique`` analog via per-batch partial
    distinct -> groupby): distinct (source, lang) pairs."""
    ds = read_table(sf_dir, "documents", columns=["source", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .count()
        .drop_columns(["count()"])
        .sort(["source", "lang"])
    )


DISTINCT_SQL = """
select distinct source, lang from documents order by source, lang
"""


def events_sessionize(sf_dir: str, gap_s: int = 1800) -> ray.data.Dataset:
    """Session windows per user: events sorted by ts within user; a
    >gap_s silence starts a new session.  The reference has no
    streaming operators (SURVEY.md §2 'streaming-only: N/A'); this is
    the engine-new stream-shaped aggregate over the ordered log.

    Scale shape: the shuffle key is ``hash(user_id) % 64``, NOT the
    raw unbounded user_id — one Ray group-task per COARSE BUCKET
    (same plan as events_funnel/events_retention), and the per-bucket
    kernel is one lexsort + cumsum over ALL of the bucket's users at
    once (session boundary = user change OR time gap), so 10^9 users
    cost 64 vectorized tasks, not 10^9 tiny ones."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])
    n_buckets = 64

    def tag(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((uid % n_buckets).astype(np.int64))
        )

    def sess(df: pd.DataFrame) -> pd.DataFrame:
        # (user, ts, value) lexsort: the (ts, value) tie-break matches
        # the SQL window ordering exactly
        df = df.sort_values(["user_id", "ts", "value"], kind="mergesort")
        uid = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].astype("int64").to_numpy() // 1_000_000
        new = np.ones(len(df), dtype=np.int64)
        new[1:] = (uid[1:] != uid[:-1]) | ((ts[1:] - ts[:-1]) > gap_s)
        csum = np.cumsum(new)
        # per-user session ids start at 0: subtract the cumsum value
        # at each user's first row (broadcast via forward-filled base)
        base = np.where(new.astype(bool) & np.concatenate(
            [[True], uid[1:] != uid[:-1]]), csum, 0)
        base = np.maximum.accumulate(base)
        sid = csum - base
        out = pd.DataFrame(
            {
                "user_id": uid,
                "session_id": sid,
                "ts_s": ts,
                "value_u": to_fixed(df["value"].to_numpy(), 1_000_000.0),
            }
        )
        g = out.groupby(["user_id", "session_id"], as_index=False).agg(
            session_start_s=("ts_s", "min"),
            session_end_s=("ts_s", "max"),
            n_events=("ts_s", "size"),
            sum_value_u=("value_u", "sum"),
        )
        g["sum_value"] = g["sum_value_u"] / 1_000_000.0
        return g[
            ["user_id", "session_id", "session_start_s", "session_end_s", "n_events", "sum_value"]
        ]

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sess, batch_format="pandas")
    )


EVENTS_SESSIONIZE_SQL = """
with e as (
  select user_id, ts,
         cast(floor(epoch_us(ts) / 1000000.0) as bigint) as ts_s, value,
         lag(cast(floor(epoch_us(ts) / 1000000.0) as bigint))
           over (partition by user_id order by ts, value) as prev_ts
  from events
), marked as (
  select *, case when prev_ts is null or ts_s - prev_ts > 1800 then 1 else 0 end as is_new
  from e
), sess as (
  select *, sum(is_new) over (partition by user_id order by ts, value
                              rows between unbounded preceding and current row) - 1 as session_id
  from marked
)
select user_id, cast(session_id as bigint) as session_id,
       min(ts_s) as session_start_s, max(ts_s) as session_end_s,
       count(*) as n_events,
       sum(cast(floor(value * 1000000.0 + 0.5) as bigint)) / 1000000.0 as sum_value
from sess group by user_id, session_id
"""


# --------------------------------------------------------------------------
# as-of join + banded range join (custom operators Ray Data lacks)
# --------------------------------------------------------------------------

ASOF_BUCKETS = 64        # coarse shuffle key over user space
RANGE_WINDOW_S = 21600   # range-join half-window (6 h)


def events_asof(
    sf_dir: str, trigger: str = "click", target: str = "purchase"
) -> ray.data.Dataset:
    """AS-OF JOIN: each ``target`` event joins the SAME USER's latest
    ``trigger`` event at or before its timestamp (ties: max trigger
    event_id).  Ray Data has no asof join; this is the union-merge
    plan: both sides tagged into one narrow stream, one groupby on a
    coarse user bucket co-locates each user's rows, and the per-bucket
    kernel is a single lexsort + forward-fill (np.maximum.accumulate)
    — NO per-user loop, so a bucket with a million users costs one
    vectorized pass.  Partitioning assumption: a user's rows fit one
    group (the per-user stream is small; users per bucket are bounded
    by the bucket count chosen per cluster size)."""
    ds = read_table(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"]
    )

    def tag(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        keep = pc.or_(pc.equal(et, trigger), pc.equal(et, target))
        t = t.filter(keep)
        side = pc.if_else(
            pc.equal(t["event_type"], trigger),
            pa.scalar(0, pa.int64()),
            pa.scalar(1, pa.int64()),
        )
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts_us": t["ts"].cast(pa.int64()),
                "event_id": t["event_id"],
                "side": side,
                "bucket": pa.array((uid % ASOF_BUCKETS).astype(np.int64)),
            }
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy(np.int64)
        ts = df["ts_us"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        side = df["side"].to_numpy(np.int64)
        o = np.lexsort((eid, side, ts, uid))
        uid, ts, eid, side = uid[o], ts[o], eid[o], side[o]
        # forward-fill the last trigger row index; triggers sort BEFORE
        # targets at equal (user, ts) so "at or before" includes ties
        idx = np.where(side == 0, np.arange(len(uid)), -1)
        last = np.maximum.accumulate(idx)
        tgt = np.nonzero(side == 1)[0]
        ok = tgt[(last[tgt] >= 0)]
        ok = ok[uid[last[ok]] == uid[ok]]
        tr = last[ok]
        return pd.DataFrame(
            {
                "event_id": eid[ok],
                "user_id": uid[ok],
                "trigger_id": eid[tr],
                "lag_us": ts[ok] - ts[tr],
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pandas")
    )


def events_asof_sql(trigger: str = "click", target: str = "purchase") -> str:
    return f"""
with pairs as (
  select p.event_id, p.user_id, t.event_id as trigger_id,
         epoch_us(p.ts) - epoch_us(t.ts) as lag_us
  from events p
  join events t on t.user_id = p.user_id and t.ts <= p.ts
  where t.event_type = '{trigger}' and p.event_type = '{target}'
)
select event_id, user_id, trigger_id, cast(lag_us as bigint) as lag_us
from pairs
qualify row_number() over (partition by event_id
                           order by lag_us asc, trigger_id desc) = 1
"""


def events_range_join(
    sf_dir: str, left: str = "view", right: str = "error",
    window_s: int = RANGE_WINDOW_S,
) -> ray.data.Dataset:
    """BANDED RANGE JOIN: pairs of same-user (``left``, ``right``)
    events within +/- ``window_s``.  The inequality join becomes an
    equi-join by TIME BANDING (band = ts // window): the left side
    replicates into its band and both neighbours, the right side maps
    to its own band once, so every qualifying pair meets in EXACTLY
    one (user, band) group (the right event's band) — no dedupe pass.
    Groups are co-located by one coarse-bucket groupby and expanded
    vectorized per in-group run."""
    band_us = window_s * 1_000_000
    ds = read_table(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"]
    )

    def tag(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        keep = pc.or_(pc.equal(et, left), pc.equal(et, right))
        t = t.filter(keep)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].cast(pa.int64()).to_numpy()
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        is_l = pc.equal(t["event_type"], left).to_numpy(zero_copy_only=False)
        band = ts // band_us
        # left rows -> 3 bands; right rows -> 1 band
        rep = np.where(is_l, 3, 1)
        ruid = np.repeat(uid, rep)
        rts = np.repeat(ts, rep)
        reid = np.repeat(eid, rep)
        rside = np.repeat((~is_l).astype(np.int64), rep)
        base = np.repeat(band, rep)
        # vectorized band offsets: position within each row's
        # replication run (0..rep-1), shifted to -1/0/+1 for left rows
        cum = np.cumsum(rep)
        pos = np.arange(int(cum[-1]) if len(cum) else 0) - np.repeat(cum - rep, rep)
        off = np.where(np.repeat(is_l, rep), pos - 1, 0)
        rband = base + off
        key = ruid * np.int64(1000003) + rband
        return pa.table(
            {
                "user_id": pa.array(ruid),
                "band": pa.array(rband),
                "ts_us": pa.array(rts),
                "event_id": pa.array(reid),
                "side": pa.array(rside),
                "bucket": pa.array(
                    (key % np.int64(ASOF_BUCKETS) + ASOF_BUCKETS)
                    % np.int64(ASOF_BUCKETS)
                ),
            }
        )

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a": pd.Series(dtype=np.int64),
                "b": pd.Series(dtype=np.int64),
                "user_id": pd.Series(dtype=np.int64),
                "dt_us": pd.Series(dtype=np.int64),
            }
        )
        uid = df["user_id"].to_numpy(np.int64)
        band = df["band"].to_numpy(np.int64)
        ts = df["ts_us"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        side = df["side"].to_numpy(np.int64)
        o = np.lexsort((eid, side, band, uid))
        uid, band, ts, eid, side = uid[o], band[o], ts[o], eid[o], side[o]
        new = np.ones(len(uid), dtype=bool)
        new[1:] = (uid[1:] != uid[:-1]) | (band[1:] != band[:-1])
        starts = np.nonzero(new)[0]
        gid = np.cumsum(new) - 1
        tot = np.bincount(gid)
        nl = np.bincount(gid, weights=(side == 0)).astype(np.int64)
        nr = tot - nl
        # fully-vectorized per-group left×right cross product: no
        # Python loop over (user, band) groups.  Pair k of group g maps
        # to left row starts[g] + k // nr[g] and right row
        # starts[g] + nl[g] + k % nr[g] (lefts sort before rights).
        p = nl * nr
        total = int(p.sum())
        if total == 0:
            return empty
        gg = np.repeat(np.arange(len(p)), p)
        k = np.arange(total) - np.repeat(np.cumsum(p) - p, p)
        ai = starts[gg] + k // nr[gg]
        bi = starts[gg] + nl[gg] + k % nr[gg]
        dt = ts[bi] - ts[ai]
        ok = np.abs(dt) <= band_us
        if not ok.any():
            return empty
        return pd.DataFrame(
            {
                "a": eid[ai[ok]],
                "b": eid[bi[ok]],
                "user_id": uid[ai[ok]],
                "dt_us": dt[ok],
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(expand, batch_format="pandas")
    )


def events_range_join_sql(
    left: str = "view", right: str = "error", window_s: int = RANGE_WINDOW_S
) -> str:
    return f"""
select v.event_id as a, e.event_id as b, v.user_id,
       cast(epoch_us(e.ts) - epoch_us(v.ts) as bigint) as dt_us
from events v
join events e on v.user_id = e.user_id
where v.event_type = '{left}' and e.event_type = '{right}'
  and abs(epoch_us(e.ts) - epoch_us(v.ts)) <= {window_s * 1_000_000}
"""


# --------------------------------------------------------------------------
# exact distributed quantiles (histogram refinement) + grouped top-k
# --------------------------------------------------------------------------

QUANTILE_BINS = 4096
QUANTILE_CAND_LIMIT = 1 << 20  # max values collected for the exact tail sort


def quantiles(
    sf_dir: str, ps: tuple[float, ...] = (0.5, 0.9, 0.99)
) -> "pa.Table":
    """Exact global quantiles of lineitem.l_extendedprice WITHOUT a
    global sort: streaming histogram refinement.

    Pass 1: min/max/count (built-in tree aggregate).  Pass 2: one
    4096-bin histogram built per batch (np.bincount) and coarsely
    re-aggregated (64-bucket groupby, vectorized pandas sum inside) —
    never a fine-grained Ray groupby.  The driver cumsums the 4096
    ints, locates each quantile's bin, and pass 3 collects ONLY the
    values inside target bins (expected n/4096 each; a refinement loop
    re-histograms any bin that still exceeds QUANTILE_CAND_LIMIT, so
    driver memory is bounded even under extreme value skew).  Rank
    semantics match DuckDB ``quantile_disc``: 0-based index
    max(0, ceil(p*n)-1) of the sorted values."""
    col = "l_extendedprice"
    ds = read_table(sf_dir, "lineitem", columns=[col])
    out = _exact_quantiles(ds, col, ps)
    return pa.table(
        {
            "p": pa.array(list(ps), pa.float64()),
            "value": pa.array([out[p] for p in ps], pa.float64()),
        }
    )


def _exact_quantiles(
    ds: ray.data.Dataset, col: str, ps: tuple[float, ...]
) -> dict[float, float]:
    """The streaming-histogram exact-quantile solver of
    :func:`quantiles`, over any (lazy, re-executable) dataset/column."""
    agg = ds.aggregate(Min(col), Max(col), Count())
    lo, hi, n = float(agg[f"min({col})"]), float(agg[f"max({col})"]), int(agg["count()"])
    # DuckDB quantile_disc rank: smallest element whose cumulative
    # count reaches ceil(p*n) -> 0-based rank max(0, ceil(p*n)-1)
    targets = {p: max(0, int(np.ceil(p * n)) - 1) for p in ps}
    out = {}

    def solve(
        lo: float,
        hi: float,
        base_rank: int,
        ranks: dict[float, int],
        sel=None,
    ):
        """Quantiles whose value lies in [lo, hi], given the count of
        values below lo (base_rank) and each p's global rank.

        ``sel(v) -> bool mask`` is this subproblem's MEMBERSHIP test.
        The recursive pass reuses the PARENT's bin assignment (not an
        interval re-filter): FP-recomputed bin edges can disagree with
        floor((v-lo)/width) at the boundaries, so an interval filter
        would count a slightly different multiset than the histogram
        that chose the bin, shifting in-bin ranks by ±1 (ADVICE r2)."""
        if sel is None:
            def sel(v, lo=lo, hi=hi):  # top level: true min/max bounds
                return (v >= lo) & (v <= hi)
        if lo == hi:
            for p in ranks:
                out[p] = lo
            return
        width = (hi - lo) / QUANTILE_BINS

        def bin_of(v: np.ndarray) -> np.ndarray:
            return np.clip(
                ((v - lo) / width).astype(np.int64), 0, QUANTILE_BINS - 1
            )

        def hist(t: pa.Table) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False)
            v = v[sel(v)]
            b = bin_of(v)
            cnt = np.bincount(b, minlength=QUANTILE_BINS).astype(np.int64)
            nz = np.nonzero(cnt)[0]
            return pa.table(
                {
                    "bin": pa.array(nz.astype(np.int64)),
                    "cnt": pa.array(cnt[nz]),
                    "bucket": pa.array(nz % np.int64(64)),
                }
            )

        def bucket_sum(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("bin", as_index=False)["cnt"].sum()
            return pd.DataFrame(
                {"bin": g["bin"].to_numpy(np.int64), "cnt": g["cnt"].to_numpy(np.int64)}
            )

        part = (
            ds.map_batches(hist, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(bucket_sum, batch_format="pandas")
            .to_pandas()
        )
        full = np.zeros(QUANTILE_BINS, dtype=np.int64)
        full[part["bin"].to_numpy(np.int64)] = part["cnt"].to_numpy(np.int64)
        below = base_rank + np.concatenate([[0], np.cumsum(full)[:-1]])
        # group the pending quantiles by the bin their rank falls in
        by_bin: dict[int, dict[float, int]] = {}
        for p, r in ranks.items():
            b = int(np.searchsorted(below, r, side="right") - 1)
            by_bin.setdefault(b, {})[p] = r
        for b, sub in by_bin.items():
            blo = lo + b * width
            bhi = hi if b == QUANTILE_BINS - 1 else lo + (b + 1) * width

            def in_bin(v: np.ndarray, b=b) -> np.ndarray:
                # parent's membership AND parent's bin test: counts the
                # exact multiset the histogram above counted
                return sel(v) & (bin_of(v) == b)

            if full[b] > QUANTILE_CAND_LIMIT:
                solve(blo, bhi, int(below[b]), sub, sel=in_bin)
                continue

            def collect(t: pa.Table, in_bin=in_bin) -> pa.Table:
                v = t[col].to_numpy(zero_copy_only=False)
                return pa.table({"v": pa.array(v[in_bin(v)])})

            vals = np.sort(
                ds.map_batches(collect, batch_format="pyarrow")
                .to_pandas()["v"]
                .to_numpy()
            )
            for p, r in sub.items():
                out[p] = float(vals[r - int(below[b])])

    solve(lo, hi, 0, targets)
    return out


QUANTILES_SQL = """
select 0.5 as p, quantile_disc(l_extendedprice, 0.5) as value from lineitem
union all
select 0.9, quantile_disc(l_extendedprice, 0.9) from lineitem
union all
select 0.99, quantile_disc(l_extendedprice, 0.99) from lineitem
"""


def mad(sf_dir: str) -> "pa.Table":
    """Median absolute deviation of lineitem.l_extendedprice — the
    robust dispersion statistic an outlier-filtering pass keys on
    (threshold = median ± k * MAD).  Both medians are EXACT discrete
    quantiles (quantile_disc law), computed sort-free by two runs of
    the :func:`_exact_quantiles` streaming-histogram solver: one over
    the raw column, one over the derived |x - median| column (a lazy
    ``map_batches`` the second solve re-executes per pass — deviations
    are never materialized).  float64 |x - m| is bit-identical in
    numpy and DuckDB, so the discrete ranks select identical values."""
    col = "l_extendedprice"
    ds = read_table(sf_dir, "lineitem", columns=[col])
    med = _exact_quantiles(ds, col, (0.5,))[0.5]

    def dev(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"dev": pa.array(np.abs(v - med))})

    dev_ds = ds.map_batches(dev, batch_format="pyarrow")
    m2 = _exact_quantiles(dev_ds, "dev", (0.5,))[0.5]
    return pa.table(
        {
            "median": pa.array([med], pa.float64()),
            "mad": pa.array([m2], pa.float64()),
        }
    )


MAD_SQL = """
with m as (select quantile_disc(l_extendedprice, 0.5) as med from lineitem)
select (select med from m) as median,
       (select quantile_disc(abs(l_extendedprice - (select med from m)), 0.5)
        from lineitem) as mad
"""


TOPK_PER_GROUP_K = 3


def top_docs_per_lang(sf_dir: str, k: int = TOPK_PER_GROUP_K) -> ray.data.Dataset:
    """Grouped top-k WITHOUT a global sort: top ``k`` longest documents
    per lang (ties: min doc_id).  Per-batch partial top-k first — one
    lexsort + segment-rank scan keeps <= k rows per lang per batch —
    so the groupby only shuffles O(k * langs * blocks) narrow rows,
    never the corpus."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        lang = t["lang"].to_numpy(zero_copy_only=False)
        n = t["n_chars"].to_numpy(zero_copy_only=False)
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        o = np.lexsort((d, -n, lang))
        lang, n, d = lang[o], n[o], d[o]
        new = np.ones(len(lang), dtype=bool)
        new[1:] = lang[1:] != lang[:-1]
        gid = np.cumsum(new) - 1
        starts = np.nonzero(new)[0]
        rank = np.arange(len(lang)) - starts[gid]
        keep = rank < k
        return pa.table(
            {
                "lang": pa.array(lang[keep]),
                "doc_id": pa.array(d[keep]),
                "n_chars": pa.array(n[keep]),
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["lang", "n_chars", "doc_id"], ascending=[True, False, True])
        df["rank"] = df.groupby("lang").cumcount() + 1
        df = df[df["rank"] <= k]
        return df.astype({"rank": np.int64})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
    )


def top_docs_per_lang_sql(k: int = TOPK_PER_GROUP_K) -> str:
    return f"""
select lang, doc_id, n_chars, cast(rank as bigint) as rank from (
  select lang, doc_id, n_chars,
         row_number() over (partition by lang
                            order by n_chars desc, doc_id) as rank
  from documents
) where rank <= {k}
"""


GROUPED_QUANTILE_PS = (0.5, 0.9, 0.99)


def grouped_quantiles(sf_dir: str) -> ray.data.Dataset:
    """Exact per-lang quantiles of documents.n_chars WITHOUT sorting
    rows: n_chars is a bounded integer, so each batch reduces to its
    distinct (lang, value, count) triples (a counting-sort partial),
    one groupby co-locates each lang's value histogram, and the
    quantile is read off the cumulative counts.  Shuffled rows are
    bounded by langs x distinct-values x blocks — independent of the
    corpus row count.  Rank semantics = DuckDB quantile_disc
    (0-based index max(0, ceil(p*n)-1))."""
    ds = read_table(sf_dir, "documents", columns=["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        lang = t["lang"].to_numpy(zero_copy_only=False)
        v = t["n_chars"].to_numpy(zero_copy_only=False)
        lu, linv = np.unique(lang, return_inverse=True)
        key = linv.astype(np.int64) * (1 << 32) | v.astype(np.int64)
        ku, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "lang": pa.array(lu[(ku >> 32).astype(np.int64)]),
                "value": pa.array((ku & 0xFFFFFFFF).astype(np.int64)),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("value")["cnt"].sum().sort_index()
        vals = g.index.to_numpy(np.int64)
        cum = g.to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        out = {"lang": [df["lang"].iloc[0]]}
        for p in GROUPED_QUANTILE_PS:
            r = max(0, int(np.ceil(p * n)) - 1)
            out[f"p{int(p * 100)}"] = [int(vals[np.searchsorted(cum, r + 1)])]
        return pd.DataFrame(out)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(finish, batch_format="pandas")
    )


GROUPED_QUANTILES_SQL = """
select lang,
       cast(quantile_disc(n_chars, 0.5) as bigint) as p50,
       cast(quantile_disc(n_chars, 0.9) as bigint) as p90,
       cast(quantile_disc(n_chars, 0.99) as bigint) as p99
from documents group by lang
"""


def grouped_mad(sf_dir: str) -> ray.data.Dataset:
    """Per-lang EXACT median + MAD of documents.n_chars — the robust
    per-group outlier threshold a language-stratified quality filter
    keys on (keep iff |n_chars - median| <= k * MAD), in ONE data
    pass: n_chars is a bounded integer, so each batch reduces to its
    distinct (lang, value, count) triples and each lang group solves
    BOTH medians from its value histogram (the deviation histogram
    |v - med| is a re-keying of the same counts — no second scan,
    unlike the global float-domain :func:`mad` which must re-stream).
    Rank semantics = DuckDB quantile_disc.  Shuffled rows bounded by
    langs x distinct lengths x blocks, corpus-size-independent."""
    ds = read_table(sf_dir, "documents", columns=["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        lang = t["lang"].to_numpy(zero_copy_only=False)
        v = t["n_chars"].to_numpy(zero_copy_only=False)
        lu, linv = np.unique(lang, return_inverse=True)
        key = linv.astype(np.int64) * (1 << 32) | v.astype(np.int64)
        ku, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "lang": pa.array(lu[(ku >> 32).astype(np.int64)]),
                "value": pa.array((ku & 0xFFFFFFFF).astype(np.int64)),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    def _disc_median(vals: np.ndarray, cnts: np.ndarray) -> int:
        cum = cnts.cumsum()
        r = max(0, int(np.ceil(0.5 * int(cum[-1]))) - 1)
        return int(vals[np.searchsorted(cum, r + 1)])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("value")["cnt"].sum().sort_index()
        vals = g.index.to_numpy(np.int64)
        cnts = g.to_numpy(np.int64)
        med = _disc_median(vals, cnts)
        dev = np.abs(vals - med)
        o = np.argsort(dev, kind="stable")
        # equal deviations from both sides of the median merge
        dv, start = np.unique(dev[o], return_index=True)
        dc = np.add.reduceat(cnts[o], start)
        madv = _disc_median(dv, dc)
        return pd.DataFrame(
            {
                "lang": [df["lang"].iloc[0]],
                "median": np.array([med], np.int64),
                "mad": np.array([madv], np.int64),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(finish, batch_format="pandas")
    )


GROUPED_MAD_SQL = """
with m as (
  select lang, cast(quantile_disc(n_chars, 0.5) as bigint) as median
  from documents group by lang
)
select d.lang, m.median,
       cast(quantile_disc(abs(d.n_chars - m.median), 0.5) as bigint) as mad
from documents d join m on d.lang = m.lang
group by d.lang, m.median
"""


# --------------------------------------------------------------------------
# DDSketch-style mergeable quantile sketch (the approximate SCALE path
# beside the exact streaming-histogram solver of `quantiles`)
# --------------------------------------------------------------------------

SKETCH_ALPHA = 0.01  # guaranteed relative value error per quantile
SKETCH_PS = (0.5, 0.9, 0.99)


def sketch_quantiles(
    sf_dir: str, alpha: float = SKETCH_ALPHA, ps: tuple = SKETCH_PS
) -> "pd.DataFrame":
    """Quantiles of lineitem.l_extendedprice from a DDSketch-style
    log-bucket sketch (Masson et al., VLDB'19 — public paper): bucket
    index ceil(ln v / ln gamma), gamma = (1+a)/(1-a), guarantees the
    returned value is within relative error ``alpha`` of the exact
    quantile.  The sketch is a pure bucket-count table, so it merges
    by ADDITION — order- and partition-independent (the mergeability
    the exact solver lacks: `quantiles` re-streams the data per
    refinement pass, this reads it ONCE and the per-node state is
    O(log(range)/alpha) integers regardless of corpus size.)

    One pass, one bounded-key aggregate: each batch emits its distinct
    (bucket, count) partials (domain ~ ln(vmax/vmin)/ln(gamma) — ~600
    buckets for TPC-H prices at alpha=0.01), one 64-way coarse fold
    co-locates them, and the driver reads quantiles off the ~600-row
    cumulative table.  Approximate by construction -> rows-only gate;
    the error bound and merge associativity are pytest-enforced
    (tests/test_quantiles_topk.py)."""
    gamma = (1.0 + alpha) / (1.0 - alpha)
    lg = np.log(gamma)
    ds = read_table(sf_dir, "lineitem", columns=["l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        v = t["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        if len(v) == 0 or float(v.min()) <= 0.0:
            raise ValueError("sketch_quantiles: requires positive values")
        idx = np.ceil(np.log(v) / lg).astype(np.int64)
        u, c = np.unique(idx, return_counts=True)
        return pa.table(
            {
                "bucket_idx": pa.array(u),
                "cnt": pa.array(c.astype(np.int64)),
                "kb": pa.array(u % np.int64(64)),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("bucket_idx", sort=False, as_index=False)["cnt"].sum()
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    table = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("kb")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()  # O(log(range)/alpha) rows — driver-safe at any scale
        .sort_values("bucket_idx")
    )
    return sketch_table_quantiles(table, gamma, ps)


def sketch_table_quantiles(
    table: "pd.DataFrame", gamma: float, ps: tuple
) -> "pd.DataFrame":
    """Read quantile estimates off a merged (bucket_idx, cnt) sketch
    table: bucket b covers (gamma^(b-1), gamma^b]; the log-midpoint
    2*gamma^b/(gamma+1) is within relative error alpha of every value
    in the bucket.  Split out so tests can merge shard sketches by
    addition and assert associativity."""
    idx = table["bucket_idx"].to_numpy(np.int64)
    cnt = table["cnt"].to_numpy(np.int64)
    cum = cnt.cumsum()
    n = int(cum[-1])
    out_p, out_v = [], []
    for p in ps:
        r = max(0, int(np.ceil(p * n)) - 1)
        b = int(idx[np.searchsorted(cum, r + 1)])
        out_p.append(p)
        out_v.append(2.0 * gamma**b / (gamma + 1.0))
    return pd.DataFrame({"p": np.array(out_p), "value": np.array(out_v)})


# --------------------------------------------------------------------------
# exact global rank (distributed row_number without a global sort)
# --------------------------------------------------------------------------


def global_rank(sf_dir: str) -> ray.data.Dataset:
    """EXACT global ``row_number() over (order by n_chars desc,
    doc_id)`` — curriculum-ordering ranks for every document — with no
    all-to-all sort of the corpus.

    Scale shape (value-histogram offsets + per-group local ranks):

    1. one narrow ``groupby(n_chars).count`` (key cardinality is
       bounded by max document length — a driver-safe table; were the
       key continuous, the same recursive-histogram trick as
       ``quantiles`` applies);
    2. the driver prefix-sums counts in key order -> ``base[v]`` =
       number of rows ranked strictly before any row with
       ``n_chars == v`` — broadcast once via ``ray.put``;
    3. ``groupby(n_chars).map_groups`` assigns ``base + local rank by
       doc_id`` inside each equal-key group.  Groups are value-skew
       bound: a pathologically hot key would be salted by doc_id range
       and offset by a second histogram level (same recursion).
    """
    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])

    # histogram via per-batch pre-count + 64-bucket fold (a per-value
    # aggregate pays Ray's per-group overhead on the length domain)
    def hist_part(t: pa.Table) -> pa.Table:
        v = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(v, return_counts=True)
        return pa.table(
            {"n_chars": pa.array(u), "n": pa.array(c.astype(np.int64)),
             "bucket": pa.array(u % 64)}
        )

    def hist_fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("n_chars", as_index=False)["n"].sum()

    counts = (
        ds.map_batches(hist_part, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(hist_fold, batch_format="pandas")
        .to_pandas()
        .sort_values("n_chars", ascending=False)
    )
    n = counts["n"].to_numpy(np.int64)
    base_df = pd.DataFrame(
        {
            "n_chars": counts["n_chars"].to_numpy(np.int64),
            "base": np.concatenate([[0], np.cumsum(n)[:-1]]),
        }
    )
    base_ref = ray.put(base_df)

    def tag(t: pa.Table) -> pa.Table:
        v = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(v % np.int64(64)))

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # a bucket holds many length values: within-value ranks via
        # one vectorized sort + cumcount, offsets by merge (the
        # previous per-value map_groups paid per-group Ray dispatch)
        bdf = ray.get(base_ref)
        df = df.sort_values(["n_chars", "doc_id"], kind="mergesort").reset_index(
            drop=True
        )
        local = df.groupby("n_chars", sort=False).cumcount().to_numpy()
        b = df[["n_chars"]].merge(bdf, on="n_chars", how="left")["base"].to_numpy(
            np.int64
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_chars": df["n_chars"].to_numpy(np.int64),
                "global_rank": b + local + 1,
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(rank_bucket, batch_format="pandas")
    )


GLOBAL_RANK_SQL = """
select doc_id, n_chars,
       row_number() over (order by n_chars desc, doc_id) as global_rank
from documents
"""


# --------------------------------------------------------------------------
# bloom-prefiltered semi-join (shuffle-input reduction, exact result)
# --------------------------------------------------------------------------

BLOOM_BITS = 1 << 16              # 65536 bits = 8 KiB broadcast
BLOOM_HASHES = 2
BLOOM_SIZE_CUT = 42               # p_size >= CUT keeps the build side sparse


def _bloom_probe_positions(keys: np.ndarray) -> np.ndarray:
    """(BLOOM_HASHES, n) bit positions for int64 keys (splitmix-salted,
    same avalanche family as the CMS)."""
    from .text import _splitmix64

    out = []
    k = keys.astype(np.uint64)
    for salt in (0xA0761D6478BD642F, 0xE7037ED1A0B428DB):
        with np.errstate(over="ignore"):
            h = _splitmix64(k ^ np.uint64(salt))
        out.append((h % np.uint64(BLOOM_BITS)).astype(np.int64))
    return np.stack(out)


def bloom_semi_join(sf_dir: str) -> ray.data.Dataset:
    """lineitem rows whose part passes a size filter — a semi-join
    where a BROADCAST BLOOM FILTER (8 KiB regardless of build-side
    cardinality) prefilters the probe stream before the exact check,
    so at 100 TB the expensive exact structure sees only
    bloom-surviving rows (true matches + ~n*2^-h false positives)
    instead of the whole fact table.  The result is EXACT: survivors
    are verified against the true key set (here broadcast — small by
    the size predicate; at larger build sides the verify becomes the
    hash-sharded semi-join and the bloom still cuts its shuffle input).

    Build side: the filtered dimension is small by construction, so
    the bits are set on the driver in one vectorized pass (the same
    driver-loads-dimension pattern as every broadcast join here); a
    build side too big for that would tree-OR per-batch packed-word
    partials via ``groupby(slot)`` and the 8 KiB broadcast would not
    change.
    """
    import pyarrow.parquet as pq
    import ray

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size"]
    )
    keys = part.filter(
        pc.greater_equal(part["p_size"], BLOOM_SIZE_CUT)
    )["p_partkey"].to_numpy(zero_copy_only=False)
    words = np.zeros(BLOOM_BITS // 64, dtype=np.uint64)
    if len(keys):
        pos = _bloom_probe_positions(keys).ravel()
        np.bitwise_or.at(words, pos // 64, np.uint64(1) << (pos % 64).astype(np.uint64))
    state = ray.put((words, np.unique(keys)))

    class Probe:
        def __init__(self):
            self.words, self.keys = ray.get(state)

        def __call__(self, t: pa.Table) -> pa.Table:
            pk = t["l_partkey"].to_numpy(zero_copy_only=False)
            pos = _bloom_probe_positions(pk)
            hit = np.ones(len(pk), dtype=bool)
            for row in pos:
                w = self.words[row // 64]
                hit &= (w >> (row % 64).astype(np.uint64)) & np.uint64(1) > 0
            if not hit.any():
                return t.slice(0, 0)
            sub = t.filter(pa.array(hit))
            ok = np.isin(
                sub["l_partkey"].to_numpy(zero_copy_only=False), self.keys
            )
            return sub.filter(pa.array(ok))

    return read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_partkey", "l_quantity"]
    ).map_batches(Probe, batch_format="pyarrow", concurrency=pool_size())


BLOOM_SEMI_JOIN_SQL = f"""
select l_orderkey, l_partkey, l_quantity from lineitem
where l_partkey in (select p_partkey from part where p_size >= {BLOOM_SIZE_CUT})
"""


# --------------------------------------------------------------------------
# left outer join (all-left-rows join with aggregate right side)
# --------------------------------------------------------------------------


N_JOIN_BUCKETS = 64  # coarse shuffle key over the order-key space


def left_outer_join(sf_dir: str) -> ray.data.Dataset:
    """Every order with its lineitem count + quantity sum, INCLUDING
    orders with no lineitems (n_items = 0) — the left-outer member the
    join family lacked (J-coverage: equi/semi/anti/asof/range were in;
    outer completes it).

    Scale shape — tagged narrow union instead of a row-level outer
    join: lineitem reduces per batch to (key, n, sum_q) partials
    (fact-table text/measures never shuffle raw), orders contributes
    (key, tag=left) rows, and the merge shuffles by COARSE KEY BUCKET
    (key % 64) rather than by the raw order key: same co-location
    guarantee, but the exchange sorts a 64-value key instead of a
    per-order one and the per-order fold is a single vectorized
    pandas groupby inside each bucket.  The 'unmatched left row' case
    is just a key with no right partials.  Quantities are fixed-point
    cents (``functions/fixedpoint``) for bit-exact parity."""
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        k = t["l_orderkey"].to_numpy(zero_copy_only=False)
        q = to_fixed(t["l_quantity"].to_numpy(zero_copy_only=False), 100.0)
        u, inv = np.unique(k, return_inverse=True)
        return pa.table(
            {
                "o_orderkey": pa.array(u),
                "bucket": pa.array(u % np.int64(N_JOIN_BUCKETS)),
                "n_items": pa.array(np.bincount(inv).astype(np.int64)),
                "sum_qty_c": pa.array(np.bincount(inv, weights=q).astype(np.int64)),
                "is_left": pa.array(np.zeros(len(u), np.int64)),
            }
        )

    orders = read_table(sf_dir, "orders", columns=["o_orderkey"])

    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        k = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = pa.array(np.zeros(n, np.int64))
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "bucket": pa.array(k % np.int64(N_JOIN_BUCKETS)),
                "n_items": z,
                "sum_qty_c": z,
                "is_left": pa.array(np.ones(n, np.int64)),
            }
        )

    tagged = li.map_batches(partial, batch_format="pyarrow").union(
        orders.map_batches(tag_left, batch_format="pyarrow")
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_orderkey", sort=False, as_index=False)[
            ["n_items", "sum_qty_c", "is_left"]
        ].sum()
        # keep only keys present on the left (a lineitem without its
        # order would be an FK violation; this makes the join LEFT,
        # not FULL)
        g = g[g["is_left"] > 0]
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].to_numpy(np.int64),
                "n_items": g["n_items"].to_numpy(np.int64),
                "sum_qty_c": g["sum_qty_c"].to_numpy(np.int64),
            }
        )

    return tagged.groupby("bucket").map_groups(merge, batch_format="pandas")


LEFT_OUTER_JOIN_SQL = """
select o.o_orderkey,
       cast(count(l.l_orderkey) as bigint) as n_items,
       cast(coalesce(sum(cast(floor(l.l_quantity * 100.0 + 0.5) as bigint)), 0)
            as bigint) as sum_qty_c
from orders o left join lineitem l on l.l_orderkey = o.o_orderkey
group by o.o_orderkey
"""


# --------------------------------------------------------------------------
# per-key moving window aggregate (rows between W preceding and current)
# --------------------------------------------------------------------------

MOVING_W = 3


def events_moving_avg(sf_dir: str, w: int = MOVING_W) -> ray.data.Dataset:
    """Per-user MOVING WINDOW aggregate over the event stream: for each
    event (ordered by ts, event_id within user), the count and exact
    fixed-point sum of the last ``w + 1`` values including its own —
    the rows-between window frame the tumbling/hopping/session trio
    didn't cover.

    One shuffle keyed by ``hash(user_id) % 64`` — a COARSE bucket, not
    the raw unbounded user_id, so 10^9 users cost 64 group-tasks (the
    events_funnel/events_sessionize plan).  Per-bucket work is one
    (user, ts, event_id) lexsort + per-user prefix-sum difference,
    all vectorized: the window floor per row is
    max(first_row_of_its_user, row - w).  Event-time skew is bounded
    per user; a pathological power-user key would split by (user,
    ts-range) with boundary rows exchanged — noted, not needed for
    the synthetic key space."""
    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    n_buckets = 64

    def tag(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((uid % n_buckets).astype(np.int64))
        )

    def window(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        uid = df["user_id"].to_numpy(np.int64)
        v = to_fixed(df["value"].to_numpy(), 1_000_000.0)
        csum = np.concatenate([[0], np.cumsum(v)])
        idx = np.arange(len(v))
        # index of each user's first row, forward-filled along the sort
        is_first = np.ones(len(v), dtype=bool)
        is_first[1:] = uid[1:] != uid[:-1]
        user_start = np.maximum.accumulate(np.where(is_first, idx, 0))
        lo = np.maximum(user_start, idx - w)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": uid,
                "n_w": (idx - lo + 1).astype(np.int64),
                "sum_w_u": (csum[idx + 1] - csum[lo]).astype(np.int64),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(window, batch_format="pandas")
    )


def events_moving_avg_sql(w: int = MOVING_W) -> str:
    return f"""
with v as (select event_id, user_id, ts,
                  cast(floor(value * 1000000.0 + 0.5) as bigint) as value_u
           from events)
select event_id, user_id,
       cast(count(*) over win as bigint) as n_w,
       cast(sum(value_u) over win as bigint) as sum_w_u
from v
window win as (partition by user_id order by ts, event_id
               rows between {w} preceding and current row)
"""


TIME_WINDOW_S = 3600


def events_time_window(sf_dir: str, w_s: int = TIME_WINDOW_S) -> ray.data.Dataset:
    """Per-user TIME-RANGE moving aggregate: for each event, the count
    and exact fixed-point sum of the user's events with ``ts`` in
    ``[ts - w_s, ts]`` (both ends inclusive; equal-ts rows are peers —
    SQL ``RANGE BETWEEN INTERVAL w SECOND PRECEDING AND CURRENT ROW``
    semantics, so the answer is independent of tie order).  The
    rows-between frame is ``events_moving_avg``; this is the
    event-TIME frame the streaming trio (tumbling/hopping/session)
    and the rows frame both miss.

    One shuffle keyed by ``hash(user_id) % 64`` (coarse bucket, never
    the raw unbounded user_id).  Per-bucket kernel is fully
    vectorized: sort by (user, ts), then build a globally MONOTONE
    timeline by offsetting each user's span so consecutive users are
    separated by more than ``w_s`` — after that, one
    ``np.searchsorted`` pair gives every row's window bounds at once
    and a prefix-sum difference gives the exact sums, with no
    per-user Python loop.  Overflow guard: the offset timeline needs
    ``sum_per_bucket(user_range + w) < 2**63`` us — at w=1h that is
    ~2e9 users PER BUCKET; asserted loudly rather than wrapped."""
    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    n_buckets = 64
    w_us = np.int64(w_s) * 1_000_000

    def tag(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((uid % n_buckets).astype(np.int64))
        )

    def window(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"], kind="mergesort").reset_index(
            drop=True
        )
        uid = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        v = to_fixed(df["value"].to_numpy(), 1_000_000.0)
        n = len(uid)
        # gap to insert at each user boundary so a (ts - w) probe can
        # never cross into the previous user's span
        new_user = np.zeros(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        jump = np.zeros(n, dtype=np.int64)
        jump[1:][new_user[1:]] = (
            ts[:-1][new_user[1:]] - ts[1:][new_user[1:]] + w_us + 1
        )
        off = np.cumsum(np.maximum(jump, 0))
        mono = ts + off
        assert mono[-1] < np.iinfo(np.int64).max - w_us, (
            "events_time_window: monotone-timeline offset would overflow "
            "int64 — split this user bucket finer"
        )
        lo = np.searchsorted(mono, mono - w_us, side="left")
        hi = np.searchsorted(mono, mono, side="right")
        csum = np.concatenate([[0], np.cumsum(v)])
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": uid,
                "n_w": (hi - lo).astype(np.int64),
                "sum_w_u": (csum[hi] - csum[lo]).astype(np.int64),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(window, batch_format="pandas")
    )


def events_time_window_sql(w_s: int = TIME_WINDOW_S) -> str:
    return f"""
with v as (select event_id, user_id, ts,
                  cast(floor(value * 1000000.0 + 0.5) as bigint) as value_u
           from events)
select event_id, user_id,
       cast(count(*) over win as bigint) as n_w,
       cast(sum(value_u) over win as bigint) as sum_w_u
from v
window win as (partition by user_id order by ts
               range between interval '{w_s}' second preceding
                         and current row)
"""


# --------------------------------------------------------------------------
# funnel analysis (ordered step conversion per user)
# --------------------------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")


def events_funnel(sf_dir: str, steps: tuple = FUNNEL_STEPS) -> ray.data.Dataset:
    """Ordered funnel conversion per user: depth 1 = did step 1
    ('view'), depth 2 = step 2 STRICTLY AFTER their first step 1,
    depth 3 = step 3 strictly after that step 2 — the sequential-
    pattern query behind every conversion dashboard.  One row
    (user_id, funnel_depth) per user who performed step 1.

    Scale shape: the stream is pre-filtered to the step types and
    pruned to (user_id, ts, event_type) AT THE READ, then shuffles
    ONCE by user bucket; each bucket resolves the per-user
    first-occurrence chain with vectorized pandas groupby-min /
    merge passes (one per step, no per-user Python).  Strict-ts
    progression mirrors the SQL oracle exactly, so equal-timestamp
    ties cannot diverge."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["event_type"], value_set=pa.array(list(steps)))
        t = t.filter(m)
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(u),
                "ts": t["ts"],
                "event_type": t["event_type"],
                "bucket": pa.array(u % np.int64(ASOF_BUCKETS)),
            }
        )

    def funnel(df: pd.DataFrame) -> pd.DataFrame:
        s1, s2, s3 = steps
        t1 = (
            df[df["event_type"] == s1]
            .groupby("user_id", as_index=False)["ts"]
            .min()
            .rename(columns={"ts": "t1"})
        )
        c = df[df["event_type"] == s2].merge(t1, on="user_id")
        t2 = (
            c[c["ts"] > c["t1"]]
            .groupby("user_id", as_index=False)["ts"]
            .min()
            .rename(columns={"ts": "t2"})
        )
        p = df[df["event_type"] == s3].merge(t2, on="user_id")
        t3 = (
            p[p["ts"] > p["t2"]]
            .groupby("user_id", as_index=False)["ts"]
            .min()
            .rename(columns={"ts": "t3"})
        )
        out = t1.merge(t2, on="user_id", how="left").merge(
            t3, on="user_id", how="left"
        )
        depth = (
            1
            + out["t2"].notna().to_numpy().astype(np.int64)
            + out["t3"].notna().to_numpy().astype(np.int64)
        )
        return pd.DataFrame(
            {
                "user_id": out["user_id"].to_numpy(np.int64),
                "funnel_depth": depth,
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(funnel, batch_format="pandas")
    )


def events_funnel_sql(steps: tuple = FUNNEL_STEPS) -> str:
    s1, s2, s3 = steps
    return f"""
with v as (
  select user_id, min(ts) as t1 from events
  where event_type = '{s1}' group by user_id
),
c as (
  select e.user_id, min(e.ts) as t2 from events e
  join v on v.user_id = e.user_id
  where e.event_type = '{s2}' and e.ts > v.t1 group by e.user_id
),
p as (
  select e.user_id, min(e.ts) as t3 from events e
  join c on c.user_id = e.user_id
  where e.event_type = '{s3}' and e.ts > c.t2 group by e.user_id
)
select v.user_id,
       cast(1 + (c.user_id is not null)::int + (p.user_id is not null)::int
            as bigint) as funnel_depth
from v
left join c on c.user_id = v.user_id
left join p on p.user_id = v.user_id
"""


# --------------------------------------------------------------------------
# cohort retention (window-over-window active-user return rate)
# --------------------------------------------------------------------------


def events_retention(sf_dir: str, window_s: int = 3600) -> ray.data.Dataset:
    """Window-over-window retention: for every tumbling hour window,
    the count of distinct active users and how many of them are also
    active in the NEXT window — the cohort return-rate query behind
    every retention dashboard.  Output: (window_start_s, n_active,
    n_retained).

    Scale shape: one in-batch dedupe reduces the stream to distinct
    (user, window) pairs, then ONE shuffle by user bucket; inside
    each bucket a vectorized sorted-pair scan marks windows whose
    successor (window + window_s) exists for the same user, and the
    per-window partial counts fold through the small window-keyed
    groupby (output = |windows| rows).  The raw event stream never
    shuffles; user activity sets never leave their bucket."""
    ds = read_table(sf_dir, "events", columns=["ts", "user_id"])

    def pairs(t: pa.Table) -> pa.Table:
        epoch_us = t["ts"].cast(pa.int64()).to_numpy()
        win = (epoch_us // (window_s * 1_000_000)) * window_s
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = np.stack([u, win])
        uniq = np.unique(keys, axis=1)
        uu, ww = uniq[0], uniq[1]
        return pa.table(
            {
                "user_id": pa.array(uu),
                "window_start_s": pa.array(ww.astype(np.int64)),
                "bucket": pa.array(uu % np.int64(ASOF_BUCKETS)),
            }
        )

    def mark(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["user_id", "window_start_s"])
        u = d["user_id"].to_numpy(np.int64)
        w = d["window_start_s"].to_numpy(np.int64)
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        nxt = np.zeros(len(u), dtype=np.int64)
        if len(u) > 1:
            nxt[:-1] = (u[1:] == u[:-1]) & (w[1:] == w[:-1] + window_s)
        g = pd.DataFrame({"window_start_s": w, "n_active": 1, "n_retained": nxt})
        out = g.groupby("window_start_s", as_index=False).sum()
        return pd.DataFrame(
            {
                "window_start_s": out["window_start_s"].to_numpy(np.int64),
                "n_active": out["n_active"].to_numpy(np.int64),
                "n_retained": out["n_retained"].to_numpy(np.int64),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("window_start_s", as_index=False)[
            ["n_active", "n_retained"]
        ].sum()
        return pd.DataFrame(
            {
                "window_start_s": g["window_start_s"].to_numpy(np.int64),
                "n_active": g["n_active"].to_numpy(np.int64),
                "n_retained": g["n_retained"].to_numpy(np.int64),
            }
        )

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(mark, batch_format="pandas")
        .groupby("window_start_s")
        .map_groups(fold, batch_format="pandas")
    )


def events_retention_sql(window_s: int = 3600) -> str:
    return f"""
with uw as (
  select distinct user_id,
         cast(floor(epoch_us(ts) / {window_s * 1_000_000}.0) as bigint)
           * {window_s} as w
  from events
)
select a.w as window_start_s,
       cast(count(*) as bigint) as n_active,
       cast(count(b.user_id) as bigint) as n_retained
from uw a
left join uw b on b.user_id = a.user_id and b.w = a.w + {window_s}
group by a.w
"""


# --------------------------------------------------------------------------
# grouped lag over an aggregated series (year-over-year deltas)
# --------------------------------------------------------------------------


def customer_yoy(sf_dir: str) -> ray.data.Dataset:
    """Year-over-year order activity per customer: (o_custkey, year,
    n_orders, delta_prev = n_orders - previous year's count, NULL-free
    encoding: first observed year reports delta_prev = n_orders) — the
    grouped-LAG-over-aggregate pattern behind trend dashboards.

    Scale shape: the orders stream partial-aggregates to (custkey,
    year, n) INSIDE each batch, then ONE shuffle by customer bucket;
    each bucket folds partials and computes the lag with a vectorized
    sorted (custkey, year) boundary scan — consecutive-year test, no
    per-customer Python, no window sort of raw orders."""
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        c = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = pc.year(t["o_orderdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"o_custkey": c, "year": y})
        g = df.groupby(["o_custkey", "year"], sort=False, as_index=False).size()
        out = pd.DataFrame(
            {
                "o_custkey": g["o_custkey"].to_numpy(np.int64),
                "year": g["year"].to_numpy(np.int64),
                "n": g["size"].to_numpy(np.int64),
            }
        )
        out["bucket"] = out["o_custkey"].to_numpy(np.int64) % N_JOIN_BUCKETS
        return pa.Table.from_pandas(out, preserve_index=False)

    def lag(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["o_custkey", "year"], sort=False, as_index=False)["n"].sum()
        c = g["o_custkey"].to_numpy(np.int64)
        y = g["year"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        order = np.lexsort((y, c))
        c, y, n = c[order], y[order], n[order]
        delta = n.copy()
        if len(c) > 1:
            prev = (c[1:] == c[:-1]) & (y[1:] == y[:-1] + 1)
            delta[1:][prev] = n[1:][prev] - n[:-1][prev]
        return pd.DataFrame(
            {
                "o_custkey": c,
                "year": y,
                "n_orders": n,
                "delta_prev": delta,
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lag, batch_format="pandas")
    )


CUSTOMER_YOY_SQL = """
with a as (
  select o_custkey, cast(year(o_orderdate) as bigint) as year,
         cast(count(*) as bigint) as n_orders
  from orders group by o_custkey, year(o_orderdate)
)
select o_custkey, year, n_orders,
       cast(case when lag(year) over w = year - 1
                 then n_orders - lag(n_orders) over w
                 else n_orders end as bigint) as delta_prev
from a window w as (partition by o_custkey order by year)
"""


# --------------------------------------------------------------------------
# running cumulative window per user (unbounded-preceding frame)
# --------------------------------------------------------------------------

def events_cumulative(sf_dir: str) -> ray.data.Dataset:
    """Per-event RUNNING aggregates over each user's stream ordered by
    (ts, event_id): cumulative event count, exact fixed-point
    cumulative value sum, and cumulative DISTINCT event-type count —
    the unbounded-preceding window frame (vs ``events_moving_avg``'s
    rows-between frame), plus the distinct-within-frame variant no
    other window entry covers.

    Same coarse-bucket plan as the rest of the events family: ONE
    shuffle keyed ``user_id % 64`` (BASELINE's high-cardinality-groupby
    lesson), then fully vectorized per-bucket numpy — a (user, ts,
    event_id) lexsort, global prefix sums differenced at each user's
    first row, and the distinct-type counter as a per-(user, type)
    first-occurrence flag (second lexsort) cumulatively summed per
    user.  No state crosses buckets; event-time order within a user is
    total because (ts, event_id) is unique."""
    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"])
    n_buckets = 64

    def tag(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((uid % n_buckets).astype(np.int64))
        )

    def running(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        uid = df["user_id"].to_numpy(np.int64)
        v = to_fixed(df["value"].to_numpy(), 1_000_000.0)
        n = len(df)
        idx = np.arange(n)
        is_first = np.ones(n, dtype=bool)
        is_first[1:] = uid[1:] != uid[:-1]
        user_start = np.maximum.accumulate(np.where(is_first, idx, 0))
        csum = np.concatenate([[0], np.cumsum(v)])
        # first time this (user, event_type) appears in stream order:
        # sort rows by (user, type, stream position); a row is 'new'
        # when the (user, type) run changes, mapped back to stream idx
        et = df["event_type"].astype("category").cat.codes.to_numpy(np.int64)
        order = np.lexsort((idx, et, uid))
        new_sorted = np.ones(n, dtype=bool)
        new_sorted[1:] = (uid[order][1:] != uid[order][:-1]) | (
            et[order][1:] != et[order][:-1]
        )
        is_new = np.empty(n, dtype=np.int64)
        is_new[order] = new_sorted
        ncsum = np.concatenate([[0], np.cumsum(is_new)])
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": uid,
                "n_cum": (idx - user_start + 1).astype(np.int64),
                "sum_cum_u": (csum[idx + 1] - csum[user_start]).astype(np.int64),
                "types_cum": (ncsum[idx + 1] - ncsum[user_start]).astype(np.int64),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(running, batch_format="pandas")
    )


EVENTS_CUMULATIVE_SQL = """
with v as (select event_id, user_id, ts, event_type,
                  cast(floor(value * 1000000.0 + 0.5) as bigint) as value_u,
                  row_number() over (partition by user_id, event_type
                                     order by ts, event_id) as type_rn
           from events)
select event_id, user_id,
       cast(count(*) over win as bigint) as n_cum,
       cast(sum(value_u) over win as bigint) as sum_cum_u,
       cast(count(*) filter (where type_rn = 1) over win as bigint) as types_cum
from v
window win as (partition by user_id order by ts, event_id
               rows between unbounded preceding and current row)
"""


# --------------------------------------------------------------------------
# grouped mode / argmax: most frequent event type per user
# --------------------------------------------------------------------------

def user_top_type(sf_dir: str) -> ray.data.Dataset:
    """Per-user MODE of event_type with deterministic tie-break
    (count desc, then type asc) and its count — the grouped-argmax
    shape (SO1/A3 sibling: top-1 within group, not global top-k).

    Plan: per-batch pandas (user, type) partial counts (the corpus of
    events collapses to at most users x types rows per batch), ONE
    shuffle keyed ``user_id % 64`` (coarse bucket — the BASELINE
    high-cardinality lesson), then a vectorized per-bucket fold: sum
    partials, lexsort (user, -n, type), keep each user's first row."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])
    n_buckets = 64

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["user_id", "event_type"], as_index=False).size()
        g = g.rename(columns={"size": "n"})
        g["bucket"] = (g["user_id"].to_numpy(np.int64) % n_buckets).astype(
            np.int64
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "event_type"], as_index=False)["n"].sum()
        uid = g["user_id"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        et = g["event_type"].astype("category")
        order = np.lexsort((et.cat.codes.to_numpy(np.int64), -n, uid))
        first = np.ones(len(order), dtype=bool)
        first[1:] = uid[order][1:] != uid[order][:-1]
        keep = order[first]
        return pd.DataFrame(
            {
                "user_id": uid[keep],
                "top_type": g["event_type"].to_numpy()[keep],
                "n": n[keep],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
    )


USER_TOP_TYPE_SQL = """
with c as (select user_id, event_type, count(*) as n
           from events group by 1, 2),
r as (select user_id, event_type, n,
             row_number() over (partition by user_id
                                order by n desc, event_type) as rn
      from c)
select user_id, event_type as top_type, cast(n as bigint) as n
from r where rn = 1
"""


# --------------------------------------------------------------------------
# event-type transition counts (first-order Markov table)
# --------------------------------------------------------------------------

def event_transitions(sf_dir: str) -> ray.data.Dataset:
    """(prev_type, next_type, n) over consecutive events of each user
    ordered by (ts, event_id) — the first-order Markov transition
    table behind session path analysis.

    Plan: one coarse ``user_id % 64`` shuffle, per-bucket vectorized
    lexsort + shift-compare (a transition exists where the next row is
    the SAME user), in-bucket (prev, next) partial counts, then a
    bounded-key (types x types) global fold."""
    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])
    n_buckets = 64

    def tag(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((uid % n_buckets).astype(np.int64))
        )

    def trans(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        uid = df["user_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        same = uid[1:] == uid[:-1]
        g = (
            pd.DataFrame(
                {"prev_type": et[:-1][same], "next_type": et[1:][same]}
            )
            .groupby(["prev_type", "next_type"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        g["n"] = g["n"].astype(np.int64)
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "prev_type": pd.Series(dtype=object),
                    "next_type": pd.Series(dtype=object),
                    "n": pd.Series(dtype=np.int64),
                }
            )
        return g

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(trans, batch_format="pandas")
        .groupby(["prev_type", "next_type"])
        .aggregate(Sum("n", alias_name="n"))
        .sort(["prev_type", "next_type"])
    )


EVENT_TRANSITIONS_SQL = """
with s as (select user_id, event_type,
                  lead(event_type) over (partition by user_id
                                         order by ts, event_id) as nxt
           from events)
select event_type as prev_type, nxt as next_type,
       cast(count(*) as bigint) as n
from s where nxt is not null
group by 1, 2 order by 1, 2
"""


# --------------------------------------------------------------------------
# full outer join (customers x event users)
# --------------------------------------------------------------------------


def full_outer_join(sf_dir: str) -> ray.data.Dataset:
    """Customers FULL OUTER JOIN per-user event aggregates on
    c_custkey = user_id: customers who never emitted an event keep
    zero counts, event users with no customer row appear with
    is_customer = 0 — the one join member left after
    equi/broadcast/semi/anti/asof/range/left-outer.

    Same tagged-narrow-union shape as :func:`left_outer_join` (one
    coarse-bucket shuffle of int64 partials, no raw-row exchange);
    FULL is just the left-outer merge WITHOUT the drop of keys absent
    on the left."""
    ev = read_table(sf_dir, "events", columns=["user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        k = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = to_fixed(t["value"].to_numpy(zero_copy_only=False), 100.0)
        u, inv = np.unique(k, return_inverse=True)
        return pa.table(
            {
                "key": pa.array(u),
                "bucket": pa.array(u % np.int64(N_JOIN_BUCKETS)),
                "n_events": pa.array(np.bincount(inv).astype(np.int64)),
                "sum_value_c": pa.array(np.bincount(inv, weights=v).astype(np.int64)),
                "is_customer": pa.array(np.zeros(len(u), np.int64)),
            }
        )

    cust = read_table(sf_dir, "customer", columns=["c_custkey"])

    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        k = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = pa.array(np.zeros(n, np.int64))
        return pa.table(
            {
                "key": pa.array(k),
                "bucket": pa.array(k % np.int64(N_JOIN_BUCKETS)),
                "n_events": z,
                "sum_value_c": z,
                "is_customer": pa.array(np.ones(n, np.int64)),
            }
        )

    tagged = ev.map_batches(partial, batch_format="pyarrow").union(
        cust.map_batches(tag_left, batch_format="pyarrow")
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("key", sort=False, as_index=False)[
            ["n_events", "sum_value_c", "is_customer"]
        ].sum()
        return pd.DataFrame(
            {
                "key": g["key"].to_numpy(np.int64),
                "is_customer": g["is_customer"].to_numpy(np.int64),
                "n_events": g["n_events"].to_numpy(np.int64),
                "sum_value_c": g["sum_value_c"].to_numpy(np.int64),
            }
        )

    return tagged.groupby("bucket").map_groups(merge, batch_format="pandas")


FULL_OUTER_JOIN_SQL = """
with e as (select user_id,
                  cast(count(*) as bigint) as n_events,
                  cast(sum(cast(floor(value * 100.0 + 0.5) as bigint)) as bigint)
                      as sum_value_c
           from events group by user_id)
select coalesce(c.c_custkey, e.user_id) as key,
       cast(case when c.c_custkey is null then 0 else 1 end as bigint)
           as is_customer,
       cast(coalesce(e.n_events, 0) as bigint) as n_events,
       cast(coalesce(e.sum_value_c, 0) as bigint) as sum_value_c
from customer c full outer join e on c.c_custkey = e.user_id
"""



# --------------------------------------------------------------------------
# three-way join composition (TPC-H Q3 shape)
# --------------------------------------------------------------------------

Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-01-01"
Q3_K = 10


def q3_shipping(sf_dir: str) -> "pd.DataFrame":
    """TPC-H Q3 shape: customer ⨝ orders ⨝ lineitem with predicates
    on all three tables, grouped revenue per order, top-10 — the
    multi-join composition entry (each individual join member already
    has its own entry; this one proves they stack).

    Scale plan, smallest-to-largest:
    1. the segment-filtered customer KEY SET broadcasts (``ray.put``
       once, read per actor) — customer is the dimension side;
    2. orders stream past the broadcast set (semi-join filter at the
       scan, date predicate pushed into the batch) emitting only
       (o_orderkey, o_orderdate_us) int64 pairs;
    3. those pairs broadcast to the lineitem scan (they are
       match-bounded, far smaller than orders) where the revenue fold
       happens per batch in fixed-point cents — lineitem, the fact
       table, never shuffles at all;
    4. per-block partial top-k -> single-partition merge (the
       top_orders pattern — no global sort).
    """
    import pyarrow.parquet as pq
    import ray

    date_us = np.datetime64(Q3_DATE, "us").astype(np.int64)

    cust = pq.read_table(sf_dir + "/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    ckeys = cust.filter(pc.equal(cust["c_mktsegment"], Q3_SEGMENT))["c_custkey"].to_numpy()
    ckeys_ref = ray.put(np.unique(ckeys))

    class OrderFilter:
        def __init__(self):
            self.keys = ray.get(ckeys_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            od = t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            ok = (od < date_us) & np.isin(
                t["o_custkey"].to_numpy(zero_copy_only=False), self.keys
            )
            t = t.filter(pa.array(ok))
            return pa.table(
                {
                    "o_orderkey": t["o_orderkey"],
                    "o_date_us": t["o_orderdate"].cast(pa.int64()),
                }
            )

    orders = (
        read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(OrderFilter, batch_format="pyarrow", concurrency=pool_size())
        .to_pandas()
    )
    okeys = np.sort(orders["o_orderkey"].to_numpy(np.int64))
    odate = orders.set_index("o_orderkey")["o_date_us"]
    odate_arr = odate.loc[okeys].to_numpy(np.int64)
    ord_ref = ray.put((okeys, odate_arr))

    class RevenueFold:
        def __init__(self):
            self.okeys, self.odate = ray.get(ord_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            k = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            sd = t["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            idx = np.searchsorted(self.okeys, k)
            idx[idx >= len(self.okeys)] = 0
            ok = (self.okeys[idx] == k) & (sd > date_us) if len(self.okeys) else np.zeros(len(k), bool)
            if not ok.any():
                return pa.table(
                    {"o_orderkey": pa.array([], pa.int64()),
                     "o_date_us": pa.array([], pa.int64()),
                     "rev_c4": pa.array([], pa.int64()),
                     "bucket": pa.array([], pa.int64())}
                )
            k = k[ok]
            ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)[ok]
            dc = t["l_discount"].to_numpy(zero_copy_only=False)[ok]
            rev = np.floor(ep * (1.0 - dc) * 10000.0 + 0.5).astype(np.int64)
            u, inv = np.unique(k, return_inverse=True)
            return pa.table(
                {
                    "o_orderkey": pa.array(u),
                    "o_date_us": pa.array(self.odate[np.searchsorted(self.okeys, u)]),
                    "rev_c4": pa.array(np.bincount(inv, weights=rev).astype(np.int64)),
                    # key-bucket the partials: an order's batch partials
                    # must co-locate BEFORE any top-k (partial top-k
                    # over incomplete sums would drop keys)
                    "bucket": pa.array(u % np.int64(8)),
                }
            )

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(RevenueFold, batch_format="pyarrow", concurrency=pool_size())

    def topk_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["o_orderkey", "o_date_us"], as_index=False)["rev_c4"].sum()
        return g.nlargest(Q3_K, ["rev_c4"])

    merged = li.groupby("bucket").map_groups(topk_bucket, batch_format="pandas")
    df = merged.to_pandas()  # <= 8 * K rows of COMPLETE per-key sums
    df = df.sort_values(["rev_c4", "o_orderkey"], ascending=[False, True], kind="mergesort").head(Q3_K)
    out = pd.DataFrame(
        {
            "l_orderkey": df["o_orderkey"].to_numpy(np.int64),
            "revenue": df["rev_c4"].to_numpy(np.int64) / 10000.0,
            "o_orderdate": df["o_date_us"].to_numpy(np.int64).astype("datetime64[us]"),
        }
    )
    return out.reset_index(drop=True)


Q3_SHIPPING_SQL = f"""
select l.l_orderkey,
       sum(cast(floor(l.l_extendedprice * (1.0 - l.l_discount) * 10000.0 + 0.5)
           as bigint)) / 10000.0 as revenue,
       o.o_orderdate
from customer c
join orders o on o.o_custkey = c.c_custkey
join lineitem l on l.l_orderkey = o.o_orderkey
where c.c_mktsegment = '{Q3_SEGMENT}'
  and o.o_orderdate < timestamp '{Q3_DATE} 00:00:00'
  and l.l_shipdate > timestamp '{Q3_DATE} 00:00:00'
group by l.l_orderkey, o.o_orderdate
order by revenue desc, l.l_orderkey
limit {Q3_K}
"""


# --------------------------------------------------------------------------
# watermark / late-data tumbling window (streaming semantics, exact)
# --------------------------------------------------------------------------

LATE_WINDOW_S = 900     # 15-min tumbling windows
LATE_LATENESS_S = 300   # allowed lateness before an event counts late


def events_late_window(
    sf_dir: str,
    window_s: int = LATE_WINDOW_S,
    lateness_s: int = LATE_LATENESS_S,
) -> ray.data.Dataset:
    """Tumbling event-time windows WITH WATERMARK SEMANTICS — the
    streaming staple Ray Data has no primitive for, composed exactly:
    events arrive in ``event_id`` order; after each arrival the
    per-key watermark is (max event time seen so far) - lateness, and
    an event is LATE iff its event time is below the watermark at its
    arrival.  Output per (user_id, window_start_s): on-time count and
    late count (late events attributed to their event-time window but
    tallied separately — the "dropped by the window operator" signal).

    Deterministic (arrival order is a column, not wall-clock), so the
    DuckDB oracle expresses the same watermark as a running MAX window
    over arrival order — exact value equality, not a simulation.

    The synthetic stream is perfectly ts-ordered (nothing would ever
    be late), so EVENT TIME is the arrival timestamp minus a
    deterministic jitter of (event_id % 23) HOURS (the synthetic per-user event spacing is ~7 h median, so minutes would never invert) — applied by the
    SAME expression in engine and oracle (the ``pii_redact``
    augmentation pattern), producing genuine out-of-order data whose
    jitter amplitude (22 h) far exceeds both the spacing and the allowed lateness (5 min).

    Scale shape: pruned read (user_id, event_id, ts), ONE shuffle by
    user hash bucket (watermarks are per-key, the distributed-
    streaming norm), then vectorized pandas cummax/shift kernels
    inside each bucket — no per-user tasks, no Python loop."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts"])
    w_us = np.int64(window_s) * 1_000_000
    late_us = np.int64(lateness_s) * 1_000_000

    def prep(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(u % np.int64(ASOF_BUCKETS)))

    def windows(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_id"], kind="mergesort")
        eid = df["event_id"].to_numpy(np.int64)
        ts_us = (
            df["ts"].to_numpy().astype("datetime64[us]").view("i8")
            - (eid % 23) * 3_600_000_000
        )
        df = df.assign(ts_us=ts_us)
        hwm = df.groupby("user_id", sort=False)["ts_us"].cummax()
        prev_hwm = hwm.groupby(df["user_id"], sort=False).shift(1)
        late = (df["ts_us"] < prev_hwm - late_us).fillna(False).to_numpy()
        g = (
            pd.DataFrame(
                {
                    "user_id": df["user_id"].to_numpy(np.int64),
                    "window_start_s": (df["ts_us"].to_numpy() // w_us)
                    * np.int64(window_s),
                    "n_ontime": (~late).astype(np.int64),
                    "n_late": late.astype(np.int64),
                }
            )
            .groupby(["user_id", "window_start_s"], sort=False, as_index=False)[
                ["n_ontime", "n_late"]
            ]
            .sum()
        )
        return g.astype(
            {"n_ontime": np.int64, "n_late": np.int64, "window_start_s": np.int64}
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(windows, batch_format="pandas")
    )


def events_late_window_sql(
    window_s: int = LATE_WINDOW_S, lateness_s: int = LATE_LATENESS_S
) -> str:
    w_us = window_s * 1_000_000
    late_us = lateness_s * 1_000_000
    return f"""
with et as (
  select user_id, event_id,
         epoch_us(ts) - (event_id % 23) * 3600000000 as et_us
  from events
),
arr as (
  select user_id, et_us,
         max(et_us) over (partition by user_id order by event_id
                          rows between unbounded preceding and 1 preceding)
           as hwm_us
  from et
),
f as (
  select user_id,
         cast(floor(et_us / {w_us}) as bigint) * {window_s}
           as window_start_s,
         case when hwm_us is not null and et_us < hwm_us - {late_us}
              then 1 else 0 end as late
  from arr
)
select user_id, window_start_s,
       cast(sum(1 - late) as bigint) as n_ontime,
       cast(sum(late) as bigint) as n_late
from f group by user_id, window_start_s
"""


# --------------------------------------------------------------------------
# gaps-and-islands interval merge (per-user activity sessions-as-intervals)
# --------------------------------------------------------------------------

ISLAND_GAP_S = 36_000  # 10 h: median per-user spacing is ~7.4 h, so
                       # the corpus yields real multi-event islands


def user_activity_islands(
    sf_dir: str, gap_s: int = ISLAND_GAP_S
) -> ray.data.Dataset:
    """Merge each user's event stream into ACTIVITY ISLANDS (maximal
    runs where consecutive events are <= ``gap_s`` apart) and report
    per user: island count, total covered time, event count — the
    gaps-and-islands interval merge behind uptime/engagement rollups
    (a different aggregate from ``events_sessionize``'s per-session
    rows: this is the interval-algebra reduction).

    Scale shape: pruned read (user_id, event_id, ts), ONE shuffle by
    user hash bucket, vectorized diff/cumsum/groupby kernels inside
    each bucket.  Ties on ts break by event_id in BOTH engine and
    oracle, so equal timestamps cannot diverge."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts"])
    gap_us = np.int64(gap_s) * 1_000_000

    def prep(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(u % np.int64(ASOF_BUCKETS)))

    def islands(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = df["user_id"].to_numpy(np.int64)
        t = df["ts"].to_numpy().astype("datetime64[us]").view("i8")
        new_user = np.ones(len(u), dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        brk = new_user.copy()
        brk[1:] |= (t[1:] - t[:-1]) > gap_us
        isl = np.cumsum(brk) - 1  # global island id (user-nested)
        g = pd.DataFrame({"u": u, "isl": isl, "t": t}).groupby(
            "isl", sort=False, as_index=False
        ).agg(u=("u", "first"), lo=("t", "min"), hi=("t", "max"), n=("t", "size"))
        g["span"] = g["hi"] - g["lo"]
        out = g.groupby("u", sort=False, as_index=False).agg(
            n_islands=("isl", "size"),
            covered_us=("span", "sum"),
            n_events=("n", "sum"),
        )
        return pd.DataFrame(
            {
                "user_id": out["u"].to_numpy(np.int64),
                "n_islands": out["n_islands"].to_numpy(np.int64),
                "covered_us": out["covered_us"].to_numpy(np.int64),
                "n_events": out["n_events"].to_numpy(np.int64),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(islands, batch_format="pandas")
    )


def user_activity_islands_sql(gap_s: int = ISLAND_GAP_S) -> str:
    gap_us = gap_s * 1_000_000
    return f"""
with o as (
  select user_id, event_id, epoch_us(ts) as t,
         case when epoch_us(ts) - lag(epoch_us(ts)) over
                     (partition by user_id order by ts, event_id)
                   > {gap_us}
              then 1 else 0 end as brk
  from events
),
g as (
  -- cumulative order MUST match the lag's (ts, event_id) tie-break,
  -- else equal-timestamp rows could land in different islands
  select user_id, t,
         sum(brk) over (partition by user_id order by t, event_id
                        rows between unbounded preceding and current row)
           as isl
  from o
),
i as (
  select user_id, isl, min(t) as lo, max(t) as hi, count(*) as n
  from g group by user_id, isl
)
select user_id,
       cast(count(*) as bigint) as n_islands,
       cast(sum(hi - lo) as bigint) as covered_us,
       cast(sum(n) as bigint) as n_events
from i group by user_id
"""


# --- 2D skyline (Pareto front) --------------------------------------------


def skyline(sf_dir: str) -> ray.data.Dataset:
    """2D skyline of lineitem: the Pareto front maximizing
    ``l_quantity`` while minimizing ``l_extendedprice`` (rows no other
    row beats on both axes; ties on both axes all survive).

    Distributive plan: a globally non-dominated row is non-dominated
    within its own block, so a vectorized per-block partial front
    (suffix-min staircase over the distinct-quantity groups) shrinks
    each block to its candidate staircase; ONE single-partition merge
    re-runs the same kernel on the O(blocks x |front|) survivors.
    The fact table itself never shuffles and never sorts globally.
    """
    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
    )

    def front(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy()
        p = t["l_extendedprice"].to_numpy()
        uq, inv = np.unique(q, return_inverse=True)  # ascending qty groups
        mp = np.full(len(uq), np.inf)
        np.minimum.at(mp, inv, p)
        # best (lowest) price among STRICTLY greater qty groups
        best_gt = np.concatenate(
            [np.minimum.accumulate(mp[::-1])[::-1][1:], [np.inf]]
        )
        keep = (best_gt[inv] > p) & (p == mp[inv])
        return t.filter(pa.array(keep))

    return (
        li.map_batches(front, batch_format="pyarrow")
        .repartition(1)
        .map_batches(front, batch_format="pyarrow", batch_size=None)
    )


SKYLINE_SQL = """
with g as (select l_quantity as q, min(l_extendedprice) as mp
           from lineitem group by 1),
r as (select q, mp, min(mp) over (order by q desc
        rows between unbounded preceding and 1 preceding) as best_gt
      from g),
keep as (select q, mp from r where best_gt is null or best_gt > mp)
select l.l_orderkey, l.l_linenumber, l.l_quantity, l.l_extendedprice
from lineitem l join keep k
  on l.l_quantity = k.q and l.l_extendedprice = k.mp
"""


# --- last-touch attribution ------------------------------------------------


def attribution_last_touch(sf_dir: str) -> ray.data.Dataset:
    """Last-touch marketing attribution: each 'purchase' event joined
    to the SAME user's most recent preceding 'click' (strictly earlier
    in (ts, event_id) order).  Purchases with no prior click are
    dropped (unattributed).  Output one row per attributed purchase:
    (purchase_event_id, user_id, purchase_ts, click_event_id,
    click_ts, value).

    Scale shape: the stream is pre-filtered to the two event types
    and pruned at the read, shuffles ONCE by user bucket, and each
    bucket resolves attribution with one vectorized sort +
    grouped forward-fill (no per-user Python).  The (ts, event_id)
    tiebreak makes equal-timestamp batches deterministic and
    identical to the SQL window frame."""
    ds = read_table(
        sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["event_type"], value_set=pa.array(["click", "purchase"]))
        t = t.filter(m)
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(u % np.int64(ASOF_BUCKETS)))

    def attribute(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        is_click = (d["event_type"] == "click").to_numpy()
        cid = pd.Series(
            np.where(is_click, d["event_id"].to_numpy(np.int64), np.nan),
            index=d.index,
        )
        cts = pd.Series(
            d["ts"].where(pd.Series(is_click, index=d.index)), index=d.index
        )
        g = d.groupby("user_id", sort=False)
        d = d.assign(
            click_event_id=cid.groupby(g.ngroup()).ffill(),
            click_ts=cts.groupby(g.ngroup()).ffill(),
        )
        p = d[(d["event_type"] == "purchase") & d["click_event_id"].notna()]
        return pd.DataFrame(
            {
                "purchase_event_id": p["event_id"].to_numpy(np.int64),
                "user_id": p["user_id"].to_numpy(np.int64),
                "purchase_ts": p["ts"].to_numpy(),
                "click_event_id": p["click_event_id"].to_numpy(np.int64),
                "click_ts": p["click_ts"].to_numpy(),
                "value": p["value"].to_numpy(np.float64),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(attribute, batch_format="pandas")
    )


ATTRIBUTION_SQL = """
with e as (select event_id, ts, user_id, event_type, value
           from events where event_type in ('click', 'purchase')),
w as (select *,
        last_value(case when event_type = 'click' then event_id end ignore nulls)
          over (partition by user_id order by ts, event_id
                rows between unbounded preceding and 1 preceding) as click_event_id,
        last_value(case when event_type = 'click' then ts end ignore nulls)
          over (partition by user_id order by ts, event_id
                rows between unbounded preceding and 1 preceding) as click_ts
      from e)
select event_id as purchase_event_id, user_id, ts as purchase_ts,
       click_event_id, click_ts, value
from w where event_type = 'purchase' and click_event_id is not null
"""


# --- snapshot table diff (CDC) ---------------------------------------------


def table_diff(sf_dir: str) -> ray.data.Dataset:
    """Row-level diff of two table snapshots — the change-data-capture
    primitive: (doc_id, status) for every row that differs between
    snapshot A (documents) and snapshot B (a deterministic mutation of
    it: every 97th row deleted, every 101st row's text edited, every
    103rd row re-inserted under a shifted id).  status in
    ('added', 'removed', 'changed'); identical rows emit nothing.

    Scale shape: both snapshots stream side-tagged through ONE narrow
    key-bucket shuffle (text never moves — a 64-bit content
    fingerprint is computed per batch and only (doc_id, fp, side)
    shuffle); each bucket resolves its keys with one vectorized
    merge.  Works identically when B is a real second table."""
    a = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang", "source", "n_chars"])

    def fp_of(t: pa.Table, drop_mod97: bool, edit_mod101: bool, add_mod103: bool, side: int) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        txt = t["text"]
        if drop_mod97:
            keep = d % 97 != 3
            t = t.filter(pa.array(keep))
            d = d[keep]
            txt = t["text"]
        if edit_mod101:
            ed = d % 101 == 7
            if ed.any():
                txt = pc.if_else(
                    pa.array(ed), pc.binary_join_element_wise(txt, "!", ""), txt
                )
        # content fingerprint: text + lang + source + n_chars
        joined = pc.binary_join_element_wise(
            txt,
            t["lang"],
            t["source"],
            pc.cast(t["n_chars"], pa.string()),
            "\x1f",
        )
        from .text import _hash_arrow_strings

        if isinstance(joined, pa.ChunkedArray):
            joined = joined.combine_chunks()
        h = _hash_arrow_strings(joined).astype(np.int64)
        out_d, out_h = [d], [h]
        if add_mod103:
            ad = d % 103 == 5
            out_d.append(d[ad] + 1_000_000)
            out_h.append(h[ad])
        dd = np.concatenate(out_d)
        hh = np.concatenate(out_h)
        return pa.table(
            {
                "doc_id": pa.array(dd),
                "fp": pa.array(hh),
                "side": pa.array(np.full(len(dd), side, np.int64)),
                "bucket": pa.array(dd % np.int64(64)),
            }
        )

    side_a = a.map_batches(
        lambda t: fp_of(t, False, False, False, 0), batch_format="pyarrow"
    )
    side_b = read_table(
        sf_dir, "documents", columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).map_batches(lambda t: fp_of(t, True, True, True, 1), batch_format="pyarrow")

    def diff(df: pd.DataFrame) -> pd.DataFrame:
        # exact int64 merge — a pivot would cast fp to float64 and
        # silently truncate 64-bit fingerprints to 53 bits
        a_side = df[df["side"] == 0][["doc_id", "fp"]].astype({"fp": "Int64"})
        b_side = df[df["side"] == 1][["doc_id", "fp"]].astype({"fp": "Int64"})
        m = a_side.merge(
            b_side, on="doc_id", how="outer", suffixes=("_a", "_b"), indicator=True
        )
        status = np.where(
            m["_merge"].to_numpy() == "left_only",
            "removed",
            np.where(m["_merge"].to_numpy() == "right_only", "added", "changed"),
        )
        # nullable Int64 keeps the 64-bit fingerprints exact through
        # the outer merge (float64 promotion would truncate to 53 bits)
        same = (m["fp_a"] == m["fp_b"]).fillna(False).to_numpy(bool)
        out = pd.DataFrame(
            {"doc_id": m["doc_id"].to_numpy(np.int64), "status": status}
        )
        return out[~same]

    return (
        side_a.union(side_b)
        .groupby("bucket")
        .map_groups(diff, batch_format="pandas")
    )


TABLE_DIFF_SQL = """
with b as (
  select doc_id,
         case when doc_id % 101 = 7 then text || '!' else text end as text,
         lang, source, n_chars
  from documents where doc_id % 97 <> 3
  union all
  select doc_id + 1000000 as doc_id,
         case when doc_id % 101 = 7 then text || '!' else text end as text,
         lang, source, n_chars
  from documents where doc_id % 97 <> 3 and doc_id % 103 = 5
),
j as (select coalesce(a.doc_id, b.doc_id) as doc_id,
             a.doc_id is not null as has_a,
             b.doc_id is not null as has_b,
             coalesce(a.text = b.text
                      and a.lang = b.lang
                      and a.source = b.source
                      and a.n_chars = b.n_chars, false) as same
      from documents a full outer join b on a.doc_id = b.doc_id)
select doc_id,
       case when has_a and not has_b then 'removed'
            when has_b and not has_a then 'added'
            else 'changed' end as status
from j where not same
"""


# --------------------------------------------------------------------------
# SCD Type-2 dimension build (validity intervals from an event stream)
# --------------------------------------------------------------------------

SCD_SENTINEL_US = int(np.datetime64("9999-01-01T00:00:00", "us").astype(np.int64))


def scd_intervals(sf_dir: str) -> ray.data.Dataset:
    """Slowly-changing-dimension type-2 build: treat each user's
    event stream as successive states of a dimension attribute
    (``event_type``), collapse consecutive same-state runs, and emit
    one validity interval per run — (user_id, event_type, valid_from,
    valid_to, is_current), valid_to = next run's start (open-ended
    sentinel 9999-01-01 for the current run).

    The warehouse-side dual of :func:`table_diff`: diff derives a
    change stream from snapshots, this derives dimension history from
    a change stream.  One narrow coarse-bucket shuffle
    (hash(user) % 64 — never one Ray group per user); the per-bucket
    kernel is a vectorized sort + shift over int64 microseconds."""
    ev = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(u),
                "event_id": t["event_id"],
                "ts_us": t["ts"].cast(pa.int64()),
                "event_type": t["event_type"],
                "bucket": pa.array(u % np.int64(64)),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts_us"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        same_user = np.empty(len(u), bool)
        same_user[0] = False
        same_user[1:] = u[1:] == u[:-1]
        run_start = np.empty(len(u), bool)
        run_start[0] = True
        run_start[1:] = (~same_user[1:]) | (et[1:] != et[:-1])
        su = u[run_start]
        st = ts[run_start]
        se = et[run_start]
        # valid_to = next run start within the same user, else sentinel
        vt = np.full(len(su), SCD_SENTINEL_US, np.int64)
        nxt = np.empty(len(su), bool)
        nxt[:-1] = su[1:] == su[:-1]
        nxt[-1] = False
        vt[nxt] = st[1:][su[1:] == su[:-1]]
        return pd.DataFrame(
            {
                "user_id": su,
                "event_type": se,
                "valid_from": st.astype("datetime64[us]"),
                "valid_to": vt.astype("datetime64[us]"),
                "is_current": (~nxt).astype(np.int64),
            }
        )

    return (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
    )


SCD_INTERVALS_SQL = """
with o as (select user_id, ts, event_id, event_type,
                  lag(event_type) over (partition by user_id
                                        order by ts, event_id) as prev
           from events),
c as (select user_id, ts, event_id, event_type from o
      where prev is null or prev <> event_type),
i as (select user_id, event_type, ts as valid_from,
             lead(ts) over (partition by user_id
                            order by ts, event_id) as valid_to
      from c)
select user_id, event_type, valid_from,
       coalesce(valid_to, timestamp '9999-01-01 00:00:00') as valid_to,
       cast(case when valid_to is null then 1 else 0 end as bigint) as is_current
from i
"""


# --------------------------------------------------------------------------
# CDC upsert apply (MERGE INTO: last-write-wins snapshot maintenance)
# --------------------------------------------------------------------------


def upsert_apply(sf_dir: str) -> ray.data.Dataset:
    """Apply a change stream onto a base snapshot — the MERGE INTO /
    last-write-wins upsert primitive completing the CDC pair with
    :func:`table_diff` (which produces such a stream).  Base =
    documents; the deterministic change stream carries updates
    (doc_id % 11 = 4, n_chars incremented), tombstone deletes
    (doc_id % 13 = 6, delete wins over update), and fresh inserts
    (doc_id % 17 = 9, shifted key).  Output = the maintained
    snapshot: highest-version row per key, tombstones dropped.

    Scale shape: base and changes stream side-tagged through ONE
    narrow key-bucket shuffle (doc_id, lang, n_chars, ver, del — the
    text column never moves); each bucket resolves keys with one
    vectorized sort + drop_duplicates.  Works identically when the
    change stream is a real second table."""
    base = read_table(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def tag_base(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(d)
        return pa.table(
            {
                "doc_id": pa.array(d),
                "lang": t["lang"],
                "n_chars": t["n_chars"],
                "ver": pa.array(np.ones(n, np.int64)),
                "is_delete": pa.array(np.zeros(n, np.int64)),
                "bucket": pa.array(d % np.int64(64)),
            }
        )

    def make_changes(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        lang = t["lang"].to_numpy(zero_copy_only=False)
        upd = (d % 11 == 4) & (d % 13 != 6)
        dele = d % 13 == 6
        ins = d % 17 == 9
        out_d = np.concatenate([d[upd], d[dele], d[ins] + 2_000_000])
        out_l = np.concatenate([lang[upd], lang[dele], lang[ins]])
        out_n = np.concatenate([nc[upd] + 1, nc[dele], nc[ins]])
        out_del = np.concatenate(
            [np.zeros(int(upd.sum()), np.int64),
             np.ones(int(dele.sum()), np.int64),
             np.zeros(int(ins.sum()), np.int64)]
        )
        return pa.table(
            {
                "doc_id": pa.array(out_d),
                "lang": pa.array(out_l),
                "n_chars": pa.array(out_n),
                "ver": pa.array(np.full(len(out_d), 2, np.int64)),
                "is_delete": pa.array(out_del),
                "bucket": pa.array(out_d % np.int64(64)),
            }
        )

    changes = read_table(
        sf_dir, "documents", columns=["doc_id", "lang", "n_chars"]
    ).map_batches(make_changes, batch_format="pyarrow")

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "ver"], ascending=[True, False],
                            kind="mergesort")
        df = df.drop_duplicates("doc_id", keep="first")
        df = df[df["is_delete"] == 0]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "lang": df["lang"].to_numpy(),
                "n_chars": df["n_chars"].to_numpy(np.int64),
                "ver": df["ver"].to_numpy(np.int64),
            }
        )

    return (
        base.map_batches(tag_base, batch_format="pyarrow")
        .union(changes)
        .groupby("bucket")
        .map_groups(resolve, batch_format="pandas")
    )


UPSERT_APPLY_SQL = """
with chg as (
  select doc_id, lang, n_chars + 1 as n_chars, 2 as ver, 0 as is_delete
  from documents where doc_id % 11 = 4 and doc_id % 13 <> 6
  union all
  select doc_id, lang, n_chars, 2 as ver, 1 as is_delete
  from documents where doc_id % 13 = 6
  union all
  select doc_id + 2000000 as doc_id, lang, n_chars, 2 as ver, 0 as is_delete
  from documents where doc_id % 17 = 9
),
allr as (
  select doc_id, lang, n_chars, 1 as ver, 0 as is_delete from documents
  union all
  select * from chg
),
r as (select *, row_number() over (partition by doc_id
                                   order by ver desc) as rn
      from allr)
select doc_id, lang, cast(n_chars as bigint) as n_chars,
       cast(ver as bigint) as ver
from r where rn = 1 and is_delete = 0
"""


# --------------------------------------------------------------------------
# winsorized mean per group (robust aggregate, single pass)
# --------------------------------------------------------------------------

WINSOR_LO, WINSOR_HI = 0.05, 0.95


def winsorized_mean(sf_dir: str) -> ray.data.Dataset:
    """Per-lang WINSORIZED sum/count of documents.n_chars: values
    clamped to the lang's exact [P5, P95] (quantile_disc semantics)
    before summing — the robust mean a quality dashboard reports when
    raw means are outlier-dominated.  ONE corpus pass: the bounded
    integer domain reduces each batch to (lang, value, cnt) histogram
    triples (the grouped_quantiles partial); each lang group solves
    its quantiles AND the clamped sum from the same histogram — no
    second scan, integer-exact.  Output (lang, lo, hi, n, wsum)."""
    ds = read_table(sf_dir, "documents", columns=["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        lang = t["lang"].to_numpy(zero_copy_only=False)
        v = t["n_chars"].to_numpy(zero_copy_only=False)
        lu, linv = np.unique(lang, return_inverse=True)
        key = linv.astype(np.int64) * (1 << 32) | v.astype(np.int64)
        ku, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "lang": pa.array(lu[(ku >> 32).astype(np.int64)]),
                "value": pa.array((ku & 0xFFFFFFFF).astype(np.int64)),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("value")["cnt"].sum().sort_index()
        vals = g.index.to_numpy(np.int64)
        cnts = g.to_numpy(np.int64)
        cum = cnts.cumsum()
        n = int(cum[-1])

        def disc(p: float) -> int:
            r = max(0, int(np.ceil(p * n)) - 1)
            return int(vals[np.searchsorted(cum, r + 1)])

        lo, hi = disc(WINSOR_LO), disc(WINSOR_HI)
        wsum = int((np.clip(vals, lo, hi) * cnts).sum())
        return pd.DataFrame(
            {
                "lang": [df["lang"].iloc[0]],
                "lo": np.int64(lo),
                "hi": np.int64(hi),
                "n": np.int64(n),
                "wsum": np.int64(wsum),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(finish, batch_format="pandas")
    )


WINSORIZED_MEAN_SQL = f"""
with q as (select lang,
  cast(quantile_disc(n_chars, {WINSOR_LO!r}) as bigint) as lo,
  cast(quantile_disc(n_chars, {WINSOR_HI!r}) as bigint) as hi,
  cast(count(*) as bigint) as n
  from documents group by lang)
select d.lang, q.lo, q.hi, q.n,
       cast(sum(least(greatest(d.n_chars, q.lo), q.hi)) as bigint) as wsum
from documents d join q using (lang)
group by d.lang, q.lo, q.hi, q.n
"""


# --------------------------------------------------------------------------
# range-lookup join (IP-geolocation shape: value BETWEEN lo AND hi)
# --------------------------------------------------------------------------

IP_N_RANGES = 256
IP_SPAN = 1 << 32


def ip_range_join(sf_dir: str, n_ranges: int = IP_N_RANGES) -> ray.data.Dataset:
    """The IP-geolocation join shape: each page derives a synthetic
    uint32 address (a pure hash of page_id — the crawler's peer IP
    stand-in), looked up in a SMALL sorted table of non-overlapping
    [lo, hi] ranges -> range_id (a MaxMind-style geo table).  The
    interval table is deterministic: range k covers
    [k * 2^32/N, (k+1) * 2^32/N) with id k*7 % N — non-trivial ids so
    an off-by-one maps to a WRONG id, not a shifted one.

    Scale shape: the range table is broadcast (closure constant);
    the page stream maps through ONE ``np.searchsorted`` probe per
    batch — zero shuffle, the canonical broadcast-interval-join plan
    (the same small-side pattern as nearest_facility/decontaminate).
    Output (page_id, ip, range_id)."""
    from ..sources.pages import pages_dataset

    width = IP_SPAN // n_ranges
    lows = np.arange(n_ranges, dtype=np.int64) * width
    ids = (np.arange(n_ranges, dtype=np.int64) * 7) % n_ranges

    ds = pages_dataset(sf_dir, rep=20, columns=["page_id"])

    def probe(t: pa.Table) -> pa.Table:
        pid = t["page_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ip = (pid * 2654435761 + 40503) % IP_SPAN
        k = np.searchsorted(lows, ip, side="right") - 1
        return pa.table(
            {
                "page_id": pa.array(pid),
                "ip": pa.array(ip),
                "range_id": pa.array(ids[k]),
            }
        )

    return ds.map_batches(probe, batch_format="pyarrow")


def ip_range_join_sql(rep: int = 20, n_ranges: int = IP_N_RANGES) -> str:
    from ..sources.pages import pages_cte

    width = IP_SPAN // n_ranges
    return f"""
with pages as ({pages_cte(rep)}),
r as (select v as k, v * {width} as lo, (v + 1) * {width} - 1 as hi,
             (v * 7) % {n_ranges} as range_id
      from (select unnest(range({n_ranges})) as v)),
a as (select page_id, (page_id * 2654435761 + 40503) % {IP_SPAN} as ip
      from pages)
select a.page_id, cast(a.ip as bigint) as ip,
       cast(r.range_id as bigint) as range_id
from a join r on a.ip between r.lo and r.hi
"""


# --------------------------------------------------------------------------
# deterministic bootstrap (distributed resampling without RNG state)
# --------------------------------------------------------------------------

BOOT_B = 32
BOOT_P1 = 2654435761
BOOT_P2 = 40503


def bootstrap_mean(sf_dir: str, n_boot: int = BOOT_B) -> ray.data.Dataset:
    """Distributed BOOTSTRAP of the mean of documents.n_chars with NO
    RNG state: replicate ``b`` weights each doc by
    ``w = ((doc_id * P1 + b * P2) % 2^32) % 4`` (mean 1.5, variance
    1.25 — a multinomial-style resample that is a pure function of
    (doc_id, b), so any worker recomputes it identically and the
    DuckDB oracle mirrors it).  Output one row per replicate:
    (b, n_w, sum_w) — exact integer numerator/denominator pairs; the
    caller derives the CI from the ratio ranks, float-free.

    Scale shape: ONE corpus pass; each batch emits ``n_boot`` partial
    rows (the weight matrix is a vectorized outer product over the
    batch), folded by replicate id — shuffle volume is
    n_boot * blocks rows, corpus-size-independent."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
    b_ids = np.arange(n_boot, dtype=np.int64)

    def partial(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = ((d[:, None] * BOOT_P1 + b_ids[None, :] * BOOT_P2) % (1 << 32)) % 4
        return pa.table(
            {
                "b": pa.array(b_ids),
                "n_w": pa.array(w.sum(axis=0).astype(np.int64)),
                "sum_w": pa.array((w * x[:, None]).sum(axis=0).astype(np.int64)),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("b", as_index=False)[["n_w", "sum_w"]].sum()
        return g.astype(np.int64)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("b")
        .map_groups(fold, batch_format="pandas")
    )


def bootstrap_mean_sql(n_boot: int = BOOT_B) -> str:
    return f"""
with reps as (select unnest(range({n_boot})) as b),
w as (select r.b, ((d.doc_id * {BOOT_P1} + r.b * {BOOT_P2}) % {1 << 32}) % 4 as w,
             d.n_chars
      from documents d cross join reps r)
select b, cast(sum(w) as bigint) as n_w,
       cast(sum(w * n_chars) as bigint) as sum_w
from w group by b
"""


# --------------------------------------------------------------------------
# funnel latency percentiles (view -> purchase conversion time)
# --------------------------------------------------------------------------


def funnel_latency(sf_dir: str) -> "pd.DataFrame":
    """Conversion-latency distribution: for every user whose first
    'purchase' comes strictly after their first 'view', the latency
    in whole seconds — reported as one row (n_users, p50_s, p90_s)
    with EXACT quantile_disc semantics.  The product-analytics
    companion to events_funnel (how fast do conversions happen, not
    just whether).

    Scale shape: the stream is pre-filtered to the two step types and
    pruned at the read; ONE ``hash(user) % 64`` bucket fold resolves
    each user's first-view / first-purchase-after-view pair
    vectorized (two groupby-min passes, no per-user Python) and emits
    (latency_s, count) HISTOGRAM partials; the final quantile reads
    off the merged histogram — bounded by distinct latencies, never
    user count."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    n_buckets = 64

    def prep(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["event_type"], value_set=pa.array(["view", "purchase"]))
        t = t.filter(m)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(uid),
                "ts_us": t["ts"].cast(pa.int64()),
                "is_p": pc.equal(t["event_type"], "purchase").cast(pa.int8()),
                "bucket": pa.array((uid % n_buckets).astype(np.int64)),
            }
        )

    def latency_hist(df: pd.DataFrame) -> pd.DataFrame:
        v = (
            df[df["is_p"] == 0]
            .groupby("user_id", as_index=False)["ts_us"]
            .min()
            .rename(columns={"ts_us": "vts"})
        )
        p = df[df["is_p"] == 1].merge(v, on="user_id")
        p = p[p["ts_us"] > p["vts"]]
        if len(p) == 0:
            return pd.DataFrame(
                {"lat_s": pd.Series(dtype=np.int64), "n": pd.Series(dtype=np.int64)}
            )
        first_p = p.groupby("user_id", as_index=False).agg(
            pts=("ts_us", "min"), vts=("vts", "min")
        )
        lat = (first_p["pts"].to_numpy(np.int64) - first_p["vts"].to_numpy(np.int64)) // 1_000_000
        u, c = np.unique(lat, return_counts=True)
        return pd.DataFrame({"lat_s": u.astype(np.int64), "n": c.astype(np.int64)})

    hist = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(latency_hist, batch_format="pandas")
        .to_pandas()
    )
    g = hist.groupby("lat_s")["n"].sum().sort_index()
    vals = g.index.to_numpy(np.int64)
    cum = g.to_numpy(np.int64).cumsum()
    n = int(cum[-1]) if len(cum) else 0

    def disc(p: float) -> int:
        r = max(0, int(np.ceil(p * n)) - 1)
        return int(vals[np.searchsorted(cum, r + 1)])

    return pd.DataFrame(
        {
            "n_users": np.array([n], np.int64),
            "p50_s": np.array([disc(0.5) if n else 0], np.int64),
            "p90_s": np.array([disc(0.9) if n else 0], np.int64),
        }
    )


FUNNEL_LATENCY_SQL = """
with e as (select user_id, ts, event_type from events
           where event_type in ('view', 'purchase')),
v as (select user_id, min(ts) as vts from e
      where event_type = 'view' group by user_id),
p as (select e.user_id,
             min(e.ts) as pts, min(v.vts) as vts
      from e join v using (user_id)
      where e.event_type = 'purchase' and e.ts > v.vts
      group by e.user_id),
l as (select (epoch_us(pts) - epoch_us(vts)) // 1000000 as lat_s from p)
select cast(count(*) as bigint) as n_users,
       cast(quantile_disc(lat_s, 0.5) as bigint) as p50_s,
       cast(quantile_disc(lat_s, 0.9) as bigint) as p90_s
from l
"""


NEWU_WIN_S = 3600


def events_new_users(sf_dir: str, window_s: int = NEWU_WIN_S) -> ray.data.Dataset:
    """New-user accumulation: per time window, how many users appear
    for the FIRST time, plus the running total of distinct users ever
    seen — the growth metric a streaming ingest reports.  Exact
    distinct via first-seen reduction, never a distinct-over-window
    scan.

    Scale shape: per-batch min-ts partials per user (corpus rows ->
    user-bounded), one coarse ``user_id % 64`` fold takes the global
    min per user and ROLLS UP to per-window counts inside the bucket
    (only window-cardinality rows leave), and the cumulative sum runs
    over the tiny window table in one final task."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])
    us = 1_000_000 * window_s

    def partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ets = t["ts"].cast(pa.int64()).to_numpy()
        df = pd.DataFrame({"user_id": uid, "fs": ets})
        g = df.groupby("user_id", as_index=False)["fs"].min()
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(np.int64)),
                "fs": pa.array(g["fs"].to_numpy(np.int64)),
                "bucket": pa.array(g["user_id"].to_numpy(np.int64) % 64),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", as_index=False)["fs"].min()
        win = g["fs"].to_numpy(np.int64) // us  # ts >= epoch (synth corpus)
        w = pd.DataFrame({"win": win}).groupby("win", as_index=False).size()
        return pd.DataFrame(
            {
                "window_start_s": w["win"].to_numpy(np.int64) * window_s,
                "new_users": w["size"].to_numpy(np.int64),
            }
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("window_start_s", as_index=False)["new_users"].sum()
        g = g.sort_values("window_start_s", kind="mergesort").reset_index(drop=True)
        g["cum_users"] = g["new_users"].cumsum().astype(np.int64)
        return g

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .repartition(1)
        .map_batches(finish, batch_format="pandas", batch_size=None)
    )


def events_new_users_sql(window_s: int = NEWU_WIN_S) -> str:
    return f"""
with f as (select user_id, min(ts) as fs from events group by user_id),
w as (select cast(floor(epoch_us(fs) / {window_s * 1_000_000}.0) as bigint)
             * {window_s} as window_start_s,
             cast(count(*) as bigint) as new_users
      from f group by 1)
select window_start_s, new_users,
       cast(sum(new_users) over (order by window_start_s) as bigint) as cum_users
from w
"""


# --------------------------------------------------------------------------
# Exact distinct users per hopping window (non-decomposable aggregate)
# --------------------------------------------------------------------------


def events_sliding_distinct(
    sf_dir: str, window_s: int = 3600, hop_s: int = 900
) -> ray.data.Dataset:
    """EXACT count-distinct users per hopping window — the
    non-decomposable streaming aggregate (distinct does not merge
    across panes the way sums do; HLL trades exactness, this keeps
    it): expand each event to its window_s/hop_s covering windows,
    dedup (window, user) INSIDE the batch first (the combiner — the
    same user hitting a window many times in one batch costs one
    row), then one coarse-bucket fold keyed by hash(window, user)
    dedups globally and a window-keyed count finishes.  Nothing
    per-user ever groups (the user domain is unbounded); the shuffle
    rows are (window, user) int64 pairs only.

    Output: (win_start, n_users)."""
    ds = read_table(sf_dir, "events", columns=["ts", "user_id"])
    k = window_s // hop_s

    def expand(t: pa.Table) -> pa.Table:
        epoch_us = t["ts"].cast(pa.int64()).to_numpy()
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts_s = epoch_us // 1_000_000
        base = (ts_s // hop_s) * hop_s
        n = len(ts_s)
        w = np.repeat(base, k) - np.tile(np.arange(k, dtype=np.int64) * hop_s, n)
        u = np.repeat(uid, k)
        # packed (window, user) key for the in-batch dedup: loud wall
        # rather than silent collisions (the bm25 lesson)
        if len(u) and (u.min() < 0 or u.max() >= (1 << 20)):
            raise OverflowError("events_sliding_distinct: widen the user packing")
        key = w * np.int64(1 << 20) + u
        uniq = np.unique(key)
        wv = uniq >> np.int64(20)
        uv = uniq & np.int64((1 << 20) - 1)
        return pa.table(
            {
                "w": pa.array(wv),
                "u": pa.array(uv),
                "bucket": pa.array(
                    ((uniq * np.int64(2654435761)) % np.int64(64)).astype(
                        np.int64
                    )
                ),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates(subset=["w", "u"])
        return (
            g.groupby("w", as_index=False)
            .size()
            .rename(columns={"w": "win_start", "size": "n_users"})
        )

    parts = (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("win_start", as_index=False)["n_users"].sum()
        g["n_users"] = g["n_users"].astype("int64")
        return g

    return parts.repartition(1).map_batches(final, batch_format="pandas")


def events_sliding_distinct_sql(window_s: int = 3600, hop_s: int = 900) -> str:
    k = window_s // hop_s
    return f"""
with ev as (select epoch_us(ts) // 1000000 as ts_s, user_id from events),
ex as (select ((ts_s // {hop_s}) * {hop_s}) - j.v * {hop_s} as win_start,
              user_id
       from ev, unnest(range({k})) j(v))
select cast(win_start as bigint) as win_start,
       cast(count(distinct user_id) as bigint) as n_users
from ex group by win_start
"""
