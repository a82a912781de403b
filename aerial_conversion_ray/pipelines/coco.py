"""COCO-side assembly: images / categories / annotations tables with
deterministic dense IDs, validator, split, balance.

Re-expresses the reference's COCO output semantics over the pages
corpus (SURVEY.md §2e A1/A5, §2d J7/J8/J9, §2b M23):

- images:      one per occupied tile; ``image_id`` dense in the
               reference's column-major tile order (``itertools.
               product(cols, rows)``, ``aerial_conversion/tiles.py:52``)
               = (col_off, row_off) lexicographic.
- categories:  dense ``category_id`` in first-appearance order made
               deterministic as min(page_id) per lang
               (``factorize`` analog, ``scripts/geojson2coco.py:216``).
- annotations: dense ``annot_id`` by (image_id, page_id) global order
               via per-image counts -> prefix-sum offsets (the A5
               concat-remap primitive, ``batch_geojson2coco.py:366-476``).
- validate:    M23 (``COCO_validator.py:7-79``): per-rule violation
               counts incl. FK integrity via broadcast key sets.
- split:       deterministic image split + annotation semi-join
               (``scripts/coco_split.py`` with seeded-hash determinism).
- balance:     dominant-class sample-down (``scripts/coco_balance.py:
               45-164``) with a deterministic keep-first-median rule
               replacing the unseeded ``random.sample``.

All queries here are SQL-mirrored (dense IDs are pure window
functions over deterministic sort keys).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..config import EngineConfig
from . import spatial
from .sql_oracle import tile_clip_join_sql

DEFAULT_CFG = EngineConfig()

TEST_MOD = 5  # image_id % TEST_MOD == 0 -> test split


def _tile_table(cfg: EngineConfig) -> str:
    """SQL CTE fragment: occupied tiles with dense image ids."""
    r, g = cfg.raster, cfg.grid
    tw, th = g.tile_width, g.tile_height
    return (
        "tiles as (select tile_id, "
        "cast(split_part(split_part(tile_id, '_', 2), '-', 1) as bigint) as col_off, "
        "cast(split_part(split_part(tile_id, '_', 2), '-', 2) as bigint) as row_off, "
        "count(*) as n_ann from clipjoin group by tile_id), "
        "images as (select tile_id, col_off, row_off, "
        f"least(col_off + {tw}, {r.ncols}) - col_off as width, "
        f"least(row_off + {th}, {r.nrows}) - row_off as height, n_ann, "
        "row_number() over (order by col_off, row_off) - 1 as image_id from tiles)"
    )


def _parse_tile_ids(tile_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized ``tile_{col}-{row}`` -> (col_off, row_off)."""
    stripped = np.char.partition(tile_id.astype("U32"), "_")[:, 2]
    parts = np.char.partition(stripped, "-")
    return parts[:, 0].astype(np.int64), parts[:, 2].astype(np.int64)


def _images_df(sf_dir: str, cfg: EngineConfig, clip=None) -> pd.DataFrame:
    """Occupied-tile image table (SMALL: bounded by the tile grid, 120
    tiles at the default raster) — per-tile counts via one groupby,
    dense ids assigned on the driver in (col_off, row_off) order.
    ``clip`` reuses a shared materialized clip-join scan."""
    from ray.data.aggregate import Count

    ds = (clip or spatial.tile_clip_join(sf_dir, cfg)).select_columns(["tile_id"])
    counts = ds.groupby("tile_id").aggregate(Count(alias_name="n_ann")).to_pandas()
    coff, roff = _parse_tile_ids(counts["tile_id"].to_numpy())
    counts["col_off"] = coff
    counts["row_off"] = roff
    counts = counts.sort_values(["col_off", "row_off"], kind="mergesort").reset_index(
        drop=True
    )
    counts["image_id"] = np.arange(len(counts), dtype=np.int64)
    r, g = cfg.raster, cfg.grid
    counts["width"] = np.minimum(counts["col_off"] + g.tile_width, r.ncols) - counts["col_off"]
    counts["height"] = np.minimum(counts["row_off"] + g.tile_height, r.nrows) - counts["row_off"]
    return counts[
        ["tile_id", "col_off", "row_off", "width", "height", "n_ann", "image_id"]
    ]


def coco_images(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> pd.DataFrame:
    return _images_df(sf_dir, cfg)


def coco_images_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    return (
        f"with clipjoin as ({tile_clip_join_sql(cfg)}), {_tile_table(cfg)} "
        "select tile_id, col_off, row_off, width, height, n_ann, image_id from images"
    )


def coco_categories(
    sf_dir: str, cfg: EngineConfig = DEFAULT_CFG, clip=None
) -> pd.DataFrame:
    """lang -> dense category_id by min(page_id) first appearance."""
    from ray.data.aggregate import Min

    ds = (clip or spatial.tile_clip_join(sf_dir, cfg)).select_columns(
        ["lang", "page_id"]
    )
    firsts = (
        ds.groupby("lang").aggregate(Min("page_id", alias_name="first_page")).to_pandas()
    )
    firsts = firsts.sort_values("first_page", kind="mergesort").reset_index(drop=True)
    firsts["category_id"] = np.arange(len(firsts), dtype=np.int64)
    return firsts[["lang", "first_page", "category_id"]]


def coco_categories_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    return (
        f"with clipjoin as ({tile_clip_join_sql(cfg)}) "
        "select lang, first_page, "
        "row_number() over (order by first_page) - 1 as category_id "
        "from (select lang, min(page_id) as first_page from clipjoin group by lang)"
    )


RANK_BUCKET = 4096  # page_ids per annot-id rank bucket (see below)


def _bucket_offsets(
    sf_dir: str, cfg: EngineConfig, images: pd.DataFrame, clip=None
) -> dict:
    """Global annot-id offset per (image_id, page_id // RANK_BUCKET).

    Skew guard: grouping by image_id alone puts ~20% of the corpus in
    the hot tile's single group (the synthetic Zipf cell).  Bucketing
    by fixed page_id ranges splits every image's annotations into
    groups of <= RANK_BUCKET rows while keeping the global (image,
    page) order: offsets are one cumsum over the aggregated (image,
    bucket) counts in that order.  Buckets are pure arithmetic on
    page_id, so the result is independent of block/batch boundaries."""
    from ray.data.aggregate import Sum

    ds = (clip or spatial.tile_clip_join(sf_dir, cfg)).select_columns(
        ["tile_id", "page_id"]
    )

    def part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(bucket=df["page_id"] // RANK_BUCKET)
        g = df.groupby(["tile_id", "bucket"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    def part_fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["tile_id", "bucket"], as_index=False)["n"].sum()

    def shard(df: pd.DataFrame) -> pd.DataFrame:
        # coarse shuffle key (per-(tile,bucket) aggregate would pay
        # Ray's per-group overhead on an unbounded key); the string
        # hash MUST be deterministic across worker processes —
        # builtin hash() is per-process salted
        from .text import _hash_arrow_strings

        th = _hash_arrow_strings(pa.array(df["tile_id"].tolist()))
        return df.assign(
            shard=(
                (df["bucket"].to_numpy(np.uint64) * np.uint64(131) + th)
                % np.uint64(64)
            ).astype(np.int64)
        )

    counts = (
        ds.map_batches(part, batch_format="pandas")
        .map_batches(shard, batch_format="pandas")
        .groupby("shard")
        .map_groups(part_fold, batch_format="pandas")
        .to_pandas()
    )
    counts = counts.merge(images[["tile_id", "image_id"]], on="tile_id")
    counts = counts.sort_values(["image_id", "bucket"], kind="mergesort").reset_index(
        drop=True
    )
    offs = np.concatenate([[0], np.cumsum(counts["n"].to_numpy())[:-1]]).astype(np.int64)
    return dict(
        zip(zip(counts["image_id"].tolist(), counts["bucket"].tolist()), offs.tolist())
    )


def _coco_smallsides(
    cfg: EngineConfig, clip
) -> tuple[pd.DataFrame, pd.DataFrame, dict]:
    """(images, categories, offsets) from ONE clip-scan: the three
    small sides are all aggregates of the same (tile_id, lang,
    page-bucket) grouped table, so one combined partial pass +
    coarse-shard fold replaces the three separate full scans
    coco_annotations used to pay (round-5 measurement: the lazy
    re-executed plan cost ~4x one scan at sf0.1 where the aggregate
    output is a few thousand rows).  The fold table is bounded by
    tiles x langs x page-buckets — never the corpus.  Results are
    byte-identical to _images_df / coco_categories / _bucket_offsets
    (parity-asserted in tests/test_coco.py)."""
    ds = clip.select_columns(["tile_id", "lang", "page_id"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(bucket=df["page_id"] // RANK_BUCKET)
        return df.groupby(["tile_id", "lang", "bucket"], as_index=False).agg(
            n=("page_id", "size"), first_page=("page_id", "min")
        )

    def shard(df: pd.DataFrame) -> pd.DataFrame:
        from .text import _hash_arrow_strings

        th = _hash_arrow_strings(pa.array(df["tile_id"].tolist()))
        return df.assign(
            shard=(
                (df["bucket"].to_numpy(np.uint64) * np.uint64(131) + th)
                % np.uint64(64)
            ).astype(np.int64)
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["tile_id", "lang", "bucket"], as_index=False).agg(
            n=("n", "sum"), first_page=("first_page", "min")
        )

    A = (
        ds.map_batches(part, batch_format="pandas")
        .map_batches(shard, batch_format="pandas")
        .groupby("shard")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )

    # images: per-tile counts, dense ids in (col_off, row_off) order
    counts = (
        A.groupby("tile_id", as_index=False)["n"].sum().rename(columns={"n": "n_ann"})
    )
    coff, roff = _parse_tile_ids(counts["tile_id"].to_numpy())
    counts["col_off"] = coff
    counts["row_off"] = roff
    counts = counts.sort_values(
        ["col_off", "row_off"], kind="mergesort"
    ).reset_index(drop=True)
    counts["image_id"] = np.arange(len(counts), dtype=np.int64)
    r, g = cfg.raster, cfg.grid
    counts["width"] = (
        np.minimum(counts["col_off"] + g.tile_width, r.ncols) - counts["col_off"]
    )
    counts["height"] = (
        np.minimum(counts["row_off"] + g.tile_height, r.nrows) - counts["row_off"]
    )
    images = counts[
        ["tile_id", "col_off", "row_off", "width", "height", "n_ann", "image_id"]
    ]

    # categories: lang -> dense id by min(page_id) first appearance
    firsts = (
        A.groupby("lang", as_index=False)["first_page"]
        .min()
        .sort_values("first_page", kind="mergesort")
        .reset_index(drop=True)
    )
    firsts["category_id"] = np.arange(len(firsts), dtype=np.int64)
    cats = firsts[["lang", "first_page", "category_id"]]

    # offsets: global annot-id offset per (image_id, bucket)
    oc = A.groupby(["tile_id", "bucket"], as_index=False)["n"].sum()
    oc = oc.merge(images[["tile_id", "image_id"]], on="tile_id")
    oc = oc.sort_values(["image_id", "bucket"], kind="mergesort").reset_index(
        drop=True
    )
    offs = np.concatenate([[0], np.cumsum(oc["n"].to_numpy())[:-1]]).astype(np.int64)
    offsets = dict(
        zip(zip(oc["image_id"].tolist(), oc["bucket"].tolist()), offs.tolist())
    )
    return images, cats, offsets


def coco_annotations(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    """Annotation table with dense IDs: image_id / category_id via
    broadcast maps (built once, read per task), annot_id via
    (image, page-bucket) counts -> one global prefix sum -> in-group
    rank.  Streaming dense-ID assignment with NO global sort and NO
    fat group: the groupby key is (image_id, bucket), so the hot tile
    never forms a single 20%-of-data group (cf. the zone_merge
    skew-proof paint)."""
    import ray

    # TWO clip-scan passes total (small sides fused into one,
    # round-5; main pass below).  Deliberately NOT materialized:
    # at corpus scale the clip join is corpus-sized and a mid-pipeline
    # materialize() is a barrier + object-store residency cost, while
    # re-executing the streamed scan costs only CPU.
    clip = spatial.tile_clip_join(sf_dir, cfg).select_columns(
        ["page_id", "tile_id", "lang", "bbox_x", "bbox_y", "bbox_w", "bbox_h"]
    )
    images, cats, offsets = _coco_smallsides(cfg, clip)
    img_map = dict(zip(images["tile_id"], images["image_id"]))
    cat_map = dict(zip(cats["lang"], cats["category_id"]))
    img_ref = ray.put(img_map)
    off_ref = ray.put(offsets)
    cat_ref = ray.put(cat_map)

    ds = clip

    # task-based (no actor pool): the broadcast maps resolve from the
    # local object store per task; chaining actor pools here would
    # reserve every CPU of a small session (see verify-skill gotcha)
    def attach(df: pd.DataFrame) -> pd.DataFrame:
        img = ray.get(img_ref)
        cat = ray.get(cat_ref)
        df["image_id"] = df["tile_id"].map(img).astype(np.int64)
        df["category_id"] = df["lang"].map(cat).astype(np.int64)
        df["bucket"] = (df["page_id"] // RANK_BUCKET).astype(np.int64)
        return df

    ds = ds.map_batches(attach, batch_format="pandas")

    def shard_rows(df: pd.DataFrame) -> pd.DataFrame:
        key = df["image_id"].to_numpy(np.int64) * np.int64(1_000_003) + df[
            "bucket"
        ].to_numpy(np.int64)
        return df.assign(shard=key % np.int64(64))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        # a shard holds MANY (image_id, bucket) groups — rank inside
        # each via one vectorized sort + cumcount, offsets resolved by
        # a merge against the broadcast offset table (no per-group
        # Python; a per-(image,bucket) map_groups paid Ray's ~3.5 ms/
        # group dispatch)
        off = ray.get(off_ref)
        df = df.sort_values(
            ["image_id", "bucket", "page_id"], kind="mergesort"
        ).reset_index(drop=True)
        rank = df.groupby(["image_id", "bucket"], sort=False).cumcount().to_numpy()
        off_df = pd.DataFrame(
            [(i, b, o) for (i, b), o in off.items()],
            columns=["image_id", "bucket", "off"],
        )
        base = (
            df[["image_id", "bucket"]]
            .merge(off_df, on=["image_id", "bucket"], how="left")["off"]
            .to_numpy(np.int64)
        )
        df["annot_id"] = base + rank
        df["area"] = (df["bbox_w"] * df["bbox_h"]).astype(np.int64)
        df["iscrowd"] = np.zeros(len(df), dtype=np.int64)
        return df[
            [
                "annot_id",
                "image_id",
                "category_id",
                "page_id",
                "bbox_x",
                "bbox_y",
                "bbox_w",
                "bbox_h",
                "area",
                "iscrowd",
            ]
        ]

    return (
        ds.map_batches(shard_rows, batch_format="pandas")
        .groupby("shard")
        .map_groups(assign, batch_format="pandas")
    )


def coco_annotations_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    return (
        f"with clipjoin as ({tile_clip_join_sql(cfg)}), {_tile_table(cfg)}, "
        "cats as (select lang, row_number() over (order by first_page) - 1 as category_id "
        " from (select lang, min(page_id) as first_page from clipjoin group by lang)) "
        "select row_number() over (order by i.image_id, c.page_id) - 1 as annot_id, "
        "i.image_id, k.category_id, c.page_id, "
        "c.bbox_x, c.bbox_y, c.bbox_w, c.bbox_h, "
        "cast(c.bbox_w * c.bbox_h as bigint) as area, cast(0 as bigint) as iscrowd "
        "from clipjoin c join images i using (tile_id) join cats k using (lang)"
    )


# ~150 bytes/record -> ~150 MB of driver heap at the bound, a safe
# ceiling for a single-file export on any node
MAX_DRIVER_IMAGES = 1_000_000


def to_coco_json(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG, path: str | None = None) -> str:
    """Driver-side COCO JSON collector (S4, the reference's primary
    artifact: ``aerial_conversion/coco.py:32-57`` writer shape,
    validated keys per ``COCO_validator.py:58``).  images/categories
    are grid-bounded small tables; annotations STREAM to the file via
    ``iter_batches`` (never materialized as one Python list of dicts).
    Returns the path written."""
    import json
    import tempfile

    images = _images_df(sf_dir, cfg)
    cats = coco_categories(sf_dir, cfg)
    anns = coco_annotations(sf_dir, cfg)
    # ENFORCED driver bound: images/categories are the only parts this
    # collector materializes (annotations stream batch-by-batch below).
    # A COCO file whose image table alone exceeds this belongs to the
    # partitioned lineage writer (state/lineage.resumable_write), not a
    # single driver-assembled JSON document.
    if len(images) > MAX_DRIVER_IMAGES:
        raise ValueError(
            f"{len(images)} images exceeds the driver-side collector bound "
            f"({MAX_DRIVER_IMAGES}); write partitioned COCO shards via "
            "state.lineage.resumable_write instead"
        )
    if path is None:
        path = tempfile.mkstemp(prefix="coco_", suffix=".json")[1]

    with open(path, "w") as fh:
        fh.write('{"type": "instances", "licenses": [{"id": 0, "name": ""}], ')
        fh.write('"info": {"description": "aerial_conversion_ray export"}, ')
        fh.write('"images": ')
        img_recs = [
            {
                "license": 0,
                "file_name": f"{r.tile_id}.png",
                "height": int(r.height),
                "width": int(r.width),
                "id": int(r.image_id),
            }
            for r in images.itertuples()
        ]
        json.dump(img_recs, fh)
        fh.write(', "categories": ')
        cat_recs = [
            {"supercategory": "lang", "id": int(r.category_id), "name": str(r.lang)}
            for r in cats.itertuples()
        ]
        json.dump(cat_recs, fh)
        fh.write(', "annotations": [')
        first = True
        for b in anns.iter_batches(batch_size=8192, batch_format="pandas"):
            for r in b.itertuples():
                x, y, w, h = int(r.bbox_x), int(r.bbox_y), int(r.bbox_w), int(r.bbox_h)
                rec = {
                    "segmentation": [x, y, x + w, y, x + w, y + h, x, y + h],
                    "area": int(r.area),
                    "iscrowd": int(r.iscrowd),
                    "image_id": int(r.image_id),
                    "bbox": [x, y, w, h],
                    "category_id": int(r.category_id),
                    "id": int(r.annot_id),
                    "page_id": int(r.page_id),
                }
                fh.write(("" if first else ", ") + json.dumps(rec))
                first = False
        fh.write("]}")
    return path


def read_coco_json(path: str) -> dict[str, pa.Table]:
    """COCO JSON reader (S3, ``aerial_conversion/coco.py:314-327``):
    one nested document -> three columnar Arrow tables matching the
    engine's native schemas."""
    import json

    with open(path) as fh:
        doc = json.load(fh)
    images = pa.table(
        {
            "tile_id": pa.array([i["file_name"].removesuffix(".png") for i in doc["images"]]),
            "width": pa.array([int(i["width"]) for i in doc["images"]], pa.int64()),
            "height": pa.array([int(i["height"]) for i in doc["images"]], pa.int64()),
            "image_id": pa.array([int(i["id"]) for i in doc["images"]], pa.int64()),
        }
    )
    cats = pa.table(
        {
            "lang": pa.array([c["name"] for c in doc["categories"]]),
            "category_id": pa.array([int(c["id"]) for c in doc["categories"]], pa.int64()),
        }
    )
    a = doc["annotations"]
    anns = pa.table(
        {
            "annot_id": pa.array([int(r["id"]) for r in a], pa.int64()),
            "image_id": pa.array([int(r["image_id"]) for r in a], pa.int64()),
            "category_id": pa.array([int(r["category_id"]) for r in a], pa.int64()),
            "page_id": pa.array([int(r["page_id"]) for r in a], pa.int64()),
            "bbox_x": pa.array([int(r["bbox"][0]) for r in a], pa.int64()),
            "bbox_y": pa.array([int(r["bbox"][1]) for r in a], pa.int64()),
            "bbox_w": pa.array([int(r["bbox"][2]) for r in a], pa.int64()),
            "bbox_h": pa.array([int(r["bbox"][3]) for r in a], pa.int64()),
            "area": pa.array([int(r["area"]) for r in a], pa.int64()),
            "iscrowd": pa.array([int(r["iscrowd"]) for r in a], pa.int64()),
        }
    )
    return {"images": images, "categories": cats, "annotations": anns}


def coco_roundtrip(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> pa.Table:
    """Emit the COCO JSON document and read it back: the returned
    annotations table must equal ``coco_annotations`` exactly (the
    reference's write->read round trip, gated against the same SQL
    oracle)."""
    import os

    path = to_coco_json(sf_dir, cfg)
    try:
        return read_coco_json(path)["annotations"]
    finally:
        os.unlink(path)


def coco_validate(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> pd.DataFrame:
    """M23 validator as vectorized per-batch checks + broadcast-FK
    anti-joins; returns one row per rule with its violation count."""
    import ray

    images = _images_df(sf_dir, cfg)
    cats = coco_categories(sf_dir, cfg)
    img_ids = ray.put(set(images["image_id"].tolist()))
    cat_ids = ray.put(set(cats["category_id"].tolist()))

    anns = coco_annotations(sf_dir, cfg)

    def check(df: pd.DataFrame) -> pd.DataFrame:
        img = ray.get(img_ids)
        cat = ray.get(cat_ids)
        bad_bbox = int(((df["bbox_w"] < 0) | (df["bbox_h"] < 0)).sum())
        bad_area = int((df["area"] != df["bbox_w"] * df["bbox_h"]).sum())
        bad_crowd = int((~df["iscrowd"].isin([0, 1])).sum())
        bad_img_fk = int((~df["image_id"].isin(list(img))).sum())
        bad_cat_fk = int((~df["category_id"].isin(list(cat))).sum())
        return pd.DataFrame(
            {
                "rule": [
                    "bbox_nonneg",
                    "area_eq_wh",
                    "iscrowd_01",
                    "image_fk",
                    "category_fk",
                ],
                "n_violations": np.array(
                    [bad_bbox, bad_area, bad_crowd, bad_img_fk, bad_cat_fk],
                    dtype=np.int64,
                ),
            }
        )

    partials = anns.map_batches(check, batch_format="pandas")
    from ray.data.aggregate import Sum

    return (
        partials.groupby("rule")
        .aggregate(Sum("n_violations", alias_name="n_violations"))
        .sort("rule")
    )


def coco_validate_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    ann = coco_annotations_sql(cfg)
    return (
        f"with ann as ({ann}) "
        "select rule, n_violations from (values "
        "('area_eq_wh', (select cast(count(*) filter (area != bbox_w * bbox_h) as bigint) from ann)), "
        "('bbox_nonneg', (select cast(count(*) filter (bbox_w < 0 or bbox_h < 0) as bigint) from ann)), "
        "('category_fk', cast(0 as bigint)), "
        "('image_fk', cast(0 as bigint)), "
        "('iscrowd_01', (select cast(count(*) filter (iscrowd not in (0, 1)) as bigint) from ann))"
        ") v(rule, n_violations) order by rule"
    )


def coco_split(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    """Deterministic train/test image split (image_id % TEST_MOD) with
    the annotation semi-join (J7): every annotation tagged by its
    image's split."""
    anns = coco_annotations(sf_dir, cfg)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df["split"] = np.where(
            df["image_id"] % TEST_MOD == 0, "test", "train"
        )
        return df[["annot_id", "image_id", "category_id", "split"]]

    return anns.map_batches(tag, batch_format="pandas")


def coco_split_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    return (
        f"with ann as ({coco_annotations_sql(cfg)}) "
        "select annot_id, image_id, category_id, "
        f"case when image_id % {TEST_MOD} = 0 then 'test' else 'train' end as split "
        "from ann"
    )


def class_stats(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    """A3 grouped stats: per category, annotation count + distinct
    image count.  Distinct pairs fold inside image-keyed COARSE
    buckets (an image's pair rows co-locate, so per-bucket distinct
    counts sum exactly); the final per-category groupby sees
    |categories| keys only."""
    from ray.data.aggregate import Sum

    anns = coco_annotations(sf_dir, cfg).select_columns(["category_id", "image_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["category_id", "image_id"], as_index=False).size()
        g = g.rename(columns={"size": "n_ann"})
        return g.assign(bucket=g["image_id"].to_numpy(np.int64) % 64)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        pairs = df.groupby(["category_id", "image_id"], as_index=False)["n_ann"].sum()
        g = pairs.groupby("category_id", as_index=False).agg(
            n_annotations=("n_ann", "sum"), n_images=("image_id", "size")
        )
        return g

    return (
        anns.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .groupby("category_id")
        .aggregate(
            Sum("n_annotations", alias_name="n_annotations"),
            Sum("n_images", alias_name="n_images"),
        )
        .sort("category_id")
    )


def class_stats_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    return (
        f"with ann as ({coco_annotations_sql(cfg)}) "
        "select category_id, cast(count(*) as bigint) as n_annotations, "
        "cast(count(distinct image_id) as bigint) as n_images "
        "from ann group by category_id order by category_id"
    )


def balance_removal(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> pd.DataFrame:
    """A4 class-balance: sample the DOMINANT category (most
    annotations) down to the median category total by removing its
    heaviest images first (greedy largest-first; ties by image_id).
    Deterministic replacement for the reference's unseeded
    ``random.sample`` (``coco_balance.py:157``)."""
    from ray.data.aggregate import Count

    stats = class_stats(sf_dir, cfg).to_pandas()
    if len(stats) == 0:
        return pd.DataFrame({"image_id": pd.Series(dtype=np.int64)})
    stats = stats.sort_values(
        ["n_annotations", "category_id"], kind="mergesort"
    ).reset_index(drop=True)
    dominant = int(stats["category_id"].iloc[-1])
    total = int(stats["n_annotations"].iloc[-1])
    target = int(np.floor(np.median(stats["n_annotations"].to_numpy())))

    anns = coco_annotations(sf_dir, cfg).select_columns(["category_id", "image_id"])

    def filt(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df["category_id"] == dominant][["image_id"]]
        g = sub.groupby("image_id", as_index=False).size()
        g = g.rename(columns={"size": "n"})
        return g.assign(bucket=g["image_id"].to_numpy(np.int64) % 64)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("image_id", as_index=False)["n"].sum()

    imgs = (
        anns.map_batches(filt, batch_format="pandas")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
        .sort_values(["n", "image_id"], ascending=[False, True], kind="mergesort")
        .reset_index(drop=True)
    )
    cum_before = np.concatenate([[0], np.cumsum(imgs["n"].to_numpy())[:-1]])
    remove = imgs["image_id"].to_numpy(np.int64)[total - cum_before > target]
    return pd.DataFrame({"image_id": remove})


def balance_removal_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    return (
        f"with ann as ({coco_annotations_sql(cfg)}), "
        "stats as (select category_id, count(*) as n_ann from ann group by category_id), "
        "dominant as (select category_id, n_ann as total from stats "
        " order by n_ann asc, category_id asc limit 1 offset (select count(*) - 1 from stats)), "
        "tgt as (select cast(floor(median(n_ann)) as bigint) as g from stats), "
        "dom_imgs as (select image_id, count(*) as n from ann "
        " where category_id = (select category_id from dominant) group by image_id), "
        "ranked as (select image_id, n, "
        " coalesce(sum(n) over (order by n desc, image_id "
        "   rows between unbounded preceding and 1 preceding), 0) as cum_before "
        " from dom_imgs) "
        "select image_id from ranked "
        "where (select total from dominant) - cum_before > (select g from tgt)"
    )


ISOLATE_CAT_IDS = (0, 1)  # gated-query default: the two densest cats


def isolate_cat(
    sf_dir: str,
    cfg: EngineConfig = DEFAULT_CFG,
    cat_ids: tuple = ISOLATE_CAT_IDS,
) -> ray.data.Dataset:
    """``isolate_cat`` balance mode (``scripts/coco_balance.py:199-246``):
    keep only annotations of ``cat_ids``, then keep the images those
    annotations reference.  Mirrors the reference BYTE-FOR-BYTE
    including its quirk: the image-survival scan iterates the
    PRE-FILTER annotation list (``coco_balance.py:233-236`` loops the
    ``annotations`` variable bound before the filter), so an image
    referenced only by non-isolated categories still survives, with
    zero isolated annotations.  Output: (image_id, n_isolated) for
    every image with >= 1 original annotation.

    Scale shape: one narrow aggregate — per-batch partial counts of
    (any, isolated) per image, folded inside hash(image_id) % 64
    coarse buckets (image_id is tile-grid-cardinality at 100 TB; a
    raw-key sort-aggregate there is the repo-wide anti-pattern); the
    output-ordering sort runs over the already-folded one-row-per-
    image result."""
    anns = coco_annotations(sf_dir, cfg).select_columns(["image_id", "category_id"])
    ids = np.asarray(cat_ids, np.int64)

    def partial(t: pa.Table) -> pa.Table:
        img = t["image_id"].to_numpy(zero_copy_only=False)
        cat = t["category_id"].to_numpy(zero_copy_only=False)
        iso = np.isin(cat, ids)
        u, inv = np.unique(img, return_inverse=True)
        return pa.table(
            {
                "image_id": pa.array(u),
                "n_isolated": pa.array(np.bincount(inv, iso).astype(np.int64)),
                "ib": pa.array((u % 64).astype(np.int64)),
            }
        )

    def fold(df):
        g = df.groupby("image_id", sort=False, as_index=False)[
            "n_isolated"
        ].sum()
        g["n_isolated"] = g["n_isolated"].astype(np.int64)
        return g

    return (
        anns.map_batches(partial, batch_format="pyarrow")
        .groupby("ib")
        .map_groups(fold, batch_format="pandas")
        .sort("image_id")
    )


def isolate_cat_sql(
    cfg: EngineConfig = DEFAULT_CFG, cat_ids: tuple = ISOLATE_CAT_IDS
) -> str:
    ids = ", ".join(str(i) for i in cat_ids)
    return (
        f"with ann as ({coco_annotations_sql(cfg)}) "
        "select image_id, "
        f"cast(count(*) filter (category_id in ({ids})) as bigint) as n_isolated "
        "from ann group by image_id order by image_id"
    )


# --------------------------------------------------------------------------
# A6 small/singleton-class drop + SO3 exact-quota stratified split
# --------------------------------------------------------------------------

DROP_MIN_COUNT = 60   # gated query threshold (bites at sf0.01)
STRAT_TEST_DEN = 5    # test quota = class_count // DEN (exact per class)


def drop_small_classes(
    sf_dir: str, cfg: EngineConfig = DEFAULT_CFG, min_count: int = DROP_MIN_COUNT
) -> ray.data.Dataset:
    """A6: drop annotations of FINE classes (lang, source) with fewer
    than ``min_count`` members — ``min_count=2`` is the reference's
    singleton-class drop before stratification (a 1-member class
    cannot be split).  Two passes, both streaming: a narrow pre-counted
    groupby finds the small classes (result is tiny — one row per
    class), the keep-set broadcasts via ``ray.put`` and the corpus is
    filtered in a task-based map_batches (no second shuffle)."""
    import ray as _ray
    from ray.data.aggregate import Sum

    ds = spatial.tile_clip_join(sf_dir, cfg).select_columns(
        ["page_id", "tile_id", "lang", "source"]
    )

    def part(t: pa.Table) -> pa.Table:
        g = t.select(["lang", "source"]).group_by(["lang", "source"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["lang", "source", "n"])

    counts = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    big = counts[counts["n"] >= min_count]
    keep = frozenset(big["lang"] + "\x00" + big["source"])
    keep_ref = _ray.put(keep)

    def filt(df: pd.DataFrame) -> pd.DataFrame:
        ok = (df["lang"] + "\x00" + df["source"]).isin(_ray.get(keep_ref))
        return df[ok.to_numpy()]

    return ds.map_batches(filt, batch_format="pandas")


def drop_small_classes_sql(
    cfg: EngineConfig = DEFAULT_CFG, min_count: int = DROP_MIN_COUNT
) -> str:
    return (
        f"with clipjoin as ({tile_clip_join_sql(cfg)}), "
        "big as (select lang, source from clipjoin group by lang, source "
        f" having count(*) >= {min_count}) "
        "select c.page_id, c.tile_id, c.lang, c.source "
        "from clipjoin c join big using (lang, source)"
    )


def stratified_split(
    sf_dir: str, cfg: EngineConfig = DEFAULT_CFG, test_den: int = STRAT_TEST_DEN
) -> ray.data.Dataset:
    """SO3 TRUE stratified split: per category an EXACT test quota of
    ``class_count // test_den`` annotations (the reference's
    stratified COCO split semantics; the mod-split in
    :func:`coco_split` only approximates per-class proportions).

    Rank-within-class uses the same skew-proof two-level prefix sum as
    :func:`coco_annotations`: per-(category, annot-id-bucket) counts
    aggregate to a tiny driver table, one cumsum per class gives each
    bucket its global in-class offset, and the per-row rank is the
    offset plus the in-bucket position — no global sort, no fat
    group (buckets bound every group at RANK_BUCKET rows)."""
    import ray as _ray

    from ray.data.aggregate import Sum

    anns = coco_annotations(sf_dir, cfg).select_columns(["annot_id", "category_id"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(bucket=df["annot_id"] // RANK_BUCKET)
        g = df.groupby(["category_id", "bucket"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    counts = (
        anns.map_batches(part, batch_format="pandas")
        .groupby(["category_id", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["category_id", "bucket"], kind="mergesort")
        .reset_index(drop=True)
    )
    n = counts["n"].to_numpy(np.int64)
    cum = np.cumsum(n) - n
    first = counts["category_id"].ne(counts["category_id"].shift()).to_numpy()
    class_start = np.maximum.accumulate(np.where(first, cum, 0))
    offs = dict(
        zip(
            zip(counts["category_id"].tolist(), counts["bucket"].tolist()),
            (cum - class_start).tolist(),
        )
    )
    totals = counts.groupby("category_id")["n"].sum()
    quota = {int(c): int(t) // test_den for c, t in totals.items()}
    off_ref = _ray.put((offs, quota))

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        offs_, quota_ = _ray.get(off_ref)
        df = df.sort_values("annot_id", kind="mergesort").reset_index(drop=True)
        cat = int(df["category_id"].iloc[0])
        off = offs_[(cat, int(df["annot_id"].iloc[0]) // RANK_BUCKET)]
        rank = off + np.arange(len(df), dtype=np.int64)
        df["split"] = np.where(rank < quota_[cat], "test", "train")
        return df[["annot_id", "category_id", "split"]]

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = (df["annot_id"] // RANK_BUCKET).astype(np.int64)
        return df

    return (
        anns.map_batches(bucketed, batch_format="pandas")
        .groupby(["category_id", "bucket"])
        .map_groups(tag, batch_format="pandas")
    )


def stratified_split_sql(
    cfg: EngineConfig = DEFAULT_CFG, test_den: int = STRAT_TEST_DEN
) -> str:
    return (
        f"with ann as ({coco_annotations_sql(cfg)}), "
        "ranked as (select annot_id, category_id, "
        " row_number() over (partition by category_id order by annot_id) - 1 as rank, "
        " count(*) over (partition by category_id) as total from ann) "
        f"select annot_id, category_id, "
        f"case when rank < total // {test_den} then 'test' else 'train' end as split "
        "from ranked"
    )


# --------------------------------------------------------------------------
# multi-label ITERATIVE stratification (image-level, Sechidis-style)
# --------------------------------------------------------------------------


def iter_stratified_split(
    sf_dir: str, cfg: EngineConfig = DEFAULT_CFG, test_den: int = STRAT_TEST_DEN
) -> ray.data.Dataset:
    """Image-level MULTI-LABEL stratified split: each image carries the
    label SET of its annotations, and the split balances every label
    simultaneously — the reference's skmultilearn iterative
    stratification (``scripts/coco_split.py:110-114``, Sechidis et al.
    2011), which :func:`stratified_split` only approximates
    per-annotation.

    Ray-first decomposition (the sequential heart is tiny, the data
    passes are distributed):

    1. distinct (image, label) pairs -> per-image label-set SIGNATURE
       (one narrow ``groupby(image_id)``);
    2. ``groupby(sig).count`` -> one row per DISTINCT label set — the
       driver table is label-set-vocabulary-sized, not corpus-sized
       (images with identical label sets are interchangeable w.r.t.
       every label constraint, so they can be assigned as a block);
    3. driver: Sechidis order (rarest label first) over signature
       BLOCKS with the per-block closed form of the per-image rule —
       assigning x of m identical images to test drives the two
       normalized demands toward each other; the crossing point is
       ``k = round(d_test*w_train - d_train*w_test + m*w_test)``
       (w_test + w_train = 1), clamped to [0, m]; demands of every
       label in the set update by (k, m-k);
    4. broadcast {sig: k}; a final ``groupby(sig)`` assigns the k
       smallest image_ids of each signature to test (deterministic;
       a pathologically hot signature would use the same
       (sig, id-bucket) two-level rank as :func:`stratified_split`).

    Iterative + data-dependent -> no SQL oracle (rows-only driver
    check); determinism + per-label balance-beats-hash-split asserted
    in tests/test_round3_ops.py.
    """
    import ray as _ray
    from ray.data.aggregate import Count

    anns = coco_annotations(sf_dir, cfg).select_columns(["image_id", "category_id"])

    def batch_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates(["image_id", "category_id"])
        return g.assign(bucket=g["image_id"].to_numpy(np.int64) % 64)

    def sig_fold(df: pd.DataFrame) -> pd.DataFrame:
        # an image's pairs co-locate in its bucket; the per-image
        # label-set join is one pandas groupby-agg (no per-group RAY
        # dispatch — the previous per-image map_groups paid ~3.5 ms
        # of Ray overhead per image)
        df = df.sort_values(["image_id", "category_id"], kind="mergesort")
        s = df.groupby("image_id", sort=False)["category_id"].agg(
            lambda v: ",".join(map(str, dict.fromkeys(v.astype(int))))
        )
        out = pd.DataFrame({"image_id": s.index.to_numpy(np.int64), "sig": s.to_numpy()})
        from .text import _hash_arrow_strings

        h = _hash_arrow_strings(pa.array(out["sig"].tolist()))
        return out.assign(sbucket=(h % np.uint64(64)).astype(np.int64))

    pairs = (
        anns.map_batches(batch_pairs, batch_format="pandas")
        .groupby("bucket")
        .map_groups(sig_fold, batch_format="pandas")
    )

    def count_fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("sig", as_index=False).size()
        return g.rename(columns={"size": "m"})

    sig_counts = (
        pairs.groupby("sbucket")
        .map_groups(count_fold, batch_format="pandas")
        .to_pandas()
        .sort_values("sig")
        .reset_index(drop=True)
    )

    # per-label totals from the signature table itself (exact: each
    # image counted once per label it carries)
    c: dict[int, int] = {}
    for s, m in zip(sig_counts["sig"], sig_counts["m"]):
        for lab in map(int, s.split(",")):
            c[lab] = c.get(lab, 0) + int(m)

    w_t = 1.0 / test_den
    w_tr = 1.0 - w_t
    d_t = {j: cj * w_t for j, cj in c.items()}     # remaining test demand
    d_tr = {j: cj * w_tr for j, cj in c.items()}   # remaining train demand

    def rarest(s: str) -> tuple[int, int]:
        labs = [int(x) for x in s.split(",")]
        cnts = sorted((c[j], j) for j in labs)
        return cnts[0]

    order = sorted(
        range(len(sig_counts)),
        key=lambda i: (rarest(sig_counts["sig"][i]), sig_counts["sig"][i]),
    )
    quota: dict[str, int] = {}
    for i in order:
        s, m = sig_counts["sig"][i], int(sig_counts["m"][i])
        _, j = rarest(s)
        k = int(round(d_t[j] * w_tr - d_tr[j] * w_t + m * w_t))
        k = max(0, min(m, k))
        quota[s] = k
        for lab in map(int, s.split(",")):
            d_t[lab] -= k
            d_tr[lab] -= m - k
    q_ref = _ray.put(quota)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        # one bucket holds many signatures: vectorized in-sig rank via
        # sort + cumcount, quota resolved by map (sig -> k broadcast)
        q = _ray.get(q_ref)
        df = df.sort_values(["sig", "image_id"], kind="mergesort").reset_index(drop=True)
        rank = df.groupby("sig", sort=False).cumcount().to_numpy()
        k = df["sig"].map(q).to_numpy(np.int64)
        return pd.DataFrame(
            {
                "image_id": df["image_id"].to_numpy(np.int64),
                "sig": df["sig"],
                "split": np.where(rank < k, "test", "train"),
            }
        )

    return pairs.groupby("sbucket").map_groups(assign, batch_format="pandas")


ITER_STRAT_GATE = 2_000_000   # max images the exact greedy collects


def iter_stratified_split_exact(
    sf_dir: str,
    cfg: EngineConfig = DEFAULT_CFG,
    test_den: int = STRAT_TEST_DEN,
    gate: int = ITER_STRAT_GATE,
) -> ray.data.Dataset:
    """EXACT per-sample iterative stratification (Sechidis et al.
    2011; the algorithm behind the reference's skmultilearn call,
    ``scripts/coco_split.py:110-114``) — the last SURVEY gap after
    :func:`iter_stratified_split`'s signature-block variant:

    repeat until every image is assigned:
      1. pick the label with the FEWEST remaining unassigned images
         (ties -> smallest label id);
      2. for each unassigned image carrying it (image_id order):
         assign to the fold with the larger remaining demand for that
         label; ties -> larger total remaining demand; ties -> test;
         decrement the fold's demand for every label the image has.

    The greedy is inherently sequential (each assignment changes the
    demands the next one reads), so it runs on the driver over the
    distinct (image, label-set) table — the GATED small side (one row
    per annotated image; loud ValueError past ``gate``, where the
    signature-block variant is the documented fallback).  All data
    passes (pair dedupe, label-set fold) are distributed; only the
    images-bounded assignment loop is driver-side.  Deterministic by
    construction (no RNG; documented tie-breaks).

    Output: (image_id, split).  Rows-only driver entry (iterative +
    data-dependent, no bounded SQL unroll); determinism and
    per-label balance asserted in tests/test_round5_ops.py."""
    import ray as _ray

    anns = coco_annotations(sf_dir, cfg).select_columns(["image_id", "category_id"])

    def dd(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates(["image_id", "category_id"])
        return g.assign(bucket=g["image_id"].to_numpy(np.int64) % 64)

    def fold_dd(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["image_id", "category_id"])[
            ["image_id", "category_id"]
        ]

    pairs_ds = (
        anns.map_batches(dd, batch_format="pandas")
        .groupby("bucket")
        .map_groups(fold_dd, batch_format="pandas")
        .materialize()
    )
    pairs = pairs_ds.to_pandas()
    n_images = pairs["image_id"].nunique()
    if n_images > gate:
        raise ValueError(
            f"iter_stratified_split_exact: {n_images} images exceed the "
            f"driver gate ({gate}); use iter_stratified_split"
        )

    pairs = pairs.sort_values(["image_id", "category_id"], kind="mergesort")
    img_ids = pairs["image_id"].to_numpy(np.int64)
    labs = pairs["category_id"].to_numpy(np.int64)
    uimg, istart = np.unique(img_ids, return_index=True)
    label_sets = np.split(labs, istart[1:])

    c: dict[int, int] = {}
    for ls in label_sets:
        for j in ls:
            c[int(j)] = c.get(int(j), 0) + 1
    w_t = 1.0 / test_den
    d = {
        "test": {j: cj * w_t for j, cj in c.items()},
        "train": {j: cj * (1.0 - w_t) for j, cj in c.items()},
    }
    remaining: dict[int, set] = {}
    for i, ls in enumerate(label_sets):
        for j in ls:
            remaining.setdefault(int(j), set()).add(i)

    split = np.empty(len(uimg), dtype=object)
    assigned = np.zeros(len(uimg), dtype=bool)
    while remaining:
        l = min(remaining, key=lambda j: (len(remaining[j]), j))
        for i in sorted(remaining[l]):
            if assigned[i]:
                continue
            dt, dr = d["test"][l], d["train"][l]
            if dt > dr:
                f = "test"
            elif dr > dt:
                f = "train"
            else:
                tt = sum(d["test"].values())
                tr = sum(d["train"].values())
                f = "test" if tt >= tr else "train"
            split[i] = f
            assigned[i] = True
            for j in label_sets[i]:
                d[f][int(j)] -= 1
                s = remaining.get(int(j))
                if s is not None:
                    s.discard(i)
                    if not s:
                        del remaining[int(j)]
        remaining.pop(l, None)

    out = pd.DataFrame({"image_id": uimg, "split": split.astype(str)})
    return _ray.data.from_pandas(out)
