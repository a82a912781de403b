"""Reverse path: pixel -> spatial, zone merge, regularise.

Ray-Data-first re-expression of the reference's ``coco2geojson``
pipeline (``scripts/coco2geojson.py:188-363``): annotations (the
forward clip-join output) are lifted back to spatial coordinates via
the tile affine transform (``coordinates.py:91-112`` pixel->spatial,
including its floor-quantization loss), merged per zone with a
TWO-LEVEL union (per-(zone, tile) partial union -> per-zone final
combine; tiles are disjoint at offset=0 so the final combine is an
exact integer sum — the associative-partial shape of SURVEY.md §2e
A2), and regularised (simplify / min-rotated-rect / orthogonalise,
``aerial_conversion/coco.py:416-450`` dispatcher semantics).

Oracle story:
- ``spatialize``     SQL-mirrored (pure affine floor arithmetic);
- ``zone_envelope``  SQL-mirrored (groupby min/max/sum fixed-point);
- ``marginal_flags`` SQL-mirrored (M15 bbox-vs-margin predicate);
- ``zone_merge``     rows-only (rect-union sweep is not SQL); exact
                     oracle in tests/test_vectorize.py vs brute numpy;
- ``regularise``     rows-only; kernel unit tests vs numpy oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..config import EngineConfig
from ..geo.polygon import (
    douglas_peucker,
    has_self_intersection,
    min_rotated_rect,
    orthogonalise,
    rect_union_area,
    repair_ring,
    shoelace_area,
)
from . import spatial
from ..util import pool_size
from .sql_oracle import tile_clip_join_sql

DEFAULT_CFG = EngineConfig()

AREA_SCALE = 1_000_000_000.0  # 1e-9 deg^2 fixed point
MARGIN_PCT = 20.0  # marginal if bbox within margin% of tile size (M15)


# --------------------------------------------------------------------------
# spatialize (pixel -> spatial, M6/M7 analog, oracle-checked)
# --------------------------------------------------------------------------

class Spatialize:
    """Append the spatial rect of the QUANTIZED pixel bbox: the
    round-trip image of the footprint after pixel snapping.  Pixel
    (col, row) covers [tx + a*col, tx + a*(col+1)) x (ty + e*(row+1),
    ty + e*row] — the reconstruction spans whole pixels, mirroring the
    reference's pixel_segmentation_to_spatial_rio semantics."""

    def __init__(self, cfg: EngineConfig):
        self.raster = cfg.raster
        self.grid = cfg.grid

    def __call__(self, t: pa.Table) -> pa.Table:
        a, _, c, _, e, f = self.raster.transform
        tw = self.grid.tile_width
        th = self.grid.tile_height
        # tile origin from the clip rect (clip_minx lies inside the tile)
        gx = np.floor((t["clip_minx"].to_numpy() - c) / a).astype(np.int64)
        gy = np.floor((t["clip_maxy"].to_numpy() - f) / e).astype(np.int64)
        coff = (gx // tw) * tw
        roff = (gy // th) * th
        tx = c + a * coff.astype(np.float64)
        ty = f + e * roff.astype(np.float64)
        px0 = t["bbox_x"].to_numpy()
        py0 = t["bbox_y"].to_numpy()
        pw = t["bbox_w"].to_numpy()
        ph = t["bbox_h"].to_numpy()
        sminx = tx + a * px0.astype(np.float64)
        smaxy = ty + e * py0.astype(np.float64)
        smaxx = tx + a * (px0 + pw + 1).astype(np.float64)
        sminy = ty + e * (py0 + ph + 1).astype(np.float64)
        for name, arr in (
            ("ann_minx", sminx),
            ("ann_miny", sminy),
            ("ann_maxx", smaxx),
            ("ann_maxy", smaxy),
        ):
            # snap to 1e-9 fixed point: numpy and DuckDB associate the
            # affine chain differently by 1 ulp; coordinates are
            # 0.05-degree-granular so the snap is far from any boundary
            t = t.append_column(
                name, pa.array(np.floor(arr * 1e9 + 0.5) / 1e9)
            )
        return t


def spatialize(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    """Forward clip join -> pixel-quantized spatial annotation rects.
    ``text`` rides through untouched (byte-identity invariant)."""
    ds = spatial.tile_clip_join(sf_dir, cfg)
    return ds.map_batches(
        Spatialize(cfg), batch_format="pyarrow", batch_size=cfg.batch_size
    )


def spatialize_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    r, g = cfg.raster, cfg.grid
    a, _, c, _, e, f = r.transform
    tw, th = g.tile_width, g.tile_height
    base = tile_clip_join_sql(cfg)
    return (
        f"with clipjoin as ({base}), sp as (select *, "
        f"((cast(floor((clip_minx - {c!r}) / {a!r}) as bigint) // {tw}) * {tw}) as _coff, "
        f"((cast(floor((clip_maxy - {f!r}) / {e!r}) as bigint) // {th}) * {th}) as _roff "
        "from clipjoin) "
        "select * exclude (_coff, _roff), "
        f"floor((({c!r} + {a!r} * _coff) + {a!r} * bbox_x) * 1e9 + 0.5) / 1e9 as ann_minx, "
        f"floor((({f!r} + {e!r} * _roff) + {e!r} * (bbox_y + bbox_h + 1)) * 1e9 + 0.5) / 1e9 as ann_miny, "
        f"floor((({c!r} + {a!r} * _coff) + {a!r} * (bbox_x + bbox_w + 1)) * 1e9 + 0.5) / 1e9 as ann_maxx, "
        f"floor((({f!r} + {e!r} * _roff) + {e!r} * bbox_y) * 1e9 + 0.5) / 1e9 as ann_maxy "
        "from sp"
    )


# --------------------------------------------------------------------------
# segmentation list-polygon lift (M6 full analog, oracle-checked)
# --------------------------------------------------------------------------

class SegmentationSpatialize:
    """M6 with a GENUINE list polygon (not the rect lift): each
    annotation's segmentation is a 5-vertex pentagon in pixel space
    (the quantized clip rect plus a half-pixel roof apex), carried as
    an Arrow ``list<double>`` column of flattened ``[x0,y0,x1,y1,...]``
    pairs — the reference's segmentation layout
    (``coordinates.py pixel_segmentation_to_spatial``) — then lifted
    px->spatial through the tile affine and EXPLODED one row per
    vertex in 1e-9 fixed point."""

    def __init__(self, cfg: EngineConfig):
        self.raster = cfg.raster
        self.grid = cfg.grid

    def __call__(self, t: pa.Table) -> pa.Table:
        a, _, c, _, e, f = self.raster.transform
        tw, th = self.grid.tile_width, self.grid.tile_height
        gx = np.floor((t["clip_minx"].to_numpy() - c) / a).astype(np.int64)
        gy = np.floor((t["clip_maxy"].to_numpy() - f) / e).astype(np.int64)
        tx = c + a * ((gx // tw) * tw).astype(np.float64)
        ty = f + e * ((gy // th) * th).astype(np.float64)
        x0 = t["bbox_x"].to_numpy().astype(np.float64)
        y0 = t["bbox_y"].to_numpy().astype(np.float64)
        x1 = x0 + t["bbox_w"].to_numpy() + 1.0
        y1 = y0 + t["bbox_h"].to_numpy() + 1.0
        n = len(x0)
        # pentagon ring (pixel space): BL, BR, TR, roof apex, TL
        px = np.stack([x0, x1, x1, x0 + (x1 - x0) / 2.0, x0], axis=1)
        py = np.stack([y1, y1, y0, y0 - 0.5, y0], axis=1)
        # the list<double> segmentation column ([x,y,...] flattened)
        seg_flat = np.empty((n, 10), dtype=np.float64)
        seg_flat[:, 0::2] = px
        seg_flat[:, 1::2] = py
        seg = pa.FixedSizeListArray.from_arrays(
            pa.array(seg_flat.reshape(-1)), 10
        )
        # lift every LIST vertex through the affine (consume the list
        # column's flat buffer zero-copy), then explode
        flat = np.asarray(seg.values).reshape(n, 10)
        sx = tx[:, None] + a * flat[:, 0::2]
        sy = ty[:, None] + e * flat[:, 1::2]
        sx_e9 = np.floor(sx * 1e9 + 0.5).astype(np.int64).reshape(-1)
        sy_e9 = np.floor(sy * 1e9 + 0.5).astype(np.int64).reshape(-1)
        return pa.table(
            {
                "page_id": pa.array(
                    np.repeat(t["page_id"].to_numpy(zero_copy_only=False), 5)
                ),
                "tile_id": pa.array(
                    np.asarray(t["tile_id"].to_pylist()).repeat(5)
                ),
                "vertex_idx": pa.array(np.tile(np.arange(5, dtype=np.int64), n)),
                "sx_e9": pa.array(sx_e9),
                "sy_e9": pa.array(sy_e9),
            }
        )


def segmentation_spatialize(
    sf_dir: str, cfg: EngineConfig = DEFAULT_CFG
) -> ray.data.Dataset:
    ds = spatial.tile_clip_join(sf_dir, cfg)
    return ds.map_batches(
        SegmentationSpatialize(cfg),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )


def segmentation_spatialize_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    r, g = cfg.raster, cfg.grid
    a, _, c, _, e, f = r.transform
    tw, th = g.tile_width, g.tile_height
    base = tile_clip_join_sql(cfg)
    return (
        f"with clipjoin as ({base}), sp as (select *, "
        f"({c!r} + {a!r} * ((cast(floor((clip_minx - {c!r}) / {a!r}) as bigint) // {tw}) * {tw})) as _tx, "
        f"({f!r} + {e!r} * ((cast(floor((clip_maxy - {f!r}) / {e!r}) as bigint) // {th}) * {th})) as _ty "
        "from clipjoin), "
        "verts as (select sp.*, v.i, "
        "case v.i when 0 then cast(bbox_x as double) "
        " when 1 then bbox_x + bbox_w + 1.0 "
        " when 2 then bbox_x + bbox_w + 1.0 "
        " when 3 then bbox_x + (bbox_w + 1.0) / 2.0 "
        " else cast(bbox_x as double) end as px, "
        "case v.i when 0 then bbox_y + bbox_h + 1.0 "
        " when 1 then bbox_y + bbox_h + 1.0 "
        " when 2 then cast(bbox_y as double) "
        " when 3 then bbox_y - 0.5 "
        " else cast(bbox_y as double) end as py "
        "from sp, (values (0), (1), (2), (3), (4)) v(i)) "
        "select page_id, tile_id, cast(i as bigint) as vertex_idx, "
        f"cast(floor((_tx + {a!r} * px) * 1e9 + 0.5) as bigint) as sx_e9, "
        f"cast(floor((_ty + {e!r} * py) * 1e9 + 0.5) as bigint) as sy_e9 "
        "from verts"
    )


# --------------------------------------------------------------------------
# marginal flag (M15, oracle-checked)
# --------------------------------------------------------------------------

def marginal_flags(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    """Annotation bbox within MARGIN_PCT of the tile size -> marginal
    (the reference's merge-strategy router, ``coco.py:347-368``)."""
    tw = cfg.grid.tile_width
    th = cfg.grid.tile_height
    wlim = tw * (100.0 - MARGIN_PCT) / 100.0
    hlim = th * (100.0 - MARGIN_PCT) / 100.0

    def flag(t: pa.Table) -> pa.Table:
        w = t["bbox_w"].to_numpy().astype(np.float64)
        h = t["bbox_h"].to_numpy().astype(np.float64)
        marginal = (w >= wlim) | (h >= hlim)
        return pa.table(
            {
                "page_id": t["page_id"],
                "tile_id": t["tile_id"],
                "bbox_w": t["bbox_w"],
                "bbox_h": t["bbox_h"],
                "marginal": pa.array(marginal),
            }
        )

    ds = spatial.tile_clip_join(sf_dir, cfg)
    return ds.map_batches(flag, batch_format="pyarrow", batch_size=cfg.batch_size)


def marginal_flags_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    tw, th = cfg.grid.tile_width, cfg.grid.tile_height
    wlim = tw * (100.0 - MARGIN_PCT) / 100.0
    hlim = th * (100.0 - MARGIN_PCT) / 100.0
    return (
        f"with clipjoin as ({tile_clip_join_sql(cfg)}) "
        "select page_id, tile_id, bbox_w, bbox_h, "
        f"(cast(bbox_w as double) >= {wlim!r} or cast(bbox_h as double) >= {hlim!r}) as marginal "
        "from clipjoin"
    )


# --------------------------------------------------------------------------
# zone merge (A2 two-level union; envelope is the SQL-checked face)
# --------------------------------------------------------------------------

def zone_envelope(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    """Per-zone (lang) envelope of all clipped annotation rects +
    count + exact fixed-point area sum: the oracle-checkable shadow of
    the zone merge (same groupby shape, associative aggregates)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = spatial.tile_clip_join(sf_dir, cfg)

    def prep(t: pa.Table) -> pa.Table:
        area = (
            (t["clip_maxx"].to_numpy() - t["clip_minx"].to_numpy())
            * (t["clip_maxy"].to_numpy() - t["clip_miny"].to_numpy())
        )
        return pa.table(
            {
                "lang": t["lang"],
                "clip_minx": t["clip_minx"],
                "clip_miny": t["clip_miny"],
                "clip_maxx": t["clip_maxx"],
                "clip_maxy": t["clip_maxy"],
                "area_e9": pa.array(
                    np.floor(area * AREA_SCALE + 0.5).astype(np.int64)
                ),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow", batch_size=cfg.batch_size)
        .groupby("lang")
        .aggregate(
            Count(alias_name="n_ann"),
            Min("clip_minx", alias_name="env_minx"),
            Min("clip_miny", alias_name="env_miny"),
            Max("clip_maxx", alias_name="env_maxx"),
            Max("clip_maxy", alias_name="env_maxy"),
            Sum("area_e9", alias_name="sum_area_e9"),
        )
        .sort("lang")
    )


def zone_envelope_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    return (
        f"with clipjoin as ({tile_clip_join_sql(cfg)}) "
        "select lang, count(*) as n_ann, "
        "min(clip_minx) as env_minx, min(clip_miny) as env_miny, "
        "max(clip_maxx) as env_maxx, max(clip_maxy) as env_maxy, "
        "cast(sum(cast(floor((clip_maxx - clip_minx) * (clip_maxy - clip_miny) "
        "* 1000000000.0 + 0.5) as bigint)) as bigint) as sum_area_e9 "
        "from clipjoin group by lang order by lang"
    )


def pixel_union_count(
    x0: np.ndarray, y0: np.ndarray, x1: np.ndarray, y1: np.ndarray,
    width: int, height: int,
) -> int:
    """Union pixel count of inclusive integer rects [x0..x1]x[y0..y1]
    inside a width x height grid, via a 2D difference array + 2D
    cumsum (O(n + W*H) — independent of overlap, so a 200k-rect hot
    tile costs the same as a sparse one).  The rasterize-union kernel:
    pixel-space union IS the reference's mask semantics
    (``geojson2coco`` rasterizes annotations to per-tile masks)."""
    diff = np.zeros((height + 2, width + 2), dtype=np.int32)
    np.add.at(diff, (y0, x0), 1)
    np.add.at(diff, (y1 + 1, x0), -1)
    np.add.at(diff, (y0, x1 + 1), -1)
    np.add.at(diff, (y1 + 1, x1 + 1), 1)
    cover = diff.cumsum(axis=0).cumsum(axis=1)
    return int((cover > 0).sum())


def zone_merge(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    """Two-level zone union in PIXEL space: per-(lang, tile) union
    pixel count (difference-array paint inside map_groups — O(rects +
    tile_px) even for the Zipf hot tile), then per-lang integer sum
    (tiles are disjoint at offset=0, so no geometry crosses a tile
    after the clip and the sum is the exact zone union).  Exact-area
    x-sweep (:func:`rect_union_area`) remains the small-group kernel;
    the paint is the skew-proof scale path (an x-sweep on the 20%-hot
    tile is O(strips x rects) ~ 8e10 — measured pathological)."""
    from ray.data.aggregate import Count, Sum

    tw, th = cfg.grid.tile_width, cfg.grid.tile_height
    # exact pixel area in 1e-9 deg^2 (cell x cell, fixed-point)
    px_area_e9 = int(
        np.floor(cfg.raster.cell * cfg.raster.cell * AREA_SCALE + 0.5)
    )

    ds = spatial.tile_clip_join(sf_dir, cfg)
    ds = ds.select_columns(
        ["lang", "tile_id", "bbox_x", "bbox_y", "bbox_w", "bbox_h"]
    )

    def tile_union(df: pd.DataFrame) -> pd.DataFrame:
        x0 = df["bbox_x"].to_numpy(np.int64)
        y0 = df["bbox_y"].to_numpy(np.int64)
        # clamp the painted extent to the tile's own pixel domain
        # [0, tw) x [0, th): a clip rect ending exactly on the tile's
        # right/bottom edge yields px1 == tile_width, a world pixel
        # owned by the NEIGHBOUR tile — painting it here would double
        # count it in the per-lang sum across tiles.
        x1 = np.minimum(x0 + df["bbox_w"].to_numpy(np.int64), tw - 1)
        y1 = np.minimum(y0 + df["bbox_h"].to_numpy(np.int64), th - 1)
        union_px = pixel_union_count(x0, y0, x1, y1, tw, th)
        return pd.DataFrame(
            {
                "lang": [df["lang"].iloc[0]],
                "tile_id": [df["tile_id"].iloc[0]],
                "union_px": np.array([union_px], dtype=np.int64),
                "n_rects": np.array([len(df)], dtype=np.int64),
            }
        )

    partials = ds.groupby(["lang", "tile_id"]).map_groups(
        tile_union, batch_format="pandas"
    )

    # LOW-CARDINALITY final combine: one row per (lang, tile) survives
    # the paint — bounded by the fixed grid, not the corpus — so the
    # per-lang sum + sort runs driver-side instead of paying two more
    # Ray all-to-alls for a 5-row result.
    pdf = partials.to_pandas()
    g = (
        pdf.groupby("lang", as_index=False)
        .agg(union_px=("union_px", "sum"), n_rects=("n_rects", "sum"),
             n_tiles=("tile_id", "count"))
        .sort_values("lang")
        .reset_index(drop=True)
    )
    agg = ray.data.from_arrow(
        pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "union_px": pa.array(g["union_px"].to_numpy(np.int64)),
                "n_rects": pa.array(g["n_rects"].to_numpy(np.int64)),
                "n_tiles": pa.array(g["n_tiles"].to_numpy(np.int64)),
            }
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        return t.append_column(
            "union_area_e9", pa.array(t["union_px"].to_numpy() * px_area_e9)
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def zone_merge_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    """Pixel-explode restatement of the union paint: every clipped
    rect unnests into its (clamped) inclusive pixel range, DISTINCT
    pixels per (lang, tile) are the tile union, then the per-lang sum.
    Tractable as an oracle because the synthetic footprints are a few
    pixels each; the engine's difference-array paint is the scale
    kernel for the same set semantics."""
    tw, th = cfg.grid.tile_width, cfg.grid.tile_height
    px_area_e9 = int(
        np.floor(cfg.raster.cell * cfg.raster.cell * AREA_SCALE + 0.5)
    )
    return f"""
with clip as ({tile_clip_join_sql(cfg)}),
xs as (
  select lang, tile_id, bbox_y, bbox_h,
         unnest(generate_series(bbox_x, least(bbox_x + bbox_w, {tw} - 1))) as x
  from clip
),
ys as (
  select lang, tile_id, x,
         unnest(generate_series(bbox_y, least(bbox_y + bbox_h, {th} - 1))) as y
  from xs
),
px as (select distinct lang, tile_id, x, y from ys),
tl as (select lang, tile_id, count(*) as union_px from px group by lang, tile_id),
rc as (select lang, tile_id, count(*) as n_rects from clip group by lang, tile_id)
select tl.lang,
  cast(sum(union_px) as bigint) as union_px,
  cast(sum(n_rects) as bigint) as n_rects,
  count(*) as n_tiles,
  cast(sum(union_px) * {px_area_e9} as bigint) as union_area_e9
from tl join rc using (lang, tile_id) group by tl.lang
"""


def zone_merge_routed(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    """MARGINAL-AWARE merge routing (``scripts/coco2geojson.py:41-101``,
    flag use at :79): annotations flagged ``marginal`` (bbox close to
    the tile size — i.e. likely cut at a tile boundary) are DISSOLVED
    into the zone union (the reference's overlay-union path), while
    non-marginal annotations stay individual features (appended
    as-is).  Per lang: the marginal subset's pixel union (same
    skew-proof paint as :func:`zone_merge`), the non-marginal subset's
    individual pixel-area sum, and the feature count
    (non-marginal rows + one dissolved blob per tile with marginals).

    Rows-only (pixel union is not SQL); exact numpy oracle in
    tests/test_vectorize.py."""
    from ray.data.aggregate import Sum

    tw, th = cfg.grid.tile_width, cfg.grid.tile_height
    wlim = tw * (100.0 - MARGIN_PCT) / 100.0
    hlim = th * (100.0 - MARGIN_PCT) / 100.0

    ds = spatial.tile_clip_join(sf_dir, cfg).select_columns(
        ["lang", "tile_id", "bbox_x", "bbox_y", "bbox_w", "bbox_h"]
    )

    def tile_route(df: pd.DataFrame) -> pd.DataFrame:
        w = df["bbox_w"].to_numpy(np.int64)
        h = df["bbox_h"].to_numpy(np.int64)
        marginal = (w.astype(np.float64) >= wlim) | (h.astype(np.float64) >= hlim)
        x0 = df["bbox_x"].to_numpy(np.int64)
        y0 = df["bbox_y"].to_numpy(np.int64)
        x1 = np.minimum(x0 + w, tw - 1)
        y1 = np.minimum(y0 + h, th - 1)
        mx = marginal
        merged_px = (
            pixel_union_count(x0[mx], y0[mx], x1[mx], y1[mx], tw, th) if mx.any() else 0
        )
        # non-marginal: kept as separate features, areas summed raw
        # (clamped to the tile domain, same ownership rule as the union)
        nm = ~marginal
        nm_px = int(((x1 - x0 + 1) * (y1 - y0 + 1))[nm].sum())
        return pd.DataFrame(
            {
                "lang": [df["lang"].iloc[0]],
                "merged_px": np.array([merged_px], dtype=np.int64),
                "individual_px": np.array([nm_px], dtype=np.int64),
                "n_features": np.array(
                    [int(nm.sum()) + (1 if mx.any() else 0)], dtype=np.int64
                ),
                "n_marginal": np.array([int(mx.sum())], dtype=np.int64),
            }
        )

    return (
        ds.groupby(["lang", "tile_id"])
        .map_groups(tile_route, batch_format="pandas")
        .groupby("lang")
        .aggregate(
            Sum("merged_px", alias_name="merged_px"),
            Sum("individual_px", alias_name="individual_px"),
            Sum("n_features", alias_name="n_features"),
            Sum("n_marginal", alias_name="n_marginal"),
        )
        .sort("lang")
    )


# --------------------------------------------------------------------------
# regularise (M13/M14/M22 dispatcher; rows-only + kernel unit tests)
# --------------------------------------------------------------------------

def _synth_polygon(page_id: int, lon: float, lat: float) -> np.ndarray:
    """Deterministic building-ish test polygon per page: a rectangle
    rotated by a page-derived angle with per-vertex jitter — exercises
    simplify + orthogonalise exactly like reference fixtures."""
    rng = np.random.default_rng(page_id)
    w = 0.02 + 0.03 * rng.random()
    h = 0.02 + 0.03 * rng.random()
    ang = rng.random() * np.pi / 2
    base = np.array(
        [[-w, -h], [w, -h], [w, h], [-w, h]], dtype=np.float64
    )
    # densify edges (2 midpoints per edge) then jitter slightly
    dense = []
    for i in range(4):
        p, q = base[i], base[(i + 1) % 4]
        for tfrac in (0.0, 1 / 3, 2 / 3):
            dense.append(p + tfrac * (q - p))
    dense = np.asarray(dense)
    dense += rng.normal(0.0, 0.0004, dense.shape)
    ca, sa = np.cos(ang), np.sin(ang)
    rot = dense @ np.array([[ca, sa], [-sa, ca]])
    rot[:, 0] += lon
    rot[:, 1] += lat
    return rot


class Regularise:
    """Per-row polygon regularisation dispatcher (``polygon_prep``,
    ``aerial_conversion/coco.py:416-450``): minimum-rotated-rect wins
    over (simplify then orthogonalise).  Per-row Python over numpy
    kernels (geometry is irreducibly per-ring); batched in one actor
    task per block."""

    def __init__(
        self,
        simplify_tolerance: float = 0.0005,
        minimum_rotated_rectangle: bool = False,
        orthogonalisation: bool = True,
    ):
        self.tol = simplify_tolerance
        self.mrr = minimum_rotated_rectangle
        self.ortho = orthogonalisation

    def __call__(self, t: pa.Table) -> pa.Table:
        pids = t["page_id"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy()
        lat = t["lat"].to_numpy()
        n_in, n_out = [], []
        a_in, a_out = [], []
        for i in range(len(pids)):
            poly = _synth_polygon(int(pids[i]), lon[i], lat[i])
            n_in.append(len(poly))
            a_in.append(shoelace_area(poly))
            # validity repair before regularisation — the reference
            # buffer(0)/make_valid step (orthogonalise.py:219-231):
            # untwist self-intersections and keep the largest simple
            # loop, so degenerate footprints regularise instead of
            # silently bailing.  Simple polygons pass through the
            # vectorized crossing gate untouched.
            if has_self_intersection(poly):
                loops = repair_ring(poly)
                poly = max(loops, key=shoelace_area)
            if self.mrr:
                out = min_rotated_rect(poly)
            else:
                out = poly
                if self.tol > 0:
                    closed = np.vstack([out, out[:1]])
                    out = douglas_peucker(closed, self.tol)[:-1]
                if self.ortho:
                    out = orthogonalise(out)
            n_out.append(len(out))
            a_out.append(shoelace_area(out))
        return pa.table(
            {
                "page_id": t["page_id"],
                "n_vertices_in": pa.array(np.array(n_in, dtype=np.int64)),
                "n_vertices_out": pa.array(np.array(n_out, dtype=np.int64)),
                "area_in_e9": pa.array(
                    np.floor(np.array(a_in) * AREA_SCALE + 0.5).astype(np.int64)
                ),
                "area_out_e9": pa.array(
                    np.floor(np.array(a_out) * AREA_SCALE + 0.5).astype(np.int64)
                ),
            }
        )


def regularise(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG, **kwargs) -> ray.data.Dataset:
    """Geocode -> synthetic per-page polygon -> regularisation stats."""
    ds = spatial.geocode_pipeline(sf_dir, cfg).select_columns(
        ["page_id", "lon", "lat"]
    )
    return ds.map_batches(
        Regularise,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=pool_size(),
    )


def areal_interp(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    """Areal interpolation (area-weighted reaggregation): reallocate
    each zone's corpus mass — the zone's total document chars — onto
    the tile grid in proportion to the zone's footprint-union overlap
    with each tile (the census-tract -> grid population transfer,
    generalizing the reference's zone dissolve to a weighted
    re-aggregation).  ``alloc_e6 = value * union_px * 1e6 //
    zone_px`` is integer arithmetic end-to-end, so the oracle matches
    exactly (magnitude: value ~1e8 x px ~1e5 x 1e6 needs < 2^63 —
    loud at the int64 wall long after test scale; shard the multiply
    at real scale).

    Ray shape: the overlap side reuses :func:`zone_merge`'s skew-proof
    difference-array paint per (zone, tile); the value side is a
    per-batch partial per-lang sum (never a corpus-keyed shuffle);
    both finals are grid/lang-bounded driver folds, exactly the
    zone_merge low-cardinality combine law."""
    ds = spatial.tile_clip_join(sf_dir, cfg)
    ds = ds.select_columns(["lang", "tile_id", "bbox_x", "bbox_y", "bbox_w", "bbox_h"])
    tw, th = cfg.grid.tile_width, cfg.grid.tile_height

    def tile_union(df: pd.DataFrame) -> pd.DataFrame:
        x0 = df["bbox_x"].to_numpy(np.int64)
        y0 = df["bbox_y"].to_numpy(np.int64)
        x1 = np.minimum(x0 + df["bbox_w"].to_numpy(np.int64), tw - 1)
        y1 = np.minimum(y0 + df["bbox_h"].to_numpy(np.int64), th - 1)
        union_px = pixel_union_count(x0, y0, x1, y1, tw, th)
        return pd.DataFrame(
            {
                "lang": [df["lang"].iloc[0]],
                "tile_id": [df["tile_id"].iloc[0]],
                "union_px": np.array([union_px], dtype=np.int64),
            }
        )

    overlap = (
        ds.groupby(["lang", "tile_id"])
        .map_groups(tile_union, batch_format="pandas")
        .to_pandas()
    )

    from ..sources.pages import read_table

    def val_partial(t: pa.Table) -> pa.Table:
        df = (
            t.select(["lang", "n_chars"])
            .to_pandas()
            .groupby("lang", as_index=False)["n_chars"]
            .sum()
        )
        return pa.table(
            {
                "lang": pa.array(df["lang"], pa.string()),
                "value": pa.array(df["n_chars"].to_numpy(np.int64)),
            }
        )

    vals = (
        read_table(sf_dir, "documents", columns=["lang", "n_chars"])
        .map_batches(val_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("lang", as_index=False)["value"]
        .sum()
    )

    m = overlap.merge(
        overlap.groupby("lang", as_index=False)["union_px"]
        .sum()
        .rename(columns={"union_px": "zone_px"}),
        on="lang",
    ).merge(vals, on="lang")
    val = m["value"].to_numpy(np.int64)
    upx = m["union_px"].to_numpy(np.int64)
    zpx = m["zone_px"].to_numpy(np.int64)
    assert val.size == 0 or int(val.max()) * int(upx.max()) < 2**63 // 1_000_000, (
        "areal_interp int64 overflow: shard the value*px multiply"
    )
    alloc = val * upx * 1_000_000 // zpx
    out = pa.table(
        {
            "tile_id": pa.array(m["tile_id"], pa.string()),
            "lang": pa.array(m["lang"], pa.string()),
            "union_px": pa.array(upx),
            "zone_px": pa.array(zpx),
            "value": pa.array(val),
            "alloc_e6": pa.array(alloc),
        }
    )
    return ray.data.from_arrow(out)


def areal_interp_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    tw, th = cfg.grid.tile_width, cfg.grid.tile_height
    return f"""
with clip as ({tile_clip_join_sql(cfg)}),
xs as (
  select lang, tile_id, bbox_y, bbox_h,
         unnest(generate_series(bbox_x, least(bbox_x + bbox_w, {tw} - 1))) as x
  from clip
),
ys as (
  select lang, tile_id, x,
         unnest(generate_series(bbox_y, least(bbox_y + bbox_h, {th} - 1))) as y
  from xs
),
px as (select distinct lang, tile_id, x, y from ys),
tl as (select lang, tile_id, count(*) as union_px from px group by lang, tile_id),
tot as (select lang, sum(union_px) as zone_px from tl group by lang),
val as (select lang, cast(sum(n_chars) as bigint) as value
        from documents group by lang)
select tl.tile_id, tl.lang,
       cast(union_px as bigint) as union_px,
       cast(zone_px as bigint) as zone_px,
       value,
       cast(value * union_px * 1000000 // zone_px as bigint) as alloc_e6
from tl join tot using (lang) join val using (lang)
"""
