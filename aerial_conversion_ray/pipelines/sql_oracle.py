"""DuckDB oracle SQL for every SQL-expressible pipeline.

Each function returns SQL computing EXACTLY the rows of the matching
pipeline in ``pipelines/*`` — built from the same constants
(``geocode.SQL_EXPRS``, ``geo.cells.sql_expr``,
``geo.tiles.point_tile_sql``) so engine and oracle cannot drift.
Column names match the engine output column-for-column (the driver's
compare hashes values under sorted column names).
"""

from __future__ import annotations

from ..config import EngineConfig
from ..geo import cells
from ..geo.tiles import point_tile_sql
from ..geocode import SQL_EXPRS
from ..sources.pages import pages_cte

DEFAULT_CFG = EngineConfig()


def _pages_geo(cfg: EngineConfig) -> str:
    """CTE: pages + geocode columns (lon/lat/footprint) keyed page_id."""
    e = {k: v.replace("doc_id", "page_id") for k, v in SQL_EXPRS.items()
         if k in ("lon", "lat", "fp_minx", "fp_miny", "fp_maxx", "fp_maxy")}
    return (
        f"with pages as ({pages_cte(cfg.pages_rep)}), "
        "geo as (select page_id, doc_id, url, warc_ts, text, lang, source, n_chars, "
        f"{e['lon']} as lon, {e['lat']} as lat, "
        f"{e['fp_minx']} as fp_minx, {e['fp_miny']} as fp_miny, "
        f"{e['fp_maxx']} as fp_maxx, {e['fp_maxy']} as fp_maxy from pages)"
    )


def geocode_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    return _pages_geo(cfg) + " select * from geo"


def cell_index_sql(cfg: EngineConfig = DEFAULT_CFG, resolutions=(7, 9, 11)) -> str:
    cols = ", ".join(
        f"{cells.sql_expr('lon', 'lat', r)} as cell_r{r}" for r in resolutions
    )
    return _pages_geo(cfg) + f" select *, {cols} from geo"


def tile_point_join_sql(cfg: EngineConfig = DEFAULT_CFG, resolutions=(7, 9, 11)) -> str:
    cellcols = ", ".join(
        f"{cells.sql_expr('lon', 'lat', r)} as cell_r{r}" for r in resolutions
    )
    tile = point_tile_sql(cfg.raster, cfg.grid, "lon", "lat")
    return (
        _pages_geo(cfg)
        + f" select *, {cellcols}, {tile['tile_id']} as tile_id, "
        f"{tile['pix_col']} as pix_col, {tile['pix_row']} as pix_row from geo"
    )


def tile_point_join_mercator_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    from ..geo.project import mercator_sql
    from .spatial import (
        MERC_CELL_MM,
        MERC_NCOLS,
        MERC_NROWS,
        MERC_X0_MM,
        MERC_YMAX_MM,
    )

    m = mercator_sql("lon", "lat")
    tw, th = cfg.grid.tile_width, cfg.grid.tile_height
    col = (
        f"least(greatest((cast(floor({m['merc_x']} * 1e3 + 0.5) as bigint) "
        f"- {MERC_X0_MM}) // {MERC_CELL_MM}, 0), {MERC_NCOLS - 1})"
    )
    row = (
        f"least(greatest(({MERC_YMAX_MM} - "
        f"cast(floor({m['merc_y']} * 1e3 + 0.5) as bigint)) "
        f"// {MERC_CELL_MM}, 0), {MERC_NROWS - 1})"
    )
    return (
        _pages_geo(cfg)
        + f" select page_id, ('tile_' || cast(({col} // {tw}) * {tw} as varchar)"
        f" || '-' || cast(({row} // {th}) * {th} as varchar)) as tile_id, "
        f"{col} as pix_col, {row} as pix_row from geo"
    )


def tile_point_join_lcc_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    from ..geo.project import lcc_sql_exprs
    from .spatial import (
        LCC_CELL_MM,
        LCC_NCOLS,
        LCC_NROWS,
        LCC_X0_MM,
        LCC_YMAX_MM,
    )

    m = lcc_sql_exprs("lon", "lat")
    tw, th = cfg.grid.tile_width, cfg.grid.tile_height
    col = (
        f"least(greatest((cast(floor({m['lcc_x']} * 1e3 + 0.5) as bigint) "
        f"- {LCC_X0_MM}) // {LCC_CELL_MM}, 0), {LCC_NCOLS - 1})"
    )
    row = (
        f"least(greatest(({LCC_YMAX_MM} - "
        f"cast(floor({m['lcc_y']} * 1e3 + 0.5) as bigint)) "
        f"// {LCC_CELL_MM}, 0), {LCC_NROWS - 1})"
    )
    return (
        _pages_geo(cfg)
        + f" select page_id, ('tile_' || cast(({col} // {tw}) * {tw} as varchar)"
        f" || '-' || cast(({row} // {th}) * {th} as varchar)) as tile_id, "
        f"{col} as pix_col, {row} as pix_row from geo"
    )


def tile_clip_join_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    """Footprint-rect x tile clip join via <=2x2 candidate expansion —
    mirrors ``FootprintTileClip`` arithmetic op-for-op."""
    r, g = cfg.raster, cfg.grid
    a, _, c, _, e, f = r.transform
    tw, th = g.tile_width, g.tile_height
    n_tx = -(-r.ncols // tw)
    n_ty = -(-r.nrows // th)
    return (
        _pages_geo(cfg) + ", "
        "cand as (select geo.*, "
        f"  (cast(floor((fp_minx - {c!r}) / {a!r}) as bigint) // {tw}) + dx.v as ix, "
        f"  (cast(floor((fp_maxy - {f!r}) / {e!r}) as bigint) // {th}) + dy.v as iy, "
        f"  (cast(floor((fp_maxx - {c!r}) / {a!r}) as bigint) // {tw}) as ix1, "
        f"  (cast(floor((fp_miny - {f!r}) / {e!r}) as bigint) // {th}) as iy1 "
        "  from geo, (values (0), (1)) dx(v), (values (0), (1)) dy(v)), "
        "hit as (select *, ix * "
        f"{tw} as col_off, iy * {th} as row_off, "
        f"  least(ix * {tw} + {tw}, {r.ncols}) - ix * {tw} as t_w, "
        f"  least(iy * {th} + {th}, {r.nrows}) - iy * {th} as t_h "
        f"  from cand where ix <= ix1 and iy <= iy1 and ix >= 0 and iy >= 0 "
        f"  and ix < {n_tx} and iy < {n_ty}), "
        "clip as (select *, "
        f"  greatest(fp_minx, {c!r} + {a!r} * col_off) as clip_minx, "
        f"  greatest(fp_miny, {f!r} + {e!r} * (row_off + t_h)) as clip_miny, "
        f"  least(fp_maxx, {c!r} + {a!r} * (col_off + t_w)) as clip_maxx, "
        f"  least(fp_maxy, {f!r} + {e!r} * row_off) as clip_maxy "
        "  from hit) "
        "select page_id, doc_id, url, warc_ts, text, lang, source, n_chars, "
        "lon, lat, fp_minx, fp_miny, fp_maxx, fp_maxy, "
        "('tile_' || cast(col_off as varchar) || '-' || cast(row_off as varchar)) as tile_id, "
        "clip_minx, clip_miny, clip_maxx, clip_maxy, "
        f"cast(floor((clip_minx - ({c!r} + {a!r} * col_off)) / {a!r}) as bigint) as bbox_x, "
        f"cast(floor((clip_maxy - ({f!r} + {e!r} * row_off)) / {e!r}) as bigint) as bbox_y, "
        f"cast(floor((clip_maxx - ({c!r} + {a!r} * col_off)) / {a!r}) as bigint) - "
        f"cast(floor((clip_minx - ({c!r} + {a!r} * col_off)) / {a!r}) as bigint) as bbox_w, "
        f"cast(floor((clip_miny - ({f!r} + {e!r} * row_off)) / {e!r}) as bigint) - "
        f"cast(floor((clip_maxy - ({f!r} + {e!r} * row_off)) / {e!r}) as bigint) as bbox_h, "
        "(clip_maxx - clip_minx) * (clip_maxy - clip_miny) as clip_area "
        "from clip where clip_minx < clip_maxx and clip_miny < clip_maxy"
    )


def tile_clip_join_overlap_sql(cfg: EngineConfig) -> str:
    """Overlap-grid clip join oracle: the tile windows are generated
    in SQL from the corner ranges with grid_windows' EXACT arithmetic
    (map-units rounding, offset padding, cc==0 edge quirk, raster
    clamp — ``aerial_conversion/tiles.py:40-81``), cross-joined to the
    footprints on strict rect intersection.  Mirrors
    ``FootprintTileClipOverlap`` op-for-op."""
    r, g = cfg.raster, cfg.grid
    a, _, c, _, e, f = r.transform
    tw, th = g.tile_width, g.tile_height
    if g.map_units:
        tw = int(tw / a + 0.5)
        th = int(th / a + 0.5)
    off_w = int(tw * g.offset / 100)
    off_h = int(th * g.offset / 100)
    TILE_W = min(tw + off_w * 2, r.ncols)
    TILE_H = min(th + off_h * 2, r.nrows)
    w_edge = min(TILE_W + off_w, r.ncols)
    w_mid = min(TILE_W + off_w * 2, r.ncols)
    h_edge = min(TILE_H + off_h, r.nrows)
    h_mid = min(TILE_H + off_h * 2, r.nrows)
    return (
        _pages_geo(cfg) + ", "
        "corners as (select cx.cc, ry.rc from "
        f"(select unnest(range(0, {r.ncols}, {tw})) as cc) cx, "
        f"(select unnest(range(0, {r.nrows}, {th})) as rc) ry), "
        "tiles as (select cc, rc, "
        f"greatest(0, cc - {off_w}) as col_off, "
        f"greatest(0, rc - {off_h}) as row_off, "
        f"least(greatest(0, cc - {off_w}) + (case when cc = 0 then {w_edge} else {w_mid} end), {r.ncols})"
        f" - greatest(0, cc - {off_w}) as tile_w, "
        f"least(greatest(0, rc - {off_h}) + (case when rc = 0 then {h_edge} else {h_mid} end), {r.nrows})"
        f" - greatest(0, rc - {off_h}) as tile_h from corners), "
        "bounds as (select *, "
        f"{c!r} + {a!r} * col_off as tminx, "
        f"{c!r} + {a!r} * (col_off + tile_w) as tmaxx, "
        f"{f!r} + {e!r} * row_off as tmaxy, "
        f"{f!r} + {e!r} * (row_off + tile_h) as tminy from tiles), "
        "clip as (select geo.*, b.col_off, b.row_off, b.tile_w, b.tile_h, "
        "greatest(fp_minx, b.tminx) as clip_minx, "
        "greatest(fp_miny, b.tminy) as clip_miny, "
        "least(fp_maxx, b.tmaxx) as clip_maxx, "
        "least(fp_maxy, b.tmaxy) as clip_maxy "
        "from geo, bounds b "
        "where greatest(fp_minx, b.tminx) < least(fp_maxx, b.tmaxx) "
        "and greatest(fp_miny, b.tminy) < least(fp_maxy, b.tmaxy)) "
        "select page_id, doc_id, url, warc_ts, text, lang, source, n_chars, "
        "lon, lat, fp_minx, fp_miny, fp_maxx, fp_maxy, "
        "('tile_' || cast(col_off as varchar) || '-' || cast(row_off as varchar)) as tile_id, "
        "col_off, row_off, tile_w, tile_h, "
        "clip_minx, clip_miny, clip_maxx, clip_maxy, "
        f"cast(floor((clip_minx - ({c!r} + {a!r} * col_off)) / {a!r}) as bigint) as bbox_x, "
        f"cast(floor((clip_maxy - ({f!r} + {e!r} * row_off)) / {e!r}) as bigint) as bbox_y, "
        f"cast(floor((clip_maxx - ({c!r} + {a!r} * col_off)) / {a!r}) as bigint) - "
        f"cast(floor((clip_minx - ({c!r} + {a!r} * col_off)) / {a!r}) as bigint) as bbox_w, "
        f"cast(floor((clip_miny - ({f!r} + {e!r} * row_off)) / {e!r}) as bigint) - "
        f"cast(floor((clip_maxy - ({f!r} + {e!r} * row_off)) / {e!r}) as bigint) as bbox_h, "
        "(clip_maxx - clip_minx) * (clip_maxy - clip_miny) as clip_area "
        "from clip"
    )


def polygon_clip_join_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    """Triangle-footprint clip join oracle.  The clipped area of the
    right triangle {x >= x0, y >= y0, (x-x0)+(y-y0) <= s} against an
    axis rect is closed-form: clamp the rect by the two legs, then
    subtract the half-plane overshoot by corner inclusion-exclusion
    g(p,q) = max(0, p+q-s)^2 / 2 — exactly the area the engine's
    Sutherland–Hodgman ring integrates (shoelace), compared through
    the 1e-9 fixed-point key.  n_clip_vertices is the piecewise vertex
    count of the clipped convex region: 3 + (#corner cuts that add an
    edge) — derived below from which g-terms are active and whether
    the hypotenuse enters the rect interior."""
    r, g = cfg.raster, cfg.grid
    a, _, c, _, e, f = r.transform
    tw, th = g.tile_width, g.tile_height
    n_tx = -(-r.ncols // tw)
    n_ty = -(-r.nrows // th)
    return (
        _pages_geo(cfg) + ", "
        "tri as (select *, least(fp_maxx - fp_minx, fp_maxy - fp_miny) as s "
        "from geo), "
        "cand as (select tri.*, "
        f"  ((cast(floor((fp_minx - {c!r}) / {a!r}) as bigint) // {tw}) + dx.v) * {tw} as col_off, "
        f"  ((cast(floor(((fp_miny + s) - {f!r}) / {e!r}) as bigint) // {th}) + dy.v) * {th} as row_off "
        "  from tri, (values (0), (1)) dx(v), (values (0), (1)) dy(v)), "
        "ok as (select * from cand where col_off >= 0 and row_off >= 0 "
        f"  and col_off < {n_tx * tw} and row_off < {n_ty * th} "
        f"  and col_off <= (cast(floor(((fp_minx + s) - {c!r}) / {a!r}) as bigint) // {tw}) * {tw} "
        f"  and row_off <= (cast(floor((fp_miny - {f!r}) / {e!r}) as bigint) // {th}) * {th}), "
        "bounds as (select *, "
        f"{c!r} + {a!r} * col_off as tminx, "
        f"{c!r} + {a!r} * least(col_off + {tw}, {r.ncols}) as tmaxx, "
        f"{f!r} + {e!r} * row_off as tmaxy, "
        f"{f!r} + {e!r} * least(row_off + {th}, {r.nrows}) as tminy "
        "from ok), "
        "ab as (select *, "
        "greatest(tminx, fp_minx) - fp_minx as a0, tmaxx - fp_minx as a1, "
        "greatest(tminy, fp_miny) - fp_miny as b0, tmaxy - fp_miny as b1 "
        "from bounds), "
        "area as (select *, "
        "case when a1 > a0 and b1 > b0 then "
        "  (a1 - a0) * (b1 - b0) "
        "  - (pow(greatest(0, a1 + b1 - s), 2) - pow(greatest(0, a0 + b1 - s), 2) "
        "     - pow(greatest(0, a1 + b0 - s), 2) + pow(greatest(0, a0 + b0 - s), 2)) / 2 "
        "else 0.0 end as clip_area from ab) "
        "select page_id, "
        "('tile_' || cast(col_off as varchar) || '-' || cast(row_off as varchar)) as tile_id, "
        "cast(case when a1 + b1 <= s then 4 "  # hypotenuse misses: full rect
        "      when a0 + b1 < s and a1 + b0 < s then 5 "  # only C11 cut off
        "      when a0 + b1 >= s and a1 + b0 >= s then 3 "  # only C00 side left
        "      else 4 end as bigint) as n_clip_vertices, "
        "cast(floor(clip_area * 1000000000.0 + 0.5) as bigint) as clip_area_e9 "
        "from area where cast(floor(clip_area * 1000000000.0 + 0.5) as bigint) > 0"
    )


def multiring_clip_join_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    """Multipolygon-with-holes clip join oracle.  The engine's
    geometry is deterministic (MultiRingEncode): part 0 = footprint
    rect with a quarter-inset hole, part 1 = disjoint east rect, so
    the hole-aware clipped area is closed-form — rect-overlap(ext) −
    rect-overlap(hole) — compared through the 1e-9 fixed point the
    shoelace integration quantizes to.  Same candidate arithmetic as
    :func:`polygon_clip_join_sql`."""
    r, g = cfg.raster, cfg.grid
    a, _, c, _, e, f = r.transform
    tw, th = g.tile_width, g.tile_height
    n_tx = -(-r.ncols // tw)
    n_ty = -(-r.nrows // th)
    return (
        _pages_geo(cfg) + ", "
        # parts with their exterior (ex/ey) and hole (hx/hy) bounds;
        # expression order mirrors MultiRingEncode's numpy ops
        "parts as ("
        "  select page_id, 0 as part_idx, "
        "    fp_minx as ex0, fp_maxx as ex1, fp_miny as ey0, fp_maxy as ey1, "
        "    fp_minx + (fp_maxx - fp_minx) * 0.25 as hx0, "
        "    fp_maxx - (fp_maxx - fp_minx) * 0.25 as hx1, "
        "    fp_miny + (fp_maxy - fp_miny) * 0.25 as hy0, "
        "    fp_maxy - (fp_maxy - fp_miny) * 0.25 as hy1 "
        "  from geo "
        "  union all "
        "  select page_id, 1 as part_idx, "
        "    fp_maxx + (fp_maxx - fp_minx) * 0.5 as ex0, "
        "    fp_maxx + (fp_maxx - fp_minx) as ex1, "
        "    fp_miny as ey0, fp_miny + (fp_maxy - fp_miny) * 0.5 as ey1, "
        "    0.0 as hx0, 0.0 as hx1, 0.0 as hy0, 0.0 as hy1 "
        "  from geo), "
        "cand as (select parts.*, "
        f"  ((cast(floor((ex0 - {c!r}) / {a!r}) as bigint) // {tw}) + dx.v) * {tw} as col_off, "
        f"  ((cast(floor((ey1 - {f!r}) / {e!r}) as bigint) // {th}) + dy.v) * {th} as row_off "
        "  from parts, (values (0), (1)) dx(v), (values (0), (1)) dy(v)), "
        "ok as (select * from cand where col_off >= 0 and row_off >= 0 "
        f"  and col_off < {n_tx * tw} and row_off < {n_ty * th} "
        f"  and col_off <= (cast(floor((ex1 - {c!r}) / {a!r}) as bigint) // {tw}) * {tw} "
        f"  and row_off <= (cast(floor((ey0 - {f!r}) / {e!r}) as bigint) // {th}) * {th}), "
        "bounds as (select *, "
        f"{c!r} + {a!r} * col_off as tminx, "
        f"{c!r} + {a!r} * least(col_off + {tw}, {r.ncols}) as tmaxx, "
        f"{f!r} + {e!r} * row_off as tmaxy, "
        f"{f!r} + {e!r} * least(row_off + {th}, {r.nrows}) as tminy "
        "from ok), "
        "area as (select *, "
        "  (case when least(tmaxx, ex1) > greatest(tminx, ex0) "
        "        and least(tmaxy, ey1) > greatest(tminy, ey0) then "
        "    (least(tmaxx, ex1) - greatest(tminx, ex0)) "
        "    * (least(tmaxy, ey1) - greatest(tminy, ey0)) else 0.0 end) "
        "  - (case when least(tmaxx, hx1) > greatest(tminx, hx0) "
        "          and least(tmaxy, hy1) > greatest(tminy, hy0) then "
        "    (least(tmaxx, hx1) - greatest(tminx, hx0)) "
        "    * (least(tmaxy, hy1) - greatest(tminy, hy0)) else 0.0 end) "
        "  as clip_area from bounds) "
        "select page_id, cast(part_idx as bigint) as part_idx, "
        "('tile_' || cast(col_off as varchar) || '-' || cast(row_off as varchar)) as tile_id, "
        "cast(floor(clip_area * 1000000000.0 + 0.5) as bigint) as clip_area_e9 "
        "from area where cast(floor(clip_area * 1000000000.0 + 0.5) as bigint) > 0"
    )


def wkb_roundtrip_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    """WKB (or WKT) encode->decode is the identity on the footprint
    bounds."""
    return (
        _pages_geo(cfg)
        + " select page_id, fp_minx, fp_miny, fp_maxx, fp_maxy from geo"
    )


def geojson_roundtrip_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    """GeoJSON write->read is the identity on footprint bounds +
    feature properties."""
    return (
        _pages_geo(cfg)
        + " select page_id, lang, fp_minx, fp_miny, fp_maxx, fp_maxy from geo"
    )


def multipoint_roundtrip_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    """Multipoint .shp + .prj write->read is the identity on bounds,
    properties, and the CRS sidecar."""
    return (
        _pages_geo(cfg)
        + " select page_id, lang, fp_minx, fp_miny, fp_maxx, fp_maxy, "
        "'EPSG:4326' as crs from geo"
    )


def reproject_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    from ..geo.project import mercator_sql

    m = mercator_sql("lon", "lat")
    return (
        _pages_geo(cfg)
        + " select page_id, lon, lat, "
        f"cast(floor({m['merc_x']} * 1e3 + 0.5) as bigint) as merc_x_mm, "
        f"cast(floor({m['merc_y']} * 1e3 + 0.5) as bigint) as merc_y_mm "
        "from geo"
    )


def utm_reproject_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    from ..geo.project import utm_sql_ctes

    return (
        _pages_geo(cfg)
        + ", "
        + utm_sql_ctes("geo")
        + " select page_id, zone, "
        "cast(floor(east * 1e3 + 0.5) as bigint) as utm_e_mm, "
        "cast(floor(north * 1e3 + 0.5) as bigint) as utm_n_mm from u5"
    )


def lcc_reproject_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    from ..geo.project import lcc_sql_exprs

    m = lcc_sql_exprs("lon", "lat")
    return (
        _pages_geo(cfg)
        + " select page_id, "
        f"cast(floor({m['lcc_x']} * 1e3 + 0.5) as bigint) as lcc_x_mm, "
        f"cast(floor({m['lcc_y']} * 1e3 + 0.5) as bigint) as lcc_y_mm "
        "from geo"
    )


def pstereo_reproject_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    from ..geo.project import polar_stereo_sql_exprs

    m = polar_stereo_sql_exprs("lon", "lat")
    return (
        _pages_geo(cfg)
        + " select page_id, "
        f"cast(floor({m['pst_x']} * 1e3 + 0.5) as bigint) as pst_x_mm, "
        f"cast(floor({m['pst_y']} * 1e3 + 0.5) as bigint) as pst_y_mm "
        "from geo"
    )


def utm_footprint_area_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    """Integer shoelace over mm-snapped UTM corners (centroid zone) —
    op-for-op the engine's utm_footprint_area kernel."""
    from ..geo.project import utm_sql_ctes

    zone = (
        "least(greatest(cast(floor(((fp_minx + fp_maxx) * 0.5 + 180.0) / 6.0)"
        " as bigint) + 1, 1), 60)"
    )
    return (
        _pages_geo(cfg)
        + f""",
corners as (
  select page_id, corner,
    case corner when 0 then fp_minx when 1 then fp_maxx
                when 2 then fp_maxx else fp_minx end as lon,
    case corner when 0 then fp_miny when 1 then fp_miny
                when 2 then fp_maxy else fp_maxy end as lat,
    {zone} as czone
  from geo cross join (select unnest(range(4)) as corner) c),
"""
        + utm_sql_ctes("corners", zone_expr="czone", keep="page_id, corner")
        + """,
pts as (select page_id, corner, zone,
               cast(floor(east * 1e3 + 0.5) as bigint) as x_mm,
               cast(floor(north * 1e3 + 0.5) as bigint) as y_mm from u5),
rel as (select p.page_id, p.zone,
               (p.x_mm - p0.x_mm) * (q.y_mm - p0.y_mm)
             - (q.x_mm - p0.x_mm) * (p.y_mm - p0.y_mm) as cross_term
        from pts p
        join pts q on q.page_id = p.page_id and q.corner = (p.corner + 1) % 4
        join pts p0 on p0.page_id = p.page_id and p0.corner = 0)
select page_id, max(zone) as zone,
       cast(abs(sum(cross_term)) as bigint) as area2_mm2
from rel group by page_id
"""
    )


def tile_clip_join_metric_sql(
    cfg: EngineConfig = DEFAULT_CFG, min_area_m2: int = 100_000
) -> str:
    """Clip join + UTM metric area filter: same integer mm-shoelace
    as the engine on the clipped rect corners."""
    from ..geo.project import utm_sql_ctes

    zone = (
        "least(greatest(cast(floor(((clip_minx + clip_maxx) * 0.5 + 180.0)"
        " / 6.0) as bigint) + 1, 1), 60)"
    )
    return (
        f"with clipjoin as ({tile_clip_join_sql(cfg)}),"
        + f"""
corners as (
  select page_id, tile_id, corner,
    case corner when 0 then clip_minx when 1 then clip_maxx
                when 2 then clip_maxx else clip_minx end as lon,
    case corner when 0 then clip_miny when 1 then clip_miny
                when 2 then clip_maxy else clip_maxy end as lat,
    {zone} as czone
  from clipjoin cross join (select unnest(range(4)) as corner) c),
"""
        + utm_sql_ctes(
            "corners", zone_expr="czone", keep="page_id, tile_id, corner"
        )
        + f""",
pts as (select page_id, tile_id, corner, zone,
               cast(floor(east * 1e3 + 0.5) as bigint) as x_mm,
               cast(floor(north * 1e3 + 0.5) as bigint) as y_mm from u5),
rel as (select p.page_id, p.tile_id, p.zone,
               (p.x_mm - p0.x_mm) * (q.y_mm - p0.y_mm)
             - (q.x_mm - p0.x_mm) * (p.y_mm - p0.y_mm) as cross_term
        from pts p
        join pts q on q.page_id = p.page_id and q.tile_id = p.tile_id
                  and q.corner = (p.corner + 1) % 4
        join pts p0 on p0.page_id = p.page_id and p0.tile_id = p.tile_id
                   and p0.corner = 0)
select page_id, tile_id, max(zone) as zone,
       cast(abs(sum(cross_term)) as bigint) as area2_mm2
from rel group by page_id, tile_id
having cast(abs(sum(cross_term)) as bigint) > {min_area_m2} * cast(2000000 as bigint)
"""
    )


def knn_sql(cfg: EngineConfig = DEFAULT_CFG, query_mod: int = 10) -> str:
    """Exact kNN oracle: cross join + haversine + row_number.
    Haversine written with the same formula as geo.haversine."""
    hav = (
        "2.0 * 6371000.0 * asin(sqrt(least(greatest("
        "pow(sin(radians(n.lat - q.lat) * 0.5), 2) + "
        "cos(radians(q.lat)) * cos(radians(n.lat)) * "
        "pow(sin(radians(n.lon - q.lon) * 0.5), 2), 0.0), 1.0)))"
    )
    return (
        _pages_geo(cfg)
        + f", q as (select * from geo where page_id % {query_mod} = 0), "
        f"pairs as (select q.page_id as query_id, n.page_id as neighbor_id, "
        f"{hav} as dist_m from q cross join geo n where n.page_id != q.page_id), "
        "ranked as (select query_id, neighbor_id, dist_m, "
        "row_number() over (partition by query_id order by dist_m, neighbor_id) as rank "
        "from pairs) "
        f"select query_id, rank, neighbor_id from ranked where rank <= {cfg.knn_k}"
    )


def cell_compact_sql(
    cfg: EngineConfig = DEFAULT_CFG, res_hi: int = 9, res_lo: int = 7
) -> str:
    """Mirror of ``spatial.cell_compact``: iterative quadtree
    compaction unrolled level-by-level (fixed depth, pure SQL)."""

    def parent(col: str, r: int) -> str:
        n = 1 << r
        return f"(((({col}) // {n}) // 2) * {n // 2} + ((({col}) % {n}) // 2))"

    e = cells.sql_expr("lon", "lat", res_hi)
    ctes = [f"c{res_hi} as (select distinct {e} as cell from geo)"]
    selects = []
    for r in range(res_hi, res_lo, -1):
        ctes.append(
            f"p{r - 1} as (select {parent('cell', r)} as parent, count(*) as k "
            f"from c{r} group by 1)"
        )
        ctes.append(f"f{r - 1} as (select parent as cell from p{r - 1} where k = 4)")
        ctes.append(
            f"k{r} as (select cell from c{r} where {parent('cell', r)} "
            f"not in (select cell from f{r - 1}))"
        )
        ctes.append(f"c{r - 1} as (select cell from f{r - 1})")
        selects.append(f"select cast({r} as bigint) as res, cell from k{r}")
    selects.append(f"select cast({res_lo} as bigint) as res, cell from c{res_lo}")
    return (
        _pages_geo(cfg) + ", " + ", ".join(ctes) + " " + " union all ".join(selects)
    )


def dbscan_cells_sql(
    cfg: EngineConfig = DEFAULT_CFG, res: int = 11, min_pts: int = 2
) -> str:
    """Oracle for pipelines.spatial.dbscan_cells: core-cell counts,
    Chebyshev-1 adjacency self-join, recursive min-label components."""
    n = 1 << res
    cell = cells.sql_expr("lon", "lat", res)
    return (
        _pages_geo(cfg).replace("with pages as", "with recursive pages as", 1)
        + f""",
cellt as (select {cell} as cell from geo),
core as (select cell, count(*) as n from cellt group by cell
         having count(*) >= {min_pts}),
e as (select a.cell as src, b.cell as dst
      from core a join core b on a.cell <> b.cell
       and abs((a.cell % {n}) - (b.cell % {n})) <= 1
       and abs((a.cell // {n}) - (b.cell // {n})) <= 1),
cc(node, lbl) as (
  select cell, cell from core
  union
  select e.dst, c.lbl from cc c join e on e.src = c.node
  where c.lbl < e.dst
),
lab as (select node as cell, min(lbl) as cluster_id from cc group by node)
select core.cell, cast(core.n as bigint) as n, lab.cluster_id
from core join lab using (cell)
"""
    )


def line_cells_sql(cfg: EngineConfig = DEFAULT_CFG, res: int = 11) -> str:
    """Oracle for pipelines.spatial.line_cells — identical double ops
    in identical order (segment build, bbox candidates, corner-cross
    straddle test)."""
    n = 1 << res
    w = repr(360.0 / n)
    r = "(fp_maxx - lon)"
    return (
        _pages_geo(cfg)
        + f""",
seg as (select page_id, lon as x0, lat as y0,
  lon - (case when lon >= 0.0 then 1.0 else -1.0 end) * (100.0 * {r}) as x1,
  lat - (case when lat >= 0.0 then 1.0 else -1.0 end) * (50.0 * {r}) as y1
  from geo),
b as (select *,
  least(cast(floor((x0 + 180.0) / {w}) as bigint),
        cast(floor((x1 + 180.0) / {w}) as bigint)) as lox,
  greatest(cast(floor((x0 + 180.0) / {w}) as bigint),
           cast(floor((x1 + 180.0) / {w}) as bigint)) as hix,
  least(cast(floor((y0 + 90.0) / {w}) as bigint),
        cast(floor((y1 + 90.0) / {w}) as bigint)) as loy,
  greatest(cast(floor((y0 + 90.0) / {w}) as bigint),
           cast(floor((y1 + 90.0) / {w}) as bigint)) as hiy
  from seg),
ex as (select *, unnest(generate_series(lox, hix)) as ix from b),
ey as (select *, unnest(generate_series(loy, hiy)) as iy from ex),
c as (select page_id, ix, iy,
  (x1 - x0) * ((iy * {w} - 90.0) - y0) - (y1 - y0) * ((ix * {w} - 180.0) - x0) as d1,
  (x1 - x0) * (((iy + 1) * {w} - 90.0) - y0) - (y1 - y0) * ((ix * {w} - 180.0) - x0) as d2,
  (x1 - x0) * ((iy * {w} - 90.0) - y0) - (y1 - y0) * (((ix + 1) * {w} - 180.0) - x0) as d3,
  (x1 - x0) * (((iy + 1) * {w} - 90.0) - y0) - (y1 - y0) * (((ix + 1) * {w} - 180.0) - x0) as d4
  from ey)
select page_id, (iy * {n} + ix) as cell from c
where least(least(d1, d2), least(d3, d4)) <= 0.0
  and greatest(greatest(d1, d2), greatest(d3, d4)) >= 0.0
"""
    )


def focal_stats_sql(cfg: EngineConfig = DEFAULT_CFG, res: int = 11) -> str:
    """Oracle for pipelines.spatial.focal_stats: sparse cell counts,
    Chebyshev<=1 self-join ring sum."""
    n = 1 << res
    cell = cells.sql_expr("lon", "lat", res)
    return (
        _pages_geo(cfg)
        + f""",
cellt as (select {cell} as cell from geo),
cnt as (select cell, count(*) as n from cellt group by cell)
select a.cell, cast(a.n as bigint) as n, cast(sum(b.n) as bigint) as ring_n
from cnt a join cnt b
  on abs((a.cell % {n}) - (b.cell % {n})) <= 1
 and abs((a.cell // {n}) - (b.cell // {n})) <= 1
group by a.cell, a.n
"""
    )


def corridor_join_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    """Oracle for pipelines.spatial.corridor_join — same clamped
    point-to-segment projection, op-for-op."""
    from .spatial import CORRIDOR_D2, ROUTES

    # literals MUST be cast: DuckDB parses 151.4 as DECIMAL, which
    # constant-folds (x1 - x0) exactly instead of in double
    vals = ", ".join(
        f"({rid}, {x0!r}::double, {y0!r}::double, "
        f"{x1!r}::double, {y1!r}::double)"
        for rid, x0, y0, x1, y1 in ROUTES
    )
    return (
        _pages_geo(cfg)
        + f""",
routes(route_id, x0, y0, x1, y1) as (values {vals}),
d as (select page_id, route_id,
  least(greatest((((lon - x0) * (x1 - x0)) + ((lat - y0) * (y1 - y0)))
                 / (((x1 - x0) * (x1 - x0)) + ((y1 - y0) * (y1 - y0))),
                 0.0), 1.0) as tt,
  lon, lat, x0, y0, x1, y1
  from geo cross join routes),
e as (select page_id, route_id,
  (lon - (x0 + tt * (x1 - x0))) * (lon - (x0 + tt * (x1 - x0)))
  + (lat - (y0 + tt * (y1 - y0))) * (lat - (y0 + tt * (y1 - y0))) as dist2
  from d)
select page_id, cast(route_id as bigint) as route_id,
       cast(floor(dist2 * 1e12 + 0.5) as bigint) as dist2_e12
from e where dist2 <= {CORRIDOR_D2!r}
"""
    )


def tile_occupancy_hist_sql(cfg: EngineConfig = DEFAULT_CFG, res: int = 9) -> str:
    cell = cells.sql_expr("lon", "lat", res)
    return (
        _pages_geo(cfg)
        + f""",
cellt as (select {cell} as cell from geo),
cnt as (select cell, count(*) as n from cellt group by cell)
select cast(length(bin(n)) as bigint) as bin,
       cast(count(*) as bigint) as n_cells,
       cast(sum(n) as bigint) as n_pages
from cnt group by bin
"""
    )
