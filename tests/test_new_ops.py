"""Round-2 operators: overlap-grid clip join, true-polygon clip join
(batched Sutherland–Hodgman), WKB round trip, COCO JSON round trip,
quarantine sink.  DuckDB parity asserted at sf0.001 for every new
oracle-gated query (the driver re-checks at sf0.01)."""

import numpy as np
import pyarrow as pa
import pytest

import __ray_entry__ as entrymod
from aerial_conversion_ray.geo.polygon import (
    clip_rings_to_rects,
    clip_to_rect,
    shoelace_area,
    shoelace_area_batch,
)
from aerial_conversion_ray.geo.tiles import grid_windows
from aerial_conversion_ray.pipelines import coco, spatial, sql_oracle

CFG = entrymod.CFG
OVERLAP_CFG = entrymod.OVERLAP_CFG


def _duck(sf_dir, sql):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(sql).df()


def _sorted_tuples(df, cols):
    return sorted(tuple(r) for r in df[cols].itertuples(index=False))


def test_clip_rings_kernel_matches_per_ring():
    rng = np.random.default_rng(7)
    flats, offs, rects, refs = [], [0], [], []
    for _ in range(300):
        k = int(rng.integers(3, 9))
        ang = np.sort(rng.random(k)) * 2 * np.pi
        r = 0.5 + rng.random(k)
        poly = np.c_[np.cos(ang) * r, np.sin(ang) * r] + rng.normal(0, 1, 2)
        (a0, a1), (b0, b1) = np.sort(rng.normal(0, 1.2, 2)), np.sort(
            rng.normal(0, 1.2, 2)
        )
        flats.append(poly)
        offs.append(offs[-1] + k)
        rects.append((a0, b0, a1, b1))
        refs.append(clip_to_rect(poly, a0, b0, a1, b1))
    flat = np.vstack(flats)
    offs = np.array(offs)
    rc = np.array(rects)
    V, O = clip_rings_to_rects(flat, offs, rc[:, 0], rc[:, 1], rc[:, 2], rc[:, 3])
    areas = shoelace_area_batch(V, O)
    for i, ref in enumerate(refs):
        got = V[O[i] : O[i + 1]]
        assert len(got) == len(ref)
        if len(got):
            assert np.allclose(got, ref, atol=1e-12)
        exp_area = shoelace_area(ref) if len(ref) >= 3 else 0.0
        assert abs(areas[i] - exp_area) < 1e-12


def test_overlap_join_tiles_come_from_grid_windows(sf_dir):
    """Every emitted (col_off, row_off, tile_w, tile_h) must be a row
    of the unit-tested grid_windows generator for the same config."""
    g = grid_windows(OVERLAP_CFG.raster, OVERLAP_CFG.grid)
    valid = {
        (c, r, w, h)
        for c, r, w, h in zip(g["col_off"], g["row_off"], g["width"], g["height"])
    }
    df = spatial.tile_clip_join_overlap(sf_dir, OVERLAP_CFG).to_pandas()
    assert len(df) > 0
    got = set(
        zip(df["col_off"], df["row_off"], df["tile_w"], df["tile_h"])
    )
    assert got <= valid
    # overlap grid => some pages land on MORE tiles than the base grid
    base = spatial.tile_clip_join(sf_dir, OVERLAP_CFG).to_pandas()
    assert len(df) > len(base)


def test_overlap_join_matches_sql(sf_dir):
    got = spatial.tile_clip_join_overlap(sf_dir, OVERLAP_CFG).to_pandas()
    exp = _duck(sf_dir, sql_oracle.tile_clip_join_overlap_sql(OVERLAP_CFG))
    cols = ["page_id", "tile_id", "bbox_x", "bbox_y", "bbox_w", "bbox_h"]
    assert _sorted_tuples(got, cols) == _sorted_tuples(exp, cols)
    assert sorted(got["clip_area"].round(12)) == pytest.approx(
        sorted(exp["clip_area"].round(12))
    )


def test_polygon_clip_join_matches_sql(sf_dir):
    got = spatial.polygon_clip_join(sf_dir, CFG).to_pandas()
    exp = _duck(sf_dir, sql_oracle.polygon_clip_join_sql(CFG))
    assert len(got) > 0
    cols = ["page_id", "tile_id", "n_clip_vertices", "clip_area_e9"]
    assert _sorted_tuples(got, cols) == _sorted_tuples(exp, cols)


def test_polygon_clip_partition_of_area(sf_dir):
    """Clipped pieces of one page sum to the whole triangle area
    (tiles partition the plane at offset=0) — the round-trip
    conservation property."""
    got = spatial.polygon_clip_join(sf_dir, CFG).to_pandas()
    geo = spatial.geocode_pipeline(sf_dir, CFG).to_pandas()
    s = np.minimum(
        geo["fp_maxx"] - geo["fp_minx"], geo["fp_maxy"] - geo["fp_miny"]
    )
    want = dict(zip(geo["page_id"], (s * s / 2.0 * 1e9)))
    per_page = got.groupby("page_id")["clip_area_e9"].sum()
    for pid, tot in per_page.items():
        assert abs(tot - want[pid]) <= 2 + 1e-6 * want[pid]  # snap slack/piece


def test_wkb_roundtrip_exact(sf_dir):
    got = spatial.wkb_roundtrip(sf_dir, CFG).to_pandas()
    geo = spatial.geocode_pipeline(sf_dir, CFG).to_pandas()
    m = got.merge(geo, on="page_id", suffixes=("", "_ref"))
    for c in ("fp_minx", "fp_miny", "fp_maxx", "fp_maxy"):
        assert (m[c] == m[f"{c}_ref"]).all()  # bit-exact through WKB


def test_coco_json_roundtrip(sf_dir):
    anns = coco.coco_annotations(sf_dir, CFG).to_pandas()
    back = coco.coco_roundtrip(sf_dir, CFG).to_pandas()
    cols = sorted(back.columns)
    a = anns[cols].sort_values("annot_id").reset_index(drop=True)
    b = back[cols].sort_values("annot_id").reset_index(drop=True)
    assert a.equals(b)
    # annot ids dense 0..n-1 (reference positional-ID semantics)
    assert sorted(b["annot_id"]) == list(range(len(b)))


def test_zone_merge_routed_matches_brute(sf_dir):
    """Marginal-aware routing vs an independent per-(lang, tile)
    numpy oracle: marginal rows dissolve into a painted union,
    non-marginal rows stay individual features."""
    from aerial_conversion_ray.pipelines import vectorize

    clip = (
        spatial.tile_clip_join(sf_dir, CFG)
        .select_columns(["lang", "tile_id", "bbox_x", "bbox_y", "bbox_w", "bbox_h"])
        .to_pandas()
    )
    got = vectorize.zone_merge_routed(sf_dir, CFG).to_pandas().set_index("lang")
    tw, th = CFG.grid.tile_width, CFG.grid.tile_height
    wlim = tw * (100.0 - vectorize.MARGIN_PCT) / 100.0
    hlim = th * (100.0 - vectorize.MARGIN_PCT) / 100.0
    for lang, grp in clip.groupby("lang"):
        merged = individual = feats = nmarg = 0
        for _, tg in grp.groupby("tile_id"):
            m = (tg["bbox_w"] >= wlim) | (tg["bbox_h"] >= hlim)
            mask = np.zeros((th, tw), dtype=bool)
            for _, r in tg[m].iterrows():
                mask[
                    r["bbox_y"] : min(r["bbox_y"] + r["bbox_h"] + 1, th),
                    r["bbox_x"] : min(r["bbox_x"] + r["bbox_w"] + 1, tw),
                ] = True
            merged += int(mask.sum())
            nm = tg[~m]
            x1 = np.minimum(nm["bbox_x"] + nm["bbox_w"], tw - 1)
            y1 = np.minimum(nm["bbox_y"] + nm["bbox_h"], th - 1)
            individual += int(((x1 - nm["bbox_x"] + 1) * (y1 - nm["bbox_y"] + 1)).sum())
            feats += len(nm) + (1 if m.any() else 0)
            nmarg += int(m.sum())
        row = got.loc[lang]
        assert int(row["merged_px"]) == merged
        assert int(row["individual_px"]) == individual
        assert int(row["n_features"]) == feats
        assert int(row["n_marginal"]) == nmarg


def test_quarantine_poison_row(sf_dir):
    import ray.data

    from aerial_conversion_ray.state.quarantine import (
        guarded_map_batches,
        load_quarantine,
    )

    qdir = __import__("tempfile").mkdtemp(prefix="quarantine_")
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    n_docs = ds.count()

    def poison(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        if (ids == 7).any():
            raise ValueError("poison doc 7")
        return t.append_column("ok", pa.array(np.ones(t.num_rows, dtype=np.int64)))

    out = guarded_map_batches(ds, poison, qdir).to_pandas()
    assert len(out) == n_docs - 1
    assert 7 not in set(out["doc_id"])
    bad = load_quarantine(qdir).to_pandas()
    assert list(bad["doc_id"]) == [7]
    assert "poison doc 7" in bad["_error"].iloc[0]
