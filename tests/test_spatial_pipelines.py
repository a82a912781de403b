import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from aerial_conversion_ray.config import EngineConfig
from aerial_conversion_ray.geo.haversine import haversine_m
from aerial_conversion_ray.geocode import geocode_arrays
from aerial_conversion_ray.pipelines import spatial

CFG = EngineConfig(pages_rep=2)


def _collect(ds) -> pa.Table:
    return pa.concat_tables(
        list(ds.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    )


def test_text_byte_identity_through_tile_join(sf_dir):
    """North-rule invariant: extracted text byte-identical per url
    through every stage."""
    import ray.data

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet").to_pandas()
    out = _collect(spatial.tile_point_join(sf_dir, CFG)).to_pandas()
    src = docs.set_index("doc_id")["text"]
    assert len(out) == len(docs) * CFG.pages_rep
    assert (out["text"].to_numpy() == src.loc[out["doc_id"]].to_numpy()).all()


def test_geocode_hot_cluster_skew(sf_dir):
    out = _collect(spatial.geocode_pipeline(sf_dir, CFG))
    g = geocode_arrays(out["page_id"].to_numpy())
    frac_hot = g["hot"].mean()
    assert 0.15 < frac_hot < 0.25  # 20% by construction


def test_tile_clip_join_covers_and_clips(sf_dir):
    out = _collect(spatial.tile_clip_join(sf_dir, CFG)).to_pandas()
    # every page appears at least once
    geo = _collect(spatial.geocode_pipeline(sf_dir, CFG)).to_pandas()
    assert set(geo["page_id"]) == set(out["page_id"])
    # clip is inside both footprint and tile; area positive
    assert (out["clip_minx"] >= out["fp_minx"] - 1e-12).all()
    assert (out["clip_maxx"] <= out["fp_maxx"] + 1e-12).all()
    assert (out["clip_area"] > 0).all()
    assert (out["bbox_w"] >= 0).all() and (out["bbox_h"] >= 0).all()


def test_knn_brute_matches_numpy_oracle(sf_dir):
    cfg = EngineConfig(pages_rep=1, knn_k=3)
    out = _collect(spatial.knn_pipeline(sf_dir, cfg, query_mod=50)).to_pandas()
    geo = _collect(spatial.geocode_pipeline(sf_dir, cfg)).to_pandas()
    ids = geo["page_id"].to_numpy()
    lon, lat = geo["lon"].to_numpy(), geo["lat"].to_numpy()
    qids = ids[ids % 50 == 0]
    for q in qids[:10]:
        qi = np.nonzero(ids == q)[0][0]
        d = haversine_m(lon[qi], lat[qi], lon, lat)
        mask = ids != q
        order = np.lexsort((ids[mask], d[mask]))
        want = ids[mask][order][:3].tolist()
        got = out[out["query_id"] == q].sort_values("rank")["neighbor_id"].tolist()
        assert got == want, f"query {q}"


def test_knn_kring_exactly_matches_brute(sf_dir):
    """k-ring kNN is EXACT (adaptive ring expansion with the coverage-
    radius stopping rule), so it must equal brute force row-for-row —
    ranks, ids, and distances, not just high recall."""
    cfg = EngineConfig(pages_rep=2, knn_k=5)
    cols = ["query_id", "rank", "neighbor_id", "dist_m"]
    brute = (
        _collect(spatial.knn_pipeline(sf_dir, cfg, method="brute"))
        .to_pandas()[cols]
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    kring = (
        _collect(spatial.knn_pipeline(sf_dir, cfg, method="kring"))
        .to_pandas()[cols]
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(brute, kring)


def test_pages_rep_amplification(sf_dir):
    ds1 = spatial.geocode_pipeline(sf_dir, EngineConfig(pages_rep=1))
    ds3 = spatial.geocode_pipeline(sf_dir, EngineConfig(pages_rep=3))
    n1, n3 = ds1.count(), ds3.count()
    assert n3 == 3 * n1


def test_point_in_own_tile(sf_dir):
    """Join correctness: each point's lon/lat lies inside the bounds
    of its assigned tile."""
    cfg = CFG
    out = _collect(spatial.tile_point_join(sf_dir, cfg)).to_pandas()
    r, g = cfg.raster, cfg.grid
    a, _, c, _, e, f = r.transform
    parts = out["tile_id"].str.extract(r"tile_(\d+)-(\d+)").astype(int)
    coff, roff = parts[0].to_numpy(), parts[1].to_numpy()
    minx = c + a * coff
    maxx = c + a * np.minimum(coff + g.tile_width, r.ncols)
    maxy = f + e * roff
    miny = f + e * np.minimum(roff + g.tile_height, r.nrows)
    lon, lat = out["lon"].to_numpy(), out["lat"].to_numpy()
    # in-extent points: strictly inside; clamped edge points sit on edge tiles
    inext = (lon >= r.x0) & (lon < r.x0 + a * r.ncols) & (lat <= r.y_max) & (
        lat > r.y_max + e * r.nrows
    )
    assert (lon[inext] >= minx[inext]).all() and (lon[inext] <= maxx[inext]).all()
    assert (lat[inext] <= maxy[inext]).all() and (lat[inext] >= miny[inext]).all()


def test_shuffle_join_matches_broadcast(sf_dir):
    """Salted-shuffle physical plan produces byte-identical rows to
    the broadcast plan (north rule: same join output either path)."""
    from aerial_conversion_ray.config import EngineConfig
    from aerial_conversion_ray.pipelines import spatial

    cfg = EngineConfig(pages_rep=4)
    a = (
        spatial.tile_point_join(sf_dir, cfg)
        .to_pandas()
        .sort_values("page_id")
        .reset_index(drop=True)
    )
    b = (
        spatial.tile_point_join_shuffle(sf_dir, cfg)
        .to_pandas()
        .sort_values("page_id")
        .reset_index(drop=True)
    )
    assert list(a.columns) == sorted(a.columns) or set(a.columns) == set(b.columns)
    b = b[a.columns]
    assert a.equals(b)


def test_contour_segments_dense_brute(sf_dir):
    """Sparse marching squares vs a DENSE-grid brute recompute: build
    the full CONTOUR_RES count raster in numpy, walk every 2x2 block with
    the same case table, compare the exact segment sets."""
    import numpy as np

    from aerial_conversion_ray.config import EngineConfig
    from aerial_conversion_ray.geo import cells
    from aerial_conversion_ray.pipelines import spatial

    cfg = EngineConfig(pages_rep=20)
    res, T = spatial.CONTOUR_RES, spatial.CONTOUR_T
    n_side = 1 << res
    pts = spatial.geocode_pipeline(sf_dir, cfg, columns=["page_id"]).to_pandas()
    cell = cells.encode(pts["lon"].to_numpy(), pts["lat"].to_numpy(), res)
    grid = np.zeros((n_side // 2, n_side), dtype=np.int64)
    np.add.at(grid, (cell // n_side, cell % n_side), 1)
    sega, segb = spatial._ms_tables()
    expect = set()
    for by in range(n_side // 2 - 1):
        for bx in range(n_side - 1):
            v = np.array(
                [grid[by, bx], grid[by, bx + 1], grid[by + 1, bx + 1], grid[by + 1, bx]],
                dtype=np.int64,
            )
            case = int(
                (v[0] >= T) + 2 * (v[1] >= T) + 4 * (v[2] >= T) + 8 * (v[3] >= T)
            )
            for slot in (0, 1):
                ea, eb = int(sega[case, slot]), int(segb[case, slot])
                if ea < 0:
                    continue

                def pt(e):
                    va = int(v[spatial._MS_EDGE_CA[e]])
                    vb = int(v[spatial._MS_EDGE_CB[e]])
                    t = (2 * T - 1 - 2 * va) * 1_000_000 // (2 * (vb - va))
                    x, y = spatial._ms_endpoint(np.array([e]), np.array([t]))
                    return int(x[0]), int(y[0])

                expect.add((bx, by, case, slot, *pt(ea), *pt(eb)))
    got = spatial.contour_segments(sf_dir, cfg).to_pandas()
    got_set = set(map(tuple, got.to_numpy()))
    assert got_set == expect
    assert len(expect) > 100  # non-vacuous isoline


def test_contour_rings_topology(sf_dir):
    """Ring algebra: per-ring segment counts partition the segment
    set; closed <=> n_segments == n_vertices; most of the isoline
    closes (opens are antimeridian cuts only); and every segment's two
    endpoints land in the same ring."""
    from aerial_conversion_ray.config import EngineConfig
    from aerial_conversion_ray.pipelines import spatial

    cfg = EngineConfig(pages_rep=20)
    segs = spatial.contour_segments(sf_dir, cfg).to_pandas()
    rings = spatial.contour_rings(sf_dir, cfg).to_pandas()
    assert rings["n_segments"].sum() == len(segs)
    assert (
        (rings["closed"] == 1)
        == (rings["n_segments"] == rings["n_vertices"])
    ).all()
    assert rings["closed"].mean() > 0.7
    assert rings["n_vertices"].max() >= 20  # real blobs, not pixel noise
