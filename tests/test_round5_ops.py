"""Round-5 additions: conformal projections (LCC / polar stereo),
raster CRS dispatch, sharded dedup parity is in test_embeddings.py."""

import numpy as np

from aerial_conversion_ray.config import RasterSpec, TileGridSpec
from aerial_conversion_ray.geo import project as prj
from aerial_conversion_ray.geo.tiles import point_tile_assign


def test_lcc_known_points():
    # projection origin maps to false easting/northing exactly
    x, y = prj.to_lcc(np.array([prj.LCC_LON0]), np.array([prj.LCC_LAT0]))
    assert abs(x[0] - prj.LCC_E0) < 1e-6
    assert abs(y[0] - prj.LCC_N0) < 1e-6
    # conformal cone: along lat0, x grows with lon, y is symmetric
    lon = np.array([prj.LCC_LON0 - 10.0, prj.LCC_LON0 + 10.0])
    lat = np.full(2, prj.LCC_LAT0)
    x, y = prj.to_lcc(lon, lat)
    assert x[0] < 0.0 < x[1]
    assert abs(x[0] + x[1]) < 1e-6 and abs(y[0] - y[1]) < 1e-6
    # scale factor ~1 on the standard parallels: 1 deg of longitude at
    # lat1 spans ~cos(lat1) * 111.32 km
    lon = np.array([0.0, 1.0]) + prj.LCC_LON0
    lat = np.full(2, prj.LCC_LAT1)
    x, y = prj.to_lcc(lon, lat)
    span = float(np.hypot(x[1] - x[0], y[1] - y[0]))
    want = np.cos(np.radians(prj.LCC_LAT1)) * 111_320.0
    assert abs(span - want) / want < 0.01


def test_polar_stereo_known_points():
    # the pole maps to the false origin; rho grows away from the pole
    x, y = prj.to_polar_stereo(np.array([0.0]), np.array([89.9999999]))
    assert abs(x[0] - prj.PST_E0) < 1.0 and abs(y[0] - prj.PST_N0) < 1.0
    # lon0 meridian heads due -y (north aspect)
    x, y = prj.to_polar_stereo(np.array([prj.PST_LON0]), np.array([70.0]))
    assert abs(x[0] - prj.PST_E0) < 1e-6 and y[0] < prj.PST_N0
    # k0-scaled: at lat 89, distance from pole ~ k0 * 111.2km * 1 deg
    x, y = prj.to_polar_stereo(np.array([prj.PST_LON0]), np.array([89.0]))
    rho = float(np.hypot(x[0] - prj.PST_E0, y[0] - prj.PST_N0))
    assert abs(rho - prj.PST_K0 * 111_200.0) / rho < 0.01


def test_project_to_crs_dispatch():
    lon = np.array([10.0, -96.0])
    lat = np.array([50.0, 33.0])
    x, y = prj.project_to_crs("EPSG:4326", lon, lat)
    assert (x == lon).all() and (y == lat).all()
    mx, my = prj.project_to_crs("EPSG:3857", lon, lat)
    ex, ey = prj.to_mercator(lon, lat)
    assert (mx == ex).all() and (my == ey).all()
    lx, _ = prj.project_to_crs("LCC", lon, lat)
    assert abs(lx[1]) < 1e-3                     # on the central meridian
    _, en = prj.project_to_crs("UTM:32", lon, lat)
    assert en[0] > 0
    try:
        prj.project_to_crs("EPSG:9999", lon, lat)
        raise AssertionError("unknown CRS must raise")
    except ValueError:
        pass


def test_point_tile_assign_mercator_crs():
    """A raster whose affine lives in EPSG:3857 assigns pixels by the
    PROJECTED coordinate, matching a manual project-then-floor."""
    cell = 10_000.0  # 10 km pixels
    spec = RasterSpec(
        x0=-20_000_000.0,
        y_max=20_000_000.0,
        cell=cell,
        ncols=4000,
        nrows=4000,
        crs="EPSG:3857",
    )
    grid = TileGridSpec(tile_width=100, tile_height=100)
    lon = np.array([0.0, 151.2, -74.0])
    lat = np.array([0.0, -33.9, 40.7])
    tc, tr, col, row = point_tile_assign(spec, grid, lon, lat)
    mx, my = prj.to_mercator(lon, lat)
    want_col = np.clip(
        np.floor((mx - spec.x0) / cell).astype(np.int64), 0, spec.ncols - 1
    )
    want_row = np.clip(
        np.floor((my - spec.y_max) / -cell).astype(np.int64), 0, spec.nrows - 1
    )
    assert (col == want_col).all() and (row == want_row).all()
    assert (tc == (want_col // 100) * 100).all()
    assert (tr == (want_row // 100) * 100).all()


def test_minhash_spill_path_parity(sf_dir):
    """pair_ceiling=0 forces the spill plan (pairs stay a Dataset,
    routing bucket-folded, no broadcast); the verified pair set must
    equal the broadcast plan's exactly."""
    from aerial_conversion_ray.pipelines import text as text_mod

    broad = (
        text_mod.minhash_lsh_pairs(sf_dir)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    spill = (
        text_mod.minhash_lsh_pairs(sf_dir, pair_ceiling=0)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert broad.equals(spill)
    assert len(broad) > 0          # the synthetic corpus has near-dups


def test_multipoint_codec_roundtrip(tmp_path):
    """Ragged multipoint records + .prj survive a write/read cycle."""
    import os

    from aerial_conversion_ray.sources import shapefile as shp

    pts1 = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, -1.0]])
    pts2 = np.array([[-10.0, 0.5]])
    contents = [shp.multipoint_content(pts1), shp.multipoint_content(pts2)]
    base = os.path.join(str(tmp_path), "data")
    shp.write_shp(base, contents)
    shp.write_prj(base, "EPSG:3857")
    with open(base + ".shp", "rb") as f:
        shapes = shp.read_shp_bytes(f.read())
    assert [s["type"] for s in shapes] == [shp.SHAPE_MULTIPOINT] * 2
    assert np.array_equal(shapes[0]["parts"][0], pts1)
    assert np.array_equal(shapes[1]["parts"][0], pts2)
    assert shp.read_prj(base) == "EPSG:3857"
    # unknown WKT comes back verbatim, absent sidecar is None
    with open(base + ".prj", "w") as f:
        f.write('PROJCS["custom"]')
    assert shp.read_prj(base) == 'PROJCS["custom"]'
    assert shp.read_prj(base + "_missing") is None


def test_iter_stratified_exact(sf_dir):
    """Exact Sechidis greedy: deterministic, covers every annotated
    image once, and balances every label at least as well as the
    hash split on the rarest label."""
    from aerial_conversion_ray.pipelines import coco as coco_mod

    a = coco_mod.iter_stratified_split_exact(sf_dir).to_pandas()
    b = coco_mod.iter_stratified_split_exact(sf_dir).to_pandas()
    a = a.sort_values("image_id").reset_index(drop=True)
    b = b.sort_values("image_id").reset_index(drop=True)
    assert a.equals(b)
    assert a["image_id"].is_unique
    assert set(a["split"]) <= {"test", "train"}

    anns = (
        coco_mod.coco_annotations(sf_dir)
        .to_pandas()[["image_id", "category_id"]]
        .drop_duplicates()
    )
    assert set(anns["image_id"]) == set(a["image_id"])
    merged = anns.merge(a, on="image_id")
    want = 1.0 / coco_mod.STRAT_TEST_DEN
    frac = merged.groupby("category_id")["split"].apply(
        lambda s: (s == "test").mean()
    )
    # every label's test share within 1 image of the target quota
    cnt = merged.groupby("category_id")["split"].size()
    assert ((frac - want).abs() <= 1.0 / cnt + 1e-9).all()


def test_multipatch_codec_roundtrip(tmp_path):
    """Type-31 multipatch records (2-D prefix) parse back with parts
    and part types intact."""
    import os

    from aerial_conversion_ray.sources import shapefile as shp

    ring = np.array([[0.0, 0.0], [0.0, 2.0], [2.0, 2.0], [2.0, 0.0], [0.0, 0.0]])
    strip = np.array([[5.0, 0.0], [5.0, 1.0], [6.0, 0.0], [6.0, 1.0]])
    c = shp.multipatch_content(
        [ring, strip], [shp.MPATCH_OUTER_RING, shp.MPATCH_TRIANGLE_STRIP]
    )
    base = os.path.join(str(tmp_path), "data")
    shp.write_shp(base, [c])
    with open(base + ".shp", "rb") as f:
        shapes = shp.read_shp_bytes(f.read())
    assert len(shapes) == 1
    sh = shapes[0]
    assert sh["type"] == shp.SHAPE_MULTIPATCH
    assert sh["part_types"] == [shp.MPATCH_OUTER_RING, shp.MPATCH_TRIANGLE_STRIP]
    assert np.array_equal(sh["parts"][0], ring)
    assert np.array_equal(sh["parts"][1], strip)
