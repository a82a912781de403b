import numpy as np

from aerial_conversion_ray.geo import cells


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-90, 90, 1000)
    for res in (5, 9, 11):
        c = cells.encode(lon, lat, res)
        lo0, la0, lo1, la1 = cells.decode(c, res)
        assert ((lon >= lo0) & (lon < lo1 + 1e-9)).all()
        assert ((lat >= la0) & (lat < la1 + 1e-9)).all()


def test_encode_edges():
    c = cells.encode(np.array([180.0, -180.0]), np.array([90.0, -90.0]), 9)
    n = 1 << 9
    assert c[0] == (n // 2 - 1) * n + (n - 1)  # clamped
    assert c[1] == 0


def test_parent_consistency():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    c11 = cells.encode(lon, lat, 11)
    c7 = cells.encode(lon, lat, 7)
    assert np.array_equal(cells.parent(c11, 11, 7), c7)


def test_kring_contains_self_and_neighbours():
    c = cells.encode(np.array([10.0]), np.array([20.0]), 9)
    ring = cells.kring(c, 9, k=1)
    assert ring.shape == (1, 9)
    assert c[0] in ring[0]
    # all ring cells are within 1 step in (ix, iy), modulo wrap
    n = 1 << 9
    iy, ix = ring[0] // n, ring[0] % n
    cy, cx = c[0] // n, c[0] % n
    assert (np.abs(iy - cy) <= 1).all()
    dx = np.minimum(np.abs(ix - cx), n - np.abs(ix - cx))
    assert (dx <= 1).all()


def test_kring_lon_wrap():
    # cell at ix=0 must wrap to ix=n-1
    n = 1 << 9
    c = np.array([100 * n + 0], dtype=np.int64)
    ring = cells.kring(c, 9, k=1)
    assert (100 * n + (n - 1)) in ring[0]


def test_hilbert_locality_and_bijection():
    # bijection on a small grid
    ix, iy = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    d = cells.hilbert_key(ix.ravel(), iy.ravel(), order=4)
    assert len(np.unique(d)) == 256
    assert d.min() == 0 and d.max() == 255
    # locality: consecutive d values are adjacent cells
    order = np.argsort(d)
    xs, ys = ix.ravel()[order], iy.ravel()[order]
    step = np.abs(np.diff(xs)) + np.abs(np.diff(ys))
    assert (step == 1).all()


def test_mercator_roundtrip():
    import numpy as np

    from aerial_conversion_ray.geo.project import from_mercator, to_mercator

    rng = np.random.default_rng(5)
    lon = rng.uniform(-179.9, 179.9, 1000)
    lat = rng.uniform(-84.0, 84.0, 1000)
    x, y = to_mercator(lon, lat)
    lon2, lat2 = from_mercator(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    # known fixed point: equator/prime meridian maps to origin
    x0, y0 = to_mercator(np.array([0.0]), np.array([0.0]))
    assert abs(x0[0]) < 1e-9 and abs(y0[0]) < 1e-9


def test_geohash_known_vectors():
    """Public geohash test vectors (geohash.org canonical examples)."""
    import numpy as np

    from aerial_conversion_ray.geo import cells

    got = cells.geohash_encode(
        np.array([-5.6, 13.361389, 151.2093, -0.1278]),
        np.array([42.6, 38.115556, -33.8688, 51.5074]),
        6,
    )
    assert list(got) == ["ezs42e", "sqc8b4", "r3gx2f", "gcpvj0"]


def test_geohash_prefix_property():
    """left(gh6, 4) == the 4-char encode (bit-truncation identity)."""
    import numpy as np

    from aerial_conversion_ray.geo import cells

    rng = np.random.RandomState(7)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-90, 90, 200)
    g6 = cells.geohash_encode(lon, lat, 6)
    g4 = cells.geohash_encode(lon, lat, 4)
    assert (g6.astype("U4") == g4).all()


def test_geohash_odd_precision_rejected():
    import numpy as np
    import pytest

    from aerial_conversion_ray.geo import cells

    with pytest.raises(ValueError):
        cells.geohash_encode(np.array([0.0]), np.array([0.0]), 5)


def test_cell_compact_reconstructs(ray_session):
    """Expanding the compacted set back to res 9 reproduces the exact
    occupied-cell set, and no complete sibling quad survives."""
    import numpy as np

    from aerial_conversion_ray.config import EngineConfig
    from aerial_conversion_ray.geo import cells
    from aerial_conversion_ray.pipelines import spatial
    from aerial_conversion_ray.pipelines.spatial import pages_dataset, geocode_arrays

    sf = "/root/testdata/sf0.001"
    cfg = EngineConfig(pages_rep=5)
    got = spatial.cell_compact(sf, cfg).to_pandas()

    # truth: distinct r9 cells
    ids = pages_dataset(sf, rep=cfg.pages_rep, columns=["page_id"]).to_pandas()
    g = geocode_arrays(ids["page_id"].to_numpy(np.int64))
    truth = np.unique(cells.encode(g["lon"], g["lat"], 9))

    # expand each compacted cell down to res 9 children
    expanded = []
    for res, cell in zip(got["res"].to_numpy(np.int64), got["cell"].to_numpy(np.int64)):
        cur = np.array([cell], np.int64)
        for r in range(res, 9):
            n = np.int64(1) << r
            ix, iy = cur % n, cur // n
            child_n = n << 1
            cs = []
            for dy in (0, 1):
                for dx in (0, 1):
                    cs.append((iy * 2 + dy) * child_n + ix * 2 + dx)
            cur = np.concatenate(cs)
        expanded.append(cur)
    expanded = np.unique(np.concatenate(expanded))
    assert np.array_equal(expanded, truth)

    # maximality: no quad of 4 siblings remains at res 9 or 8
    for res in (9, 8):
        lvl = got.loc[got["res"] == res, "cell"].to_numpy(np.int64)
        if len(lvl):
            p = cells.cell_parent(lvl, res)
            _, cnt = np.unique(p, return_counts=True)
            assert cnt.max() < 4
