"""General WKB geometry codec (holes + multipolygon) and the
multi-ring clip join (the reference's arbitrary-geometry ingest path:
``scripts/geojson2coco.py:180`` gpd.read_file, explode at
``aerial_conversion/coordinates.py:191``, interior-ring
orthogonalisation at ``orthogonalise/orthogonalise.py:209-212``)."""

import numpy as np
import pytest

from aerial_conversion_ray.geo import wkb
from aerial_conversion_ray.geo.polygon import orthogonalise, orthogonalise_rings


def sq(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=float)


G_HOLED = [[sq(0, 0, 10, 10), sq(2, 2, 4, 4)], [sq(20, 0, 25, 5)]]


def test_multipolygon_roundtrip_general():
    buf = wkb.encode_multipolygon(G_HOLED)
    flat, offs, geom, part, hole = wkb.decode_geometries([buf])
    assert geom.tolist() == [0, 0, 0]
    assert part.tolist() == [0, 0, 1]
    assert hole.tolist() == [False, True, False]
    assert np.allclose(flat[offs[0] : offs[1]], sq(0, 0, 10, 10))
    assert np.allclose(flat[offs[1] : offs[2]], sq(2, 2, 4, 4))
    assert np.allclose(flat[offs[2] : offs[3]], sq(20, 0, 25, 5))


def test_polygon_with_holes_roundtrip():
    buf = wkb.encode_polygon_rings([sq(0, 0, 8, 8), sq(1, 1, 2, 2), sq(5, 5, 6, 6)])
    flat, offs, geom, part, hole = wkb.decode_geometries([buf])
    assert part.tolist() == [0, 0, 0]
    assert hole.tolist() == [False, True, True]
    assert np.allclose(flat[offs[1] : offs[2]], sq(1, 1, 2, 2))


def test_fast_path_equals_general():
    """Homogeneous batches take the vectorized path; it must agree
    bit-for-bit with the per-geometry parser."""
    b1 = wkb.encode_multipolygon(G_HOLED)
    b2 = wkb.encode_multipolygon(
        [[sq(1, 1, 11, 11), sq(3, 3, 5, 5)], [sq(21, 1, 26, 6)]]
    )
    fast = wkb._decode_homogeneous([b1, b2], len(b1))
    assert fast is not None
    slow = wkb._decode_general([b1, b2])
    for a, b in zip(fast, slow):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_mixed_batch_falls_back():
    """Mixed geometry types decode via the general path; points come
    back as 1-vertex rings."""
    bufs = [
        wkb.encode_multipolygon(G_HOLED),
        wkb.encode_polygon_rings([sq(0, 0, 3, 3)]),
        wkb.encode_points([7.0], [8.0])[0],
    ]
    flat, offs, geom, part, hole = wkb.decode_geometries(bufs)
    assert geom.tolist() == [0, 0, 0, 1, 2]
    assert np.allclose(flat[offs[4] : offs[5]], [[7.0, 8.0]])


def test_decode_rejects_big_endian_and_unknown():
    with pytest.raises(ValueError):
        wkb.decode_geometries([b"\x00\x00\x00\x00\x03" + b"\x00" * 8])
    with pytest.raises(ValueError):
        wkb.decode_geometries([b"\x01\x07\x00\x00\x00\x00\x00\x00\x00"])


def test_orthogonalise_rings_per_ring():
    """Each ring — exterior and hole — snaps independently, exactly
    the single-ring kernel applied per ring (reference loops rings at
    orthogonalise.py:209-212)."""
    rng = np.random.default_rng(7)
    jitter = lambda r: r + rng.normal(0, 0.01, r.shape)
    ext = jitter(sq(0, 0, 10, 10))
    hol = jitter(sq(2, 2, 4, 4))
    out = orthogonalise_rings([ext, hol])
    assert len(out) == 2
    assert np.array_equal(out[0], orthogonalise(ext))
    assert np.array_equal(out[1], orthogonalise(hol))
    # snapped rings are orthogonal: consecutive edges perpendicular
    # (axis-aligned in the ring's dominant-angle frame, not global xy)
    for ring in out:
        edges = np.roll(ring, -1, axis=0) - ring
        unit = edges / np.hypot(edges[:, 0], edges[:, 1])[:, None]
        dots = np.abs(np.einsum("ij,ij->i", unit, np.roll(unit, -1, axis=0)))
        assert np.all(dots < 1e-9)


def test_multiring_clip_join_matches_duckdb(sf_dir):
    """End-to-end: encode multipolygon WKB column -> general decode ->
    explode -> hole-aware tile clip, vs the closed-form DuckDB
    oracle."""
    import duckdb

    from aerial_conversion_ray.config import EngineConfig
    from aerial_conversion_ray.pipelines import spatial, sql_oracle

    cfg = EngineConfig(pages_rep=3)
    got = (
        spatial.multiring_clip_join(sf_dir, cfg)
        .to_pandas()
        .sort_values(["page_id", "part_idx", "tile_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = (
        con.execute(sql_oracle.multiring_clip_join_sql(cfg))
        .df()
        .sort_values(["page_id", "part_idx", "tile_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) and len(got) > 0
    assert got["page_id"].tolist() == exp["page_id"].tolist()
    assert got["part_idx"].tolist() == exp["part_idx"].tolist()
    assert got["tile_id"].tolist() == exp["tile_id"].tolist()
    assert got["clip_area_e9"].tolist() == exp["clip_area_e9"].tolist()
