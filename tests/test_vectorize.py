"""Reverse-path tests: round-trip quantization bounds, zone-merge
exactness vs a brute numpy oracle, orthogonalise/rect-union kernels."""

import numpy as np
import pytest

from aerial_conversion_ray.config import EngineConfig
from aerial_conversion_ray.geo.polygon import (
    dominant_angle,
    orthogonalise,
    rect_union_area,
    shoelace_area,
)
from aerial_conversion_ray.pipelines import vectorize

CFG = EngineConfig(pages_rep=4)


# --------------------------------------------------------------------------
# kernels
# --------------------------------------------------------------------------

def test_rect_union_area_disjoint():
    r = np.array([[0, 0, 1, 1], [2, 2, 3, 3]], dtype=float)
    assert rect_union_area(r) == pytest.approx(2.0)


def test_rect_union_area_overlap():
    r = np.array([[0, 0, 2, 2], [1, 1, 3, 3]], dtype=float)
    assert rect_union_area(r) == pytest.approx(7.0)


def test_rect_union_area_nested_and_degenerate():
    r = np.array([[0, 0, 4, 4], [1, 1, 2, 2], [5, 5, 5, 7]], dtype=float)
    assert rect_union_area(r) == pytest.approx(16.0)


def test_rect_union_area_monte_carlo():
    rng = np.random.default_rng(7)
    rects = []
    for _ in range(40):
        x0, y0 = rng.random(2) * 8
        rects.append([x0, y0, x0 + rng.random() * 3, y0 + rng.random() * 3])
    rects = np.array(rects)
    # grid oracle
    xs = np.unique(np.concatenate([rects[:, 0], rects[:, 2]]))
    ys = np.unique(np.concatenate([rects[:, 1], rects[:, 3]]))
    area = 0.0
    for i in range(len(xs) - 1):
        for j in range(len(ys) - 1):
            cx, cy = (xs[i] + xs[i + 1]) / 2, (ys[j] + ys[j + 1]) / 2
            if np.any(
                (rects[:, 0] <= cx)
                & (rects[:, 2] >= cx)
                & (rects[:, 1] <= cy)
                & (rects[:, 3] >= cy)
            ):
                area += (xs[i + 1] - xs[i]) * (ys[j + 1] - ys[j])
    assert rect_union_area(rects) == pytest.approx(area, rel=1e-12)


def test_dominant_angle_of_rotated_rect():
    base = np.array([[0, 0], [4, 0], [4, 2], [0, 2]], dtype=float)
    for deg in (0.0, 10.0, 37.0, 80.0):
        th = np.radians(deg)
        ca, sa = np.cos(th), np.sin(th)
        rot = base @ np.array([[ca, sa], [-sa, ca]])
        got = np.degrees(dominant_angle(rot))
        # circular distance on the 90-degree fold (0 and 90 coincide)
        d = abs((got - deg) % 90.0)
        assert min(d, 90.0 - d) < 1e-8


def test_orthogonalise_recovers_rectangle():
    rng = np.random.default_rng(3)
    base = np.array([[0, 0], [4, 0], [4, 2], [0, 2]], dtype=float)
    th = np.radians(25.0)
    ca, sa = np.cos(th), np.sin(th)
    # densify + jitter
    dense = []
    for i in range(4):
        p, q = base[i], base[(i + 1) % 4]
        for f in (0.0, 0.5):
            dense.append(p + f * (q - p))
    noisy = np.asarray(dense) + rng.normal(0, 0.01, (8, 2))
    rot = noisy @ np.array([[ca, sa], [-sa, ca]])
    out = orthogonalise(rot, max_angle_change_deg=15.0)
    # result must be a 4-vertex ring with right angles
    assert len(out) == 4
    edges = np.roll(out, -1, axis=0) - out
    for i in range(4):
        cosang = np.dot(edges[i], edges[(i + 1) % 4]) / (
            np.linalg.norm(edges[i]) * np.linalg.norm(edges[(i + 1) % 4])
        )
        assert abs(cosang) < 1e-9
    assert shoelace_area(out) == pytest.approx(8.0, rel=0.05)


def test_orthogonalise_bails_on_triangle():
    # equilateral triangle: edge directions 60 degrees apart can never
    # all sit within 15 degrees of one orthogonal grid -> unchanged
    poly = np.array(
        [[0.0, 0.0], [2.0, 0.0], [1.0, np.sqrt(3.0)]], dtype=float
    )
    out = orthogonalise(poly, max_angle_change_deg=15.0)
    np.testing.assert_array_equal(out, poly)


# --------------------------------------------------------------------------
# pipelines (sf0.001)
# --------------------------------------------------------------------------

def test_roundtrip_quantization_bound(sf_dir):
    """Spatialized (pixel-snapped) rect must contain the clip rect and
    exceed it by at most one pixel on each side (the reference's
    round-trip property up to quantization)."""
    df = vectorize.spatialize(sf_dir, CFG).to_pandas()
    cell = CFG.raster.cell
    eps = 1e-9
    assert (df["ann_minx"] <= df["clip_minx"] + eps).all()
    assert (df["ann_maxx"] + eps >= df["clip_maxx"]).all()
    assert (df["ann_miny"] <= df["clip_miny"] + eps).all()
    assert (df["ann_maxy"] + eps >= df["clip_maxy"]).all()
    assert (df["clip_minx"] - df["ann_minx"] <= cell + eps).all()
    assert (df["ann_maxx"] - df["clip_maxx"] <= cell + eps).all()
    assert (df["clip_miny"] - df["ann_miny"] <= cell + eps).all()
    assert (df["ann_maxy"] - df["clip_maxy"] <= cell + eps).all()


def test_roundtrip_text_byte_identity(sf_dir):
    """North-rule invariant: text is byte-identical per url through
    the whole forward+reverse chain."""
    import pyarrow.parquet as pq

    df = vectorize.spatialize(sf_dir, CFG).to_pandas()
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    want = dict(zip(docs["doc_id"], docs["text"]))
    got = df.drop_duplicates("page_id")
    assert all(t == want[d] for d, t in zip(got["doc_id"], got["text"]))


def test_pixel_union_count_matches_mask_paint():
    """Difference-array union kernel vs an independent boolean-mask
    paint oracle on random inclusive rects."""
    rng = np.random.default_rng(11)
    W = H = 60
    x0 = rng.integers(0, W - 1, 200)
    y0 = rng.integers(0, H - 1, 200)
    x1 = np.minimum(x0 + rng.integers(0, 9, 200), W - 1)
    y1 = np.minimum(y0 + rng.integers(0, 9, 200), H - 1)
    mask = np.zeros((H, W), dtype=bool)
    for a, b, c, d in zip(x0, y0, x1, y1):
        mask[b : d + 1, a : c + 1] = True
    assert (
        vectorize.pixel_union_count(x0, y0, x1, y1, W, H) == int(mask.sum())
    )


def test_zone_merge_matches_brute_paint(sf_dir):
    """Two-level (per-tile partial -> per-zone sum) pixel union equals
    an independent per-zone mask paint over all (tile, bbox) rows."""
    clip = (
        vectorize.spatial.tile_clip_join(sf_dir, CFG)
        .select_columns(["lang", "tile_id", "bbox_x", "bbox_y", "bbox_w", "bbox_h"])
        .to_pandas()
    )
    got = vectorize.zone_merge(sf_dir, CFG).to_pandas()
    tw, th = CFG.grid.tile_width, CFG.grid.tile_height
    for lang, grp in clip.groupby("lang"):
        want = 0
        for _, tile_grp in grp.groupby("tile_id"):
            # tile-domain mask: boundary pixels (index == tile size)
            # belong to the neighbour tile and are painted there
            mask = np.zeros((th, tw), dtype=bool)
            for _, r in tile_grp.iterrows():
                mask[
                    r["bbox_y"] : min(r["bbox_y"] + r["bbox_h"] + 1, th),
                    r["bbox_x"] : min(r["bbox_x"] + r["bbox_w"] + 1, tw),
                ] = True
            want += int(mask.sum())
        have = int(got.loc[got["lang"] == lang, "union_px"].iloc[0])
        assert have == want


def test_zone_envelope_consistent_with_merge(sf_dir):
    env = vectorize.zone_envelope(sf_dir, CFG).to_pandas()
    mrg = vectorize.zone_merge(sf_dir, CFG).to_pandas()
    m = env.merge(mrg, on="lang")
    assert (m["n_ann"] == m["n_rects"]).all()
    # envelope box sanity: the pixel union fits inside the envelope
    box_px = (
        np.ceil((m["env_maxx"] - m["env_minx"]) / CFG.raster.cell + 1)
        * np.ceil((m["env_maxy"] - m["env_miny"]) / CFG.raster.cell + 1)
    )
    assert (m["union_px"] <= box_px).all()


def test_regularise_stats(sf_dir):
    df = vectorize.regularise(sf_dir, CFG).to_pandas()
    assert (df["n_vertices_in"] == 12).all()
    # orthogonalise+simplify collapses the jittered 12-gon to <= 12
    assert (df["n_vertices_out"] <= 12).all()
    assert (df["area_out_e9"] > 0).all()
    # minimum-rotated-rectangle variant: always 4 vertices, area >= input
    mrr = vectorize.regularise(
        sf_dir, CFG, minimum_rotated_rectangle=True
    ).to_pandas()
    assert (mrr["n_vertices_out"] == 4).all()
    assert (mrr["area_out_e9"] >= mrr["area_in_e9"] - 1).all()

def test_areal_interp_mass_conservation(sf_dir):
    """Allocation algebra: per zone the tile overlaps sum to zone_px,
    and the fixed-point allocations sum to the zone's full mass up to
    the per-tile floor loss (< n_tiles units of 1e-6)."""
    from aerial_conversion_ray.config import EngineConfig
    from aerial_conversion_ray.pipelines import vectorize

    res = vectorize.areal_interp(sf_dir, EngineConfig(pages_rep=20)).to_pandas()
    assert len(res) > 0
    for lang, g in res.groupby("lang"):
        zone_px = g["zone_px"].iloc[0]
        value = g["value"].iloc[0]
        assert (g["zone_px"] == zone_px).all()
        assert g["union_px"].sum() == zone_px
        total = g["alloc_e6"].sum()
        assert total <= value * 1_000_000
        assert total > value * 1_000_000 - len(g)
        # proportionality: same-zone rows ordered by overlap are
        # ordered by allocation
        s = g.sort_values("union_px")
        assert (s["alloc_e6"].diff().dropna() >= 0).all()
