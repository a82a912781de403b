"""Distance-band join: ring coverage + refine invariants (the SQL
oracle is exercised by tools/check.py; these tests pin the geometry
guarantees the candidate generation relies on)."""

import numpy as np

from aerial_conversion_ray.pipelines import spatial


def test_hav_np_matches_known_distance():
    """Sydney -> Melbourne great-circle ~ 713 km (public figure for
    the spherical R=6371 km model)."""
    d = spatial._hav_np(
        np.array([151.2093]), np.array([-33.8688]),
        np.array([144.9631]), np.array([-37.8136]),
    )
    assert abs(d[0] - 713_400) < 2_000


def test_within_dist_join_pairs_are_symmetric_unique(sf_dir):
    out = spatial.within_dist_join(sf_dir).to_pandas()
    assert (out["a_id"] < out["b_id"]).all()
    assert not out.duplicated(["a_id", "b_id"]).any()
    assert (out["dist_mm"] <= spatial.DIST_JOIN_M * 1000).all()


def test_within_dist_join_matches_bruteforce(sf_dir):
    """Engine pairs == brute-force numpy all-pairs on the geocoded
    points (validates the ring k-expansion never drops a candidate —
    including lon wrap and high-latitude widening)."""
    import pyarrow.parquet as pq

    from aerial_conversion_ray.geocode import geocode_arrays

    doc_id = (
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .column("doc_id")
        .to_numpy()
    )
    g = geocode_arrays(np.sort(doc_id))
    lon, lat = g["lon"], g["lat"]
    d = spatial._hav_np(lon[:, None], lat[:, None], lon[None, :], lat[None, :])
    ai, bi = np.nonzero((d <= spatial.DIST_JOIN_M) & (np.arange(len(lon))[:, None] < np.arange(len(lon))[None, :]))
    want = set(zip(np.sort(doc_id)[ai], np.sort(doc_id)[bi]))
    out = spatial.within_dist_join(sf_dir).to_pandas()
    got = set(zip(out["a_id"], out["b_id"]))
    assert got == want


def test_monotone_chain_known_hull():
    import numpy as np

    from aerial_conversion_ray.pipelines.spatial import _monotone_chain

    pts = np.array(
        [[0, 0], [2, 0], [2, 2], [0, 2], [1, 1], [0.5, 0.5], [2, 1], [1, 0]],
        dtype=float,
    )
    hull = _monotone_chain(pts)
    got = {tuple(pts[i]) for i in hull}
    assert got == {(0, 0), (2, 0), (2, 2), (0, 2)}
    # starts at lexicographic minimum
    assert tuple(pts[hull[0]]) == (0, 0)


def test_source_hulls_properties(sf_dir):
    """Containment + convexity + minimality per source, against the
    raw point cloud."""
    import numpy as np
    import pyarrow.parquet as pq

    from aerial_conversion_ray.geocode import geocode_arrays
    from aerial_conversion_ray.pipelines import spatial

    out = spatial.source_hulls(sf_dir).to_pandas()
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    ).to_pandas()
    rep = spatial._CP_REP
    for src, hull in out.groupby("source"):
        hull = hull.sort_values("hull_pos")
        v = hull[["lon", "lat"]].to_numpy()
        doc_ids = docs[docs["source"] == src]["doc_id"].to_numpy()
        page_ids = (doc_ids[:, None] * rep + np.arange(rep)[None, :]).ravel()
        g = geocode_arrays(np.sort(page_ids))
        pts = np.stack([g["lon"], g["lat"]], axis=1)
        # convex (CCW): every consecutive triple turns left
        n = len(v)
        if n >= 3:
            a, b, c = v, np.roll(v, -1, 0), np.roll(v, -2, 0)
            cross = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (
                b[:, 1] - a[:, 1]
            ) * (c[:, 0] - a[:, 0])
            assert (cross > 0).all()
        # containment: all points inside or on hull (CCW half-planes)
        for i in range(n):
            p, q = v[i], v[(i + 1) % n]
            s = (q[0] - p[0]) * (pts[:, 1] - p[1]) - (q[1] - p[1]) * (
                pts[:, 0] - p[0]
            )
            assert (s >= -1e-9).all()
        # minimality: every hull vertex is an actual input point
        for vv in v:
            assert np.isclose(pts, vv[None, :]).all(axis=1).any()


def test_cell_pyramid_levels_nest(sf_dir):
    """Child counts sum exactly to the parent count (floor
    composition: res-11 cells nest in res-9 in res-7)."""
    import numpy as np

    from aerial_conversion_ray.pipelines import spatial

    out = spatial.cell_pyramid(sf_dir).to_pandas()
    total = {r: g["n_pages"].sum() for r, g in out.groupby("res")}
    assert len(set(total.values())) == 1  # every level counts all pages
    lv = {r: g.set_index("cell")["n_pages"] for r, g in out.groupby("res")}
    c11 = lv[11]
    n11 = 1 << 11
    parent9 = (c11.index.to_numpy() // n11 // 4) * (1 << 9) + (
        c11.index.to_numpy() % n11
    ) // 4
    rolled = c11.groupby(parent9).sum()
    assert (rolled.sort_index() == lv[9].sort_index()).all()


def test_within_dist_join_refuses_oversized_ring(sf_dir):
    """A radius/resolution combination whose lon ring exceeds the
    64-cell budget must fail loudly (a silent cap would drop pairs)."""
    import pytest

    from aerial_conversion_ray.pipelines import spatial

    # the ValueError raised inside the map task surfaces wrapped in
    # ray.exceptions.RayTaskError — match on the message
    with pytest.raises(Exception, match="64-cell"):
        spatial.within_dist_join(sf_dir, dist_m=2_000_000.0, res=11).count()
